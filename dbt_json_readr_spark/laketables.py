"""Generic lake metadata-table surfaces over ANY native Delta/Iceberg
table (r12, VERDICT r11 item 5) — the engine that backs
``sql.register_lake``, so `spark.sql` alone can drive the bridges:
`SELECT * FROM t__snapshots` here is what `SELECT * FROM t$snapshots`
is on a production Iceberg catalog.

These are the USER surfaces: they carry the real (writer-salted)
snapshot ids and wall-clock timestamps.  The gated keys F41–F48 keep
their own deterministic projections over pinned fixtures — where both
exist, the key's projection is derivable from the surface here, and
the F47 history arithmetic is literally shared (``delta_history_rows``
below is the one replay definition).

Every builder is METADATA-ONLY: O(#commits) JSON / O(#manifests) avro,
no data file is ever opened — at 100 TB these answer from kilobytes of
log while the table itself never moves.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from .sources import lakeformats as LF

# ------------------------------------------------------------------
# Delta
# ------------------------------------------------------------------


def delta_history_rows(
    table_path: str, strict: bool = True
) -> list[tuple[int, str | None, int, int | None]]:
    """(version, commitInfo operation, commit timestamp ms, net live
    rows) per commit, from the _delta_log ALONE: cumulative add.stats
    numRecords minus DV cardinalities, replayed with the protocol's
    remove-before-add set semantics.  The one replay definition shared
    by the F47 gated key and the ``__history`` SQL view (two hand-kept
    copies could drift).  ONE read+parse pass per commit file — the
    timestamp rides along so callers never re-open the log.

    ``add.stats`` is optional in the protocol; with ``strict=True``
    (the gated key's contract) a stats-less add raises loudly, with
    ``strict=False`` (the generic SQL surface) ``rows_at`` degrades to
    None from that version on instead of failing the whole table."""
    log = Path(table_path) / "_delta_log"
    versions = LF._log_versions(log)[0]
    rows: list[tuple[int, str | None, int, int | None]] = []
    live: dict[str, int | None] = {}  # path -> net live rows (None=unknown)
    for v in versions:
        vp = log / f"{v:020d}.json"
        op = None
        ts = None
        adds: list[dict] = []
        removes: list[dict] = []
        for line in vp.read_text().splitlines():
            if not line.strip():
                continue
            a = json.loads(line)
            if "commitInfo" in a:
                if op is None:
                    op = a["commitInfo"].get("operation")
                    ts = a["commitInfo"].get("timestamp")
            elif "add" in a:
                adds.append(a["add"])
            elif "remove" in a:
                removes.append(a["remove"])
        if ts is None:
            ts = vp.stat().st_mtime_ns // 1_000_000
        # protocol set semantics: a DV update is remove(path) +
        # add(path, dv) in ONE commit — removes apply first and never
        # evict a re-added path (lakeformats._apply_commit's rule)
        re_added = {a["path"] for a in adds}
        for r in removes:
            if r["path"] not in re_added:
                live.pop(r["path"], None)
        for a in adds:
            stats = a.get("stats")
            if not stats:
                if strict:
                    raise LF.LakeFormatError(
                        "delta history derives rows from add.stats "
                        f"numRecords; {a['path']} at version {v} carries "
                        "none"
                    )
                live[a["path"]] = None
                continue
            n = int(json.loads(stats)["numRecords"])
            dv = a.get("deletionVector")
            if dv:
                n -= int(dv["cardinality"])
            live[a["path"]] = n
        vals = list(live.values())
        n_at = None if any(x is None for x in vals) else int(sum(vals))
        rows.append((v, op, int(ts), n_at))
    return rows


def delta_history_df(spark: SparkSession, table_path: str) -> DataFrame:
    """``DESCRIBE HISTORY`` as a DataFrame: one row per commit with
    its operation, commit timestamp (commitInfo when present, else the
    log file's mtime), and the log-derived net live row count (null
    when a stats-less add makes it unknowable — the protocol keeps
    add.stats optional)."""
    return spark.createDataFrame(
        delta_history_rows(table_path, strict=False),
        "version int, operation string, timestamp_ms long, rows_at long",
    )


def delta_files_df(spark: SparkSession, table_path: str) -> DataFrame:
    """The add-file listing of the CURRENT snapshot: one row per live
    file with its partition values (JSON-rendered), record count, DV
    debt, net live rows, and size — O(#add entries), no data read."""
    snap = LF.delta_snapshot(table_path)
    rows = []
    for f in snap["files"]:
        stats = f.get("stats")
        n = int(json.loads(stats)["numRecords"]) if stats else None
        dv = f.get("deletionVector")
        card = int(dv["cardinality"]) if dv else 0
        rows.append(
            (
                f["path"],
                json.dumps(f.get("partitionValues") or {}, sort_keys=True),
                n,
                card,
                None if n is None else n - card,
                int(f.get("size") or 0),
            )
        )
    return spark.createDataFrame(
        rows,
        "path string, partition_values string, record_count long, "
        "dv_deleted long, live_rows long, size_bytes long",
    )


# ------------------------------------------------------------------
# Iceberg
# ------------------------------------------------------------------


def _ice_meta(metadata_path: str) -> tuple[dict, str]:
    meta = LF.iceberg_metadata(metadata_path)
    table_dir = os.path.dirname(os.path.dirname(os.path.abspath(metadata_path)))
    return meta, table_dir


def iceberg_snapshots_df(spark: SparkSession, metadata_path: str) -> DataFrame:
    """The ``snapshots`` metadata table: one row per snapshot with
    manifest-list rollups — O(#snapshots) JSON + one manifest-LIST
    avro read per row, manifests never opened."""
    meta, table_dir = _ice_meta(metadata_path)
    rows = []
    cur = meta.get("current-snapshot-id")
    # v1 metadata has no sequence numbers and manifest-list row counts
    # are optional — guard every field like the other manifest-list
    # consumers (iceberg_snapshot_entries) do, so an external table
    # registers instead of KeyError-ing the whole view set
    snaps = sorted(
        meta.get("snapshots", []),
        key=lambda s: int(s.get("sequence-number") or s["snapshot-id"]),
    )
    for s in snaps:
        mrows = LF._read_avro_records(
            spark, LF._resolve(s["manifest-list"], table_dir)
        )
        data_rows = sum(
            int(m.get("added_rows_count") or 0)
            for m in mrows
            if int(m.get("content") or 0) == 0
        )
        del_rows = sum(
            int(m.get("added_rows_count") or 0)
            for m in mrows
            if int(m.get("content") or 0) == 1
        )
        rows.append(
            (
                int(s["snapshot-id"]),
                s.get("sequence-number"),
                s.get("timestamp-ms"),
                (s.get("summary") or {}).get("operation"),
                s.get("parent-snapshot-id"),
                len(mrows),
                data_rows,
                del_rows,
                1 if s["snapshot-id"] == cur else 0,
            )
        )
    return spark.createDataFrame(
        rows,
        "snapshot_id long, sequence_number long, timestamp_ms long, "
        "operation string, parent_id long, n_manifests int, "
        "data_rows long, delete_rows long, is_current int",
    )


def iceberg_history_df(spark: SparkSession, metadata_path: str) -> DataFrame:
    """The ``history`` metadata table: the snapshot log in order with
    the spec's is_current_ancestor flag."""
    from .sources.icebergwriter import ancestor_ids

    meta, _ = _ice_meta(metadata_path)
    anc = ancestor_ids(meta)
    rows = [
        (int(e["timestamp-ms"]), int(e["snapshot-id"]),
         1 if e["snapshot-id"] in anc else 0)
        for e in meta.get("snapshot-log", [])
    ]
    return spark.createDataFrame(
        rows,
        "made_current_at_ms long, snapshot_id long, is_current_ancestor int",
    )


def iceberg_refs_df(spark: SparkSession, metadata_path: str) -> DataFrame:
    """The ``refs`` metadata table: every named ref plus the implicit
    ``main`` head when no explicit main ref exists."""
    meta, _ = _ice_meta(metadata_path)
    refs = dict(meta.get("refs") or {})
    if "main" not in refs and meta.get("current-snapshot-id") is not None:
        refs["main"] = {
            "snapshot-id": meta["current-snapshot-id"],
            "type": "branch",
        }
    rows = [
        (name, r.get("type"), int(r["snapshot-id"]))
        for name, r in sorted(refs.items())
    ]
    return spark.createDataFrame(rows, "name string, type string, snapshot_id long")


def iceberg_manifests_df(spark: SparkSession, metadata_path: str) -> DataFrame:
    """The ``manifests`` metadata table for the CURRENT snapshot: one
    row per manifest from the manifest LIST alone (content kind,
    added/existing/deleted file counts, row counts) — no manifest
    opened."""
    meta, table_dir = _ice_meta(metadata_path)
    snaps = {s["snapshot-id"]: s for s in meta.get("snapshots", [])}
    cur = snaps.get(meta.get("current-snapshot-id"))
    rows = []
    if cur is not None:
        for m in LF._read_avro_records(
            spark, LF._resolve(cur["manifest-list"], table_dir)
        ):
            rows.append(
                (
                    os.path.basename(m["manifest_path"]),
                    int(m["content"] or 0),
                    int(m.get("added_files_count") or 0),
                    int(m.get("existing_files_count") or 0),
                    int(m.get("deleted_files_count") or 0),
                    int(m.get("added_rows_count") or 0),
                    int(m.get("existing_rows_count") or 0),
                )
            )
    return spark.createDataFrame(
        rows,
        "path string, content int, added_files int, existing_files int, "
        "deleted_files int, added_rows long, existing_rows long",
    )


def iceberg_partitions_df(spark: SparkSession, metadata_path: str) -> DataFrame:
    """The ``partitions`` metadata table: per-partition live file and
    record counts over the CURRENT snapshot's data entries —
    O(#entries) manifest avro, no parquet opened."""
    meta, table_dir = _ice_meta(metadata_path)
    entries = LF.iceberg_snapshot_entries(spark, metadata_path)
    agg: dict[str, list[int]] = {}
    for e in entries:
        if e["status"] == 2 or e.get("content", 0) != 0:
            continue
        part = json.dumps(e.get("partition") or {}, sort_keys=True, default=str)
        cur = agg.setdefault(part, [0, 0])
        cur[0] += 1
        cur[1] += int(e.get("record_count") or 0)
    rows = [(p, c[0], c[1]) for p, c in sorted(agg.items())]
    return spark.createDataFrame(
        rows, "partition string, n_files int, record_count long"
    )


def iceberg_files_df(spark: SparkSession, metadata_path: str) -> DataFrame:
    """The ``files`` metadata table: one row per live entry of the
    CURRENT snapshot (data AND delete files), from the manifest walk
    alone."""
    entries = LF.iceberg_snapshot_entries(spark, metadata_path)
    rows = []
    for e in entries:
        if e["status"] == 2:
            continue
        rows.append(
            (
                os.path.basename(e["path"]),
                int(e.get("content", 0)),
                json.dumps(e.get("partition") or {}, sort_keys=True, default=str),
                int(e.get("record_count") or 0),
            )
        )
    return spark.createDataFrame(
        rows,
        "path string, content int, partition string, record_count long",
    )
