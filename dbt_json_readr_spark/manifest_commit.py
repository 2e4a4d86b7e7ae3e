"""Manifest-commit table (write-audit-publish) — exactly-once durable
parquet without a table-format dependency (SURVEY.md §2 E; VERDICT r3
item 8).

The image ships no Delta/Iceberg jars (sinks.write_delta gates loudly),
but the property those formats buy — readers NEVER see a partially
written batch — is a protocol, not a jar.  This module implements the
protocol the way Iceberg's spec describes it (snapshot manifests +
an atomically swapped pointer), scoped to a single writer:

    <table>/
      data/<commit-uuid>/part-*.parquet   -- staged by Spark jobs
      _manifests/manifest-<v>.json        -- file list for version v
      _manifests/_latest                  -- pointer, atomic os.replace

- WRITE:   the batch lands in its own ``data/<uuid>/`` directory.  A
  crash mid-write leaves orphan files that NO manifest references —
  invisible to every reader, cleaned by ``vacuum()``.
- AUDIT:   the staged files are listed and re-counted BEFORE publish;
  a mismatch against the expected row count aborts the commit and
  leaves the table at the old version.
- PUBLISH: ``manifest-<v+1>.json`` is written to a temp name and
  ``os.replace``d (atomic on POSIX), then ``_latest`` is swapped the
  same way.  Readers resolve ``_latest`` → manifest → exact file list,
  so a reader racing a commit sees either v or v+1, never a mix.

Exactly-once streaming: ``foreach_batch_writer`` records the micro-batch
id in the manifest; a replayed batch (restart between the sink commit
and the checkpoint write — the at-least-once window every foreachBatch
sink has) is detected via ``committed_batch_ids`` and skipped, making
the sink idempotent and the pipeline exactly-once end-to-end.

At 100 TB the manifest lists grow by one entry per file; vacuum and
manifest compaction stay O(#files), and nothing here funnels data
through the driver — Spark writes the files, the driver only renames.
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


class CommitAuditError(RuntimeError):
    """Raised when the audit step rejects a staged batch; the table is
    left at its previous version and the staged files stay orphaned
    (invisible) until vacuum."""


class ManifestTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self._data = os.path.join(path, "data")
        self._manifests = os.path.join(path, "_manifests")
        os.makedirs(self._data, exist_ok=True)
        os.makedirs(self._manifests, exist_ok=True)

    # ------------------------------------------------------------ read
    def current_version(self) -> int:
        try:
            with open(os.path.join(self._manifests, "_latest")) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return 0

    def _manifest(self, version: int) -> dict:
        with open(os.path.join(self._manifests, f"manifest-{version}.json")) as f:
            return json.load(f)

    def read(self, version: int | None = None) -> DataFrame:
        """The table AS OF ``version`` (default: latest) — exactly the
        files that manifest lists, with its pinned schema.  Orphaned /
        in-flight data files are unreachable by construction."""
        v = self.current_version() if version is None else version
        if v == 0:
            return self.spark.createDataFrame([], T.StructType([]))
        m = self._manifest(v)
        schema = T.StructType.fromJson(m["schema"])
        reader = self.spark.read.schema(schema)
        files = [os.path.join(self.path, f["path"]) for f in m["files"]]
        return reader.parquet(*files)

    def committed_batch_ids(self) -> set[int]:
        v = self.current_version()
        ids: set[int] = set()
        while v > 0:
            m = self._manifest(v)
            if m.get("batch_id") is not None:
                ids.add(m["batch_id"])
            v = m["parent"]
        return ids

    # ----------------------------------------------------------- write
    def commit(
        self,
        df: DataFrame,
        mode: str = "append",
        batch_id: int | None = None,
        expected_rows: int | None = None,
    ) -> int:
        """Write-audit-publish one batch; returns the new version.

        ``expected_rows`` (when given) is the audit contract: the staged
        files are re-counted from disk and a mismatch aborts BEFORE
        publish.  ``mode='overwrite'`` publishes a manifest listing only
        this batch's files; ``'append'`` carries the parent's list
        forward."""
        if mode not in ("append", "overwrite"):
            raise ValueError(f"unsupported mode: {mode}")
        commit_id = uuid.uuid4().hex
        staging = os.path.join(self._data, commit_id)
        # WRITE — crash here leaves an unreferenced directory, nothing more
        df.write.mode("errorifexists").parquet(staging)
        # AUDIT — list + recount from disk, never trusting the in-memory df
        staged = sorted(
            os.path.join("data", commit_id, f)
            for f in os.listdir(staging)
            if f.endswith(".parquet")
        )
        actual = (
            self.spark.read.schema(df.schema)
            .parquet(*[os.path.join(self.path, p) for p in staged])
            .count()
            if staged
            else 0
        )
        if expected_rows is not None and actual != expected_rows:
            raise CommitAuditError(
                f"staged rows {actual} != expected {expected_rows}; "
                f"commit {commit_id} NOT published"
            )
        # PUBLISH — manifest then pointer, each via atomic os.replace
        parent = self.current_version()
        version = parent + 1
        files = [{"path": p} for p in staged]
        if mode == "append" and parent > 0:
            files = self._manifest(parent)["files"] + files
        manifest = {
            "version": version,
            "parent": parent,
            "batch_id": batch_id,
            "commit_id": commit_id,
            "rows_added": actual,
            "schema": df.schema.jsonValue(),
            "files": files,
        }
        self._atomic_write(
            os.path.join(self._manifests, f"manifest-{version}.json"),
            json.dumps(manifest, indent=1),
        )
        self._atomic_write(os.path.join(self._manifests, "_latest"), str(version))
        return version

    def foreach_batch_writer(self) -> Callable[[DataFrame, int], None]:
        """Idempotent ``foreachBatch`` hook: a batch id that is already
        in some published manifest is dropped instead of re-appended, so
        checkpoint-replayed micro-batches cannot double-write."""

        def _write(batch_df: DataFrame, batch_id: int) -> None:
            if batch_id in self.committed_batch_ids():
                return
            self.commit(batch_df, mode="append", batch_id=batch_id)

        return _write

    def vacuum(self) -> list[str]:
        """Delete data directories referenced by NO manifest ≤ latest —
        the orphans crashed writers and aborted audits leave behind.
        Returns the removed directory names."""
        live: set[str] = set()
        v = self.current_version()
        seen = v
        while seen > 0:
            for f in self._manifest(seen)["files"]:
                live.add(f["path"].split(os.sep)[1])
            seen = self._manifest(seen)["parent"]
        removed = []
        for d in os.listdir(self._data):
            if d not in live:
                full = os.path.join(self._data, d)
                for f in os.listdir(full):
                    os.remove(os.path.join(full, f))
                os.rmdir(full)
                removed.append(d)
        return removed

    @staticmethod
    def _atomic_write(dest: str, content: str) -> None:
        tmp = dest + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(content)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, dest)
