"""dbt artifact reader semantics (SURVEY.md §5.1): the edge cases the
reference's parse_* functions handle (explore.R:66-128), plus the
at-scale behavior the reference lacks — a glob of many artifact files
parsed as one distributed job."""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import functions as F

from dbt_json_readr_spark.plans.dbt import FIXTURE_TARGET
from dbt_json_readr_spark.sources import artifacts as A

MANIFEST = f"{FIXTURE_TARGET}/manifest.json"


def test_alias_coalesce(spark):
    # explore.R:146 — name = coalesce(alias, name)
    rows = {
        r["unique_id"]: r["name"]
        for r in A.manifest_nodes(spark, MANIFEST).select("unique_id", "name").collect()
    }
    assert rows["model.analytics.fct_order_revenue"] == "order_revenue"
    assert rows["model.analytics.stg_orders"] == "stg_orders"


def test_non_sha256_checksum_is_null(spark):
    # explore.R:166-169 — only sha256 checksums surface
    rows = {
        r["unique_id"]: r["sha256"]
        for r in A.manifest_nodes(spark, MANIFEST).select("unique_id", "sha256").collect()
    }
    assert rows["model.analytics.rpt_daily_events"] is None
    assert rows["model.analytics.stg_orders"] is not None


def test_empty_columns_and_deps_contribute_no_rows(spark):
    # explore.R:68-79, 100-111 — empty maps/lists → zero rows, not NA rows
    cols = A.manifest_columns(spark, MANIFEST)
    assert cols.filter(F.col("unique_id") == "model.analytics.tmp_scratch").count() == 0
    assert cols.filter(F.col("unique_id") == "source.analytics.raw.region").count() == 0
    edges = A.manifest_edges(spark, MANIFEST)
    assert edges.filter(F.col("child_unique_id") == "model.analytics.tmp_scratch").count() == 0


def test_macro_sha_matches_hashlib(spark):
    import hashlib
    import json

    m = json.loads(Path(MANIFEST).read_text())
    expected = {
        uid: hashlib.sha256(v["macro_sql"].encode()).hexdigest()
        for uid, v in m["macros"].items()
    }
    got = {
        r["unique_id"]: r["sha256"]
        for r in A.manifest_macros(spark, MANIFEST).collect()
    }
    assert got == expected


def test_unified_sort_order(spark):
    df = A.manifest_unified(spark, MANIFEST)
    rows = [
        (r["resource_type"], r["database"] or "", r["schema"] or "", r["name"], r["unique_id"])
        for r in df.collect()
    ]
    # explore.R:233-240 — arrange(resource_type, database, schema, name, unique_id)
    assert rows == sorted(rows)


def test_glob_of_many_manifests_is_one_distributed_scan(spark, tmp_path):
    # At lake scale each dbt invocation writes its own manifest; the reader
    # takes a glob and parses file-parallel.  20 copies → 20× the rows,
    # each tagged with its artifact_path.
    for i in range(20):
        d = tmp_path / f"run_{i:02d}"
        d.mkdir()
        shutil.copy(MANIFEST, d / "manifest.json")
    df = A.manifest_nodes(spark, str(tmp_path / "*" / "manifest.json"))
    per_file = df.groupBy("artifact_path").count().collect()
    assert len(per_file) == 20
    assert all(r["count"] == 16 for r in per_file)  # 10 models + 6 tests
    # and the scan parallelizes: more than one input partition for 20 files
    assert df.rdd.getNumPartitions() > 1


def test_schema_drift_catches_planted_drift(spark):
    from dbt_json_readr_spark.plans.dbt import dbt_schema_drift

    drift = dbt_schema_drift(spark, "")
    extra = drift.filter(
        (F.col("unique_id") == "model.analytics.dim_customer")
        & (F.col("column_name") == "_loaded_at")
    ).collect()
    assert len(extra) == 1 and extra[0]["in_catalog"] and not extra[0]["in_manifest"]


# ------------------------------------------------------------ api façade


def test_api_names_mirror_reference(spark):
    """dbt_json_readr_spark.api exposes the reference's function names
    over the same fixtures; each returns a non-empty DataFrame whose
    shape matches the underlying reader it fronts."""
    from dbt_json_readr_spark import api

    target = FIXTURE_TARGET
    manifest, catalog = f"{target}/manifest.json", f"{target}/catalog.json"
    uni = api.import_manifest_json(spark, manifest)
    parts = [
        api.read_manifest_nodes(spark, manifest),
        api.read_manifest_sources(spark, manifest),
        api.read_manifest_macros(spark, manifest),
    ]
    assert uni.count() == sum(p.count() for p in parts) > 0
    cat = api.import_catalog_json(spark, catalog)
    nodes_only = api.read_catalog_objects(spark, catalog, group="nodes")
    assert 0 < nodes_only.count() < cat.count()
    assert api.catalog_columns(spark, catalog).count() > 0
    assert api.manifest_edges(spark, manifest).count() > 0
    assert api.manifest_columns(spark, manifest).count() > 0
    assert api.read_run_results(spark, f"{target}/run_results.json").count() > 0
    assert api.read_source_freshness(spark, f"{target}/sources.json").count() > 0


def test_manifest_lake_rollup_and_scan_packing(spark):
    """A27 (r6): the 1,200-invocation lake reads as ONE distributed scan
    whose splits PACK many small files (task count ≪ file count — task
    overhead, not parse time, dominates tiny-file lakes), and the rollup
    agrees with a stdlib recount of every file."""
    from dbt_json_readr_spark.plans.dbt import dbt_manifest_lake
    from dbt_json_readr_spark.sources import lake_fixture as LF

    root = LF.ensure_lake()
    # idempotent re-ensure is a cheap stat, not a rebuild
    marker = (root / "_LAKE_VERSION").stat().st_mtime_ns
    assert LF.ensure_lake() == root
    assert (root / "_LAKE_VERSION").stat().st_mtime_ns == marker

    df = dbt_manifest_lake(spark, "unused")
    scan = df.sparkSession.read.text(
        f"{root}/run_*/manifest.json", wholetext=True
    )
    n_splits = scan.rdd.getNumPartitions()
    assert 1 < n_splits < LF.N_RUNS / 4, n_splits  # packed, still parallel

    rows = {r["unique_id"]: r for r in df.collect()}
    oracle = {t[0]: t for t in LF.lake_rollup_rows()}
    assert rows.keys() == oracle.keys() and len(rows) == 8
    for uid, t in oracle.items():
        r = rows[uid]
        assert (r["n_runs"], r["n_files"], r["n_versions"]) == (t[1], t[2], t[3])
        # checksum cadences differ by model → version counts must differ
    assert len({r["n_versions"] for r in rows.values()}) > 1
