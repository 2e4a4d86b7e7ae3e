"""SQL front door: register the benchmark tables (and dbt artifact
views) as temp views so users can drive the whole engine with
``spark.sql`` — the interface a reference-tool user lands on when they
want plain SQL instead of the DataFrame API.

Views are plain metadata over the explicit-schema scans in
sources/tables.py: every ``spark.sql`` query still gets pushdown,
pruning, and AQE — there is no extra materialization layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .session import prep
from .sources.tables import SCHEMAS, load, load_partsupp

TABLES = tuple(SCHEMAS)


def register_tables(spark: SparkSession, sf_dir: str) -> list[str]:
    """Create/replace one temp view per benchmark table (plus the
    synthesized ``partsupp``); returns the view names."""
    prep(spark)
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
    load_partsupp(spark, sf_dir).createOrReplaceTempView("partsupp")
    return [*TABLES, "partsupp"]


def register_artifacts(spark: SparkSession, target_dir: str) -> list[str]:
    """Expose the dbt artifact tables (manifest nodes/sources/macros,
    catalog, run results, freshness) as views named dbt_* — pass the
    dbt ``target/`` directory."""
    from .sources import artifacts as A

    views = {
        "dbt_nodes": A.manifest_nodes(spark, f"{target_dir}/manifest.json"),
        "dbt_sources": A.manifest_sources(spark, f"{target_dir}/manifest.json"),
        "dbt_macros": A.manifest_macros(spark, f"{target_dir}/manifest.json"),
        "dbt_catalog": A.catalog_objects(spark, f"{target_dir}/catalog.json"),
        "dbt_run_results": A.run_results(spark, f"{target_dir}/run_results.json"),
        "dbt_freshness": A.source_freshness(spark, f"{target_dir}/sources.json"),
    }
    for name, df in views.items():
        df.createOrReplaceTempView(name)
    return list(views)


def sql(spark: SparkSession, query: str) -> DataFrame:
    """Thin alias so callers can stay inside this package's API."""
    return spark.sql(query)
