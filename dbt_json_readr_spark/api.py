"""Drop-in API for users of the reference tool.

``aecoleman/dbt-json-readr`` exposes a handful of R functions over dbt's
``target/*.json`` artifacts; this module exposes the SAME names with the
same output surface, returning Spark DataFrames.  A reference user
switches by replacing ``source("explore.R")`` with
``from dbt_json_readr_spark.api import *`` and passing a SparkSession +
artifact path instead of a parsed JSON object.

Name map (reference → here, reference line refs in each docstring):

| explore.R                   | api.py                |
|-----------------------------|-----------------------|
| read_catalog_objects        | read_catalog_objects  |
| import_catalog_json         | import_catalog_json   |
| read_manifest_nodes         | read_manifest_nodes   |
| read_manifest_sources       | read_manifest_sources |
| read_manifest_macros        | read_manifest_macros  |
| import_manifest_json        | import_manifest_json  |
| parse_columns               | (folded into readers — columns arrive as a typed array column; explode with `manifest_columns`) |
| parse_depends_on            | (folded into readers — `depends_on` array; explode with `manifest_edges`) |

The per-row parse helpers have no standalone twin because Spark's
``from_json`` typing makes them column expressions, not functions; the
exploded relational forms the R user built by mapping them over rows are
exposed directly as ``manifest_columns`` / ``manifest_edges``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .sources import artifacts as _a

__all__ = [
    "read_catalog_objects",
    "import_catalog_json",
    "catalog_columns",
    "read_manifest_nodes",
    "read_manifest_sources",
    "read_manifest_macros",
    "import_manifest_json",
    "manifest_columns",
    "manifest_edges",
    "read_run_results",
    "read_source_freshness",
]


def read_catalog_objects(
    spark: SparkSession, catalog_path: str, group: str | None = None
) -> DataFrame:
    """One catalog group's objects (explore.R:7-33 read_catalog_objects
    takes the already-plucked group dict; here pass group='nodes' or
    'sources', or None for both)."""
    out = _a.catalog_objects(spark, catalog_path)
    return out.filter(out.manifest_group == group) if group else out


def import_catalog_json(spark: SparkSession, catalog_path: str) -> DataFrame:
    """Catalog nodes ∪ sources tagged with manifest_group, reference
    column order (explore.R:35-65 import_catalog_json)."""
    return _a.catalog_objects(spark, catalog_path)


def catalog_columns(spark: SparkSession, catalog_path: str) -> DataFrame:
    """The nested per-object column tibbles of explore.R:17-27, exploded
    to one row per (object, column) — the relational form an R user gets
    via unnest(columns)."""
    return _a.catalog_columns(spark, catalog_path)


def read_manifest_nodes(spark: SparkSession, manifest_path: str) -> DataFrame:
    """manifest['nodes'] → rows (explore.R:140-169)."""
    return _a.manifest_nodes(spark, manifest_path)


def read_manifest_sources(spark: SparkSession, manifest_path: str) -> DataFrame:
    """manifest['sources'] → rows (explore.R:171-197)."""
    return _a.manifest_sources(spark, manifest_path)


def read_manifest_macros(spark: SparkSession, manifest_path: str) -> DataFrame:
    """manifest['macros'] → rows incl. macro_sql sha256
    (explore.R:199-226; see artifacts.py for the documented
    raw-string-sha256 divergence)."""
    return _a.manifest_macros(spark, manifest_path)


def import_manifest_json(spark: SparkSession, manifest_path: str) -> DataFrame:
    """nodes ∪ sources ∪ macros, reference sort order
    (explore.R:223-241)."""
    return _a.manifest_unified(spark, manifest_path)


def manifest_columns(spark: SparkSession, manifest_path: str) -> DataFrame:
    """One row per (node, column) — the relational form of
    explore.R:74-103 parse_columns applied across the manifest."""
    return _a.manifest_columns(spark, manifest_path)


def manifest_edges(spark: SparkSession, manifest_path: str) -> DataFrame:
    """One row per dependency edge — the relational form of
    explore.R:105-138 parse_depends_on applied across the manifest."""
    return _a.manifest_edges(spark, manifest_path)


def read_run_results(spark: SparkSession, path: str) -> DataFrame:
    """run_results.json → per-node status/timing rows
    (explore.R:245-251)."""
    return _a.run_results(spark, path)


def read_source_freshness(spark: SparkSession, path: str) -> DataFrame:
    """sources.json → per-source freshness rows (explore.R:253-256)."""
    return _a.source_freshness(spark, path)
