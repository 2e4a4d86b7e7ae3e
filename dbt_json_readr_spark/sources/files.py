"""Generic lake readers (SURVEY.md §2 E): parquet / csv / json-lines /
multiline-json with EXPLICIT schemas.

Rules for 100 TB hygiene, enforced here so callers can't drift:
- schema is required — inference costs an extra full pass on text
  formats and silently widens types run-to-run;
- corrupt records are quarantined to a ``_corrupt_record`` column
  (PERMISSIVE) instead of killing a 6-hour job (FAILFAST is opt-in);
- paths may be files, directories, or globs — partition discovery and
  pushdown behave identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: T.StructType) -> T.StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType(list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())])


def read_parquet(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Schema-asserted parquet scan (column pruning + filter pushdown
    still apply; the explicit schema guards against upstream drift)."""
    return spark.read.schema(schema).parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    delimiter: str = ",",
    mode: str = "PERMISSIVE",
) -> DataFrame:
    return (
        spark.read.schema(_with_corrupt(schema) if mode == "PERMISSIVE" else schema)
        .option("header", str(header).lower())
        .option("delimiter", delimiter)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType, mode: str = "PERMISSIVE"
) -> DataFrame:
    """One JSON document per line — the only JSON layout that splits
    across executors; prefer it for anything large."""
    return (
        spark.read.schema(_with_corrupt(schema) if mode == "PERMISSIVE" else schema)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def read_orc(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Schema-asserted ORC scan — same pushdown/pruning contract as
    parquet (ORC carries min/max stripe stats Spark's reader uses), for
    lakes standardized on ORC instead of parquet."""
    return spark.read.schema(schema).orc(path)


def read_text(
    spark: SparkSession, path: str, wholetext: bool = False
) -> DataFrame:
    """Raw text corpus reader: one row per LINE (splittable — the right
    layout for big line-oriented corpora) or one row per FILE
    (``wholetext=True``; the unit of parallelism becomes the file, as
    with multiline JSON).  Emits (value, file) so downstream doc ids
    can be derived deterministically from provenance, not row order."""
    from pyspark.sql import functions as F

    # NB: must be the .text() keyword — a .option("wholetext", …) string
    # is silently ignored by the text datasource
    df = spark.read.text(path, wholetext=wholetext)
    return df.select(F.col("value"), F.input_file_name().alias("file"))


def read_json_multiline(
    spark: SparkSession, path: str, schema: T.StructType, mode: str = "PERMISSIVE"
) -> DataFrame:
    """Whole-file JSON (one document spanning lines, e.g. an array dump
    or a dbt artifact).  Each FILE is the unit of parallelism — fine for
    many files, wrong for one giant file (see artifacts.py for the
    wholetext+from_json pattern)."""
    return (
        spark.read.schema(_with_corrupt(schema) if mode == "PERMISSIVE" else schema)
        .option("multiLine", "true")
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def read_parquet_evolving(spark: SparkSession, *paths: str) -> DataFrame:
    """Schema-evolution read: union parquet written under DIFFERENT
    schema versions (columns added over time) into one frame via
    ``mergeSchema`` — the lake reality where yesterday's files lack
    today's columns.  Missing columns surface as NULLs; pushdown and
    pruning still reach each file's own footer.  Footer-merge costs one
    metadata pass over the file list, so gate it to evolution
    boundaries rather than defaulting it on for every petabyte scan."""
    return spark.read.option("mergeSchema", "true").parquet(*paths)


def read_binary_dir(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
) -> DataFrame:
    """Raw media ingestion via Spark's built-in ``binaryFile`` source:
    one row per file — (path, modificationTime, length, content) — the
    entry point that turns a lake directory of images/audio into the
    binary-column multimodal table operators/multimodal.py consumes.
    The source parallelizes file reads across executors and prunes on
    the metadata columns (path/length predicates never open a file);
    pair with ``pathGlobFilter`` so non-media files are skipped at
    listing time, not after a read."""
    r = spark.read.format("binaryFile")
    if glob:
        r = r.option("pathGlobFilter", glob)
    return r.load(path)
