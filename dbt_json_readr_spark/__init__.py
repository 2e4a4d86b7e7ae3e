"""PySpark-native analytics engine with the capabilities of
aecoleman/dbt-json-readr (dbt artifact JSON → relational tables), a
relational/OLAP query core, and LLM-data-pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing).

Spark-first design: DataFrame/SQL plans optimized by Catalyst; no
row-at-a-time Python UDFs in hot paths; Pandas UDFs only where built-in
operators cannot express the semantics (multimodal decode).
"""

__version__ = "0.1.0"
