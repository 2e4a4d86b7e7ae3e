"""Manual skew salting (SURVEY.md §4) — the explicit fallback when AQE's
runtime skew split can't help (e.g. a broadcast-ineligible dim joined on
a power-law key).

``salted_join`` fans ONE hot left side across ``n_salts`` sub-keys and
replicates the right side once per salt, so the hot key's rows land on
``n_salts`` reducers instead of one.  Replication multiplies the right
side — only use when |right| × n_salts ≪ |left|'s hot-key volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    left: DataFrame, right: DataFrame, on: str, n_salts: int = 8, how: str = "inner"
) -> DataFrame:
    """Equi-join on `on` with the left side salted.  Salt derives from
    the physical row position (pmod of monotonically_increasing_id) —
    even spread regardless of key skew; join semantics are unchanged
    because the right side carries every salt value."""
    salted_left = left.withColumn(
        SALT_COL, F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int")
    )
    salts = F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    salted_right = right.withColumn(SALT_COL, salts)
    return salted_left.join(salted_right, [on, SALT_COL], how).drop(SALT_COL)
