"""Event-stream and window/pivot/rollup queries (SURVEY.md §2 B5-B14)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..operators.asof import asof_join
from ..operators.sessionize import session_stats
from ..session import prep
from ..sources.tables import load


def _dec(col: str) -> F.Column:
    return F.col(col).cast("decimal(18,4)")


# ---------------------------------------------------------------- B5


def top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by order revenue within each nation: the canonical
    window top-k — one shuffle for the agg, one for the window."""
    prep(spark)
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders")
    rev = (
        orders.groupBy("o_custkey")
        .agg(F.sum(_dec("o_totalprice")).cast("double").alias("revenue"))
    )
    w = W.partitionBy("n_name").orderBy(F.desc("revenue"), "c_custkey")
    return (
        rev.join(cust, rev.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("n_name", "c_custkey", "c_name", "revenue")
        .withColumn("rank_in_nation", F.row_number().over(w))
        .filter(F.col("rank_in_nation") <= 3)
    )


TOP_CUSTOMERS_SQL = """
SELECT * FROM (
  SELECT
    n_name, c_custkey, c_name, revenue,
    CAST(row_number() OVER (PARTITION BY n_name ORDER BY revenue DESC, c_custkey) AS INTEGER) AS rank_in_nation
  FROM (
    SELECT n_name, c_custkey, c_name,
           CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name, c_custkey, c_name
  )
) WHERE rank_in_nation <= 3
"""


# ---------------------------------------------------------------- B6


def order_priority_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot order counts by status — explicit pivot values so the plan is
    a single pass (no distinct-values pre-query)."""
    prep(spark)
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.coalesce("F", F.lit(0)).alias("n_finished"),
            F.coalesce("O", F.lit(0)).alias("n_open"),
            F.coalesce("P", F.lit(0)).alias("n_pending"),
        )
    )


ORDER_PRIORITY_PIVOT_SQL = """
SELECT
  o_orderpriority,
  count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
  count(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
  count(*) FILTER (WHERE o_orderstatus = 'P') AS n_pending
FROM orders
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------- B7


def revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (nation, order year): partial-aggregate friendly grouping
    sets; grouping_id disambiguates the NULL subtotal rows."""
    prep(spark)
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("n_name", F.year("o_orderdate").alias("order_year"), "o_totalprice")
        .rollup("n_name", "order_year")
        .agg(
            F.sum(_dec("o_totalprice")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
            F.grouping_id().cast("int").alias("gid"),
        )
    )


REVENUE_ROLLUP_SQL = """
SELECT
  n_name,
  CAST(year(o_orderdate) AS INTEGER) AS order_year,
  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS revenue,
  count(*) AS n_orders,
  CAST(GROUPING(n_name) * 2 + GROUPING(year(o_orderdate)) AS INTEGER) AS gid
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY ROLLUP (n_name, year(o_orderdate))
"""


# ---------------------------------------------------------------- B8


def supplier_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers that shipped in 1997 (semi) but never took a large
    late return (anti) — EXISTS/NOT EXISTS as Spark's dedicated join
    types, which shuffle only the keys, never materialize the match."""
    prep(spark)
    supp = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem")
    shipped_97 = li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_suppkey")
    returned = li.filter(
        (F.col("l_returnflag") == "R")
        & (F.col("l_quantity") >= 48)
        & (F.col("l_shipdate") >= F.lit("2001-01-01").cast("timestamp"))
    ).select("l_suppkey")
    return (
        supp.join(shipped_97, supp.s_suppkey == shipped_97.l_suppkey, "left_semi")
        .join(returned, supp.s_suppkey == returned.l_suppkey, "left_anti")
        .select("s_suppkey", "s_name", "s_acctbal")
    )


SUPPLIER_SEMI_ANTI_SQL = """
SELECT s_suppkey, s_name, s_acctbal
FROM supplier
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_suppkey = s_suppkey
    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
)
AND NOT EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_suppkey = s_suppkey AND l_returnflag = 'R'
    AND l_quantity >= 48 AND l_shipdate >= TIMESTAMP '2001-01-01 00:00:00'
)
"""


# ---------------------------------------------------------------- B9


def events_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type volumes with exact distinct users (the expensive exact
    path; the approx variant is events_approx_quantiles' sibling)."""
    prep(spark)
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(_dec("value")).cast("double").alias("total_value"),
    )


EVENTS_USER_COUNTS_SQL = """
SELECT event_type,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       CAST(CAST(sum(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS total_value
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------- B10


def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    return session_stats(ev)


EVENTS_SESSIONIZATION_SQL = """
SELECT user_id,
       CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS INTEGER) AS session_id,
       ts, event_id, value
FROM (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
              THEN 1 ELSE 0 END AS is_new
  FROM events
)
"""

EVENTS_SESSIONIZATION_SQL = f"""
SELECT user_id, session_id,
       min(ts) AS session_start,
       max(ts) AS session_end,
       count(*) AS n_events,
       CAST(CAST(sum(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS total_value
FROM ({EVENTS_SESSIONIZATION_SQL}) GROUP BY user_id, session_id
"""


# ---------------------------------------------------------------- B11


def events_windowed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows (batch form of the D1 streaming job)."""
    prep(spark)
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec("value")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


EVENTS_WINDOWED_AGG_SQL = """
SELECT date_trunc('hour', ts) AS window_start,
       event_type,
       count(*) AS n_events,
       CAST(CAST(sum(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
"""


# ---------------------------------------------------------------- B12


def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props column → typed field, JVM-side
    (get_json_object; no Python in the loop) — the reference's JSON-to-
    relational move applied to a row-level payload."""
    prep(spark)
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.count("k").alias("n_with_k"),
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
    )


EVENTS_JSON_PROPS_SQL = """
SELECT event_type,
       count(k) AS n_with_k,
       CAST(sum(k) AS BIGINT) AS sum_k,
       min(k) AS min_k,
       max(k) AS max_k
FROM (
  SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
)
GROUP BY event_type
"""


# ---------------------------------------------------------------- B13


def asof_join_events_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase event, the user's most recent click at-or-before
    it.  Composed as-of join (operators/asof.py); DuckDB's native ASOF
    JOIN is the independent oracle."""
    prep(spark)
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    # dedupe clicks to one per (user, ts) for determinism
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    out = asof_join(purchases, clicks, on="user_id", ts="ts", right_cols=["click_id"])
    return out.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.col("click_id_asof").alias("last_click_id"),
        F.col("ts_asof").alias("last_click_ts"),
    )


ASOF_JOIN_SQL = """
SELECT p.user_id, p.ts, p.event_id, p.value,
       c.click_id AS last_click_id,
       c.ts AS last_click_ts
FROM (
  SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'
) p
ASOF LEFT JOIN (
  SELECT user_id, ts, max(event_id) AS click_id
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
) c ON p.user_id = c.user_id AND c.ts <= p.ts
"""


# ---------------------------------------------------------------- B14


def events_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-rank quantiles per event_type via explicit rank lookup —
    no float interpolation, so results are stored data values and
    bit-identical across engines (interpolated quantiles disagree at the
    last ulp between engines).  The sketch-based sibling
    (percentile_approx) runs in bench.py where cross-engine equality is
    not required."""
    prep(spark)
    ev = load(spark, sf_dir, "events").select("event_type", F.col("value").alias("v"))
    w = W.partitionBy("event_type").orderBy("v")
    ranked = ev.select(
        "event_type",
        "v",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("event_type")).alias("n"),
    )
    aggs = [
        F.max(F.when(F.col("rn") == F.ceil(F.lit(p) * F.col("n")), F.col("v"))).alias(name)
        for name, p in [("p50", 0.5), ("p90", 0.9), ("p99", 0.99)]
    ]
    return ranked.groupBy("event_type").agg(*aggs)


EVENTS_QUANTILES_SQL = (
    "SELECT event_type, "
    + ", ".join(
        f"max(CASE WHEN rn = CAST(ceil({p} * n) AS BIGINT) THEN v END) AS {name}"
        for name, p in [("p50", 0.5), ("p90", 0.9), ("p99", 0.99)]
    )
    + """
FROM (
  SELECT event_type, value AS v,
         row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
)
GROUP BY event_type
"""
)


# ---------------------------------------------------------------- B16


def orders_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer running revenue — the cumulative-window primitive.
    One shuffle on o_custkey; DECIMAL running sum so every prefix is
    exact and engine-independent."""
    prep(spark)
    orders = load(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(_dec("o_totalprice")).over(w).cast("double").alias("cum_revenue"),
    )


ORDERS_RUNNING_TOTAL_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS UNBOUNDED PRECEDING) AS VARCHAR) AS DOUBLE) AS cum_revenue
FROM orders
"""


# ---------------------------------------------------------------- B17


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → click → purchase funnel: per-user ordered-stage detection
    in ONE pass (conditional min-ts aggregation, no self-joins — the
    n-stage funnel that would otherwise be n-1 joins of the fact with
    itself), then a stage histogram."""
    prep(spark)
    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purchase"),
    )
    stage = (
        F.when(
            F.col("t_view").isNotNull()
            & F.col("t_click").isNotNull()
            & F.col("t_purchase").isNotNull()
            & (F.col("t_click") > F.col("t_view"))
            & (F.col("t_purchase") > F.col("t_click")),
            "purchase",
        )
        .when(
            F.col("t_view").isNotNull()
            & F.col("t_click").isNotNull()
            & (F.col("t_click") > F.col("t_view")),
            "click",
        )
        .when(F.col("t_view").isNotNull(), "view")
        .otherwise("none")
    )
    return (
        per_user.select(stage.alias("funnel_stage"))
        .groupBy("funnel_stage")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("funnel_stage")
    )


EVENTS_FUNNEL_SQL = """
WITH per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY user_id
)
SELECT funnel_stage, count(*) AS n_users FROM (
  SELECT CASE
    WHEN t_view IS NOT NULL AND t_click IS NOT NULL AND t_purchase IS NOT NULL
         AND t_click > t_view AND t_purchase > t_click THEN 'purchase'
    WHEN t_view IS NOT NULL AND t_click IS NOT NULL AND t_click > t_view THEN 'click'
    WHEN t_view IS NOT NULL THEN 'view'
    ELSE 'none' END AS funnel_stage
  FROM per_user
) GROUP BY funnel_stage ORDER BY funnel_stage
"""


# ---------------------------------------------------------------- B18b


def lineitem_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot via ``stack`` — the inverse of B6's pivot; the
    per-flag aggregates stay decimal-exact before melting."""
    prep(spark)
    li = load(spark, sf_dir, "lineitem")
    base = li.groupBy("l_returnflag").agg(
        F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
        F.sum(_dec("l_extendedprice")).cast("double").alias("sum_price"),
        F.sum(_dec("l_discount")).cast("double").alias("sum_disc"),
    )
    return base.selectExpr(
        "l_returnflag",
        "stack(3, 'qty', sum_qty, 'price', sum_price, 'disc', sum_disc) AS (metric, value)",
    ).orderBy("l_returnflag", "metric")


LINEITEM_UNPIVOT_SQL = """
WITH base AS (
  SELECT l_returnflag,
         CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_qty,
         CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_price,
         CAST(CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_disc
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, metric, value FROM (
  SELECT l_returnflag, 'qty' AS metric, sum_qty AS value FROM base
  UNION ALL SELECT l_returnflag, 'price', sum_price FROM base
  UNION ALL SELECT l_returnflag, 'disc', sum_disc FROM base
)
ORDER BY l_returnflag, metric
"""


# ---------------------------------------------------------------- B22


def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-seen week,
    distinct-active counts per (cohort_week, weeks_since).  Two shuffles:
    first-seen agg on user, then the cohort-cell distinct."""
    prep(spark)
    ev = load(spark, sf_dir, "events").select("user_id", "ts")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    return (
        ev.join(first, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                (
                    F.unix_timestamp(F.date_trunc("week", F.col("ts")))
                    - F.unix_timestamp("cohort_week")
                )
                / 604800
            )
            .cast("int")
            .alias("weeks_since"),
        )
        .groupBy("cohort_week", "weeks_since")
        .agg(F.count_distinct("user_id").alias("n_active"))
        .orderBy("cohort_week", "weeks_since")
    )


EVENTS_RETENTION_SQL = """
WITH first AS (
  SELECT user_id, CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort_week
  FROM events GROUP BY user_id
)
SELECT cohort_week,
       CAST((epoch(date_trunc('week', ts)) - epoch(cohort_week)) / 604800 AS INTEGER) AS weeks_since,
       count(DISTINCT e.user_id) AS n_active
FROM events e JOIN first USING (user_id)
GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------- B23


def orders_monthly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue with lag deltas.  The time-series window
    is unpartitioned but only |months| rows reach it (post-aggregate), so
    the single-partition sort is trivially bounded at any corpus size."""
    prep(spark)
    orders = load(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month")
    ).agg(F.sum(_dec("o_totalprice")).cast("double").alias("revenue"))
    w = W.orderBy("month")
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "month",
        "revenue",
        (F.col("revenue") - prev).alias("delta"),
        ((F.col("revenue") - prev) / prev).alias("pct_change"),
    ).orderBy("month")


ORDERS_MONTHLY_GROWTH_SQL = """
WITH monthly AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
         CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS revenue
  FROM orders GROUP BY 1
)
SELECT month, revenue,
       revenue - lag(revenue) OVER (ORDER BY month) AS delta,
       (revenue - lag(revenue) OVER (ORDER BY month)) / lag(revenue) OVER (ORDER BY month) AS pct_change
FROM monthly ORDER BY month
"""


# ---------------------------------------------------------------- B28


def events_hourly_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour activity heatmap — the calendar-function
    coverage query (engine-portable: Spark dayofweek is 1=Sunday,
    DuckDB's is 0=Sunday, aligned in the oracle)."""
    prep(spark)
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.dayofweek("ts").alias("dow"),
            F.hour("ts").alias("hour"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
        )
        .orderBy("dow", "hour")
    )


EVENTS_HOURLY_HEATMAP_SQL = """
SELECT CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
       CAST(hour(ts) AS BIGINT) AS hour,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------- B29


def part_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width numeric binning (the width_bucket pattern via integer
    floor division — deterministic in any engine, unlike float bin
    edges)."""
    prep(spark)
    part = load(spark, sf_dir, "part")
    bucket = F.floor((F.col("p_size") - 1) / 10).cast("int")
    return (
        part.groupBy(bucket.alias("size_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.min("p_size").alias("min_size"),
            F.max("p_size").alias("max_size"),
        )
        .orderBy("size_bucket")
    )


PART_SIZE_HISTOGRAM_SQL = """
SELECT CAST(floor((p_size - 1) / 10) AS INTEGER) AS size_bucket,
       count(*) AS n_parts, min(p_size) AS min_size, max(p_size) AS max_size
FROM part GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------- B35


def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection: each event scored against the
    PREVIOUS 20 events of the same user (trailing frame excludes the
    current row, so an outlier cannot suppress its own score).

    Determinism: the window's sum / sum-of-squares accumulate in exact
    DECIMAL over a totally-ordered frame (ts, event_id tiebreak), then
    ONE double conversion feeds the identical mean/var/z expression in
    both engines — bit-equal scores at any parallelism.  One shuffle
    (by user) for the window, one tiny agg."""
    prep(spark)
    ev = load(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    v = _dec("value")
    n = F.count(F.lit(1)).over(w)
    s1 = F.sum(v).over(w).cast("double")
    s2 = F.sum(v * v).over(w).cast("double")
    nd = n.cast("double")
    var = (s2 - s1 * s1 / nd) / nd
    z = F.when(
        (n >= 10) & (var > 0),
        (F.col("value") - s1 / nd) / F.sqrt(var),
    )
    scored = ev.select("user_id", z.alias("z"))
    return (
        scored.filter(F.col("z").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_scored"),
            F.sum((F.abs("z") > 3.0).cast("long")).alias("n_anomalies"),
            F.max(F.abs("z")).alias("max_abs_z"),
        )
        .orderBy("user_id")
    )


EVENTS_ANOMALY_SQL = """
WITH win AS (
  SELECT user_id, value,
         count(*) OVER w AS n,
         CAST(CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w AS VARCHAR) AS DOUBLE) AS s1,
         CAST(CAST(sum(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4))) OVER w AS VARCHAR) AS DOUBLE) AS s2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
),
scored AS (
  SELECT user_id,
         CASE WHEN n >= 10 AND (s2 - s1 * s1 / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) > 0
              THEN (value - s1 / CAST(n AS DOUBLE))
                   / sqrt((s2 - s1 * s1 / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))
         END AS z
  FROM win
)
SELECT user_id,
       count(*) AS n_scored,
       CAST(sum(CASE WHEN abs(z) > 3.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
       max(abs(z)) AS max_abs_z
FROM scored
WHERE z IS NOT NULL
GROUP BY user_id
ORDER BY user_id
"""


# ---------------------------------------------------------------- B36


def skew_salted_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment order revenue computed through the MANUAL salted-join
    path (functions/skew.py): orders fan out across 8 salt sub-keys and
    the customer side replicates once per salt, so a power-law hot key
    would land on 8 reducers instead of one.  Join semantics — and so
    this rollup — are identical to the unsalted join, which is exactly
    what the oracle checks; the salt column never escapes the operator."""
    prep(spark)
    from ..functions.skew import salted_join

    orders = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"), _dec("o_totalprice").alias("price")
    )
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment"
    )
    return (
        salted_join(orders, cust, on="custkey", n_salts=8)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("price").cast("double").alias("revenue"),
        )
        .orderBy("c_mktsegment")
    )


SKEW_SALTED_SQL = """
SELECT c_mktsegment,
       count(*) AS n_orders,
       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# ---------------------------------------------------------------- B37


def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-journey transition matrix: per (event_type → next
    event_type) counts and row-normalized probabilities, next = the
    user's next event by (ts, event_id).  One shuffle on user_id for
    the lag window, then a tiny (|types|²) rollup — the markov-chain
    input for funnel/journey modeling at any corpus size."""
    prep(spark)
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    steps = ev.select(
        "user_id",
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    counts = steps.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    totals = counts.groupBy("from_type").agg(
        F.sum("n_transitions").cast("long").alias("n_from")
    )
    return (
        counts.join(totals, "from_type")
        .select(
            "from_type",
            "to_type",
            "n_transitions",
            (
                F.col("n_transitions").cast("double") / F.col("n_from").cast("double")
            ).alias("p_transition"),
        )
        .orderBy("from_type", "to_type")
    )


# ---------------------------------------------------------------- B38


def scd2_customer_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 merge over the customer dimension (operators/scd2.py):
    a deterministic update batch (promo segment for custkey%11==0, +100
    balance for custkey%7==3, effective 2024-01-01) applied to the
    current snapshot — closed rows + fresh versions + pass-through, the
    lakehouse-less MERGE INTO.  One broadcast of the (tiny) update batch
    against the dimension; no Delta required."""
    prep(spark)
    from ..operators.scd2 import scd2_apply

    cust = load(spark, sf_dir, "customer")
    current = cust.select(
        "c_custkey",
        "c_acctbal",
        "c_mktsegment",
        F.lit("2020-01-01 00:00:00").cast("timestamp").alias("effective_from"),
        F.lit(None).cast("timestamp").alias("effective_to"),
        F.lit(True).alias("is_current"),
    )
    is_bal = F.col("c_custkey") % 7 == 3
    is_seg = F.col("c_custkey") % 11 == 0
    updates = cust.filter(is_bal | is_seg).select(
        "c_custkey",
        F.when(is_bal, F.col("c_acctbal") + F.lit(100.0))
        .otherwise(F.col("c_acctbal"))
        .alias("c_acctbal"),
        F.when(is_seg, F.lit("PROMO")).otherwise(F.col("c_mktsegment")).alias("c_mktsegment"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("effective_from"),
    )
    return scd2_apply(current, updates, key="c_custkey", tracked=["c_acctbal", "c_mktsegment"])


SCD2_CUSTOMER_SQL = """
WITH cur AS (
  SELECT c_custkey, c_acctbal, c_mktsegment,
         TIMESTAMP '2020-01-01 00:00:00' AS effective_from,
         CAST(NULL AS TIMESTAMP) AS effective_to,
         true AS is_current
  FROM customer
),
upd AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 7 = 3 THEN c_acctbal + 100.0 ELSE c_acctbal END AS c_acctbal,
         CASE WHEN c_custkey % 11 = 0 THEN 'PROMO' ELSE c_mktsegment END AS c_mktsegment,
         TIMESTAMP '2024-01-01 00:00:00' AS effective_from
  FROM customer
  WHERE c_custkey % 7 = 3 OR c_custkey % 11 = 0
),
changed AS (
  SELECT c.c_custkey FROM cur c JOIN upd u USING (c_custkey)
  WHERE c.c_acctbal IS DISTINCT FROM u.c_acctbal
     OR c.c_mktsegment IS DISTINCT FROM u.c_mktsegment
)
SELECT c.c_custkey, c.c_acctbal, c.c_mktsegment, c.effective_from,
       CASE WHEN ch.c_custkey IS NOT NULL
            THEN TIMESTAMP '2024-01-01 00:00:00' ELSE c.effective_to END AS effective_to,
       CASE WHEN ch.c_custkey IS NOT NULL THEN false ELSE c.is_current END AS is_current
FROM cur c LEFT JOIN changed ch USING (c_custkey)
UNION ALL
SELECT u.c_custkey, u.c_acctbal, u.c_mktsegment, u.effective_from,
       CAST(NULL AS TIMESTAMP) AS effective_to, true AS is_current
FROM upd u JOIN changed ch USING (c_custkey)
"""


# ---------------------------------------------------------------- B39


def events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-aggregate range join: for every purchase event, the
    count and value of the same user's clicks in the preceding hour
    [ts-1h, ts).  Unlike the as-of join (B13: last click only), this
    aggregates the whole bounded interval.  Scale shape: a hash
    equi-join on user_id carries the range bound as a residual
    predicate — the fact stream shuffles once on the join key and the
    interval filter runs inside the join, never as a cross product."""
    prep(spark)
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("value").alias("click_value"),
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("click_ts") >= F.col("ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("click_ts") < F.col("ts")),
        "left",
    )
    return joined.groupBy("event_id", "user_id", "ts").agg(
        F.count("click_ts").alias("n_clicks"),
        F.coalesce(
            F.sum(F.col("click_value").cast("decimal(18,4)")).cast("double"), F.lit(0.0)
        ).alias("click_value_1h"),
    )


EVENTS_RANGE_JOIN_SQL = """
SELECT p.event_id, p.user_id, p.ts,
       count(c.ts) AS n_clicks,
       coalesce(CAST(CAST(sum(CAST(c.value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE), 0.0) AS click_value_1h
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'click') c
  ON c.user_id = p.user_id
 AND c.ts >= p.ts - INTERVAL 1 HOUR
 AND c.ts < p.ts
GROUP BY p.event_id, p.user_id, p.ts
"""


# ---------------------------------------------------------------- B40


def events_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-vs-exact cardinality audit: per event_type, the exact
    distinct-user count next to a boolean asserting Spark's HLL++
    (approx_count_distinct, rsd=0.05) landed within 3·rsd of it.  The
    approximate value itself is engine-private (not cross-engine
    comparable), so the gated contract is the exact count plus the
    within-bound check — the honest way to gate a sketch.  At 100 TB
    the HLL path is the one that survives: fixed-size state per group,
    no distinct shuffle of raw user_ids."""
    prep(spark)
    ev = load(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users_exact"),
        F.approx_count_distinct("user_id", rsd=0.05).alias("hll"),
    )
    return agg.select(
        "event_type",
        "n_users_exact",
        (
            F.abs(F.col("hll") - F.col("n_users_exact"))
            <= F.lit(0.15) * F.col("n_users_exact").cast("double")
        ).alias("hll_within_3rsd"),
    ).orderBy("event_type")


EVENTS_APPROX_DISTINCT_SQL = """
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_exact,
       true AS hll_within_3rsd
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------- B41


def customer_revenue_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile segmentation: ntile(10) over per-customer order revenue
    within each market segment, rolled up to per-decile stats.  Covers
    the distribution-window family (ntile) the row_number/lag/cumsum
    keys don't.  Ties are broken by c_custkey so the decile assignment
    is deterministic cross-engine.  Scale shape: one shuffle for the
    per-customer agg, one for the segment window — the window state is
    a single pass per segment partition (no buffering beyond ntile's
    counters); the rollup reuses the window's partitioning."""
    prep(spark)
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(F.sum(_dec("o_totalprice")).alias("revenue"))
    joined = cust.join(rev, cust.c_custkey == rev.o_custkey).select(
        "c_mktsegment", "c_custkey", "revenue"
    )
    w = W.partitionBy("c_mktsegment").orderBy(F.col("revenue").desc(), F.col("c_custkey"))
    deciled = joined.withColumn("decile", F.ntile(10).over(w))
    return (
        deciled.groupBy("c_mktsegment", "decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("revenue").cast("double").alias("decile_revenue"),
            F.min("revenue").cast("double").alias("min_revenue"),
            F.max("revenue").cast("double").alias("max_revenue"),
        )
        .orderBy("c_mktsegment", "decile")
    )


CUSTOMER_REVENUE_DECILES_SQL = """
WITH rev AS (
  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,4))) AS revenue
  FROM orders GROUP BY o_custkey
),
d AS (
  SELECT c.c_mktsegment, c.c_custkey, r.revenue,
         CAST(ntile(10) OVER (PARTITION BY c.c_mktsegment
                              ORDER BY r.revenue DESC, c.c_custkey) AS INTEGER) AS decile
  FROM customer c JOIN rev r ON r.o_custkey = c.c_custkey
)
SELECT c_mktsegment, decile, count(*) AS n_customers,
       CAST(CAST(sum(revenue) AS VARCHAR) AS DOUBLE) AS decile_revenue,
       CAST(min(revenue) AS DOUBLE) AS min_revenue,
       CAST(max(revenue) AS DOUBLE) AS max_revenue
FROM d
GROUP BY c_mktsegment, decile
ORDER BY c_mktsegment, decile
"""


# ---------------------------------------------------------------- B42


def events_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per-user consecutive-day activity streaks via
    the classic day − row_number() island key (pure window arithmetic —
    no self-join, no iteration).  Output: days active, streak count,
    longest streak per user.  Scale shape: one distinct shuffle on
    (user_id, day) — already tiny vs raw events — then a user-partition
    window and two flat aggs that reuse its partitioning."""
    prep(spark)
    ev = load(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    w = W.partitionBy("user_id").orderBy("day")
    isl = days.withColumn(
        "grp",
        F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
        - F.row_number().over(w),
    )
    streaks = isl.groupBy("user_id", "grp").agg(F.count(F.lit(1)).alias("streak_len"))
    return (
        streaks.groupBy("user_id")
        .agg(
            F.sum("streak_len").alias("n_days"),
            F.count(F.lit(1)).alias("n_streaks"),
            F.max("streak_len").alias("longest_streak"),
        )
        .orderBy("user_id")
    )


EVENTS_GAP_ISLANDS_SQL = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
isl AS (
  SELECT user_id, day,
         datediff('day', DATE '1970-01-01', day)
           - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
  FROM days
),
streaks AS (
  SELECT user_id, grp, count(*) AS streak_len FROM isl GROUP BY user_id, grp
)
SELECT user_id,
       CAST(sum(streak_len) AS BIGINT) AS n_days,
       count(*) AS n_streaks,
       max(streak_len) AS longest_streak
FROM streaks GROUP BY user_id ORDER BY user_id
"""


# ---------------------------------------------------------------- B43


def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: every purchase is credited to the user's
    most recent non-purchase event at or before it (the as-of operator,
    B13's machinery, pointed at a marketing question), rolled up to
    attributed value per touch type.  Touches are pre-deduplicated to
    one per (user, ts) with a deterministic max_by(event_id) rule — the
    as-of contract requires a unique right side.  Scale shape: one
    shuffle on user_id for the tagged union + window; the rollup is a
    five-row aggregate."""
    prep(spark)
    ev = load(spark, sf_dir, "events")
    touches = (
        ev.filter(F.col("event_type") != "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max_by("event_type", "event_id").alias("event_type"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    j = asof_join(purchases, touches, on="user_id", right_cols=["event_type"])
    return (
        j.groupBy(F.coalesce("event_type_asof", F.lit("none")).alias("touch_type"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias(
                "attributed_value"
            ),
        )
        .orderBy("touch_type")
    )


EVENTS_ATTRIBUTION_SQL = """
WITH touches AS (
  SELECT user_id, ts, arg_max(event_type, event_id) AS event_type
  FROM events WHERE event_type <> 'purchase'
  GROUP BY user_id, ts
),
purch AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'),
attributed AS (
  SELECT p.event_id, p.value,
         (SELECT t.event_type FROM touches t
          WHERE t.user_id = p.user_id AND t.ts <= p.ts
          ORDER BY t.ts DESC LIMIT 1) AS touch_type
  FROM purch p
)
SELECT coalesce(touch_type, 'none') AS touch_type,
       count(*) AS n_purchases,
       CAST(CAST(sum(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS attributed_value
FROM attributed GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------- B44


def customer_percentile_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-standing windows: percent_rank and cume_dist of each
    customer's revenue within their market segment — the distribution
    functions B41's ntile doesn't cover.  Both are rank-based on the
    revenue ORDER alone (ties share a value on both engines), so no
    tie-break column is needed for determinism."""
    prep(spark)
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(F.sum(_dec("o_totalprice")).alias("revenue"))
    joined = cust.join(rev, cust.c_custkey == rev.o_custkey).select(
        "c_mktsegment", "c_custkey", "revenue"
    )
    w = W.partitionBy("c_mktsegment").orderBy("revenue")
    return joined.select(
        "c_mktsegment",
        "c_custkey",
        F.col("revenue").cast("double").alias("revenue"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume_dist"),
    ).orderBy("c_mktsegment", "c_custkey")


CUSTOMER_PERCENTILE_RANK_SQL = """
WITH rev AS (
  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,4))) AS revenue
  FROM orders GROUP BY o_custkey
)
SELECT c.c_mktsegment, c.c_custkey,
       CAST(r.revenue AS DOUBLE) AS revenue,
       percent_rank() OVER (PARTITION BY c.c_mktsegment ORDER BY r.revenue) AS pct_rank,
       cume_dist() OVER (PARTITION BY c.c_mktsegment ORDER BY r.revenue) AS cume_dist
FROM customer c JOIN rev r ON r.o_custkey = c.c_custkey
ORDER BY c.c_mktsegment, c.c_custkey
"""


# ---------------------------------------------------------------- B45


def revenue_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets: revenue over every combination of (market
    segment, order priority) including both one-dimension margins and
    the grand total — the full-lattice complement of B7's ROLLUP.
    Grouping-set aggregation is a single shuffle (Spark expands the
    lattice map-side); NULL group keys are disambiguated with explicit
    GROUPING() flags, coalesced to '(all)' so the contract has no NULL
    semantics to argue about."""
    prep(spark)
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = load(spark, sf_dir, "orders")
    j = orders.join(cust, orders.o_custkey == cust.c_custkey)
    return (
        j.cube("c_mktsegment", "o_orderpriority")
        .agg(
            F.grouping("c_mktsegment").cast("integer").alias("is_seg_margin"),
            F.grouping("o_orderpriority").cast("integer").alias("is_prio_margin"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("revenue"),
        )
        .select(
            F.coalesce("c_mktsegment", F.lit("(all)")).alias("mktsegment"),
            F.coalesce("o_orderpriority", F.lit("(all)")).alias("orderpriority"),
            "is_seg_margin",
            "is_prio_margin",
            "n_orders",
            "revenue",
        )
        .orderBy("mktsegment", "orderpriority")
    )


REVENUE_CUBE_SQL = """
SELECT coalesce(c_mktsegment, '(all)') AS mktsegment,
       coalesce(o_orderpriority, '(all)') AS orderpriority,
       CAST(GROUPING(c_mktsegment) AS INTEGER) AS is_seg_margin,
       CAST(GROUPING(o_orderpriority) AS INTEGER) AS is_prio_margin,
       count(*) AS n_orders,
       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY CUBE (c_mktsegment, o_orderpriority)
ORDER BY mktsegment, orderpriority
"""


# ---------------------------------------------------------------- B46


def order_year_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational set operators as first-class citizens: the 1994 vs
    1995 customer cohorts compared with INTERSECT / EXCEPT (retained,
    churned, acquired).  Distinct-key inputs make INTERSECT/EXCEPT and
    their ALL variants coincide, so the contract is unambiguous.  Scale
    shape: set ops hash-shuffle on the full row — here a single bigint
    key — and AQE picks the build side."""
    prep(spark)
    orders = load(spark, sf_dir, "orders")

    def cohort(year: int) -> DataFrame:
        return (
            orders.filter(F.year("o_orderdate") == year)
            .select("o_custkey")
            .distinct()
        )

    y94, y95 = cohort(1994), cohort(1995)

    def tagged(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_customers")).select(
            F.lit(name).alias("cohort"), "n_customers"
        )

    return (
        tagged("both", y94.intersect(y95))
        .unionByName(tagged("only_1994", y94.subtract(y95)))
        .unionByName(tagged("only_1995", y95.subtract(y94)))
        .orderBy("cohort")
    )


ORDER_YEAR_SET_OPS_SQL = """
WITH y94 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1994),
     y95 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995)
SELECT 'both' AS cohort, count(*) AS n_customers
FROM (SELECT * FROM y94 INTERSECT SELECT * FROM y95)
UNION ALL
SELECT 'only_1994', count(*)
FROM (SELECT * FROM y94 EXCEPT SELECT * FROM y95)
UNION ALL
SELECT 'only_1995', count(*)
FROM (SELECT * FROM y95 EXCEPT SELECT * FROM y94)
ORDER BY cohort
"""


EVENTS_TRANSITION_SQL = """
WITH steps AS (
  SELECT user_id, event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
  FROM events
),
counts AS (
  SELECT from_type, to_type, count(*) AS n_transitions
  FROM steps WHERE to_type IS NOT NULL
  GROUP BY from_type, to_type
),
totals AS (
  SELECT from_type, CAST(sum(n_transitions) AS BIGINT) AS n_from
  FROM counts GROUP BY from_type
)
SELECT c.from_type, c.to_type, c.n_transitions,
       CAST(c.n_transitions AS DOUBLE) / CAST(t.n_from AS DOUBLE) AS p_transition
FROM counts c JOIN totals t USING (from_type)
ORDER BY from_type, to_type
"""

# ---------------------------------------------------------------- B47


def events_ewma_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-weighted exponential moving average of hourly event volume
    per type: ewma = (8·c₀ + 4·c₁ + 2·c₂ + 1·c₃) / 15 over the current
    and three trailing hourly buckets (row-lag semantics; the hour grid
    is dense in this corpus).  Integer weights keep the numerator an
    exact BIGINT in both engines; ONE double division at the end makes
    the score bit-equal at any parallelism.

    Scale shape: the hourly pre-aggregation collapses the raw stream to
    |types|×|hours| rows BEFORE the window (partial agg map-side), so
    the window shuffle moves a tiny frame no matter the corpus size."""
    prep(spark)
    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = W.partitionBy("event_type").orderBy("hour")
    num = (
        F.col("n_events") * 8
        + F.lag("n_events", 1, 0).over(w) * 4
        + F.lag("n_events", 2, 0).over(w) * 2
        + F.lag("n_events", 3, 0).over(w)
    )
    return (
        hourly.select(
            "event_type",
            "hour",
            "n_events",
            (num.cast("double") / F.lit(15.0)).alias("ewma"),
        )
        .orderBy("event_type", "hour")
    )


EVENTS_EWMA_SQL = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n_events
  FROM events GROUP BY event_type, date_trunc('hour', ts)
)
SELECT event_type, hour, n_events,
       CAST(8 * n_events
            + 4 * lag(n_events, 1, 0) OVER w
            + 2 * lag(n_events, 2, 0) OVER w
            + 1 * lag(n_events, 3, 0) OVER w AS DOUBLE) / CAST(15.0 AS DOUBLE) AS ewma
FROM hourly
WINDOW w AS (PARTITION BY event_type ORDER BY hour)
ORDER BY event_type, hour
"""

# ---------------------------------------------------------------- B50


def events_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew audit: per event_type, the per-user row-count
    distribution summarized as max share and HHI concentration
    (Σcᵢ²/total² — 1/n_keys for uniform keys, →1 for one hot key).
    This is the measurement that decides whether a join/agg key needs
    salting (functions/skew.py) or AQE skew handling BEFORE a 100 TB
    shuffle hits one executor.  Two-level integer aggregation, exact at
    any parallelism; one double division per output row."""
    prep(spark)
    ev = load(spark, sf_dir, "events")
    per_key = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        per_key.groupBy("event_type")
        .agg(
            F.sum("c").alias("n_rows"),
            F.count(F.lit(1)).alias("n_keys"),
            F.max("c").alias("max_key_rows"),
            F.sum(F.col("c") * F.col("c")).alias("_ss"),
        )
        .select(
            "event_type",
            "n_rows",
            "n_keys",
            "max_key_rows",
            (F.col("max_key_rows").cast("double") / F.col("n_rows").cast("double")).alias(
                "top_share"
            ),
            (
                F.col("_ss").cast("double")
                / (F.col("n_rows").cast("double") * F.col("n_rows").cast("double"))
            ).alias("hhi"),
        )
        .orderBy("event_type")
    )


EVENTS_SKEW_AUDIT_SQL = """
WITH per_key AS (
  SELECT event_type, user_id, count(*) AS c
  FROM events GROUP BY event_type, user_id
)
SELECT event_type,
       CAST(sum(c) AS BIGINT) AS n_rows,
       count(*) AS n_keys,
       max(c) AS max_key_rows,
       CAST(max(c) AS DOUBLE) / CAST(CAST(sum(c) AS VARCHAR) AS DOUBLE) AS top_share,
       CAST(CAST(sum(c * c) AS VARCHAR) AS DOUBLE) / (CAST(CAST(sum(c) AS VARCHAR) AS DOUBLE) * CAST(CAST(sum(c) AS VARCHAR) AS DOUBLE)) AS hhi
FROM per_key
GROUP BY event_type
ORDER BY event_type
"""

# ---------------------------------------------------------------- B52

_LATE_PARTS = 32  # simulated source partitions (kafka-style)


def events_lateness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-lateness audit — the measurement that sizes a streaming
    watermark: within each simulated source partition (user_id mod 32;
    watermarks advance per source partition), how far behind the
    partition's event-time high-water mark does each event arrive
    (arrival order = event_id)?  Reported as a lateness histogram with
    per-bucket share.  The per-partition cummax window parallelizes
    across partitions — no global ordered window, so the audit itself
    scales.  Pick the watermark at the bucket covering ~99% of rows."""
    prep(spark)
    ev = load(spark, sf_dir, "events")
    w = (
        W.partitionBy(F.pmod(F.col("user_id"), F.lit(_LATE_PARTS)))
        .orderBy("event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    # lateness compared in raw MICROS: no division, so no float-cast
    # rounding divergence between engines (DuckDB CAST rounds, Spark
    # truncates) and no precision loss
    late_us = F.max(F.unix_micros("ts")).over(w) - F.unix_micros("ts")
    bucket = (
        F.when(late_us.isNull() | (late_us <= 0), "0_on_time")
        .when(late_us < 60 * 1_000_000, "1_under_1m")
        .when(late_us < 300 * 1_000_000, "2_under_5m")
        .when(late_us < 1800 * 1_000_000, "3_under_30m")
        .otherwise("4_over_30m")
    )
    total = ev.agg(F.count(F.lit(1)).alias("_total"))
    return (
        ev.select(bucket.alias("lateness_bucket"))
        .groupBy("lateness_bucket")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .crossJoin(F.broadcast(total))
        .select(
            "lateness_bucket",
            "n_events",
            (F.col("n_events").cast("double") / F.col("_total").cast("double")).alias(
                "share"
            ),
        )
        .orderBy("lateness_bucket")
    )


EVENTS_LATENESS_SQL = f"""
WITH hw AS (
  SELECT event_id, ts,
         max(epoch_us(ts)) OVER (
           PARTITION BY user_id % {_LATE_PARTS} ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS hw_us
  FROM events
),
late AS (
  SELECT CASE
           WHEN hw_us IS NULL OR hw_us - epoch_us(ts) <= 0 THEN '0_on_time'
           WHEN hw_us - epoch_us(ts) < 60000000 THEN '1_under_1m'
           WHEN hw_us - epoch_us(ts) < 300000000 THEN '2_under_5m'
           WHEN hw_us - epoch_us(ts) < 1800000000 THEN '3_under_30m'
           ELSE '4_over_30m'
         END AS lateness_bucket
  FROM hw
)
SELECT lateness_bucket, count(*) AS n_events,
       CAST(count(*) AS DOUBLE) / (SELECT CAST(count(*) AS DOUBLE) FROM events) AS share
FROM late
GROUP BY lateness_bucket
ORDER BY lateness_bucket
"""

# ---------------------------------------------------------------- B55


def events_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props via the VARIANT type (Spark 4): parse the
    JSON once into variant, then typed `try_variant_get` extractions —
    the engine-native path for the reference tool's whole domain
    (JSON → typed columns).  Against B12's per-field get_json_object
    re-parse, variant parses each document ONCE into a binary form and
    every extraction is a cheap path lookup — the difference compounds
    with fields extracted per row.  Malformed/missing paths yield NULL
    (try_ semantics), counted explicitly."""
    prep(spark)
    ev = load(spark, sf_dir, "events")
    # try_parse_json (not parse_json): a malformed document must yield
    # NULL — matching this docstring's try_ contract and the DuckDB
    # oracle's TRY_CAST path — instead of failing the whole query.
    k = F.try_variant_get(F.try_parse_json(F.col("props")), "$.k", "int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count("k").alias("n_with_k"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


EVENTS_VARIANT_PROPS_SQL = """
WITH x AS (
  SELECT event_type, TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
  FROM events
)
SELECT event_type,
       count(*) AS n_events,
       count(k) AS n_with_k,
       CAST(sum(k) AS BIGINT) AS sum_k,
       min(k) AS min_k,
       max(k) AS max_k
FROM x
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------- B62


def orders_rolling_window_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-30-day order revenue per customer via a TIME-RANGE
    window frame — the frame type (RANGE BETWEEN n PRECEDING on an
    event-time axis) the B-series hadn't covered: unlike a rows frame,
    peers at the same timestamp share one value and gaps in the
    calendar shrink the frame.

    Portability: Spark's rangeBetween needs a numeric order key, so the
    frame runs over unix epoch seconds — the oracle orders by the same
    integer, making the frame boundary arithmetic identical.  Sums stay
    in DECIMAL inside the frame; one double cast at the end."""
    prep(spark)
    orders = load(spark, sf_dir, "orders")
    epoch = F.unix_timestamp("o_orderdate").alias("epoch_s")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("epoch_s")
        .rangeBetween(-30 * 86400, 0)
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            epoch,
            F.col("o_totalprice").cast("decimal(18,4)").alias("price_dec"),
        )
        .select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.sum("price_dec").over(w).cast("double").alias("rolling_30d_revenue"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


ORDERS_ROLLING_WINDOW_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
         PARTITION BY o_custkey
         ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
         RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW
       ) AS VARCHAR) AS DOUBLE) AS rolling_30d_revenue
FROM orders
ORDER BY o_custkey, o_orderkey
"""


# ---------------------------------------------------------------- B63


def events_topk_sketch_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 ``approx_top_k`` sketch audit in its EXACT regime: the
    frequent-items sketch tracks up to 10,000 items by default, so on a
    domain it fully covers (event_type, |domain| = 5) its counts are
    exact and deterministic — the audit joins the sketch output back to
    the exact per-type counts and gates item-by-item equality, the same
    honesty pattern as the HLL++ audit (B40).  At 100 TB the sketch is
    the right tool precisely because it keeps this exactness while
    merging map-side (bounded memory per partition, one shuffle of
    sketch state instead of a full groupBy when the domain is bounded);
    when the domain outgrows the tracked capacity the counts degrade to
    overestimates — which this gate would catch as a hash mismatch."""
    prep(spark)
    ev = load(spark, sf_dir, "events")
    sketch = (
        ev.agg(F.expr("approx_top_k(event_type, 5)").alias("tk"))
        .select(F.explode("tk").alias("e"))
        .select(F.col("e.item").alias("event_type"), F.col("e.count").alias("approx_n"))
    )
    exact = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("exact_n"))
    w = W.orderBy(F.col("exact_n").desc(), F.col("event_type"))
    return (
        exact.join(F.broadcast(sketch), "event_type")
        .select(
            F.row_number().over(w).alias("rank"),
            "event_type",
            "approx_n",
            "exact_n",
            (F.col("approx_n") == F.col("exact_n")).alias("is_exact"),
        )
        .orderBy("rank")
    )


EVENTS_TOPK_SKETCH_SQL = """
WITH exact AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS exact_n
  FROM events GROUP BY event_type
)
SELECT row_number() OVER (ORDER BY exact_n DESC, event_type) AS rank,
       event_type,
       exact_n AS approx_n,
       exact_n,
       TRUE AS is_exact
FROM exact
ORDER BY rank
"""


# ---------------------------------------------------------------- B64

_PYSOURCE_N, _PYSOURCE_USERS = 5000, 200


def pysource_events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query over the Spark 4 Python Data Source API connector
    (sources/pysource.py): the md5-deterministic synthetic-events
    source read through `spark.read.format("synthetic_events")`, rolled
    up per event_type.  The oracle replays the connector's generator
    arithmetic in DuckDB (range() + the same md5-derived fields), so
    the gate proves the connector delivers byte-identical rows across
    engines and partitionings — the contract a custom connector must
    honor before it can feed a 100-TB pipeline.  Value sums follow the
    decimal-exact convention; everything else is integer-exact."""
    prep(spark)
    from ..sources import pysource

    pysource.register(spark)
    ev = (
        spark.read.format("synthetic_events")
        .option("n", _PYSOURCE_N)
        .option("n_users", _PYSOURCE_USERS)
        .option("partitions", 8)
        .load()
    )
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
            F.min("ts_us").alias("min_ts_us"),
            F.max("event_id").alias("max_event_id"),
        )
        .orderBy("event_type")
    )


def _pysource_rollup_sql() -> str:
    from ..sources.pysource import sql_generator_cte

    return f"""
WITH gen AS ({sql_generator_cte(_PYSOURCE_N, _PYSOURCE_USERS)})
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(CAST(sum(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS total_value,
       CAST(min(ts_us) AS BIGINT) AS min_ts_us,
       CAST(max(event_id) AS BIGINT) AS max_event_id
FROM gen
GROUP BY event_type
ORDER BY event_type
"""


PYSOURCE_EVENTS_ROLLUP_SQL = _pysource_rollup_sql()


# ------------------------------------------------------------- B67
# Time-series gap-fill: the hypertable/rollup primitive OLAP stores
# ship natively (timescale gapfill / flink fill) — a calendar spine
# join + LOCF imputation, no UDF.


def events_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly per-type series on a dense calendar spine with
    last-observation-carried-forward imputation.

    Spine = sequence(min_hour, max_hour) × distinct event_type — built
    from two 1-row/row-tiny frames, so both joins broadcast; the only
    data-sized shuffle is the hourly pre-aggregation.  Missing hours
    get n_events=0 and a LOCF'd hourly_max via last(ignorenulls) over a
    rows-unbounded-preceding frame (per-type partition — no global
    window).  All imputed values are exact copies (no interpolation
    arithmetic), so the result is bit-portable across engines.
    """
    prep(spark)
    ev = load(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    hourly = (
        ev.groupBy(F.col("event_type"), hour.alias("hour_ts"))
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.max("value").alias("hourly_max"),
        )
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("min_h"),
        F.date_trunc("hour", F.max("ts")).alias("max_h"),
    )
    types = ev.select("event_type").distinct()
    spine = (
        types.crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.sequence("min_h", "max_h", F.expr("INTERVAL 1 HOUR"))
            ).alias("hour_ts"),
        )
    )
    locf_w = (
        W.partitionBy("event_type")
        .orderBy("hour_ts")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        spine.join(hourly, ["event_type", "hour_ts"], "left")
        .select(
            "event_type",
            "hour_ts",
            F.coalesce("n_obs", F.lit(0)).alias("n_events"),
            "hourly_max",
            F.last("hourly_max", ignorenulls=True).over(locf_w).alias("locf_max"),
            F.col("n_obs").isNull().alias("is_gap"),
        )
        .orderBy("event_type", "hour_ts")
    )


EVENTS_GAPFILL_SQL = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour_ts,
         count(*) AS n_obs, max(value) AS hourly_max
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT date_trunc('hour', min(ts)) AS min_h, date_trunc('hour', max(ts)) AS max_h
  FROM events
),
hours AS (
  -- scalar generate_series returns a LIST and accepts column args
  -- (the table-function form requires constants)
  SELECT unnest(generate_series(min_h, max_h, INTERVAL 1 HOUR)) AS hour_ts
  FROM bounds
),
spine AS (
  SELECT t.event_type, hours.hour_ts
  FROM (SELECT DISTINCT event_type FROM events) t, hours
)
SELECT s.event_type,
       s.hour_ts,
       COALESCE(h.n_obs, 0) AS n_events,
       h.hourly_max,
       last_value(h.hourly_max IGNORE NULLS) OVER (
         PARTITION BY s.event_type ORDER BY s.hour_ts
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_max,
       h.n_obs IS NULL AS is_gap
FROM spine s
LEFT JOIN hourly h ON h.event_type = s.event_type AND h.hour_ts = s.hour_ts
ORDER BY s.event_type, s.hour_ts
"""


# ------------------------------------------------------------- B68
# Sweep-line interval concurrency — the "how many X were open at once"
# shape (concurrent sessions / overlapping jobs), answered without an
# interval self-join.


def events_concurrency_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent 10-minute event intervals per type via the
    classic endpoint sweep: +1 at start, −1 at end, running sum, max.

    The naive formulation is an interval self-join (O(n²) per type);
    the sweep is O(n log n) — endpoints shuffle ONCE on event_type and
    the running sum is a per-type window, no join at all.  Half-open
    [start, end) semantics via the (t, delta) sort: ends order before
    coincident starts.  Tie-safety: rows tied on (t, delta) produce
    the same multiset of running values under any secondary order, so
    max and argmax-min-t are deterministic.

    Scale posture: per-type partitions bound window state; at 100 TB
    with few types, re-key the sweep by (type, day-bucket) and stitch
    bucket boundaries with per-bucket offsets (documented variant).
    """
    prep(spark)
    ev = load(spark, sf_dir, "events")
    return concurrency_sweep(ev, "INTERVAL 10 MINUTES")


def concurrency_sweep(ev: DataFrame, interval: str) -> DataFrame:
    """Core sweep over (event_type, ts) rows; each row holds an
    ``interval``-long half-open slot.  Property-tested against a naive
    per-start overlap count (tests/test_properties.py)."""
    starts = ev.select(
        "event_type", F.col("ts").alias("t"), F.lit(1).alias("d")
    )
    ends = ev.select(
        "event_type",
        (F.col("ts") + F.expr(interval)).alias("t"),
        F.lit(-1).alias("d"),
    )
    sweep_w = (
        W.partitionBy("event_type")
        .orderBy("t", "d")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    runs = starts.unionByName(ends).withColumn("run", F.sum("d").over(sweep_w))
    mx = runs.withColumn(
        "mx", F.max("run").over(W.partitionBy("event_type"))
    )
    return (
        mx.groupBy("event_type")
        .agg(
            (F.count(F.lit(1)) / 2).cast("bigint").alias("n_intervals"),
            F.max("run").alias("max_concurrent"),
            F.min(F.when(F.col("run") == F.col("mx"), F.col("t"))).alias("peak_ts"),
        )
        .orderBy("event_type")
    )


EVENTS_CONCURRENCY_SQL = """
WITH ep AS (
  SELECT event_type, ts AS t, 1 AS d FROM events
  UNION ALL
  SELECT event_type, ts + INTERVAL 10 MINUTE AS t, -1 AS d FROM events
),
runs AS (
  SELECT event_type, t, d,
         sum(d) OVER (PARTITION BY event_type ORDER BY t, d
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
  FROM ep
),
mx AS (
  SELECT *, max(run) OVER (PARTITION BY event_type) AS mxr FROM runs
)
SELECT event_type,
       CAST(count(*) / 2 AS BIGINT) AS n_intervals,
       CAST(max(run) AS BIGINT) AS max_concurrent,
       min(CASE WHEN run = mxr THEN t END) AS peak_ts
FROM mx
GROUP BY event_type
ORDER BY event_type
"""


# ------------------------------------------------------------- B71
# Mergeable HLL datasketches (Spark 4 / Apache DataSketches): THE
# distributed distinct-counting primitive — per-partition sketches
# merge associatively, so a 1000-executor count-distinct needs one
# tiny-sketch shuffle, and pre-aggregated sketches can roll up later
# without the raw data (the cube/rollup use case HLL exists for).


def events_hll_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type user sketches + their UNION re-estimate, audited in
    B40's honesty pattern: the sketch estimate is not oracle-portable
    (DuckDB cannot replay DataSketches), so the gated columns are the
    EXACT counts plus within-tolerance flags the oracle asserts true —
    lgConfigK=12 ⇒ rsd ≈ 1.04/√2¹² ≈ 1.6%, gated at 3·rsd (≈5%).

    The union row is the point of the exercise: its estimate comes
    from MERGING the per-type sketches (hll_union_agg), never
    re-scanning raw rows — what makes sketches the 100 TB answer."""
    prep(spark)
    ev = load(spark, sf_dir, "events")
    tol = 3 * 1.04 / (2**12) ** 0.5
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count_distinct("user_id").alias("exact_users"),
    )
    typed = per_type.select(
        "event_type",
        "exact_users",
        (
            F.abs(
                F.hll_sketch_estimate("sk").cast("double") - F.col("exact_users")
            )
            <= F.col("exact_users") * tol
        ).alias("within_tol"),
    )
    union_exact = ev.agg(F.count_distinct("user_id").alias("exact_users"))
    union_row = (
        per_type.agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_all")
        )
        .crossJoin(F.broadcast(union_exact))
        .select(
            F.lit("__union__").alias("event_type"),
            "exact_users",
            (
                F.abs(F.col("est_all").cast("double") - F.col("exact_users"))
                <= F.col("exact_users") * tol
            ).alias("within_tol"),
        )
    )
    return typed.unionByName(union_row).orderBy("event_type")


EVENTS_HLL_SKETCH_SQL = """
SELECT event_type, exact_users, true AS within_tol
FROM (
  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users
  FROM events GROUP BY event_type
  UNION ALL
  SELECT '__union__', CAST(count(DISTINCT user_id) AS BIGINT) FROM events
)
ORDER BY event_type
"""


# ------------------------------------------------------------- B73
# New-vs-returning decomposition — the growth-analytics staple that
# needs a DISTINCT-over-time-prefix, answered with a first-seen flag
# instead of an (unsupported) windowed COUNT DISTINCT.


def orders_new_customers_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per month: orders from first-ever customers vs returning ones,
    plus the running total of acquired customers.

    The trick: ``row_number() = 1`` over (customer, orderdate, okey)
    marks each customer's first order — one window — and a month-level
    cumulative sum of those flags IS the running distinct-customer
    count, which a windowed COUNT(DISTINCT) cannot express in either
    engine.  Unique (date, orderkey) tiebreak keeps the flag
    deterministic under same-day first orders.
    """
    prep(spark)
    orders = load(spark, sf_dir, "orders")
    first_w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    flagged = orders.select(
        F.date_trunc("month", F.col("o_orderdate")).alias("month"),
        (F.row_number().over(first_w) == 1).cast("long").alias("is_first"),
    )
    monthly = flagged.groupBy("month").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("is_first").alias("new_customers"),
    )
    cum_w = W.orderBy("month").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        monthly.select(
            "month",
            "n_orders",
            "new_customers",
            (F.col("n_orders") - F.col("new_customers")).alias("returning_orders"),
            F.sum("new_customers").over(cum_w).alias("customers_to_date"),
        )
        .orderBy("month")
    )


ORDERS_NEW_CUSTOMERS_SQL = """
WITH flagged AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
         CASE WHEN row_number() OVER (
                PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) = 1
              THEN 1 ELSE 0 END AS is_first
  FROM orders
),
monthly AS (
  SELECT month, count(*) AS n_orders,
         CAST(sum(is_first) AS BIGINT) AS new_customers
  FROM flagged GROUP BY month
)
SELECT month, n_orders, new_customers,
       n_orders - new_customers AS returning_orders,
       CAST(sum(new_customers) OVER (ORDER BY month
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS customers_to_date
FROM monthly
ORDER BY month
"""


# ------------------------------------------------------------- B77
# Mergeable KLL quantile sketches (Spark 4 DataSketches) — the
# distributed-percentile primitive pairing B71's HLL (distincts) and
# B63's frequent items: per-group sketches union into rollups WITHOUT
# rescanning raw rows.  Audited in B40's honesty pattern: sketch
# internals are partitioning-dependent, so the gated output carries
# engine-exact facts (counts, a rank-based exact median) plus
# guarantee-backed booleans, never raw sketch estimates.


def events_kll_quantile_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type KLL(value) sketches + a MERGED overall sketch, audited:
    ``sk_n`` must equal the exact row count (the sketch saw every row —
    deterministic), and the sketch's p50 estimate must have a true rank
    whose tie-interval [#(<est)/n, #(≤est)/n] intersects 0.5 ± 0.05 —
    KLL's rank-error guarantee at k=200 is ~1.6%, so the boolean is
    robustly TRUE under any partitioning while an implementation bug
    (dropped rows, wrong merge) flips it.  The exact median is
    rank-based (a value FROM the data at rank ⌊(n+1)/2⌋ under the
    (value, event_id) total order — no float interpolation), so both
    engines agree bit-for-bit.

    Scale shape: sketches partial-aggregate map-side; the merged
    rollup unions |types| sketches, never raw rows — the 100 TB
    re-aggregation path.
    """
    prep(spark)
    ev = load(spark, sf_dir, "events").select(
        "event_id", "event_type", F.col("value").cast("double").alias("v")
    )
    per_type = ev.groupBy("event_type").agg(
        F.kll_sketch_agg_double("v").alias("sk"),
        F.count(F.lit(1)).alias("n"),
    )
    merged = per_type.agg(
        F.kll_merge_agg_double("sk").alias("sk"),
        F.sum("n").alias("n"),
    ).select(F.lit("__all__").alias("event_type"), "sk", "n")
    w = W.partitionBy("scope").orderBy("v", "event_id")
    ranked = ev.select(F.col("event_type").alias("scope"), "v", "event_id").unionByName(
        ev.select(F.lit("__all__").alias("scope"), "v", "event_id")
    ).withColumn("rn", F.row_number().over(w))
    sizes = ranked.groupBy("scope").agg(F.count(F.lit(1)).alias("n_rows"))
    medians = (
        ranked.join(F.broadcast(sizes), "scope")
        .filter(F.col("rn") == F.floor((F.col("n_rows") + 1) / 2))
        .select("scope", F.col("v").alias("exact_median"))
    )
    sketches = per_type.select("event_type", "sk", "n").unionByName(merged)
    est = sketches.select(
        "event_type",
        "n",
        F.kll_sketch_get_n_double("sk").alias("sk_n"),
        F.kll_sketch_get_quantile_double("sk", F.lit(0.5)).alias("est_p50"),
    )
    withm = est.join(
        F.broadcast(medians.withColumnRenamed("scope", "event_type")), "event_type"
    )
    # true-rank tie interval of the (partitioning-dependent) estimate,
    # computed exactly; only the guarantee-backed boolean is emitted
    rk = (
        ev.select(F.col("event_type").alias("scope"), "v")
        .unionByName(ev.select(F.lit("__all__").alias("scope"), "v"))
        .join(
            F.broadcast(withm.select(F.col("event_type").alias("scope"), "est_p50")),
            "scope",
        )
        .groupBy("scope")
        .agg(
            F.sum((F.col("v") < F.col("est_p50")).cast("long")).alias("n_lt"),
            F.sum((F.col("v") <= F.col("est_p50")).cast("long")).alias("n_le"),
        )
    )
    return (
        withm.join(F.broadcast(rk.withColumnRenamed("scope", "event_type")), "event_type")
        .select(
            "event_type",
            "n",
            (F.col("sk_n") == F.col("n")).alias("sketch_saw_every_row"),
            "exact_median",
            (
                (F.col("n_lt").cast("double") / F.col("n") <= 0.55)
                & (F.col("n_le").cast("double") / F.col("n") >= 0.45)
            ).alias("p50_within_bound"),
        )
        .orderBy("event_type")
    )


EVENTS_KLL_QUANTILE_SQL = """
WITH base AS (
  SELECT event_type AS scope, value AS v, event_id FROM events
  UNION ALL
  SELECT '__all__', value, event_id FROM events
),
ranked AS (
  SELECT scope, v,
         row_number() OVER (PARTITION BY scope ORDER BY v, event_id) AS rn,
         count(*) OVER (PARTITION BY scope) AS n_rows
  FROM base
)
SELECT scope AS event_type,
       CAST(n_rows AS BIGINT) AS n,
       TRUE AS sketch_saw_every_row,
       v AS exact_median,
       TRUE AS p50_within_bound
FROM ranked
WHERE rn = CAST(floor((n_rows + 1) / 2) AS BIGINT)
ORDER BY event_type
"""


# ------------------------------------------------------------- B78
# Theta sketches (Spark 4 DataSketches) — the SET-OPERATION sketch: HLL
# can only union, theta also intersects and differences, which is what
# cohort-overlap questions ("users who viewed AND purchased") need at
# 100 TB without an exact distinct join.


def events_theta_set_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type theta sketches over user_id, audited on every
    type pair: exact distinct-user intersection and union (key-
    cardinality semi-join work, never row×row) vs the sketch
    estimates, which in the sub-nominal EXACT REGIME (pair union ≤
    2^14 nominal entries, so neither input sketch nor the union ever
    sampled — tracked like B63's top-k audit) must match to the
    integer.  ``in_exact_regime`` is computed FROM THE DATA
    (exact_union ≤ 16384) on both engines, and the match booleans are
    guarded by it (trivially TRUE outside the regime, guarantee-backed
    inside), so the audit stays green at sf10's ~150k users instead of
    hash-mismatching a hardcoded-TRUE oracle (ADVICE r5).

    Scale shape: sketches partial-aggregate map-side; pair math
    operates on |types|² sketch pairs, never on users.
    """
    prep(spark)
    ev = load(spark, sf_dir, "events").select("event_type", "user_id")
    per_type = ev.groupBy("event_type").agg(
        F.theta_sketch_agg(F.col("user_id"), 14).alias("th"),
        F.countDistinct("user_id").alias("n_users"),
    )
    a = per_type.select(
        F.col("event_type").alias("type_a"), F.col("th").alias("sa"),
        F.col("n_users").alias("n_users_a"),
    )
    b = per_type.select(
        F.col("event_type").alias("type_b"), F.col("th").alias("sb"),
        F.col("n_users").alias("n_users_b"),
    )
    pairs = a.join(b, F.col("type_a") < F.col("type_b"))
    distinct_tu = ev.distinct()
    ea = distinct_tu.select(F.col("event_type").alias("type_a"), "user_id")
    eb = distinct_tu.select(F.col("event_type").alias("type_b"), "user_id")
    exact = (
        ea.join(eb, ["user_id"])
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("exact_inter"))
    )
    est = pairs.select(
        "type_a", "type_b", "n_users_a", "n_users_b",
        F.theta_sketch_estimate(F.theta_intersection("sa", "sb")).alias("est_inter"),
        F.theta_sketch_estimate(F.theta_union("sa", "sb")).alias("est_union"),
    )
    joined = est.join(exact, ["type_a", "type_b"], "left").select(
        "type_a", "type_b", "n_users_a", "n_users_b",
        F.coalesce("exact_inter", F.lit(0)).alias("exact_inter"),
        (F.col("n_users_a") + F.col("n_users_b")
         - F.coalesce("exact_inter", F.lit(0))).alias("exact_union"),
        "est_inter", "est_union",
    )
    regime = F.col("exact_union") <= F.lit(1 << 14)
    return joined.select(
        "type_a", "type_b", "n_users_a", "n_users_b",
        "exact_inter", "exact_union",
        regime.alias("in_exact_regime"),
        (~regime | (F.col("est_inter") == F.col("exact_inter")))
        .alias("inter_exact_regime_match"),
        (~regime | (F.col("est_union") == F.col("exact_union")))
        .alias("union_exact_regime_match"),
    ).orderBy("type_a", "type_b")


EVENTS_THETA_SET_SQL = """
WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
counts AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_users FROM tu GROUP BY 1),
inter AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(count(*) AS BIGINT) AS exact_inter
  FROM tu a JOIN tu b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT ca.event_type AS type_a, cb.event_type AS type_b,
       ca.n_users AS n_users_a, cb.n_users AS n_users_b,
       COALESCE(i.exact_inter, 0) AS exact_inter,
       ca.n_users + cb.n_users - COALESCE(i.exact_inter, 0) AS exact_union,
       ca.n_users + cb.n_users - COALESCE(i.exact_inter, 0) <= 16384
         AS in_exact_regime,
       TRUE AS inter_exact_regime_match,
       TRUE AS union_exact_regime_match
FROM counts ca
JOIN counts cb ON ca.event_type < cb.event_type
LEFT JOIN inter i ON i.type_a = ca.event_type AND i.type_b = cb.event_type
ORDER BY type_a, type_b
"""


# ------------------------------------------------------------- B80
# Linear-interpolation gapfill — B67's LOCF sibling for metrics where
# holding the last value flat misrepresents a trend (sensor readings,
# spend counters).  Exactness discipline: interpolate INTEGER cent
# sums over INTEGER hour indices, emitting the exact fixed-point
# numerator/denominator plus one double division (the events_ewma
# pattern) so both engines agree bit-for-bit.


def events_gapfill_lerp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly per-type value sums on the dense spine with LINEAR
    interpolation across gaps: a gap hour t between observations
    (t0,v0) and (t1,v1) gets (v0·(t1−t) + v1·(t−t0)) / (t1−t0) — value
    sums are fixed-point ×10⁴ integers (quantized THROUGH DECIMAL: a
    raw double→BIGINT cast truncates on Spark but rounds on DuckDB)
    and hour indices are integers, so the numerator is exact and the
    single division is the only float op.  Hours before the first /
    after the last observation have no bracketing pair and stay NULL
    (no extrapolation).  Same scale shape as B67: the only data-sized
    shuffle is the hourly pre-agg; spine joins broadcast."""
    prep(spark)
    ev = load(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    hourly = ev.groupBy(F.col("event_type"), hour.alias("hour_ts")).agg(
        F.count(F.lit(1)).alias("n_obs"),
        (F.sum(F.col("value").cast("decimal(18,4)")) * 10000)
        .cast("long")
        .alias("sum_fp4"),
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("min_h"),
        F.date_trunc("hour", F.max("ts")).alias("max_h"),
    )
    types = ev.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.explode(F.sequence("min_h", "max_h", F.expr("INTERVAL 1 HOUR"))).alias(
            "hour_ts"
        ),
    )
    joined = spine.join(hourly, ["event_type", "hour_ts"], "left").withColumn(
        "h_idx", (F.unix_timestamp("hour_ts") / 3600).cast("long")
    )
    obs_idx = F.when(F.col("sum_fp4").isNotNull(), F.col("h_idx"))
    back = (
        W.partitionBy("event_type")
        .orderBy("hour_ts")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    fwd = (
        W.partitionBy("event_type")
        .orderBy("hour_ts")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    prev_v = F.last("sum_fp4", ignorenulls=True).over(back)
    prev_t = F.last(obs_idx, ignorenulls=True).over(back)
    next_v = F.first("sum_fp4", ignorenulls=True).over(fwd)
    next_t = F.first(obs_idx, ignorenulls=True).over(fwd)
    num = prev_v * (next_t - F.col("h_idx")) + next_v * (F.col("h_idx") - prev_t)
    den = next_t - prev_t
    lerp = F.when(
        F.col("sum_fp4").isNotNull(), F.col("sum_fp4").cast("double")
    ).otherwise(
        F.when(
            prev_v.isNotNull() & next_v.isNotNull(),
            num.cast("double") / den.cast("double"),
        )
    )
    return joined.select(
        "event_type",
        "hour_ts",
        F.coalesce("n_obs", F.lit(0)).alias("n_events"),
        "sum_fp4",
        lerp.alias("lerp_fp4"),
        F.col("sum_fp4").isNull().alias("is_gap"),
    ).orderBy("event_type", "hour_ts")


EVENTS_GAPFILL_LERP_SQL = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour_ts,
         count(*) AS n_obs,
         CAST(sum(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT) AS sum_fp4
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT date_trunc('hour', min(ts)) AS min_h, date_trunc('hour', max(ts)) AS max_h
  FROM events
),
hours AS (
  SELECT unnest(generate_series(min_h, max_h, INTERVAL 1 HOUR)) AS hour_ts
  FROM bounds
),
spine AS (
  SELECT t.event_type, hours.hour_ts
  FROM (SELECT DISTINCT event_type FROM events) t, hours
),
j AS (
  SELECT s.event_type, s.hour_ts, h.n_obs, h.sum_fp4,
         CAST(epoch(s.hour_ts) / 3600 AS BIGINT) AS h_idx
  FROM spine s
  LEFT JOIN hourly h ON h.event_type = s.event_type AND h.hour_ts = s.hour_ts
),
w AS (
  SELECT *,
         last_value(sum_fp4 IGNORE NULLS) OVER (
           PARTITION BY event_type ORDER BY hour_ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
         last_value(CASE WHEN sum_fp4 IS NOT NULL THEN h_idx END IGNORE NULLS) OVER (
           PARTITION BY event_type ORDER BY hour_ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_t,
         first_value(sum_fp4 IGNORE NULLS) OVER (
           PARTITION BY event_type ORDER BY hour_ts
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
         first_value(CASE WHEN sum_fp4 IS NOT NULL THEN h_idx END IGNORE NULLS) OVER (
           PARTITION BY event_type ORDER BY hour_ts
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_t
  FROM j
)
SELECT event_type, hour_ts,
       COALESCE(n_obs, 0) AS n_events,
       sum_fp4,
       CASE WHEN sum_fp4 IS NOT NULL THEN CAST(sum_fp4 AS DOUBLE)
            WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN
              CAST(prev_v * (next_t - h_idx) + next_v * (h_idx - prev_t) AS DOUBLE)
              / CAST(next_t - prev_t AS DOUBLE)
       END AS lerp_fp4,
       sum_fp4 IS NULL AS is_gap
FROM w
ORDER BY event_type, hour_ts
"""
