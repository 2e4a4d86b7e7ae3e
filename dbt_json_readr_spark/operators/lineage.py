"""DAG lineage over dbt depends_on edges (SURVEY.md §2 A12-A13).

The reference exposes the raw edge list (parse_depends_on,
explore.R:98-128); the queries you run on it are ancestry/closure ones.
Spark-first design: iterative self-join (one shuffle per DAG level) with
a frontier set so each iteration only extends the newly-found paths;
early-exit when the frontier drains.  At lake scale the iteration count
is the DAG depth (dbt graphs: < 30), and each step is a hash join on
``ancestor`` — AQE picks broadcast when the frontier is small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..session import release_iter_handle


def transitive_closure(edges: DataFrame, max_iters: int = 30) -> DataFrame:
    """edges(child_unique_id, parent_unique_id) → (descendant, ancestor,
    depth) for every path, depth = path length; exact-triple dedup keeps
    iteration finite on DAGs."""
    base = edges.select(
        F.col("child_unique_id").alias("descendant"),
        F.col("parent_unique_id").alias("ancestor"),
        F.lit(1).alias("depth"),
    ).distinct()
    # Cache + LINEAGE discipline (r12, guide §3.3): per-round results
    # localCheckpoint — eager (materialized before parents release,
    # same memory bound as before: one handle pinned at exit,
    # O(|closure|) storage) AND plan-truncating, so round N's logical
    # plan no longer embeds round N-1's (the persist()-only form left
    # the analyzer an exponentially-nested tree on deep graphs — the
    # driver-side planning cost that dominated the iterative keys;
    # same fix as operators/graph.py / kmeans.py).
    closure = base.persist()
    frontier = closure
    for _ in range(max_iters):
        grown = (
            frontier.alias("f")
            .join(base.alias("e"), F.col("f.ancestor") == F.col("e.descendant"))
            .select(
                F.col("f.descendant").alias("descendant"),
                F.col("e.ancestor").alias("ancestor"),
                (F.col("f.depth") + 1).alias("depth"),
            )
            .distinct()
        )
        new = grown.join(
            closure, on=["descendant", "ancestor", "depth"], how="left_anti"
        ).localCheckpoint()
        if new.isEmpty():
            release_iter_handle(new)
            break
        nxt = closure.union(new).localCheckpoint()
        prev_closure, prev_frontier = closure, frontier
        closure, frontier = nxt, new
        release_iter_handle(prev_closure)
        if prev_frontier is not prev_closure:
            release_iter_handle(prev_frontier)
    if frontier is not closure:
        # its rows are a subset of the cached union
        release_iter_handle(frontier)
    return closure


PR_SCALE = 1_000_000_000
PR_BASE = 150_000_000  # 0.15 · SCALE


def pagerank(all_nodes: DataFrame, edges: DataFrame, iters: int = 10) -> DataFrame:
    """Fixed-point integer PageRank over the dependency DAG: each
    child's rank flows to the nodes it depends on, so heavily-depended-
    upon upstream models rank highest — the 'blast radius' score.

    All arithmetic is 60-bit-safe integer (rank div outdeg per edge,
    ·17 div 20 for the 0.85 damping): byte-identical across engines and
    partitionings, where float accumulation would drift with shuffle
    order.  Fixed ``iters`` (not convergence-tested) keeps the result a
    pure function of the graph.  Same cache discipline as
    transitive_closure: one materialized handle alive at a time."""
    ids = all_nodes.select(F.col("unique_id").alias("id"))
    e = edges.select(
        F.col("child_unique_id").alias("c"), F.col("parent_unique_id").alias("p")
    ).distinct()
    ew = e.join(e.groupBy("c").agg(F.count(F.lit(1)).alias("outdeg")), "c")
    # per-round localCheckpoint (r12): see transitive_closure's note
    ranks = ids.select("id", F.lit(PR_SCALE).cast("long").alias("rank")).localCheckpoint()
    for _ in range(iters):
        contribs = (
            ew.join(ranks, ew.c == ranks.id)
            .select(F.col("p").alias("id"), F.expr("rank div outdeg").alias("contrib"))
            .groupBy("id")
            .agg(F.sum("contrib").alias("contrib_sum"))
        )
        nxt = (
            ids.join(contribs, "id", "left")
            .select(
                "id",
                (
                    F.lit(PR_BASE).cast("long")
                    + F.expr(
                        "(coalesce(contrib_sum, CAST(0 AS BIGINT)) * 17) div 20"
                    )
                ).alias("rank"),
            )
            .localCheckpoint()
        )
        release_iter_handle(ranks)
        ranks = nxt
    return ranks.select(F.col("id").alias("unique_id"), F.col("rank").alias("rank_fp"))


def critical_path(nodes_w: DataFrame, edges: DataFrame, max_iters: int = 30) -> DataFrame:
    """nodes_w(unique_id, wt_fp) + edges(child_unique_id,
    parent_unique_id) → (unique_id, wt_fp, critical_cost_fp): the
    longest node-weighted dependency chain ending at each node
    (inclusive of the node itself) — the dbt scheduling critical path
    when wt is execution time.

    Bellman-Ford-style relaxation: cost(child) = wt(child) +
    max(cost(parent)); one hash join + max-agg per round, converges in
    DAG-depth rounds with a left-anti change probe for early exit (the
    fixed point is unique on a DAG, so the early exit cannot change the
    result).  All integer arithmetic — byte-stable across engines.
    Same cache discipline as transitive_closure: one materialized
    handle alive at a time."""
    e = edges.select(
        F.col("child_unique_id").alias("c"), F.col("parent_unique_id").alias("p")
    ).distinct()
    nodes = nodes_w.select("unique_id", F.col("wt_fp").cast("long").alias("wt_fp"))
    # per-round localCheckpoint (r12): see transitive_closure's note
    cost = nodes.select(
        "unique_id", "wt_fp", F.col("wt_fp").alias("critical_cost_fp")
    ).localCheckpoint()
    for _ in range(max_iters):
        pmax = (
            e.join(cost, e.p == cost.unique_id)
            .groupBy("c")
            .agg(F.max("critical_cost_fp").alias("pmax"))
        )
        nxt = (
            nodes.join(pmax, nodes.unique_id == pmax.c, "left")
            .select(
                "unique_id",
                "wt_fp",
                (F.col("wt_fp") + F.coalesce("pmax", F.lit(0).cast("long"))).alias(
                    "critical_cost_fp"
                ),
            )
            .localCheckpoint()
        )
        done = nxt.join(cost, ["unique_id", "critical_cost_fp"], "left_anti").isEmpty()
        release_iter_handle(cost)
        cost = nxt
        if done:
            break
    return cost


def lineage_closure(edges: DataFrame) -> DataFrame:
    """(descendant, ancestor, min path length) — 'does A depend on B, how
    directly'."""
    return (
        transitive_closure(edges)
        .groupBy("descendant", "ancestor")
        .agg(F.min("depth").cast("int").alias("depth"))
    )


def lineage_depth(all_nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Topological depth per node: longest path to any ancestor, 0 for
    roots.  This is dbt's scheduling level."""
    depths = (
        transitive_closure(edges)
        .groupBy("descendant")
        .agg(F.max("depth").cast("int").alias("depth"))
    )
    return (
        all_nodes.join(depths, all_nodes.unique_id == depths.descendant, "left")
        .select("unique_id", F.coalesce("depth", F.lit(0)).cast("int").alias("depth"))
    )
