"""Independent DuckDB oracles for the dbt-artifact queries (A1-A13).

These re-derive the expected flat tables from the SAME fixture JSON using
only the Python stdlib (``json``/``hashlib``) — no Spark, no shared code
with ``sources/artifacts.py`` — and render them as typed ``VALUES``
literals DuckDB can execute.  A Spark-parser bug therefore cannot leak
into its own oracle.  Lineage closure/depth are computed with a plain
BFS here vs. iterative joins on the Spark side: two independent
algorithms that must agree.
"""

from __future__ import annotations

import hashlib
import json
from datetime import datetime
from pathlib import Path

FIXTURE_TARGET = Path(__file__).resolve().parents[1] / "tests" / "fixtures" / "dbt" / "target"


def _lit(v, typ: str) -> str:
    if v is None:
        return f"CAST(NULL AS {typ})"
    if typ == "BOOLEAN":
        return "CAST(TRUE AS BOOLEAN)" if v else "CAST(FALSE AS BOOLEAN)"
    if typ in ("BIGINT", "INTEGER"):
        return f"CAST({int(v)} AS {typ})"
    if typ == "DOUBLE":
        return f"CAST({float(v)!r} AS DOUBLE)"
    if typ == "TIMESTAMP":
        if isinstance(v, str):
            v = datetime.fromisoformat(v.replace("Z", "+00:00"))
        return f"TIMESTAMP '{v.strftime('%Y-%m-%d %H:%M:%S')}'"
    s = str(v).replace("'", "''")
    return f"CAST('{s}' AS VARCHAR)"


def _values_sql(cols: list[tuple[str, str]], rows: list[tuple]) -> str:
    names = ", ".join(f'"{c}"' for c, _ in cols)
    if not rows:
        preds = " AND ".join(f'"{c}" IS NOT NULL' for c, _ in cols[:1])
        one = ", ".join(_lit(None, t) for _, t in cols)
        return f"SELECT * FROM (VALUES ({one})) AS t({names}) WHERE {preds}"
    body = ",\n  ".join(
        "(" + ", ".join(_lit(v, t) for v, (_, t) in zip(r, cols)) + ")" for r in rows
    )
    return f"SELECT * FROM (VALUES\n  {body}) AS t({names})"


def _load(name: str, target: Path = FIXTURE_TARGET) -> dict:
    return json.loads((target / name).read_text())


FLAT_COLS = [
    ("unique_id", "VARCHAR"),
    ("manifest_group", "VARCHAR"),
    ("resource_type", "VARCHAR"),
    ("database", "VARCHAR"),
    ("schema", "VARCHAR"),
    ("name", "VARCHAR"),
    ("description", "VARCHAR"),
    ("is_enabled", "BOOLEAN"),
    ("materialized_as", "VARCHAR"),
    ("sha256", "VARCHAR"),
    ("n_depends_on", "INTEGER"),
    ("n_columns", "INTEGER"),
]


def _node_rows(m: dict) -> list[tuple]:
    rows = []
    for n in m["nodes"].values():
        cs = n.get("checksum") or {}
        dep = n.get("depends_on") or {}
        rows.append(
            (
                n["unique_id"],
                "nodes",
                n["resource_type"],
                n["database"],
                n["schema"],
                n.get("alias") or n["name"],
                n["description"],
                n["config"]["enabled"],
                n["config"]["materialized"],
                cs.get("checksum") if cs.get("name") == "sha256" else None,
                len(dep.get("nodes", [])) + len(dep.get("macros", [])),
                len(n.get("columns") or {}),
            )
        )
    return rows


def _source_rows(m: dict) -> list[tuple]:
    return [
        (
            s["unique_id"],
            "sources",
            s["resource_type"],
            s["database"],
            s["schema"],
            s["identifier"],
            s["description"],
            s["config"]["enabled"],
            None,
            None,
            0,
            len(s.get("columns") or {}),
        )
        for s in m["sources"].values()
    ]


def _macro_rows(m: dict) -> list[tuple]:
    rows = []
    for mc in m["macros"].values():
        dep = mc.get("depends_on") or {}
        rows.append(
            (
                mc["unique_id"],
                "macros",
                mc["resource_type"],
                None,
                None,
                mc["name"],
                mc["description"],
                None,
                None,
                hashlib.sha256(mc["macro_sql"].encode()).hexdigest(),
                len(dep.get("nodes", [])) + len(dep.get("macros", [])),
                0,
            )
        )
    return rows


def dbt_manifest_nodes() -> str:
    return _values_sql(FLAT_COLS, _node_rows(_load("manifest.json")))


def dbt_manifest_sources() -> str:
    return _values_sql(FLAT_COLS, _source_rows(_load("manifest.json")))


def dbt_manifest_macros() -> str:
    return _values_sql(FLAT_COLS, _macro_rows(_load("manifest.json")))


def dbt_manifest_unified() -> str:
    m = _load("manifest.json")
    return _values_sql(FLAT_COLS, _node_rows(m) + _source_rows(m) + _macro_rows(m))


def dbt_manifest_columns() -> str:
    m = _load("manifest.json")
    cols = [
        ("unique_id", "VARCHAR"),
        ("manifest_group", "VARCHAR"),
        ("column_name", "VARCHAR"),
        ("description", "VARCHAR"),
        ("data_type", "VARCHAR"),
        ("tags_csv", "VARCHAR"),
    ]
    rows = []
    for group in ("nodes", "sources"):
        for n in m[group].values():
            for c in (n.get("columns") or {}).values():
                rows.append(
                    (
                        n["unique_id"],
                        group,
                        c["name"],
                        c["description"],
                        c["data_type"],
                        ",".join(c.get("tags") or []),
                    )
                )
    return _values_sql(cols, rows)


def _edge_rows(m: dict) -> list[tuple]:
    rows = []
    for group in ("nodes", "macros"):
        for n in m[group].values():
            dep = n.get("depends_on") or {}
            for kind in ("nodes", "macros"):
                for parent in dep.get(kind, []):
                    rows.append((n["unique_id"], kind, parent))
    return rows


def dbt_manifest_edges() -> str:
    cols = [
        ("child_unique_id", "VARCHAR"),
        ("dep_type", "VARCHAR"),
        ("parent_unique_id", "VARCHAR"),
    ]
    return _values_sql(cols, _edge_rows(_load("manifest.json")))


def dbt_catalog_objects() -> str:
    c = _load("catalog.json")
    cols = [
        ("unique_id", "VARCHAR"),
        ("manifest_group", "VARCHAR"),
        ("materialized_as", "VARCHAR"),
        ("database", "VARCHAR"),
        ("schema", "VARCHAR"),
        ("name", "VARCHAR"),
        ("n_columns", "INTEGER"),
    ]
    rows = []
    for group in ("nodes", "sources"):
        for n in c[group].values():
            md = n["metadata"]
            rows.append(
                (
                    n["unique_id"],
                    group,
                    md["type"],
                    md["database"],
                    md["schema"],
                    md["name"],
                    len(n.get("columns") or {}),
                )
            )
    return _values_sql(cols, rows)


def dbt_catalog_columns() -> str:
    c = _load("catalog.json")
    cols = [
        ("unique_id", "VARCHAR"),
        ("manifest_group", "VARCHAR"),
        ("column_name", "VARCHAR"),
        ("ordinal_position", "INTEGER"),
        ("data_type", "VARCHAR"),
    ]
    rows = []
    for group in ("nodes", "sources"):
        for n in c[group].values():
            for col in (n.get("columns") or {}).values():
                rows.append((n["unique_id"], group, col["name"], col["index"], col["type"]))
    return _values_sql(cols, rows)


def dbt_schema_drift() -> str:
    m = _load("manifest.json")
    c = _load("catalog.json")
    man: dict[tuple[str, str], str] = {}
    for group in ("nodes", "sources"):
        for n in m[group].values():
            for col in (n.get("columns") or {}).values():
                man[(n["unique_id"], col["name"])] = col["data_type"]
    cat: dict[tuple[str, str], str] = {}
    for group in ("nodes", "sources"):
        for n in c[group].values():
            for col in (n.get("columns") or {}).values():
                cat[(n["unique_id"], col["name"])] = col["type"]
    cols = [
        ("unique_id", "VARCHAR"),
        ("column_name", "VARCHAR"),
        ("in_manifest", "BOOLEAN"),
        ("in_catalog", "BOOLEAN"),
        ("manifest_type", "VARCHAR"),
        ("catalog_type", "VARCHAR"),
        ("type_match", "BOOLEAN"),
    ]
    rows = []
    for key in sorted(set(man) | set(cat)):
        mt, ct = man.get(key), cat.get(key)
        rows.append(
            (
                key[0],
                key[1],
                mt is not None,
                ct is not None,
                mt,
                ct,
                (ct.lower() == mt) if (mt is not None and ct is not None) else None,
            )
        )
    return _values_sql(cols, rows)


def dbt_run_results() -> str:
    r = _load("run_results.json")
    cols = [
        ("unique_id", "VARCHAR"),
        ("status", "VARCHAR"),
        ("thread_id", "VARCHAR"),
        ("execution_time", "DOUBLE"),
        ("rows_affected", "BIGINT"),
        ("message", "VARCHAR"),
    ]
    rows = [
        (
            x["unique_id"],
            x["status"],
            x["thread_id"],
            x["execution_time"],
            (x.get("adapter_response") or {}).get("rows_affected"),
            x.get("message"),
        )
        for x in r["results"]
    ]
    return _values_sql(cols, rows)


def dbt_source_freshness() -> str:
    s = _load("sources.json")
    cols = [
        ("unique_id", "VARCHAR"),
        ("status", "VARCHAR"),
        ("max_loaded_at", "TIMESTAMP"),
        ("snapshotted_at", "TIMESTAMP"),
        ("loaded_at_lag_s", "DOUBLE"),
        ("warn_after_count", "INTEGER"),
        ("warn_after_period", "VARCHAR"),
        ("error_after_count", "INTEGER"),
        ("error_after_period", "VARCHAR"),
    ]
    rows = [
        (
            x["unique_id"],
            x["status"],
            x["max_loaded_at"],
            x["snapshotted_at"],
            x["max_loaded_at_time_ago_in_s"],
            x["criteria"]["warn_after"]["count"],
            x["criteria"]["warn_after"]["period"],
            x["criteria"]["error_after"]["count"],
            x["criteria"]["error_after"]["period"],
        )
        for x in s["results"]
    ]
    return _values_sql(cols, rows)


def _data_edge_pairs(m: dict) -> list[tuple[str, str]]:
    return [(c, p) for (c, t, p) in _edge_rows(m) if t == "nodes"]


def _closure_bfs(pairs: list[tuple[str, str]]) -> dict[tuple[str, str], tuple[int, int]]:
    """(descendant, ancestor) → (min_depth, max_depth): enumerate all
    distinct (descendant, ancestor, path_length) triples — finite on a
    DAG — then fold."""
    parents: dict[str, list[str]] = {}
    for c, p in pairs:
        parents.setdefault(c, []).append(p)
    triples = {(c, p, 1) for c, p in pairs}
    frontier = set(triples)
    while frontier:
        grown = {
            (d, gp, depth + 1)
            for (d, a, depth) in frontier
            for gp in parents.get(a, [])
        }
        frontier = grown - triples
        triples |= frontier
    out: dict[tuple[str, str], tuple[int, int]] = {}
    for d, a, depth in triples:
        cur = out.get((d, a))
        out[(d, a)] = (
            (depth, depth) if cur is None else (min(cur[0], depth), max(cur[1], depth))
        )
    return out


def dbt_lineage_closure() -> str:
    m = _load("manifest.json")
    closure = _closure_bfs(_data_edge_pairs(m))
    cols = [("descendant", "VARCHAR"), ("ancestor", "VARCHAR"), ("depth", "INTEGER")]
    rows = [(d, a, lo) for (d, a), (lo, _hi) in sorted(closure.items())]
    return _values_sql(cols, rows)


def dbt_lineage_closure_rcte() -> str:
    """DuckDB's own recursive-CTE evaluator over an independently
    parsed edge list — NOT the stdlib BFS used for A12 — so the Spark
    recursive CTE is checked against a second engine's native
    recursion, not a replay of the same algorithm."""
    m = _load("manifest.json")
    pairs = sorted(set(_data_edge_pairs(m)))
    body = ",\n  ".join(
        f"({_lit(c, 'VARCHAR')}, {_lit(p, 'VARCHAR')})" for c, p in pairs
    )
    return f"""
WITH RECURSIVE edges(descendant, ancestor) AS (
  SELECT * FROM (VALUES
  {body}) v(descendant, ancestor)
),
paths(descendant, ancestor, depth) AS (
  SELECT descendant, ancestor, 1 AS depth FROM edges
  UNION ALL
  SELECT p.descendant, e.ancestor, p.depth + 1
  FROM paths p JOIN edges e ON p.ancestor = e.descendant
)
SELECT descendant, ancestor, CAST(min(depth) AS INTEGER) AS depth
FROM paths
GROUP BY descendant, ancestor
"""


def dbt_lineage_depth() -> str:
    m = _load("manifest.json")
    closure = _closure_bfs(_data_edge_pairs(m))
    max_depth: dict[str, int] = {}
    for (d, _a), (_lo, hi) in closure.items():
        max_depth[d] = max(max_depth.get(d, 0), hi)
    all_ids = [n["unique_id"] for n in m["nodes"].values()] + [
        s["unique_id"] for s in m["sources"].values()
    ]
    cols = [("unique_id", "VARCHAR"), ("depth", "INTEGER")]
    rows = [(uid, max_depth.get(uid, 0)) for uid in all_ids]
    return _values_sql(cols, rows)


def dbt_pagerank() -> str:
    """Pure-stdlib fixed-point PageRank over the same edge set as the
    Spark operator (operators/lineage.py pagerank) — identical integer
    arithmetic (rank // outdeg per edge, ·17 // 20 damping, 10
    iterations), so values are byte-equal."""
    m = _load("manifest.json")
    pairs = sorted(set(_data_edge_pairs(m)))
    all_ids = [n["unique_id"] for n in m["nodes"].values()] + [
        s["unique_id"] for s in m["sources"].values()
    ]
    outdeg: dict[str, int] = {}
    for c, _p in pairs:
        outdeg[c] = outdeg.get(c, 0) + 1
    scale, base = 1_000_000_000, 150_000_000
    rank = {i: scale for i in all_ids}
    for _ in range(10):
        contrib: dict[str, int] = {}
        for c, p in pairs:
            contrib[p] = contrib.get(p, 0) + rank[c] // outdeg[c]
        rank = {i: base + (contrib.get(i, 0) * 17) // 20 for i in all_ids}
    cols = [("unique_id", "VARCHAR"), ("rank_fp", "BIGINT")]
    return _values_sql(cols, [(i, rank[i]) for i in all_ids])


def dbt_critical_path() -> str:
    """Pure-stdlib longest node-weighted dependency chain per node —
    memoized DFS over the same edge set and fixed-point weights
    (floor(execution_time·1e6)) as the Spark Bellman-Ford relaxation
    (operators/lineage.py critical_path): two independent algorithms
    that must agree byte-for-byte."""
    import math

    m = _load("manifest.json")
    r = _load("run_results.json")
    all_ids = [n["unique_id"] for n in m["nodes"].values()] + [
        s["unique_id"] for s in m["sources"].values()
    ]
    wt = {uid: 0 for uid in all_ids}
    for x in r["results"]:
        if x["unique_id"] in wt:
            wt[x["unique_id"]] = int(math.floor(x["execution_time"] * 1_000_000))
    parents: dict[str, list[str]] = {}
    for c, p in sorted(set(_data_edge_pairs(m))):
        parents.setdefault(c, []).append(p)
    memo: dict[str, int] = {}

    def cost(u: str) -> int:
        if u not in memo:
            memo[u] = wt.get(u, 0) + max((cost(p) for p in parents.get(u, [])), default=0)
        return memo[u]

    cols = [("unique_id", "VARCHAR"), ("wt_fp", "BIGINT"), ("critical_cost_fp", "BIGINT")]
    return _values_sql(cols, [(uid, wt[uid], cost(uid)) for uid in all_ids])


def dbt_run_summary() -> str:
    return f"""
SELECT status, count(*) AS n_nodes,
       CAST(sum(CAST(execution_time AS DECIMAL(18,4))) AS DOUBLE) AS total_time,
       max(execution_time) AS max_time,
       CAST(sum(rows_affected) AS BIGINT) AS total_rows
FROM ({dbt_run_results()}) GROUP BY status ORDER BY status
"""


def dbt_model_fanout() -> str:
    return f"""
SELECT parent_unique_id, count(*) AS n_children
FROM ({dbt_manifest_edges()})
WHERE dep_type = 'nodes'
GROUP BY parent_unique_id
ORDER BY n_children DESC, parent_unique_id
"""


def dbt_description_coverage() -> str:
    return f"""
SELECT resource_type, count(*) AS n_objects,
       CAST(sum(CASE WHEN description IS NOT NULL AND description <> '' THEN 1 ELSE 0 END) AS BIGINT) AS n_documented,
       CAST(sum(CASE WHEN description IS NOT NULL AND description <> '' THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS coverage
FROM ({dbt_manifest_unified()}) GROUP BY resource_type ORDER BY resource_type
"""


def dbt_tag_usage() -> str:
    """Independent stdlib aggregation of tag usage across all three
    manifest groups (never touches the Spark reader's output)."""
    m = _load("manifest.json")
    agg: dict[str, list] = {}
    for grp in ("nodes", "sources", "macros"):
        for n in m.get(grp, {}).values():
            for t in n.get("tags") or []:
                s = agg.setdefault(t, [0, set()])
                s[0] += 1
                s[1].add(n["resource_type"])
    rows = [(t, c, len(rts)) for t, (c, rts) in sorted(agg.items())]
    return _values_sql(
        [("tag", "VARCHAR"), ("n_objects", "BIGINT"), ("n_resource_types", "BIGINT")],
        rows,
    )


def dbt_test_coverage() -> str:
    """Stdlib recomputation: tests-per-model from the raw fixture."""
    m = _load("manifest.json")
    counts: dict[str, int] = {}
    for n in m["nodes"].values():
        if n["resource_type"] != "test":
            continue
        for parent in set(n.get("depends_on", {}).get("nodes") or []):
            counts[parent] = counts.get(parent, 0) + 1
    rows = [
        (uid, n["resource_type"], counts.get(uid, 0), counts.get(uid, 0) > 0)
        for uid, n in sorted(m["nodes"].items())
        if n["resource_type"] != "test"
    ]
    return _values_sql(
        [
            ("unique_id", "VARCHAR"),
            ("resource_type", "VARCHAR"),
            ("n_tests", "BIGINT"),
            ("is_tested", "BOOLEAN"),
        ],
        rows,
    )


def dbt_source_coverage() -> str:
    """Stdlib recount: distinct consumers per declared source."""
    m = _load("manifest.json")
    consumers: dict[str, set] = {}
    for uid, n in m["nodes"].items():
        for parent in n.get("depends_on", {}).get("nodes") or []:
            consumers.setdefault(parent, set()).add(uid)
    rows = [
        (sid, len(consumers.get(sid, ())), len(consumers.get(sid, ())) == 0)
        for sid in sorted(m.get("sources", {}))
    ]
    return _values_sql(
        [
            ("unique_id", "VARCHAR"),
            ("n_consumers", "BIGINT"),
            ("is_dead", "BOOLEAN"),
        ],
        rows,
    )


def dbt_macro_usage() -> str:
    """Stdlib recount: distinct referencing objects per macro —
    across ALL manifest groups (a macro wrapped by another macro is
    not dead; the fixture's money→clean_strings edge pins this)."""
    m = _load("manifest.json")
    refs: dict[str, set] = {}
    for grp in ("nodes", "sources", "macros"):
        for uid, n in m.get(grp, {}).items():
            for mac in n.get("depends_on", {}).get("macros") or []:
                refs.setdefault(mac, set()).add(uid)
    rows = [
        (mid, len(refs.get(mid, ())), len(refs.get(mid, ())) == 0)
        for mid in sorted(m.get("macros", {}))
    ]
    return _values_sql(
        [
            ("unique_id", "VARCHAR"),
            ("n_referencing_nodes", "BIGINT"),
            ("is_unused", "BOOLEAN"),
        ],
        rows,
    )


def dbt_column_name_lineage() -> str:
    """Stdlib recount of name-match column flow edges."""
    m = _load("manifest.json")
    groups = {}
    for grp in ("nodes", "sources", "macros"):
        for uid, n in m.get(grp, {}).items():
            groups[uid] = n
    agg: dict[tuple, list] = {}
    for uid, n in m["nodes"].items():
        child_cols = set(n.get("columns") or {})
        for parent in n.get("depends_on", {}).get("nodes") or []:
            pcols = set(groups.get(parent, {}).get("columns") or {})
            for c in child_cols & pcols:
                e = agg.setdefault((uid, c), [0, []])
                e[0] += 1
                e[1].append(parent)
    rows = [
        (uid, c, n, min(parents))
        for (uid, c), (n, parents) in sorted(agg.items())
    ]
    return _values_sql(
        [
            ("child_unique_id", "VARCHAR"),
            ("column_name", "VARCHAR"),
            ("n_parents", "BIGINT"),
            ("first_parent", "VARCHAR"),
        ],
        rows,
    )


def dbt_test_results_rollup() -> str:
    """Stdlib recount: test-run outcomes routed to guarded models."""
    m = _load("manifest.json")
    rr = _load("run_results.json")
    parents = {
        uid: n.get("depends_on", {}).get("nodes") or []
        for uid, n in m["nodes"].items()
        if n["resource_type"] == "test"
    }
    agg: dict[str, list] = {}
    for r in rr["results"]:
        uid = r["unique_id"]
        if not uid.startswith("test."):
            continue
        for model in parents.get(uid, []):
            e = agg.setdefault(model, [0, 0, 0, 0, 0])
            e[0] += 1
            st = r["status"]
            e[1] += st == "pass"
            e[2] += st in ("fail", "error")
            e[3] += st == "warn"
            e[4] += (r.get("adapter_response") or {}).get("rows_affected") or 0
    rows = [(k, *v) for k, v in sorted(agg.items())]
    return _values_sql(
        [
            ("model_unique_id", "VARCHAR"),
            ("n_tests_run", "BIGINT"),
            ("n_passed", "BIGINT"),
            ("n_failed", "BIGINT"),
            ("n_warn", "BIGINT"),
            ("total_failing_rows", "BIGINT"),
        ],
        rows,
    )


def dbt_schema_drift_classes() -> str:
    """Independent recount for A26: classify every manifest↔catalog
    column pair with the same int/float widening lattices, roll up per
    model — pure stdlib, shares no code with the Spark path."""
    m = _load("manifest.json")
    c = _load("catalog.json")
    man: dict[tuple[str, str], str] = {}
    cat: dict[tuple[str, str], str] = {}
    for group in ("nodes", "sources"):
        for n in m[group].values():
            for col in (n.get("columns") or {}).values():
                man[(n["unique_id"], col["name"])] = col["data_type"]
        for n in c[group].values():
            for col in (n.get("columns") or {}).values():
                cat[(n["unique_id"], col["name"])] = col["type"]
    int_rank = {"tinyint": 1, "smallint": 2, "int": 3, "integer": 3, "bigint": 4}
    float_rank = {"real": 1, "float": 1, "double": 2, "double precision": 2}

    def classify(mt: str | None, ct: str | None) -> str:
        if mt is None:
            return "missing_in_manifest"
        if ct is None:
            return "missing_in_catalog"
        lo_m, lo_c = mt.lower(), ct.lower()
        if lo_m == lo_c:
            return "match"
        for rank in (int_rank, float_rank):
            if lo_m in rank and lo_c in rank and rank[lo_m] < rank[lo_c]:
                return "safe_widening"
        return "breaking"

    per_model: dict[str, dict[str, int]] = {}
    for uid, col in sorted(set(man) | set(cat)):
        cls = classify(man.get((uid, col)), cat.get((uid, col)))
        d = per_model.setdefault(
            uid,
            {
                "n_columns": 0, "match": 0, "safe_widening": 0, "breaking": 0,
                "missing_in_catalog": 0, "missing_in_manifest": 0,
            },
        )
        d["n_columns"] += 1
        d[cls] += 1
    cols = [
        ("unique_id", "VARCHAR"),
        ("n_columns", "BIGINT"),
        ("n_match", "BIGINT"),
        ("n_safe_widening", "BIGINT"),
        ("n_breaking", "BIGINT"),
        ("n_missing_in_catalog", "BIGINT"),
        ("n_missing_in_manifest", "BIGINT"),
        ("drift_score", "BIGINT"),
    ]
    rows = []
    for uid, d in per_model.items():
        score = (
            3 * d["breaking"]
            + 2 * d["missing_in_catalog"]
            + d["missing_in_manifest"]
            + d["safe_widening"]
        )
        rows.append(
            (
                uid, d["n_columns"], d["match"], d["safe_widening"], d["breaking"],
                d["missing_in_catalog"], d["missing_in_manifest"], score,
            )
        )
    rows.sort(key=lambda r: (-r[-1], r[0]))
    return _values_sql(cols, rows)


def dbt_manifest_lake() -> str:
    """A27: stdlib re-parse of every lake manifest (lake_fixture.
    lake_rollup_rows) — fully independent of the Spark glob reader."""
    from .sources.lake_fixture import lake_rollup_rows

    cols = [
        ("unique_id", "VARCHAR"),
        ("n_runs", "BIGINT"),
        ("n_files", "BIGINT"),
        ("n_versions", "BIGINT"),
        ("first_seen_at", "TIMESTAMP"),
        ("last_seen_at", "TIMESTAMP"),
    ]
    return _values_sql(cols, lake_rollup_rows()) + ' ORDER BY "unique_id"'
