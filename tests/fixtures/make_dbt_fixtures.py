"""Deterministically generate a dbt ``target/`` directory (manifest.json,
catalog.json, run_results.json, sources.json) describing a small analytics
project over the benchmark tables.

Run once; output is committed at tests/fixtures/dbt/target/.  Shapes follow
the dbt artifact fields the reference consumes (explore.R:8-256): nodes /
sources / macros maps keyed by unique_id, config.enabled, config.
materialized, depends_on.{nodes,macros}, columns maps, checksum, catalog
metadata/columns with ordinal ``index``.

Edge cases the reference's parsers handle are reproduced on purpose:
- a node with an empty ``columns`` map and empty ``depends_on`` lists
  (explore.R:68-79, 100-111 return zero-row tables)
- a node whose ``alias`` differs from ``name`` (coalesce, explore.R:146)
- a node with a non-sha256 checksum (→ NULL sha256, explore.R:166-169)
- macros hashed from macro_sql (explore.R:222)
"""

from __future__ import annotations

import hashlib
import json
import random
from pathlib import Path

OUT = Path(__file__).parent / "dbt" / "target"

TABLES = {
    "region": ["r_regionkey", "r_name"],
    "nation": ["n_nationkey", "n_name", "n_regionkey"],
    "customer": ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    "supplier": ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
    "part": ["p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"],
    "orders": ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate"],
    "events": ["event_id", "ts", "user_id", "event_type", "value", "props"],
    "documents": ["doc_id", "text", "lang", "source", "n_chars"],
    "embeddings": ["vec_id", "embedding", "label"],
}

COLTYPES = {"key": "bigint", "name": "varchar", "date": "timestamp", "num": "double"}

# r5 (VERDICT r4 item 10): deterministic TYPE DRIFT between what the
# manifest documents and what the catalog says got built — the four
# classes dbt_schema_drift_classes must separate.  Manifest overrides
# document NARROWER types; catalog overrides build DIFFERENT types.
MANIFEST_TYPE_OVERRIDES = {
    ("stg_orders", "o_orderkey"): "int",           # documented int …
    ("rpt_region_revenue", "o_totalprice"): "real",  # documented real …
}
CATALOG_TYPE_OVERRIDES = {
    ("stg_orders", "o_orderkey"): "BIGINT",        # … built bigint: safe widening
    ("rpt_region_revenue", "o_totalprice"): "DOUBLE",  # … built double: float-family widening
    ("stg_customer", "c_name"): "BIGINT",          # varchar → bigint: breaking
    ("stg_events", "value"): "BIGINT",             # double → bigint: breaking (narrows)
}


def _ctype(col: str) -> str:
    if col.endswith(("key", "_id", "number", "size", "chars", "label")):
        return "bigint"
    if col.endswith(("date", "ts")) or col == "ts":
        return "timestamp"
    if col.endswith(("price", "discount", "tax", "acctbal", "quantity", "value")):
        return "double"
    return "varchar"


MODELS = [
    # (name, alias, materialized, enabled, source_deps, model_deps, macro_deps, tags)
    ("stg_orders", None, "view", True, ["orders"], [], ["clean_strings"], ["staging"]),
    ("stg_lineitem", None, "view", True, ["lineitem"], [], ["clean_strings"], ["staging"]),
    ("stg_customer", None, "view", True, ["customer"], [], [], ["staging"]),
    ("stg_events", None, "view", True, ["events"], [], ["parse_props"], ["staging"]),
    ("fct_order_revenue", "order_revenue", "table", True, [], ["stg_orders", "stg_lineitem"], ["money"], ["mart", "finance"]),
    ("fct_sessions", None, "incremental", True, [], ["stg_events"], [], ["mart"]),
    ("dim_customer", None, "table", True, [], ["stg_customer"], [], ["mart"]),
    ("rpt_region_revenue", None, "table", True, [], ["fct_order_revenue", "dim_customer"], ["money"], ["report"]),
    ("rpt_daily_events", None, "view", True, [], ["fct_sessions"], [], ["report"]),
    ("tmp_scratch", None, "ephemeral", False, [], [], [], []),  # disabled, no cols, no deps
]

# r4 test-node extension (A21/A25), now owned by this generator so
# regeneration is lossless: 6 schema tests (not_null/unique/
# accepted_values, a two-parent relationships test, checksum name
# 'none') and their run_results entries (pass/fail/warn + failing
# row counts).  Extracted verbatim from the r4 fixtures.
TEST_NODES = {'test.analytics.accepted_values_stg_events_event_type': {'alias': None,
                                                          'checksum': {'checksum': '',
                                                                       'name': 'none'},
                                                          'columns': {},
                                                          'config': {'enabled': True,
                                                                     'materialized': 'test',
                                                                     'severity': 'error'},
                                                          'database': 'analytics',
                                                          'depends_on': {'macros': [],
                                                                         'nodes': ['model.analytics.stg_events']},
                                                          'description': '',
                                                          'meta': {},
                                                          'name': 'accepted_values_stg_events_event_type',
                                                          'resource_type': 'test',
                                                          'schema': 'dbt_test__audit',
                                                          'tags': [],
                                                          'unique_id': 'test.analytics.accepted_values_stg_events_event_type'},
 'test.analytics.not_null_dim_customer_c_custkey': {'alias': None,
                                                    'checksum': {'checksum': '', 'name': 'none'},
                                                    'columns': {},
                                                    'config': {'enabled': True,
                                                               'materialized': 'test',
                                                               'severity': 'error'},
                                                    'database': 'analytics',
                                                    'depends_on': {'macros': ['macro.analytics.clean_strings'],
                                                                   'nodes': ['model.analytics.dim_customer']},
                                                    'description': '',
                                                    'meta': {},
                                                    'name': 'not_null_dim_customer_c_custkey',
                                                    'resource_type': 'test',
                                                    'schema': 'dbt_test__audit',
                                                    'tags': ['data_quality'],
                                                    'unique_id': 'test.analytics.not_null_dim_customer_c_custkey'},
 'test.analytics.not_null_fct_order_revenue_revenue': {'alias': None,
                                                       'checksum': {'checksum': '', 'name': 'none'},
                                                       'columns': {},
                                                       'config': {'enabled': True,
                                                                  'materialized': 'test',
                                                                  'severity': 'error'},
                                                       'database': 'analytics',
                                                       'depends_on': {'macros': [],
                                                                      'nodes': ['model.analytics.fct_order_revenue']},
                                                       'description': '',
                                                       'meta': {},
                                                       'name': 'not_null_fct_order_revenue_revenue',
                                                       'resource_type': 'test',
                                                       'schema': 'dbt_test__audit',
                                                       'tags': ['data_quality', 'finance'],
                                                       'unique_id': 'test.analytics.not_null_fct_order_revenue_revenue'},
 'test.analytics.not_null_stg_customer_c_custkey': {'alias': None,
                                                    'checksum': {'checksum': '', 'name': 'none'},
                                                    'columns': {},
                                                    'config': {'enabled': True,
                                                               'materialized': 'test',
                                                               'severity': 'error'},
                                                    'database': 'analytics',
                                                    'depends_on': {'macros': [],
                                                                   'nodes': ['model.analytics.stg_customer']},
                                                    'description': '',
                                                    'meta': {},
                                                    'name': 'not_null_stg_customer_c_custkey',
                                                    'resource_type': 'test',
                                                    'schema': 'dbt_test__audit',
                                                    'tags': [],
                                                    'unique_id': 'test.analytics.not_null_stg_customer_c_custkey'},
 'test.analytics.relationships_fct_order_revenue_custkey': {'alias': None,
                                                            'checksum': {'checksum': '',
                                                                         'name': 'none'},
                                                            'columns': {},
                                                            'config': {'enabled': True,
                                                                       'materialized': 'test',
                                                                       'severity': 'error'},
                                                            'database': 'analytics',
                                                            'depends_on': {'macros': [],
                                                                           'nodes': ['model.analytics.fct_order_revenue',
                                                                                     'model.analytics.dim_customer']},
                                                            'description': '',
                                                            'meta': {},
                                                            'name': 'relationships_fct_order_revenue_custkey',
                                                            'resource_type': 'test',
                                                            'schema': 'dbt_test__audit',
                                                            'tags': ['data_quality'],
                                                            'unique_id': 'test.analytics.relationships_fct_order_revenue_custkey'},
 'test.analytics.unique_dim_customer_c_custkey': {'alias': None,
                                                  'checksum': {'checksum': '', 'name': 'none'},
                                                  'columns': {},
                                                  'config': {'enabled': True,
                                                             'materialized': 'test',
                                                             'severity': 'error'},
                                                  'database': 'analytics',
                                                  'depends_on': {'macros': [],
                                                                 'nodes': ['model.analytics.dim_customer']},
                                                  'description': '',
                                                  'meta': {},
                                                  'name': 'unique_dim_customer_c_custkey',
                                                  'resource_type': 'test',
                                                  'schema': 'dbt_test__audit',
                                                  'tags': ['data_quality'],
                                                  'unique_id': 'test.analytics.unique_dim_customer_c_custkey'}}

TEST_RESULTS = [{'adapter_response': {'rows_affected': 0},
  'execution_time': 0.41,
  'message': None,
  'status': 'pass',
  'thread_id': 'Thread-2',
  'unique_id': 'test.analytics.not_null_dim_customer_c_custkey'},
 {'adapter_response': {'rows_affected': 0},
  'execution_time': 0.38,
  'message': None,
  'status': 'pass',
  'thread_id': 'Thread-2',
  'unique_id': 'test.analytics.unique_dim_customer_c_custkey'},
 {'adapter_response': {'rows_affected': 17},
  'execution_time': 1.22,
  'message': 'Got 17 results',
  'status': 'fail',
  'thread_id': 'Thread-2',
  'unique_id': 'test.analytics.not_null_fct_order_revenue_revenue'},
 {'adapter_response': {'rows_affected': 3},
  'execution_time': 0.77,
  'message': 'Got 3 results',
  'status': 'warn',
  'thread_id': 'Thread-2',
  'unique_id': 'test.analytics.accepted_values_stg_events_event_type'},
 {'adapter_response': {'rows_affected': 0},
  'execution_time': 2.05,
  'message': None,
  'status': 'pass',
  'thread_id': 'Thread-2',
  'unique_id': 'test.analytics.relationships_fct_order_revenue_custkey'},
 {'adapter_response': {'rows_affected': 0},
  'execution_time': 0.29,
  'message': None,
  'status': 'pass',
  'thread_id': 'Thread-2',
  'unique_id': 'test.analytics.not_null_stg_customer_c_custkey'}]


MACROS = [
    ("clean_strings", "select trim(lower({{ col }}))"),
    ("parse_props", "select json_extract({{ col }}, '$.k')"),
    ("money", "select round({{ col }}, 2)"),
    ("unused_macro", "select 1"),
]


def model_uid(name: str) -> str:
    return f"model.analytics.{name}"


def source_uid(name: str) -> str:
    return f"source.analytics.raw.{name}"


def macro_uid(name: str) -> str:
    return f"macro.analytics.{name}"


def sha(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()


def build_manifest(rng: random.Random) -> dict:
    nodes = {}
    for name, alias, mat, enabled, src_deps, model_deps, macro_deps, tags in MODELS:
        uid = model_uid(name)
        base = src_deps[0] if src_deps else (model_deps[0] if model_deps else None)
        cols = {}
        if base and name != "tmp_scratch":
            table = base if base in TABLES else None
            if table is None:
                # model dep: reuse columns of its base table chain deterministically
                table = {"stg_orders": "orders", "stg_lineitem": "lineitem",
                         "stg_customer": "customer", "stg_events": "events",
                         "fct_order_revenue": "orders", "fct_sessions": "events",
                         "dim_customer": "customer"}.get(base, "orders")
            for c in TABLES[table][: rng.randint(2, len(TABLES[table]))]:
                cols[c] = {
                    "name": c,
                    "description": f"column {c}",
                    "data_type": MANIFEST_TYPE_OVERRIDES.get((name, c), _ctype(c)),
                    "meta": {"owner": "data-eng"} if rng.random() < 0.5 else {},
                    "tags": ["pii"] if c.endswith("name") else [],
                }
        checksum_kind = "sha256" if name != "rpt_daily_events" else "md5"
        body = f"select * from {base or 'dual'} -- {name}"
        nodes[uid] = {
            "unique_id": uid,
            "resource_type": "model",
            "database": "analytics",
            "schema": "marts" if mat in ("table", "incremental") else "staging",
            "name": name,
            "alias": alias,
            "description": f"{name} model",
            "config": {"enabled": enabled, "materialized": mat},
            "depends_on": {
                "nodes": [source_uid(s) for s in src_deps] + [model_uid(m) for m in model_deps],
                "macros": [macro_uid(m) for m in macro_deps],
            },
            "columns": cols,
            "meta": {"team": "analytics"} if rng.random() < 0.5 else {},
            "tags": tags,
            "checksum": {"name": checksum_kind, "checksum": sha(body) if checksum_kind == "sha256" else sha(body)[:32]},
        }
    nodes.update(TEST_NODES)
    sources = {}
    for t, cols in TABLES.items():
        uid = source_uid(t)
        sources[uid] = {
            "unique_id": uid,
            "resource_type": "source",
            "database": "raw",
            "schema": "raw",
            "identifier": t,
            "description": f"raw {t} load" if t != "region" else "",
            "config": {"enabled": True},
            "columns": {
                c: {"name": c, "description": "", "data_type": _ctype(c), "meta": {}, "tags": []}
                for c in cols
            } if t != "region" else {},
            "meta": {},
            "tags": ["raw"],
        }
    macros = {}
    for mname, msql in MACROS:
        uid = macro_uid(mname)
        macros[uid] = {
            "unique_id": uid,
            "resource_type": "macro",
            "name": mname,
            "description": f"macro {mname}",
            "macro_sql": msql,
            "depends_on": {"macros": [macro_uid("clean_strings")] if mname == "money" else []},
            "meta": {},
            "tags": [],
        }
    return {
        "metadata": {"dbt_version": "1.7.0", "project_name": "analytics", "generated_at": "2025-01-17T00:00:00Z"},
        "nodes": nodes,
        "sources": sources,
        "macros": macros,
    }


def build_catalog(manifest: dict, rng: random.Random) -> dict:
    def cat_entry(uid: str, meta_type: str, database: str, schema: str, name: str, cols: list[str]):
        return {
            "unique_id": uid,
            "metadata": {"type": meta_type, "database": database, "schema": schema, "name": name},
            "columns": {
                c: {"name": c, "index": i + 1, "type": _ctype(c).upper()} for i, c in enumerate(cols)
            },
        }

    nodes = {}
    for name, alias, mat, enabled, *_ in MODELS:
        if not enabled or mat == "ephemeral":
            continue
        uid = model_uid(name)
        m = manifest["nodes"][uid]
        cols = list(m["columns"].keys())
        # catalog drift on purpose: one model has an extra physical column
        if name == "dim_customer":
            cols = cols + ["_loaded_at"]
        # … and one documented column was never built (missing_in_catalog)
        if name == "rpt_region_revenue" and len(cols) > 1:
            cols = cols[:-1]
        entry = cat_entry(uid, "VIEW" if mat == "view" else "BASE TABLE",
                          m["database"], m["schema"], alias or name, cols)
        for c, col in entry["columns"].items():
            if (name, c) in CATALOG_TYPE_OVERRIDES:
                col["type"] = CATALOG_TYPE_OVERRIDES[(name, c)]
        nodes[uid] = entry
    sources = {}
    for t, cols in TABLES.items():
        uid = source_uid(t)
        sources[uid] = cat_entry(uid, "BASE TABLE", "raw", "raw", t, cols)
    return {"metadata": {"generated_at": "2025-01-17T00:05:00Z"}, "nodes": nodes, "sources": sources}


def build_run_results(rng: random.Random) -> dict:
    results = []
    for i, (name, alias, mat, enabled, *_rest) in enumerate(MODELS):
        if not enabled:
            continue
        status = "success" if name != "rpt_daily_events" else "error"
        results.append({
            "unique_id": model_uid(name),
            "status": status,
            "thread_id": f"Thread-{(i % 4) + 1}",
            "execution_time": round(rng.uniform(0.2, 30.0), 3),
            "adapter_response": {"rows_affected": rng.randint(0, 100000)} if status == "success" else {},
            "message": None if status == "success" else "division by zero",
        })
    results.extend(TEST_RESULTS)
    return {"metadata": {"generated_at": "2025-01-17T00:10:00Z"}, "elapsed_time": 42.75, "results": results}


def build_sources_json(rng: random.Random) -> dict:
    results = []
    for i, t in enumerate(TABLES):
        status = ["pass", "pass", "warn", "pass", "error"][i % 5]
        results.append({
            "unique_id": source_uid(t),
            "status": status,
            "max_loaded_at": f"2025-01-16T{i:02d}:00:00Z",
            "snapshotted_at": "2025-01-17T00:00:00Z",
            "max_loaded_at_time_ago_in_s": round(3600.0 * (24 - i) + i * 7.5, 1),
            "criteria": {"warn_after": {"count": 12, "period": "hour"},
                         "error_after": {"count": 48, "period": "hour"}},
        })
    return {"metadata": {"generated_at": "2025-01-17T00:15:00Z"}, "elapsed_time": 5.25, "results": results}


def main() -> None:
    rng = random.Random(42)
    OUT.mkdir(parents=True, exist_ok=True)
    manifest = build_manifest(rng)
    catalog = build_catalog(manifest, rng)
    run_results = build_run_results(rng)
    sources_json = build_sources_json(rng)
    for fname, obj in [
        ("manifest.json", manifest),
        ("catalog.json", catalog),
        ("run_results.json", run_results),
        ("sources.json", sources_json),
    ]:
        (OUT / fname).write_text(json.dumps(obj, indent=1, sort_keys=True))
    print(f"wrote fixtures to {OUT}")


if __name__ == "__main__":
    main()
