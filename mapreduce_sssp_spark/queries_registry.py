"""Central registry merging every operator module's queries()/oracle_sql()
entries. Import side-effect free; each module contributes QUERIES (name ->
(spark, sf_dir) -> DataFrame) and ORACLE (name -> DuckDB SQL twin).
"""

from __future__ import annotations

from .io import python_datasource, sinks
from .operators import (
    asof,
    dedup,
    event_windows,
    graph_queries,
    grouped_pandas,
    multimodal,
    pipeline,
    python_surface,
    relational,
    sampling,
    scale_patterns,
    similarity,
    text_analysis,
)
from .streaming import foreach_sink, joins, stateful

_MODULES = [
    graph_queries,
    relational,
    dedup,
    similarity,
    text_analysis,
    event_windows,
    multimodal,
    asof,
    stateful,
    joins,
    foreach_sink,
    sampling,
    scale_patterns,
    grouped_pandas,
    python_surface,
    pipeline,
    sinks,
    python_datasource,
]

QUERIES = {}
ORACLE = {}
for _m in _MODULES:
    for _k in _m.QUERIES:
        assert _k not in QUERIES, f"duplicate query name: {_k}"
    QUERIES.update(_m.QUERIES)
    ORACLE.update(_m.ORACLE)

# Every oracle must have a query.
assert set(ORACLE) <= set(QUERIES), set(ORACLE) - set(QUERIES)

# --- Registry iteration order -------------------------------------------------
# The correctness driver verifies ~50 queries per round, taken in registry
# order.  Rounds 2-3 repeatedly re-checked the same front-of-registry entries
# while 61 later ones never received a driver row.  Order the registry so the
# entries with the weakest external evidence come first:
#   1. entries whose last driver row was red but that have since been fixed
#      (json_extract, dedup_simhash) plus sssp/pagerank, which gained hash
#      oracles this round and need fresh driver rows;
#   2. entries never checked by the driver in any round (union of
#      CORRECTNESS_r02/r03 keys is the 69-name set below);
#   3. entries already driver-green, in their original module order.
_DRIVER_CHECKED_R2_R3 = {
    "above_cust_avg", "adjacency", "agg_multi", "collect_set_flags",
    "compat_final_lines", "compat_reverse_lines", "compat_state_lines",
    "cube_agg", "dedup_exact", "dedup_minhash", "dedup_simhash",
    "distinct_pairs", "group_percentiles", "grouping_sets_agg", "join_anti",
    "join_full", "join_inner", "join_left", "join_semi", "json_extract",
    "json_map_explode", "kcore", "map_literal_decode", "ngram_jaccard_pairs",
    "pagerank", "pivot_status", "price_histogram", "reverse_graph",
    "reverse_graph_exploded", "rollup_agg", "scalar_date",
    "scalar_string_math", "set_except", "set_intersect", "set_union",
    "similarity_topk", "sql_tpch_q1", "sql_tpch_q10", "sql_tpch_q12",
    "sql_tpch_q13", "sql_tpch_q14", "sql_tpch_q15", "sql_tpch_q16",
    "sql_tpch_q17", "sql_tpch_q18", "sql_tpch_q19", "sql_tpch_q21",
    "sql_tpch_q22", "sql_tpch_q3", "sql_tpch_q4", "sql_tpch_q5",
    "sql_tpch_q6", "sql_tpch_q7", "sql_tpch_q8", "sql_tpch_q9", "sssp",
    "sssp_dag", "text_edges_roundtrip", "topk_orders", "triangle_counts",
    "tsv_edges_roundtrip", "unpivot_measures", "variant_extract", "wcc",
    "wcc_cyclic", "window_lag", "window_moving", "window_ntile",
    "window_rank",
}
_RECHECK_FIRST = ["json_extract", "dedup_simhash", "sssp", "pagerank", "kcore"]


def _registry_order(names):
    front = [n for n in _RECHECK_FIRST if n in names]
    never = [n for n in names if n not in _DRIVER_CHECKED_R2_R3]
    green = [n for n in names
             if n in _DRIVER_CHECKED_R2_R3 and n not in _RECHECK_FIRST]
    return front + never + green


QUERIES = {n: QUERIES[n] for n in _registry_order(list(QUERIES))}
ORACLE = {n: ORACLE[n] for n in QUERIES if n in ORACLE}
