"""Central registry merging every operator module's queries()/oracle_sql()
entries. Import side-effect free; each module contributes QUERIES (name ->
(spark, sf_dir) -> DataFrame) and ORACLE (name -> DuckDB SQL twin).
"""

from __future__ import annotations

from .io import python_datasource, sinks
from .operators import (
    asof,
    cdc,
    dedup,
    event_windows,
    geo,
    graph_queries,
    grouped_pandas,
    multimodal,
    pipeline,
    python_surface,
    relational,
    sampling,
    scale_patterns,
    similarity,
    stat_models,
    stat_tests,
    text_analysis,
)
from .streaming import foreach_sink, joins, stateful

_MODULES = [
    graph_queries,
    relational,
    cdc,
    dedup,
    similarity,
    text_analysis,
    event_windows,
    stat_tests,
    stat_models,
    multimodal,
    asof,
    stateful,
    joins,
    foreach_sink,
    sampling,
    scale_patterns,
    geo,
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
#   1. entries whose LATEST driver row is red (mismatch or error) — either
#      fixed since and needing a fresh row, or genuinely broken and needing
#      the fastest possible feedback;
#   2. entries never checked by the driver in any round;
#   3. entries already driver-checked, in their original module order.
# History is read dynamically from the CORRECTNESS_r*.json files the driver
# itself writes into the repo root, so the ordering self-updates every round
# without editing this module.  The static r2-r3 snapshot below is the
# fallback when no history files are readable (package imported outside the
# repo checkout).
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


_LATEST_ROWS_CACHE: list = []


def _latest_rows():
    """Most recent driver row per query from CORRECTNESS_r*.json (later
    rounds override earlier; files sort lexicographically by round —
    the driver zero-pads round numbers), or None when no history is
    readable. Each row gains a ``_round`` key — the round number of the
    file it came from — so the ordering below can rank green entries by
    evidence freshness. Parsed once per process (module-level memo):
    both _driver_history() and the staleness ranking consume it during
    the same import."""
    import json
    import re
    from pathlib import Path

    if _LATEST_ROWS_CACHE:
        return _LATEST_ROWS_CACHE[0]
    latest = {}
    try:
        root = Path(__file__).resolve().parents[1]
        for p in sorted(root.glob("CORRECTNESS_r*.json")):
            try:
                data = json.loads(p.read_text())
            except (OSError, ValueError):
                continue
            m = re.search(r"r(\d+)", p.name)
            rnd = int(m.group(1)) if m else 0
            if isinstance(data, dict):
                for k, v in data.items():
                    if isinstance(v, dict):
                        latest[k] = dict(v, _round=rnd)
    except OSError:
        return None
    result = latest or None
    _LATEST_ROWS_CACHE.append(result)
    return result


def _driver_history():
    """Latest driver verdict per query from CORRECTNESS_r*.json, if present.

    Returns (red, checked): names whose most recent driver row failed or
    errored, and all names that have ever received a driver row.
    Returns (None, None) when no history is readable.
    """
    latest = _latest_rows()
    if latest is None:
        return None, None
    red = {
        n for n, row in latest.items()
        if row.get("rows_match") is False
        or row.get("schema_match") is False
        or row.get("hash_match") is False
        or row.get("err") not in (None, "no_oracle")
        # rows-only in the last driver row but an oracle twin exists NOW:
        # the oracle was added after that row, so a fresh check upgrades a
        # weak verdict to a hash verdict.
        or (row.get("err") == "no_oracle" and n in ORACLE)
    }
    return red, set(latest)


# Never-checked entries to surface FIRST within the never-checked group:
# the driver samples ~50/round in registry order, and these would
# otherwise sit just past the window for another round (r8 verdict task:
# approx_quantiles_verified is the last sketch query without a driver
# row — once it lands, every registry entry is either hash-green or
# rows-only-by-design with a green verified twin).
_NEVER_PRIORITY = ["approx_quantiles_verified"]

# Queries whose ENGINE-SIDE behavior changed since their latest driver
# row: they jump the green queue (right after red/never-checked) so the
# change earns a fresh driver row the next round instead of riding stale
# evidence. Maintained by hand when a semantics-affecting commit lands;
# prune entries once the fresh row is in a CORRECTNESS_r*.json. The
# round recorded here is the round the change SHIPPED — an entry is
# stale only while its latest driver row predates that round.
_CHANGED_SINCE = {
    # r9 behavior changes (r9 verdict, "Next round" #7):
    "gini_value": 10,                   # r9 zero-mass NULL + r10 sum>0 guard
    "rolling_fingerprint": 9,           # oracle change (d79cadb)
    "sink_partitioned_roundtrip": 9,    # explicit schema (1cba9d4)
    # r10 behavior changes:
    "dedup_minhash": 10,                # portable LSH + mirrored bucket cap
    "dedup_minhash_clusters": 10,
    "dedup_keep_best": 10,
    "near_dup_cluster_stats": 10,
    # r10 adversarial-sweep changes the r10 bump list missed (r10 verdict
    # "What's missing" #1 — the backfill; latest driver rows r4-r9 all
    # predate the commits 3841e2a/9f3d03d/ad1e9f9/127d9ab/e78a728 that
    # changed them; scalar_string_math is NOT here because its r10 row
    # postdates 1bb0c16):
    "dedup_simhash": 10,                # unicode-safe simhash (3841e2a)
    "multimodal_features": 10,          # oracle bytes-not-codepoints
    "multimodal_frames": 10,            # oracle bytes-not-codepoints
    "text_scrub": 10,                   # ASCII-\s token contract
    "text_quality": 10,                 # denom guards (9f3d03d)
    "text_repetition": 10,              # denom guards (9f3d03d)
    "udtf_sentences": 10,               # space-only trim twin (e78a728)
    "fuzzy_match_parts": 10,            # levenshtein chars contract
    "corr_measures": 10,                # radicand guard (127d9ab)
    "benford_digits": 10,               # log10 constant pin (ac52440)
    "markov_stationary": 10,            # sweep fix
    "anova_oneway": 10,                 # 2^53 rail (ad1e9f9)
    "t_test_welch": 10,                 # radicand guard
    "spearman_corr": 10,                # radicand guard
    "kendall_tau_daily": 10,            # radicand guard
    "cross_correlation_lag": 10,        # XCORR guard (ad1e9f9)
    # r11 behavior changes:
    "moments_value": 11,                # s1..s4 emitted as STRING carriers
}


def _changed_since():
    """Hand list merged with the mechanical fingerprint snapshot
    (ORACLE_HASHES.json, maintained by tools/update_fingerprints.py and
    pinned fresh by tests/test_fingerprints.py): per query, the latest
    round at which its semantics are known to have changed.  The hand
    list survives for helper classes the fingerprint closure cannot see
    and for the pre-r11 backfill; the snapshot catches everything the
    hand forgot — the r10 failure mode this closes (r10 verdict,
    "What's wrong" #2)."""
    import json
    from pathlib import Path

    merged = dict(_CHANGED_SINCE)
    try:
        snap = json.loads(
            (Path(__file__).resolve().parents[1] / "ORACLE_HASHES.json")
            .read_text()
        ).get("queries", {})
    except (OSError, ValueError):
        return merged
    for name, ent in snap.items():
        rnd = ent.get("round", 0)
        if rnd > merged.get(name, 0):
            merged[name] = rnd
    return merged


def _registry_order(names):
    red, checked = _driver_history()
    latest = _latest_rows() or {}
    if checked is None:  # fallback: static r2-r3 snapshot
        red, checked = set(_RECHECK_FIRST), _DRIVER_CHECKED_R2_R3

    def last_round(n):
        return latest.get(n, {}).get("_round", 0)

    front = [n for n in names if n in red]
    never = [n for n in names if n not in checked and n not in red]
    never = [n for n in _NEVER_PRIORITY if n in never] + [
        n for n in never if n not in _NEVER_PRIORITY
    ]
    green = [n for n in names if n in checked and n not in red]
    # Changed-since-last-row entries jump the green queue: their driver
    # evidence predates the behavior change, so a fresh row is worth
    # more than re-greening an unchanged query.
    changed_since = _changed_since()
    stale_changed = [
        n for n in green
        if n in changed_since and last_round(n) < changed_since[n]
    ]
    rest_green = [n for n in green if n not in stale_changed]
    # Staleness rotation (r9 verdict, "Next round" #2): order the green
    # tier by ASCENDING last-checked round instead of static module
    # order — the driver's ~50 slots then rotate through the whole
    # registry every ~7 rounds instead of re-checking the same
    # front-of-module entries while late-module entries sit on r2-r3
    # evidence forever. Name tiebreak keeps the order deterministic.
    rest_green.sort(key=lambda n: (last_round(n), n))

    # Within each group, oracle-backed entries go first: a driver check of
    # a rows-only entry can only ever yield a weak rows-only row, so it
    # should not consume budget ahead of an entry that can earn a full
    # hash verdict.  Rows-only entries still surface once the hash-backed
    # backlog drains (they stay "never checked" until then).
    def by_oracle(group):
        return [n for n in group if n in ORACLE] + [
            n for n in group if n not in ORACLE
        ]

    return (
        by_oracle(front)
        + by_oracle(never)
        + by_oracle(stale_changed)
        + by_oracle(rest_green)
    )


QUERIES = {n: QUERIES[n] for n in _registry_order(list(QUERIES))}
ORACLE = {n: ORACLE[n] for n in QUERIES if n in ORACLE}
