"""Independent referees for the round-8 statistics batch
(operators/stat_tests.py): each statistic is recomputed from the raw
parquet with numpy/pure Python (textbook formulas, no histogram
algebra) and compared against the registered query. The oracle gate
proves Spark == DuckDB; these prove both == the statistic they claim
to be.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np

from mapreduce_sssp_spark.operators import stat_tests as S

SF = "/root/testdata/sf0.001"


def _duck(sql):
    con = duckdb.connect()
    for t in ("events", "lineitem", "supplier", "documents"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con.execute(sql).fetchall()


def test_ks_two_sample_matches_numpy(spark):
    rows = _duck(
        "SELECT event_type,"
        " CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) FROM events"
    )
    by = {}
    for et, cents in rows:
        by.setdefault(et, []).append(cents)
    got = {
        (r.type_a, r.type_b): r
        for r in S.q_ks_two_sample(spark, SF).collect()
    }
    for (a, b), r in got.items():
        xa = np.sort(np.array(by[a]))
        xb = np.sort(np.array(by[b]))
        grid = np.union1d(xa, xb)
        fa = np.searchsorted(xa, grid, side="right") / len(xa)
        fb = np.searchsorted(xb, grid, side="right") / len(xb)
        d_ref = np.max(np.abs(fa - fb))
        assert r.n_a == len(xa) and r.n_b == len(xb)
        assert abs(r.ks_d - d_ref) < 1e-12, (a, b)
        z_ref = math.sqrt(len(xa) * len(xb) / (len(xa) + len(xb))) * d_ref
        assert abs(r.ks_stat - z_ref) < 1e-9


def _avg_ranks(vals):
    """Tie-averaged ranks, 1-based (scipy.stats.rankdata average)."""
    order = np.argsort(vals, kind="stable")
    ranks = np.empty(len(vals))
    sv = np.asarray(vals)[order]
    i = 0
    while i < len(sv):
        j = i
        while j + 1 < len(sv) and sv[j + 1] == sv[i]:
            j += 1
        ranks[order[i : j + 1]] = (i + j) / 2 + 1
        i = j + 1
    return ranks


def test_spearman_matches_numpy(spark):
    rows = _duck(
        "SELECT CAST(l_quantity AS BIGINT),"
        " CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        " FROM lineitem"
    )
    x = np.array([r[0] for r in rows], dtype=float)
    y = np.array([r[1] for r in rows], dtype=float)
    rx, ry = _avg_ranks(x), _avg_ranks(y)
    rho_ref = np.corrcoef(rx, ry)[0, 1]
    r = S.q_spearman_corr(spark, SF).collect()[0]
    assert r.n == len(rows)
    assert abs(r.spearman_rho - rho_ref) < 1e-9


def test_cramers_v_matches_numpy(spark):
    rows = _duck(
        "SELECT event_type, isodow(CAST(ts AS TIMESTAMP)), COUNT(*)"
        " FROM events GROUP BY 1, 2"
    )
    types = sorted({r[0] for r in rows})
    dows = sorted({r[1] for r in rows})
    tab = np.zeros((len(types), len(dows)))
    for et, dw, n in rows:
        tab[types.index(et), dows.index(dw)] = n
    n = tab.sum()
    e = np.outer(tab.sum(1), tab.sum(0)) / n
    chi2_ref = ((tab - e) ** 2 / e).sum()
    v_ref = math.sqrt(chi2_ref / (n * (min(tab.shape) - 1)))
    r = S.q_cramers_v(spark, SF).collect()[0]
    assert r.n == n and r.n_rows == len(types) and r.n_cols == len(dows)
    # chi2 is quantized per cell at e9; the summed rounding error is
    # bounded by n_cells/2 quanta.
    assert abs(r.chi2_e9 / 1e9 - chi2_ref) < len(rows) * 1e-9
    assert abs(r.cramers_v - v_ref) < 1e-7


def test_hhi_matches_numpy(spark):
    rows = _duck(
        "SELECT s.s_nationkey, l.l_suppkey,"
        " SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100"
        " AS BIGINT))"
        " FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey"
        " GROUP BY 1, 2"
    )
    by = {}
    for nat, _s, rev in rows:
        by.setdefault(nat, []).append(int(rev))
    got = {r.nation: r for r in S.q_hhi_concentration(spark, SF).collect()}
    assert set(got) == set(by)
    for nat, revs in by.items():
        shares = np.array(revs, dtype=float) / sum(revs)
        hhi_ref = float((shares**2).sum() * 1e4)
        r = got[nat]
        assert r.n_suppliers == len(revs)
        assert r.total_cents == sum(revs)
        assert abs(r.hhi_e6 / 1e6 - hhi_ref) < 1e-5
        assert abs(r.effective_n - 1e4 / hhi_ref) < 1e-6


def test_degree_gini_matches_numpy(spark):
    rows = _duck(
        "SELECT src, COUNT(*) FROM"
        " (SELECT DISTINCT l_suppkey AS src, l_partkey AS dst"
        "  FROM lineitem) GROUP BY src"
    )
    d = np.sort(np.array([r[1] for r in rows], dtype=float))
    n = len(d)
    gini_ref = (2 * np.sum(np.arange(1, n + 1) * d) - (n + 1) * d.sum()) / (
        n * d.sum()
    )
    r = S.q_degree_gini(spark, SF).collect()[0]
    assert r.n_nodes == n
    assert r.sum_deg == int(d.sum())
    assert abs(r.gini - gini_ref) < 1e-12


def test_harmonic_centrality_consistent_with_landmark_state(spark):
    from mapreduce_sssp_spark.operators.graph_queries import (
        _landmark_state,
    )

    st = {
        (r.landmark, r.node): r.dist
        for r in _landmark_state(spark, SF).collect()
    }
    ref = {}
    reach = {}
    for (lm, node), dist in st.items():
        if node == lm:
            continue
        ref[node] = ref.get(node, 0) + round(S.HARMONIC_SCALE / dist)
        reach[node] = reach.get(node, 0) + 1
    got = {r.node: r for r in S.q_harmonic_centrality(spark, SF).collect()}
    assert set(got) == set(ref)
    for node, r in got.items():
        assert r.harmonic_e12 == ref[node]
        assert r.n_reach == reach[node]


def test_temperature_mix_weights_math(spark):
    rows = dict(
        _duck("SELECT source, COUNT(*) FROM documents GROUP BY source")
    )
    w = {s: round(math.sqrt(n) * 1e6) for s, n in rows.items()}
    tot_w, tot_n = sum(w.values()), sum(rows.values())
    got = {
        r.source: r for r in S.q_temperature_mix_weights(spark, SF).collect()
    }
    assert set(got) == set(rows)
    for s, r in got.items():
        assert r.w_e6 == w[s]
        assert abs(r.share - w[s] / tot_w) < 1e-15
        assert abs(r.boost - (w[s] / tot_w) * (tot_n / rows[s])) < 1e-12
    # Temperature sampling must compress the spread: boosts of small
    # sources exceed 1, dominant sources fall below 1.
    smallest = min(rows, key=rows.get)
    largest = max(rows, key=rows.get)
    if rows[smallest] < rows[largest]:
        assert got[smallest].boost > got[largest].boost


def test_js_divergence_matches_numpy(spark):
    rows = _duck(
        "SELECT source, unnest(list_filter("
        " string_split_regex(trim(text), '\\s+'), x -> x <> '')) AS tok"
        " FROM documents"
    )
    from collections import Counter

    by = {}
    for src, tok in rows:
        by.setdefault(src, Counter())[tok] += 1

    def js(ca, cb):
        na, nb = sum(ca.values()), sum(cb.values())
        tot = 0.0
        for t in set(ca) | set(cb):
            p, q = ca.get(t, 0) / na, cb.get(t, 0) / nb
            if p > 0 and q > 0:
                tot += 0.5 * (
                    p * math.log(2 * p / (p + q))
                    + q * math.log(2 * q / (p + q))
                )
            elif p > 0:
                tot += 0.5 * p * math.log(2)
            else:
                tot += 0.5 * q * math.log(2)
        return tot

    got = {
        (r.src_a, r.src_b): r.js_e9
        for r in S.q_js_divergence_sources(spark, SF).collect()
    }
    srcs = sorted(by)
    assert len(got) == len(srcs) * (len(srcs) - 1) // 2
    for (a, b), js_e9 in got.items():
        ref = js(by[a], by[b])
        # e12 per-term quantization -> e9 output: rounding error per
        # term is <= 0.5e-12, summed over the pair's vocab.
        vocab = len(set(by[a]) | set(by[b]))
        assert abs(js_e9 / 1e9 - ref) < max(1e-9, vocab * 1e-12)
        assert 0 <= js_e9 <= 0.6931471806e9 * 1.001
