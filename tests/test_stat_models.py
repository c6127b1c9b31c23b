"""Independent referees for the stat_models batch: each query is
recomputed from the raw parquet with numpy/pure Python straight from
the textbook definition and compared against the registered query.
The oracle gate proves Spark == DuckDB; these prove both == the
quantity they claim to be.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np

SF = "/root/testdata/sf0.001"


def _duck(sql):
    con = duckdb.connect()
    for t in ("events", "orders", "lineitem", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con.execute(sql).fetchall()


def test_cross_correlation_matches_numpy(spark):
    from mapreduce_sssp_spark.operators.stat_models import (
        XCORR_MAX_LAG,
        XCORR_X,
        XCORR_Y,
        q_cross_correlation_lag,
    )

    rows = _duck(
        "SELECT CAST(ts AS DATE), event_type FROM events"
    )
    days = sorted({d for d, _ in rows})
    cx = {d: 0 for d in days}
    cy = {d: 0 for d in days}
    for d, t in rows:
        if t == XCORR_X:
            cx[d] += 1
        elif t == XCORR_Y:
            cy[d] += 1
    got = {r.lag: r for r in q_cross_correlation_lag(spark, SF).collect()}
    assert set(got) == set(range(XCORR_MAX_LAG + 1))
    dayset = set(days)
    for lag in range(XCORR_MAX_LAG + 1):
        import datetime

        pairs = [
            (cx[d], cy[d + datetime.timedelta(days=lag)])
            for d in days
            if d + datetime.timedelta(days=lag) in dayset
        ]
        xs = np.array([p[0] for p in pairs], dtype=float)
        ys = np.array([p[1] for p in pairs], dtype=float)
        r = np.corrcoef(xs, ys)[0, 1]
        assert got[lag].n_days == len(pairs)
        assert math.isclose(got[lag].xcorr, r, rel_tol=1e-9)


def test_kendall_tau_matches_bruteforce(spark):
    from mapreduce_sssp_spark.operators.stat_models import (
        q_kendall_tau_daily,
    )

    rows = _duck(
        "SELECT o_orderdate, COUNT(*),"
        " SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))"
        " FROM orders GROUP BY 1 ORDER BY 1"
    )
    x = np.array([r[1] for r in rows], dtype=np.int64)
    y = np.array([int(r[2]) for r in rows], dtype=np.int64)
    dx = np.sign(x[:, None] - x[None, :])[np.triu_indices(len(x), k=1)]
    dy = np.sign(y[:, None] - y[None, :])[np.triu_indices(len(y), k=1)]
    n0 = len(dx)
    conc = int(np.sum((dx * dy) > 0))
    disc = int(np.sum((dx * dy) < 0))
    tie_x = int(np.sum(dx == 0))
    tie_y = int(np.sum(dy == 0))
    tau = (conc - disc) / (
        math.sqrt(n0 - tie_x) * math.sqrt(n0 - tie_y)
    )
    (got,) = q_kendall_tau_daily(spark, SF).collect()
    assert (got.n0, got.n_conc, got.n_disc) == (n0, conc, disc)
    assert (got.n_tie_x, got.n_tie_y) == (tie_x, tie_y)
    assert math.isclose(got.tau_b, tau, rel_tol=1e-12)


def test_ols_multifeature_matches_lstsq(spark):
    from mapreduce_sssp_spark.operators.stat_models import (
        q_ols_multifeature,
    )

    rows = _duck(
        "SELECT l_returnflag, CAST(l_quantity AS BIGINT),"
        " CAST(CAST(l_discount AS DECIMAL(18,4)) * 10000 AS BIGINT),"
        " CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        " FROM lineitem"
    )
    got = {r.l_returnflag: r for r in q_ols_multifeature(spark, SF).collect()}
    flags = sorted({r[0] for r in rows})
    assert set(got) == set(flags)
    for flag in flags:
        sub = [r for r in rows if r[0] == flag]
        X = np.array([[1.0, r[1], r[2]] for r in sub])
        yv = np.array([float(r[3]) for r in sub])
        beta, *_ = np.linalg.lstsq(X, yv, rcond=None)
        g = got[flag]
        assert g.n == len(sub)
        # lstsq uses SVD; the closed form is exact algebra on exact
        # sums — agreement to 1e-6 relative is the right referee bar.
        assert math.isclose(g.b0_cents, beta[0], rel_tol=1e-6)
        assert math.isclose(g.b1_cents_per_qty, beta[1], rel_tol=1e-6)
        assert math.isclose(g.b2_cents_per_bp, beta[2], rel_tol=1e-6)


def test_weighted_median_matches_bruteforce(spark):
    from mapreduce_sssp_spark.operators.stat_models import (
        q_weighted_median,
    )

    rows = _duck(
        "SELECT l_returnflag,"
        " CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT),"
        " CAST(l_quantity AS BIGINT) FROM lineitem"
    )
    got = {r.l_returnflag: r for r in q_weighted_median(spark, SF).collect()}
    by_flag = {}
    for flag, cents, w in rows:
        by_flag.setdefault(flag, []).append((cents, w))
    assert set(got) == set(by_flag)
    for flag, vals in by_flag.items():
        vals.sort()
        tot = sum(w for _, w in vals)
        cum = 0
        for cents, w in vals:
            cum += w
            if 2 * cum >= tot:
                break
        assert got[flag].wmedian_cents == cents
        assert got[flag].total_weight == tot


def test_pr_auc_matches_bruteforce(spark):
    from mapreduce_sssp_spark.operators.stat_models import (
        q_pr_auc_features,
    )
    from mapreduce_sssp_spark.operators.similarity import AUC_N_FEATURES

    rows = _duck("SELECT label, embedding FROM embeddings")
    got = {
        (r.label, r.feature_idx): r
        for r in q_pr_auc_features(spark, SF).collect()
    }
    labels = sorted({r[0] for r in rows})
    assert set(got) == {
        (lab, j) for lab in labels for j in range(AUC_N_FEATURES)
    }
    for lab in labels:
        for j in range(AUC_N_FEATURES):
            scored = [
                (round(float(emb[j]) * 1e6), 1 if label == lab else 0)
                for label, emb in rows
            ]
            # group convention: descending score, ties as one block,
            # each block contributes dTP * precision-at-block-end,
            # each term quantized to e12 before summation.
            by_score = {}
            for s, pos in scored:
                n, p = by_score.get(s, (0, 0))
                by_score[s] = (n + 1, p + pos)
            tp = fp = 0
            ap_e12 = 0
            n_pos = sum(p for _, p in by_score.values())
            n_neg = sum(n - p for n, p in by_score.values())
            for s in sorted(by_score, reverse=True):
                n, p = by_score[s]
                tp += p
                fp += n - p
                if p > 0:
                    ap_e12 += round(p * tp / (tp + fp) * 1e12)
            g = got[(lab, j)]
            assert (g.n_pos, g.n_neg) == (n_pos, n_neg)
            assert math.isclose(
                g.avg_precision, ap_e12 / (n_pos * 1e12), rel_tol=1e-12
            )


def test_stratified_ate_matches_bruteforce(spark):
    from mapreduce_sssp_spark.operators.stat_models import (
        ATE_STRATA,
        q_stratified_ate,
    )

    rows = _duck(
        "SELECT user_id, event_type,"
        " CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) FROM events"
    )
    users = {}
    for uid, typ, cents in rows:
        a, t, o = users.get(uid, (0, 0, 0))
        users[uid] = (
            a + 1,
            max(t, 1 if typ == "error" else 0),
            o + (cents if typ == "purchase" else 0),
        )
    n_total = len(users)
    # value-homogeneous strata from the inclusive activity-histogram CDF
    acts = sorted({a for a, _, _ in users.values()})
    cw = 0
    stratum_of = {}
    counts = {}
    for a, _, _ in users.values():
        counts[a] = counts.get(a, 0) + 1
    for a in acts:
        cw += counts[a]
        stratum_of[a] = (ATE_STRATA * cw + n_total - 1) // n_total
    cells = {}
    for a, t, o in users.values():
        s = stratum_of[a]
        nt, nc, st, sc = cells.get(s, (0, 0, 0, 0))
        if t:
            cells[s] = (nt + 1, nc, st + o, sc)
        else:
            cells[s] = (nt, nc + 1, st, sc + o)
    got = {r.stratum: r for r in q_stratified_ate(spark, SF).collect()}
    assert set(got) == set(cells)
    for s, (nt, nc, st, sc) in cells.items():
        g = got[s]
        assert (g.n_treated, g.n_control) == (nt, nc)
        if nt and nc:
            assert math.isclose(
                g.ate_cents, st / nt - sc / nc, rel_tol=1e-12
            )
        else:
            assert g.ate_cents is None


def test_t_test_welch_matches_numpy(spark):
    from mapreduce_sssp_spark.operators.stat_models import q_t_test_welch

    rows = _duck(
        "SELECT event_type,"
        " CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) FROM events"
    )
    groups = {}
    for t, c in rows:
        groups.setdefault(t, []).append(c)
    got = {
        (r.type_a, r.type_b): r for r in q_t_test_welch(spark, SF).collect()
    }
    types = sorted(groups)
    assert set(got) == {
        (a, b) for i, a in enumerate(types) for b in types[i + 1:]
    }
    for (ta, tb), g in got.items():
        xa = np.array(groups[ta], dtype=float)
        xb = np.array(groups[tb], dtype=float)
        va, vb = xa.var(ddof=1), xb.var(ddof=1)
        sea, seb = va / len(xa), vb / len(xb)
        t = (xa.mean() - xb.mean()) / math.sqrt(sea + seb)
        df = (sea + seb) ** 2 / (
            sea**2 / (len(xa) - 1) + seb**2 / (len(xb) - 1)
        )
        assert (g.n_a, g.n_b) == (len(xa), len(xb))
        assert math.isclose(g.t_stat, t, rel_tol=1e-9)
        assert math.isclose(g.welch_df, df, rel_tol=1e-9)


def test_anova_oneway_matches_numpy(spark):
    from mapreduce_sssp_spark.operators.stat_models import q_anova_oneway

    rows = _duck(
        "SELECT event_type,"
        " CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) FROM events"
    )
    groups = {}
    for t, c in rows:
        groups.setdefault(t, []).append(float(c))
    k = len(groups)
    n = sum(len(v) for v in groups.values())
    grand = sum(sum(v) for v in groups.values()) / n
    ssb = sum(len(v) * (np.mean(v) - grand) ** 2 for v in groups.values())
    ssw = sum(((np.array(v) - np.mean(v)) ** 2).sum()
              for v in groups.values())
    f = (ssb / (k - 1)) / (ssw / (n - k))
    (got,) = q_anova_oneway(spark, SF).collect()
    assert (got.k, got.n) == (k, n)
    # e3 quantization of the group terms bounds the drift well below 1e-6
    assert math.isclose(got.f_stat, f, rel_tol=1e-6)


def test_trimmed_mean_matches_bruteforce(spark):
    from mapreduce_sssp_spark.operators.stat_models import (
        TRIM_PERMILLE,
        q_trimmed_mean,
    )

    rows = _duck(
        "SELECT l_returnflag,"
        " CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        " FROM lineitem"
    )
    by_flag = {}
    for flag, cents in rows:
        by_flag.setdefault(flag, []).append(cents)
    got = {r.l_returnflag: r for r in q_trimmed_mean(spark, SF).collect()}
    assert set(got) == set(by_flag)
    for flag, vals in by_flag.items():
        vals.sort()
        n = len(vals)
        lo = n * TRIM_PERMILLE // 1000
        hi = n - lo
        kept = vals[lo:hi]
        g = got[flag]
        assert (g.n, g.n_kept) == (n, len(kept))
        assert math.isclose(
            g.trimmed_mean_cents, sum(kept) / len(kept), rel_tol=1e-12
        )


def test_ab_power_analysis_matches_formula(spark):
    from mapreduce_sssp_spark.operators.stat_models import (
        AB_Z_SUM,
        q_ab_power_analysis,
    )

    rows = _duck(
        "SELECT user_id % 2,"
        " MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)"
        " FROM events GROUP BY user_id"
    )
    n = {0: 0, 1: 0}
    conv = {0: 0, 1: 0}
    for v, c in rows:
        n[v] += 1
        conv[v] += c
    p_a, p_b = conv[0] / n[0], conv[1] / n[1]
    (got,) = q_ab_power_analysis(spark, SF).collect()
    assert (got.n_a, got.conv_a, got.n_b, got.conv_b) == (
        n[0], conv[0], n[1], conv[1],
    )
    assert math.isclose(got.observed_delta, p_a - p_b, rel_tol=1e-12)
    if p_a != p_b:
        want = math.ceil(
            AB_Z_SUM**2
            * (p_a * (1 - p_a) + p_b * (1 - p_b))
            / (p_a - p_b) ** 2
        )
        assert got.n_required_per_variant == want
    else:
        assert got.n_required_per_variant is None
