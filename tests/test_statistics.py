"""Independent referees for the round-7 statistics operators: each
estimator is recomputed from the raw parquet with numpy/pure Python
(definitions straight from the textbook formulas) and compared against
the registered query. The oracle gate proves Spark == DuckDB; these
prove both == the statistic they claim to be.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def _duck(sql):
    con = duckdb.connect()
    for t in ("events", "orders", "embeddings", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    return con.execute(sql).fetchall()


def _daily_cents(rows):
    by = {}
    for et, day, cents in rows:
        by.setdefault(et, {}).setdefault(day, 0)
        by[et][day] += cents
    return by


DAILY_SQL = """
SELECT event_type, CAST(ts AS DATE) AS day,
       CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
FROM events
"""


def test_autocorrelation_matches_numpy(spark):
    from mapreduce_sssp_spark.operators.event_windows import (
        q_autocorrelation_daily,
    )

    got = {
        (r.event_type, r.lag): r.acf
        for r in q_autocorrelation_daily(spark, SF).collect()
    }
    by = _daily_cents(_duck(DAILY_SQL))
    for et, days in by.items():
        lo, hi = min(days), max(days)
        n = (hi - lo).days + 1
        x = np.zeros(n, dtype=np.float64)
        for d, v in days.items():
            x[(d - lo).days] = v
        xc = x - x.mean()
        den = float((xc * xc).sum())
        for k in range(1, 8):
            want = float((xc[k:] * xc[:-k]).sum()) / den
            assert got[(et, k)] == pytest.approx(want, rel=1e-9), (et, k)


def test_theil_sen_matches_bruteforce(spark):
    from mapreduce_sssp_spark.operators.event_windows import (
        q_theil_sen_trend,
    )

    got = {
        r.event_type: (r.n_pairs, r.slope_med)
        for r in q_theil_sen_trend(spark, SF).collect()
    }
    by = _daily_cents(_duck(DAILY_SQL))
    for et, days in by.items():
        pts = sorted(days.items())
        slopes = sorted(
            (y2 - y1) / float((d2 - d1).days)
            for i, (d1, y1) in enumerate(pts)
            for d2, y2 in pts[i + 1 :]
        )
        n = len(slopes)
        want = (slopes[(n - 1) // 2] + slopes[n // 2]) / 2.0
        assert got[et][0] == n
        assert got[et][1] == pytest.approx(want, rel=1e-12), et


def test_mann_whitney_matches_scipy_free_referee(spark):
    from mapreduce_sssp_spark.operators.event_windows import (
        q_mann_whitney_u,
    )

    rows = _duck(
        "SELECT event_type,"
        " CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) FROM events"
    )
    by = {}
    for et, c in rows:
        by.setdefault(et, []).append(c)
    got = {
        (r.type_a, r.type_b): r
        for r in q_mann_whitney_u(spark, SF).collect()
    }
    for (ta, tb), r in got.items():
        a, b = by[ta], by[tb]
        pooled = sorted(a + b)
        # average ranks, 1-indexed
        from collections import Counter

        cnt = Counter(pooled)
        rank = {}
        pos = 1
        for v in sorted(cnt):
            t = cnt[v]
            rank[v] = pos + (t - 1) / 2.0
            pos += t
        r_a = sum(rank[v] for v in a)
        u_a = r_a - len(a) * (len(a) + 1) / 2.0
        assert r.u2_a == int(round(2 * u_a))
        n, m = len(a), len(b)
        ties = sum(t**3 - t for t in cnt.values())
        var = n * m * ((n + m + 1) - ties / ((n + m) * (n + m - 1))) / 12.0
        want_z = (u_a - n * m / 2.0) / math.sqrt(var)
        assert r.z == pytest.approx(want_z, rel=1e-9), (ta, tb)


def test_roc_auc_matches_pairwise_counting(spark):
    from mapreduce_sssp_spark.operators.similarity import (
        AUC_N_FEATURES,
        q_roc_auc_features,
    )

    rows = _duck("SELECT label, embedding FROM embeddings")
    got = {
        (r.label, r.feature_idx): r.auc
        for r in q_roc_auc_features(spark, SF).collect()
    }
    labels = sorted({lab for lab, _ in rows})
    for j in range(AUC_N_FEATURES):
        scores = [(lab, round(float(e[j]) * 1e6)) for lab, e in rows]
        for target in labels:
            pos = [s for lab, s in scores if lab == target]
            neg = [s for lab, s in scores if lab != target]
            wins = sum(
                1.0 if p > q else 0.5 if p == q else 0.0
                for p in pos
                for q in neg
            )
            want = wins / (len(pos) * len(neg))
            assert got[(target, j)] == pytest.approx(want, rel=1e-12), (
                target,
                j,
            )


def test_max_drawdown_matches_bruteforce(spark):
    from mapreduce_sssp_spark.operators.event_windows import q_max_drawdown

    got = {r.event_type: r for r in q_max_drawdown(spark, SF).collect()}
    by = _daily_cents(_duck(DAILY_SQL))
    for et, days in by.items():
        pts = sorted(days.items())
        cum, peak, best = 0, None, (-1, None, None)
        peak_v = None
        for d, v in pts:
            cum += v
            if peak_v is None or cum > peak_v:
                peak_v = cum
            dd = peak_v - cum
            if dd > best[0]:
                best = (dd, d, peak_v)
        r = got[et]
        assert r.max_drawdown_cents == best[0], et
        assert r.trough_day == best[1], et
        assert r.peak_cents == best[2], et
        assert r.peak_day <= r.trough_day


def test_survival_km_monotone_and_risk_consistent(spark):
    from mapreduce_sssp_spark.operators.event_windows import q_survival_km

    rows = sorted(
        q_survival_km(spark, SF).collect(), key=lambda r: r.t_days
    )
    assert rows, "expected churn steps"
    prev_cum = 0
    prev_risk = None
    for r in rows:
        assert r.d_churn >= 1
        assert r.n_risk >= r.d_churn
        if prev_risk is not None:
            assert r.n_risk < prev_risk  # strictly shrinking risk set
        assert r.cum_ln_e6 <= prev_cum  # survival only decreases
        prev_cum = r.cum_ln_e6
        prev_risk = r.n_risk
