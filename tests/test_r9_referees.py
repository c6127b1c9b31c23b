"""Crafted-input referee tests for the round-8/9 operators that had no
dedicated pytest (they are oracle-verified at sf0.01, but nothing pinned
their math on inputs where the expected answer is hand-computable).

Each test monkeypatches the loader seam of the operator's module (the
test_degree_cap convention) or cross-checks the operator against an
independent computation of the same quantity.
"""

from __future__ import annotations

import hashlib
import math
from datetime import date, datetime
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import functions as F

from mapreduce_sssp_spark.operators import event_windows as EW
from mapreduce_sssp_spark.operators import sampling as SA
from mapreduce_sssp_spark.operators import scale_patterns as SP


def _events(spark, rows):
    """rows: (day_of_jan, user_id, event_type, value)."""
    return spark.createDataFrame(
        [
            (i, datetime(2024, 1, d, 12, 0, 0), u, t, float(v), None)
            for i, (d, u, t, v) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double, props string",
    )


def test_cumulative_distinct_users_first_seen_referee(spark, monkeypatch):
    ev = _events(
        spark,
        [(1, 1, "a", 0), (1, 2, "a", 0), (2, 2, "a", 0), (2, 3, "a", 0),
         (4, 1, "a", 0)],
    )
    monkeypatch.setattr(EW, "load_table", lambda _s, _d, _t: ev)
    out = {
        r.day: (r.n_active, r.n_new, r.cum_users)
        for r in EW.q_cumulative_distinct_users(spark, "unused").collect()
    }
    assert out == {
        date(2024, 1, 1): (2, 2, 2),
        date(2024, 1, 2): (2, 1, 3),
        date(2024, 1, 4): (1, 0, 3),
    }


def test_forecast_backtest_seasonal_referee(spark, monkeypatch):
    # "flat": identical every day -> the weekly-naive forecast is exact.
    # "step": week 1 at 1.00/day, weeks 2-4 at 2.00/day -> days 8-14
    # have APE |200-100|/200 = 0.5, days 15-28 are exact again.
    rows = [(d, 1, "flat", 5.0) for d in range(1, 29)]
    rows += [(d, 1, "step", 1.0 if d <= 7 else 2.0) for d in range(1, 29)]
    monkeypatch.setattr(
        EW, "load_table", lambda _s, _d, _t: _events(spark, rows)
    )
    out = {
        r.event_type: r
        for r in EW.q_forecast_backtest(spark, "unused").collect()
    }
    assert out["flat"].n_days == 21
    assert out["flat"].sum_ape_e6 == 0
    assert out["step"].n_days == 21
    assert out["step"].sum_ape_e6 == 7 * 500_000
    assert abs(out["step"].mape_e6 - 3_500_000 / 21) < 1e-6


def test_conformal_interval_constant_residual_referee(spark, monkeypatch):
    # y(d) = 1000 + 10*d cents -> the weekly-naive residual is exactly
    # 70 cents every day. Calibration (days 8-19, n=12) picks rank
    # ceil(13 * 9 / 10) = 12 -> qhat = 70; every eval day is covered.
    rows = [(d, 1, "t", 10.0 + 0.10 * d) for d in range(1, 29)]
    monkeypatch.setattr(
        EW, "load_table", lambda _s, _d, _t: _events(spark, rows)
    )
    [r] = EW.q_conformal_interval(spark, "unused").collect()
    assert r.n_cal == 12
    assert r.qhat_cents == 70
    assert r.n_eval == 9  # days 20-28
    assert r.n_covered == 9
    assert r.coverage == 1.0


def test_psi_stability_referee(spark, monkeypatch):
    # "same": identical per-period value multisets -> every common bin
    # has a_n/a_tot == e_n/e_tot, ln(1) = 0, PSI exactly 0.
    vals = [1.0, 2.0, 3.0, 4.0, 5.0]
    rows = [(d, 1, "same", v) for d in (1, 2, 3) for v in vals]
    rows += [(d, 1, "same", v) for d in (20, 21, 22) for v in vals]
    # "drift": ref 10x1.00 + 10x5.00, cur 10x1.00 + 30x5.00 -> two
    # occupied bins; PSI terms hand-computed below.
    rows += [(1, 1, "drift", 1.0)] * 10 + [(2, 1, "drift", 5.0)] * 10
    rows += [(20, 1, "drift", 1.0)] * 10 + [(21, 1, "drift", 5.0)] * 30
    monkeypatch.setattr(
        EW, "load_table", lambda _s, _d, _t: _events(spark, rows)
    )
    out = EW.q_psi_stability(spark, "unused").collect()
    same = [r for r in out if r.event_type == "same"]
    assert same and all(r.term_e9 == 0 for r in same)
    assert all(r.psi_e9 == 0 for r in same)

    def e9(x: float) -> int:
        return int(Decimal(x).quantize(Decimal(1), rounding=ROUND_HALF_UP))

    t_lo = e9((10 / 40 - 10 / 20) * math.log((10 * 20) / (10 * 40)) * 1e9)
    t_hi = e9((30 / 40 - 10 / 20) * math.log((30 * 20) / (10 * 40)) * 1e9)
    drift = {r.bin: r for r in out if r.event_type == "drift"}
    assert drift[0].e_n == 10 and drift[0].a_n == 10
    assert drift[0].term_e9 == t_lo
    assert drift[9].e_n == 10 and drift[9].a_n == 30
    assert drift[9].term_e9 == t_hi
    assert all(r.psi_e9 == t_lo + t_hi for r in drift.values())


def test_pseudonymize_users_referee(spark, monkeypatch):
    rows = [(1, 7, "a", 0), (2, 7, "b", 0), (2, 8, "a", 0)]
    monkeypatch.setattr(
        SA, "load_table", lambda _s, _d, _t: _events(spark, rows)
    )
    out = {
        r.user_token: r for r in SA.q_pseudonymize_users(spark, "x").collect()
    }
    tok7 = hashlib.sha256(f"{SA.PSEUDO_SALT}|7".encode()).hexdigest()[:16]
    tok8 = hashlib.sha256(f"{SA.PSEUDO_SALT}|8".encode()).hexdigest()[:16]
    assert set(out) == {tok7, tok8}  # same user -> same token, no raw ids
    assert (out[tok7].n_events, out[tok7].n_active_days,
            out[tok7].n_event_types) == (2, 2, 2)
    assert (out[tok8].n_events, out[tok8].n_active_days,
            out[tok8].n_event_types) == (1, 1, 1)


def test_bloom_prune_join_no_false_negatives(spark, monkeypatch):
    cust = spark.createDataFrame(
        [(k,) for k in range(1, 201)], "c_custkey long"
    )
    # Probe side referencing ONLY build keys (multiples of 25): with
    # zero false negatives every probe must be a candidate, exactly.
    orders_true = spark.createDataFrame(
        [(i, 25 * (1 + i % 8)) for i in range(40)],
        "o_orderkey long, o_custkey long",
    )

    def fake_load(_s, _d, name):
        return cust if name == "customer" else orders_true

    monkeypatch.setattr(SP, "load_table", fake_load)
    [r] = SP.q_bloom_prune_join(spark, "unused").collect()
    assert r.n_build_keys == 8
    assert r.n_probes == 40
    assert r.n_true == 40
    assert r.n_candidates == 40  # bloom filters never false-negative
    assert r.n_false_pos == 0
    assert r.fp_rate is None  # no negative probes: rate undefined

    # Mixed probe side: true matches stay exact, candidates bound below
    # by the true matches, false positives are the (exact) remainder.
    orders_mixed = spark.createDataFrame(
        [(i, i) for i in range(1, 101)], "o_orderkey long, o_custkey long"
    )
    monkeypatch.setattr(
        SP, "load_table",
        lambda _s, _d, name: cust if name == "customer" else orders_mixed,
    )
    [r] = SP.q_bloom_prune_join(spark, "unused").collect()
    assert r.n_true == 4  # custkeys 25, 50, 75, 100
    assert r.n_candidates >= r.n_true
    assert r.n_false_pos == r.n_candidates - r.n_true


def test_approx_quantiles_verified_rank_window(spark, monkeypatch):
    # r11 semantics: the verifier checks the GK estimate's exact RANK
    # window, which is the sketch's actual guarantee. Group B is
    # bimodal with Q1 falling in a value GAP (exact interpolation gives
    # ~74.25 but the sketch can only return an actual element, 0.01 or
    # 99.0) — the r9 value-envelope referee asserted FALSE here, i.e.
    # it required flagging a CORRECT sketch; the r11 adversarial sweep
    # hit exactly that false positive on negative-return lineitem
    # groups. Under the rank window, every flag on correct sketches is
    # TRUE regardless of value gaps.
    rows = [("A", float(i)) for i in range(1, 2001)]
    rows += [("A", 1e6)] * 5 + [("B", 0.01)] * 100 + [("B", 99.0)] * 300
    li = spark.createDataFrame(
        rows, "l_returnflag string, l_extendedprice double"
    )
    monkeypatch.setattr(SP, "load_table", lambda _s, _d, _t: li)
    out = {
        r.l_returnflag: r
        for r in SP.q_approx_quantiles_verified(spark, "unused").collect()
    }
    a = out["A"]
    assert a.n_rows == 2005 and a.max_price == 1e6
    assert a.q1_in_envelope and a.median_in_envelope and a.q3_in_envelope
    b = out["B"]
    assert b.q1_in_envelope and b.median_in_envelope and b.q3_in_envelope


def test_approx_quantiles_verified_detects_broken_sketch(spark, monkeypatch):
    # The detector must still FIRE on a genuinely broken sketch: feed
    # estimates far outside every rank window (a regression off by
    # orders of magnitude) and every flag goes FALSE.
    from pyspark.sql import functions as realF

    rows = [("A", float(i)) for i in range(1, 2001)]
    li = spark.createDataFrame(
        rows, "l_returnflag string, l_extendedprice double"
    )
    monkeypatch.setattr(SP, "load_table", lambda _s, _d, _t: li)
    monkeypatch.setattr(
        SP.F,
        "percentile_approx",
        lambda _c, _p, _a: realF.array(
            realF.lit(-9.9e9), realF.lit(0.123), realF.lit(9.9e9)
        ),
    )
    out = SP.q_approx_quantiles_verified(spark, "unused").collect()
    (a,) = out
    assert not a.q1_in_envelope
    assert not a.median_in_envelope
    assert not a.q3_in_envelope


def test_pack_efficiency_report_consistent_with_packs(spark, sf_dir):
    packs = SA.q_pack_sequences(spark, sf_dir).collect()
    agg = {}
    for p in packs:
        n, d, c, o = agg.get(p.shard, (0, 0, 0, 0))
        agg[p.shard] = (
            n + 1,
            d + p.n_docs,
            c + p.total_chars,
            o + (1 if p.total_chars > SA.PACK_CAPACITY else 0),
        )
    out = SA.q_pack_efficiency_report(spark, sf_dir).collect()
    assert {r.shard for r in out} == set(agg)
    for r in out:
        n, d, c, o = agg[r.shard]
        assert (r.n_packs, r.n_docs, r.total_chars, r.n_over) == (n, d, c, o)
        assert abs(r.utilization - c / (n * SA.PACK_CAPACITY)) < 1e-12


def test_observed_load_metrics_matches_direct_aggregate(spark, sf_dir):
    from mapreduce_sssp_spark.io.sources import load_table
    from mapreduce_sssp_spark.operators.python_surface import (
        q_observed_load_metrics,
    )

    [obs] = q_observed_load_metrics(spark, sf_dir).collect()
    [direct] = (
        load_table(spark, sf_dir, "orders")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(F.datediff("o_orderdate", F.lit("1970-01-01"))).alias("mn"),
            F.max(F.datediff("o_orderdate", F.lit("1970-01-01"))).alias("mx"),
            F.sum(
                F.expr(
                    "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100"
                    " AS BIGINT)"
                )
            ).alias("cents"),
        )
        .collect()
    )
    assert obs.n_rows == direct.n_rows
    assert obs.n_null_priority == 0
    assert obs.min_date_days == direct.mn
    assert obs.max_date_days == direct.mx
    assert obs.sum_cents == direct.cents


def test_sink_clustered_write_roundtrip(spark, sf_dir):
    from mapreduce_sssp_spark.io.sinks import q_sink_clustered_write
    from mapreduce_sssp_spark.io.sources import load_table

    back = q_sink_clustered_write(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    assert back.count() == orders.count()
    assert (
        back.agg(F.count_distinct("o_orderkey")).collect()[0][0]
        == orders.agg(F.count_distinct("o_orderkey")).collect()[0][0]
    )


def test_gini_zero_mass_is_null_not_crash(spark):
    # Same ANSI 0/0 class as bloom's fp_rate: a type whose value mass
    # sums to exactly zero must yield NULL gini, not DIVIDE_BY_ZERO.
    from mapreduce_sssp_spark.operators.relational import gini_value

    ev = _events(
        spark,
        [(1, 1, "zero", 0.0), (2, 1, "zero", 0.0),
         (1, 1, "cancel", -5.0), (2, 1, "cancel", 5.0),
         (1, 1, "negsum", -5.0), (2, 1, "negsum", 3.0),
         (1, 1, "ok", 1.0), (2, 1, "ok", 3.0)],
    )
    out = {r.event_type: r for r in gini_value(ev).collect()}
    assert out["zero"].gini is None
    assert out["cancel"].gini is None
    # Guard is sum > 0, not sum != 0: a partially-cancelling type with
    # NEGATIVE total mass (-5.00 + 3.00 = -2.00) passes a != 0 guard and
    # yields a sign-flipped, meaningless Gini — it must be NULL too.
    assert out["negsum"].gini is None
    # referee: n=2, values 1.00/3.00 -> G = (2*(1*100+2*300)-(3)*400)
    #          / (2*400) = 200/800 = 0.25
    assert abs(out["ok"].gini - 0.25) < 1e-12


def test_geo_catchment_brute_force_referee(spark, monkeypatch):
    from mapreduce_sssp_spark.operators import geo as GEO

    keys = list(range(1, 61))
    cust = spark.createDataFrame([(k,) for k in keys], "c_custkey long")
    monkeypatch.setattr(GEO, "load_table", lambda _s, _d, _t: cust)

    def latlon(k):
        return (
            (((k % 40) * 7919) % 16800 + (k * 48271) % 60) / 100 - 85.0,
            (((k % 40) * 104729) % 35700 + (k * 69621) % 60) / 100 - 179.0,
        )

    def hav(lat1, lon1, lat2, lon2):
        a = (
            math.sin(math.radians(lat2 - lat1) / 2) ** 2
            + math.cos(math.radians(lat1))
            * math.cos(math.radians(lat2))
            * math.sin(math.radians(lon2 - lon1) / 2) ** 2
        )
        return round(2.0 * GEO.EARTH_R_M * math.asin(math.sqrt(a)))

    centers = [
        ((i * 7919) % 16800 / 100 - 85.0, (i * 104729) % 35700 / 100 - 179.0)
        for i in range(GEO.N_CITIES)
    ]
    want: dict[int, list[int]] = {}
    for k in keys:
        lat, lon = latlon(k)
        dist, city = min(
            (hav(lat, lon, clat, clon), i)
            for i, (clat, clon) in enumerate(centers)
        )
        want.setdefault(city, []).append(dist)
    got = {
        r.city: r for r in GEO.q_geo_catchment(spark, "unused").collect()
    }
    assert set(got) == set(want)
    for city, dists in want.items():
        r = got[city]
        assert r.n_customers == len(dists)
        # libm vs JVM Math may differ in the last ulp before round():
        # allow 1 m per member on the sums, exact on the counts.
        assert abs(r.sum_dist_m - sum(dists)) <= len(dists)
        assert abs(r.max_dist_m - max(dists)) <= 1
