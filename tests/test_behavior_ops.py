"""Edge-case unit tests for the round-5 behavioral analytics operators
(funnel, retention, transitions, fuzzy matching, MAD outliers) on tiny
literal DataFrames with hand-computed expectations — the oracle gate
verifies them against DuckDB at sf0.01; these pin the SEMANTIC corners
(ordering constraints, window boundaries, tie-breaks) explicitly."""

from datetime import datetime

from pyspark.sql import functions as F

from mapreduce_sssp_spark.operators.event_windows import (
    funnel,
    retention,
    transitions,
)
from mapreduce_sssp_spark.operators.scale_patterns import fuzzy_nearest

TS = "user_id long, event_type string, ts timestamp_ntz, event_id long"


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, t, datetime.fromisoformat(ts), i) for i, (u, t, ts) in enumerate(rows)],
        TS,
    )


def test_funnel_order_and_window(spark):
    rows = [
        # u1: clean path, converts
        (1, "view", "2024-01-01T00:00:00"),
        (1, "click", "2024-01-02T00:00:00"),
        (1, "purchase", "2024-01-03T00:00:00"),
        # u2: purchase BEFORE click -> not a funnel purchase; no later one
        (2, "view", "2024-01-01T00:00:00"),
        (2, "purchase", "2024-01-01T06:00:00"),
        (2, "click", "2024-01-02T00:00:00"),
        # u3: converts but outside the 7-day window
        (3, "view", "2024-01-01T00:00:00"),
        (3, "click", "2024-01-02T00:00:00"),
        (3, "purchase", "2024-01-09T00:00:01"),
        # u4: click with NO prior view -> drops at step 2
        (4, "click", "2024-01-01T00:00:00"),
        (4, "view", "2024-01-02T00:00:00"),
    ]
    got = {r.user_id: r for r in funnel(_ev(spark, rows)).collect()}
    assert got[1].converted is True
    assert got[2].t_purchase is None and got[2].converted is False
    assert got[3].t_purchase is not None and got[3].converted is False
    # u4 has a view, so appears; its click precedes the view -> no click.
    assert got[4].t_click is None and got[4].converted is False


def test_funnel_boundary_is_inclusive(spark):
    rows = [
        (1, "view", "2024-01-01T00:00:00"),
        (1, "click", "2024-01-01T01:00:00"),
        (1, "purchase", "2024-01-08T00:00:00"),  # exactly +7 days
    ]
    (r,) = funnel(_ev(spark, rows)).collect()
    assert r.converted is True


def test_retention_excludes_pre_signup_weeks(spark):
    rows = [
        # u1 active the week BEFORE signing up; that week must not count
        (1, "view", "2024-01-02T00:00:00"),
        (1, "signup", "2024-01-09T00:00:00"),
        (1, "click", "2024-01-16T00:00:00"),
        # u2 never signs up -> absent entirely
        (2, "view", "2024-01-02T00:00:00"),
    ]
    got = {
        (r.cohort_week, r.week_offset): r.n_users
        for r in retention(_ev(spark, rows)).collect()
    }
    w2 = datetime(2024, 1, 8)  # Monday of u1's signup week
    assert got == {(w2, 0): 1, (w2, 1): 1}


def test_transitions_tie_break_on_event_id(spark):
    # Two events at the SAME timestamp: order falls back to event_id
    # (insertion order here), so the chain is view -> click -> purchase.
    rows = [
        (1, "view", "2024-01-01T00:00:00"),
        (1, "click", "2024-01-01T00:00:00"),
        (1, "purchase", "2024-01-01T00:05:00"),
    ]
    got = {
        (r.prev_type, r.next_type): (r.n_transitions, r.n_users)
        for r in transitions(_ev(spark, rows)).collect()
    }
    assert got == {("view", "click"): (1, 1), ("click", "purchase"): (1, 1)}


def test_transitions_streams_are_per_user(spark):
    rows = [
        (1, "view", "2024-01-01T00:00:00"),
        (2, "click", "2024-01-01T00:30:00"),  # interleaved other user
        (1, "click", "2024-01-01T01:00:00"),
    ]
    got = {(r.prev_type, r.next_type) for r in transitions(_ev(spark, rows)).collect()}
    assert got == {("view", "click")}  # never view->click across users


def test_fuzzy_nearest_blocks_and_duplicates(spark):
    recs = spark.createDataFrame(
        [
            (1, "azure plum"),
            (2, "azure plug"),    # dist 1 to 'azure plum' (m->g)
            (3, "azure slugs"),   # dist 2 to 'azure plug'; dist 3 to plum
            (4, "azure plum"),    # duplicate name: same match as key 1
            (10, "beige plum"),   # different block: never matched to azure*
        ],
        "key long, name string",
    )
    got = {r.key_a: (r.match_name, r.dist) for r in fuzzy_nearest(recs).collect()}
    assert got[1] == ("azure plug", 1)
    assert got[2] == ("azure plum", 1)
    assert got[3] == ("azure plug", 2)
    assert got[4] == got[1]  # matching runs on the distinct-name domain
    assert 10 not in got  # singleton block has no candidates


def test_fuzzy_nearest_tie_prefers_smaller_name(spark):
    recs = spark.createDataFrame(
        [(5, "red cap"), (7, "red cat"), (9, "red car")],
        "key long, name string",
    )
    got = {r.key_a: (r.match_name, r.dist) for r in fuzzy_nearest(recs).collect()}
    # All pairwise distances are 1 -> ties resolve to the lexicographically
    # smallest OTHER name.
    assert got == {
        5: ("red car", 1),
        7: ("red cap", 1),
        9: ("red cap", 1),
    }


def test_resample_ffill_fills_gaps_and_carries_last_value(spark):
    from mapreduce_sssp_spark.operators.event_windows import resample_ffill

    rows = [
        (1, "view", "2024-01-01T00:10:00"),   # hour 00, value below
        (1, "view", "2024-01-01T00:50:00"),   # same hour, later -> wins
        (1, "click", "2024-01-01T03:30:00"),  # hours 01,02 are gaps
    ]
    df = spark.createDataFrame(
        [
            (u, t, datetime.fromisoformat(ts), i, float(10 * (i + 1)))
            for i, (u, t, ts) in enumerate(rows)
        ],
        "user_id long, event_type string, ts timestamp_ntz,"
        " event_id long, value double",
    )
    got = {
        r.hour: (r.n_events, r.value_ffill)
        for r in resample_ffill(df).collect()
    }
    h = lambda s: datetime.fromisoformat(s)  # noqa: E731
    assert got == {
        h("2024-01-01T00:00:00"): (2, 20.0),  # last-in-hour wins
        h("2024-01-01T01:00:00"): (0, 20.0),  # gap: carried forward
        h("2024-01-01T02:00:00"): (0, 20.0),
        h("2024-01-01T03:00:00"): (1, 30.0),
    }


def test_regression_sufficient_stats_recover_exact_line(spark):
    """Points lying exactly on y = 2x + 5 (DECIMAL-exact) must recover
    slope 2.0 and intercept 5.0 bit-exactly — the sufficient statistics
    are integer/decimal sums, so no float error can creep in before the
    final closed-form division."""
    from decimal import Decimal

    from mapreduce_sssp_spark.operators.relational import q_regression_trend  # noqa: F401

    xs = [0, 1, 2, 3, 10, 50]
    df = spark.createDataFrame(
        [("g", x, Decimal(2 * x + 5)) for x in xs],
        "grp string, x int, y decimal(18,2)",
    )
    stats = df.groupBy("grp").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy_dec"),
        F.sum(F.expr("CAST(x AS DECIMAL(18,2)) * y")).alias("sxy_dec"),
        F.sum(F.expr("CAST(x AS BIGINT) * CAST(x AS BIGINT)")).alias("sxx"),
    )
    slope = (
        "(CAST(n AS DOUBLE) * CAST(sxy_dec AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sy_dec AS DOUBLE))"
        " / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    )
    (r,) = stats.select(
        F.expr(slope).alias("slope"),
        F.expr(
            f"(CAST(sy_dec AS DOUBLE) - ({slope}) * CAST(sx AS DOUBLE))"
            " / CAST(n AS DOUBLE)"
        ).alias("intercept"),
    ).collect()
    assert r.slope == 2.0 and r.intercept == 5.0


def test_outliers_mad_flags_the_planted_outlier(spark):
    from mapreduce_sssp_spark.operators.relational import q_outliers_mad  # noqa: F401

    # Exercise the same agg logic on a literal frame via the module's
    # building blocks: med=10, MAD=1, 1000 is a screaming outlier.
    df = spark.createDataFrame(
        [("g", float(v)) for v in [9, 9, 10, 10, 10, 11, 11, 1000]],
        "l_returnflag string, l_extendedprice double",
    )
    med = df.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("med")
    )
    dev = df.join(F.broadcast(med), "l_returnflag").withColumn(
        "adev", F.abs(F.col("l_extendedprice") - F.col("med"))
    )
    mad = dev.groupBy("l_returnflag").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    (r,) = (
        dev.join(F.broadcast(mad), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(F.expr("count_if(0.6745 * adev > 3.5 * mad)").alias("n_outliers"))
        .collect()
    )
    assert r.n_outliers == 1


def test_winsorize_bounds_and_counts(spark, sf_dir):
    """Clip counts match the [p05, p95] tail mass and the winsorized
    sum is bounded by the raw sum from above or below appropriately."""
    from pyspark.sql import functions as F

    from mapreduce_sssp_spark.operators.relational import q_winsorize_values

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    raw = {
        r.event_type: (r.n, float(r.s))
        for r in ev.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    rows = q_winsorize_values(spark, sf_dir).collect()
    assert {r.event_type for r in rows} == set(raw)
    for r in rows:
        n = raw[r.event_type][0]
        assert r.n == n
        # ~5% in each tail (interpolated bound -> at most ceil(5%)+1).
        assert 0 <= r.n_clip_lo <= n * 0.05 + 2
        assert 0 <= r.n_clip_hi <= n * 0.05 + 2
        assert r.n_clip_lo + r.n_clip_hi > 0  # tails exist at test SF


def test_corr_matches_builtin_within_float_tolerance(spark, sf_dir):
    """The exact-sufficient-statistics Pearson r agrees with Spark's
    built-in corr() on the dollar-quantized columns to float tolerance,
    and sits in [-1, 1]."""
    from pyspark.sql import functions as F

    from mapreduce_sssp_spark.operators.relational import q_corr_measures

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    ref = {
        r.l_returnflag: r.c
        for r in li.select(
            "l_returnflag",
            F.expr("CAST(l_quantity AS BIGINT)").cast("double").alias("x"),
            F.expr(
                "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
                " div 100"
            ).cast("double").alias("y"),
        )
        .groupBy("l_returnflag")
        .agg(F.corr("x", "y").alias("c"))
        .collect()
    }
    rows = q_corr_measures(spark, sf_dir).collect()
    assert len(rows) == len(ref)
    for r in rows:
        assert -1.0 <= r.corr_qty_price <= 1.0
        assert abs(r.corr_qty_price - ref[r.l_returnflag]) < 1e-9


def test_scd2_collapses_runs_and_closes_intervals(spark):
    from mapreduce_sssp_spark.operators.event_windows import scd2_intervals

    rows = [
        (1, "view", "2024-01-01T00:00:00"),
        (1, "view", "2024-01-01T01:00:00"),
        (1, "click", "2024-01-01T02:00:00"),
        (1, "view", "2024-01-01T03:00:00"),  # state returns -> NEW run
    ]
    got = sorted(
        scd2_intervals(_ev(spark, rows)).collect(), key=lambda r: r.valid_from
    )
    assert [(r.state, r.n_events) for r in got] == [
        ("view", 2),
        ("click", 1),
        ("view", 1),
    ]
    # Each interval closes at the NEXT run's start; last one is open.
    assert got[0].valid_to == got[1].valid_from
    assert got[1].valid_to == got[2].valid_from
    assert got[2].valid_to is None and got[2].is_current is True
    assert got[0].is_current is False


def test_scd2_tie_order_is_event_id(spark):
    """Two different states at the SAME timestamp: event_id (insertion
    order in _ev) decides run order deterministically."""
    from mapreduce_sssp_spark.operators.event_windows import scd2_intervals

    rows = [
        (1, "view", "2024-01-01T00:00:00"),
        (1, "click", "2024-01-01T00:00:00"),
    ]
    got = sorted(scd2_intervals(_ev(spark, rows)).collect(), key=lambda r: not r.is_current)
    assert [r.state for r in got] == ["click", "view"]  # current first=click
    assert got[0].is_current and not got[1].is_current


def test_attribution_last_touch_and_lookback(spark):
    from mapreduce_sssp_spark.operators.event_windows import (
        attribution_last_touch,
    )

    rows = [
        # u1: click then purchase inside 7d -> credited to click
        (1, "click", "2024-01-01T00:00:00"),
        (1, "purchase", "2024-01-03T00:00:00"),
        # u2: touch EXACTLY 7 days before -> inclusive boundary, credited
        (2, "email", "2024-01-01T00:00:00"),
        (2, "purchase", "2024-01-08T00:00:00"),
        # u3: touch older than 7d -> direct
        (3, "view", "2024-01-01T00:00:00"),
        (3, "purchase", "2024-01-09T00:00:01"),
        # u4: no touch at all (purchase only) -> direct
        (4, "purchase", "2024-01-01T00:00:00"),
        # u5: an earlier PURCHASE must not shadow the latest real touch
        (5, "email", "2024-01-01T00:00:00"),
        (5, "purchase", "2024-01-01T01:00:00"),
        (5, "purchase", "2024-01-01T02:00:00"),
    ]
    ev = _ev(spark, rows).withColumn("value", F.lit(10.0))
    got = {r.channel: r for r in attribution_last_touch(ev).collect()}
    assert got["click"].n_purchases == 1
    assert got["email"].n_purchases == 3  # u2 + both u5 purchases
    assert got["direct"].n_purchases == 2  # u3 (stale) + u4 (none)
    assert got["email"].revenue == 30.0


def test_ewma_halving_weights_hand_values(spark):
    """3 events, alpha=1/2: weights 4:2:1 newest-first -> (3*4+2*2+1)/7."""
    from mapreduce_sssp_spark.operators.event_windows import ewma_value

    rows = [
        (1, "tick", "2024-01-01T00:00:00"),  # value 1.0 (oldest)
        (1, "tick", "2024-01-01T01:00:00"),  # value 2.0
        (1, "tick", "2024-01-01T02:00:00"),  # value 3.0 (newest)
    ]
    ev = _ev(spark, rows).withColumn(
        "value", F.col("event_id").cast("double") + 1.0
    )
    (r,) = ewma_value(ev, horizon=3).collect()
    assert r.n_used == 3
    assert abs(r.ewma - (3 * 4 + 2 * 2 + 1 * 1) / 7) < 1e-12


def test_ewma_horizon_drops_old_events(spark):
    from mapreduce_sssp_spark.operators.event_windows import ewma_value

    rows = [(1, "tick", f"2024-01-01T0{i}:00:00") for i in range(5)]
    ev = _ev(spark, rows).withColumn("value", F.lit(7.5))
    (r,) = ewma_value(ev, horizon=2).collect()
    assert r.n_used == 2 and r.ewma == 7.5


def test_bigram_lift_counts_and_guard(spark):
    """'a b a b' has bigrams ab,ba,ab; a 1-token doc contributes no
    bigrams but its token still counts toward N and unigrams."""
    from mapreduce_sssp_spark.operators.text_analysis import bigram_lift

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a")], "doc_id long, text string"
    )
    got = {(r.w1, r.w2): r for r in bigram_lift(docs).collect()}
    assert got[("a", "b")].n_ab == 2
    assert got[("b", "a")].n_ab == 1
    # N=5 tokens, n_a=3, n_b=2 -> lift(ab) = 2*5/(3*2)
    assert abs(got[("a", "b")].lift - 10 / 6) < 1e-12
    assert got[("a", "b")].n_a == 3 and got[("a", "b")].n_b == 2


def test_trigram_lm_counts_and_cond_p(spark):
    """'a b c b c' pairs: (a,b,c) (b,c,b) (c,b,c) (b,c,NULL); 'a b'
    adds (a,b,NULL). So n_ab(a,b)=2 with one surviving trigram ->
    cond_p 1/2; (c,b) has the only extension -> cond_p 1."""
    from mapreduce_sssp_spark.operators.text_analysis import trigram_lm

    docs = spark.createDataFrame(
        [(1, "a b c b c"), (2, "a b")], "doc_id long, text string"
    )
    got = {(r.w1, r.w2, r.w3): r for r in trigram_lm(docs).collect()}
    assert set(got) == {("a", "b", "c"), ("b", "c", "b"), ("c", "b", "c")}
    assert got[("a", "b", "c")].n_abc == 1
    assert got[("a", "b", "c")].n_ab == 2
    assert got[("a", "b", "c")].cond_p == 0.5
    assert got[("b", "c", "b")].n_ab == 2  # (b,c,b) and doc-final (b,c)
    assert got[("c", "b", "c")].cond_p == 1.0


def test_session_paths_respects_session_gap(spark):
    """A>B>C>D with a 40-minute gap before D: only (A,B,C) is an
    in-session triple; (B,C,D) must NOT appear."""
    from datetime import datetime

    from mapreduce_sssp_spark.operators.event_windows import session_paths

    t0 = datetime(2024, 1, 1, 12, 0, 0)

    def at(minutes):
        return t0.replace(minute=minutes % 60, hour=12 + minutes // 60)

    rows = [
        (7, at(0), 1, "A"),
        (7, at(1), 2, "B"),
        (7, at(2), 3, "C"),
        (7, at(42), 4, "D"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp_ntz, event_id long, event_type string"
    )
    got = [(r.p1, r.p2, r.p3, r.n_paths) for r in session_paths(ev).collect()]
    assert got == [("A", "B", "C", 1)]


def test_anomaly_zscore_flags_planted_spike(spark):
    """Ten identical values then a spike: the spike's trailing-10
    window has nonzero variance and a >2-sigma deviation; the flat
    windows (variance 0, deviation 0) never flag."""
    from datetime import datetime

    from mapreduce_sssp_spark.operators.event_windows import anomaly_zscore

    rows = [
        (1, datetime(2024, 1, 1, 0, i), i + 1, 1.00) for i in range(10)
    ] + [(1, datetime(2024, 1, 1, 0, 10), 11, 2.00)]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp_ntz, event_id long, value double"
    )
    got = anomaly_zscore(ev).collect()
    assert [(r.event_id, r.cents) for r in got] == [(11, 200)]
    # hand-check the exact window sums: events 2..11 = nine 100s + 200
    assert got[0].sum_c == 9 * 100 + 200
    assert got[0].sumsq_c == 9 * 100 * 100 + 200 * 200


def test_kmeans_update_centroid_is_exact_e6_mean(spark):
    """Two seeds in 2-d; the third vector lands in cluster 0, whose
    per-dim centroid is the exact floor-e6 mean of its two members."""
    from mapreduce_sssp_spark.operators.similarity import kmeans_update

    vec = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 1.0]), (2, [0.4, 0.4])],
        "vec_id long, v array<double>",
    )
    got = {
        (r.seed_id, r.dim): r for r in kmeans_update(vec, k=2).collect()
    }
    assert got[(0, 1)].n_members == 2
    assert got[(0, 1)].sum_e6 == 0 + 400000
    assert got[(0, 1)].centroid == 400000 / 2000000
    assert got[(1, 1)].n_members == 1
    assert got[(1, 1)].centroid == 1000000 / 1000000


def test_seasonality_dow_iso_mapping_and_share(spark):
    """2024-01-01 is a Monday (isodow 1); shares are exact n/total."""
    from datetime import datetime

    from mapreduce_sssp_spark.operators.event_windows import seasonality_dow

    rows = [
        ("click", datetime(2024, 1, 1, 9)),   # Monday
        ("click", datetime(2024, 1, 1, 10)),  # Monday
        ("click", datetime(2024, 1, 7, 9)),   # Sunday
    ]
    ev = spark.createDataFrame(rows, "event_type string, ts timestamp_ntz")
    got = {r.dow: r for r in seasonality_dow(ev).collect()}
    assert set(got) == {1, 7}
    assert got[1].n_events == 2 and got[1].n_type == 3
    assert got[1].dow_share == 2 / 3
    assert got[7].dow_share == 1 / 3


def test_feature_hash_matches_python_md5_bucket(spark):
    """Bucket ids reproduce hashlib's md5 exactly; counts collapse
    repeated tokens."""
    import hashlib

    from mapreduce_sssp_spark.operators.text_analysis import (
        FEATURE_HASH_DIMS,
        feature_hash,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta alpha")], "doc_id long, text string"
    )

    def bucket(w):
        return int(hashlib.md5(w.encode()).hexdigest()[:4], 16) % (
            FEATURE_HASH_DIMS
        )

    got = {(r.doc_id, r.bucket): r.n for r in feature_hash(docs).collect()}
    expect = {}
    for w in ["alpha", "beta", "alpha"]:
        key = (1, bucket(w))
        expect[key] = expect.get(key, 0) + 1
    assert got == expect


def test_gini_zero_for_uniform_two_thirds_for_point_mass(spark):
    """All-equal values -> G = 0 exactly; [0, 0, X] -> G = 2/3 exactly
    (rank formulation, no float accumulation to blur it)."""
    from mapreduce_sssp_spark.operators.relational import gini_value

    rows = [("u", 1, 5.0), ("u", 2, 5.0), ("u", 3, 5.0),
            ("p", 1, 0.0), ("p", 2, 0.0), ("p", 3, 9.0)]
    ev = spark.createDataFrame(
        rows, "event_type string, event_id long, value double"
    )
    got = {r.event_type: r for r in gini_value(ev).collect()}
    assert got["u"].gini == 0.0
    assert got["p"].gini == 2 / 3
    assert got["p"].sum_cents == 900


def test_length_buckets_power_of_two_and_padding(spark):
    """3 tokens -> bucket 4 (padding 1); 4 tokens -> bucket 4
    (padding 0); 5 tokens -> bucket 8 (padding 3)."""
    from mapreduce_sssp_spark.operators.sampling import length_buckets

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c d"), (3, "a b c d e")],
        "doc_id long, text string",
    )
    got = {r.bucket: r for r in length_buckets(docs).collect()}
    assert got[4].n_docs == 2
    assert got[4].sum_tokens == 7 and got[4].sum_padding == 1
    assert got[4].utilization == 7 / 8
    assert got[8].n_docs == 1 and got[8].sum_padding == 3


def test_skipgram_window_two_both_directions(spark):
    """'a b c': pairs within +-2 are ab,ba,bc,cb,ac,ca — each once."""
    from mapreduce_sssp_spark.operators.text_analysis import skipgram_pairs

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    got = {(r.center, r.context): r.n for r in skipgram_pairs(docs).collect()}
    assert got == {
        ("a", "b"): 1, ("b", "a"): 1, ("b", "c"): 1,
        ("c", "b"): 1, ("a", "c"): 1, ("c", "a"): 1,
    }


def test_active_users_dau_wau_hand_case(spark):
    """User 1 active Mon+Tue, user 2 active Mon: Mon dau=2 wau=2;
    Tue dau=1, wau=2 (both users' Monday activity still inside the
    trailing week); stickiness exact."""
    from datetime import datetime

    from mapreduce_sssp_spark.operators.event_windows import active_users

    rows = [
        (1, datetime(2024, 1, 1, 9)),
        (1, datetime(2024, 1, 1, 10)),  # dup pair collapses
        (1, datetime(2024, 1, 2, 9)),
        (2, datetime(2024, 1, 1, 9)),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp_ntz")
    got = {str(r.day): r for r in active_users(ev).collect()}
    assert got["2024-01-01"].dau == 2 and got["2024-01-01"].wau == 2
    assert got["2024-01-02"].dau == 1 and got["2024-01-02"].wau == 2
    assert got["2024-01-02"].stickiness == 0.5
    # days with no direct activity never appear
    assert "2024-01-03" not in got


def test_cohort_ltv_accumulates_exact_cents(spark):
    """One cohort, purchases in weeks 0 and 2: cumulative revenue
    carries across the gap (no week-1 row is fabricated)."""
    from datetime import datetime

    from mapreduce_sssp_spark.operators.event_windows import cohort_ltv

    rows = [
        (1, "signup", datetime(2024, 1, 1, 9), 0.0),
        (1, "purchase", datetime(2024, 1, 2, 9), 10.50),
        (1, "purchase", datetime(2024, 1, 16, 9), 5.25),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp_ntz, value double"
    )
    got = {r.week_offset: r for r in cohort_ltv(ev).collect()}
    assert set(got) == {0, 2}
    assert got[0].revenue_cents == 1050
    assert got[2].revenue_cents == 525
    assert got[2].cum_revenue_cents == 1575


def test_landmark_distances_match_per_source_sssp(spark):
    """The sharded multi-source fixpoint must equal k independent
    single-source runs on a hand graph (incl. not emitting rows for
    nodes unreachable within a shard)."""
    from mapreduce_sssp_spark.operators.graph_queries import (
        landmark_distances,
    )

    edges = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 2.0), (5, 3, 1.0)],
        "src long, dst long, weight double",
    )
    got = {
        (r.landmark, r.node): r.dist
        for r in landmark_distances(edges, k=2).collect()
    }
    assert got == {
        (1, 1): 0.0,
        (1, 2): 1.0,
        (1, 3): 3.0,
        (2, 2): 0.0,
        (2, 3): 2.0,
    }


def test_moments_value_matches_numpy(spark, sf_dir):
    """The closed-form power-sum moments must equal numpy's definition
    of skewness / excess kurtosis on the dollar-quantized values."""
    import math

    import numpy as np
    import pytest

    from mapreduce_sssp_spark.operators.relational import q_moments_value

    got = {r.event_type: r for r in q_moments_value(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    by_type = {}
    for e in ev:
        by_type.setdefault(e.event_type, []).append(math.floor(e.value))
    for t, vals in by_type.items():
        a = np.asarray(vals, dtype=np.float64)
        m2 = a.var()  # population
        skew = ((a - a.mean()) ** 3).mean() / m2**1.5
        kurt = ((a - a.mean()) ** 4).mean() / m2**2 - 3.0
        r = got[t]
        # s1..s4 are STRING carriers since r11 (portable output dtype).
        assert r.n == len(vals) and int(r.s1) == sum(vals)
        assert r.skewness == pytest.approx(skew, rel=1e-9)
        assert r.kurtosis == pytest.approx(kurt, rel=1e-9)


def test_source_classifier_eval_structure(spark, sf_dir):
    """Structural contract of the in-engine train/eval loop: output
    covers exactly the held-out (md5 >= '8') docs, predictions stay in
    the source domain, correctness ties out to pred==truth, and the
    whole loop is deterministic across runs. (Accuracy itself is NOT
    asserted — this synthetic corpus carries only a weak text->source
    signal, and the operator's docstring documents why; a flaky
    above-chance assertion would be noise.)"""
    import hashlib

    from mapreduce_sssp_spark.operators.text_analysis import (
        q_source_classifier_eval,
    )

    rows = q_source_classifier_eval(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    test_ids = {
        d.doc_id
        for d in docs
        if hashlib.md5(str(d.doc_id).encode()).hexdigest() >= "8"
    }
    sources = {d.source for d in docs}
    assert {r.doc_id for r in rows} == test_ids
    truth = {d.doc_id: d.source for d in docs}
    for r in rows:
        assert r.pred_source in sources | {"unk"}
        assert r.truth == truth[r.doc_id]
        assert r.correct == (r.pred_source == r.truth)
    rows2 = q_source_classifier_eval(spark, sf_dir).collect()
    assert sorted(map(tuple, rows2)) == sorted(map(tuple, rows))


def test_distribution_drift_shares_sum_to_one(spark, sf_dir):
    from mapreduce_sssp_spark.operators.relational import (
        q_distribution_drift,
    )

    rows = q_distribution_drift(spark, sf_dir).collect()
    assert rows
    assert abs(sum(r.share_base for r in rows) - 1.0) < 1e-9
    assert abs(sum(r.share_cand for r in rows) - 1.0) < 1e-9
    for r in rows:
        assert 0 <= r.bucket <= 9 and r.chi2_term >= 0.0
    # Even/odd halves of the same table: drift should be small but the
    # report structure must hold for any magnitude.


def test_changepoint_cusum_finds_planted_level_shift(spark, tmp_path):
    """A series that jumps from level 10.0 to 50.0 at row 8 (of 12) must
    report its changepoint at the last low-level row (k=8), where
    |S_k - k*mean| peaks for a single level shift."""
    from datetime import datetime, timedelta

    from mapreduce_sssp_spark.operators.event_windows import (
        q_changepoint_cusum,
    )

    t0 = datetime(2024, 1, 1)
    rows = [
        (i, t0 + timedelta(minutes=i), 1, "load", 10.0 if i < 8 else 50.0, "{}")
        for i in range(12)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = q_changepoint_cusum(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_events == 12 and r.cp_k == 8 and r.cp_event_id == 7
    # mean = (8*10 + 4*50)/12; |S_8 - 8*mean| = |80 - 8*23.33..| = 106.66..
    assert abs(r.cusum_value - (8 * (4 * 50 + 8 * 10) / 12 - 80)) < 1e-9
    # dev is signed: the low-level prefix sits BELOW the mean line
    assert r.dev_scaled < 0


def test_token_source_pmi_signs_and_marginals(spark, tmp_path):
    """'aa' appears only in src0 docs -> positive PMI there; 'cc' is in
    every doc -> PMI exactly 0 in both sources (independence)."""
    from mapreduce_sssp_spark.operators.text_analysis import (
        q_token_source_pmi,
    )

    rows = [
        (0, "aa cc", "en", "src0", 5),
        (1, "aa cc", "en", "src0", 5),
        (2, "bb cc", "en", "src1", 5),
        (3, "bb cc", "en", "src1", 5),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {
        (r.term, r.source): r
        for r in q_token_source_pmi(spark, str(tmp_path)).collect()
    }
    assert ("aa", "src1") not in out  # zero co-occurrence cells absent
    aa = out[("aa", "src0")]
    assert aa.n_ts == 2 and aa.n_t == 2 and aa.n_s == 2
    assert aa.pmi_e6 == round(__import__("math").log(2.0) * 1e6)
    assert out[("cc", "src0")].pmi_e6 == 0
    assert out[("cc", "src1")].pmi_e6 == 0


def test_ohlc_bars_hand_case(spark, tmp_path):
    from datetime import datetime

    from mapreduce_sssp_spark.operators.event_windows import q_ohlc_bars

    rows = [
        # one hour bucket, deliberate out-of-order insert: open is the
        # EARLIEST ts (7.0), close the latest (9.0), not min/max
        (0, datetime(2024, 1, 1, 10, 30), 1, "t", 50.0, "{}"),
        (1, datetime(2024, 1, 1, 10, 5), 1, "t", 7.0, "{}"),
        (2, datetime(2024, 1, 1, 10, 55), 1, "t", 9.0, "{}"),
        (3, datetime(2024, 1, 1, 10, 40), 1, "t", 3.0, "{}"),
        # second bucket
        (4, datetime(2024, 1, 1, 11, 1), 1, "t", 2.5, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {r.bar_ts: r for r in q_ohlc_bars(spark, str(tmp_path)).collect()}
    b1 = out[datetime(2024, 1, 1, 10, 0)]
    assert (b1.open, b1.high, b1.low, b1.close) == (7.0, 50.0, 3.0, 9.0)
    assert b1.n_events == 4 and b1.volume == 69.0
    b2 = out[datetime(2024, 1, 1, 11, 0)]
    assert (b2.open, b2.close, b2.volume) == (2.5, 2.5, 2.5)


def test_seq_pattern_counts_any_before_not_adjacent(spark, tmp_path):
    from datetime import datetime, timedelta

    from mapreduce_sssp_spark.operators.event_windows import (
        q_seq_pattern_pairs,
    )

    t0 = datetime(2024, 1, 1)
    mk = lambda i, u, t, m: (i, t0 + timedelta(minutes=m), u, t, 1.0, "{}")
    rows = [
        # u1: view .. click .. view — (view, click) and (click, view)
        # both hold (any-before, unlike adjacent-only transitions)
        mk(0, 1, "view", 0),
        mk(1, 1, "click", 5),
        mk(2, 1, "view", 9),
        # u2: click only once, after its view
        mk(3, 2, "view", 0),
        mk(4, 2, "click", 1),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {
        (r.type_a, r.type_b): r.n_users
        for r in q_seq_pattern_pairs(spark, str(tmp_path)).collect()
    }
    assert out[("view", "click")] == 2
    assert out[("click", "view")] == 1  # only u1 has a view after click


def test_ab_test_z_matches_textbook_formula(spark, tmp_path):
    import math
    from datetime import datetime, timedelta

    from mapreduce_sssp_spark.operators.event_windows import (
        q_ab_test_proportions,
    )

    t0 = datetime(2024, 1, 1)
    rows = []
    eid = 0
    # 4 even users (variant 0): 3 convert; 4 odd users (variant 1): 1
    for u in range(8):
        rows.append((eid, t0 + timedelta(minutes=eid), u, "view", 1.0, "{}"))
        eid += 1
        converted = (u % 2 == 0 and u < 6) or u == 1
        if converted:
            rows.append(
                (eid, t0 + timedelta(minutes=eid), u, "purchase", 1.0, "{}")
            )
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    r = q_ab_test_proportions(spark, str(tmp_path)).collect()[0]
    assert (r.n_a, r.conv_a, r.n_b, r.conv_b) == (4, 3, 4, 1)
    p, q_ = 0.75, 0.25
    pp = 0.5
    z = (p - q_) / math.sqrt(pp * (1 - pp) * (1 / 4 + 1 / 4))
    assert abs(r.z - z) < 1e-12


def test_closeness_landmark_consistent_with_distances(spark):
    from mapreduce_sssp_spark.operators.graph_queries import (
        q_closeness_landmark,
        q_landmark_distances,
    )

    sf = "/root/testdata/sf0.001"
    dists = q_landmark_distances(spark, sf).collect()
    agg = {}
    for r in dists:
        if r.node == r.landmark:
            continue
        n, s = agg.get(r.node, (0, 0.0))
        agg[r.node] = (n + 1, s + r.dist)
    out = {r.node: r for r in q_closeness_landmark(spark, sf).collect()}
    assert set(out) == set(agg)
    for node, (n, s) in agg.items():
        assert out[node].n_reach == n
        assert abs(out[node].sum_dist - s) < 1e-9
        assert abs(out[node].closeness - n / s) < 1e-12


def test_histogram_equidepth_bins_balance(spark):
    from mapreduce_sssp_spark.operators.relational import (
        EQUIDEPTH_BINS,
        q_histogram_equidepth,
    )

    rows = q_histogram_equidepth(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == EQUIDEPTH_BINS
    total = sum(r.n for r in rows)
    # every bin within a few percent of total/bins (ties can shift rows)
    for r in rows:
        assert abs(r.n - total / EQUIDEPTH_BINS) <= total * 0.02
    # bins tile the range in order: hi of bin b <= lo of bin b+1
    ordered = sorted(rows, key=lambda r: r.bin)
    assert [r.bin for r in ordered] == list(range(EQUIDEPTH_BINS))
    for a, b in zip(ordered, ordered[1:]):
        assert a.hi <= b.lo


def test_attribution_position_based_hand_case(spark, tmp_path):
    from datetime import datetime, timedelta

    from mapreduce_sssp_spark.operators.event_windows import (
        q_attribution_position_based,
    )

    t0 = datetime(2024, 1, 1)
    mk = lambda i, u, t, m: (i, t0 + timedelta(minutes=m), u, t, 1.0, "{}")
    rows = [
        # u1: view, click, view, error then purchase -> n=4:
        #   first view 4000, middles click/view split 2000 -> 1000 each,
        #   last error 4000
        mk(0, 1, "view", 0),
        mk(1, 1, "click", 1),
        mk(2, 1, "view", 2),
        mk(3, 1, "error", 3),
        mk(4, 1, "purchase", 4),
        # u2: lone touch then purchase -> 10000 to signup
        mk(5, 2, "signup", 0),
        mk(6, 2, "purchase", 1),
        # u3: purchase with no touches -> direct 10000
        mk(7, 3, "purchase", 0),
        # u4: n=5 -> middles split 2000 div 3 = 666 rem 2; earliest two
        # middles get 667
        mk(8, 4, "click", 0),
        mk(9, 4, "view", 1),
        mk(10, 4, "click", 2),
        mk(11, 4, "view", 3),
        mk(12, 4, "signup", 4),
        mk(13, 4, "purchase", 5),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {
        r.channel: r.credit_bps
        for r in q_attribution_position_based(spark, str(tmp_path)).collect()
    }
    # u1: view 4000+1000, click 1000, error 4000
    # u2: signup 10000; u3: direct 10000
    # u4: click 4000(first)+667(middle r=3? middles are r=2..4:
    #     view(r=2):667, click(r=3):667, view(r=4):666), signup 4000(last)
    assert out["direct"] == 10000
    assert out["signup"] == 10000 + 4000
    assert out["error"] == 4000
    assert out["click"] == 1000 + 4000 + 667
    assert out["view"] == 4000 + 1000 + 667 + 666
    assert sum(out.values()) == 10000 * 4  # credit conserves per purchase


def test_simhash_hamming_pairs_no_crossjoin_and_symmetric_truth(spark):
    """The banded candidate generation must find exactly the pairs a
    brute-force over collected simhashes finds."""
    from mapreduce_sssp_spark.operators.dedup import (
        SIMHASH_HAMMING_MAX,
        q_dedup_simhash,
        q_simhash_hamming_pairs,
    )

    sf = "/root/testdata/sf0.001"
    sigs = {
        r.doc_id: r.simhash for r in q_dedup_simhash(spark, sf).collect()
    }
    ids = sorted(sigs)
    want = {
        (a, b): bin(sigs[a] ^ sigs[b]).count("1")
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(sigs[a] ^ sigs[b]).count("1") <= SIMHASH_HAMMING_MAX
    }
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in q_simhash_hamming_pairs(spark, sf).collect()
    }
    assert got == want
    plan = q_simhash_hamming_pairs(spark, sf)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_kmv_set_overlap_estimates_within_sketch_error(spark):
    from mapreduce_sssp_spark.operators.scale_patterns import (
        KMV_K,
        q_kmv_set_overlap,
    )

    rows = q_kmv_set_overlap(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) == 10  # C(5,2) ordered type pairs
    for r in rows:
        assert 0.0 <= r.est_jaccard <= 1.0
        assert 0.0 <= r.exact_jaccard <= 1.0
        # KMV std error ~ sqrt(J(1-J)/K) ~ 0.06 at K=64; allow 4 sigma
        assert abs(r.est_jaccard - r.exact_jaccard) < 4 * (0.25 / KMV_K**0.5)


def test_community_modularity_marginals_and_formula(spark):
    from mapreduce_sssp_spark.operators.graph_queries import (
        _part_cooccurrence_edges,
        q_community_modularity,
    )

    sf = "/root/testdata/sf0.001"
    m = _part_cooccurrence_edges(spark, sf).count()
    rows = q_community_modularity(spark, sf).collect()
    # degree mass partitions 2m exactly; internal edges can't exceed m
    assert sum(r.d_tot for r in rows) == 2 * m
    assert sum(r.e_in for r in rows) <= m
    for r in rows:
        half = r.d_tot / (2 * m)
        assert r.q_contrib == r.e_in / m - half * half
        assert r.n_nodes >= 1
    # global Q is bounded by [-0.5, 1]
    q = sum(r.q_contrib for r in rows)
    assert -0.5 <= q <= 1.0


def test_dq_audit_detects_planted_violations(spark, tmp_path):
    from mapreduce_sssp_spark.operators.relational import q_dq_audit

    # minimal 4-table warehouse with one violation of each class
    spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10)], "o_orderkey long, o_custkey long"
    ).write.parquet(str(tmp_path / "orders.parquet"))  # dup PK 1; cust 11 dangling
    spark.createDataFrame(
        [
            (1, 1, 100, 5, 2.0),
            (1, 1, 100, 5, 2.0),  # dup composite PK
            (2, 1, 999, 5, -1.0),  # dangling part + bad quantity
            (None, 2, 100, 5, 1.0),  # null FK (also dangles)
        ],
        "l_orderkey long, l_linenumber long, l_partkey long,"
        " l_suppkey long, l_quantity double",
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame([(100,)], "p_partkey long").write.parquet(
        str(tmp_path / "part.parquet")
    )
    spark.createDataFrame([(10,)], "c_custkey long").write.parquet(
        str(tmp_path / "customer.parquet")
    )
    out = {
        r.constraint: (r.n_checked, r.n_violations)
        for r in q_dq_audit(spark, str(tmp_path)).collect()
    }
    assert out["orders PK unique"] == (3, 1)
    assert out["lineitem PK unique"] == (4, 1)
    # null FK is NOT an FK violation (nullness is its own constraint)
    assert out["lineitem->orders FK"] == (4, 0)
    assert out["lineitem->part FK"] == (4, 1)
    assert out["orders->customer FK"] == (3, 1)
    assert out["lineitem.l_orderkey NOT NULL"] == (4, 1)
    assert out["lineitem.l_quantity > 0"] == (4, 1)


def test_event_trigrams_matches_bruteforce(spark):
    import duckdb

    from mapreduce_sssp_spark.operators.event_windows import q_event_trigrams

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT user_id, event_type, ts, event_id"
        f" FROM '{sf}/events.parquet' ORDER BY user_id, ts, event_id"
    ).fetchall()
    seqs = {}
    for uid, typ, ts, eid in rows:
        seqs.setdefault(uid, []).append(typ)
    expected = {}
    for seq in seqs.values():
        for i in range(len(seq) - 2):
            k = (seq[i], seq[i + 1], seq[i + 2])
            expected[k] = expected.get(k, 0) + 1
    got = {
        (r.t1, r.t2, r.t3): r.n for r in q_event_trigrams(spark, sf).collect()
    }
    assert got == expected
