"""Event-time window semantics on literal events (session boundaries,
tumbling assignment, sliding double-assignment)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1, h, m, s), u) for i, (h, m, s, u) in enumerate(rows)],
        "event_id long, ts timestamp_ntz, user_id long",
    )


def test_session_window_gap_splits(spark):
    # user 1: events at 10:00, 10:20, 11:30 with 30-min gap
    # -> sessions {10:00,10:20} (end 10:50) and {11:30} (end 12:00)
    ev = _events(
        spark, [(10, 0, 0, 1), (10, 20, 0, 1), (11, 30, 0, 1), (10, 5, 0, 2)]
    )
    out = (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n"))
        .select("user_id", F.col("w.start").alias("s"), F.col("w.end").alias("e"), "n")
        .collect()
    )
    sessions = {(r.user_id, r.s.time().isoformat(), r.e.time().isoformat(), r.n) for r in out}
    assert sessions == {
        (1, "10:00:00", "10:50:00", 2),
        (1, "11:30:00", "12:00:00", 1),
        (2, "10:05:00", "10:35:00", 1),
    }


def test_tumbling_and_sliding_assignment(spark):
    ev = _events(spark, [(10, 15, 0, 1), (10, 45, 0, 1)])
    tumb = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert len(tumb) == 1 and tumb[0].n == 2

    slide = (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("s"), "n")
        .collect()
    )
    # 10:15 -> windows starting 09:30, 10:00; 10:45 -> 10:00, 10:30
    got = {(r.s.time().isoformat(), r.n) for r in slide}
    assert got == {("09:30:00", 1), ("10:00:00", 2), ("10:30:00", 1)}


def test_twap_bounded_by_value_range(spark, sf_dir):
    """TWAP of each user sits inside [min(value), max(value)] of that
    user's stream, and segment counts are n_events - 1."""
    from pyspark.sql import functions as F

    from mapreduce_sssp_spark.operators.event_windows import q_twap_user

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    bounds = {
        r.user_id: (r.n, r.lo, r.hi)
        for r in ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
        .collect()
    }
    rows = q_twap_user(spark, sf_dir).collect()
    assert rows
    for r in rows:
        n, lo, hi = bounds[r.user_id]
        assert r.n_segments == n - 1
        # cents quantization can nudge the average by at most half a cent
        assert lo - 0.005 <= r.twap <= hi + 0.005, (r.user_id, r.twap, lo, hi)


def test_streaming_late_data_drops_and_is_deterministic(spark, sf_dir):
    """Late rows must actually be dropped (emitted total < input total)
    and the whole micro-batch replay must be deterministic (two runs,
    identical results) — the property the hash oracle stands on."""
    import pyspark.sql.functions as F

    from mapreduce_sssp_spark.operators.event_windows import (
        q_streaming_late_data,
    )

    out1 = q_streaming_late_data(spark, sf_dir)
    rows1 = {tuple(r) for r in out1.collect()}
    emitted = out1.agg(F.sum("n")).collect()[0][0]
    total = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert emitted < total  # drops + unfinalized tail windows
    out2 = q_streaming_late_data(spark, sf_dir)
    assert {tuple(r) for r in out2.collect()} == rows1


def test_state_dwell_share_sums_to_one(spark, sf_dir):
    """Per-user shares partition the observed timeline."""
    from collections import defaultdict

    from mapreduce_sssp_spark.operators.event_windows import (
        q_state_dwell_share,
    )

    rows = q_state_dwell_share(spark, sf_dir).collect()
    assert rows
    per_user = defaultdict(float)
    for r in rows:
        assert 0.0 <= r.share <= 1.0
        assert r.state_us <= r.total_us
        per_user[r.user_id] += r.share
    for u, s in per_user.items():
        assert abs(s - 1.0) < 1e-9, (u, s)


def test_table_diff_counts_reconcile(spark, sf_dir):
    """added/removed/changed/same must tie out to the derivation rules."""
    from mapreduce_sssp_spark.operators.cdc import q_table_diff

    got = {r.status: r.n_keys for r in q_table_diff(spark, sf_dir).collect()}
    keys = [
        r.o_orderkey
        for r in spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    ]
    removed = sum(1 for k in keys if k % 17 == 0)
    added = sum(1 for k in keys if k % 13 == 0)
    changed = sum(1 for k in keys if k % 17 != 0 and k % 5 == 0)
    same = sum(1 for k in keys if k % 17 != 0 and k % 5 != 0)
    assert got.get("removed", 0) == removed
    assert got.get("added", 0) == added
    assert got.get("changed", 0) == changed
    assert got.get("same", 0) == same
