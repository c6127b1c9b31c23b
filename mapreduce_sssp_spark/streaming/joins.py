"""Watermarked stream-stream join (SURVEY.md §2.9 extension): views
joined to same-user purchases within one hour, both sides event-time
watermarked so the join state is bounded.

The reference has no streaming surface; this is the Structured-Streaming
pattern its per-round message joins would map onto in a continuous
deployment. Semantically the availableNow run equals the batch interval
self-join, so the DuckDB oracle is a plain SQL join — the whole
watermark/state-store machinery is hash-verified, not demoed.

At 100 TB / continuous: state per side is bounded by (watermark delay +
join interval) of events per user; the only shuffle is the symmetric
hash exchange on user_id. A production job swaps the memory sink for
Kafka/Delta; plan and state semantics are unchanged.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..contracts import finite
from ..runstate import RunCounter

from ..io.sources import load_table
from .source import bounded_state_partitions

# RunCounter, not a [0] list (fingerprint-stable; see runstate.py).
_seq_n = RunCounter()


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized events file-stream (shared symlink-dir helper)."""
    from .source import events_stream

    return events_stream(spark, sf_dir)


def streaming_view_purchase_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner stream-stream join: each view paired with the same user's
    purchases in [view_ts, view_ts + 1 hour]."""
    ev = _events_stream(spark, sf_dir)
    views = (
        ev.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", "1 hour")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            "value",
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = views.join(
        purchases,
        F.expr(
            "v_user = p_user AND purchase_ts >= view_ts"
            " AND purchase_ts <= view_ts + INTERVAL 1 HOUR"
        ),
    ).select(
        F.col("v_user").alias("user_id"),
        "view_id",
        "purchase_id",
        F.col("view_ts").cast("timestamp_ntz").alias("view_ts"),
        F.col("purchase_ts").cast("timestamp_ntz").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    sink = f"streaming_join_sink_{_seq_n.next()}"
    with bounded_state_partitions(spark):
        q = (
            joined.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(sink)


def streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup: the events file is fed to the stream TWICE
    (two links in the source dir), and stateful ``dropDuplicates`` on
    event_id must emit each event exactly once — the streaming face of
    the batch dedup_exact operator, state bounded by the watermark.

    The oracle is simply the events table read once: if the dedup state
    machinery failed, every row would appear twice and the row-count
    check alone would catch it.
    """
    from .source import events_stream

    ev = events_stream(spark, sf_dir, copies=2, tag="stream2x")
    deduped = (
        ev.withWatermark("ts", "1 hour")
        .dropDuplicates(["event_id"])
        .select(
            "event_id",
            F.col("ts").cast("timestamp_ntz").alias("ts"),
            "user_id",
            "event_type",
            "value",
        )
    )
    sink = f"streaming_dedup_sink_{_seq_n.next()}"
    with bounded_state_partitions(spark):
        q = (
            deduped.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(sink)


def streaming_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join: the events stream joined to the
    static customer dim on user_id, aggregated per market segment.

    The static side is planned per micro-batch as a broadcast hash join
    — no streaming state AT ALL is kept for the join (unlike
    stream-stream), which is why dimension enrichment at 100 TB/day is
    a stream-static join against a (refreshable) dim snapshot, never a
    stream-stream join. Aggregate in DECIMAL; oracle is the equivalent
    batch join.
    """
    # Finite-measure contract at the ingest (r12); twin mirrors.
    ev = _events_stream(spark, sf_dir).filter(finite("value"))
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    agg = (
        ev.join(F.broadcast(cust), "user_id")
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
    )
    sink = f"streaming_enrich_sink_{_seq_n.next()}"
    with bounded_state_partitions(spark):
        q = (
            agg.writeStream.format("memory")
            .queryName(sink)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(sink)


RATE_ALERT_NUM = 3  # alert when window count * 2 > baseline mean * 3
RATE_ALERT_DEN = 2  # (i.e. > 1.5x), decided in exact integers


def streaming_rate_alert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming anomaly alerting: hourly event counts per type
    (watermarked tumbling window) stream-static joined against a
    STATIC per-(type, hour-of-day) baseline — total historical count
    and distinct active days — and flagged when the window runs more
    than 1.5x its seasonal mean. The monitoring pattern every
    continuous pipeline ships: the stream does only bounded windowed
    state, the baseline is a broadcast snapshot recomputed offline.

    The alert threshold is EXACT integer arithmetic (n * n_days *
    {RATE_ALERT_DEN} > total * {RATE_ALERT_NUM}, cross-multiplied
    — no float rate ever compared), so the flag is engine-stable;
    baseline_mean is emitted as one closing division for readability.

    At 100 TB/day: window state is |types| x |open windows|; the
    baseline is |types| x 24 rows broadcast per micro-batch. The
    memory sink is the test harness stand-in (SCALE.md streaming
    note).
    """
    ev = _events_stream(spark, sf_dir)
    baseline = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type", F.hour("ts").alias("hod")
        )
        .agg(
            F.count("*").alias("total_n"),
            F.countDistinct(F.to_date("ts")).alias("n_days"),
        )
    )
    windowed = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            F.hour(F.col("w.start")).alias("hod"),
            "n",
        )
    )
    flagged = windowed.join(F.broadcast(baseline), ["event_type", "hod"]).select(
        "window_start",
        "event_type",
        "n",
        (
            F.col("total_n").cast("double") / F.col("n_days").cast("double")
        ).alias("baseline_mean"),
        (
            F.col("n") * F.col("n_days") * RATE_ALERT_DEN
            > F.col("total_n") * RATE_ALERT_NUM
        ).alias("alert"),
    )
    sink = f"streaming_rate_alert_sink_{_seq_n.next()}"
    with bounded_state_partitions(spark):
        q = (
            flagged.writeStream.format("memory")
            .queryName(sink)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(sink)


QUERIES = {
    "streaming_join": streaming_view_purchase_join,
    "streaming_dedup": streaming_dedup,
    "streaming_static_enrich": streaming_static_enrich,
    "streaming_rate_alert": streaming_rate_alert,
}

ORACLE = {
    "streaming_rate_alert": f"""
WITH baseline AS (
  SELECT event_type, EXTRACT(hour FROM CAST(ts AS TIMESTAMP)) AS hod,
         COUNT(*) AS total_n,
         COUNT(DISTINCT CAST(ts AS DATE)) AS n_days
  FROM events GROUP BY 1, 2
),
windowed AS (
  SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP))
           AS window_start,
         event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT w.window_start, w.event_type, w.n,
       CAST(b.total_n AS DOUBLE) / CAST(b.n_days AS DOUBLE) AS baseline_mean,
       w.n * b.n_days * {RATE_ALERT_DEN} > b.total_n * {RATE_ALERT_NUM}
         AS alert
FROM windowed w
JOIN baseline b
  ON b.event_type = w.event_type
 AND b.hod = EXTRACT(hour FROM w.window_start)
""",
    "streaming_static_enrich": """
SELECT c_mktsegment, event_type,
       count(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events JOIN customer ON user_id = c_custkey
WHERE isfinite(value)
GROUP BY c_mktsegment, event_type
""",
    "streaming_dedup": """
SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
FROM events
""",
    "streaming_join": """
SELECT v.user_id AS user_id,
       v.event_id AS view_id,
       p.event_id AS purchase_id,
       CAST(v.ts AS TIMESTAMP) AS view_ts,
       CAST(p.ts AS TIMESTAMP) AS purchase_ts,
       p.value AS purchase_value
FROM events v
JOIN events p
  ON v.user_id = p.user_id
 AND v.event_type = 'view' AND p.event_type = 'purchase'
 AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL '1 hour'
""",
}
