"""Streaming ``foreachBatch`` sink: incremental partial-aggregate
append + compaction read — the exactly-once upsert pattern for engines
without a MERGE-capable table format on the classpath.

Each micro-batch aggregates itself (map-side combine inside the batch),
appends its partial per-key aggregates to a parquet dir tagged with the
batch id, and the final read re-aggregates partials — associative
measures (count, decimal sum) make partial-of-partials exact. With a
transactional table format this foreachBatch body would be a keyed
MERGE; the partial-append formulation needs nothing but parquet and
stays idempotent per batch id.

At 100 TB: nothing ever collects to the driver — each batch's aggregate
is a distributed job, the append is a distributed write, and compaction
is a scan over tiny partial files. State size is bounded by
(#keys x #batches), compacted on read.

Determinism: partial sums stay DECIMAL(18,2) in parquet and re-sum as
decimals — no float accumulation order anywhere; the oracle is the
plain batch GROUP BY.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..contracts import finite

from .source import bounded_state_partitions

DEC = "decimal(18,2)"


def _events_stream(spark: SparkSession, sf_dir: str):
    from .source import events_stream

    return events_stream(spark, sf_dir, normalize=False)


def q_streaming_foreach_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Finite-measure contract at the ingest (r12); twin mirrors.
    raw = _events_stream(spark, sf_dir).filter(finite("value"))

    scratch = os.path.join(
        tempfile.gettempdir(),
        "spark-graft-foreach-" + sf_dir.strip("/").replace("/", "_"),
    )
    out_dir = os.path.join(scratch, "partials")
    ckpt_dir = os.path.join(scratch, "ckpt")
    # Fresh run every invocation: stale partials would double-count and a
    # stale checkpoint would replay zero batches (offsets already done).
    shutil.rmtree(scratch, ignore_errors=True)

    def sink_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.groupBy("event_type")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("value").cast(DEC)).alias("sum_value_dec"),
            )
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(out_dir)
        )

    with bounded_state_partitions(spark):
        q = (
            raw.writeStream.foreachBatch(sink_batch)
            .option("checkpointLocation", ckpt_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    if not os.path.isdir(out_dir):
        # Zero micro-batches ran (empty source): foreachBatch never
        # created the partials dir — typed empty result, no crash.
        return spark.createDataFrame(
            [], "event_type string, n bigint, sum_value double"
        )
    partials = spark.read.parquet(out_dir)
    return partials.groupBy("event_type").agg(
        F.sum("n").alias("n"),
        F.sum("sum_value_dec").cast("double").alias("sum_value"),
    )


def q_streaming_parquet_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The durable file sink (vs the test-only memory sink used
    elsewhere): stream events through a projection into an append-mode
    parquet sink with a checkpoint, then read the WRITTEN files back.

    The file sink's manifest (_spark_metadata) + checkpoint give
    exactly-once output across restarts — the production path for
    stream-to-lake delivery. The read-back equals the batch projection
    of the source, proving no row was lost or duplicated through the
    sink. Scratch dirs are wiped per run: a stale checkpoint would
    replay zero batches and a stale sink would double rows.
    """
    from ..io.sources import normalize_event_ts

    raw = _events_stream(spark, sf_dir)
    ev = normalize_event_ts(raw, as_ntz=True).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )

    scratch = os.path.join(
        tempfile.gettempdir(),
        "spark-graft-fsink-" + sf_dir.strip("/").replace("/", "_"),
    )
    out_dir = os.path.join(scratch, "out")
    ckpt_dir = os.path.join(scratch, "ckpt")
    shutil.rmtree(scratch, ignore_errors=True)

    with bounded_state_partitions(spark):
        q = (
            ev.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    if not os.path.isdir(out_dir):
        # Zero micro-batches (empty source): the file sink never
        # materialized — same typed-empty contract as the batch ops.
        return spark.createDataFrame([], ev.schema)
    # Explicit schema: a sink dir whose only content is _spark_metadata
    # (all batches empty) has nothing to infer from.
    return spark.read.schema(ev.schema).parquet(out_dir)


QUERIES = {
    "streaming_foreach_upsert": q_streaming_foreach_upsert,
    "streaming_parquet_sink": q_streaming_parquet_sink,
}

ORACLE = {
    "streaming_parquet_sink": """
SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
FROM events
""",
    "streaming_foreach_upsert": """
SELECT event_type,
       count(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
WHERE isfinite(value)
GROUP BY event_type
""",
}
