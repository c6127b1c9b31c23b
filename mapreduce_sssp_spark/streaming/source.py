"""Shared events file-stream source.

One implementation of the symlink-directory trick every streaming query
needs (Spark's file stream source requires a DIRECTORY; the driver
testdata is a single parquet file), with the timestamp normalization
applied in exactly one place. Round 2 shipped a dtype bug that had to
be fixed in five separate copies of this logic — the consolidation IS
the fix's regression guard.
"""

from __future__ import annotations

import os
import tempfile
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession

from ..io.sources import normalize_event_ts


def events_stream(
    spark: SparkSession,
    sf_dir: str,
    *,
    copies: int = 1,
    tag: str = "stream",
    normalize: bool = True,
) -> DataFrame:
    """events.parquet as a file-source stream.

    copies > 1 links the file multiple times (streaming-dedup inputs);
    ``normalize`` applies the shared dtype-branching ts normalization to
    TIMESTAMP (watermark-compatible; see io.sources.normalize_event_ts).
    """
    # Legacy TIMESTAMP(NANOS) events files need this to even scan;
    # harmless for native timestamp[us].
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream_dir = os.path.join(
        tempfile.gettempdir(),
        f"spark-graft-{tag}-" + sf_dir.strip("/").replace("/", "_"),
    )
    os.makedirs(stream_dir, exist_ok=True)
    names = (
        ["events.parquet"]
        if copies == 1
        else [f"events_{i}.parquet" for i in range(copies)]
    )
    for name in names:
        link = os.path.join(stream_dir, name)
        if not os.path.lexists(link):
            os.symlink(os.path.abspath(f"{sf_dir}/events.parquet"), link)
    raw = spark.readStream.schema(batch_schema).format("parquet").load(stream_dir)
    return normalize_event_ts(raw, as_ntz=False) if normalize else raw


@contextmanager
def bounded_state_partitions(spark: SparkSession, divisor: int = 4, floor: int = 4):
    """Clamp ``spark.sql.shuffle.partitions`` — which for Structured
    Streaming is also the STATE-STORE instance count, baked into the
    query at start() — for the duration of a one-shot availableNow run.

    A vanilla session's 200 means 200 state-store tasks per micro-batch
    regardless of data volume (measured 3x end-to-end on the streaming
    suite even going 32 -> 8 on local[32]). The clamp only ever LOWERS
    the setting (to defaultParallelism/divisor, floored), so a session
    tuned for a real cluster keeps its sizing; a continuous production
    job should size state partitions explicitly instead of relying on
    the one-shot default. Restores the previous value on exit.
    """
    prev = spark.conf.get("spark.sql.shuffle.partitions", "200")
    n = spark.sparkContext.defaultParallelism
    try:
        target = min(int(prev), max(n // divisor, floor))
    except ValueError:  # non-numeric vendor values (e.g. "auto")
        target = None
    if target is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(target))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
