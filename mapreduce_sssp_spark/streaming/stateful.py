"""Custom stateful streaming operator: per-user sessionization with
``applyInPandasWithState`` (SURVEY.md §2.9's "custom stateful operator"
target — the reference has no streaming surface at all; this is the
Structured-Streaming-native equivalent of its per-round stateful reduce).

The handler reproduces ``session_window(ts, 30 min)`` semantics exactly
(new session when gap > 30 min; session end = last event + gap), so the
whole custom-state path is verifiable against the same gaps-and-islands
SQL oracle as the built-in session window — a hash-checked custom
operator, not a demo.

Determinism notes:
* Event time is converted to INTEGER epoch micros JVM-side
  (``unix_micros`` after the shared dtype-branching normalization, UTC
  session TZ) before entering the handler; gap math is exact integer
  arithmetic with no float or TZ dependence.
* Values are summed as 2-dp Decimals (mirroring the oracle's
  CAST(value AS DECIMAL(18,2)) exact accumulation) and converted to
  float once at the end — no float-accumulation-order sensitivity.

At 100 TB: state is per-user and bounded (GroupState holds one counter
here; a production job would add a timeout to evict idle users); the
only shuffle is the groupBy(user_id) exchange feeding the stateful
operator, identical to the built-in session_window plan.
"""

from __future__ import annotations

from collections.abc import Iterator
from decimal import Decimal

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..contracts import finite

from .source import bounded_state_partitions

GAP_US = 30 * 60 * 1_000_000  # 30 minutes in microseconds

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampNTZType()),
        T.StructField("session_end", T.TimestampNTZType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType([T.StructField("n_sessions", T.LongType())])

_CENT = Decimal("0.01")


def _sessionize(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values("ts", kind="mergesort")
    user_id = int(key[0])

    out: list[tuple] = []
    start_us = prev_us = None
    n = n_vals = 0
    total = Decimal(0)

    def flush() -> None:
        out.append(
            (
                user_id,
                pd.to_datetime(start_us, unit="us"),
                pd.to_datetime(prev_us + GAP_US, unit="us"),
                n,
                # SQL SUM over zero non-NULL values is NULL, not 0.
                float(total) if n_vals else None,
            )
        )

    for ts_us, val in zip(rows["ts"], rows["value"]):
        ts_us = int(ts_us)
        if prev_us is not None and ts_us - prev_us > GAP_US:
            flush()
            start_us, n, n_vals, total = None, 0, 0, Decimal(0)
        if start_us is None:
            start_us = ts_us
        prev_us = ts_us
        n += 1
        # SQL SUM skips NULLs (NaN here); count(*) still counts the row.
        if not pd.isna(val):
            n_vals += 1
            total += Decimal(float(val)).quantize(_CENT)
    if prev_us is not None:
        flush()

    prior = state.get[0] if state.exists else 0
    state.update((prior + len(out),))
    yield pd.DataFrame(
        out, columns=["user_id", "session_start", "session_end", "n_events", "sum_value"]
    )


def stateful_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the stateful sessionizer over the events stream to a memory
    sink (availableNow: process everything, then stop)."""
    from .source import events_stream

    # Exact integer epoch-micros event time for the handler, computed
    # JVM-side (UTC session TZ makes the NTZ->TIMESTAMP cast an
    # instant-identity).
    ev = events_stream(spark, sf_dir).withColumn(
        "ts", F.unix_micros(F.col("ts"))
    )
    sessions = (
        # NULL rail (r11 NULL sweep): a NULL timestamp is in no session
        # and a NULL user is no state key — int(key[0]) / int(ts_us) in
        # the handler would crash the whole stream on one bad row.
        # Mirrored in the oracle's WHERE.
        # r12: the value leg carries the finite contract (Decimal(NaN)
        # accumulation crashes the pandas handler). Twin mirrors.
        ev.filter(
            F.col("ts").isNotNull()
            & F.col("user_id").isNotNull()
            & finite("value")
        )
        .select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
    sink = f"stateful_sessions_sink_{abs(id(sessions)) % 10_000_000}"
    with bounded_state_partitions(spark):
        q = (
            sessions.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(sink)


QUERIES = {"streaming_stateful_sessions": stateful_sessions}

# Same semantics as the built-in session window -> same oracle shape.
ORACLE = {
    "streaming_stateful_sessions": """
WITH ordered AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
         lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
  FROM events
  -- engine mirror: NULL ts is in no session; NULL user is no state
  -- key; non-finite value is a malformed measure (r12 contract)
  WHERE ts IS NOT NULL AND user_id IS NOT NULL AND isfinite(value)
),
flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN prev_ts IS NULL
                   OR ts - prev_ts > INTERVAL '30 minutes' THEN 1 ELSE 0 END AS is_new
  FROM ordered
),
islands AS (
  SELECT user_id, ts, value,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL '30 minutes' AS session_end,
       count(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM islands
GROUP BY user_id, session_id
""",
}
