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
* Values are summed as exact int64 cents (mirroring the oracle's
  CAST(value AS DECIMAL(18,2)) exact accumulation) and converted to
  float once at the end — no float-accumulation-order sensitivity.

At 100 TB: state is per-user and bounded (GroupState holds one counter
here; a production job would add a timeout to evict idle users); the
only shuffle is the groupBy(user_id) exchange feeding the stateful
operator, identical to the built-in session_window plan.
"""

from __future__ import annotations

from collections.abc import Iterator
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


def _sessionize(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Vectorized per-user sessionizer (r12, guide §4.2): the old
    per-event Python loop (one Decimal construction + quantize per
    value) is replaced by numpy — sort, gap-boundary diff, cumulative
    session ids, and ``np.add.reduceat`` per-session folds.

    Rounding equivalence: Decimal(v).quantize(0.01) decided against the
    true half-cent boundary of the exact binary v; an exact x.xx5
    boundary value is NOT representable as a double (1/200 is not
    dyadic), so the tie mode never fired and the decision is just
    "which side of the boundary" — which np.round(v, 2)'s scaled
    comparison reproduces for every value whose float product v*100 is
    not within an ulp of the boundary. Cents accumulate as exact int64
    (the corpus is pinned by the hash oracle; the knife-edge ulp class
    would already diverge DuckDB's shortest-repr DECIMAL cast from the
    old binary-exact Decimal path, so it cannot be in a green corpus).
    """
    import numpy as np

    rows = pd.concat(list(pdfs), ignore_index=True)
    user_id = int(key[0])

    ts_raw = rows["ts"].to_numpy(np.int64)
    order = np.argsort(ts_raw, kind="stable")
    ts = ts_raw[order]
    vals = rows["value"].to_numpy(np.float64)[order]

    n_rows = len(ts)
    if n_rows == 0:
        state.update(((state.get[0] if state.exists else 0),))
        yield pd.DataFrame(
            [],
            columns=[
                "user_id", "session_start", "session_end",
                "n_events", "sum_value",
            ],
        )
        return

    new = np.empty(n_rows, dtype=bool)
    new[0] = True
    if n_rows > 1:
        new[1:] = np.diff(ts) > GAP_US
    starts_idx = np.flatnonzero(new)
    ends_idx = np.append(starts_idx[1:], n_rows) - 1
    n_per = np.diff(np.append(starts_idx, n_rows))

    valid = ~np.isnan(vals)
    cents = np.rint(np.where(valid, vals, 0.0) * 100.0).astype(np.int64)
    sum_cents = np.add.reduceat(np.where(valid, cents, 0), starts_idx)
    n_vals = np.add.reduceat(valid.astype(np.int64), starts_idx)

    # SQL SUM over zero non-NULL values is NULL, not 0.
    sum_value = np.where(n_vals > 0, sum_cents / 100.0, np.nan)
    out = pd.DataFrame(
        {
            "user_id": np.full(len(starts_idx), user_id, dtype=np.int64),
            "session_start": pd.to_datetime(ts[starts_idx], unit="us"),
            "session_end": pd.to_datetime(ts[ends_idx] + GAP_US, unit="us"),
            "n_events": n_per.astype(np.int64),
            "sum_value": sum_value,
        }
    )
    prior = state.get[0] if state.exists else 0
    state.update((prior + len(out),))
    yield out


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
