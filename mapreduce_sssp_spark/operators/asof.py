"""As-of (nearest-preceding-event) join — a custom operator Spark's
DataFrame API lacks as a primitive, composed from existing operators
(SURVEY.md §2.3's "as-of join" row).

Semantics: for each left row (key, t), attach the right row with the
same key and the greatest t' <= t. Implemented the scale-correct way:
tag both sides, union, then ONE shuffle+sort per key with a
last-non-null carry-forward window — never a per-row range probe, never
a broadcast of the full right side. This is the standard
"sorted-merge carry" formulation: O(n log n) per key partition,
single exchange, whole-stage codegen.

The demo query matches each 'error' event to the same user's most
recent preceding 'click' (events table, microsecond timestamps), and
the oracle is DuckDB's native ASOF JOIN — an independent implementation
of the same semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io.sources import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_cols: list[str],
) -> DataFrame:
    """Attach to each left row the latest right row with right_time <=
    left_time within the same ``on`` key. Right columns come back
    prefixed ``asof_``; rows with no preceding right row keep NULLs.
    """
    left_other = [c for c in left.columns if c != on]
    lu = left.select(
        on,
        F.col(left_time).alias("_t"),
        F.lit(True).alias("_is_left"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
            for c in right_cols
        ],
        *left_other,
    )
    ru = right.select(
        on,
        F.col(right_time).alias("_t"),
        F.lit(False).alias("_is_left"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_other
        ],
    )
    u = lu.unionByName(ru)
    # Right rows sort before left rows at equal timestamps so an exact-tie
    # right row is visible to the left row (ASOF's <= semantics).
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_t"), F.col("_is_left").cast("int"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in right_cols
        ],
    )
    return carried.filter(F.col("_is_left")).drop(
        "_t", "_is_left", *[f"_r_{c}" for c in right_cols]
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_cols: list[str],
) -> DataFrame:
    """Forward as-of: attach the EARLIEST right row with right_time >=
    left_time per key — the mirror carry, scanning the same single
    sorted union with a forward-looking window (first non-null ahead).
    Equal-timestamp right rows count (left sorts before right at ties),
    and ties among right rows resolve by the first right column
    ascending, mirrored in the oracle.
    """
    left_other = [c for c in left.columns if c != on]
    lu = left.select(
        on,
        F.col(left_time).alias("_t"),
        F.lit(True).alias("_is_left"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
            for c in right_cols
        ],
        *left_other,
    )
    ru = right.select(
        on,
        F.col(right_time).alias("_t"),
        F.lit(False).alias("_is_left"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_other
        ],
    )
    u = lu.unionByName(ru)
    w = (
        Window.partitionBy(on)
        .orderBy(
            F.col("_t"),
            F.col("_is_left").cast("int").desc(),  # left BEFORE tie-rights
            F.col(f"_r_{right_cols[0]}").asc_nulls_first(),
        )
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = u.select(
        "*",
        *[
            F.first(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in right_cols
        ],
    )
    return carried.filter(F.col("_is_left")).drop(
        "_t", "_is_left", *[f"_r_{c}" for c in right_cols]
    )


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each 'error' event joined as-of to the user's latest preceding
    'click' event; gap reported in microseconds."""
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    joined = asof_join(
        errors, clicks, on="user_id", left_time="ts", right_time="click_ts",
        right_cols=["click_id", "click_ts"],
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("asof_click_id").alias("click_id"),
        F.col("asof_click_ts").alias("click_ts"),
        F.expr("timestampdiff(MICROSECOND, asof_click_ts, ts)").alias("gap_us"),
    )


def q_asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each 'error' event joined forward to the user's NEXT 'click'
    event (time-to-recovery analysis shape)."""
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    joined = asof_join_forward(
        errors, clicks, on="user_id", left_time="ts", right_time="click_ts",
        right_cols=["click_id", "click_ts"],
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("asof_click_id").alias("click_id"),
        F.col("asof_click_ts").alias("click_ts"),
        F.expr("timestampdiff(MICROSECOND, ts, asof_click_ts)").alias("gap_us"),
    )


def q_asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-event as-of: each 'error' matched to the same user's
    CLOSEST 'click' in either direction (ties to the preceding one) —
    the sensor-alignment/entity-timeline variant the backward/forward
    pair can't express alone.

    ONE union + ONE exchange + ONE sort: both carries ride the same
    sorted pass (backward = last non-null over the preceding frame,
    forward = first non-null over the following frame — same partition
    and order, different frames, so Spark plans one Sort under two
    Window operators and never re-shuffles). Equal-timestamp clicks
    sort before the error row, so they surface as gap-0 backward
    matches; tie clicks at one timestamp resolve by id (max backward,
    min forward), mirrored exactly in the oracle's two LATERAL probes.
    """
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("_r_id"),
        F.col("ts").alias("_r_ts"),
    )
    return nearest_join(errors, clicks)


def nearest_join(errors: DataFrame, clicks: DataFrame) -> DataFrame:
    """See q_asof_join_nearest. errors: (event_id, user_id, ts);
    clicks: (user_id, _r_id, _r_ts)."""
    lu = errors.select(
        "user_id",
        F.col("ts").alias("_t"),
        F.lit(1).alias("_is_left"),
        F.lit(None).cast("long").alias("_r_id"),
        F.lit(None).cast(clicks.schema["_r_ts"].dataType).alias("_r_ts"),
        "event_id",
        "ts",
    )
    ru = clicks.select(
        "user_id",
        F.col("_r_ts").alias("_t"),
        F.lit(0).alias("_is_left"),
        "_r_id",
        "_r_ts",
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast(errors.schema["ts"].dataType).alias("ts"),
    )
    u = lu.unionByName(ru)
    order = [
        F.col("_t"),
        F.col("_is_left"),  # rights (0) before lefts (1) at tie ts
        F.col("_r_id").asc_nulls_first(),
    ]
    wb = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = u.select(
        "*",
        F.last("_r_id", ignorenulls=True).over(wb).alias("b_id"),
        F.last("_r_ts", ignorenulls=True).over(wb).alias("b_ts"),
        F.first("_r_id", ignorenulls=True).over(wf).alias("f_id"),
        F.first("_r_ts", ignorenulls=True).over(wf).alias("f_ts"),
    ).filter(F.col("_is_left") == 1)
    gap_b = F.expr("timestampdiff(MICROSECOND, b_ts, ts)")
    gap_f = F.expr("timestampdiff(MICROSECOND, ts, f_ts)")
    pick_b = F.col("f_ts").isNull() | (
        F.col("b_ts").isNotNull() & (gap_b <= gap_f)
    )
    return carried.select(
        "event_id",
        "user_id",
        "ts",
        F.when(pick_b, F.col("b_id")).otherwise(F.col("f_id")).alias(
            "click_id"
        ),
        F.when(pick_b, F.col("b_ts")).otherwise(F.col("f_ts")).alias(
            "click_ts"
        ),
        F.when(pick_b, gap_b).otherwise(gap_f).alias("gap_us"),
        F.when(
            F.col("b_ts").isNull() & F.col("f_ts").isNull(), F.lit(None)
        )
        .when(pick_b, F.lit("backward"))
        .otherwise(F.lit("forward"))
        .alias("direction"),
    )


QUERIES = {
    "asof_join": q_asof_join,
    "asof_join_forward": q_asof_join_forward,
    "asof_join_nearest": q_asof_join_nearest,
}

ORACLE = {
    "asof_join": """
WITH errors AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
  FROM events WHERE event_type = 'error'
),
clicks AS (
  SELECT user_id, event_id AS click_id, CAST(ts AS TIMESTAMP) AS click_ts
  FROM events WHERE event_type = 'click'
)
SELECT e.event_id, e.user_id, e.ts, c.click_id, c.click_ts,
       date_diff('microsecond', c.click_ts, e.ts) AS gap_us
FROM errors e ASOF LEFT JOIN clicks c
  ON e.user_id = c.user_id AND e.ts >= c.click_ts
""",
    "asof_join_nearest": """
WITH errors AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
  FROM events WHERE event_type = 'error'
),
clicks AS (
  SELECT user_id, event_id AS click_id, CAST(ts AS TIMESTAMP) AS click_ts
  FROM events WHERE event_type = 'click'
),
both_sides AS (
  SELECT e.event_id, e.user_id, e.ts,
         b.click_id AS b_id, b.click_ts AS b_ts,
         f.click_id AS f_id, f.click_ts AS f_ts
  FROM errors e
  LEFT JOIN LATERAL (
    SELECT click_id, click_ts FROM clicks c
    WHERE c.user_id = e.user_id AND c.click_ts <= e.ts
    ORDER BY c.click_ts DESC, c.click_id DESC LIMIT 1
  ) b ON true
  LEFT JOIN LATERAL (
    SELECT click_id, click_ts FROM clicks c
    WHERE c.user_id = e.user_id AND c.click_ts > e.ts
    ORDER BY c.click_ts, c.click_id LIMIT 1
  ) f ON true
)
SELECT event_id, user_id, ts,
       CASE WHEN pick_b THEN b_id ELSE f_id END AS click_id,
       CASE WHEN pick_b THEN b_ts ELSE f_ts END AS click_ts,
       CASE WHEN pick_b THEN date_diff('microsecond', b_ts, ts)
            ELSE date_diff('microsecond', ts, f_ts) END AS gap_us,
       CASE WHEN b_ts IS NULL AND f_ts IS NULL THEN NULL
            WHEN pick_b THEN 'backward' ELSE 'forward' END AS direction
FROM (
  SELECT *,
         (f_ts IS NULL OR (b_ts IS NOT NULL
          AND date_diff('microsecond', b_ts, ts)
              <= date_diff('microsecond', ts, f_ts))) AS pick_b
  FROM both_sides
)
""",
    "asof_join_forward": """
WITH errors AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
  FROM events WHERE event_type = 'error'
),
clicks AS (
  SELECT user_id, event_id AS click_id, CAST(ts AS TIMESTAMP) AS click_ts
  FROM events WHERE event_type = 'click'
)
SELECT e.event_id, e.user_id, e.ts, c.click_id, c.click_ts,
       date_diff('microsecond', e.ts, c.click_ts) AS gap_us
FROM errors e LEFT JOIN LATERAL (
  SELECT click_id, click_ts FROM clicks c
  WHERE c.user_id = e.user_id AND c.click_ts >= e.ts
  ORDER BY c.click_ts, c.click_id LIMIT 1
) c ON true
""",
}
