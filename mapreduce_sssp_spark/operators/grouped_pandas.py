"""Grouped Pandas transform (``groupBy().applyInPandas``) — the third
Python-integration surface next to mapInPandas (multimodal) and
applyInPandasWithState (streaming/stateful): per-group logic that is
awkward in SQL but trivial in pandas, executed group-parallel with
Arrow transfer.

The demo computes per-customer order-cadence statistics (gaps between
consecutive orders). All outputs are integer day arithmetic on
midnight timestamps — exact in both engines, so the query is
hash-verified against a lag-window SQL oracle.

At 100 TB: one shuffle on the grouping key; per-group state is one
customer's orders (bounded); Arrow batches bound Python memory.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..contracts import finite
from ..io.sources import load_table

GAPS_SCHEMA = T.StructType(
    [
        T.StructField("o_custkey", T.LongType()),
        T.StructField("n_orders", T.LongType()),
        T.StructField("max_gap_days", T.LongType()),
        T.StructField("min_gap_days", T.LongType()),
        T.StructField("span_days", T.LongType()),
    ]
)


_EMPTY = pd.DataFrame(columns=[f.name for f in GAPS_SCHEMA.fields])


def _gaps(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
    # Gap stats depend only on the sorted date sequence (ties give gap 0
    # in any tie order), so a plain numpy sort of the day numbers
    # suffices — no per-group pandas mergesort, no tiebreak column.
    if len(pdf) < 2:
        return _EMPTY
    days = np.sort(pdf["o_orderdate"].to_numpy(np.int64) // 86_400_000_000_000)
    gaps = np.diff(days)
    return pd.DataFrame(
        {
            "o_custkey": [int(key[0])],
            "n_orders": [len(days)],
            "max_gap_days": [int(gaps.max())],
            "min_gap_days": [int(gaps.min())],
            "span_days": [int(days[-1] - days[0])],
        }
    )


GAPS_SEGMENT = "BUILDING"


def q_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas cadence stats for ONE market segment's customers.

    The per-group pandas apply pays a fixed pandas-conversion cost per
    group (~10k tiny groups dominated the whole bench at 19.8s on the
    full table). The API surface is the point of this query, so it runs
    on a broadcast-semi-joined segment slice (~1/5 of customers);
    ``order_gaps_arrow`` below is the full-table, perf-honest twin.
    """
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(
            (F.col("c_mktsegment") == GAPS_SEGMENT)
            & (F.col("c_custkey") % 3 == 0)
        )
        .select(F.col("c_custkey").alias("o_custkey"))
    )
    # o_orderdate required (r11 NULL rail; twin mirrors the WHERE).
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull()
    ).select("o_custkey", "o_orderdate")
    seg = orders.join(F.broadcast(cust), "o_custkey", "left_semi")
    # Pre-partition BY THE GROUPING KEY (the groupBy's required
    # distribution is already satisfied, so no second exchange). r12:
    # one worker per core instead of the old fixed 8 — the per-group
    # pandas conversion dominates and parallelizes linearly (see
    # q_cogroup_user_activity's measured A/B).
    n = spark.sparkContext.defaultParallelism
    return seg.repartition(n, "o_custkey").groupBy("o_custkey").applyInPandas(
        _gaps, GAPS_SCHEMA
    )


_ARROW_EMPTY = pa.table(
    {
        "o_custkey": pa.array([], pa.int64()),
        "n_orders": pa.array([], pa.int64()),
        "max_gap_days": pa.array([], pa.int64()),
        "min_gap_days": pa.array([], pa.int64()),
        "span_days": pa.array([], pa.int64()),
    }
)


def _gaps_arrow(key: tuple, table: pa.Table) -> pa.Table:
    n = table.num_rows
    if n < 2:
        return _ARROW_EMPTY
    # Arrow hands TIMESTAMP_NTZ over as datetime64[us] (pandas gave ns) —
    # pin the unit explicitly before integer day arithmetic.
    days = np.sort(
        table.column("o_orderdate")
        .to_numpy(zero_copy_only=False)
        .astype("datetime64[us]")
        .astype("int64")
        // 86_400_000_000
    )
    gaps = np.diff(days)
    return pa.table(
        {
            "o_custkey": [key[0].as_py()],
            "n_orders": [n],
            "max_gap_days": [int(gaps.max())],
            "min_gap_days": [int(gaps.min())],
            "span_days": [int(days[-1] - days[0])],
        }
    )


def q_order_gaps_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same per-customer cadence stats via ``applyInArrow`` — the
    Arrow-native grouped apply skips the per-group pandas conversion and
    runs ~3x faster than the applyInPandas twin on many small groups
    (7s vs 21s at sf0.1 on local[32]); the pattern of choice when group
    logic only needs numpy."""
    # Required-column rail (r11 NULL sweep; twin mirrors the WHERE).
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_custkey").isNotNull() & F.col("o_orderdate").isNotNull()
    ).select("o_custkey", "o_orderdate")
    return orders.groupBy("o_custkey").applyInArrow(
        _gaps_arrow, GAPS_SCHEMA.simpleString().removeprefix("struct<").removesuffix(">")
    )


COGROUP_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_orders", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_order_value", T.DoubleType()),
        T.StructField("sum_event_value", T.DoubleType()),
    ]
)


def _merge_user(key: tuple, orders: pd.DataFrame, events: pd.DataFrame) -> pd.DataFrame:
    # Exact integer-cents accumulation via scale-0 HALF-UP rounding of
    # the SAME IEEE product v*100 the oracle rounds (the r10
    # price_round device): DuckDB's CAST(double AS DECIMAL(18,2)) rounds
    # the SHORTEST DECIMAL repr half-up (100.005 -> 100.01) while
    # rounding the true binary value gives 100.00499... -> 100.00 —
    # probed r11 on half-cent orders. round(x*100) in the oracle and
    # the fold below both round the exact binary product half-away, so
    # both engines round identical operands identically.
    #
    # r12 (guide §4.2): the fold is VECTORIZED — the old per-value
    # Python Decimal(v*100).quantize loop cost ~1.5us/row inside every
    # group handler and dominated the query (6.7s). numpy half-away on
    # the binary double is bit-identical to Decimal ROUND_HALF_UP:
    # |x| - floor(|x|) is exact for doubles, the >= 0.5 test decides
    # half-away, copysign restores the sign, and int64 accumulation of
    # the cents matches the oracle's SUM(BIGINT) domain exactly.
    #
    # .dropna(): SQL SUM skips NULLs, so the fold must too (NULL values
    # arrive as NaN and would poison the rounding).
    # Row counts below stay len() — count(*) includes NULL-value rows.
    def cents_sum(col: pd.Series) -> int:
        v = col.dropna().to_numpy(np.float64) * 100.0
        if v.size == 0:
            return 0
        a = np.abs(v)
        f = np.floor(a)
        c = np.where(a - f >= 0.5, f + 1.0, f)
        return int(np.copysign(c, v).astype(np.int64).sum())

    o_sum = cents_sum(orders["o_totalprice"])
    e_sum = cents_sum(events["value"])
    return pd.DataFrame(
        {
            "user_id": [int(key[0])],
            "n_orders": [len(orders)],
            "n_events": [len(events)],
            "sum_order_value": [o_sum / 100],
            "sum_event_value": [e_sum / 100],
        }
    )


def q_cogroup_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``cogroup().applyInPandas`` — the cogrouped Python surface (two
    keyed DataFrames delivered to one handler per key): per-user order
    and event activity merged in pandas. Full-outer key semantics (a
    key present on either side reaches the handler; the other side
    arrives empty) are exactly DuckDB's FULL OUTER JOIN of the two
    group-bys, so the query hash-checks.

    At 100 TB: both sides shuffle once on the key; per-key state is one
    user's rows on each side — the same bound as a regular cogroup join.
    """
    # NULL keys are not users: dropped BEFORE the cogroup (the handler
    # materializes int(key), which a NULL group would NaN-crash), with
    # the same WHERE in the oracle's group-bys.
    # r12: the measure legs carry the finite contract (Decimal(NaN)
    # ops crash inside the pandas handler). Twin mirrors.
    orders = (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("user_id"), "o_totalprice")
        .filter(F.col("user_id").isNotNull() & finite("o_totalprice"))
    )
    events = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "value")
        .filter(F.col("user_id").isNotNull() & finite("value"))
    )
    # Pre-hash-partition both sides on the key so the cogroup exchange
    # is satisfied by the existing layout. r12: the fleet is ONE WORKER
    # PER CORE, not the old fixed 8 — the per-group Python/pandas
    # conversion overhead across ~10k tiny groups is CPU-bound and
    # parallelizes linearly (measured in-process A/B: 8.5s at 8
    # partitions vs 3.0s at 32 on local[32]; a trivial handler at 8
    # still cost 7.1s, so the machinery, not the fold, dominates).
    n = spark.sparkContext.defaultParallelism
    return (
        orders.repartition(n, "user_id")
        .groupBy("user_id")
        .cogroup(events.repartition(n, "user_id").groupBy("user_id"))
        .applyInPandas(_merge_user, COGROUP_SCHEMA)
    )


QUERIES = {
    "order_gaps": q_order_gaps,
    "order_gaps_arrow": q_order_gaps_arrow,
    "cogroup_user_activity": q_cogroup_user_activity,
}

_ORDER_GAPS_SQL_TPL = """
WITH ordered AS (
  SELECT o_custkey,
         CAST(o_orderdate AS DATE) AS d,
         lag(CAST(o_orderdate AS DATE))
           OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_d
  FROM orders{where}
),
gaps AS (
  SELECT o_custkey, datediff('day', prev_d, d) AS gap, d
  FROM ordered
)
SELECT o_custkey,
       count(*) AS n_orders,
       CAST(max(gap) AS BIGINT) AS max_gap_days,
       CAST(min(gap) AS BIGINT) AS min_gap_days,
       CAST(datediff('day', min(d), max(d)) AS BIGINT) AS span_days
FROM gaps
GROUP BY o_custkey
HAVING count(*) >= 2
"""

ORACLE = {
    "cogroup_user_activity": """
WITH o AS (
  -- scale-0 cents rounding, NOT CAST(.. AS DECIMAL(18,2)): the decimal
  -- cast rounds the shortest decimal repr (100.005 -> 100.01) while the
  -- engine's pandas fold rounds the binary product — round(x*100) is
  -- the shared-operand device (see _merge_user).
  SELECT o_custkey AS user_id, count(*) AS n_orders,
         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS o_sum
  FROM orders WHERE o_custkey IS NOT NULL AND isfinite(o_totalprice) GROUP BY o_custkey
),
e AS (
  SELECT user_id, count(*) AS n_events,
         SUM(CAST(round(value * 100) AS BIGINT)) AS e_sum
  FROM events WHERE user_id IS NOT NULL AND isfinite(value) GROUP BY user_id
)
SELECT coalesce(o.user_id, e.user_id) AS user_id,
       CAST(coalesce(n_orders, 0) AS BIGINT) AS n_orders,
       CAST(coalesce(n_events, 0) AS BIGINT) AS n_events,
       CAST(coalesce(o_sum, 0) AS DOUBLE) / 100.0 AS sum_order_value,
       CAST(coalesce(e_sum, 0) AS DOUBLE) / 100.0 AS sum_event_value
FROM o FULL OUTER JOIN e ON o.user_id = e.user_id
""",
    "order_gaps": _ORDER_GAPS_SQL_TPL.format(
        where=(
            " WHERE o_orderdate IS NOT NULL AND o_custkey % 3 = 0"
            " AND o_custkey IN"
            f" (SELECT c_custkey FROM customer WHERE c_mktsegment = '{GAPS_SEGMENT}')"
        )
    ),
    "order_gaps_arrow": _ORDER_GAPS_SQL_TPL.format(
        where=" WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL"
    ),
}
