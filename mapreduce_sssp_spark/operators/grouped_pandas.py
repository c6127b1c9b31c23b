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

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


def _gaps(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values(["o_orderdate", "o_orderkey"], kind="mergesort")
    if len(pdf) < 2:
        return pd.DataFrame(columns=[f.name for f in GAPS_SCHEMA.fields])
    days = (pdf["o_orderdate"].astype("int64") // 86_400_000_000_000).to_numpy()
    gaps = days[1:] - days[:-1]
    return pd.DataFrame(
        {
            "o_custkey": [int(pdf["o_custkey"].iloc[0])],
            "n_orders": [len(pdf)],
            "max_gap_days": [int(gaps.max())],
            "min_gap_days": [int(gaps.min())],
            "span_days": [int(days[-1] - days[0])],
        }
    )


def q_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate"
    )
    return orders.groupBy("o_custkey").applyInPandas(_gaps, GAPS_SCHEMA)


QUERIES = {"order_gaps": q_order_gaps}

ORACLE = {
    "order_gaps": """
WITH ordered AS (
  SELECT o_custkey,
         CAST(o_orderdate AS DATE) AS d,
         lag(CAST(o_orderdate AS DATE))
           OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_d
  FROM orders
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
""",
}
