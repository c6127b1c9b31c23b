"""Change-data-capture apply patterns — the ingestion half of a lakehouse
the engine was missing: compact a keyed change log (insert/update/delete
events with a sequence number) and MERGE it onto a snapshot, entirely as
DataFrame operations (no table format required — the same plan backs a
Delta/Iceberg MERGE INTO at 100 TB).

Scale shape: the log compacts via ``max(struct(seq, ...))`` — a pure
argmax aggregate that partial-aggregates map-side, so the exchange
carries one compact row per key, never the log (a ``row_number`` window
would shuffle + sort the full log for the same answer). The apply is ONE
full-outer join on the key: snapshot and compacted log shuffle once
each, and at scale both can be bucketed on the key to make the merge
exchange-free (the sink_bucketed_join device).

The change log is derived from ``lineitem`` (per order: line number =
monotone change sequence, return flag 'R' at the latest version =
delete) against an ``orders`` snapshot deliberately missing every 4th
key, so all three MERGE actions — update, delete, insert — occur and
are hash-verified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io.sources import load_table

_CENTS = "CAST(CAST({col} AS DECIMAL(18,2)) * 100 AS BIGINT)"


def q_merge_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-write-wins CDC apply: compact the change log to its latest
    event per key (argmax on (seq, op, cents) — exact, order-free; the
    payload fields join the comparison because (key, seq) is not unique
    in the synthetic lineitem, and beyond the full tuple tied rows are
    identical), then merge onto the snapshot with MERGE INTO semantics:

    * key only in snapshot            -> keep   (action 'base')
    * latest op 'U', key in snapshot  -> update (action 'updated')
    * latest op 'U', key missing      -> insert (action 'inserted')
    * latest op 'D'                   -> drop

    Values travel as exact int64 cents so the merged payload
    hash-checks; the action column makes every branch observable.
    """
    li = load_table(spark, sf_dir, "lineitem")
    log = li.select(
        F.col("l_orderkey").alias("key"),
        F.col("l_linenumber").alias("seq"),
        F.when(F.col("l_returnflag") == "R", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        F.expr(_CENTS.format(col="l_extendedprice")).alias("cents"),
    )
    snap = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 4 != 0)
        .select(
            F.col("o_orderkey").alias("key"),
            F.expr(_CENTS.format(col="o_totalprice")).alias("base_cents"),
        )
    )
    return merge_apply(snap, log)


def merge_apply(snap: DataFrame, log: DataFrame) -> DataFrame:
    """See q_merge_cdc. snap: (key, base_cents); log: (key, seq, op,
    cents) with op in ('U', 'D')."""
    latest = (
        log.groupBy("key")
        .agg(F.max(F.struct("seq", "op", "cents")).alias("e"))
        .select(
            "key",
            F.col("e.op").alias("op"),
            F.col("e.cents").alias("new_cents"),
        )
    )
    merged = snap.join(latest, "key", "full_outer")
    return (
        merged.filter((F.col("op").isNull()) | (F.col("op") != "D"))
        .select(
            "key",
            F.coalesce("new_cents", "base_cents").alias("cents"),
            F.when(F.col("op").isNull(), F.lit("base"))
            .when(F.col("base_cents").isNull(), F.lit("inserted"))
            .otherwise(F.lit("updated"))
            .alias("action"),
        )
    )


def q_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-row-per-key (SCD type-1 current view) as ONE argmax
    aggregate: ``max(struct(orderdate, orderkey, payload...))`` elects
    each customer's most recent order and carries the payload through
    the same struct — no self-join to recover columns, no window.

    This is THE current-state query every CDC consumer runs, and the
    aggregate formulation is the scale-correct one: partial aggregation
    collapses each map partition to one candidate row per key before
    the exchange, where the textbook ``row_number() OVER (PARTITION BY
    key ORDER BY ts DESC) = 1`` shuffles and sorts every version. Ties
    on the date break on orderkey inside the struct comparison,
    mirrored by the oracle's ORDER BY.
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.max(
                F.struct(
                    "o_orderdate",
                    "o_orderkey",
                    F.expr(_CENTS.format(col="o_totalprice")).alias("cents"),
                    "o_orderstatus",
                )
            ).alias("e")
        )
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("e.o_orderkey").alias("latest_orderkey"),
            F.col("e.o_orderdate").alias("latest_orderdate"),
            F.col("e.cents").alias("latest_cents"),
            F.col("e.o_orderstatus").alias("latest_status"),
        )
    )


def q_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset reconciliation — the regression gate every pipeline
    migration runs: full-outer compare of two table versions on the
    primary key, classifying every key as added / removed / changed /
    same and totaling the absolute value drift. Version 2 is derived
    deterministically from orders (keys %17==0 removed, %5==0
    repriced +1.00, a %13 slice re-keyed into a new id range as
    inserts), so the report is hash-checkable end to end.

    ONE full-outer join on the key (both sides bucket-able for an
    exchange-free compare at scale) and one 4-row aggregate; values
    compare as exact int64 cents, the drift total is a sum of int64
    absolute deltas. This aggregate REPORT is the production shape —
    the per-row diff stays distributed and never reaches the driver.
    """
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        F.col("o_orderkey").alias("key"),
        F.expr(_CENTS.format(col="o_totalprice")).alias("cents"),
    )
    v2 = (
        base.filter(F.col("key") % 17 != 0)
        .select(
            "key",
            F.when(F.col("key") % 5 == 0, F.col("cents") + 100)
            .otherwise(F.col("cents"))
            .alias("cents"),
        )
        .unionByName(
            base.filter(F.col("key") % 13 == 0).select(
                (F.col("key") + 10_000_000).alias("key"), "cents"
            )
        )
    )
    a = base.select("key", F.col("cents").alias("cents_a"))
    b = v2.select("key", F.col("cents").alias("cents_b"))
    classified = a.join(b, "key", "full_outer").select(
        F.when(F.col("cents_a").isNull(), F.lit("added"))
        .when(F.col("cents_b").isNull(), F.lit("removed"))
        .when(F.col("cents_a") != F.col("cents_b"), F.lit("changed"))
        .otherwise(F.lit("same"))
        .alias("status"),
        F.abs(
            F.coalesce("cents_b", F.lit(0)) - F.coalesce("cents_a", F.lit(0))
        ).alias("abs_delta"),
    )
    return classified.groupBy("status").agg(
        F.count("*").alias("n_keys"),
        F.sum("abs_delta").alias("sum_abs_delta_cents"),
    )


QUERIES = {
    "merge_cdc": q_merge_cdc,
    "latest_per_key": q_latest_per_key,
    "table_diff": q_table_diff,
}

ORACLE = {
    "merge_cdc": """
WITH log AS (
  SELECT l_orderkey AS key, l_linenumber AS seq,
         CASE WHEN l_returnflag = 'R' THEN 'D' ELSE 'U' END AS op,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM lineitem
),
latest AS (
  -- ORDER BY mirrors Spark's max(struct(seq, op, cents)) FIELD BY FIELD:
  -- (key, seq) is not unique in the synthetic lineitem, so the election
  -- must totally order the payload too (beyond that, tied rows are
  -- identical and either one is the same answer).
  SELECT key, op, cents AS new_cents FROM (
    SELECT *, row_number() OVER (PARTITION BY key
                                 ORDER BY seq DESC, op DESC, cents DESC) AS rn
    FROM log
  ) WHERE rn = 1
),
snap AS (
  SELECT o_orderkey AS key,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS base_cents
  FROM orders WHERE o_orderkey % 4 <> 0
)
SELECT key,
       COALESCE(new_cents, base_cents) AS cents,
       CASE WHEN op IS NULL THEN 'base'
            WHEN base_cents IS NULL THEN 'inserted'
            ELSE 'updated' END AS action
FROM snap FULL OUTER JOIN latest USING (key)
WHERE op IS NULL OR op <> 'D'
""",
    "table_diff": """
WITH base AS (
  SELECT o_orderkey AS key,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders
),
v2 AS (
  SELECT key,
         CASE WHEN key % 5 = 0 THEN cents + 100 ELSE cents END AS cents
  FROM base WHERE key % 17 <> 0
  UNION ALL
  SELECT key + 10000000 AS key, cents FROM base WHERE key % 13 = 0
),
classified AS (
  SELECT CASE WHEN a.cents IS NULL THEN 'added'
              WHEN b.cents IS NULL THEN 'removed'
              WHEN a.cents <> b.cents THEN 'changed'
              ELSE 'same' END AS status,
         abs(COALESCE(b.cents, 0) - COALESCE(a.cents, 0)) AS abs_delta
  FROM (SELECT key, cents FROM base) a
  FULL OUTER JOIN (SELECT key, cents FROM v2) b USING (key)
)
SELECT status, count(*) AS n_keys,
       CAST(SUM(abs_delta) AS BIGINT) AS sum_abs_delta_cents
FROM classified GROUP BY status
""",
    "latest_per_key": """
SELECT o_custkey AS custkey,
       o_orderkey AS latest_orderkey,
       o_orderdate AS latest_orderdate,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
         AS latest_cents,
       o_orderstatus AS latest_status
FROM (
  SELECT *, row_number() OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate DESC, o_orderkey DESC)
         AS rn
  FROM orders
) WHERE rn = 1
""",
}
