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

from ..contracts import finite
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
    # Finite-measure contract (r12 non-finite probe); twin mirrors.
    li = load_table(spark, sf_dir, "lineitem").filter(
        finite("l_extendedprice")
    )
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
        # r12 finite-measure contract on the snapshot side too.
        .filter((F.col("o_orderkey") % 4 != 0) & finite("o_totalprice"))
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
    # Finite-measure contract (r12 non-finite probe); twin mirrors.
    orders = load_table(spark, sf_dir, "orders").filter(
        finite("o_totalprice")
    )
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


DEL_MOD = 97  # deletion request batch: every key = 0 (mod 97)


def q_deletion_cascade_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten cascade audit: given a deletion-request
    batch (customers with c_custkey = 0 mod {DEL_MOD}, and the same id
    rule on the user-keyed event store), report — per table — how many
    rows a compliant erasure would delete, following the FK cascade
    customer -> orders -> lineitem. This is the dry-run report a
    governance pipeline emits BEFORE the rewrite job, and the row
    counts it reconciles after.

    The cascade is computed with semi joins against the actual parent
    key sets (never by re-deriving the id rule on children): orders
    die because their customer died, lineitems because their order
    died — exactly the dependency order a real erasure must follow.

    All counts exact int64; pct is one closing division per row.

    At 100 TB: the deletion batch is ~1/{DEL_MOD} of one dimension —
    it BROADCASTS; each fact table is ONE scan with a broadcast
    left-semi join and a map-side-combined count, so no fact row ever
    shuffles. The orders key set that drives the lineitem cascade is
    itself 1/{DEL_MOD}-sized (still broadcastable at TPC-H ratios; at
    web scale it becomes the one shuffled semi join, keyed by
    l_orderkey).
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ev = load_table(spark, sf_dir, "events")

    cust_del = cust.filter(F.col("c_custkey") % DEL_MOD == 0)
    orders_del = orders.join(
        F.broadcast(cust_del.select(F.col("c_custkey").alias("o_custkey"))),
        "o_custkey",
        "left_semi",
    )
    li_del = li.join(
        F.broadcast(orders_del.select(F.col("o_orderkey").alias("l_orderkey"))),
        "l_orderkey",
        "left_semi",
    )
    ev_del = ev.filter(F.col("user_id") % DEL_MOD == 0)

    def audit(name: str, deleted: DataFrame, total: DataFrame) -> DataFrame:
        d = deleted.agg(F.count("*").alias("n_delete"))
        t = total.agg(F.count("*").alias("n_total"))
        return d.crossJoin(t).select(
            F.lit(name).alias("table_name"),
            "n_delete",
            "n_total",
            (
                F.col("n_delete").cast("double")
                / F.col("n_total").cast("double")
            ).alias("delete_frac"),
        )

    return (
        audit("customer", cust_del, cust)
        .unionAll(audit("orders", orders_del, orders))
        .unionAll(audit("lineitem", li_del, li))
        .unionAll(audit("events", ev_del, ev))
    )


def q_table_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive table fingerprint: XOR of a 60-bit md5 hash of
    every row's canonical serialization — the constant-size checksum
    two replicas exchange to answer "are these tables identical?"
    WITHOUT moving rows (the cheap precursor to table_diff, which then
    localizes the difference). XOR is commutative/associative, so the
    fingerprint is independent of row order, partitioning, and
    aggregation tree shape — exactly what a distributed checksum needs
    (and why SUM with wraparound, which ANSI overflow rules reject, is
    not used).

    Emitted for the orders snapshot AND a deterministically mutated
    twin (+1 cent on every 1000th key), so the result itself proves
    single-row-change detection: same n_rows, different fingerprint.
    The 60-bit hash is the portable md5 device (`conv(hex,16,10)` /
    `'0x'||hex` — bit-identical across engines, feature_hash's
    precedent at dedup.py:494).

    At 100 TB: ONE scan per snapshot, map-side XOR partial aggregate,
    8 bytes per partition to the driver — the cheapest possible
    whole-table integrity primitive. Collision odds for a single
    changed row are 2^-60; reconciliation pipelines pair it with
    per-partition fingerprints (same plan, groupBy(bucket)) to
    bisect.
    """
    # Finite-measure contract (r12 non-finite probe); twin mirrors.
    orders = load_table(spark, sf_dir, "orders").filter(
        finite("o_totalprice")
    )
    base = orders.select(
        F.col("o_orderkey").alias("key"),
        F.expr(_CENTS.format(col="o_totalprice")).alias("cents"),
    )
    mutated = base.select(
        "key",
        F.when(F.col("key") % 1000 == 0, F.col("cents") + 1)
        .otherwise(F.col("cents"))
        .alias("cents"),
    )

    def fp(df: DataFrame, name: str) -> DataFrame:
        h = F.expr(
            "CAST(conv(substring(md5(concat_ws('|', key, cents)), 1, 15),"
            " 16, 10) AS BIGINT)"
        )
        return df.select(h.alias("h")).agg(
            F.lit(name).alias("snapshot"),
            F.count("*").alias("n_rows"),
            F.expr("bit_xor(h)").alias("fingerprint60"),
        )

    return fp(base, "orders").unionAll(fp(mutated, "orders_mutated"))


QUERIES = {
    "merge_cdc": q_merge_cdc,
    "latest_per_key": q_latest_per_key,
    "table_diff": q_table_diff,
    "deletion_cascade_audit": q_deletion_cascade_audit,
    "table_fingerprint": q_table_fingerprint,
}

ORACLE = {
    "table_fingerprint": """
WITH base AS (
  SELECT o_orderkey AS key,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders WHERE isfinite(o_totalprice)
),
mutated AS (
  SELECT key,
         CASE WHEN key % 1000 = 0 THEN cents + 1 ELSE cents END AS cents
  FROM base
),
hb AS (
  SELECT CAST(('0x' || substr(md5(concat_ws('|', key, cents)), 1, 15))
              AS BIGINT) AS h
  FROM base
),
hm AS (
  SELECT CAST(('0x' || substr(md5(concat_ws('|', key, cents)), 1, 15))
              AS BIGINT) AS h
  FROM mutated
)
SELECT 'orders' AS snapshot, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(bit_xor(h) AS BIGINT) AS fingerprint60
FROM hb
UNION ALL
SELECT 'orders_mutated', CAST(COUNT(*) AS BIGINT),
       CAST(bit_xor(h) AS BIGINT)
FROM hm
""",
    "deletion_cascade_audit": f"""
WITH cust_del AS (
  SELECT c_custkey FROM customer WHERE c_custkey % {DEL_MOD} = 0
),
orders_del AS (
  SELECT o_orderkey FROM orders
  WHERE o_custkey IN (SELECT c_custkey FROM cust_del)
),
rows_out AS (
  SELECT 'customer' AS table_name,
         (SELECT COUNT(*) FROM cust_del) AS n_delete,
         (SELECT COUNT(*) FROM customer) AS n_total
  UNION ALL
  SELECT 'orders',
         (SELECT COUNT(*) FROM orders_del),
         (SELECT COUNT(*) FROM orders)
  UNION ALL
  SELECT 'lineitem',
         (SELECT COUNT(*) FROM lineitem
          WHERE l_orderkey IN (SELECT o_orderkey FROM orders_del)),
         (SELECT COUNT(*) FROM lineitem)
  UNION ALL
  SELECT 'events',
         (SELECT COUNT(*) FROM events WHERE user_id % {DEL_MOD} = 0),
         (SELECT COUNT(*) FROM events)
)
SELECT table_name, CAST(n_delete AS BIGINT) AS n_delete,
       CAST(n_total AS BIGINT) AS n_total,
       CAST(n_delete AS DOUBLE) / CAST(n_total AS DOUBLE) AS delete_frac
FROM rows_out
""",
    "merge_cdc": """
WITH log AS (
  SELECT l_orderkey AS key, l_linenumber AS seq,
         CASE WHEN l_returnflag = 'R' THEN 'D' ELSE 'U' END AS op,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM lineitem WHERE isfinite(l_extendedprice)
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
  FROM orders WHERE o_orderkey % 4 <> 0 AND isfinite(o_totalprice)
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
  FROM orders WHERE isfinite(o_totalprice)
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
