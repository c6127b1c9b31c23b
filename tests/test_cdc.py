"""CDC apply semantics on a hand-crafted snapshot + change log, written
as parquet and run through the real queries (same device as the
embedding_neardup property test)."""

from __future__ import annotations

import tempfile

import pyspark.sql.functions as F

from mapreduce_sssp_spark.operators.cdc import q_latest_per_key, q_merge_cdc

SF = "/root/testdata/sf0.001"


def _mini_dir(spark):
    d = tempfile.mkdtemp(prefix="cdc-mini-")
    # Snapshot keeps keys 1,2,3 (key 4 is filtered out by %4), so:
    #   key 1: no change event            -> base
    #   key 2: updates then final update  -> updated (latest cents win)
    #   key 3: update then delete         -> dropped
    #   key 5: insert via update event    -> inserted
    #   key 8: delete of a missing key    -> no row (8%4==0 filtered too)
    orders = spark.createDataFrame(
        [
            (1, 10.00),
            (2, 20.00),
            (3, 30.00),
            (4, 40.00),  # excluded from the snapshot by %4
        ],
        "o_orderkey long, o_totalprice double",
    ).select(
        "o_orderkey",
        F.lit(0).alias("o_custkey"),
        F.lit("O").alias("o_orderstatus"),
        "o_totalprice",
        F.lit("1996-01-01").cast("date").alias("o_orderdate"),
    )
    lineitem = spark.createDataFrame(
        [
            (2, 1, "N", 21.00),
            (2, 2, "N", 22.00),   # latest for key 2 -> updated to 2200
            (3, 1, "N", 31.00),
            (3, 2, "R", 31.00),   # latest for key 3 is a delete
            (5, 1, "N", 50.00),   # key missing from snapshot -> inserted
            (8, 1, "R", 80.00),   # delete of a missing key -> nothing
        ],
        "l_orderkey long, l_linenumber int, l_returnflag string,"
        " l_extendedprice double",
    )
    orders.write.parquet(f"{d}/orders.parquet")
    lineitem.write.parquet(f"{d}/lineitem.parquet")
    return d


def test_merge_cdc_actions(spark):
    got = {
        r.key: (r.cents, r.action)
        for r in q_merge_cdc(spark, _mini_dir(spark)).collect()
    }
    assert got == {
        1: (1000, "base"),
        2: (2200, "updated"),
        5: (5000, "inserted"),
    }


def test_merge_cdc_argmax_matches_window_on_real_data(spark):
    """The aggregate argmax and the textbook row_number formulation must
    elect identical rows on the real (tie-heavy) lineitem."""
    from pyspark.sql import Window

    from mapreduce_sssp_spark.io.sources import load_table

    li = load_table(spark, SF, "lineitem").select(
        F.col("l_orderkey").alias("key"),
        F.col("l_linenumber").alias("seq"),
        F.when(F.col("l_returnflag") == "R", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        F.expr(
            "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("cents"),
    )
    agg = (
        li.groupBy("key")
        .agg(F.max(F.struct("seq", "op", "cents")).alias("e"))
        .select("key", "e.op", "e.cents")
    )
    w = Window.partitionBy("key").orderBy(
        F.desc("seq"), F.desc("op"), F.desc("cents")
    )
    win = (
        li.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("key", "op", "cents")
    )
    assert {tuple(r) for r in agg.collect()} == {
        tuple(r) for r in win.collect()
    }


def test_latest_per_key_one_row_per_customer(spark):
    from mapreduce_sssp_spark.io.sources import load_table

    rows = q_latest_per_key(spark, SF).collect()
    n_cust = (
        load_table(spark, SF, "orders").select("o_custkey").distinct().count()
    )
    assert len(rows) == n_cust
    # The elected order really is the max (date, orderkey) for its key.
    orders = load_table(spark, SF, "orders").collect()
    best = {}
    for o in orders:
        k = o.o_custkey
        cand = (o.o_orderdate, o.o_orderkey)
        if k not in best or cand > best[k]:
            best[k] = cand
    for r in rows:
        assert (r.latest_orderdate, r.latest_orderkey) == best[r.custkey]


def test_table_fingerprint_detects_single_row_change(spark):
    from mapreduce_sssp_spark.operators.cdc import q_table_fingerprint

    rows = {r.snapshot: r for r in
            q_table_fingerprint(spark, "/root/testdata/sf0.001").collect()}
    assert rows["orders"].n_rows == rows["orders_mutated"].n_rows
    assert rows["orders"].fingerprint60 != rows["orders_mutated"].fingerprint60


def test_table_fingerprint_is_order_insensitive(spark):
    """Reversing the scan order must not change the fingerprint —
    the XOR aggregate is the order-independence proof."""
    from pyspark.sql import functions as F

    from mapreduce_sssp_spark.io.sources import load_table

    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    base = orders.select(
        F.col("o_orderkey").alias("key"),
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("cents"),
    )
    h = F.expr(
        "CAST(conv(substring(md5(concat_ws('|', key, cents)), 1, 15),"
        " 16, 10) AS BIGINT)"
    )
    fwd = base.select(h.alias("h")).agg(F.expr("bit_xor(h)")).collect()[0][0]
    rev = (
        base.orderBy(F.col("key").desc())
        .repartition(7)
        .select(h.alias("h"))
        .agg(F.expr("bit_xor(h)"))
        .collect()[0][0]
    )
    assert fwd == rev
