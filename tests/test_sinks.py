"""Sink coverage: partitioned-parquet roundtrip (pruning + content) and
bucketed tables producing a shuffle-free co-located join — the two
write-side disciplines that matter at 100 TB.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from mapreduce_sssp_spark.io.sinks import write_partitioned
from mapreduce_sssp_spark.io.sources import load_table

SF = "/root/testdata/sf0.001"


def test_partitioned_write_prunes_and_preserves(spark, tmp_path):
    orders = load_table(spark, SF, "orders")
    path = str(tmp_path / "orders_by_status")
    write_partitioned(orders, path, "o_orderstatus")

    back = spark.read.parquet(path)
    assert back.count() == orders.count()

    # A filter on the partition column must prune to that directory:
    # the scan's partition count reflects only matching files.
    pruned = back.filter(F.col("o_orderstatus") == "F")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan
    assert pruned.count() == orders.filter(F.col("o_orderstatus") == "F").count()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """bucketBy co-locates both join sides at write time; the join plan
    must then contain no Exchange (shuffle) on either side."""
    orders = load_table(spark, SF, "orders")
    customer = load_table(spark, SF, "customer")
    for name, df, key in (
        ("t_orders_b", orders.select("o_orderkey", "o_custkey", "o_totalprice"), "o_custkey"),
        ("t_customer_b", customer.select("c_custkey", "c_name"), "c_custkey"),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.mode("overwrite")
            .bucketBy(8, key)
            .sortBy(key)
            .option("path", str(tmp_path / name))
            .saveAsTable(name)
        )
    # Disable broadcast + AQE coalescing so the bucketed sort-merge join
    # shape is visible deterministically.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("t_orders_b").join(
            spark.table("t_customer_b"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert j.count() == orders.join(
            customer, orders.o_custkey == customer.c_custkey
        ).count()
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_customer_b")


def test_csv_roundtrip_is_lossless(spark, sf_dir):
    from mapreduce_sssp_spark.io.sinks import q_sink_csv_roundtrip
    from mapreduce_sssp_spark.io.sources import load_table

    back = q_sink_csv_roundtrip(spark, sf_dir)
    src = load_table(spark, sf_dir, "customer")
    assert back.schema == src.schema
    assert back.exceptAll(src).count() == 0 and src.exceptAll(back).count() == 0


def test_json_roundtrip_is_lossless(spark, sf_dir):
    from mapreduce_sssp_spark.io.sinks import q_sink_json_roundtrip
    from mapreduce_sssp_spark.io.sources import load_table

    back = q_sink_json_roundtrip(spark, sf_dir)
    src = load_table(spark, sf_dir, "part")
    assert back.schema == src.schema
    assert back.exceptAll(src).count() == 0 and src.exceptAll(back).count() == 0


def test_orc_roundtrip_is_lossless(spark, sf_dir):
    from mapreduce_sssp_spark.io.sinks import q_sink_orc_roundtrip
    from mapreduce_sssp_spark.io.sources import load_table

    back = q_sink_orc_roundtrip(spark, sf_dir)
    src = load_table(spark, sf_dir, "supplier")
    assert back.schema == src.schema
    assert back.exceptAll(src).count() == 0 and src.exceptAll(back).count() == 0


def test_foreach_upsert_matches_batch_groupby(spark, sf_dir):
    from pyspark.sql import functions as F

    from mapreduce_sssp_spark.io.sources import load_events
    from mapreduce_sssp_spark.streaming.foreach_sink import (
        q_streaming_foreach_upsert,
    )

    got = {
        r.event_type: (r.n, r.sum_value)
        for r in q_streaming_foreach_upsert(spark, sf_dir).collect()
    }
    want = {
        r.event_type: (r.n, r.sum_value)
        for r in load_events(spark, sf_dir)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
                "sum_value"
            ),
        )
        .collect()
    }
    assert got == want


def test_sink_compaction_preserves_rows_and_shrinks_files(spark, sf_dir):
    """Compaction must be byte-lossless (row count identical) and the
    in-query assert already pins that files shrank; here we also check
    the compacted copy's file count hit the byte-derived target."""
    import os

    from mapreduce_sssp_spark.io.sinks import (
        _scratch,
        q_sink_compaction_roundtrip,
    )

    out = q_sink_compaction_roundtrip(spark, sf_dir)
    n_out = sum(r.n for r in out.collect())
    n_src = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    assert n_out == n_src
    compact = _scratch(sf_dir, "lineitem_compacted")
    files = [f for f in os.listdir(compact) if f.endswith(".parquet")]
    assert 1 <= len(files) < 64
