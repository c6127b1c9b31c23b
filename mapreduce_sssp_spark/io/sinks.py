"""Sinks: partitioned-parquet writer with read-back verification.

The reference's only sink is newline text (SingleSourceSP.java:150-161
formatting; covered by the compat_* queries). A Spark engine's working
sink at 100 TB is partitioned parquet: ``partitionBy`` on a
low-cardinality column so downstream readers get partition pruning,
``maxRecordsPerFile`` bounding file sizes so a skewed partition can't
produce one monster file.

``sink_partitioned_roundtrip`` exercises the full write→read cycle:
write orders partitioned by status to a scratch dir, read it back (the
status column is now a partition directory, pruned at the scan), and
aggregate. The oracle aggregates the source table directly — so the
hash check proves the sink lost/duplicated nothing, including the
partition-column round trip.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sources import load_table

DEC = "decimal(18,2)"


def write_partitioned(
    df: DataFrame, path: str, partition_col: str, max_records_per_file: int = 1_000_000
) -> None:
    (
        df.write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(partition_col)
        .parquet(path)
    )


def q_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    path = os.path.join(
        tempfile.gettempdir(),
        "spark-graft-sink-" + sf_dir.strip("/").replace("/", "_"),
        "orders_by_status",
    )
    write_partitioned(orders, path, "o_orderstatus")
    back = spark.read.parquet(path)
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("total_price"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
        )
    )


def _scratch(sf_dir: str, leaf: str) -> str:
    return os.path.join(
        tempfile.gettempdir(),
        "spark-graft-sink-" + sf_dir.strip("/").replace("/", "_"),
        leaf,
    )


def q_sink_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header CSV write -> schema-on-read back. Returns the full
    read-back row set, so the hash check proves the text round trip is
    lossless — including doubles, which survive because Spark writes
    shortest-round-trip representations and parses them back exactly.
    The read uses an EXPLICIT schema (never inferSchema: a second pass
    over the data at 100 TB, and type drift on edge values)."""
    cust = load_table(spark, sf_dir, "customer")
    path = _scratch(sf_dir, "customer_csv")
    cust.write.mode("overwrite").option("header", True).csv(path)
    return spark.read.schema(cust.schema).option("header", True).csv(path)


def q_sink_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines write -> schema-on-read back (explicit schema, same
    rationale as CSV). part covers int/long/string/double fields."""
    part = load_table(spark, sf_dir, "part")
    path = _scratch(sf_dir, "part_json")
    part.write.mode("overwrite").json(path)
    return spark.read.schema(part.schema).json(path)


def q_sink_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC write -> read back. Second columnar format (zlib-compressed,
    predicate-pushdown-capable like parquet) — the interop sink for
    Hive-era warehouses. Binary columnar storage, so the round trip is
    trivially lossless; the hash check proves no row was dropped or
    duplicated by the write/read pair."""
    supp = load_table(spark, sf_dir, "supplier")
    path = _scratch(sf_dir, "supplier_orc")
    supp.write.mode("overwrite").orc(path)
    return spark.read.orc(path)


QUERIES = {
    "sink_partitioned_roundtrip": q_sink_roundtrip,
    "sink_csv_roundtrip": q_sink_csv_roundtrip,
    "sink_json_roundtrip": q_sink_json_roundtrip,
    "sink_orc_roundtrip": q_sink_orc_roundtrip,
}

ORACLE = {
    "sink_partitioned_roundtrip": """
SELECT o_orderstatus,
       count(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
       min(o_orderkey) AS min_key,
       max(o_orderkey) AS max_key
FROM orders
GROUP BY o_orderstatus
""",
    "sink_csv_roundtrip": """
SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer
""",
    "sink_json_roundtrip": """
SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice FROM part
""",
    "sink_orc_roundtrip": """
SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier
""",
}
