"""Custom Python data source (Spark 4 DataSource API) for the
reference's weighted edge-list text format.

The reference defines its input contract as a hand-written Hadoop
InputFormat consuming ``edgeId fromNode toNode distance`` lines
(SingleSourceSP.java:60-66). Spark's native answer to "a format the
built-in readers don't speak" is the Python DataSource API: declare the
schema, split the input into partitions, and yield typed rows —
Catalyst then treats the source like any other relation (column
pruning, downstream pushdown at the logical level, full parallelism
across partitions).

This is the API-surface demonstration: for THIS particular format the
csv reader with an explicit schema (io/sources.py:read_edge_list_text)
is the production path — JVM-side parsing always beats a Python reader.
The DataSource earns its keep on formats no builtin covers (proprietary
binary layouts, quirky scientific formats), where the alternative is a
driver-side preprocessing step that breaks the single-plan pipeline.

At 100 TB: one InputPartition per file (a real source would split by
byte ranges); each partition parses independently executor-side, so
parallelism = #files and nothing funnels through the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class EdgeListDataSource(DataSource):
    """``spark.read.format("edgelist").load(dir)`` for the reference's
    space-separated weighted edge list."""

    @classmethod
    def name(cls) -> str:
        return "edgelist"

    def schema(self) -> str:
        return "edge_id bigint, src bigint, dst bigint, weight double"

    def reader(self, schema) -> "EdgeListReader":
        return EdgeListReader(self.options)


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class EdgeListReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("edgelist source requires a path")

    def partitions(self):
        if os.path.isdir(self.path):
            files = sorted(
                os.path.join(self.path, f)
                for f in os.listdir(self.path)
                if not f.startswith(("_", "."))
            )
        else:
            files = [self.path]
        return [_FilePartition(f) for f in files]

    def read(self, partition):
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line or not line[0].isdigit():
                    continue  # same comment tolerance as the TSV scan
                # General whitespace tokenization (the reference's
                # StringTokenizer tolerates tabs and repeated spaces);
                # lines with the wrong field count are skipped, not fatal.
                fields = line.split()
                if len(fields) != 4:
                    continue
                edge_id, src, dst, weight = fields
                yield int(edge_id), int(src), int(dst), float(weight)


def register(spark: SparkSession) -> None:
    """Idempotently register the source on a session. Registration is
    attempted every call — an id()-keyed cache would go stale when a
    session is stopped and a new one reuses the address; duplicate
    registration just replaces the entry (and any error from an older
    Spark that rejects duplicates is non-fatal by construction)."""
    try:
        spark.dataSource.register(EdgeListDataSource)
    except Exception:  # noqa: BLE001 — duplicate registration only
        pass


def q_pyds_edges_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write the B1 edges in the reference's text format, read them back
    through the custom Python data source, and return (src, dst, weight)
    — the same oracle as the csv-scan roundtrip, proving the custom
    source parses the contract identically."""
    import tempfile

    from pyspark.sql import functions as F

    from .sources import edges_from_lineitem

    register(spark)
    e = edges_from_lineitem(spark, sf_dir).withColumn(
        "edge_id", F.monotonically_increasing_id()
    )
    # Deterministic sf-keyed path + overwrite: repeated runs reuse one
    # directory instead of accumulating mkdtemp copies.
    path = os.path.join(
        tempfile.gettempdir(),
        "spark-graft-pyds-" + sf_dir.strip("/").replace("/", "_"),
        "edges",
    )
    e.select(
        F.concat_ws(
            " ", "edge_id", "src", "dst", F.col("weight").cast("string")
        ).alias("value")
    ).write.mode("overwrite").text(path)
    back = spark.read.format("edgelist").load(path)
    return back.select("src", "dst", "weight")


QUERIES = {"pyds_edges_roundtrip": q_pyds_edges_roundtrip}

ORACLE = {
    "pyds_edges_roundtrip": (
        "SELECT l_suppkey AS src, l_partkey AS dst, l_quantity AS weight"
        " FROM lineitem"
    ),
}
