"""Graph reversal and adjacency-list construction.

The reference (ReverseGraph.java) implements edge transposition with the
value-to-key secondary-sort pattern: a composite ``Pair(term1,term2)``
WritableComparable (ReverseGraph.java:37-100), a custom partitioner on
``term1`` (:134-143), shuffle-sort for within-group order, an in-reducer
``LinkedHashMap`` re-group (:145-204) and a single reducer for global
order (:225).

In Spark the whole apparatus is three declarative operators —
``groupBy(...).agg(sort_array(collect_list(...)))`` + ``orderBy`` — and
the physical concerns (partitioning, within-partition sort, range
partitioning for global order) are planned by Catalyst. No single-reducer
bottleneck: the global sort is a distributed range-partitioned sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reverse_graph(edges: DataFrame, *, distinct: bool = True) -> DataFrame:
    """Transpose the graph: for each input edge u->v, group v -> sorted
    list of u (ReverseGraph.java:102-205; net effect per SURVEY.md §3.2).

    Returns (node BIGINT, neighbors ARRAY<BIGINT> ascending), globally
    ordered by node (ReverseGraph.java:225's single-reducer order, here a
    scalable range-partitioned sort).
    """
    e = edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
    )
    if distinct:
        e = e.distinct()
    return (
        e.groupBy(F.col("dst").alias("node"))
        .agg(F.sort_array(F.collect_list("src")).alias("neighbors"))
        .orderBy("node")
    )


def adjacency_list(edges: DataFrame) -> DataFrame:
    """Forward adjacency build — the reference's format job
    (SingleSourceSP.java:73-129) without its 1-reducer constraint.

    Returns (node, adj ARRAY<STRUCT<dst,weight>> sorted by (dst, weight)).
    Duplicate edges are preserved, as in the reference.
    """
    return (
        edges.groupBy(F.col("src").alias("node"))
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("dst"), F.col("weight")))
            ).alias("adj")
        )
    )
