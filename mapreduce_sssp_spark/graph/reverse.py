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

    Fidelity note: the reference KEEPS duplicate edges in the reversed
    CSV (ReverseGraph.java:145-204 appends every value); ``distinct=True``
    (the default here) dedups, which is what the engine's oracle checks.
    Pass ``distinct=False`` for byte-level reference parity.

    Scale note: ``collect_list`` materializes one array per node in one
    task — fine until a power-law hub's in-degree approaches task memory
    (~10^8 at 100 TB). For such graphs use ``reverse_graph_exploded``,
    which keeps the transposed graph in exploded (node, neighbor) form
    and never builds per-node arrays; salting cannot help here because
    the *output contract* of this function is the per-node array itself.
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


def reverse_graph_exploded(edges: DataFrame, *, distinct: bool = True) -> DataFrame:
    """Transposed graph in exploded (node, neighbor) form — the 100 TB-
    safe variant of :func:`reverse_graph`: no per-node array ever
    materializes, so a power-law hub costs many *rows* (spread across
    tasks by the range partitioner), never one giant task.
    """
    e = edges.select(
        F.col("dst").cast("long").alias("node"),
        F.col("src").cast("long").alias("neighbor"),
    )
    if distinct:
        e = e.distinct()
    return e.orderBy("node", "neighbor")


def adjacency_list(edges: DataFrame) -> DataFrame:
    """Forward adjacency build — the reference's format job
    (SingleSourceSP.java:73-129) without its 1-reducer constraint.

    Returns (node, adj ARRAY<STRUCT<dst,weight>> sorted by (dst, weight)).
    Duplicate edges are preserved, as in the reference.

    Edges with a NULL weight are DROPPED (r11 NULL sweep): the B1 text
    grammar is ``dst:weight`` and a weightless edge is malformed input
    — unguarded, concat_ws silently skips the NULL and emits a bare
    ``dst`` token the reference parser (SingleSourceSP.java:224-250)
    would crash on. Twins mirror with ``l_quantity IS NOT NULL``.
    """
    return (
        edges.filter(F.col("weight").isNotNull())
        .groupBy(F.col("src").alias("node"))
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("dst"), F.col("weight")))
            ).alias("adj")
        )
    )
