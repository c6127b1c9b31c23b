"""Triangle counting with degree-ordered orientation.

Fourth graph-analytics operator next to sssp/wcc/pagerank — the
join-based (non-iterative) family. The reference has no triangle
operator; this extends the §2.8 graph surface the way a user of a
graph engine would expect (clustering-coefficient numerator, community
pre-filters).

Algorithm (Schank-Wagner / "forward" orientation, the standard
distributed formulation used by GraphX and Cohen's MR paper):

1. canonical undirected edges (u < v, distinct);
2. degree of every node;
3. orient every edge from the lexicographically smaller (degree, node)
   endpoint to the larger — each node's *out*-degree is then bounded by
   O(sqrt(m)), so the wedge join below cannot blow up on a hub;
4. wedges: self-join oriented edges on their source, keeping one
   ordered copy of each out-neighbor pair;
5. closure: a wedge (a; b, c) is a triangle iff oriented edge (b, c)
   exists — one more equi-join;
6. per-node counts: explode the three corners, groupBy-count.

At 100 TB: three shuffles (degree agg, wedge join on src, closure join
on (b, c)). Step 3 is the scale insurance — without it a single
celebrity node with degree d contributes d^2 wedges to one task; with
it the worst task is O(m) total wedge work spread by source node.
AQE skew-join splits any residual hot partition.

The DuckDB oracle (graph_queries.py) enumerates the same triangle set
via the canonical a<b<c three-way self-join — orientation changes the
join order, never the result multiset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def canonical_edges(pairs: DataFrame) -> DataFrame:
    """Distinct undirected edges as (u, v) with u < v from any (u, v)
    pair stream (self-loops dropped)."""
    u, v = F.col("u"), F.col("v")
    return (
        pairs.where(u != v)
        .select(F.least(u, v).alias("u"), F.greatest(u, v).alias("v"))
        .distinct()
    )


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle participation counts over canonical (u < v)
    undirected edges. Returns (node, n_tri), nodes in >=1 triangle."""
    deg = (
        edges.select(F.explode(F.array("u", "v")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    du = deg.withColumnRenamed("node", "u").withColumnRenamed("deg", "deg_u")
    dv = deg.withColumnRenamed("node", "v").withColumnRenamed("deg", "deg_v")
    with_deg = edges.join(du, "u").join(dv, "v")
    lower_first = (F.col("deg_u") < F.col("deg_v")) | (
        (F.col("deg_u") == F.col("deg_v")) & (F.col("u") < F.col("v"))
    )
    # Oriented edge src->dst; dst's (degree, id) kept for wedge ordering.
    oriented = with_deg.select(
        F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(lower_first, F.col("deg_v")).otherwise(F.col("deg_u")).alias("ddeg"),
    )
    x = oriented.alias("x")
    y = oriented.alias("y")
    wedges = x.join(y, F.col("x.src") == F.col("y.src")).where(
        (F.col("x.ddeg") < F.col("y.ddeg"))
        | ((F.col("x.ddeg") == F.col("y.ddeg")) & (F.col("x.dst") < F.col("y.dst")))
    ).select(
        F.col("x.src").alias("a"),
        F.col("x.dst").alias("b"),
        F.col("y.dst").alias("c"),
    )
    closing = oriented.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    tris = wedges.join(closing, ["b", "c"])
    return (
        tris.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("n_tri"))
    )
