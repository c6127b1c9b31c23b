"""k-truss decomposition — the EDGE-grained peeling fixpoint, twelfth
in the engine and the edge analog of kcore's vertex peel: the k-truss
is the maximal subgraph in which every edge closes >= k-2 triangles
*within the subgraph*. Communities survive (their edges reinforce each
other); bridges and noise edges peel away — the standard
community-core / spam-edge filter one level stronger than k-core
(every k-truss is inside the (k-1)-core, never vice versa).

Round shape: recompute per-edge support (common-neighbor count) on the
REMAINING edge set — one adjacency build (groupBy collect_list) + two
array joins + a codegen'd array_intersect, the same intersection
discipline as triangles.py — then drop edges under k-2 and cascade.
One count() action per round is both the convergence test and the
materialization barrier. Unlike kcore (whose messages are deltas), the
support must be recomputed per round because removing ONE edge can
break triangles anywhere its endpoints co-occur; the saving grace,
measured at sf0.1: round 1 removes ~90% of edges (1.07M of 1.20M), so
every later round runs on the small survivor core — the work profile
is one triangle-scale pass plus a geometric tail, converging in 2
rounds at sf0.1 / 7 at sf0.01.

At 100 TB: adjacency arrays are per-node (hub-bounded — the
reverse_graph ceiling note applies; a hub-heavy graph would orient
edges by degree first, the triangles.py insurance, at the cost of
splitting each intersection into three oriented probes); the edge
state is hash-partitioned on u once per round and shrinks
geometrically. Checkpoint every ``checkpoint_every`` rounds bounds
lineage (the round plan is two joins deep — shallower than scc's
peel/confirm chain, so sssp-style cadence suffices).

The DuckDB twin unrolls the rounds exactly (graph_queries.
_ktruss_oracle_sql) — support recount per round as MATERIALIZED CTEs —
so this removal fixpoint is fully value-hash-checked, like mis_greedy
and unlike kcore's rows-only row. tests/test_mis.py referees against a
pure-Python synchronous peel.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from .sssp import (
    RoundState,
    _ensure_checkpoint_dir,
    loop_partitions,
    static_rounds,
)


def ktruss(
    edges: DataFrame,
    k: int,
    *,
    max_rounds: int = 16,
    checkpoint_every: int = 2,
) -> DataFrame:
    """k-truss of an undirected graph given as canonical (u < v)
    distinct edges. Returns (u, v, support): the surviving edges with
    their within-truss common-neighbor counts (all >= k-2)."""
    spark = edges.sparkSession
    _ensure_checkpoint_dir(spark)
    n_part = loop_partitions(spark, edges)

    n_doomed = -1
    sup = None
    # r12: RoundState — per-round lineage truncation (local) / the old
    # persist+periodic-checkpoint (cluster); see sssp.py. Both per-round
    # tables get it: cur is referenced three times per round (und's two
    # branches + the support join), sup twice (count + survivor filter).
    rounds_state = RoundState(spark, checkpoint_every)
    # r13 A/B (min-of-3 alternating, sf0.1): broadcasts off in-loop
    # like sssp — Catalyst's size estimate was replacing in-job
    # co-partitioned joins with per-round driver-blocking broadcast
    # builds. Explicit F.broadcast hints are unaffected.
    with static_rounds(spark, parts=n_part, no_broadcast=True):
        cur = edges.select("u", "v").persist(StorageLevel.MEMORY_AND_DISK)
        pending = []  # parent caches pending unpersist (mis.py's device)
        for rnd in range(1, max_rounds + 1):
            und = cur.union(
                cur.select(F.col("v").alias("u"), F.col("u").alias("v"))
            ).repartition(n_part, "u")
            adj = und.groupBy("u").agg(F.collect_list("v").alias("nbrs"))
            sup = (
                cur.join(
                    adj.select(
                        F.col("u").alias("ua"), F.col("nbrs").alias("nbrs_a")
                    ),
                    F.col("u") == F.col("ua"),
                )
                .join(
                    adj.select(
                        F.col("u").alias("ub"), F.col("nbrs").alias("nbrs_b")
                    ),
                    F.col("v") == F.col("ub"),
                )
                .select(
                    "u",
                    "v",
                    F.size(F.array_intersect("nbrs_a", "nbrs_b")).alias(
                        "support"
                    ),
                )
            )
            sup = rounds_state.init(sup)
            # The one action per round: convergence test + barrier —
            # it fills THIS round's sup cache, so only now can the
            # previous round's caches drop (unpersisting them earlier
            # forces the fill to replay lineage back to the last
            # checkpoint — the deferred-unpersist lesson from mis.py).
            n_doomed = sup.filter(F.col("support") < k - 2).count()
            for df in pending:
                rounds_state.release(df)
            pending = []
            if n_doomed == 0:
                rounds_state.release(cur)
                break
            new_cur = sup.filter(F.col("support") >= k - 2).select("u", "v")
            new_cur = rounds_state.advance(new_cur, rnd)
            if rnd % checkpoint_every == 0 and not rounds_state.local:
                # eager checkpoint: child durable, parents can drop now
                rounds_state.release(cur)
                rounds_state.release(sup)
            else:
                pending = [cur, sup]
            cur = new_cur
        else:
            warnings.warn(
                f"ktruss: max_rounds={max_rounds} exhausted with {n_doomed} "
                "edges still peeling; result may contain sub-truss edges",
                RuntimeWarning,
                stacklevel=2,
            )
    return sup.filter(F.col("support") >= k - 2)
