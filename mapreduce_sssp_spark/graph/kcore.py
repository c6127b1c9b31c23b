"""k-core decomposition by delta peeling — the fourth fixpoint pattern
in the engine, next to sssp (min-relaxation), wcc (label propagation +
pointer jumping) and pagerank (power iteration). Peeling is *monotone
deletion*: each round removes every node whose degree dropped below k,
which decrements neighbors' degrees and may cascade; the k-core is the
(unique, order-independent) fixed point.

Formulation notes — two designs were measured, one blows up:

* **Edge-filter peeling** (re-semi-join the live edge list against
  survivors every round) references the previous round's DataFrame
  THREE times per round, so the logical plan grows ~3^rounds; Catalyst
  re-optimizes the whole tree each action and round 5 at sf0.1 spent
  293 s in planning, data untouched. Caching does not help — persist
  stores data, not plan size.
* **Degree-delta peeling** (this implementation) keeps the edge list
  STATIC (partitioned once, persisted) and iterates only a
  (node, deg, alive) state: doomed nodes send -1 messages along their
  edges, survivors subtract. The state is referenced twice per round
  (sssp's shape), and reliable checkpoints every ``checkpoint_every``
  rounds truncate the lineage — the same discipline as
  sssp.py:114-196, self-sufficient on any session.

Round shape: doomed count (the one action — convergence test AND
materialization), doomed->neighbor decrement messages (join against the
static edges + partial-agg), state update (left join). Message volume
is proportional to the degrees of *removed* nodes only — the delta —
not to the live edge count.

At 100 TB: the static edge list is hash-partitioned on src once and
never re-shuffled; each round shuffles only the decrement messages
(shrinking every round). The doomed set is broadcast (node list, orders
smaller than edges); if a pathological first round dooms too many nodes
for a broadcast, remove the hint and AQE falls back to a shuffle join —
the round shape is unchanged.

No DuckDB oracle: global iterate-until-fixpoint with deletion is not
expressible in DuckDB 1.0's recursive CTEs (same class as ``sssp`` on a
cyclic graph). Driver records rows-only; tests/test_kcore.py
cross-checks against a pure-Python peel on hand-built and randomized
graphs.
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


def kcore(
    edges: DataFrame,
    k: int,
    *,
    max_rounds: int = 100,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Nodes of the k-core of an undirected graph given as canonical
    (u < v) distinct edges; returns (node, core_deg) where core_deg is
    the node's degree inside the k-core (>= k by definition)."""
    spark = edges.sparkSession
    _ensure_checkpoint_dir(spark)
    n_part = loop_partitions(spark, edges)

    n_doomed = -1
    # Clamp opens before the caches are registered: cached plans compile
    # their exchanges with the conf at persist() time and AQE cannot
    # coalesce them (full note in sssp.py).
    # r13 A/B (min-of-3 alternating, sf0.1): broadcasts off in-loop
    # like sssp — Catalyst's size estimate was replacing in-job
    # co-partitioned joins with per-round driver-blocking broadcast
    # builds. Explicit F.broadcast hints are unaffected.
    with static_rounds(spark, parts=n_part, no_broadcast=True):
        # Both directions so every edge is visible from each endpoint;
        # partitioned once on u (the message-join key), never
        # re-shuffled.
        und = (
            edges.select("u", "v")
            .union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
            .repartition(n_part, "u")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        # r12: RoundState — per-round lineage truncation (local) / the
        # old persist+periodic-checkpoint (cluster); see sssp.py.
        rounds_state = RoundState(spark, checkpoint_every)
        state = rounds_state.init(
            und.groupBy("u")
            .agg(F.count("*").alias("deg"))
            .select(F.col("u").alias("node"), "deg", F.lit(True).alias("alive"))
        )

        prev_state = None  # parent cache pending unpersist (mis.py's device)
        for rnd in range(1, max_rounds + 1):
            doomed = state.filter(F.col("alive") & (F.col("deg") < k)).select(
                "node"
            )
            # The one action per round: materializes state AND tests the
            # fixed point. Only after it fills this round's cache can
            # the parent drop — unpersisting earlier forces the fill to
            # replay lineage back to the last checkpoint (the deferred-
            # unpersist lesson from mis.py, measured ~2x on its loop).
            n_doomed = doomed.count()
            if prev_state is not None:
                rounds_state.release(prev_state)
                prev_state = None
            if n_doomed == 0:
                break
            msgs = (
                und.join(F.broadcast(doomed.withColumnRenamed("node", "u")), "u")
                .groupBy("v")
                .agg(F.count("*").alias("dec"))
                .select(F.col("v").alias("node"), "dec")
            )
            new_state = state.join(msgs, "node", "left").select(
                "node",
                (F.col("deg") - F.coalesce("dec", F.lit(0))).alias("deg"),
                # alive judged on the OLD degree: this round's doomed die,
                # survivors carry the decremented degree into next round.
                (F.col("alive") & (F.col("deg") >= k)).alias("alive"),
            )
            new_state = rounds_state.advance(new_state, rnd)
            if rnd % checkpoint_every == 0 and not rounds_state.local:
                # eager checkpoint already materialized: parent drops now
                rounds_state.release(state)
            else:
                prev_state = state  # drop only after the child's fill
            state = new_state
        else:
            warnings.warn(
                f"kcore: max_rounds={max_rounds} exhausted with {n_doomed} nodes "
                "still peeling; returned core may contain sub-k nodes",
                RuntimeWarning,
                stacklevel=2,
            )
    out = state.filter("alive").select("node", F.col("deg").alias("core_deg"))
    und.unpersist()
    return out
