"""Single-source shortest path as a DataFrame fixpoint loop.

Re-expresses the reference's chain of MapReduce jobs
(SingleSourceSP.java:398-519: format job -> iterated relax jobs -> final
job) as one driver-side loop over DataFrames:

* the tagged A/O/U shuffle union (SingleSourceSP.java:157-192) becomes a
  full-outer equi-join between the node-state DataFrame and the per-round
  min-aggregated message DataFrame;
* the frontier gate (``dist != 65535 && adj nonempty && flag == 'Y'``,
  SingleSourceSP.java:179) becomes a filter on the ``updated`` column —
  this delta/frontier optimization is the one algorithmic idea the
  reference hand-codes that Catalyst cannot supply, so it is kept;
* the Hadoop counter convergence test (SingleSourceSP.java:273-281,
  473-481) becomes a deterministic ``count()`` action per round;
* per-round HDFS materialization (SingleSourceSP.java:513-517) becomes
  in-memory persistence with periodic reliable checkpoints to truncate
  lineage (without which the plan grows exponentially with rounds).

Scale notes (100 TB / 1000 executors):

* ``edges`` is hash-partitioned by ``src`` once and persisted; every
  round's relax join then reuses that layout, so only the (small)
  frontier side shuffles each round.
* Parallel edges are pre-reduced to min weight per (src, dst) — identical
  semantics under min-relaxation, strictly fewer shuffle bytes.
* State is persisted per round and the previous round unpersisted; a
  reliable checkpoint every ``checkpoint_every`` rounds bounds both
  lineage depth and DAG-scheduler overhead.
* Skewed high-out-degree vertices are handled by AQE skew-join; the
  message aggregation is a partial-aggregating ``groupBy`` (map-side
  combine), so hot destination nodes do not funnel through one task.

Semantics preserved from the reference (SURVEY.md §2.8):

* unreachable nodes that have out-edges appear with the sentinel
  (65535.0 compat / NULL native); unreachable pure-sink nodes do not
  appear at all (they never receive a message and the format job never
  created a record for them);
* nodes first discovered mid-iteration count as "updated" that round,
  guaranteeing one extra round after any frontier expansion;
* non-negative weights are assumed (the reference silently mis-converges
  on negative cycles; we validate optionally rather than "fix" silently).
"""

from __future__ import annotations

import os
import tempfile
import warnings
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

SENTINEL = 65535.0  # SingleSourceSP.java:54


def loop_partitions(spark: SparkSession, df: DataFrame) -> int:
    """Data-proportional partition count for a fixpoint loop.

    The input's source-file count bounds useful parallelism: at 100 TB
    it far exceeds the cluster's cores and the cores win
    (``defaultParallelism``); at test scale it stops every stage of
    every round from launching a cluster's worth of near-empty tasks
    (measured 1.5-3x end-to-end on the graph suite at sf0.01 — per-round
    task-launch overhead dominates tiny shuffles). Floor of 4 keeps a
    single-file input from serializing the loop.

    ``inputFiles()`` is pure scan metadata — unlike
    ``df.rdd.getNumPartitions()``, it never executes query stages (which
    AQE would do for any derived plan, running the edge-derivation
    pipeline once just to learn its partition count). Local files are
    sized directly (~1 MB of COMPRESSED source per loop partition —
    parquet decompresses ~5-10x and in-loop state is row-expanded, so
    this is deliberately far finer than the 128 MB scan split size;
    measured best 8-16 partitions for the 11 MB sf0.1 edges vs 4 from
    file count); non-local URIs fall back to one partition per file,
    and any failure falls back to ``defaultParallelism``.
    """
    per_part = 1 << 20
    try:
        files = df.inputFiles()
        local = [f.removeprefix("file:") for f in files if f.startswith("file:")]
        if local and len(local) == len(files):
            total = sum(os.path.getsize(f) for f in local)
            data_parts = max(len(files), total // per_part)
        else:
            data_parts = max(len(files), 1)
    except Exception:  # noqa: BLE001 — sizing heuristic, never fatal
        data_parts = spark.sparkContext.defaultParallelism
    return int(max(4, min(spark.sparkContext.defaultParallelism, data_parts)))


@contextmanager
def static_rounds(spark: SparkSession, parts: int | None = None):
    """Disable AQE for the duration of a fixpoint loop, restoring the
    session's prior setting afterwards.

    Inside an iterative loop the per-round plan is IDENTICAL every
    round, so adaptive execution's per-stage re-planning buys nothing
    and costs a fixed re-plan latency per stage per round — measured
    1.5-2.4x end-to-end on the graph suite at sf0.01 (sssp 18.1s ->
    11.7s, wcc 16.7s -> 7.2s, sssp_dag 11.5s -> 4.8s on local[32]).
    The one AQE feature that matters mid-loop at scale — skew-join
    splitting for power-law frontiers — is a property of the graph, not
    the round; on a known-skewed graph, salt the frontier join key
    instead (the skew is the same every round, so a static salt does
    what adaptive splitting would, without the planning tax).

    With AQE off, every per-round shuffle materializes at the raw
    ``spark.sql.shuffle.partitions`` (no runtime coalescing) — a stock
    session's 200 means 200 tasks per stage per round regardless of
    frontier size. The loop therefore also clamps shuffle partitions to
    the cluster's core count for its duration: parallelism is still
    full, but per-round task-scheduling overhead stops scaling with a
    conf that was tuned for one-shot queries.

    The conf flips are session-visible for the loop's duration; queries
    are executed sequentially by every harness this engine targets.
    """
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions", "200")
    n = spark.sparkContext.defaultParallelism
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        clamp = min(int(prev_parts), parts if parts else max(n, 4))
    except ValueError:
        # Some deployments set a non-numeric value (e.g. "auto"); skip
        # the clamp rather than crash before the loop starts.
        clamp = parts
    if clamp is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(clamp))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


def _ensure_checkpoint_dir(spark: SparkSession) -> None:
    """Make reliable checkpoints work on ANY session, not just ours.

    The driver harness calls queries() with its own SparkSession, which has
    no checkpoint dir configured. On a cluster, point SPARK_GRAFT_CKPT_DIR
    at shared storage (HDFS/S3) — executors must be able to write it; the
    tempdir fallback is correct only in local mode, where driver and
    executors share a filesystem.
    """
    sc = spark.sparkContext
    if sc.getCheckpointDir() is None:
        ckpt = os.environ.get("SPARK_GRAFT_CKPT_DIR") or tempfile.mkdtemp(
            prefix="spark-graft-ckpt-"
        )
        sc.setCheckpointDir(ckpt)


def sssp(
    edges: DataFrame,
    source: int,
    *,
    native_nulls: bool = False,
    checkpoint_every: int = 5,
    max_rounds: int = 500,
    validate_weights: bool = False,
) -> DataFrame:
    """Converged shortest-path distances from ``source``.

    Parameters
    ----------
    edges: DataFrame with columns (src, dst, weight). Duplicate edges and
        self-loops are tolerated (min-relaxation).
    source: source node id (SingleSourceSP's ``queryNode``).
    native_nulls: if True, unreachable nodes carry NULL instead of the
        reference's 65535.0 sentinel.
    checkpoint_every: reliable-checkpoint cadence in rounds.

    Returns (source BIGINT, node BIGINT, dist DOUBLE) — one row per node
    with out-edges plus every reachable node (FIXTURES.md B3).
    """
    spark = edges.sparkSession
    _ensure_checkpoint_dir(spark)
    n_part = loop_partitions(spark, edges)

    e = edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
        F.col("weight").cast("double").alias("weight"),
    )
    if validate_weights:
        neg = e.filter(F.col("weight") < 0).limit(1).count()
        if neg:
            raise ValueError("sssp requires non-negative edge weights")

    changed = -1  # defined even if max_rounds < 1 skips the loop body
    # The clamp opens BEFORE the edge/state caches are registered:
    # cached plans compile their exchanges with the conf in force at
    # persist() time and are exempt from AQE coalescing, so on a stock
    # 200-partition session the pre-loop caches would otherwise
    # materialize through 200-task stages in round 1.
    with static_rounds(spark, parts=n_part):
        # Min-combine parallel edges, then fix the partitioning on src
        # so the per-round relax join never re-shuffles the edge side.
        e = (
            e.groupBy("src", "dst")
            .agg(F.min("weight").alias("weight"))
            .repartition(n_part, "src")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )

        # Format job (SingleSourceSP.java:56-129): a state record per
        # node with out-edges; source seeded to 0.0, everything else
        # "infinity" (represented natively as NULL, not a sentinel
        # string) — then pre-relaxed one hop: the source's out-edges are
        # folded in at init (a filter + tiny join on the already
        # src-partitioned edge cache, no extra shuffle), which is
        # exactly round 1's relaxation, so the loop starts one round
        # ahead. Non-negative weights mean the source itself can never
        # improve, so only its neighbors start "updated".
        base = (
            e.select("src")
            .distinct()
            .select(
                F.col("src").alias("node"),
                F.when(F.col("src") == source, F.lit(0.0)).alias("dist"),
            )
        )
        hop1 = e.filter(F.col("src") == source).select(
            F.col("dst").alias("node"), F.col("weight").alias("cand")
        )
        state = (
            base.join(hop1, "node", "full_outer")
            .select(
                "node",
                F.least("dist", "cand").alias("dist"),
                (
                    (F.col("node") != source)
                    & F.col("cand").isNotNull()
                    & F.least("dist", "cand").eqNullSafe(F.col("cand"))
                ).alias("updated"),
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )

        for rnd in range(1, max_rounds + 1):
            # Frontier: only nodes whose distance changed last round emit
            # relaxations (SingleSourceSP.java:179).
            frontier = state.filter(
                F.col("updated") & F.col("dist").isNotNull()
            ).select(F.col("node").alias("f_node"), F.col("dist").alias("f_dist"))
            msgs = frontier.join(e, frontier["f_node"] == e["src"]).select(
                F.col("dst").alias("node"),
                (F.col("f_dist") + F.col("weight")).alias("cand"),
            )
            # Min relaxation with map-side partial aggregation
            # (SingleSourceSP.java:214-250).
            cand = msgs.groupBy("node").agg(F.min("cand").alias("cand"))

            # Tagged-union reduce-side join (SingleSourceSP.java:205-293):
            # full-outer because messages can reach nodes with no state
            # record yet, and state nodes may receive no messages.
            new_state = (
                state.join(cand, "node", "full_outer")
                .select(
                    F.col("node"),
                    F.least("dist", "cand").alias("new_dist"),
                    F.col("dist").alias("old_dist"),
                )
                .select(
                    "node",
                    F.col("new_dist").alias("dist"),
                    # NULL-safe inequality: newly-discovered nodes (old
                    # NULL) count as updated, SingleSourceSP.java:273-281.
                    (~F.col("new_dist").eqNullSafe(F.col("old_dist"))).alias(
                        "updated"
                    ),
                )
            )
            cached = new_state.persist(StorageLevel.MEMORY_AND_DISK)
            if rnd % checkpoint_every == 0:
                # checkpoint() materializes from the cache, then the cached
                # pre-checkpoint copy is dropped so it cannot leak rounds.
                new_state = cached.checkpoint()  # truncate lineage
                cached.unpersist()
            else:
                new_state = cached

            # One count() per round is deliberate: it both decides
            # convergence AND materializes the round. Letting rounds chain
            # lazily (checking every K rounds) was measured to save nothing
            # at K=2 and to blow up driver memory at K=3 — broadcast
            # planning over the unmaterialized multi-round lineage loses
            # its size bounds.
            changed = new_state.filter("updated").count()
            state.unpersist()
            state = new_state
            if changed == 0:
                break
        else:
            warnings.warn(
                f"sssp: max_rounds={max_rounds} exhausted with {changed} nodes "
                "still updating; returned distances may not be converged",
                RuntimeWarning,
                stacklevel=2,
            )
    # The per-round count() actions materialized the final state in cache
    # (or checkpoint); the edge cache is no longer needed.
    e.unpersist()

    # Final job (SingleSourceSP.java:285-288,484-508): project
    # (source, node, dist); sentinel for unreachable in compat mode.
    dist_col = (
        F.col("dist") if native_nulls else F.coalesce("dist", F.lit(SENTINEL))
    )
    out = state.select(
        F.lit(int(source)).cast("long").alias("source"),
        "node",
        dist_col.alias("dist"),
    )
    return out
