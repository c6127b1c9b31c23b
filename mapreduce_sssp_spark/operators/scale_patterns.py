"""Scale-pattern operators: the shuffle-shaping techniques a 100 TB
deployment leans on, expressed as verifiable queries rather than lore.

* ``skew_salted_agg`` — explicit two-stage (salted) aggregation: stage 1
  aggregates on (key, salt) spreading a hot key over N reducers, stage 2
  merges the partials. Result is bit-identical to a plain GROUP BY (the
  oracle), because counts/decimal-sums are associative — which is
  exactly why the technique is safe to deploy.
* ``range_join_bands`` — non-equi (range) join of facts to interval
  dims: the small band table is broadcast so the range predicate is
  evaluated map-side (BroadcastNestedLoopJoin over 4 rows), never a
  shuffle-side theta join.
* ``approx_distinct`` — HyperLogLog++ ``approx_count_distinct`` next to
  the exact count. Sketches differ across engines, so no SQL oracle
  (rows-only); pytest pins the relative error instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..contracts import finite
from ..io.sources import load_table

N_SALT = 16

# part.p_retailprice spans [900, 1000) in the testdata
PRICE_BANDS = [
    ("budget", 0.0, 925.0),
    ("mid", 925.0, 950.0),
    ("premium", 950.0, 975.0),
    ("luxury", 975.0, 1e9),
]


def salted_agg(
    df: DataFrame, key: str, measures_partial, measures_final, n_salt: int = N_SALT
) -> DataFrame:
    """Generic two-stage salted aggregation scaffold."""
    salted = df.withColumn("_salt", F.pmod(F.monotonically_increasing_id(), n_salt))
    partial = salted.groupBy(key, "_salt").agg(*measures_partial)
    return partial.groupBy(key).agg(*measures_final)


def q_skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type totals via explicit salting (5 hot keys x 10k rows
    would otherwise funnel 5 reducers; salting spreads each key 16-way)."""
    # Finite-measure contract (r12 non-finite probe); twin mirrors.
    ev = load_table(spark, sf_dir, "events").filter(finite("value"))
    return salted_agg(
        ev,
        "event_type",
        measures_partial=[
            F.count("*").alias("pn"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("pv"),
        ],
        measures_final=[
            F.sum("pn").alias("n"),
            F.sum("pv").cast("double").alias("sum_value"),
        ],
    )


def q_range_join_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts joined to price bands by range predicate (broadcast side).

    The band dim is built as a constant-folded VALUES plan (LocalRelation),
    not ``spark.createDataFrame`` — the latter routes through
    applySchemaToPythonRDD and spins up a Python worker for a 4-row literal
    table, which showed up as ~2s of pure overhead in the bench.
    """
    part = load_table(spark, sf_dir, "part")
    values = ", ".join(
        f"('{b}', CAST({lo} AS DOUBLE), CAST({hi} AS DOUBLE))"
        for b, lo, hi in PRICE_BANDS
    )
    bands = spark.sql(f"SELECT * FROM VALUES {values} AS t(band, lo, hi)")
    return (
        part.join(
            F.broadcast(bands),
            (part.p_retailprice >= bands.lo) & (part.p_retailprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_parts"),
            F.min("p_retailprice").alias("min_price"),
            F.max("p_retailprice").alias("max_price"),
        )
    )


def q_join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted shuffle JOIN — the companion to ``skew_salted_agg`` for the
    case the hot key sits on a JOIN, not a GROUP BY, and the dim side is
    too large to broadcast: the fact side gets a content-derived salt in
    [0, N), the dim side is replicated N ways (an exact N-row multiply of
    the SMALL side only), and the equi-join runs on (key, salt) — so a
    key that would funnel one reducer now spreads over N. The join is
    forced to a shuffle hash join (``hint("shuffle_hash")``) precisely
    because a broadcast would make the demonstration vacuous.

    The salt is xxhash64 of the fact row's identity columns — any
    deterministic bucket works because the salt NEVER reaches the
    output: after the join the per-supplier rollup merges the N
    sub-streams, and the result is bit-identical to the plain join
    (the oracle), counts and int64 cents being associative. That
    bit-equality is the safety proof that makes the technique
    deployable; AQE's skew-join split does this adaptively, the static
    salt is the insurance for the pathological key you already know.
    """
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    fact = li.select(
        "l_suppkey",
        F.expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
        .alias("cents"),
        F.pmod(
            F.xxhash64("l_orderkey", "l_linenumber", "l_partkey"), F.lit(N_SALT)
        ).alias("_salt"),
    )
    dim = sup.select("s_suppkey", "s_name").crossJoin(
        spark.range(N_SALT).select(F.col("id").alias("_salt"))
    )
    joined = fact.join(
        dim.hint("shuffle_hash"),
        (fact.l_suppkey == dim.s_suppkey) & (fact._salt == dim._salt),
    )
    return joined.groupBy("s_suppkey", "s_name").agg(
        F.count("*").alias("n_items"),
        F.sum("cents").alias("revenue_cents"),
    )


def q_join_null_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-key skew bypass on an outer join — the single most common
    real-world skew: a nullable foreign key (here 1/3 of lineitem rows,
    simulating unmatched/late-arriving references) can never match, yet
    a naive LEFT JOIN still ships every null row through the shuffle,
    where they all hash to ONE reducer. The pattern: split the fact on
    key nullability, join ONLY the matchable branch, union the null
    branch back with null-extended dim columns — null rows never enter
    the join exchange at all.

    Result is bit-identical to the plain left join (nulls match nothing
    either way — the safety proof), verified by the oracle; the plan
    shape (one join under a Union) is pinned in test_plans. Output
    rolls up per brand with the null branch surfacing as 'UNMATCHED'.
    """
    # Finite-measure contract (r12 non-finite probe); twin mirrors.
    li = load_table(spark, sf_dir, "lineitem").filter(
        finite("l_extendedprice")
    )
    fact = li.select(
        F.when(F.col("l_partkey") % 3 == 0, F.lit(None))
        .otherwise(F.col("l_partkey"))
        .alias("key"),
        F.expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
        .alias("cents"),
    )
    dim = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("key"), "p_brand"
    )
    matchable = fact.filter(F.col("key").isNotNull()).join(
        dim, "key", "left"
    )
    nulls = fact.filter(F.col("key").isNull()).withColumn(
        "p_brand", F.lit(None).cast("string")
    )
    return (
        matchable.unionByName(nulls)
        .groupBy(F.coalesce("p_brand", F.lit("UNMATCHED")).alias("brand"))
        .agg(F.count("*").alias("n"), F.sum("cents").alias("sum_cents"))
    )


BAND_DAYS = 7


def q_interval_self_join_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Big-big temporal self-join via BAND DECOMPOSITION — the pattern
    for "pairs within a time window" when BOTH sides are fact-sized
    (reorder detection, burst analysis, dedup-within-window) and
    neither broadcasts: each order maps to a 7-day band; one side
    explodes to its band ±1 (a 3x replication of one side — the entire
    cost, stated up front); pairs meet through a plain EQUI-join on
    (customer, band) — never a shuffle theta-join — and one exact
    |gap| <= 7d refinement drops the band-edge false candidates.
    Every qualifying pair meets exactly once: bands of two dates within
    7 days differ by at most 1, so exactly one of the three emitted
    bands equals the partner's.

    Output is the per-customer reorder report (pair count, max gap —
    exact ints); the oracle is the naive inequality join, which DuckDB
    executes as an IEJoin — an independent algorithm agreeing on the
    result is the strongest check a rewrite like this can get.
    """
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("cust"),
        F.col("o_orderkey").alias("key"),
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
        .alias("day"),
    )
    left = o.select(
        "cust",
        F.col("key").alias("key_a"),
        F.col("day").alias("day_a"),
        F.explode(
            F.array(
                F.expr(f"CAST(day DIV {BAND_DAYS} AS BIGINT) - 1"),
                F.expr(f"CAST(day DIV {BAND_DAYS} AS BIGINT)"),
                F.expr(f"CAST(day DIV {BAND_DAYS} AS BIGINT) + 1"),
            )
        ).alias("band"),
    )
    right = o.select(
        "cust",
        F.col("key").alias("key_b"),
        F.col("day").alias("day_b"),
        F.expr(f"CAST(day DIV {BAND_DAYS} AS BIGINT)").alias("band"),
    )
    pairs = (
        left.join(right, ["cust", "band"])
        .filter(
            (F.col("key_a") < F.col("key_b"))
            & (F.abs(F.col("day_a") - F.col("day_b")) <= BAND_DAYS)
        )
        .select(
            "cust",
            "key_a",
            "key_b",
            F.abs(F.col("day_a") - F.col("day_b")).cast("long").alias("gap"),
        )
    )
    return pairs.groupBy("cust").agg(
        F.count("*").alias("n_pairs"),
        F.max("gap").alias("max_gap_days"),
        F.min("gap").alias("min_gap_days"),
    )


def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct counts — the IRREDUCIBLE rows-only
    residue of the approx-distinct pair: the estimate is a function of
    the engine's private HLL++ register layout and hash function, so no
    cross-engine hash oracle can exist (DuckDB's approx_count_distinct
    uses a different sketch and returns a different, equally valid,
    estimate). Everything deterministic about this computation — group
    keys, exact counts, and whether the estimate honors its error
    envelope — is hash-verified by the sibling
    ``approx_distinct_verified``; tests/test_scale_patterns.py::
    test_approx_distinct_error_bound additionally pins the numeric
    envelope.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
    )


def q_approx_distinct_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hash-checkable half of ``approx_distinct``: group keys and
    exact distinct counts (plain cross-engine SQL) plus
    ``est_in_envelope`` — whether the engine's HLL++ estimate lands
    within 10% + 5 of exact. The oracle asserts TRUE as the expected
    value, so a sketch-accuracy regression fails the driver hash even
    though the raw estimate itself stays engine-private (HLL++ default
    rsd is 5%; the doubled envelope keeps the boolean deterministic-true
    at any SF while still catching a broken sketch, which is off by
    orders of magnitude, not percent).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey").alias("approx_parts"),
            F.countDistinct("l_partkey").alias("exact_parts"),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            (
                F.abs(F.col("approx_parts") - F.col("exact_parts"))
                <= 0.10 * F.col("exact_parts") + 5
            ).alias("est_in_envelope"),
        )
    )


def q_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greenwald-Khanna approximate quantiles next to exact bounds
    (deliberately rows-only: a hash oracle cannot exist because the GK
    sketch's compaction schedule is engine-private, so DuckDB's
    approx_quantile returns a different equally-valid estimate; the
    min/max columns pin the sketch outputs inside the data range, and
    tests/test_scale_patterns.py::test_approx_quantiles_error_bound
    holds the quartiles within 1% of exact; everything deterministic —
    keys, min/max/count, and whether each quartile estimate honors its
    error envelope — is hash-verified by the sibling
    ``approx_quantiles_verified``).

    At 100 TB this is THE way to get percentiles: the GK sketch is a
    bounded-size mergeable summary (one per partition, merged on the
    driver side of the agg) — no global sort, no full materialization.

    The three quartiles are projected to scalar q1/median/q3 columns
    (mirroring ``q_group_percentiles``) rather than shipped as one
    ArrayType column: the driver's rows-only canonicalizer sorts rows
    with pandas and dies on unhashable list cells.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile_approx(
                "l_extendedprice", [0.25, 0.5, 0.75], 10_000
            ).alias("ps"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
        )
        .select(
            "l_returnflag",
            F.col("ps")[0].alias("approx_q1"),
            F.col("ps")[1].alias("approx_median"),
            F.col("ps")[2].alias("approx_q3"),
            "min_price",
            "max_price",
        )
    )


def q_approx_quantiles_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hash-checkable half of ``approx_quantiles`` (the exact device
    of ``approx_distinct_verified`` / ``sketch_merge_verified``): group
    keys, exact min/max/count (plain cross-engine SQL), and one boolean
    per quartile — whether the GK estimate's exact RANK window overlaps
    the guaranteed window [(p-eps)n, (p+eps)n] (eps = 1/accuracy).  The
    oracle asserts TRUE as the expected value, so a sketch-accuracy
    regression fails the driver hash while the engine-private GK
    compaction stays out of the comparison.

    Rank-based, NOT value-based (r11 adversarial finding): GK's
    guarantee is a RANK error bound; a 2%-of-value envelope against the
    interpolated exact percentile is violated by a CORRECT sketch on a
    distribution with sparse value regions (a 444-row group mixing
    -100k returns with +100k sales put adjacent order statistics
    thousands of dollars apart — the estimate was one rank off and
    miles off in value).  The rank check is the actual contract and is
    deterministic-true on ANY data: with duplicates, the estimate's
    rank span is [count(<est)+1, count(<=est)], which must intersect
    the window (a +/-1 slack absorbs floor/double edges).

    Second pass joins the 3-row estimate table back to count ranks —
    the verification twin only; the production percentile path at
    100 TB remains the single-pass mergeable GK sketch in
    ``approx_quantiles``.
    """
    # Required-column rail (r11 NULL sweep; twin mirrors the WHERE).
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isNotNull()
        & F.col("l_extendedprice").isNotNull()
    ).select("l_returnflag", "l_extendedprice")
    qs = li.groupBy("l_returnflag").agg(
        F.percentile_approx(
            "l_extendedprice", [0.25, 0.5, 0.75], 10_000
        ).alias("aps"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.count("*").alias("n_rows"),
    )
    j = li.join(F.broadcast(qs), "l_returnflag")
    ranks = j.groupBy("l_returnflag").agg(
        *[
            F.sum(
                F.when(F.col("l_extendedprice") <= F.col("aps")[i], 1)
                .otherwise(0)
            ).alias(f"le{i}")
            for i in range(3)
        ],
        *[
            F.sum(
                F.when(F.col("l_extendedprice") < F.col("aps")[i], 1)
                .otherwise(0)
            ).alias(f"lt{i}")
            for i in range(3)
        ],
    )
    out = qs.join(ranks, "l_returnflag")
    eps = 1.0 / 10_000

    def in_env(i: int, p: float):
        n = F.col("n_rows").cast("double")
        return (
            (F.col(f"le{i}").cast("double") >= (p - eps) * n - 1.0)
            & (F.col(f"lt{i}").cast("double") <= (p + eps) * n + 1.0)
        ).alias(["q1", "median", "q3"][i] + "_in_envelope")

    return out.select(
        "l_returnflag", "min_price", "max_price", "n_rows",
        in_env(0, 0.25), in_env(1, 0.5), in_env(2, 0.75),
    )


def q_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch re-aggregation (Apache DataSketches HLL, Spark 4):
    build per-(returnflag, linestatus) distinct-part sketches, then
    hll_union_agg them up to per-returnflag estimates, next to the
    direct estimate and the exact count.

    Mergeability is THE sketch property that matters at 100 TB: daily
    (or per-partition) sketches persist as tiny binaries and any rollup
    — week, month, ad-hoc cohort — is a union of sketches, never a
    rescan of the fact. The union estimate must track the direct
    estimate over the same rows (equal in sparse mode, within combined
    rsd in dense mode), which this query exposes side-by-side. The IRREDUCIBLE rows-only residue of the sketch-merge
    pair: DataSketches HLL binaries and estimates are engine-specific,
    so no cross-engine hash oracle can exist for the raw estimates; the
    deterministic facts (keys, exact counts, union==direct, error
    envelope) are hash-verified by the sibling
    ``sketch_merge_verified``, and the numeric envelope is additionally
    pinned in tests/test_scale_patterns.py::
    test_sketch_merge_union_equals_direct_and_bounds_error.
    """
    return _sketch_merge_frame(spark, sf_dir).select(
        "l_returnflag", "merged", "direct"
    )


def _sketch_merge_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Required-column rail (r11 NULL sweep; twin mirrors the WHERE).
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isNotNull()
        & F.col("l_linestatus").isNotNull()
        & F.col("l_partkey").isNotNull()
    )
    partials = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.expr("hll_sketch_agg(l_partkey, 12)").alias("sk")
    )
    return (
        partials.groupBy("l_returnflag")
        .agg(
            F.expr("hll_sketch_estimate(hll_union_agg(sk, false))").alias("merged")
        )
        .join(
            li.groupBy("l_returnflag").agg(
                F.expr("hll_sketch_estimate(hll_sketch_agg(l_partkey, 12))").alias(
                    "direct"
                ),
                F.countDistinct("l_partkey").alias("exact"),
            ),
            "l_returnflag",
        )
    )


def q_sketch_merge_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hash-checkable half of ``sketch_merge``: group keys + exact
    distinct counts, plus two engine-invariant booleans the oracle
    asserts as TRUE expected values — ``union_tracks_direct`` (the
    union-of-partials estimate within 4% + 5 of the direct sketch over
    the same rows: the mergeability contract; exact equality only holds
    while both sketches are in sparse mode — in dense estimation mode
    the union's register merge legitimately drifts within combined rsd,
    e.g. 1991 vs 1999 on 2000 distinct at sf0.01) and
    ``merged_in_envelope`` (estimate within 10% + 5 of exact; lgK=12
    gives ~1.6% rsd, so the envelope is deterministic-true while a
    broken sketch — off by orders of magnitude — still fails the hash).
    """
    return _sketch_merge_frame(spark, sf_dir).select(
        "l_returnflag",
        "exact",
        (
            F.abs(F.col("merged") - F.col("direct"))
            <= 0.04 * F.col("direct") + 5
        ).alias("union_tracks_direct"),
        (
            F.abs(F.col("merged") - F.col("exact"))
            <= 0.10 * F.col("exact") + 5
        ).alias("merged_in_envelope"),
    )


def q_approx_topk_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via ``approx_top_k`` (Spark 4 frequent-items
    sketch), exploded to (item, est) rows.

    Sketch regime note: with maxItemsTracked >= the true distinct count
    the sketch degenerates to exact counting — which is what makes this
    query HASH-checkable against a plain GROUP BY oracle. At 100 TB
    vocabulary scale (distinct >> maxItemsTracked) the same plan returns
    approximate counts in bounded memory; the exact regime here proves
    plumbing and determinism, the pytest in test_scale_patterns pins the
    estimates against exact counts.
    """
    ev = load_table(spark, sf_dir, "events")
    # k far above the expected cardinality: the exactness argument rests
    # on maxItemsTracked, and k == cardinality would silently truncate
    # the result if the data ever grew a new item.
    sk = ev.agg(F.expr("approx_top_k(event_type, 100, 10000)").alias("top"))
    return sk.select(F.explode("top").alias("e")).select(
        F.col("e.item").alias("item"), F.col("e.count").alias("est")
    )


GLOBAL_ID_SHARDS = 16


def q_global_row_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous global row numbering WITHOUT a global sort — the
    two-pass pattern for assigning stable ids at 100 TB.

    ``row_number() OVER (ORDER BY k)`` range-partitions into ONE
    partition at the window: a serialization point that cannot scale.
    Instead: shard uniformly, rank within each shard (parallel), compute
    per-shard counts (a tiny agg), turn them into cumulative offsets
    (window over #shards rows — driver-scale, not data-scale), and add.
    The resulting id is dense and contiguous in (shard, doc_id) order —
    a total order both engines reproduce exactly, so the query
    hash-checks against DuckDB's single ROW_NUMBER formulation.
    """
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    sharded = docs.select(
        (F.col("doc_id") % GLOBAL_ID_SHARDS).alias("shard"), "doc_id"
    )
    w_in = Window.partitionBy("shard").orderBy("doc_id")
    ranked = sharded.withColumn("in_rank", F.row_number().over(w_in))
    counts = sharded.groupBy("shard").agg(F.count("*").alias("n"))
    w_off = (
        Window.orderBy("shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "shard", F.coalesce(F.sum("n").over(w_off), F.lit(0)).alias("offset")
    )
    return ranked.join(F.broadcast(offsets), "shard").select(
        "doc_id",
        "shard",
        (F.col("offset") + F.col("in_rank")).alias("global_id"),
    )


def q_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-degree histogram of the B1 graph — the first diagnostic run
    on any production graph (it decides the skew strategy: salting,
    orientation, broadcast thresholds). Two cheap aggregations, both
    map-side partial."""
    from ..io.sources import edges_from_lineitem

    e = edges_from_lineitem(spark, sf_dir)
    deg = e.groupBy("src").agg(F.count("*").alias("degree"))
    return deg.groupBy("degree").agg(F.count("*").alias("n_nodes"))


def q_fuzzy_match_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution by blocking, on the DISTINCT-value domain: each
    part's nearest fuzzy name (Levenshtein) among OTHER distinct names
    sharing its blocking key (first name word) — (key_a, match_name,
    dist).

    Two stacked 100 TB patterns:

    * **blocking** — all-pairs matching is O(n^2) and dead on arrival;
      an equi-join on a cheap key bounds the quadratic work per block
      (the LSH-banding reasoning); and
    * **distinct-domain matching** — real catalogs repeat strings
      massively (here 20k parts share 64 names at sf0.1), so the
      quadratic stage runs on the distinct-name table (Zipf-small, the
      BPE-vocab trick: 50s -> ~1s at sf0.1) and per-row results come
      from a cheap join-back on name.

    Deterministic: Levenshtein is an exact integer metric and ties
    break on the lexicographically smallest candidate name, so the
    driver hash is exact. CONTRACT (r11 — was a caveat until the wave-2
    adversarial sweep hit it): Spark's levenshtein counts CHARACTERS
    while DuckDB's counts BYTES ('naïve' vs 'naive' is 1 in Spark, 2 in
    DuckDB; 'ウィジェット 大' vs '... 小' is 1 vs 6), so the match
    domain is ASCII names, ENFORCED in-plan in both engines (the
    ascii-only filter below + its twin mirror) — non-ASCII names are
    excluded from matching identically on both sides, the same
    caveat-to-contract move as the r10 LSH bucket cap. Matching a
    unicode catalog would need a byte-normalized distance key.
    """
    parts = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("key"), F.col("p_name").alias("name")
    )
    return fuzzy_nearest(parts)


def fuzzy_nearest(records: DataFrame) -> DataFrame:
    """See q_fuzzy_match_parts. records needs (key, name); the blocking
    key is the first whitespace-delimited name word."""
    from pyspark.sql import Window

    names = (
        records.select("name")
        .distinct()
        # ASCII match domain (see q_fuzzy_match_parts contract note):
        # levenshtein semantics diverge between engines off-ASCII.
        .filter(F.col("name").rlike("^[\\x00-\\x7F]*$"))
        .withColumn("block", F.substring_index("name", " ", 1))
    )
    a = names.select("block", F.col("name").alias("name_a"))
    b = names.select("block", F.col("name").alias("name_b"))
    pairs = (
        a.join(b, "block")
        .filter(F.col("name_a") != F.col("name_b"))
        .select("name_a", "name_b", F.levenshtein("name_a", "name_b").alias("dist"))
    )
    w = Window.partitionBy("name_a").orderBy("dist", "name_b")
    best = (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            F.col("name_a").alias("name"),
            F.col("name_b").alias("match_name"),
            "dist",
        )
    )
    return records.join(F.broadcast(best), "name").select(
        F.col("key").alias("key_a"), "match_name", "dist"
    )


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew diagnosis: the 20 heaviest part keys in lineitem with their
    row count, share of all rows, and cumulative share — the report
    that tells you whether a key needs salting BEFORE the join melts a
    task (companion to skew_salted_agg, which is the mitigation).

    Partial-aggregated counts, then orderBy().limit(20) = per-partition
    TakeOrdered + 20-row driver merge — never a global sort. The
    cumulative window runs on the 20 surviving rows (single tiny
    partition by construction). Shares are int/int double divisions on
    exact counts; ordering ties break on the key, so the cut and the
    running sum are deterministic in both engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_partkey").agg(F.count("*").alias("n"))
    total = counts.agg(F.sum("n").alias("n_total"))
    top = counts.orderBy(F.desc("n"), "l_partkey").limit(20)
    w = (
        Window.orderBy(F.desc("n"), "l_partkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            "l_partkey",
            "n",
            F.sum("n").over(w).alias("cum_n"),
            "n_total",
            (F.col("n").cast("double") / F.col("n_total").cast("double")).alias(
                "share"
            ),
        )
        .withColumn(
            "cum_share",
            F.col("cum_n").cast("double") / F.col("n_total").cast("double"),
        )
    )


KMV_K = 64


def q_kmv_set_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values sketch set-INTERSECTION estimation between
    event-type audiences — the order-statistics sketch family next to
    HLL (approx_distinct) and GK (approx_quantiles), and the one whose
    estimate is a PURE FUNCTION of a portable hash, so unlike the HLL
    register blob it hash-checks across engines exactly. For every
    ordered pair of event types: the KMV Jaccard estimate (share of
    the union's K smallest hashes present in both sets) next to the
    EXACT Jaccard — each row self-reports its sketch error, the
    approx_distinct_verified posture without a second query.

    Hash = first 15 hex chars of md5(user_id) as a 60-bit int (the
    portable-hash device of dedup_simhash/feature_hash). At 100 TB:
    per-type K-min sets are K rows each after one distinct
    (type, hash) aggregate — the pair stage joins 10 x 2K rows, nothing
    corpus-sized; the exact-Jaccard half is the expensive one (a
    distinct-pair self-join) and exists to verify the sketch, which is
    the half a production pipeline would drop.
    """
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    hashed = ev.select(
        "event_type",
        F.expr(
            "CAST(conv(substr(md5(CAST(user_id AS STRING)), 1, 15), 16, 10)"
            " AS BIGINT)"
        ).alias("h"),
        "user_id",
    ).distinct()
    w = Window.partitionBy("event_type").orderBy("h")
    kmv = (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KMV_K)
        .select("event_type", "h")
    )
    ka = kmv.select(F.col("event_type").alias("type_a"), "h")
    kb = kmv.select(F.col("event_type").alias("type_b"), "h")
    merged = ka.crossJoin(kb.select("type_b").distinct()).select(
        "type_a", "type_b", "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b")
    ).unionByName(
        kb.crossJoin(ka.select("type_a").distinct()).select(
            "type_a",
            "type_b",
            "h",
            F.lit(0).alias("in_a"),
            F.lit(1).alias("in_b"),
        )
    )
    union_kmv = (
        merged.filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    w2 = Window.partitionBy("type_a", "type_b").orderBy("h")
    est = (
        union_kmv.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= KMV_K)
        .groupBy("type_a", "type_b")
        .agg(
            F.sum(F.col("in_a") * F.col("in_b")).alias("n_both"),
            F.count("*").alias("k_used"),
        )
        .select(
            "type_a",
            "type_b",
            "n_both",
            (
                F.col("n_both").cast("double") / F.col("k_used").cast("double")
            ).alias("est_jaccard"),
        )
    )
    users = ev.distinct()
    sizes = users.groupBy("event_type").agg(F.count("*").alias("n"))
    inter = (
        users.select(F.col("event_type").alias("type_a"), "user_id")
        .join(
            users.select(F.col("event_type").alias("type_b"), "user_id"),
            "user_id",
        )
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n_inter"))
    )
    exact = (
        inter.join(
            sizes.select(F.col("event_type").alias("type_a"), F.col("n").alias("na")),
            "type_a",
        )
        .join(
            sizes.select(F.col("event_type").alias("type_b"), F.col("n").alias("nb")),
            "type_b",
        )
        .select(
            "type_a",
            "type_b",
            (
                F.col("n_inter").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_inter")).cast("double")
            ).alias("exact_jaccard"),
        )
    )
    return est.join(exact, ["type_a", "type_b"]).select(
        "type_a", "type_b", "n_both", "est_jaccard", "exact_jaccard"
    )


BLOOM_BITS = 1024  # 16 words x 64 bits — sized so the FP ledger is non-trivial
BLOOM_HASHES = 3
_BLOOM_KEY = "bloom:"


def _bloom_positions(key_expr: str) -> list:
    """The k bit positions of a key: independent md5 draws (salted by
    hash index), each reduced mod BLOOM_BITS — identical SQL arithmetic in
    both engines. Returns [(word_expr, bit_expr), ...] as SQL strings.
    """
    out = []
    for h in range(BLOOM_HASHES):
        pos = (
            f"(CAST(conv(substring(md5(concat('{_BLOOM_KEY}', '{h}:',"
            f" CAST({key_expr} AS STRING))), 1, 15), 16, 10) AS BIGINT)"
            f" % {BLOOM_BITS})"
        )
        out.append((f"({pos} DIV 64)", f"({pos} % 64)"))
    return out


def q_bloom_prune_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter join pruning, end to end and exactly accounted:
    build a 1024-bit / 3-hash bloom over the customers in nation 0
    (the build side of a selective semi join), probe every order
    against it map-side, and report the pruning ledger — build keys,
    probes, bloom candidates, true matches, and the realized
    false-positive count/rate. The device behind runtime row-group
    skipping and pre-shuffle semi-join reduction: at 100 TB the probe
    is a BROADCAST of 64 longs evaluated in the scan stage, so the
    shuffle carries candidates (true + FP) instead of the corpus.

    Portability: bit positions are md5 draws mod 4096 (the sampling
    family's device) and the filter words are bit_or aggregates —
    exact int64 end to end; both engines compute the identical filter,
    probe decisions, and counts, so even the false positives match
    bit-for-bit. The membership test ANDs each probe word against the
    (sparse-safe, coalesce-0) filter word.
    """
    cust = load_table(spark, sf_dir, "customer").filter(
        F.expr("c_custkey % 25 = 0")  # a selective build side (~4%)
    )
    build_pos = _bloom_positions("c_custkey")
    word_rows = []
    for w_expr, b_expr in build_pos:
        word_rows.append(
            cust.select(
                F.expr(w_expr).alias("word"),
                F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({b_expr} AS INT))").alias(
                    "bits"
                ),
            )
        )
    words = word_rows[0]
    for wdf in word_rows[1:]:
        words = words.union(wdf)
    bloom = words.groupBy("word").agg(
        F.expr("bit_or(bits)").alias("bits")
    )
    probe_pos = _bloom_positions("o_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    probed = o
    for i, (w_expr, b_expr) in enumerate(probe_pos):
        bw = bloom.select(
            F.col("word").alias(f"w{i}"), F.col("bits").alias(f"bits{i}")
        )
        probed = probed.join(
            F.broadcast(bw), F.expr(w_expr) == F.col(f"w{i}"), "left"
        ).withColumn(
            f"hit{i}",
            (
                F.expr(
                    f"coalesce(bits{i}, CAST(0 AS BIGINT))"
                    f" & shiftleft(CAST(1 AS BIGINT), CAST({b_expr} AS INT))"
                )
                != 0
            ).cast("int"),
        )
    candidates = probed.withColumn(
        "is_candidate",
        (F.col("hit0") + F.col("hit1") + F.col("hit2") == BLOOM_HASHES).cast(
            "int"
        ),
    ).withColumn("is_true", F.expr("CAST(o_custkey % 25 = 0 AS INT)"))
    n_keys = cust.count()
    return (
        candidates.agg(
            F.count("*").alias("n_probes"),
            F.sum("is_candidate").alias("n_candidates"),
            F.sum("is_true").alias("n_true"),
            F.sum(
                ((F.col("is_candidate") == 1) & (F.col("is_true") == 0)).cast(
                    "long"
                )
            ).alias("n_false_pos"),
        )
        .withColumn("n_build_keys", F.lit(int(n_keys)).cast("long"))
        .select(
            "n_build_keys",
            "n_probes",
            "n_candidates",
            "n_true",
            "n_false_pos",
            # NULL (not 0/0 -> ANSI crash) when every probe is a true
            # match: the FP rate is undefined with no negative probes.
            F.when(
                F.col("n_probes") > F.col("n_true"),
                F.col("n_false_pos").cast("double")
                / (F.col("n_probes") - F.col("n_true")).cast("double"),
            ).alias("fp_rate"),
        )
    )


def _bloom_duck_positions(key_expr: str) -> list:
    out = []
    for h in range(BLOOM_HASHES):
        pos = (
            f"(CAST(('0x' || substr(md5('{_BLOOM_KEY}' || '{h}:'"
            f" || CAST({key_expr} AS VARCHAR)), 1, 15)) AS BIGINT)"
            f" % {BLOOM_BITS})"
        )
        out.append((f"({pos} // 64)", f"({pos} % 64)"))
    return out


def _bloom_oracle_sql() -> str:
    b = _bloom_duck_positions("c_custkey")
    p = _bloom_duck_positions("o_custkey")
    # HUGEINT words: DuckDB raises on BIGINT 1<<63 (Spark's long wraps
    # into the sign bit — each engine is internally consistent, and only
    # membership DECISIONS cross engines, via the identical positions).
    unions = "\nUNION ALL\n".join(
        f"SELECT {w} AS word, (CAST(1 AS HUGEINT) << CAST({bit} AS INT))"
        f" AS bits FROM cust"
        for w, bit in b
    )
    hit_cols = ",\n".join(
        f"CASE WHEN COALESCE((SELECT bits FROM bloom WHERE word = {w}),"
        f" CAST(0 AS HUGEINT))"
        f" & (CAST(1 AS HUGEINT) << CAST({bit} AS INT)) <> 0"
        f" THEN 1 ELSE 0 END AS hit{i}"
        for i, (w, bit) in enumerate(p)
    )
    return f"""
WITH cust AS (SELECT c_custkey FROM customer WHERE c_custkey % 25 = 0),
words AS ({unions}),
bloom AS (SELECT word, bit_or(bits) AS bits FROM words GROUP BY word),
probed AS (
  SELECT o_orderkey, o_custkey,
{hit_cols},
         CASE WHEN o_custkey % 25 = 0 THEN 1 ELSE 0 END AS is_true
  FROM orders),
flagged AS (
  SELECT *, CASE WHEN hit0 + hit1 + hit2 = {BLOOM_HASHES}
                 THEN 1 ELSE 0 END AS is_candidate
  FROM probed)
SELECT (SELECT COUNT(*) FROM cust) AS n_build_keys,
       COUNT(*) AS n_probes,
       CAST(SUM(is_candidate) AS BIGINT) AS n_candidates,
       CAST(SUM(is_true) AS BIGINT) AS n_true,
       CAST(SUM(CASE WHEN is_candidate = 1 AND is_true = 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
       CASE WHEN COUNT(*) > SUM(is_true)
            THEN CAST(SUM(CASE WHEN is_candidate = 1 AND is_true = 0
                          THEN 1 ELSE 0 END) AS DOUBLE)
                   / CAST(COUNT(*) - SUM(is_true) AS DOUBLE)
       END AS fp_rate
FROM flagged
"""


ZONE_BLOCK = 4096
ZONE_DATE = "1997-01-01"


def q_zone_map_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map (data-skipping) effectiveness report: group orders into
    fixed-size blocks under two physical layouts — natural key order
    (block = o_orderkey div 4096, the as-ingested layout) vs clustered
    by the filter column (block = date-rank div 4096, what a clustered
    / Z-ordered write produces) — record per-block min/max of
    o_orderdate, and measure how many blocks the zone maps let a
    `o_orderdate >= DATE '1997-01-01'` scan skip.

    This is the quantified version of the engine's own
    sink_clustered_write story: the SAME predicate skips ~0% of
    key-ordered blocks (every block's date range spans the predicate)
    but ~(selectivity)% of date-clustered ones — the reason min/max
    footer stats only pay off after layout planning. Parquet row-group
    pruning, Delta/Iceberg file skipping, and AQE's dynamic pruning all
    stand on this arithmetic.

    Everything is exact: block ids are integer division of keys or of
    a rank (deterministic total order o_orderdate, o_orderkey), block
    extrema are min/max over dates, "skippable" is a date comparison,
    and the row_counts are int64 sums. One output row per layout.

    At 100 TB: per-block extrema are one map-side-combined aggregate
    (blocks are contiguous in the scan, so partials never shuffle more
    than |blocks| rows); the rank for the clustered layout is the only
    global step and is precisely the sort a clustered WRITE would have
    paid anyway — the report itself adds one exchange of block
    summaries.
    """
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    by_key = o.select(
        F.lit("by_key").alias("layout"),
        F.floor(F.col("o_orderkey") / ZONE_BLOCK).cast("long").alias("block"),
        "o_orderdate",
    )
    w = Window.orderBy("o_orderdate", "o_orderkey")
    clustered = o.select(
        F.lit("clustered").alias("layout"),
        F.floor((F.row_number().over(w) - 1) / ZONE_BLOCK)
        .cast("long")
        .alias("block"),
        "o_orderdate",
    )
    blocks = (
        by_key.unionByName(clustered)
        .groupBy("layout", "block")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("o_orderdate").alias("d_min"),
            F.max("o_orderdate").alias("d_max"),
        )
    )
    cut = F.to_date(F.lit(ZONE_DATE))
    return (
        blocks.groupBy("layout")
        .agg(
            F.count("*").alias("n_blocks"),
            F.sum(F.when(F.col("d_max") < cut, 1).otherwise(0))
            .cast("long")
            .alias("n_skipped"),
            F.sum(F.when(F.col("d_max") < cut, F.col("n_rows")).otherwise(0))
            .cast("long")
            .alias("rows_skipped"),
            F.sum("n_rows").cast("long").alias("n_rows"),
        )
        .select(
            "layout",
            "n_blocks",
            "n_skipped",
            "rows_skipped",
            "n_rows",
            (
                F.col("n_skipped").cast("double")
                / F.col("n_blocks").cast("double")
            ).alias("block_skip_rate"),
            (
                F.col("rows_skipped").cast("double")
                / F.col("n_rows").cast("double")
            ).alias("row_skip_rate"),
        )
    )


COMPACT_TARGET = 4096


def q_compaction_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction plan — the maintenance job every long-lived
    lake table needs (Delta OPTIMIZE / Iceberg rewrite binning): treat
    each ingest day's orders as one "file", bin files into merge groups
    of ~{COMPACT_TARGET} rows by cumulative quota (bin = exclusive
    prefix-row-count div target, in day order), and emit per merge
    group its file count, row total, and date range.

    Quota binning is the deterministic, single-window formulation of
    greedy size packing: bins are contiguous in the table's natural
    order (so each merge rewrites a contiguous range — no random I/O),
    over-target files simply span bins, and every quantity is an exact
    int64 prefix sum — bit-stable in any engine.

    At 100 TB the input is the per-file manifest (one row per file —
    metadata scale, not data scale), exactly what a table format's
    snapshot already materializes; the prefix sum is one window over
    |files| rows and the output drives |bins| rewrite tasks.
    """
    files = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").alias("day"))
        .agg(F.count("*").alias("n_rows"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    binned = files.select(
        "day",
        "n_rows",
        F.floor(
            F.coalesce(F.sum("n_rows").over(w), F.lit(0)) / COMPACT_TARGET
        )
        .cast("long")
        .alias("bin"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count("*").alias("n_files"),
            F.sum("n_rows").cast("long").alias("total_rows"),
            F.min("day").alias("d_min"),
            F.max("day").alias("d_max"),
        )
    )


ENC_DICT_RATIO = 100  # dictionary wins when n >= 100 * n_distinct
ENC_RLE_RATIO = 10  # RLE wins when n >= 10 * runs
ENC_DELTA_MAX = 65535  # delta wins when every step fits 16 bits


def q_encoding_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar-encoding advisor — the storage-planning pass a writer
    runs before committing a layout: per column of orders, cardinality
    (dictionary candidate), run structure in the table's natural
    o_orderkey order (RLE candidate), and the max adjacent delta
    (delta-encoding candidate), closed with a threshold-rule verdict.
    This is the arithmetic behind Parquet's encoding chooser, made
    inspectable.

    All statistics are exact int64 (counts, distinct counts, lag
    comparisons, max |delta|) and the verdict is pure integer threshold
    CASE logic — nothing floats. The natural-order lag runs over the
    key-sorted table; production would compute runs per row group from
    footer samples instead of a global sort, which changes cost, not
    the statistics' meaning (documented trade, the zone_map_pruning
    companion).
    """
    # Finite-measure contract (r12 non-finite probe); twin mirrors.
    o = load_table(spark, sf_dir, "orders").filter(
        finite("o_totalprice")
    )
    cols = [
        ("o_orderkey", F.col("o_orderkey").cast("long"), True),
        ("o_custkey", F.col("o_custkey").cast("long"), True),
        (
            "o_totalprice_cents",
            F.expr(
                "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
            ),
            True,
        ),
        ("o_orderpriority", F.col("o_orderpriority"), False),
        ("o_orderstatus", F.col("o_orderstatus"), False),
    ]
    w = Window.orderBy("o_orderkey")
    parts = []
    for name, expr, is_int in cols:
        base = o.select("o_orderkey", expr.alias("value"))
        lagged = base.select(
            "value", F.lag("value").over(w).alias("prev")
        )
        run_start = F.when(
            F.col("prev").isNull() | (F.col("value") != F.col("prev")), 1
        ).otherwise(0)
        delta = (
            F.max(F.abs(F.col("value") - F.col("prev")))
            if is_int
            else F.lit(None).cast("long")
        )
        parts.append(
            lagged.agg(
                F.lit(name).alias("column"),
                F.count("*").alias("n"),
                F.countDistinct("value").alias("n_distinct"),
                F.sum(run_start).cast("long").alias("n_runs"),
                delta.alias("max_delta"),
            )
        )
    stats = parts[0]
    for p in parts[1:]:
        stats = stats.unionByName(p)
    advice = (
        F.when(
            F.col("n") >= ENC_DICT_RATIO * F.col("n_distinct"), "dictionary"
        )
        .when(F.col("n") >= ENC_RLE_RATIO * F.col("n_runs"), "rle")
        .when(
            F.col("max_delta").isNotNull()
            & (F.col("max_delta") <= ENC_DELTA_MAX),
            "delta",
        )
        .otherwise("plain")
    )
    return stats.select(
        "column", "n", "n_distinct", "n_runs", "max_delta",
        advice.alias("advice"),
    )


ER_MAX_LEV = 3


def q_entity_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution end-to-end: fuzzy-match part names (blocked
    Levenshtein, the q_fuzzy_match_parts device), close the match
    pairs TRANSITIVELY with the engine's own wcc fixpoint, and elect a
    canonical representative per entity cluster — the dedup-merge that
    turns "bolt"/"rod"/"ring" chains into one master record even when
    the chain's endpoints match nothing directly (bolt~rod~ring link at
    distance 3 while bolt~ring is 4 — pairwise matching alone gets
    this wrong, which is the whole argument for the closure).

    Scale shape: matching runs on the DISTINCT-name domain (Zipf-small
    — the q_fuzzy_match_parts measurement) inside first-word blocks,
    names map to stable BIGINT ids (min part key per name) so the
    closure runs on integer nodes, and per-name part counts join back
    at the end — the corpus-sized table is touched exactly twice (id
    election, final count), never in the quadratic stage.

    Output: one row per entity cluster — canonical name (name of the
    min name-id), member-name count, total part rows covered.
    """
    from ..graph.wcc import wcc

    parts = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("key"), F.col("p_name").alias("name")
    )
    names = (
        parts.groupBy("name")
        .agg(F.min("key").alias("name_id"), F.count("*").alias("n_parts"))
        .withColumn("block", F.substring_index("name", " ", 1))
    )
    # Edges only among ASCII names (the fuzzy_nearest contract: the
    # levenshtein metric is cross-engine exact only there); non-ASCII
    # names still appear below as singleton clusters via the left join.
    match_names = names.filter(F.col("name").rlike("^[\\x00-\\x7F]*$"))
    a = match_names.select(
        "block", F.col("name").alias("name_a"), F.col("name_id").alias("id_a")
    )
    b = match_names.select(
        "block", F.col("name").alias("name_b"), F.col("name_id").alias("id_b")
    )
    edges = (
        a.join(b, "block")
        .filter(F.col("name_a") < F.col("name_b"))
        .filter(F.levenshtein("name_a", "name_b") <= ER_MAX_LEV)
        .select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    comp = wcc(edges)
    labeled = names.join(
        comp.select(F.col("node").alias("name_id"), "component"),
        "name_id",
        "left",
    ).select(
        "name",
        "name_id",
        "n_parts",
        F.coalesce("component", F.col("name_id")).alias("cluster"),
    )
    agg = labeled.groupBy("cluster").agg(
        F.count("*").alias("n_names"),
        F.sum("n_parts").cast("long").alias("n_parts"),
    )
    # MIN-aggregate, not a bare filter: name_id = MIN(p_partkey) per
    # name COLLIDES when duplicate part keys carry different names
    # (probed r11 wave-2 — two names, one id, so the id==cluster filter
    # matched both and the join fanned the cluster row out twice while
    # the twin's MIN(CASE..) kept one). min(name) mirrors the twin.
    canon = (
        labeled.filter(F.col("name_id") == F.col("cluster"))
        .groupBy("cluster")
        .agg(F.min("name").alias("canonical_name"))
    )
    return agg.join(canon, "cluster")


# (table, fixed-width numeric/date columns, variable-width string columns)
# — shared metadata driving BOTH the Spark plan and the DuckDB twin, so
# the width model can't drift between engines.
ADVISOR_TABLES = [
    ("region", ["r_regionkey"], ["r_name"]),
    ("nation", ["n_nationkey", "n_regionkey"], ["n_name"]),
    ("supplier", ["s_suppkey", "s_nationkey", "s_acctbal"], ["s_name"]),
    (
        "customer",
        ["c_custkey", "c_nationkey", "c_acctbal"],
        ["c_name", "c_mktsegment"],
    ),
    (
        "part",
        ["p_partkey", "p_size", "p_retailprice"],
        ["p_name", "p_brand", "p_type"],
    ),
    (
        "orders",
        ["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"],
        ["o_orderstatus", "o_orderpriority"],
    ),
]
BROADCAST_BYTES = 10 * 1024 * 1024  # Spark's autoBroadcastJoinThreshold default
FIXED_W = 8
STR_OVERHEAD = 4


def q_join_strategy_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast-vs-shuffle join advisor — the size estimation behind
    Spark's autoBroadcastJoinThreshold, made inspectable per table:
    estimate each table's in-memory bytes ({FIXED_W} per fixed-width
    column, length+{STR_OVERHEAD} per string) and verdict 'broadcast'
    when the estimate fits the 10 MiB default threshold. This is the
    number a planner (or AQE at runtime) compares before picking BHJ
    over SMJ — drive it wrong and the 100 TB join explodes either the
    driver (too-big broadcast) or the network (missed broadcast).

    All estimates are exact int64 sums in one map-side-combined
    aggregate per table; the verdict is an integer threshold CASE.
    The column-width model is one shared metadata literal for both
    engines (ADVISOR_TABLES), so the twin can't drift.
    """
    parts = []
    for table, fixed, strs in ADVISOR_TABLES:
        t = load_table(spark, sf_dir, table)
        width = F.lit(FIXED_W * len(fixed))
        for s in strs:
            width = width + F.length(s) + STR_OVERHEAD
        parts.append(
            t.agg(
                F.lit(table).alias("table_name"),
                F.count("*").alias("n_rows"),
                F.sum(width.cast("long")).cast("long").alias("est_bytes"),
            )
        )
    stats = parts[0]
    for p in parts[1:]:
        stats = stats.unionByName(p)
    return stats.select(
        "table_name",
        "n_rows",
        "est_bytes",
        F.when(F.col("est_bytes") <= BROADCAST_BYTES, "broadcast")
        .otherwise("shuffle")
        .alias("advice"),
    )


# (table, join-key column) pairs a planner would profile before a join
SKEW_KEYS = [
    ("orders", "o_custkey"),
    ("lineitem", "l_orderkey"),
    ("lineitem", "l_partkey"),
    ("lineitem", "l_suppkey"),
    ("events", "user_id"),
]
SKEW_FACTOR = 4  # salt when the hottest key carries > 4x the mean load


def q_join_skew_detector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profiler — the measurement that decides between a
    plain shuffle join and the salted variant (join_skew_salted): per
    candidate join key, row count, distinct keys, the hottest key's
    row count, and the skew ratio max/mean; verdict 'salt' when the
    hottest key exceeds {SKEW_FACTOR}x the mean — decided by the EXACT
    integer cross-product max*n_keys > {SKEW_FACTOR}*n, no float
    threshold. skew_ratio itself is one closing division.

    Per key this is a two-level aggregate (key histogram, then a 1-row
    summary) — both map-side combined; the key histogram is the same
    pass AQE's skew-join detection pays at runtime.
    """
    parts = []
    for table, key in SKEW_KEYS:
        hist = (
            load_table(spark, sf_dir, table)
            .groupBy(key)
            .agg(F.count("*").alias("n"))
        )
        parts.append(
            hist.agg(
                F.lit(f"{table}.{key}").alias("join_key"),
                F.sum("n").cast("long").alias("n_rows"),
                F.count("*").alias("n_keys"),
                F.max("n").cast("long").alias("max_per_key"),
            )
        )
    stats = parts[0]
    for p in parts[1:]:
        stats = stats.unionByName(p)
    return stats.select(
        "join_key",
        "n_rows",
        "n_keys",
        "max_per_key",
        (
            (F.col("max_per_key") * F.col("n_keys")).cast("double")
            / F.col("n_rows").cast("double")
        ).alias("skew_ratio"),
        F.when(
            F.col("max_per_key") * F.col("n_keys")
            > SKEW_FACTOR * F.col("n_rows"),
            "salt",
        )
        .otherwise("plain")
        .alias("advice"),
    )


# (name, left table, left key, right table, right key) — equi-joins a
# cost-based optimizer would estimate before picking a join order
CARD_JOINS = [
    ("orders_customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"),
]


def q_join_cardinality_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation vs ground truth — the formula every
    cost-based optimizer (and Spark's CBO with ANALYZE stats) applies
    before ordering joins: |A ⋈ B| ≈ |A|·|B| / max(ndv_A, ndv_B) under
    the uniformity + containment assumptions. Emitting the estimate
    NEXT TO the true join count turns the textbook formula into a
    measurable accuracy report (q_error = max(est,act)/min(est,act)) —
    the number that decides whether your stats are fresh enough to
    trust a join reorder at 100 TB.

    Estimate inputs are exact int64 (counts, exact NDVs — production
    would use HLL sketches, the approx_distinct device); the estimate
    and q_error are ONE closing division each. The actual count is a
    real equi-join per pair — the expensive-but-honest part, which is
    why optimizers estimate in the first place.
    """
    parts = []
    for name, lt, lk, rt, rk in CARD_JOINS:
        left = load_table(spark, sf_dir, lt).select(F.col(lk).alias("k"))
        right = load_table(spark, sf_dir, rt).select(F.col(rk).alias("k"))
        stats = left.agg(
            F.count("*").alias("n_l"),
            F.countDistinct("k").alias("ndv_l"),
        ).crossJoin(
            right.agg(
                F.count("*").alias("n_r"),
                F.countDistinct("k").alias("ndv_r"),
            )
        )
        actual = left.join(right, "k").agg(
            F.count("*").alias("actual_rows")
        )
        est = (
            F.col("n_l") * F.col("n_r")
        ).cast("double") / F.greatest("ndv_l", "ndv_r").cast("double")
        parts.append(
            stats.crossJoin(actual).select(
                F.lit(name).alias("join_name"),
                "n_l",
                "n_r",
                F.col("ndv_l").cast("long").alias("ndv_l"),
                F.col("ndv_r").cast("long").alias("ndv_r"),
                est.alias("est_rows"),
                "actual_rows",
                (
                    F.greatest(est, F.col("actual_rows").cast("double"))
                    / F.least(est, F.col("actual_rows").cast("double"))
                ).alias("q_error"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def q_freshness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-freshness SLA report per event type — the first panel of
    every pipeline dashboard: latest event time per type, its lag
    behind the global high-water mark in exact microseconds, and the
    SLA flag (stale when > 24h behind). Lag is a timestampdiff of
    exact timestamps; the flag is an integer comparison — engine-
    stable. One map-side-combined max-aggregate per type plus a 1-row
    broadcast of the global watermark: the cheapest possible shape.
    """
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(F.max("ts").alias("latest_ts"))
    hwm = ev.agg(F.max("ts").alias("hwm"))
    return per_type.crossJoin(F.broadcast(hwm)).select(
        "event_type",
        "latest_ts",
        "hwm",
        F.expr("timestampdiff(MICROSECOND, latest_ts, hwm)").alias("lag_us"),
        (
            F.expr("timestampdiff(MICROSECOND, latest_ts, hwm)")
            > 24 * 3600 * 1_000_000
        ).alias("stale"),
    )


SEL_BUCKETS = 20
SEL_CUTS = (150_000, 250_000, 350_000, 450_000)  # probes: o_totalprice > $X


def q_selectivity_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-predicate selectivity estimation vs ground truth — the
    other half of the CBO arithmetic (join_cardinality_estimator's
    sibling): build a {SEL_BUCKETS}-bucket equi-width histogram over
    o_totalprice cents, estimate sel(o_totalprice > X) by full buckets
    above X plus linear interpolation inside X's bucket (exactly what
    ANALYZE-style histograms store), and emit the estimate beside the
    true selectivity with the q-error.

    The histogram is exact int64 (bucket = floor over exact cents
    offsets, per-bucket counts map-side combined); the interpolation
    fraction and both selectivities are single closing divisions on
    exact operands, engine-stable. The actual count per probe is a
    corpus filter — the honest cost the histogram exists to avoid.

    At 100 TB the histogram is |buckets| rows refreshed by ANALYZE
    cadence; per-probe estimation is arithmetic on that aggregate.
    """
    # Finite-measure contract (r12 non-finite probe); twin mirrors.
    o = load_table(spark, sf_dir, "orders").filter(
        finite("o_totalprice")
    ).select(
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("cents")
    )
    rng = o.agg(
        F.min("cents").alias("lo"),
        F.max("cents").alias("hi"),
        F.count("*").alias("n"),
    )
    hist = (
        o.crossJoin(F.broadcast(rng))
        .select(
            F.least(
                F.floor(
                    (F.col("cents") - F.col("lo")).cast("double")
                    / ((F.col("hi") - F.col("lo") + 1).cast("double"))
                    * SEL_BUCKETS
                ).cast("long"),
                F.lit(SEL_BUCKETS - 1),
            ).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("bn"))
    )
    probes = spark.createDataFrame(
        [(int(c),) for c in SEL_CUTS], "cut_dollars long"
    )
    # estimate: full buckets above the cut + linear share of the cut's
    # own bucket
    j = probes.crossJoin(F.broadcast(rng)).crossJoin(F.broadcast(hist))
    cutb = F.least(
        F.floor(
            (F.col("cut_dollars") * 100 - F.col("lo")).cast("double")
            / ((F.col("hi") - F.col("lo") + 1).cast("double"))
            * SEL_BUCKETS
        ).cast("long"),
        F.lit(SEL_BUCKETS - 1),
    )
    width = (F.col("hi") - F.col("lo") + 1).cast("double") / SEL_BUCKETS
    b_lo = F.col("lo").cast("double") + cutb.cast("double") * width
    frac_above = F.greatest(
        F.lit(0.0),
        F.least(
            F.lit(1.0),
            F.lit(1.0)
            - ((F.col("cut_dollars") * 100).cast("double") - b_lo) / width,
        ),
    )
    # per-bucket contributions quantize to e6 BIGINTs before the sum
    # (only the cut's own bucket is fractional) — exact int accumulation
    est = (
        j.select(
            "cut_dollars",
            "n",
            F.when(F.col("bucket") > cutb, F.col("bn") * 1_000_000)
            .when(
                F.col("bucket") == cutb,
                F.round(F.col("bn").cast("double") * frac_above * 1e6).cast(
                    "long"
                ),
            )
            .otherwise(F.lit(0))
            .alias("contrib_e6"),
        )
        .groupBy("cut_dollars", "n")
        .agg(
            F.round(F.sum("contrib_e6") / 1e6).cast("long").alias("est_rows")
        )
    )
    actual = (
        o.crossJoin(F.broadcast(probes))
        .filter(F.col("cents") > F.col("cut_dollars") * 100)
        .groupBy("cut_dollars")
        .agg(F.count("*").alias("actual_rows"))
    )
    return (
        est.join(actual, "cut_dollars", "left")
        .select(
            "cut_dollars",
            "est_rows",
            F.coalesce("actual_rows", F.lit(0)).cast("long").alias(
                "actual_rows"
            ),
            (F.col("est_rows").cast("double") / F.col("n").cast("double"))
            .alias("est_sel"),
            (
                F.coalesce("actual_rows", F.lit(0)).cast("double")
                / F.col("n").cast("double")
            ).alias("actual_sel"),
        )
    )


QUERIES = {
    "selectivity_estimator": q_selectivity_estimator,
    "join_cardinality_estimator": q_join_cardinality_estimator,
    "freshness_report": q_freshness_report,
    "zone_map_pruning": q_zone_map_pruning,
    "compaction_planner": q_compaction_planner,
    "encoding_advisor": q_encoding_advisor,
    "entity_clusters": q_entity_clusters,
    "join_strategy_advisor": q_join_strategy_advisor,
    "join_skew_detector": q_join_skew_detector,
    "bloom_prune_join": q_bloom_prune_join,
    "kmv_set_overlap": q_kmv_set_overlap,
    "skew_salted_agg": q_skew_salted_agg,
    "join_skew_salted": q_join_skew_salted,
    "join_null_skew": q_join_null_skew,
    "interval_self_join_banded": q_interval_self_join_banded,
    "heavy_hitters": q_heavy_hitters,
    "fuzzy_match_parts": q_fuzzy_match_parts,
    "range_join_bands": q_range_join_bands,
    "sketch_merge": q_sketch_merge,  # rows-only (irreducible estimates)
    "sketch_merge_verified": q_sketch_merge_verified,
    "approx_topk_items": q_approx_topk_items,
    "approx_distinct": q_approx_distinct,  # rows-only (irreducible estimates)
    "approx_distinct_verified": q_approx_distinct_verified,
    "approx_quantiles": q_approx_quantiles,  # rows-only (sketches differ)
    "approx_quantiles_verified": q_approx_quantiles_verified,
    "global_row_ids": q_global_row_ids,
    "degree_distribution": q_degree_distribution,
}

_BANDS_SQL = " UNION ALL ".join(
    f"SELECT '{b}' AS band, {lo} AS lo, {hi} AS hi" for b, lo, hi in PRICE_BANDS
)

_ENC_COL_SQL = """
SELECT '{name}' AS "column", COUNT(*) AS n,
       CAST(COUNT(DISTINCT value) AS BIGINT) AS n_distinct,
       CAST(SUM(CASE WHEN prev IS NULL OR value <> prev THEN 1 ELSE 0 END)
            AS BIGINT) AS n_runs,
       {delta} AS max_delta
FROM (
  SELECT value, lag(value) OVER (ORDER BY o_orderkey) AS prev
  -- isfinite: the r12 finite-measure contract (engine filters the scan)
  FROM (SELECT o_orderkey, {expr} AS value FROM orders
        WHERE isfinite(o_totalprice))
)
"""

def _advisor_oracle_sql() -> str:
    selects = []
    for table, fixed, strs in ADVISOR_TABLES:
        width = " + ".join(
            [str(FIXED_W * len(fixed))]
            + [f"length({s}) + {STR_OVERHEAD}" for s in strs]
        )
        selects.append(
            f"SELECT '{table}' AS table_name, COUNT(*) AS n_rows,\n"
            f"       CAST(SUM(CAST({width} AS BIGINT)) AS BIGINT)"
            f" AS est_bytes\nFROM {table}"
        )
    union = "\nUNION ALL\n".join(selects)
    return f"""
WITH stats AS (
{union}
)
SELECT table_name, n_rows, est_bytes,
       CASE WHEN est_bytes <= {BROADCAST_BYTES}
            THEN 'broadcast' ELSE 'shuffle' END AS advice
FROM stats
"""


def _skew_oracle_sql() -> str:
    selects = []
    for table, key in SKEW_KEYS:
        selects.append(
            f"SELECT '{table}.{key}' AS join_key,\n"
            f"       CAST(SUM(n) AS BIGINT) AS n_rows, COUNT(*) AS n_keys,\n"
            f"       CAST(MAX(n) AS BIGINT) AS max_per_key\n"
            f"FROM (SELECT {key}, COUNT(*) AS n FROM {table} GROUP BY 1)"
        )
    union = "\nUNION ALL\n".join(selects)
    return f"""
WITH stats AS (
{union}
)
SELECT join_key, n_rows, n_keys, max_per_key,
       CAST(max_per_key * n_keys AS DOUBLE) / CAST(n_rows AS DOUBLE)
         AS skew_ratio,
       CASE WHEN max_per_key * n_keys > {SKEW_FACTOR} * n_rows
            THEN 'salt' ELSE 'plain' END AS advice
FROM stats
"""


def _card_oracle_sql() -> str:
    selects = []
    for name, lt, lk, rt, rk in CARD_JOINS:
        selects.append(f"""
SELECT '{name}' AS join_name,
       (SELECT COUNT(*) FROM {lt}) AS n_l,
       (SELECT COUNT(*) FROM {rt}) AS n_r,
       (SELECT CAST(COUNT(DISTINCT {lk}) AS BIGINT) FROM {lt}) AS ndv_l,
       (SELECT CAST(COUNT(DISTINCT {rk}) AS BIGINT) FROM {rt}) AS ndv_r,
       CAST((SELECT COUNT(*) FROM {lt}) * (SELECT COUNT(*) FROM {rt})
            AS DOUBLE)
         / CAST(greatest((SELECT COUNT(DISTINCT {lk}) FROM {lt}),
                         (SELECT COUNT(DISTINCT {rk}) FROM {rt}))
                AS DOUBLE) AS est_rows,
       (SELECT COUNT(*) FROM {lt} l JOIN {rt} r ON l.{lk} = r.{rk})
         AS actual_rows""")
    union = "\nUNION ALL\n".join(selects)
    return f"""
WITH stats AS (
{union}
)
SELECT join_name, n_l, n_r, ndv_l, ndv_r, est_rows, actual_rows,
       greatest(est_rows, CAST(actual_rows AS DOUBLE))
         / least(est_rows, CAST(actual_rows AS DOUBLE)) AS q_error
FROM stats
"""


_SEL_PROBES = ", ".join(str(int(c)) for c in SEL_CUTS)

ORACLE = {
    "selectivity_estimator": f"""
WITH o AS (
  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders WHERE isfinite(o_totalprice)
),
rng AS (
  SELECT CAST(MIN(cents) AS BIGINT) AS lo, CAST(MAX(cents) AS BIGINT) AS hi,
         COUNT(*) AS n
  FROM o
),
hist AS (
  SELECT least(CAST(floor(CAST(cents - lo AS DOUBLE)
                          / CAST(hi - lo + 1 AS DOUBLE)
                          * {SEL_BUCKETS}) AS BIGINT),
               {SEL_BUCKETS - 1}) AS bucket,
         COUNT(*) AS bn
  FROM o CROSS JOIN rng GROUP BY 1
),
probes AS (SELECT UNNEST([{_SEL_PROBES}]) AS cut_dollars),
j AS (
  SELECT p.cut_dollars, r.n, r.lo, r.hi, h.bucket, h.bn,
         least(CAST(floor(CAST(p.cut_dollars * 100 - r.lo AS DOUBLE)
                          / CAST(r.hi - r.lo + 1 AS DOUBLE)
                          * {SEL_BUCKETS}) AS BIGINT),
               {SEL_BUCKETS - 1}) AS cutb,
         CAST(r.hi - r.lo + 1 AS DOUBLE) / {SEL_BUCKETS} AS width
  FROM probes p CROSS JOIN rng r CROSS JOIN hist h
),
contrib AS (
  SELECT cut_dollars, n,
         CASE WHEN bucket > cutb THEN bn * 1000000
              WHEN bucket = cutb THEN
                CAST(round(CAST(bn AS DOUBLE)
                  * greatest(0.0, least(1.0,
                      1.0 - (CAST(cut_dollars * 100 AS DOUBLE)
                             - (CAST(lo AS DOUBLE)
                                + CAST(cutb AS DOUBLE) * width)) / width))
                  * 1e6) AS BIGINT)
              ELSE 0 END AS contrib_e6
  FROM j
),
est AS (
  SELECT cut_dollars, n,
         CAST(round(SUM(contrib_e6) / 1e6) AS BIGINT) AS est_rows
  FROM contrib GROUP BY 1, 2
),
act AS (
  SELECT p.cut_dollars, COUNT(*) AS actual_rows
  FROM o CROSS JOIN probes p
  WHERE o.cents > p.cut_dollars * 100
  GROUP BY 1
)
SELECT CAST(e.cut_dollars AS BIGINT) AS cut_dollars, e.est_rows,
       CAST(COALESCE(a.actual_rows, 0) AS BIGINT) AS actual_rows,
       CAST(e.est_rows AS DOUBLE) / CAST(e.n AS DOUBLE) AS est_sel,
       CAST(COALESCE(a.actual_rows, 0) AS DOUBLE) / CAST(e.n AS DOUBLE)
         AS actual_sel
FROM est e LEFT JOIN act a ON a.cut_dollars = e.cut_dollars
""",
    "join_cardinality_estimator": _card_oracle_sql(),
    "freshness_report": """
WITH per_type AS (
  SELECT event_type, MAX(CAST(ts AS TIMESTAMP)) AS latest_ts FROM events
  GROUP BY 1
),
hwm AS (SELECT MAX(CAST(ts AS TIMESTAMP)) AS hwm FROM events)
SELECT event_type, latest_ts, hwm,
       CAST(date_diff('microsecond', latest_ts, hwm) AS BIGINT) AS lag_us,
       date_diff('microsecond', latest_ts, hwm) > 86400000000 AS stale
FROM per_type CROSS JOIN hwm
""",
    "join_strategy_advisor": _advisor_oracle_sql(),
    "join_skew_detector": _skew_oracle_sql(),
    "entity_clusters": f"""
WITH RECURSIVE names AS (
  SELECT p_name AS name, MIN(p_partkey) AS name_id, COUNT(*) AS n_parts,
         string_split(p_name, ' ')[1] AS block
  FROM part GROUP BY p_name
),
edges AS (
  -- ASCII match domain (engine mirror): levenshtein is chars in Spark
  -- and bytes in DuckDB, exact cross-engine only on ASCII names.
  SELECT a.name_id AS src, b.name_id AS dst
  FROM names a JOIN names b
    ON a.block = b.block AND a.name < b.name
  WHERE levenshtein(a.name, b.name) <= {ER_MAX_LEV}
    AND regexp_matches(a.name, '^[\\x00-\\x7f]*$')
    AND regexp_matches(b.name, '^[\\x00-\\x7f]*$')
),
und AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
reach(node, label) AS (
  SELECT src, src FROM (SELECT DISTINCT src FROM und)
  UNION
  SELECT u.dst, r.label FROM reach r JOIN und u ON u.src = r.node
),
comp AS (SELECT node, MIN(label) AS component FROM reach GROUP BY node),
labeled AS (
  SELECT n.name, n.name_id, n.n_parts,
         COALESCE(c.component, n.name_id) AS cluster
  FROM names n LEFT JOIN comp c ON c.node = n.name_id
)
SELECT l.cluster, COUNT(*) AS n_names,
       CAST(SUM(l.n_parts) AS BIGINT) AS n_parts,
       MIN(CASE WHEN l.name_id = l.cluster THEN l.name END)
         AS canonical_name
FROM labeled l GROUP BY l.cluster
""",
    "compaction_planner": f"""
WITH files AS (
  SELECT o_orderdate AS day, COUNT(*) AS n_rows FROM orders GROUP BY 1
),
binned AS (
  SELECT day, n_rows,
         CAST(floor(COALESCE(SUM(n_rows) OVER (ORDER BY day
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    / {COMPACT_TARGET}) AS BIGINT) AS bin
  FROM files
)
SELECT bin, COUNT(*) AS n_files, CAST(SUM(n_rows) AS BIGINT) AS total_rows,
       MIN(day) AS d_min, MAX(day) AS d_max
FROM binned GROUP BY bin
""",
    "encoding_advisor": f"""
WITH stats AS (
{_ENC_COL_SQL.format(name="o_orderkey", expr="CAST(o_orderkey AS BIGINT)",
                     delta="CAST(MAX(abs(value - prev)) AS BIGINT)")}
UNION ALL
{_ENC_COL_SQL.format(name="o_custkey", expr="CAST(o_custkey AS BIGINT)",
                     delta="CAST(MAX(abs(value - prev)) AS BIGINT)")}
UNION ALL
{_ENC_COL_SQL.format(
    name="o_totalprice_cents",
    expr="CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)",
    delta="CAST(MAX(abs(value - prev)) AS BIGINT)")}
UNION ALL
{_ENC_COL_SQL.format(name="o_orderpriority", expr="o_orderpriority",
                     delta="CAST(NULL AS BIGINT)")}
UNION ALL
{_ENC_COL_SQL.format(name="o_orderstatus", expr="o_orderstatus",
                     delta="CAST(NULL AS BIGINT)")}
)
SELECT "column", n, n_distinct, n_runs, max_delta,
       CASE WHEN n >= {ENC_DICT_RATIO} * n_distinct THEN 'dictionary'
            WHEN n >= {ENC_RLE_RATIO} * n_runs THEN 'rle'
            WHEN max_delta IS NOT NULL AND max_delta <= {ENC_DELTA_MAX}
              THEN 'delta'
            ELSE 'plain' END AS advice
FROM stats
""",
    "zone_map_pruning": f"""
WITH by_key AS (
  SELECT 'by_key' AS layout,
         CAST(floor(o_orderkey / {ZONE_BLOCK}) AS BIGINT) AS block,
         o_orderdate
  FROM orders
),
clustered AS (
  SELECT 'clustered' AS layout,
         CAST(floor((ROW_NUMBER() OVER (ORDER BY o_orderdate, o_orderkey) - 1)
                    / {ZONE_BLOCK}) AS BIGINT) AS block,
         o_orderdate
  FROM orders
),
blocks AS (
  SELECT layout, block, COUNT(*) AS n_rows,
         MIN(o_orderdate) AS d_min, MAX(o_orderdate) AS d_max
  FROM (SELECT * FROM by_key UNION ALL SELECT * FROM clustered)
  GROUP BY 1, 2
)
SELECT layout,
       COUNT(*) AS n_blocks,
       CAST(SUM(CASE WHEN d_max < DATE '{ZONE_DATE}' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_skipped,
       CAST(SUM(CASE WHEN d_max < DATE '{ZONE_DATE}' THEN n_rows ELSE 0 END)
            AS BIGINT) AS rows_skipped,
       CAST(SUM(n_rows) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN d_max < DATE '{ZONE_DATE}' THEN 1 ELSE 0 END)
            AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS block_skip_rate,
       CAST(SUM(CASE WHEN d_max < DATE '{ZONE_DATE}' THEN n_rows ELSE 0 END)
            AS DOUBLE) / CAST(SUM(n_rows) AS DOUBLE) AS row_skip_rate
FROM blocks GROUP BY layout
""",
    "bloom_prune_join": _bloom_oracle_sql(),
    # Portable 60-bit md5 hash (the simhash device); the union's K
    # smallest re-ranked per pair; exact Jaccard via the distinct-pair
    # self-join with inclusion-exclusion union size.
    "kmv_set_overlap": f"""
WITH hashed AS (
  SELECT DISTINCT event_type,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS h,
         user_id
  FROM events),
kmv AS (
  SELECT event_type, h FROM (
    SELECT event_type, h,
           row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
    FROM hashed) WHERE rn <= {KMV_K}),
types AS (SELECT DISTINCT event_type FROM events),
merged AS (
  SELECT a.event_type AS type_a, tb.event_type AS type_b, a.h,
         1 AS in_a, 0 AS in_b
  FROM kmv a CROSS JOIN types tb
  UNION ALL
  SELECT ta.event_type AS type_a, b.event_type AS type_b, b.h,
         0 AS in_a, 1 AS in_b
  FROM kmv b CROSS JOIN types ta),
union_kmv AS (
  SELECT type_a, type_b, h, MAX(in_a) AS in_a, MAX(in_b) AS in_b
  FROM merged WHERE type_a < type_b
  GROUP BY type_a, type_b, h),
est AS (
  SELECT type_a, type_b,
         CAST(SUM(in_a * in_b) AS BIGINT) AS n_both,
         CAST(SUM(in_a * in_b) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
           AS est_jaccard
  FROM (
    SELECT *, row_number() OVER (PARTITION BY type_a, type_b
                                 ORDER BY h) AS rn
    FROM union_kmv) WHERE rn <= {KMV_K}
  GROUP BY type_a, type_b),
users AS (SELECT DISTINCT event_type, user_id FROM events),
sizes AS (SELECT event_type, COUNT(*) AS n FROM users GROUP BY event_type),
inter AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         COUNT(*) AS n_inter
  FROM users a JOIN users b ON a.user_id = b.user_id
  WHERE a.event_type < b.event_type
  GROUP BY a.event_type, b.event_type)
SELECT e.type_a, e.type_b, e.n_both, e.est_jaccard,
       CAST(i.n_inter AS DOUBLE)
       / CAST(sa.n + sb.n - i.n_inter AS DOUBLE) AS exact_jaccard
FROM est e
JOIN inter i ON i.type_a = e.type_a AND i.type_b = e.type_b
JOIN sizes sa ON sa.event_type = e.type_a
JOIN sizes sb ON sb.event_type = e.type_b
""",
    "heavy_hitters": """
WITH counts AS (
  SELECT l_partkey, count(*) AS n FROM lineitem GROUP BY l_partkey
),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM counts),
top AS (
  SELECT l_partkey, n FROM counts ORDER BY n DESC, l_partkey LIMIT 20
)
SELECT l_partkey, n,
       CAST(SUM(n) OVER (ORDER BY n DESC, l_partkey
                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_n,
       tot.n_total,
       CAST(n AS DOUBLE) / CAST(tot.n_total AS DOUBLE) AS share,
       CAST(SUM(n) OVER (ORDER BY n DESC, l_partkey
                         ROWS UNBOUNDED PRECEDING) AS DOUBLE)
         / CAST(tot.n_total AS DOUBLE) AS cum_share
FROM top CROSS JOIN tot
""",
    "skew_salted_agg": """
SELECT event_type, count(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events WHERE isfinite(value) GROUP BY event_type
""",
    "interval_self_join_banded": f"""
WITH o AS (
  SELECT o_custkey AS cust, o_orderkey AS key,
         date_diff('day', DATE '1970-01-01', o_orderdate) AS day
  FROM orders
),
pairs AS (
  SELECT a.cust, a.key AS key_a, b.key AS key_b,
         abs(a.day - b.day) AS gap
  FROM o a JOIN o b
    ON a.cust = b.cust AND a.key < b.key
   AND abs(a.day - b.day) <= {BAND_DAYS}
)
SELECT cust, count(*) AS n_pairs,
       max(gap) AS max_gap_days, min(gap) AS min_gap_days
FROM pairs GROUP BY cust
""",
    "join_null_skew": """
WITH fact AS (
  SELECT CASE WHEN l_partkey % 3 = 0 THEN NULL ELSE l_partkey END AS key,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS cents
  FROM lineitem WHERE isfinite(l_extendedprice)
)
SELECT COALESCE(p.p_brand, 'UNMATCHED') AS brand,
       count(*) AS n,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM fact f LEFT JOIN part p ON f.key = p.p_partkey
GROUP BY 1
""",
    "join_skew_salted": """
SELECT s_suppkey, s_name, count(*) AS n_items,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
            AS BIGINT) AS revenue_cents
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_suppkey, s_name
""",
    "range_join_bands": f"""
WITH bands AS ({_BANDS_SQL})
SELECT band, count(*) AS n_parts,
       min(p_retailprice) AS min_price, max(p_retailprice) AS max_price
FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice < hi
GROUP BY band
""",
    "approx_topk_items": """
SELECT event_type AS item, count(*) AS est
FROM events GROUP BY event_type
""",
    # The oracle asserts the EXPECTED deterministic facts (exact counts
    # + invariant booleans as TRUE literals); Spark computes the actual
    # ones from its sketch, so a sketch regression fails the hash while
    # the engine-private estimates stay out of it.
    "approx_distinct_verified": """
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS exact_parts,
       TRUE AS est_in_envelope
FROM lineitem GROUP BY l_returnflag
""",
    "sketch_merge_verified": """
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS exact,
       TRUE AS union_tracks_direct,
       TRUE AS merged_in_envelope
FROM lineitem
WHERE l_returnflag IS NOT NULL AND l_linestatus IS NOT NULL
  AND l_partkey IS NOT NULL
GROUP BY l_returnflag
""",
    "approx_quantiles_verified": """
SELECT l_returnflag,
       min(l_extendedprice) AS min_price,
       max(l_extendedprice) AS max_price,
       count(*) AS n_rows,
       TRUE AS q1_in_envelope,
       TRUE AS median_in_envelope,
       TRUE AS q3_in_envelope
FROM lineitem
WHERE l_returnflag IS NOT NULL AND l_extendedprice IS NOT NULL
GROUP BY l_returnflag
""",
    "global_row_ids": f"""
SELECT doc_id, doc_id % {GLOBAL_ID_SHARDS} AS shard,
       CAST(row_number() OVER (ORDER BY doc_id % {GLOBAL_ID_SHARDS}, doc_id)
            AS BIGINT) AS global_id
FROM documents
""",
    "degree_distribution": """
WITH deg AS (
  -- B1 edge contract mirror (io.sources.EDGES_SQL): endpoints and
  -- weight non-null (r12 extended the contract to endpoints).
  SELECT l_suppkey AS src, count(*) AS degree
  FROM lineitem
  WHERE l_suppkey IS NOT NULL AND l_partkey IS NOT NULL
    AND isfinite(l_quantity)
  GROUP BY l_suppkey
)
SELECT degree, count(*) AS n_nodes FROM deg GROUP BY degree
""",
    "fuzzy_match_parts": """
WITH names AS (
  -- ASCII match domain (engine mirror — see fuzzy_nearest).
  SELECT DISTINCT p_name AS name, split_part(p_name, ' ', 1) AS block
  FROM part
  WHERE regexp_matches(p_name, '^[\\x00-\\x7f]*$')
),
pairs AS (
  SELECT a.name AS name_a, b.name AS name_b,
         CAST(levenshtein(a.name, b.name) AS INT) AS dist
  FROM names a JOIN names b USING (block)
  WHERE a.name <> b.name
),
best AS (
  SELECT name_a AS name, name_b AS match_name, dist FROM (
    SELECT *, row_number() OVER (PARTITION BY name_a
                                 ORDER BY dist, name_b) AS rk
    FROM pairs
  ) WHERE rk = 1
)
SELECT p.p_partkey AS key_a, b.match_name, b.dist
FROM part p JOIN best b ON p.p_name = b.name
""",
}
