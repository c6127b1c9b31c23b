"""Deterministic sampling, dataset splits, and sequence packing — the
reproducibility layer of a training-data pipeline (SURVEY.md §7 P3).

Random sampling (``df.sample``/``TABLESAMPLE``) is useless for corpus
curation at 100 TB: re-runs must produce the SAME split, adding a shard
must not reshuffle previous assignments, and two engines must agree on
which row landed where. The standard answer is content-hash bucketing:
``md5(salt || key)`` is uniform, stable across engines/runs/partitionings,
and a hex-prefix threshold turns it into an exact-fraction filter. Both
Spark and DuckDB ship bit-identical lowercase-hex ``md5``, so every query
here is hash-checked against its oracle twin, not approximately compared.

The four operators:

- ``split_train_test``  80/10/10 split assignment per document.
- ``sample_hash``       deterministic ~10% corpus sample.
- ``stratified_sample`` per-language rates (downsample the dominant
                        language, keep the tail) — the skew-rebalancing
                        primitive of corpus mixing.
- ``pack_sequences``    sequential packing of documents into
                        fixed-capacity context windows, sharded.

Scale shape: the first three are pure map-side filters/projections —
zero shuffle, predicate evaluable at the scan, embarrassingly parallel
at any corpus size. Packing is the only one with a window, and it is
PARTITIONED BY SHARD: each shard packs independently (one ordered scan
per shard), so parallelism = #shards and no global sort exists. A
packing that ordered the whole corpus in one sequence would serialize
at 100 TB — the shard key is the design, not a convenience.

The 4-hex-digit prefix gives 65536 buckets; thresholds are chosen as
exact bucket counts (52429/65536 = 80.0003%), so split fractions are
fixed-point exact, not float-rounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..contracts import finite
from ..io.sources import load_parallel, load_table

# Salted per use-case so the split assignment and the sample are
# independent draws (same key never correlates across operators).
_SPLIT_KEY = "split:"
_SAMPLE_KEY = "sample:"

# substr(md5, 1, 4) thresholds. Lowercase hex compares lexicographically
# as magnitude because all digits are in ['0'..'9','a'..'f'].
_TRAIN_HI = "cccd"  # 52429/65536 ≈ 80.00%
_VAL_HI = "e666"  # 58982/65536 ≈ 90.00% cumulative
_SAMPLE_HI = "199a"  # 6554/65536 ≈ 10.00%

# Per-language keep thresholds for the stratified sample. 'g' sorts
# after every hex digit, so it means "keep all".
_STRATA = {"en": "3333", "es": "8000"}  # 20%, 50%
_STRATA_DEFAULT = "g"  # keep everything else


def _bucket(col, salt: str):
    """First 4 hex chars of md5(salt || key) — a uniform 16-bit bucket."""
    return F.substring(F.md5(F.concat(F.lit(salt), col.cast("string"))), 1, 4)


def q_split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign every document to train/val/test by content-hash bucket.

    The assignment is a pure function of doc_id: appending new shards or
    re-running on a different cluster never moves an existing document
    between splits (the property random splits lack).
    """
    docs = load_table(spark, sf_dir, "documents")
    b = _bucket(F.col("doc_id"), _SPLIT_KEY)
    return docs.select(
        "doc_id",
        "lang",
        b.alias("bucket"),
        F.when(b < _TRAIN_HI, "train")
        .when(b < _VAL_HI, "val")
        .otherwise("test")
        .alias("split"),
    )


def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% corpus sample — same rows on every run/engine.

    The filter is a scan-level predicate on a map-side expression: at
    100 TB this reads every row once and shuffles nothing.
    """
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(
        _bucket(F.col("doc_id"), _SAMPLE_KEY) < _SAMPLE_HI
    ).select("doc_id", "lang", "source", "n_chars")


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language sampling rates: corpus rebalancing, deterministically.

    Dominant strata are downsampled (en 20%, es 50%), tail languages kept
    whole — the hash-threshold version of `sampleBy`, but reproducible
    across engines and incremental over new data.
    """
    docs = load_table(spark, sf_dir, "documents")
    thr = F.when(F.col("lang") == "en", _STRATA["en"]).when(
        F.col("lang") == "es", _STRATA["es"]
    ).otherwise(_STRATA_DEFAULT)
    return docs.filter(
        _bucket(F.col("doc_id"), _SAMPLE_KEY) < thr
    ).select("doc_id", "lang", "n_chars")


# Domain-mixing targets: char-share each listed source should hold in
# the mixed corpus; unlisted sources split the remaining mass equally.
# The remainder is computed ONCE in Python and embedded as the same
# double literal in both engines (repr round-trips exactly), so the
# share arithmetic is bit-identical.
_MIX_KEY = "mix:"
_MIX_TARGETS = {"src0": 0.20, "src1": 0.15}
_MIX_REMAINDER = 1.0 - sum(_MIX_TARGETS.values())


def q_domain_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixing to target domain weights — the rate-SETTING twin of
    ``stratified_sample`` (which applies fixed literal rates): each
    source's keep-rate is computed FROM THE DATA as
    ``least(1, share * total_chars / source_chars)`` so the kept corpus
    approaches the target char-share per source, then applied as the
    usual md5-bucket threshold so the kept set is deterministic across
    engines, runs, and incremental appends.

    Cross-engine exactness: char sums are exact integers cast to DOUBLE
    below 2^53, the share/rate expressions have the same textual shape
    in both engines (bit-identical doubles), and the bucket compare
    uses ``floor(rate * 65536)`` as a 4-hex-digit string — with a
    separate ``rate >= 1`` keep-all disjunct, because 65536 formats to
    5 chars and would break the lexicographic-magnitude trick.

    Scale shape: one map-side-combined per-source aggregate (Zipf-small
    output) broadcast back onto the fact scan; the accept predicate is
    map-side — the corpus itself never shuffles.
    """
    docs = load_table(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.sum("n_chars").cast("double").alias("chars_s")
    )
    listed = list(_MIX_TARGETS)
    totals = docs.select(
        F.sum("n_chars").cast("double").alias("total_chars"),
        F.count_distinct(
            F.when(~F.col("source").isin(listed), F.col("source"))
        ).alias("n_unlisted"),
    )
    share = F.coalesce(
        *[
            F.when(F.col("source") == s, F.lit(w))
            for s, w in _MIX_TARGETS.items()
        ],
        F.lit(_MIX_REMAINDER) / F.col("n_unlisted"),
    )
    # A source whose char mass is zero (all-empty docs — normal in web
    # corpora) has no share to rebalance: keep-all instead of dividing
    # by zero, which throws under ANSI mode. Same CASE shape in the
    # oracle so the double stays bit-identical.
    rates = per_src.crossJoin(F.broadcast(totals)).select(
        "source",
        F.when(
            F.col("chars_s") > 0,
            F.least(
                F.lit(1.0), share * F.col("total_chars") / F.col("chars_s")
            ),
        )
        .otherwise(F.lit(1.0))
        .alias("rate"),
    )
    return (
        docs.join(F.broadcast(rates), "source")
        .filter(
            (F.col("rate") >= 1.0)
            | (
                _bucket(F.col("doc_id"), _MIX_KEY)
                < F.format_string(
                    "%04x",
                    F.floor(F.col("rate") * 65536).cast("int"),
                )
            )
        )
        .select("doc_id", "source", "lang", "n_chars")
    )


#: Context-window capacity in characters (stand-in for tokens; the cost
#: column is n_chars so the oracle needs no tokenizer).
PACK_CAPACITY = 4096
#: Shards pack independently — parallelism knob, NOT a tuning detail.
PACK_SHARDS = 16


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential packing: fill fixed-size context windows with documents.

    Within each shard, documents are taken in doc_id order and a window
    is cut every time the running size crosses the capacity: pack_id =
    floor(exclusive_prefix_sum / capacity). A document whose cost
    straddles a boundary belongs to the window its prefix started in
    (deterministic; no splitting). This is the standard "sequential
    greedy fill" used for LLM pretraining batches — bin-packing
    optimality is deliberately traded for a single ordered scan.

    Scale: the window partitions by shard, so no global ordering exists;
    each shard is one independent sorted run (sort is the shard's only
    cost). Skew is structurally impossible: shards are a uniform hash of
    doc_id.
    """
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    shard = (F.col("doc_id") % PACK_SHARDS).alias("shard")
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # floor(), not cast(): DuckDB CAST(float AS BIGINT) rounds-to-nearest
    # while Spark's cast truncates — floor is the portable semantics.
    packed = docs.select(shard, "doc_id", "n_chars").withColumn(
        "pack_id",
        F.floor(
            F.coalesce(F.sum("n_chars").over(w), F.lit(0)) / PACK_CAPACITY
        ),
    )
    return (
        packed.groupBy("shard", "pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


def q_pack_efficiency_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-utilization report per shard — the batch-efficiency
    table a pretraining run prints before burning GPU hours: windows
    cut, documents packed, character fill, mean utilization against
    PACK_CAPACITY, and how many windows the no-split policy overfilled
    (a straddling document belongs to the window its prefix started
    in, so individual windows may exceed capacity while the MEAN fill
    stays ~1).

    Pure projection over the q_pack_sequences aggregate (per-shard
    second aggregate on |shards| x |packs| rows); utilization is one
    closing division on exact int64 sums.
    """
    packs = q_pack_sequences(spark, sf_dir)
    return (
        packs.groupBy("shard")
        .agg(
            F.count("*").alias("n_packs"),
            F.sum("n_docs").alias("n_docs"),
            F.sum("total_chars").alias("total_chars"),
            F.sum(
                F.when(F.col("total_chars") > PACK_CAPACITY, 1).otherwise(0)
            ).alias("n_over"),
        )
        .select(
            "shard",
            "n_packs",
            "n_docs",
            "total_chars",
            "n_over",
            (
                F.col("total_chars").cast("double")
                / (F.col("n_packs") * PACK_CAPACITY).cast("double")
            ).alias("utilization"),
        )
    )


def q_export_training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data EXPORT: assign hash-bucket splits, write
    the corpus as split-partitioned parquet shards, read the shards
    back, and return the per-split manifest (doc counts, char totals,
    id ranges).

    This is the delivery step every pipeline ends with: downstream
    trainers read ``split=train/`` by directory (partition pruning — no
    file-level filtering), file sizes are bounded with
    maxRecordsPerFile, and the manifest aggregates come from the
    WRITTEN data, so the hash check against a source-side oracle proves
    the export lost/duplicated nothing — including the split column's
    round trip through the directory name.
    """
    import os
    import tempfile

    docs = load_table(spark, sf_dir, "documents")
    b = _bucket(F.col("doc_id"), _SPLIT_KEY)
    assigned = docs.select(
        "doc_id",
        "lang",
        "n_chars",
        F.when(b < _TRAIN_HI, "train")
        .when(b < _VAL_HI, "val")
        .otherwise("test")
        .alias("split"),
    )
    path = os.path.join(
        tempfile.gettempdir(),
        "spark-graft-export-" + sf_dir.strip("/").replace("/", "_"),
        "corpus",
    )
    (
        assigned.write.mode("overwrite")
        .option("maxRecordsPerFile", 1_000_000)
        .partitionBy("split")
        .parquet(path)
    )
    # Explicit schema on the read-back: an empty corpus writes zero
    # part files (only _SUCCESS), which leaves nothing to infer from;
    # the schema includes the partition column, which Spark fills from
    # the directory names when shards exist.
    back = spark.read.schema(assigned.schema).parquet(path)
    return back.groupBy("split").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


#: RAG / context-window chunking: window width and stride in tokens.
#: stride < width -> adjacent chunks overlap by (width - stride) tokens.
CHUNK_W = 64
CHUNK_STRIDE = 48


def chunk_windows(docs: DataFrame, *passthrough: str) -> DataFrame:
    """(passthrough..., chunk_idx BIGINT, ch ARRAY<STRING>): the shared
    overlapping-window grid over ``docs.text`` — one chunk of CHUNK_W
    tokens every CHUNK_STRIDE tokens, 1 + ceil(max(n - W, 0) / S)
    windows per doc, no chunks for empty docs. Used by both
    q_chunk_documents and pipeline_training_data so the grid arithmetic
    has exactly one definition."""
    from .text_common import TOKENS_EXPR

    n_starts = (
        f"(1 + ((greatest(size(toks) - {CHUNK_W}, 0) + {CHUNK_STRIDE} - 1)"
        f" div {CHUNK_STRIDE}))"
    )
    return (
        docs.select(*passthrough, F.expr(TOKENS_EXPR).alias("toks"))
        .select(
            *passthrough,
            F.expr(
                f"if(size(toks) = 0, array(),"
                f" transform(sequence(0, {n_starts} - 1),"
                f"  i -> slice(toks, i * {CHUNK_STRIDE} + 1, {CHUNK_W})))"
            ).alias("chunks"),
        )
        # OUTER generate + null-filter: same InferFiltersFromGenerate
        # pathology as dedup_spans/shingle_postings.
        .select(
            *passthrough, F.posexplode_outer("chunks").alias("chunk_idx", "ch")
        )
        .filter(F.col("ch").isNotNull())
        .withColumn("chunk_idx", F.col("chunk_idx").cast("long"))
    )


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-token-window chunking — the prep step between
    corpus cleaning and embedding/indexing (RAG) or context-window
    training. Each document yields windows of CHUNK_W tokens starting
    every CHUNK_STRIDE tokens; the final window is tail-truncated, and
    the start grid is ``1 + ceil(max(n - W, 0) / S)`` windows so every
    token is covered and a short doc yields exactly one chunk.

    Output is (doc_id, chunk_idx, n_chunk_tokens, chunk_digest) — the
    digest (md5 of the space-joined window) stands in for chunk text so
    the result stays O(chunks x 32 B) and downstream exact-dedup of
    chunks can run digest-keyed, same as dedup_spans.

    Scale: pure map-side generate — tokenize once per doc, emit
    bounded-fanout windows, zero shuffle; streams at scan speed.
    """
    docs = load_table(spark, sf_dir, "documents")
    return chunk_windows(docs, "doc_id").select(
        "doc_id",
        "chunk_idx",
        F.size("ch").cast("long").alias("n_chunk_tokens"),
        F.md5(F.array_join("ch", " ")).alias("chunk_digest"),
    )


_WSAMPLE_KEY = "wsample:"
_PSAMPLE_KEY = "psample:"
PSAMPLE_K = 100
_PSAMPLE_DENOM = float(1 << 60)

_BOOT_KEY = "boot:"
BOOTSTRAP_B = 32
# Cumulative Poisson(1) CDF, P(X <= k) for k = 0..7, as decimal
# literals: both engines parse the same literal to the same
# correctly-rounded double, so the CASE ladder decides identically.
_POISSON1_CDF = (
    "0.36787944117144233",
    "0.7357588823428847",
    "0.919698602928606",
    "0.9810118431238462",
    "0.9963401531726563",
    "0.9994058151824183",
    "0.9999167588507119",
    "0.9999897508033253",
)


def _poisson_weight_case(u_expr: str) -> str:
    """CASE ladder mapping a uniform in [0,1) to a Poisson(1) draw by
    inverse CDF — shared SQL text for Spark and DuckDB."""
    whens = " ".join(
        f"WHEN {u_expr} < {c} THEN {k}"
        for k, c in enumerate(_POISSON1_CDF)
    )
    return f"CASE {whens} ELSE {len(_POISSON1_CDF)} END"


def q_bootstrap_ci_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POISSON BOOTSTRAP of the mean order value: B=32 deterministic
    resamples, one row each with the replicate's effective sample size
    and mean. The scale-native uncertainty estimator (Chamandy et al.,
    "Estimating Uncertainty for Massive Data Streams", Google 2012):
    classic bootstrap needs n draws WITH replacement per replicate — a
    global shuffle per replicate — while the Poisson(1) approximation
    gives every row an independent per-replicate weight, so all B
    resamples happen in ONE map-side pass. The spread of the 32 means
    IS the sampling distribution of the estimator; a caller takes
    quantiles of these rows for the CI (pytest pins that the interval
    covers the true mean).

    Determinism/exactness: the per-(row, replicate) weight comes from a
    60-bit md5 uniform (exact double: an integer divided by 2^60)
    pushed through an inverse-CDF CASE ladder of shared decimal
    literals — identical decisions in both engines, no RNG state
    anywhere. sum_w and sum_wx are exact int64; the replicate mean is
    ONE int/int double division.

    At 100 TB: the xB row expansion exists only between the scan and
    the first partial aggregate inside each task (explode feeding
    hash-agg over B=32 groups); nothing data-proportional shuffles —
    the exchange carries B rows per task.
    """
    # Finite-measure contract (r12 non-finite probe: the cents cast
    # crashes on NaN/Inf in both engines). Twin mirrors the WHERE.
    # load_parallel (r12): the B=32 explode and its 32 md5 draws per
    # order run BETWEEN the scan and the first partial aggregate, so on
    # a single-split input the whole 32x expansion ran on one core
    # (measured 6.6s -> this is the per-task-work fix of guide §1.2/#2,
    # not a shuffle change — the groupBy("b") exchange still carries
    # only B rows per task).
    o = load_parallel(spark, sf_dir, "orders").filter(finite("o_totalprice"))
    cents = "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
    u = (
        "(CAST(conv(substring(md5(concat("
        f"'{_BOOT_KEY}', CAST(b AS STRING), ':',"
        " CAST(o_orderkey AS STRING))), 1, 15), 16, 10) AS BIGINT)"
        f" / CAST({_PSAMPLE_DENOM} AS DOUBLE))"
    )
    expanded = o.select(
        "o_orderkey",
        F.expr(cents).alias("cents"),
        F.explode(F.expr(f"sequence(1, {BOOTSTRAP_B})")).alias("b"),
    ).select(
        F.col("b").cast("int").alias("b"),
        "cents",
        F.expr(_poisson_weight_case(u)).alias("w"),
    )
    return (
        expanded.groupBy("b")
        .agg(
            F.sum("w").alias("sum_w"),
            F.sum(F.col("w") * F.col("cents")).alias("sum_wx"),
        )
        .select(
            "b",
            "sum_w",
            "sum_wx",
            (
                F.col("sum_wx").cast("double") / F.col("sum_w").cast("double")
            ).alias("mean_cents"),
        )
    )


def q_priority_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITHOUT-replacement weighted sampling by PRIORITY SAMPLING
    (Duffield-Lund-Thorup): each order gets priority w/u with w its
    value in exact cents and u a deterministic md5 uniform in (0,1];
    the sample is the top-k priorities. The estimation-grade
    complement of q_weighted_sample's Bernoulli keep (that one is
    with-replacement in expectation and size-unbounded; this one is
    exactly k rows, and thresholding by the (k+1)-th priority yields
    the published unbiased subset-sum estimator).

    Chosen over Efraimidis-Spirakis u^(1/w) keys deliberately: the
    priority is TWO IEEE-exact divisions on exact operands (cents,
    60-bit hash+1) — no pow()/ln(), so no transcendental knife-edge
    and no quantization needed; ties are impossible (md5 keys are
    distinct per order, and (priority, o_orderkey) totally orders
    regardless). Top-k plans as TakeOrderedAndProject — per-task heap
    + driver merge of tasks x k rows, never a global sort, the same
    scale shape as topk_orders.
    """
    # Finite-measure contract (r12 non-finite probe); twin mirrors.
    o = load_table(spark, sf_dir, "orders").filter(
        finite("o_totalprice")
    )
    cents = "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
    h = (
        "CAST(conv(substring(md5(concat("
        f"'{_PSAMPLE_KEY}', CAST(o_orderkey AS STRING))), 1, 15), 16, 10)"
        " AS BIGINT)"
    )
    scored = o.select(
        "o_orderkey",
        "o_totalprice",
        F.expr(cents).alias("cents"),
        (
            (F.expr(h) + F.lit(1)).cast("double") / F.lit(_PSAMPLE_DENOM)
        ).alias("u"),
    ).select(
        "o_orderkey",
        "o_totalprice",
        "cents",
        (F.col("cents").cast("double") / F.col("u")).alias("priority"),
    )
    return scored.orderBy(
        F.col("priority").desc(), "o_orderkey"
    ).limit(PSAMPLE_K)


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional deterministic sampling: each order is kept
    with probability o_totalprice / max(o_totalprice) — the
    importance-sampling primitive (sample big-ticket rows more) with
    the same reproducibility contract as sample_hash: pure function of
    the key, so re-runs, engines, and incremental loads agree row-for-
    row.

    The keep test is EXACT integer arithmetic — bucket·max_cents <
    cents·65536 (both < 2^63) — never a float probability compare, so
    no boundary row can flip between engines. The max-price scalar is
    one broadcast row; the filter itself is map-side on the scan, zero
    shuffle at any scale.
    """
    # Finite-measure contract (r12 non-finite probe); twin mirrors.
    o = load_table(spark, sf_dir, "orders").filter(
        finite("o_totalprice")
    )
    cents = "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
    mx = o.agg(F.expr(f"max({cents})").alias("max_cents"))
    bucket = F.expr(
        "CAST(conv(substring(md5(concat("
        f"'{_WSAMPLE_KEY}', CAST(o_orderkey AS STRING))), 1, 4), 16, 10)"
        " AS BIGINT)"
    )
    return (
        o.crossJoin(F.broadcast(mx))
        .select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            bucket.alias("bucket"),
            F.expr(cents).alias("cents"),
            "max_cents",
        )
        .filter(F.col("bucket") * F.col("max_cents") < F.col("cents") * 65536)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


# Power-of-two context buckets for dynamic batching, up to the max
# context length. A literal ladder instead of 2^ceil(log2(n)): log2 of
# a power of two is exact in libm but Spark computes log2 as
# log(x)/log(2), whose last ulp can land just below the integer and
# flip ceil() — the ladder has no float anywhere.
_LEN_BUCKETS = [1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024, 2048, 4096, 8192]


def q_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-waste accounting for length-bucketed batching: assign
    every document to the smallest power-of-two context bucket that
    holds it and report, per bucket, the document count, real token
    mass, padding tokens burned, and utilization — the numbers that
    decide a dynamic-batching layout before anyone trains on it.

    All columns are exact int64 (bucket from a literal ladder, padding
    = bucket - n_tokens summed as ints); utilization is ONE int/int
    double division. One corpus scan, map-side bucket assignment, one
    aggregate onto ~14 rows.
    """
    return length_buckets(load_table(spark, sf_dir, "documents"))


def length_buckets(docs: DataFrame) -> DataFrame:
    """See q_length_buckets. docs needs (doc_id, text)."""
    from .text_common import TOKENS_EXPR

    ladder = ",".join(str(b) for b in _LEN_BUCKETS)
    t = docs.select(
        F.expr(f"size({TOKENS_EXPR})").alias("n_tokens")
    ).select(
        "n_tokens",
        # get(), not [0]: a NULL-text doc (NULL n_tokens) or one longer
        # than the top rung filters to an empty ladder, where [0]
        # throws under ANSI; get() yields a NULL bucket, matching
        # DuckDB's out-of-bounds list semantics — such docs surface as
        # a visible NULL-bucket row instead of killing the job.
        F.expr(
            f"get(filter(array({ladder}), b -> b >= n_tokens), 0)"
        ).alias("bucket"),
    )
    return t.groupBy("bucket").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("sum_tokens"),
        F.sum(F.col("bucket") - F.col("n_tokens")).alias("sum_padding"),
        (
            F.sum("n_tokens").cast("double")
            / (F.count("*") * F.col("bucket")).cast("double")
        ).alias("utilization"),
    )


def q_class_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-frequency class weights over the language label —
    sklearn's class_weight='balanced' (w = N / (K * n_class)) as one
    scan: the reweighting table a loss function or a sampler consumes
    to undo label skew.

    Totals (N and the class count K) are window aggregates over the
    already-grouped |lang|-row domain, never a second corpus scan (the
    seasonality_dow device); the weight is ONE division of exact int64
    operands.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("lang").agg(F.count("*").alias("n_docs"))
    w = Window.partitionBy()
    return c.select(
        "lang",
        "n_docs",
        F.sum("n_docs").over(w).alias("n_total"),
        F.count("*").over(w).alias("n_classes"),
        (
            F.sum("n_docs").over(w).cast("double")
            / (F.count("*").over(w) * F.col("n_docs")).cast("double")
        ).alias("weight"),
    )


PSEUDO_SALT = "salt-v1"


def q_pseudonymize_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy-preserving pseudonymization — the GDPR/CCPA prep step
    before analytics data leaves its enclave: user ids map to salted
    sha-256 tokens (16 hex chars kept), which destroys re-identification
    while PRESERVING join consistency (same user -> same token, so
    per-user aggregation, retention, and cross-table joins still work
    on the pseudonymized output). The aggregate per token — event
    count, distinct active days, distinct event types — is exactly the
    rollup a downstream consumer would compute, proving the token is a
    working join key.

    Map-side hash + one aggregate; sha2 hex output is identical across
    engines (lowercase hex of the same UTF-8 input). The salt is a
    pipeline constant — rotating it is the documented re-keying story
    (tokens change, linkage within one salt epoch remains).
    """
    # NULL user rail (r11 NULL sweep): a NULL user_id is not a user —
    # and unguarded it DIVERGES, because Spark's concat_ws SKIPS NULL
    # args (token = hash of the bare salt) while the twin's || nulls
    # out. Twin mirrors the WHERE.
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    tok = ev.select(
        F.substring(
            F.sha2(
                F.concat_ws("|", F.lit(PSEUDO_SALT), F.col("user_id")), 256
            ),
            1,
            16,
        ).alias("user_token"),
        F.to_date(F.col("ts").cast("timestamp_ntz")).alias("day"),
        "event_type",
    )
    return tok.groupBy("user_token").agg(
        F.count("*").alias("n_events"),
        F.count_distinct("day").alias("n_active_days"),
        F.count_distinct("event_type").alias("n_event_types"),
    )


QUERIES = {
    "pseudonymize_users": q_pseudonymize_users,
    "split_train_test": q_split_train_test,
    "weighted_sample": q_weighted_sample,
    "priority_sample_topk": q_priority_sample_topk,
    "bootstrap_ci_mean": q_bootstrap_ci_mean,
    "sample_hash": q_sample_hash,
    "stratified_sample": q_stratified_sample,
    "domain_mix_sample": q_domain_mix_sample,
    "pack_sequences": q_pack_sequences,
    "pack_efficiency_report": q_pack_efficiency_report,
    "export_training_shards": q_export_training_shards,
    "chunk_documents": q_chunk_documents,
    "length_buckets": q_length_buckets,
    "class_weights": q_class_weights,
}

_BOOT_U_DUCK = (
    f"(CAST(('0x' || substr(md5('{_BOOT_KEY}' || CAST(b AS VARCHAR) || ':'"
    " || CAST(o_orderkey AS VARCHAR)), 1, 15)) AS BIGINT)"
    f" / CAST({_PSAMPLE_DENOM} AS DOUBLE))"
)

ORACLE = {
    "bootstrap_ci_mean": f"""
WITH expanded AS (
  SELECT CAST(b AS INT) AS b,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         {_poisson_weight_case(_BOOT_U_DUCK)} AS w
  FROM orders, (SELECT UNNEST(range(1, {BOOTSTRAP_B + 1})) AS b)
  WHERE isfinite(o_totalprice))
SELECT b, CAST(SUM(w) AS BIGINT) AS sum_w,
       CAST(SUM(w * cents) AS BIGINT) AS sum_wx,
       CAST(SUM(w * cents) AS DOUBLE) / CAST(SUM(w) AS DOUBLE) AS mean_cents
FROM expanded GROUP BY b
""",
    "priority_sample_topk": f"""
SELECT o_orderkey, o_totalprice, cents,
       CAST(cents AS DOUBLE) / u AS priority
FROM (
  SELECT o_orderkey, o_totalprice,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         CAST(CAST(('0x' || substr(md5('{_PSAMPLE_KEY}'
                    || CAST(o_orderkey AS VARCHAR)), 1, 15)) AS BIGINT) + 1
              AS DOUBLE) / {_PSAMPLE_DENOM} AS u
  FROM orders WHERE isfinite(o_totalprice))
ORDER BY priority DESC, o_orderkey
LIMIT {PSAMPLE_K}
""",
    "pseudonymize_users": f"""
SELECT substr(sha256('{PSEUDO_SALT}' || '|' || CAST(user_id AS VARCHAR)),
              1, 16) AS user_token,
       count(*) AS n_events,
       count(DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS n_active_days,
       count(DISTINCT event_type) AS n_event_types
FROM events
WHERE user_id IS NOT NULL
GROUP BY 1
""",
    "weighted_sample": f"""
WITH mx AS (
  SELECT max(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
           AS max_cents
  FROM orders WHERE isfinite(o_totalprice)
)
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders CROSS JOIN mx
WHERE isfinite(o_totalprice)
  AND CAST(('0x' || substr(md5('{_WSAMPLE_KEY}' || CAST(o_orderkey AS VARCHAR)),
                           1, 4)) AS BIGINT) * max_cents
      < CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) * 65536
""",
    "export_training_shards": f"""
WITH assigned AS (
  SELECT doc_id, n_chars,
         CASE WHEN substr(md5('{_SPLIT_KEY}' || CAST(doc_id AS VARCHAR)), 1, 4)
                   < '{_TRAIN_HI}' THEN 'train'
              WHEN substr(md5('{_SPLIT_KEY}' || CAST(doc_id AS VARCHAR)), 1, 4)
                   < '{_VAL_HI}' THEN 'val'
              ELSE 'test' END AS split
  FROM documents
)
SELECT split, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
FROM assigned GROUP BY split
""",
    "split_train_test": f"""
SELECT doc_id, lang,
       substr(md5('{_SPLIT_KEY}' || CAST(doc_id AS VARCHAR)), 1, 4) AS bucket,
       CASE WHEN substr(md5('{_SPLIT_KEY}' || CAST(doc_id AS VARCHAR)), 1, 4)
                 < '{_TRAIN_HI}' THEN 'train'
            WHEN substr(md5('{_SPLIT_KEY}' || CAST(doc_id AS VARCHAR)), 1, 4)
                 < '{_VAL_HI}' THEN 'val'
            ELSE 'test' END AS split
FROM documents
""",
    "sample_hash": f"""
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE substr(md5('{_SAMPLE_KEY}' || CAST(doc_id AS VARCHAR)), 1, 4)
      < '{_SAMPLE_HI}'
""",
    # The remainder share is embedded from the SAME Python double the
    # Spark plan uses (repr round-trips exactly), so share arithmetic
    # is bit-identical in both engines.
    "domain_mix_sample": f"""
WITH per_src AS (
  SELECT source, CAST(SUM(n_chars) AS DOUBLE) AS chars_s
  FROM documents GROUP BY source
),
totals AS (
  SELECT CAST(SUM(n_chars) AS DOUBLE) AS total_chars,
         count(DISTINCT CASE WHEN source NOT IN
               ({", ".join(f"'{s}'" for s in _MIX_TARGETS)})
               THEN source END) AS n_unlisted
  FROM documents
),
rates AS (
  SELECT source,
         CASE WHEN chars_s > 0 THEN
           least(CAST(1.0 AS DOUBLE),
                 (CASE {" ".join(f"WHEN source = '{s}' THEN CAST({w!r} AS DOUBLE)" for s, w in _MIX_TARGETS.items())}
                       ELSE CAST({_MIX_REMAINDER!r} AS DOUBLE) / n_unlisted END)
                 * total_chars / chars_s)
         ELSE CAST(1.0 AS DOUBLE) END AS rate
  FROM per_src, totals
)
SELECT doc_id, source, lang, n_chars
FROM documents JOIN rates USING (source)
WHERE rate >= 1.0
   OR substr(md5('{_MIX_KEY}' || CAST(doc_id AS VARCHAR)), 1, 4)
      < printf('%04x', CAST(floor(rate * 65536) AS INT))
""",
    "stratified_sample": f"""
SELECT doc_id, lang, n_chars
FROM documents
WHERE substr(md5('{_SAMPLE_KEY}' || CAST(doc_id AS VARCHAR)), 1, 4)
      < CASE lang WHEN 'en' THEN '{_STRATA["en"]}'
                  WHEN 'es' THEN '{_STRATA["es"]}'
                  ELSE '{_STRATA_DEFAULT}' END
""",
    "pack_sequences": f"""
WITH costed AS (
  SELECT doc_id % {PACK_SHARDS} AS shard, doc_id, n_chars,
         CAST(floor(coalesce(sum(n_chars) OVER (
             PARTITION BY doc_id % {PACK_SHARDS} ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              / {PACK_CAPACITY}) AS BIGINT) AS pack_id
  FROM documents
)
SELECT shard, pack_id, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM costed GROUP BY shard, pack_id
""",
    "pack_efficiency_report": f"""
WITH costed AS (
  SELECT doc_id % {PACK_SHARDS} AS shard, doc_id, n_chars,
         CAST(floor(coalesce(sum(n_chars) OVER (
             PARTITION BY doc_id % {PACK_SHARDS} ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              / {PACK_CAPACITY}) AS BIGINT) AS pack_id
  FROM documents
),
packs AS (
  SELECT shard, pack_id, count(*) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS total_chars
  FROM costed GROUP BY shard, pack_id
)
SELECT shard,
       CAST(COUNT(*) AS BIGINT) AS n_packs,
       CAST(SUM(n_docs) AS BIGINT) AS n_docs,
       CAST(SUM(total_chars) AS BIGINT) AS total_chars,
       CAST(SUM(CASE WHEN total_chars > {PACK_CAPACITY} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_over,
       CAST(SUM(total_chars) AS DOUBLE)
         / CAST(COUNT(*) * {PACK_CAPACITY} AS DOUBLE) AS utilization
FROM packs GROUP BY shard
""",
}

from .text_common import DUCK_TOKENS as _DUCK_TOKENS  # noqa: E402

ORACLE["chunk_documents"] = f"""
WITH toks AS (SELECT doc_id, {_DUCK_TOKENS} AS t FROM documents),
grid AS (
  SELECT doc_id, t, CAST(i AS BIGINT) AS chunk_idx,
         CAST(i AS INT) * {CHUNK_STRIDE} AS start
  FROM toks, range(0, 100000) r(i)
  WHERE len(t) > 0
    AND CAST(i AS INT) <
        1 + ((greatest(len(t) - {CHUNK_W}, 0) + {CHUNK_STRIDE} - 1) // {CHUNK_STRIDE})
),
cut AS (
  SELECT doc_id, chunk_idx, t[start + 1 : start + {CHUNK_W}] AS ch FROM grid
)
SELECT doc_id, chunk_idx, CAST(len(ch) AS BIGINT) AS n_chunk_tokens,
       md5(array_to_string(ch, ' ')) AS chunk_digest
FROM cut
"""

_LADDER_SQL = ", ".join(str(b) for b in _LEN_BUCKETS)

ORACLE["length_buckets"] = f"""
WITH t AS (
  SELECT CAST(len({_DUCK_TOKENS}) AS INT) AS n_tokens FROM documents
),
b AS (
  SELECT n_tokens,
         list_filter([{_LADDER_SQL}], b -> b >= n_tokens)[1] AS bucket
  FROM t
)
SELECT bucket, count(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
       CAST(SUM(bucket - n_tokens) AS BIGINT) AS sum_padding,
       CAST(SUM(n_tokens) AS DOUBLE) / CAST(count(*) * bucket AS DOUBLE)
         AS utilization
FROM b GROUP BY bucket
"""

ORACLE["class_weights"] = """
WITH c AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n_total,
             count(*) AS n_classes FROM c)
SELECT c.lang, c.n_docs, t.n_total, t.n_classes,
       CAST(t.n_total AS DOUBLE)
         / CAST(t.n_classes * c.n_docs AS DOUBLE) AS weight
FROM c CROSS JOIN t
"""
