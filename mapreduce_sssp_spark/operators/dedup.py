"""Deduplication operators over ``documents`` — the LLM-training-data
pipeline surface (SURVEY.md §7 P3).

Each method is a first-class oracle-checked query:

* ``dedup_exact``      — hash-groupBy on sha2(text). At 100 TB the group
  key is the 32-byte digest, never the document body, so shuffle bytes
  are O(rows), not O(corpus).
* ``ngram_jaccard_pairs`` — *exact* near-dup pairs via the inverted
  shingle index: explode (doc, shingle), self-join on shingle, count
  intersections, filter Jaccard >= t. One shuffle keyed by shingle; AQE
  skew-split absorbs hot shingles. This is the exact-but-quadratic-in-
  collisions method; at 100 TB prefer ``dedup_minhash``.
* ``dedup_minhash``    — MinHash signatures + LSH banding: 64 hashes,
  16 bands x 4 rows. Candidate pairs come from band-bucket joins (only
  docs sharing a band hash ever meet — no all-pairs anywhere), then are
  exact-verified to Jaccard >= 0.8. Signatures use a PORTABLE universal
  hash family (one md5 per shingle -> 60-bit int, then 64 affine maps
  mod the Mersenne prime 2^31-1), so the DuckDB twin mirrors the ENTIRE
  pipeline — signatures, banding, the bucket-size cap, verification —
  and the hash check proves the exact plan that ships, cap included
  (r9 verdict: the cap must be contract, not caveat). The banding miss
  probability 1-(1-s^4)^16 (< 3e-4 at s = 0.8, < 1e-11 for planted
  near-dups at s >= 0.95) is now symmetric across both engines rather
  than a divergence risk.
* ``dedup_simhash``    — 32-bit SimHash per document, computed in ONE
  pass over the token array with aggregate/zip_with (no 32x row blowup;
  the oracle uses the blowup formulation, the engine does not).
* ``dedup_incremental`` — incoming batch anti-joined against the
  existing corpus on digest (the production ingestion shape).
* ``decontaminate_ngrams`` — benchmark/eval-set contamination sweep:
  broadcast the (tiny) benchmark shingle set, count per-doc overlap;
  the corpus side never shuffles.
* ``dedup_spans``      — C4-style sub-document dedup: fixed 10-token
  spans, first corpus occurrence elected per md5(span) via partial
  agg + join-back (window-free, hot-span safe).

All hashing is expression-level (md5/xxhash64) — JVM codegen, no UDFs.
Reference has no dedup surface; this extends it per the driver contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io.sources import load_parallel, load_table
from .text_common import (
    DUCK_SHINGLES_PRUNED_REL,
    DUCK_SHINGLES_REL,
    DUCK_TOKENS,
    SHINGLE_MAX_DF,
    TOKENS_EXPR,
    prune_hot_shingles,
    shingle_postings,
    with_shingles,
)

JACCARD_THRESHOLD = 0.8
MINHASH_K = 64
LSH_BANDS = 16
LSH_ROWS = 4

# Universal-hash minhash device (portable across Spark and DuckDB):
# each shingle is hashed ONCE to a 60-bit integer H via md5 (both
# engines produce identical bits — the minhash_jaccard_error device),
# then sig[i] = min over shingles of (a_i * (H % P) + b_i) % P with
# P = 2^31 - 1 (Mersenne). a_i < P and H % P < P keep every product
# under 2^62, so the arithmetic is exact int64 in both engines — no
# engine-private hash (xxhash64) anywhere in the signature path, which
# is what lets the DuckDB twin mirror banding and the bucket cap
# bit-for-bit. Cost: ONE md5 per posting plus 64 integer affine maps,
# vs the previous 64 xxhash64 string hashes per posting.
MINHASH_P = (1 << 31) - 1


def _minhash_coeffs(k: int = MINHASH_K) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) pairs for the affine maps: a fixed-seed
    64-bit LCG (Knuth MMIX multiplier), reduced to a_i in [1, P) and
    b_i in [0, P). Pure integers — both engines embed them as literals,
    so there is no RNG to keep in sync."""
    coeffs = []
    x = 0x9E3779B97F4A7C15
    for _ in range(k):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        a = (x >> 17) % (MINHASH_P - 1) + 1
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        b = (x >> 17) % MINHASH_P
        coeffs.append((a, b))
    return coeffs


MINHASH_COEFFS = _minhash_coeffs()


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate groups: keep min(doc_id) per identical text."""
    docs = load_parallel(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.sha2("text", 256).alias("digest"))
        .groupBy("digest")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
        .select("keep_id", "n_copies")
    )


def _shingle_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return shingle_postings(load_table(spark, sf_dir, "documents"))


def _pruned_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max-df-pruned shingle postings for the PAIR-GENERATING queries
    (jaccard / containment / estimator-audit / contamination): shingles
    in more than SHINGLE_MAX_DF documents are dropped BEFORE any
    shingle-keyed self-join, bounding the join fan-out per shingle by
    SHINGLE_MAX_DF^2 (see text_common.SHINGLE_MAX_DF — the cap never
    binds at test scale, so values are unchanged there; at corpus scale
    it is the difference between a bounded join and a d^2 blow-up on
    boilerplate shingles).

    Sizes/signatures downstream are computed over the SAME pruned
    vocabulary, so jaccard/containment remain well-defined set measures
    (over the discriminative shingle set) and each DuckDB twin mirrors
    the prune via DUCK_SHINGLES_PRUNED_REL. The linear-path consumers
    (decontaminate, spans, minhash signatures for LSH banding) keep the
    unpruned postings.

    Both the raw postings (consumed twice by the prune: df agg + anti-
    join probe) and the pruned output (consumed by sizes agg + both
    self-join sides) are multi-branch subtrees — cached per the _cache
    contract. Dropping the pruned cache and re-deriving the (broadcast)
    anti join per consumer was A/B-measured at sf0.1 and lost (2.7-3.0s
    cached vs 3.3-3.6s warm): the hot-set aggregate replays per branch
    and costs more than the cache write. The residual prune tax at
    sf0.1 is fixed per-job scheduler overhead (~1s across the df agg +
    anti join on a 260k-row relation), not data cost — at corpus scale
    both passes are linear and the anti join never shuffles postings.
    """
    post = _cache(_shingle_postings(spark, sf_dir))
    return _cache(prune_hot_shingles(post))


def _cache(df: DataFrame) -> DataFrame:
    """Short-lived cache for a subtree referenced by several plan
    branches. Spark's exchange-reuse does NOT reliably kick in for these
    self-join shapes under AQE (measured 4-5x recompute overhead), so the
    shared subtree is persisted explicitly. Footprint is a few MB of
    signatures/postings per query; entries are dropped with the session.

    Registered and materialized under a core-count shuffle-partition
    clamp: cached plans compile their exchanges with the conf in force
    at persist() time and are exempt from AQE coalescing, so on a stock
    200-partition session the minhash-signature aggregation would run
    200-task stages regardless of data size (same pathology measured on
    triangles/similarity; see similarity._cache). defaultParallelism,
    not input bytes — shingling/hashing is compute-bound.
    """
    from pyspark.storagelevel import StorageLevel

    from ..graph.sssp import static_rounds

    spark = df.sparkSession
    with static_rounds(spark):  # clamp = defaultParallelism
        # No eager action needed: the clamp's effect is the partitioning
        # compiled into the cached plan at persist() time (asserted in
        # tests/test_cache_clamp.py); the first consumer materializes.
        return df.persist(StorageLevel.MEMORY_AND_DISK)


def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram-shingle Jaccard >= 0.8 pairs via inverted index,
    over the max-df-pruned shingle vocabulary (see _pruned_postings —
    no-op at test scale, join-bounding at corpus scale)."""
    post = _pruned_postings(spark, sf_dir)
    sizes = post.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = post.alias("a")
    b = post.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))).alias(
                "jaccard"
            ),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


CONTAINMENT_THRESHOLD = 0.9


def q_shingle_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-dup detection: directed pairs where >= 90% of
    doc_a's 3-gram shingles appear in doc_b — the quote/excerpt/
    boilerplate-superset relation that symmetric Jaccard misses (a
    short doc fully contained in a long one scores low Jaccard but
    containment 1.0). The standard second screen of corpus dedup after
    the Jaccard pass.

    Same inverted-index shape as q_ngram_jaccard_pairs (one
    shingle-keyed self-join over the max-df-pruned vocabulary, never
    all-pairs; candidate pairs exist only where discriminative shingles
    actually collide), but the join keeps BOTH orientations (a != b,
    not a < b) because containment is directed. Division is the same
    single int/int double op the Jaccard twin uses.
    """
    post = _pruned_postings(spark, sf_dir)
    sizes = post.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = post.alias("a")
    b = post.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    return (
        inter.join(sa, "doc_a")
        .select(
            "doc_a",
            "doc_b",
            "inter",
            "na",
            (F.col("inter") / F.col("na")).alias("containment"),
        )
        .filter(F.col("containment") >= CONTAINMENT_THRESHOLD)
    )


def minhash_signatures(docs: DataFrame, k: int = MINHASH_K) -> DataFrame:
    """(doc_id, sig: array<bigint> of k min-hashes over shingles).

    sig[i] = min over shingles s of (a_i * (H(s) % P) + b_i) % P where
    H(s) is the portable 60-bit md5 device (see MINHASH_P) — computed as
    ONE md5 projection per posting followed by k MIN aggregates over the
    exploded (doc_id, shingle) postings. Whole-stage codegen with
    map-side partial mins, and every value is reproducible in DuckDB
    (the oracle twins re-derive the same signatures), which is what
    makes the LSH bucket cap a checkable contract rather than an
    engine-private caveat.
    """
    # shingle-less docs emit no postings and so vanish naturally, matching
    # the "only docs with shingles get signatures" contract.
    return minhash_signatures_from_postings(shingle_postings(docs), k)


def minhash_signatures_from_postings(
    post: DataFrame, k: int = MINHASH_K
) -> DataFrame:
    """Signature aggregation over PRE-BUILT (doc_id, s) postings — the
    shared-subtree entry point (r11 claw-back, r10 verdict #3): callers
    that already hold a cached shingle relation (minhash_verified_pairs
    caches with_shingles for its exact-verify side) explode THAT instead
    of letting the signature path re-run the whole tokenize+shingle
    pipeline a second time over the corpus (the r10 portable-signature
    change was billed for a regression that was really this duplicated
    shingling)."""
    hv = post.select(
        "doc_id",
        (
            F.conv(F.substring(F.md5("s"), 1, 15), 16, 10).cast("bigint")
            % MINHASH_P
        ).alias("h"),
    )
    # The LCG stream is deterministic for any k, so a caller asking for
    # more than the precomputed MINHASH_K hashes gets a longer prefix of
    # the SAME sequence (coeffs[i] never depends on k).
    coeffs = _minhash_coeffs(k) if k > len(MINHASH_COEFFS) else MINHASH_COEFFS[:k]
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % MINHASH_P).alias(f"h{i}")
        for i, (a, b) in enumerate(coeffs)
    ]
    return (
        hv.groupBy("doc_id")
        .agg(*aggs)
        .select("doc_id", F.array(*[F.col(f"h{i}") for i in range(k)]).alias("sig"))
    )



# Max docs per LSH band bucket kept in candidate generation. Band hashes
# of DISTINCT signatures spread uniformly, but b documents with the SAME
# signature (boilerplate mirrors, near-identical template pages) land in
# one bucket in EVERY band and generate b^2 candidate pairs — the same
# quadratic the shingle family's SHINGLE_MAX_DF closes, one level up.
# Buckets above the cap are dropped from candidate generation: the pair
# OUTPUT for such a cluster is itself Theta(b^2), so no generator can
# keep it and scale — production pipelines run exact dedup FIRST
# (pipeline_clean_corpus's stage order), which collapses identical docs
# before LSH ever sees them, and cluster-level survivors (not pair
# lists) are the deliverable for what remains. Rarely binds at test
# scale (max observed bucket: 4 at sf0.1), and since r10 the cap is
# CONTRACT, not caveat: the DuckDB twins mirror signatures, banding and
# this cap (see _LSH_PAIRS_SQL), so a bucket that binds produces the
# same dropped pairs in both engines and the hash check still holds.
LSH_MAX_BUCKET = 400


def lsh_candidate_pairs(
    sigs: DataFrame,
    bands: int = LSH_BANDS,
    rows: int = LSH_ROWS,
    max_bucket: int = LSH_MAX_BUCKET,
) -> DataFrame:
    """Distinct (doc_a < doc_b) pairs sharing at least one LSH band hash.

    Docs are grouped by (band_id, band_hash); only same-bucket docs
    join, and buckets larger than ``max_bucket`` are dropped BEFORE the
    self-join (see LSH_MAX_BUCKET), bounding per-bucket fan-out at
    cap^2. At 100 TB the bucket join is the only shuffle, keyed by a
    64-bit hash — uniform across DISTINCT signatures; the cap is the
    rail for identical-signature clusters, which no hash can spread.

    The cap is applied as a partial-aggregating OVERSIZED-buckets table
    anti-joined back, NOT a window count: a window must route and
    buffer the ENTIRE hot bucket in one task before its filter can drop
    a row — re-concentrating exactly the pathological bucket the cap
    exists to rail against — while the groupBy map-side combines a hot
    bucket to one row per input partition and the anti join streams.
    The oversized table is small whenever the cap is doing its job (one
    row per over-cap bucket), so AQE plans the anti join as a broadcast
    at runtime; no explicit hint, so a degenerate corpus where most
    buckets exceed the cap still gets a shuffled anti join instead of a
    driver OOM.

    The engine buckets by xxhash64 of the band row for an 8-byte
    shuffle key; the DuckDB twin buckets by the raw 4-value row itself.
    Membership is identical up to a 2^-64 band-hash collision (which
    could only MERGE two buckets engine-side) — the same negligible
    class as the banding miss probability, and the only engine-private
    hash left in the pipeline (the signature values themselves are
    portable, see minhash_signatures).
    """
    banded = sigs.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {bands - 1}),"
                f" j -> xxhash64(j, {', '.join(f'sig[{rows}*j+{r}]' for r in range(rows))}))"
            )
        ).alias("band_id", "band_hash"),
    )
    oversized = (
        banded.groupBy("band_id", "band_hash")
        .agg(F.count("*").alias("bucket_n"))
        .filter(F.col("bucket_n") > max_bucket)
        .select("band_id", "band_hash")
    )
    # Cached because both self-join legs read it; `banded` itself is a
    # cheap posexplode over the caller-cached signatures, so its two
    # consumers (the sizes agg and the anti-join probe) recompute it.
    kept = _cache(
        banded.join(oversized, ["band_id", "band_hash"], "left_anti")
    )
    a = kept.alias("a")
    b = kept.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .dropDuplicates()
    )


def minhash_verified_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_a < doc_b, jaccard): LSH candidate pairs exact-verified to
    Jaccard >= 0.8 — the shared first half of ``dedup_minhash`` (which
    returns the pairs) and ``dedup_minhash_clusters`` (which closes them
    into components)."""
    docs = load_parallel(spark, sf_dir, "documents")
    sh = _cache(with_shingles(docs))
    # The signature path explodes the SAME cached shingle relation the
    # exact-verify side reads (minhash_signatures_from_postings) — one
    # tokenize+shingle pass per query, not two (r11 claw-back).
    post = sh.select("doc_id", F.explode_outer("sh").alias("s")).filter(
        F.col("s").isNotNull()
    )
    # sigs feeds the banded explode TWICE (the oversized-bucket agg and
    # the anti-join probe), so the persist keeps the 64-agg signature
    # pass from running twice; the clamped partitioning it pins
    # downstream rides along (see _cache).
    cand = lsh_candidate_pairs(_cache(minhash_signatures_from_postings(post)))
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    return (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.size(F.array_intersect("sh_a", "sh_b"))
                / (
                    F.size("sh_a")
                    + F.size("sh_b")
                    - F.size(F.array_intersect("sh_a", "sh_b"))
                )
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs, exact-verified to Jaccard >= 0.8."""
    return minhash_verified_pairs(spark, sf_dir)


def q_dedup_minhash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy-dedup CLUSTERS: the production step after pair finding.

    Near-dup pairs only say "a looks like b"; what a pipeline ships is
    one survivor per near-dup *cluster* (pair similarity is not
    transitive, so clusters are the connected components of the pair
    graph — the C4/SlimPajama formulation). This runs the engine's own
    ``wcc`` fixpoint (pointer-jumping min-label propagation,
    O(log diameter) rounds) over the exact-verified LSH pairs and elects
    canon_id = min(doc_id) per component.

    Scale shape: the pair graph is TINY relative to the corpus (only
    docs with a >= 0.8-Jaccard partner appear), so the closure runs on
    the reduced edge set, never the corpus. Near-dup components are
    short-diameter by construction, so the fixpoint converges in a few
    rounds regardless of corpus size.

    Output: (doc_id, canon_id, kept) for every doc in at least one
    near-dup pair; kept marks the cluster survivor. Docs with no
    near-dup partner are implicitly all kept (anti-join this result to
    drop losers — the ``dedup_incremental`` composition).
    """
    from ..graph.wcc import wcc

    pairs = minhash_verified_pairs(spark, sf_dir)
    comp = wcc(
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    )
    return comp.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("canon_id"),
        (F.col("node") == F.col("component")).alias("kept"),
    )


def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-ranked survivor election per near-dup cluster — the
    production refinement of min-id canonicalization: within each
    minhash cluster keep the HIGHEST-QUALITY member (longest text,
    doc_id tiebreak), which is what corpus pipelines actually ship
    (near-dups differ — truncations, boilerplate-stripped variants —
    and min-id throws the best copy away half the time). Output one row
    per cluster: (canon_id, keep_id, kept_n_chars, n_members).

    Same reduced-graph scale shape as dedup_minhash_clusters (the wcc
    closure runs on the pair graph, never the corpus); the election is
    one max-of-struct aggregate — map-side combinable, no window over
    the corpus. (n_chars, -doc_id) is strict-ordered per doc, so the
    argmax is deterministic; all-integer comparisons.
    """
    from ..graph.wcc import wcc

    pairs = minhash_verified_pairs(spark, sf_dir)
    comp = wcc(
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    )
    docs = load_parallel(spark, sf_dir, "documents").select(
        "doc_id", "n_chars"
    )
    member = comp.select(
        F.col("node").alias("doc_id"), F.col("component").alias("canon_id")
    ).join(docs, "doc_id")
    return (
        member.groupBy("canon_id")
        .agg(
            F.count("*").alias("n_members"),
            F.max(
                F.struct(
                    F.col("n_chars").alias("nc"),
                    (-F.col("doc_id")).alias("nid"),
                )
            ).alias("best"),
        )
        .select(
            "canon_id",
            (-F.col("best.nid")).alias("keep_id"),
            F.col("best.nc").alias("kept_n_chars"),
            "n_members",
        )
    )


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per document over distinct tokens, one JVM pass.

    Token hash = first 8 md5 hex chars as uint32 (md5 exists in both
    engines, so the oracle can reproduce the exact bits). Bit j of the
    output is the sign of sum over tokens of ±1 per token-hash bit j.

    Token-less documents (empty or whitespace-only text) get NO
    signature — the minhash convention ("only docs with shingles get
    signatures"), and what the twin's unnest naturally produces; the
    engine's aggregate over an empty token array would otherwise emit
    simhash 0, pairing every blank page with every other (probed r10
    on an adversarial corpus: 22 vs 20 rows).
    """
    docs = load_parallel(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.expr(f"array_distinct({TOKENS_EXPR})").alias("toks"),
    ).filter(F.size("toks") > 0).select(
        "doc_id",
        F.expr(
            "aggregate("
            " toks,"
            " array_repeat(0L, 32),"
            " (acc, tok) -> ("
            "   zip_with(acc,"
            "     transform(sequence(0, 31),"
            "       j -> if((shiftright(cast(conv(substring(md5(tok), 1, 8), 16, 10) as bigint), j) & 1) = 1, 1L, -1L)),"
            "     (x, y) -> x + y)),"
            " acc -> aggregate("
            "   zip_with(acc, sequence(0, 31), (c, j) -> if(c > 0, shiftleft(1L, j), 0L)),"
            "   0L, (x, y) -> x + y))"
        ).alias("simhash"),
    )


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingestion dedup: the shape every production corpus
    actually runs — an INCOMING batch deduplicated against the EXISTING
    corpus, not all-pairs over everything.

    Existing = doc_id % 10 != 0, incoming = the rest (deterministic
    stand-ins for "corpus so far" / "today's crawl"). Incoming docs
    survive if their sha2 digest matches nothing in the existing corpus
    AND they are the min-doc_id holder of their digest within the batch
    (intra-batch dedup). Both steps are digest-keyed — shuffle bytes are
    O(rows x 32 bytes) regardless of document size, and at 100 TB the
    existing side is a bucketed digest table so the anti join rides the
    bucket layout with no exchange (see sink_bucketed_join).
    """
    # text IS NOT NULL (r11 NULL sweep): a NULL-text doc has no digest
    # and takes part in no dedup; twin mirrors (and uses NOT EXISTS —
    # its former NOT IN form collapsed to zero rows on one NULL digest).
    docs = load_parallel(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    digests = docs.select("doc_id", F.sha2("text", 256).alias("digest"))
    existing = digests.filter(F.col("doc_id") % 10 != 0)
    incoming = digests.filter(F.col("doc_id") % 10 == 0)
    batch_keep = incoming.groupBy("digest").agg(F.min("doc_id").alias("doc_id"))
    return (
        batch_keep.join(existing.select("digest"), "digest", "left_anti")
        .select("doc_id", "digest")
    )


BENCH_MOD = 20  # benchmark/eval-set stand-in: doc_id % BENCH_MOD == 0
SPAN_TOKENS = 10  # sub-document dedup span width (tokens)


def q_decontaminate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag corpus documents that share any
    3-gram shingle with the benchmark/eval set (here doc_id % 20 == 0
    stands in for the held-out benchmark corpus).

    The shape that matters at 100 TB: the benchmark side is tiny and
    fixed (eval sets are MBs; the corpus is TBs), so its distinct
    shingle set is explicitly broadcast — the corpus side is scanned
    once, joined map-side with zero shuffle of corpus rows, and the
    per-doc overlap count partial-aggregates before the only exchange
    (keyed by doc_id, one row per contaminated doc). Never join this
    the other way around: shuffling corpus shingles to meet a
    benchmark-keyed side would move the whole corpus.

    Output: (doc_id, n_hits) for contaminated corpus docs — n_hits =
    number of distinct shingles shared with the benchmark (the triage
    ranking a curator reviews before dropping documents).
    """
    post = _cache(_shingle_postings(spark, sf_dir))
    bench = (
        post.filter(F.col("doc_id") % BENCH_MOD == 0).select("s").distinct()
    )
    corpus = post.filter(F.col("doc_id") % BENCH_MOD != 0)
    # Postings are distinct per (doc_id, s), so count(*) counts distinct
    # shared shingles.
    return (
        corpus.join(F.broadcast(bench), "s")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )


def q_dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document (span-level) exact dedup, C4-style: every document
    is chunked into fixed 10-token spans (trailing partial span kept)
    and a span survives only at its FIRST corpus occurrence — minimal
    (doc_id, span_idx) — so boilerplate repeated across documents is
    dropped everywhere but once while the containing documents live on.

    Scale shape: the dedup key is md5(span) — shuffle bytes are
    O(spans x 16 B), never document bodies. First-occurrence election
    is a partial-aggregating groupBy(min(struct(doc_id, span_idx)))
    joined back on the digest, NOT a window over the corpus: a span
    duplicated 10^9 times map-side combines to one row per partition in
    the agg, and the skewed probe side of the join-back is AQE
    skew-split — a window would funnel that span's every occurrence
    through one task.

    Output: (doc_id, span_idx, kept) — the keep/drop verdict per span.
    """
    docs = load_parallel(spark, sf_dir, "documents")
    n_spans = f"int(ceil(size(toks) / {SPAN_TOKENS}.0))"
    spans = (
        docs.select("doc_id", F.expr(TOKENS_EXPR).alias("toks"))
        .select(
            "doc_id",
            F.expr(
                f"if(size(toks) = 0, array(),"
                f" transform(sequence(0, {n_spans} - 1),"
                f"  i -> concat_ws(' ', slice(toks, i * {SPAN_TOKENS} + 1,"
                f" {SPAN_TOKENS}))))"
            ).alias("spans"),
        )
        # OUTER generate + null-filter, same reason as shingle_postings:
        # a non-outer Generate lets InferFiltersFromGenerate push the
        # whole span pipeline below the repartition into the scan as an
        # inferred filter, re-evaluating tokenize+chunk per row.
        .select("doc_id", F.posexplode_outer("spans").alias("span_idx", "span"))
        .filter(F.col("span").isNotNull())
        .select(
            "doc_id",
            F.col("span_idx").cast("long").alias("span_idx"),
            F.md5("span").alias("digest"),
        )
    )
    spans = _cache(spans)
    first = spans.groupBy("digest").agg(
        F.min(F.struct("doc_id", "span_idx")).alias("first")
    )
    return spans.join(first, "digest").select(
        "doc_id",
        "span_idx",
        (
            (F.col("doc_id") == F.col("first.doc_id"))
            & (F.col("span_idx") == F.col("first.span_idx"))
        ).alias("kept"),
    )


_SIMHASH_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(list_distinct({DUCK_TOKENS})) AS tok FROM documents
),
th AS (
  SELECT doc_id, tok,
         CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) AS h
  FROM toks
),
bits AS (
  SELECT doc_id, CAST(j AS INT) AS j,
         SUM(CASE WHEN (h >> CAST(j AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS c
  FROM th, range(0, 32) r(j)
  GROUP BY doc_id, j
)
SELECT doc_id,
       CAST(SUM(CASE WHEN c > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END)
            AS BIGINT) AS simhash
FROM bits GROUP BY doc_id
"""

SIMHASH_HAMMING_MAX = 3


def q_simhash_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup PAIRS (Manku et al., WWW'07): docs whose 32-bit
    SimHashes differ in <= SIMHASH_HAMMING_MAX bits. Candidates come
    from 4 bands of 8 bits — by pigeonhole, any pair within Hamming
    distance 3 agrees exactly on at least one band, so the band-bucket
    equi-join finds every qualifying pair with NO all-pairs comparison
    anywhere (the engine-side discipline the brute-force oracle doesn't
    need). Output (doc_a, doc_b, hamming).

    At 100 TB: the only shuffle is the (band, key) exchange — 4 rows
    per doc, 8-bit keys spread by band id; verification touches only
    band-colliding candidates, and the xor/bit_count verify is a
    codegen'd integer expression. Hot buckets (a common band value)
    are the documented LSH skew case: AQE splits them, and widening to
    6 bands of 6 bits is the standard rebalance if a corpus
    concentrates.
    """
    sig = _cache(q_dedup_simhash(spark, sf_dir))
    bands = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.expr(
                "transform(sequence(0, 3), b -> struct(b AS band,"
                " shiftright(simhash, b * 8) & 255 AS key))"
            )
        ).alias("bk"),
    ).select("doc_id", "simhash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    return cand.select(
        "doc_a",
        "doc_b",
        F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming"),
    ).filter(F.col("hamming") <= SIMHASH_HAMMING_MAX)


def q_dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate rate per source — the first table every corpus
    report ships ("which feeds are pasting the same page?"): document
    count, distinct-text count, duplicate surplus, and the rate.

    One map-side pass to (source, digest) + two counts; dup_rate is a
    single int/int division. At 100 TB the shuffle carries 32-byte
    digests keyed by (source, digest) — never document bodies (the
    dedup_incremental contract).
    """
    docs = load_parallel(spark, sf_dir, "documents")
    agg = (
        docs.select("source", F.sha2("text", 256).alias("digest"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.count_distinct("digest").alias("n_unique"),
        )
    )
    return agg.select(
        "source",
        "n_docs",
        "n_unique",
        (F.col("n_docs") - F.col("n_unique")).alias("n_dup"),
        (
            (F.col("n_docs") - F.col("n_unique")).cast("double")
            / F.col("n_docs").cast("double")
        ).alias("dup_rate"),
    )


def q_cross_source_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source n-gram contamination matrix: for every source
    pair, how many distinct 3-gram shingles appear in BOTH, plus each
    side's shingle vocabulary and the containment ratio against the
    smaller side — the train/eval leakage measure (decontaminate_ngrams
    REMOVES leaked documents; this reports WHERE the leakage lives,
    pairwise), and between crawl feeds it quantifies mirror/boilerplate
    overlap at the granularity dedup actually operates on.

    (source, shingle) is distinct-ed FIRST, so copy counts never
    inflate the overlap; the self-join is keyed on the shingle (the
    inverted-index shape — sources meet only where a shingle collides,
    never pairwise-by-rows), and a shingle shared by k sources costs
    C(k,2) aggregate rows, bounded by |sources|^2. overlap is one
    int/int division.

    Postings are max-df-pruned FIRST (doc-level df, the same
    _pruned_postings cap as the pair queries): a boilerplate shingle in
    half the corpus is linear cost here (the per-shingle fan-out is
    already |sources|-bounded) but it dominates the distinct/shuffle
    volume while carrying zero leakage signal — contamination is about
    shared *discriminative* content, which is exactly what survives the
    cap.
    """
    # (source, shingle) feeds THREE branches (vocab agg + both self-join
    # legs) — cache it or the doc-source join + distinct replays per leg.
    d = _cache(
        _pruned_postings(spark, sf_dir)
        .join(
            load_table(spark, sf_dir, "documents").select(
                "doc_id", "source"
            ),
            "doc_id",
        )
        .select("source", "s")
        .distinct()
    )
    vocab = d.groupBy("source").agg(F.count("*").alias("n_vocab"))
    a = d.select(F.col("source").alias("src_a"), "s")
    b = d.select(F.col("source").alias("src_b"), "s")
    shared = (
        a.join(b, "s")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count("*").alias("n_shared"))
    )
    va = vocab.select(
        F.col("source").alias("src_a"), F.col("n_vocab").alias("na")
    )
    vb = vocab.select(
        F.col("source").alias("src_b"), F.col("n_vocab").alias("nb")
    )
    return (
        shared.join(F.broadcast(va), "src_a")
        .join(F.broadcast(vb), "src_b")
        .select(
            "src_a", "src_b", "n_shared", "na", "nb",
            (
                F.col("n_shared").cast("double")
                / F.least("na", "nb").cast("double")
            ).alias("overlap"),
        )
    )


def q_near_dup_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate cluster size histogram — the "how much will
    dedup save?" report: one row per cluster size with the number of
    clusters and the documents a keep-one policy removes. Computed
    over the same verified minhash clusters as dedup_minhash_clusters
    (pure projection: two small aggregates over the cluster labels).
    """
    clusters = q_dedup_minhash_clusters(spark, sf_dir)
    sizes = clusters.groupBy("canon_id").agg(F.count("*").alias("size"))
    return (
        sizes.groupBy("size")
        .agg(F.count("*").alias("n_clusters"))
        .select(
            "size",
            "n_clusters",
            ((F.col("size") - 1) * F.col("n_clusters")).alias("docs_removed"),
        )
    )


MINHASH_ERR_K = 16  # md5-based audit signature length


def q_minhash_jaccard_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimator-quality audit: for every document pair with
    exact Jaccard >= 0.5, the k=16 signature estimate (matching
    positions / k) next to the exact value and the absolute error —
    the calibration table that justifies (or indicts) an LSH
    parameterization before a corpus-wide dedup run. E[est] = J with
    sd sqrt(J(1-J)/k) ~ 0.125 at k=16, so per-pair errors up to ~0.3
    are expected; the audit exists to SHOW that spread.

    The audit signatures use the engine's portable-md5 device
    (conv(substr(md5(i || '|' || shingle), 1, 15)) — 60-bit values,
    identical integers in both engines) rather than the production
    xxhash64 signatures, precisely so the estimate itself is
    hash-checkable cross-engine. The eval-pair threshold compares
    2*inter >= union in exact integers (no float 0.5 boundary).

    At 100 TB: eval pairs come from the term-keyed inverted index
    (shingle-collision join over the max-df-pruned vocabulary — see
    _pruned_postings; never all-pairs, fan-out per shingle bounded by
    the cap); signatures are computed ONLY for documents appearing in
    eval pairs (semi-join first) and over the SAME pruned vocabulary,
    so estimate and exact value measure the same shingle sets and the
    k x md5 cost scales with the audited pair set, not the corpus.
    """
    post = _pruned_postings(spark, sf_dir)
    sizes = post.groupBy("doc_id").agg(F.count("*").alias("n"))
    a, b = post.alias("a"), post.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    # pairs feeds THREE branches (both docs_in union legs + the final
    # signature join) and is the expensive self-join + aggregate; cache.
    pairs = _cache(
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "inter",
            (F.col("na") + F.col("nb") - F.col("inter")).alias("un"),
        )
        .filter(2 * F.col("inter") >= F.col("un"))
    )
    docs_in = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .union(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    post_f = post.join(docs_in, "doc_id", "left_semi")
    aggs = [
        F.min(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{i}|"), F.col("s"))), 1, 15
                ),
                16,
                10,
            ).cast("bigint")
        ).alias(f"h{i}")
        for i in range(MINHASH_ERR_K)
    ]
    # sig (k x md5 min-aggs) feeds both sides of the signature join.
    sig = _cache(post_f.groupBy("doc_id").agg(*aggs))
    sig_a = sig.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"h{i}").alias(f"a_h{i}") for i in range(MINHASH_ERR_K)],
    )
    sig_b = sig.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"h{i}").alias(f"b_h{i}") for i in range(MINHASH_ERR_K)],
    )
    match_cnt = sum(
        (
            F.when(F.col(f"a_h{i}") == F.col(f"b_h{i}"), 1).otherwise(0)
            for i in range(MINHASH_ERR_K)
        ),
        F.lit(0),
    )
    scored = (
        pairs.join(sig_a, "doc_a")
        .join(sig_b, "doc_b")
        .select(
            "doc_a", "doc_b", "inter", "un",
            match_cnt.cast("long").alias("match_cnt"),
        )
    )
    jacc = F.col("inter").cast("double") / F.col("un").cast("double")
    est = F.col("match_cnt").cast("double") / float(MINHASH_ERR_K)
    return scored.select(
        "doc_a", "doc_b", "inter", "un",
        jacc.alias("jaccard"),
        "match_cnt",
        est.alias("est_jaccard"),
        F.round(F.abs(est - jacc) * 1e6).cast("long").alias("err_e6"),
    )


QUERIES = {
    "dedup_exact": q_dedup_exact,
    "dedup_rate_by_source": q_dedup_rate_by_source,
    "cross_source_contamination": q_cross_source_contamination,
    "near_dup_cluster_stats": q_near_dup_cluster_stats,
    "minhash_jaccard_error": q_minhash_jaccard_error,
    "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "dedup_minhash": q_dedup_minhash,
    "dedup_minhash_clusters": q_dedup_minhash_clusters,
    "dedup_keep_best": q_dedup_keep_best,
    "simhash_hamming_pairs": q_simhash_hamming_pairs,
    "dedup_simhash": q_dedup_simhash,
    "dedup_incremental": q_dedup_incremental,
    "decontaminate_ngrams": q_decontaminate_ngrams,
    "dedup_spans": q_dedup_spans,
    "shingle_containment": q_shingle_containment,
}

_EXACT_JACCARD_SQL = f"""
WITH sh AS ({DUCK_SHINGLES_REL}),
sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       count(*) / (sa.n + sb.n - count(*)) AS jaccard
FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
JOIN sz sa ON sa.doc_id = a.doc_id
JOIN sz sb ON sb.doc_id = b.doc_id
GROUP BY a.doc_id, b.doc_id, sa.n, sb.n
HAVING count(*) / (sa.n + sb.n - count(*)) >= {JACCARD_THRESHOLD}
"""

# Pruned twin for the pair-generating queries (the engine side prunes
# via _pruned_postings; the LSH family keeps the unpruned exact oracle —
# its signatures/verification run over the full shingle sets).
_PRUNED_JACCARD_SQL = _EXACT_JACCARD_SQL.replace(
    DUCK_SHINGLES_REL, DUCK_SHINGLES_PRUNED_REL
)

# Literal (i, a, b) coefficient rows for the DuckDB signature mirror —
# the SAME integers minhash_signatures embeds Spark-side.
_COEFF_VALUES = ", ".join(
    f"({i}, {a}, {b})" for i, (a, b) in enumerate(MINHASH_COEFFS)
)

# Full mirror of the ENGINE LSH pipeline (r9 verdict "Next round" #4):
# portable universal-hash signatures -> 16 bands x 4 rows -> bucket-size
# cap -> candidate pairs -> exact Jaccard verification. Buckets are
# keyed by the raw 4-value band row (the engine compresses the same row
# to an xxhash64 shuffle key — identical membership up to a 2^-64
# collision). With this twin, a bucket that exceeds LSH_MAX_BUCKET drops
# the same candidate pairs in BOTH engines, so the cap is part of the
# checked contract (pinned in tests/test_shingle_prune.py with a
# cap-binding fixture).
_LSH_PAIRS_SQL = f"""
WITH sh AS ({DUCK_SHINGLES_REL}),
coeff(i, a, b) AS (VALUES {_COEFF_VALUES}),
hv AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) % {MINHASH_P} AS h
  FROM sh
),
sig AS (
  SELECT hv.doc_id, c.i, MIN((c.a * hv.h + c.b) % {MINHASH_P}) AS v
  FROM hv, coeff c
  GROUP BY 1, 2
),
banded AS (
  SELECT doc_id, i // {LSH_ROWS} AS band_id, list(v ORDER BY i) AS key
  FROM sig GROUP BY doc_id, i // {LSH_ROWS}
),
bucket AS (
  SELECT band_id, key FROM banded GROUP BY band_id, key
  HAVING count(*) <= {LSH_MAX_BUCKET}
),
kept AS (
  SELECT b.doc_id, b.band_id, b.key
  FROM banded b JOIN bucket USING (band_id, key)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM kept a JOIN kept b
    ON a.band_id = b.band_id AND a.key = b.key AND a.doc_id < b.doc_id
),
sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS inter
  FROM cand c JOIN sh a ON a.doc_id = c.doc_a
              JOIN sh b ON b.doc_id = c.doc_b AND b.s = a.s
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b,
       i.inter / (sa.n + sb.n - i.inter) AS jaccard
FROM inter i JOIN sz sa ON sa.doc_id = i.doc_a
             JOIN sz sb ON sb.doc_id = i.doc_b
WHERE i.inter / (sa.n + sb.n - i.inter) >= {JACCARD_THRESHOLD}
"""

ORACLE = {
    "dedup_rate_by_source": """
WITH agg AS (
  SELECT source, COUNT(*) AS n_docs, COUNT(DISTINCT text) AS n_unique
  FROM documents GROUP BY source
)
SELECT source, n_docs, n_unique, n_docs - n_unique AS n_dup,
       CAST(n_docs - n_unique AS DOUBLE) / CAST(n_docs AS DOUBLE) AS dup_rate
FROM agg
""",
    "cross_source_contamination": f"""
WITH sh0 AS ({DUCK_SHINGLES_PRUNED_REL}),
d AS (SELECT DISTINCT doc.source, sh0.s
      FROM sh0 JOIN documents doc USING (doc_id)),
vocab AS (SELECT source, COUNT(*) AS n_vocab FROM d GROUP BY source),
shared AS (
  SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_shared
  FROM d a JOIN d b ON a.s = b.s AND a.source < b.source
  GROUP BY 1, 2
)
SELECT src_a, src_b, n_shared, va.n_vocab AS na, vb.n_vocab AS nb,
       CAST(n_shared AS DOUBLE) / CAST(LEAST(va.n_vocab, vb.n_vocab)
                                       AS DOUBLE) AS overlap
FROM shared JOIN vocab va ON va.source = src_a
            JOIN vocab vb ON vb.source = src_b
""",
    "near_dup_cluster_stats": f"""
WITH RECURSIVE pairs AS ({_LSH_PAIRS_SQL}),
und AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach(node, label) AS (
  SELECT src, src FROM (SELECT DISTINCT src FROM und)
  UNION
  SELECT u.dst, r.label FROM reach r JOIN und u ON u.src = r.node
),
comp AS (SELECT node AS doc_id, min(label) AS canon_id
         FROM reach GROUP BY node),
sizes AS (SELECT canon_id, COUNT(*) AS size FROM comp GROUP BY canon_id)
SELECT size, COUNT(*) AS n_clusters,
       (size - 1) * COUNT(*) AS docs_removed
FROM sizes GROUP BY size
""",
    "minhash_jaccard_error": f"""
WITH sh AS ({DUCK_SHINGLES_PRUNED_REL}),
sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT i.doc_a, i.doc_b, i.inter, sa.n + sb.n - i.inter AS un
  FROM inter i JOIN sz sa ON sa.doc_id = i.doc_a
               JOIN sz sb ON sb.doc_id = i.doc_b
  WHERE 2 * i.inter >= sa.n + sb.n - i.inter
),
docs_in AS (
  SELECT DISTINCT doc_id FROM (
    SELECT doc_a AS doc_id FROM pairs
    UNION ALL SELECT doc_b FROM pairs)
),
sig AS (
  SELECT sh.doc_id, CAST(i AS INT) AS i,
         MIN(CAST(('0x' || substr(md5(CAST(i AS VARCHAR) || '|' || s),
                                  1, 15)) AS BIGINT)) AS h
  FROM sh JOIN docs_in USING (doc_id), range(0, {MINHASH_ERR_K}) r(i)
  GROUP BY 1, 2
),
m AS (
  SELECT p.doc_a, p.doc_b, p.inter, p.un,
         SUM(CASE WHEN a.h = b.h THEN 1 ELSE 0 END) AS match_cnt
  FROM pairs p JOIN sig a ON a.doc_id = p.doc_a
               JOIN sig b ON b.doc_id = p.doc_b AND b.i = a.i
  GROUP BY 1, 2, 3, 4
)
SELECT doc_a, doc_b, inter, un,
       CAST(inter AS DOUBLE) / CAST(un AS DOUBLE) AS jaccard,
       CAST(match_cnt AS BIGINT) AS match_cnt,
       CAST(match_cnt AS DOUBLE) / {MINHASH_ERR_K}.0 AS est_jaccard,
       CAST(round(abs(CAST(match_cnt AS DOUBLE) / {MINHASH_ERR_K}.0
                      - CAST(inter AS DOUBLE) / CAST(un AS DOUBLE)) * 1e6)
            AS BIGINT) AS err_e6
FROM m
""",
    "shingle_containment": f"""
WITH sh AS ({DUCK_SHINGLES_PRUNED_REL}),
sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       count(*) AS inter, sa.n AS na,
       count(*) / sa.n AS containment
FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id
JOIN sz sa ON sa.doc_id = a.doc_id
GROUP BY a.doc_id, b.doc_id, sa.n
HAVING count(*) / sa.n >= {CONTAINMENT_THRESHOLD}
""",
    "dedup_exact": """
SELECT min(doc_id) AS keep_id, count(*) AS n_copies
FROM documents GROUP BY text
""",
    "dedup_incremental": """
-- text IS NOT NULL: a NULL-text doc has no digest and takes part in no
-- dedup (engine mirror). NOT EXISTS, not NOT IN: one NULL digest in
-- the existing corpus made NOT IN return ZERO rows (the classic
-- three-valued-logic trap — probed r11) while the engine's anti join
-- kept every non-matching doc.
WITH digests AS (SELECT doc_id, sha256(text) AS digest FROM documents
                 WHERE text IS NOT NULL),
existing AS (SELECT * FROM digests WHERE doc_id % 10 <> 0),
incoming AS (SELECT * FROM digests WHERE doc_id % 10 = 0),
batch_keep AS (SELECT digest, min(doc_id) AS doc_id
               FROM incoming GROUP BY digest)
SELECT doc_id, digest FROM batch_keep b
WHERE NOT EXISTS (SELECT 1 FROM existing e WHERE e.digest = b.digest)
""",
    "ngram_jaccard_pairs": _PRUNED_JACCARD_SQL,
    # The full engine-LSH mirror: signatures, banding, bucket cap and
    # exact verification all reproduced in DuckDB (_LSH_PAIRS_SQL), so
    # the hash check proves the exact plan that ships, cap included.
    "dedup_minhash": _LSH_PAIRS_SQL,
    # Connected components of the mirrored LSH pair graph, closed by
    # recursive reachability — terminating because the label lattice is
    # finite (the wcc_cyclic device).
    "dedup_minhash_clusters": f"""
WITH RECURSIVE pairs AS ({_LSH_PAIRS_SQL}),
und AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach(node, label) AS (
  SELECT src, src FROM (SELECT DISTINCT src FROM und)
  UNION
  SELECT u.dst, r.label FROM reach r JOIN und u ON u.src = r.node
)
SELECT node AS doc_id, min(label) AS canon_id,
       (node = min(label)) AS kept
FROM reach GROUP BY node
""",
    # Same recursive closure as dedup_minhash_clusters, then the
    # quality argmax per cluster (n_chars DESC, doc_id ASC).
    "dedup_keep_best": f"""
WITH RECURSIVE pairs AS ({_LSH_PAIRS_SQL}),
und AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach(node, label) AS (
  SELECT src, src FROM (SELECT DISTINCT src FROM und)
  UNION
  SELECT u.dst, r.label FROM reach r JOIN und u ON u.src = r.node
),
comp AS (SELECT node AS doc_id, min(label) AS canon_id
         FROM reach GROUP BY node),
m AS (SELECT c.canon_id, c.doc_id, d.n_chars
      FROM comp c JOIN documents d USING (doc_id))
SELECT canon_id, keep_id, kept_n_chars, n_members FROM (
  SELECT canon_id, doc_id AS keep_id, n_chars AS kept_n_chars,
         count(*) OVER (PARTITION BY canon_id) AS n_members,
         row_number() OVER (PARTITION BY canon_id
                            ORDER BY n_chars DESC, doc_id) AS rn
  FROM m) WHERE rn = 1
""",
    "dedup_simhash": _SIMHASH_SQL,
    # Brute-force verify twin: at oracle scale (sf0.01) the all-pairs
    # xor/bit_count over the 2000-row simhash table is trivial for
    # DuckDB; the ENGINE side must never do this (banded candidates
    # only) — asymmetry by design, same as dedup_minhash vs its exact
    # oracle.
    "simhash_hamming_pairs": f"""
WITH sh AS ({_SIMHASH_SQL})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_HAMMING_MAX}
""",
    "decontaminate_ngrams": f"""
WITH sh AS ({DUCK_SHINGLES_REL}),
bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % {BENCH_MOD} = 0),
corpus AS (SELECT doc_id, s FROM sh WHERE doc_id % {BENCH_MOD} <> 0)
SELECT c.doc_id, count(*) AS n_hits
FROM corpus c JOIN bench b USING (s)
GROUP BY c.doc_id
""",
    "dedup_spans": f"""
WITH toks AS (SELECT doc_id, {DUCK_TOKENS} AS t FROM documents),
spans AS (
  SELECT doc_id, CAST(i AS BIGINT) AS span_idx,
         array_to_string(
           t[CAST(i * {SPAN_TOKENS} + 1 AS INT)
             : CAST((i + 1) * {SPAN_TOKENS} AS INT)], ' ') AS span
  FROM toks, range(0, 100000) r(i)
  WHERE CAST(i AS INT) * {SPAN_TOKENS} + 1 <= len(t)
)
SELECT doc_id, span_idx, (rn = 1) AS kept FROM (
  SELECT doc_id, span_idx,
         row_number() OVER (PARTITION BY span ORDER BY doc_id, span_idx) AS rn
  FROM spans
)
""",
}
