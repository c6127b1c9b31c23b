"""Property tests for the dedup operators on planted literal documents."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_sssp_spark.operators.dedup import (
    lsh_candidate_pairs,
    minhash_signatures,
)
from mapreduce_sssp_spark.operators.text_common import with_shingles

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the old oak tree "
    "near the quiet river bank under a bright morning sky"
)
NEAR = BASE.replace("morning", "evening")  # one-word change -> jaccard ~0.94
UNRELATED = (
    "spark executes declarative query plans by compiling logical operators "
    "into whole stage generated java code that runs over columnar batches "
    "with adaptive shuffle partition coalescing at runtime"
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(0, BASE), (1, NEAR), (2, UNRELATED), (3, BASE)],
        "doc_id long, text string",
    )


def test_shingles_are_distinct_3grams(docs):
    sh = {r.doc_id: r.sh for r in with_shingles(docs).collect()}
    toks = BASE.split()
    assert sh[0][0] == " ".join(toks[:3])
    assert len(sh[0]) == len(set(sh[0]))  # distinct
    assert len(sh[0]) <= len(toks) - 2


def test_minhash_signature_shape_and_identity(docs):
    sigs = {r.doc_id: r.sig for r in minhash_signatures(docs).collect()}
    assert all(len(s) == 64 for s in sigs.values())
    assert sigs[0] == sigs[3]  # identical docs -> identical signatures
    # near-dup agrees on most minhash slots, unrelated on almost none
    agree_near = sum(a == b for a, b in zip(sigs[0], sigs[1]))
    agree_far = sum(a == b for a, b in zip(sigs[0], sigs[2]))
    assert agree_near > 40
    assert agree_far < 10


def test_lsh_finds_planted_pair_and_skips_unrelated(docs):
    cand = {
        (r.doc_a, r.doc_b)
        for r in lsh_candidate_pairs(minhash_signatures(docs)).collect()
    }
    assert (0, 1) in cand  # near-dup pair bucketed together
    assert (0, 3) in cand  # exact dup pair
    assert (0, 2) not in cand and (1, 2) not in cand  # unrelated never meets


def test_exact_dedup_groups(spark):
    docs = spark.createDataFrame(
        [(10, "aaa"), (11, "bbb"), (12, "aaa"), (13, "aaa")],
        "doc_id long, text string",
    )
    groups = (
        docs.groupBy(F.sha2("text", 256).alias("d"))
        .agg(F.min("doc_id").alias("keep"), F.count("*").alias("n"))
        .collect()
    )
    got = {(r.keep, r.n) for r in groups}
    assert got == {(10, 3), (11, 1)}


def test_lsh_verified_equals_exact_jaccard_when_cap_unbound(spark):
    """Recall parity (r10 ADVICE #1): since r10 the dedup_minhash oracle
    mirrors the engine's own LSH pipeline (shared MINHASH_COEFFS), so
    the driver hash can no longer catch a recall loss COMMON to both
    sides — e.g. a degenerate coefficient edit that stops similar docs
    from colliding in any band. This fixture closes that hole locally:
    on a corpus where neither the LSH bucket cap nor the shingle max-df
    prune binds, the LSH-candidate -> exact-verify pipeline must return
    EXACTLY the brute-force >= 0.8-Jaccard pairs (banding at b=16, r=4
    has a ~2e-4 miss probability at J = 0.8; the planted pairs sit at
    J >= 0.85 where it is ~1e-6, and the corpus is fixed, so the
    outcome is deterministic — if an edit to the signature scheme makes
    this fail, the recall REALLY dropped)."""
    from mapreduce_sssp_spark.operators.dedup import JACCARD_THRESHOLD

    fam = [
        BASE,
        BASE.replace("morning", "evening"),
        BASE.replace("quick", "swift"),
        UNRELATED,
        UNRELATED.replace("columnar", "vectorized"),
        "completely different short text about nothing in particular "
        "with enough words to form shingles of its own here",
        BASE,  # exact dup of doc 0
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(fam)], "doc_id long, text string"
    )
    # Brute-force exact pairs over distinct shingle sets.
    sh = {r.doc_id: set(r.sh) for r in with_shingles(docs).collect()}
    exact = set()
    ids = sorted(sh)
    for i in ids:
        for j in ids:
            if i < j and sh[i] and sh[j]:
                jac = len(sh[i] & sh[j]) / len(sh[i] | sh[j])
                if jac >= JACCARD_THRESHOLD:
                    exact.add((i, j))
    assert exact, "fixture must plant at least one >= 0.8 pair"
    # The engine pipeline: LSH candidates exact-verified, same shape as
    # q_dedup_minhash (candidates from banded signatures, verify via
    # shingle-set intersection).
    cand = lsh_candidate_pairs(minhash_signatures(docs))
    a = with_shingles(docs).select(
        F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a")
    )
    b = with_shingles(docs).select(
        F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    verified = (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                inter / (F.size("sh_a") + F.size("sh_b") - inter)
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )
    got = {(r.doc_a, r.doc_b) for r in verified.collect()}
    assert got == exact


def test_minhash_clusters_transitive_closure(spark):
    """Near-dup CLUSTERS close over non-transitive pair evidence: with
    pairs (0,1) and (1,4) but NOT (0,4), all three land in one component
    with canon 0 — the survivor election dedup_minhash_clusters ships."""
    from mapreduce_sssp_spark.graph.wcc import wcc

    pairs = spark.sql(
        "SELECT * FROM VALUES (0L, 1L), (1L, 4L), (7L, 9L) AS t(src, dst)"
    )
    comp = {r.node: r.component for r in wcc(pairs).collect()}
    assert comp == {0: 0, 1: 0, 4: 0, 7: 7, 9: 7}
    kept = {n for n, c in comp.items() if n == c}
    assert kept == {0, 7}  # one survivor per cluster, min doc_id
