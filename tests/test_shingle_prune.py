"""Hot-shingle max-df prune (text_common.SHINGLE_MAX_DF): the
pair-generating dedup queries must drop postings of shingles whose
document frequency exceeds the cap BEFORE the shingle-keyed self-join —
otherwise one boilerplate 3-gram shared by d documents yields d^2 join
rows no threshold can pre-filter (the round-8 verdict's last unguarded
quadratic; same frontier-gating insight as the reference's SSSP round
pruning, SingleSourceSP.java:179).

Crafted fixture: SHINGLE_MAX_DF + 50 documents share ONE boilerplate
leading shingle (plus per-doc unique shingles), and one true duplicate
pair shares only rare shingles. The prune must (a) bound every surviving
posting list by the cap, (b) still find the rare-shingle duplicate pair,
and (c) agree with the mirrored DuckDB oracle on the same fixture.
"""

from __future__ import annotations

import duckdb
import pytest

from mapreduce_sssp_spark.operators.text_common import SHINGLE_MAX_DF


@pytest.fixture(scope="module")
def hot_dir(spark, tmp_path_factory):
    """A documents.parquet dir where one shingle's df exceeds the cap."""
    n_hot = SHINGLE_MAX_DF + 50
    rows = []
    for i in range(n_hot):
        # Shingles: (boiler plate header), (plate header u{i}),
        # (header u{i} v{i}), (u{i} v{i} w{i}) — only the first collides.
        rows.append((i, f"boiler plate header u{i} v{i} w{i}"))
    # True duplicates sharing only rare shingles (identical 5-token text
    # -> jaccard 1.0), ids above the hot block.
    rows.append((9001, "rare alpha beta gamma delta"))
    rows.append((9002, "rare alpha beta gamma delta"))
    df = spark.createDataFrame(rows, "doc_id long, text string").selectExpr(
        "doc_id",
        "text",
        "'en' AS lang",
        "concat('src', cast(doc_id % 3 AS string)) AS source",
        "cast(length(text) AS long) AS n_chars",
    )
    d = tmp_path_factory.mktemp("hotshingle")
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def _duck(sf_dir: str, sql: str):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    return con.execute(sql).fetchall()


def test_prune_bounds_posting_lists(spark, hot_dir):
    from mapreduce_sssp_spark.operators.dedup import _pruned_postings

    pruned = _pruned_postings(spark, hot_dir)
    max_df = (
        pruned.groupBy("s").count().agg({"count": "max"}).collect()[0][0]
    )
    assert max_df is not None and max_df <= SHINGLE_MAX_DF
    # The boilerplate shingle is gone; the rare duplicate shingles stay.
    s_list = {r.s for r in pruned.select("s").distinct().collect()}
    assert "boiler plate header" not in s_list
    assert "rare alpha beta" in s_list
    spark.catalog.clearCache()


def test_jaccard_still_finds_rare_duplicates_and_matches_oracle(
    spark, hot_dir
):
    from mapreduce_sssp_spark.operators.dedup import ORACLE
    from mapreduce_sssp_spark.operators.dedup import q_ngram_jaccard_pairs

    got = {
        (r.doc_a, r.doc_b, round(r.jaccard, 9))
        for r in q_ngram_jaccard_pairs(spark, hot_dir).collect()
    }
    assert (9001, 9002, 1.0) in got
    # No pair may survive on the boilerplate shingle alone: every hot-id
    # pair shares exactly 1 of 4 shingles (jaccard 1/7 < 0.8), so the
    # duplicate pair must be the ONLY result — with or without prune the
    # ANSWER is identical; the prune changes the join size, not the rows.
    assert got == {(9001, 9002, 1.0)}
    want = {
        (a, b, round(j, 9))
        for a, b, j in _duck(hot_dir, ORACLE["ngram_jaccard_pairs"])
    }
    assert got == want
    spark.catalog.clearCache()


def test_containment_matches_oracle_on_hot_fixture(spark, hot_dir):
    from mapreduce_sssp_spark.operators.dedup import (
        ORACLE,
        q_shingle_containment,
    )

    got = {
        (r.doc_a, r.doc_b, r.inter, r.na, round(r.containment, 9))
        for r in q_shingle_containment(spark, hot_dir).collect()
    }
    # Directed both ways for the duplicate pair; nothing else survives.
    assert {(a, b) for a, b, *_ in got} == {(9001, 9002), (9002, 9001)}
    want = {
        (a, b, i, n, round(c, 9))
        for a, b, i, n, c in _duck(hot_dir, ORACLE["shingle_containment"])
    }
    assert got == want
    spark.catalog.clearCache()


def test_lsh_bucket_cap_binding_agrees_with_duckdb_mirror(
    spark, tmp_path_factory
):
    """The cap as CONTRACT (r9 verdict #4): on a fixture where an
    identical-text cluster exceeds LSH_MAX_BUCKET, the engine's capped
    LSH pipeline and the DuckDB mirror (_LSH_PAIRS_SQL) must drop the
    SAME pairs — the oversized cluster contributes none, the small
    near-dup pair survives — and agree value-for-value."""
    from mapreduce_sssp_spark.operators.dedup import (
        LSH_MAX_BUCKET,
        ORACLE,
        q_dedup_minhash,
    )

    n_hot = LSH_MAX_BUCKET + 50
    rows = [(i, "tmpl alpha beta gamma delta epsilon") for i in range(n_hot)]
    # Surviving pair: identical 7-token texts -> jaccard 1.0, bucket
    # size 2 (the identical-signature path; sub-1.0 near-dup banding is
    # exercised by the hypothesis property test in test_property.py).
    rows.append((9001, "zeta eta theta iota kappa lambda mu"))
    rows.append((9002, "zeta eta theta iota kappa lambda mu"))
    df = spark.createDataFrame(rows, "doc_id long, text string").selectExpr(
        "doc_id",
        "text",
        "'en' AS lang",
        "concat('src', cast(doc_id % 3 AS string)) AS source",
        "cast(length(text) AS long) AS n_chars",
    )
    d = tmp_path_factory.mktemp("hotlsh")
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))

    got = {
        (r.doc_a, r.doc_b, round(r.jaccard, 9))
        for r in q_dedup_minhash(spark, str(d)).collect()
    }
    # The 450-doc identical cluster occupies one bucket per band, every
    # bucket over the cap -> zero pairs from it; only the small pair
    # survives.
    assert got == {(9001, 9002, 1.0)}
    want = {
        (a, b, round(j, 9))
        for a, b, j in _duck(str(d), ORACLE["dedup_minhash"])
    }
    assert got == want
    spark.catalog.clearCache()


def test_lsh_bucket_cap_bounds_identical_signature_clusters(spark):
    """b documents with the SAME minhash signature land in one bucket in
    every band and would generate b^2 candidates; buckets above
    max_bucket must be dropped BEFORE the pair self-join, while
    small-bucket (genuine near-dup) candidates survive."""
    from pyspark.sql import functions as F

    from mapreduce_sssp_spark.operators.dedup import lsh_candidate_pairs

    # 8 docs share signature [1,1,...]; 2 docs share signature [2,2,...].
    sig_len = 64
    rows = [(i, [1] * sig_len) for i in range(8)]
    rows += [(100, [2] * sig_len), (101, [2] * sig_len)]
    sigs = spark.createDataFrame(rows, "doc_id long, sig array<bigint>")
    capped = lsh_candidate_pairs(sigs, max_bucket=4)
    got = {(r.doc_a, r.doc_b) for r in capped.collect()}
    # The 8-doc cluster (bucket size 8 > 4) is dropped; the pair survives.
    assert got == {(100, 101)}
    # Uncapped default keeps everything (cap never binds at test scale).
    full = lsh_candidate_pairs(sigs)
    assert full.count() == 8 * 7 // 2 + 1
    spark.catalog.clearCache()
