"""NULL/empty-row poison sweep: documents with NULL or empty text and
events rows that are NULL in every column are NORMAL in web-scale
corpora, and under Spark's ANSI mode an unguarded ratio (x / size(toks))
or array index ([0] of an empty filter result) doesn't produce a wrong
row — it kills the whole 100 TB job with an ArithmeticException. These
ten queries crashed on the r9 poison diagnostic and are now required to
run: zero-token docs are dropped before their ratio divisions (mirrored
in each DuckDB twin so sf0.01 hashes are unchanged), NULL payloads are
dropped at multimodal ingest, NULL group keys never reach the pandas
cogroup handler, and out-of-ladder docs land in a visible NULL bucket.
"""

from __future__ import annotations

import pytest

POISONED = [
    "calibration_bins",
    "lift_deciles",
    "multimodal_features",
    "multimodal_resize",
    "multimodal_frames",
    "domain_mix_sample",
    "length_buckets",
    "cogroup_user_activity",
    "pipeline_clean_corpus",
    "pipeline_training_data",
]


@pytest.fixture(scope="module")
def poison_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("poison")
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "embeddings",
    ]:
        spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet").coalesce(
            1
        ).write.mode("overwrite").parquet(str(d / f"{t}.parquet"))
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(20)
    poison = spark.createDataFrame(
        [
            (900001, None, None, None, None),  # all-NULL doc
            (900002, "", "", "", 0),  # empty strings
            (900003, "   ", "xx", "srcX", 3),  # whitespace-only text
        ],
        docs.schema,
    )
    docs.unionByName(poison).coalesce(1).write.mode("overwrite").parquet(
        str(d / "documents.parquet")
    )
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    evp = spark.createDataFrame([tuple(None for _ in ev.schema)], ev.schema)
    ev.limit(50).unionByName(evp).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(d / "events.parquet"))
    return str(d)


@pytest.mark.parametrize("qname", POISONED)
def test_null_poisoned_corpus_does_not_crash(spark, poison_dir, qname):
    from mapreduce_sssp_spark.queries_registry import QUERIES

    assert QUERIES[qname](spark, poison_dir).count() >= 0, qname
    spark.catalog.clearCache()


def test_length_buckets_null_text_lands_in_null_bucket(spark, poison_dir):
    """The all-NULL doc has no token count: it must surface as a
    visible NULL-bucket row (DuckDB's out-of-bounds list semantics),
    not an INVALID_ARRAY_INDEX crash."""
    from mapreduce_sssp_spark.queries_registry import QUERIES

    rows = QUERIES["length_buckets"](spark, poison_dir).collect()
    assert any(r.bucket is None for r in rows)
    spark.catalog.clearCache()


def test_rolling_fingerprint_multibyte_parity(spark, tmp_path):
    """Spark length()/substring() are CHARACTER-based; the DuckDB twin
    must be too (length(), not byte-wise strlen()) or any multibyte
    corpus silently diverges — invisible to the ASCII-testdata hash
    check, so pinned here on genuinely multibyte text."""
    import duckdb

    docs = spark.createDataFrame(
        [
            (1, "héllo wörld ünïcode — teşt çöntent ğüzel"),
            (2, "日本語のテキストです、これは指紋テスト"),
            (3, "plain ascii control row for the same path"),
        ],
        "doc_id long, text string",
    ).selectExpr(
        "doc_id", "text", "'xx' AS lang", "'srcU' AS source",
        "cast(length(text) AS long) AS n_chars",
    )
    d = tmp_path / "mb"
    docs.coalesce(1).write.mode("overwrite").parquet(
        str(d / "documents.parquet")
    )
    from mapreduce_sssp_spark.operators.text_analysis import ORACLE
    from mapreduce_sssp_spark.queries_registry import QUERIES

    got = {
        (r.doc_id, r.winnow_min, r.content_hash, r.n_windows)
        for r in QUERIES["rolling_fingerprint"](spark, str(d)).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet/*.parquet')"
    )
    want = set(map(tuple, con.execute(ORACLE["rolling_fingerprint"]).fetchall()))
    assert got == want
    spark.catalog.clearCache()
