"""Multimodal plumbing: binary column + mapInPandas feature extraction."""

from __future__ import annotations

import pytest

from mapreduce_sssp_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    binary_table,
    decode_image,
    extract_features,
)


def test_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_feature_extraction_on_literal_binary(spark):
    docs = spark.createDataFrame(
        [(1, b"hello world"), (2, b""), (3, b"\x00" + b"x" * 5000)],
        "doc_id long, content binary",
    )
    from pyspark.sql import functions as F

    binary = docs.select(
        "doc_id",
        "content",
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length("content").cast("long").alias("n_bytes"),
        ).alias("meta"),
    )
    out = {r.doc_id: r for r in extract_features(binary).collect()}
    assert extract_features(binary).schema == FEATURE_SCHEMA
    assert (out[1].byte_len, out[1].n_chunks, out[1].head_byte) == (11, 1, ord("h"))
    assert (out[2].byte_len, out[2].n_chunks, out[2].head_byte) == (0, 0, -1)
    assert (out[3].byte_len, out[3].n_chunks, out[3].head_byte) == (5001, 2, 0)


def test_binary_table_matches_text_bytes(spark, sf_dir):
    bt = binary_table(spark, sf_dir)
    row = bt.limit(1).collect()[0]
    assert isinstance(row.content, (bytes, bytearray))
    assert len(row.content) == row.meta.n_bytes
    assert row.meta.mime == "text/plain"
