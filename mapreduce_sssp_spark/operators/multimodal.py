"""Multimodal column handling (SURVEY.md §7 P3): opaque ``binary``
payloads + typed metadata, processed with Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the actual decode is STUBBED
(``decode_image`` raises NotImplementedError; ``_fake_decode`` is the
deterministic stand-in used by the feature extractor) — but everything
Spark-side is real and tested: the binary column construction, the
explicit output schema, the Arrow batch iteration shape, and the
partition-parallel execution. Swapping ``_fake_decode`` for PIL/ffmpeg
is a one-function change that touches no plan.

The driver testdata has no binary table, so ``multimodal_features``
derives one deterministically: content = utf-8 bytes of documents.text
with a typed metadata struct — letting the DuckDB oracle verify the
whole mapInPandas path via octet_length arithmetic.

At 100 TB: binary payloads ride in parquet pages; mapInPandas streams
Arrow batches (spark.sql.execution.arrow.maxRecordsPerBatch bounds peak
memory per task); feature extraction is map-side only — zero shuffle.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..io.sources import load_parallel

CHUNK = 4096

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("n_chunks", T.LongType()),
        T.StructField("head_byte", T.IntegerType()),
        T.StructField("mime", T.StringType()),
    ]
)


def decode_image(content: bytes) -> "object":
    """Real codec hook — not available in this container.

    A deployment installs Pillow/libvips and implements this; every
    caller goes through ``_fake_decode`` until then.
    """
    raise NotImplementedError("image codecs not installed in this environment")


def _fake_decode(content: bytes) -> dict:
    """Deterministic decode stand-in: byte-level features only."""
    return {
        "byte_len": len(content),
        "n_chunks": math.ceil(len(content) / CHUNK) if content else 0,
        "head_byte": content[0] if content else -1,
    }


def binary_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> (doc_id, content binary, meta struct<mime,n_bytes>)."""
    docs = load_parallel(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("content"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length("text").cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def extract_features(binary_df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["content"].map(_fake_decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": feats.map(lambda f: f["byte_len"]),
                    "n_chunks": feats.map(lambda f: f["n_chunks"]),
                    "head_byte": feats.map(lambda f: f["head_byte"]),
                    "mime": pdf["meta"].map(lambda m: m["mime"]),
                }
            )

    return binary_df.mapInPandas(run, FEATURE_SCHEMA)


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_features(binary_table(spark, sf_dir))


QUERIES = {"multimodal_features": q_multimodal_features}

ORACLE = {
    "multimodal_features": f"""
SELECT doc_id,
       strlen(text) AS byte_len,
       CAST(ceil(strlen(text) / {CHUNK}.0) AS BIGINT) AS n_chunks,
       CAST(ascii(substr(text, 1, 1)) AS INT) AS head_byte,
       'text/plain' AS mime
FROM documents
""",
}
