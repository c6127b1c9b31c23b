"""Multimodal column handling (SURVEY.md §7 P3): opaque ``binary``
payloads + typed metadata, processed with Arrow-batched ``mapInPandas``.

``decode_image``/``resize_image`` follow an optional Pillow import:
real decode/resample when Pillow is importable, NotImplementedError
when not (this container has no codecs, so the stub branch runs here —
``_fake_decode`` is the deterministic stand-in the feature extractor
uses either way so oracles stay environment-independent). Everything
Spark-side is real and tested: the binary column construction, the
explicit output schema, the Arrow batch iteration shape, and the
partition-parallel execution; a codec-equipped deployment gets real
decode with zero plan change.

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


try:  # optional codec dependency — absent in this container
    import io as _io

    from PIL import Image as _pil_image
except ImportError:  # pragma: no cover - exercised when Pillow is absent
    _pil_image = None


def decode_image(content: bytes) -> "object":
    """Real codec hook: decodes via Pillow when it is importable
    (returning a dict with the same keys as ``_fake_decode`` plus
    width/height/mode), else raises NotImplementedError — deployments
    with codecs get real decode with zero plan change, and this
    container's stub path stays explicit rather than silently fake.
    """
    if _pil_image is None:
        raise NotImplementedError(
            "image codecs not installed in this environment"
        )
    img = _pil_image.open(_io.BytesIO(content))
    return {
        "byte_len": len(content),
        "n_chunks": math.ceil(len(content) / CHUNK) if content else 0,
        "head_byte": content[0] if content else -1,
        "width": img.width,
        "height": img.height,
        "mode": img.mode,
    }


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


# --------------------------------------------------------------------------
# Resize (1 -> 1 binary transform) and frame sampling (1 -> N explode)
# --------------------------------------------------------------------------

RESIZE_W, RESIZE_H = 64, 64
FRAME_BYTES = 1024
FRAME_STEP = 4  # keep every 4th frame

RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("orig_len", T.LongType()),
        T.StructField("out_len", T.LongType()),
        T.StructField("target_w", T.IntegerType()),
        T.StructField("target_h", T.IntegerType()),
        T.StructField("out_head", T.IntegerType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_off", T.LongType()),
        T.StructField("frame_len", T.LongType()),
        T.StructField("frame_head", T.IntegerType()),
    ]
)


def resize_image(content: bytes, w: int, h: int) -> bytes:
    """Real resampling hook: Pillow-backed when importable (decode,
    LANCZOS resize to (w, h), re-encode PNG), else NotImplementedError.
    Same optional-import contract as ``decode_image``."""
    if _pil_image is None:
        raise NotImplementedError(
            "image codecs not installed in this environment"
        )
    img = _pil_image.open(_io.BytesIO(content)).resize((w, h))
    buf = _io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def _fake_resize(content: bytes, w: int, h: int) -> bytes:
    """Deterministic resize stand-in: truncate/keep to w*h 'pixels' (bytes).

    Preserves the two invariants a real resampler has — output size is a
    pure function of (w, h, input) and content derives from the input —
    so the plan, schema and oracle exercise the true dataflow.
    """
    return content[: w * h]


def resize_images(binary_df: DataFrame, w: int = RESIZE_W, h: int = RESIZE_H) -> DataFrame:
    """Arrow-batched 1->1 binary transform: each payload resized to (w, h)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf["content"].map(lambda c: _fake_resize(c, w, h))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "orig_len": pdf["content"].map(len),
                    "out_len": out.map(len),
                    "target_w": w,
                    "target_h": h,
                    "out_head": out.map(lambda c: c[0] if c else -1),
                }
            )

    return binary_df.mapInPandas(run, RESIZE_SCHEMA)


def sample_frames(
    binary_df: DataFrame, frame_bytes: int = FRAME_BYTES, step: int = FRAME_STEP
) -> DataFrame:
    """1 -> N frame sampling: fixed-size frames, keep every ``step``-th.

    The mapInPandas generator emits MORE rows than it consumes — the
    batch shape a real video frame-sampler has. Row explosion happens
    executor-side per Arrow batch; no shuffle, no driver involvement.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                n = len(content)
                n_frames = -(-n // frame_bytes)  # ceil
                for idx in range(0, n_frames, step):
                    off = idx * frame_bytes
                    rows.append(
                        (doc_id, idx, off, min(frame_bytes, n - off), content[off])
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "frame_idx", "frame_off", "frame_len", "frame_head"],
            )

    return binary_df.mapInPandas(run, FRAME_SCHEMA)


def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return resize_images(binary_table(spark, sf_dir))


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sample_frames(binary_table(spark, sf_dir))


def q_multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload exact dedup — the image/audio dedup shape: digest
    the BYTES (md5 over the binary column, not the decoded text — the
    production hash runs on the payload a decoder never touched), group
    by digest, elect the min-id canonical, report groups with copies.
    The corpus is the binary table plus a deterministic re-keyed
    duplicate slab (every 7th doc again under doc_id + 100000), so the
    query provably FINDS duplicates instead of vacuously reporting
    singletons (the r6 lesson about demonstrations that cannot fail).

    Same 32-hex-digest shuffle shape as dedup_exact: the exchange
    carries (digest, id) pairs, never the payload bytes.
    """
    base = binary_table(spark, sf_dir)
    dupes = base.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 100_000).alias("doc_id"), "content", "meta"
    )
    corpus = base.unionByName(dupes)
    return (
        corpus.groupBy(F.md5("content").alias("digest"))
        .agg(
            F.count("*").alias("n_copies"),
            F.min("doc_id").alias("canonical_doc_id"),
            F.sum(F.col("meta.n_bytes")).alias("total_bytes"),
        )
        .filter(F.col("n_copies") > 1)
    )


QUERIES = {
    "multimodal_features": q_multimodal_features,
    "multimodal_resize": q_multimodal_resize,
    "multimodal_frames": q_multimodal_frames,
    "multimodal_dedup": q_multimodal_dedup,
}

ORACLE = {
    "multimodal_dedup": """
WITH base AS (
  SELECT doc_id, text, strlen(text) AS n_bytes FROM documents
),
corpus AS (
  SELECT doc_id, text, n_bytes FROM base
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text, n_bytes
  FROM base WHERE doc_id % 7 = 0
)
SELECT md5(text) AS digest,
       count(*) AS n_copies,
       min(doc_id) AS canonical_doc_id,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes
FROM corpus GROUP BY 1
HAVING count(*) > 1
""",
    "multimodal_features": f"""
SELECT doc_id,
       strlen(text) AS byte_len,
       CAST(ceil(strlen(text) / {CHUNK}.0) AS BIGINT) AS n_chunks,
       CAST(ascii(substr(text, 1, 1)) AS INT) AS head_byte,
       'text/plain' AS mime
FROM documents
""",
    "multimodal_resize": f"""
SELECT doc_id,
       strlen(text) AS orig_len,
       least(strlen(text), {RESIZE_W * RESIZE_H}) AS out_len,
       CAST({RESIZE_W} AS INT) AS target_w,
       CAST({RESIZE_H} AS INT) AS target_h,
       CASE WHEN strlen(text) > 0 THEN CAST(ascii(substr(text, 1, 1)) AS INT)
            ELSE -1 END AS out_head
FROM documents
""",
    "multimodal_frames": f"""
SELECT doc_id,
       f AS frame_idx,
       f * {FRAME_BYTES} AS frame_off,
       least({FRAME_BYTES}, strlen(text) - f * {FRAME_BYTES}) AS frame_len,
       CAST(ascii(substr(text, f * {FRAME_BYTES} + 1, 1)) AS INT) AS frame_head
FROM (
    SELECT doc_id, text,
           UNNEST(range(0, CAST(ceil(strlen(text) / {FRAME_BYTES}.0) AS BIGINT),
                        {FRAME_STEP})) AS f
    FROM documents
)
""",
}
