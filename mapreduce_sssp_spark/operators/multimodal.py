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
whole mapInPandas path via octet_length arithmetic. The oracles index
head bytes BYTE-ACCURATELY via hex(encode(text)) (byte k, 0-based, is
substr(hex, 2k+1, 2)) — since r10; char-indexed ascii(substr(...))
reads a code point (233 for 'é') where the engine reads the first
payload byte (195), and only coincides on ASCII corpora.

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
    """documents -> (doc_id, content binary, meta struct<mime,n_bytes>).

    NULL-text rows (normal in web corpora) carry no payload and are
    dropped at ingest — a NULL content cell would otherwise reach the
    pandas decode UDFs as None and crash len()/indexing mid-batch.
    Mirrored in the three multimodal oracles (WHERE text IS NOT NULL).
    """
    docs = load_parallel(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
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


# --------------------------------------------------------------------------
# PCM audio: REAL binary pack/decode (numpy is in-container, unlike the
# image/video codecs) — synthesize int16 little-endian samples, pack them
# into a true binary waveform column, then DECODE the bytes back with
# np.frombuffer and aggregate. The decode is not a stub: corrupt one byte
# and the stats change. The oracle never touches bytes — it recomputes the
# closed-form samples and the same aggregates in SQL, so the parquet->
# Arrow->numpy round-trip is what the hash check actually certifies.
# --------------------------------------------------------------------------

PCM_MAX_SAMPLES = 256

PCM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("peak_abs", T.LongType()),
        T.StructField("sum_amp", T.LongType()),
        T.StructField("sum_sq", T.LongType()),
        T.StructField("n_zero_cross", T.LongType()),
    ]
)


def pcm_waveform_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> (doc_id, pcm binary): n = min(n_chars, 256) int16
    LE samples s_i = ((doc_id*31 + i*7919) % 65536) - 32768, packed by
    numpy inside mapInPandas — a real binary audio stand-in whose
    ground truth is recomputable arithmetically."""
    import numpy as np

    # Filter on n_chars BEFORE least(): Spark's least() SKIPS NULL
    # arguments (least(NULL, 256) = 256), so filtering on the least
    # output kept a NULL-n_chars doc with a synthetic 256-sample clip
    # while the twin's WHERE n_chars > 0 dropped it (r11 NULL sweep).
    docs = (
        load_parallel(spark, sf_dir, "documents")
        .filter(F.col("n_chars") > 0)
        .select(
            "doc_id",
            F.least(F.col("n_chars"), F.lit(PCM_MAX_SAMPLES)).alias("n"),
        )
    )

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Batch-wide vectorization: one flat sample array for the whole
        # Arrow batch (repeat/cumsum index algebra), split at clip
        # boundaries — the per-clip python loop this replaced was the
        # hot path (50k clips x tiny numpy calls).
        for pdf in batches:
            if not len(pdf):
                yield pd.DataFrame({"doc_id": [], "pcm": []})
                continue
            n = pdf["n"].to_numpy(dtype=np.int64)
            did = pdf["doc_id"].to_numpy(dtype=np.int64)
            ends = np.cumsum(n)
            starts = ends - n
            idx = np.arange(int(ends[-1]) if len(n) else 0, dtype=np.int64)
            idx -= np.repeat(starts, n)
            s = (
                (np.repeat(did, n) * 31 + idx * 7919) % 65536 - 32768
            ).astype("<i2")
            payloads = [a.tobytes() for a in np.split(s, ends[:-1])]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "pcm": payloads})

    return docs.mapInPandas(pack, "doc_id long, pcm binary")


def q_multimodal_pcm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Waveform feature extraction over a binary PCM column: peak
    amplitude, DC offset, RMS energy, zero-crossing count per clip —
    the audio-side analogue of multimodal_features, and the one decoder
    in the family that is fully REAL in this container (numpy int16
    decode; the image/video paths stay behind the optional-Pillow
    contract).

    Two mapInPandas stages: pack (synthesize+encode int16 LE bytes) and
    decode (np.frombuffer on the binary column + int64 aggregates). The
    integer sufficient statistics cross the engine boundary; the two
    float outputs (dc_offset, rms) are a single division and a
    correctly-rounded sqrt-of-division built from them IDENTICALLY in
    both engines, so the hash holds bit-for-bit.

    At 100 TB: both stages are map-side Arrow streams (no shuffle
    anywhere); maxRecordsPerBatch bounds peak memory per task; stats
    are O(1) per clip so the output is row-count-sized.
    """
    import numpy as np

    wav = pcm_waveform_table(spark, sf_dir)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Batch-wide vectorization: decode the whole Arrow batch into
        # ONE flat int64 array and compute every per-clip statistic as
        # a segmented reduce (add/maximum.reduceat) — no per-clip
        # python loop. Zero crossings use a cumulative-sum difference
        # so clip boundaries never count as crossings.
        for pdf in batches:
            if not len(pdf):
                continue
            bufs = list(pdf["pcm"])
            n = np.fromiter(
                (len(b) // 2 for b in bufs), dtype=np.int64, count=len(bufs)
            )
            s = np.frombuffer(b"".join(bufs), dtype="<i2").astype(np.int64)
            ends = np.cumsum(n)
            starts = ends - n
            sum_amp = np.add.reduceat(s, starts)
            sum_sq = np.add.reduceat(s * s, starts)
            peak = np.maximum.reduceat(np.abs(s), starts)
            x = ((s[:-1] >= 0) != (s[1:] >= 0)).astype(np.int64)
            cx = np.concatenate(([0], np.cumsum(x)))
            zc = np.where(n > 1, cx[ends - 1] - cx[starts], 0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(dtype=np.int64),
                    "n_samples": n,
                    "peak_abs": peak,
                    "sum_amp": sum_amp,
                    "sum_sq": sum_sq,
                    "n_zero_cross": zc,
                }
            )

    stats = wav.mapInPandas(decode, PCM_SCHEMA)
    return stats.select(
        "doc_id",
        "n_samples",
        "peak_abs",
        "sum_amp",
        "sum_sq",
        "n_zero_cross",
        (
            F.col("sum_amp").cast("double") / F.col("n_samples").cast("double")
        ).alias("dc_offset"),
        F.sqrt(
            F.col("sum_sq").cast("double") / F.col("n_samples").cast("double")
        ).alias("rms"),
    )


PCM_ORACLE_SQL = f"""
WITH base AS (
  SELECT doc_id, LEAST(n_chars, {PCM_MAX_SAMPLES}) AS n
  FROM documents WHERE n_chars > 0),
samples AS (
  SELECT doc_id, n, i,
         (doc_id * 31 + i * 7919) % 65536 - 32768 AS s
  FROM (SELECT doc_id, n, UNNEST(range(n)) AS i FROM base)),
agg AS (
  SELECT doc_id,
         CAST(MAX(n) AS BIGINT) AS n_samples,
         CAST(MAX(ABS(s)) AS BIGINT) AS peak_abs,
         CAST(SUM(s) AS BIGINT) AS sum_amp,
         CAST(SUM(s * s) AS BIGINT) AS sum_sq,
         CAST(COALESCE(SUM(CASE WHEN i > 0
                        AND (s >= 0) <> (prev_s >= 0) THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS n_zero_cross
  FROM (SELECT doc_id, n, i, s,
               LAG(s) OVER (PARTITION BY doc_id ORDER BY i) AS prev_s
        FROM samples)
  GROUP BY doc_id)
SELECT doc_id, n_samples, peak_abs, sum_amp, sum_sq, n_zero_cross,
       CAST(sum_amp AS DOUBLE) / CAST(n_samples AS DOUBLE) AS dc_offset,
       sqrt(CAST(sum_sq AS DOUBLE) / CAST(n_samples AS DOUBLE)) AS rms
FROM agg
"""


QUERIES = {
    "multimodal_features": q_multimodal_features,
    "multimodal_pcm_stats": q_multimodal_pcm_stats,
    "multimodal_resize": q_multimodal_resize,
    "multimodal_frames": q_multimodal_frames,
    "multimodal_dedup": q_multimodal_dedup,
}

ORACLE = {
    "multimodal_pcm_stats": PCM_ORACLE_SQL,
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
    # head bytes are BYTES of the utf-8 payload, not code points:
    # ascii(substr(text,1,1)) returns the first CHARACTER's code point
    # (233 for 'é') where the engine reads the first payload BYTE (195)
    # — identical on ASCII, divergent on multibyte (probed r10 on an
    # adversarial corpus). hex(encode(text)) is the byte-accurate view:
    # byte k (0-based) is substr(hex, 2k+1, 2). Empty payloads mirror
    # the engine's -1 sentinel.
    "multimodal_features": f"""
SELECT doc_id,
       strlen(text) AS byte_len,
       CAST(ceil(strlen(text) / {CHUNK}.0) AS BIGINT) AS n_chunks,
       CASE WHEN strlen(text) = 0 THEN -1
            ELSE CAST(('0x' || substr(hex(encode(text)), 1, 2)) AS INT)
       END AS head_byte,
       'text/plain' AS mime
FROM documents
WHERE text IS NOT NULL
""",
    "multimodal_resize": f"""
SELECT doc_id,
       strlen(text) AS orig_len,
       least(strlen(text), {RESIZE_W * RESIZE_H}) AS out_len,
       CAST({RESIZE_W} AS INT) AS target_w,
       CAST({RESIZE_H} AS INT) AS target_h,
       CASE WHEN strlen(text) > 0
            THEN CAST(('0x' || substr(hex(encode(text)), 1, 2)) AS INT)
            ELSE -1 END AS out_head
FROM documents
WHERE text IS NOT NULL
""",
    "multimodal_frames": f"""
SELECT doc_id,
       f AS frame_idx,
       f * {FRAME_BYTES} AS frame_off,
       least({FRAME_BYTES}, strlen(text) - f * {FRAME_BYTES}) AS frame_len,
       CAST(('0x' || substr(hex(encode(text)),
                            f * {FRAME_BYTES} * 2 + 1, 2)) AS INT)
         AS frame_head
FROM (
    SELECT doc_id, text,
           UNNEST(range(0, CAST(ceil(strlen(text) / {FRAME_BYTES}.0) AS BIGINT),
                        {FRAME_STEP})) AS f
    FROM documents
    WHERE text IS NOT NULL
)
""",
}
