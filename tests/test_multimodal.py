"""Multimodal plumbing: binary column + mapInPandas feature extraction."""

from __future__ import annotations

import pytest

from mapreduce_sssp_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    binary_table,
    decode_image,
    extract_features,
    resize_image,
    resize_images,
    sample_frames,
)


def test_decode_real_or_stub_by_pil_presence():
    """decode_image/resize_image follow the optional Pillow import:
    with Pillow installed they decode/resize for real; without it they
    raise the documented NotImplementedError. This container has no
    codecs, so the stub branch runs here; a codec-equipped deployment
    runs the real branch with zero plan change."""
    try:
        from PIL import Image
    except ImportError:
        Image = None
    if Image is None:
        with pytest.raises(NotImplementedError):
            decode_image(b"\x89PNG")
        with pytest.raises(NotImplementedError):
            resize_image(b"\x89PNG", 8, 8)
        return
    import io

    buf = io.BytesIO()
    Image.new("RGB", (32, 16), (255, 0, 0)).save(buf, format="PNG")
    png = buf.getvalue()
    feats = decode_image(png)
    assert (feats["width"], feats["height"]) == (32, 16)
    assert feats["byte_len"] == len(png)
    resized = resize_image(png, 8, 8)
    out = Image.open(io.BytesIO(resized))
    assert out.size == (8, 8)


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


def _literal_binary(spark, rows):
    from pyspark.sql import functions as F

    return spark.createDataFrame(rows, "doc_id long, content binary").select(
        "doc_id",
        "content",
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length("content").cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def test_resize_stub_and_fake_transform(spark):
    # The real-vs-stub behavior of resize_image itself is covered by
    # test_decode_real_or_stub_by_pil_presence; this test pins the
    # _fake_resize dataflow the Spark plan uses either way.
    binary = _literal_binary(
        spark, [(1, b"a" * 100), (2, b""), (3, bytes([7]) + b"x" * 9999)]
    )
    out = {r.doc_id: r for r in resize_images(binary, w=8, h=8).collect()}
    # 8x8 => 64-byte budget: shorter payloads keep their size, longer truncate.
    assert (out[1].orig_len, out[1].out_len, out[1].out_head) == (100, 64, ord("a"))
    assert (out[2].orig_len, out[2].out_len, out[2].out_head) == (0, 0, -1)
    assert (out[3].orig_len, out[3].out_len, out[3].out_head) == (10000, 64, 7)


def test_frame_sampling_explodes_one_to_n(spark):
    # 10 frames of 4 bytes, keep every 3rd -> indices 0,3,6,9.
    payload = bytes(range(40))
    binary = _literal_binary(spark, [(1, payload), (2, b""), (3, b"abc")])
    rows = sample_frames(binary, frame_bytes=4, step=3).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert sorted(r.frame_idx for r in by_doc[1]) == [0, 3, 6, 9]
    f9 = next(r for r in by_doc[1] if r.frame_idx == 9)
    assert (f9.frame_off, f9.frame_len, f9.frame_head) == (36, 4, 36)
    assert 2 not in by_doc  # empty payload -> zero frames
    assert [(r.frame_idx, r.frame_len) for r in by_doc[3]] == [(0, 3)]


def test_multimodal_dedup_finds_exactly_the_planted_copies(spark, sf_dir):
    from mapreduce_sssp_spark.operators.multimodal import q_multimodal_dedup

    rows = q_multimodal_dedup(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    planted = sum(1 for d in docs if d.doc_id % 7 == 0)
    # Texts are unique in the corpus, so every duplicate group is one
    # planted pair; canonical is always the original id.
    assert len(rows) == planted
    for r in rows:
        assert r.n_copies == 2 and r.canonical_doc_id < 100_000


def test_pcm_decode_is_real_not_stub(spark, sf_dir):
    """The numpy int16 decode must read the actual bytes: flipping one
    byte of a payload must change the stats, and the packed waveform
    must round-trip to the synthesized samples."""
    import numpy as np

    from mapreduce_sssp_spark.operators.multimodal import (
        pcm_waveform_table,
        q_multimodal_pcm_stats,
    )

    wav = {r.doc_id: bytes(r.pcm) for r in
           pcm_waveform_table(spark, sf_dir).limit(5).collect()}
    for doc_id, buf in wav.items():
        s = np.frombuffer(buf, dtype="<i2").astype(np.int64)
        i = np.arange(len(s), dtype=np.int64)
        want = (doc_id * 31 + i * 7919) % 65536 - 32768
        assert (s == want).all(), doc_id

    stats = {r.doc_id: r for r in
             q_multimodal_pcm_stats(spark, sf_dir).collect()}
    doc_id, buf = next(iter(wav.items()))
    corrupted = bytearray(buf)
    corrupted[0] ^= 0xFF
    s2 = np.frombuffer(bytes(corrupted), dtype="<i2").astype(np.int64)
    r = stats[doc_id]
    assert int(np.sum(s2)) != r.sum_amp  # byte flip visibly moves stats
    # zero-cross sanity: strictly fewer crossings than samples.
    for r in stats.values():
        assert 0 <= r.n_zero_cross < r.n_samples or r.n_samples == 1
        assert r.peak_abs <= 32768
