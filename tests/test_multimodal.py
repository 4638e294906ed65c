"""Multimodal binary-column plumbing: schema, Arrow batch shape, numpy
preprocessing math, decode-stub boundary."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from selfhosted_rag_doc_chat_prototype_spark.operators import multimodal


def _img_rows():
    rng = np.random.default_rng(42)
    rows = []
    for i, (h, w, c) in enumerate([(64, 48, 3), (100, 100, 1), (40, 6100, 3)]):
        arr = rng.integers(0, 256, size=(h, w, c) if c > 1 else (h, w), dtype=np.uint8)
        rows.append((f"img{i}.raw", arr.tobytes(), h, w, c, "uint8"))
    return rows


def test_preprocess_grayscale_and_resize(spark):
    df = spark.createDataFrame(_img_rows(), multimodal.IMAGE_SCHEMA)
    out = {r.path: r for r in multimodal.preprocess_images(df).collect()}
    assert all(r.channels == 1 for r in out.values())
    # oversized width gets strided down under the ceiling
    assert out["img2.raw"].width <= multimodal.MAX_OCR_DIM
    # payload size matches refreshed metadata
    for r in out.values():
        assert len(r.image) == r.height * r.width
        assert 0.0 <= r.mean_intensity <= 255.0


def test_grayscale_math_is_exact():
    img = np.array([[[255, 0, 0], [0, 255, 0]]], dtype=np.uint8)
    g = multimodal.grayscale(img)
    assert g.tolist() == [[76, 149]]  # integer luma: 299/587/114 per mille


def test_resize_noop_below_ceiling():
    img = np.zeros((10, 20), dtype=np.uint8)
    assert multimodal.resize_max_dim(img).shape == (10, 20)


def test_decode_stub_is_marked():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\xff\xd8\xff", "jpeg")


def test_frame_sampling(spark):
    df = spark.createDataFrame(
        [(f"v.mp4", i, b"") for i in range(25)],
        "path string, frame_index int, frame binary",
    )
    kept = multimodal.sample_frames(df, every_n=10).collect()
    assert sorted(r.frame_index for r in kept) == [0, 10, 20]


def test_is_valid_pdf_column(spark):
    df = spark.createDataFrame(
        [("good", b"%PDF-1.7 rest"), ("bad", b"not a pdf")],
        "name string, content binary",
    )
    out = {r.name: r.ok for r in df.select(
        "name", multimodal.is_valid_pdf_col(F.col("content")).alias("ok")
    ).collect()}
    assert out == {"good": True, "bad": False}


def test_audio_frames_features(spark, sf_dir):
    """PCM framing invariants: frames per vector = dim//FRAME, features
    integer-exact, zero-crossing count bounded by frame length."""
    from selfhosted_rag_doc_chat_prototype_spark.operators.multimodal import (
        AUDIO_FRAME,
        multimodal_audio_frames,
    )

    rows = multimodal_audio_frames(spark, sf_dir).collect()
    per_vec = {}
    for r in rows:
        per_vec.setdefault(r.vec_id, []).append(r)
        assert r.peak >= 0 and r.sum_abs >= r.peak
        assert 0 <= r.zero_crossings < AUDIO_FRAME
    n_frames = 64 // AUDIO_FRAME
    assert all(len(v) == n_frames for v in per_vec.values())
