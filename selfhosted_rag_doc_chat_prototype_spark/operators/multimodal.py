"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata (reference: base64 image buffers + shape/dtype,
``models/data_models.py:24-35``; preprocessing T14,
``utils/ocr_utils.py:41-57``; PDF validity F11,
``utils/text_utils.py:226-249``).

The Spark-side plumbing is real and tested: schemas, Arrow batch
shapes, partitioning, and the numpy math for resize/grayscale/frame
sampling (images here are raw uint8 arrays + shape metadata, so numpy
alone suffices). The *codec* step (JPEG/PNG/ffmpeg decode) is the only
stub -- the image/audio libraries are not in this container -- and it
raises ``NotImplementedError`` with a clear marker; everything
downstream of the decode boundary is exercised with deterministic
synthetic arrays.

Scale: feature extraction is map-only over Arrow batches; binary
payloads stay off the driver, and column pruning keeps metadata-only
queries from ever reading the bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_OCR_DIM = 3000  # reference: MAX_OCR_DIM resize ceiling (ocr_utils.py:41-57)

IMAGE_SCHEMA = (
    "path string, image binary, height int, width int, channels int, dtype string"
)


def decode_image(raw: bytes, fmt: str) -> np.ndarray:
    """STUB: real JPEG/PNG decode requires PIL/cv2 (not in container).
    Raw uint8 buffers with shape metadata take the non-stub path."""
    raise NotImplementedError(
        "codec decode is stubbed in-container; supply raw uint8 buffers "
        "with shape metadata, or plug a decoder in here"
    )


def _to_array(raw: bytes, h: int, w: int, c: int, dtype: str) -> np.ndarray:
    return np.frombuffer(raw, dtype=np.dtype(dtype)).reshape(
        (h, w) if c == 1 else (h, w, c)
    )


def grayscale(img: np.ndarray) -> np.ndarray:
    """RGBA/RGB -> grayscale (T14), integer-exact luma approximation."""
    if img.ndim == 2:
        return img
    rgb = img[..., :3].astype(np.uint32)
    gray = (299 * rgb[..., 0] + 587 * rgb[..., 1] + 114 * rgb[..., 2]) // 1000
    return gray.astype(img.dtype)


def resize_max_dim(img: np.ndarray, max_dim: int = MAX_OCR_DIM) -> np.ndarray:
    """Downsample so max(h, w) <= max_dim (nearest-neighbor stride --
    deterministic, no interpolation library)."""
    h, w = img.shape[:2]
    scale = max(h, w) / max_dim
    if scale <= 1.0:
        return img
    step = int(np.ceil(scale))
    return img[::step, ::step]


def preprocess_images(df: DataFrame) -> DataFrame:
    """T14 as a mapInPandas stage: grayscale + bounded resize; emits
    processed bytes + refreshed metadata + mean intensity feature."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, raw, h, w, c, dt in zip(
                pdf["path"], pdf["image"], pdf["height"], pdf["width"],
                pdf["channels"], pdf["dtype"],
            ):
                img = _to_array(bytes(raw), int(h), int(w), int(c), dt)
                out = resize_max_dim(grayscale(img))
                rows.append((
                    path, out.tobytes(), int(out.shape[0]), int(out.shape[1]),
                    1, str(out.dtype), float(np.round(out.mean(), 4)),
                ))
            yield pd.DataFrame(
                rows,
                columns=["path", "image", "height", "width", "channels",
                         "dtype", "mean_intensity"],
            )

    return df.mapInPandas(run, IMAGE_SCHEMA + ", mean_intensity double")


def sample_frames(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame sampling for video-as-binary: rows carry a frame_index;
    keep every Nth (decode stub boundary -- indices are metadata)."""
    return df.filter(F.col("frame_index") % every_n == 0)


def is_valid_pdf_col(content: F.Column) -> F.Column:
    """F11: magic-header check on the binary column
    (text_utils.py:226-249; full first-page parse needs the codec
    boundary)."""
    return F.substring(content, 1, 4) == F.lit(b"%PDF")


# ---- registry surface -----------------------------------------------------

IMG_SIDE = 8  # 64-dim embedding -> 8x8 single-channel synthetic image


def multimodal_image_stats(spark, sf_dir: str) -> DataFrame:
    """Image-column feature extraction, end to end and oracle-checkable:
    quantize each embedding vector into a synthetic 8x8 uint8 image
    (pixel = clamp(floor((x + 1) * 127.5), 0, 255) -- floor, not round,
    so Spark/numpy and DuckDB agree bit-exactly), run it through the
    real binary-column plumbing (tobytes -> binary column -> frombuffer
    -> grayscale/resize), and emit integer-exact features.

    Scale shape: map-only over Arrow batches; binary payloads never
    leave the executors; the scan prunes to (vec_id, embedding).
    """
    from ..sources.tables import table

    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for vec_id, v in zip(pdf["vec_id"], pdf["embedding"]):
                arr = np.asarray(v, dtype=np.float64)
                img = np.clip(np.floor((arr + 1.0) * 127.5), 0, 255).astype(
                    np.uint8
                ).reshape(IMG_SIDE, IMG_SIDE)
                raw = img.tobytes()  # binary-column roundtrip
                back = _to_array(raw, IMG_SIDE, IMG_SIDE, 1, "uint8")
                out = resize_max_dim(grayscale(back))
                rows.append((
                    int(vec_id), int(out.shape[0]), int(out.shape[1]), 1,
                    int(out.sum()),
                ))
            yield pd.DataFrame(
                rows,
                columns=["vec_id", "height", "width", "channels",
                         "sum_intensity"],
            )

    return emb.mapInPandas(
        run,
        "vec_id long, height int, width int, channels int, sum_intensity long",
    )


AUDIO_FRAME = 16  # samples per analysis frame


def multimodal_audio_frames(spark, sf_dir: str) -> DataFrame:
    """Audio-column feature extraction, end to end and oracle-checkable:
    quantize each embedding into int16 PCM samples
    (``floor(x * 10000)`` -- integer-exact in Spark/numpy and DuckDB),
    round-trip through a binary column (tobytes -> frombuffer, the real
    audio-buffer plumbing), then frame into ``AUDIO_FRAME``-sample
    windows and emit per-frame energy/peak/zero-crossing features --
    the framing/feature side of the WhisperX boundary (S5/T15) with the
    codec decode stubbed exactly like :func:`decode_image`.

    Scale shape: map-only over Arrow batches; PCM bytes never leave the
    executors; one output row per frame.
    """
    from ..sources.tables import table

    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for vec_id, v in zip(pdf["vec_id"], pdf["embedding"]):
                arr = np.asarray(v, dtype=np.float64)
                pcm = np.floor(arr * 10000.0).astype(np.int16)
                raw = pcm.tobytes()  # binary-column roundtrip
                back = np.frombuffer(raw, dtype=np.int16)
                for f in range(len(back) // AUDIO_FRAME):
                    fr = back[f * AUDIO_FRAME:(f + 1) * AUDIO_FRAME].astype(
                        np.int64
                    )
                    rows.append((
                        int(vec_id), f,
                        int(np.abs(fr).sum()), int(np.abs(fr).max()),
                        int(np.sum(fr[:-1] * fr[1:] < 0)),
                    ))
            yield pd.DataFrame(
                rows,
                columns=["vec_id", "frame_idx", "sum_abs", "peak",
                         "zero_crossings"],
            )

    return emb.mapInPandas(
        run,
        "vec_id long, frame_idx int, sum_abs long, peak long,"
        " zero_crossings int",
    )


N_VIDEO_FRAMES = 12   # synthetic frames per "video"
FRAME_SAMPLE_N = 3    # keep every Nth frame (sample_frames semantics)


def multimodal_video_keyframes(spark, sf_dir: str) -> DataFrame:
    """Video-column plumbing, end to end and oracle-checkable: render
    each embedding into a ``N_VIDEO_FRAMES``-frame synthetic clip
    (frame f = the 8x8 image brightened by +f, integer-exact), pack
    the frames into ONE contiguous binary buffer (the video-as-binary
    contract), then frombuffer -> reshape(frames, pixels) -> stride
    sample every ``FRAME_SAMPLE_N``th frame, emitting per-keyframe
    intensity and the scene-change metric (sum |pixel delta| vs the
    previous keyframe). The ffmpeg decode that would produce the raw
    frame buffer is the same stubbed codec boundary as
    :func:`decode_image`.

    Scale shape: map-only over Arrow batches; the frame buffer lives
    only executor-side; output is one row per keyframe."""
    from ..sources.tables import table

    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n_px = IMG_SIDE * IMG_SIDE

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for vec_id, v in zip(pdf["vec_id"], pdf["embedding"]):
                arr = np.asarray(v, dtype=np.float64)
                base = np.clip(np.floor((arr + 1.0) * 127.5), 0, 255)
                frames = np.stack([
                    np.clip(base + f, 0, 255).astype(np.uint8)
                    for f in range(N_VIDEO_FRAMES)
                ])
                raw = frames.tobytes()  # the packed video buffer
                clip = np.frombuffer(raw, dtype=np.uint8).reshape(
                    N_VIDEO_FRAMES, n_px
                )
                keyframes = clip[::FRAME_SAMPLE_N]
                prev = None
                for j, fr in enumerate(keyframes):
                    f_idx = j * FRAME_SAMPLE_N
                    diff = (
                        0 if prev is None
                        else int(np.abs(
                            fr.astype(np.int64) - prev.astype(np.int64)
                        ).sum())
                    )
                    rows.append((
                        int(vec_id), f_idx, int(fr.sum()), diff,
                    ))
                    prev = fr
            yield pd.DataFrame(
                rows,
                columns=["vec_id", "frame_idx", "sum_intensity",
                         "diff_prev"],
            )

    return emb.mapInPandas(
        run,
        "vec_id long, frame_idx int, sum_intensity long, diff_prev long",
    )


# ---- perceptual-hash near-duplicate images (banded, codegen-only) --------

PHASH_BITS = 64            # one bit per pixel of the 8x8 image
PHASH_BANDS = 4            # 16-bit bands for the LSH bucket join
PHASH_BAND_BITS = PHASH_BITS // PHASH_BANDS
PHASH_MAX_HAMMING = 12     # near-dup threshold


def _phash_bands(px: F.Column, total: F.Column) -> F.Column:
    """aHash bands from a 64-pixel integer image: bit_i = (pixel_i *
    64 > sum(pixels)) -- the mean threshold in EXACT integer arithmetic
    (no division) -- packed into ``PHASH_BANDS`` x 16-bit integers via
    a Horner fold. Pure codegen higher-order functions; the DuckDB
    twin is the same fold over ``list_reduce``."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(PHASH_BANDS - 1)),
        lambda j: F.aggregate(
            # descending bit order => acc*2 + bit == the packed int
            F.sequence(j * PHASH_BAND_BITS + PHASH_BAND_BITS,
                       j * PHASH_BAND_BITS + 1, F.lit(-1)),
            F.lit(0).cast("long"),
            lambda acc, i: acc * 2 + F.when(
                F.element_at(px, i.cast("int")) * 64 > total, F.lit(1)
            ).otherwise(F.lit(0)).cast("long"),
        ),
    )


def multimodal_phash_dedup(spark, sf_dir: str) -> DataFrame:
    """Near-duplicate IMAGE detection over binary-image semantics, the
    pipeline a crawl-scale multimodal corpus runs after decode: aHash
    perceptual fingerprints + banded LSH bucketing + exact Hamming
    verify -- never all-pairs. Each embedding renders the two video
    keyframes (frames 0 and ``FRAME_SAMPLE_N`` of the
    ``multimodal_video_keyframes`` contract: frame f = image + f
    brightness), which are near-duplicates BY CONSTRUCTION, so the
    operator's recall is observable on synthetic data: every vector
    must pair its own two frames, plus any true cross-image
    collisions.

    Everything is integer-exact pure codegen (quantize -> threshold ->
    Horner bit-pack -> band equi-join -> popcount Hamming), with a
    full DuckDB oracle. Scale shape: candidate pairs are bounded by
    band-bucket occupancy (16-bit bands over mean-thresholded bits are
    near-uniform on real images); the verify step touches only
    candidates, exactly like the text MinHash/LSH family."""
    from ..sources.tables import table

    emb = table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    ).select("vec_id", F.col("embedding").cast("array<double>").alias("v"))

    base_px = F.transform(
        F.col("v"),
        lambda x: F.least(
            F.greatest(F.floor((x + 1.0) * 127.5), F.lit(0.0)),
            F.lit(255.0)),
    )
    frames = emb.select(
        "vec_id",
        F.explode(F.array(F.lit(0), F.lit(FRAME_SAMPLE_N)))
        .alias("frame_idx"),
        base_px.alias("px0"),
    ).select(
        "vec_id", "frame_idx",
        F.transform(
            "px0", lambda x: F.least(x + F.col("frame_idx"), F.lit(255.0))
        ).alias("px"),
    )
    # let-bound: projection collapse would otherwise inline the px
    # transform chain into every per-bit lambda reference (the
    # interpreted-HOF re-evaluation pitfall, functions.text_quality.let)
    from ..functions.text_quality import let as _let

    hashed = frames.select(
        "vec_id", "frame_idx",
        _let(
            F.col("px"),
            lambda px: _let(
                F.aggregate(px, F.lit(0.0), lambda a, x: a + x),
                lambda total: _phash_bands(px, total),
            ),
        ).alias("bands"),
    )
    banded = hashed.select(
        "vec_id", "frame_idx", "bands",
        F.posexplode("bands").alias("band_idx", "band_val"),
    )
    a = banded.select(
        F.col("vec_id").alias("a_vec"), F.col("frame_idx").alias("a_frame"),
        F.col("bands").alias("a_bands"), "band_idx", "band_val",
    )
    b = banded.select(
        F.col("vec_id").alias("b_vec"), F.col("frame_idx").alias("b_frame"),
        F.col("bands").alias("b_bands"), "band_idx", "band_val",
    )
    pairs = (
        a.join(b, ["band_idx", "band_val"])
        .filter(
            (F.col("a_vec") < F.col("b_vec"))
            | ((F.col("a_vec") == F.col("b_vec"))
               & (F.col("a_frame") < F.col("b_frame")))
        )
        .select("a_vec", "a_frame", "b_vec", "b_frame",
                "a_bands", "b_bands")
        .dropDuplicates(["a_vec", "a_frame", "b_vec", "b_frame"])
    )
    ham = F.aggregate(
        F.zip_with(
            "a_bands", "b_bands",
            lambda x, y: F.bit_count(x.bitwiseXOR(y)).cast("long"),
        ),
        F.lit(0).cast("long"), lambda acc, x: acc + x,
    )
    return (
        pairs.withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= PHASH_MAX_HAMMING)
        .select("a_vec", "a_frame", "b_vec", "b_frame", "hamming")
    )


QUERIES = {
    "multimodal_image_stats": multimodal_image_stats,
    "multimodal_audio_frames": multimodal_audio_frames,
    "multimodal_video_keyframes": multimodal_video_keyframes,
    "multimodal_phash_dedup": multimodal_phash_dedup,
}

_PHASH_BANDS_SQL = (
    "list_transform(range(0, {bands}), j -> "
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(range(j * {bb} + {bb}, j * {bb}, -1), "
    "i -> CAST(CASE WHEN px[CAST(i AS INT)] * 64 > total THEN 1 "
    "ELSE 0 END AS BIGINT))), (acc, x) -> acc * 2 + x))"
).format(bands=PHASH_BANDS, bb=PHASH_BAND_BITS)

ORACLE = {
    "multimodal_phash_dedup": f"""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings WHERE embedding IS NOT NULL
        ),
        frames AS (
            SELECT vec_id, f.f AS frame_idx,
                   list_transform(v, x -> least(
                       least(greatest(floor((x + 1.0) * 127.5), 0.0),
                             255.0) + f.f, 255.0)) AS px
            FROM e, unnest([0, {FRAME_SAMPLE_N}]) f(f)
        ),
        hashed AS (
            SELECT vec_id, frame_idx, {_PHASH_BANDS_SQL} AS bands
            FROM (SELECT vec_id, frame_idx, px, list_sum(px) AS total
                  FROM frames)
        ),
        banded AS (
            SELECT vec_id, frame_idx, bands, b.j AS band_idx,
                   bands[b.j + 1] AS band_val
            FROM hashed, range(0, {PHASH_BANDS}) b(j)
        ),
        pairs AS (
            SELECT DISTINCT
                   a.vec_id AS a_vec, a.frame_idx AS a_frame,
                   b.vec_id AS b_vec, b.frame_idx AS b_frame,
                   a.bands AS a_bands, b.bands AS b_bands
            FROM banded a
            JOIN banded b ON a.band_idx = b.band_idx
                         AND a.band_val = b.band_val
            WHERE a.vec_id < b.vec_id
               OR (a.vec_id = b.vec_id AND a.frame_idx < b.frame_idx)
        )
        SELECT a_vec, CAST(a_frame AS INTEGER) AS a_frame,
               b_vec, CAST(b_frame AS INTEGER) AS b_frame,
               CAST(h AS INTEGER) AS hamming
        FROM (
            SELECT *, list_sum(list_transform(range(1, {PHASH_BANDS} + 1),
                       j -> bit_count(xor(a_bands[CAST(j AS INT)],
                                          b_bands[CAST(j AS INT)])))) AS h
            FROM pairs
        ) WHERE h <= {PHASH_MAX_HAMMING}
    """,
    "multimodal_image_stats": f"""
        SELECT vec_id,
               CAST({IMG_SIDE} AS INTEGER) AS height,
               CAST({IMG_SIDE} AS INTEGER) AS width,
               CAST(1 AS INTEGER) AS channels,
               CAST(list_sum(list_transform(
                   CAST(embedding AS DOUBLE[]),
                   x -> least(greatest(floor((x + 1.0) * 127.5), 0.0), 255.0)
               )) AS BIGINT) AS sum_intensity
        FROM embeddings
    """,
    "multimodal_video_keyframes": f"""
        WITH px AS (
            SELECT vec_id,
                   list_transform(CAST(embedding AS DOUBLE[]),
                       x -> least(greatest(floor((x + 1.0) * 127.5), 0.0),
                                  255.0)) AS base
            FROM embeddings
        ),
        kf AS (
            SELECT vec_id, f.f AS frame_idx,
                   list_transform(base,
                       x -> least(x + f.f, 255.0)) AS fr,
                   CASE WHEN f.f = 0 THEN NULL ELSE
                       list_transform(base,
                           x -> least(x + f.f - {FRAME_SAMPLE_N}, 255.0))
                   END AS prev_fr
            FROM px, unnest(range(0, {N_VIDEO_FRAMES}, {FRAME_SAMPLE_N}))
                     f(f)
        )
        SELECT vec_id,
               CAST(frame_idx AS INTEGER) AS frame_idx,
               CAST(list_sum(fr) AS BIGINT) AS sum_intensity,
               CAST(coalesce(list_sum(
                   list_transform(range(1, len(fr) + 1),
                                  i -> abs(fr[i] - prev_fr[i]))), 0)
                   AS BIGINT) AS diff_prev
        FROM kf
    """,
    "multimodal_audio_frames": f"""
        WITH p AS (
            SELECT vec_id,
                   list_transform(CAST(embedding AS DOUBLE[]),
                                  x -> CAST(floor(x * 10000.0) AS BIGINT)) AS pcm
            FROM embeddings
        ),
        fr AS (
            SELECT vec_id, f.f AS frame_idx,
                   pcm[f.f * {AUDIO_FRAME} + 1 : f.f * {AUDIO_FRAME} + {AUDIO_FRAME}] AS w
            FROM p, unnest(range(0, CAST(len(pcm) // {AUDIO_FRAME} AS BIGINT))) f(f)
        )
        SELECT vec_id,
               CAST(frame_idx AS INTEGER) AS frame_idx,
               CAST(list_sum(list_transform(w, x -> abs(x))) AS BIGINT) AS sum_abs,
               CAST(list_max(list_transform(w, x -> abs(x))) AS BIGINT) AS peak,
               CAST(len(list_filter(range(1, {AUDIO_FRAME}),
                                    i -> w[i] * w[i + 1] < 0)) AS INTEGER)
                   AS zero_crossings
        FROM fr
    """,
}
