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


QUERIES = {
    "multimodal_image_stats": multimodal_image_stats,
    "multimodal_audio_frames": multimodal_audio_frames,
    "multimodal_video_keyframes": multimodal_video_keyframes,
}

ORACLE = {
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
