"""Real OCR / transcription backends for the S3/S5 ingest seams
(SURVEY §2.1; VERDICT r7 "What's missing" 2).

The reference OCRs PDF pages with Docling's EasyOCR backend exporting
markdown (``doc-ingest-chat/utils/ocr_utils.py:327-377``: empty output
is a skip, non-empty markdown becomes the page text) and transcribes
media with WhisperX (``workers/whisperx_worker.py:90-175``: one text
segment per recognized span). The engine's
:func:`ingest.extract_documents` routes PDF/media bytes through
pluggable ``(raw_bytes, path) -> list[(page_or_segment, text)]``
callables, defaulting to the documented deterministic stubs.

Like :mod:`embedding_st`, each backend splits into

- a pure CONTRACT layer (:func:`page_ocr`, :func:`segment_transcriber`)
  that adapts any raw engine to the seam shape -- page splitting,
  1-based page numbers, empty-output skip, whitespace hygiene -- and is
  unit-tested in-container with deterministic fakes;
- a lazy PRODUCTION loader (:func:`docling_ocr`,
  :func:`whisperx_transcribe`) that imports the heavy library once per
  executor process (pickled closures carry only config strings) and
  raises the missing package's name when absent (this container).
"""

from __future__ import annotations

from collections.abc import Callable

# seam shape consumed by ingest.extract_documents
OcrFn = Callable[[bytes, str], list[tuple[int, str]]]

_BACKEND_CACHE: dict = {}


def page_ocr(
    engine: Callable[[bytes, str], list[str]],
) -> OcrFn:
    """Adapt a raw page-OCR engine (bytes -> one markdown string per
    page) to the S3 seam: 1-based page numbers, reference skip
    semantics (an empty/whitespace page yields NO row -- ocr_utils'
    ``notext_docling`` outcome -- rather than an empty text row that
    downstream quality gates would have to re-drop)."""

    def ocr(raw: bytes, path: str) -> list[tuple[int, str]]:
        out = []
        for i, text in enumerate(engine(raw, path)):
            text = (text or "").strip()
            if text:
                out.append((i + 1, text))
        return out

    return ocr


def segment_transcriber(
    engine: Callable[[bytes, str], list[str]],
) -> OcrFn:
    """Adapt a raw transcription engine (bytes -> ordered segment
    texts) to the S5 seam: 0-based segment ids (the whisperx segment
    list convention), empty segments dropped."""

    def transcribe(raw: bytes, path: str) -> list[tuple[int, str]]:
        out = []
        seg = 0
        for text in engine(raw, path):
            text = (text or "").strip()
            if text:
                out.append((seg, text))
                seg += 1
        return out

    return transcribe


def docling_ocr(*, export: str = "markdown") -> OcrFn:
    """Production S3 backend: Docling (EasyOCR) page conversion
    exporting markdown, loaded once per executor process. Raises
    naming ``docling`` when the package is absent."""

    def engine(raw: bytes, path: str) -> list[str]:
        key = ("docling", export)
        if key not in _BACKEND_CACHE:
            try:
                from docling.document_converter import DocumentConverter
            except ImportError as exc:  # pragma: no cover - env-dependent
                raise ImportError(
                    "docling is not installed; the S3 real-OCR path "
                    "needs the 'docling' package (stub_ocr serves "
                    "hermetic runs)"
                ) from exc
            _BACKEND_CACHE[key] = DocumentConverter()
        converter = _BACKEND_CACHE[key]
        import os
        import tempfile

        # docling converts files, not buffers (ocr_utils.py:345-353
        # does the same tmp-file dance, named after the source)
        suffix = os.path.splitext(path)[1] or ".pdf"
        with tempfile.NamedTemporaryFile(suffix=suffix, delete=False) as f:
            f.write(raw)
            tmp = f.name
        try:
            result = converter.convert(tmp)
            text = result.document.export_to_markdown().strip()
        finally:
            os.unlink(tmp)
        # docling returns the whole document; split on its page breaks
        # so the seam keeps per-page rows like the reference's
        # page-at-a-time loop
        return text.split("\f") if text else []

    return page_ocr(engine)


def whisperx_transcribe(
    model_name: str = "large-v2",
    *,
    device: str = "cpu",
    compute_type: str = "int8",
) -> OcrFn:
    """Production S5 backend: WhisperX transcription
    (``whisperx.load_model(...)`` then per-file ``transcribe``),
    loaded once per executor process. Raises naming ``whisperx`` when
    the package is absent."""

    def engine(raw: bytes, path: str) -> list[str]:
        key = ("whisperx", model_name, device, compute_type)
        if key not in _BACKEND_CACHE:
            try:
                import whisperx
            except ImportError as exc:  # pragma: no cover - env-dependent
                raise ImportError(
                    "whisperx is not installed; the S5 real-"
                    "transcription path needs the 'whisperx' package "
                    "(stub_transcribe serves hermetic runs)"
                ) from exc
            _BACKEND_CACHE[key] = whisperx.load_model(
                model_name, device, compute_type=compute_type
            )
        model = _BACKEND_CACHE[key]
        import os
        import tempfile

        suffix = os.path.splitext(path)[1] or ".wav"
        with tempfile.NamedTemporaryFile(suffix=suffix, delete=False) as f:
            f.write(raw)
            tmp = f.name
        try:
            import whisperx

            audio = whisperx.load_audio(tmp)
            result = model.transcribe(audio)
        finally:
            os.unlink(tmp)
        return [s.get("text", "") for s in result.get("segments", [])]

    return segment_transcriber(engine)
