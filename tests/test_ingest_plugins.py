"""S3/S5 real-backend seam tests (the :mod:`embedding_st` pattern):
the contract layer runs in-container against deterministic fakes
through the real ``extract_documents`` mapInPandas operator; the
production Docling/WhisperX loaders gate on ``pytest.importorskip``.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from selfhosted_rag_doc_chat_prototype_spark.operators import ingest
from selfhosted_rag_doc_chat_prototype_spark.operators.ingest_plugins import (
    docling_ocr,
    page_ocr,
    segment_transcriber,
    whisperx_transcribe,
)


def test_page_ocr_contract():
    """1-based pages, empty pages skipped (the reference's
    notext_docling outcome), whitespace trimmed."""
    engine = lambda raw, path: ["# Page one", "  ", "", "page three  "]
    ocr = page_ocr(engine)
    assert ocr(b"x", "a.pdf") == [(1, "# Page one"), (4, "page three")]


def test_segment_transcriber_contract():
    """0-based contiguous segment ids, empties dropped."""
    engine = lambda raw, path: ["hello", "", "world "]
    tr = segment_transcriber(engine)
    assert tr(b"x", "a.wav") == [(0, "hello"), (1, "world")]


def test_extract_documents_with_injected_backends(spark):
    """Fake Docling/WhisperX engines through the REAL extract
    operator: per-page/per-segment rows come out with the contract's
    numbering and the reference-parity doc ids."""
    files = spark.createDataFrame(
        [
            ("docs/a.pdf", "pdf", bytearray(b"%PDF fake bytes")),
            ("media/b.wav", "audio", bytearray(b"RIFF fake audio")),
            ("docs/c.txt", "text", bytearray(b"plain text")),
        ],
        "path string, file_type string, content binary",
    )
    fake_ocr = page_ocr(
        lambda raw, path: [f"md of {path} p{i}" for i in range(2)]
    )
    fake_tr = segment_transcriber(
        lambda raw, path: [f"segment {i} of {path}" for i in range(3)]
    )
    rows = ingest.extract_documents(
        files, ocr=fake_ocr, transcribe=fake_tr
    ).collect()
    by_path = {}
    for r in rows:
        by_path.setdefault(r.path, []).append((r.page, r.text))
    assert by_path["docs/a.pdf"] == [
        (1, "md of docs/a.pdf p0"), (2, "md of docs/a.pdf p1")]
    assert by_path["media/b.wav"] == [
        (0, "segment 0 of media/b.wav"),
        (1, "segment 1 of media/b.wav"),
        (2, "segment 2 of media/b.wav")]
    assert by_path["docs/c.txt"] == [(1, "plain text")]
    # doc ids are the mmh3 of the raw bytes, distinct per file
    ids = {r.path: r.doc_id for r in rows}
    assert len(set(ids.values())) == 3


def test_injected_ocr_flows_to_assembled_markdown(spark):
    """Seam-to-DAG proof: injected OCR text survives tag_pages +
    assemble_markdown with page anchors intact."""
    files = spark.createDataFrame(
        [("docs/a.pdf", "pdf", bytearray(b"%PDF bytes"))],
        "path string, file_type string, content binary",
    )
    fake_ocr = page_ocr(lambda raw, path: ["alpha", "beta"])
    pages = ingest.extract_documents(files, ocr=fake_ocr)
    md = ingest.assemble_markdown(ingest.tag_pages(pages)).collect()
    assert len(md) == 1
    assert "### [INTERNAL_PAGE_1]\nalpha" in md[0].markdown
    assert "### [INTERNAL_PAGE_2]\nbeta" in md[0].markdown


def test_missing_docling_names_the_dependency():
    try:
        import docling  # noqa: F401
        pytest.skip("docling present; raise path untestable")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="docling"):
        docling_ocr()(b"%PDF", "a.pdf")


def test_missing_whisperx_names_the_dependency():
    try:
        import whisperx  # noqa: F401
        pytest.skip("whisperx present; raise path untestable")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="whisperx"):
        whisperx_transcribe()(b"RIFF", "a.wav")


def test_real_docling_e2e(spark):
    """Runs only where docling is installed (cluster image)."""
    pytest.importorskip("docling")
    files = spark.createDataFrame(
        [("docs/a.pdf", "pdf", bytearray(
            b"%PDF-1.4\n1 0 obj<</Type/Catalog>>endobj\ntrailer<<>>\n%%EOF"
        ))],
        "path string, file_type string, content binary",
    )
    rows = ingest.extract_documents(files, ocr=docling_ocr()).collect()
    assert all(r.page >= 1 and r.text.strip() for r in rows)


def test_real_whisperx_e2e(spark):
    """Runs only where whisperx is installed (cluster image)."""
    pytest.importorskip("whisperx")
    import math
    import struct

    sr = 16000
    pcm = b"".join(
        struct.pack("<h", int(8000 * math.sin(2 * math.pi * 440 * t / sr)))
        for t in range(sr)
    )
    wav = (b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVEfmt "
           + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16)
           + b"data" + struct.pack("<I", len(pcm)) + pcm)
    files = spark.createDataFrame(
        [("media/tone.wav", "audio", bytearray(wav))],
        "path string, file_type string, content binary",
    )
    rows = ingest.extract_documents(
        files, transcribe=whisperx_transcribe()
    ).collect()
    assert all(r.page >= 0 for r in rows)
