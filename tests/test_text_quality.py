"""Truth-table tests for the quality predicates F1-F11 (mirrors the
reference's tests/test_text_utils.py strategy) plus murmur3 parity
against published test vectors."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from selfhosted_rag_doc_chat_prototype_spark.functions import text_quality as tq
from selfhosted_rag_doc_chat_prototype_spark.functions.hashing import (
    mmh3_chunk_id,
    mmh3_doc_id,
    murmur3_32,
)

CLEAN = "The quick brown fox jumps over the lazy dog near the river bank today."
GIBBERISH = "@#$% ^&*( )!~ 123 456 789 000 ### $$$ %%% ^^^ &&& *** ((( )))"
MOJIBAKE = "The report shows â€™ strange Ã characters everywhere"
REPETITIVE = "spam spam spam spam spam spam spam spam spam spam spam spam"
SHORT = "too short"
LONGWORDS = "normal aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa bbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbb c"


def _eval(spark, text, col_fn):
    df = spark.createDataFrame([(text,)], ["t"])
    return df.select(col_fn(F.col("t")).alias("v")).collect()[0]["v"]


@pytest.mark.parametrize(
    "text,expected",
    [(CLEAN, False), (GIBBERISH, True), (REPETITIVE, False)],
)
def test_is_gibberish(spark, text, expected):
    assert _eval(spark, text, tq.is_gibberish) == expected


@pytest.mark.parametrize(
    "text,expected",
    [(CLEAN, False), (MOJIBAKE, True)],
)
def test_is_visibly_corrupt(spark, text, expected):
    assert _eval(spark, text, tq.is_visibly_corrupt) == expected


@pytest.mark.parametrize(
    "text,expected",
    [(CLEAN, False), (SHORT, True), ("", True)],
)
def test_is_low_quality(spark, text, expected):
    assert _eval(spark, text, tq.is_low_quality) == expected


@pytest.mark.parametrize(
    "text,expected",
    [(CLEAN, False), (REPETITIVE, True)],
)
def test_is_repetitive(spark, text, expected):
    assert _eval(spark, text, tq.is_repetitive) == expected


@pytest.mark.parametrize(
    "text,expected",
    [(CLEAN, False), (LONGWORDS, True)],
)
def test_abnormal_word_lengths(spark, text, expected):
    assert _eval(spark, text, tq.has_abnormal_word_lengths) == expected


def test_is_bad_ocr_composite(spark):
    for text, expected in [
        (CLEAN, False),
        (GIBBERISH, True),
        (MOJIBAKE, True),
        (REPETITIVE, True),
        (SHORT, True),
    ]:
        assert _eval(spark, text, tq.is_bad_ocr) == expected, text


def test_quality_score_orders_clean_above_garbage(spark):
    clean = _eval(spark, CLEAN, tq.quality_score)
    bad = _eval(spark, GIBBERISH, tq.quality_score)
    assert 0.0 <= bad < clean <= 1.0


# ---- murmur3 parity (public MurmurHash3 x86_32 test vectors) -------------

@pytest.mark.parametrize(
    "data,seed,expected",
    [
        (b"", 0, 0x00000000),
        (b"", 1, 0x514E28B7),
        (b"", 0xFFFFFFFF, 0x81F16F39),
        (b"test", 0, 0xBA6BD213),
        (b"Hello, world!", 1234, 0xFAF6CDB3),
        (b"The quick brown fox jumps over the lazy dog", 0x9747B28C, 0x2FA826CD),
    ],
)
def test_murmur3_vectors(data, seed, expected):
    assert murmur3_32(data, seed) == expected


def test_reference_id_shapes():
    did = mmh3_doc_id("some file content")
    assert did.startswith("DOC_") and len(did) == 12
    cid = mmh3_chunk_id(did, "a chunk")
    assert cid.startswith(did + "_")
    # determinism
    assert did == mmh3_doc_id("some file content")
