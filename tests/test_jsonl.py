"""JSONL source/sink: explicit-schema scan, corrupt-line tolerance,
round-trip through the sink, and interop with the curation surface."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from selfhosted_rag_doc_chat_prototype_spark.sources.jsonl import (
    CORRUPT_COL,
    corrupt_line_count,
    read_jsonl,
    write_jsonl,
)


def _write_fixture(tmp_path):
    lines = [
        json.dumps({"doc_id": 1, "text": "alpha beta", "url": "http://a",
                    "lang": "en", "meta": {"src": "cc"}}),
        json.dumps({"doc_id": 2, "text": "gamma", "url": None,
                    "lang": "de", "meta": {}}),
        '{"doc_id": 3, "text": "truncated',          # malformed
        json.dumps({"doc_id": 4, "text": "delta", "extra_key": 7}),
    ]
    p = tmp_path / "corpus.jsonl"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_read_jsonl_explicit_schema_drops_corrupt(spark, tmp_path):
    path = _write_fixture(tmp_path)
    df = read_jsonl(spark, path)
    rows = {r.doc_id: r for r in df.collect()}
    assert set(rows) == {1, 2, 4}
    assert rows[1].meta == {"src": "cc"}
    assert rows[4].text == "delta"          # extra input keys ignored
    assert CORRUPT_COL not in df.columns


def test_corrupt_lines_are_countable(spark, tmp_path):
    path = _write_fixture(tmp_path)
    assert corrupt_line_count(spark, path) == 1


def test_jsonl_round_trip(spark, tmp_path):
    path = _write_fixture(tmp_path)
    df = read_jsonl(spark, path)
    out = str(tmp_path / "out")
    write_jsonl(df.select("doc_id", "text"), out, shards=2)
    back = spark.read.schema("doc_id long, text string").json(out)
    assert sorted((r.doc_id, r.text) for r in back.collect()) == sorted(
        (r.doc_id, r.text) for r in df.select("doc_id", "text").collect()
    )


def test_jsonl_feeds_curation_operators(spark, tmp_path):
    """A JSONL scan slots straight into the text-quality surface."""
    from selfhosted_rag_doc_chat_prototype_spark.functions import text_quality as tq

    path = _write_fixture(tmp_path)
    df = read_jsonl(spark, path).select(
        "doc_id", F.size(tq.words(F.col("text"))).alias("n_words")
    )
    got = {r.doc_id: r.n_words for r in df.collect()}
    assert got == {1: 2, 2: 1, 4: 1}
