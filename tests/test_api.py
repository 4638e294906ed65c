"""RagEngine facade: the reference's three live endpoints (/health,
/status, /query) plus ingest, end to end on a real staging dir."""

from __future__ import annotations

import pytest

from selfhosted_rag_doc_chat_prototype_spark.api import RagEngine

DOCS = {
    "alpha.md": "# Spark\nspark runs distributed dataframe queries fast\n",
    "beta.md": "# Cooking\nslow roasted vegetables with olive oil and salt\n",
    "gamma.txt": "dataframe joins shuffle data between executors",
}


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("api_staging")
    for name, body in DOCS.items():
        (d / name).write_text(body)
    return RagEngine.ingest(spark, str(d))


def test_health(engine):
    h = engine.health()
    assert h["aligned"] and h["chunks"] > 0


def test_status_counts_by_type(engine):
    rows = {r.type: r for r in engine.status().collect()}
    assert "text" in rows
    assert sum(r.n_documents for r in rows.values()) >= 3


def test_query_returns_cited_relevant_context(engine):
    res = engine.query("distributed dataframe queries", k=3).collect()
    assert 0 < len(res) <= 3
    assert [r.source_n for r in res] == list(range(1, len(res) + 1))
    for r in res:
        assert r.citation.startswith(f"[source{r.source_n}](")
    # the spark/dataframe docs must outrank the cooking doc
    top_sources = {r.source_file for r in res[:2]}
    assert "beta.md" not in top_sources


def test_query_context_is_deduped(engine):
    res = engine.query("anything at all", k=4).collect()
    chunks = [r.chunk for r in res]
    assert len(chunks) == len(set(chunks))


def test_session_history_trim(spark, engine):
    import datetime as dt

    base = dt.datetime(2026, 1, 1)
    rows = [
        ("s1", base + dt.timedelta(minutes=i),
         "user" if i % 2 == 0 else "assistant", f"msg{i}")
        for i in range(50)
    ] + [("s2", base, "user", "hello")]
    msgs = spark.createDataFrame(
        rows, "session_id string, ts timestamp, role string, content string"
    )
    h1 = engine.session_history(msgs, "s1", max_msgs=40).collect()
    assert len(h1) == 40
    # newest 40 kept, returned oldest-first
    assert h1[0].content == "msg10" and h1[-1].content == "msg49"
    assert engine.session_history(msgs).count() == 41


def test_load_roundtrip(spark, engine, tmp_path):
    out = str(tmp_path / "tables")
    engine.chunks.write.parquet(f"{out}/chunks")
    engine.embeddings.write.parquet(f"{out}/embeddings")
    again = RagEngine.load(spark, out)
    assert again.health()["aligned"]
