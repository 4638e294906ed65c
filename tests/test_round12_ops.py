"""Round-12 operators: LSH-shortlisted bitext production face (recall
floor lives in test_similarity) and the CDC incremental re-embed gate
-- the edit-blast-radius contract that is the whole point of
content-defined chunking."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from selfhosted_rag_doc_chat_prototype_spark.operators import chunking


def _write_docs(d, rows):
    os.makedirs(d, exist_ok=True)
    pq.write_table(pa.table({
        "doc_id": [r[0] for r in rows],
        "text": [r[1] for r in rows],
        "lang": ["en"] * len(rows),
        "source": [r[2] for r in rows],
        "n_chars": [len(r[1]) for r in rows],
    }), f"{d}/documents.parquet")


def test_cdc_incremental_embed_blast_radius(spark, tmp_path):
    """r12 (r11-VERDICT item 3): a FRONT-of-document edit re-embeds
    only the edited chunk's neighborhood under CDC boundaries, while
    a fixed-width chunker shifts every window and would re-embed the
    whole tail. doc 0 (doc_id % CDC_EDIT_MOD == 0) receives the
    deterministic edit; doc 1 is the unedited control."""
    d = str(tmp_path / "cdc_embed")
    words0 = [f"alpha{i}" for i in range(240)]
    words1 = [f"beta{i}" for i in range(240)]
    _write_docs(d, [
        (0, " ".join(words0), "edited"),
        (1, " ".join(words1), "control"),
    ])
    out = {r.source: r for r in
           chunking.cdc_incremental_embed(spark, d).collect()}

    # the unedited doc re-uses every chunk and embeds nothing
    assert out["control"].n_embedded == 0
    assert out["control"].n_reused == out["control"].n_chunks
    assert out["control"].embed_vote_checksum == 0

    # the edited doc re-embeds ONLY the edit's neighborhood: chunks
    # re-sync at the first content-defined boundary after the insert
    e = out["edited"]
    assert e.n_embedded >= 1              # the edited front chunk
    assert e.n_reused >= 0.8 * e.n_chunks, (
        f"CDC reuse collapsed: {e.n_reused}/{e.n_chunks}"
    )
    assert e.embed_vote_checksum != 0     # the embed kernel ran

    # fixed-width contrast (pure python twin -- no Spark needed): the
    # same 2-word prepend shifts EVERY 16-word window, so a
    # fixed-width chunk store re-uses nothing and re-embeds the tail
    edited0 = chunking.CDC_EDIT_PREFIX.split() + words0
    fixed = lambda ws: {" ".join(ws[i:i + 16])
                        for i in range(0, len(ws), 16)}
    fixed_reused = len(fixed(words0) & fixed(edited0))
    assert fixed_reused == 0
    # ...while CDC re-uses the overwhelming majority (asserted above)


def test_cdc_incremental_embed_checksum_is_novel_only(spark, tmp_path):
    """The vote checksum must be computed over EXACTLY the novel
    chunks: recompute it independently from the chunk sets."""
    from pyspark.sql import functions as F

    d = str(tmp_path / "cdc_cksum")
    words0 = [f"gamma{i}" for i in range(150)]
    _write_docs(d, [(0, " ".join(words0), "s0")])

    base = chunking._cdc_chunks(
        spark.createDataFrame([(0, " ".join(words0))], "doc_id long, text string")
    )
    edited_text = chunking.CDC_EDIT_PREFIX + " ".join(words0)
    edited = chunking._cdc_chunks(
        spark.createDataFrame([(0, edited_text)], "doc_id long, text string")
    )
    stored = {r.ck for r in base.select(F.md5("text").alias("ck")).collect()}
    novel = [r for r in edited.select(
        "text", F.md5("text").alias("ck"),
        F.expr(chunking._VOTE_CHECKSUM_EXPR).alias("vcs"),
    ).collect() if r.ck not in stored]
    expect = sum(r.vcs for r in novel)
    got = chunking.cdc_incremental_embed(spark, d).collect()
    assert len(got) == 1
    assert got[0].embed_vote_checksum == expect
    assert got[0].n_embedded == len(novel)


def test_m4_pre_epoch_floor_parity(spark, tmp_path):
    """r11 ADVICE: epoch seconds must FLOOR (DuckDB //), not truncate
    toward zero (Spark DIV) -- a pre-1970 timestamp one microsecond
    before a second boundary otherwise lands one bucket off and can
    flip first/last selection. Oracle-compares m4 on a corpus whose
    events straddle the epoch."""
    import datetime as dt

    import duckdb

    import __spark_entry__ as e
    from .helpers import assert_matches_oracle

    d = str(tmp_path / "m4_epoch")
    os.makedirs(d, exist_ok=True)
    base = dt.datetime(1969, 12, 31, 23, 59, 58)
    rows = []
    for i in range(40):
        # microsecond offsets force fractional seconds on BOTH sides
        # of the epoch (trunc != floor exactly there)
        ts = base + dt.timedelta(microseconds=100_001 * i * 7)
        rows.append((i, ts, "sensor" if i % 2 else "gauge",
                     float(i % 11), i % 5))
    pq.write_table(pa.table({
        "event_id": [r[0] for r in rows],
        "ts": pa.array([r[1] for r in rows],
                       pa.timestamp("us")),
        "event_type": [r[2] for r in rows],
        "value": [r[3] for r in rows],
        "user_id": [r[4] for r in rows],
    }), f"{d}/events.parquet")

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
    for name in ("m4_downsample_events", "twap_by_user"):
        assert_matches_oracle(
            e.queries()[name](spark, d), con, e.oracle_sql()[name], name)
    con.close()
