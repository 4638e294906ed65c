"""Chunker invariants: zero-loss reconstruction (mirrors the
reference's tests/test_no_loss_splitting.py:17-45), oracle parity for
the SQL-expressible chunkers, markdown structure extraction."""

from __future__ import annotations

from pyspark.sql import functions as F

from selfhosted_rag_doc_chat_prototype_spark.operators import chunking

from .helpers import assert_matches_oracle, duck_con

MD_DOC = """---
ID: DOC_deadbeef
Slug: test-doc
---
# Title
intro paragraph

## Section A
### [INTERNAL_PAGE_1]
page one content here

### [INTERNAL_PAGE_2] same-line anchor text
more page two content

## Section B
""" + ("x" * 1500)


def test_zero_loss_exact_cover(spark, sf_dir):
    """Non-overlapping windows must reconstruct every document exactly:
    sum(chunk_len) == n_chars (T6 invariant)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    chunks = chunking.sliding_window_chunks(docs, "text", ["doc_id"], width=100, step=100)
    recon = chunks.groupBy("doc_id").agg(
        F.sum("chunk_len").alias("total"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("chunk_index", "chunk"))),
                lambda x: x["chunk"],
            ),
            "",
        ).alias("joined"),
    )
    joined = docs.join(recon, "doc_id")
    bad = joined.filter(
        (F.col("total") != F.length("text")) | (F.col("joined") != F.col("text"))
    )
    assert bad.count() == 0


def test_subsplit_exact_is_lossless():
    text = "abcdefghij" * 53  # 530 chars
    pieces = chunking.subsplit_exact(text, 100)
    assert "".join(pieces) == text
    assert all(len(p) <= 100 for p in pieces)


def test_sliding_window_overlap_shape(spark):
    df = spark.createDataFrame([(1, "a" * 250)], ["doc_id", "text"])
    chunks = chunking.sliding_window_chunks(df, "text", ["doc_id"], width=100, step=80)
    rows = sorted((r.chunk_index, r.chunk_len) for r in chunks.collect())
    # starts at 0, 80, 160, 240
    assert rows == [(0, 100), (1, 100), (2, 90), (3, 10)]


def test_chunkers_match_oracle(spark, sf_dir):
    con = duck_con(sf_dir)
    for name in ("chunk_sliding_window", "chunk_word_budget"):
        sdf = chunking.QUERIES[name](spark, sf_dir)
        assert_matches_oracle(sdf, con, chunking.ORACLE[name], name)


def test_front_matter_parsing():
    meta, body = chunking.parse_front_matter(MD_DOC)
    assert meta == {"ID": "DOC_deadbeef", "Slug": "test-doc"}
    assert body.startswith("# Title")


def test_markdown_section_split():
    sections = chunking.split_markdown_sections(MD_DOC)
    paths = [s[0] for s in sections]
    pages = [s[1] for s in sections]
    assert paths[0] == "Title"
    assert any("Section A" in p for p in paths)
    # page anchors tracked, same-line anchor content kept
    assert 1 in pages and 2 in pages
    page2 = next(s for s in sections if s[1] == 2)
    assert "same-line anchor text" in page2[2]


def test_markdown_chunk_budget_and_loss():
    chunks = chunking.split_markdown(MD_DOC, max_chars=600)
    assert all(len(c["chunk"]) <= 600 for c in chunks)
    # the 1500-char Section B body must be fully covered, not truncated
    total_b = sum(len(c["chunk"]) for c in chunks if "x" in c["chunk"])
    assert total_b >= 1500


def test_chunk_markdown_dataframe(spark):
    df = spark.createDataFrame([(7, MD_DOC)], ["doc_id", "text"])
    out = chunking.chunk_markdown(df, max_chars=600).collect()
    assert len(out) >= 4
    assert all(r.doc_id == 7 for r in out)
    assert {r.page for r in out} >= {1, 2}


def test_token_budget_boundaries_512_50(spark):
    """Boundary golden at the reference defaults (budget 512, overlap
    50, text_processor.py:188-234): 1100 tokens slide as starts 0, 462,
    924 -> windows of 512, 512, 176 tokens, and consecutive windows
    share exactly 50 tokens."""
    # letter-only words: "w0" would pre-tokenize as TWO tokens (letter
    # run + digit run), doubling the count
    import itertools
    import string

    words = [
        "".join(t)
        for t in itertools.islice(
            itertools.product(string.ascii_lowercase, repeat=3), 1100
        )
    ]
    df = spark.createDataFrame([(1, " ".join(words))], ["doc_id", "text"])
    rows = sorted(
        (r.chunk_index, r.n_chunk_tokens, r.chunk)
        for r in chunking.token_budget_chunks(df, "text", ["doc_id"]).collect()
    )
    assert [(i, n) for i, n, _ in rows] == [(0, 512), (1, 512), (2, 176)]
    for (_, _, a), (_, _, b) in zip(rows, rows[1:]):
        assert a.split()[-50:] == b.split()[:50]  # 50-token lookback
    # zero-loss in token space: the union of windows covers every token
    covered = set()
    for _, _, c in rows:
        covered.update(c.split())
    assert covered == set(words)


def test_token_budget_counts_bpe_pretokens_not_words(spark):
    """The budget counter is the BPE-ish pre-tokenizer: punctuation
    splits off ("don't" = don + ' + t), so a 6-token budget covers
    fewer WORDS than 6 -- the fidelity the word-count chunker lacked."""
    df = spark.createDataFrame([(1, "don't stop me now, thanks")], ["doc_id", "text"])
    rows = {r.chunk_index: r for r in
            chunking.token_budget_chunks(df, "text", ["doc_id"],
                                         budget=6, overlap=0).collect()}
    # tokens: don ' t stop me now , thanks  (8 pre-tokens, 2 windows)
    assert rows[0].chunk == "don ' t stop me now"
    assert rows[0].n_chunk_tokens == 6
    assert rows[1].chunk == ", thanks"
    assert rows[1].n_chunk_tokens == 2


def test_token_budget_zero_overlap_exact_cover(spark, sf_dir):
    """With overlap=0 the windows concatenate back to the document's
    exact token stream (T6 zero-loss, token space)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from selfhosted_rag_doc_chat_prototype_spark.operators.textstats import BPE_RE

    chunks = chunking.token_budget_chunks(docs, "text", ["doc_id"],
                                          budget=40, overlap=0)
    recon = chunks.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("chunk_index", "chunk"))),
                lambda x: x["chunk"],
            ),
            " ",
        ).alias("joined"),
    )
    want = docs.select(
        "doc_id",
        F.concat_ws(
            " ", F.regexp_extract_all(F.col("text"), F.lit(BPE_RE), 0)
        ).alias("stream"),
    ).filter(F.length("stream") > 0)
    bad = want.join(recon, "doc_id").filter(F.col("joined") != F.col("stream"))
    assert bad.count() == 0


def test_cdc_mapside_chunker_matches_window_reference(spark):
    """The r12 map-side CDC chunker (per-doc boundary filter +
    bounds transform, no explode/window/groupBy) must reproduce the
    window formulation it replaced -- exercised here on constructed
    edge docs (< gram width, exactly gram width, gram+1, multi-
    boundary long doc, repeated words)."""
    import hashlib

    docs = [
        (1, "a"), (2, "a b c"), (3, "a b c d"),
        (4, " ".join(f"w{i % 7}" for i in range(120))),
        (5, "x x x x x x x x x x x x x x x x x x x x"),
    ]

    def ref_chunks(doc_id, text):
        w = [t for t in text.split() if t]
        if not w:
            return []
        brk = [
            1 if i >= chunking.CDC_GRAM and hashlib.md5(
                " ".join(w[i - chunking.CDC_GRAM:i]).encode()
            ).hexdigest()[31] == chunking.CDC_HEX else 0
            for i in range(len(w))
        ]
        out, cid = {}, 0
        for i, word in enumerate(w):
            cid += brk[i]
            out.setdefault(cid, []).append(word)
        return [
            (doc_id, cid, len(ws), " ".join(ws))
            for cid, ws in sorted(out.items())
        ]

    want = sorted(r for d, t in docs for r in ref_chunks(d, t))
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = sorted(
        (r.doc_id, r.chunk_id, r.n_words, r.text)
        for r in chunking._cdc_chunks(df).collect()
    )
    assert got == want


def test_semantic_split_single_segment_edges(spark, tmp_path):
    """r12 map-side breakpoint path: docs at/below one segment width
    (nseg = 1, where the guarded dots/bounds arrays are empty) must
    come out as exactly one chunk re-assembling the word stream."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path / "semedge")
    os.makedirs(d, exist_ok=True)
    texts = ["solo", "a b c d e f g h i j",            # 1 and 10 words
             "a b c d e f g h i j k"]                  # 11 words: 2 segs
    pq.write_table(pa.table({
        "doc_id": list(range(len(texts))),
        "text": texts,
        "lang": ["en"] * len(texts), "source": ["s"] * len(texts),
        "n_chars": [len(t) for t in texts],
    }), f"{d}/documents.parquet")
    rows = chunking.chunk_semantic_split(spark, d).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert [r.n_segments for r in by_doc[0]] == [1]
    assert by_doc[0][0].text == "solo" and by_doc[0][0].n_words == 1
    assert [r.n_segments for r in by_doc[1]] == [1]
    assert by_doc[1][0].n_words == 10
    assert sum(r.n_segments for r in by_doc[2]) == 2
    assert sum(r.n_words for r in by_doc[2]) == 11
    joined = " ".join(
        r.text for r in sorted(by_doc[2], key=lambda r: r.chunk_id)
    )
    assert joined == texts[2]
