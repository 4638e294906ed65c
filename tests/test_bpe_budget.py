"""T5 budget guarantee against a REAL (pinned, local) BPE tokenizer:
every chunk the token-budget chunker emits must fit the budget when
re-counted by the committed merge-table tokenizer -- and the test also
documents the boundary of the guarantee (out-of-vocab pre-tokens
split, so the pre-token count under-counts there)."""

from __future__ import annotations

import pytest

from selfhosted_rag_doc_chat_prototype_spark.functions.bpe import (
    BPETokenizer,
    train_bpe,
)
from selfhosted_rag_doc_chat_prototype_spark.operators.chunking import (
    token_budget_chunks,
)

FIXTURE = ("/root/repo/selfhosted_rag_doc_chat_prototype_spark/functions/"
           "bpe_merges.json")


@pytest.fixture(scope="module")
def tok():
    return BPETokenizer.load(FIXTURE)


def test_fixture_covers_corpus_pretokens(spark, sf_dir, tok):
    """The pinned tokenizer was trained to convergence on the corpus:
    every corpus pre-token is a single token -- the precondition for
    the budget bound, asserted, not assumed."""
    import re

    words = set()
    for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect():
        words.update(re.findall(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]", r.text))
    assert words
    assert all(tok.covers(w) for w in words)


def test_every_chunk_fits_budget_under_real_bpe(spark, sf_dir, tok):
    """The hard contract the reference enforces with its HF tokenizer
    (text_processor.py:188-234): re-count every emitted chunk with the
    real merge-table tokenizer; none may exceed the budget. Run at the
    registered 48-token config and the reference's 512/50 default."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for budget, overlap in [(48, 8), (512, 50)]:
        rows = token_budget_chunks(
            docs, "text", ["doc_id"], budget=budget, overlap=overlap
        ).collect()
        assert rows
        for r in rows:
            n_real = tok.n_tokens(r.chunk)
            assert n_real <= budget, (
                f"doc {r.doc_id} chunk {r.chunk_index}: {n_real} real "
                f"tokens > budget {budget}"
            )
            # in-vocab corpus: real count EQUALS the pre-token count
            # the chunker budgeted with (the bound is tight, not slack)
            assert n_real == r.n_chunk_tokens


def test_oov_pretokens_undercount_documented(tok):
    """The guarantee is conditional: an out-of-vocab pre-token encodes
    to several tokens, so on open-vocabulary text the pre-token budget
    UNDER-counts and callers must re-count with their tokenizer (the
    documented contract in functions/bpe.py)."""
    assert not tok.covers("extraordinarily")
    assert tok.n_tokens("extraordinarily") > 1  # 1 pre-token, many real


def test_bpe_training_is_deterministic():
    freqs = {"spark": 5, "sparse": 3, "spa": 2, "park": 4}
    m1 = train_bpe(freqs)
    m2 = train_bpe(dict(reversed(list(freqs.items()))))
    assert m1 == m2
    t = BPETokenizer(m1)
    assert all(t.covers(w) for w in freqs)


def test_encode_roundtrips_spaced_text(tok):
    """Merge-table decode for single-space-joined words: stripping the
    end-of-word markers reconstructs the text -- the chunker's chunk
    text is exactly this shape."""
    text = "key agg row scan slow fast"
    toks = tok.encode(text)
    assert " ".join(t.replace("</w>", "") for t in toks if t != "</w>") == text


def test_bpe_chunker_equals_pretoken_chunker_under_coverage(spark, sf_dir):
    """On a fully-covered corpus the real-BPE chunker and the
    pre-token chunker must agree row for row (the coverage condition
    made executable); each emitted chunk re-counts within budget."""
    from selfhosted_rag_doc_chat_prototype_spark.operators.chunking import (
        chunk_token_budget_bpe,
        chunk_word_budget,
    )

    a = {(r.doc_id, r.chunk_index): (r.chunk, r.n_chunk_tokens)
         for r in chunk_token_budget_bpe(spark, sf_dir).collect()}
    b = {(r.doc_id, r.chunk_index): (r.chunk, r.n_chunk_tokens)
         for r in chunk_word_budget(spark, sf_dir).collect()}
    assert a == b and a


def test_pair_counts_query_matches_trainer_round_one(spark, sf_dir):
    """The distributed pair-count query and the driver-side trainer
    agree on round-one statistics: the query's top pair count equals
    the count of the trainer's first chosen merge, and every queried
    pair count matches a local recount."""
    import re

    from selfhosted_rag_doc_chat_prototype_spark.operators.textstats import (
        bpe_pair_counts,
    )

    got = {(r.a, r.b): r.pair_count
           for r in bpe_pair_counts(spark, sf_dir).collect()}
    assert got

    freqs: dict[str, int] = {}
    for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect():
        for w in re.findall(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]", r.text):
            freqs[w] = freqs.get(w, 0) + 1
    pairs: dict[tuple, int] = {}
    for w, f in freqs.items():
        seq = list(w) + ["</w>"]
        for a, b in zip(seq, seq[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + f
    for k, v in got.items():
        assert pairs[k] == v, k
    # the trainer's first merge is a maximal-count pair
    first = train_bpe(freqs, max_merges=1)[0]
    assert pairs[first] == max(got.values())
