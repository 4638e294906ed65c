"""Oracle-parity for the text-analysis surface (textstats)."""

from __future__ import annotations

import pytest

from selfhosted_rag_doc_chat_prototype_spark.operators import textstats

from .helpers import assert_matches_oracle, duck_con


@pytest.fixture(scope="module")
def con(sf_dir):
    return duck_con(sf_dir)


@pytest.mark.parametrize("name", sorted(textstats.ORACLE))
def test_textstats_matches_oracle(name, spark, sf_dir, con):
    sdf = textstats.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(sdf, con, textstats.ORACLE[name], name)


def test_sample_split_is_deterministic_and_calibrated(spark, sf_dir):
    """Hash-keyed sampling: identical across runs, holdout fraction
    near 10%, and split/sample decisions independent (both-flags rate
    near 1%)."""
    from selfhosted_rag_doc_chat_prototype_spark.operators.textstats import (
        corpus_sample_split,
    )

    a = {r.doc_id: (r.split, r.in_sample)
         for r in corpus_sample_split(spark, sf_dir).collect()}
    b = {r.doc_id: (r.split, r.in_sample)
         for r in corpus_sample_split(spark, sf_dir).collect()}
    assert a == b
    n = len(a)
    holdout = sum(1 for s, _ in a.values() if s == "holdout")
    sampled = sum(1 for _, m in a.values() if m)
    assert 0.04 <= holdout / n <= 0.18
    assert 0.04 <= sampled / n <= 0.18


def test_winnowing_guarantee():
    """The winnowing bound: two documents sharing a contiguous run of
    >= WIN_W + WIN_K - 1 words MUST share at least one fingerprint;
    disjoint-vocabulary docs share none. Pure-python kernel (the same
    function the Arrow operator broadcasts)."""
    run = "w1 w2 w3 w4 w5 w6 w7 w8"  # WIN_W + WIN_K - 1 = 8 words
    texts = {
        1: f"{run} tail1 tail2 tail3",
        2: f"lead1 lead2 lead3 {run}",
        3: "x1 x2 x3 x4 x5 x6 x7 x8 x9",
    }
    sets = {
        d: set(textstats.winnow_fps_py(t.split())[1])
        for d, t in texts.items()
    }
    assert sets[1] & sets[2], "shared 8-word run produced no common fp"
    assert not (sets[1] & sets[3]) and not (sets[2] & sets[3])


def test_countmin_never_undercounts_and_merges(spark, sf_dir):
    """CMS guarantees: estimate >= exact for every reported term, and
    the sketch merges across corpus halves by cell-wise addition
    (the property that makes it the streaming/sharded face)."""
    from selfhosted_rag_doc_chat_prototype_spark.operators.textstats import (
        sketch_countmin_heavyhitters,
    )

    rows = sketch_countmin_heavyhitters(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.overcount >= 0
        assert r.cms_estimate >= r.exact_count
    # at least the very top term should estimate exactly or nearly so
    # on this vocab (W=256 >> distinct words of the tiny corpus)
    top = min(rows, key=lambda r: r.rank)
    assert top.overcount <= top.exact_count  # not wildly off


def test_readability_syllable_truth_table(spark):
    """The vowel-group heuristic on hand-counted words, plus the score
    formulas on a doc whose three counts are known exactly."""
    from pyspark.sql import Row

    from selfhosted_rag_doc_chat_prototype_spark.operators.textstats import (
        readability_report,
    )

    # "the cat jumped. Nice table!" -> 2 sentences, 5 words,
    # syllables: the=1, cat=1, jumped=2, nice=1 (silent e), table=2
    docs = spark.createDataFrame([
        Row(doc_id=1, text="the cat jumped. Nice table!"),
        Row(doc_id=2, text=None),
        Row(doc_id=3, text="   "),
    ])
    out = {r.doc_id: r for r in readability_report(docs).collect()}
    r = out[1]
    assert (r.n_sents, r.n_words, r.n_syllables) == (2, 5, 7)
    wps, spw = 5 / 2, 7 / 5
    assert r.flesch == 206.835 - 1.015 * wps - 84.6 * spw
    assert r.fk_grade == 0.39 * wps + 11.8 * spw - 15.59
    assert out[2].n_words == 0 and out[2].flesch is None
    assert out[3].n_sents == 1 and out[3].fk_grade is None


def test_zipf_fit_on_synthetic_power_law(spark):
    """A corpus built to follow freq(rank) ~ rank^-1 exactly must fit
    slope ~ -1 with r2 ~ 1."""
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from selfhosted_rag_doc_chat_prototype_spark.operators.textstats import (
        zipf_fit_report,
    )

    words = []
    for rank in range(1, 101):
        words += [f"w{rank:03d}"] * (1200 // rank)
    text = " ".join(words)
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.table({
            "doc_id": [1], "text": [text], "lang": ["en"],
            "source": ["s"], "n_chars": [len(text)],
        }), f"{d}/documents.parquet")
        r = zipf_fit_report(spark, d).collect()[0]
    assert r.n_terms == 100
    assert -1.1 < r.slope < -0.9
    assert r.r2 > 0.99


def test_lang_confusion_marginals_consistent(spark, sf_dir):
    from collections import defaultdict

    from selfhosted_rag_doc_chat_prototype_spark.operators.textstats import (
        lang_confusion_report,
    )
    from selfhosted_rag_doc_chat_prototype_spark.sources.tables import table

    rows = lang_confusion_report(spark, sf_dir).collect()
    assert rows
    by_true = defaultdict(int)
    for r in rows:
        by_true[r.true_lang] += r.n
        assert r.is_correct == (1 if r.true_lang == r.pred_lang else 0)
        assert abs(r.row_share - r.n / r.true_total) < 1e-12
    for r in rows:
        assert by_true[r.true_lang] == r.true_total
    n_docs = table(spark, sf_dir, "documents").count()
    assert sum(by_true.values()) == n_docs


def test_char_entropy_orders_mash_below_prose(spark):
    """Repetitive text scores lower bigram entropy than varied prose;
    degenerate docs report NULL entropy over zero bigrams."""
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from selfhosted_rag_doc_chat_prototype_spark.operators.textstats import (
        text_char_entropy,
    )

    texts = ["aaaaaaaaaaaaaaaaaaaa",
             "the quick brown fox jumps over the lazy dog", "x", None]
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.table({
            "doc_id": list(range(len(texts))), "text": texts,
            "lang": ["en"] * len(texts), "source": ["s"] * len(texts),
            "n_chars": [len(t) if t else 0 for t in texts],
        }), f"{d}/documents.parquet")
        rows = {r.doc_id: r for r in text_char_entropy(spark, d).collect()}
    assert rows[0].entropy == 0.0          # one distinct bigram
    assert rows[1].entropy > 3.0           # varied prose
    assert rows[0].entropy < rows[1].entropy
    assert rows[2].n_bigrams == 0 and rows[2].entropy is None
    assert rows[3].n_bigrams == 0 and rows[3].entropy is None


def test_kwic_reconstructs_context_windows(spark, sf_dir):
    from selfhosted_rag_doc_chat_prototype_spark.operators.textstats import (
        KWIC_CTX,
        KWIC_TERM,
        kwic_concordance,
    )
    from selfhosted_rag_doc_chat_prototype_spark.sources.tables import table

    docs = {r.doc_id: (r.text or "").split()
            for r in table(spark, sf_dir, "documents").collect()}
    rows = kwic_concordance(spark, sf_dir).collect()
    assert rows
    for r in rows[:50]:
        ws = docs[r.doc_id]
        assert ws[r.pos] == KWIC_TERM
        assert r.left_ctx == " ".join(ws[max(0, r.pos - KWIC_CTX):r.pos])
        assert r.right_ctx == " ".join(ws[r.pos + 1:r.pos + 1 + KWIC_CTX])


def test_code_detect_routes_code_and_prose(spark):
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from selfhosted_rag_doc_chat_prototype_spark.operators.textstats import (
        text_code_detect,
    )

    code = (
        "def topk(xs, k):\n"
        "    out = sorted(xs)[:k];\n"
        "    if not out:\n"
        "        return []\n"
        "    for x in out:\n"
        "        print(x)\n"
        "    return out\n"
    )
    prose = ("The quarterly report shows steady growth across the "
             "northern region, and the committee expects the trend "
             "to continue through the year.")
    texts = [code, prose, None, ""]
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.table({
            "doc_id": list(range(len(texts))), "text": texts,
            "lang": ["en"] * len(texts), "source": ["s"] * len(texts),
            "n_chars": [len(t) if t else 0 for t in texts],
        }), f"{d}/documents.parquet")
        rows = {r.doc_id: r for r in text_code_detect(spark, d).collect()}
    assert rows[0].is_code == 1
    assert rows[0].indent_lines >= 5 and rows[0].kw_hits >= 3
    assert rows[1].is_code == 0
    assert rows[2].is_code == 0 and rows[2].symbol_frac is None
    assert rows[3].is_code == 0 and rows[3].n_lines == 1
