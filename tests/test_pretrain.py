"""Oracle-parity + invariants for the pretraining-curation surface
(Gopher filters, decontamination, PII redaction, sequence packing)."""

from __future__ import annotations

import pytest

from selfhosted_rag_doc_chat_prototype_spark.operators import pretrain

from .helpers import assert_matches_oracle, duck_con


@pytest.fixture(scope="module")
def con(sf_dir):
    return duck_con(sf_dir)


@pytest.mark.parametrize("name", sorted(pretrain.ORACLE))
def test_pretrain_matches_oracle(name, spark, sf_dir, con):
    sdf = pretrain.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(sdf, con, pretrain.ORACLE[name], name)


def test_greedy_firstfit_invariants(spark, sf_dir):
    """No bin overflows (unless a single oversized doc), bins are
    contiguous from 0 per shard, and every doc is packed exactly once."""
    rows = pretrain.pack_greedy_firstfit(spark, sf_dir).collect()
    n_docs = (
        pretrain._doc_tokens(spark, sf_dir).count()
    )
    assert len(rows) == n_docs
    bins: dict = {}
    for r in rows:
        bins.setdefault((r.shard, r.bin_seq), []).append(r.tok)
    for (shard, bin_seq), toks in bins.items():
        assert sum(toks) <= pretrain.PACK_CAP or len(toks) == 1, (
            f"bin ({shard},{bin_seq}) overflows with multiple docs"
        )
    for shard in {s for s, _ in bins}:
        seqs = sorted(b for s, b in bins if s == shard)
        assert seqs == list(range(len(seqs)))


def test_boilerplate_detects_planted_sentences(spark, sf_dir):
    """Every planted header/footer sentence is flagged (n_boiler >=
    planted count -- the corpus's own exact-duplicate doc groups may
    legitimately add more), and clean docs exist on both sides."""
    rows = pretrain.boilerplate_sentence_dedup(spark, sf_dir).collect()
    for r in rows:
        expect = (r.doc_id % 4 == 0) + (r.doc_id % 6 == 0)
        assert r.n_boiler_sents >= expect, (
            f"doc {r.doc_id}: {r.n_boiler_sents} boiler < planted {expect}"
        )
        assert r.n_boiler_sents < r.n_sents  # never erases a whole doc here
    assert any(r.n_boiler_sents == 0 for r in rows)
    assert any(r.n_boiler_sents >= 2 for r in rows)


def test_intradoc_dedup_detects_planted_repeats(spark, sf_dir):
    """Docs whose planted repeat aligns to a sentence boundary (base
    truncation filled all INTRA_BASE_W words) report >= 1 duplicate
    sentence; unplanted docs report 0; cleaning never drops below one
    kept sentence."""
    rows = pretrain.intradoc_line_dedup(spark, sf_dir).collect()
    hits = 0
    for r in rows:
        kept = r.n_sents - r.n_dup_sents
        assert kept >= 1
        if r.doc_id % 3 != 0:
            assert r.n_dup_sents == 0, f"doc {r.doc_id}: unplanted dup"
        else:
            # a short doc (< INTRA_BASE_W base words) misaligns the
            # appended sentence, so <= planted, never more
            assert r.n_dup_sents <= 1 + (r.doc_id % 9 == 0)
            hits += r.n_dup_sents > 0
    assert hits > 0


def test_intradoc_clean_is_idempotent(spark, sf_dir):
    """Cleaning an already-cleaned text is a no-op over the whole
    planted-repeat corpus (sentence boundaries re-derive identically
    because removal only ever deletes whole SENT_W-word groups)."""
    from pyspark.sql import functions as F

    from selfhosted_rag_doc_chat_prototype_spark.sources.tables import table

    docs = pretrain._with_intradoc_repeats(
        table(spark, sf_dir, "documents")
    )
    once = pretrain.intradoc_clean_text("bt")
    again = docs.select(
        once.alias("c1")
    ).select(
        "c1", pretrain.intradoc_clean_text("c1").alias("c2")
    )
    assert again.filter(F.col("c1") != F.col("c2")).count() == 0


def test_curriculum_phases_are_equal_mass_and_monotone(spark, sf_dir):
    """Phases cover 1..CURR_PHASES, sizes are balanced within the
    slack ties allow, and phase is monotone in score (no inversion)."""
    rows = pretrain.curriculum_quality_phases(spark, sf_dir).collect()
    by_phase: dict = {}
    for r in rows:
        by_phase.setdefault(r.phase, []).append(r.score)
    assert min(by_phase) == 1 and max(by_phase) == pretrain.CURR_PHASES
    expect = len(rows) / pretrain.CURR_PHASES
    for scores in by_phase.values():
        assert len(scores) <= 2 * expect
    for p in range(1, pretrain.CURR_PHASES):
        assert max(by_phase.get(p, [0])) <= min(
            by_phase.get(p + 1, [1])
        ), f"phase {p} overlaps {p + 1}"


def test_tempered_sample_is_consistent_and_thinning(spark, sf_dir):
    """kept == (draw < keep_p) row-wise, keep_p stays within
    (0, TSAMP_BASE], and the realized keep rate sits strictly between
    the hard-filter extremes (0 and 1)."""
    rows = pretrain.quality_tempered_sample(spark, sf_dir).collect()
    kept = sum(r.kept for r in rows)
    assert 0 < kept < len(rows)
    for r in rows:
        assert r.kept == int(r.draw < r.keep_p)
        assert 0.0 < r.keep_p <= pretrain.TSAMP_BASE


def test_concat_chunk_offsets_are_gapless(spark, sf_dir):
    """Within a shard, token offsets tile the stream with no gaps and
    no overlap: each doc starts where the previous one ended."""
    rows = pretrain.pack_concat_chunks(spark, sf_dir).collect()
    by_shard: dict = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r.doc_id)
        pos = 0
        for r in rs:
            assert r.tok_start == pos, f"gap in shard {shard} at doc {r.doc_id}"
            pos += r.tok
            assert r.first_seq == r.tok_start // pretrain.PACK_CAP
            assert r.n_seqs >= 1


def test_mixture_resample_hits_target_shares(spark, sf_dir):
    """Realized domain shares track the configured mixture within the
    tolerance of the deterministic hash draws, and every copy count is
    floor(rate) or ceil(rate)."""
    from pyspark.sql import functions as F

    from selfhosted_rag_doc_chat_prototype_spark.operators.pretrain import (
        MIX_WEIGHTS,
        domain_mixture_resample,
    )

    out = domain_mixture_resample(spark, sf_dir)
    per_lang = {
        r.lang: r.n for r in
        out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    total = sum(per_lang.values())
    for lang, w in MIX_WEIGHTS:
        realized = per_lang.get(lang, 0) / total
        assert abs(realized - w) < 0.05, (lang, realized, w)

    bad = out.filter(
        (F.col("n_copies") < F.floor("mix_rate"))
        | (F.col("n_copies") > F.ceil("mix_rate"))
    ).count()
    assert bad == 0


def test_mixture_drops_unweighted_domains(spark):
    """Domains absent from the weight map are excluded (the recipe's
    explicit exclusion semantics), and output totals track the summed
    weight of the domains that remain."""
    from pyspark.sql import functions as F

    from selfhosted_rag_doc_chat_prototype_spark.operators.pretrain import (
        mixture_resample,
    )

    docs = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "keep_a")
        .when(F.col("id") % 3 == 1, "keep_b")
        .otherwise("exotic").alias("lang"),
    )
    out = mixture_resample(docs, (("keep_a", 0.5), ("keep_b", 0.5)))
    langs = {r.lang for r in out.select("lang").distinct().collect()}
    assert langs == {"keep_a", "keep_b"}
    # weights sum to 1 over a corpus where the kept domains are 2/3 of
    # rows: expected output ~= full corpus size (rate = 1.5 each)
    assert abs(out.count() - 300) <= 30


def test_epoch_shuffle_is_a_fresh_permutation_per_epoch(spark, sf_dir):
    """Each epoch covers every doc exactly once with contiguous
    per-shard positions, and consecutive epochs produce a genuinely
    different order (the point of reshuffling)."""
    from collections import defaultdict

    from selfhosted_rag_doc_chat_prototype_spark.operators.pretrain import (
        SHUFFLE_EPOCHS,
        SHUFFLE_SHARDS,
        epoch_shuffle_shards,
    )

    rows = epoch_shuffle_shards(spark, sf_dir).collect()
    n_docs = len({r.doc_id for r in rows})
    per_epoch = defaultdict(list)
    for r in rows:
        assert 0 <= r.shard < SHUFFLE_SHARDS
        per_epoch[r.epoch].append(r)
    assert set(per_epoch) == set(range(SHUFFLE_EPOCHS))
    orders = {}
    for ep, es in per_epoch.items():
        assert len(es) == n_docs == len({r.doc_id for r in es})
        by_shard = defaultdict(list)
        for r in es:
            by_shard[r.shard].append(r.pos)
        for poss in by_shard.values():
            assert sorted(poss) == list(range(1, len(poss) + 1))
        orders[ep] = [r.doc_id for r in sorted(
            es, key=lambda r: (r.shard, r.pos))]
    assert orders[0] != orders[1]  # reshuffled between epochs


def test_span_corruption_reconstructs_and_masks_rate(spark, sf_dir):
    """Input + target partition the word stream exactly: removing
    sentinels and re-interleaving masked spans reproduces the original
    words; the mask rate sits near 1/SPAN_MOD of blocks."""
    import re

    from selfhosted_rag_doc_chat_prototype_spark.operators.pretrain import (
        SPAN_MOD,
        span_corruption_pairs,
    )
    from selfhosted_rag_doc_chat_prototype_spark.sources.tables import table

    rows = {r.doc_id: r
            for r in span_corruption_pairs(spark, sf_dir).collect()}
    docs = {r.doc_id: (r.text or "")
            for r in table(spark, sf_dir, "documents")
            .select("doc_id", "text").collect()}
    sent = re.compile(r"<extra_id_(\d+)>")
    n_masked_total = n_words_total = 0
    for doc_id, r in rows.items():
        words = docs[doc_id].split()
        assert r.n_words == len(words)
        n_masked_total += r.n_masked
        n_words_total += r.n_words
        # reconstruct: walk input tokens; at sentinel k, splice the
        # target's span k
        spans: dict[int, list[str]] = {}
        cur = None
        for t in (r.target_text.split() if r.target_text else []):
            m = sent.fullmatch(t)
            if m:
                cur = int(m.group(1))
                spans[cur] = []
            else:
                spans[cur].append(t)
        rebuilt = []
        for t in (r.input_text.split() if r.input_text else []):
            m = sent.fullmatch(t)
            if m:
                rebuilt.extend(spans.pop(int(m.group(1))))
            else:
                rebuilt.append(t)
        assert not spans, doc_id  # every target span was consumed
        assert rebuilt == words, doc_id
    if n_words_total:
        rate = n_masked_total / n_words_total
        assert 0.5 / SPAN_MOD < rate < 2.0 / SPAN_MOD, rate


def test_pmi_separates_collocations_from_chance_pairs(spark):
    """PMI's defining property on a constructed corpus: a bigram that
    ALWAYS co-occurs ("new york") scores far above a pair of
    independently frequent words, and every reported pair meets the
    support floor."""
    from pyspark.sql import Row

    from selfhosted_rag_doc_chat_prototype_spark.operators.pretrain import (
        PMI_MIN_COUNT,
        pmi_collocations,
    )

    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    with tempfile.TemporaryDirectory() as d:
        texts = (["new york " * 1] * 8          # always adjacent
                 + ["the cat", "dog the", "the bird", "fish the"] * 3)
        pq.write_table(pa.table({
            "doc_id": list(range(len(texts))),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }), f"{d}/documents.parquet")
        rows = {(r.w1, r.w2): r for r in pmi_collocations(spark, d).collect()}
    assert all(r.c12 >= PMI_MIN_COUNT for r in rows.values())
    ny = rows[("new", "york")]
    assert ny.c12 == 8
    chance = [r for (a, b), r in rows.items() if "the" in (a, b)]
    assert chance
    assert all(ny.pmi_u > r.pmi_u for r in chance)


def test_bpe_merges_match_reference_implementation(spark):
    """Train on a tiny corpus and check the learned merge table
    against an independent pure-Python BPE (Sennrich et al. 2016
    reference algorithm: count weighted adjacent pairs, argmax with
    lexicographic tie-break, greedy left-to-right merge)."""
    import tempfile
    from collections import Counter

    import pyarrow as pa
    import pyarrow.parquet as pq

    from selfhosted_rag_doc_chat_prototype_spark.operators.pretrain import (
        BPE_MERGES,
        bpe_learn_merges,
    )

    texts = ["the cat sat on the mat", "the hat that the cat wore",
             "that mat sat flat"] * 4
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.table({
            "doc_id": list(range(len(texts))), "text": texts,
            "lang": ["en"] * len(texts), "source": ["s"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }), f"{d}/documents.parquet")
        got = sorted(bpe_learn_merges(spark, d).collect(),
                     key=lambda r: r.round)

    vocab = Counter(w for t in texts for w in t.split())
    words = {w: list(w) for w in vocab}
    expect = []
    for _ in range(BPE_MERGES):
        pc = Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += vocab[w]
        if not pc:
            break
        (a, b), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        expect.append((a, b, n, a + b))
        for w, syms in words.items():
            out = [syms[0]]
            for s in syms[1:]:
                if out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            words[w] = out
    assert [(r.sym_a, r.sym_b, r.pair_count, r.merged) for r in got] \
        == expect


def test_bpe_encode_invariants(spark, sf_dir):
    """Encoding under learned merges: token count never exceeds the
    base symbol count, never drops below the word count (one token
    per word minimum), savings are consistent, and every document
    appears (zeros for empty)."""
    from selfhosted_rag_doc_chat_prototype_spark.operators.pretrain import (
        bpe_encode_corpus,
    )
    from selfhosted_rag_doc_chat_prototype_spark.sources.tables import table

    rows = bpe_encode_corpus(spark, sf_dir).collect()
    n_docs = table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs
    assert any(r.n_saved > 0 for r in rows), "merges bought nothing"
    for r in rows:
        assert r.n_tokens <= r.n_base_syms
        assert r.n_tokens >= r.n_words
        assert r.n_saved == r.n_base_syms - r.n_tokens


def test_bpe_encode_applies_learned_merges(spark, tmp_path):
    """On a corpus dominated by one repeated word, the learned merges
    collapse that word maximally: with >= len-1 merge rounds the hot
    word becomes ONE token."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from selfhosted_rag_doc_chat_prototype_spark.operators.pretrain import (
        bpe_encode_corpus,
    )

    d = str(tmp_path)
    pq.write_table(pa.table({
        "doc_id": [0, 1, 2],
        "text": ["abab abab abab", "abab xy", "q"],
        "lang": ["en"] * 3, "source": ["s0"] * 3,
        "n_chars": [14, 7, 1],
    }), f"{d}/documents.parquet")
    got = {r.doc_id: r for r in
           bpe_encode_corpus(spark, d, merges=3).collect()}
    # 'abab' (4 syms) dominates: merges a+b, ab+ab -> one token
    assert got[0].n_tokens == 3 and got[0].n_base_syms == 12
    # 'xy' gets at most the leftover merge; 'q' is always 1
    assert got[2].n_tokens == 1 and got[2].n_saved == 0


def test_seqlen_bucketing_waste_ordering(spark, sf_dir):
    """Per-bucket padding always wastes no more than global padding,
    caps are powers of two covering their docs, and doc counts tile
    the corpus."""
    from selfhosted_rag_doc_chat_prototype_spark.operators.pretrain import (
        seqlen_bucketing,
    )
    from selfhosted_rag_doc_chat_prototype_spark.sources.tables import table

    rows = seqlen_bucketing(spark, sf_dir).collect()
    assert rows
    n_docs = table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        assert r.bucket_cap & (r.bucket_cap - 1) == 0  # power of two
        assert 0 <= r.pad_waste_bucketed <= r.pad_waste_global
    # the whole point: bucketing must beat global padding overall
    assert (sum(r.pad_waste_bucketed for r in rows)
            < sum(r.pad_waste_global for r in rows))
