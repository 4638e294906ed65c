"""Round-11 operators: margin-criterion bitext mining, M4 pixel
downsampling, and the t-closeness privacy audit. The DuckDB oracle
gate proves cross-engine value equality; these tests assert the
SEMANTIC invariants the oracles cannot express."""
from __future__ import annotations

from pyspark.sql import functions as F

from selfhosted_rag_doc_chat_prototype_spark.operators import analytics, similarity
from selfhosted_rag_doc_chat_prototype_spark.sources.tables import table


def test_bitext_margin_contract(spark, sf_dir):
    out = similarity.bitext_margin_pairs(spark, sf_dir).collect()
    assert out, "miner found no pairs on the test corpus"
    srcs = [r.src_doc_id for r in out]
    # forward mining: at most ONE best match per source doc
    assert len(srcs) == len(set(srcs))
    for r in out:
        assert r.src_doc_id < similarity.BITEXT_POOL_MAX
        assert r.tgt_lang != "en"
        # every emitted pair cleared the ratio margin
        assert r.margin_4dp > similarity.BITEXT_TAU - 1e-4
        assert -1.0001 <= r.cos_4dp <= 1.0001
    # the emitted match is the src's TOP margin pair: re-run must agree
    again = similarity.bitext_margin_pairs(spark, sf_dir).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_bitext_margin_demotes_hubs(spark):
    """The reason margin beats raw cosine: a HUB vector close to
    everything must not win every pairing. One hub target sits at
    moderate cosine to both sources; each source also has a dedicated
    target slightly closer. Raw-cosine mining can tie-break toward
    the hub; margin mining must pick the dedicated targets (the hub's
    dense neighborhood inflates its denominator)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import tempfile

    d = tempfile.mkdtemp(prefix="bitext_hub_")
    rng = np.random.default_rng(7)

    def unit(v):
        v = np.asarray(v, dtype=float)
        return list(map(float, v / np.linalg.norm(v)))

    e = np.eye(64)
    hub = unit(e[0] + e[1] + e[2] + e[3])
    vecs = {
        0: unit(e[0]),                 # src A (en)
        1: unit(e[1]),                 # src B (en)
        10: unit(e[0] * 2 + e[4]),     # dedicated match of A
        11: unit(e[1] * 2 + e[4]),     # dedicated match of B
        12: hub,                       # the hub
        13: unit(e[2] + hub),          # hub's dense neighborhood
        14: unit(e[3] + hub),
        15: unit(e[2] * 2 + hub),
    }
    ids = sorted(vecs)
    pq.write_table(pa.table({
        "vec_id": ids,
        "embedding": pa.array([vecs[i] for i in ids],
                              pa.list_(pa.float32())),
        "label": [0] * len(ids),
    }), f"{d}/embeddings.parquet")
    pq.write_table(pa.table({
        "doc_id": ids,
        "text": ["w"] * len(ids),
        "lang": ["en" if i < 10 else "de" for i in ids],
        "source": ["s"] * len(ids),
        "n_chars": [1] * len(ids),
    }), f"{d}/documents.parquet")

    got = {r.src_doc_id: r.tgt_doc_id
           for r in similarity.bitext_margin_pairs(spark, d).collect()}
    assert got.get(0) == 10
    assert got.get(1) == 11


def test_m4_extrema_and_coverage(spark, sf_dir):
    out = analytics.m4_downsample_events(spark, sf_dir).collect()
    assert out
    ev = table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    n_rows = ev.count()
    assert sum(r.n_points for r in out) == n_rows  # every row bucketed
    truth = {
        (r.event_type, ): (r.lo, r.hi)
        for r in ev.groupBy("event_type").agg(
            F.min("value").alias("lo"), F.max("value").alias("hi")
        ).collect()
    }
    per_type: dict = {}
    for r in out:
        assert 0 <= r.bucket < analytics.M4_BUCKETS
        # the four points bound each other
        assert r.v_min <= min(r.v_first, r.v_last) <= r.v_max
        assert r.v_min <= max(r.v_first, r.v_last) <= r.v_max
        assert r.ts_first_s <= r.ts_last_s
        assert r.ts_first_s <= r.ts_min_s <= r.ts_last_s
        assert r.ts_first_s <= r.ts_max_s <= r.ts_last_s
        lo, hi = per_type.get(r.event_type, (float("inf"), float("-inf")))
        per_type[r.event_type] = (min(lo, r.v_min), max(hi, r.v_max))
    # M4's rendering guarantee needs the true per-type extrema kept
    for t, (lo, hi) in per_type.items():
        tl, th = truth[(t,)]
        assert lo == tl and hi == th


def test_t_closeness_flags_and_bounds(spark, sf_dir):
    out = analytics.t_closeness_report(spark, sf_dir).collect()
    assert out
    cust = table(spark, sf_dir, "customer").filter(
        F.col("c_acctbal").isNotNull()
    )
    assert sum(r.n_rows for r in out) == cust.count()
    t = analytics.T_CLOSE_NUM / analytics.T_CLOSE_DEN
    for r in out:
        assert 0.0 <= r.emd_4dp <= 1.0
        # flag agrees with the reported distance away from the
        # rounding boundary (the flag itself compares exact integers)
        if r.emd_4dp > t + 1e-3:
            assert r.t_violation == 1
        if r.emd_4dp < t - 1e-3:
            assert r.t_violation == 0


def test_t_closeness_detects_concentrated_group(spark, tmp_path):
    """A group holding only the table's TOP balances is the attack
    t-closeness exists for (k-anonymous and l-diverse groups can
    still leak a distribution): its EMD must flag while a group
    sampling the whole range stays low."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path / "tc")
    import os
    os.makedirs(d, exist_ok=True)
    n = 1000
    rows = {
        "c_custkey": list(range(n)),
        # group 1 = uniform spread, group 2 = top decile only
        "c_nationkey": [1 if i < 900 else 2 for i in range(n)],
        "c_mktsegment": ["A"] * n,
        "c_acctbal": [float(i) for i in range(900)]
        + [2000.0 + i for i in range(100)],
    }
    pq.write_table(pa.table(rows), f"{d}/customer.parquet")
    got = {r.nation: r for r in
           analytics.t_closeness_report(spark, d).collect()}
    assert got[2].t_violation == 1
    assert got[2].emd_4dp > got[1].emd_4dp
    assert got[1].t_violation == 0


def test_semantic_chunks_zero_loss_and_breakpoints(spark, sf_dir):
    from selfhosted_rag_doc_chat_prototype_spark.operators import chunking
    from selfhosted_rag_doc_chat_prototype_spark.functions import (
        text_quality as tq)

    out = chunking.chunk_semantic_split(spark, sf_dir)
    rows = out.collect()
    assert rows
    # chunk ids are contiguous from 0 per doc
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc, rs in by_doc.items():
        ids = sorted(r.chunk_id for r in rs)
        assert ids == list(range(len(ids))), doc
    # ZERO LOSS: the word stream re-assembles exactly (chunks joined
    # in id order == the doc's whitespace tokens joined)
    re_joined = (
        out.groupBy("doc_id")
        .agg(F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("chunk_id", "text"))),
                lambda x: x.getField("text"),
            ), " ").alias("rebuilt"))
    )
    orig = (
        table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id",
                F.array_join(tq.words(F.col("text")), " ").alias("expect"))
        .filter(F.length("expect") > 0)
    )
    bad = (re_joined.join(orig, "doc_id")
           .filter(F.col("rebuilt") != F.col("expect")).count())
    assert bad == 0
    # the corpus actually exercises BOTH behaviors
    n_docs = len(by_doc)
    n_chunks = len(rows)
    assert n_chunks > n_docs          # some boundary opened
    n_segs = sum(r.n_segments for r in rows)
    assert n_chunks < n_segs          # some segments merged


def test_semantic_chunker_splits_topic_shift(spark, tmp_path):
    """A document whose first half repeats vocabulary A and second
    half vocabulary B must split at the shift; a document of uniform
    vocabulary must stay one chunk."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from selfhosted_rag_doc_chat_prototype_spark.operators import chunking

    d = str(tmp_path / "sem")
    os.makedirs(d, exist_ok=True)
    a = " ".join(["alpha beta gamma delta epsilon"] * 4)      # 20 words A
    b = " ".join(["omega sigma lambda kappa theta"] * 4)      # 20 words B
    uniform = " ".join(["alpha beta gamma delta epsilon"] * 8)
    pq.write_table(pa.table({
        "doc_id": [0, 1],
        "text": [a + " " + b, uniform],
        "lang": ["en"] * 2, "source": ["s"] * 2,
        "n_chars": [len(a) + 1 + len(b), len(uniform)],
    }), f"{d}/documents.parquet")
    got = chunking.chunk_semantic_split(spark, d).collect()
    by_doc: dict = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc[0]) >= 2   # topic shift opened a boundary
    assert len(by_doc[1]) == 1   # uniform text merged end to end
    # the shift doc's first chunk is pure vocabulary A
    first = min(by_doc[0], key=lambda r: r.chunk_id)
    assert "omega" not in first.text and "alpha" in first.text


def test_cdc_chunks_are_shift_invariant(spark, tmp_path):
    """The CDC contract (why every backup system chunks this way):
    inserting words at the FRONT of a document disturbs only the
    chunks overlapping the edit -- almost all chunks re-emerge
    byte-identical, so a content-addressed store re-uses them. The
    fixed-width splitter on the same edit shares (almost) nothing."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from selfhosted_rag_doc_chat_prototype_spark.operators import chunking

    d = str(tmp_path / "cdc")
    os.makedirs(d, exist_ok=True)
    rng_words = [f"w{(i * 7919) % 5003}" for i in range(400)]
    base = " ".join(rng_words)
    edited = "zzz qqq " + base          # two words inserted up front
    pq.write_table(pa.table({
        "doc_id": [0, 1],
        "text": [base, edited],
        "lang": ["en"] * 2, "source": ["s"] * 2,
        "n_chars": [len(base), len(edited)],
    }), f"{d}/documents.parquet")

    rows = chunking.chunk_content_defined(spark, d).collect()
    a = [r.text for r in rows if r.doc_id == 0]
    b = [r.text for r in rows if r.doc_id == 1]
    assert len(a) > 5                       # the rule actually chunks
    shared = set(a) & set(b)
    # every chunk except the one(s) overlapping the edit re-emerges
    assert len(shared) >= len(a) - 2, (len(a), len(shared))

    # contrast: fixed-width windows share nothing after a 2-word shift
    sw = chunking.sliding_window_chunks(
        spark.read.parquet(f"{d}/documents.parquet"),
        "text", ["doc_id"], width=100, step=100,
    ).collect()
    sa = {r.chunk for r in sw if r.doc_id == 0}
    sb = {r.chunk for r in sw if r.doc_id == 1}
    assert len(sa & sb) <= 1

    # zero loss: CDC chunks reassemble the word stream exactly
    rebuilt = " ".join(r.text for r in sorted(
        (r for r in rows if r.doc_id == 0), key=lambda r: r.chunk_id))
    assert rebuilt == base


def test_cdc_dedup_report_accounting(spark, sf_dir, tmp_path):
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from selfhosted_rag_doc_chat_prototype_spark.operators import chunking

    rows = chunking.cdc_dedup_report(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r.n_unique_chunks <= r.n_chunks
        assert 0.0 <= r.dedup_ratio_4dp < 1.0
    total = chunking.chunk_content_defined(spark, sf_dir).count()
    assert sum(r.n_chunks for r in rows) == total

    # two identical docs in one source: every chunk stored once ->
    # dedup ratio ~1/2; a singleton source dedups nothing
    d = str(tmp_path / "cdcrep")
    os.makedirs(d, exist_ok=True)
    text = " ".join(f"w{(i * 7919) % 5003}" for i in range(300))
    other = " ".join(f"q{(i * 104729) % 7907}" for i in range(300))
    pq.write_table(pa.table({
        "doc_id": [0, 1, 2],
        "text": [text, text, other],
        "lang": ["en"] * 3,
        "source": ["dup", "dup", "solo"],
        "n_chars": [len(text), len(text), len(other)],
    }), f"{d}/documents.parquet")
    got = {r.source: r for r in
           chunking.cdc_dedup_report(spark, d).collect()}
    assert abs(got["dup"].dedup_ratio_4dp - 0.5) < 1e-6
    assert got["solo"].dedup_ratio_4dp == 0.0


def test_tokenizer_fertility_contract(spark, sf_dir):
    from selfhosted_rag_doc_chat_prototype_spark.operators import textstats

    rows = textstats.tokenizer_fertility_by_lang(spark, sf_dir).collect()
    assert rows and len({r.lang for r in rows}) == len(rows)
    for r in rows:
        assert r.n_docs > 0 and r.n_words > 0
        # a BPE pre-token never spans a whitespace word: >= 1 per word
        assert r.fertility_4dp >= 1.0
        assert r.n_bpe_tokens >= r.n_words
        assert r.chars_per_token_4dp > 0
