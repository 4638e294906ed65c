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
        "n_chars": [len(r[1]) if r[1] is not None else 0 for r in rows],
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


# ---- round-12 batch 2: SQ ANN, simhash hamming, manifest, keywords --------

from pyspark.sql import functions as F

from selfhosted_rag_doc_chat_prototype_spark.operators import (
    dedup, similarity, textstats, warehouse)


def test_sq_topk_matches_brute_on_unit_corpus(spark, sf_dir):
    """int8 SQ over the (unit-normalized) embeddings corpus: per-query
    recall@k vs the exact brute top-k must be ~1 -- the fidelity claim
    that justifies SQ's 8x memory over BQ (measured 1.0 at sf0.001/
    0.01; floor-asserted at 0.9 to absorb future corpus swaps)."""
    brute = {(r.query_id, r.neighbor_id)
             for r in similarity.anns_bruteforce_topk(spark, sf_dir).collect()}
    sq_rows = similarity.anns_sq_topk(spark, sf_dir).collect()
    sq = {(r.query_id, r.neighbor_id) for r in sq_rows}
    by_q = {}
    for q, n in brute:
        by_q.setdefault(q, set()).add(n)
    for q, gold in by_q.items():
        hits = len({nn for qq, nn in sq if qq == q} & gold)
        assert hits / len(gold) >= 0.9, f"query {q}: recall {hits}/{len(gold)}"
    # serve-shape invariants: dense ranks 1..k per query, no self hits
    ranks = {}
    for r in sq_rows:
        assert r.query_id != r.neighbor_id
        ranks.setdefault(r.query_id, []).append(r.rank)
    for q, rs in ranks.items():
        assert sorted(rs) == list(range(1, len(rs) + 1))


def test_sq_quantization_error_bounded(spark, sf_dir):
    """The SQ shortlist key approximates the true dot product within
    the quantizer's worst-case bound: 64 dims x half-step q-error on
    each side => |approx - dot| <= dim * (s_a*0.5*|b|_inf-ish); for a
    unit-norm 64-dim corpus the practical bound is ~0.02."""
    rows = (
        similarity._vectors(spark, sf_dir).limit(50)
        .select("vec_id", "v").collect()
    )
    for i in range(0, len(rows) - 1, 2):
        a, b = rows[i].v, rows[i + 1].v
        sa = max(abs(x) for x in a) / 127.0
        sb = max(abs(x) for x in b) / 127.0
        qa = [round(x / sa) for x in a]
        qb = [round(x / sb) for x in b]
        approx = sum(p * q for p, q in zip(qa, qb)) * sa * sb
        true = sum(p * q for p, q in zip(a, b))
        assert abs(approx - true) < 0.02, (rows[i].vec_id, approx, true)


def test_simhash_hamming_exact_recall_pigeonhole(spark, tmp_path):
    """Manku multi-index guarantee: with 4 blocks and k=3 < 4, EVERY
    pair within hamming distance 3 is found -- deterministically, not
    in expectation (contrast: minhash banding recall is probabilistic).
    Verified against a brute-force all-pairs hamming computed from the
    same signature function."""
    d = str(tmp_path / "simham")
    base = [f"tok{i}" for i in range(40)]
    rows = []
    for did in range(1, 12):
        words = [f"d{did}w{i}" for i in range(30)] if did % 3 == 0 \
            else base + [f"extra{did}", f"more{did}"]
        rows.append((did, " ".join(words), "s"))
    rows.append((12, "", "s"))          # zero-token doc: must not pair
    rows.append((13, None, "s"))        # NULL doc: must not pair
    _write_docs(d, rows)

    got = {(r.doc_a, r.doc_b): r.hamming
           for r in dedup.dedup_simhash_hamming(spark, d).collect()}

    # reported pairs are ordered, within radius, and never degenerate
    for (a, b), h in got.items():
        assert a < b and 0 <= h <= dedup.SIMHASH_HAM_K
        assert a not in (12, 13) and b not in (12, 13)

    # brute-force gold over the SAME constructed corpus (docs + near
    # copies + exact copies), excluding zero-token rows
    corpus = {}
    for did, text, _ in rows:
        if text:
            corpus[did] = text
            if did % 5 == 0:
                w = text.split()
                near = " ".join(w[2:])
                if near:
                    corpus[did + 1000000] = near
            if did % 7 == 0:
                corpus[did + 2000000] = text
    sigs = {k: dedup._simhash64_py(v) for k, v in corpus.items()}
    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = sum(x != y for x, y in zip(sigs[a], sigs[b]))
            if h <= dedup.SIMHASH_HAM_K:
                assert got.get((a, b)) == h, (
                    f"missed pair ({a},{b}) at hamming {h}")
    assert set(got) == {
        (a, b) for i, a in enumerate(ids) for b in ids[i + 1:]
        if sum(x != y for x, y in zip(sigs[a], sigs[b]))
        <= dedup.SIMHASH_HAM_K
    }


def test_shard_manifest_offsets_contract(spark, tmp_path):
    """Manifest invariants: every doc exactly once; per-shard pos is
    contiguous from 1 in doc_id order; byte_offset is the running sum
    of prior (byte_len + 1) records; NULL text is a 0-byte record."""
    d = str(tmp_path / "manifest")
    _write_docs(d, [
        (1, "hello world", "s"), (2, "a", "s"), (3, None, "s"),
        (4, "xyzzy" * 10, "s"), (5, "", "s"), (6, "ä", "s"),
    ])
    rows = warehouse.shard_manifest_offsets(spark, d).collect()
    assert sorted(r.doc_id for r in rows) == [1, 2, 3, 4, 5, 6]
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r.pos)
        assert [r.pos for r in rs] == list(range(1, len(rs) + 1))
        assert rs == sorted(rs, key=lambda r: r.doc_id)
        off = 0
        for r in rs:
            assert r.byte_offset == off
            off += r.byte_len + 1
    null_row = next(r for r in rows if r.doc_id == 3)
    assert null_row.byte_len == 0
    utf8_row = next(r for r in rows if r.doc_id == 6)
    assert utf8_row.byte_len == 2  # utf-8 octets, not chars


def test_keyword_tag_docs_counts(spark, tmp_path):
    """Tagging counts token occurrences of the df-top dictionary terms
    exactly; terms shorter than KW_MIN_LEN never enter the dictionary;
    docs without dictionary terms emit no rows."""
    d = str(tmp_path / "kwtag")
    _write_docs(d, [
        (1, "greenhouse tomato greenhouse basilherb", "s"),
        (2, "greenhouse basilherb basilherb xy", "s"),
        (3, "tomato tomato xy", "s"),
        (4, "nothing relevant here at all", "s"),
    ])
    rows = textstats.keyword_tag_docs(spark, d).collect()
    got = {(r.doc_id, r.term): r.n_occurrences for r in rows}
    # df: greenhouse 2, tomato 2, basilherb 2, nothing/relevant 1, "xy"
    # too short, "here"/"at"/"all" too short
    assert got[(1, "greenhouse")] == 2
    assert got[(1, "tomato")] == 1
    assert got[(2, "basilherb")] == 2
    assert got[(3, "tomato")] == 2
    assert all(len(t) >= textstats.KW_MIN_LEN for _, t in got)
    assert not any(t == "xy" for _, t in got)


def test_recall_report_carries_sq_leg(spark, sf_dir):
    """The omnibus recall report includes the r12 SQ strategy with the
    same schema as every other leg, and SQ's recall dominates BQ's on
    the unit-norm corpus (byte codes vs sign bits)."""
    rows = similarity.anns_recall_report(spark, sf_dir).collect()
    by_strat = {}
    for r in rows:
        by_strat.setdefault(r.strategy, []).append(r.recall)
    assert "sq" in by_strat
    assert len(by_strat["sq"]) == similarity.N_QUERIES
    sq_mean = sum(by_strat["sq"]) / len(by_strat["sq"])
    bq_mean = sum(by_strat["bq"]) / len(by_strat["bq"])
    assert sq_mean >= bq_mean
    assert sq_mean >= 0.9


def test_kneser_ney_bigram_probabilities(spark, tmp_path):
    """P_KN recomputed independently in pure Python over a tiny corpus
    must match the operator's exact-integer num/den rows; every
    emitted probability is in (0, 1] and the interpolation weight
    identity holds (sum over w2 of P_KN(w2|w1) == 1 for a w1 whose
    continuations are all in the output)."""
    d = str(tmp_path / "kn")
    _write_docs(d, [
        (1, "a b a b c", "s"),
        (2, "a b c d", "s"),
        (3, "d a", "s"),
        (4, "solo", "s"),          # 1 token: no bigrams
        (5, None, "s"),            # NULL: no bigrams
    ])
    rows = textstats.kneser_ney_bigram_topk(spark, d).collect()
    got = {(r.w1, r.w2): r for r in rows}

    # independent python recount
    from collections import Counter
    bigrams = Counter()
    for text in ["a b a b c", "a b c d", "d a"]:
        w = text.split()
        for i in range(len(w) - 1):
            bigrams[(w[i], w[i + 1])] += 1
    T = len(bigrams)
    c1 = Counter(); n1fw = Counter(); n1bw = Counter()
    for (w1, w2), c in bigrams.items():
        c1[w1] += c; n1fw[w1] += 1; n1bw[w2] += 1
    for (w1, w2), c in bigrams.items():
        num = max(4 * c - 3, 0) * T + 3 * n1fw[w1] * n1bw[w2]
        den = 4 * c1[w1] * T
        r = got[(w1, w2)]
        assert (r.kn_num, r.kn_den, r.c12) == (num, den, c)
        assert 0 < r.p_kn <= 1
        assert abs(r.p_kn - num / den) < 1e-7

    # KN normalization over the CONTINUATION VOCABULARY: the operator
    # emits observed bigrams only; adding the closed-form backoff mass
    # D * N1+(w1,.)/c1 * Pcont(w2) for every unobserved (w1, w2) must
    # bring each context's total to exactly 1
    vocab = {w2 for (_, w2) in bigrams}
    for w1 in c1:
        s = sum(r.kn_num / r.kn_den for (a, _), r in got.items() if a == w1)
        s += sum(
            (3 * n1fw[w1] * n1bw[w2]) / (4 * c1[w1] * T)
            for w2 in vocab if (w1, w2) not in bigrams
        )
        assert abs(s - 1.0) < 1e-9, (w1, s)


def test_containment_catches_quotes_jaccard_misses(spark, tmp_path):
    """A planted quote (first QUOTE_W words of a long doc) must be
    flagged with containment ~1 even though its Jaccard vs the
    container is far below the symmetric dedup threshold -- the
    operator's reason to exist. Pairs sharing no rare shingle are
    absent; all emitted rows clear the 0.8 threshold on at least one
    direction."""
    d = str(tmp_path / "contain")
    long_doc = " ".join(f"u{i}" for i in range(60))
    other = " ".join(f"v{i}" for i in range(40))
    _write_docs(d, [(11, long_doc, "s"), (12, other, "s"),
                    (13, "x y", "s")])   # <3 words: no shingles
    rows = dedup.dedup_containment_verify(spark, d).collect()
    got = {(r.doc_a, r.doc_b): r for r in rows}
    # doc 11 % 11 == 0 -> quote planted at 3000011
    r = got[(11, 3000011)]
    assert r.cont_b_in_a == 1.0          # quote fully inside container
    # jaccard would have been ~10/58 -- nowhere near 0.5
    assert r.cont_a_in_b < 0.5
    for rr in rows:
        assert max(rr.cont_a_in_b, rr.cont_b_in_a) >= 0.8
        assert rr.doc_a < rr.doc_b
    assert not any(13 in p for p in got)


def test_range_lsh_subset_and_recall(spark, sf_dir):
    """The LSH range face returns a SUBSET of the exact range result
    (identical rounded cosines for every pair it emits -- candidates
    then the same filter can add nothing), and its per-query recall
    matches the leg report's arithmetic."""
    exact = {(r.query_id, r.neighbor_id): r.cos_sim
             for r in similarity.anns_range_search(spark, sf_dir).collect()}
    served = {(r.query_id, r.neighbor_id): r.cos_sim
              for r in
              similarity.anns_range_search_lsh(spark, sf_dir).collect()}
    assert set(served) <= set(exact)
    for k, v in served.items():
        assert v == exact[k]
    leg = {r.query_id: r for r in
           similarity.anns_recall_range_lsh(spark, sf_dir).collect()}
    for q, r in leg.items():
        n_exact = sum(1 for (qq, _) in exact if qq == q)
        n_hits = sum(1 for (qq, _) in served if qq == q)
        assert (r.n_exact, r.n_hits) == (n_exact, n_hits)
        assert r.strategy == "range_lsh"


def test_knn_connected_components_contract(spark, sf_dir):
    """The bounded-R Hash-to-Min contract, verified EXACTLY: after R
    rounds each node's cluster_id is the minimum vec_id within R hops
    (independent Python BFS over the same edge list); every vector
    gets exactly one label; labels only travel down; is_canonical
    marks exactly the label minima."""
    rows = dedup.knn_connected_components(spark, sf_dir).collect()
    comp = {r.vec_id: r.cluster_id for r in rows}
    n_vec = similarity._vectors(spark, sf_dir).count()
    assert len(comp) == n_vec
    assert all(c <= v for v, c in comp.items())

    adj = {}
    for e in dedup._undirected_knn_edges(spark, sf_dir).collect():
        adj.setdefault(e.src, set()).add(e.dst)
    for v in list(comp)[:200]:  # spot-verify a bounded sample
        frontier, seen = {v}, {v}
        for _ in range(dedup.CC_ROUNDS):
            frontier = {n for f in frontier for n in adj.get(f, ())} - seen
            seen |= frontier
        assert comp[v] == min(seen), (v, comp[v], min(seen))
    for r in rows:
        assert r.is_canonical == (r.vec_id == r.cluster_id)


def test_prefilter_fidelity_sq_dominates_bq(spark, sf_dir):
    """The fidelity readout must show SQ's int-dot ordering near the
    exact ranking and clearly above BQ's 1-bit Hamming ordering (the
    number that justifies BQ's 4x oversample); rho recomputed
    independently for one strategy/query from the serve rows."""
    rows = similarity.anns_prefilter_fidelity(spark, sf_dir).collect()
    by_s = {}
    for r in rows:
        assert r.n >= 2 and r.rho is not None
        assert -1.0 <= r.rho <= 1.0
        by_s.setdefault(r.strategy, []).append(r.rho)
    assert set(by_s) == {"sq", "bq"}
    sq_mean = sum(by_s["sq"]) / len(by_s["sq"])
    bq_mean = sum(by_s["bq"]) / len(by_s["bq"])
    assert sq_mean >= 0.9 and sq_mean > bq_mean

    # independent recount for one (strategy, query)
    face = similarity.anns_sq_topk(spark, sf_dir).collect()
    q0 = min(r.query_id for r in face)
    sub = sorted((r for r in face if r.query_id == q0),
                 key=lambda r: (-r.sq_sim, r.neighbor_id))
    pre_r = {r.neighbor_id: i + 1 for i, r in enumerate(sub)}
    d2 = sum((r.rank - pre_r[r.neighbor_id]) ** 2 for r in sub)
    n = len(sub)
    want = round(1.0 - 6.0 * d2 / (n ** 3 - n), 4)
    got = next(r for r in rows if r.strategy == "sq" and r.query_id == q0)
    assert (got.n, got.sum_d2) == (n, d2)
    assert abs(got.rho - want) < 1e-9


def test_canary_scan_plants_and_verdicts(spark, tmp_path):
    """Every canary reports exactly once; hits match an independent
    Python plant-and-scan; a canary never planted (no doc_id hits its
    residue) is verdicted clean with n_hits 0 and NULL first doc."""
    from selfhosted_rag_doc_chat_prototype_spark.operators import pretrain

    d = str(tmp_path / "canary")
    # doc_ids 0, 17, 34 -> canary ids 0, 1, 2; all other canaries clean
    _write_docs(d, [
        (0, "alpha beta", "s"), (17, None, "s"), (34, "gamma", "s"),
        (5, "innocent text", "s"),
    ])
    rows = pretrain.canary_contamination_scan(spark, d).collect()
    assert len(rows) == pretrain.CANARY_K
    by_id = {r.canary_id: r for r in rows}
    import hashlib
    for i in (0, 1, 2):
        r = by_id[i]
        assert r.n_hits == 1 and not r.is_clean
        assert r.first_doc_id == i * 17
        assert r.canary == "canary-" + hashlib.md5(
            f"canary:{i}".encode()).hexdigest()
    for i in range(3, pretrain.CANARY_K):
        r = by_id[i]
        assert r.n_hits == 0 and r.is_clean and r.first_doc_id is None
