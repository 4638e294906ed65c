"""Dedup suite: oracle parity + semantic checks (constructed near-dups
must actually be caught)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from selfhosted_rag_doc_chat_prototype_spark.operators import dedup

from .helpers import assert_matches_oracle, duck_con


@pytest.fixture(scope="module")
def con(sf_dir):
    return duck_con(sf_dir)


@pytest.mark.parametrize("name", sorted(dedup.ORACLE))
def test_dedup_matches_oracle(name, spark, sf_dir, con):
    sdf = dedup.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(sdf, con, dedup.ORACLE[name], name)


def test_minhash_finds_planted_near_dups(spark, sf_dir):
    """Every planted (doc, doc+1M) near-copy pair should be an LSH
    candidate with high probability; require >= 90% recall."""
    pairs = {
        (r.doc_a, r.doc_b)
        for r in dedup.dedup_minhash_lsh(spark, sf_dir).collect()
    }
    planted = [(d, d + 1000000) for d in range(0, 500, 5)]
    found = sum(1 for p in planted if p in pairs)
    assert found / len(planted) >= 0.9


def test_exact_dedup_finds_all_planted_copies(spark, sf_dir):
    rows = dedup.dedup_exact(spark, sf_dir).collect()
    # every doc_id % 7 == 0 in [0, 500) was copied
    assert len(rows) == len(range(0, 500, 7))
    assert all(r.n_dups == 2 and r.max_id == r.min_id + 2000000 for r in rows)


def test_simhash_hamming_close_for_near_dups(spark):
    a = dedup._simhash64_py("the quick brown fox jumps over the lazy dog again and again today")
    b = dedup._simhash64_py("brown fox jumps over the lazy dog again and again today")
    c = dedup._simhash64_py("completely unrelated words about database engines and spark plans")
    ham = lambda x, y: sum(1 for p, q in zip(x, y) if p != q)
    assert len(a) == 64
    assert ham(a, b) < ham(a, c)


def test_simhash_numpy_kernel_matches_reference():
    """The r12 vectorized executor kernel (_simhash64_np: stacked
    unpackbits + column-sum votes, per-task digest memo) must be
    bit-identical to the pure-Python reference the oracle mirrors --
    including the empty/whitespace-only and duplicate-token edges."""
    import numpy as np

    cases = [
        "", "   ", None, "a", "tok tok tok",
        "the quick brown fox jumps over the lazy dog",
        "unicode tök tëst 字 emoji \U0001f600",
        "x " * 200,  # one distinct token, many repeats
        " ".join(f"w{i}" for i in range(300)),
    ]
    memo: dict[str, bytes] = {}
    for text in cases:
        ref = dedup._simhash64_py(text or "")
        fast = dedup._simhash64_np(text, memo, np)
        assert fast == ref, repr(text)
    # memo reuse across calls must not change results
    for text in cases:
        assert dedup._simhash64_np(text, memo, np) == dedup._simhash64_py(
            text or ""
        )


def test_containment_hashed_ids_match_string_intersect(spark, sf_dir):
    """The r12 content-id intersect (xxhash64 shingle ids) must emit
    the same containment pairs as a direct string-shingle intersect
    computed independently here (collision-free identity on real
    corpora is the operator's documented contract)."""
    from selfhosted_rag_doc_chat_prototype_spark.functions import (
        text_quality as tq,
    )
    from selfhosted_rag_doc_chat_prototype_spark.sources.tables import table

    got = sorted(
        tuple(r)
        for r in dedup.dedup_containment_verify(spark, sf_dir).collect()
    )
    docs = table(spark, sf_dir, "documents")
    quotes = docs.filter(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + 3000000).alias("doc_id"),
        F.array_join(
            F.slice(tq.words(F.col("text")), 1, dedup.QUOTE_W), " "
        ).alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(quotes)
    sets_ = corpus.select(
        "doc_id", dedup._shingles_col().alias("shingles")
    )
    post = sets_.select("doc_id", F.explode("shingles").alias("shingle"))
    buckets = (
        post.groupBy("shingle")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
        .filter(
            (F.size("ids") >= 2) & (F.size("ids") <= dedup.CONTAIN_DF_MAX)
        )
    )
    pairs = (
        dedup._bucket_pairs(buckets)
        .distinct()
        .select(F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b"))
    )
    j = pairs.join(
        sets_.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("shingles", "sh_a"), "doc_a"
    ).join(
        sets_.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("shingles", "sh_b"), "doc_b"
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    na, nb = F.size("sh_a"), F.size("sh_b")
    want = sorted(
        tuple(r)
        for r in j.select(
            "doc_a", "doc_b", inter.alias("inter"),
            na.alias("na"), nb.alias("nb"),
        )
        .filter(
            (F.lit(dedup.CONTAIN_DEN) * F.col("inter")
             >= F.lit(dedup.CONTAIN_NUM) * F.col("na"))
            | (F.lit(dedup.CONTAIN_DEN) * F.col("inter")
               >= F.lit(dedup.CONTAIN_NUM) * F.col("nb"))
        )
        .select(
            "doc_a", "doc_b",
            F.round(F.col("inter").cast("double")
                    / F.col("na").cast("double"), 4).alias("cont_a_in_b"),
            F.round(F.col("inter").cast("double")
                    / F.col("nb").cast("double"), 4).alias("cont_b_in_a"),
        )
        .collect()
    )
    assert got == want and len(got) > 0


def test_embedding_cosine_is_symmetric_blocked(spark, sf_dir):
    df = dedup.dedup_embedding_cosine(spark, sf_dir)
    rows = df.collect()
    assert all(r.vec_a < r.vec_b for r in rows)
    assert all(-1.0 <= r.cos_sim <= 1.0 for r in rows)


def test_short_docs_survive_shingling(spark):
    """Docs with <3 words must yield an empty shingle array, not an
    INVALID_PARAMETER_VALUE.START crash from a descending sequence
    (regression: a 2-word doc killed the whole LSH job)."""
    df = spark.createDataFrame(
        [(1, "two words"), (2, "one"), (3, ""), (4, None),
         (5, "three words here exactly now")],
        "doc_id long, text string",
    )
    sizes = {r.doc_id: r.n for r in
             df.select("doc_id", F.size(dedup._shingles_col()).alias("n")).collect()}
    assert sizes[1] == 0 and sizes[2] == 0 and sizes[3] == 0
    assert sizes[5] == 3
    # and the full candidate pipeline runs end-to-end over short docs
    assert dedup._candidate_pairs(df.fillna({"text": ""})).count() == 0


def test_embedding_dedup_finds_planted_copies(spark, sf_dir):
    """Every planted (v, v+0.01) near-copy must surface as an LSH
    candidate pair with near-1 cosine; candidate volume stays linear
    (no O(N^2) blocking)."""
    rows = dedup.dedup_embedding_cosine(spark, sf_dir).collect()
    pairs = {(r.vec_a, r.vec_b): r.cos_sim for r in rows}
    planted = [(i, i + 1000000) for i in range(0, 500, 5)]
    found = [p for p in planted if p in pairs]
    assert len(found) / len(planted) >= 0.95
    assert all(pairs[p] > 0.99 for p in found)


def test_semantic_keep_drops_only_planted_copies(spark, sf_dir):
    """Every dropped vector is a planted near-copy (originals always
    win the a < b keep rule), a healthy share of planted copies land
    in their original's cluster and get dropped (single-table
    partition -> boundary misses are expected, not total), and output
    covers the whole corpus exactly once."""
    rows = dedup.dedup_semantic_keep(spark, sf_dir).collect()
    assert len(rows) == len({r.vec_id for r in rows}) == 600
    dropped = {r.vec_id for r in rows if r.kept == 0}
    assert dropped and all(v >= 1000000 for v in dropped)
    assert len(dropped) / 100 >= 0.5  # cluster-boundary misses bounded


def test_substring_spans_flag_near_copies(spark, sf_dir):
    """Planted near-copies (first two words dropped) share almost every
    span with their original: both sides of each planted pair are
    flagged; docs outside the planted set stay clean (the word-soup
    corpus has no natural 20-word repeats)."""
    rows = {r.doc_id: r for r in
            dedup.dedup_substring_spans(spark, sf_dir).collect()}
    planted = [i for i in range(0, 500, 5) if i + 1000000 in rows]
    assert planted
    for i in planted:
        # copy spans are a subset of the original's (same words, first
        # two dropped) -> every copy span repeats
        assert rows[i + 1000000].is_dup == 1, f"copy of {i} unflagged"
        assert rows[i + 1000000].dup_frac == 1.0
        # the original shares n_spans - 2 of its spans; below 4 spans
        # that legitimately falls under the 0.5 flag threshold
        if rows[i].n_spans >= 4:
            assert rows[i].is_dup == 1, f"original {i} unflagged"
    # the corpus carries natural exact-duplicate doc groups (same
    # caveat as the boilerplate test), so unplanted docs may be
    # legitimately flagged -- but the majority must stay clean, and
    # the flag must agree with the threshold row-wise
    unplanted = [r for d, r in rows.items() if d < 1000000 and d % 5 != 0]
    assert sum(r.is_dup == 0 for r in unplanted) > len(unplanted) / 2
    for r in rows.values():
        assert r.is_dup == int(r.n_dup_spans / r.n_spans >= 0.5)


def test_knn_graph_is_symmetric_candidates_and_ranked(spark, sf_dir):
    """Edges come in candidate-symmetric form (if (a,b) scored then b
    lists a among ITS candidates -- it may fall off b's top-k), ranks
    are contiguous from 1 per source, and cos_sim is non-increasing
    with rank."""
    rows = dedup.knn_graph_lsh(spark, sf_dir).collect()
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r.vec_id, []).append((r.rank, r.cos_sim))
    assert len(by_src) > 100  # most vectors have bucket mates
    for src, edges in by_src.items():
        edges.sort()
        assert [e[0] for e in edges] == list(range(1, len(edges) + 1))
        sims = [e[1] for e in edges]
        assert sims == sorted(sims, reverse=True)
        assert len(edges) <= dedup.K_GRAPH


def test_connected_components_cluster_planted_pairs(spark, sf_dir):
    """Cluster invariants: exactly one canonical (min-id) doc per
    cluster, and planted near-copies land in their original's
    cluster."""
    rows = dedup.dedup_connected_components(spark, sf_dir).collect()
    comp = {r.doc_id: r.cluster_id for r in rows}
    clusters = {}
    for r in rows:
        clusters.setdefault(r.cluster_id, []).append(r)
    for cid, members in clusters.items():
        assert sum(m.is_canonical for m in members) == 1
        assert min(m.doc_id for m in members) == cid
    planted = [d for d in range(0, 500, 5) if d in comp]
    found = sum(1 for d in planted if comp.get(d + 1000000) == comp[d])
    assert planted and found / len(planted) >= 0.9


def test_incremental_minhash_against_persisted_index(spark, sf_dir, tmp_path):
    """New-batch near-dup detection touches ONLY the new docs and the
    stored signature table: archive signatures round-trip through
    parquet, planted near-copies are found, fresh docs are not."""
    from pyspark.sql import functions as F

    from selfhosted_rag_doc_chat_prototype_spark.functions import text_quality as tq
    from selfhosted_rag_doc_chat_prototype_spark.operators.dedup import (
        dedup_incremental_minhash,
        minhash_signature_index,
    )
    from selfhosted_rag_doc_chat_prototype_spark.sources.tables import table

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    archive = docs.filter(F.col("doc_id") < 400)
    idx_path = str(tmp_path / "sig_index")
    minhash_signature_index(archive).write.parquet(idx_path)

    w = tq.words(F.col("text"))
    near = archive.filter(F.col("doc_id") % 50 == 0).select(
        (F.col("doc_id") + 900000).alias("doc_id"),
        F.array_join(F.slice(w, 3, F.size(w)), " ").alias("text"),
    )
    fresh = docs.filter(
        (F.col("doc_id") >= 400) & (F.col("doc_id") < 420)
    )
    pairs = dedup_incremental_minhash(
        near.unionByName(fresh), spark.read.parquet(idx_path)
    ).collect()

    found = {(r.new_id, r.archive_id) for r in pairs}
    expected = {(d + 900000, d) for d in range(0, 400, 50)}
    assert expected <= found          # every planted near-copy detected

    # candidates may include LSH false positives (banded collisions);
    # the Jaccard verify stage is what separates them -- after it, the
    # planted near-copies survive and every false positive drops
    from selfhosted_rag_doc_chat_prototype_spark.operators.dedup import _shingles_col

    cand = spark.createDataFrame(
        [(a, b) for a, b in found], "new_id long, archive_id long"
    )
    sh_new = near.unionByName(fresh).select(
        F.col("doc_id").alias("new_id"), _shingles_col().alias("sh_n"))
    sh_arc = archive.select(
        F.col("doc_id").alias("archive_id"), _shingles_col().alias("sh_a"))
    inter = F.size(F.array_intersect("sh_n", "sh_a"))
    union = F.size("sh_n") + F.size("sh_a") - inter
    verified = (
        cand.join(sh_new, "new_id").join(sh_arc, "archive_id")
        .select("new_id", "archive_id",
                (inter.cast("double") / union.cast("double")).alias("j"))
        .filter(F.col("j") >= 0.5)
        .collect()
    )
    # the planted pairs all verify; other surviving pairs are REAL
    # near-dups of the template-heavy synthetic corpus (e.g. docs 0/50/82
    # share a template), which is precisely what the operator is for
    assert expected <= {(r.new_id, r.archive_id) for r in verified}


def test_connected_components_long_chain_converges(spark):
    """Pathological path graph far longer than CC_MAX_ITERS: plain
    min-label propagation would need ~N rounds and silently emit split
    clusters at the iteration cap; the pointer-jumped loop's reach
    doubles per round, so a 100-hop chain converges within the default
    8-round bound with every node labeled 0."""
    n = 100
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "src long, dst long"
    )
    edges = pairs.unionByName(
        pairs.selectExpr("dst AS src", "src AS dst")
    )
    labels = {
        r.doc_id: r.label
        for r in dedup.connected_components_labels(edges).collect()
    }
    assert len(labels) == n + 1
    assert set(labels.values()) == {0}


def test_connected_components_raises_on_nonconvergence(spark):
    """The iteration cap must be LOUD: exiting with labels still
    moving raises instead of returning split clusters."""
    import pytest as _pytest

    n = 40
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "src long, dst long"
    )
    edges = pairs.unionByName(
        pairs.selectExpr("dst AS src", "src AS dst")
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components_labels(edges, max_iters=2)


def test_pagerank_rank_semantics(spark, sf_dir):
    """Exact-integer PageRank invariants: every valid vector gets a
    rank; a node with no in-edges holds exactly the base rank; inflow
    never exceeds what neighbors emitted (truncating division only
    loses units); determinism across reruns."""
    from selfhosted_rag_doc_chat_prototype_spark.operators.dedup import (
        PR_DAMP_NUM,
        PR_SCALE,
        knn_graph,
        knn_pagerank,
    )

    rows = knn_pagerank(spark, sf_dir).collect()
    base = PR_SCALE * (100 - PR_DAMP_NUM) // 100
    assert rows
    n_edges_src = {r.vec_id for r in knn_graph(spark, sf_dir)
                   .select(F.col("neighbor_id").alias("vec_id")).collect()}
    for r in rows:
        assert r.pr_u >= base
        if r.vec_id not in n_edges_src:  # no in-edges: base rank only
            assert r.pr_u == base
    # total rank never exceeds the seeded total (damping + truncation
    # only remove units; dangling nodes absorb)
    assert sum(r.pr_u for r in rows) <= PR_SCALE * len(rows)
    again = knn_pagerank(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_bloom_prefilter_has_no_false_negatives(spark, sf_dir):
    """The Bloom guarantee that makes the prefilter safe to trust:
    every true duplicate (the %7 copy slice) MUST hit; misses are
    guaranteed-new and skip verification entirely. False positives
    are allowed but must be flagged, never reported as dups."""
    from selfhosted_rag_doc_chat_prototype_spark.operators.dedup import (
        dedup_bloom_prefilter,
    )

    rows = dedup_bloom_prefilter(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if 3_000_000 <= r.doc_id < 4_000_000:  # exact archive copy
            assert r.bloom_hit and r.verified_dup and not r.false_positive
        else:  # genuinely new (' uniqnew' suffix)
            assert not r.verified_dup
            assert r.false_positive == r.bloom_hit


def test_bloom_prefilter_accepts_arbitrary_batch(spark):
    """The factored operator takes ANY (archive, new_batch) pair --
    the synthetic fixture lives only in the registry binding."""
    from selfhosted_rag_doc_chat_prototype_spark.operators.dedup import (
        bloom_prefilter,
    )

    archive = spark.createDataFrame(
        [("seen once",), ("seen twice",), ("seen twice",)], "text string"
    )
    batch = spark.createDataFrame(
        [(1, "seen once"), (2, "never seen before xyz")],
        "doc_id int, text string",
    )
    rows = {r.doc_id: r for r in bloom_prefilter(archive, batch).collect()}
    assert rows[1].bloom_hit and rows[1].verified_dup
    assert not rows[1].false_positive
    # no false negatives ever: a true dup must hit
    assert not rows[2].verified_dup


def test_pr_scale_autoscales_headroom():
    """derive_pr_scale must keep 85*N*scale well under 2^63 at node
    counts where the old fixed 1e12 seed would overflow, without
    changing the precision used on gate-sized corpora."""
    from selfhosted_rag_doc_chat_prototype_spark.operators.dedup import (
        PR_DAMP_NUM,
        derive_pr_scale,
    )

    # gate corpora: unchanged legacy precision
    assert derive_pr_scale(1) == 10**12
    assert derive_pr_scale(9_999) == 10**12
    # a node count the OLD fixed scale could not survive
    n = 20_000_000
    assert PR_DAMP_NUM * n * 10**12 >= 2**63  # old: overflow
    s = derive_pr_scale(n)
    assert PR_DAMP_NUM * n * s < 2**63 // 10  # new: >=10x headroom
    # headroom holds across the whole range, scale floored at 100
    for d in range(20):
        nn = 10**d
        ss = derive_pr_scale(nn)
        assert ss >= 100
        if ss > 100:
            assert PR_DAMP_NUM * nn * ss < 2**63 // 10


def test_pr_scale_sql_matches_python():
    import duckdb

    from selfhosted_rag_doc_chat_prototype_spark.operators.dedup import (
        _pr_scale_sql,
        derive_pr_scale,
    )

    con = duckdb.connect()
    for n in [1, 7, 500, 9_999, 10_000, 123_456, 20_000_000]:
        con.execute("CREATE OR REPLACE VIEW nodes AS "
                    f"SELECT * FROM range({n})")
        (got,) = con.execute(_pr_scale_sql()).fetchone()
        assert got == derive_pr_scale(n), n


@given(st.integers(min_value=1, max_value=10**18))
@settings(max_examples=300, deadline=None)
def test_pr_scale_twins_lockstep_property(n):
    """Round-6 verdict task #7: the scale formula lives twice (Python
    ``derive_pr_scale``, SQL ``_pr_scale_expr`` -- the exact string the
    PageRank oracle embeds). Sweep node counts through BOTH and pin
    them equal, including every decade boundary where the digit count
    (and therefore the derived scale) steps."""
    import duckdb

    from selfhosted_rag_doc_chat_prototype_spark.operators.dedup import (
        _pr_scale_expr,
        derive_pr_scale,
    )

    con = _pr_scale_con()
    for nn in {n, max(1, n - 1), min(10**18, n + 1)}:
        (got,) = con.execute(f"SELECT {_pr_scale_expr(str(nn))}").fetchone()
        assert got == derive_pr_scale(nn), nn


def _pr_scale_con():
    import duckdb

    global _PR_CON
    try:
        return _PR_CON
    except NameError:
        _PR_CON = duckdb.connect()
        return _PR_CON


def test_snapshot_diff_statuses(spark):
    from selfhosted_rag_doc_chat_prototype_spark.operators.dedup import (
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, "same"), (2, "will change"), (3, "will vanish")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "same"), (2, "changed!"), (4, "brand new")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.status for r in snapshot_diff(old, new).collect()}
    assert got == {2: "changed", 3: "removed", 4: "added"}


def test_triangle_count_on_known_graph(spark, monkeypatch):
    """4-clique + pendant edge: the clique's 4 nodes sit in C(3,2)=3
    triangles each; the pendant pair in none."""
    from selfhosted_rag_doc_chat_prototype_spark.operators import dedup as dd

    edges = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(4) if a != b]
        + [(3, 9), (9, 3)],
        "vec_id long, neighbor_id long",
    )
    monkeypatch.setattr(dd, "knn_graph", lambda *_a, **_k: edges)
    got = {r.vec_id: r.n_triangles
           for r in dd.knn_triangle_count(spark, "unused").collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3, 9: 0}


def test_label_propagation_clamps_seeds_and_spreads(spark, sf_dir):
    """Seeds keep their true label verbatim; at least one non-seed
    acquires a label through the graph; nothing invents labels outside
    the seed label set (NULL = honestly unreached)."""
    from selfhosted_rag_doc_chat_prototype_spark.operators.dedup import (
        LP_SEED_MOD,
        knn_label_propagation,
    )
    from selfhosted_rag_doc_chat_prototype_spark.sources.tables import table

    truth = {
        r.vec_id: r.label
        for r in table(spark, sf_dir, "embeddings")
        .select("vec_id", "label").collect()
    }
    rows = knn_label_propagation(spark, sf_dir).collect()
    assert rows
    seed_labels = {
        truth[r.vec_id] for r in rows if r.is_seed and truth[r.vec_id] is not None
    }
    spread = 0
    for r in rows:
        assert r.is_seed == (1 if r.vec_id % LP_SEED_MOD == 0 else 0)
        if r.is_seed:
            assert r.label == truth[r.vec_id]
        elif r.label is not None:
            assert r.label in seed_labels
            spread += 1
    assert spread > 0


def test_edit_distance_flags_near_copies(spark, sf_dir):
    """The planted near-copies (first two words dropped) must verify
    as dups; similarity is 1 - dist/longer exactly; is_dup honors the
    30% threshold."""
    from selfhosted_rag_doc_chat_prototype_spark.operators.dedup import (
        ED_PCT,
        dedup_edit_distance,
    )

    rows = dedup_edit_distance(spark, sf_dir).collect()
    assert rows
    planted = [r for r in rows if r.doc_b - r.doc_a == 1000000]
    assert planted
    for r in planted:
        assert r.is_dup == 1
    for r in rows:
        assert 0 <= r.edit_dist
        assert abs(r.similarity - (1 - r.edit_dist / r.longer_len)) < 1e-12
        assert r.is_dup == (1 if r.edit_dist * 100 <= r.longer_len * ED_PCT
                            else 0)


def test_knn_label_disagreement_invariants(spark, sf_dir):
    """Structural contracts of the mislabel screen: agreement never
    exceeds the neighbor count, isolated vectors are never flagged,
    and a flagged vector's majority strictly differs and outvotes."""
    from selfhosted_rag_doc_chat_prototype_spark.operators.dedup import (
        knn_label_disagreement,
    )

    rows = knn_label_disagreement(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_agree <= r.n_nbrs
        if r.n_nbrs == 0:
            assert not r.flagged and r.nbr_majority is None
        if r.flagged:
            assert r.nbr_majority is not None
            assert r.nbr_majority != r.label
            # strict majority: own-label agreement can never reach half
            assert 2 * r.n_agree < r.n_nbrs


def test_edit_distance_prefix_fold_commutes(spark):
    """The r12 plan change folds non-ASCII AFTER truncating to
    ED_MAX_LEN (so the regexp never scans the doc tail). That is only
    sound because the fold maps one codepoint to one codepoint --
    prove substring-then-fold == fold-then-substring on strings with
    multibyte characters straddling the boundary."""
    from selfhosted_rag_doc_chat_prototype_spark.operators.dedup import (
        ED_MAX_LEN,
    )

    cases = [
        "é" * (ED_MAX_LEN + 50),                 # all non-ASCII
        "a" * (ED_MAX_LEN - 1) + "中文tail",  # straddles cut
        "\U0001f600" + "b" * ED_MAX_LEN,              # astral plane
        "plain ascii only",
        "",
        None,
    ]
    df = spark.createDataFrame([(c,) for c in cases], "text string")
    txt = F.coalesce(F.col("text"), F.lit(""))
    new = F.regexp_replace(
        F.substring(txt, 1, ED_MAX_LEN), r"[^\x00-\x7F]", "?"
    )
    old = F.substring(
        F.regexp_replace(txt, r"[^\x00-\x7F]", "?"), 1, ED_MAX_LEN
    )
    bad = df.select(new.alias("n"), old.alias("o")).where(
        F.col("n") != F.col("o")
    )
    assert bad.count() == 0
