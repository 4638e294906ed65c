"""Property-based tests (hypothesis) over the pure operator kernels --
the reference's invariant-style tests (SURVEY.md section 5: zero-loss
reconstruction, id determinism) generalized to generated inputs. No
SparkSession needed: these are the exact functions the Arrow operators
broadcast to executors."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from selfhosted_rag_doc_chat_prototype_spark.functions.hashing import (
    mmh3_chunk_id,
    mmh3_doc_id,
    murmur3_32,
)
from selfhosted_rag_doc_chat_prototype_spark.functions.text_quality import (
    MOJIBAKE_FIXES,
)
from selfhosted_rag_doc_chat_prototype_spark.operators.chunking import (
    parse_front_matter,
    split_markdown,
    subsplit_exact,
)
from selfhosted_rag_doc_chat_prototype_spark.operators.dedup import _simhash64_py
from selfhosted_rag_doc_chat_prototype_spark.operators.embedding import (
    DIM,
    embed_text_py,
)

text_st = st.text(max_size=400)
word_text_st = st.text(
    alphabet=st.sampled_from("abcdefghij XYZ.\n#-"), max_size=400
)


@given(st.integers(min_value=2, max_value=64),
       st.integers(min_value=0, max_value=10_000))
@settings(max_examples=50, deadline=None)
def test_pq_kmeans_deterministic_and_bounded(n, data_seed):
    """The PQ codebook trainer must be deterministic in (sample, seed)
    -- two builds over the same sample yield byte-identical persisted
    codebooks -- and every center must stay inside the data's bounding
    box (each Lloyd update is a mean of sample points; k-means++ seeds
    are sample points)."""
    import numpy as np

    from selfhosted_rag_doc_chat_prototype_spark.operators.pq import _kmeans_1d

    data = np.random.default_rng(data_seed).normal(size=(n, 4))
    k = min(8, n)
    a = _kmeans_1d(data, k, 5, np.random.default_rng(7))
    b = _kmeans_1d(data, k, 5, np.random.default_rng(7))
    assert np.array_equal(a, b)
    assert a.shape == (k, 4)
    assert (a >= data.min(axis=0) - 1e-12).all()
    assert (a <= data.max(axis=0) + 1e-12).all()


@given(text_st, st.integers(min_value=1, max_value=50))
@settings(max_examples=200, deadline=None)
def test_subsplit_zero_loss(text, max_chars):
    """T6 invariant (test_no_loss_splitting.py:17-45): pieces cover the
    input exactly -- never truncation, never padding."""
    pieces = subsplit_exact(text, max_chars)
    assert "".join(pieces) == text
    assert all(len(p) <= max_chars for p in pieces)
    if len(text) > 0:
        assert all(len(p) > 0 for p in pieces)


@given(word_text_st, st.integers(min_value=5, max_value=80))
@settings(max_examples=200, deadline=None)
def test_split_markdown_invariants(text, max_chars):
    chunks = split_markdown(text, max_chars=max_chars)
    # chunk_index is dense and ordered; chunks are non-empty and bounded
    assert [c["chunk_index"] for c in chunks] == list(range(len(chunks)))
    for c in chunks:
        assert 0 < len(c["chunk"]) <= max_chars
        # every chunk's content is literally present in the input
        assert c["chunk"] in text


@given(word_text_st)
@settings(max_examples=100, deadline=None)
def test_front_matter_never_loses_body(text):
    _, body = parse_front_matter(text)
    assert body in text


@given(st.binary(max_size=200))
@settings(max_examples=200, deadline=None)
def test_murmur3_deterministic_and_32bit(data):
    a, b = murmur3_32(data), murmur3_32(data)
    assert a == b
    assert 0 <= a < 2**32


@given(st.lists(st.text(max_size=60), min_size=1, max_size=20))
@settings(max_examples=25, deadline=None)
def test_murmur3_sql_twin_matches_python(texts):
    """The inline DuckDB murmur3_32 (the ingest-e2e oracle's id
    arithmetic) is byte-exact with the Python implementation on
    arbitrary unicode, including the published-vector cases."""
    import duckdb

    from selfhosted_rag_doc_chat_prototype_spark.functions.hashing import (
        murmur3_32_sql,
    )

    texts = texts + ["", "a", "abc", "abcd", "hello", "x" * 257]
    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE t(i INT, s VARCHAR)")
        con.executemany("INSERT INTO t VALUES (?, ?)",
                        list(enumerate(texts)))
        got = [r[0] for r in con.execute(
            f"SELECT {murmur3_32_sql('s')} FROM t ORDER BY i"
        ).fetchall()]
    finally:
        con.close()
    assert got == [murmur3_32(t) for t in texts]


@given(text_st, text_st)
@settings(max_examples=100, deadline=None)
def test_content_ids_shape_and_determinism(doc, chunk):
    did = mmh3_doc_id(doc)
    assert did.startswith("DOC_") and len(did) == 12
    cid = mmh3_chunk_id(did, chunk)
    assert cid.startswith(did + "_")
    assert cid == mmh3_chunk_id(did, chunk)


@given(text_st)
@settings(max_examples=100, deadline=None)
def test_embedding_unit_norm_or_zero(text):
    v = embed_text_py(text)
    assert len(v) == DIM
    n = sum(x * x for x in v)
    assert abs(n - 1.0) < 1e-9 or n == 0.0


@given(text_st)
@settings(max_examples=100, deadline=None)
def test_simhash_is_64_bits(text):
    bits = _simhash64_py(text)
    assert len(bits) == 64 and set(bits) <= {"0", "1"}
    assert bits == _simhash64_py(text)


@given(st.text(alphabet=st.sampled_from("abc 'x’“éü—"), max_size=60))
@settings(max_examples=100, deadline=None)
def test_mojibake_fix_table_roundtrips(clean):
    """Breaking a clean string (utf-8 bytes mis-read as latin-1) and
    applying the fix table restores it, provided the string has no
    characters outside the table (the table IS the supported subset)."""
    broken = clean.encode("utf-8").decode("latin-1")
    fixed = broken
    for bad, good in MOJIBAKE_FIXES:
        fixed = fixed.replace(bad, good)
    assert fixed == clean


@given(
    st.lists(st.integers(min_value=0, max_value=900), max_size=80),
    st.integers(min_value=1, max_value=600),
)
@settings(max_examples=200, deadline=None)
def test_firstfit_bins_invariants(tokens, cap):
    """First-fit packing invariants for ANY token sizes: bin ids are
    contiguous and non-decreasing, no multi-doc bin exceeds cap, and
    a doc is never split across bins (one id per doc)."""
    from selfhosted_rag_doc_chat_prototype_spark.operators.pretrain import (
        firstfit_bins,
    )

    bins = firstfit_bins(tokens, cap)
    assert len(bins) == len(tokens)
    if not tokens:
        return
    assert bins[0] == 0
    assert all(b2 - b1 in (0, 1) for b1, b2 in zip(bins, bins[1:]))
    fills: dict[int, list[int]] = {}
    for t, b in zip(tokens, bins):
        fills.setdefault(b, []).append(t)
    for members in fills.values():
        assert sum(members) <= cap or len(members) == 1
    # greedy tightness: a doc opens a new bin only because it would
    # not have fit in the previous one (or is first)
    for i in range(1, len(tokens)):
        if bins[i] != bins[i - 1]:
            prev_fill = sum(fills[bins[i - 1]])
            assert prev_fill + tokens[i] > cap


@given(st.integers(min_value=1, max_value=10**13),
       st.integers(min_value=4, max_value=1024))
@settings(max_examples=200, deadline=None)
def test_knn_bits_rule_bounds_occupancy(n, target):
    """knn_bits_for keeps expected bucket occupancy n / 2^bits within
    (target/2, target] whenever the corpus is big enough to split (the
    ceil can only overshoot the power of two by < 1 bit), and never
    returns a degenerate width."""
    from selfhosted_rag_doc_chat_prototype_spark.operators.dedup import (
        knn_bits_for,
    )

    bits = knn_bits_for(n, target)
    assert bits >= 1
    occ = n / 2**bits
    if n > 2 * target:
        assert occ <= target
        assert occ > target / 2


@given(
    st.lists(st.text(alphabet="abcdef", min_size=1, max_size=3),
             min_size=0, max_size=30),
    st.lists(st.text(alphabet="uvwxyz", min_size=1, max_size=3),
             min_size=0, max_size=30),
    st.integers(min_value=0, max_value=30),
    st.integers(min_value=0, max_value=30),
)
@settings(max_examples=100, deadline=None)
def test_winnowing_guarantee_property(pre_a, pre_b, cut_a, cut_b):
    """Schleimer et al.'s bound on generated inputs: embed one shared
    WIN_W + WIN_K - 1 word run at arbitrary positions inside two
    otherwise disjoint-alphabet documents -- they MUST share a
    fingerprint."""
    from selfhosted_rag_doc_chat_prototype_spark.operators.textstats import (
        WIN_K, WIN_W, winnow_fps_py,
    )

    run = [f"shared{i}" for i in range(WIN_W + WIN_K - 1)]
    doc_a = pre_a[: cut_a] + run + pre_a[cut_a:]
    doc_b = pre_b[: cut_b] + run + pre_b[cut_b:]
    _, fa = winnow_fps_py(doc_a)
    _, fb = winnow_fps_py(doc_b)
    assert set(fa) & set(fb), "shared run lost by winnowing"


# ---- BPE tokenizer properties (functions/bpe.py) --------------------------

_WORDS = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
    min_size=1, max_size=12,
)


@given(
    vocab=st.dictionaries(_WORDS, st.integers(1, 50), min_size=1, max_size=30),
    text_words=st.lists(_WORDS, min_size=0, max_size=40),
)
@settings(max_examples=60, deadline=None)
def test_pretoken_count_lower_bounds_bpe_count(vocab, text_words):
    """The T5 budget claim's general direction: a BPE token never
    crosses a pre-token boundary, so for ANY merge table (here: one
    trained on an arbitrary unrelated vocab) and ANY text, the real
    token count is >= the pre-token count -- with equality exactly
    when every pre-token is covered."""
    import re

    from selfhosted_rag_doc_chat_prototype_spark.functions.bpe import (
        BPETokenizer,
        train_bpe,
    )

    tok = BPETokenizer(train_bpe(vocab, max_merges=64))
    text = " ".join(text_words)
    pre = re.findall(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]", text)
    n_real = tok.n_tokens(text)
    assert n_real >= len(pre)
    if all(tok.covers(w) for w in pre):
        assert n_real == len(pre)


@given(vocab=st.dictionaries(_WORDS, st.integers(1, 50),
                             min_size=1, max_size=25))
@settings(max_examples=40, deadline=None)
def test_bpe_trains_to_convergence_and_roundtrips(vocab):
    """Training to convergence covers its own vocab (every trained
    word encodes to ONE token), training is order-insensitive, and
    encode is deterministic."""
    from selfhosted_rag_doc_chat_prototype_spark.functions.bpe import (
        BPETokenizer,
        train_bpe,
    )

    merges = train_bpe(vocab)
    assert merges == train_bpe(dict(reversed(list(vocab.items()))))
    tok = BPETokenizer(merges)
    for w in vocab:
        assert tok.covers(w), w
        assert tok.encode(w) == tok.encode(w)


# ---- reference-parity markdown splitter (operators/mdsplit.py) ------------


@given(
    words=st.lists(
        st.text(alphabet=st.characters(whitelist_categories=("Ll",)),
                min_size=1, max_size=12),
        min_size=1, max_size=80,
    ),
    budget=st.integers(80, 600),
)
@settings(max_examples=60, deadline=None)
def test_mdsplit_budget_and_zero_loss_properties(words, budget):
    """For arbitrary flat prose and budgets: every emitted chunk fits
    the token budget with its prefix (the validate_chunk contract),
    and no non-space character is ever LOST (zero loss -- overlap may
    duplicate; tiny budgets legitimately fragment words to characters,
    which is the reference's own behavior when the prefix cost eats
    the window, so the invariant is character survival, not word
    survival)."""
    from collections import Counter

    from selfhosted_rag_doc_chat_prototype_spark.operators.mdsplit import (
        CharTokenizer,
        split_markdown_doc_parity,
    )

    text = " ".join(words)
    doc_id = "DOC_0PROPTEST"[:12]
    chunks, metas = split_markdown_doc_parity(
        text, "p.md", budget=budget, document_id=doc_id
    )
    tok = CharTokenizer()
    prefix = f"passage: [{doc_id}] "
    for c in chunks:
        assert len(tok.encode(prefix + c)) <= budget
    have = Counter("".join(chunks).replace(" ", ""))
    want = Counter(text.replace(" ", ""))
    for ch, n in want.items():
        assert have[ch] >= n, (ch, chunks)
    assert [m["chunk_index"] for m in metas] == list(range(len(chunks)))


@given(
    st.lists(
        st.tuples(st.integers(min_value=1, max_value=40),
                  st.integers(min_value=0, max_value=1_000_000)),
        min_size=1, max_size=60,
    )
)
@settings(max_examples=200, deadline=None)
def test_skyline_kernel_matches_bruteforce(points):
    """The O(n log n) skyline kernel equals the quadratic dominance
    definition on arbitrary (tok, uniq_u) multisets -- including ties,
    duplicate points (co-survival), and degenerate single-axis runs."""
    import pandas as pd

    from selfhosted_rag_doc_chat_prototype_spark.operators.selection import (
        _skyline_kernel,
    )

    pdf = pd.DataFrame({
        "doc_id": range(len(points)),
        "tok": [t for t, _ in points],
        "uniq_u": [u for _, u in points],
    })
    got = {tuple(r) for r in
           _skyline_kernel(pdf)[["doc_id", "tok", "uniq_u"]].itertuples(
               index=False)}
    brute = set()
    for i, (t, u) in enumerate(points):
        dominated = any(
            (t2 >= t and u2 >= u and (t2 > t or u2 > u))
            for j, (t2, u2) in enumerate(points) if j != i
        )
        if not dominated:
            brute.add((i, t, u))
    assert got == brute


@given(
    st.lists(st.integers(min_value=0, max_value=100_000),
             min_size=1, max_size=40),
    st.integers(min_value=1, max_value=99),
)
@settings(max_examples=200, deadline=None)
def test_waterfill_closed_form_invariants(sizes, pct):
    """The water-filling closed form (the exact arithmetic
    token_budget_waterfill executes in SQL, mirrored here in pure
    Python with truncating division): allocations never exceed a
    source's size, sum EXACTLY to the budget whenever budget <= total,
    uncapped sources keep everything, and capped allocations sit
    within one unit of each other (max-min fairness)."""
    total = sum(sizes)
    budget = total * pct // 100
    m = len(sizes)
    order = sorted(range(m), key=lambda i: (sizes[i], i))
    # k = largest prefix that fits whole alongside levelling the rest
    k, cum_k, cum = 0, 0, 0
    for pos, i in enumerate(order, start=1):
        cum += sizes[i]
        if cum + (m - pos) * sizes[i] <= budget:
            k, cum_k = pos, cum
    alloc = {}
    if m > k:
        level = (budget - cum_k) // (m - k)
        rem = (budget - cum_k) % (m - k)
    for pos, i in enumerate(order, start=1):
        if pos <= k:
            alloc[i] = sizes[i]
        else:
            bonus = 1 if pos - k <= rem else 0
            alloc[i] = min(sizes[i], level + bonus)
    assert all(alloc[i] <= sizes[i] for i in range(m))
    if budget <= total:
        assert sum(alloc.values()) == budget
    capped = [alloc[i] for i in range(m) if alloc[i] < sizes[i]]
    if capped:
        assert max(capped) - min(capped) <= 1
        # max-min fairness: a fully-kept source fits under the level
        # plus its possible +1 bonus, and max(capped) >= level, so
        # kept sizes are bounded by max(capped) + 1. (The +1 is the
        # bonus ceiling: hypothesis falsified the stricter
        # `<= max(capped)` bound with sizes=[1, 6], pct=15 -- budget 1
        # goes whole to the 1-token source while the capped source
        # gets level 0 and no bonus.)
        level_hi = max(capped)
        assert all(sizes[i] <= level_hi + 1 for i in range(m)
                   if alloc[i] == sizes[i])


# -- two-level Gonzalez k-center (operators/ml.py) --------------------

def _radius(Q, centers):
    """Max over points of min int squared distance to any center."""
    import numpy as np

    best = None
    for c in centers:
        d = ((Q - np.asarray(c, dtype=np.int64)) ** 2).sum(axis=1)
        best = d if best is None else np.minimum(best, d)
    return int(best.max())


@given(st.integers(min_value=1, max_value=6),
       st.integers(min_value=2, max_value=8),
       st.integers(min_value=0, max_value=2_000))
@settings(max_examples=40, deadline=None)
def test_two_level_kcenter_stays_in_approximation_family(k, dim, seed):
    """The composable-coreset guarantee the two-level construction
    rides on (every point is within the local covering radius of some
    pooled candidate): its covering radius never exceeds 2x the
    single-level Gonzalez radius on the same corpus. Also pins
    determinism: row order never changes the selection (rows sort by
    vec_id inside the kernel)."""
    import numpy as np

    from selfhosted_rag_doc_chat_prototype_spark.operators.ml import (
        KC_PARTS,
        _gonzalez_np,
    )

    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 120))
    ids = rng.choice(10_000, size=n, replace=False).astype(np.int64)
    Q = rng.integers(-1_000_000, 1_000_000, size=(n, dim), dtype=np.int64)

    single_ids, single_centers = _gonzalez_np(ids.copy(), Q.copy(), k)

    # two-level: local Gonzalez per grp = vec_id % KC_PARTS, then
    # final Gonzalez over the pooled candidates -- exactly the
    # _two_level_centers composition without Spark
    cand_ids, cand_qs = [], []
    for g in range(KC_PARTS):
        m = ids % KC_PARTS == g
        if m.any():
            lid, lq = _gonzalez_np(ids[m], Q[m], k)
            cand_ids.extend(lid)
            cand_qs.extend(lq)
    two_ids, two_centers = _gonzalez_np(
        np.asarray(cand_ids, dtype=np.int64),
        np.asarray(cand_qs, dtype=np.int64), k)

    assert len(two_ids) == min(k, len(cand_ids))
    assert len(set(two_ids)) == len(two_ids)
    r_single = _radius(Q, single_centers)
    r_two = _radius(Q, two_centers)
    assert r_two <= 2 * r_single or r_single == 0 and r_two == 0

    # permutation invariance (the vec_id sort inside the kernel)
    perm = rng.permutation(n)
    again_ids, _ = _gonzalez_np(ids[perm], Q[perm], k)
    assert again_ids == single_ids


@given(st.integers(min_value=0, max_value=500))
@settings(max_examples=25, deadline=None)
def test_gonzalez_kernel_tie_breaks_and_exhaustion(seed):
    """Seed = lowest vec_id; duplicates exhaust gracefully (selection
    stops at the distinct-point count only when every remaining
    min-dist is zero AND all rows are chosen); k > n returns n."""
    import numpy as np

    from selfhosted_rag_doc_chat_prototype_spark.operators.ml import (
        _gonzalez_np,
    )

    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 30))
    ids = np.sort(rng.choice(1_000, size=n, replace=False)).astype(np.int64)
    Q = rng.integers(-5, 5, size=(n, 3), dtype=np.int64)
    k = int(rng.integers(1, 40))
    sel_ids, centers = _gonzalez_np(ids, Q, k)
    assert sel_ids[0] == int(ids.min())
    assert len(sel_ids) == min(k, n)
    assert len(set(sel_ids)) == len(sel_ids)
