"""Text-analysis operators over the ``documents`` corpus: token stats,
quality scoring, language-ID heuristic, fingerprinting, and
content-addressed IDs -- the training-data-pipeline surface built on the
reference's quality predicates (SURVEY.md sections 2.3, 2.9).

All queries are pure built-in expressions (regex + higher-order array
functions inside whole-stage codegen) with exact DuckDB oracles. At
100 TB these are embarrassingly parallel scans: no shuffle except the
final (tiny) aggregations, and the parquet scan prunes to the ``text``
column only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text_quality as tq
from ..functions.hashing import (
    content_doc_id_col,
    passage_prefix_col,
    uuid_md5_col,
)
from ..sources.tables import rebalance, table

STOPWORDS = {
    "en": ["the", "of", "and", "to", "in", "is", "that", "it", "for", "on"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "von", "zu"],
    "fr": ["le", "les", "la", "et", "une", "est", "que", "pour", "dans", "vous"],
    "es": ["el", "los", "las", "y", "una", "es", "por", "con", "para", "como"],
}

_W_SQL = "list_filter(string_split_regex(trim(text), '[ \\t\\n\\x0B\\f\\r]+'), x -> x <> '')"
# null-safe twin (NULL text == empty document); keep in sync with the
# operators that coalesce text on the Spark side
_W0_SQL = ("list_filter(string_split_regex(trim(coalesce(text, '')),"
           " '[ \\t\\n\\x0B\\f\\r]+'), x -> x <> '')")


# BPE-ish pre-tokenizer split (letter runs / digit runs / single
# punctuation), the GPT-2-family pre-tokenization shape restricted to
# ASCII classes so Spark's Java regex and DuckDB's RE2 agree exactly
# explicit whitespace class, not \s: Java \s includes \x0B where
# RE2's excludes it (and Python's unicode \s includes NBSP etc.);
# the literal class means every engine tokenizes identically
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\x0B\f\r]"


# ---- deterministic sampling / split ---------------------------------------
# Training pipelines need reproducible corpus subsets that are stable
# under re-runs, insertions, and distribution across executors: key the
# decision on a CONTENT-INDEPENDENT hash of the id, never on rand() or
# row position. The hash-to-fraction compare happens entirely on the
# lexicographic order of lowercase md5 hex (identical in Spark and
# DuckDB), so no float conversion is involved.

HOLDOUT_FRACTION = 0.1
SAMPLE_FRACTION = 0.1


def _hex_threshold(fraction: float) -> str:
    """First-8-hex-chars threshold: P(md5_prefix < thr) == fraction."""
    return format(int(fraction * 16**8), "08x")


def corpus_sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/holdout split + an independent p=0.1 sample
    flag per document. Independence comes from salting the id with a
    distinct tag per decision ('split' / 'sample') before hashing --
    the doc's split never correlates with its sample membership.
    Map-only; survives any repartitioning or incremental re-ingest."""
    docs = table(spark, sf_dir, "documents")
    split_h = F.substring(F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), 1, 8)
    sample_h = F.substring(F.md5(F.concat(F.lit("sample:"), F.col("doc_id").cast("string"))), 1, 8)
    return docs.select(
        "doc_id",
        F.when(split_h < _hex_threshold(HOLDOUT_FRACTION), "holdout")
        .otherwise("train").alias("split"),
        (sample_h < _hex_threshold(SAMPLE_FRACTION)).alias("in_sample"),
    )


def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = rebalance(table(spark, sf_dir, "documents"))
    w = tq.words(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(w).alias("n_tokens"),
        F.size(F.array_distinct(w)).alias("n_unique_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_RE), 0)).alias("n_bpe_tokens"),
        F.round(tq.mean_word_len(F.col("text")), 4).alias("avg_token_len"),
        F.length("text").alias("n_chars_actual"),
    )


def tokenizer_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOKENIZER FERTILITY by language -- the multilingual-budgeting
    statistic (how many tokenizer tokens one natural word costs, and
    how many characters one token carries). A tokenizer trained on
    English typically shows fertility near 1 on en and well above it
    on other scripts, which is exactly what decides per-language
    token budgets, cost models, and context-window planning for a
    multilingual corpus. Counter is the pinned BPE-ish pre-tokenizer
    (textstats.BPE_RE, the same lower-bound contract
    chunk_token_budget_bpe documents).

    Exactness: per-doc counts are exact integers summed per lang;
    each emitted ratio is ONE division of exact BIGINTs, rounded
    once. NULL texts count as documents of zero tokens (SQL sum
    skips their NULL sizes identically on both engines). Scale
    shape: map-only per-doc counters, ONE partial-aggregated groupBy
    to |langs| rows."""
    docs = rebalance(table(spark, sf_dir, "documents"))
    per = docs.select(
        "lang",
        F.size(tq.words(F.col("text"))).cast("long").alias("nw"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_RE), 0))
        .cast("long").alias("nb"),
        F.length("text").cast("long").alias("nc"),
    )
    return (
        per.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("nw").alias("n_words"),
            F.sum("nb").alias("n_bpe_tokens"),
            F.sum("nc").alias("n_chars"),
        )
        .select(
            "lang", "n_docs", "n_words", "n_bpe_tokens", "n_chars",
            F.round(
                F.col("n_bpe_tokens").cast("double")
                / F.nullif(F.col("n_words"), F.lit(0)).cast("double"),
                4,
            ).alias("fertility_4dp"),
            F.round(
                F.col("n_chars").cast("double")
                / F.nullif(F.col("n_bpe_tokens"), F.lit(0)).cast("double"),
                4,
            ).alias("chars_per_token_4dp"),
        )
    )


def text_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = rebalance(table(spark, sf_dir, "documents"))
    t = F.col("text")
    return docs.select(
        "doc_id",
        F.round(tq.nonalpha_ratio(t), 4).alias("nonalpha_ratio"),
        F.round(tq.printable_ascii_ratio(t), 4).alias("ascii_ratio"),
        F.round(tq.latin_script_ratio(t), 4).alias("latin_ratio"),
        F.round(tq.unique_word_ratio(t), 4).alias("uniq_word_ratio"),
        F.round(tq.mean_word_len(t), 4).alias("mean_word_len"),
        tq.is_gibberish(t).cast("int").alias("is_gibberish"),
        tq.is_low_quality(t).cast("int").alias("is_low_quality"),
        tq.is_repetitive(t).cast("int").alias("is_repetitive"),
        tq.has_abnormal_word_lengths(t).cast("int").alias("abnormal_words"),
        tq.is_visibly_corrupt(t).cast("int").alias("is_corrupt"),
        tq.is_invalid_text(t).cast("int").alias("is_invalid"),
        tq.is_bad_ocr(t).cast("int").alias("is_bad"),
        tq.quality_score_4dp(t).alias("quality_score"),
    )


def corpus_quality_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-SOURCE quality dashboard a curation run reads before
    choosing mixture weights / exclusions: document counts, flag rates,
    and mean quality score per origin feed. Pure map expressions
    followed by one low-cardinality aggregate (map-side combined) --
    the per-key load per source is partial-aggregable, so source skew
    does not concentrate work."""
    docs = rebalance(table(spark, sf_dir, "documents"))
    t = F.col("text")
    per_doc = docs.select(
        "source",
        tq.is_bad_ocr(t).cast("int").alias("bad"),
        tq.is_gibberish(t).cast("int").alias("gib"),
        tq.is_repetitive(t).cast("int").alias("rep"),
        tq.quality_score(t).alias("qs"),
        F.size(tq.words(t)).alias("n_words"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("bad").alias("n_bad"),
        F.round(F.avg("bad"), 4).alias("bad_rate"),
        F.round(F.avg("gib"), 4).alias("gibberish_rate"),
        F.round(F.avg("rep"), 4).alias("repetitive_rate"),
        F.round(F.avg("qs"), 4).alias("avg_quality"),
        F.sum("n_words").alias("total_words"),
    )


def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language heuristic with a fixed priority order
    (deterministic tiebreak en > de > fr > es)."""
    docs = rebalance(table(spark, sf_dir, "documents"))
    w = tq.words(F.col("text"))
    hits = {
        lang: F.size(F.array_intersect(w, F.array(*[F.lit(s) for s in sw])))
        for lang, sw in STOPWORDS.items()
    }
    pred = (
        F.when(
            (hits["en"] >= hits["de"]) & (hits["en"] >= hits["fr"])
            & (hits["en"] >= hits["es"]) & (hits["en"] > 0), "en")
        .when((hits["de"] >= hits["fr"]) & (hits["de"] >= hits["es"])
              & (hits["de"] > 0), "de")
        .when((hits["fr"] >= hits["es"]) & (hits["fr"] > 0), "fr")
        .when(hits["es"] > 0, "es")
        .otherwise("und")
    )
    return docs.select(
        "doc_id",
        "lang",
        hits["en"].alias("en_hits"),
        hits["de"].alias("de_hits"),
        hits["fr"].alias("fr_hits"),
        hits["es"].alias("es_hits"),
        pred.alias("pred_lang"),
    )


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: min-hash over 5-word shingles (rolling
    content signature) + whole-document md5."""
    docs = rebalance(table(spark, sf_dir, "documents"))
    # NULL text fingerprints as the empty document on BOTH sides
    # (concat_ws silently skips nulls, which would md5('') here while
    # the oracle's md5(NULL) propagated NULL)
    text0 = F.coalesce(F.col("text"), F.lit(""))
    shingles = tq.let(
        tq.words(text0),
        lambda w: F.when(
            F.size(w) >= 5,
            F.transform(
                F.sequence(F.lit(1), F.size(w) - 4),
                lambda i: F.concat_ws(" ", F.slice(w, i, 5)),
            ),
        ).otherwise(F.array(F.concat_ws(" ", w))),
    )
    return docs.select(
        "doc_id",
        F.array_min(F.transform(shingles, F.md5)).alias("fp_shingle_min"),
        F.md5(text0).alias("fp_doc"),
        F.size(shingles).alias("n_shingles"),
    )


WIN_K = 4  # words per winnowing k-gram
WIN_W = 5  # winnow window: any shared run of >= W+K-1 words is caught


import re as _re

# The tokenization convention is the EXPLICIT class [ \t\n\x0B\f\r]+
# on every side (closed in round 5): Java \s and Python ASCII \s both
# equal that class, but RE2's \s EXCLUDES vertical tab, so the DuckDB
# oracles previously diverged on \x0B-bearing text. All engine and
# oracle splits now pin the class literally (tq.words, _W_SQL twins),
# and the null-robustness corpus carries a \x0B row to keep it honest.
# Python's re.ASCII \s == [ \t\n\x0B\f\r] -- aligned by construction.
_ASCII_WS = _re.compile(r"\s+", _re.ASCII)


def winnow_words(text: str) -> list[str]:
    """The tq.words tokenization (ASCII-whitespace split, empties
    dropped) in python -- MUST stay aligned with ``tq.words`` and the
    oracle's ``string_split_regex`` or fingerprints drift."""
    return [t for t in _ASCII_WS.split(text or "") if t]


def winnow_fps_py(ws: list[str]) -> tuple[int, list[int]]:
    """Pure-python winnowing kernel: (n_grams, sorted distinct
    fingerprints) for a word list. Broadcast to executors by the Arrow
    operator below; also the unit under the guarantee property test.
    The 32-bit gram hash is the first 8 hex chars of md5 so the DuckDB
    twin is bit-identical."""
    import hashlib

    if len(ws) < WIN_K:
        return 0, []
    gh = [
        int(hashlib.md5(" ".join(ws[i:i + WIN_K]).encode()).hexdigest()[:8],
            16)
        for i in range(len(ws) - WIN_K + 1)
    ]
    if len(gh) < WIN_W:
        return len(gh), [min(gh)]
    import numpy as np

    sw = np.lib.stride_tricks.sliding_window_view(
        np.asarray(gh, dtype="int64"), WIN_W
    ).min(axis=1)
    return len(gh), np.unique(sw).tolist()


def text_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD
    2003): hash every ``WIN_K``-word gram, slide a ``WIN_W``-hash
    window, record each window's minimum -- the fingerprint set
    GUARANTEES any shared run of >= WIN_W + WIN_K - 1 words between
    two documents contributes a common fingerprint, the detection
    bound plain min-hash (:func:`text_fingerprint`) cannot give.
    Emits per doc the gram/fingerprint counts, the smallest
    fingerprint, and the md5 of the sorted fingerprint set (the
    compare key a plagiarism/overlap index stores).

    Scale shape: one Arrow ``mapInPandas`` pass, zero shuffle below
    the scan spread. NOT higher-order column functions: interpreted
    HOF lambdas re-evaluate their free-variable subtrees per element
    (no CSE outside codegen), which turned the per-window gram-array
    reference into O(n_grams^2) md5 calls per document -- the Arrow
    kernel computes each gram hash once (22.9s -> sub-second at
    sf0.1). The md5-prefix hash semantics are unchanged, so the
    DuckDB twin still matches bit-for-bit."""
    import pandas as pd

    docs = rebalance(table(spark, sf_dir, "documents"))

    def run(batches):
        import hashlib

        for pdf in batches:
            out = {"doc_id": [], "n_grams": [], "n_fingerprints": [],
                   "fp_min": [], "fp_set_md5": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                ws = winnow_words(text)
                n_grams, fps = winnow_fps_py(ws)
                out["doc_id"].append(doc_id)
                out["n_grams"].append(n_grams)
                out["n_fingerprints"].append(len(fps))
                out["fp_min"].append(fps[0] if fps else None)
                out["fp_set_md5"].append(
                    hashlib.md5(
                        ",".join(str(x) for x in fps).encode()
                    ).hexdigest()
                )
            yield pd.DataFrame(out)

    return docs.select("doc_id", "text").mapInPandas(
        run,
        "doc_id long, n_grams int, n_fingerprints int, fp_min long, "
        "fp_set_md5 string",
    )


TOP_TERMS_PER_SOURCE = 5


def top_terms_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain heavy hitters: the ``TOP_TERMS_PER_SOURCE`` most
    frequent words within every source -- the per-domain twin of
    :func:`vocab_top_coverage` a mixture recipe reads to spot
    domain-specific vocabulary drift.

    Scale shape: one (source, word) aggregate with map-side combine,
    then the top-k window partitions by source (many small partitions,
    never a global sort)."""
    docs = rebalance(table(spark, sf_dir, "documents"))
    from pyspark.sql import Window

    counts = (
        docs.select("source", F.explode(tq.words(F.col("text"))).alias("word"))
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).alias("n_tokens"))
    )
    w = Window.partitionBy("source").orderBy(
        F.desc("n_tokens"), F.asc("word")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_TERMS_PER_SOURCE)
        .select("source", F.col("rank").cast("int").alias("rank"),
                "word", "n_tokens")
    )


def embedding_health_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-column health: per label, the count, dimension, mean/min
    L2 norm, and zero-vector count -- the sanity dashboard an index
    build job checks before training quantizers (a batch of zero or
    denormalized vectors silently poisons cosine scores). Map-side
    norm via a higher-order aggregate; one small label aggregate."""
    emb = table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    return (
        emb.select("label", F.size(v).alias("dim"), norm.alias("norm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.max("dim").cast("int").alias("dim"),
            F.round(F.avg("norm"), 6).alias("mean_norm"),
            F.round(F.min("norm"), 6).alias("min_norm"),
            # coalesce: an all-NULL label group sums nothing -> NULL,
            # while the oracle's CASE..ELSE 0 sums zeros
            F.coalesce(
                F.sum((F.col("norm") == 0.0).cast("int")), F.lit(0)
            ).cast("int").alias("n_zero"),
            # rows the vector paths exclude (failed embeds): the
            # observable that explains index_count < corpus_count
            F.sum(F.col("norm").isNull().cast("int")).cast("int")
            .alias("n_null"),
        )
    )


def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding space, exploded to (label,
    dim, mean) rows -- the k-means-free cluster summary an IVF build
    seeds from and a drift monitor diffs across snapshots. One
    posexplode (map-side) and one map-combined (label, dim) average;
    row volume is N x dim but every row is 24 bytes and the aggregate
    combines before the shuffle."""
    emb = table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    d = emb.select("label", F.posexplode(v).alias("dim", "x"))
    return (
        d.groupBy("label", F.col("dim").cast("int").alias("dim"))
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.avg("x"), 6).alias("mean"),
        )
    )


def content_addressed_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T7/T8: content-addressed ids + passage-prefix enrichment
    (md5 oracle-parity variant; mmh3 reference-parity ids live in
    functions.hashing and are unit-tested against public vectors)."""
    docs = table(spark, sf_dir, "documents")
    # a NULL document content-addresses as the empty document: ids and
    # passage stay DEFINED (dedup and upsert keys must never be NULL),
    # identically on both sides -- without the coalesce, concat_ws
    # inside the uuid builder silently skipped the null md5 and
    # emitted '' where the oracle's || propagation emitted NULL
    text0 = F.coalesce(F.col("text"), F.lit(""))
    cid = content_doc_id_col(text0)
    chunk_id = F.concat(cid, F.lit("_"), F.substring(F.md5(text0), 25, 8))
    return docs.select(
        "doc_id",
        cid.alias("content_id"),
        chunk_id.alias("chunk_id"),
        passage_prefix_col(cid, text0).alias("passage"),
        # K1 vector-store point id: deterministic UUID of the chunk id
        # (reference converts string ids with uuid5, database.py:260-268;
        # this oracle-checkable column is the md5 variant, exact uuid5
        # parity is golden-tested in functions.hashing)
        uuid_md5_col(chunk_id).alias("point_uuid"),
    )


def text_slugify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slug generation with a content-hash suffix (reference: unicode-
    fold slugify + blake2b suffix, ``gatekeeper_logic.py:60-67``; md5
    stands in for blake2b -- both sides of the oracle agree)."""
    docs = table(spark, sf_dir, "documents")
    base = F.btrim(
        F.regexp_replace(F.lower(F.substring("text", 1, 48)), "[^a-z0-9]+", "-"),
        F.lit("-"),
    )
    return docs.select(
        "doc_id",
        F.concat(base, F.lit("-"), F.substring(F.md5("text"), 1, 8)).alias("slug"),
    )


def text_nfc_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization (T13 family): composed and decomposed
    forms of the same visible text hash and dedup DIFFERENTLY
    (``'caf\\u00e9' != 'cafe\\u0301'``), so a crawl-scale pipeline
    normalizes before content-addressing. Arrow-batched
    ``unicodedata.normalize`` on the Spark side, ``nfc_normalize`` in
    the DuckDB oracle -- both implement the Unicode standard, and
    parity is asserted on composed/decomposed/compatibility corpus
    rows in the null-robustness suite (NFC is the dedup-safe form;
    NFKC's compatibility folding is lossy and deliberately NOT
    applied).

    Scale shape: map-only over Arrow batches, scan pruned to
    (doc_id, text); the changed flag lets a pipeline route only
    denormalized documents through a rewrite."""
    import unicodedata

    from pyspark.sql.functions import pandas_udf

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")

    # annotation-free lambda: the module uses postponed annotations and
    # pandas is function-local, so hinted signatures don't resolve here
    nfc = pandas_udf(
        lambda s: s.map(
            lambda t: unicodedata.normalize("NFC", t)
            if t is not None else None
        ),
        "string",
    )

    out = docs.withColumn("nfc_text", nfc("text"))
    return out.select(
        "doc_id",
        "nfc_text",
        F.coalesce(F.col("nfc_text") != F.col("text"), F.lit(False))
        .alias("changed"),
        F.coalesce(F.length("nfc_text"), F.lit(0)).cast("int")
        .alias("n_chars_nfc"),
    )


VOCAB_TOP = 1000


def vocab_top_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-prep vocabulary report: the corpus's ``VOCAB_TOP``
    most frequent words with rank, token share, and cumulative
    coverage -- the table a tokenizer build (BPE / unigram-LM) reads
    to pick its vocabulary size (coverage@V).

    Scale shape: ONE word-count aggregate with map-side combine is the
    only corpus-sized step; the ordered top-V cut compiles to
    TakeOrderedAndProject (per-partition heaps, no global sort of the
    vocab relation), and the rank/cumulative windows then run on the
    V surviving rows only (a deliberate, bounded single-partition
    window -- V is a constant, not data-sized). Shares are against the
    FULL corpus token count, computed before the cut and broadcast."""
    from pyspark.sql import Window

    docs = rebalance(table(spark, sf_dir, "documents"))
    words = docs.select(F.explode(tq.words(F.col("text"))).alias("word"))
    counts = words.groupBy("word").agg(
        F.count(F.lit(1)).alias("n_tokens")
    )
    total = counts.agg(F.sum("n_tokens").alias("total"))
    top = counts.orderBy(F.desc("n_tokens"), F.asc("word")).limit(VOCAB_TOP)
    w = Window.orderBy(F.desc("n_tokens"), F.asc("word"))
    cum = Window.orderBy(F.desc("n_tokens"), F.asc("word")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return top.crossJoin(F.broadcast(total)).select(
        "word",
        F.row_number().over(w).cast("int").alias("rank"),
        "n_tokens",
        F.round(F.col("n_tokens") / F.col("total"), 6).alias("share"),
        F.round(F.sum("n_tokens").over(cum) / F.col("total"), 6)
        .alias("cum_coverage"),
    )


CMS_D = 4     # count-min hash rows
CMS_W = 256   # buckets per row (sketch = D x W cells, fixed size)
CMS_TOP = 20  # heavy hitters reported against the sketch


def sketch_countmin_heavyhitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over the corpus token stream, read back at the
    exact heavy hitters: every term's estimate is ``min_j cell(j,
    h_j(term))`` and the emission carries the exact count next to the
    estimate with the sketch's signed error (``overcount >= 0`` is the
    CMS guarantee -- cells only ever over-count). The term hashes are
    ``md5(j || ':' || term)`` prefixes, identical in both engines, so
    the whole sketch is deterministic and fully oracle-checkable.

    Why a sketch at 100 TB: the exact vocab aggregate is vocab-sized
    (fine for words, unbounded for URLs/n-grams/ids); the CMS is a
    FIXED ``CMS_D x CMS_W`` integer grid that merges across shards and
    days by cell-wise addition -- the streaming/multi-tenant face of
    frequency tracking. Scale shape: one token-count aggregate with
    map-side combine feeds both the cells (a <= D*W-row broadcast) and
    the TakeOrderedAndProject top cut; the rank window runs on
    ``CMS_TOP`` constant rows."""
    from pyspark.sql import Window

    docs = rebalance(table(spark, sf_dir, "documents"))
    # the vocab aggregate feeds THREE plan branches (cells via hashed,
    # the top cut, and the estimate join): without a cut point the
    # corpus tokenize+explode+aggregate executes once per branch
    # (fresh-JVM isolate: 3 corpus passes; r13 guide §2.4). The lazy
    # localCheckpoint bounds it to one; everything downstream is
    # vocab- or sketch-sized.
    counts = (
        docs.select(F.explode(tq.words(F.col("text"))).alias("term"))
        .groupBy("term").agg(F.count(F.lit(1)).alias("exact_count"))
        .localCheckpoint(eager=False)
    )
    hash_structs = F.array(*[
        F.struct(
            F.lit(j).alias("j"),
            (F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{j}:"), F.col("term"))), 1, 8),
                16, 10,
            ).cast("long") % CMS_W).cast("int").alias("bucket"),
        )
        for j in range(CMS_D)
    ])
    hashed = counts.select(
        "term", "exact_count", F.explode(hash_structs).alias("h")
    ).select("term", "exact_count",
             F.col("h.j").alias("j"), F.col("h.bucket").alias("bucket"))
    cells = hashed.groupBy("j", "bucket").agg(
        F.sum("exact_count").alias("cell"))
    top = counts.orderBy(
        F.desc("exact_count"), F.asc("term")).limit(CMS_TOP)
    est = (
        hashed.join(top.select("term"), "term")
        .join(F.broadcast(cells), ["j", "bucket"])
        .groupBy("term", "exact_count")
        .agg(F.min("cell").alias("cms_estimate"))
    )
    w = Window.orderBy(F.desc("exact_count"), F.asc("term"))
    return est.select(
        F.row_number().over(w).cast("int").alias("rank"),
        "term", "exact_count", "cms_estimate",
        (F.col("cms_estimate") - F.col("exact_count")).alias("overcount"),
    )


PAIR_TOP = 50


def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-prep, pair level: the FIRST BPE merge round's adjacent
    symbol-pair frequencies at corpus scale -- the distributed half of
    ``functions/bpe.py``'s driver-side trainer (which runs this same
    statistic per round on its in-memory vocab). At 100 TB a tokenizer
    build re-runs this query per merge on the re-segmented word table;
    round one over raw characters is the expensive, corpus-shaped one.

    Scale shape: the corpus-sized step is ONE word-frequency hash
    aggregate (map-side combine); pair explosion then runs on the
    DISTINCT word table (vocabulary-sized, not corpus-sized) weighted
    by frequency, and the top cut is TakeOrderedAndProject. The char
    array is let-bound so the interpreted pair lambda does not
    re-evaluate the regexp per element."""
    docs = rebalance(table(spark, sf_dir, "documents"))
    words = docs.select(
        F.explode(F.regexp_extract_all("text", F.lit(BPE_RE), 0)).alias("w")
    )
    wf = words.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    pairs = tq.let(
        F.concat(
            F.regexp_extract_all("w", F.lit("."), 0),
            F.array(F.lit("</w>")),
        ),
        lambda c: F.transform(
            F.sequence(F.lit(1), F.size(c) - 1),
            lambda i: F.struct(
                F.element_at(c, i).alias("a"),
                F.element_at(c, i + F.lit(1)).alias("b"),
            ),
        ),
    )
    return (
        wf.select("freq", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").alias("pair_count"))
        .orderBy(F.desc("pair_count"), F.asc("a"), F.asc("b"))
        .limit(PAIR_TOP)
    )


# ---- sentence segmentation -------------------------------------------------

# terminal punctuation followed by whitespace ends a sentence; the
# whitespace class is the pinned explicit ASCII set (never \s -- Java
# and RE2 disagree on \x0B) and the marker is \x01, which the corpus
# contract excludes from document text (control chars below \x20 are
# stripped at ingest; documented alongside the chunkers' same rule)
_SENT_RE = r"([.!?])[ \t\n\x0B\f\r]+"
_SENT_MARK = "\x01"


def split_sentences(docs: DataFrame) -> DataFrame:
    """Sentence segmentation: terminal punctuation (``. ! ?``)
    followed by whitespace closes a sentence (the trailing whitespace
    is consumed); the final fragment is kept even without terminal
    punctuation. Emits (doc_id, sent_idx, sentence, n_chars,
    n_words) -- the unit every sentence-level pipeline stage
    (boilerplate dedup, per-sentence LM scoring, citation spans)
    consumes.

    Both engines mark split points with a global regex replace and
    split on the marker, so the segmentation is a single vectorized
    regex pass -- no per-row Python, no lookbehind (RE2 has none).
    NULL and empty documents yield no rows (nothing to segment)."""
    parts = F.filter(
        F.split(
            F.regexp_replace(F.col("text"), _SENT_RE, "$1" + _SENT_MARK),
            _SENT_MARK,
        ),
        lambda x: x != F.lit(""),
    )
    return (
        docs.select("doc_id", F.posexplode(parts).alias("sent_idx", "sentence"))
        .select(
            "doc_id",
            F.col("sent_idx").cast("int").alias("sent_idx"),
            "sentence",
            F.length("sentence").cast("int").alias("n_chars"),
            F.size(tq.words(F.col("sentence"))).cast("int").alias("n_words"),
        )
    )


def text_sentence_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    return split_sentences(
        rebalance(table(spark, sf_dir, "documents")).select("doc_id", "text")
    )


def _sentence_oracle_sql() -> str:
    ws = "[ \\t\\n\\x0B\\f\\r]"
    return f"""
        WITH marked AS (
            SELECT doc_id,
                   list_filter(string_split(
                       regexp_replace(text, '([.!?]){ws}+',
                                      '\\1' || chr(1), 'g'),
                       chr(1)), x -> x <> '') AS parts
            FROM documents WHERE text IS NOT NULL
        )
        SELECT doc_id,
               CAST(u.p.i - 1 AS INTEGER) AS sent_idx,
               u.p.s AS sentence,
               CAST(length(u.p.s) AS INTEGER) AS n_chars,
               CAST(len(list_filter(string_split_regex(trim(u.p.s),
                   '{ws}+'), x -> x <> '')) AS INTEGER) AS n_words
        FROM (SELECT doc_id, list_transform(parts,
                  (s, i) -> struct_pack(i := i, s := s)) AS ps
              FROM marked),
             unnest(ps) AS u(p)
    """


# ---- readability ----------------------------------------------------------

# vowel-group syllable heuristic: syllables(word) = number of
# [aeiouy]+ runs in the letters-only lowercased word, minus one for a
# terminal silent 'e' (only when another vowel group exists, and not
# for '-le' endings, where the e IS the syllable: ta-ble), floored
# at 1 -- the classic dictionary-free approximation every readability
# library ships as its fallback. Deterministic, regex-only, identical
# in Java regex and DuckDB RE2 (the class has no engine-divergent
# metacharacters).


def _syllables(w):
    clean = tq.let(
        F.regexp_replace(F.lower(w), "[^a-z]", ""),
        lambda c: F.struct(
            F.size(F.regexp_extract_all(c, F.lit("[aeiouy]+"), F.lit(0)))
            .alias("g"),
            (c.endswith("e") & ~c.endswith("le")).alias("e"),
        ),
    )
    return F.greatest(
        F.lit(1),
        clean["g"] - ((clean["g"] > 1) & clean["e"]).cast("int"),
    )


def readability_report(docs: DataFrame) -> DataFrame:
    """Per-document READABILITY scoring: Flesch reading ease and
    Flesch-Kincaid grade from exact integer sentence / word / syllable
    counts (Flesch 1948; Kincaid et al. 1975) -- the quality-filter
    signal a pretraining curation stack reads next to the Gopher
    heuristics (a corpus slice whose grade collapses to 2 is listings
    and boilerplate; one above 20 is OCR noise). Sentences follow
    :func:`split_sentences`'s exact segmentation; words the pinned
    whitespace class; syllables the vowel-group heuristic above.

    Both scores are pure arithmetic over the three integer counts --
    every float op is a correctly-rounded IEEE division / multiply /
    subtract on identical operands in identical order, so the doubles
    are bit-identical across engines with NO rounding step
    (docs/ROUNDING.md rule 3); degenerate docs (no words or no
    sentences) emit NULL scores rather than a division crash.

    Scale shape: map-only -- one vectorized regex pass for sentences,
    one split for words, one lambda-local regex per word for
    syllables; no shuffle at all (the per-doc row is produced where
    the doc is read)."""
    text = F.coalesce(F.col("text"), F.lit(""))
    sents = F.filter(
        F.split(
            F.regexp_replace(text, _SENT_RE, "$1" + _SENT_MARK), _SENT_MARK
        ),
        lambda x: x != F.lit(""),
    )
    counted = docs.select(
        "doc_id",
        F.size(sents).cast("int").alias("n_sents"),
        tq.let(
            tq.words(text),
            lambda ws: F.struct(
                F.size(ws).alias("w"),
                F.aggregate(
                    F.transform(ws, _syllables),
                    F.lit(0),
                    lambda acc, s: acc + s,
                ).alias("sy"),
            ),
        ).alias("c"),
    ).select(
        "doc_id", "n_sents",
        F.col("c.w").cast("int").alias("n_words"),
        F.col("c.sy").cast("int").alias("n_syllables"),
    )
    wps = F.col("n_words").cast("double") / F.expr("nullif(n_sents, 0)")
    spw = F.col("n_syllables").cast("double") / F.expr("nullif(n_words, 0)")
    return counted.select(
        "doc_id", "n_sents", "n_words", "n_syllables",
        (F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw)
        .alias("flesch"),
        (F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59))
        .alias("fk_grade"),
    )


def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    return readability_report(
        rebalance(table(spark, sf_dir, "documents"))
        .select("doc_id", "text")
    )


def _readability_oracle_sql() -> str:
    ws = "[ \\t\\n\\x0B\\f\\r]"
    syl = (
        "greatest(1, len(regexp_extract_all(c, '[aeiouy]+')) - "
        "CASE WHEN len(regexp_extract_all(c, '[aeiouy]+')) > 1 "
        "AND c LIKE '%e' AND c NOT LIKE '%le' THEN 1 ELSE 0 END)"
    )
    return f"""
        WITH counted AS (
            SELECT doc_id,
                   CAST(len(list_filter(string_split(
                       regexp_replace(coalesce(text, ''),
                                      '([.!?]){ws}+', '\\1' || chr(1), 'g'),
                       chr(1)), x -> x <> '')) AS INTEGER) AS n_sents,
                   CAST(len(list_filter(string_split_regex(
                       trim(coalesce(text, '')), '{ws}+'),
                       x -> x <> '')) AS INTEGER) AS n_words,
                   CAST(coalesce(list_sum(list_transform(
                       list_transform(
                           list_filter(string_split_regex(
                               trim(coalesce(text, '')), '{ws}+'),
                               x -> x <> ''),
                           x -> regexp_replace(lower(x), '[^a-z]', '', 'g')),
                       c -> {syl})), 0) AS INTEGER) AS n_syllables
            FROM documents
        )
        SELECT doc_id, n_sents, n_words, n_syllables,
               206.835
                   - 1.015 * (CAST(n_words AS DOUBLE)
                              / nullif(n_sents, 0))
                   - 84.6 * (CAST(n_syllables AS DOUBLE)
                             / nullif(n_words, 0)) AS flesch,
               0.39 * (CAST(n_words AS DOUBLE) / nullif(n_sents, 0))
                   + 11.8 * (CAST(n_syllables AS DOUBLE)
                             / nullif(n_words, 0))
                   - 15.59 AS fk_grade
        FROM counted
    """


ENT_SCALE = tq.LN_UNIT_SCALE  # entropy carried in 1e-6 nat units


def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHARACTER-BIGRAM ENTROPY per document -- the information-
    density quality signal (compression-style): keyboard mash and
    repeated boilerplate score low, natural prose high; the
    dictionary-free cousin of the gibberish predicate that emits a
    GRADED score instead of a flag. ``H = -sum p ln p`` over the
    document's character bigrams, computed as the exact identity
    ``sum c*(ln n - ln c) / n``.

    Exactness: each ln is once-rounded into BIGINT 1e-6 units
    (``tq.lnu``); the weighted sum ``sum c*(lnu(n)-lnu(c))`` is an
    EXACT BIGINT aggregate, and the emitted entropy is ONE division
    by ``n * scale`` -- bit-identical across engines, independent of
    aggregation order. Documents with fewer than two characters have
    no bigrams and report NULL entropy over n=0.

    Scale shape: the bigram explode is map-side; the (doc_id, bigram)
    count partially aggregates (bigrams repeat within a document, so
    the combiner collapses to distinct-bigrams-per-doc before the
    shuffle); one final doc_id aggregation."""
    docs = rebalance(table(spark, sf_dir, "documents"))
    bigrams = tq.let(
        F.expr("regexp_extract_all(coalesce(text, ''), '(?s).', 0)"),
        lambda cs: F.when(
            F.size(cs) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(cs) - 1),
                lambda i: F.concat(F.element_at(cs, i),
                                   F.element_at(cs, i + 1)),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    counts = (
        docs.select("doc_id", F.explode(bigrams).alias("b"))
        .groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per_doc = counts.groupBy("doc_id").agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).cast("int").alias("n_distinct"),
    )
    h = (
        counts.join(per_doc.select("doc_id", "n"), "doc_id")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("c")
                  * (tq.lnu(F.col("n")) - tq.lnu(F.col("c"))))
            .alias("h_u"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .join(h, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("n_distinct", F.lit(0)).cast("int")
            .alias("n_distinct"),
            (F.col("h_u").cast("double")
             / (F.col("n") * ENT_SCALE).cast("double"))
            .alias("entropy"),
        )
    )


def _entropy_oracle_sql() -> str:
    return f"""
        WITH chars AS (
            SELECT doc_id,
                   regexp_extract_all(coalesce(text, ''), '(?s).') AS cs
            FROM documents
        ),
        counts AS (
            SELECT doc_id, b, count(*) AS c FROM (
                SELECT doc_id,
                       unnest(list_transform(range(1, len(cs)),
                           i -> cs[i] || cs[i + 1])) AS b
                FROM chars WHERE len(cs) >= 2
            )
            GROUP BY doc_id, b
        ),
        per_doc AS (
            SELECT doc_id, sum(c) AS n,
                   CAST(count(*) AS INTEGER) AS n_distinct
            FROM counts GROUP BY doc_id
        ),
        h AS (
            SELECT counts.doc_id,
                   sum(c * ({tq.lnu_sql("p.n")} - {tq.lnu_sql("c")}))
                       AS h_u
            FROM counts JOIN per_doc p USING (doc_id)
            GROUP BY counts.doc_id
        )
        SELECT d.doc_id,
               CAST(coalesce(p.n, 0) AS BIGINT) AS n_bigrams,
               coalesce(p.n_distinct, 0) AS n_distinct,
               CAST(h.h_u AS DOUBLE)
                   / CAST(p.n * {ENT_SCALE} AS DOUBLE) AS entropy
        FROM documents d
        LEFT JOIN per_doc p USING (doc_id)
        LEFT JOIN h ON h.doc_id = d.doc_id
    """


KWIC_TERM = "join"  # concordance keyword (a corpus top term)
KWIC_CTX = 3        # words of context each side


def kwic_concordance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEYWORD-IN-CONTEXT concordance: every occurrence of
    ``KWIC_TERM`` with ``KWIC_CTX`` words of context on each side --
    the classic corpus-linguistics view (and the snippet builder
    retrieval UIs render around a hit). Emits (doc_id, pos,
    left_ctx, term, right_ctx), 0-based word position.

    Map-only, POSITIONS-ARRAY-FIRST (round-6 advice): the hit indices
    are computed INSIDE the row -- a let-bound filter of the
    1..len(ws) index sequence -- and only those indices explode, so
    the per-word carry of the full ``ws`` array is structurally
    impossible (the earlier posexplode form was O(hits x len) only
    because codegen pushed the term filter under the Generate; a plan
    change could have silently made it O(len^2)). Output stays
    proportional to HITS at any corpus size; no shuffle at all."""
    docs = rebalance(table(spark, sf_dir, "documents"))
    withw = docs.select(
        "doc_id",
        tq.words(F.coalesce(F.col("text"), F.lit(""))).alias("ws"),
    )
    # let-bind ws inside the index filter: even if Catalyst collapses
    # the projections and inlines the split expression, the binding
    # keeps it one-evaluation-per-row, never per-element
    hit_idx = tq.let(
        F.col("ws"),
        lambda w: F.filter(
            F.when(F.size(w) > 0, F.sequence(F.lit(1), F.size(w)))
            .otherwise(F.array().cast("array<int>")),
            lambda i: F.element_at(w, i) == F.lit(KWIC_TERM),
        ),
    )
    hits = withw.select("doc_id", "ws", F.explode(hit_idx).alias("i"))
    i = F.col("i")
    start = F.greatest(F.lit(1), i - KWIC_CTX)
    return hits.select(
        "doc_id",
        (i - 1).cast("int").alias("pos"),
        F.array_join(F.slice("ws", start, i - start), " ")
        .alias("left_ctx"),
        F.lit(KWIC_TERM).alias("term"),
        F.array_join(
            F.slice("ws", i + 1, F.lit(KWIC_CTX)), " "
        ).alias("right_ctx"),
    )


def _kwic_oracle_sql() -> str:
    ws = "[ \\t\\n\\x0B\\f\\r]"
    return f"""
        WITH t AS (
            SELECT doc_id, list_filter(string_split_regex(
                trim(coalesce(text, '')), '{ws}+'), x -> x <> '') AS ws
            FROM documents
        ),
        hits AS (
            SELECT doc_id, ws, u.p.i AS i
            FROM (
                SELECT doc_id, ws,
                       list_transform(range(1, len(ws) + 1),
                           i -> struct_pack(i := i, w := ws[i])) AS ps
                FROM t
            ), unnest(ps) AS u(p)
            WHERE u.p.w = '{KWIC_TERM}'
        )
        SELECT doc_id,
               CAST(i - 1 AS INTEGER) AS pos,
               coalesce(array_to_string(
                   list_slice(ws, greatest(1, i - {KWIC_CTX}), i - 1),
                   ' '), '') AS left_ctx,
               '{KWIC_TERM}' AS term,
               coalesce(array_to_string(
                   list_slice(ws, i + 1, i + {KWIC_CTX}), ' '), '')
                   AS right_ctx
        FROM hits
    """


CODE_SYMBOLS = r"[{}\[\]();=<>#]"
CODE_KEYWORDS = (
    r"\b(def|class|import|return|function|const|var|void|int|public|"
    r"if|else|for|while|struct|let)\b"
)


NW_TOP_LEFT = 10   # continuation tables for the 10 most frequent words
NW_TOP_NEXT = 3    # top-3 continuations per left word


def ngram_nextword_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BIGRAM CONTINUATION TABLE -- the next-word completion relation
    a corpus-statistics LM serves: for each of the NW_TOP_LEFT most
    frequent corpus words (count DESC, word ASC -- total order), the
    NW_TOP_NEXT most likely next words with exact counts and the
    conditional probability in truncating micro-units
    (``pair_n * 1e6 div left_n``). Integer counts end-to-end; ranks
    are fully-ordered row_numbers.

    Scale shape: bigrams build IN-ROW (a let-bound index transform
    over the word array -- map-only, no positional self-join), then
    ONE (left, right) partial-aggregated shuffle; left totals derive
    from the same pair relation by partial re-aggregation; the top
    lefts resolve as TakeOrdered and broadcast back; the per-left
    top-k window runs over candidate-sized frames."""
    docs = rebalance(table(spark, sf_dir, "documents"))
    ws = tq.words(F.coalesce(F.col("text"), F.lit("")))
    pairs_col = tq.let(
        ws,
        lambda w: F.when(
            F.size(w) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(w) - 1),
                lambda i: F.struct(
                    F.element_at(w, i).alias("left"),
                    F.element_at(w, i + 1).alias("right"),
                ),
            ),
        ).otherwise(F.array().cast(
            "array<struct<left:string,right:string>>")),
    )
    pairs = (
        docs.select(F.explode(pairs_col).alias("p"))
        .select("p.left", "p.right")
        .groupBy("left", "right")
        .agg(F.count(F.lit(1)).cast("long").alias("pair_n"))
    )
    lefts = pairs.groupBy("left").agg(
        F.sum("pair_n").alias("left_n")
    )
    top_lefts = lefts.orderBy(
        F.desc("left_n"), F.asc("left")
    ).limit(NW_TOP_LEFT)
    from pyspark.sql import Window

    w = Window.partitionBy("left").orderBy(
        F.desc("pair_n"), F.asc("right")
    )
    return (
        pairs.join(F.broadcast(top_lefts), "left")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= NW_TOP_NEXT)
        .select(
            "left", "right", "pair_n", "left_n",
            F.col("rank").cast("int").alias("rank"),
            F.expr("(pair_n * 1000000) div left_n").alias("prob_u"),
        )
    )


def _nextword_oracle_sql() -> str:
    return f"""
        WITH w AS (
            SELECT list_filter(string_split_regex(
                trim(coalesce(text, '')), '[ \\t\\n\\x0B\\f\\r]+'),
                x -> x <> '') AS ws
            FROM documents
        ),
        pairs AS (
            SELECT u.p.l AS "left", u.p.r AS "right",
                   CAST(count(*) AS BIGINT) AS pair_n
            FROM (
                SELECT list_transform(range(1, len(ws)),
                    i -> struct_pack(l := ws[i], r := ws[i + 1])) AS ps
                FROM w WHERE len(ws) >= 2
            ), unnest(ps) AS u(p)
            GROUP BY u.p.l, u.p.r
        ),
        lefts AS (
            SELECT "left", CAST(sum(pair_n) AS BIGINT) AS left_n
            FROM pairs GROUP BY "left"
        ),
        top_lefts AS (
            SELECT * FROM lefts
            ORDER BY left_n DESC, "left" ASC LIMIT {NW_TOP_LEFT}
        ),
        ranked AS (
            SELECT p."left", p."right", p.pair_n, t.left_n,
                   CAST(row_number() OVER (
                       PARTITION BY p."left"
                       ORDER BY p.pair_n DESC, p."right" ASC
                   ) AS INTEGER) AS rank
            FROM pairs p JOIN top_lefts t ON p."left" = t."left"
        )
        SELECT "left", "right", pair_n, left_n, rank,
               (pair_n * 1000000) // left_n AS prob_u
        FROM ranked WHERE rank <= {NW_TOP_NEXT}
    """


def text_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CODE-VS-PROSE routing classifier: per document, the structural
    signals a pretraining pipeline uses to send text down the code
    branch (different dedup thresholds, different tokenizer budget,
    different quality filters) -- indented-line fraction, code-symbol
    density, and reserved-keyword hits -- plus the combined vote.
    StarCoder-style heuristics over the raw text, no parsing.

    Exactness: every decision threshold is a PURE INTEGER comparison
    (``5*indent_lines >= n_lines`` instead of ``frac >= 0.2``), so the
    flag can never waver on float representation; the emitted
    fractions are single divisions of exact counts, for reporting
    only. Lines split on '\\n' exactly (the repo-wide contract --
    splitlines() would also break on \\x0B/U+2028).

    Scale shape: map-only codegen expressions over a 2-column
    projection; zero shuffles, zero UDFs."""
    docs = rebalance(table(spark, sf_dir, "documents"))
    t = F.coalesce(F.col("text"), F.lit(""))
    lines = F.split(t, "\n", -1)
    indent = F.size(F.filter(
        lines, lambda seg: seg.rlike(r"^(\t|    )")))
    sym = F.length(t) - F.length(F.regexp_replace(t, CODE_SYMBOLS, ""))
    # Column-literal pattern: F.expr would route the regex through the
    # Spark SQL string parser, which eats the \b as a backspace escape
    kw = F.size(F.regexp_extract_all(t, F.lit(CODE_KEYWORDS), F.lit(0)))
    n_lines = F.size(lines)
    n_chars = F.length(t)
    v_ind = (indent * 5 >= n_lines) & (n_lines >= 3)
    v_sym = (sym * 20 >= n_chars) & (n_chars > 0)
    v_kw = kw >= 3
    votes = (v_ind.cast("int") + v_sym.cast("int") + v_kw.cast("int"))
    return docs.select(
        "doc_id",
        n_lines.cast("int").alias("n_lines"),
        indent.cast("int").alias("indent_lines"),
        sym.cast("long").alias("symbol_chars"),
        kw.cast("int").alias("kw_hits"),
        (indent.cast("double") / n_lines.cast("double"))
        .alias("indent_frac"),
        (sym.cast("double")
         / F.nullif(n_chars, F.lit(0)).cast("double")).alias("symbol_frac"),
        votes.cast("int").alias("votes"),
        (votes >= 2).cast("int").alias("is_code"),
    )


def _code_detect_oracle_sql() -> str:
    return f"""
        WITH t AS (
            SELECT doc_id, coalesce(text, '') AS txt,
                   string_split(coalesce(text, ''), chr(10)) AS lines
            FROM documents
        ),
        m AS (
            SELECT doc_id,
                   len(lines) AS n_lines,
                   len(list_filter(lines,
                       l -> regexp_matches(l, '^(\\t|    )'))) AS indent,
                   length(txt) - length(regexp_replace(
                       txt, '{CODE_SYMBOLS}', '', 'g')) AS sym,
                   len(regexp_extract_all(txt, '{CODE_KEYWORDS}'))
                       AS kw,
                   length(txt) AS n_chars
            FROM t
        ),
        v AS (
            SELECT *,
                   CAST(indent * 5 >= n_lines AND n_lines >= 3 AS INTEGER)
                   + CAST(sym * 20 >= n_chars AND n_chars > 0 AS INTEGER)
                   + CAST(kw >= 3 AS INTEGER) AS votes
            FROM m
        )
        SELECT doc_id,
               CAST(n_lines AS INTEGER) AS n_lines,
               CAST(indent AS INTEGER) AS indent_lines,
               CAST(sym AS BIGINT) AS symbol_chars,
               CAST(kw AS INTEGER) AS kw_hits,
               CAST(indent AS DOUBLE) / CAST(n_lines AS DOUBLE)
                   AS indent_frac,
               CAST(sym AS DOUBLE) / CAST(nullif(n_chars, 0) AS DOUBLE)
                   AS symbol_frac,
               CAST(votes AS INTEGER) AS votes,
               CAST(votes >= 2 AS INTEGER) AS is_code
        FROM v
    """


def lang_confusion_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONFUSION MATRIX of the stopword language identifier against
    the corpus's labeled ``lang`` column -- the evaluation report
    every classifier-gated pipeline stage owes its operator (the
    retrieval family has retrieval_metrics_report; this is the
    classification twin). One row per observed (true, predicted)
    cell with the cell count, both marginals, the cell's share of its
    true-language row, and the diagonal flag -- precision/recall per
    language read directly off the marginals.

    The only float is the row share: ONE correctly-rounded division
    of two exact integers. Scale shape: the per-doc prediction is the
    registered map-only lang-id pass; the confusion aggregation is a
    tiny (|langs|^2-bounded) groupBy with two broadcast marginal
    joins."""
    pred = text_lang_id(spark, sf_dir).select("lang", "pred_lang")
    cells = pred.groupBy("lang", "pred_lang").agg(
        F.count(F.lit(1)).alias("n")
    )
    row_tot = cells.groupBy("lang").agg(F.sum("n").alias("true_total"))
    col_tot = cells.groupBy("pred_lang").agg(F.sum("n").alias("pred_total"))
    return (
        cells.join(F.broadcast(row_tot), "lang")
        .join(F.broadcast(col_tot), "pred_lang")
        .select(
            F.col("lang").alias("true_lang"), "pred_lang",
            F.col("n").cast("long").alias("n"),
            F.col("true_total").cast("long").alias("true_total"),
            F.col("pred_total").cast("long").alias("pred_total"),
            (F.col("n").cast("double")
             / F.col("true_total").cast("double")).alias("row_share"),
            (F.col("lang") == F.col("pred_lang")).cast("int")
            .alias("is_correct"),
        )
    )


def _confusion_oracle_sql() -> str:
    return """
        WITH pred AS (
            SELECT lang, pred_lang FROM ({lang_id})
        ),
        cells AS (
            SELECT lang, pred_lang, count(*) AS n
            FROM pred GROUP BY lang, pred_lang
        ),
        row_tot AS (
            SELECT lang, sum(n) AS true_total FROM cells GROUP BY lang
        ),
        col_tot AS (
            SELECT pred_lang, sum(n) AS pred_total
            FROM cells GROUP BY pred_lang
        )
        SELECT c.lang AS true_lang, c.pred_lang,
               CAST(c.n AS BIGINT) AS n,
               CAST(r.true_total AS BIGINT) AS true_total,
               CAST(p.pred_total AS BIGINT) AS pred_total,
               CAST(c.n AS DOUBLE) / CAST(r.true_total AS DOUBLE)
                   AS row_share,
               CASE WHEN c.lang = c.pred_lang THEN 1 ELSE 0 END
                   AS is_correct
        FROM cells c
        JOIN row_tot r ON r.lang = c.lang
        JOIN col_tot p ON p.pred_lang = c.pred_lang
    """


ZIPF_V = 500  # top ranks fitted (the Zipf regime; tail is Mandelbrot)


def zipf_fit_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZIPF-LAW FIT of the corpus unigram distribution: closed-form
    least squares of ln(frequency) on ln(rank) over the top
    ``ZIPF_V`` terms, reported as one (slope, intercept, r2) row. A
    healthy natural-language corpus fits slope ~ -1 with high r2;
    machine-generated or template-heavy corpora bend the curve -- the
    single-number corpus-health probe next to the token statistics
    family.

    Exactness: each ln is once-rounded into BIGINT 1e-6 units
    (``tq.lnu``); all five regression sums (Sx, Sy, Sxx, Sxy, Syy)
    are EXACT integer aggregates (bounded: |x|,|y| <= ~3e7 even at
    1e12-count corpora, so V * x*y <= ~5e17 < 2^63); only the final
    slope/intercept/r2 combine the exact sums in double -- identical
    operand order on both engines, so the doubles are bit-identical
    (docs/ROUNDING.md rules 1-3).

    Scale shape: term counts partially aggregate map-side; the
    top-V cut is a distributed sort-LIMIT (never a global window);
    the regression is one aggregate over V rows."""
    docs = rebalance(table(spark, sf_dir, "documents"))
    counts = (
        docs.select(
            F.explode(tq.words(F.coalesce(F.col("text"), F.lit(""))))
            .alias("term")
        )
        .groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    )
    from pyspark.sql import Window

    top = counts.orderBy(F.desc("c"), F.asc("term")).limit(ZIPF_V)
    wr = Window.orderBy(F.desc("c"), F.asc("term"))
    xy = top.withColumn("rank", F.row_number().over(wr)).select(
        tq.lnu(F.col("rank")).alias("x"),
        tq.lnu(F.col("c")).alias("y"),
    )
    s = xy.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = (F.col("n").cast("double") * F.col("sxy").cast("double")
           - F.col("sx").cast("double") * F.col("sy").cast("double"))
    den = (F.col("n").cast("double") * F.col("sxx").cast("double")
           - F.col("sx").cast("double") * F.col("sx").cast("double"))
    deny = (F.col("n").cast("double") * F.col("syy").cast("double")
            - F.col("sy").cast("double") * F.col("sy").cast("double"))
    return s.select(
        F.col("n").cast("int").alias("n_terms"),
        (num / den).alias("slope"),
        ((F.col("sy").cast("double") - (num / den) * F.col("sx")
          .cast("double"))
         / F.col("n").cast("double") / tq.LN_UNIT_SCALE).alias("intercept"),
        (num * num / (den * deny)).alias("r2"),
    )


def _zipf_oracle_sql() -> str:
    ws = "[ \\t\\n\\x0B\\f\\r]"
    num = ("(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
           " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))")
    den = ("(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
           " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))")
    deny = ("(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
            " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))")
    return f"""
        WITH counts AS (
            SELECT u.term, count(*) AS c
            FROM (
                SELECT list_filter(string_split_regex(
                    trim(coalesce(text, '')), '{ws}+'), x -> x <> '') AS ws
                FROM documents
            ), unnest(ws) AS u(term)
            GROUP BY u.term
        ),
        top AS (
            SELECT c, row_number() OVER (ORDER BY c DESC, term ASC)
                       AS rank
            FROM counts
            ORDER BY c DESC, term ASC LIMIT {ZIPF_V}
        ),
        xy AS (
            SELECT {tq.lnu_sql("rank")} AS x, {tq.lnu_sql("c")} AS y
            FROM top
        ),
        s AS (
            SELECT count(*) AS n,
                   sum(x) AS sx, sum(y) AS sy,
                   sum(x * x) AS sxx, sum(x * y) AS sxy,
                   sum(y * y) AS syy
            FROM xy
        )
        SELECT CAST(n AS INTEGER) AS n_terms,
               {num} / {den} AS slope,
               (CAST(sy AS DOUBLE) - ({num} / {den}) * CAST(sx AS DOUBLE))
                   / CAST(n AS DOUBLE) / {tq.LN_UNIT_SCALE} AS intercept,
               {num} * {num} / ({den} * {deny}) AS r2
        FROM s
    """


# ---- Kneser-Ney smoothed bigram LM ------------------------------------------

KN_D_NUM, KN_D_DEN = 3, 4   # absolute discount D = 0.75 (Chen-Goodman)
KN_TOP = 50                  # emitted rows: global top-k bigrams by P_KN


def kneser_ney_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram probabilities (Chen & Goodman
    1998, the standard n-gram LM smoother; the statistic behind
    KenLM-style corpus quality scoring) -- for every corpus bigram,

        P_KN(w2|w1) = max(c(w1,w2) - D, 0)/c(w1)
                      + D * N1+(w1,.)/c(w1) * N1+(.,w2)/T

    with D = 0.75, N1+ the distinct-continuation counts and T the
    total distinct bigram types; output the global top-``KN_TOP``
    bigrams by P_KN.

    Cross-engine exactness (the norm_dbsf moment discipline): with
    D = 3/4, P_KN = num/den for the EXACT BIGINTs
    num = max(4*c12 - 3, 0)*T + 3*N1fw*N1bw and den = 4*c1*T; both
    engines build identical integers and perform ONE int->double
    division, so even the ranking doubles are bit-identical; the
    probability rounds once at the output.

    Scale shape: one map-side bigram explode feeding a partial-
    aggregated (w1, w2) count; the three marginals (c1/N1fw per w1,
    N1bw per w2, T) are aggregations over the TYPE table (vocabulary-
    sized, not corpus-sized); the final assembly is two equi-joins on
    the type table plus a broadcast one-row T; top-k is a distributed
    TakeOrdered. No Python anywhere."""
    docs = table(spark, sf_dir, "documents")
    bi = docs.select(
        F.explode(
            tq.let(
                tq.words(F.col("text")),
                lambda w: F.when(
                    F.size(w) >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size(w) - 1),
                        lambda i: F.struct(
                            F.element_at(w, i).alias("w1"),
                            F.element_at(w, i + 1).alias("w2"),
                        ),
                    ),
                ).otherwise(
                    F.array().cast("array<struct<w1:string,w2:string>>")
                ),
            )
        ).alias("b")
    ).select("b.w1", "b.w2")
    types = bi.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c12"))
    w1agg = types.groupBy("w1").agg(
        F.sum("c12").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("n1fw"),
    )
    w2agg = types.groupBy("w2").agg(
        F.count(F.lit(1)).cast("long").alias("n1bw"))
    t_total = types.agg(F.count(F.lit(1)).cast("long").alias("t_types"))
    num = (
        F.greatest(F.lit(KN_D_DEN) * F.col("c12") - F.lit(KN_D_NUM),
                   F.lit(0)).cast("long") * F.col("t_types")
        + F.lit(KN_D_NUM) * F.col("n1fw") * F.col("n1bw")
    )
    den = F.lit(KN_D_DEN) * F.col("c1") * F.col("t_types")
    return (
        types.join(w1agg, "w1").join(w2agg, "w2")
        .crossJoin(F.broadcast(t_total))
        .select(
            "w1", "w2", "c12",
            num.cast("long").alias("kn_num"),
            den.cast("long").alias("kn_den"),
        )
        .withColumn(
            "p_kn",
            F.round(F.col("kn_num").cast("double")
                    / F.col("kn_den").cast("double"), 8),
        )
        .orderBy(F.desc(F.col("kn_num").cast("double")
                        / F.col("kn_den").cast("double")),
                 F.asc("w1"), F.asc("w2"))
        .limit(KN_TOP)
    )


def _kneser_ney_oracle_sql() -> str:
    return f"""
        WITH w AS (SELECT doc_id, {_W_SQL} AS w FROM documents),
        bi AS (
            SELECT unnest(list_transform(range(1, len(w)), i ->
                struct_pack(w1 := w[i], w2 := w[i + 1]))) AS b
            FROM w
        ),
        types AS (
            SELECT b.w1 AS w1, b.w2 AS w2,
                   CAST(count(*) AS BIGINT) AS c12
            FROM bi GROUP BY b.w1, b.w2
        ),
        w1agg AS (
            SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
                   CAST(count(*) AS BIGINT) AS n1fw
            FROM types GROUP BY w1
        ),
        w2agg AS (
            SELECT w2, CAST(count(*) AS BIGINT) AS n1bw
            FROM types GROUP BY w2
        ),
        tt AS (SELECT CAST(count(*) AS BIGINT) AS t_types FROM types),
        scored AS (
            SELECT t.w1, t.w2, t.c12,
                   CAST(greatest({KN_D_DEN} * t.c12 - {KN_D_NUM}, 0)
                        * tt.t_types
                        + {KN_D_NUM} * a.n1fw * b.n1bw AS BIGINT) AS kn_num,
                   CAST({KN_D_DEN} * a.c1 * tt.t_types AS BIGINT) AS kn_den
            FROM types t
            JOIN w1agg a ON t.w1 = a.w1
            JOIN w2agg b ON t.w2 = b.w2
            CROSS JOIN tt
        )
        SELECT w1, w2, c12, kn_num, kn_den,
               round(CAST(kn_num AS DOUBLE) / CAST(kn_den AS DOUBLE), 8)
                   AS p_kn
        FROM scored
        ORDER BY CAST(kn_num AS DOUBLE) / CAST(kn_den AS DOUBLE) DESC,
                 w1 ASC, w2 ASC
        LIMIT {KN_TOP}
    """


# ---- dictionary keyword tagging --------------------------------------------

KW_DICT_N = 20      # dictionary size (corpus-derived, deterministic)
KW_MIN_LEN = 6      # only content-bearing terms enter the dictionary


def keyword_tag_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary-driven keyword TAGGING (the batch shape of
    FlashText/Aho-Corasick entity taggers): derive a deterministic
    dictionary -- the ``KW_DICT_N`` highest-document-frequency terms of
    length >= ``KW_MIN_LEN`` (ties by term) -- then emit one
    (doc_id, term, n_occurrences) row per document containing each
    dictionary term as an exact token.

    Scale shape: the tagging side explodes tokens map-side and
    BROADCAST-semi-joins the tiny dictionary BEFORE the (doc, term)
    count, so the shuffle carries only matching tokens (dictionary
    selectivity), never the corpus token stream; the dictionary build
    is one distinct-(doc, term) aggregation + a top-k. At a real
    10^5-entry gazetteer the per-token equi-join still broadcasts (a
    few MB); past broadcast size the same plan shuffle-joins on term.
    A NULL/empty text yields no tokens and so no rows -- identically
    in both engines."""
    docs = table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(tq.words(F.col("text"))).alias("term"))
    df = (
        tok.filter(F.length("term") >= KW_MIN_LEN)
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
    )
    # sort+limit compiles to TakeOrderedAndProject -- a distributed
    # per-partition top-k + driver merge, never a 1-partition window
    # over the whole vocabulary
    dict_df = (
        df.orderBy(F.desc("df"), F.asc("term"))
        .limit(KW_DICT_N)
        .select("term")
    )
    return (
        tok.join(F.broadcast(dict_df), "term")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occurrences"))
    )


def _keyword_tag_oracle_sql() -> str:
    return f"""
        WITH tok AS (
            SELECT doc_id, unnest({_W_SQL}) AS term FROM documents
        ),
        df AS (
            SELECT term, count(DISTINCT doc_id) AS df
            FROM tok WHERE length(term) >= {KW_MIN_LEN}
            GROUP BY term
        ),
        dict AS (
            SELECT term FROM df
            ORDER BY df DESC, term ASC LIMIT {KW_DICT_N}
        )
        SELECT t.doc_id, t.term,
               CAST(count(*) AS BIGINT) AS n_occurrences
        FROM tok t JOIN dict d ON t.term = d.term
        GROUP BY t.doc_id, t.term
    """


QUERIES = {
    "text_sentence_split": text_sentence_split,
    "text_readability": text_readability,
    "zipf_fit_report": zipf_fit_report,
    "lang_confusion_report": lang_confusion_report,
    "text_char_entropy": text_char_entropy,
    "kwic_concordance": kwic_concordance,
    "keyword_tag_docs": keyword_tag_docs,
    "kneser_ney_bigram_topk": kneser_ney_bigram_topk,
    "ngram_nextword_topk": ngram_nextword_topk,
    "text_code_detect": text_code_detect,
    "vocab_top_coverage": vocab_top_coverage,
    "sketch_countmin_heavyhitters": sketch_countmin_heavyhitters,
    "bpe_pair_counts": bpe_pair_counts,
    "corpus_sample_split": corpus_sample_split,
    "text_token_stats": text_token_stats,
    "tokenizer_fertility_by_lang": tokenizer_fertility_by_lang,
    "text_quality_flags": text_quality_flags,
    "corpus_quality_by_source": corpus_quality_by_source,
    "text_lang_id": text_lang_id,
    "text_fingerprint": text_fingerprint,
    "text_winnow_fingerprint": text_winnow_fingerprint,
    "top_terms_by_source": top_terms_by_source,
    "embedding_health_report": embedding_health_report,
    "label_centroids": label_centroids,
    "content_addressed_ids": content_addressed_ids,
    "text_slugify": text_slugify,
    "text_nfc_normalize": text_nfc_normalize,
}

_LANG_SQL = ", ".join(
    f"len(list_intersect(w, {STOPWORDS[lang]!r})) AS {lang}_hits".replace("'", "'")
    for lang in ("en", "de", "fr", "es")
)


ORACLE = {
    "keyword_tag_docs": _keyword_tag_oracle_sql(),
    "kneser_ney_bigram_topk": _kneser_ney_oracle_sql(),
    "sketch_countmin_heavyhitters": f"""
        WITH tok AS (
            SELECT unnest({_W_SQL}) AS term FROM documents
        ),
        counts AS (
            SELECT term, CAST(count(*) AS BIGINT) AS exact_count
            FROM tok GROUP BY term
        ),
        h AS (
            SELECT term, exact_count, jj.j,
                   CAST(CAST('0x' || substr(md5(CAST(jj.j AS VARCHAR)
                       || ':' || term), 1, 8) AS BIGINT) % {CMS_W}
                       AS INTEGER) AS bucket
            FROM counts, (SELECT unnest(range({CMS_D})) AS j) jj
        ),
        cells AS (
            SELECT j, bucket, CAST(sum(exact_count) AS BIGINT) AS cell
            FROM h GROUP BY j, bucket
        ),
        top AS (
            SELECT term FROM counts
            ORDER BY exact_count DESC, term LIMIT {CMS_TOP}
        ),
        est AS (
            SELECT h.term, h.exact_count,
                   CAST(min(c.cell) AS BIGINT) AS cms_estimate
            FROM h JOIN top t ON t.term = h.term
            JOIN cells c ON c.j = h.j AND c.bucket = h.bucket
            GROUP BY h.term, h.exact_count
        )
        SELECT CAST(row_number() OVER (
                   ORDER BY exact_count DESC, term) AS INTEGER) AS rank,
               term, exact_count, cms_estimate,
               cms_estimate - exact_count AS overcount
        FROM est
    """,
    "text_sentence_split": _sentence_oracle_sql(),
    "text_readability": _readability_oracle_sql(),
    "zipf_fit_report": _zipf_oracle_sql(),
    "text_char_entropy": _entropy_oracle_sql(),
    "kwic_concordance": _kwic_oracle_sql(),
    "ngram_nextword_topk": _nextword_oracle_sql(),
    "text_code_detect": _code_detect_oracle_sql(),
    "text_nfc_normalize": """
        SELECT doc_id,
               nfc_normalize(text) AS nfc_text,
               coalesce(nfc_normalize(text) <> text, false) AS changed,
               CAST(coalesce(length(nfc_normalize(text)), 0) AS INTEGER)
                   AS n_chars_nfc
        FROM documents
    """,
    "bpe_pair_counts": f"""
        WITH w AS (
            SELECT unnest(regexp_extract_all(text, '{BPE_RE}')) AS w
            FROM documents
        ),
        wf AS (SELECT w, count(*) AS freq FROM w GROUP BY w),
        sy AS (
            SELECT freq,
                   list_append(regexp_extract_all(w, '.'), '</w>') AS c
            FROM wf
        ),
        p AS (
            SELECT c[i] AS a, c[i + 1] AS b, freq
            FROM sy, unnest(range(1, len(c))) AS t(i)
        )
        SELECT a, b, CAST(sum(freq) AS BIGINT) AS pair_count
        FROM p
        GROUP BY a, b
        ORDER BY pair_count DESC, a, b
        LIMIT {PAIR_TOP}
    """,
    "top_terms_by_source": f"""
        WITH counts AS (
            SELECT source, u.word,
                   CAST(count(*) AS BIGINT) AS n_tokens
            FROM (SELECT source, {_W_SQL} AS w FROM documents) t,
                 unnest(t.w) AS u(word)
            GROUP BY source, u.word
        )
        SELECT source,
               CAST(row_number() OVER (PARTITION BY source
                   ORDER BY n_tokens DESC, word ASC) AS INTEGER) AS rank,
               word, n_tokens
        FROM counts
        QUALIFY rank <= {TOP_TERMS_PER_SOURCE}
    """,
    # indexed-lambda explode (range() cannot be laterally correlated)
    "label_centroids": """
        SELECT label, CAST(u.s.d AS INTEGER) AS dim,
               CAST(count(*) AS BIGINT) AS n_vectors,
               round(avg(u.s.x), 6) AS mean
        FROM (SELECT label,
                     list_transform(CAST(embedding AS DOUBLE[]),
                         (x, i) -> struct_pack(d := i - 1, x := x)) AS vs
              FROM embeddings),
             unnest(vs) AS u(s)
        GROUP BY label, u.s.d
    """,
    "embedding_health_report": """
        WITH e AS (
            SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        n AS (
            SELECT label, len(v) AS dim,
                   sqrt(list_aggregate(list_transform(v, x -> x * x),
                                       'sum')) AS norm
            FROM e
        )
        SELECT label,
               CAST(count(*) AS BIGINT) AS n_vectors,
               CAST(max(dim) AS INTEGER) AS dim,
               round(avg(norm), 6) AS mean_norm,
               round(min(norm), 6) AS min_norm,
               CAST(sum(CASE WHEN norm = 0.0 THEN 1 ELSE 0 END) AS INTEGER)
                   AS n_zero,
               CAST(coalesce(sum(CASE WHEN norm IS NULL THEN 1 ELSE 0 END), 0)
                   AS INTEGER) AS n_null
        FROM n GROUP BY label
    """,
    # NULL-less bit-identical twin: the 32-bit gram hash is a md5
    # prefix on both engines; empty/short docs fall through the same
    # guards (no grams -> empty set -> md5(''))
    "text_winnow_fingerprint": f"""
        WITH t AS (SELECT doc_id,
                          {_W0_SQL} AS w
                   FROM documents),
        g AS (
            SELECT doc_id,
                   CASE WHEN len(w) >= {WIN_K} THEN
                       list_transform(range(1, len(w) - {WIN_K} + 2), i ->
                           CAST('0x' || substr(md5(array_to_string(
                               list_slice(w, i, i + {WIN_K - 1}), ' ')),
                               1, 8) AS BIGINT))
                   ELSE [] END AS gh
            FROM t
        ),
        f AS (
            SELECT doc_id, gh,
                   list_sort(list_distinct(
                       CASE WHEN len(gh) >= {WIN_W} THEN
                           list_transform(range(1, len(gh) - {WIN_W} + 2),
                               i -> list_aggregate(
                                   list_slice(gh, i, i + {WIN_W - 1}), 'min'))
                       WHEN len(gh) > 0 THEN
                           [list_aggregate(gh, 'min')]
                       ELSE [] END)) AS fps
            FROM g
        )
        SELECT doc_id,
               CAST(len(gh) AS INTEGER) AS n_grams,
               CAST(len(fps) AS INTEGER) AS n_fingerprints,
               fps[1] AS fp_min,
               md5(coalesce(array_to_string(fps, ','), '')) AS fp_set_md5
        FROM f
    """,
    "vocab_top_coverage": f"""
        WITH words AS (
            SELECT u.word FROM (SELECT {_W_SQL} AS w FROM documents) t,
                 unnest(t.w) AS u(word)
        ),
        counts AS (
            SELECT word, CAST(count(*) AS BIGINT) AS n_tokens
            FROM words GROUP BY word
        ),
        total AS (SELECT sum(n_tokens) AS total FROM counts),
        top AS (
            SELECT word, n_tokens FROM counts
            ORDER BY n_tokens DESC, word ASC LIMIT {VOCAB_TOP}
        )
        SELECT word,
               CAST(row_number() OVER (ORDER BY n_tokens DESC, word ASC)
                   AS INTEGER) AS rank,
               n_tokens,
               round(n_tokens / total.total, 6) AS share,
               round(sum(n_tokens) OVER (ORDER BY n_tokens DESC, word ASC
                     ROWS UNBOUNDED PRECEDING) / total.total, 6)
                   AS cum_coverage
        FROM top, total
    """,
    "corpus_sample_split": f"""
        SELECT doc_id,
               CASE WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8)
                         < '{_hex_threshold(HOLDOUT_FRACTION)}'
                    THEN 'holdout' ELSE 'train' END AS split,
               substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 8)
                   < '{_hex_threshold(SAMPLE_FRACTION)}' AS in_sample
        FROM documents
    """,
    "text_slugify": """
        SELECT doc_id,
               trim(regexp_replace(lower(substr(text, 1, 48)),
                                   '[^a-z0-9]+', '-', 'g'), '-')
               || '-' || substr(md5(text), 1, 8) AS slug
        FROM documents
    """,
    "tokenizer_fertility_by_lang": f"""
        WITH t AS (
            SELECT lang,
                   CAST(len({_W_SQL}) AS BIGINT) AS nw,
                   CAST(len(regexp_extract_all(text, '{BPE_RE}'))
                        AS BIGINT) AS nb,
                   CAST(length(text) AS BIGINT) AS nc
            FROM documents
        )
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(nw) AS BIGINT) AS n_words,
               CAST(sum(nb) AS BIGINT) AS n_bpe_tokens,
               CAST(sum(nc) AS BIGINT) AS n_chars,
               round(CAST(sum(nb) AS DOUBLE)
                     / nullif(CAST(sum(nw) AS DOUBLE), 0.0), 4)
                   AS fertility_4dp,
               round(CAST(sum(nc) AS DOUBLE)
                     / nullif(CAST(sum(nb) AS DOUBLE), 0.0), 4)
                   AS chars_per_token_4dp
        FROM t GROUP BY 1
    """,
    "text_token_stats": f"""
        WITH t AS (SELECT doc_id, text, {_W_SQL} AS w FROM documents)
        SELECT doc_id,
               CAST(len(w) AS INTEGER) AS n_tokens,
               CAST(len(list_distinct(w)) AS INTEGER) AS n_unique_tokens,
               CAST(len(regexp_extract_all(text, '{BPE_RE}')) AS INTEGER)
                   AS n_bpe_tokens,
               round(CAST(list_aggregate(list_transform(w, x -> length(x)), 'sum')
                     AS DOUBLE) / nullif(CAST(len(w) AS DOUBLE), 0.0), 4)
                   AS avg_token_len,
               CAST(length(text) AS INTEGER) AS n_chars_actual
        FROM t
    """,
    "corpus_quality_by_source": f"""
        WITH t AS (
            SELECT source, text, {_W_SQL} AS w,
                   list_filter(string_split(text, chr(10)), x -> trim(x) <> '') AS lines,
                   length(regexp_replace(text, '[A-Za-z ]', '', 'g'))::DOUBLE
                       / nullif(length(text)::DOUBLE, 0.0) AS nar,
                   length(regexp_replace(text, '[^ -~]', '', 'g'))::DOUBLE
                       / nullif(length(text)::DOUBLE, 0.0) AS par
            FROM documents
        ), s AS (
            SELECT *,
                   len(list_distinct(w))::DOUBLE / nullif(len(w)::DOUBLE, 0.0) AS uwr,
                   len(list_distinct(lines))::DOUBLE / nullif(len(lines)::DOUBLE, 0.0) AS ulr,
                   list_aggregate(list_transform(w, x -> length(x)), 'sum')::DOUBLE
                       / nullif(len(w)::DOUBLE, 0.0) AS mwl,
                   len(list_filter(w, x -> length(x) > 30))::DOUBLE
                       / nullif(len(w)::DOUBLE, 0.0) AS lwr,
                   regexp_matches(text, '[âã¢£™žœÂÃ]') AS corrupt,
                   len(w) < 5 AS lowq
            FROM t
        ), f AS (
            SELECT source,
                   CAST(coalesce(nar > 0.6, false) OR corrupt OR lowq
                        OR coalesce(ulr < 0.3 OR uwr < 0.2, false)
                        OR coalesce(mwl < 2.0 OR mwl > 20.0 OR lwr > 0.1, false)
                        AS INTEGER) AS bad,
                   CAST(coalesce(nar > 0.6, false) AS INTEGER) AS gib,
                   CAST(coalesce(ulr < 0.3 OR uwr < 0.2, false) AS INTEGER) AS rep,
                   greatest(1.0 - 0.3 * coalesce(nar, 1.0)
                            - 0.2 * (1.0 - coalesce(uwr, 0.0))
                            - 0.2 * (CASE WHEN lowq THEN 1.0 ELSE 0.0 END)
                            - 0.3 * (1.0 - coalesce(par, 0.0)), 0.0) AS qs,
                   len(w) AS n_words
            FROM s
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(bad) AS BIGINT) AS n_bad,
               round(avg(bad), 4) AS bad_rate,
               round(avg(gib), 4) AS gibberish_rate,
               round(avg(rep), 4) AS repetitive_rate,
               round(avg(qs), 4) AS avg_quality,
               CAST(sum(n_words) AS BIGINT) AS total_words
        FROM f GROUP BY 1
    """,
    "text_quality_flags": f"""
        WITH t AS (
            SELECT doc_id, text, {_W_SQL} AS w,
                   list_filter(string_split(text, chr(10)), x -> trim(x) <> '') AS lines,
                   length(regexp_replace(text, '[A-Za-z ]', '', 'g'))::DOUBLE
                       / nullif(length(text)::DOUBLE, 0.0) AS nar,
                   length(regexp_replace(text, '[^ -~]', '', 'g'))::DOUBLE
                       / nullif(length(text)::DOUBLE, 0.0) AS par,
                   coalesce(
                       length(regexp_replace(text, '[^\\p{{Latin}}\\p{{M}}]', '', 'g'))::DOUBLE
                           / nullif(length(text)::DOUBLE, 0.0), 0.0) AS lsr,
                   length(regexp_replace(text,
                       '[\\p{{C}}\\p{{Zl}}\\p{{Zp}}\\x{{00A0}}\\x{{1680}}\\x{{2000}}-\\x{{200A}}\\x{{202F}}\\x{{205F}}\\x{{3000}}]',
                       '', 'g'))::DOUBLE
                       / nullif(length(text)::DOUBLE, 0.0) AS upr,
                   CAST(CASE WHEN length(text) > 0 THEN length(text)
                        ELSE 1 END AS HUGEINT) AS qb,
                   CAST(CASE WHEN length(text) > 0 THEN
                        length(regexp_replace(text, '[A-Za-z ]', '', 'g'))
                        ELSE 1 END AS HUGEINT) AS qa,
                   CAST(CASE WHEN length(text) > 0 THEN
                        length(regexp_replace(text, '[^ -~]', '', 'g'))
                        ELSE 0 END AS HUGEINT) AS qe
            FROM documents
        ), s AS (
            SELECT *,
                   len(list_distinct(w))::DOUBLE / nullif(len(w)::DOUBLE, 0.0) AS uwr,
                   len(list_distinct(lines))::DOUBLE / nullif(len(lines)::DOUBLE, 0.0) AS ulr,
                   list_aggregate(list_transform(w, x -> length(x)), 'sum')::DOUBLE
                       / nullif(len(w)::DOUBLE, 0.0) AS mwl,
                   len(list_filter(w, x -> length(x) > 30))::DOUBLE
                       / nullif(len(w)::DOUBLE, 0.0) AS lwr,
                   regexp_matches(text, '[âã¢£™žœÂÃ]') AS corrupt,
                   len(w) < 5 AS lowq,
                   CAST(CASE WHEN len(w) > 0 THEN len(w)
                        ELSE 1 END AS HUGEINT) AS qd,
                   CAST(CASE WHEN len(w) > 0 THEN len(list_distinct(w))
                        ELSE 0 END AS HUGEINT) AS qc,
                   CAST(CASE WHEN coalesce(len(w) < 5, FALSE) THEN 1
                        ELSE 0 END AS HUGEINT) AS ql
            FROM t
        ), q AS (
            SELECT *,
                   greatest(10 * qb * qd * qb - 3 * qa * qd * qb
                            - 2 * (qd - qc) * qb * qb
                            - 2 * ql * qb * qd * qb
                            - 3 * (qb - qe) * qb * qd,
                            CAST(0 AS HUGEINT)) AS qnum,
                   10 * qb * qd * qb AS qden
            FROM s
        )
        SELECT doc_id,
               round(nar, 4) AS nonalpha_ratio,
               round(par, 4) AS ascii_ratio,
               round(lsr, 4) AS latin_ratio,
               round(uwr, 4) AS uniq_word_ratio,
               round(mwl, 4) AS mean_word_len,
               CAST(coalesce(nar > 0.6, false) AS INTEGER) AS is_gibberish,
               CAST(lowq AS INTEGER) AS is_low_quality,
               CAST(coalesce(ulr < 0.3 OR uwr < 0.2, false) AS INTEGER) AS is_repetitive,
               CAST(coalesce(mwl < 2.0 OR mwl > 20.0 OR lwr > 0.1, false) AS INTEGER)
                   AS abnormal_words,
               CAST(corrupt AS INTEGER) AS is_corrupt,
               CAST((length(trim(text)) < 20 OR upr < 0.6 OR lsr < 0.7)
                   AS INTEGER) AS is_invalid,
               CAST(coalesce(nar > 0.6, false) OR corrupt OR lowq
                    OR coalesce(ulr < 0.3 OR uwr < 0.2, false)
                    OR coalesce(mwl < 2.0 OR mwl > 20.0 OR lwr > 0.1, false)
                    AS INTEGER) AS is_bad,
               CAST((2 * qnum * 10000 + qden) // (2 * qden)
                    AS BIGINT) / 10000.0 AS quality_score
        FROM q
    """,
    "text_lang_id": f"""
        WITH t AS (SELECT doc_id, lang, {_W_SQL} AS w FROM documents),
        h AS (SELECT doc_id, lang, {_LANG_SQL} FROM t)
        SELECT doc_id, lang,
               CAST(en_hits AS INTEGER) AS en_hits,
               CAST(de_hits AS INTEGER) AS de_hits,
               CAST(fr_hits AS INTEGER) AS fr_hits,
               CAST(es_hits AS INTEGER) AS es_hits,
               CASE WHEN en_hits >= de_hits AND en_hits >= fr_hits
                         AND en_hits >= es_hits AND en_hits > 0 THEN 'en'
                    WHEN de_hits >= fr_hits AND de_hits >= es_hits
                         AND de_hits > 0 THEN 'de'
                    WHEN fr_hits >= es_hits AND fr_hits > 0 THEN 'fr'
                    WHEN es_hits > 0 THEN 'es'
                    ELSE 'und' END AS pred_lang
        FROM h
    """,
    "text_fingerprint": f"""
        WITH t AS (SELECT doc_id, coalesce(text, '') AS text,
                          {_W0_SQL} AS w
                   FROM documents),
        s AS (
            SELECT doc_id,
                   CASE WHEN len(w) >= 5
                        THEN list_transform(range(1, len(w) - 3),
                             i -> array_to_string(list_slice(w, i, i + 4), ' '))
                        ELSE [coalesce(array_to_string(w, ' '), '')]
                        END AS shingles,
                   text
            FROM t
        )
        SELECT doc_id,
               list_aggregate(list_transform(shingles, x -> md5(x)), 'min')
                   AS fp_shingle_min,
               md5(text) AS fp_doc,
               CAST(len(shingles) AS INTEGER) AS n_shingles
        FROM s
    """,
    "content_addressed_ids": """
        WITH d AS (SELECT doc_id, coalesce(text, '') AS text
                   FROM documents),
        ids AS (
            SELECT doc_id,
                   'DOC_' || substr(md5(text), 1, 8) AS content_id,
                   'DOC_' || substr(md5(text), 1, 8) || '_'
                       || substr(md5(text), 25, 8) AS chunk_id,
                   'passage: [' || 'DOC_' || substr(md5(text), 1, 8) || '] '
                       || text AS passage
            FROM d
        ), h AS (SELECT *, md5(chunk_id) AS hh FROM ids)
        SELECT doc_id, content_id, chunk_id, passage,
               substr(hh, 1, 8) || '-' || substr(hh, 9, 4) || '-3'
                   || substr(hh, 14, 3) || '-'
                   || substr('89ab',
                             ((strpos('0123456789abcdef', substr(hh, 17, 1)) - 1)
                              % 4) + 1, 1)
                   || substr(hh, 18, 3) || '-' || substr(hh, 21, 12) AS point_uuid
        FROM h
    """,
}

ORACLE["lang_confusion_report"] = _confusion_oracle_sql().format(
    lang_id=ORACLE["text_lang_id"]
)
