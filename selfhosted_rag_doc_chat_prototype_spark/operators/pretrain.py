"""Pretraining-corpus curation operators: Gopher/C4-style repetition
and quality filters, benchmark decontamination, PII redaction, and
sequence packing -- the large-scale training-data pipeline surface the
engine adds beyond the reference's own operators (brief: dedup /
similarity / text-analysis are first-class components; this module is
the curation half of that story).

Public-knowledge designs only:

- repetition/quality thresholds follow Gopher (Rae et al. 2021,
  arXiv:2112.11446, Table A1) and C4 (Raffel et al. 2020) -- word-count
  bounds, mean-word-length bounds, stopword presence, alphabetic-word
  fraction, top-n-gram fraction, duplicate-n-gram fraction;
- decontamination is the GPT-3-style exact n-gram overlap check
  (Brown et al. 2020, appendix C) against a held-out benchmark set;
- PII redaction is regex detect-and-replace (email / phone / IPv4),
  the standard first pass of corpus scrubbing;
- packing implements both GPT-style concat-and-chunk (documents
  concatenated in order, split every CAP tokens) and greedy first-fit
  binning (no doc split, bins closed when the next doc would overflow).

Scale shape (100 TB):

- filters and PII are embarrassingly parallel whole-stage-codegen
  column expressions over the pruned ``text`` column: no shuffle, no
  Python. Per-doc n-gram counting is O(len^2) in the doc's word count
  via nested higher-order functions -- bounded by document length,
  independent of corpus size.
- decontamination broadcasts the benchmark n-gram set (benchmark
  suites are ~1e6 n-grams, trivially broadcastable); the corpus side
  is a map-only explode + broadcast semi-join + one aggregation
  keyed by doc_id. Nothing scales with corpus x benchmark.
- packing is shard-local: documents are sharded by id range, each
  shard packs independently (one window / one applyInPandas group per
  shard), so the sort is bounded by SHARD_SIZE docs and shards
  parallelize freely. No global ordering, no single-partition window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text_quality as tq
from ..sources.tables import rebalance, table

# Gopher-style keep thresholds (word-count bounds relaxed to the
# synthetic corpus's short docs would be cheating -- keep the published
# 50-word floor; a mixed keep/drop outcome is the point of the filter)
MIN_WORDS = 50
MAX_WORDS = 100_000
MIN_MEAN_WORD_LEN = 3.0
MAX_MEAN_WORD_LEN = 10.0
MIN_STOPWORDS = 2
MIN_ALPHA_FRAC = 0.8
MAX_TOP2_FRAC = 0.20
MAX_TOP3_FRAC = 0.18
MAX_DUP5_FRAC = 0.15

# calibrated to the synthetic vocabulary ("the"/"a" are its only
# English stopwords) so the >=2-distinct-stopwords rule discriminates
# instead of failing every doc; real deployments swap in Gopher's
# 8-word list unchanged
STOP_EN = ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"]

# decontamination: exact 4-gram overlap against the mod-13 doc subset
# standing in for a benchmark suite (GPT-3 uses 13-grams on real text;
# 4 is the calibrated equivalent for the short synthetic docs)
DECON_K = 4
BENCH_MOD = 13

# packing: id-range shards of SHARD docs, CAP-token training sequences
PACK_CAP = 512
PACK_SHARD = 100

# epoch shuffle: per-epoch deterministic permutation into hex shards
SHUFFLE_EPOCHS = 2
SHUFFLE_SHARDS = 16  # first md5 hex nibble

# boilerplate removal: sentence = SENT_W-word group; a sentence seen in
# >= BOILER_MIN_DOCS distinct docs is boilerplate (CCNet para-hash rule)
SENT_W = 10
BOILER_MIN_DOCS = 5
BOILER_HEADER = "subscribe to our newsletter for the latest updates and offers"
BOILER_FOOTER = "all rights reserved this content is protected by copyright law"

# tempered sampling: keep-probability TSAMP_BASE * uniq_ratio^(1/TSAMP_T)
TSAMP_BASE = 0.9
TSAMP_T = 2.0

_W_SQL = "list_filter(string_split_regex(trim(text), '[ \\t\\n\\x0B\\f\\r]+'), x -> x <> '')"
# null-safe twin: operators that treat NULL text as the empty document
# (tempered sampling, curriculum, packing, histogram) coalesce on the
# Spark side and mirror with this in their oracles
_W0_SQL = ("list_filter(string_split_regex(trim(coalesce(text, '')),"
           " '[ \\t\\n\\x0B\\f\\r]+'), x -> x <> '')")


def _grams(w: Column, k: int) -> Column:
    """k-grams of the word array (caller guards size(w) >= k). ``w``
    is let-bound so the per-gram lambda reads a bound variable -- an
    unbound reference would re-evaluate the underlying split once per
    gram (interpreted HOFs do no CSE), going quadratic in doc
    length."""
    return tq.let(
        w,
        lambda wv: F.transform(
            F.sequence(F.lit(1), F.size(wv) - (k - 1)),
            lambda i: F.concat_ws(" ", F.slice(wv, i, k)),
        ),
    )


def _run_stats(w: Column, k: int) -> Column:
    """struct(maxrun, dup) over the SORTED k-gram array in one linear
    ``aggregate`` pass: maxrun = occurrence count of the most frequent
    k-gram, dup = total occurrences of k-grams appearing more than
    once. O(L log L) per document -- the naive distinct x filter
    counting is O(L^2) with the gram array re-materialized per lambda
    call (interpreted HOFs), which measured ~100x slower."""
    g = F.array_sort(_grams(w, k))
    init = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"),
        F.lit(0).alias("maxrun"), F.lit(0).alias("dup"),
    )

    def step(acc: Column, x: Column) -> Column:
        same = acc["prev"] == x
        run = F.when(same, acc["run"] + 1).otherwise(F.lit(1))
        dup = F.when(same, acc["dup"]).otherwise(
            acc["dup"]
            + F.when(acc["run"] > 1, acc["run"]).otherwise(F.lit(0))
        )
        return F.struct(
            x.alias("prev"), run.alias("run"),
            F.greatest(acc["maxrun"], run).alias("maxrun"),
            dup.alias("dup"),
        )

    def fin(acc: Column) -> Column:
        return F.struct(
            acc["maxrun"].alias("maxrun"),
            (
                acc["dup"]
                + F.when(acc["run"] > 1, acc["run"]).otherwise(F.lit(0))
            ).alias("dup"),
        )

    return F.aggregate(g, init, step, fin)


def _top_frac(w: Column, n: Column, k: int) -> Column:
    """Fraction of tokens covered by the single most frequent k-gram."""
    return F.round(
        F.when(n >= k, _run_stats(w, k)["maxrun"] * k / n)
        .otherwise(F.lit(0.0)),
        4,
    )


def _dup_frac(w: Column, n: Column, k: int) -> Column:
    """Fraction of tokens covered by k-grams occurring more than once
    (each duplicated occurrence counted, capped at 1.0)."""
    dup = _run_stats(w, k)["dup"]
    return F.round(
        F.when(n >= k, F.least(F.lit(1.0), dup * k / n)).otherwise(F.lit(0.0)),
        4,
    )


def _quality_exprs(
    text_col: str = "text",
    *,
    min_words: int = MIN_WORDS,
    max_words: int = MAX_WORDS,
    min_mean_word_len: float = MIN_MEAN_WORD_LEN,
    max_mean_word_len: float = MAX_MEAN_WORD_LEN,
    min_stopwords: int = MIN_STOPWORDS,
    stop_words: list[str] | None = None,
    min_alpha_frac: float = MIN_ALPHA_FRAC,
    max_top2_frac: float = MAX_TOP2_FRAC,
    max_top3_frac: float = MAX_TOP3_FRAC,
    max_dup5_frac: float = MAX_DUP5_FRAC,
) -> dict[str, Column]:
    """The Gopher/C4 metric + keep expressions as named Columns, so
    standalone queries and fused pipelines build from the same
    definitions."""
    stop_list = STOP_EN if stop_words is None else stop_words
    # NULL text counts as an empty document (n = 0, keep = 0), not a
    # null token array (F.size of which is -1); the empty-doc ratios
    # are NULL via nullif rather than a division-by-zero crash --
    # mirrored in the oracle, asserted in tests/test_null_robustness
    text0 = F.coalesce(F.col(text_col), F.lit(""))
    w = tq.words(text0)
    n = F.size(w)
    mwl = F.round(tq.mean_word_len(text0), 4)
    stop = F.size(F.array_intersect(w, F.array(*[F.lit(s) for s in stop_list])))
    alpha = F.round(
        F.size(F.filter(w, lambda x: x.rlike("[A-Za-z]")))
        / F.nullif(n.cast("double"), F.lit(0.0)),
        4,
    )
    top2 = _top_frac(w, n, 2)
    top3 = _top_frac(w, n, 3)
    dup5 = _dup_frac(w, n, 5)
    keep = (
        (n >= min_words) & (n <= max_words)
        & (mwl >= min_mean_word_len) & (mwl <= max_mean_word_len)
        & (stop >= min_stopwords)
        & (alpha >= min_alpha_frac)
        & (top2 <= max_top2_frac)
        & (top3 <= max_top3_frac)
        & (dup5 <= max_dup5_frac)
    )
    return {
        "n_words": n,
        "mean_word_len": mwl,
        "n_stopwords": stop,
        "alpha_word_frac": alpha,
        "top_2gram_frac": top2,
        "top_3gram_frac": top3,
        "dup_5gram_frac": dup5,
        "keep": keep.cast("int"),
    }


def quality_metrics(docs: DataFrame, *, text_col: str = "text",
                    **thresholds) -> DataFrame:
    """DataFrame-first core of the Gopher/C4 filter: per-document
    repetition + quality metrics and the combined keep decision over
    ANY (doc_id, text) relation, thresholds parametrizable. Flags
    compare the ROUNDED metrics so the boundary never flips on
    cross-engine 1e-15 float noise."""
    q = _quality_exprs(text_col, **thresholds)
    return docs.select(
        "doc_id", *[expr.alias(name) for name, expr in q.items()]
    )


def gopher_quality_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry binding of :func:`quality_metrics` at the published
    thresholds. The scan is rebalanced across cores: the n-gram
    aggregates are the most CPU-expensive per-row expressions in the
    engine, and a single under-split row group would serialize them."""
    return quality_metrics(rebalance(table(spark, sf_dir, "documents")))


def gram_array(text_col: str = "text", k: int = DECON_K) -> Column:
    """k-gram array of a text column (empty below k words) -- THE
    shared gram builder (batch decontamination and the streaming
    curation face both use it; hand-rolled copies risk re-introducing
    the unbound-lambda quadratic)."""
    return tq.let(
        tq.words(F.col(text_col)),
        lambda w: F.when(F.size(w) >= k, _grams(w, k))
        .otherwise(F.array().cast("array<string>")),
    )


def doc_grams(docs: DataFrame, k: int = DECON_K,
              text_col: str = "text") -> DataFrame:
    """(doc_id, gram) exploded distinct k-grams of any corpus frame."""
    return docs.select(
        "doc_id",
        F.explode(F.array_distinct(gram_array(text_col, k))).alias("gram"),
    )


def ngram_overlap(corpus: DataFrame, bench: DataFrame,
                  k: int = DECON_K) -> DataFrame:
    """DataFrame-first decontamination core: corpus docs sharing any
    exact k-gram with the benchmark relation, with the
    overlapping-gram count (distinct grams per doc). The benchmark
    gram set is broadcast; the corpus side is map-only plus one
    doc_id aggregation -- no corpus x corpus join."""
    bench_grams = doc_grams(bench, k).select("gram").distinct()
    return (
        doc_grams(corpus, k)
        .join(F.broadcast(bench_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap_ngrams"))
    )


def decontaminate_benchmark_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry binding of :func:`ngram_overlap`: the mod-BENCH_MOD
    doc subset stands in for the benchmark suite."""
    docs = rebalance(table(spark, sf_dir, "documents"))
    return ngram_overlap(
        docs.filter(F.col("doc_id") % BENCH_MOD != 0),
        docs.filter(F.col("doc_id") % BENCH_MOD == 0),
    )


EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
IP_RE = r"\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b"
PHONE_RE = r"\b555-[0-9]{4}\b"


def _with_pii(docs: DataFrame) -> DataFrame:
    """Deterministically salt documents with synthetic PII (the corpus
    itself is PII-free word soup): email on doc_id%3, phone on %5,
    IPv4 on %7 -- so the detector sees real positives and negatives."""
    did = F.col("doc_id")
    email = F.when(
        did % 3 == 0,
        F.concat(F.lit(" contact user"), did.cast("string"),
                 F.lit("@example.com")),
    ).otherwise(F.lit(""))
    phone = F.when(
        did % 5 == 0,
        F.concat(F.lit(" call 555-"),
                 F.lpad((did % 10000).cast("string"), 4, "0")),
    ).otherwise(F.lit(""))
    ip = F.when(
        did % 7 == 0,
        F.concat(F.lit(" from 10.0."), (did % 256).cast("string"),
                 F.lit("."), ((did * 7) % 256).cast("string")),
    ).otherwise(F.lit(""))
    return docs.select(
        "doc_id", F.concat(F.col("text"), email, phone, ip).alias("pt")
    )


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """DataFrame-first PII pass over any (doc_id, <text_col>) frame:
    per-doc match counts plus the full redacted text. Pure codegen
    regex ops, map-only."""
    pt = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(pt, F.lit(EMAIL_RE), F.lit(0)))
    n_ips = F.size(F.regexp_extract_all(pt, F.lit(IP_RE), F.lit(0)))
    n_phones = F.size(F.regexp_extract_all(pt, F.lit(PHONE_RE), F.lit(0)))
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(pt, EMAIL_RE, "<EMAIL>"), IP_RE, "<IP>"
        ),
        PHONE_RE, "<PHONE>",
    )
    return docs.select(
        "doc_id",
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        n_ips.alias("n_ips"),
        ((n_emails + n_phones + n_ips) > 0).cast("int").alias("has_pii"),
        redacted.alias("redacted"),
    )


def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry binding of :func:`redact_pii` over the salted corpus;
    the redacted text is md5'd to keep the oracle row compact while
    still proving byte-identical redaction."""
    p = redact_pii(_with_pii(table(spark, sf_dir, "documents")), "pt")
    return p.select(
        "doc_id", "n_emails", "n_phones", "n_ips", "has_pii",
        F.md5(F.col("redacted")).alias("redacted_md5"),
    )


def _doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    # NULL text packs as a zero-token document (F.size of a null array
    # is NULL and crashes the int() in the first-fit kernel)
    w = tq.words(F.coalesce(F.col("text"), F.lit("")))
    return docs.select(
        "doc_id",
        F.expr(f"doc_id div {PACK_SHARD}").alias("shard"),
        F.size(w).alias("tok"),
    )


def pack_concat(tokens: DataFrame, cap: int = PACK_CAP,
                with_n_seqs: bool = True) -> DataFrame:
    """DataFrame-first concat-and-chunk packing over any
    (doc_id, shard, tok) relation: within each shard, documents are
    concatenated in doc_id order and the token stream is split every
    ``cap`` tokens; each doc reports its token offset and the
    first/last training sequence it lands in. One bounded window per
    shard -- shards parallelize, nothing is globally ordered."""
    win = (
        Window.partitionBy("shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    b = tokens.select(
        "doc_id", "shard", "tok", F.sum("tok").over(win).alias("cum_end")
    )
    first_seq = F.expr(f"(cum_end - tok) div {cap}")
    last_seq = F.when(
        F.col("tok") > 0, F.expr(f"(cum_end - 1) div {cap}")
    ).otherwise(first_seq)
    cols = [
        F.col("doc_id"), F.col("shard"), F.col("tok"),
        (F.col("cum_end") - F.col("tok")).alias("tok_start"),
        first_seq.alias("first_seq"),
        last_seq.alias("last_seq"),
    ]
    if with_n_seqs:
        cols.append((last_seq - first_seq + 1).alias("n_seqs"))
    return b.select(*cols)


def pack_concat_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry binding of :func:`pack_concat` over the corpus's
    whitespace token counts."""
    return pack_concat(_doc_tokens(spark, sf_dir))


def firstfit_bins(tokens: list[int], cap: int) -> list[int]:
    """Pure greedy first-fit kernel (the function the applyInPandas
    groups run): scanning in order, open a new bin when the next doc
    would overflow ``cap``; an oversized doc gets a bin of its own."""
    bins: list[int] = []
    bin_id, fill = -1, 0
    for t in tokens:
        if bin_id < 0 or fill + t > cap:
            bin_id += 1
            fill = t
        else:
            fill += t
        bins.append(bin_id)
    return bins


def pack_firstfit(tokens: DataFrame, cap: int = PACK_CAP) -> DataFrame:
    """DataFrame-first greedy first-fit packing (docs never split)
    over any (doc_id, shard, tok) relation: scanning each shard in
    doc_id order, a bin closes when the next doc would overflow
    ``cap``; oversized docs get a bin of their own. Inherently
    sequential per shard, so it runs as one applyInPandas group per
    shard -- the custom-stateful escape hatch -- while shards fan out
    across executors."""

    def pack(pdf):
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        pdf["bin_seq"] = firstfit_bins([int(t) for t in pdf["tok"]], cap)
        return pdf[["doc_id", "shard", "tok", "bin_seq"]]

    return tokens.groupBy("shard").applyInPandas(
        pack, "doc_id long, shard long, tok int, bin_seq int"
    )


def pack_greedy_firstfit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry binding of :func:`pack_firstfit`. Oracle: a recursive
    CTE replays the same scan."""
    return pack_firstfit(_doc_tokens(spark, sf_dir))


def epoch_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-order shuffle: every epoch permutes the
    corpus by ``md5('epoch<e>:' || doc_id)`` and the permutation is
    materialized as (shard, pos) -- the global training order is the
    lexicographic (epoch, shard, pos) and a dataloader reads shard
    files in pos order. Every epoch reshuffles (the key changes), every
    rerun reproduces the exact order (the key is pure).

    Scale shape: NO global sort or single-partition window anywhere --
    the shard is the key's first hex nibble (a map-side expression) and
    ``pos`` is a row_number over a (epoch, shard)-PARTITIONED window,
    so the sort fans out across ``SHUFFLE_SHARDS x epochs`` partitions;
    at 100 TB each shard is written as its own file set, already in
    reading order. This is how T5/GPT-style pipelines shuffle corpora
    that never fit a shuffle buffer."""
    docs = table(spark, sf_dir, "documents").select("doc_id")
    keyed = docs.select(
        "doc_id",
        F.explode(F.array(*[
            F.lit(e) for e in range(SHUFFLE_EPOCHS)])).alias("epoch"),
    ).select(
        "doc_id", "epoch",
        F.md5(F.concat(
            F.lit("epoch"), F.col("epoch").cast("string"), F.lit(":"),
            # NULL doc_id keys as the empty id, same as the oracle's
            # coalesce -- the row still lands deterministically
            F.coalesce(F.col("doc_id").cast("string"), F.lit("")),
        )).alias("shuffle_key"),
    )
    shard = F.conv(F.substring("shuffle_key", 1, 1), 16, 10).cast("int")
    w = Window.partitionBy("epoch", "shard").orderBy("shuffle_key", "doc_id")
    return (
        keyed.withColumn("shard", shard)
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .select("epoch", "doc_id", "shuffle_key", "shard", "pos")
    )


def _with_boilerplate(docs: DataFrame) -> DataFrame:
    """Deterministically salt a shared header/footer sentence (each
    exactly SENT_W words, so it aligns to sentence boundaries when
    prepended) onto id-keyed doc subsets -- the word-soup corpus has no
    natural cross-document boilerplate, so the detector needs planted
    positives, same pattern as the PII salt."""
    did = F.col("doc_id")
    h = F.when(did % 4 == 0, F.lit(BOILER_HEADER + " ")).otherwise(F.lit(""))
    f2 = F.when(did % 6 == 0, F.lit(BOILER_FOOTER + " ")).otherwise(F.lit(""))
    return docs.select(
        "doc_id", F.concat(h, f2, F.col("text")).alias("bt")
    )


def doc_sentences(docs: DataFrame, text_col: str = "text",
                  sent_w: int = SENT_W) -> DataFrame:
    """(doc_id, pos, sent) -- consecutive ``sent_w``-word sentence
    groups of any corpus frame (last partial group kept). Word array
    let-bound (see :func:`tq.let`)."""
    sents = tq.let(
        tq.words(F.col(text_col)),
        lambda w: F.when(
            F.size(w) > 0,
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.floor((F.size(w) - 1) / F.lit(sent_w)).cast("int"),
                ),
                lambda i: F.concat_ws(
                    " ", F.slice(w, i * sent_w + 1, sent_w)
                ),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    return docs.select(
        "doc_id", F.posexplode(sents).alias("pos", "sent")
    )


def boilerplate_clean(docs: DataFrame, *, text_col: str = "text",
                      sent_w: int = SENT_W,
                      min_docs: int = BOILER_MIN_DOCS) -> DataFrame:
    """DataFrame-first CCNet/C4-style boilerplate removal over any
    (doc_id, <text_col>) frame: split each doc into ``sent_w``-word
    sentences, count distinct docs per sentence, drop sentences
    appearing in >= ``min_docs`` docs, and report per doc the
    sentence counts plus the md5 of the cleaned re-assembly.

    Scale shape: the sentence-frequency aggregate shuffles on
    ``xxhash64(sent)`` (fixed 8-byte key, map-side combine), never the
    sentence text; the surviving boilerplate set is tiny by definition
    (each member repeats across >= ``min_docs`` docs) and joins back
    as a broadcast. One doc_id aggregation re-assembles. Nothing is
    ever corpus x corpus."""
    s = doc_sentences(docs, text_col, sent_w).withColumn(
        "sh", F.xxhash64("sent")
    )
    boiler = (
        s.groupBy("sh")
        .agg(F.count_distinct("doc_id").alias("ndocs"))
        .filter(F.col("ndocs") >= min_docs)
        .select("sh", F.lit(1).alias("boiler"))
    )
    flagged = s.join(F.broadcast(boiler), "sh", "left")
    clean = F.concat_ws(
        " ",
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("boiler").isNull(),
                        F.struct(F.col("pos"), F.col("sent")),
                    )
                )
            ),
            lambda x: x["sent"],
        ),
    )
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_sents"),
        F.sum(F.coalesce(F.col("boiler"), F.lit(0)))
        .cast("int")
        .alias("n_boiler_sents"),
        F.md5(clean).alias("clean_md5"),
    )


def boilerplate_sentence_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry binding of :func:`boilerplate_clean` over the salted
    corpus (the word-soup fixture has no natural cross-document
    boilerplate, so the detector needs planted positives)."""
    return boilerplate_clean(
        _with_boilerplate(rebalance(table(spark, sf_dir, "documents"))),
        text_col="bt",
    )


INTRA_BASE_W = 30  # fixture truncation: three full SENT_W sentences


def _with_intradoc_repeats(docs: DataFrame) -> DataFrame:
    """Deterministically plant WITHIN-document repetition: truncate each
    doc to its first ``INTRA_BASE_W`` words (sentence-aligned) and
    re-append its own first sentence once for ``doc_id % 3 == 0`` docs,
    twice for ``% 9 == 0`` -- the word-soup corpus has no natural
    intra-document repeats, same planted-positive pattern as the
    boilerplate and PII salts."""
    w = tq.words(F.col("text"))
    base = F.concat_ws(" ", F.slice(w, 1, INTRA_BASE_W))
    first = F.concat_ws(" ", F.slice(w, 1, SENT_W))
    did = F.col("doc_id")
    return docs.select(
        "doc_id",
        F.concat_ws(
            " ", base,
            F.when(did % 3 == 0, first),
            F.when(did % 9 == 0, first),
        ).alias("bt"),
    )


def _intradoc_struct(text_col: str, sent_w: int) -> Column:
    """struct(n_sents, n_kept, clean) for ``text_col`` -- the intradoc
    kernel shared by the batch reporting operator and the streaming
    clean stage. Both the word array and the sentence array are
    let-bound (``tq.let``): the keep-first filter's lambda reads the
    sentence array per element, and an unbound reference would
    re-split the whole text once per sentence (interpreted HOFs do no
    CSE)."""
    sents = tq.let(
        tq.words(F.col(text_col)),
        lambda w: F.when(
            F.size(w) > 0,
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.floor((F.size(w) - 1) / F.lit(sent_w)).cast("int"),
                ),
                lambda i: F.concat_ws(
                    " ", F.slice(w, i * sent_w + 1, sent_w)),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )

    def body(s: Column) -> Column:
        kept = F.filter(
            s, lambda x, i: F.array_position(s, x) == i + 1
        )
        return F.struct(
            F.size(s).cast("int").alias("n_sents"),
            F.size(kept).cast("int").alias("n_kept"),
            F.concat_ws(" ", kept).alias("clean"),
        )

    return tq.let(sents, body)


def intradoc_clean_text(text_col: str = "text",
                        sent_w: int = SENT_W) -> Column:
    """The cleaned re-assembly as a plain column expression: stateless
    and stream-safe (the streaming curation face applies it in-line
    before hashing/dedup, so a doc re-delivered with extra repetition
    still dedups to the same content hash)."""
    return _intradoc_struct(text_col, sent_w)["clean"]


def intradoc_dedup(docs: DataFrame, *, text_col: str = "text",
                   sent_w: int = SENT_W) -> DataFrame:
    """Within-document repeated-sentence removal (the intra-document
    half of Gopher's repetition handling, Rae et al. 2021 -- the
    cross-document half is :func:`boilerplate_clean`): split each doc
    into ``sent_w``-word sentences, keep only the FIRST occurrence of
    each repeated sentence, and report per doc the sentence counts
    plus the md5 of the cleaned re-assembly.

    Scale shape: the whole operator is ONE map-side projection -- the
    sentence array, the keep-first filter (``array_position(sents, x)
    == i + 1``, i.e. "this position is the first occurrence"), and the
    re-assembly are all higher-order functions over per-row arrays, so
    there is zero shuffle and no per-doc state leaves its row. The
    keep-first scan is O(S^2) in the doc's SENTENCE count -- bounded by
    the chunk-size guard upstream, and cheap next to the tokenize."""
    st = _intradoc_struct(text_col, sent_w)
    return docs.select("doc_id", st.alias("st")).select(
        "doc_id",
        F.col("st.n_sents").alias("n_sents"),
        (F.col("st.n_sents") - F.col("st.n_kept")).cast("int")
        .alias("n_dup_sents"),
        F.md5(F.col("st.clean")).alias("clean_md5"),
    )


def intradoc_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry binding of :func:`intradoc_dedup` over the
    planted-repeat corpus."""
    return intradoc_dedup(
        _with_intradoc_repeats(rebalance(table(spark, sf_dir, "documents"))),
        text_col="bt",
    )


CURR_PHASES = 10


def curriculum_quality_phases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum construction over the corpus: score every document
    (unique-word ratio, the same signal the tempered sampler uses),
    cut the score distribution into ``CURR_PHASES`` equal-mass phases
    at its exact deciles, and attach a deterministic md5 shuffle key --
    a training reader orders by (phase, shuffle_key) to sweep
    easy-to-hard (curriculum learning, Bengio et al. 2009) with a
    reproducible within-phase shuffle.

    Scale shape: phase assignment deliberately avoids the naive global
    ``ntile`` window (a single-partition total sort): ONE exact
    percentile aggregate produces the 9 boundaries, which broadcast
    back onto a map-only bucketing pass -- the same counting-pass +
    broadcast-rates shape as the domain mixture. Boundaries and scores
    are rounded to 6 decimals on BOTH engines so a last-ulp
    interpolation difference can never flip a phase."""
    docs = rebalance(table(spark, sf_dir, "documents"))
    w = tq.words(F.coalesce(F.col("text"), F.lit("")))
    score = F.round(
        F.size(F.array_distinct(w))
        / F.nullif(F.size(w).cast("double"), F.lit(0.0)), 6
    )
    scored = docs.select("doc_id", score.alias("score"))
    qs = ", ".join(
        str(i / CURR_PHASES) for i in range(1, CURR_PHASES)
    )
    bounds = scored.agg(
        F.transform(
            F.expr(f"percentile(score, array({qs}))"),
            lambda b: F.round(b, 6),
        ).alias("bs")
    )
    return scored.crossJoin(F.broadcast(bounds)).select(
        "doc_id", "score",
        (1 + F.size(F.filter("bs", lambda b: F.col("score") > b)))
        .cast("int").alias("phase"),
        F.md5(F.concat(F.lit("curr:"), F.col("doc_id").cast("string")))
        .alias("shuffle_key"),
    )


def _tempered_exprs(text_col: str = "text", *,
                    base: float = TSAMP_BASE,
                    temperature: float = TSAMP_T,
                    salt: str = "tsamp:") -> dict[str, Column]:
    """The tempered-sampling expressions as named Columns."""
    # NULL text == empty document: ratio NULL (not a crash), kept 0
    w = tq.words(F.coalesce(F.col(text_col), F.lit("")))
    uniq = (F.size(F.array_distinct(w))
            / F.nullif(F.size(w).cast("double"), F.lit(0.0)))
    p = F.round(F.lit(base) * F.pow(uniq, F.lit(1.0 / temperature)), 6)
    draw = F.round(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.col("doc_id").cast("string"))),
                1, 8,
            ),
            16, 10,
        ).cast("double")
        / F.lit(float(2**32)),
        6,
    )
    return {
        "uniq_ratio": F.round(uniq, 6),
        "keep_p": p,
        "draw": draw,
        "kept": F.coalesce(draw < p, F.lit(False)).cast("int"),
    }


def tempered_sample(docs: DataFrame, *, text_col: str = "text",
                    **kw) -> DataFrame:
    """DataFrame-first temperature-flattened quality sampling over
    any (doc_id, <text_col>) frame: each doc keeps with probability
    ``base * uniq_ratio^(1/temperature)`` against a deterministic
    per-doc uniform draw (md5-keyed on the salted id), so low-quality
    docs thin out smoothly instead of a hard cutoff. Unnormalized by
    design: the keep decision is purely per-row (map-only, zero
    shuffle, stable under re-ingest). The keep boundary compares the
    draw against the probability ROUNDED to 6 decimals so a last-ulp
    float difference can never flip a row."""
    t = _tempered_exprs(text_col, **kw)
    return docs.select(
        "doc_id", *[expr.alias(name) for name, expr in t.items()]
    )


def quality_tempered_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry binding of :func:`tempered_sample` at the published
    base/temperature (exact-budget selection is
    corpus_sample_split's territory)."""
    return tempered_sample(table(spark, sf_dir, "documents"))


def curate_corpus_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation pipeline as ONE composed DataFrame DAG --
    quality filter -> exact dedup (canonical id per content hash) ->
    benchmark decontamination -> tempered sampling -> sequence
    packing -- emitting each surviving doc's packed position. This is
    the end-to-end shape a training-data run executes; every stage is
    the same operator the standalone queries expose.

    Scale shape: quality keep, sample keep, token count, and the
    content hash are ONE fused map pass over the corpus (the same
    expression builders the standalone queries use), scanned ONCE:
    the dedup canon (smallest doc_id per content hash, over the FULL
    corpus, not just quality survivors) is a min window over the hash
    -- one shuffle of the narrow flag rows replaces the former
    groupBy-then-join-back pair, and the gram metrics are never
    computed twice; decontamination stays the broadcast semi-join;
    the stitching join is doc_id-keyed; packing windows stay
    shard-bounded."""
    docs = rebalance(table(spark, sf_dir, "documents"))
    q = _quality_exprs()
    t = _tempered_exprs()
    base = docs.select(
        "doc_id",
        q["n_words"].alias("tok"),
        q["keep"].alias("keep"),
        t["kept"].alias("kept"),
        F.md5("text").alias("h"),
    )
    canon_id = F.min("doc_id").over(Window.partitionBy("h"))
    cont = decontaminate_benchmark_overlap(spark, sf_dir).select("doc_id")
    surv = (
        base.withColumn("canon_id", canon_id)
        .filter(
            (F.col("keep") == 1) & (F.col("kept") == 1)
            & (F.col("doc_id") % BENCH_MOD != 0)
            & (F.col("doc_id") == F.col("canon_id"))
        )
        .select("doc_id", "tok")
        .join(cont, "doc_id", "left_anti")
        .withColumn("shard", F.expr(f"doc_id div {PACK_SHARD}"))
    )
    return pack_concat(surv, with_n_seqs=False)


# ---- domain-mixture resampling --------------------------------------------
# Pretraining runs rarely train on the crawl's natural domain mix: the
# recipe assigns each domain (language, source, crawl snapshot) a target
# share, and the sampler up/down-samples deterministically to hit it --
# fractional repetition factors ("epochs") included, the Pile/LLaMA-style
# mixture step. Decision is keyed on a salted content-independent id
# hash (like corpus_sample_split above) so the realized subset is stable
# under re-runs, insertions, and repartitioning.

MIX_WEIGHTS = (
    ("en", 0.5), ("de", 0.125), ("es", 0.125), ("fr", 0.125), ("zh", 0.125),
)


def mixture_resample(
    docs: DataFrame,
    weights=MIX_WEIGHTS,
    *,
    id_col: str = "doc_id",
    domain_col: str = "lang",
) -> DataFrame:
    """Resample ``docs`` so each domain's expected share matches
    ``weights`` while keeping the total corpus size: each domain's rate
    is ``weight * N_total / N_domain``; a doc yields ``floor(rate)``
    copies plus one more when its uniform draw falls below the
    fractional part. The draw is the first 8 md5 hex chars of the
    salted id mapped to [0, 1) -- identical arithmetic in the DuckDB
    oracle, no engine RNG involved.

    Scale shape: one counting pass (5-ish rows out), rates broadcast
    back onto a second map-only pass -- never a corpus-wide shuffle on
    the domain key, which would concentrate each domain's documents
    (skew) for no reason. Domains without a weight drop out (the
    recipe's explicit exclusion semantics)."""
    wmap = F.create_map(*[F.lit(x) for kv in weights for x in kv])
    counts = docs.groupBy(domain_col).agg(
        F.count(F.lit(1)).cast("double").alias("n_domain")
    )
    rates = (
        counts.withColumn(
            "n_total", F.sum("n_domain").over(Window.partitionBy())
        )
        .withColumn("w", wmap[F.col(domain_col)])
        .filter(F.col("w").isNotNull())
        .withColumn("rate", F.col("w") * F.col("n_total") / F.col("n_domain"))
        .select(domain_col, "rate")
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("mix:"), F.col(id_col).cast("string"))),
                1, 8,
            ),
            16, 10,
        ).cast("double")
        / F.lit(4294967296.0)
    )
    n_copies = (
        F.floor("rate")
        + (u < (F.col("rate") - F.floor("rate"))).cast("long")
    ).cast("long")
    return (
        docs.join(F.broadcast(rates), domain_col)
        .withColumn("n_copies", n_copies)
        .filter(F.col("n_copies") > 0)
        .select(
            id_col,
            domain_col,
            F.round("rate", 6).alias("mix_rate"),
            "n_copies",
            F.explode(F.sequence(F.lit(1).cast("long"), F.col("n_copies"))).alias("copy"),
        )
    )


def domain_mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mixture_resample(table(spark, sf_dir, "documents"))


DOMAIN_CAP = 20


def domain_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mixture recipe's other half: a hard per-domain document CAP
    (no single source may contribute more than ``DOMAIN_CAP`` docs),
    selected deterministically by ranking each domain's docs on a
    salted id hash -- a reproducible reservoir whose membership is
    stable under re-runs and insertions of OTHER domains' docs.

    Scale shape: one rank window per (small-cardinality) domain key
    over (doc_id, source) pairs only -- the heavy text columns are
    pruned before the shuffle, and the cap bounds output per domain."""
    docs = table(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.lit("cap:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy(h.alias("h"), "doc_id")
    return (
        docs.select("doc_id", "source")
        .withColumn("pick_rank", F.row_number().over(w))
        .filter(F.col("pick_rank") <= DOMAIN_CAP)
    )


# ---- CCNet-style LM perplexity scoring ------------------------------------

LM_SAMPLE_FRACTION = 0.3  # LM trains on a bounded deterministic sample
LM_K = 0.1                # add-k smoothing
LM_MIN_BIGRAM = 2         # prune hapax bigrams: bounds the LM table


def lm_perplexity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity quality scoring, the CCNet recipe (Wenzek et al.,
    "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
    Data", 2020): score every document under a small language model and
    use the score as a quality signal (low perplexity ~ fluent text;
    outliers are boilerplate/gibberish). The reference LM here is a
    bigram model with add-k smoothing trained on a DETERMINISTIC
    md5-keyed sample of the corpus (CCNet trains on Wikipedia; the
    sample stands in and keeps the gate self-contained).

    Scale shape: LM training reads the bounded sample (two hash
    aggregates; hapax bigrams pruned so the model table stays small --
    CCNet's LM is a fixed artifact); scoring is an adjacent-pair
    transform (map-only, no self-join) with the LM tables broadcast,
    then one per-doc aggregation. Nothing scales with corpus x corpus.

    Output: (doc_id, n_bigrams, ppl) for every document with at least
    one bigram; ppl = exp(-mean log p(b|a))."""
    docs = table(spark, sf_dir, "documents")
    words = F.filter(
        F.split(F.lower(F.trim("text")), r"[ \t\n\x0B\f\r]+"), lambda x: x != F.lit("")
    )
    toks = docs.select("doc_id", words.alias("w"))
    lm_h = F.substring(
        F.md5(F.concat(F.lit("lm:"), F.col("doc_id").cast("string"))), 1, 8
    )
    from .textstats import _hex_threshold

    train = toks.filter(lm_h < F.lit(_hex_threshold(LM_SAMPLE_FRACTION)))
    uni = (
        train.select(F.explode("w").alias("a"))
        .groupBy("a").agg(F.count(F.lit(1)).cast("double").alias("c_a"))
    )
    vsize = uni.agg(F.count(F.lit(1)).cast("double").alias("v"))

    # adjacent pairs without a positional self-join: 0-based bracket
    # indexing pairs each sliced token with its predecessor in place
    bigram_expr = (
        "transform(slice(w, 2, greatest(size(w) - 1, 0)),"
        " (x, i) -> struct(w[i] AS a, x AS b))"
    )
    bi = (
        train.select(F.explode(F.expr(bigram_expr)).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.count(F.lit(1)).cast("double").alias("c_ab"))
        .filter(F.col("c_ab") >= LM_MIN_BIGRAM)
    )
    pairs = toks.select(
        "doc_id", F.explode(F.expr(bigram_expr)).alias("p")
    ).select("doc_id", F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    logp = F.log(
        (F.coalesce(F.col("c_ab"), F.lit(0.0)) + LM_K)
        / (F.coalesce(F.col("c_a"), F.lit(0.0)) + LM_K * F.col("v"))
    )
    scored = (
        pairs.join(F.broadcast(uni), "a", "left")
        .join(F.broadcast(bi), ["a", "b"], "left")
        .crossJoin(F.broadcast(vsize))
        .select("doc_id", logp.alias("lp"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.exp(-F.avg("lp")), 4).alias("ppl"),
    )


SEQLEN_BUCKET = 16  # tokens per histogram bucket


def seq_len_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length distribution (whitespace tokens, SEQLEN_BUCKET-
    wide buckets) with per-bucket doc/token shares and the cumulative
    doc share -- the observable a packing configuration reads before
    choosing its cap (padding waste and split frequency both follow
    from where the mass sits relative to PACK_CAP) and a tokenizer
    build reads before choosing context length.

    Scale shape: one map pass computes per-doc token counts, one small
    aggregate reduces to <=max_len/bucket rows; the share windows run
    on that constant-sized bucket relation only (deliberate bounded
    single-partition window), with corpus totals broadcast."""
    docs = table(spark, sf_dir, "documents")
    # coalesce: a NULL text must count as 0 tokens on BOTH sides
    # (F.size of a null array is -1 under legacy sizeOfNull, which
    # would invent a bucket_lo=-16 row the oracle's NULL len cannot)
    tok = F.size(tq.words(F.coalesce(F.col("text"), F.lit(""))))
    agg = (
        docs.select(
            (F.floor(tok / SEQLEN_BUCKET) * SEQLEN_BUCKET)
            .cast("int").alias("bucket_lo"),
            tok.alias("tok"),
        )
        .groupBy("bucket_lo")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("tok").alias("n_tokens"))
    )
    total = agg.agg(F.sum("n_docs").alias("td"),
                    F.sum("n_tokens").alias("tt"))
    cum = Window.orderBy("bucket_lo").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return agg.crossJoin(F.broadcast(total)).select(
        "bucket_lo", "n_docs", "n_tokens",
        F.round(F.col("n_docs") / F.col("td"), 6).alias("doc_share"),
        F.round(F.sum("n_docs").over(cum) / F.col("td"), 6)
        .alias("cum_doc_share"),
        F.round(F.col("n_tokens") / F.col("tt"), 6).alias("token_share"),
    )


SPAN_BLOCK = 3   # words per maskable block (T5 mean span length)
SPAN_MOD = 7     # mask every 7th block ~ 14% noise density


def span_corruption_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-STYLE SPAN CORRUPTION examples: each document's word stream
    is cut into ``SPAN_BLOCK``-word blocks, a doc-keyed deterministic
    1-in-``SPAN_MOD`` of them are masked, and the operator emits the
    (input, target) pair -- input has each masked span replaced by its
    ``<extra_id_k>`` sentinel, target is the sentinel-prefixed masked
    spans -- the denoising objective's data shape (Raffel et al.,
    2020), generated reproducibly so re-runs and engine twins agree
    byte-for-byte. Masked blocks form the arithmetic progression
    ``block ≡ -seed (mod 7)``, which makes the sentinel index k a
    CLOSED-FORM integer ((block - b0) div 7) instead of a stateful
    scan -- the whole construction is one array expression, map-only,
    no shuffle, no Python.

    NULL/empty text emits an empty pair (0 words); the word class is
    the pinned explicit whitespace set."""
    from ..functions import text_quality as tq

    docs = table(spark, sf_dir, "documents")
    seed = (
        F.conv(F.substring(
            F.md5(F.concat(F.lit("span:"),
                           F.col("doc_id").cast("string"))), 1, 8),
            16, 10).cast("long") % SPAN_MOD
    )
    base = docs.select(
        "doc_id",
        tq.words(F.coalesce(F.col("text"), F.lit(""))).alias("w"),
        seed.alias("seed"),
        ((SPAN_MOD - seed) % SPAN_MOD).alias("b0"),
    )
    blk = f"(i div {SPAN_BLOCK})"
    masked = f"({blk} + seed) % {SPAN_MOD} = 0"
    k = f"CAST(({blk} - b0) div {SPAN_MOD} AS STRING)"
    input_expr = (
        f"array_join(filter(transform(w, (x, i) -> CASE "
        f"WHEN NOT ({masked}) THEN x "
        f"WHEN i % {SPAN_BLOCK} = 0 THEN concat('<extra_id_', {k}, '>') "
        f"ELSE '' END), t -> t <> ''), ' ')"
    )
    target_expr = (
        f"array_join(filter(transform(w, (x, i) -> CASE "
        f"WHEN NOT ({masked}) THEN '' "
        f"WHEN i % {SPAN_BLOCK} = 0 THEN "
        f"concat('<extra_id_', {k}, '> ', x) "
        f"ELSE x END), t -> t <> ''), ' ')"
    )
    n_masked = (
        f"size(filter(transform(w, (x, i) -> "
        f"CASE WHEN {masked} THEN 1 ELSE 0 END), v -> v = 1))"
    )
    return base.select(
        "doc_id",
        F.size("w").cast("int").alias("n_words"),
        F.expr(n_masked).cast("int").alias("n_masked"),
        F.expr(input_expr).alias("input_text"),
        F.expr(target_expr).alias("target_text"),
    )


def _span_corruption_oracle_sql() -> str:
    from .textstats import _W_SQL

    blk = "((i - 1) // 3)"
    masked = f"({blk} + seed) % {SPAN_MOD} = 0"
    k = f"CAST(({blk} - b0) // {SPAN_MOD} AS VARCHAR)"
    return f"""
        WITH base AS (
            SELECT doc_id,
                   coalesce({_W_SQL}, []) AS w,
                   CAST('0x' || substr(
                       md5('span:' || CAST(doc_id AS VARCHAR)), 1, 8)
                       AS BIGINT) % {SPAN_MOD} AS seed
            FROM documents
        ),
        b AS (SELECT *, ({SPAN_MOD} - seed) % {SPAN_MOD} AS b0 FROM base)
        SELECT doc_id,
               CAST(len(w) AS INTEGER) AS n_words,
               CAST(len(list_filter(range(1, len(w) + 1),
                    i -> {masked})) AS INTEGER) AS n_masked,
               coalesce(array_to_string(list_filter(
                   list_transform(range(1, len(w) + 1), i -> CASE
                       WHEN NOT ({masked}) THEN w[i]
                       WHEN (i - 1) % {SPAN_BLOCK} = 0
                           THEN '<extra_id_' || {k} || '>'
                       ELSE '' END), t -> t <> ''), ' '), '')
                   AS input_text,
               coalesce(array_to_string(list_filter(
                   list_transform(range(1, len(w) + 1), i -> CASE
                       WHEN NOT ({masked}) THEN ''
                       WHEN (i - 1) % {SPAN_BLOCK} = 0
                           THEN '<extra_id_' || {k} || '> ' || w[i]
                       ELSE w[i] END), t -> t <> ''), ' '), '')
                   AS target_text
        FROM b
    """


NEXTEVT_CTX = 3          # context length (events) per training pair
NEXTEVT_NULL = "(null)"  # sentinel for a NULL event_type inside a pair


def nextevent_training_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEQUENTIAL next-event training pairs from the event stream: for
    every event with at least ``NEXTEVT_CTX`` predecessors in its
    user's timeline, emit (context = the previous 3 event types
    oldest-first, target = this event's type) -- the (context, label)
    dataset a next-item/next-action model trains on, built leakage-
    free by construction (the context window ends strictly BEFORE the
    target; the same (ts, event_id) ordering contract as the SCD2
    family).

    NULL event_type inside a pair becomes the explicit ``(null)``
    sentinel BEFORE windowing, so concat_ws can never silently skip a
    position (the concat_ws-skips-null vs ||-propagates-null
    divergence); NULL-ts events have no timeline position and are
    excluded. One window shuffle on user_id; lag chains stay in a
    single window pass."""
    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select(
            "user_id", "ts", "event_id",
            F.coalesce(F.col("event_type"), F.lit(NEXTEVT_NULL))
            .alias("step"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = ev.select(
        "user_id", "event_id", "step",
        *[F.lag("step", i).over(w).alias(f"l{i}")
          for i in range(1, NEXTEVT_CTX + 1)],
        F.row_number().over(w).alias("rn"),
    )
    return (
        lagged.filter(F.col("rn") > NEXTEVT_CTX)
        .select(
            "user_id", "event_id",
            F.concat_ws(
                "|", *[F.col(f"l{i}")
                       for i in range(NEXTEVT_CTX, 0, -1)]
            ).alias("context"),
            F.col("step").alias("target"),
        )
    )


def _nextevent_oracle_sql() -> str:
    lags = ", ".join(
        f"lag(step, {i}) OVER (PARTITION BY user_id ORDER BY ts, event_id)"
        f" AS l{i}" for i in range(1, NEXTEVT_CTX + 1)
    )
    ctx = " || '|' || ".join(
        f"l{i}" for i in range(NEXTEVT_CTX, 0, -1)
    )
    return f"""
        WITH ev AS (
            SELECT user_id, ts, event_id,
                   coalesce(event_type, '{NEXTEVT_NULL}') AS step
            FROM events WHERE ts IS NOT NULL
        ),
        lagged AS (
            SELECT user_id, event_id, step, {lags},
                   row_number() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS rn
            FROM ev
        )
        SELECT user_id, event_id, {ctx} AS context, step AS target
        FROM lagged WHERE rn > {NEXTEVT_CTX}
    """


BPE_MERGES = 5  # learned merge rounds (unrolled in the oracle)


def bpe_learn_merges(spark: SparkSession, sf_dir: str,
                     merges: int = BPE_MERGES) -> DataFrame:
    """BPE TOKENIZER TRAINING (Sennrich et al. 2016): learn the first
    ``merges`` byte-pair merges of the corpus -- each round counts
    adjacent symbol pairs over the word-frequency table (weighted by
    word count), picks the most frequent pair (ties to the
    lexicographically smallest), and greedily merges it left-to-right
    in every word. Emits the merge table (round, sym_a, sym_b,
    pair_count, merged) -- the artifact a tokenizer ships; the
    pinned-BPE chunker family consumes exactly such a table.

    The greedy non-overlapping merge is ONE array fold per word
    (push symbol; if the last element equals sym_a and the incoming
    equals sym_b, replace with the merged token -- a merged token is
    strictly longer than sym_a, so it can never re-trigger within its
    own round): no per-row Python, identical fold in Spark
    ``aggregate`` and DuckDB ``list_reduce``. Everything is exact
    integer counting with a fully ordered argmax.

    Scale shape: THE tokenizer-training shape -- one corpus pass
    collapses to the (word, count) vocabulary (groupBy with map-side
    combine; vocabulary is orders smaller than the corpus and this is
    exactly how HF tokenizers train); every round after is
    vocabulary-sized (pair explode -> partial-agg count -> sort-LIMIT
    argmax broadcast back into the map-only merge fold), with a
    localCheckpoint per round to truncate lineage. The corpus is
    never rescanned. A corpus whose words all collapse to single
    symbols truncates the merge table early (both engines)."""
    docs = rebalance(table(spark, sf_dir, "documents"))
    vocab = (
        docs.select(
            F.explode(tq.words(F.coalesce(F.col("text"), F.lit(""))))
            .alias("w")
        )
        .groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    )
    words = vocab.select(
        "c", F.expr("regexp_extract_all(w, '.', 0)").alias("syms")
    ).localCheckpoint()
    pair_structs = (
        "transform(sequence(1, size(syms) - 1), "
        "i -> struct(element_at(syms, i) AS a, "
        "element_at(syms, i + 1) AS b))"
    )
    fold = (
        "aggregate(slice(syms, 2, size(syms) - 1), "
        "array(element_at(syms, 1)), "
        "(acc, s) -> IF(element_at(acc, -1) = a AND s = b, "
        "concat(slice(acc, 1, size(acc) - 1), array(concat(a, b))), "
        "concat(acc, array(s))))"
    )
    merge_rows = []
    for t in range(1, merges + 1):
        pairs = (
            words.filter(F.size("syms") >= 2)
            .select("c", F.explode(F.expr(pair_structs)).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("c").alias("n"))
        )
        winner = (
            pairs.orderBy(F.desc("n"), F.asc("a"), F.asc("b")).limit(1)
            .localCheckpoint()
        )
        merge_rows.append(winner.select(
            F.lit(t).cast("int").alias("round"),
            F.col("a").alias("sym_a"), F.col("b").alias("sym_b"),
            F.col("n").cast("long").alias("pair_count"),
            F.concat("a", "b").alias("merged"),
        ))
        words = (
            words.crossJoin(F.broadcast(winner.select("a", "b")))
            .select("c", F.expr(fold).alias("syms"))
            .localCheckpoint()
        )
    out = merge_rows[0]
    for m in merge_rows[1:]:
        out = out.unionByName(m)
    return out


def _bpe_merge_oracle_sql(merges: int = BPE_MERGES) -> str:
    ws = "[ \\t\\n\\x0B\\f\\r]"
    fold = (
        "list_reduce(list_transform(syms, s -> [s]), "
        "(acc, x) -> CASE WHEN acc[-1] = m.a AND x[1] = m.b "
        "THEN list_append(list_slice(acc, 1, len(acc) - 1), m.a || m.b) "
        "ELSE list_concat(acc, x) END)"
    )
    parts = [f"""
        vocab AS (
            SELECT u.w AS w, count(*) AS c
            FROM (
                SELECT list_filter(string_split_regex(
                    trim(coalesce(text, '')), '{ws}+'), x -> x <> '') AS t
                FROM documents
            ), unnest(t) AS u(w)
            GROUP BY u.w
        ),
        w0 AS (SELECT c, regexp_extract_all(w, '.') AS syms FROM vocab)"""]
    for t in range(1, merges + 1):
        parts.append(f"""
        p{t} AS (
            SELECT p.a AS a, p.b AS b, sum(c) AS n
            FROM (
                SELECT c, unnest(list_transform(range(1, len(syms)),
                    i -> struct_pack(a := syms[i], b := syms[i + 1])))
                    AS p
                FROM w{t - 1}
            )
            GROUP BY 1, 2
        ),
        m{t} AS (
            SELECT a, b, n FROM p{t}
            ORDER BY n DESC, a ASC, b ASC LIMIT 1
        ),
        w{t} AS (
            SELECT c, {fold} AS syms
            FROM w{t - 1} CROSS JOIN m{t} m
        )""")
    sel = " UNION ALL ".join(
        f"SELECT {t} AS round, a AS sym_a, b AS sym_b, "
        f"CAST(n AS BIGINT) AS pair_count, a || b AS merged FROM m{t}"
        for t in range(1, merges + 1)
    )
    return f"""
        WITH {",".join(parts)}
        SELECT CAST(round AS INTEGER) AS round, sym_a, sym_b,
               pair_count, merged
        FROM ({sel})
    """


def bpe_encode_corpus(spark: SparkSession, sf_dir: str,
                      merges: int = BPE_MERGES) -> DataFrame:
    """BPE ENCODE -- the other half of the tokenizer lifecycle
    (:func:`bpe_learn_merges` trains the merge table; this applies it
    to the corpus): every document's token count under the learned
    vocabulary, its base symbol count, and the exact compression the
    merges bought (``n_saved = n_base_syms - n_tokens``). The
    per-token budget downstream (packing, token-budget chunking,
    curriculum) is priced in exactly these units.

    Exactness: the same weighted-argmax learning rounds and the same
    greedy left-to-right fold as the learn operator (identical Spark
    ``aggregate`` / DuckDB ``list_reduce``); all outputs are exact
    integers. A corpus that exhausts its merges early stops folding
    on BOTH engines (Spark breaks on the empty winner; the oracle's
    LEFT JOIN folds only when a winner exists).

    Scale shape: encoding is VOCABULARY-sized, not corpus-sized --
    the merge folds run once per distinct word (the word-cache
    strategy fast tokenizers use), with localCheckpoint truncating
    lineage per round; the corpus is touched twice, once to build the
    vocabulary and once as explode -> broadcastable word->tokens
    equi-join -> per-doc partial-agg sum. Documents with no words
    emit zeros (LEFT join back to the documents table)."""
    docs = rebalance(table(spark, sf_dir, "documents"))
    wordcol = tq.words(F.coalesce(F.col("text"), F.lit("")))
    vocab = (
        docs.select(F.explode(wordcol).alias("w"))
        .groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    )
    enc = vocab.select(
        "w", "c", F.expr("regexp_extract_all(w, '.', 0)").alias("syms")
    ).localCheckpoint()
    pair_structs = (
        "transform(sequence(1, size(syms) - 1), "
        "i -> struct(element_at(syms, i) AS a, "
        "element_at(syms, i + 1) AS b))"
    )
    fold = (
        "aggregate(slice(syms, 2, size(syms) - 1), "
        "array(element_at(syms, 1)), "
        "(acc, s) -> IF(element_at(acc, -1) = a AND s = b, "
        "concat(slice(acc, 1, size(acc) - 1), array(concat(a, b))), "
        "concat(acc, array(s))))"
    )
    for _ in range(merges):
        pairs = (
            enc.filter(F.size("syms") >= 2)
            .select("c", F.explode(F.expr(pair_structs)).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("c").alias("n"))
        )
        winner = (
            pairs.orderBy(F.desc("n"), F.asc("a"), F.asc("b")).limit(1)
            .localCheckpoint()
        )
        if winner.isEmpty():
            break  # merges exhausted: further folds are identities
        enc = (
            enc.crossJoin(F.broadcast(winner.select("a", "b")))
            .select("w", "c", F.expr(fold).alias("syms"))
            .localCheckpoint()
        )
    wtok = enc.select(
        "w",
        F.expr("size(regexp_extract_all(w, '.', 0))").alias("nb"),
        F.size("syms").alias("nt"),
    )
    per = (
        docs.select("doc_id", F.explode(wordcol).alias("w"))
        .join(F.broadcast(wtok), "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("nw"),
            F.sum("nb").alias("base"),
            F.sum("nt").alias("toks"),
        )
    )
    return (
        docs.select("doc_id").join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("nw", F.lit(0)).cast("long").alias("n_words"),
            F.coalesce("base", F.lit(0)).cast("long").alias("n_base_syms"),
            F.coalesce("toks", F.lit(0)).cast("long").alias("n_tokens"),
            (F.coalesce("base", F.lit(0)) - F.coalesce("toks", F.lit(0)))
            .cast("long").alias("n_saved"),
        )
    )


def _bpe_encode_oracle_sql(merges: int = BPE_MERGES) -> str:
    ws = "[ \\t\\n\\x0B\\f\\r]"
    # fold only when the round produced a winner (LEFT JOIN keeps the
    # vocabulary alive when merges exhaust -- the Spark side breaks)
    fold = (
        "CASE WHEN m.a IS NULL THEN syms ELSE "
        "list_reduce(list_transform(syms, s -> [s]), "
        "(acc, x) -> CASE WHEN acc[-1] = m.a AND x[1] = m.b "
        "THEN list_append(list_slice(acc, 1, len(acc) - 1), m.a || m.b) "
        "ELSE list_concat(acc, x) END) END"
    )
    parts = [f"""
        vocab AS (
            SELECT u.w AS w, count(*) AS c
            FROM (
                SELECT list_filter(string_split_regex(
                    trim(coalesce(text, '')), '{ws}+'), x -> x <> '') AS t
                FROM documents
            ), unnest(t) AS u(w)
            GROUP BY u.w
        ),
        e0 AS (SELECT w, c, regexp_extract_all(w, '.') AS syms
               FROM vocab)"""]
    for t in range(1, merges + 1):
        parts.append(f"""
        p{t} AS (
            SELECT p.a AS a, p.b AS b, sum(c) AS n
            FROM (
                SELECT c, unnest(list_transform(range(1, len(syms)),
                    i -> struct_pack(a := syms[i], b := syms[i + 1])))
                    AS p
                FROM e{t - 1}
            )
            GROUP BY 1, 2
        ),
        m{t} AS (
            SELECT a, b FROM p{t}
            ORDER BY n DESC, a ASC, b ASC LIMIT 1
        ),
        e{t} AS (
            SELECT w, c, {fold} AS syms
            FROM e{t - 1} LEFT JOIN m{t} m ON TRUE
        )""")
    return f"""
        WITH {",".join(parts)},
        wtok AS (
            SELECT w, len(regexp_extract_all(w, '.')) AS nb,
                   len(syms) AS nt
            FROM e{merges}
        ),
        docw AS (
            SELECT doc_id, u.w AS w
            FROM (
                SELECT doc_id, list_filter(string_split_regex(
                    trim(coalesce(text, '')), '{ws}+'), x -> x <> '') AS t
                FROM documents
            ), unnest(t) AS u(w)
        ),
        per AS (
            SELECT doc_id, count(*) AS nw, sum(nb) AS base,
                   sum(nt) AS toks
            FROM docw JOIN wtok USING (w)
            GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(coalesce(nw, 0) AS BIGINT) AS n_words,
               CAST(coalesce(base, 0) AS BIGINT) AS n_base_syms,
               CAST(coalesce(toks, 0) AS BIGINT) AS n_tokens,
               CAST(coalesce(base, 0) - coalesce(toks, 0) AS BIGINT)
                   AS n_saved
        FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id
    """


SEQLEN_MAX_POW = 20  # bucket caps 1, 2, 4, ... 2^20 tokens


def _pow2_cap_case(n_expr: str) -> str:
    """Smallest power-of-two >= n as a CASE chain over integer
    thresholds (identical text on both engines -- no log2): lengths
    beyond 2^SEQLEN_MAX_POW clamp to the top bucket."""
    arms = " ".join(
        f"WHEN {n_expr} <= {1 << p} THEN {1 << p}"
        for p in range(SEQLEN_MAX_POW + 1)
    )
    return f"CASE {arms} ELSE {1 << SEQLEN_MAX_POW} END"


def seqlen_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEQUENCE-LENGTH BUCKETING report -- the batching-efficiency
    planner for training: documents grouped into power-of-two token-
    length buckets, with the exact padding waste of per-bucket padding
    (every doc padded to the LONGEST OBSERVED document in its bucket
    -- what a bucketed dataloader actually pads to; the power-of-two
    cap is only the bucket boundary) against the naive global padding
    (every doc padded to the corpus max). The two waste columns are
    THE numbers that justify length-bucketed batch sampling in a
    training data loader; bucketed waste <= global waste per bucket BY
    CONSTRUCTION (bucket max <= corpus max), asserted in tests.
    Zero-token documents land in the cap-1 bucket.

    Exactness: token counts are the whitespace convention
    (``tq.n_tokens``); the bucket cap is an integer CASE chain (no
    log2); both waste sums are exact BIGINTs.

    Scale shape: map-only token count + partial-aggregated groupBy on
    <= 21 bucket keys; the corpus max rides along as one broadcast
    scalar row."""
    docs = rebalance(table(spark, sf_dir, "documents"))
    toks = docs.select(
        tq.n_tokens(F.coalesce(F.col("text"), F.lit(""))).alias("n")
    )
    bucketed = toks.select(
        "n", F.expr(_pow2_cap_case("greatest(n, 1)")).alias("bucket_cap")
    )
    gmax = bucketed.agg(F.max("n").alias("gmax"))
    return (
        bucketed.crossJoin(F.broadcast(gmax))
        .groupBy("bucket_cap")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n").cast("long").alias("n_tokens_total"),
            (F.max("n") * F.count(F.lit(1)) - F.sum("n")).cast("long")
            .alias("pad_waste_bucketed"),
            F.sum(F.col("gmax") - F.col("n")).cast("long")
            .alias("pad_waste_global"),
        )
    )


def _seqlen_oracle_sql() -> str:
    ws = "[ \\t\\n\\x0B\\f\\r]"
    return f"""
        WITH toks AS (
            SELECT len(list_filter(string_split_regex(
                trim(coalesce(text, '')), '{ws}+'), x -> x <> '')) AS n
            FROM documents
        ),
        b AS (
            SELECT n, {_pow2_cap_case("greatest(n, 1)")} AS bucket_cap
            FROM toks
        ),
        g AS (SELECT max(n) AS gmax FROM b)
        SELECT bucket_cap,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n) AS BIGINT) AS n_tokens_total,
               CAST(max(n) * count(*) - sum(n) AS BIGINT)
                   AS pad_waste_bucketed,
               CAST(sum(g.gmax - n) AS BIGINT) AS pad_waste_global
        FROM b CROSS JOIN g
        GROUP BY bucket_cap
    """


PMI_MIN_COUNT = 3  # bigram support floor (noise gate, standard practice)


def pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLLOCATION MINING: pointwise mutual information of every
    adjacent word bigram with corpus support >= ``PMI_MIN_COUNT``
    (Church & Hanks 1990) -- the signal tokenizer construction and
    phrase-aware indexing read to decide which word pairs behave as
    single units ("new york" scores high; "of the" scores ~0).
    ``PMI(a,b) = ln(p(a,b) / (p(a) p(b)))`` with bigram probability
    over the pair count and unigram probabilities over the token
    count.

    Exactness: every ln() is rounded once into BIGINT 1e-6 units
    (``tq.lnu``); the PMI combination is then pure integer
    addition/subtraction -- bit-identical across engines regardless
    of join or summation order.

    Scale shape: the bigram build is one let-bound array expression
    per document (map-only, no self-join); bigram and unigram counts
    partially aggregate map-side; the support floor is applied BEFORE
    the two unigram joins, so only surviving collocations shuffle;
    corpus totals ride along as one broadcast scalar row."""
    docs = rebalance(table(spark, sf_dir, "documents"))
    pairs = tq.let(
        tq.words(F.coalesce(F.col("text"), F.lit(""))),
        lambda wv: F.when(
            F.size(wv) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(wv) - 1),
                lambda i: F.struct(
                    F.element_at(wv, i).alias("w1"),
                    F.element_at(wv, i + 1).alias("w2"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>")),
    )
    ex = docs.select(F.explode(pairs).alias("p")).select("p.w1", "p.w2")
    uni = (
        docs.select(
            F.explode(tq.words(F.coalesce(F.col("text"), F.lit(""))))
            .alias("w")
        )
        .groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    )
    big = (
        ex.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
        .filter(F.col("c12") >= PMI_MIN_COUNT)
    )
    totals = ex.agg(F.count(F.lit(1)).alias("np")).crossJoin(
        uni.agg(F.sum("c").alias("nt"))
    )
    return (
        big.join(uni.select(F.col("w").alias("w1"),
                            F.col("c").alias("c1")), "w1")
        .join(uni.select(F.col("w").alias("w2"),
                         F.col("c").alias("c2")), "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "w1", "w2",
            F.col("c12").cast("long").alias("c12"),
            F.col("c1").cast("long").alias("c1"),
            F.col("c2").cast("long").alias("c2"),
            (tq.lnu(F.col("c12")) - tq.lnu(F.col("np"))
             - tq.lnu(F.col("c1")) - tq.lnu(F.col("c2"))
             + tq.lnu(F.col("nt")) + tq.lnu(F.col("nt")))
            .alias("pmi_u"),
        )
        .withColumn(
            "pmi", F.col("pmi_u").cast("double") / tq.LN_UNIT_SCALE
        )
    )


def _pmi_oracle_sql() -> str:
    ws = "[ \\t\\n\\x0B\\f\\r]"
    return f"""
        WITH w AS (
            SELECT list_filter(string_split_regex(
                trim(coalesce(text, '')), '{ws}+'), x -> x <> '') AS w
            FROM documents
        ),
        pairs AS (
            SELECT u.p.a AS w1, u.p.b AS w2
            FROM (
                SELECT list_transform(range(1, len(w)),
                    i -> struct_pack(a := w[i], b := w[i + 1])) AS ps
                FROM w WHERE len(w) >= 2
            ), unnest(ps) AS u(p)
        ),
        uni AS (
            SELECT u.w AS w, count(*) AS c
            FROM w, unnest(w.w) AS u(w) GROUP BY u.w
        ),
        big AS (
            SELECT w1, w2, count(*) AS c12 FROM pairs
            GROUP BY w1, w2 HAVING count(*) >= {PMI_MIN_COUNT}
        ),
        totals AS (
            SELECT (SELECT count(*) FROM pairs) AS np,
                   (SELECT sum(c) FROM uni) AS nt
        )
        SELECT b.w1, b.w2,
               CAST(b.c12 AS BIGINT) AS c12,
               CAST(u1.c AS BIGINT) AS c1,
               CAST(u2.c AS BIGINT) AS c2,
               {tq.lnu_sql("b.c12")} - {tq.lnu_sql("t.np")}
                   - {tq.lnu_sql("u1.c")} - {tq.lnu_sql("u2.c")}
                   + {tq.lnu_sql("t.nt")} + {tq.lnu_sql("t.nt")} AS pmi_u,
               CAST({tq.lnu_sql("b.c12")} - {tq.lnu_sql("t.np")}
                   - {tq.lnu_sql("u1.c")} - {tq.lnu_sql("u2.c")}
                   + {tq.lnu_sql("t.nt")} + {tq.lnu_sql("t.nt")} AS DOUBLE)
                   / {tq.LN_UNIT_SCALE} AS pmi
        FROM big b
        JOIN uni u1 ON u1.w = b.w1
        JOIN uni u2 ON u2.w = b.w2
        CROSS JOIN totals t
    """


def dataset_card_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATASET CARD -- the one-relation datasheet a curated corpus
    ships with (Gebru et al., 'Datasheets for Datasets'): corpus size
    in docs/tokens/chars, null and exact-duplicate counts, source and
    language breadth, plus the companion event/embedding table sizes.
    Every metric is an exact integer (the pinned whitespace-class
    tokenizer for tokens; md5-of-coalesced-text groups for exact
    dups), so the card is reproducible byte-for-byte across engines.

    Scale shape: one column-pruned scan per source table feeding
    partial-aggregated scalars (the dup metric's md5 groupBy is the
    only shuffle over documents); the per-table one-row frames union
    into the card -- no joins, no windows."""
    docs = table(spark, sf_dir, "documents")
    wlen = F.size(tq.words(F.coalesce(F.col("text"), F.lit(""))))
    doc_stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("text").isNull().cast("long")).alias("n_null_text"),
        F.sum(wlen.cast("long")).alias("n_tokens"),
        F.sum(F.length(F.coalesce(F.col("text"), F.lit("")))
              .cast("long")).alias("n_chars"),
        F.countDistinct("source").alias("n_sources"),
        F.countDistinct("lang").alias("n_langs"),
    )
    dup_stats = (
        docs.groupBy(F.md5(F.coalesce(F.col("text"), F.lit("")))
                     .alias("h"))
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.coalesce(F.sum(F.col("c") - 1), F.lit(0)).cast("long")
             .alias("n_exact_dup_docs"))
    )
    ev = table(spark, sf_dir, "events")
    ev_stats = ev.agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_event_users"),
        F.countDistinct("event_type").alias("n_event_types"),
    )
    emb = table(spark, sf_dir, "embeddings")
    emb_stats = emb.agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.sum(F.col("embedding").isNull().cast("long"))
        .alias("n_null_vectors"),
    )

    def unpivot(df: DataFrame, names: list[str]) -> DataFrame:
        rows = F.array(*[
            F.struct(F.lit(n).alias("metric"),
                     F.col(n).cast("long").alias("value"))
            for n in names
        ])
        return df.select(F.explode(rows).alias("r")).select(
            "r.metric", "r.value"
        )

    return (
        unpivot(doc_stats, ["n_docs", "n_null_text", "n_tokens",
                            "n_chars", "n_sources", "n_langs"])
        .unionByName(unpivot(dup_stats, ["n_exact_dup_docs"]))
        .unionByName(unpivot(ev_stats, ["n_events", "n_event_users",
                                        "n_event_types"]))
        .unionByName(unpivot(emb_stats, ["n_vectors", "n_null_vectors"]))
    )


def _dataset_card_oracle_sql() -> str:
    return f"""
        WITH doc_stats AS (
            SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_null_text,
                   CAST(sum(len({_W0_SQL})) AS BIGINT) AS n_tokens,
                   CAST(sum(length(coalesce(text, ''))) AS BIGINT)
                       AS n_chars,
                   CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
                   CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
            FROM documents
        ),
        dup_stats AS (
            SELECT CAST(coalesce(sum(c - 1), 0) AS BIGINT)
                       AS n_exact_dup_docs
            FROM (SELECT count(*) AS c FROM documents
                  GROUP BY md5(coalesce(text, '')))
        ),
        ev_stats AS (
            SELECT CAST(count(*) AS BIGINT) AS n_events,
                   CAST(count(DISTINCT user_id) AS BIGINT)
                       AS n_event_users,
                   CAST(count(DISTINCT event_type) AS BIGINT)
                       AS n_event_types
            FROM events
        ),
        emb_stats AS (
            SELECT CAST(count(*) AS BIGINT) AS n_vectors,
                   CAST(sum(CASE WHEN embedding IS NULL THEN 1 ELSE 0
                        END) AS BIGINT) AS n_null_vectors
            FROM embeddings
        )
        SELECT 'n_docs' AS metric, n_docs AS value FROM doc_stats
        UNION ALL SELECT 'n_null_text', n_null_text FROM doc_stats
        UNION ALL SELECT 'n_tokens', n_tokens FROM doc_stats
        UNION ALL SELECT 'n_chars', n_chars FROM doc_stats
        UNION ALL SELECT 'n_sources', n_sources FROM doc_stats
        UNION ALL SELECT 'n_langs', n_langs FROM doc_stats
        UNION ALL SELECT 'n_exact_dup_docs', n_exact_dup_docs
                  FROM dup_stats
        UNION ALL SELECT 'n_events', n_events FROM ev_stats
        UNION ALL SELECT 'n_event_users', n_event_users FROM ev_stats
        UNION ALL SELECT 'n_event_types', n_event_types FROM ev_stats
        UNION ALL SELECT 'n_vectors', n_vectors FROM emb_stats
        UNION ALL SELECT 'n_null_vectors', n_null_vectors FROM emb_stats
    """


# ---- canary contamination scan ---------------------------------------------

CANARY_K = 12     # distinct planted secrets
CANARY_MOD = 17   # every 17th doc carries one


def canary_contamination_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EVAL-CANARY LEAK SCAN (Carlini-style memorization canaries):
    given ``CANARY_K`` known secret strings -- here derived
    deterministically as ``canary-<md5('canary:'||i)>`` -- report, for
    EVERY canary, how many training documents contain it verbatim and
    the first contaminated doc id (NULL when clean). The driver corpus
    carries no secrets, so the query plants them inline (every
    ``CANARY_MOD``-th doc appends the canary ``(doc_id/17) % K``),
    identically in the oracle -- the scan itself is corpus-agnostic.

    Differs from keyword_tag_docs (token-exact dictionary terms,
    per-doc rows) and decontaminate_* (n-gram overlap vs a benchmark
    table): this is verbatim SUBSTRING search for a known closed
    secret set with a per-canary clean/contaminated verdict -- the
    eval-integrity report a training-data pipeline runs before a
    model ships.

    Scale shape: the canary set broadcasts (K rows); the scan is ONE
    map-side pass (K substring probes per doc, no explode, no token
    shuffle); the per-canary aggregate is a partial-aggregated
    groupBy to K rows, left-joined back so CLEAN canaries still
    report n_hits = 0 (the verdict the scan exists for)."""
    docs = table(spark, sf_dir, "documents")
    cid = (F.floor(F.col("doc_id") / CANARY_MOD).cast("long")
           % F.lit(CANARY_K)).cast("int")
    canary_str = F.concat(
        F.lit("canary-"),
        F.md5(F.concat(F.lit("canary:"), F.col("canary_id").cast("string"))),
    )
    planted = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % CANARY_MOD == 0,
            F.concat(
                F.coalesce(F.col("text"), F.lit("")), F.lit(" canary-"),
                F.md5(F.concat(F.lit("canary:"), cid.cast("string"))),
            ),
        ).otherwise(F.col("text")).alias("text"),
    )
    canaries = (
        spark.range(CANARY_K)
        .select(F.col("id").cast("int").alias("canary_id"))
        .select("canary_id", canary_str.alias("canary"))
    )
    hits = (
        planted.crossJoin(F.broadcast(canaries))
        .filter(F.instr(F.col("text"), F.col("canary")) > 0)
        .groupBy("canary_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"),
             F.min("doc_id").alias("first_doc_id"))
    )
    return (
        canaries.join(hits, "canary_id", "left")
        .select(
            "canary_id", "canary",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long")
            .alias("n_hits"),
            "first_doc_id",
            (F.coalesce(F.col("n_hits"), F.lit(0)) == 0)
            .alias("is_clean"),
        )
    )


def _canary_oracle_sql() -> str:
    return f"""
        WITH canaries AS (
            SELECT CAST(r.range AS INTEGER) AS canary_id,
                   'canary-' || md5('canary:' || CAST(r.range AS VARCHAR))
                       AS canary
            FROM range(0, {CANARY_K}) r
        ),
        planted AS (
            SELECT doc_id,
                   CASE WHEN doc_id % {CANARY_MOD} = 0 THEN
                       coalesce(text, '') || ' canary-' || md5('canary:' ||
                           CAST(CAST(doc_id // {CANARY_MOD} % {CANARY_K}
                                AS INTEGER) AS VARCHAR))
                   ELSE text END AS text
            FROM documents
        ),
        hits AS (
            SELECT c.canary_id,
                   CAST(count(*) AS BIGINT) AS n_hits,
                   min(p.doc_id) AS first_doc_id
            FROM planted p JOIN canaries c
              ON strpos(p.text, c.canary) > 0
            GROUP BY c.canary_id
        )
        SELECT c.canary_id, c.canary,
               CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
               h.first_doc_id,
               coalesce(h.n_hits, 0) = 0 AS is_clean
        FROM canaries c LEFT JOIN hits h ON c.canary_id = h.canary_id
    """


QUERIES = {
    "canary_contamination_scan": canary_contamination_scan,
    "dataset_card_report": dataset_card_report,
    "nextevent_training_pairs": nextevent_training_pairs,
    "pmi_collocations": pmi_collocations,
    "bpe_learn_merges": bpe_learn_merges,
    "bpe_encode_corpus": bpe_encode_corpus,
    "seqlen_bucketing": seqlen_bucketing,
    "span_corruption_pairs": span_corruption_pairs,
    "seq_len_histogram": seq_len_histogram,
    "intradoc_line_dedup": intradoc_line_dedup,
    "curriculum_quality_phases": curriculum_quality_phases,
    "lm_perplexity_score": lm_perplexity_score,
    "curate_corpus_e2e": curate_corpus_e2e,
    "domain_mixture_resample": domain_mixture_resample,
    "domain_cap_sample": domain_cap_sample,
    "boilerplate_sentence_dedup": boilerplate_sentence_dedup,
    "quality_tempered_sample": quality_tempered_sample,
    "gopher_quality_filters": gopher_quality_filters,
    "decontaminate_benchmark_overlap": decontaminate_benchmark_overlap,
    "pii_redaction": pii_redaction,
    "pack_concat_chunks": pack_concat_chunks,
    "pack_greedy_firstfit": pack_greedy_firstfit,
    "epoch_shuffle_shards": epoch_shuffle_shards,
}


def _top_frac_sql(k: int) -> str:
    g = (
        f"list_transform(range(1, len(w) - {k - 2}), "
        f"i -> array_to_string(list_slice(w, i, i + {k - 1}), ' '))"
    )
    return f"""
        round(CASE WHEN len(w) >= {k} THEN
            CAST(list_aggregate(list_transform(list_distinct({g}),
                     x -> len(list_filter({g}, y -> y = x))), 'max')
                 * {k} AS DOUBLE) / len(w)
        ELSE 0.0 END, 4)
    """


def _dup_frac_sql(k: int) -> str:
    g = (
        f"list_transform(range(1, len(w) - {k - 2}), "
        f"i -> array_to_string(list_slice(w, i, i + {k - 1}), ' '))"
    )
    c = (
        f"list_transform(list_distinct({g}), "
        f"x -> len(list_filter({g}, y -> y = x)))"
    )
    return f"""
        round(CASE WHEN len(w) >= {k} THEN
            least(1.0, CAST(coalesce(list_aggregate(
                       list_filter({c}, v -> v > 1), 'sum'), 0)
                  * {k} AS DOUBLE) / len(w))
        ELSE 0.0 END, 4)
    """


_PII_SYNTH_SQL = """
    SELECT doc_id, text
        || CASE WHEN doc_id % 3 = 0 THEN ' contact user'
                || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END
        || CASE WHEN doc_id % 5 = 0 THEN ' call 555-'
                || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
        || CASE WHEN doc_id % 7 = 0 THEN ' from 10.0.'
                || CAST(doc_id % 256 AS VARCHAR) || '.'
                || CAST(doc_id * 7 % 256 AS VARCHAR) ELSE '' END AS pt
    FROM documents
"""

_DECON_G_SQL = (
    f"list_transform(range(1, len(w) - {DECON_K - 2}), "
    f"i -> array_to_string(list_slice(w, i, i + {DECON_K - 1}), ' '))"
)

_BOILER_SYNTH_SQL = f"""
    SELECT doc_id,
           CASE WHEN doc_id % 4 = 0 THEN '{BOILER_HEADER} ' ELSE '' END
           || CASE WHEN doc_id % 6 = 0 THEN '{BOILER_FOOTER} ' ELSE '' END
           || text AS bt
    FROM documents
"""

_MIX_WTS_SQL = ", ".join(
    f"('{lang}', CAST({w} AS DOUBLE))" for lang, w in MIX_WEIGHTS
)

from .textstats import _hex_threshold as _lm_hex_threshold  # noqa: E402

_LM_THR = "'%s'" % _lm_hex_threshold(LM_SAMPLE_FRACTION)

ORACLE = {
    "canary_contamination_scan": _canary_oracle_sql(),
    "dataset_card_report": _dataset_card_oracle_sql(),
    "pmi_collocations": _pmi_oracle_sql(),
    "bpe_learn_merges": _bpe_merge_oracle_sql(),
    "bpe_encode_corpus": _bpe_encode_oracle_sql(),
    "seqlen_bucketing": _seqlen_oracle_sql(),
    "nextevent_training_pairs": _nextevent_oracle_sql(),
    "span_corruption_pairs": _span_corruption_oracle_sql(),
    "epoch_shuffle_shards": f"""
        WITH k AS (
            SELECT d.doc_id, e.epoch,
                   md5('epoch' || CAST(e.epoch AS VARCHAR) || ':'
                       || coalesce(CAST(d.doc_id AS VARCHAR), ''))
                       AS shuffle_key
            FROM documents d,
                 (SELECT unnest(range({SHUFFLE_EPOCHS})) AS epoch) e
        ),
        s AS (
            SELECT *, CAST(CAST('0x' || substr(shuffle_key, 1, 1) AS INT)
                       AS INTEGER) AS shard
            FROM k
        )
        SELECT CAST(epoch AS INTEGER) AS epoch, doc_id, shuffle_key, shard,
               CAST(row_number() OVER (
                   PARTITION BY epoch, shard
                   ORDER BY shuffle_key, doc_id) AS BIGINT) AS pos
        FROM s
    """,
    "seq_len_histogram": f"""
        WITH t AS (SELECT CAST(len({_W0_SQL}) AS BIGINT) AS tok
                   FROM documents),
        agg AS (
            SELECT CAST((tok // {SEQLEN_BUCKET}) * {SEQLEN_BUCKET} AS INT)
                       AS bucket_lo,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(tok) AS BIGINT) AS n_tokens
            FROM t GROUP BY 1
        ),
        tot AS (SELECT sum(n_docs) AS td, sum(n_tokens) AS tt FROM agg)
        SELECT bucket_lo, n_docs, n_tokens,
               round(n_docs / td, 6) AS doc_share,
               round(sum(n_docs) OVER (ORDER BY bucket_lo
                     ROWS UNBOUNDED PRECEDING) / td, 6) AS cum_doc_share,
               round(n_tokens / tt, 6) AS token_share
        FROM agg, tot
    """,
    "lm_perplexity_score": f"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+'),
                               x -> x <> '') AS w
            FROM documents
        ),
        train AS (
            SELECT * FROM toks
            WHERE substr(md5('lm:' || CAST(doc_id AS VARCHAR)), 1, 8)
                  < {_LM_THR}
        ),
        uni AS (
            SELECT u.term AS a, CAST(count(*) AS DOUBLE) AS c_a
            FROM train, unnest(w) AS u(term) GROUP BY 1
        ),
        vsize AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM uni),
        bi AS (
            SELECT u.p['a'] AS a, u.p['b'] AS b,
                   CAST(count(*) AS DOUBLE) AS c_ab
            FROM train, unnest(list_transform(range(1, len(w)),
                i -> struct_pack(a := w[i], b := w[i + 1]))) AS u(p)
            GROUP BY 1, 2 HAVING count(*) >= {LM_MIN_BIGRAM}
        ),
        pairs AS (
            SELECT doc_id, u.p['a'] AS a, u.p['b'] AS b
            FROM toks, unnest(list_transform(range(1, len(w)),
                i -> struct_pack(a := w[i], b := w[i + 1]))) AS u(p)
        ),
        scored AS (
            SELECT p.doc_id,
                   ln((coalesce(bi.c_ab, 0) + {LM_K})
                      / (coalesce(uni.c_a, 0) + {LM_K} * v.v)) AS lp
            FROM pairs p
            LEFT JOIN uni ON p.a = uni.a
            LEFT JOIN bi ON p.a = bi.a AND p.b = bi.b, vsize v
        )
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
               round(exp(-avg(lp)), 4) AS ppl
        FROM scored GROUP BY doc_id
    """,
    "domain_cap_sample": f"""
        SELECT doc_id, source, pick_rank FROM (
            SELECT doc_id, source,
                   row_number() OVER (
                       PARTITION BY source
                       ORDER BY md5('cap:' || CAST(doc_id AS VARCHAR)), doc_id
                   ) AS pick_rank
            FROM documents
        ) WHERE pick_rank <= {DOMAIN_CAP}
    """,
    "domain_mixture_resample": f"""
        WITH counts AS (
            SELECT lang, CAST(count(*) AS DOUBLE) AS n_domain
            FROM documents GROUP BY 1
        ),
        tot AS (SELECT sum(n_domain) AS n_total FROM counts),
        wts(lang, w) AS (VALUES {_MIX_WTS_SQL}),
        rates AS (
            SELECT c.lang, w * n_total / n_domain AS rate
            FROM counts c JOIN wts USING (lang) CROSS JOIN tot
        ),
        per AS (
            SELECT doc_id, d.lang, rate,
                   CAST(('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 8))
                        AS BIGINT) / 4294967296.0 AS u
            FROM documents d JOIN rates USING (lang)
        ),
        cop AS (
            SELECT doc_id, lang, round(rate, 6) AS mix_rate,
                   CAST(floor(rate) AS BIGINT)
                   + CASE WHEN u < rate - floor(rate) THEN 1 ELSE 0 END
                       AS n_copies
            FROM per
        )
        SELECT doc_id, lang, mix_rate, n_copies,
               unnest(range(1, n_copies + 1)) AS copy
        FROM cop WHERE n_copies > 0
    """,
    # keep-first-occurrence == row_number() over (doc, sent) by pos
    "intradoc_line_dedup": f"""
        WITH d AS (SELECT doc_id,
                          list_filter(string_split_regex(trim(text), '[ \\t\\n\\x0B\\f\\r]+'),
                                      x -> x <> '') AS w0
                   FROM documents),
        p AS (SELECT doc_id,
                     array_to_string(list_slice(w0, 1, {INTRA_BASE_W}), ' ')
                     || CASE WHEN doc_id % 3 = 0 THEN ' ' ||
                            array_to_string(list_slice(w0, 1, {SENT_W}), ' ')
                        ELSE '' END
                     || CASE WHEN doc_id % 9 = 0 THEN ' ' ||
                            array_to_string(list_slice(w0, 1, {SENT_W}), ' ')
                        ELSE '' END AS bt
              FROM d),
        t AS (SELECT doc_id,
                     list_filter(string_split_regex(trim(bt), '[ \\t\\n\\x0B\\f\\r]+'),
                                 x -> x <> '') AS w
              FROM p),
        s AS (SELECT doc_id, u.i AS pos,
                     array_to_string(list_slice(
                         w, u.i * {SENT_W} + 1, u.i * {SENT_W} + {SENT_W}),
                         ' ') AS sent
              FROM t, unnest(range(0, (len(w) - 1) // {SENT_W} + 1)) AS u(i)
              WHERE len(w) > 0),
        f AS (SELECT doc_id, pos, sent,
                     row_number() OVER (PARTITION BY doc_id, sent
                                        ORDER BY pos) AS occ
              FROM s)
        -- LEFT JOIN from the doc relation: a wordless doc must still
        -- emit (0, 0, md5('')) exactly as the Spark side does
        SELECT t.doc_id,
               CAST(count(f.sent) AS INTEGER) AS n_sents,
               CAST(coalesce(sum(CASE WHEN occ > 1 THEN 1 ELSE 0 END), 0)
                    AS INTEGER) AS n_dup_sents,
               md5(coalesce(string_agg(CASE WHEN occ = 1 THEN sent END,
                                       ' ' ORDER BY pos), '')) AS clean_md5
        FROM t LEFT JOIN f USING (doc_id) GROUP BY t.doc_id
    """,
    "boilerplate_sentence_dedup": f"""
        WITH p AS ({_BOILER_SYNTH_SQL}),
        t AS (SELECT doc_id,
                     list_filter(string_split_regex(trim(bt), '[ \\t\\n\\x0B\\f\\r]+'),
                                 x -> x <> '') AS w
              FROM p),
        s AS (SELECT doc_id, u.i AS pos,
                     array_to_string(list_slice(
                         w, u.i * {SENT_W} + 1, u.i * {SENT_W} + {SENT_W}),
                         ' ') AS sent
              FROM t, unnest(range(0, (len(w) - 1) // {SENT_W} + 1)) AS u(i)
              WHERE len(w) > 0),
        b AS (SELECT sent FROM s GROUP BY sent
              HAVING count(DISTINCT doc_id) >= {BOILER_MIN_DOCS}),
        f AS (SELECT s.doc_id, s.pos, s.sent,
                     CASE WHEN b.sent IS NOT NULL THEN 1 ELSE 0 END AS boiler
              FROM s LEFT JOIN b USING (sent))
        SELECT doc_id,
               CAST(count(*) AS INTEGER) AS n_sents,
               CAST(sum(boiler) AS INTEGER) AS n_boiler_sents,
               md5(coalesce(string_agg(CASE WHEN boiler = 0 THEN sent END,
                                       ' ' ORDER BY pos), '')) AS clean_md5
        FROM f GROUP BY doc_id
    """,
    "curriculum_quality_phases": f"""
        WITH t AS (SELECT doc_id, {_W0_SQL} AS w FROM documents),
        s AS (SELECT doc_id,
                     round(CAST(len(list_distinct(w)) AS DOUBLE)
                           / nullif(CAST(len(w) AS DOUBLE), 0.0), 6)
                         AS score
              FROM t),
        b AS (SELECT list_transform(
                  quantile_cont(score,
                      [{", ".join(str(i / CURR_PHASES)
                                  for i in range(1, CURR_PHASES))}]),
                  x -> round(x, 6)) AS bs
              FROM s)
        SELECT doc_id, score,
               CAST(1 + len(list_filter(bs, x -> score > x)) AS INTEGER)
                   AS phase,
               md5('curr:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
        FROM s, b
    """,
    "quality_tempered_sample": f"""
        WITH t AS (SELECT doc_id, {_W0_SQL} AS w FROM documents),
        m AS (
            SELECT doc_id,
                   round(CAST(len(list_distinct(w)) AS DOUBLE)
                         / nullif(CAST(len(w) AS DOUBLE), 0.0), 6)
                       AS uniq_ratio,
                   round({TSAMP_BASE} * pow(
                       CAST(len(list_distinct(w)) AS DOUBLE)
                       / nullif(CAST(len(w) AS DOUBLE), 0.0),
                       {1.0 / TSAMP_T}), 6) AS keep_p,
                   round(CAST(CAST('0x' || substr(
                       md5('tsamp:' || CAST(doc_id AS VARCHAR)), 1, 8)
                       AS UBIGINT) AS DOUBLE) / 4294967296.0, 6) AS draw
            FROM t
        )
        SELECT doc_id, uniq_ratio, keep_p, draw,
               CAST(coalesce(draw < keep_p, false) AS INTEGER) AS kept
        FROM m
    """,
    "gopher_quality_filters": f"""
        WITH t AS (SELECT doc_id, text, {_W0_SQL} AS w
                   FROM documents),
        m AS (
            SELECT doc_id,
                   CAST(len(w) AS INTEGER) AS n_words,
                   round(CAST(list_aggregate(list_transform(w,
                              x -> length(x)), 'sum') AS DOUBLE)
                         / nullif(CAST(len(w) AS DOUBLE), 0.0), 4)
                       AS mean_word_len,
                   CAST(len(list_intersect(w, {STOP_EN!r})) AS INTEGER)
                       AS n_stopwords,
                   round(CAST(len(list_filter(w,
                              x -> regexp_matches(x, '[A-Za-z]')))
                         AS DOUBLE) / nullif(CAST(len(w) AS DOUBLE), 0.0),
                         4) AS alpha_word_frac,
                   {_top_frac_sql(2)} AS top_2gram_frac,
                   {_top_frac_sql(3)} AS top_3gram_frac,
                   {_dup_frac_sql(5)} AS dup_5gram_frac
            FROM t
        )
        SELECT *, CAST(n_words >= {MIN_WORDS} AND n_words <= {MAX_WORDS}
               AND mean_word_len >= {MIN_MEAN_WORD_LEN}
               AND mean_word_len <= {MAX_MEAN_WORD_LEN}
               AND n_stopwords >= {MIN_STOPWORDS}
               AND alpha_word_frac >= {MIN_ALPHA_FRAC}
               AND top_2gram_frac <= {MAX_TOP2_FRAC}
               AND top_3gram_frac <= {MAX_TOP3_FRAC}
               AND dup_5gram_frac <= {MAX_DUP5_FRAC} AS INTEGER) AS keep
        FROM m
    """,
    "decontaminate_benchmark_overlap": f"""
        WITH t AS (SELECT doc_id, {_W_SQL} AS w FROM documents),
        g AS (SELECT doc_id, list_distinct({_DECON_G_SQL}) AS grams
              FROM t WHERE len(w) >= {DECON_K}),
        e AS (SELECT doc_id, u.gram FROM g, unnest(grams) AS u(gram)),
        bench AS (SELECT DISTINCT gram FROM e WHERE doc_id % {BENCH_MOD} = 0)
        SELECT e.doc_id, count(*) AS n_overlap_ngrams
        FROM e JOIN bench USING (gram)
        WHERE e.doc_id % {BENCH_MOD} <> 0
        GROUP BY e.doc_id
    """,
    "pii_redaction": f"""
        WITH p AS ({_PII_SYNTH_SQL}),
        c AS (
            SELECT doc_id,
                   CAST(len(regexp_extract_all(pt, '{EMAIL_RE}'))
                        AS INTEGER) AS n_emails,
                   CAST(len(regexp_extract_all(pt, '{PHONE_RE}'))
                        AS INTEGER) AS n_phones,
                   CAST(len(regexp_extract_all(pt, '{IP_RE}'))
                        AS INTEGER) AS n_ips,
                   md5(regexp_replace(regexp_replace(regexp_replace(pt,
                       '{EMAIL_RE}', '<EMAIL>', 'g'),
                       '{IP_RE}', '<IP>', 'g'),
                       '{PHONE_RE}', '<PHONE>', 'g')) AS redacted_md5
            FROM p
        )
        SELECT doc_id, n_emails, n_phones, n_ips,
               CAST(n_emails + n_phones + n_ips > 0 AS INTEGER) AS has_pii,
               redacted_md5
        FROM c
    """,
    "pack_concat_chunks": f"""
        WITH t AS (SELECT doc_id, doc_id // {PACK_SHARD} AS shard,
                          CAST(len({_W0_SQL}) AS INTEGER) AS tok
                   FROM documents),
        c AS (SELECT doc_id, shard, tok,
                     CAST(sum(tok) OVER (PARTITION BY shard ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_end
              FROM t)
        SELECT doc_id, shard, tok,
               cum_end - tok AS tok_start,
               (cum_end - tok) // {PACK_CAP} AS first_seq,
               CASE WHEN tok > 0 THEN (cum_end - 1) // {PACK_CAP}
                    ELSE (cum_end - tok) // {PACK_CAP} END AS last_seq,
               CASE WHEN tok > 0 THEN (cum_end - 1) // {PACK_CAP}
                    ELSE (cum_end - tok) // {PACK_CAP} END
                   - (cum_end - tok) // {PACK_CAP} + 1 AS n_seqs
        FROM c
    """,
    "pack_greedy_firstfit": f"""
        WITH RECURSIVE t AS (
            SELECT doc_id, doc_id // {PACK_SHARD} AS shard,
                   CAST(len({_W0_SQL}) AS INTEGER) AS tok,
                   row_number() OVER (PARTITION BY doc_id // {PACK_SHARD}
                                      ORDER BY doc_id) AS rn
            FROM documents
        ),
        r AS (
            SELECT shard, rn, doc_id, tok,
                   0 AS bin_seq, tok AS fill
            FROM t WHERE rn = 1
            UNION ALL
            SELECT t.shard, t.rn, t.doc_id, t.tok,
                   CASE WHEN r.fill + t.tok > {PACK_CAP}
                        THEN r.bin_seq + 1 ELSE r.bin_seq END,
                   CASE WHEN r.fill + t.tok > {PACK_CAP}
                        THEN t.tok ELSE r.fill + t.tok END
            FROM r JOIN t ON t.shard = r.shard AND t.rn = r.rn + 1
        )
        SELECT doc_id, shard, tok, CAST(bin_seq AS INTEGER) AS bin_seq
        FROM r
    """,
}

# the e2e oracle composes the component oracles verbatim as derived
# tables (DuckDB accepts WITH inside parenthesized subqueries), so the
# pipeline can never drift from its stages
ORACLE["curate_corpus_e2e"] = f"""
    WITH g AS (SELECT doc_id, n_words
               FROM ({ORACLE["gopher_quality_filters"]}) WHERE keep = 1),
    canon AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
    cont AS (SELECT doc_id FROM ({ORACLE["decontaminate_benchmark_overlap"]})),
    samp AS (SELECT doc_id FROM ({ORACLE["quality_tempered_sample"]})
             WHERE kept = 1),
    surv AS (
        SELECT g.doc_id, g.doc_id // {PACK_SHARD} AS shard,
               g.n_words AS tok
        FROM g JOIN canon USING (doc_id) JOIN samp USING (doc_id)
        WHERE g.doc_id % {BENCH_MOD} <> 0
          AND g.doc_id NOT IN (SELECT doc_id FROM cont)
    ),
    c AS (SELECT doc_id, shard, tok,
                 CAST(sum(tok) OVER (PARTITION BY shard ORDER BY doc_id
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_end
          FROM surv)
    SELECT doc_id, shard, tok,
           cum_end - tok AS tok_start,
           (cum_end - tok) // {PACK_CAP} AS first_seq,
           CASE WHEN tok > 0 THEN (cum_end - 1) // {PACK_CAP}
                ELSE (cum_end - tok) // {PACK_CAP} END AS last_seq
    FROM c
"""
