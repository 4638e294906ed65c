"""Model-scored data selection: a hashing-trick linear quality
classifier and per-source token-budget sampling.

Reference parity: the reference gates documents with hand-written
predicates only (``doc-ingest-chat/processors/text_utils.py`` --
F1-F9 in SURVEY.md section 2.4). A production pretraining pipeline
adds a LEARNED gate (fastText-style linear classifier over hashed
bag-of-words features: the CCNet / GPT-3 "quality classifier" stage)
and a BUDGETED selection step (take documents per domain until a
token budget is hit, not a document count -- tokens are what the
training run actually consumes). Both are implemented here as pure
codegen column pipelines with exact integer scores, so the DuckDB
oracle matches bit-for-bit (docs/ROUNDING.md rule 1: never round --
keep integers end to end).

The classifier's weight table is DERIVED, not trained: weight(bucket)
is an integer LCG mix of the bucket id. That keeps the operator fully
deterministic and cross-engine checkable while exercising the exact
shape of a real scorer (tokenize -> feature-hash -> gather weights ->
sum -> threshold); swapping in trained weights is a broadcast join
against a (bucket, weight) table with the same plan.

Scale shape: both operators are one pass over a pruned column scan.
The classifier explodes features but partially aggregates on doc_id
map-side (every feature of a doc lives in the doc's own row, so the
combine collapses to one row per doc before any shuffle). The budget
sampler's only shuffle is the per-source window -- source cardinality
is the partition key, heavy text columns are pruned before the
exchange, and the running sum is a streaming frame, never a global
sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text_quality as tq
from ..sources.tables import rebalance, table
from .pretrain import gram_array
from .textstats import _W_SQL

QC_BUCKETS = 4096          # feature-hash table size
_QC_A = 2_654_435_761      # Knuth multiplicative mix (same family as ml.py)
_QC_B = 1_013_904_223
_QC_MOD = 4_294_967_296    # 2^32
QC_WSPAN = 2001            # weights land in [-1000, 1000]

TOKEN_BUDGET = 2000        # per-source token budget


def _bucket(feat):
    """Feature -> hash bucket: first 8 md5 hex chars as an integer,
    mod the table size. md5 is whole-stage codegen in Spark and
    native in DuckDB; the hex parse is ``conv`` / ``'0x' ||`` cast --
    the engine-stable draw already used by the sampling family."""
    return (
        F.conv(F.substring(F.md5(feat), 1, 8), 16, 10).cast("long")
        % QC_BUCKETS
    )


def _weight(bucket):
    """Deterministic integer weight for a bucket: one LCG mix, mapped
    to [-1000, 1000]. Exact BIGINT arithmetic in both engines."""
    return (
        (bucket * _QC_A + _QC_B) % _QC_MOD
    ) % QC_WSPAN - (QC_WSPAN - 1) // 2


def classify_quality(docs: DataFrame) -> DataFrame:
    """Hashed-linear quality score per document: features are the
    unigrams plus bigrams of the whitespace tokenization (the
    fastText default), each hashed to one of ``QC_BUCKETS`` weights,
    and the document score is the exact integer sum over feature
    OCCURRENCES (not distinct features -- counts carry signal).
    ``keep = score_u > 0`` is the gate a curation pass filters on.

    NULL/empty text scores 0 with 0 features and is NOT kept (same
    "NULL text is an empty document" contract as the Gopher filters).
    """
    feats = tq.let(
        tq.words(F.col("text")),
        lambda w: F.concat(w, gram_array("text", 2)),
    )
    exploded = (
        docs.select(
            "doc_id",
            F.explode_outer(
                F.coalesce(feats, F.array().cast("array<string>"))
            ).alias("feat"),
        )
        .select("doc_id", "feat", _weight(_bucket(F.col("feat"))).alias("w"))
    )
    return (
        exploded.groupBy("doc_id")
        .agg(
            F.count("feat").cast("int").alias("n_feats"),
            F.coalesce(F.sum("w"), F.lit(0)).cast("long").alias("score_u"),
        )
        .select(
            "doc_id", "n_feats", "score_u",
            (F.col("score_u") > 0).alias("keep"),
        )
    )


def quality_classifier_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry binding of :func:`classify_quality` over the documents
    table (rebalanced: the per-row tokenize + gram build is the
    CPU-heavy part and a single local row group would serialize it)."""
    return classify_quality(
        rebalance(table(spark, sf_dir, "documents")).select("doc_id", "text")
    )


def _qc_oracle_sql() -> str:
    bigrams = (
        "list_transform(range(1, len(w)), "
        "i -> w[i] || ' ' || w[i + 1])"
    )
    return f"""
        WITH toks AS (
            SELECT doc_id, {_W_SQL} AS w FROM documents
        ),
        f AS (
            SELECT doc_id,
                   coalesce(list_concat(w,
                       CASE WHEN len(w) >= 2 THEN {bigrams}
                            ELSE [] END), []) AS feats
            FROM toks
        ),
        e AS (
            SELECT doc_id, u.feat
            FROM (SELECT doc_id,
                         CASE WHEN len(feats) = 0
                              THEN [CAST(NULL AS VARCHAR)]
                              ELSE feats END AS feats
                  FROM f),
                 unnest(feats) AS u(feat)
        ),
        s AS (
            SELECT doc_id, feat,
                   ((CAST('0x' || substr(md5(feat), 1, 8) AS BIGINT)
                     % {QC_BUCKETS}) * {_QC_A} + {_QC_B})
                   % {_QC_MOD} % {QC_WSPAN} - {(QC_WSPAN - 1) // 2} AS w
            FROM e
        )
        SELECT doc_id,
               CAST(count(feat) AS INTEGER) AS n_feats,
               CAST(coalesce(sum(w), 0) AS BIGINT) AS score_u,
               coalesce(sum(w), 0) > 0 AS keep
        FROM s GROUP BY doc_id
    """


def budget_sample(docs: DataFrame, budget: int = TOKEN_BUDGET) -> DataFrame:
    """Per-source TOKEN-budget selection: documents are ordered by a
    deterministic md5 draw within their source and taken greedily
    until the source's running token total reaches ``budget`` (the
    first document to cross the line is still taken -- every source
    reaches its budget rather than undershooting). Token cost is the
    whitespace token count; NULL text costs 0 tokens (free to keep,
    same empty-document contract as everywhere else).

    The membership is stable under re-runs and under insertions into
    OTHER sources (the draw is keyed on doc_id alone), which is what
    makes the sample reproducible across incremental crawl batches.

    Skew note: the window partitions by ``source``, so a pathological
    single-source corpus serializes the running sum onto one task.
    That is inherent to the per-source-budget semantics (the running
    total is a sequential dependency within a source); for a corpus
    known to be single-source, shard the source key upstream
    (``source || '/' || pmod(hash(doc_id), N)``) and give each shard
    ``budget / N``.
    """
    h = F.md5(F.concat(F.lit("budget:"), F.col("doc_id").cast("string")))
    # tokenize the COALESCED text (pretrain.py convention): size(null)
    # is NULL under ANSI but -1 under legacy sizeOfNull, and a -1 would
    # silently corrupt the running budget; words('') is [] → 0 under
    # both semantics, so the result never depends on ansi.enabled.
    n_tok = F.size(tq.words(F.coalesce(F.col("text"), F.lit("")))).cast("long")
    w = Window.partitionBy("source").orderBy(h.alias("h"), "doc_id")
    cum = F.sum("n_tokens").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        docs.select("doc_id", "source", n_tok.alias("n_tokens"))
        .select(
            "doc_id", "source", "n_tokens",
            cum.alias("cum_tokens"),
            F.row_number().over(w).cast("int").alias("pick_rank"),
        )
        .filter(F.col("cum_tokens") - F.col("n_tokens") < budget)
    )


def token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return budget_sample(table(spark, sf_dir, "documents"))


def _budget_oracle_sql() -> str:
    return f"""
        WITH t AS (
            SELECT doc_id, source,
                   CAST(coalesce(len({_W_SQL}), 0) AS BIGINT) AS n_tokens,
                   md5('budget:' || CAST(doc_id AS VARCHAR)) AS h
            FROM documents
        ),
        c AS (
            SELECT doc_id, source, n_tokens,
                   sum(n_tokens) OVER (
                       PARTITION BY source ORDER BY h, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS cum_tokens,
                   CAST(row_number() OVER (
                       PARTITION BY source ORDER BY h, doc_id
                   ) AS INTEGER) AS pick_rank
            FROM t
        )
        SELECT doc_id, source, n_tokens,
               CAST(cum_tokens AS BIGINT) AS cum_tokens, pick_rank
        FROM c
        WHERE cum_tokens - n_tokens < {TOKEN_BUDGET}
    """


DSIR_B = 1024              # hashed unigram buckets for the bag models
DSIR_TARGET_LANG = "en"    # the "target domain" slice of the corpus
DSIR_LN_SCALE = tq.LN_UNIT_SCALE  # log-weights in exact 1e-6 units

_lnu = tq.lnu          # once-rounded ln in BIGINT 1e-6 units
_lnu_sql = tq.lnu_sql  # (shared contract helper, functions/text_quality)


def dsir_weights(docs: DataFrame, target_lang: str = DSIR_TARGET_LANG,
                 buckets: int = DSIR_B) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document
    by the log-likelihood ratio of a hashed-unigram bag model of the
    TARGET slice (here the ``target_lang`` documents) against the
    model of the RAW corpus -- the standard way to tilt a web-scale
    crawl toward a target domain without training anything. Weight =
    sum over the doc's tokens of ``ln p_target(bucket) -
    ln p_raw(bucket)`` with add-one smoothing over the fixed bucket
    table.

    Exactness: each ln() is rounded once into BIGINT 1e-6 units
    (:func:`_lnu`); the per-bucket log-ratio and the per-document sum
    are then pure integer arithmetic, so the result is bit-identical
    across engines and independent of summation order -- the property
    a cluster-wide shuffle cannot be trusted to preserve for floats.

    Scale shape: the only large objects are the token explode and one
    doc_id re-aggregation (map-side combined -- a doc's tokens
    co-reside in its input row). Both bag models collapse to
    ``buckets`` rows (fixed, tiny) and join back BROADCAST; the
    corpus-level totals ride along as a broadcast scalar row. Nothing
    driver-side, nothing all-pairs."""
    terms = docs.select(
        "doc_id", "lang",
        F.explode(tq.words(F.coalesce(F.col("text"), F.lit(""))))
        .alias("term"),
    ).select(
        "doc_id", "lang",
        (F.conv(F.substring(F.md5(F.col("term")), 1, 8), 16, 10)
         .cast("long") % buckets).cast("int").alias("b"),
    )
    spark = docs.sparkSession
    grid = spark.range(buckets).select(F.col("id").cast("int").alias("b"))
    # when(...) not a bare boolean cast: a NULL lang must count as
    # "not target" (0), matching the oracle's CASE, not propagate NULL
    is_t = F.when(F.col("lang") == target_lang, 1).otherwise(0)
    # ONE bucket-grain pass carries both bag models (cr = all tokens,
    # ct = target-slice tokens -- a conditional sum over the same
    # rows), and the corpus totals are EXACT sums of that tiny table
    # (every token lands in exactly one bucket), so the former three
    # separate corpus passes (ct, cr, totals) collapse to one; the
    # lazy localCheckpoint keeps the B-row bag from re-running the
    # token explode for the totals aggregate. A missing bucket now
    # carries ct = 0 instead of a left-join NULL -- identical through
    # the downstream coalesce(ct, 0).
    bag = (
        terms.groupBy("b")
        .agg(
            F.count(F.lit(1)).alias("cr"),
            F.sum(is_t.cast("long")).alias("ct"),
        )
        .localCheckpoint(eager=False)
    )
    totals = bag.agg(
        F.sum("ct").alias("nt"),
        F.coalesce(F.sum("cr"), F.lit(0)).alias("nr"),
    )
    lr = (
        grid.join(F.broadcast(bag), "b", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "b",
            (_lnu(F.coalesce(F.col("ct"), F.lit(0)) + 1)
             - _lnu(F.coalesce(F.col("cr"), F.lit(0)) + 1)
             + _lnu(F.coalesce(F.col("nr"), F.lit(0)) + buckets)
             - _lnu(F.coalesce(F.col("nt"), F.lit(0)) + buckets)
             ).alias("lr_u"),
        )
    )
    scored = (
        terms.join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_terms"),
            F.sum("lr_u").alias("weight_u"),
        )
    )
    return (
        docs.select("doc_id", "lang", "source")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id", "source",
            F.when(F.col("lang") == target_lang, 1).otherwise(0)
            .cast("int").alias("is_target"),
            F.coalesce("n_terms", F.lit(0)).cast("int").alias("n_terms"),
            F.coalesce("weight_u", F.lit(0)).cast("long").alias("weight_u"),
            (F.coalesce("weight_u", F.lit(0)).cast("double")
             / DSIR_LN_SCALE).alias("log_weight"),
        )
    )


def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dsir_weights(rebalance(table(spark, sf_dir, "documents")))


def _dsir_oracle_sql() -> str:
    b = DSIR_B
    return f"""
        WITH terms AS (
            SELECT doc_id, lang,
                   CAST(CAST('0x' || substr(md5(u.term), 1, 8) AS BIGINT)
                        % {b} AS INTEGER) AS b
            FROM (
                SELECT doc_id, lang,
                       list_filter(string_split_regex(
                           trim(coalesce(text, '')),
                           '[ \\t\\n\\x0B\\f\\r]+'), x -> x <> '') AS ws
                FROM documents
            ), unnest(ws) AS u(term)
        ),
        ct AS (
            SELECT b, count(*) AS ct FROM terms
            WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY b
        ),
        cr AS (SELECT b, count(*) AS cr FROM terms GROUP BY b),
        totals AS (
            SELECT sum(CASE WHEN lang = '{DSIR_TARGET_LANG}'
                            THEN 1 ELSE 0 END) AS nt,
                   count(*) AS nr
            FROM terms
        ),
        lr AS (
            SELECT CAST(g.b AS INTEGER) AS b,
                   {_lnu_sql("coalesce(ct.ct, 0) + 1")}
                   - {_lnu_sql("coalesce(cr.cr, 0) + 1")}
                   + {_lnu_sql(f"coalesce(t.nr, 0) + {b}")}
                   - {_lnu_sql(f"coalesce(t.nt, 0) + {b}")} AS lr_u
            FROM range({b}) AS g(b)
            LEFT JOIN ct ON ct.b = g.b
            LEFT JOIN cr ON cr.b = g.b
            CROSS JOIN totals t
        ),
        scored AS (
            SELECT doc_id, CAST(count(*) AS INTEGER) AS n_terms,
                   CAST(sum(lr.lr_u) AS BIGINT) AS weight_u
            FROM terms JOIN lr USING (b)
            GROUP BY doc_id
        )
        SELECT d.doc_id, d.source,
               CASE WHEN d.lang = '{DSIR_TARGET_LANG}'
                    THEN 1 ELSE 0 END AS is_target,
               coalesce(s.n_terms, 0) AS n_terms,
               coalesce(s.weight_u, 0) AS weight_u,
               CAST(coalesce(s.weight_u, 0) AS DOUBLE) / {DSIR_LN_SCALE}
                   AS log_weight
        FROM documents d LEFT JOIN scored s USING (doc_id)
    """


STRAT_NUM, STRAT_DEN = 1, 10   # exact 10% holdout, allocated exactly


def stratified_split(docs: DataFrame, num: int = STRAT_NUM,
                     den: int = STRAT_DEN) -> DataFrame:
    """STRATIFIED holdout split with EXACT largest-remainder
    allocation: the global holdout is exactly ``floor(N * num/den)``
    documents, apportioned across sources by the Hamilton method
    (each source gets ``floor(n_s * num/den)``, the leftover seats go
    to the largest remainders, ties to the lexicographically smaller
    source) -- the contract hash-threshold splitting cannot give
    (per-source counts there are only correct in expectation, and a
    small stratum can lose its entire holdout by chance). Which
    documents fill a source's quota is the engine-stable md5 draw, so
    the split is deterministic and content-independent.

    All quota arithmetic is integer; nothing is float anywhere.

    Scale shape: per-source counts are a tiny aggregate; the seat
    assignment is one window over SOURCE-cardinality rows (thousands
    at most -- bounded, documented); the only corpus-scale work is
    the per-source rank window, partitioned on source exactly like
    :func:`budget_sample` (same skew note applies)."""
    sizes = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    tot = sizes.agg(
        F.expr(f"sum(n) * {num} div {den}").alias("total_seats"),
        F.sum(F.expr(f"n * {num} div {den}")).alias("base_seats"),
    )
    wrem = Window.orderBy(
        F.desc(F.expr(f"(n * {num}) % {den}")), F.asc("source")
    )
    quotas = (
        sizes.crossJoin(F.broadcast(tot))
        .withColumn("rr", F.row_number().over(wrem))
        .select(
            "source",
            (F.expr(f"n * {num} div {den}")
             + (F.col("rr") <= F.col("total_seats") - F.col("base_seats"))
             .cast("long")).alias("quota"),
        )
    )
    wpick = Window.partitionBy("source").orderBy(
        F.md5(F.concat(F.lit("strat:"), F.col("doc_id").cast("string"))),
        "doc_id",
    )
    return (
        docs.select("doc_id", "source")
        .withColumn("pick", F.row_number().over(wpick))
        .join(F.broadcast(quotas), "source")
        .select(
            "doc_id", "source",
            F.when(F.col("pick") <= F.col("quota"), F.lit("val"))
            .otherwise(F.lit("train")).alias("split"),
        )
    )


def stratified_holdout_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stratified_split(rebalance(table(spark, sf_dir, "documents")))


def _strat_oracle_sql() -> str:
    n, d = STRAT_NUM, STRAT_DEN
    return f"""
        WITH sizes AS (
            SELECT source, count(*) AS n FROM documents GROUP BY source
        ),
        tot AS (
            SELECT CAST(sum(n) * {n} // {d} AS BIGINT) AS total_seats,
                   CAST(sum(n * {n} // {d}) AS BIGINT) AS base_seats
            FROM sizes
        ),
        quotas AS (
            SELECT source,
                   n * {n} // {d}
                   + CASE WHEN row_number() OVER (
                         ORDER BY (n * {n}) % {d} DESC, source ASC)
                       <= t.total_seats - t.base_seats
                     THEN 1 ELSE 0 END AS quota
            FROM sizes CROSS JOIN tot t
        ),
        picked AS (
            SELECT doc_id, source,
                   row_number() OVER (
                       PARTITION BY source
                       ORDER BY md5('strat:' || CAST(doc_id AS VARCHAR)),
                                doc_id) AS pick
            FROM documents
        )
        SELECT p.doc_id, p.source,
               CASE WHEN p.pick <= q.quota THEN 'val' ELSE 'train' END
                   AS split
        FROM picked p JOIN quotas q USING (source)
    """


ES_K = 64                  # weighted sample size
_ES_U_DEN = 4_294_967_296  # 2^32: the md5-derived uniform's denominator
ES_KEY_SCALE = 1_000_000   # key precision under the integer division


def weighted_sample(docs: DataFrame, k: int = ES_K) -> DataFrame:
    """WEIGHTED sampling without replacement (Efraimidis & Spirakis
    2006): each document draws a deterministic uniform u from the
    engine-stable md5 hash and competes with key ``ln(u) / w`` (the
    log form of u^(1/w)); the global top-``k`` keys ARE a weighted
    sample without replacement -- how a curation stack takes "2k docs
    biased toward length/quality" in ONE distributed pass with no
    sequential reservoir. Weight here is the document's character
    count (floored at 1), the same proxy the budget sampler uses.

    Exactness: ln(u) is carried in once-rounded BIGINT 1e-6 units
    (``tq.lnu``) and the division by the weight is BIGINT truncating
    division -- the whole key is integer, so the top-k frontier is
    bit-identical across engines (docs/ROUNDING.md rule 1).

    Scale shape: key computation is map-only; the global top-k is a
    sort-LIMIT (Spark's distributed TakeOrderedAndProject -- per-
    partition heaps, never a single-partition global window); the
    rank label is a window over the k surviving rows only."""
    keyed = docs.select(
        "doc_id", "source",
        F.greatest(F.col("n_chars").cast("long"), F.lit(1)).alias("w"),
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("es:"), F.col("doc_id").cast("string"))),
                1, 8),
            16, 10,
        ).cast("long").alias("h"),
    ).select(
        "doc_id", "source", "w",
        F.expr(
            f"(({tq_lnu_expr('h + 1')} - {tq_lnu_expr(str(_ES_U_DEN))})"
            f" * {ES_KEY_SCALE}) div w"
        ).alias("key_u"),
    )
    top = keyed.orderBy(F.desc("key_u"), F.asc("doc_id")).limit(k)
    wr = Window.orderBy(F.desc("key_u"), F.asc("doc_id"))
    return top.withColumn(
        "rank", F.row_number().over(wr).cast("int")
    )


def tq_lnu_expr(x: str) -> str:
    """SQL-expression face of ``tq.lnu`` for use inside ``F.expr``
    (identical rounding ladder: round(ln, 6) then exact 1e-6 lift)."""
    return f"CAST(rint(round(ln({x}), 6) * {tq.LN_UNIT_SCALE}) AS BIGINT)"


def weighted_sample_es(spark: SparkSession, sf_dir: str) -> DataFrame:
    return weighted_sample(rebalance(table(spark, sf_dir, "documents")))


def _es_oracle_sql() -> str:
    key = (
        f"(({tq.lnu_sql('h + 1')} - {tq.lnu_sql(str(_ES_U_DEN))})"
        f" * {ES_KEY_SCALE}) // w"
    )
    return f"""
        WITH keyed AS (
            SELECT doc_id, source,
                   greatest(CAST(n_chars AS BIGINT), 1) AS w,
                   CAST(CAST('0x' || substr(md5('es:' ||
                       CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
                       AS BIGINT) AS h
            FROM documents
        )
        SELECT doc_id, source, w, CAST({key} AS BIGINT) AS key_u,
               CAST(row_number() OVER (
                   ORDER BY {key} DESC, doc_id ASC) AS INTEGER) AS rank
        FROM keyed
        QUALIFY rank <= {ES_K}
    """


TL_PCT = 80  # train share of events at the temporal cutoff


def temporal_leakage_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP-AWARE temporal train/valid split with a leakage audit --
    the split an evaluation-honest pipeline needs: a naive event-level
    time cut puts a user's early events in train and late events in
    valid, so the model sees the *entity's* history at eval time
    (temporal leakage). The cutoff day is the first calendar day at
    which the running event count reaches ``TL_PCT``% of the corpus
    (exact integer compare, day grain); each user then gets ONE label:

    - ``train``  -- every event on or before the cutoff day;
    - ``valid``  -- every event after it;
    - ``span``   -- events on both sides. ``n_valid_side`` on these
      rows counts exactly the events a naive split would leak into
      valid while the same user contributes training history.

    NULL user_id / ts rows cannot be grouped or placed and are
    excluded identically on both engines.

    Scale shape: one day-grain partial-aggregated shuffle for the
    cutoff (running sum over OBSERVED DAYS -- a bounded calendar
    vocabulary, the justified-global-window family), broadcast of the
    one-row cutoff, then ONE user-grain partial-aggregated shuffle
    for the per-user side counts. No fact-scale window, no second
    scan."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    ).select("user_id", _sel_day("ts").alias("day"))
    daily = ev.groupBy("day").agg(F.count(F.lit(1)).alias("n"))
    wd = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    totals = daily.agg(F.sum("n").alias("total"))
    cutoff = (
        daily.withColumn("run", F.sum("n").over(wd))
        .crossJoin(F.broadcast(totals))
        .filter(F.col("run") * 100 >= F.col("total") * TL_PCT)
        .agg(F.min("day").alias("cutoff_day"))
    )
    sides = (
        ev.crossJoin(F.broadcast(cutoff))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("day") <= F.col("cutoff_day"), 1)
                  .otherwise(0)).alias("n_train_side"),
            F.sum(F.when(F.col("day") > F.col("cutoff_day"), 1)
                  .otherwise(0)).alias("n_valid_side"),
        )
    )
    return sides.select(
        "user_id", "n_train_side", "n_valid_side",
        F.when(F.col("n_valid_side") == 0, F.lit("train"))
        .when(F.col("n_train_side") == 0, F.lit("valid"))
        .otherwise(F.lit("span")).alias("group_split"),
    )


def _sel_day(col):
    return F.date_format(col, "yyyy-MM-dd")


def _tl_oracle_sql() -> str:
    return f"""
        WITH ev AS (
            SELECT user_id, strftime(ts, '%Y-%m-%d') AS day
            FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        ),
        daily AS (SELECT day, count(*) AS n FROM ev GROUP BY day),
        cut AS (
            SELECT min(day) AS cutoff_day FROM (
                SELECT day,
                       sum(n) OVER (ORDER BY day
                           ROWS UNBOUNDED PRECEDING) AS run,
                       sum(n) OVER () AS total
                FROM daily)
            WHERE run * 100 >= total * {TL_PCT}
        ),
        sides AS (
            SELECT user_id,
                   CAST(sum(CASE WHEN day <= c.cutoff_day THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_train_side,
                   CAST(sum(CASE WHEN day > c.cutoff_day THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_valid_side
            FROM ev CROSS JOIN cut c GROUP BY user_id
        )
        SELECT user_id, n_train_side, n_valid_side,
               CASE WHEN n_valid_side = 0 THEN 'train'
                    WHEN n_train_side = 0 THEN 'valid'
                    ELSE 'span' END AS group_split
        FROM sides
    """


WF_PCT = 60  # the water-filling token budget as a share of the corpus


def token_budget_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WATER-FILLING per-source token allocation: given each source's
    token count and a global budget (``WF_PCT``% of corpus tokens),
    find the level ``t`` such that granting every source
    ``min(n_tokens, t)`` exactly spends the budget -- the max-min fair
    mixture a pretraining run uses to stop head domains from eating
    the budget while fully keeping tail domains (the closed-form dual
    of per-source caps). Exact integer construction: sources sorted by
    size ascending; the level sits after the largest prefix that fits
    entirely (``cum_k + (m - k) * n_{k+1} > B``); capped sources get
    ``t = (B - cum_k) div (m - k)`` and the division remainder goes to
    the first ``r`` capped sources in (size, source) order
    (largest-remainder determinism, the stratified-split precedent).
    Allocations sum to EXACTLY the budget whenever the budget is below
    the corpus total.

    Scale shape: one source-grain partial-aggregated shuffle, then all
    windows run over SOURCE-cardinality rows (the bounded domain
    vocabulary, justified-global-window family); token counting is the
    shared map-side word counter."""
    docs = table(spark, sf_dir, "documents")
    sizes = docs.groupBy("source").agg(
        F.sum(tq.n_tokens(F.col("text")).cast("long")).alias("n_tokens")
    )
    ws = Window.orderBy(F.asc("n_tokens"), F.asc_nulls_first("source"))
    run = ws.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    totals = sizes.agg(
        F.sum("n_tokens").alias("total"),
        F.count(F.lit(1)).alias("m"),
    )
    ranked = (
        sizes.crossJoin(F.broadcast(totals))
        .select(
            "source", "n_tokens",
            F.expr(f"total * {WF_PCT} div 100").cast("long")
            .alias("budget"),
            F.row_number().over(ws).alias("rk"),
            F.sum("n_tokens").over(run).alias("cum"),
            "m",
        )
    )
    # the level index k = number of sources that fit whole: largest rk
    # whose own cumulative fits alongside levelling every later source
    # at its own size
    fits = ranked.withColumn(
        "fits_whole",
        (F.col("cum") + (F.col("m") - F.col("rk"))
         * F.col("n_tokens")) <= F.col("budget"),
    )
    krow = fits.filter("fits_whole").agg(
        F.max("rk").alias("k"), F.max("cum").alias("cum_k"))
    alloc = (
        fits.crossJoin(F.broadcast(krow))
        .select(
            "source", "n_tokens", "budget",
            F.coalesce("k", F.lit(0)).alias("k"),
            F.coalesce("cum_k", F.lit(0)).alias("cum_k"),
            "rk", "m",
        )
        .withColumn(
            "level",
            F.expr("CASE WHEN m > k THEN (budget - cum_k) div (m - k) "
                   "ELSE NULL END").cast("long"),
        )
        .withColumn(
            "rem",
            F.expr("CASE WHEN m > k THEN (budget - cum_k) % (m - k) "
                   "ELSE 0 END").cast("long"),
        )
        .select(
            "source", "n_tokens",
            F.when(F.col("rk") <= F.col("k"), F.col("n_tokens"))
            .otherwise(
                F.least(
                    "n_tokens",
                    F.col("level")
                    + F.when(F.col("rk") - F.col("k") <= F.col("rem"), 1)
                    .otherwise(0),
                )
            ).cast("long").alias("allocation"),
        )
    )
    return alloc.select(
        "source", "n_tokens", "allocation",
        (F.col("allocation") < F.col("n_tokens")).alias("capped"),
    )


def _wf_oracle_sql() -> str:
    return f"""
        WITH sizes AS (
            SELECT source, CAST(sum(len({_W_SQL})) AS BIGINT) AS n_tokens
            FROM documents GROUP BY source
        ),
        tot AS (
            SELECT CAST(sum(n_tokens) * {WF_PCT} // 100 AS BIGINT)
                       AS budget,
                   count(*) AS m
            FROM sizes
        ),
        ranked AS (
            SELECT source, n_tokens, t.budget, t.m,
                   row_number() OVER (ORDER BY n_tokens,
                       source NULLS FIRST) AS rk,
                   sum(n_tokens) OVER (ORDER BY n_tokens,
                       source NULLS FIRST ROWS UNBOUNDED PRECEDING) AS cum
            FROM sizes CROSS JOIN tot t
        ),
        kr AS (
            SELECT coalesce(max(rk), 0) AS k,
                   coalesce(max(cum), 0) AS cum_k
            FROM ranked
            WHERE cum + (m - rk) * n_tokens <= budget
        )
        SELECT source, n_tokens,
               CAST(CASE WHEN rk <= kr.k THEN n_tokens
                    ELSE least(n_tokens,
                        (budget - kr.cum_k) // (m - kr.k)
                        + CASE WHEN rk - kr.k <=
                              (budget - kr.cum_k) % (m - kr.k)
                          THEN 1 ELSE 0 END)
               END AS BIGINT) AS allocation,
               CASE WHEN rk <= kr.k THEN FALSE
                    ELSE least(n_tokens,
                        (budget - kr.cum_k) // (m - kr.k)
                        + CASE WHEN rk - kr.k <=
                              (budget - kr.cum_k) % (m - kr.k)
                          THEN 1 ELSE 0 END) < n_tokens
               END AS capped
        FROM ranked CROSS JOIN kr
    """


def _skyline_kernel(pdf):
    """2-D skyline (maximize both axes) in O(n log n): sort by
    (tok DESC, uniq_u DESC); within a tok group only the max-uniq rows
    survive (an equal-tok higher-uniq point dominates); across groups
    a survivor needs uniq STRICTLY above the best uniq seen at any
    strictly larger tok (equality there means a dominating point
    exists). Equal (tok, uniq_u) points never dominate each other and
    all survive -- the standard skyline tie contract."""
    import pandas as pd

    if pdf.empty:
        return pdf
    out = []
    best = None  # max uniq among strictly larger tok
    for tok, grp in sorted(
        pdf.groupby("tok"), key=lambda kv: -kv[0]
    ):
        mx = grp["uniq_u"].max()
        if best is None or mx > best:
            out.append(grp[grp["uniq_u"] == mx])
            best = mx if best is None else max(best, mx)
        else:
            best = max(best, mx)
    return pd.concat(out, ignore_index=True)


def skyline_quality_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SKYLINE (Pareto-front) document selection over two quality
    axes -- token count and distinct-word ratio (1e-6 units, exact
    truncating division): the documents no other document beats on
    both axes at once, i.e. the non-dominated frontier a multi-
    objective curation pass starts from when no single score exists
    (Borzsony et al. 2001, the SKYLINE OF operator). Equal-metric
    points co-survive; zero-token docs carry no metrics and are
    excluded on both engines.

    Scale shape: the textbook TWO-PHASE distributed skyline -- the
    skyline of a union is a subset of the union of per-partition
    skylines, so phase 1 runs the O(n log n) kernel per partition
    (mapInPandas over the metric projection, map-only) and phase 2
    re-runs the same kernel once over the few surviving candidates
    (single bounded group -- skyline cardinality, not corpus
    cardinality). The corpus is never sorted globally and never
    shuffled; only survivors move."""
    docs = rebalance(table(spark, sf_dir, "documents"))
    metrics = docs.select(
        "doc_id",
        F.size(tq.words(F.col("text"))).cast("long").alias("tok"),
        F.size(F.array_distinct(tq.words(F.col("text"))))
        .cast("long").alias("uniq"),
    ).filter(F.col("tok") > 0).select(
        "doc_id", "tok",
        F.expr(f"uniq * {1_000_000} div tok").alias("uniq_u"),
    )
    schema = "doc_id long, tok long, uniq_u long"
    local = metrics.mapInPandas(
        lambda it: (_skyline_kernel(pdf) for pdf in it), schema
    )
    return (
        local.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(
            lambda _, pdf: _skyline_kernel(pdf.drop(columns=["_g"])),
            schema,
        )
    )


def skyline_streaming_sink(
    stream_docs: DataFrame, path: str, checkpoint_dir: str,
):
    """The skyline's STREAMING face: maintain the Pareto frontier of
    an append-only document stream incrementally per micro-batch
    (``foreachBatch``). Correctness rests on the skyline's fold
    identity over INSERT-ONLY data,

        skyline(skyline(S) union B) == skyline(S union B),

    so each batch pools the stored frontier with the batch's local
    skyline and re-runs the SAME kernel -- and because a redelivered
    point is either already dominated or already ON the stored
    frontier (identical row, deduped by doc_id), at-least-once
    redelivery and cross-batch disorder both converge to the batch
    operator's result. (Deletions would break the identity -- a
    dominated-then-deleted dominator needs the dominated points back;
    that is the documented insert-only contract, the standard one for
    streaming skylines.)

    Scale shape: per batch, one map-only metric projection + local
    skyline kernel over the BATCH only, then the kernel once over
    (stored frontier + batch survivors) -- frontier-cardinality work,
    never corpus-cardinality; staged delete->rename flip with the
    crash healer, like every foreachBatch sink here. Returns the
    started StreamingQuery."""
    from pyspark.errors import AnalysisException

    from ..sinks import _replace_dir, recover_replace_dir

    schema = "doc_id long, tok long, uniq_u long"

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        staging = path.rstrip("/") + "__skystaging"
        recover_replace_dir(spark, staging, path)
        metrics = batch_df.select(
            "doc_id",
            F.size(tq.words(F.col("text"))).cast("long").alias("tok"),
            F.size(F.array_distinct(tq.words(F.col("text"))))
            .cast("long").alias("uniq"),
        ).filter(F.col("tok") > 0).select(
            "doc_id", "tok",
            F.expr(f"uniq * {1_000_000} div tok").alias("uniq_u"),
        )
        local = metrics.mapInPandas(
            lambda it: (_skyline_kernel(pdf) for pdf in it), schema
        )
        pool = local
        try:
            existing = spark.read.parquet(path)
        except AnalysisException as e:
            if ("PATH_NOT_FOUND" not in str(e)
                    and "Path does not exist" not in str(e)):
                raise
            existing = None
        if existing is not None:
            pool = existing.select("doc_id", "tok", "uniq_u").unionByName(
                local).dropDuplicates(["doc_id"])
        out = (
            pool.withColumn("_g", F.lit(1))
            .groupBy("_g")
            .applyInPandas(
                lambda _, pdf: _skyline_kernel(pdf.drop(columns=["_g"])),
                schema,
            )
        )
        out.write.mode("overwrite").parquet(staging)
        _replace_dir(spark, staging, path)

    return (
        stream_docs.writeStream
        .foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _skyline_oracle_sql() -> str:
    return """
        WITH m AS (
            SELECT doc_id,
                   CAST(len(w) AS BIGINT) AS tok,
                   CAST(len(list_distinct(w)) * 1000000 // len(w)
                        AS BIGINT) AS uniq_u
            FROM (SELECT doc_id,
                         list_filter(string_split_regex(trim(text),
                             '[ \\t\\n\\x0B\\f\\r]+'), x -> x <> '') AS w
                  FROM documents)
            WHERE len(w) > 0
        )
        SELECT doc_id, tok, uniq_u FROM m a
        WHERE NOT EXISTS (
            SELECT 1 FROM m b
            WHERE b.tok >= a.tok AND b.uniq_u >= a.uniq_u
              AND (b.tok > a.tok OR b.uniq_u > a.uniq_u)
        )
    """


QUERIES = {
    "skyline_quality_docs": skyline_quality_docs,
    "temporal_leakage_split": temporal_leakage_split,
    "token_budget_waterfill": token_budget_waterfill,
    "quality_classifier_hashed": quality_classifier_hashed,
    "token_budget_sample": token_budget_sample,
    "dsir_importance_weights": dsir_importance_weights,
    "stratified_holdout_split": stratified_holdout_split,
    "weighted_sample_es": weighted_sample_es,
}

ORACLE = {
    "skyline_quality_docs": _skyline_oracle_sql(),
    "temporal_leakage_split": _tl_oracle_sql(),
    "token_budget_waterfill": _wf_oracle_sql(),
    "quality_classifier_hashed": _qc_oracle_sql(),
    "token_budget_sample": _budget_oracle_sql(),
    "dsir_importance_weights": _dsir_oracle_sql(),
    "stratified_holdout_split": _strat_oracle_sql(),
    "weighted_sample_es": _es_oracle_sql(),
}
