"""Record linkage, relevance feedback, and model-eval reports.

Reference parity: the reference dedups at the chunk/document level
with content hashes and vector similarity only
(``doc-ingest-chat/processors/dedup.py`` shapes surveyed in SURVEY.md
section 2; F-predicates in ``processors/text_utils.py``). A
production-scale corpus pipeline adds three sibling stages this
module supplies, each Spark-first and fully DuckDB-oracled:

- **Entity resolution with survivorship** (the warehouse/MDM "golden
  record" op): blocked candidate generation -> field-weighted match
  scoring -> connected components -> per-entity canonical-record
  assembly. The dedup family answers "which rows are copies"; this
  answers "what is THE record for each real-world entity".
- **Pseudo-relevance feedback query expansion** (RM3 family): BM25
  first pass -> top feedback docs -> highest-weight new terms ->
  interpolated re-score. The retrieval-quality lever next to the
  hybrid fusion the engine already serves.
- **Group-k-fold split** and a **score-decile lift/gains table**:
  the split that keeps a leaky group (source/domain) inside one fold,
  and the standard calibration surface for the learned quality gate.

Scale shape: every stage is blocked/banded or per-group-windowed --
candidate pairs come only from LSH band buckets (never all-pairs),
the feedback and expansion windows partition by query_id, the k-fold
and lift reports aggregate map-side to fold/decile grain, and the
lift table's only non-equi join is a broadcast over its own <=10
decile rows. Exact integers everywhere a comparison crosses engines
(per-mille Jaccard, seat counts, capture per-mille); floats only on
round(x, 4/6) report surfaces, same discipline as the BM25 family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text_quality as tq
from ..sources.tables import rebalance, table
from .dedup import (
    _bands_cte,
    _candidate_pairs,
    connected_components_labels,
)
from .rank import distributed_rank
from .selection import classify_quality
from .textstats import _W0_SQL, _W_SQL

ER_OFFSET = 1_000_000   # variant ids, same convention as _near_corpus
ER_JACCARD_PM = 500     # match when token-set Jaccard >= 0.500
PRF_QUERIES = 6         # query docs: doc_id < 6
PRF_FB_K = 5            # feedback depth (RM3 fbDocs)
PRF_EXP_K = 3           # expansion terms per query (RM3 fbTerms)
PRF_TOP_K = 10          # final ranking depth
PRF_EXP_W = 0.4         # expansion-term interpolation weight
K_FOLDS = 5
N_DECILES = 10


def _er_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents plus deterministic re-delivery variants (same text
    recipe as dedup's ``_near_corpus`` -- drop the first two words --
    but KEEPING the lang/source metadata survivorship needs; variants
    arrive under source ``redelivery``, the classic second-feed ER
    setup)."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    w = tq.words(F.col("text"))
    variants = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + ER_OFFSET).alias("doc_id"),
        F.array_join(F.slice(w, 3, F.size(w)), " ").alias("text"),
        "lang",
        F.lit("redelivery").alias("source"),
    )
    return rebalance(docs.unionByName(variants))


def entity_resolution_golden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden-record entity resolution over the documents + re-delivery
    corpus: (1) BLOCK via the shared banded-minhash buckets (the same
    proven ``_candidate_pairs`` the dedup family uses -- candidate
    volume is bucket-bounded, never all-pairs); (2) SCORE each
    candidate with exact integers -- per-mille token-set Jaccard --
    and a lang-equality field rule; (3) CLUSTER matches with the
    pointer-jumped connected-components kernel; (4) SURVIVORSHIP: one
    row per entity with the canonical doc (longest text, tie -> the
    smaller doc_id), member count, and source/lang fan-out -- the
    "merge view" an MDM pipeline ships downstream.

    Scale shape: blocking + scoring touch band-bucket pairs only; the
    component loop is O(log diameter) rounds; survivorship is one
    partial-aggregated groupBy on the entity label (max_by carries the
    argmax inside the aggregate -- no per-entity window, no second
    shuffle). Singleton docs are their own entities, so the output is
    a complete entity registry, corpus-grain."""
    return _golden_resolve(_er_corpus(spark, sf_dir))


def _golden_resolve(raw_corpus: DataFrame) -> DataFrame:
    """From-scratch golden resolve over any (doc_id, text, lang,
    source) corpus -- the body of :func:`entity_resolution_golden`,
    shared so tests can build the scratch twin :func:`er_reresolve`
    must equal."""
    corpus = raw_corpus.localCheckpoint(eager=False)
    # r13 (guide §2.3/§2.4): the banded candidate set is TINY relative
    # to the corpus (measured sf0.1: 1,360 pairs over a 6,000-doc ER
    # corpus, i.e. docs in any pair ~= 2x pairs << corpus -- and the
    # gap widens with scale), yet scoring used to tokenize the WHOLE
    # corpus twice --
    # once per join side. Checkpoint the pair list (it feeds two plan
    # branches: the member-id semi-join and the scored join), restrict
    # the corpus to docs that appear in ANY pair with one semi-join
    # (ONE corpus-scale tokenize pass over just the survivors), then
    # attach both sides from that candidate-only table. Join semantics,
    # expressions and results are unchanged -- only where the tokenize
    # runs.
    pairs = _candidate_pairs(
        corpus.select("doc_id", "text")
    ).localCheckpoint(eager=False)
    wd = F.array_distinct(
        tq.words(F.coalesce(F.col("text"), F.lit("")))
    )
    in_pairs = pairs.select(
        F.explode(F.array("doc_a", "doc_b")).alias("doc_id")
    ).distinct()
    sides = (
        corpus.join(in_pairs, "doc_id")
        .select("doc_id", wd.alias("wd"), "lang")
        .localCheckpoint(eager=False)
    )
    a = sides.select(
        F.col("doc_id").alias("doc_a"), F.col("wd").alias("wa"),
        F.col("lang").alias("lang_a"),
    )
    b = sides.select(
        F.col("doc_id").alias("doc_b"), F.col("wd").alias("wb"),
        F.col("lang").alias("lang_b"),
    )
    inter = F.size(F.array_intersect("wa", "wb"))
    union = F.size("wa") + F.size("wb") - inter
    scored = (
        pairs.join(a, "doc_a").join(b, "doc_b")
        .withColumn("inter", inter)
        .withColumn("un", union)
        # candidates share >=1 three-word shingle, so un >= 3 > 0
        .withColumn("jac_pm", F.expr("(1000 * inter) DIV un"))
        .filter(
            (F.col("jac_pm") >= ER_JACCARD_PM)
            & (F.col("lang_a") == F.col("lang_b"))
        )
        .select("doc_a", "doc_b")
    )
    edges = scored.selectExpr("doc_a AS src", "doc_b AS dst").unionByName(
        scored.selectExpr("doc_b AS src", "doc_a AS dst")
    ).cache()
    labels = connected_components_labels(edges)
    # labels is eagerly materialized by the CC loop; nothing downstream
    # re-reads edges' lineage, so free its cached blocks (item-4
    # residency hygiene) instead of leaving them to driver-side GC
    edges.unpersist()
    members = (
        corpus.join(labels, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("label", F.col("doc_id")).alias("entity_id"),
            F.length(F.coalesce("text", F.lit(""))).cast("long")
            .alias("n_chars"),
            "source", "lang",
        )
    )
    return (
        members.groupBy("entity_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_members"),
            F.expr(
                "max_by(doc_id, struct(n_chars, -doc_id))"
            ).alias("golden_doc_id"),
            F.max("n_chars").alias("golden_chars"),
            F.count_distinct("source").cast("int").alias("n_sources"),
            F.count_distinct("lang").cast("int").alias("n_langs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


def prf_query_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RM3-style pseudo-relevance-feedback retrieval: BM25 first pass
    (shared cached postings matview), take the top ``PRF_FB_K``
    feedback docs per query, pool their highest-BM25-weight terms the
    query does not already contain (top ``PRF_EXP_K``), and re-score
    the corpus against the expanded query vector (original terms at
    weight 1.0, expansion terms at ``PRF_EXP_W``) -- final
    ``PRF_TOP_K`` per query.

    Scale shape: the corpus-heavy subtree (tokenize -> term freqs ->
    postings) is the SAME persisted matview every sparse query serves
    from; both ranking windows partition by query_id; the query
    vectors (original and expanded) are Q-bounded and broadcast to the
    postings join, so the corpus never shuffles for scoring. Rounding
    discipline: scores and expansion weights round to 6 before any
    rank comparison, the BM25-family contract that makes cross-engine
    ties break identically."""
    from .sparse import bm25_scores, postings, query_indices

    base = bm25_scores(spark, sf_dir, PRF_QUERIES)
    w_fb = Window.partitionBy("query_id").orderBy(
        F.desc("sparse"), F.asc("neighbor_id")
    )
    fb = (
        base.withColumn("rn", F.row_number().over(w_fb))
        .filter(F.col("rn") <= PRF_FB_K)
        .select("query_id", F.col("neighbor_id").alias("doc_id"))
    )
    post = postings(spark, sf_dir)
    qi = query_indices(spark, sf_dir, PRF_QUERIES)
    expw = (
        fb.join(post, "doc_id")
        .groupBy("query_id", "idx")
        .agg(F.round(F.sum("w"), 6).alias("ew"))
        .join(qi, ["query_id", "idx"], "left_anti")
    )
    w_exp = Window.partitionBy("query_id").orderBy(
        F.desc("ew"), F.asc("idx")
    )
    exp_top = (
        expw.withColumn("rn", F.row_number().over(w_exp))
        .filter(F.col("rn") <= PRF_EXP_K)
        .select("query_id", "idx")
    )
    qvec = qi.select(
        "query_id", "idx", F.lit(1.0).alias("qw")
    ).unionByName(
        exp_top.select("query_id", "idx", F.lit(PRF_EXP_W).alias("qw"))
    )
    rescored = (
        post.join(F.broadcast(qvec), "idx")
        .filter(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(F.col("w") * F.col("qw")), 6).alias("score"))
    )
    w_final = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        rescored.withColumn(
            "rank", F.row_number().over(w_final).cast("int")
        )
        .filter(F.col("rank") <= PRF_TOP_K)
        .select(
            "query_id", F.col("doc_id").alias("neighbor_id"),
            "rank", "score",
        )
    )


def group_kfold_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-k-fold assignment report: every document's GROUP (its
    source/domain) hashes to one of ``K_FOLDS`` folds via the
    engine-stable md5 draw, so no group ever spans folds -- the split
    that keeps near-duplicate-heavy domains from leaking across
    train/validation (the document-level sibling splits,
    stratified_holdout/temporal_leakage, cannot give this guarantee).
    Reports per-fold group/doc/token mass plus the doc share in exact
    per-mille.

    Scale shape: one map pass (fold is a row-local hash), one
    partial-aggregated groupBy on the 5-row fold key; the corpus total
    joins back as a broadcast one-row aggregate."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    fold = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("gkf:"), F.col("source"))), 1, 8),
            16, 10,
        ).cast("long") % K_FOLDS
    ).cast("int")
    ntok = F.size(tq.words(F.coalesce(F.col("text"), F.lit(""))))
    per = (
        docs.select(fold.alias("fold"), "source", ntok.alias("ntok"))
        .groupBy("fold")
        .agg(
            F.count_distinct("source").cast("int").alias("n_sources"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ntok").cast("long").alias("n_tokens"),
        )
    )
    tot = per.agg(F.sum("n_docs").alias("total_docs"))
    return per.crossJoin(F.broadcast(tot)).select(
        "fold", "n_sources", "n_docs", "n_tokens",
        F.expr("(1000 * n_docs) DIV total_docs").alias("docs_pm"),
    )


def score_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gains/lift table for the learned quality gate: rank the corpus
    by the hashed-classifier score (exact integer, ties broken by
    doc_id), cut into ``N_DECILES`` equal-depth bins, and report per
    bin the positive rate, cumulative capture (exact per-mille), and
    lift vs the base rate -- the standard eval surface a selection
    pipeline publishes before acting on a scorer. The label here is
    the English-target flag (lang = 'en'); with a trained weight
    table the identical plan calibrates a real gate.

    Scale shape: scoring is the classifier's one map pass + per-doc
    combine; the exact global rank comes from the two-phase
    ``distributed_rank`` protocol (no unpartitioned window); the rest
    aggregates at decile grain -- the only non-equi join is the
    cumulative sum over the table's own <=10 broadcast rows."""
    docs = table(spark, sf_dir, "documents")
    # r12: rebalance the scorer input -- the md5-per-feature explode is
    # the CPU and the corpus parquet is one input split at test scale,
    # so the un-spread scan ran the whole scoring pass on a single core
    # (the chunk_semantic_split lesson; measured 1.08 s -> ~0.2 s).
    # tie_split=False: score_u is near-unique by construction (hashed
    # integer sums; 4364 distinct over 5000 docs at sf0.1) and the
    # doc_id tiebreaker makes ranks exact regardless -- the heavy-tie
    # sub-split pass only balances buckets, so skipping it saves one
    # full scan + the per-boundary quantile aggregate (guide 1.2: do
    # not compute things you throw away).
    from ..sources.tables import rebalance

    scored = classify_quality(
        rebalance(docs.select("doc_id", "text"))
    ).join(
        docs.select(
            "doc_id",
            F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
        ),
        "doc_id",
    )
    ranked = distributed_rank(
        scored.select("doc_id", "score_u", "pos"),
        order_by=[(F.col("score_u"), False), (F.col("doc_id"), True)],
        n_col="n",
        tie_split=False,
    )
    dec = (
        ranked.select(
            F.expr(f"CAST(((rn - 1) * {N_DECILES}) DIV n AS INT)")
            .alias("decile"),
            "pos",
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("pos").cast("long").alias("n_pos"),
        )
    )
    tot = dec.agg(
        F.sum("n_docs").alias("total_docs"),
        F.sum("n_pos").alias("total_pos"),
    )
    prev = dec.select(
        F.col("decile").alias("d2"), F.col("n_pos").alias("p2")
    )
    cum = (
        dec.join(F.broadcast(prev), F.col("d2") <= F.col("decile"))
        .groupBy("decile", "n_docs", "n_pos")
        .agg(F.sum("p2").alias("cum_pos"))
    )
    return cum.crossJoin(F.broadcast(tot)).select(
        "decile", "n_docs", "n_pos",
        F.round(F.col("n_pos") / F.col("n_docs"), 4).alias("pos_rate_4dp"),
        "cum_pos",
        F.expr("(1000 * cum_pos) DIV total_pos").alias("capture_pm"),
        F.round(
            (F.col("n_pos") / F.col("n_docs"))
            / (F.col("total_pos") / F.col("total_docs")),
            4,
        ).alias("lift_4dp"),
    )


def entity_assign_incremental(
    new_docs: DataFrame,
    base_sigs: DataFrame,
    base_fields: DataFrame,
    base_labels: DataFrame,
) -> DataFrame:
    """Assign an incoming batch to an EXISTING entity registry without
    re-resolving the archive (the lsh_append/pq_append shape for ER):
    ``base_sigs`` is the persisted blocking index (doc_id, band, sig),
    ``base_fields`` the per-record match fields (doc_id, wd, lang) --
    together they are what an MDM system stores as its match-key
    index -- and ``base_labels`` maps archive doc_id -> entity_id. The
    batch signs ONCE, band-joins the stored signatures, verifies with
    the same integer per-mille Jaccard + lang rule as the full
    resolve, and inherits the minimum matched entity id; non-matches
    found new entities under their own id. A batch record matching
    records of TWO different entities picks the minimum -- the
    documented append-time contract (the entity MERGE that implies is
    deferred to the next full resolve, exactly like a compaction
    deferring to the next rewrite).

    Scale shape: archive work is the one-time store build; per batch
    the cost is batch-signature + a bucket equi-join + candidate-only
    verify -- archive text is never read, and nothing re-resolves."""
    from .dedup import _band_signatures

    wd = F.array_distinct(tq.words(F.coalesce(F.col("text"), F.lit(""))))
    nb = new_docs.select(
        "doc_id", "text", wd.alias("nwd"), F.col("lang").alias("nlang")
    )
    new_bands = (
        _band_signatures(nb.select("doc_id", "text"))
        .withColumnRenamed("doc_id", "new_id")
    )
    cand = (
        new_bands.join(base_sigs, ["band", "sig"])
        .select("new_id", "doc_id")
        .distinct()
    )
    inter = F.size(F.array_intersect("nwd", "wd"))
    union = F.size("nwd") + F.size("wd") - inter
    matches = (
        cand.join(base_fields, "doc_id")
        .join(
            nb.select(F.col("doc_id").alias("new_id"), "nwd", "nlang"),
            "new_id",
        )
        .withColumn("inter", inter)
        .withColumn("un", union)
        .filter(
            (F.col("un") > 0)
            & (F.expr("(1000 * inter) DIV un") >= ER_JACCARD_PM)
            & (F.col("nlang") == F.col("lang"))
        )
        .join(base_labels, "doc_id")
        .groupBy("new_id")
        .agg(F.min("entity_id").alias("matched_entity"))
    )
    return (
        new_docs.select("doc_id").join(
            matches.withColumnRenamed("new_id", "doc_id"), "doc_id", "left"
        )
        .select(
            "doc_id",
            F.coalesce("matched_entity", F.col("doc_id")).alias("entity_id"),
            F.col("matched_entity").isNull().alias("is_new_entity"),
        )
    )


def _er_incoming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The gate's deterministic incoming batch: the odd-doc_id half
    plus drop-two-words re-deliveries of every ``doc_id % 10 == 0``
    archive record (planted matches that should inherit their archive
    entity)."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang"
    )
    w = tq.words(F.col("text"))
    return rebalance(
        docs.filter(F.col("doc_id") % 2 == 1)
        .unionByName(
            docs.filter(F.col("doc_id") % 10 == 0).select(
                (F.col("doc_id") + ER_OFFSET).alias("doc_id"),
                F.array_join(F.slice(w, 3, F.size(w)), " ").alias("text"),
                "lang",
            )
        )
    )


def _er_base_registry(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The even-doc_id archive fully resolved ONCE into the three
    persisted-shape registry relations ``entity_assign_incremental``
    serves from: (base_sigs, base_fields, base_labels)."""
    from .dedup import _band_signatures

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    base = rebalance(docs.filter(F.col("doc_id") % 2 == 0))
    pairs = _candidate_pairs(base.select("doc_id", "text"))
    wd = F.array_distinct(tq.words(F.coalesce(F.col("text"), F.lit(""))))
    sides = base.select("doc_id", wd.alias("wd"), "lang")
    a = sides.select(F.col("doc_id").alias("doc_a"),
                     F.col("wd").alias("wa"), F.col("lang").alias("lang_a"))
    b = sides.select(F.col("doc_id").alias("doc_b"),
                     F.col("wd").alias("wb"), F.col("lang").alias("lang_b"))
    inter = F.size(F.array_intersect("wa", "wb"))
    union = F.size("wa") + F.size("wb") - inter
    scored = (
        pairs.join(a, "doc_a").join(b, "doc_b")
        .withColumn("inter", inter)
        .withColumn("un", union)
        .filter(
            (F.expr("(1000 * inter) DIV un") >= ER_JACCARD_PM)
            & (F.col("lang_a") == F.col("lang_b"))
        )
        .select("doc_a", "doc_b")
    )
    edges = scored.selectExpr("doc_a AS src", "doc_b AS dst").unionByName(
        scored.selectExpr("doc_b AS src", "doc_a AS dst")
    ).cache()
    cc = connected_components_labels(edges)
    # cc is eagerly materialized by the CC loop; free the edge cache
    edges.unpersist()
    base_labels = (
        base.select("doc_id").join(cc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("label", F.col("doc_id")).alias("entity_id"),
        )
    )
    base_sigs = _band_signatures(base.select("doc_id", "text"))
    return base_sigs, sides, base_labels


_ER_REG_STORE: dict = {}


def er_registry_cached(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """PERSISTED entity-registry matviews (the knn_graph_cached /
    lsh_build pattern): the archive resolve -- blocking signatures,
    match fields, entity labels -- runs ONCE per corpus and lands as
    three parquet tables; every append/serve face READS the stored
    registry instead of re-resolving the archive per call. That is
    the production MDM shape: the registry IS a stored table, and at
    100 TB re-running blocking + components per batch is exactly the
    cost this removes. Content is deterministic in the corpus dir, so
    a complete on-disk build from any session is byte-equivalent;
    drop the directories to force a rebuild (same contract as every
    matview)."""
    import hashlib
    import os

    from .similarity import _matview_complete, matview_root

    key = (spark, sf_dir)
    if key not in _ER_REG_STORE:
        tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
        paths = {
            name: os.path.join(matview_root(), f"erreg_{name}_{tag}")
            for name in ("sigs", "fields", "labels")
        }
        # one incomplete part invalidates the set: the three relations
        # are a single logical snapshot of one resolve
        if not all(_matview_complete(p) for p in paths.values()):
            sigs, fields, labels = _er_base_registry(spark, sf_dir)
            sigs.write.mode("overwrite").parquet(paths["sigs"])
            fields.write.mode("overwrite").parquet(paths["fields"])
            labels.write.mode("overwrite").parquet(paths["labels"])
        _ER_REG_STORE[key] = tuple(
            spark.read.parquet(paths[n]) for n in ("sigs", "fields", "labels")
        )
    return _ER_REG_STORE[key]


def er_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry binding of :func:`entity_assign_incremental` with the
    gate's deterministic split: the ARCHIVE is the even-doc_id half,
    fully resolved ONCE into the persisted registry matviews
    (:func:`er_registry_cached`); the INCOMING batch is
    :func:`_er_incoming`. Per call this plans only batch signatures +
    the bucket join against the STORED index + candidate verify --
    the archive is never re-resolved. Output one row per batch
    record: the entity it joined, or itself flagged as a new
    entity."""
    base_sigs, base_fields, base_labels = er_registry_cached(spark, sf_dir)
    return entity_assign_incremental(
        _er_incoming(spark, sf_dir), base_sigs, base_fields, base_labels
    )


def _er_incoming_sourced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """:func:`_er_incoming` plus the survivorship metadata the full
    re-resolve needs: odd-doc_id records keep their real ``source``;
    re-delivered variants arrive under ``redelivery`` (same convention
    as :func:`_er_corpus`)."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    w = tq.words(F.col("text"))
    return rebalance(
        docs.filter(F.col("doc_id") % 2 == 1)
        .unionByName(
            docs.filter(F.col("doc_id") % 10 == 0).select(
                (F.col("doc_id") + ER_OFFSET).alias("doc_id"),
                F.array_join(F.slice(w, 3, F.size(w)), " ").alias("text"),
                "lang",
                F.lit("redelivery").alias("source"),
            )
        )
    )


_ER_GOLDEN_STORE: dict = {}


def er_reresolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serving face of the periodic full re-resolve: reads the
    PERSISTED re-resolved golden registry
    (:func:`er_reresolved_cached`). The multi-stage re-resolve
    (:func:`_er_reresolve_compute`) is paid ONCE per append epoch --
    a registry is a stored table in production MDM, and the r10
    verdict measured the per-query from-scratch rebuild at 9.8 s; a
    repeat call with no new batches is a parquet scan of
    O(stored-entity) rows. Oracle unchanged: the FROM-SCRATCH DuckDB
    resolve over archive+batch, so the gate still proves
    append + re-resolve == resolve from scratch on the STORED
    content."""
    return er_reresolved_cached(spark, sf_dir)


def er_reresolved_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERSISTED re-resolved golden-registry matview (the
    er_registry_cached pattern, one epoch further in the lifecycle):
    archive registry + appended batch folded by
    :func:`_er_reresolve_compute` ONCE, landed as one parquet table,
    served by read thereafter. Deterministic in the corpus dir (the
    gate's batch derives from the corpus), so a complete on-disk
    build from any session is equivalent.

    EPOCH BINDING (r11 ADVICE): the golden registry is DERIVED from
    the base registry matviews (``erreg_labels_*`` et al.), so its
    matview name folds in the base registry's commit-marker mtime --
    dropping/rebuilding the base registry (the documented way to pick
    up an in-place corpus mutation) automatically retires the golden
    epoch instead of silently serving the stale one. Store entries
    are re-validated against the on-disk commit marker every call, so
    a manual directory drop also forces a rebuild; superseded epoch
    dirs are removed on build."""
    import glob
    import hashlib
    import os
    import shutil

    from .similarity import _matview_complete, matview_root

    # the base registry is this matview's input: ensure it exists and
    # read its epoch token (commit-marker mtime of the labels part)
    er_registry_cached(spark, sf_dir)
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    marker = os.path.join(matview_root(), f"erreg_labels_{tag}", "_SUCCESS")
    epoch = int(os.path.getmtime(marker))
    # tag stays LAST in the dir name: the bench/gate throwaway-corpus
    # cleanup globs matview dirs by trailing _{tag}
    path = os.path.join(matview_root(), f"erreg_golden_{epoch}_{tag}")
    key = (spark, sf_dir, epoch)
    if key not in _ER_GOLDEN_STORE or not _matview_complete(path):
        if not _matview_complete(path):
            for old in glob.glob(
                os.path.join(matview_root(), f"erreg_golden_*_{tag}")
            ):
                shutil.rmtree(old, ignore_errors=True)
            # pre-epoch-binding layout (r11 closed with these on disk)
            shutil.rmtree(
                os.path.join(matview_root(), f"erreg_golden_{tag}"),
                ignore_errors=True,
            )
            _er_reresolve_compute(spark, sf_dir) \
                .write.mode("overwrite").parquet(path)
        # retire entries of other epochs (and of stopped sessions that
        # shared this corpus) so the store stays bounded
        for k in [k for k in _ER_GOLDEN_STORE if k[1] == sf_dir]:
            del _ER_GOLDEN_STORE[k]
        _ER_GOLDEN_STORE[key] = spark.read.parquet(path)
    return _ER_GOLDEN_STORE[key]


def _er_reresolve_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PERIODIC FULL RE-RESOLVE that completes the ER lifecycle
    (resolve -> append -> ... -> re-resolve): folds the appended batch
    into the registry and repairs everything :func:`er_append` defers
    by contract -- new-entity founding, and bridge merges where one
    batch record connects TWO archive entities.

    The key identity that keeps this INCREMENTAL: the stored archive
    labels (:func:`er_registry_cached`) are exactly the connected
    components of the archive-internal match edges, so replacing those
    edges with STAR EDGES (member -> stored entity_id) preserves every
    component. The re-resolve therefore runs components over

        star(archive labels)  UNION  verify(batch x batch)
                              UNION  verify(batch x archive)

    -- archive pairs are NEVER re-verified (the stored match-field
    relation supplies the archive side of batch-archive verification;
    archive text is read only for survivorship metadata, one scan, no
    pair work). The output is the full golden registry over archive +
    batch, same schema as :func:`entity_resolution_golden`; its DuckDB
    oracle is the FROM-SCRATCH resolve over the union corpus, so a
    green gate IS the proof that append + re-resolve == resolve from
    scratch.

    Scale shape: batch signs once; candidates come from the batch
    self-bucket join + the batch-vs-stored-index bucket join (both
    band-bounded, never all-pairs); components are O(log diameter)
    pointer-jumped rounds over star + new edges; survivorship is the
    same one partial-aggregated ``max_by`` groupBy as the golden
    resolve. Cost tracks the BATCH and the entity count, not archive
    pair volume."""
    from .dedup import _band_signatures

    base_sigs, base_fields, base_labels = er_registry_cached(spark, sf_dir)
    archive = table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    ).filter(F.col("doc_id") % 2 == 0)
    batch = _er_incoming_sourced(spark, sf_dir).localCheckpoint(eager=False)

    # batch-internal verified edges: the same blocked resolve the
    # golden query runs, restricted to the batch. r13 (guide §2.4):
    # the batch minhash chain used to run TWICE (once inside
    # _candidate_pairs, once as new_bands for the archive probe) and
    # the batch tokenize up to three times (both pair sides + the
    # archive-edge batch side) -- one checkpointed bands relation and a
    # candidates-only tokenize make each a single batch-scale pass.
    # Join keys, expressions and results are unchanged.
    wd = F.array_distinct(tq.words(F.coalesce(F.col("text"), F.lit(""))))
    new_bands = _band_signatures(
        batch.select("doc_id", "text")
    ).localCheckpoint(eager=False)
    bpairs = _candidate_pairs(
        batch.select("doc_id", "text"), bands=new_bands
    ).localCheckpoint(eager=False)
    ab_cand = (
        new_bands.withColumnRenamed("doc_id", "doc_a")
        .join(base_sigs.withColumnRenamed("doc_id", "doc_b"),
              ["band", "sig"])
        .select("doc_a", "doc_b")
        .distinct()
        .localCheckpoint(eager=False)
    )
    in_cand = (
        bpairs.select(F.explode(F.array("doc_a", "doc_b")).alias("doc_id"))
        .unionByName(ab_cand.select(F.col("doc_a").alias("doc_id")))
        .distinct()
    )
    bsides = (
        batch.join(in_cand, "doc_id")
        .select("doc_id", wd.alias("wd"), "lang")
        .localCheckpoint(eager=False)
    )
    ba = bsides.select(F.col("doc_id").alias("doc_a"),
                       F.col("wd").alias("wa"),
                       F.col("lang").alias("lang_a"))
    bb = bsides.select(F.col("doc_id").alias("doc_b"),
                       F.col("wd").alias("wb"),
                       F.col("lang").alias("lang_b"))
    inter = F.size(F.array_intersect("wa", "wb"))
    union = F.size("wa") + F.size("wb") - inter
    bb_edges = (
        bpairs.join(ba, "doc_a").join(bb, "doc_b")
        .withColumn("inter", inter)
        .withColumn("un", union)
        .filter(
            (F.expr("(1000 * inter) DIV un") >= ER_JACCARD_PM)
            & (F.col("lang_a") == F.col("lang_b"))
        )
        .select("doc_a", "doc_b")
    )

    # batch-archive verified edges: batch signatures against the
    # STORED blocking index, archive match fields from the STORED
    # field relation -- no archive re-derivation
    ab_edges = (
        ab_cand
        .join(ba, "doc_a")
        .join(
            base_fields.select(F.col("doc_id").alias("doc_b"),
                               F.col("wd").alias("wb"),
                               F.col("lang").alias("lang_b")),
            "doc_b",
        )
        .withColumn("inter", inter)
        .withColumn("un", union)
        .filter(
            (F.col("un") > 0)
            & (F.expr("(1000 * inter) DIV un") >= ER_JACCARD_PM)
            & (F.col("lang_a") == F.col("lang_b"))
        )
        .select("doc_a", "doc_b")
    )

    # archive components as star edges (label != member only; the
    # label row itself needs no self-edge)
    star = base_labels.filter(
        F.col("entity_id") != F.col("doc_id")
    ).select(F.col("doc_id").alias("doc_a"),
             F.col("entity_id").alias("doc_b"))

    pair_edges = bb_edges.unionByName(ab_edges).unionByName(star)
    edges = pair_edges.selectExpr("doc_a AS src", "doc_b AS dst") \
        .unionByName(
            pair_edges.selectExpr("doc_b AS src", "doc_a AS dst")
        ).cache()
    labels = connected_components_labels(edges)
    # labels is eagerly materialized by the CC loop; edges' cached
    # blocks are dead from here on (item-4 residency hygiene)
    edges.unpersist()

    members = (
        archive.unionByName(batch)
        .join(labels, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("label", F.col("doc_id")).alias("entity_id"),
            F.length(F.coalesce("text", F.lit(""))).cast("long")
            .alias("n_chars"),
            "source", "lang",
        )
    )
    return (
        members.groupBy("entity_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_members"),
            F.expr(
                "max_by(doc_id, struct(n_chars, -doc_id))"
            ).alias("golden_doc_id"),
            F.max("n_chars").alias("golden_chars"),
            F.count_distinct("source").cast("int").alias("n_sources"),
            F.count_distinct("lang").cast("int").alias("n_langs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


def er_assign_streaming_sink(
    stream_docs: DataFrame,
    base_sigs: DataFrame,
    base_fields: DataFrame,
    base_labels: DataFrame,
    path: str,
    checkpoint_dir: str,
):
    """STREAMING face of the incremental entity assignment: each
    micro-batch of incoming documents runs the SAME
    :func:`entity_assign_incremental` plan against the static archive
    registry and upserts its (doc_id, entity_id, is_new_entity) rows
    into the stored assignment table (``foreachBatch``). Because the
    assignment of a record is a PURE FUNCTION of (record, archive
    registry) -- batch contents and arrival order never enter it --
    at-least-once redelivery and cross-batch disorder both converge:
    a redelivered doc re-derives the identical row and the doc_id
    upsert is idempotent. Registry GROWTH is out of contract here by
    design (a min-label assignment against an order-dependent growing
    registry cannot be replay-convergent); new entities enter the
    archive at the next full resolve, the same deferral as
    ``er_append``'s bridge-merge contract.

    Pass PERSISTED registry relations (stored tables or checkpointed
    plans): the sink reads them once per batch. Scale shape per batch:
    batch signatures + bucket equi-join + candidate-only verify +
    keyed upsert -- archive text never read, state bounded by the
    assignment table (one row per incoming doc)."""
    from pyspark.errors import AnalysisException

    from ..sinks import _replace_dir, recover_replace_dir

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        staging = path.rstrip("/") + "__erstaging"
        recover_replace_dir(spark, staging, path)
        assigned = entity_assign_incremental(
            batch_df, base_sigs, base_fields, base_labels
        )
        pool = assigned
        try:
            existing = spark.read.parquet(path)
        except AnalysisException as e:
            if ("PATH_NOT_FOUND" not in str(e)
                    and "Path does not exist" not in str(e)):
                raise
            existing = None
        if existing is not None:
            pool = existing.select(
                "doc_id", "entity_id", "is_new_entity"
            ).unionByName(assigned).dropDuplicates(["doc_id"])
        pool.write.mode("overwrite").parquet(staging)
        _replace_dir(spark, staging, path)

    return (
        stream_docs.writeStream
        .foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


QUERIES = {
    "entity_resolution_golden": entity_resolution_golden,
    "er_append": er_append,
    "er_reresolve": er_reresolve,
    "prf_query_expansion": prf_query_expansion,
    "group_kfold_split": group_kfold_split,
    "score_decile_lift": score_decile_lift,
}


_ER_CORPUS_SQL = f"""
    SELECT doc_id, text, lang, source FROM documents
    UNION ALL
    SELECT doc_id + {ER_OFFSET} AS doc_id,
           array_to_string(list_slice(w, 3, len(w)), ' ') AS text,
           lang, 'redelivery' AS source
    FROM (SELECT doc_id, lang, {_W_SQL} AS w FROM documents
          WHERE doc_id % 5 = 0)
"""


_ER_RERESOLVE_CORPUS_SQL = f"""
    SELECT doc_id, text, lang, source FROM documents
    UNION ALL
    SELECT doc_id + {ER_OFFSET} AS doc_id,
           array_to_string(list_slice(w, 3, len(w)), ' ') AS text,
           lang, 'redelivery' AS source
    FROM (SELECT doc_id, lang, {_W_SQL} AS w FROM documents
          WHERE doc_id % 10 = 0)
"""


def _er_oracle_sql() -> str:
    return _golden_resolve_sql(_ER_CORPUS_SQL)


def _er_reresolve_oracle_sql() -> str:
    """FROM-SCRATCH golden resolve over archive + appended batch: the
    equivalence oracle for :func:`er_reresolve` -- the Spark side never
    re-verifies an archive pair, the oracle resolves everything from
    zero; hash-equality of the two IS the append+reresolve == resolve
    proof."""
    return _golden_resolve_sql(_ER_RERESOLVE_CORPUS_SQL)


def _golden_resolve_sql(corpus_sql: str) -> str:
    return f"""
        WITH RECURSIVE corpus AS ({corpus_sql}),
        {_bands_cte("corpus")},
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a
            JOIN bands b ON a.band = b.band AND a.sig = b.sig
                        AND a.doc_id < b.doc_id
        ),
        wds AS (
            SELECT doc_id, list_distinct({_W0_SQL}) AS wd, lang
            FROM corpus
        ),
        matched AS (
            SELECT c.doc_a, c.doc_b
            FROM cand c
            JOIN wds a ON a.doc_id = c.doc_a
            JOIN wds b ON b.doc_id = c.doc_b
            WHERE a.lang = b.lang
              AND (1000 * len(list_intersect(a.wd, b.wd)))
                  // (len(a.wd) + len(b.wd)
                      - len(list_intersect(a.wd, b.wd))) >= {ER_JACCARD_PM}
        ),
        edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM matched
            UNION
            SELECT doc_b AS src, doc_a AS dst FROM matched
        ),
        reach(n, m) AS (
            SELECT src AS n, src AS m FROM edges
            UNION
            SELECT r.n, e.dst AS m FROM reach r JOIN edges e ON r.m = e.src
        ),
        labels AS (SELECT n AS doc_id, min(m) AS label FROM reach GROUP BY n),
        members AS (
            SELECT c.doc_id,
                   coalesce(l.label, c.doc_id) AS entity_id,
                   CAST(length(coalesce(c.text, '')) AS BIGINT) AS n_chars,
                   c.source, c.lang
            FROM corpus c LEFT JOIN labels l USING (doc_id)
        ),
        golden AS (
            SELECT entity_id, doc_id AS golden_doc_id
            FROM (SELECT entity_id, doc_id,
                         row_number() OVER (
                             PARTITION BY entity_id
                             ORDER BY n_chars DESC, doc_id ASC) AS rn
                  FROM members)
            WHERE rn = 1
        )
        SELECT m.entity_id,
               CAST(count(*) AS INTEGER) AS n_members,
               any_value(g.golden_doc_id) AS golden_doc_id,
               max(m.n_chars) AS golden_chars,
               CAST(count(DISTINCT m.source) AS INTEGER) AS n_sources,
               CAST(count(DISTINCT m.lang) AS INTEGER) AS n_langs,
               sum(m.n_chars) AS total_chars
        FROM members m JOIN golden g ON g.entity_id = m.entity_id
        GROUP BY m.entity_id
    """


def _er_append_oracle_sql() -> str:
    return f"""
        WITH RECURSIVE base AS (
            SELECT doc_id, text, lang FROM documents WHERE doc_id % 2 = 0
        ),
        incoming AS (
            SELECT doc_id, text, lang FROM documents WHERE doc_id % 2 = 1
            UNION ALL
            SELECT doc_id + {ER_OFFSET} AS doc_id,
                   array_to_string(list_slice(w, 3, len(w)), ' ') AS text,
                   lang
            FROM (SELECT doc_id, lang, {_W_SQL} AS w FROM documents
                  WHERE doc_id % 10 = 0)
        ),
        {_bands_cte("base")},
        {_bands_cte("incoming", "_n")},
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a
            JOIN bands b ON a.band = b.band AND a.sig = b.sig
                        AND a.doc_id < b.doc_id
        ),
        bwd AS (
            SELECT doc_id, list_distinct({_W0_SQL}) AS wd, lang FROM base
        ),
        matched AS (
            SELECT c.doc_a, c.doc_b
            FROM cand c
            JOIN bwd a ON a.doc_id = c.doc_a
            JOIN bwd b ON b.doc_id = c.doc_b
            WHERE a.lang = b.lang
              AND (1000 * len(list_intersect(a.wd, b.wd)))
                  // (len(a.wd) + len(b.wd)
                      - len(list_intersect(a.wd, b.wd))) >= {ER_JACCARD_PM}
        ),
        edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM matched
            UNION
            SELECT doc_b AS src, doc_a AS dst FROM matched
        ),
        reach(n, m) AS (
            SELECT src AS n, src AS m FROM edges
            UNION
            SELECT r.n, e.dst AS m FROM reach r JOIN edges e ON r.m = e.src
        ),
        labels AS (SELECT n AS doc_id, min(m) AS label FROM reach GROUP BY n),
        base_labels AS (
            SELECT b.doc_id, coalesce(l.label, b.doc_id) AS entity_id
            FROM base b LEFT JOIN labels l USING (doc_id)
        ),
        nwd AS (
            SELECT doc_id, list_distinct({_W0_SQL}) AS nwd, lang AS nlang
            FROM incoming
        ),
        ncand AS (
            SELECT DISTINCT nb.doc_id AS new_id, bb.doc_id AS base_id
            FROM bands_n nb
            JOIN bands bb ON nb.band = bb.band AND nb.sig = bb.sig
        ),
        nmatch AS (
            SELECT c.new_id, min(bl.entity_id) AS matched_entity
            FROM ncand c
            JOIN nwd n ON n.doc_id = c.new_id
            JOIN bwd w ON w.doc_id = c.base_id
            JOIN base_labels bl ON bl.doc_id = c.base_id
            WHERE n.nlang = w.lang
              AND (len(n.nwd) + len(w.wd)
                   - len(list_intersect(n.nwd, w.wd))) > 0
              AND (1000 * len(list_intersect(n.nwd, w.wd)))
                  // (len(n.nwd) + len(w.wd)
                      - len(list_intersect(n.nwd, w.wd)))
                  >= {ER_JACCARD_PM}
            GROUP BY c.new_id
        )
        SELECT i.doc_id,
               coalesce(m.matched_entity, i.doc_id) AS entity_id,
               m.matched_entity IS NULL AS is_new_entity
        FROM incoming i LEFT JOIN nmatch m ON m.new_id = i.doc_id
    """


def _prf_oracle_sql() -> str:
    from .sparse import POSTINGS_SQL

    return f"""
        WITH {POSTINGS_SQL},
        qterms AS (
            SELECT doc_id AS query_id, u.term
            FROM (SELECT doc_id, list_distinct({_W_SQL}) AS w
                  FROM documents WHERE doc_id < {PRF_QUERIES}),
                 unnest(w) AS u(term)
        ),
        qi AS (
            SELECT query_id, v.idx FROM qterms
            JOIN vocab v ON qterms.term = v.term
        ),
        base AS (
            SELECT q.query_id, p.doc_id, round(sum(p.w), 6) AS sparse
            FROM post p JOIN qi q ON p.idx = q.idx
            WHERE p.doc_id <> q.query_id
            GROUP BY q.query_id, p.doc_id
        ),
        fb AS (
            SELECT query_id, doc_id FROM (
                SELECT query_id, doc_id,
                       row_number() OVER (PARTITION BY query_id
                           ORDER BY sparse DESC, doc_id ASC) AS rn
                FROM base)
            WHERE rn <= {PRF_FB_K}
        ),
        expw AS (
            SELECT f.query_id, p.idx, round(sum(p.w), 6) AS ew
            FROM fb f JOIN post p ON p.doc_id = f.doc_id
            GROUP BY f.query_id, p.idx
        ),
        expt AS (
            SELECT query_id, idx FROM (
                SELECT e.query_id, e.idx,
                       row_number() OVER (PARTITION BY e.query_id
                           ORDER BY e.ew DESC, e.idx ASC) AS rn
                FROM expw e
                WHERE NOT EXISTS (
                    SELECT 1 FROM qi
                    WHERE qi.query_id = e.query_id AND qi.idx = e.idx))
            WHERE rn <= {PRF_EXP_K}
        ),
        qvec AS (
            SELECT query_id, idx, 1.0 AS qw FROM qi
            UNION ALL
            SELECT query_id, idx, {PRF_EXP_W} AS qw FROM expt
        ),
        rescored AS (
            SELECT q.query_id, p.doc_id AS neighbor_id,
                   round(sum(p.w * q.qw), 6) AS score
            FROM post p JOIN qvec q ON p.idx = q.idx
            WHERE p.doc_id <> q.query_id
            GROUP BY q.query_id, p.doc_id
        )
        SELECT query_id, neighbor_id,
               CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY score DESC, neighbor_id ASC) AS INTEGER) AS rank,
               score
        FROM rescored
        QUALIFY rank <= {PRF_TOP_K}
    """


def _gkf_oracle_sql() -> str:
    return f"""
        WITH per AS (
            SELECT CAST(CAST('0x' || substr(md5('gkf:' || source), 1, 8)
                             AS BIGINT) % {K_FOLDS} AS INTEGER) AS fold,
                   source,
                   len({_W0_SQL}) AS ntok
            FROM documents
        ),
        agg AS (
            SELECT fold,
                   CAST(count(DISTINCT source) AS INTEGER) AS n_sources,
                   count(*) AS n_docs,
                   CAST(sum(ntok) AS BIGINT) AS n_tokens
            FROM per GROUP BY fold
        )
        SELECT fold, n_sources, n_docs, n_tokens,
               (1000 * n_docs) // (SELECT sum(n_docs) FROM agg) AS docs_pm
        FROM agg
    """


def _lift_oracle_sql(qc_score_sql: str) -> str:
    return f"""
        WITH scored AS ({qc_score_sql}),
        lab AS (
            SELECT s.doc_id, s.score_u,
                   CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS pos
            FROM scored s JOIN documents d ON d.doc_id = s.doc_id
        ),
        ranked AS (
            SELECT pos,
                   row_number() OVER (
                       ORDER BY score_u DESC, doc_id ASC) AS rn,
                   count(*) OVER () AS n
            FROM lab
        ),
        dec AS (
            SELECT CAST(((rn - 1) * {N_DECILES}) // n AS INTEGER) AS decile,
                   count(*) AS n_docs,
                   CAST(sum(pos) AS BIGINT) AS n_pos
            FROM ranked GROUP BY 1
        ),
        tot AS (
            SELECT sum(n_docs) AS total_docs, sum(n_pos) AS total_pos
            FROM dec
        )
        SELECT d.decile, d.n_docs, d.n_pos,
               round(d.n_pos::DOUBLE / d.n_docs, 4) AS pos_rate_4dp,
               CAST((SELECT sum(p.n_pos) FROM dec p
                     WHERE p.decile <= d.decile) AS BIGINT) AS cum_pos,
               (1000 * (SELECT sum(p.n_pos) FROM dec p
                        WHERE p.decile <= d.decile)) // t.total_pos
                   AS capture_pm,
               round((d.n_pos::DOUBLE / d.n_docs)
                     / (t.total_pos::DOUBLE / t.total_docs), 4) AS lift_4dp
        FROM dec d, tot t
    """


def _qc_score_body() -> str:
    """The classifier's (doc_id, score_u) subquery, lifted verbatim
    from selection's oracle so the two surfaces can never drift."""
    from .selection import ORACLE

    sql = ORACLE["quality_classifier_hashed"]
    return (
        f"SELECT doc_id, score_u FROM ({sql})"
    )


ORACLE = {
    "entity_resolution_golden": _er_oracle_sql(),
    "er_append": _er_append_oracle_sql(),
    "er_reresolve": _er_reresolve_oracle_sql(),
    "prf_query_expansion": _prf_oracle_sql(),
    "group_kfold_split": _gkf_oracle_sql(),
    "score_decile_lift": _lift_oracle_sql(_qc_score_body()),
}
