"""Sparse-vector representation + BM25 term weighting (SURVEY.md
sections 1.3, 2.4 T10).

The reference stores sparse BM25 embeddings next to the dense vectors
(fastembed ``Qdrant/bm25``, ``services/database_qdrant_sparse_testing.py:
148-163``) and fuses both legs at query time with prefetch caps
(``:33-46``). This module is the representation half: every document
gets a ``{indices: array<int>, values: array<double>}`` sparse vector
whose entries are Okapi BM25 term weights (tf saturation * idf), over a
deterministic corpus vocabulary. ``operators/similarity.py``'s hybrid
fusion consumes the exploded postings produced here, so dot(query
one-hot, doc sparse vector) IS the BM25 score.

Scale shape (100 TB):

- term explode + (doc, term) tf aggregation: one shuffle keyed by
  (doc_id, term) with map-side combine; postings inherit it.
- the vocabulary is tiny relative to the corpus (Heaps' law: ~millions
  of terms vs billions of docs), so the ``row_number() OVER (ORDER BY
  term)`` index assignment -- a single-partition window over the VOCAB
  only, never the corpus -- is deliberate and cheap, and the vocab /
  corpus-stats joins are broadcasts.
- query-side term lookups join a broadcast vocab, so scoring a query
  batch is one broadcast-join + groupBy over only the posting rows
  that share a term with some query (the inverted-index join).
- in production the vocab + sparse vectors are BUILT ONCE and stored
  (``build_sparse_vectors`` -> K2/K3 sinks); queries consume the
  stored postings. The self-contained oracle queries rebuild them
  inline only so the DuckDB twin sees identical inputs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import table

BM25_K1 = 1.2
BM25_B = 0.75


def words_col(text: Column) -> Column:
    """Whitespace tokens of ``text`` (shared with the BM25/fusion SQL:
    ``list_filter(string_split_regex(trim(text), '[ \\t\\n\\x0B\\f\\r]+'), ...)``)."""
    return F.filter(F.split(F.trim(text), r"[ \t\n\x0B\f\r]+"), lambda x: x != F.lit(""))


def _doc_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    w = words_col(F.col("text"))
    return docs.select(
        "doc_id", w.alias("w"), F.size(w).cast("double").alias("dl")
    )


def term_freqs(dw: DataFrame) -> DataFrame:
    """(doc_id, dl, term, tf) -- one shuffle with map-side combine."""
    return (
        dw.select("doc_id", "dl", F.explode("w").alias("term"))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )


# The tf relation is the shared subtree of every sparse consumer
# (postings, vocab, query lookup); in production it is BUILT ONCE and
# stored (module docstring). The self-contained queries reproduce that
# shape by materializing tf to a parquet table once per (session,
# sf_dir) -- without it the corpus tokenize + (doc, term) shuffle
# re-executes up to 4x inside one plan (Catalyst does not reuse the
# exchange across the differently-shaped aggregation subtrees above
# it). A parquet round-trip (not .cache()) so every consumer gets a
# plain pruned scan; values are unchanged because tf is deterministic.
_TF_STORE: dict = {}


def _matview_paths(sf_dir: str) -> tuple[str, str, str]:
    import hashlib
    import os

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = os.path.join(repo_root, "spark-warehouse", "matview")
    return (
        os.path.join(base, f"tf_{tag}"),
        os.path.join(base, f"bmstats_{tag}"),
        os.path.join(base, f"vocab_{tag}"),
    )


def term_freqs_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark, sf_dir)
    if key not in _TF_STORE:
        from .similarity import _matview_complete

        tf_path, stats_path, vocab_path = _matview_paths(sf_dir)
        if all(_matview_complete(p)
               for p in (tf_path, stats_path, vocab_path)):
            _TF_STORE[key] = (
                spark.read.parquet(tf_path),
                spark.read.parquet(stats_path),
                spark.read.parquet(vocab_path),
            )
            return _TF_STORE[key][0]
        dw = _doc_words(spark, sf_dir)
        term_freqs(dw).write.mode("overwrite").parquet(tf_path)
        tf = spark.read.parquet(tf_path)
        # the (n_docs, avgdl) scalar row and the vocabulary index are
        # part of the stored index: computed once (stats from the SAME
        # tokenize pass semantics -- all docs, zero-term docs included;
        # vocab from the stored tf), so query-time consumers never
        # re-scan corpus text or re-run the vocab window
        corpus_stats(dw).write.mode("overwrite").parquet(stats_path)
        vocab(tf).write.mode("overwrite").parquet(vocab_path)
        _TF_STORE[key] = (
            tf,
            spark.read.parquet(stats_path),
            spark.read.parquet(vocab_path),
        )
    return _TF_STORE[key][0]


def corpus_stats_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    term_freqs_cached(spark, sf_dir)
    return _TF_STORE[(spark, sf_dir)][1]


def vocab_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    term_freqs_cached(spark, sf_dir)
    return _TF_STORE[(spark, sf_dir)][2]


def corpus_stats(dw: DataFrame) -> DataFrame:
    return dw.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )




def vocab(tf: DataFrame) -> DataFrame:
    """(term, df, idx): deterministic dense index by sorted term. The
    window is over the vocabulary only (see module docstring)."""
    return (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).cast("double").alias("df"))
        .withColumn(
            "idx",
            F.row_number().over(Window.orderBy("term")).cast("int"),
        )
    )


def _bm25_weight(tf: Column, dl: Column, df: Column, n_docs: Column,
                 avgdl: Column) -> Column:
    idf = F.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
    return idf * tf * (BM25_K1 + 1.0) / (
        tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl)
    )


def postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, idx, w): the exploded sparse vectors / inverted index.
    Vocab and corpus stats are broadcast; postings keep the corpus
    partitioning."""
    tf = term_freqs_cached(spark, sf_dir)
    v = vocab_cached(spark, sf_dir)
    stats = corpus_stats_cached(spark, sf_dir)
    return (
        tf.join(F.broadcast(v), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id", "idx",
            _bm25_weight(F.col("tf"), F.col("dl"), F.col("df"),
                         F.col("n_docs"), F.col("avgdl")).alias("w"),
        )
    )


def _query_terms(spark: SparkSession, sf_dir: str, n_queries: int) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return docs.filter(F.col("doc_id") < n_queries).select(
        F.col("doc_id").alias("query_id"),
        F.explode(F.array_distinct(words_col(F.col("text")))).alias("term"),
    )


def query_indices(spark: SparkSession, sf_dir: str, n_queries: int) -> DataFrame:
    """(query_id, idx): distinct vocabulary indices of each query doc's
    terms -- the one-hot query sparse vector, broadcast-sized."""
    return _query_terms(spark, sf_dir, n_queries).join(
        F.broadcast(vocab_cached(spark, sf_dir)), "term"
    ).select("query_id", "idx")


def bm25_scores(spark: SparkSession, sf_dir: str, n_queries: int) -> DataFrame:
    """(query_id, neighbor_id, sparse): BM25 of each query doc against
    the corpus = dot(query one-hot, doc sparse vector), built from ONE
    shared tf/vocab subtree (the corpus tokenize + (doc, term) shuffle
    is the expensive part -- share it between the postings and the
    query-term lookup instead of deriving it twice). Scores rounded to
    6 so rank ties break identically in Spark and the oracle."""
    tf = term_freqs_cached(spark, sf_dir)
    v = vocab_cached(spark, sf_dir)
    stats = corpus_stats_cached(spark, sf_dir)
    post = (
        tf.join(F.broadcast(v), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id", "idx",
            _bm25_weight(F.col("tf"), F.col("dl"), F.col("df"),
                         F.col("n_docs"), F.col("avgdl")).alias("w"),
        )
    )
    qi = _query_terms(spark, sf_dir, n_queries).join(
        F.broadcast(v), "term"
    ).select("query_id", "idx")
    return (
        post.join(F.broadcast(qi), "idx")
        .filter(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("w"), 6).alias("sparse"))
        .select("query_id", F.col("doc_id").alias("neighbor_id"), "sparse")
    )


def build_sparse_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stored representation: one ``{indices, values}`` sparse
    vector per document, indices sorted, BM25 weights rounded for the
    oracle-checked surface."""
    post = postings(spark, sf_dir)
    entries = F.array_sort(
        F.collect_list(F.struct(F.col("idx"), F.round("w", 4).alias("w")))
    )
    return (
        post.groupBy("doc_id")
        .agg(entries.alias("e"))
        .select(
            "doc_id",
            F.transform("e", lambda x: x["idx"]).alias("indices"),
            F.transform("e", lambda x: x["w"]).alias("values"),
        )
    )


TFIDF_TOP_K = 5


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction: top-``TFIDF_TOP_K`` terms by
    classic tf-idf (``(tf/dl) * ln(n_docs/df)``) over the SAME stored
    tf/vocab subtree the BM25 postings consume -- the
    keyword/tagging stage of a curation pipeline, with a full oracle.
    Scale shape: one broadcast join onto the persisted tf matview plus
    a per-document top-k window (k rows per doc, never corpus-wide);
    the score rounds once at 6 decimals BEFORE ranking (ln() is not
    correctly-rounded across libm/JVM -- docs/ROUNDING.md rule 2, the
    BM25 convention)."""
    tf = term_freqs_cached(spark, sf_dir)
    v = vocab_cached(spark, sf_dir)
    stats = corpus_stats_cached(spark, sf_dir)
    scored = (
        tf.join(F.broadcast(v), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id", "term",
            # rounded ONCE before ranking: ln() is not guaranteed
            # correctly-rounded across libm/JVM, so rank on the
            # 6-decimal value like the BM25 convention
            F.round(
                (F.col("tf") / F.col("dl"))
                * F.log(F.col("n_docs") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("term")
    )
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= TFIDF_TOP_K)
        .select("doc_id", "term", "tfidf", "term_rank")
    )


PHRASE = ("value", "value", "row")  # pinned demo phrase, present at
                                    # every gate scale (incl. the
                                    # repeated-term edge: two legs read
                                    # the SAME posting set)


def phrase_match_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT PHRASE SEARCH over positional postings -- the classic
    inverted-index phrase AND (Manning/IR ch. 2): the phrase
    ``t0 t1 .. tk`` matches at position p iff term ``ti`` occurs at
    ``p + i`` for every i, resolved by equi-joining the per-term
    posting sets on ``(doc_id, pos - i)``. Emits per matching doc the
    match count and first match position (0-based words).

    Scale shape: the ONLY rows that ever shuffle are postings of the
    phrase's own terms -- the term filter sits under the posexplode
    output, so the corpus-sized subtree is a map-only scan+explode and
    the k-leg join chain runs over posting-sized inputs keyed on the
    same ``(doc_id, p0)`` composite (consecutive joins reuse the
    partitioning; with a persisted positional index the legs become
    index lookups and the scan disappears). Duplicate-free by
    construction: positions are unique per (doc, term), so every leg
    is unique on the join key."""
    docs = table(spark, sf_dir, "documents")
    ws = words_col(F.coalesce(F.col("text"), F.lit("")))
    posts = (
        docs.select("doc_id", F.posexplode(ws).alias("pos", "term"))
        .filter(F.col("term").isin(*sorted(set(PHRASE))))
    )
    cur = posts.filter(F.col("term") == PHRASE[0]).select(
        "doc_id", F.col("pos").alias("p0")
    )
    for i, t in enumerate(PHRASE[1:], start=1):
        leg = posts.filter(F.col("term") == t).select(
            "doc_id", (F.col("pos") - i).alias("p0")
        )
        cur = cur.join(leg, ["doc_id", "p0"])
    return (
        cur.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_matches"),
            F.min("p0").cast("int").alias("first_pos"),
        )
        .select(
            "doc_id", F.lit(" ".join(PHRASE)).alias("phrase"),
            "n_matches", "first_pos",
        )
    )


def _phrase_oracle_sql() -> str:
    ws = "[ \\t\\n\\x0B\\f\\r]"
    terms = ", ".join(f"'{t}'" for t in sorted(set(PHRASE)))
    legs = [
        f"(SELECT doc_id, pos AS p0 FROM posts WHERE term = '{PHRASE[0]}') l0"
    ]
    conds = []
    for i, t in enumerate(PHRASE[1:], start=1):
        legs.append(
            f"(SELECT doc_id, pos - {i} AS p0 FROM posts "
            f"WHERE term = '{t}') l{i}"
        )
        conds.append(
            f"l0.doc_id = l{i}.doc_id AND l0.p0 = l{i}.p0"
        )
    return f"""
        WITH t AS (
            SELECT doc_id, list_filter(string_split_regex(
                trim(coalesce(text, '')), '{ws}+'), x -> x <> '') AS ws
            FROM documents
        ),
        posts AS (
            SELECT doc_id, u.p.w AS term,
                   CAST(u.p.i - 1 AS INTEGER) AS pos
            FROM (
                SELECT doc_id,
                       list_transform(range(1, len(ws) + 1),
                           i -> struct_pack(i := i, w := ws[i])) AS ps
                FROM t
            ), unnest(ps) AS u(p)
            WHERE u.p.w IN ({terms})
        ),
        m AS (
            SELECT l0.doc_id AS doc_id, l0.p0 AS p0
            FROM {" JOIN ".join(legs[:1]) + "".join(
                f" JOIN {leg} ON {cond}"
                for leg, cond in zip(legs[1:], conds))}
        )
        SELECT doc_id, '{" ".join(PHRASE)}' AS phrase,
               CAST(count(*) AS BIGINT) AS n_matches,
               CAST(min(p0) AS INTEGER) AS first_pos
        FROM m GROUP BY doc_id
    """


QUERIES = {
    "sparse_vectors_build": build_sparse_vectors,
    "tfidf_top_terms": tfidf_top_terms,
    "phrase_match_positional": phrase_match_positional,
}

_TF_SQL = """
    SELECT doc_id, dl, u.term, CAST(count(*) AS DOUBLE) AS tf
    FROM (
        SELECT doc_id, CAST(len(w) AS DOUBLE) AS dl, w
        FROM (SELECT doc_id,
                     list_filter(string_split_regex(trim(text), '[ \\t\\n\\x0B\\f\\r]+'),
                                 x -> x <> '') AS w
              FROM documents)
    ), unnest(w) AS u(term)
    GROUP BY doc_id, dl, u.term
"""

_STATS_SQL = """
    SELECT CAST(count(*) AS DOUBLE) AS n_docs,
           avg(CAST(len(list_filter(string_split_regex(trim(text), '[ \\t\\n\\x0B\\f\\r]+'),
                                    x -> x <> '')) AS DOUBLE)) AS avgdl
    FROM documents
"""

_VOCAB_SQL = """
    SELECT term, CAST(count(*) AS DOUBLE) AS df,
           CAST(row_number() OVER (ORDER BY term) AS INTEGER) AS idx
    FROM tf GROUP BY term
"""

_W_SQL = (
    f"ln((s.n_docs - v.df + 0.5) / (v.df + 0.5) + 1.0)"
    f" * tf.tf * ({BM25_K1} + 1.0)"
    f" / (tf.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * tf.dl / s.avgdl))"
)

POSTINGS_SQL = f"""
    tf AS ({_TF_SQL}),
    stats AS ({_STATS_SQL}),
    vocab AS ({_VOCAB_SQL}),
    post AS (
        SELECT tf.doc_id, v.idx, {_W_SQL} AS w
        FROM tf JOIN vocab v ON tf.term = v.term, stats s
    )
"""

ORACLE = {
    "phrase_match_positional": _phrase_oracle_sql(),
    "sparse_vectors_build": f"""
        WITH {POSTINGS_SQL}
        SELECT doc_id,
               list(idx ORDER BY idx) AS indices,
               list(round(w, 4) ORDER BY idx) AS "values"
        FROM post GROUP BY doc_id
    """,
    "tfidf_top_terms": f"""
        WITH {POSTINGS_SQL},
        scored AS (
            SELECT tf.doc_id, tf.term,
                   round((tf.tf / tf.dl) * ln(s.n_docs / v.df), 6) AS tfidf
            FROM tf JOIN vocab v ON tf.term = v.term, stats s
        )
        SELECT doc_id, term, tfidf,
               CAST(row_number() OVER (PARTITION BY doc_id
                   ORDER BY tfidf DESC, term ASC) AS INTEGER) AS term_rank
        FROM scored
        QUALIFY term_rank <= {TFIDF_TOP_K}
    """,
}
