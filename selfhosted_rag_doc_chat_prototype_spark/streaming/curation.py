"""The curation pipeline's CONTINUOUS face: the same quality /
dedup / decontamination semantics as ``operators/pretrain.py`` and
``operators/dedup.py``, composed over a document stream with bounded
state (SURVEY.md section 2.10 generalized from telemetry to ingest).

Stage placement follows what each stage needs, not a fixed recipe:

- **quality gate** -- pure stateless column expressions (the exact
  ``_quality_exprs``/``_tempered_exprs`` builders the batch queries
  use); runs in-line on the stream with zero state.
- **exact dedup** -- ``dropDuplicatesWithinWatermark`` on the content
  hash: state holds only the arrival window, evicted by the event-time
  watermark (the lambda split with the batch archive dedup is the
  documented pattern on ``dedup.streaming_exact_dedup_plan``).
- **decontamination** -- the benchmark gram set is STATIC and small
  (benchmark suites are thousands of items); it broadcasts into a
  stream-static LEFT SEMI equi-join on exploded grams to flag
  contaminated docs, then the clean side proceeds. No stream state at
  all: the join is per-row against a broadcast table.

At 100 TB/day this is the shape you want: the only stateful operator is
keyed by content hash with watermark-bounded size; everything else is
map-side or broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.pretrain import (DECON_K, _quality_exprs, _tempered_exprs,
                                  gram_array, intradoc_clean_text)


def intradoc_clean(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stateless within-document repetition removal (the streaming face
    of ``pretrain.intradoc_dedup``): rewrite ``text_col`` to its
    keep-first-sentence form in-line. Placed BEFORE hashing/dedup so a
    re-delivered doc that grew trailing repetition still collapses to
    the same content hash."""
    return docs.withColumn(text_col, intradoc_clean_text(text_col))


def quality_gate(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stateless curation projection: keep flags + token count from the
    shared expression builders. Works identically on a stream or batch
    DataFrame (same plan)."""
    q = _quality_exprs(text_col=text_col)
    t = _tempered_exprs(text_col=text_col)
    return docs.select(
        "*",
        q["n_words"].alias("tok"),
        q["keep"].alias("quality_keep"),
        t["kept"].alias("sample_keep"),
        F.md5(text_col).alias("content_md5"),
    ).filter((F.col("quality_keep") == 1) & (F.col("sample_keep") == 1))


def doc_grams_stream(docs: DataFrame, text_col: str = "text",
                     k: int = DECON_K) -> DataFrame:
    """(doc_id, gram) explode of k-word grams -- stateless, stream-safe
    (the same ``pretrain.gram_array`` builder the batch side uses)."""
    return docs.select(
        "doc_id",
        F.explode(F.array_distinct(gram_array(text_col, k))).alias("gram"),
    )


# documented size bound of the collect_set decontamination face: the
# whole benchmark gram set becomes ONE array row collected to the
# driver and broadcast -- fine for real benchmark suites (10^3-10^5
# grams, a few MB), wrong past a few million grams (single-row Arrow
# transfer + per-doc array_intersect against a giant literal). Past
# the bound the plan falls back to a stream-static LEFT ANTI join
# (below); past executor broadcast memory entirely, decontaminate in a
# foreachBatch sink with the batch shuffle-join path
# (operators/pretrain.decontaminate_benchmark_overlap).
BENCH_GRAMS_BROADCAST_MAX = 1_000_000


def streaming_curation_plan(
    stream_docs: DataFrame,
    bench_grams: DataFrame,
    ts_col: str = "ingest_ts",
    watermark: str = "10 minutes",
    clean_intradoc: bool = False,
    bench_gram_count: int | None = None,
) -> DataFrame:
    """quality gate -> watermark-bounded exact dedup -> contaminated
    docs flagged via a stream-static broadcast semi-join on grams,
    subtracted with a stateless array check. Emits the surviving
    (doc_id, tok, content_md5, ``ts_col``) rows in append mode.

    ``bench_grams`` must be a STATIC (batch) DataFrame with a ``gram``
    column. Two join-shape tiers, guarded by
    ``BENCH_GRAMS_BROADCAST_MAX`` (r8):

    - at benchmark-suite size (the normal case) the distinct grams are
      collected into ONE broadcast array row and each doc runs a
      stateless ``array_intersect`` check -- no stream state, no
      per-gram explode;
    - past the bound, collecting one giant array row is the wrong
      plan: the grams stay a TABLE and the clean side is a
      stream-static LEFT ANTI join on ``array_contains(doc grams,
      bench.gram)`` -- same zero-state append semantics, bounded by
      executor broadcast memory instead of a single driver row.

    ``bench_gram_count`` overrides the distinct-count probe of the
    static side (pass it when the caller already knows the suite
    size; the probe is a plan-shape decision on the STATIC side only,
    the stream is never counted).

    ``clean_intradoc`` prepends the stateless within-document
    repetition cleaner, so re-deliveries that grew repetition still
    dedup by content hash."""
    if clean_intradoc:
        stream_docs = intradoc_clean(stream_docs)
    gated = quality_gate(stream_docs)
    deduped = (
        gated.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["content_md5"])
    )
    grams = gram_array("text", DECON_K)
    if bench_gram_count is None:
        bench_gram_count = bench_grams.select("gram").distinct().count()
    if bench_gram_count > BENCH_GRAMS_BROADCAST_MAX:
        bg = bench_grams.select("gram").distinct()
        return (
            deduped.withColumn("_grams", F.array_distinct(grams))
            .join(F.broadcast(bg),
                  F.array_contains(F.col("_grams"), F.col("gram")),
                  "left_anti")
            .select("doc_id", "tok", "content_md5", ts_col)
        )
    bench_set = F.broadcast(
        bench_grams.select("gram").distinct()
        .agg(F.collect_set("gram").alias("bench_grams"))
    )
    return (
        deduped.crossJoin(bench_set)
        .filter(F.size(F.array_intersect(grams, F.col("bench_grams"))) == 0)
        .select("doc_id", "tok", "content_md5", ts_col)
    )
