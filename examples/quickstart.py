"""Quickstart: the three workflows a reference user runs, end to end.

    python examples/quickstart.py [sf_dir]

1. RAG retrieval with citations (the `/api/v1/query` lifecycle).
2. Corpus curation: quality -> dedup -> decontamination -> packing.
3. Lifecycle analytics over the events stream.

Each returns a DataFrame you can inspect, write, or compose further;
nothing here is special-cased for the demo -- these are the same
operators `__spark_entry__.queries()` registers and the DuckDB oracle
gate checks.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from selfhosted_rag_doc_chat_prototype_spark.operators.analytics import (  # noqa: E402
    a4_error_rate_by_day,
    funnel_view_click_purchase,
)
from selfhosted_rag_doc_chat_prototype_spark.operators.dedup import (  # noqa: E402
    dedup_semantic_keep,
    knn_graph_lsh,
)
from selfhosted_rag_doc_chat_prototype_spark.operators.pretrain import (  # noqa: E402
    curate_corpus_e2e,
    curriculum_quality_phases,
    domain_mixture_resample,
)
from selfhosted_rag_doc_chat_prototype_spark.operators.mdsplit import (  # noqa: E402
    chunk_markdown_reference,
)
from selfhosted_rag_doc_chat_prototype_spark.operators.pq import (  # noqa: E402
    anns_ivfpq_topk,
)
from selfhosted_rag_doc_chat_prototype_spark.operators.similarity import (  # noqa: E402
    anns_recall_report,
)
from selfhosted_rag_doc_chat_prototype_spark.operators.rag import (  # noqa: E402
    rag_mmr_rerank,
    rag_retrieve_citations,
)
from selfhosted_rag_doc_chat_prototype_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    print("== RAG retrieval with citations ==")
    rag_retrieve_citations(spark, sf_dir).show(8, truncate=60)

    print("== IVF-PQ retrieval (16 B/vector codes, exact refine) ==")
    anns_ivfpq_topk(spark, sf_dir).show(8)

    print("== Recall@10 per approximate serve path (index tuning) ==")
    anns_recall_report(spark, sf_dir).groupBy("strategy") \
        .avg("recall").orderBy("strategy").show()

    print("== Reference-boundary markdown chunks (parity splitter) ==")
    chunk_markdown_reference(spark, sf_dir).show(4, truncate=50)

    print("== MMR-diversified retrieval ==")
    rag_mmr_rerank(spark, sf_dir).orderBy("query_id", "mmr_rank").show(8)

    print("== Curated + packed pretraining corpus (first shards) ==")
    curate_corpus_e2e(spark, sf_dir).show(8)

    print("== Domain mixture after resampling ==")
    domain_mixture_resample(spark, sf_dir).groupBy("lang").count().show()

    print("== Exact-integer k-means over the embedding corpus ==")
    from selfhosted_rag_doc_chat_prototype_spark.operators.ml import embed_kmeans

    embed_kmeans(spark, sf_dir).groupBy("cluster") \
        .agg({"dist_u": "sum", "*": "count"}).orderBy("cluster").show()

    print("== Semantic dedup (SemDeDup): kept share per cluster size ==")
    dedup_semantic_keep(spark, sf_dir).groupBy("kept").count().show()

    print("== kNN graph head (graph-based curation input) ==")
    knn_graph_lsh(spark, sf_dir).orderBy("vec_id", "rank").show(8)

    print("== Curriculum phases (easy-to-hard reader order) ==")
    curriculum_quality_phases(spark, sf_dir).groupBy("phase").count() \
        .orderBy("phase").show()

    print("== Golden-record entity resolution (r9 linkage family) ==")
    from selfhosted_rag_doc_chat_prototype_spark.operators.linkage import (
        entity_resolution_golden,
        prf_query_expansion,
    )

    entity_resolution_golden(spark, sf_dir).filter("n_members > 1") \
        .orderBy("entity_id").show(6)

    print("== RM3 pseudo-relevance-feedback retrieval ==")
    prf_query_expansion(spark, sf_dir).orderBy("query_id", "rank").show(8)

    print("== Error-rate analytics ==")
    a4_error_rate_by_day(spark, sf_dir).orderBy("day").show(5)

    print("== Conversion funnel (view -> click -> purchase) ==")
    funnel_view_click_purchase(spark, sf_dir).orderBy("step_n").show()

    spark.stop()


if __name__ == "__main__":
    main()
