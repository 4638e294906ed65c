"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` and
``oracle_sql()`` expose every implemented operator from SURVEY.md
section 2 for the driver's DuckDB-oracle correctness gate at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from selfhosted_rag_doc_chat_prototype_spark.plans.registry import all_oracles, all_queries
from selfhosted_rag_doc_chat_prototype_spark.session import tune_session

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: brute-force cosine top-k retrieval (the
    reference's J4 RAG retrieval core) over the sf0.001 tables."""
    tune_session(spark)
    return all_queries()["anns_bruteforce_topk"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
