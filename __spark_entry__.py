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


def _tuned(fn: Callable[[SparkSession, str], DataFrame]):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        # idempotent: the oracle compare depends on session confs the
        # driver's vanilla session may not carry (UTC timezone for
        # date bucketing, Arrow batching, AQE) -- pin them per call
        tune_session(spark)
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _tuned(fn) for name, fn in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return all_oracles()
