"""Query registry: binds every implemented operator (SURVEY.md section 2)
to its Spark callable and, where SQL-expressible, its DuckDB oracle.

Modules contribute ``QUERIES: dict[name, fn(spark, sf_dir) -> DataFrame]``
and ``ORACLE: dict[name, sql]``. A query without an oracle entry gets the
driver's weaker rows-only check (reserved for genuinely non-SQL ops such
as custom stateful streaming).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_MODULES = None

# every module here is REQUIRED: a failed import must fail the
# correctness gate loudly, not silently shrink the query set (a broken
# transitive import would otherwise report "N/N pass" over fewer N)
_EXPECTED = (
    ("operators", "analytics"),
    ("operators", "tpch"),
    ("operators", "textstats"),
    ("operators", "chunking"),
    ("operators", "mdsplit"),
    ("operators", "dedup"),
    ("operators", "pretrain"),
    ("operators", "similarity"),
    ("operators", "pq"),
    ("operators", "sparse"),
    ("operators", "embedding"),
    ("operators", "ingest"),
    ("operators", "rag"),
    ("operators", "multimodal"),
    ("operators", "ml"),
    ("operators", "selection"),
    ("operators", "warehouse"),
    ("operators", "statistics"),
    ("operators", "sessions"),
    ("streaming", "telemetry"),
)


def _modules():
    global _MODULES
    if _MODULES is None:
        mods = []
        failed = []
        for pkg, name in _EXPECTED:
            try:
                mods.append(__import__(
                    f"selfhosted_rag_doc_chat_prototype_spark.{pkg}.{name}",
                    fromlist=[name],
                ))
            except ImportError as e:
                failed.append(f"{pkg}.{name}: {e}")
        if failed:
            raise ImportError(
                "query registry modules failed to import (correctness gate "
                "would silently shrink): " + "; ".join(failed)
            )
        _MODULES = mods
    return _MODULES


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable] = {}
    for mod in _modules():
        out.update(getattr(mod, "QUERIES", {}))
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _modules():
        out.update(getattr(mod, "ORACLE", {}))
    return out
