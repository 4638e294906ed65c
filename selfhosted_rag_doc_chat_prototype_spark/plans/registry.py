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
    ("operators", "linkage"),
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


# --------------------------------------------------------------------------
# Plan-audit rule (round 8): no UNPARTITIONED WindowExec over unbounded
# rows anywhere in a registered plan -- a window with an empty PARTITION
# BY is a single-reducer sort, the scale-killer family the shared
# operators.rank.distributed_rank helper exists to replace. Queries
# listed here are the AUDITED EXCEPTIONS: their global windows run over
# provably BOUNDED row counts (a constant, a LIMIT-k survivor set, or a
# calendar/bucket/domain vocabulary), where one reducer is the correct
# plan and a distributed rank would only add shuffles. Every entry
# carries its bound; tests/test_plans.py::test_no_unpartitioned_fact_
# windows enforces membership, and a new query with a global window
# fails the suite until it is either rewired onto distributed_rank or
# justified here.
# --------------------------------------------------------------------------
BOUNDED_GLOBAL_WINDOWS: dict[str, str] = {
    "a7_weekly_lag": "lag over week grain (observed ISO weeks)",
    "acf_daily_counts": "lag/rank over day grain (observed days)",
    "cusum_control_chart": "running sums over day grain (observed days)",
    "daily_anomaly_zscore": "rolling mean over day grain (observed days)",
    "mad_robust_anomaly": "median ranks over day grain (observed days)",
    "seasonal_decompose_daily": "rolling window over day grain",
    "seq_len_histogram":
        "cumulative share over length buckets (<= max_len/bucket rows)",
    "domain_mixture_resample":
        "scalar total over domain grain (weight-table vocabulary)",
    "session_trigram_mining":
        "rank label over the SEQ_TOP survivors of a sort-LIMIT",
    "sketch_countmin_heavyhitters":
        "rank label over the CMS_TOP=20 survivors of a sort-LIMIT",
    "vocab_top_coverage":
        "rank/coverage over the VOCAB_TOP survivors of a sort-LIMIT",
    "zipf_fit_report":
        "rank over the ZIPF_V survivors of a sort-LIMIT",
    "weighted_sample_es":
        "rank label over the ES_K=64 survivors of a sort-LIMIT",
    "stratified_holdout_split":
        "largest-remainder quota rank over source grain (|sources| rows)",
    "temporal_leakage_split":
        "cutoff running-sum over day grain (observed days)",
    "psi_value_drift":
        "cutoff running-sum over day grain (observed days)",
    "token_budget_waterfill":
        "water-filling rank/cumsum over source grain (domain vocabulary)",
}


def unpartitioned_window_specs(plan: str) -> list[str]:
    """Window specs in a physical-plan string whose PARTITION BY is
    empty: the first top-level windowspecdefinition argument is either
    the frame itself or an ORDER BY entry (``... ASC/DESC NULLS ...``)
    rather than a partition column. Used by the plan audit and the
    test-suite rule."""
    import re

    out = []
    for m in re.finditer(r"windowspecdefinition\(", plan):
        i, depth, first = m.end(), 1, []
        while depth and i < len(plan):
            ch = plan[i]
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            if depth == 1 and ch == ",":
                break
            first.append(ch)
            i += 1
        head = "".join(first).strip()
        if head.startswith("specifiedwindowframe") or re.search(
            r" (ASC|DESC) NULLS", head
        ):
            out.append(head)
    return out
