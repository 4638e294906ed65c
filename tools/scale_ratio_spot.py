"""Spot re-measure 10x scale ratios for named queries only.

Reuses bench.scale_evidence verbatim (same 10x corpus recipes, same
interleaved 1x/10x timing discipline) but restricts the query cohort,
so a ratio can be re-checked after a plan fix without paying the full
suite + full scale pass. The knn-graph and index-append/-delete
evidence that scale_evidence always runs is cheap (<2 min) and
reported too.

Usage:
    python tools/scale_ratio_spot.py name [name ...]
Env:
    SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
    SPARK_GRAFT_BENCH_RUNS (default 3)
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import bench  # noqa: E402


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print("usage: scale_ratio_spot.py name [name ...]", file=sys.stderr)
        return 2
    from selfhosted_rag_doc_chat_prototype_spark.plans.registry import all_queries
    from selfhosted_rag_doc_chat_prototype_spark.session import get_spark

    spark = get_spark(app_name="scale_ratio_spot")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    unknown = [n for n in names if n not in queries]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2
    # restrict the cohorts to the requested names; membership decides
    # which 10x corpus (embeddings / documents / tables) each one runs
    # against, so preserve the original cohort assignment
    bench.SCALE_QUERIES = [n for n in bench.SCALE_QUERIES if n in names]
    bench.DOC_SCALE_QUERIES = [
        n for n in bench.DOC_SCALE_QUERIES if n in names
    ]
    bench.TABLE_SCALE_QUERIES = [
        n for n in bench.TABLE_SCALE_QUERIES if n in names
    ]
    covered = set(
        bench.SCALE_QUERIES + bench.DOC_SCALE_QUERIES
        + bench.TABLE_SCALE_QUERIES
    )
    missing = [n for n in names if n not in covered]
    if missing:
        print(
            f"not in any bench scale cohort (no 10x recipe): {missing}",
            file=sys.stderr,
        )
        return 2

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    # warm once (matviews + JVM), as bench does before timing
    for n in names:
        queries[n](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    timings = {n: 1.0 for n in names}  # gates inclusion only
    out = bench.scale_evidence(spark, sf_dir, queries, timings, n_runs)
    print(json.dumps({"metric": "scale_ratio_spot", "derived": out,
                      "sf_dir": sf_dir}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
