"""Fresh-JVM isolation bench: times each named query in its OWN
``python bench.py`` subprocess (one new SparkSession/JVM per query,
scale-evidence passes skipped), so a timing reflects the plan alone --
not the GC/code-cache state the 90-query suite leaves behind. This is
the arbiter the round-5 verdict asked for: when a suite timing drifts
with no plan change, the isolated number decides whether it is a real
regression or single-JVM load noise.

Usage:
    python tools/bench_isolate.py [name ...]   # default: the r5 drift set
Env:
    SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
    SPARK_GRAFT_BENCH_RUNS (default 5 here: isolation is cheap per query)

Prints one JSON line: {"metric": "isolated_query_seconds",
"queries": {name: best_sec}, "spread": {name: max_over_min}}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

# the seven queries the round-5 bench drifted 16-34% with no plan change
DEFAULT_SET = [
    "anns_label_maxsim_topk",
    "lm_perplexity_score",
    "anns_bq_hamming_topk",
    "anns_filtered_topk",
    "q3_shipping_priority",
    "rag_mmr_rerank",
    "rag_rerank_lexical",
]


def main() -> int:
    names = sys.argv[1:] or DEFAULT_SET
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    timings: dict[str, float] = {}
    spread: dict[str, float] = {}
    for name in names:
        env = dict(
            os.environ,
            SPARK_GRAFT_BENCH_ONLY=name,
            SPARK_GRAFT_BENCH_RUNS=os.environ.get(
                "SPARK_GRAFT_BENCH_RUNS", "5"
            ),
        )
        proc = subprocess.run(
            [sys.executable, os.path.join(here, "bench.py")],
            env=env, cwd=here, capture_output=True, text=True,
        )
        if proc.returncode != 0:
            print(f"FAIL {name}: {proc.stderr[-500:]}", file=sys.stderr)
            return 1
        with open(os.path.join(here, "BENCH_isolate.json")) as f:
            res = json.load(f)
        timings[name] = res["queries"][name]
        spread[name] = res["run_spread_max_over_min"][name]
        print(f"{name}: {timings[name]}s (spread {spread[name]}x)",
              file=sys.stderr)
    print(json.dumps({
        "metric": "isolated_query_seconds",
        "queries": timings,
        "spread": spread,
        "sf_dir": os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    }, separators=(",", ":")))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
