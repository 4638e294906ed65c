"""Compact-line emission contract (r12-VERDICT item 1 + 8).

The driver captures ONE stdout line from bench.py and compares its
``queries`` map round over round. r12's shrink ladder truncated the map
to the N slowest queries, which made the driver compare two
near-disjoint windows (8 phantom "dropped_from_bench" entries, a
4-query geomean). The contract now: whenever truncation happens, the
emitted map always contains the frozen HEADLINE_CORE 30 plus every
COMPACT_COMPAT name (what the previous round's line carried), the line
stays under the 1950-char budget, and the drift-normalization field is
present. No Spark session needed -- pure dict plumbing.
"""

import json

import bench


def _fake_result(n_queries: int = 190, sec: float = 1.23) -> dict:
    # real registry names so HEADLINE_CORE/COMPACT_COMPAT intersect them
    names = list(dict.fromkeys(bench.HEADLINE))[:n_queries]
    timings = {n: sec + i * 0.01 for i, n in enumerate(names)}
    derived = {
        "ingest_docs_per_min": 124740.1,
        "retrieval_ms_per_query_batched": 151.6,
        "retrieval_serve_p50_ms": 1566.0,
    }
    # a realistic pile of scale ratios so the ladder has to shrink
    for n in names[:30]:
        derived[f"{n}_10x_sec"] = 9.99
        derived[f"{n}_scale_ratio_10x"] = 0.42
    return {
        "metric": "headline_suite_wall_seconds",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "headline_core_wall_seconds": 30.0,
        "calibration_normalized_core_wall": 27.5,
        "queries": timings,
        "run_spread_max_over_min": {n: 1.1 for n in names},
        "rdd_residency_after_query": {
            n: {"n": i, "mem_mb": 1.0 * i, "disk_mb": 0.0}
            for i, n in enumerate(names)
        },
        "matview_build_seconds": {"embed_documents": 3.2},
        "warmup_discarded": ["anns_recall_report"],
        "calibration": {"calibration_cpu_sec": 0.5,
                        "calibration_shuffle_sec": 2.4},
        "derived": derived,
        "runs_per_query": 3,
        "wall_seconds_all_runs": 400.0,
        "sf": 0.1,
    }


def test_truncated_line_keeps_core_and_compat():
    line = bench.make_compact_line(_fake_result(), "BENCH_local.json")
    assert len(line) <= 1950
    parsed = json.loads(line)
    q = parsed["queries"]
    assert parsed["queries_truncated_see_detail_file"] is True
    missing_core = [n for n in bench.HEADLINE_CORE if n not in q]
    missing_compat = [n for n in bench.COMPACT_COMPAT if n not in q]
    assert not missing_core, f"core names truncated away: {missing_core}"
    assert not missing_compat, f"compat names truncated away: {missing_compat}"
    # the driver's comparable fields survive every shrink
    assert "headline_core_wall_seconds" in parsed
    assert "calibration_normalized_core_wall" in parsed
    assert "calibration" in parsed
    # the residency curve stays in the detail file; stdout keeps the end
    assert "rdd_residency_after_query" not in parsed
    assert parsed["residency_final"]["n"] > 0


def test_small_map_is_emitted_whole():
    result = _fake_result(n_queries=5)
    line = bench.make_compact_line(result, "BENCH_isolate.json")
    parsed = json.loads(line)
    assert set(parsed["queries"]) == set(list(result["queries"]))
    assert "queries_truncated_see_detail_file" not in parsed


def test_backfill_prefers_slowest_extras():
    result = _fake_result()
    # make one non-stable query clearly the slowest overall
    stable = set(bench.HEADLINE_CORE) | set(bench.COMPACT_COMPAT)
    extra = next(n for n in result["queries"] if n not in stable)
    result["queries"][extra] = 99.9
    line = bench.make_compact_line(result, "BENCH_local.json")
    parsed = json.loads(line)
    assert parsed["queries"].get(extra) == 99.9


def test_compat_names_are_registered():
    assert set(bench.COMPACT_COMPAT) <= set(bench.HEADLINE)
