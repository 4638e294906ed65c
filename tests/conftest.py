from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, "/root/repo")

from selfhosted_rag_doc_chat_prototype_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

# r13 (r12-VERDICT item 2): the default suite must complete inside the
# round driver's pytest budget (r12's run was cut at ~87% of 43 min with
# zero failures). The heaviest e2e/replay tests -- each >= ~12 s, jointly
# ~16 min of the 43 -- are skipped by default and run under
# SPARK_GRAFT_FULL_TESTS=1 (the builder's full gate before every close;
# every family keeps at least one representative in the default run).
# Entries are exact nodeid tails: "file.py::test_name[param]".
HEAVY_TESTS = {
    # stream-equals-batch / replay-convergence e2e (representatives kept:
    # test_minhash_dedup_stream..., test_cdc_stream..., sentinel, debounce op)
    "test_streaming.py::test_ohlc_stream_equals_batch_and_replay_converges",
    "test_streaming.py::test_funnel_delayed_ttl_bounds_state",
    "test_streaming.py::test_scd2_stream_equals_batch_and_replay_converges",
    "test_streaming.py::test_debounce_boundary_row_merges_on_both_paths",
    "test_streaming.py::test_continuous_rollup_equals_batch",
    "test_streaming.py::test_request_reply_stream_join",
    "test_streaming.py::test_funnel_stateful_equals_batch",
    "test_streaming.py::test_hll_stream_equals_batch_and_replay_converges",
    "test_streaming.py::test_hll_sink_replay_after_mid_flip_crash",
    "test_streaming.py::test_m4_stream_equals_batch_and_replay_converges",
    "test_streaming.py::test_stateful_user_stats_stream",
    "test_streaming.py::test_skyline_stream_equals_batch_and_replay_converges",
    "test_streams_source.py::test_streaming_index_maintenance_converges",
    # ER e2e twins (the oracle gate covers the registered queries; the
    # invariants + planted-pair tests stay in the default run)
    "test_linkage.py::test_entity_resolution_planted_pair",
    "test_linkage.py::test_er_golden_epoch_binding",
    "test_linkage.py::test_er_reresolve_serves_from_persisted_registry",
    "test_linkage.py::test_er_reresolve_equals_from_scratch_and_replays",
    "test_linkage.py::test_er_stream_equals_batch_and_replay_converges",
    # index-lifecycle e2e (each family keeps its cheaper sibling)
    "test_pq.py::test_tombstone_delete_compact_roundtrip_and_recall_floor",
    "test_pq.py::test_incremental_appends_extend_indexes_without_retrain",
    "test_pq.py::test_append_overwrites_changed_content",
    "test_pq.py::test_append_after_delete_resurrects_point",
    "test_similarity.py::test_retrieve_unified_planner",
    "test_similarity.py::test_late_interaction_served_subset_semantics",
    "test_similarity.py::test_ivf_matview_rebuilds_on_corpus_change",
    "test_similarity.py::test_multiprobe_recall_beats_half_tables",
    "test_ml.py::test_kmeans_corpus_smaller_than_k",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "heavy: long e2e test, skipped unless SPARK_GRAFT_FULL_TESTS=1")


def pytest_collection_modifyitems(config, items):
    if os.environ.get("SPARK_GRAFT_FULL_TESTS"):
        return
    skip = pytest.mark.skip(
        reason="heavy e2e; run with SPARK_GRAFT_FULL_TESTS=1")
    for item in items:
        tail = item.nodeid.split("/")[-1]
        if tail in HEAVY_TESTS or tail.split("[")[0] in HEAVY_TESTS:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    return get_spark(cpus=8, shuffle_partitions=8)


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session", autouse=True)
def _cleanup_throwaway_matviews():
    """Tests build persisted index matviews for throwaway tmp-path
    corpora; their md5 tags are unique per run, so without cleanup the
    matview dir grows forever. Remove only matviews CREATED DURING
    THIS SESSION (mtime guard) whose tag is not a stable testdata
    corpus -- never artifacts of earlier sessions or of a concurrent
    run on another corpus, which could be mid-scan.

    CAVEAT: do not run two pytest sessions of this suite CONCURRENTLY
    on one machine -- the mtime guard cannot tell which session
    created a fresh throwaway matview, so whichever session finishes
    first deletes matviews the other may still be reading (observed
    as a one-off FileNotFound/oracle failure in the IVF/PQ sweeps
    that passes in isolation). Serial sessions are fully safe."""
    import time

    session_start = time.time()
    yield
    import glob
    import hashlib
    import os
    import shutil

    keep = {
        hashlib.md5(f"/root/testdata/sf{s}".encode()).hexdigest()[:8]
        for s in ("0.001", "0.01", "0.1", "1")
    }
    base = os.path.join("/root/repo", "spark-warehouse", "matview")
    for p in glob.glob(os.path.join(base, "*_*")):
        tag = p.rsplit("_", 1)[-1]
        try:
            fresh = os.path.getmtime(p) >= session_start
        except OSError:
            continue
        if len(tag) == 8 and tag not in keep and fresh:
            shutil.rmtree(p, ignore_errors=True)


def pytest_runtest_makereport(item, call):
    """FAILURE CAPTURE HARNESS (r9, r8-VERDICT item 6): the one
    observed flake (test_null_robustness anns_label_maxsim_topk,
    failed once in a full-suite run, passed solo, traceback lost)
    could not be diagnosed because nothing recorded the state. Any
    test failure now appends its full longrepr plus the live matview
    directory listing and active-session state to
    ``tests/_captured_failures.log`` -- enough to distinguish a
    cross-module matview/session-state interaction from a genuine
    assertion the next time one fires."""
    if call.when != "call" or call.excinfo is None:
        return
    import pytest as _pytest
    if call.excinfo.errisinstance(_pytest.skip.Exception):
        return  # importorskip-in-body skips are not failures
    import datetime
    import glob
    import os

    try:
        base = os.path.join("/root/repo", "spark-warehouse", "matview")
        views = sorted(
            os.path.basename(p) for p in glob.glob(os.path.join(base, "*"))
        )
        try:
            from pyspark.sql import SparkSession
            active = SparkSession.getActiveSession()
            sess = (f"active_session={active is not None} "
                    f"tables={[t.name for t in active.catalog.listTables()] if active else []}")
        except Exception as e:  # never let capture break reporting
            sess = f"session-introspect-error: {e!r}"
        with open(os.path.join("/root/repo", "tests",
                               "_captured_failures.log"), "a") as f:
            f.write(
                f"\n=== {datetime.datetime.now().isoformat()} "
                f"{item.nodeid} ===\n{sess}\n"
                f"matviews({len(views)}): {views}\n"
                f"{call.excinfo.getrepr(style='long')}\n"
            )
    except Exception:
        pass
