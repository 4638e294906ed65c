from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from selfhosted_rag_doc_chat_prototype_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


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
