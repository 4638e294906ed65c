"""Plan-shape regression guards: the scale properties PLANS.md documents,
asserted so a refactor cannot silently lose them.

Checks run on the PLANNED (not executed) queries at sf0.001: planning is
cheap and the properties under test -- join strategy, pushdown, pruning,
absence of cartesian products -- are decided at plan time.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from selfhosted_rag_doc_chat_prototype_spark.plans.registry import all_queries

# queries whose CONSTRUCTION executes Spark jobs (iterative loops, KMeans
# fits, model broadcasts): planning them here would run real work; their
# plan shapes are asserted by their own dedicated tests instead.
EAGER = {
    "dedup_connected_components",   # driver-looped CC with per-round counts
    "anns_ivf_topk",                # KMeans fit at build time
    "anns_ivfpq_topk",              # PQ codebook training at build time
    "ingest_pipeline_e2e",          # builds its own staging fixture dir
}


def _plan(spark, fn, sf_dir) -> str:
    # explainString straight off the QueryExecution: explain() prints to
    # stdout, and redirect_stdout is process-global -- unusable once the
    # fixture plans from a thread pool
    df = fn(spark, sf_dir)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    return df._jdf.queryExecution().explainString(mode)


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    # planning ~274 queries sequentially cost 131 s of the suite (pure
    # driver-side Catalyst work, GIL released inside py4j calls);
    # a thread pool cuts the fixture to wall/cores
    from concurrent.futures import ThreadPoolExecutor

    items = [(n, fn) for n, fn in all_queries().items() if n not in EAGER]
    with ThreadPoolExecutor(max_workers=8) as pool:
        return dict(pool.map(
            lambda it: (it[0], _plan(spark, it[1], sf_dir)), items))


def test_no_cartesian_products(plans):
    """A CartesianProduct at 100 TB is always a bug: the intended 1-row
    scalar joins plan as BroadcastNestedLoopJoin over a broadcast side,
    never a partition-pair cross product."""
    offenders = [n for n, p in plans.items() if "CartesianProduct" in p]
    assert offenders == []


@pytest.mark.parametrize(
    "name",
    ["q3_shipping_priority", "q5_regional_revenue", "q9_profit_by_nation_year",
     "q2_min_cost_supplier", "q8_market_share", "q10_returned_item_revenue"],
)
def test_star_joins_broadcast(plans, name):
    """Dimension joins must be broadcast: a shuffle join against nation/
    region/part/customer wastes a fact-table exchange."""
    assert "BroadcastHashJoin" in plans[name]


@pytest.mark.parametrize(
    "name, allowed",
    [
        ("text_token_stats", {"doc_id", "text"}),
        ("text_quality_flags", {"doc_id", "text"}),
        ("gopher_quality_filters", {"doc_id", "text"}),
        ("quality_tempered_sample", {"doc_id", "text"}),
        ("corpus_sample_split", {"doc_id"}),
        ("q6_forecast_revenue",
         {"l_shipdate", "l_discount", "l_quantity", "l_extendedprice"}),
    ],
)
def test_scan_column_pruning(plans, name, allowed):
    """Scans must read only the referenced columns (ReadSchema pruning
    survives the rebalance barrier)."""
    import re

    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plans[name])
    assert schemas, f"no ReadSchema found for {name}"
    for s in schemas:
        cols = {c.split(":")[0] for c in s.split(",") if c}
        assert cols <= allowed, f"{name} reads {cols - allowed} beyond {allowed}"


def test_q6_filters_pushed(plans):
    """Q6's predicates must reach the parquet scan."""
    p = plans["q6_forecast_revenue"]
    assert "PushedFilters: [" in p
    import re

    pushed = " ".join(re.findall(r"PushedFilters: \[[^\]]*\]", p))
    for col in ["l_shipdate", "l_discount", "l_quantity"]:
        assert col in pushed, f"{col} not pushed into the scan"


def test_hybrid_dense_leg_is_bucket_join(plans):
    """The hybrid fusion dense prefetch must be the LSH bucket
    equi-join, never an exact query x corpus scan: the only
    BroadcastNestedLoopJoin allowed is the 1-row BM25 stats broadcast
    in the sparse leg, and the zip_with first-collision dedup filter
    proves the bucket-join path (it exists nowhere else)."""
    import re

    p = plans["hybrid_fusion_topk"]
    assert "zip_with" in p
    # formatted explain prints each node twice (tree + details):
    # count node headers, not substrings
    assert len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", p)) <= 1
    assert "CartesianProduct" not in p


def test_grouped_topk_is_bucket_join(plans):
    """The per-label grouped retrieval must generate candidates through
    the LSH bucket equi-join, never an exact query x corpus broadcast
    scan (crossJoin would show as BroadcastNestedLoopJoin)."""
    import re

    p = plans["anns_grouped_topk"]
    assert "zip_with" in p
    assert not re.findall(r"\(\d+\) BroadcastNestedLoopJoin", p)
    assert "CartesianProduct" not in p


def test_lsh_pair_dedup_is_map_side(plans):
    """Plain-LSH top-k dedups bucket collisions with a local
    first-colliding-table filter; a dropDuplicates here would add a
    full candidate-pair exchange. The multiprobe variant legitimately
    keeps dropDuplicates (probe routes are not locally enumerable), so
    only the plain variant is pinned."""
    p = plans["anns_lsh_bucketed"]
    assert "zip_with" in p
    # dedup-by-aggregation would appear as HashAggregate over the pair
    # keys between the bucket join and the ranking window
    assert "SortAggregate" not in p


def test_topk_plans_take_ordered(plans):
    """LIMIT-after-ORDER BY must plan as TakeOrderedAndProject, never a
    global sort of the full relation."""
    for name in ["q3_shipping_priority", "q10_returned_item_revenue",
                 "q18_large_volume_customers", "q21_sole_late_supplier",
                 "a5_top20_events"]:
        assert "TakeOrderedAndProject" in plans[name], name
        # a global Sort node outside the top-k operator is the regression
        assert "Sort [" not in plans[name].split("TakeOrderedAndProject")[0]


def test_salted_distinct_plan_and_measured_skew_win(spark):
    """Round-6 verdict task #6: the two-phase salted rewrite must (a)
    show up in the physical plan -- the FIRST exchange partitions on
    the SALTED key, so no exchange ever hash-partitions raw user rows
    on the bare skew key -- and (b) beat the naive plan's heaviest
    reducer input by the predicted ~SKEW_SALTS factor, measured as
    actual group sizes on sf0.01 (hot key g6 owns ~43% of users
    there)."""
    from pyspark.sql import functions as F

    from selfhosted_rag_doc_chat_prototype_spark.operators.analytics import (
        SKEW_SALTS,
        _skew_key_spark,
        skewed_distinct_salted,
    )
    from selfhosted_rag_doc_chat_prototype_spark.plans.diagnostics import (
        salted_key,
    )
    from selfhosted_rag_doc_chat_prototype_spark.sources.tables import table

    sf = "/root/testdata/sf0.01"
    plan = skewed_distinct_salted(spark, sf)._jdf.queryExecution() \
        .executedPlan().toString()
    # the salted composite key is what the first (phase-1) exchange
    # hash-partitions on; the bare skew_key only appears in the
    # phase-2 exchange over shard-count rows
    assert "salted" in plan and "hashpartitioning" in plan

    ev = (
        table(spark, sf, "events")
        .filter(F.col("user_id").isNotNull())
        .select(_skew_key_spark().alias("skew_key"), "user_id")
    )
    # naive reducer input per key = the key's distinct (key, user)
    # pairs all meeting on one task
    naive = ev.groupBy("skew_key").agg(
        F.countDistinct("user_id").alias("n")).collect()
    naive_max = max(r.n for r in naive)
    # salted phase-1 reducer input per (key, salt) group
    salted = (
        ev.withColumn("salted",
                      salted_key("skew_key", SKEW_SALTS,
                                 seed_col="user_id"))
        .groupBy("salted").agg(F.countDistinct("user_id").alias("n"))
        .collect()
    )
    salted_max = max(r.n for r in salted)
    # predicted factor SKEW_SALTS, asserted at half to absorb hash
    # imbalance on a 64-user hot key
    assert salted_max * (SKEW_SALTS // 2) <= naive_max, (
        naive_max, salted_max)
    # and the rewrite must not change the answer
    two_phase = {(r.skew_key, r.n_users)
                 for r in skewed_distinct_salted(spark, sf).collect()}
    single = {(r.skew_key, r.n) for r in naive}
    assert two_phase == single


def test_no_unpartitioned_fact_windows(plans):
    """Round-8 global audit rule (sibling of the no-CartesianProduct
    rule): an UNPARTITIONED WindowExec is a single-reducer sort -- the
    scale-killer the shared operators.rank.distributed_rank helper
    replaces. Every registered plan must either contain none, or be a
    justified BOUNDED_GLOBAL_WINDOWS entry (global window over a
    provably bounded row count: constants, LIMIT-k survivors,
    calendar/bucket/domain vocabularies). Stale allowlist entries fail
    too, so the exception list cannot rot."""
    from selfhosted_rag_doc_chat_prototype_spark.plans.registry import (
        BOUNDED_GLOBAL_WINDOWS,
        unpartitioned_window_specs,
    )

    offenders = {
        n: unpartitioned_window_specs(p)
        for n, p in plans.items()
        if unpartitioned_window_specs(p)
    }
    unjustified = sorted(set(offenders) - set(BOUNDED_GLOBAL_WINDOWS))
    assert unjustified == [], {
        n: offenders[n][:2] for n in unjustified
    }
    stale = sorted(
        set(BOUNDED_GLOBAL_WINDOWS)
        - set(offenders)
        - (set(BOUNDED_GLOBAL_WINDOWS) - set(plans))  # EAGER-excluded
    )
    assert stale == [], f"allowlist entries with no global window: {stale}"
