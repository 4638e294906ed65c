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
