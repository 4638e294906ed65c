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
    # every oracle has a query; the only oracle-less queries are the
    # declared rows-only ones (approximate sketches have no exact SQL twin)
    assert set(analytics.ORACLE) <= set(analytics.QUERIES)
    assert set(analytics.QUERIES) - set(analytics.ORACLE) == {
        "sketch_cardinality_quantiles"
    }


def test_sketch_estimates_within_tolerance(spark, sf_dir):
    """HLL cardinality within 5% of exact; sketched p95 within 5% of
    the exact percentile (the rows-only query's accuracy contract)."""
    from selfhosted_rag_doc_chat_prototype_spark.operators.analytics import (
        sketch_cardinality_quantiles,
    )

    rows = sketch_cardinality_quantiles(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert abs(r.n_users_hll - r.n_users_exact) / r.n_users_exact <= 0.05
        assert abs(r.p95_sketch - r.p95_exact) / max(abs(r.p95_exact), 1e-9) <= 0.05
