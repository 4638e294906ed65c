"""Oracle-checked correctness for the extended TPC-H query shapes
(q2/q7/q8/q12/q13/q15-q22) at sf0.001."""

from __future__ import annotations

import pytest

from selfhosted_rag_doc_chat_prototype_spark.operators import tpch

from .helpers import assert_matches_oracle, duck_con


@pytest.fixture(scope="module")
def con(sf_dir):
    return duck_con(sf_dir)


@pytest.mark.parametrize("name", sorted(tpch.ORACLE))
def test_tpch_matches_oracle(name, spark, sf_dir, con):
    sdf = tpch.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(sdf, con, tpch.ORACLE[name], name)


def test_every_query_has_oracle():
    assert set(tpch.QUERIES) == set(tpch.ORACLE)
