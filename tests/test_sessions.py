"""Session/join operators: sessions-module oracles at sf0.001 plus
unit semantics of the general as-of join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from selfhosted_rag_doc_chat_prototype_spark.operators import sessions

from .helpers import assert_matches_oracle, duck_con


@pytest.fixture(scope="module")
def con(sf_dir):
    return duck_con(sf_dir)


@pytest.mark.parametrize("name", sorted(sessions.ORACLE))
def test_sessions_matches_oracle(name, spark, sf_dir, con):
    sdf = sessions.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(sdf, con, sessions.ORACLE[name], name)


def test_asof_join_semantics(spark):
    """Left rows before any right row get NULL; each left row sees the
    most recent right value at-or-before its timestamp; equal
    timestamps are visible (>= semantics)."""
    left = spark.createDataFrame(
        [("u", 1, 5), ("u", 2, 10), ("u", 3, 20), ("v", 4, 10)],
        "k string, id long, ts long",
    )
    right = spark.createDataFrame(
        [("u", 10, 100.0), ("u", 15, 200.0), ("w", 1, 999.0)],
        "k string, ts long, val double",
    )
    out = {
        r.id: r.asof_val
        for r in sessions.asof_join(
            left, right, on="k", ts_col="ts", value_cols=["val"]
        ).collect()
    }
    assert out[1] is None        # before the first right row
    assert out[2] == 100.0       # ts=10 right row visible at ts=10 (>=)
    assert out[3] == 200.0       # most recent, not first
    assert out[4] is None        # key with no right rows at all
