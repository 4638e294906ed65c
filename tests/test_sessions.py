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


def test_funnel_attribution_window_and_last_touch(spark, tmp_path):
    """A purchase credits its MOST RECENT preceding touch; a touch
    older than ATTR_WINDOW_S (or none at all) leaves the purchase
    unattributed; revenue accumulates exactly."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from selfhosted_rag_doc_chat_prototype_spark.operators.sessions import (
        funnel_attribution,
    )

    base = dt.datetime(2024, 3, 10, 12, 0, 0)

    def ev(eid, uid, typ, delta_s, value=None):
        return (eid, uid, typ, base + dt.timedelta(seconds=delta_s),
                value, "{}")

    data = [
        # user 1: view then click then purchase -> click credited
        ev(1, 1, "view", 0), ev(2, 1, "click", 60),
        ev(3, 1, "purchase", 120, 10.0),
        # user 2: touch 8 days before purchase -> outside the window
        ev(4, 2, "view", 0),
        ev(5, 2, "purchase", 8 * 24 * 3600, 5.0),
        # user 3: no touch at all
        ev(6, 3, "purchase", 0, 2.5),
    ]
    cols = ["event_id", "user_id", "event_type", "ts", "value", "props"]
    pq.write_table(pa.table(
        {c: [r[i] for r in data] for i, c in enumerate(cols)}),
        f"{tmp_path}/events.parquet")
    got = {r.channel: r for r in
           funnel_attribution(spark, str(tmp_path)).collect()}
    assert got["click"].n_purchases == 1
    assert got["click"].revenue_u == 10_000_000
    assert got["unattributed"].n_purchases == 2
    assert got["unattributed"].revenue_u == 7_500_000
    assert "view" not in got  # last touch wins over the earlier view
