"""distributed_rank: the two-phase range-partitioned exact-rank
helper must be row-for-row identical to the single-reducer
``row_number()/sum() OVER (ORDER BY ...)`` it replaces -- including
NULL groups, per-group totals, running sums, and the ntile fill rule
-- while planning NO unpartitioned window."""

from __future__ import annotations

import re

from pyspark.sql import Window
from pyspark.sql import functions as F

from selfhosted_rag_doc_chat_prototype_spark.operators.rank import (
    distributed_rank,
    ntile_from_rank,
)


def _synth(spark, n=5000):
    # skewed groups (incl. a NULL group), heavy value ties, unique id
    return spark.range(n).select(
        F.col("id").alias("rid"),
        F.when(F.col("id") % 100 < 60, "a")
        .when(F.col("id") % 100 < 90, "b")
        .when(F.col("id") % 100 < 97, "c")
        .otherwise(None).alias("g"),
        (F.pmod(F.col("id") * 2654435761, F.lit(37))).alias("v"),
        (F.pmod(F.col("id") * 40503, F.lit(1000)) + 1).alias("x"),
    )


def _unpartitioned_specs(plan: str) -> list[str]:
    out = []
    for m in re.finditer(r"windowspecdefinition\(", plan):
        i, depth, first = m.end(), 1, []
        while depth and i < len(plan):
            ch = plan[i]
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            if depth == 1 and ch == ",":
                break
            first.append(ch)
            i += 1
        head = "".join(first).strip()
        if head.startswith("specifiedwindowframe") or re.search(
            r" (ASC|DESC) NULLS", head
        ):
            out.append(head)
    return out


def test_distributed_rank_equals_window_global(spark):
    df = _synth(spark)
    got = distributed_rank(
        df, [(F.col("v"), True), (F.col("rid"), True)],
        rn_col="rn", n_col="n", cumsum={"cs": "x"}, num_partitions=7,
    )
    w = Window.orderBy(F.col("v").asc(), F.col("rid").asc())
    want = df.select(
        "*",
        F.row_number().over(w).cast("long").alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy())
        .cast("long").alias("n"),
        F.sum("x").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("long").alias("cs"),
    )
    cols = want.columns
    assert sorted(
        map(tuple, got.select(*cols).collect()),
        key=lambda t: tuple(map(str, t)),
    ) == sorted(
        map(tuple, want.collect()), key=lambda t: tuple(map(str, t))
    )
    # the point of the helper: no unpartitioned window in ITS plan
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert _unpartitioned_specs(plan) == []


def test_distributed_rank_equals_window_grouped(spark):
    df = _synth(spark)
    got = distributed_rank(
        df, [(F.col("v"), False), (F.col("rid"), True)],
        part_cols=["g"], rn_col="rn", n_col="n", num_partitions=5,
    )
    w = Window.partitionBy("g").orderBy(F.col("v").desc(), F.col("rid").asc())
    want = df.select(
        "*",
        F.row_number().over(w).cast("long").alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("g"))
        .cast("long").alias("n"),
    )
    cols = want.columns
    assert sorted(
        map(tuple, got.select(*cols).collect()),
        key=lambda t: tuple(map(str, t)),
    ) == sorted(
        map(tuple, want.collect()), key=lambda t: tuple(map(str, t))
    )


def test_ntile_from_rank_matches_sql_ntile(spark):
    # sizes that exercise every fill-rule branch: n < tiles, n == tiles,
    # remainder 0, remainder > 0
    for n, tiles in [(3, 5), (5, 5), (20, 5), (23, 5), (7, 3), (1, 4)]:
        df = spark.range(1, n + 1).select(
            F.col("id").cast("long").alias("rn"),
            F.lit(n).cast("long").alias("n"),
        )
        got = df.select(
            "rn", ntile_from_rank("rn", "n", tiles).alias("t")
        )
        want = df.select(
            "rn",
            F.ntile(tiles).over(Window.orderBy("rn")).cast("int")
            .alias("t"),
        )
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        ), (n, tiles)


def test_distributed_rank_tie_split_false_exact_on_heavy_ties(spark):
    # score_decile_lift (and the other near-unique-key call sites) pass
    # tie_split=False to skip the heavy-tie balancing scan; ranks must
    # still be EXACT even on heavily tied values because the unique
    # tiebreaker column makes the order total.
    df = _synth(spark)  # v has only 37 distinct values over 5000 rows
    got = distributed_rank(
        df, [(F.col("v"), False), (F.col("rid"), True)],
        rn_col="rn", n_col="n", num_partitions=7, tie_split=False,
    )
    w = Window.orderBy(F.col("v").desc(), F.col("rid").asc())
    want = df.select(
        "*",
        F.row_number().over(w).cast("long").alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy())
        .cast("long").alias("n"),
    )
    cols = want.columns
    assert sorted(
        map(tuple, got.select(*cols).collect()),
        key=lambda t: tuple(map(str, t)),
    ) == sorted(
        map(tuple, want.collect()), key=lambda t: tuple(map(str, t))
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert _unpartitioned_specs(plan) == []
