"""k-means + random-projection invariants beyond the oracle gate:
the oracle proves cross-engine bit-parity; these prove the MATH is
right (JL distance preservation, Lloyd monotonicity, determinism)."""

from __future__ import annotations

import math

import pytest

from selfhosted_rag_doc_chat_prototype_spark.operators.ml import (
    KM_ITERS,
    KM_K,
    RP_DIMS,
    _tdiv,
    embed_kmeans,
    embed_random_projection,
)

SF = "/root/testdata/sf0.001"


def test_tdiv_matches_sql_truncation():
    # Spark `div` / DuckDB `//` truncate toward zero; Python floors
    for s, n in [(-7, 3), (7, -3), (-7, -3), (7, 3), (0, 5), (-1, 2)]:
        expect = int(s / n) if n else None
        assert _tdiv(s, n) == expect


def test_kmeans_partitions_corpus(spark):
    rows = embed_kmeans(spark, SF).collect()
    n = len(rows)
    assert n > 0
    ids = [r.vec_id for r in rows]
    assert len(set(ids)) == n  # every valid vector exactly once
    clusters = {r.cluster for r in rows}
    assert clusters <= set(range(KM_K))
    # n_in_cluster is consistent with the actual partition
    from collections import Counter

    sizes = Counter(r.cluster for r in rows)
    for r in rows:
        assert r.n_in_cluster == sizes[r.cluster]
        assert r.dist_u >= 0


def test_kmeans_serves_from_checkpointed_assignment(spark):
    """r12: the Lloyd loop's final assignment is materialized behind a
    localCheckpoint while the quantized corpus is still cached, and
    cluster sizes attach as a broadcast K-row join -- so the plan an
    ACTION executes must (a) read the checkpoint, not re-run the
    parquet scan + quantize + Arrow assign pass, and (b) contain no
    full-corpus Window (the pre-r12 n_in_cluster count-over)."""
    plan = embed_kmeans(spark, SF)._jdf.queryExecution().executedPlan().toString()
    for heavy in ("Window", "ArrowEvalPython", "BatchEvalPython",
                  "InPandas", "FileScan parquet", "Scan parquet"):
        assert heavy not in plan, f"serve plan does {heavy}:\n{plan}"
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_kmeans_deterministic(spark):
    a = sorted(map(tuple, embed_kmeans(spark, SF).collect()))
    b = sorted(map(tuple, embed_kmeans(spark, SF).collect()))
    assert a == b


def test_kmeans_inertia_nonincreasing(spark):
    """Lloyd's guarantee: total within-cluster distance never rises
    across iterations (centroid truncation to integer micro-units
    perturbs by <= 1 micro-unit per dim -- far below the improvement
    scale at these magnitudes)."""
    inertia = []
    for iters in range(1, KM_ITERS + 1):
        rows = embed_kmeans(spark, SF, iters=iters).collect()
        inertia.append(sum(r.dist_u for r in rows))
    assert all(b <= a for a, b in zip(inertia, inertia[1:]))


def test_kmeans_corpus_smaller_than_k(spark, tmp_path):
    """Fewer valid vectors than K: seeding degrades to one cluster per
    vector, bit-exact against the oracle's LIMIT K (which returns all
    rows), and every vector sits on its own centroid (dist 0 after the
    quantize->seed round trip)."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from .helpers import assert_matches_oracle

    d = str(tmp_path)
    rng = np.random.default_rng(11)
    vecs = [list(map(float, v)) for v in rng.standard_normal((3, 8))]
    pq.write_table(pa.table({
        "vec_id": [0, 1, 2],
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": [0, 1, 2],
    }), f"{d}/embeddings.parquet")
    rows = embed_kmeans(spark, d).collect()
    assert len(rows) == 3
    assert {r.cluster for r in rows} == {0, 1, 2}
    assert all(r.dist_u == 0 and r.n_in_cluster == 1 for r in rows)
    import __spark_entry__ as e

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{d}/embeddings.parquet'"
    )
    assert_matches_oracle(
        embed_kmeans(spark, d), con, e.oracle_sql()["embed_kmeans"],
        "embed_kmeans[tiny]",
    )


def test_random_projection_preserves_distances(spark):
    """JL property on real corpus vectors: projected pairwise squared
    distances concentrate around the originals (loose 3x band -- the
    guarantee is probabilistic; determinism is what the gate proves)."""
    import numpy as np

    from selfhosted_rag_doc_chat_prototype_spark.sources.tables import table
    from pyspark.sql import functions as F

    emb = (
        table(spark, SF, "embeddings")
        .filter(F.col("embedding").isNotNull())
        .orderBy("vec_id").limit(24).collect()
    )
    orig = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb}
    proj_rows = embed_random_projection(spark, SF).collect()
    proj: dict[int, list[float]] = {}
    for r in proj_rows:
        proj.setdefault(r.vec_id, [0.0] * RP_DIMS)[r.out_dim] = r.y
    ids = sorted(orig)[:24]
    ratios = []
    for a in range(0, len(ids) - 1, 2):
        u, v = ids[a], ids[a + 1]
        d0 = float(np.sum((orig[u] - orig[v]) ** 2))
        pu, pv = np.array(proj[u]), np.array(proj[v])
        d1 = float(np.sum((pu - pv) ** 2))
        if d0 > 0:
            ratios.append(d1 / d0)
    assert ratios
    med = sorted(ratios)[len(ratios) // 2]
    assert 1 / 3 < med < 3


def test_random_projection_row_shape(spark):
    rows = embed_random_projection(spark, SF).collect()
    per_vec: dict[int, set[int]] = {}
    for r in rows:
        per_vec.setdefault(r.vec_id, set()).add(r.out_dim)
        assert math.isfinite(r.y)
    assert all(dims == set(range(RP_DIMS)) for dims in per_vec.values())


def test_kmeans_rejects_degenerate_params(spark):
    import pytest

    from selfhosted_rag_doc_chat_prototype_spark.operators.ml import embed_kmeans

    with pytest.raises(ValueError, match="iters"):
        embed_kmeans(spark, "/root/testdata/sf0.001", iters=0)
    with pytest.raises(ValueError, match="k >= 1"):
        embed_kmeans(spark, "/root/testdata/sf0.001", k=0)


def test_standardize_centers_each_dimension(spark, sf_dir):
    """Per-dimension mean of the emitted z-scores is ~0 (integer
    truncation keeps it within one unit per row) and the z spread is
    order-1e6 (unit variance in 1e-6 units)."""
    from collections import defaultdict

    from selfhosted_rag_doc_chat_prototype_spark.operators.ml import (
        embedding_standardize,
    )

    per_dim = defaultdict(list)
    for r in embedding_standardize(spark, sf_dir).collect():
        per_dim[r.dim].append(r.z_u)
    assert len(per_dim) == 64
    for dim, zs in per_dim.items():
        n = len(zs)
        mean = sum(zs) / n
        assert abs(mean) < 0.05 * 10**6, (dim, mean)  # centered
        var = sum(z * z for z in zs) / n
        assert 0.5 * 10**12 < var < 2.0 * 10**12, (dim, var)


def test_pca_recovers_planted_dominant_direction(spark, tmp_path):
    """A corpus of vectors clustered along a planted axis direction
    must yield a top component nearly parallel to it."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from selfhosted_rag_doc_chat_prototype_spark.operators.ml import (
        pca_top_component,
    )

    rng = np.random.default_rng(7)
    axis = np.zeros(64)
    axis[5] = 0.8
    axis[40] = 0.6
    vecs = []
    for _ in range(60):
        v = axis * rng.uniform(0.5, 1.0) + rng.normal(0, 0.03, 64)
        vecs.append(list(map(float, v / np.linalg.norm(v))))
    d = str(tmp_path)
    pq.write_table(pa.table({
        "vec_id": list(range(60)),
        "embedding": pa.array(vecs, type=pa.list_(pa.float32())),
        "label": [0] * 60,
    }), f"{d}/embeddings.parquet")
    comp = np.zeros(64)
    for r in pca_top_component(spark, d).collect():
        comp[r.dim] = r.component
    cos = abs(np.dot(comp, axis)) / (np.linalg.norm(comp)
                                     * np.linalg.norm(axis))
    assert cos > 0.99


def test_isotropy_bounds_and_collapsed_corpus(spark, tmp_path):
    """Isotropy lies in (0, 1]; a corpus of near-identical vectors
    (rank ~1) reports isotropy ~1."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from selfhosted_rag_doc_chat_prototype_spark.operators.ml import (
        embedding_isotropy_report,
    )

    rng = np.random.default_rng(11)
    base = rng.standard_normal(64)
    base /= np.linalg.norm(base)
    vecs = [list(map(float, base + rng.normal(0, 1e-3, 64)))
            for _ in range(40)]
    d = str(tmp_path)
    pq.write_table(pa.table({
        "vec_id": list(range(40)),
        "embedding": pa.array(vecs, type=pa.list_(pa.float32())),
        "label": [0] * 40,
    }), f"{d}/embeddings.parquet")
    r = embedding_isotropy_report(spark, d).collect()[0]
    assert r.n_dims == 64
    assert 0 < r.isotropy <= 1.01
    assert r.isotropy > 0.95


def test_gram_cells_matches_explode_reference(spark):
    """r12: the PCA Gram sketch runs as a per-task numpy int64 matmul
    (_gram_cells) instead of a dim^2-per-row explode. Pin the kernel
    to independently computed SQL-aggregate semantics on a corpus
    that exercises every edge the explode form had: ragged lengths
    (a cell exists iff some vector has len >= max(i, j)), NULL
    elements (their products drop out of the sum), an all-NULL cell
    (stays NULL, not 0), NULL and empty vectors (contribute nothing),
    and multi-partition partial-cell merging."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StructField,
        StructType,
    )

    from selfhosted_rag_doc_chat_prototype_spark.operators.ml import (
        _gram_cells,
    )

    rows = [
        ([3, -2, None],),       # len 3, NULL element at dim 3
        ([1, 4, None],),        # len 3, NULL element at dim 3
        ([5, 7],),              # ragged: len 2
        ([-1, 0, None, 9],),    # len 4 -- dim 3 NULL again, dim 4 live
        (None,),                # failed embed: contributes nothing
        ([],),                  # empty vector: contributes nothing
        ([2, 2],),              # len 2
    ]
    schema = StructType([StructField("q", ArrayType(LongType()), True)])
    df = spark.createDataFrame(rows, schema).repartition(3)

    got = {
        (r.i, r.j): r.g
        for r in _gram_cells(df).groupBy("i", "j")
        .agg(F.sum("g").alias("g")).collect()
    }

    # independent reference with SQL aggregate semantics
    expect: dict[tuple[int, int], int | None] = {}
    for (v,) in rows:
        if not v:
            continue
        for i in range(len(v)):
            for j in range(len(v)):
                key = (i + 1, j + 1)
                if key not in expect:
                    expect[key] = None
                if v[i] is None or v[j] is None:
                    continue
                expect[key] = (expect[key] or 0) + v[i] * v[j]

    assert got == expect
    # the all-NULL cells (dim 3 x anything in the len-3 rows is NULL,
    # but the len-4 row revives most -- (3, 3) stays all-NULL)
    assert got[(3, 3)] is None
    assert got[(4, 4)] == 81
    assert got[(1, 1)] == 3 * 3 + 1 * 1 + 5 * 5 + 1 + 2 * 2
