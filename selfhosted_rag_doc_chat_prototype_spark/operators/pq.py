"""IVF-PQ approximate nearest neighbor: product quantization over the
embedding corpus (Jegou, Douze, Schmid, "Product Quantization for
Nearest Neighbor Search", TPAMI 2011) composed with the engine's IVF
coarse quantizer -- the memory-compression serve path for vector search
at 100 TB, where the flat corpus (256 B/vector at 64-dim float32) does
not fit executor memory but 8-16 B/vector PQ codes do.

Role in the engine (extends the reference's J4 top-k retrieval,
``services/database.py:271-272``, to corpus sizes its HNSW index cannot
hold in RAM):

- **build** (batch job, persisted like the IVF/LSH/BM25 matviews):
  train ``M`` per-subspace codebooks of ``K=16`` centroids on a bounded
  driver sample (the standard PQ training recipe -- FAISS trains on
  ~100k vectors regardless of corpus size), then encode the FULL corpus
  distributedly: one Arrow-batched numpy argmin per subspace, map-only.
  Stored tables: ``codebooks`` (M*K rows) and ``codes`` (vec_id, cell,
  M uint8s -- with the coarse IVF cell id for pruning).
- **probe** (serve path): per query, build the M x K lookup table of
  subspace inner products (tiny pandas UDF on the QUERY side only),
  prune to the probed IVF cells, then score candidates with PURE
  CODEGEN array lookups -- ``sum_j LUT[j, code_j]`` via higher-order
  functions over the stored code arrays. No floating-point vector math
  touches the corpus at serve time; the scan reads 16 B codes, not
  256 B vectors.

Because the driver's embeddings are unit-norm (asserted in tests),
maximum-inner-product == cosine ranking, and the ADC score is the
exact inner product against the quantized reconstruction.

Registered with a FULL DuckDB oracle: the k-means fits are not
SQL-expressible, but the registered query only PROBES the persisted
index, and the frozen codebook/code/centroid parquet is plain
relational input the oracle reads directly (``read_parquet`` +
``corpus_key`` filter). Recall against the exact brute-force path and
the quantization-error contract are asserted in ``tests/test_pq.py``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .similarity import (
    INDEX_BUILD_VER,
    IVF_PROBE_FRACTION,
    N_QUERIES,
    TOP_K,
    _vectors,
    ivf_build,
)

PQ_M = 16          # subspaces (dim 64 -> 4 dims each)
PQ_K = 16          # centroids per subspace (4-bit codes)
PQ_SEED = 11
PQ_TRAIN_SAMPLE = 100_000  # bounded driver sample for codebook training
PQ_ITERS = 10


def _kmeans_1d(sub: np.ndarray, k: int, iters: int, rng) -> np.ndarray:
    """Seeded k-means++ init + Lloyd iterations on one subspace sample
    (sub: n x dsub). Deterministic in (sample, seed)."""
    n = sub.shape[0]
    # k-means++ seeding
    centers = [sub[rng.integers(n)]]
    d2 = np.full(n, np.inf)
    for _ in range(1, k):
        d2 = np.minimum(d2, ((sub - centers[-1]) ** 2).sum(axis=1))
        p = d2 / d2.sum() if d2.sum() > 0 else None
        centers.append(sub[rng.choice(n, p=p)])
    C = np.stack(centers)
    for _ in range(iters):
        # assign
        dists = ((sub[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = dists.argmin(axis=1)
        # update (empty clusters keep their center)
        for c in range(k):
            m = a == c
            if m.any():
                C[c] = sub[m].mean(axis=0)
    return C


_PQ_STORE: dict = {}


def _pq_paths(sf_dir: str, m: int = PQ_M, k: int = PQ_K) -> tuple[str, str]:
    import hashlib
    import os

    from .similarity import matview_root

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    # (m, k) in the name: distinct PQ configs must never share a path;
    # v4 layout (corpus_key pinned BIGINT) gets its own prefix
    # so the oracle's glob never unions files with an older schema
    return (
        os.path.join(matview_root(), f"pq_cb4_{m}x{k}_{tag}"),
        os.path.join(matview_root(), f"pq_code4_{m}x{k}_{tag}"),
    )


def pq_build(spark: SparkSession, sf_dir: str,
             m: int = PQ_M, k: int = PQ_K):
    """Build (or load) the PQ index for ``sf_dir``'s embeddings.

    Training reads a BOUNDED sample to the driver (PQ_TRAIN_SAMPLE
    rows -- at 64-dim float64 that is <=50 MB however large the
    corpus); encoding the full corpus is a distributed Arrow map pass
    (one (batch x dsub) @ (dsub x k) distance argmin per subspace).
    Returns (codebooks ndarray m x k x dsub, codes_df, n_cells)."""
    key = (spark, sf_dir, m, k)
    if key not in _PQ_STORE:
        from .similarity import _matview_complete

        cb_path, codes_path = _pq_paths(sf_dir, m, k)
        centroids, assigned, n_cells = ivf_build(spark, sf_dir)
        # the IVF load above already validated its matview against the
        # CURRENT corpus fingerprint; the PQ tables must carry the same
        # lineage (key, ver) or they were built for another corpus /
        # under older rules and must rebuild
        ckey_now = int(centroids.select("corpus_key").first()[0])
        if _matview_complete(cb_path) and _matview_complete(codes_path):
            cb_df = spark.read.parquet(cb_path)
            stored = (
                cb_df.select("corpus_key", "build_ver").first()
                if "build_ver" in cb_df.columns else None
            )
            if (stored is not None and int(stored[0]) == ckey_now
                    and int(stored[1]) == INDEX_BUILD_VER):
                rows = sorted(
                    cb_df.collect(),
                    key=lambda r: (r.j, r.c),
                )
                mm = max(r.j for r in rows) + 1
                kk = max(r.c for r in rows) + 1
                codebooks = np.array(
                    [np.asarray(r.centroid) for r in rows]
                ).reshape(mm, kk, -1)
                from .similarity import _minus_tombstones
                _PQ_STORE[key] = (
                    codebooks,
                    _minus_tombstones(spark, sf_dir,
                                      spark.read.parquet(codes_path)),
                    n_cells,
                )
                return _PQ_STORE[key]

        sample = np.stack(
            assigned.select("v")
            .limit(PQ_TRAIN_SAMPLE).toPandas()["v"].to_numpy()
        )
        dim = sample.shape[1]
        assert dim % m == 0, f"dim {dim} not divisible by m={m}"
        dsub = dim // m
        rng = np.random.default_rng(PQ_SEED)
        codebooks = np.stack([
            _kmeans_1d(sample[:, j * dsub:(j + 1) * dsub], k, PQ_ITERS, rng)
            for j in range(m)
        ])  # (m, k, dsub)

        bc = spark.sparkContext.broadcast(codebooks)

        def encode(it):
            cb = bc.value
            for pdf in it:
                M_ = np.stack(pdf["v"].to_numpy())
                codes = np.empty((len(pdf), m), dtype=np.int32)
                for j in range(m):
                    sub = M_[:, j * dsub:(j + 1) * dsub]
                    # ||x - c||^2 argmin == argmin(-2 x.c + ||c||^2)
                    d = (
                        -2.0 * sub @ cb[j].T
                        + (cb[j] ** 2).sum(axis=1)[None, :]
                    )
                    codes[:, j] = d.argmin(axis=1)
                yield pd.DataFrame({
                    "vec_id": pdf["vec_id"],
                    "cell": pdf["cell"],
                    "code": list(codes),
                })

        # same corpus_key the IVF build stamped (centroids are never
        # mutated, so this read is the stable source of the lineage key)
        (assigned.select("vec_id", "cell", "v")
         .mapInPandas(encode, "vec_id long, cell int, code array<int>")
         .withColumn("corpus_key", F.lit(ckey_now).cast("long"))
         .withColumn("build_ver", F.lit(INDEX_BUILD_VER).cast("int"))
         .write.mode("overwrite").parquet(codes_path))

        spark.createDataFrame(
            [(j, c, [float(x) for x in codebooks[j, c]], ckey_now,
              INDEX_BUILD_VER)
             for j in range(m) for c in range(k)],
            "j int, c int, centroid array<double>, corpus_key long,"
            " build_ver int",
        ).write.mode("overwrite").parquet(cb_path)

        from .similarity import _minus_tombstones
        _PQ_STORE[key] = (
            codebooks,
            _minus_tombstones(spark, sf_dir,
                              spark.read.parquet(codes_path)),
            n_cells,
        )
    return _PQ_STORE[key]


def pq_delete(spark: SparkSession, sf_dir: str, ids: list[int],
              m: int = PQ_M, k: int = PQ_K):
    """Delete points from the corpus's persisted indexes (PQ codes AND
    the IVF assignments the refine stage rescores from; codebooks and
    centroids untouched). r10: a TOMBSTONE APPEND -- one tiny parquet
    write, serve paths broadcast-anti-join the tombstone set, so the
    delete costs the batch, never the archive;
    :func:`..similarity.index_compact` folds tombstones into the
    stored files. Same point-delete semantics as ``lsh_delete`` (a
    tombstoned id vanishes from every index of the corpus). Returns
    the refreshed (codebooks, codes_df, n_cells)."""
    from .similarity import _rewrap_index_stores, _tomb_append

    pq_build(spark, sf_dir, m, k)
    _tomb_append(spark, sf_dir, ids)
    _rewrap_index_stores(spark, sf_dir)
    return _PQ_STORE[(spark, sf_dir, m, k)]


def pq_append(spark: SparkSession, sf_dir: str, new_vectors: DataFrame,
              m: int = PQ_M, k: int = PQ_K):
    """Incremental index maintenance: encode ONLY the new
    (vec_id, embedding) batch with the FROZEN codebooks and coarse
    centroids (no retrain, no archive re-encode -- the standard
    IVF-PQ add path) and append to the persisted code table.
    IDEMPOTENT: ids already encoded are skipped, so replayed batches
    converge. Returns the refreshed (codebooks, codes_df, n_cells)."""
    from .similarity import _tomb_clear

    pq_build(spark, sf_dir, m, k)
    # resurrection before membership (same contract as lsh_append): a
    # re-inserted id's tombstone drops, its stored code row becomes
    # visible, the per-table anti-joins below skip it
    _tomb_clear(spark, sf_dir, new_vectors.select("vec_id"))
    codebooks, existing_codes, n_cells = _PQ_STORE[(spark, sf_dir, m, k)]
    centroids, _a, _ = ivf_build(spark, sf_dir)
    _cb_path, codes_path = _pq_paths(sf_dir, m, k)
    bc = spark.sparkContext.broadcast(codebooks)
    cent = np.stack([
        np.asarray(r.centroid)
        for r in sorted(centroids.collect(), key=lambda r: r.cell)
    ])
    bcent = spark.sparkContext.broadcast(cent)
    dsub = codebooks.shape[2]

    def encode(it):
        cb, C = bc.value, bcent.value
        for pdf in it:
            M_ = np.stack(pdf["v"].to_numpy())
            # coarse assign with the frozen centroids
            d2 = (
                -2.0 * M_ @ C.T + (C ** 2).sum(axis=1)[None, :]
            )
            cells = d2.argmin(axis=1).astype(np.int32)
            codes = np.empty((len(pdf), m), dtype=np.int32)
            for j in range(m):
                sub = M_[:, j * dsub:(j + 1) * dsub]
                d = (
                    -2.0 * sub @ cb[j].T
                    + (cb[j] ** 2).sum(axis=1)[None, :]
                )
                codes[:, j] = d.argmin(axis=1)
            yield pd.DataFrame({
                "vec_id": pdf["vec_id"],
                "cell": cells,
                "code": list(codes),
            })

    nv = new_vectors.filter(F.col("embedding").isNotNull()).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )

    # per-TABLE idempotency: each write anti-joins its own table, so a
    # crash between the two appends replays cleanly -- whichever table
    # is behind catches up, whichever is current appends nothing. A
    # single shared "already appended" key would leave the other table
    # permanently short after a mid-function failure.
    from .similarity import (_ivf_paths, _IVF_STORE, _minus_tombstones,
                             _rewrite_matview)

    _cent_path, assign_path = _ivf_paths(sf_dir)

    # UPSERT on changed content (same contract as lsh_append / the
    # Qdrant point upsert): ids stored with a DIFFERENT vector lose
    # their rows in BOTH tables and are re-encoded fresh below. The
    # changed set derives from the assignments table, so the codes
    # table rewrites FIRST (assignments still pristine for the lazy
    # re-evaluation inside the staged rewrite), assignments second; a
    # crash in between replays cleanly -- `changed` still differs on
    # the assignments side, the codes anti-join is then a no-op.
    changed = (nv.join(spark.read.parquet(assign_path)
                       .select("vec_id", F.col("v").alias("_old_v")),
                       "vec_id")
               .filter(F.col("v") != F.col("_old_v"))
               .select("vec_id"))
    if not changed.isEmpty():
        _rewrite_matview(
            spark.read.parquet(codes_path).join(
                F.broadcast(changed), "vec_id", "left_anti"), codes_path)
        _rewrite_matview(
            spark.read.parquet(assign_path).join(
                F.broadcast(changed), "vec_id", "left_anti"), assign_path)
        existing_codes = _minus_tombstones(
            spark, sf_dir, spark.read.parquet(codes_path))
        _PQ_STORE[(spark, sf_dir, m, k)] = (
            codebooks, existing_codes, n_cells)

    def assign_only(it):
        C = bcent.value
        for pdf in it:
            M_ = np.stack(pdf["v"].to_numpy())
            d2 = -2.0 * M_ @ C.T + (C ** 2).sum(axis=1)[None, :]
            yield pd.DataFrame({
                "vec_id": pdf["vec_id"], "v": pdf["v"],
                "cell": d2.argmin(axis=1).astype(np.int32),
            })

    # appended rows carry the BUILD-time corpus_key (the index lineage
    # tag the oracle globs on): one parquet directory must never hold
    # two schemas, and the key identifies the index, not the batch
    ckey = int(centroids.select("corpus_key").first()[0])

    # the refine stage rescores from the IVF assignments table, so the
    # full vectors (with their frozen-centroid cells) append there too
    (nv.join(spark.read.parquet(assign_path).select("vec_id"),
             "vec_id", "left_anti")
     .mapInPandas(assign_only, "vec_id long, v array<double>, cell int")
     .withColumn("corpus_key", F.lit(ckey).cast("long"))
     .withColumn("build_ver", F.lit(INDEX_BUILD_VER).cast("int"))
     .write.mode("append").parquet(assign_path))

    (nv.join(existing_codes.select("vec_id"), "vec_id", "left_anti")
     .mapInPandas(encode, "vec_id long, cell int, code array<int>")
     .withColumn("corpus_key", F.lit(ckey).cast("long"))
     .withColumn("build_ver", F.lit(INDEX_BUILD_VER).cast("int"))
     .write.mode("append").parquet(codes_path))
    from .similarity import _minus_tombstones
    ivf_key = (spark, sf_dir)
    if ivf_key in _IVF_STORE:
        cents, _old, nc = _IVF_STORE[ivf_key]
        _IVF_STORE[ivf_key] = (
            cents,
            _minus_tombstones(spark, sf_dir,
                              spark.read.parquet(assign_path)),
            nc,
        )

    _PQ_STORE[(spark, sf_dir, m, k)] = (
        codebooks,
        _minus_tombstones(spark, sf_dir,
                          spark.read.parquet(codes_path)),
        n_cells,
    )
    return _PQ_STORE[(spark, sf_dir, m, k)]


PQ_REFINE_FACTOR = 6  # exact-rescore the ADC top k*factor (FAISS refine)


def pq_probe(spark: SparkSession, sf_dir: str, queries: DataFrame,
             k: int = TOP_K, m: int = PQ_M, kc: int = PQ_K,
             probe_fraction: float = IVF_PROBE_FRACTION,
             refine_factor: int = PQ_REFINE_FACTOR,
             exclude_self: bool = True) -> DataFrame:
    """Serve a (query_id, qv) batch from the PQ index: per-query LUT of
    subspace inner products (pandas UDF over the SMALL query side),
    IVF cell pruning, then codegen ADC scoring over the stored codes --
    ``sum_j LUT[j*K + code_j]`` as a higher-order-function fold, so the
    corpus-side scan touches only code arrays.

    ``refine_factor`` adds the standard refine stage: the ADC pass
    keeps a k*factor shortlist per query, and only those Q*k*factor
    rows join back to the full-vector table for exact rescoring --
    recall then matches the exact-IVF path at the same probe fraction
    (quantization distortion only affects which candidates make the
    shortlist, not their final ranking), while the corpus-wide scan
    still reads 16 B codes. ``refine_factor=0`` disables refinement
    and returns raw ADC ranking."""
    codebooks, codes, n_cells = pq_build(spark, sf_dir, m, kc)
    centroids, _assigned, _ = ivf_build(spark, sf_dir)
    n_probe = max(1, int(n_cells * probe_fraction))
    bc = spark.sparkContext.broadcast(codebooks)
    dsub = codebooks.shape[2]

    @pandas_udf("array<double>")
    def lut_udf(qv: pd.Series) -> pd.Series:
        cb = bc.value
        out = []
        for v in qv:
            q = np.asarray(v)
            lut = np.concatenate([
                cb[j] @ q[j * dsub:(j + 1) * dsub] for j in range(m)
            ])  # (m*kc,) inner products
            out.append(lut)
        return pd.Series(out)

    qlut = queries.select("query_id", "qv").withColumn(
        "lut", lut_udf(F.col("qv"))
    )

    # IVF pruning: nearest probed cells per query (same rule as
    # ivf_probe; L2 on unit-norm vectors ranks like cosine)
    l2 = F.sqrt(F.aggregate(
        F.zip_with(F.col("qv"), F.col("centroid"),
                   lambda a, b: (a - b) * (a - b)),
        F.lit(0.0), lambda acc, x: acc + x,
    ))
    wprobe = Window.partitionBy("query_id").orderBy(
        F.asc("dist"), F.asc("cell"))
    probes = (
        qlut.crossJoin(F.broadcast(centroids))
        .select("query_id", "lut", "cell", l2.alias("dist"))
        .withColumn("pr", F.row_number().over(wprobe))
        .filter(F.col("pr") <= n_probe)
        .select("query_id", "lut", "cell")
    )

    cand = codes.select(
        F.col("vec_id").alias("neighbor_id"), "code",
        F.col("cell").alias("ccell"),
    )
    adc = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, j: acc + F.element_at(
            "lut", (j * kc + F.element_at("code", j + 1) + 1).cast("int")
        ),
    )
    scored = F.broadcast(probes).join(cand, F.col("cell") == F.col("ccell"))
    if exclude_self:
        # only correct when query ids share the corpus vec_id space
        # (the registered queries); external id spaces pass False
        scored = scored.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = scored.select("query_id", "neighbor_id", adc.alias("adc_score"))
    # rank on the ROUNDED score: the raw fold's last ~1e-15 differs
    # between this fold and the oracle's reconstruction dot product
    # (summation order), and an unrounded cut could shortlist
    # different near-tied candidates per engine; at 6 decimals ties
    # collapse and neighbor_id breaks them identically on both sides
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("adc_score", 6)), F.asc("neighbor_id"))
    if not refine_factor:
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank",
                    F.round("adc_score", 4).alias("adc_score"))
        )
    shortlist = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k * refine_factor)
        .select("query_id", "neighbor_id")
    )
    from .similarity import cosine

    exact = (
        F.broadcast(
            shortlist.join(
                queries.select("query_id", "qv"), "query_id"
            )
        )
        .join(
            _assigned.select(F.col("vec_id").alias("neighbor_id"),
                             F.col("v").alias("cv")),
            "neighbor_id",
        )
        .select("query_id", "neighbor_id",
                cosine(F.col("qv"), F.col("cv")).alias("cos_raw"))
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.desc("cos_raw"), F.asc("neighbor_id"))
    return (
        exact.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank",
                F.round("cos_raw", 4).alias("cos_sim"))
    )


def anns_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ retrieval over the persisted code index: build once per
    (session, corpus), probe per call. FULL oracle: the k-means fits
    (coarse + per-subspace) have no SQL twin, but the probe is
    deterministic relational work over the FROZEN codebook/code/
    centroid parquet -- the oracle reads the same matviews via
    ``read_parquet`` (``corpus_key``-filtered) and mirrors cell
    pruning, ADC scoring (inner product against the quantized
    reconstruction == the LUT-sum identity), shortlist, and exact
    refine. Recall vs brute force and the ADC error contract stay in
    ``tests/test_pq.py``."""
    base = _vectors(spark, sf_dir)
    queries = base.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    return pq_probe(spark, sf_dir, queries)


QUERIES = {
    "anns_ivfpq_topk": anns_ivfpq_topk,
}


# the oracle twin lives in operators/similarity.py (the recall report
# embeds it and tests parametrize over that module's ORACLE); assert
# the parameters stayed in sync before re-exporting it
from .similarity import PQ_ORACLE_PARAMS, ivfpq_oracle_sql  # noqa: E402

assert PQ_ORACLE_PARAMS == (PQ_M, PQ_K, PQ_REFINE_FACTOR), (
    "IVF-PQ oracle parameters diverged from the operator's: "
    f"{PQ_ORACLE_PARAMS} != {(PQ_M, PQ_K, PQ_REFINE_FACTOR)}"
)

ORACLE: dict = {"anns_ivfpq_topk": ivfpq_oracle_sql()}
