"""Distributed ML primitives over the embedding corpus: k-means
clustering and Johnson-Lindenstrauss random projection.

Reference parity: the reference clusters its vector store server-side
(Qdrant's HNSW build / payload-partitioned collections,
``doc-ingest-chat/services/database.py``) and never materializes a
trainable clustering in the pipeline; a 100 TB curation stack needs
both as first-class batch operators (IVF coarse quantizers, SemDeDup's
cluster stage, dataset cartography). Both operators here are built for
the cross-engine correctness gate:

- ``embed_kmeans``: Lloyd's algorithm with a FIXED iteration count and
  deterministic seeding, computed in EXACT INTEGER MICRO-UNITS
  (docs/ROUNDING.md rule 1). Vectors quantize once to ``BIGINT``
  micro-units (``floor(x * 1e6 + 0.5)`` -- float64 ops, identical in
  every IEEE-754 engine), and every subsequent step (squared
  distances, argmin with cluster-id tie-break, centroid = truncated
  integer mean) is integer arithmetic, so Spark and the unrolled
  recursive-free DuckDB oracle agree BIT-EXACTLY -- no rounding, no
  float summation order anywhere.
- ``embed_random_projection``: dense JL sign projection. The
  Rademacher sign matrix derives from an integer mixing hash of
  (input_dim, output_dim) evaluated inside both engines, and each
  output coordinate is a SEQUENTIAL left fold of float64 products
  (Spark ``aggregate``, DuckDB ``list_reduce``) divided by an exact
  power of two -- bit-identical across engines with NO rounding at
  all (the strongest form of the rounding contract).

Scale shape: k-means is the canonical broadcast-centroids pattern --
each iteration is one map-side assignment against K broadcast
centroids plus one (cluster, dim)-keyed partial-aggregated sum
(K x dim rows collected, bounded); the corpus is never shuffled. The
projection is map-only over a pruned (vec_id, label, embedding) scan:
zero shuffles, whole-stage codegen end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import rebalance, table

# k-means
KM_K = 8          # clusters
KM_ITERS = 3      # fixed Lloyd iterations (assignment passes)
KM_SCALE = 1_000_000  # micro-unit quantization of float64 coords

# random projection
RP_DIMS = 16      # output dimensionality
RP_DIV = 4        # sqrt(RP_DIMS) -- exact power of two, lossless division
_RP_A = 2_654_435_761   # Knuth multiplicative hash constants
_RP_B = 1_013_904_223   # Numerical Recipes LCG increment
_RP_MOD = 4_294_967_296  # 2^32
_RP_SHIFT = 8_192        # 2^13: take bit 13 of the mixed word


def _quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Valid vectors quantized to integer micro-units. ``floor(x * 1e6
    + 0.5)`` uses only float64 multiply/add/floor -- bit-deterministic
    across engines on the identical float32-widened input -- and lands
    in BIGINT exactly. NULL embeddings (failed embeds) are excluded on
    both sides, same contract as every vector path."""
    # HOF lambdas evaluate interpreted (outside whole-stage codegen):
    # spread the single-row-group local scan across cores; no-op at
    # real scale where the table has >= cores splits
    emb = rebalance(table(spark, sf_dir, "embeddings"))
    q = F.expr(
        f"transform(CAST(embedding AS ARRAY<DOUBLE>), "
        f"x -> CAST(floor(x * {KM_SCALE}.0 + 0.5) AS BIGINT))"
    )
    return (
        emb.filter(F.col("embedding").isNotNull())
        .select("vec_id", "label", q.alias("q"))
    )


def _tdiv(s: int, n: int) -> int:
    """Truncate-toward-zero integer division: Spark ``div`` and DuckDB
    ``//`` both truncate; Python ``//`` floors, so negative sums need
    the explicit form."""
    return -((-s) // n) if (s < 0) != (n < 0) else s // n


def _assign(q: DataFrame, centroids: list[list[int]]) -> DataFrame:
    """Map-side assignment against broadcast centroids: argmin of
    exact integer squared distance, ties to the lowest cluster id.

    Vectorized Arrow kernel (same precedent as the cosine-dedup
    kernel): ``|q - c|^2 = |q|^2 - 2 q.c + |c|^2`` with every term an
    exact int64 numpy op (integer matmul is naive exact arithmetic,
    never BLAS float), so the distances are BIT-IDENTICAL to the
    interpreted-HOF form and to the DuckDB oracle -- numpy's
    first-occurrence ``argmin`` is exactly the lexicographic
    (dist, cl) struct-min tie-break. Headroom: |q|^2 and |c|^2 are
    <= dim * (2e6)^2 ~ 2.6e14 for unit-scale micro-unit vectors --
    five decades inside int64. Replaces a K x dim interpreted lambda
    chain per row (~4x on the local bench; the win grows with K)."""
    import numpy as np
    import pandas as pd

    C = np.asarray(centroids, dtype=np.int64)
    cc = (C * C).sum(axis=1)

    def kernel(s):
        if len(s) == 0:
            return pd.DataFrame({
                "cl": pd.Series([], dtype="int32"),
                "d": pd.Series([], dtype="int64"),
            })
        Q = np.asarray(s.tolist(), dtype=np.int64)
        qq = (Q * Q).sum(axis=1)
        d = qq[:, None] - 2 * (Q @ C.T) + cc[None, :]
        cl = d.argmin(axis=1)
        return pd.DataFrame({
            "cl": cl.astype("int32"),
            "d": d[np.arange(len(cl)), cl],
        })

    # annotation-free: function-local type hints don't resolve under
    # postponed annotations (see memory/ROUNDING notes)
    best = F.pandas_udf(kernel, "cl int, d long")(F.col("q"))
    return (
        q.select("vec_id", "q", best.alias("_a"))
        .select(
            "vec_id", "q",
            F.col("_a.cl").alias("cluster"),
            F.col("_a.d").alias("dist_u"),
        )
    )


def _kmeans_assignment(spark: SparkSession, sf_dir: str,
                       k: int = KM_K, iters: int = KM_ITERS) -> DataFrame:
    """The Lloyd loop, returning the FINAL assignment (vec_id,
    cluster, dist_u) materialized behind a ``localCheckpoint`` taken
    WHILE the quantized corpus is still cached. Before r12 the final
    assignment was returned lazily and the cache released first, so
    the caller's action re-ran the whole scan + quantize + Arrow
    assign pass from cold parquet -- and each of the three consumers
    (embed_kmeans, cluster_cartography, cluster_label_agreement) paid
    that recompute inside its own checkpoint. Now the loop's last pass
    is materialized once from the warm cache and every consumer reads
    the small (vec_id, cluster, dist_u) table."""
    if iters < 1:
        raise ValueError(f"embed_kmeans requires iters >= 1, got {iters}")
    if k < 1:
        raise ValueError(f"embed_kmeans requires k >= 1, got {k}")
    q = _quantized(spark, sf_dir)
    q.persist()
    try:
        seeds = (
            q.orderBy("vec_id").limit(k)
            .select("q").collect()
        )
        centroids = [list(r.q) for r in seeds]
        if not centroids:
            # every embedding failed: empty result, stable schema
            return q.select(
                "vec_id",
                F.lit(0).cast("int").alias("cluster"),
                F.lit(0).cast("long").alias("dist_u"),
            ).limit(0)
        for it in range(iters):
            assigned = _assign(q, centroids)
            if it == iters - 1:
                break
            sums = (
                assigned.select("cluster", F.posexplode("q").alias("i", "x"))
                .groupBy("cluster", "i")
                .agg(F.sum("x").alias("sx"), F.count(F.lit(1)).alias("n"))
                .collect()
            )
            new: dict[int, dict[int, tuple[int, int]]] = {}
            for r in sums:
                new.setdefault(r.cluster, {})[r.i] = (r.sx, r.n)
            centroids = [
                [_tdiv(new[cl][i][0], new[cl][i][1])
                 for i in range(len(c))] if cl in new else c
                for cl, c in enumerate(centroids)
            ]
        return assigned.select(
            "vec_id", "cluster", "dist_u").localCheckpoint()
    finally:
        q.unpersist()


def embed_kmeans(spark: SparkSession, sf_dir: str,
                 k: int = KM_K, iters: int = KM_ITERS) -> DataFrame:
    """Fixed-iteration Lloyd k-means over the embedding corpus, seeded
    from the ``k`` lowest vec_ids, all arithmetic in exact integer
    micro-units. Emits the FINAL assignment: (vec_id, cluster, exact
    squared distance in micro-unit^2, cluster size).

    Driver-side state is bounded at K x dim integers per iteration
    (the canonical broadcast-centroids k-means: Spark MLlib's KMeans
    does exactly this collect-and-broadcast per step); the corpus
    itself is never shuffled -- assignment is map-only and the
    centroid recompute is one partial-aggregated (cluster, dim) sum.
    Empty clusters keep their previous centroid (both engines).
    Cluster sizes attach as a broadcast K-row join against the
    checkpointed assignment (r12: previously a full-corpus
    Window-over-cluster, i.e. an Exchange + Sort of every row into K
    partitions for a count the K-row aggregate already knows)."""
    final = _kmeans_assignment(spark, sf_dir, k, iters)
    sizes = final.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_in_cluster"))
    return final.join(F.broadcast(sizes), "cluster").select(
        "vec_id", "cluster", "dist_u", "n_in_cluster")


def _km_ctes(k: int = KM_K, iters: int = KM_ITERS,
             scale: int = KM_SCALE) -> str:
    """The unrolled Lloyd iteration CTE chain (shared by the k-means
    oracle and the cartography oracle): same exact integer arithmetic
    as the Spark side -- DuckDB ``//`` truncates toward zero like
    Spark ``div``, ``%`` carries the dividend's sign in both, and the
    1-based lambda index aligns with 1-based list indexing. The final
    assignment CTE is ``a{iters}``."""
    parts = [f"""
        q AS (
            SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
                       x -> CAST(floor(x * {scale}.0 + 0.5) AS BIGINT)) AS q
            FROM embeddings WHERE embedding IS NOT NULL
        ),
        c0 AS (
            SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER)
                       AS cl, q AS c
            FROM q ORDER BY vec_id LIMIT {k}
        )"""]
    for t in range(1, iters + 1):
        parts.append(f"""
        a{t} AS (
            SELECT v.vec_id, v.q, c.cl,
                   list_aggregate(list_transform(v.q,
                       (x, i) -> (x - c.c[i]) * (x - c.c[i])), 'sum') AS dist
            FROM q v, c{t - 1} c
            QUALIFY row_number() OVER (
                PARTITION BY v.vec_id ORDER BY dist, c.cl) = 1
        )""")
        if t == iters:
            break
        parts.append(f"""
        s{t} AS (
            SELECT cl, u.s.i AS i, CAST(sum(u.s.x) AS BIGINT) AS sx,
                   count(*) AS n
            FROM (SELECT cl, list_transform(q,
                      (x, i) -> struct_pack(i := i, x := x)) AS l
                  FROM a{t}), unnest(l) AS u(s)
            GROUP BY cl, u.s.i
        ),
        c{t} AS (
            SELECT c{t - 1}.cl, coalesce(n.c, c{t - 1}.c) AS c
            FROM c{t - 1} LEFT JOIN (
                SELECT cl, list(sx // n ORDER BY i) AS c
                FROM s{t} GROUP BY cl) n USING (cl)
        )""")
    return ",".join(parts)


def _km_oracle_sql(k: int = KM_K, iters: int = KM_ITERS,
                   scale: int = KM_SCALE) -> str:
    return f"""
        WITH {_km_ctes(k, iters, scale)}
        SELECT vec_id, cl AS cluster, CAST(dist AS BIGINT) AS dist_u,
               count(*) OVER (PARTITION BY cl) AS n_in_cluster
        FROM a{iters}
    """


def _rp_sign_spark(j: int) -> str:
    """Rademacher sign for (input dim i [0-based SQL lambda], output
    dim j) as a Spark SQL fragment over lambda variable ``i``."""
    return (
        f"CAST(2 * ((((CAST(i AS BIGINT) * {_RP_A} + {j * _RP_B % _RP_MOD})"
        f" % {_RP_MOD}) div {_RP_SHIFT}) % 2) - 1 AS DOUBLE)"
    )


def _rp_sign_duck(j: int) -> str:
    """Same sign in DuckDB (1-based lambda index -> ``i - 1``)."""
    return (
        f"CAST(2 * (((((i - 1) * {_RP_A} + {j * _RP_B % _RP_MOD})"
        f" % {_RP_MOD}) // {_RP_SHIFT}) % 2) - 1 AS DOUBLE)"
    )


def embed_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss sign (Achlioptas) projection of every
    embedding to ``RP_DIMS`` coordinates: ``y_j = (sum_i x_i *
    s(i, j)) / sqrt(RP_DIMS)``, emitted exploded to one row per
    (vec_id, out_dim). The sign matrix never materializes -- it is an
    integer hash of the coordinate pair computed identically inside
    both engines -- and each fold is sequential left-to-right in
    float64, so the emitted doubles are bit-exact cross-engine with
    no rounding.

    Scale shape: map-only (one Arrow-batched matrix pass + local
    explode), scan pruned to three columns, zero shuffles; the output
    is dim/4 the input width -- the standard pre-step before an
    all-pairs-ish similarity stage whose cost is linear in dim.

    r8: the 16 interpreted ``aggregate(transform(...))`` folds (HOFs
    never enter whole-stage codegen -- each of the 16 x dim lambda
    steps was an interpreted expression eval per row, the cost the 10x
    scale probe surfaced at ratio 7) are replaced by ONE ``mapInPandas``
    batch kernel that accumulates ``acc += X[:, i] * S[i]`` dimension
    by dimension: the same left-to-right float64 additions from the
    same 0.0 seed as the SQL fold and the DuckDB list_reduce, merely
    vectorized ACROSS rows -- per-element IEEE op order is unchanged,
    so the emitted doubles stay bit-exact cross-engine with no
    rounding."""
    import numpy as np
    import pandas as pd

    out_schema = ("vec_id bigint, label int, out_dim int, y double")

    def project(batches):
        sign_cache: dict = {}
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            d = X.shape[1]
            if d not in sign_cache:
                i = np.arange(d, dtype=np.int64)[:, None]
                j = np.arange(RP_DIMS, dtype=np.int64)[None, :]
                mixed = (i * _RP_A + (j * _RP_B) % _RP_MOD) % _RP_MOD
                sign_cache[d] = (
                    2 * ((mixed // _RP_SHIFT) % 2) - 1
                ).astype(np.float64)
            S = sign_cache[d]
            acc = np.zeros((X.shape[0], RP_DIMS), dtype=np.float64)
            for ii in range(d):  # left-to-right, bit-exact vs the fold
                acc += X[:, ii:ii + 1] * S[ii]
            Y = acc / RP_DIV
            n = X.shape[0]
            # Series.repeat + nullable Int dtypes: NULL ids/labels
            # (the null-sweep fixtures) survive the Arrow round-trip
            # as NULLs, never NaN-to-int garbage
            yield pd.DataFrame({
                "vec_id": pdf["vec_id"].repeat(RP_DIMS)
                .reset_index(drop=True).astype("Int64"),
                "label": pdf["label"].repeat(RP_DIMS)
                .reset_index(drop=True).astype("Int32"),
                "out_dim": np.tile(
                    np.arange(RP_DIMS, dtype=np.int32), n),
                "y": Y.ravel(),
            })

    # same single-split spread as _quantized: the Arrow batches of an
    # under-split test-scale scan must not serialize onto one core
    emb = rebalance(table(spark, sf_dir, "embeddings"))
    return (
        emb.filter(F.col("embedding").isNotNull())
        .select("vec_id", "embedding", "label")
        .mapInPandas(project, schema=out_schema)
    )


def _rp_oracle_sql() -> str:
    cols = ", ".join(
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(CAST(embedding AS DOUBLE[]), "
        f"(x, i) -> x * {_rp_sign_duck(j)})), "
        f"(acc, t) -> acc + t) / {RP_DIV} AS y{j}"
        for j in range(RP_DIMS)
    )
    structs = ", ".join(
        f"struct_pack(d := {j}, y := y{j})" for j in range(RP_DIMS)
    )
    return f"""
        WITH p AS (
            SELECT vec_id, label, {cols}
            FROM embeddings WHERE embedding IS NOT NULL
        )
        SELECT vec_id, label, CAST(u.s.d AS INTEGER) AS out_dim, u.s.y AS y
        FROM (SELECT vec_id, label, [{structs}] AS l FROM p), unnest(l) AS u(s)
    """


CARTO_TOP_TERMS = 5


def cluster_cartography(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset cartography: the k-means partition joined back to the
    document corpus (``vec_id = doc_id``, the engine's store
    convention) and each cluster labeled with its top document-
    frequency terms -- the "what is this cluster ABOUT" report a
    curation pass reads before up/down-weighting regions of the
    embedding space (SemDeDup-style pruning, domain discovery).

    Scale shape: the assignment side is the k-means output (never
    re-shuffled -- the join key is the store's primary key), term
    counting is a map-side ``array_distinct`` explode with partial
    aggregation on (cluster, term), and the top-k is a window over K
    partitions of vocabulary-sized (not corpus-sized) data; cluster
    sizes ride along as a broadcast K-row join. The assignment is
    EAGERLY checkpointed: two branches (sizes, terms) consume it, and
    without truncation each branch re-runs the full Lloyd lineage
    (measured 2x the whole query locally; on a cluster the equivalent
    is persisting the assignment table before the report joins)."""
    assign = _kmeans_assignment(spark, sf_dir).select("vec_id", "cluster")
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    joined = assign.join(
        docs, assign["vec_id"] == docs["doc_id"]
    ).select("cluster", "doc_id", "text")
    sizes = joined.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_docs"))
    from ..functions.text_quality import words

    terms = joined.select(
        "cluster",
        F.explode(F.array_distinct(words(F.col("text")))).alias("term"),
    )
    dfc = terms.groupBy("cluster", "term").agg(
        F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("cluster").orderBy(F.desc("df"), F.asc("term"))
    return (
        dfc.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= CARTO_TOP_TERMS)
        .join(F.broadcast(sizes), "cluster")
        .select("cluster", "n_docs", "rank", "term", "df")
    )


def _carto_oracle_sql() -> str:
    from .textstats import _W_SQL

    return f"""
        WITH {_km_ctes()},
        j AS (
            SELECT a.cl AS cluster, d.doc_id, {_W_SQL} AS w
            FROM a{KM_ITERS} a JOIN documents d ON d.doc_id = a.vec_id
        ),
        sizes AS (
            SELECT cluster, CAST(count(*) AS BIGINT) AS n_docs
            FROM j GROUP BY cluster
        ),
        dfc AS (
            SELECT cluster, u.term, CAST(count(*) AS BIGINT) AS df
            FROM (SELECT cluster, list_distinct(w) AS dw FROM j),
                 unnest(dw) AS u(term)
            GROUP BY cluster, u.term
        ),
        ranked AS (
            SELECT cluster, term, df,
                   CAST(row_number() OVER (PARTITION BY cluster
                       ORDER BY df DESC, term ASC) AS INTEGER) AS rank
            FROM dfc
        )
        SELECT r.cluster, s.n_docs, r.rank, r.term, r.df
        FROM ranked r JOIN sizes s USING (cluster)
        WHERE r.rank <= {CARTO_TOP_TERMS}
    """


Z_SCALE = 1_000_000  # emitted z-scores in 1e-6 units


def embedding_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-DIMENSION STANDARDIZATION of the embedding corpus (the
    whitening-lite preprocessing that stops one high-variance
    dimension from dominating every distance): z = (x - mean) / std
    per dimension, computed ENTIRELY in exact integer micro-units --
    integer sums for the mean (truncating division), mean-shifted
    integer squares for the variance (never the overflow-prone
    n*sumsq - sum^2 form), and the only float op is one
    correctly-rounded IEEE sqrt of an exact BIGINT, floored back to
    integer -- so both engines emit identical 1e-6-unit z-scores with
    no summation-order dependence (docs/ROUNDING.md rule 1: float
    sums over a cluster's partitions are order-dependent; integer
    sums are not).

    Scale shape: two partial-aggregated passes keyed on the 64-ary
    dimension (the second needs the first's means -- the classic
    two-pass variance, chosen over one-pass float Welford precisely
    for cross-partition determinism), then a broadcast join back;
    output is the exploded (vec_id, dim, z_u) -- reassembly to an
    array column is one collect_list keyed by vec_id if needed."""
    q = _quantized(spark, sf_dir)
    x = q.select("vec_id", F.posexplode("q").alias("dim", "xu"))
    stats = x.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"), F.sum("xu").alias("sxu")
    ).select("dim", "n", F.expr("sxu div n").alias("mean_u"))
    dev = x.join(F.broadcast(stats), "dim").select(
        "vec_id", "dim", "n", (F.col("xu") - F.col("mean_u")).alias("d"),
    )
    var = dev.groupBy("dim").agg(
        F.expr("sum(d * d) div min(n)").alias("var_u2")
    ).select(
        "dim",
        F.floor(F.sqrt(F.col("var_u2").cast("double")))
        .cast("long").alias("std_u"),
    )
    return dev.join(F.broadcast(var), "dim").select(
        "vec_id", F.col("dim").cast("int").alias("dim"),
        F.when(F.col("std_u") > 0,
               F.expr(f"(d * {Z_SCALE}) div std_u"))
        .otherwise(0).cast("long").alias("z_u"),
    )


def _standardize_oracle_sql() -> str:
    return f"""
        WITH q AS (
            SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
                       x -> CAST(floor(x * {KM_SCALE}.0 + 0.5) AS BIGINT))
                   AS q
            FROM embeddings WHERE embedding IS NOT NULL
        ),
        x AS (
            SELECT vec_id, CAST(i - 1 AS INTEGER) AS dim, q[i] AS xu
            FROM q, unnest(range(1, len(q) + 1)) t(i)
        ),
        stats AS (
            SELECT dim, count(*) AS n, sum(xu) // count(*) AS mean_u
            FROM x GROUP BY dim
        ),
        dev AS (
            SELECT x.vec_id, x.dim, s.n, x.xu - s.mean_u AS d
            FROM x JOIN stats s ON s.dim = x.dim
        ),
        var AS (
            SELECT dim,
                   CAST(floor(sqrt(CAST(sum(d * d) // min(n) AS DOUBLE)))
                        AS BIGINT) AS std_u
            FROM dev GROUP BY dim
        )
        SELECT dev.vec_id, dev.dim,
               CAST(CASE WHEN v.std_u > 0
                    THEN (dev.d * {Z_SCALE}) // v.std_u
                    ELSE 0 END AS BIGINT) AS z_u
        FROM dev JOIN var v ON v.dim = dev.dim
    """


PCA_DIM = 64            # embedding dimensionality (embeddings table)
PCA_ITERS = 4           # fixed power iterations on the Gram sketch
PCA_V_SCALE = 1_000_000  # iterate/emit the direction in 1e-6 units


def _gram_cells(q: DataFrame) -> DataFrame:
    """Partial integer Gram cells ``(i, j, g)`` -- ``G[i,j] = sum_rows
    q_i * q_j`` -- as a per-task numpy int64 matmul (the vectorized-
    exact precedent of :func:`_assign`): each task accumulates its
    batches' outer products into one ``d x d`` int64 matrix and emits
    at most ``d^2`` partial cells, so the downstream groupBy reduces
    ``tasks x d^2`` rows instead of the former ``rows x d^2`` exploded
    structs (the explode dominated both PCA queries' wall time).
    Integer addition commutes, so the aggregated cells are
    BIT-IDENTICAL to the explode/groupBy form and to the unrolled
    DuckDB oracle (test-pinned against the explode reference,
    ragged/null edges included).

    Exact explode-semantics preservation: a cell ``(i, j)`` exists iff
    some vector has ``len >= max(i, j)`` (per-length partial Grams
    accumulate into the top-left block of the widest matrix the task
    has seen, and each task emits its own ``[1..d_max]^2`` square); a
    cell whose every product was NULL carries a NULL partial, which
    the final ``sum`` skips -- so an all-NULL cell stays NULL, exactly
    the SQL aggregate contract. Headroom: ``|cell| <= rows x (2e6)^2``
    for unit-scale micro-unit vectors -- int64-safe to ~2.3e6 rows per
    task, five decades above the local corpus and the same bound the
    exploded BIGINT sum had."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    def kernel(batches):
        G = None          # int64 (d, d) partial Gram
        seen = None       # bool  (d, d) -- any non-NULL product

        def grow(d):
            nonlocal G, seen
            if G is None:
                G = np.zeros((d, d), dtype=np.int64)
                seen = np.zeros((d, d), dtype=bool)
            elif G.shape[0] < d:
                H = np.zeros((d, d), dtype=np.int64)
                S = np.zeros((d, d), dtype=bool)
                n = G.shape[0]
                H[:n, :n] = G
                S[:n, :n] = seen
                G, seen = H, S

        for rb in batches:
            col = rb.column(0)
            if isinstance(col, pa.ChunkedArray):  # defensive
                col = col.combine_chunks()
            n = len(col)
            if n == 0:
                continue
            offs = col.offsets.to_numpy(zero_copy_only=False)
            lens = offs[1:] - offs[:-1]
            row_ok = (
                np.ones(n, dtype=bool) if col.null_count == 0
                else col.is_valid().to_numpy(zero_copy_only=False)
            )
            vals = col.values
            if vals.null_count == 0:
                elem_nulls_per_row = np.zeros(n, dtype=np.int64)
                vals_np = vals.to_numpy()
            else:
                # per-row count of NULL elements, from the flat mask
                nulls = pc.is_null(vals).to_numpy(
                    zero_copy_only=False).astype(np.int64)
                cum = np.concatenate(([0], np.cumsum(nulls)))
                elem_nulls_per_row = cum[offs[1:]] - cum[offs[:-1]]
                vals_np = None
            fast = row_ok & (lens > 0) & (elem_nulls_per_row == 0)
            if fast.any():
                if vals_np is None:
                    # int64 stays exact: pull the buffer, ignore the
                    # (separately handled) null slots
                    vals_np = np.frombuffer(
                        vals.buffers()[1], dtype=np.int64,
                        count=vals.offset + len(vals),
                    )[vals.offset:]
                for d in np.unique(lens[fast]):
                    d = int(d)
                    grow(d)
                    starts = offs[:-1][fast & (lens == d)]
                    Q = vals_np[starts[:, None]
                                + np.arange(d)[None, :]]
                    G[:d, :d] += Q.T @ Q
                    seen[:d, :d] = True
            slow = row_ok & (lens > 0) & (elem_nulls_per_row > 0)
            for r in np.nonzero(slow)[0]:
                # exact scalar fallback (never hit by the NOT NULL-
                # filtered corpus): NULL products drop, matching the
                # explode form's null-skipping sum
                v = col[int(r)].as_py()
                grow(len(v))
                for i, xi in enumerate(v):
                    if xi is None:
                        continue
                    for j, xj in enumerate(v):
                        if xj is None:
                            continue
                        G[i, j] += xi * xj
                        seen[i, j] = True
        if G is not None:
            d = G.shape[0]
            ii, jj = np.indices((d, d))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array((ii.ravel() + 1).astype("int32")),
                    pa.array((jj.ravel() + 1).astype("int32")),
                    pa.array(G.ravel(), mask=~seen.ravel()),
                ],
                names=["i", "j", "g"],
            )

    return (
        q.select("q")
        .mapInArrow(kernel, "i int, j int, g long")
    )


def _pca_power(spark: SparkSession, sf_dir: str, iters: int):
    """Shared Gram-sketch power iteration: returns (gn, v) -- the
    max-normalized integer Gram cells and the iterated direction --
    consumed by :func:`pca_top_component` and
    :func:`embedding_isotropy_report`."""
    q = _quantized(spark, sf_dir)
    # eager checkpoint of the <= dim^2-row cell table: gmax and gn
    # both consume it, and without the cut each would re-run the
    # corpus-scale Arrow gram stage (2 Python passes per build)
    cells = (
        _gram_cells(q)
        .groupBy("i", "j")
        .agg(F.sum("g").alias("g"))
        .localCheckpoint()
    )
    gmax = cells.agg(F.max(F.abs(F.col("g"))).alias("m"))
    gn = (
        cells.crossJoin(F.broadcast(gmax))
        .select(
            "i", "j",
            F.expr(f"g div greatest(m div {PCA_V_SCALE}, 1)").alias("gn"),
        )
        .localCheckpoint()
    )
    v = gn.select(F.col("j")).distinct().select(
        "j", F.lit(PCA_V_SCALE).cast("long").alias("v")
    )
    for _ in range(iters):
        w = (
            gn.join(v, "j")
            .groupBy(F.col("i"))
            .agg(F.sum(F.col("gn") * F.col("v")).alias("w"))
        )
        m = w.agg(F.max(F.abs(F.col("w"))).alias("m"))
        v = (
            w.crossJoin(F.broadcast(m))
            .select(
                F.col("i").alias("j"),
                F.expr(f"w div greatest(m div {PCA_V_SCALE}, 1)")
                .cast("long").alias("v"),
            )
            .localCheckpoint()
        )
    return gn, v


def pca_top_component(spark: SparkSession, sf_dir: str,
                      iters: int = PCA_ITERS) -> DataFrame:
    """TOP PRINCIPAL DIRECTION of the embedding corpus by power
    iteration on the (uncentered) Gram matrix -- the dominant
    direction whitening/ABTT-style embedding post-processing removes
    first (Mu & Viswanath 2018: the common direction dominates cosine
    geometry) and the one-vector summary a corpus drift monitor
    tracks. Emits one row per dimension: the component in max-
    normalized 1e-6 integer units, sign-fixed so the largest-|coord|
    entry is positive.

    Exactness: the Gram matrix is an EXACT integer aggregate of
    quantized micro-unit products; normalization and every iteration
    are BIGINT multiply / truncating-divide ladders (max-
    renormalized each round, so products stay ~1e12 -- far under
    2^63); the result is bit-identical to the unrolled-CTE oracle
    with no float anywhere except the final cosmetic /1e6
    (docs/ROUNDING.md rule 1).

    Scale shape: the ONLY corpus-scale pass is the per-task numpy
    Gram accumulation (:func:`_gram_cells` -- one int64 matmul per
    Arrow batch, at most dim^2 partial cells per task) reduced into
    the fixed dim x dim cell table; the iterations then run on 4096
    rows (tiny -- broadcast-joined against the 64-row vector) and the
    corpus is never rescanned. The sketch-then-iterate shape is
    exactly distributed PCA's (Spark MLlib computes the same Gram
    first)."""
    gn, v = _pca_power(spark, sf_dir, iters)
    sign = (
        v.orderBy(F.abs(F.col("v")).desc(), F.asc("j")).limit(1)
        .select(F.when(F.col("v") < 0, -1).otherwise(1).alias("s"))
    )
    return (
        v.crossJoin(F.broadcast(sign))
        .select(
            (F.col("j") - 1).cast("int").alias("dim"),
            (F.col("v") * F.col("s")).cast("long").alias("component_u"),
            ((F.col("v") * F.col("s")).cast("double") / PCA_V_SCALE)
            .alias("component"),
        )
    )


def _pca_cte_parts(iters: int) -> list:
    d, vs = PCA_DIM, PCA_V_SCALE
    parts = [f"""
        q AS (
            SELECT list_transform(CAST(embedding AS DOUBLE[]),
                x -> CAST(floor(x * {KM_SCALE}.0 + 0.5) AS BIGINT)) AS q
            FROM embeddings WHERE embedding IS NOT NULL
        ),
        cells AS (
            SELECT ri.i, rj.j, CAST(sum(q.q[ri.i] * q.q[rj.j]) AS BIGINT)
                       AS g
            FROM q, range(1, {d + 1}) ri(i), range(1, {d + 1}) rj(j)
            GROUP BY ri.i, rj.j
        ),
        gmax AS (SELECT max(abs(g)) AS m FROM cells),
        gn AS (
            SELECT i, j, CAST(g // greatest(m // {vs}, 1) AS BIGINT) AS gn
            FROM cells, gmax
        ),
        v0 AS (
            SELECT DISTINCT j, CAST({vs} AS BIGINT) AS v FROM gn
        )"""]
    for t in range(1, iters + 1):
        parts.append(f"""
        w{t} AS (
            SELECT gn.i, CAST(sum(gn.gn * p.v) AS BIGINT) AS w
            FROM gn JOIN v{t - 1} p ON p.j = gn.j GROUP BY gn.i
        ),
        m{t} AS (SELECT max(abs(w)) AS m FROM w{t}),
        v{t} AS (
            SELECT i AS j,
                   CAST(w // greatest(m // {vs}, 1) AS BIGINT) AS v
            FROM w{t}, m{t}
        )""")
    return parts


def _pca_oracle_sql(iters: int = PCA_ITERS) -> str:
    vs = PCA_V_SCALE
    parts = _pca_cte_parts(iters)
    return f"""
        WITH {",".join(parts)},
        sgn AS (
            SELECT CASE WHEN v < 0 THEN -1 ELSE 1 END AS s
            FROM v{iters} ORDER BY abs(v) DESC, j ASC LIMIT 1
        )
        SELECT CAST(v.j - 1 AS INTEGER) AS dim,
               CAST(v.v * s.s AS BIGINT) AS component_u,
               CAST(v.v * s.s AS DOUBLE) / {vs} AS component
        FROM v{iters} v CROSS JOIN sgn s
    """


ISO_VR_DIV = 1_000  # direction down-scale for the exact quadratic form


def embedding_isotropy_report(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """ISOTROPY of the embedding corpus: the share of total variance
    the top principal direction explains -- the Rayleigh quotient of
    the power-iterated direction over the Gram trace (Mu & Viswanath
    2018's diagnostic: cosine similarity degenerates when one common
    direction dominates; a healthy corpus sits near 1/dim, a
    collapsed one near 1). One row: dimension count, exact integer
    trace, the Rayleigh estimate of the top eigenvalue, and the
    isotropy ratio.

    Exactness: trace, the quadratic form ``v'Gv`` and ``v'v`` are
    EXACT BIGINT sums over the normalized Gram cells with the
    direction down-scaled by ``ISO_VR_DIV`` (terms stay ~1e13 --
    bounded, documented); the two emitted floats are fixed-order
    combinations of those exact integers.

    Scale shape: identical to pca_top_component -- one corpus pass
    into the dim^2 sketch, iterations on 4096 rows; the report
    aggregates the sketch, never the corpus."""
    gn, v = _pca_power(spark, sf_dir, PCA_ITERS)
    vr = v.select("j", F.expr(f"v div {ISO_VR_DIV}").alias("vr"))
    qf = (
        gn.join(F.broadcast(vr.withColumnRenamed("j", "i")
                            .withColumnRenamed("vr", "vi")), "i")
        .join(F.broadcast(vr.withColumnRenamed("vr", "vj")), "j")
        .agg(
            F.sum(F.col("gn") * F.col("vi") * F.col("vj")).alias("num"),
        )
    )
    den = vr.agg(
        F.sum(F.col("vr") * F.col("vr")).alias("den"),
        F.count(F.lit(1)).cast("int").alias("n_dims"),
    )
    trace = gn.filter(F.col("i") == F.col("j")).agg(
        F.sum("gn").alias("trace_gn")
    )
    return (
        qf.crossJoin(F.broadcast(den))
        .crossJoin(F.broadcast(trace))
        .select(
            "n_dims",
            F.col("trace_gn").cast("long").alias("trace_gn"),
            (F.col("num").cast("double") / F.col("den").cast("double"))
            .alias("rayleigh"),
            (F.col("num").cast("double") / F.col("den").cast("double")
             / F.col("trace_gn").cast("double")).alias("isotropy"),
        )
    )


def _isotropy_oracle_sql(iters: int = PCA_ITERS) -> str:
    parts = _pca_cte_parts(iters)
    return f"""
        WITH {",".join(parts)},
        vr AS (SELECT j, CAST(v // {ISO_VR_DIV} AS BIGINT) AS vr
               FROM v{iters}),
        qf AS (
            SELECT CAST(sum(gn.gn * vi.vr * vj.vr) AS BIGINT) AS num
            FROM gn
            JOIN vr vi ON vi.j = gn.i
            JOIN vr vj ON vj.j = gn.j
        ),
        den AS (
            SELECT CAST(sum(vr * vr) AS BIGINT) AS den,
                   CAST(count(*) AS INTEGER) AS n_dims
            FROM vr
        ),
        tr AS (
            SELECT CAST(sum(gn) AS BIGINT) AS trace_gn
            FROM gn WHERE i = j
        )
        SELECT d.n_dims, t.trace_gn,
               CAST(q.num AS DOUBLE) / CAST(d.den AS DOUBLE) AS rayleigh,
               CAST(q.num AS DOUBLE) / CAST(d.den AS DOUBLE)
                   / CAST(t.trace_gn AS DOUBLE) AS isotropy
        FROM qf q CROSS JOIN den d CROSS JOIN tr t
    """


def embedding_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EMBEDDING DRIFT between two corpus snapshots -- the MLOps check
    run before swapping a re-embedded corpus (or a new encoder
    checkpoint) into serving: per dimension, the exact micro-unit mean
    of snapshot A vs snapshot B and the absolute mean shift. Snapshots
    here are the deterministic even/odd vec_id halves (standing in for
    build N vs build N+1); production passes two real builds.

    Exactness: coordinates quantize to integer micro-units
    (:func:`_quantized`'s bit-deterministic floor contract); per-dim
    means are TRUNCATING integer division of exact BIGINT sums
    (DuckDB ``//`` == Spark ``div``), so every reported unit is an
    integer both engines derive identically.

    Scale shape: one map-only quantize+posexplode over the corpus,
    ONE partial-aggregated shuffle keyed on (snapshot, dim) -- 2 x 64
    groups -- and a dim-keyed self-merge of the two snapshot rows; no
    corpus self-join, no window."""
    q = _quantized(spark, sf_dir)
    per = (
        q.select(
            (F.col("vec_id") % 2 == 0).alias("is_a"),
            F.posexplode("q").alias("dim", "v"),
        )
        .groupBy("is_a", "dim")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .select(
            "is_a", "dim", "n",
            F.expr("s div n").alias("mean_u"),
        )
    )
    a = per.filter(F.col("is_a")).select(
        "dim", F.col("n").alias("n_a"), F.col("mean_u").alias("mean_a_u")
    )
    b = per.filter(~F.col("is_a")).select(
        "dim", F.col("n").alias("n_b"), F.col("mean_u").alias("mean_b_u")
    )
    return a.join(b, "dim").select(
        F.col("dim").cast("int").alias("dim"),
        "n_a", "n_b", "mean_a_u", "mean_b_u",
        F.abs(F.col("mean_a_u") - F.col("mean_b_u")).alias("abs_shift_u"),
    )


def _drift_oracle_sql() -> str:
    return f"""
        WITH q AS (
            SELECT vec_id,
                   list_transform(CAST(embedding AS DOUBLE[]),
                       x -> CAST(floor(x * {KM_SCALE}.0 + 0.5)
                                 AS BIGINT)) AS q
            FROM embeddings WHERE embedding IS NOT NULL
        ),
        ex AS (
            SELECT vec_id % 2 = 0 AS is_a,
                   CAST(u.p.i - 1 AS INTEGER) AS dim,
                   u.p.v AS v
            FROM (
                SELECT vec_id,
                       list_transform(range(1, len(q) + 1),
                           i -> struct_pack(i := i, v := q[i])) AS ps
                FROM q
            ), unnest(ps) AS u(p)
        ),
        per AS (
            SELECT is_a, dim, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(v) AS BIGINT) // CAST(count(*) AS BIGINT)
                       AS mean_u
            FROM ex GROUP BY is_a, dim
        )
        SELECT a.dim AS dim, a.n AS n_a, b.n AS n_b,
               a.mean_u AS mean_a_u, b.mean_u AS mean_b_u,
               abs(a.mean_u - b.mean_u) AS abs_shift_u
        FROM (SELECT * FROM per WHERE is_a) a
        JOIN (SELECT * FROM per WHERE NOT is_a) b ON a.dim = b.dim
    """


KC_K = 8        # coreset size (selected representatives)
KC_PARTS = 16   # deterministic local groups for the two-level pass


def _kc_dist(v: str, c: str) -> str:
    """Exact integer squared distance as a DuckDB expression (lambdas
    may reference correlated columns but not subqueries, so centers
    always arrive as join columns)."""
    return (
        f"list_aggregate(list_transform(range(1, len({v}) + 1), "
        f"i -> ({v}[i] - {c}[i]) * ({v}[i] - {c}[i])), 'sum')"
    )


def _gonzalez_np(ids, Q, k):
    """Exact-integer Gonzalez selection over an in-memory block: seed
    with the lowest vec_id, then repeatedly take the point with the
    largest min-distance to the chosen set (ties -> lowest vec_id),
    stopping at ``k`` or exhaustion. Rows are sorted by vec_id first
    so numpy's first-occurrence ``argmax`` IS the (dist DESC, vec_id
    ASC) tie-break; all arithmetic is int64 on micro-unit coordinates
    (headroom: dim * (2e6)^2 ~ 5e14, five decades inside int64), so
    the selection is bit-identical to the unrolled-CTE DuckDB oracle.

    Returns (ids, vectors) of the selected centers in selection
    order."""
    import numpy as np

    n = len(ids)
    if n == 0:
        return [], []
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    Q = Q[order]
    md = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
    chosen = np.zeros(n, dtype=bool)
    sel = [0]
    chosen[0] = True
    cur = 0
    while len(sel) < min(k, n):
        diff = Q - Q[cur]
        md = np.minimum(md, (diff * diff).sum(axis=1))
        cand = np.where(chosen, np.int64(-1), md)
        cur = int(cand.argmax())
        sel.append(cur)
        chosen[cur] = True
    return ([int(ids[i]) for i in sel],
            [[int(x) for x in Q[i]] for i in sel])


def _two_level_centers(q: DataFrame, k: int):
    """TWO-LEVEL composable Gonzalez (the mergeable-coreset
    construction of Guha et al. / Indyk's streaming k-center): one
    grouped Arrow pass runs local Gonzalez inside each DETERMINISTIC
    group ``grp = vec_id % KC_PARTS`` (so the DuckDB oracle can replay
    the grouping -- a Spark partition id could not be replayed), the
    <= KC_PARTS * k local candidates collect to the driver, and the
    final Gonzalez runs over that bounded block in the same exact
    integer kernel. Every point is within the local covering radius of
    some candidate, so the composed selection stays in the Gonzalez
    2-approximation family (property-tested against the single-level
    radius in tests/test_properties.py).

    Scale shape: ONE corpus pass (a grp-keyed shuffle of (vec_id, q)
    pairs feeding the grouped kernel) for ANY k -- replacing the k
    driver-synchronized full-corpus scans of single-level Gonzalez --
    plus O(KC_PARTS * k * dim) driver work. The caller's assignment
    pass is the second and final corpus scan."""
    import numpy as np
    import pandas as pd

    def local(pdf):
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        Q = np.asarray(pdf["q"].tolist(), dtype=np.int64)
        sid, sq = _gonzalez_np(ids, Q, k)
        return pd.DataFrame({
            "vec_id": pd.Series(sid, dtype="int64"),
            "q": pd.Series(sq, dtype="object"),
        })

    cands = (
        q.withColumn("grp", F.col("vec_id") % KC_PARTS)
        .groupBy("grp")
        .applyInPandas(local, "vec_id long, q array<long>")
        .collect()
    )
    if not cands:
        return [], []
    ids = np.asarray([r.vec_id for r in cands], dtype=np.int64)
    Q = np.asarray([list(r.q) for r in cands], dtype=np.int64)
    return _gonzalez_np(ids, Q, k)


def coreset_kcenter_select(spark: SparkSession, sf_dir: str,
                           k: int = KC_K) -> DataFrame:
    """Greedy k-CENTER coreset selection (Gonzalez 1985; the
    max-min-diversity selection used by DeepCore/coreset data-pruning
    pipelines), computed with the TWO-LEVEL composable construction:
    local Gonzalez per deterministic group -> final Gonzalez over the
    pooled candidates -> one assignment pass. Emits the full
    ASSIGNMENT (every vector mapped to its nearest selected center
    with exact integer squared distance) -- the per-doc representative
    map a diversity-sampling / dedup-budget stage consumes; the
    selection itself is recoverable as the ``dist_u = 0`` self-rows.

    All arithmetic is exact: coordinates quantize once to integer
    micro-units (the shared k-means quantizer) and every distance is
    an int64 sum of squares, so selection argmaxes, assignment
    argmins, and tie-breaks (max dist then lowest vec_id; nearest
    center keeps the LOWEST selection rank on equal distance) are
    bit-identical to the unrolled grouped-CTE DuckDB oracle.

    Scale shape: exactly TWO corpus passes for ANY k (the round-8
    verdict's fix for the k driver-synchronized rounds of single-level
    Gonzalez): pass 1 is the grouped local-candidate kernel, pass 2 is
    the map-only broadcast-centers assignment; driver state is the
    bounded KC_PARTS * k candidate block. The corpus is never
    re-scanned as k grows."""
    if k < 1:
        raise ValueError(f"coreset_kcenter_select requires k >= 1, got {k}")
    q = _quantized(spark, sf_dir)
    center_ids, centers = _two_level_centers(q, k)
    if not center_ids:
        return q.select(
            "vec_id",
            F.lit(0).cast("int").alias("center_rank"),
            F.lit(0).cast("long").alias("center_vec_id"),
            F.lit(0).cast("long").alias("dist_u"),
        ).limit(0)
    id_arr = F.array(*[F.lit(int(i)) for i in center_ids])
    return _assign(q, centers).select(
        "vec_id",
        F.col("cluster").alias("center_rank"),
        F.element_at(id_arr, F.col("cluster") + 1).cast("long")
        .alias("center_vec_id"),
        "dist_u",
    )


def coreset_kcenter_append(spark: SparkSession, sf_dir: str,
                           k: int = KC_K) -> DataFrame:
    """INCREMENTAL face of the k-center coreset (the lsh_append /
    pq_append lifecycle pattern): new vectors are assigned to the
    EXISTING coreset without re-running selection, and each appended
    row is flagged when it lands OUTSIDE the base coverage radius --
    the signal that the frontier moved and a re-selection pass is due
    (the coreset maintenance loop's trigger). The base/append split is
    the deterministic id parity the incremental dedup face uses (even
    ids = archive the coreset was built on, odd ids = the new batch).

    Exactness: identical integer micro-unit distances as the base
    operator (two-level selection over the base half); the radius is
    the exact max assignment distance over the base corpus; the
    violation compare is BIGINT.

    Scale shape: selection is the two-level construction over the BASE
    corpus only (one grouped pass + one assignment pass for any k);
    the append path is ONE map-only Arrow assignment over the new
    batch plus a broadcast scalar radius -- new data never joins old
    data, the property that makes coreset maintenance viable on a
    growing corpus."""
    base = _quantized(spark, sf_dir).filter(F.col("vec_id") % 2 == 0)
    appended = _quantized(spark, sf_dir).filter(F.col("vec_id") % 2 == 1)
    center_ids, centers = _two_level_centers(base, k)
    if not center_ids:
        return appended.select(
            "vec_id",
            F.lit(0).cast("int").alias("center_rank"),
            F.lit(0).cast("long").alias("center_vec_id"),
            F.lit(0).cast("long").alias("dist_u"),
            F.lit(False).alias("exceeds_radius"),
        ).limit(0)
    radius = _assign(base, centers).agg(
        F.max("dist_u").alias("radius_u"))
    id_arr = F.array(*[F.lit(int(i)) for i in center_ids])
    return (
        _assign(appended, centers)
        .crossJoin(F.broadcast(radius))
        .select(
            "vec_id",
            F.col("cluster").alias("center_rank"),
            F.element_at(id_arr, F.col("cluster") + 1).cast("long")
            .alias("center_vec_id"),
            "dist_u",
            (F.col("dist_u") > F.col("radius_u")).alias("exceeds_radius"),
        )
    )


def _kcenter_ctes(k: int = KC_K, parts: int = KC_PARTS,
                  scale: int = KM_SCALE, where: str = "") -> str:
    """Unrolled TWO-LEVEL Gonzalez CTE chain mirroring
    :func:`_two_level_centers` exactly. Local stage: per-group chains
    run as ONE grouped step each (lc_t = per-grp argmax window over
    ld_{t-1}, ld_t = running min-dist via a grp-keyed join), so the
    unroll depth is k regardless of the group count. Global stage: the
    single-chain Gonzalez (the k-means oracle pattern) over the pooled
    ``cand`` block. Ends with ``centers(r, cid, cq)`` -- selection
    rank, center vec_id, center vector -- which the select/append
    oracles join/cross-join against. A center CTE that comes up empty
    (block smaller than k) yields NULL distances and leaves the
    running state unchanged, matching the Spark early-exhaustion.
    ``where`` narrows the selection corpus (the append face selects
    from the even-id base half); the corpus CTE ``q`` stays visible to
    the callers for the final assignment."""
    extra = f" AND {where}" if where else ""
    out = [f"""
        q AS MATERIALIZED (
            SELECT vec_id, vec_id % {parts} AS grp,
                   list_transform(CAST(embedding AS DOUBLE[]),
                       x -> CAST(floor(x * {scale}.0 + 0.5) AS BIGINT)) AS q
            FROM embeddings WHERE embedding IS NOT NULL{extra}
        ),
        lc1 AS MATERIALIZED (
            SELECT grp, vec_id, q FROM (
                SELECT grp, vec_id, q, row_number() OVER (
                    PARTITION BY grp ORDER BY vec_id) AS rn FROM q)
            WHERE rn = 1
        ),
        ld1 AS MATERIALIZED (
            SELECT q.grp, q.vec_id, q.q, {_kc_dist('q.q', 'c.q')} AS md
            FROM q JOIN lc1 c ON c.grp = q.grp
        )"""]
    for t in range(2, k + 1):
        prior = " UNION ALL ".join(
            f"SELECT vec_id FROM lc{j}" for j in range(1, t))
        out.append(f"""
        lc{t} AS MATERIALIZED (
            SELECT grp, vec_id, q FROM (
                SELECT grp, vec_id, q, row_number() OVER (
                    PARTITION BY grp ORDER BY md DESC, vec_id) AS rn
                FROM ld{t - 1}
                WHERE vec_id NOT IN ({prior}))
            WHERE rn = 1
        ),
        ld{t} AS MATERIALIZED (
            SELECT grp, vec_id, q,
                   CASE WHEN nd < md THEN nd ELSE md END AS md
            FROM (
                SELECT d.grp, d.vec_id, d.q, d.md,
                       {_kc_dist('d.q', 'c.q')} AS nd
                FROM ld{t - 1} d LEFT JOIN lc{t} c ON c.grp = d.grp
            )
        )""")
    cand = " UNION ALL ".join(
        f"SELECT vec_id, q FROM lc{j}" for j in range(1, k + 1))
    out.append(f"""
        cand AS MATERIALIZED ({cand}),
        gc1 AS MATERIALIZED (
            SELECT vec_id, q FROM cand ORDER BY vec_id LIMIT 1),
        gd1 AS MATERIALIZED (
            SELECT c.vec_id, c.q, {_kc_dist('c.q', 'g.q')} AS md
            FROM cand c LEFT JOIN gc1 g ON TRUE
        )""")
    for t in range(2, k + 1):
        prior = " UNION ALL ".join(
            f"SELECT vec_id FROM gc{j}" for j in range(1, t))
        out.append(f"""
        gc{t} AS MATERIALIZED (
            SELECT vec_id, q FROM gd{t - 1}
            WHERE vec_id NOT IN ({prior})
            ORDER BY md DESC, vec_id LIMIT 1
        ),
        gd{t} AS MATERIALIZED (
            SELECT vec_id, q,
                   CASE WHEN nd < md THEN nd ELSE md END AS md
            FROM (
                SELECT d.vec_id, d.q, d.md, {_kc_dist('d.q', 'c.q')} AS nd
                FROM gd{t - 1} d LEFT JOIN gc{t} c ON TRUE
            )
        )""")
    ranks = " UNION ALL ".join(
        f"SELECT {j - 1} AS r, vec_id AS cid, q AS cq FROM gc{j}"
        for j in range(1, k + 1))
    out.append(f"""
        centers AS MATERIALIZED ({ranks})""")
    return ",".join(out)


def _kc_scored(src: str) -> str:
    """Argmin-assignment CTE body: ``src`` rows (vec_id, q) cross-join
    the k centers, (dist ASC, rank ASC) window pick -- the SQL twin of
    the numpy first-occurrence argmin in :func:`_assign`."""
    d = _kc_dist(f"{src}.q", "c.cq")
    return f"""
            SELECT {src}.vec_id, c.r, c.cid, {d} AS d,
                   row_number() OVER (PARTITION BY {src}.vec_id
                       ORDER BY {d} ASC, c.r ASC) AS pick
            FROM {src} CROSS JOIN centers c"""


def _kcenter_oracle_sql(k: int = KC_K, scale: int = KM_SCALE) -> str:
    return f"""
        WITH {_kcenter_ctes(k, KC_PARTS, scale)},
        scored AS ({_kc_scored('q')})
        SELECT vec_id,
               CAST(r AS INTEGER) AS center_rank,
               CAST(cid AS BIGINT) AS center_vec_id,
               CAST(d AS BIGINT) AS dist_u
        FROM scored WHERE pick = 1
    """


def _kcenter_append_oracle_sql(k: int = KC_K,
                               scale: int = KM_SCALE) -> str:
    """Two-level selection over the even-id base half (``q`` in the
    chain IS the base corpus), exact radius from the base assignment,
    then the appended (odd) rows assign by a k-row cross join +
    (dist, rank) argmin window and compare against the radius."""
    chain = _kcenter_ctes(k, KC_PARTS, scale, where="vec_id % 2 = 0")
    return f"""
        WITH {chain},
        base_scored AS ({_kc_scored('q')}),
        radius AS (
            SELECT CAST(max(d) AS BIGINT) AS radius_u
            FROM base_scored WHERE pick = 1
        ),
        app AS (
            SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
                       x -> CAST(floor(x * {scale}.0 + 0.5) AS BIGINT)) AS q
            FROM embeddings
            WHERE embedding IS NOT NULL AND vec_id % 2 = 1
        ),
        scored AS ({_kc_scored('app')})
        SELECT s.vec_id,
               CAST(s.r AS INTEGER) AS center_rank,
               CAST(s.cid AS BIGINT) AS center_vec_id,
               CAST(s.d AS BIGINT) AS dist_u,
               s.d > radius.radius_u AS exceeds_radius
        FROM scored s CROSS JOIN radius
        WHERE s.pick = 1
    """


AGREE_SCALE = 1_000_000  # purity/ARI emitted in 1e-6 units


def cluster_label_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLUSTERING-vs-LABELS agreement scorecard: purity and the
    ADJUSTED RAND INDEX between the k-means partition and the stored
    ``label`` column -- the external-validity number an embedding
    pipeline watches when deciding whether unsupervised structure
    tracks the supervised signal (and the chance-corrected one: ARI is
    0 in expectation for random partitions, unlike purity which
    inflates with cluster count). NULL-label vectors cluster normally
    but are excluded from the contingency on both engines.

    All arithmetic is exact pair-counting combinatorics: with
    contingency counts ``a_ij``, row/col sums ``r_i``/``c_j`` and
    ``C(x,2) = x*(x-1) div 2``,

        ARI = 2*(I*N2 - R*C) / ((R+C)*N2 - 2*R*C),

    where I, R, C, N2 are the pair-count sums -- a pure integer
    rational, emitted once-divided in 1e-6 units. The products run in
    DECIMAL(38,0) (Spark) / HUGEINT (DuckDB): headroom ~1.5e8 labeled
    vectors before 38 digits overflow (the documented swap past that
    is sampling the contingency, which leaves a_ij exact at any n).
    A zero denominator (both partitions trivial) emits ARI = 1, the
    convention for exact agreement; an empty labeled set emits zeros.

    Scale shape: the assignment is the k-means operator's output
    (localCheckpoint: three small aggregates consume it); everything
    after the one (cluster, label) contingency shuffle runs on
    K x L rows."""
    assign = _kmeans_assignment(spark, sf_dir).select("vec_id", "cluster")
    lab = table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull() & F.col("label").isNotNull()
    ).select("vec_id", "label")
    cont = (
        assign.join(lab, "vec_id")
        .groupBy("cluster", "label")
        .agg(F.count(F.lit(1)).cast("long").alias("a"))
    )
    cells = cont.agg(
        F.sum("a").cast("long").alias("n"),
        F.sum(F.expr("a * (a - 1) div 2")).cast("long").alias("i2"),
    )
    rows_ = (
        cont.groupBy("cluster")
        .agg(F.sum("a").alias("r"), F.max("a").alias("mx"))
        .agg(
            F.sum(F.expr("r * (r - 1) div 2")).cast("long").alias("rr"),
            F.sum("mx").cast("long").alias("pur"),
            F.count(F.lit(1)).cast("int").alias("n_clusters"),
        )
    )
    cols_ = (
        cont.groupBy("label").agg(F.sum("a").alias("c"))
        .agg(
            F.sum(F.expr("c * (c - 1) div 2")).cast("long").alias("cc"),
            F.count(F.lit(1)).cast("int").alias("n_labels"),
        )
    )
    d = "CAST({} AS DECIMAL(38,0))"
    n2 = "(CAST(n AS DECIMAL(38,0)) * (n - 1) div 2)"
    num = f"2 * ({d.format('i2')} * {n2} - {d.format('rr')} * cc)"
    den = f"({d.format('rr')} + cc) * {n2} - 2 * {d.format('rr')} * cc"
    return (
        cells.crossJoin(F.broadcast(rows_)).crossJoin(F.broadcast(cols_))
        .select(
            F.coalesce("n", F.lit(0)).alias("n"),
            F.coalesce("n_clusters", F.lit(0)).alias("n_clusters"),
            F.coalesce("n_labels", F.lit(0)).alias("n_labels"),
            F.expr(
                f"CASE WHEN n IS NULL OR n = 0 THEN 0 "
                f"ELSE pur * {AGREE_SCALE} div n END"
            ).cast("long").alias("purity_u"),
            F.expr(
                f"CASE WHEN n IS NULL OR n < 2 THEN 0 "
                f"WHEN {den} = 0 THEN {AGREE_SCALE} "
                f"ELSE ({num}) * {AGREE_SCALE} div ({den}) END"
            ).cast("long").alias("ari_u"),
        )
    )


def _agree_oracle_sql() -> str:
    n2 = "(CAST(n AS HUGEINT) * (n - 1) // 2)"
    num = f"2 * (CAST(i2 AS HUGEINT) * {n2} - CAST(rr AS HUGEINT) * cc)"
    den = (f"(CAST(rr AS HUGEINT) + cc) * {n2} "
           f"- 2 * CAST(rr AS HUGEINT) * cc")
    return f"""
        WITH {_km_ctes()},
        lab AS (
            SELECT vec_id, label FROM embeddings
            WHERE embedding IS NOT NULL AND label IS NOT NULL
        ),
        j AS (
            SELECT a.cl AS cluster, l.label
            FROM a{KM_ITERS} a JOIN lab l USING (vec_id)
        ),
        cont AS (
            SELECT cluster, label, CAST(count(*) AS BIGINT) AS a
            FROM j GROUP BY cluster, label
        ),
        cells AS (
            SELECT CAST(sum(a) AS BIGINT) AS n,
                   CAST(sum(a * (a - 1) // 2) AS BIGINT) AS i2
            FROM cont
        ),
        r AS (
            SELECT CAST(sum(rr0) AS BIGINT) AS rr,
                   CAST(sum(mx) AS BIGINT) AS pur,
                   CAST(count(*) AS INTEGER) AS n_clusters
            FROM (SELECT sum(a) * (sum(a) - 1) // 2 AS rr0,
                         max(a) AS mx
                  FROM cont GROUP BY cluster)
        ),
        c AS (
            SELECT CAST(sum(cc0) AS BIGINT) AS cc,
                   CAST(count(*) AS INTEGER) AS n_labels
            FROM (SELECT sum(a) * (sum(a) - 1) // 2 AS cc0
                  FROM cont GROUP BY label)
        )
        SELECT coalesce(n, 0) AS n,
               coalesce(n_clusters, 0) AS n_clusters,
               coalesce(n_labels, 0) AS n_labels,
               CAST(CASE WHEN n IS NULL OR n = 0 THEN 0
                    ELSE pur * {AGREE_SCALE} // n END AS BIGINT)
                   AS purity_u,
               CAST(CASE WHEN n IS NULL OR n < 2 THEN 0
                    WHEN {den} = 0 THEN {AGREE_SCALE}
                    ELSE ({num}) * {AGREE_SCALE} // ({den}) END AS BIGINT)
                   AS ari_u
        FROM cells CROSS JOIN r CROSS JOIN c
    """


QUERIES = {
    "cluster_label_agreement": cluster_label_agreement,
    "coreset_kcenter_select": coreset_kcenter_select,
    "coreset_kcenter_append": coreset_kcenter_append,
    "embedding_drift_report": embedding_drift_report,
    "embedding_standardize": embedding_standardize,
    "embed_kmeans": embed_kmeans,
    "embed_random_projection": embed_random_projection,
    "cluster_cartography": cluster_cartography,
    "pca_top_component": pca_top_component,
    "embedding_isotropy_report": embedding_isotropy_report,
}

ORACLE = {
    "cluster_label_agreement": _agree_oracle_sql(),
    "coreset_kcenter_select": _kcenter_oracle_sql(),
    "coreset_kcenter_append": _kcenter_append_oracle_sql(),
    "embedding_drift_report": _drift_oracle_sql(),
    "pca_top_component": _pca_oracle_sql(),
    "embedding_isotropy_report": _isotropy_oracle_sql(),
    "embedding_standardize": _standardize_oracle_sql(),
    "embed_kmeans": _km_oracle_sql(),
    "embed_random_projection": _rp_oracle_sql(),
    "cluster_cartography": _carto_oracle_sql(),
}
