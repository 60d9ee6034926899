"""Similarity search over embedding columns (array<float>).

The reference's embedding ops (ImageDeduplicateFilter all-pairs cosine,
image_deduplication_filter.py:122-157; KNNSimilarityFilter,
knn_similarity_filter.py:143-197) are re-expressed as:

* ``knn_brute_cosine`` — exact top-k neighbors for a query subset via a
  broadcast join (queries are small → broadcast; corpus side streams,
  no shuffle of the big side) with the dot product in Catalyst
  higher-order functions — no Python, no NxN materialization beyond the
  (queries × corpus) product.
* ``ann_ivf_cosine`` — the scale path: an IVF-style restriction where a
  coarse-quantizer cell id per vector (here: the precomputed ``label``
  column stands in for the assigned centroid) turns the cross product
  into a per-cell equi-join, shuffling on cell id.

At 100 TB the brute path is only for query batches (broadcast ≤ 10s of
MB); the IVF path scales with cells × cell size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def knn_brute_cosine(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector against the
    corpus (self-matches excluded). Output: (query_id, neighbor_id,
    cosine, rank).

    Kernel: broadcast query matrix + per-batch BLAS GEMM with a running
    per-partition top-k (gemm.brute_topk) — the corpus never shuffles
    and at most n_queries×k rows leave each partition; the final window
    merges ≤ partitions×nq×k rows. Round 2 measured this kernel ~10×
    faster than the interpreted zip_with/aggregate pair scoring."""
    from . import gemm

    scored = gemm.brute_topk(embeddings, queries, k, id_col=id_col)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def knn_uniqueness_filter(
    embeddings: DataFrame,
    k: int = 5,
    keep_ratio: float = 0.5,
    id_col: str = "vec_id",
    cell_col: str = "label",
) -> DataFrame:
    """KNNSimilarityFilter semantics (knn_similarity_filter.py:143-197):
    score every row by its mean cosine to its k nearest neighbors, keep
    the most-unique (lowest-scoring) ``keep_ratio`` fraction.

    Scale path: neighbors restricted to the coarse cell (IVF layout) so
    scoring is a per-cell equi-join; the keep-fraction is the exact
    distributed selection from ``ranking.keep_top_fraction`` (quantile
    bands + boundary ranking — no global single-task sort).
    Output: (id_col, knn_score)."""
    from . import gemm
    from .ranking import keep_top_fraction

    knn = gemm.cell_knn_scores(
        embeddings, k, id_col=id_col, cell_col=cell_col
    )
    kept = keep_top_fraction(
        knn, "knn_score", keep_ratio=keep_ratio, ascending=True, tie_col=id_col
    )
    return kept.select(id_col, "knn_score")


def _dlit(v: float) -> str:
    """A float as a dialect-neutral SQL DOUBLE literal (scientific
    notation parses as double in both Spark and DuckDB; bare decimals
    would be DECIMAL in both). ``.17e`` round-trips IEEE doubles
    exactly, so inlined centroids/planes carry zero quantization error
    — a prerequisite for the dual-dialect kmeans oracle."""
    return f"{float(v):.17e}"


def lsh_hyperplanes(n_planes: int = 4, dim: int = 64, seed: int = 42):
    """Deterministic random hyperplanes (seeded, rounded so the SQL
    literals are bit-identical across engines)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return [[round(float(v), 4) for v in rng.normal(size=dim)] for _ in range(n_planes)]


def lsh_cell_sql(dialect: str, emb_col: str, planes: list[list[float]]) -> str:
    """Random-hyperplane LSH cell id (the sign pattern of ``n_planes``
    dot products) as a dual-dialect SQL expression. The dot is rounded
    to 6 dp before the sign test so both engines quantize identically."""
    bits = []
    for j, w in enumerate(planes):
        if dialect == "spark":
            arr = "array(" + ", ".join(_dlit(v) for v in w) + ")"
            dot = (
                f"aggregate(zip_with({emb_col}, {arr}, (x, w) -> cast(x as double) * w), "
                f"0d, (acc, v) -> acc + v)"
            )
            bits.append(f"IF(round({dot}, 6) >= 0, {1 << j}, 0)")
        else:
            arr = "[" + ", ".join(_dlit(v) for v in w) + "]"
            dot = (
                f"list_sum(list_transform(list_zip({emb_col}, {arr}), "
                f"p -> p[1]::DOUBLE * p[2]))"
            )
            bits.append(f"CASE WHEN round({dot}, 6) >= 0 THEN {1 << j} ELSE 0 END")
    return "cast((" + " + ".join(bits) + ") as int)"


def lsh_cells(
    df: DataFrame,
    n_planes: int = 4,
    dim: int = 64,
    seed: int = 42,
    emb_col: str = "embedding",
    cell_col: str = "cell",
) -> DataFrame:
    """Coarse-quantizer cells from raw vectors via sign-LSH — the
    centroid-free cell assignment that lets ``ann_ivf_cosine`` /
    ``embedding_cosine_near_dup`` run without a precomputed label
    column. 2^n_planes cells; entirely Catalyst (no Python, no shuffle —
    a projection)."""
    planes = lsh_hyperplanes(n_planes, dim, seed)
    return df.withColumn(cell_col, F.expr(lsh_cell_sql("spark", emb_col, planes)))


def lsh_probe_sql(
    dialect: str, emb_col: str, planes: list[list[float]], nprobe: int
) -> str:
    """Multi-probe LSH search list as a dual-dialect SQL expression:
    the base cell followed by the ``nprobe - 1`` single-bit
    perturbations with the smallest |margin| (the query's distance to
    the flipped hyperplane — the standard multi-probe ordering, Lv et
    al. VLDB'07). Margins are rounded to 6 dp before |·| and ties break
    on plane index, so both engines pick identical probe lists."""
    if not 1 <= nprobe <= len(planes) + 1:
        raise ValueError(
            f"nprobe must be in [1, n_planes + 1] = [1, {len(planes) + 1}] "
            f"for single-bit perturbations; got {nprobe}"
        )
    cell = lsh_cell_sql(dialect, emb_col, planes)
    margs = []
    for j, w in enumerate(planes):
        if dialect == "spark":
            arr = "array(" + ", ".join(_dlit(v) for v in w) + ")"
            dot = (
                f"aggregate(zip_with({emb_col}, {arr}, (x, w) -> cast(x as double) * w), "
                f"0d, (acc, v) -> acc + v)"
            )
            margs.append(f"struct(abs(round({dot}, 6)) as m, {j} as i)")
        else:
            arr = "[" + ", ".join(_dlit(v) for v in w) + "]"
            dot = (
                f"list_sum(list_transform(list_zip({emb_col}, {arr}), "
                f"p -> p[1]::DOUBLE * p[2]))"
            )
            margs.append(f"{{'m': abs(round({dot}, 6)), 'i': {j}}}")
    if dialect == "spark":
        sorted_m = f"array_sort(array({', '.join(margs)}))"
        flips = (
            f"transform(slice({sorted_m}, 1, {nprobe - 1}), "
            f"s -> cast(({cell}) ^ shiftleft(1, s.i) as int))"
        )
        return f"concat(array({cell}), {flips})"
    sorted_m = f"list_sort([{', '.join(margs)}])"
    flips = (
        f"list_transform(list_slice({sorted_m}, 1, {nprobe - 1}), "
        f"s -> CAST(xor({cell}, 1 << s['i']) AS INT))"
    )
    return f"list_prepend(CAST({cell} AS INT), {flips})"


def lsh_probe_cells(
    df: DataFrame,
    n_planes: int = 4,
    dim: int = 64,
    seed: int = 42,
    nprobe: int = 4,
    emb_col: str = "embedding",
    out_col: str = "probe_cells",
) -> DataFrame:
    """The query-side multi-probe search list for sign-LSH cells (see
    ``lsh_probe_sql``). Pure projection — no shuffle, no Python."""
    planes = lsh_hyperplanes(n_planes, dim, seed)
    return df.withColumn(
        out_col, F.expr(lsh_probe_sql("spark", emb_col, planes, nprobe))
    )


def ann_lsh_multiprobe(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    n_planes: int = 4,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Centroid-free multi-probe ANN: corpus bucketed once by sign-LSH
    cell; each query searches its base cell plus the ``nprobe - 1``
    lowest-|margin| bit flips (round-2's measured single-probe recall of
    0.183 is the gap this closes). Each corpus row lives in exactly one
    cell, so exploded probes create no duplicate pairs; the global
    rank-k window inside ``ann_ivf_cosine`` merges the probe cells."""
    c = lsh_cells(
        embeddings.select(id_col, emb_col), n_planes, dim, seed, emb_col
    )
    q = (
        lsh_probe_cells(
            queries.select(id_col, emb_col), n_planes, dim, seed, nprobe, emb_col
        )
        .select(id_col, emb_col, F.explode("probe_cells").alias("cell"))
    )
    return ann_ivf_cosine(c, q, k=k, id_col=id_col, cell_col="cell")


def _centroid_dist_structs(cents: list[list[float]], emb_col: str) -> str:
    """array(struct(squared_dist, cell_id), ...) over broadcast centroid
    literals — the shared argmin/top-probes building block."""
    structs = []
    for j, c in enumerate(cents):
        arr = "array(" + ", ".join(_dlit(v) for v in c) + ")"
        dist = (
            f"aggregate(zip_with({emb_col}, {arr}, "
            f"(x, c) -> (cast(x as double) - c) * (cast(x as double) - c)), "
            f"0d, (acc, v) -> acc + v)"
        )
        structs.append(f"struct({dist} as d, {j} as i)")
    return f"array({', '.join(structs)})"


def assign_cells(
    df: DataFrame,
    centroids: list[list[float]],
    emb_col: str = "embedding",
    cell_col: str = "cell",
) -> DataFrame:
    """Nearest-centroid cell id per row (argmin squared distance; ties →
    lower cell id). Pure projection — no shuffle, no Python."""
    expr = f"array_min({_centroid_dist_structs(centroids, emb_col)}).i"
    return df.withColumn(cell_col, F.expr(expr))


def probe_cells(
    df: DataFrame,
    centroids: list[list[float]],
    nprobe: int,
    emb_col: str = "embedding",
    out_col: str = "probe_cells",
) -> DataFrame:
    """The ``nprobe`` nearest cell ids per row (multi-probe IVF search
    list), as an array column."""
    arr = _centroid_dist_structs(centroids, emb_col)
    expr = f"transform(slice(array_sort({arr}), 1, {nprobe}), s -> s.i)"
    return df.withColumn(out_col, F.expr(expr))


def kmeans_fit(
    df: DataFrame,
    k: int = 10,
    n_iters: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> list[list[float]]:
    """K-means-lite coarse quantizer (IVF 'training'): deterministic
    init (the vectors of the k smallest ids), ``n_iters`` Lloyd steps.

    Per step only k×dim centroid floats move through the driver (the
    same contract as MLlib's KMeans aggregation); every row-level pass —
    argmin assignment and per-cell mean — is a Catalyst expression over
    broadcast centroid literals, so the data itself never collects.
    Empty cells keep their previous centroid. Returns the centroids.
    """
    base = df.select(id_col, emb_col).persist()
    try:
        init = base.orderBy(id_col).limit(k).collect()
        if not init:
            raise ValueError("kmeans_fit: input has no rows")
        k = min(k, len(init))  # fewer rows than k → one cell per row
        centroids = [[float(v) for v in r[emb_col]] for r in init[:k]]

        for _ in range(n_iters):
            assigned = assign_cells(base, centroids, emb_col)
            rows = (
                assigned.select("cell", F.posexplode(emb_col).alias("pos", "v"))
                .groupBy("cell", "pos")
                .agg(F.avg(F.col("v").cast("double")).alias("m"))
                .collect()
            )
            new = {c: list(cent) for c, cent in enumerate(centroids)}
            for r in rows:
                new[r["cell"]][r["pos"]] = float(r["m"])
            centroids = [new[c] for c in range(k)]
        return centroids
    finally:
        base.unpersist()


def kmeans_assign(
    df: DataFrame,
    k: int = 10,
    n_iters: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    cell_col: str = "cell",
) -> DataFrame:
    """fit + assign in one call (see ``kmeans_fit``). Output: ``df`` +
    ``cell_col``."""
    centroids = kmeans_fit(df, k, n_iters, id_col, emb_col)
    return assign_cells(df, centroids, emb_col, cell_col)


def ann_ivf_multiprobe(
    embeddings: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 5,
    nprobe: int = 3,
    id_col: str = "vec_id",
) -> DataFrame:
    """Multi-probe IVF ANN: the corpus is bucketed once by nearest
    centroid; each query searches its ``nprobe`` nearest cells (explode →
    equi-join on cell — candidate set is nprobe/k of the corpus, and the
    recall/cost trade-off is the knob, exactly the IVF design). Same
    output shape as the brute path."""
    from . import gemm

    c = assign_cells(
        embeddings.select(id_col, "embedding"), centroids
    )
    q = (
        probe_cells(queries.select(id_col, "embedding"), centroids, nprobe)
        .select(id_col, "embedding", F.explode("probe_cells").alias("cell"))
    )
    # per-cell top-k, then ann_ivf_cosine's global window merges a
    # query's probe cells (each corpus row lives in exactly one cell, so
    # no duplicate pairs arise)
    return ann_ivf_cosine(c, q, k=k, id_col=id_col, cell_col="cell")


def ann_ivf_cosine(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    cell_col: str = "label",
) -> DataFrame:
    """IVF-restricted ANN: candidates limited to the query's coarse cell.
    Regime-adaptive (both GEMM kernels, gemm.py): a query batch within
    the broadcast gate ships as a per-cell broadcast matrix and the
    corpus streams map-side (zero shuffles); a larger query set falls
    back to the cogroup-on-cell path (one co-partitioning shuffle per
    side, never a cross product). Same output shape as the brute path;
    recall < 1 by design."""
    from . import gemm

    probe = (
        queries.select(id_col, "embedding", cell_col)
        .limit(gemm.MAX_BROADCAST_QUERIES + 1)
        .toPandas()
    )
    if len(probe) <= gemm.MAX_BROADCAST_QUERIES:
        scored = gemm.broadcast_topk(
            embeddings, queries, k, id_col=id_col,
            cell_col=cell_col, _qpdf=probe,
        )
    else:
        scored = gemm.cell_topk(
            embeddings, queries, k, id_col=id_col, cell_col=cell_col
        )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
