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
from pyspark.sql.functions import broadcast

COSINE_EXPR = (
    "round(aggregate(zip_with(q.embedding, c.embedding, (x, y) -> cast(x as double) * cast(y as double)), "
    "0d, (acc, v) -> acc + v) / "
    "(sqrt(aggregate(q.embedding, 0d, (acc, v) -> acc + cast(v as double) * cast(v as double))) * "
    "sqrt(aggregate(c.embedding, 0d, (acc, v) -> acc + cast(v as double) * cast(v as double)))), 6)"
)


def knn_brute_cosine(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector against the
    corpus (self-matches excluded). Output: (query_id, neighbor_id,
    cosine, rank)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col("embedding")
    ).alias("q")
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col("embedding")
    ).alias("c")
    scored = (
        broadcast(q)
        .join(c, F.col("q.query_id") != F.col("c.neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.expr(COSINE_EXPR).alias("cosine"),
        )
    )
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
    from .ranking import keep_top_fraction

    l = embeddings.select(
        F.col(id_col).alias("id_a"), F.col(cell_col).alias("cell"), "embedding"
    ).alias("q")
    r = embeddings.select(
        F.col(id_col).alias("id_b"), F.col(cell_col).alias("cell"), "embedding"
    ).alias("c")
    scored = (
        l.join(r, (F.col("q.cell") == F.col("c.cell"))
               & (F.col("q.id_a") != F.col("c.id_b")))
        .select(
            "id_a",
            "id_b",
            F.expr(COSINE_EXPR).alias("cosine"),
        )
    )
    w = Window.partitionBy("id_a").orderBy(
        F.col("cosine").desc(), F.col("id_b").asc()
    )
    knn = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .groupBy("id_a")
        .agg(F.round(F.avg("cosine"), 6).alias("knn_score"))
    )
    kept = keep_top_fraction(
        knn, "knn_score", keep_ratio=keep_ratio, ascending=True, tie_col="id_a"
    )
    return kept.select(F.col("id_a").alias(id_col), "knn_score")


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
    init = base.orderBy(id_col).limit(k).collect()
    centroids = [[float(v) for v in r[emb_col]] for r in init]

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
    c = assign_cells(
        embeddings.select(F.col(id_col).alias("neighbor_id"), "embedding"),
        centroids,
    ).alias("c")
    q = (
        probe_cells(
            queries.select(F.col(id_col).alias("query_id"), "embedding"),
            centroids,
            nprobe,
        )
        .select("query_id", "embedding", F.explode("probe_cells").alias("cell"))
        .alias("q")
    )
    scored = (
        q.join(c, (F.col("q.cell") == F.col("c.cell"))
               & (F.col("q.query_id") != F.col("c.neighbor_id")))
        .select("query_id", "neighbor_id", F.expr(COSINE_EXPR).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ann_ivf_cosine(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    cell_col: str = "label",
) -> DataFrame:
    """IVF-restricted ANN: candidates limited to the query's coarse cell
    (equi-join on cell id → co-partitioned, no cross product). Same
    output shape as the brute path; recall < 1 by design."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(cell_col).alias("cell"),
        "embedding",
    ).alias("q")
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(cell_col).alias("cell"),
        "embedding",
    ).alias("c")
    scored = (
        q.join(c, (F.col("q.cell") == F.col("c.cell"))
               & (F.col("q.query_id") != F.col("c.neighbor_id")))
        .select("query_id", "neighbor_id", F.expr(COSINE_EXPR).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
