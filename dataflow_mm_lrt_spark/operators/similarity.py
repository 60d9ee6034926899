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
