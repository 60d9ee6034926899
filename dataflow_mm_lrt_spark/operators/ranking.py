"""Score / predicate filters and top-k selection (SURVEY.md §2.4).

Shapes taken from the reference:
* ScoreFilter (score_filter.py:37-84): mark ``select`` bool, keep rows.
* CLIPScoreFilter / KNNSimilarityFilter keep_ratio: top fraction by
  score (clipscore_filter.py:16, knn_similarity_filter.py:143-197).
* DataTailorFilter top-n (datatailor_filter.py:370-372).

Scale notes: percent_rank over a single global ordering is a full sort —
for the keep-ratio shape we use it per-partition-key when a key exists
or accept one sort-merge pass otherwise (same cost class as the
reference's global argsort, but distributed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def score_filter(
    df: DataFrame,
    score_col: str = "score",
    min_score: float | None = None,
    max_score: float | None = None,
    select_col: str = "select",
) -> DataFrame:
    """ScoreFilter: adds a boolean mark, does NOT drop rows
    (score_filter.py:65-74)."""
    pred = F.lit(True)
    if min_score is not None:
        pred = pred & (F.col(score_col) >= min_score)
    if max_score is not None:
        pred = pred & (F.col(score_col) <= max_score)
    return df.withColumn(select_col, pred)


def keep_top_fraction(
    df: DataFrame,
    score_col: str,
    keep_ratio: float = 0.8,
    ascending: bool = False,
    tie_col: str | None = None,
) -> DataFrame:
    """Keep the best ``keep_ratio`` fraction by score (strictly:
    percent_rank ≤ keep_ratio under a deterministic total order)."""
    order = [F.col(score_col).asc() if ascending else F.col(score_col).desc()]
    if tie_col:
        order.append(F.col(tie_col).asc())
    w = Window.orderBy(*order)
    return (
        df.withColumn("_pr", F.percent_rank().over(w))
        .filter(F.col("_pr") <= keep_ratio)
        .drop("_pr")
    )


def top_k(
    df: DataFrame,
    score_col: str,
    k: int,
    key_col: str | None = None,
    ascending: bool = False,
    tie_col: str | None = None,
) -> DataFrame:
    """Top-k overall or per key (row_number ≤ k). With a key this is one
    hash shuffle; without, Spark's TakeOrdered handles the global case."""
    order = [F.col(score_col).asc() if ascending else F.col(score_col).desc()]
    if tie_col:
        order.append(F.col(tie_col).asc())
    if key_col is None:
        return df.orderBy(*order).limit(k)
    w = Window.partitionBy(key_col).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
