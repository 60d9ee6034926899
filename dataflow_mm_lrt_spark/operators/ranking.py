"""Score / predicate filters and top-k selection (SURVEY.md §2.4).

Shapes taken from the reference:
* ScoreFilter (score_filter.py:37-84): mark ``select`` bool, keep rows.
* CLIPScoreFilter / KNNSimilarityFilter keep_ratio: top fraction by
  score (clipscore_filter.py:16, knn_similarity_filter.py:143-197).
* DataTailorFilter top-n (datatailor_filter.py:370-372).

Scale notes: the keep-ratio shape is an exact distributed selection
(quantile bands + boundary-band ranking) — no row ever passes through a
single-task global sort; see ``keep_top_fraction``.
"""

from __future__ import annotations

import math

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
    n_buckets: int = 256,
    persist: bool = True,
) -> DataFrame:
    """Keep the best ``keep_ratio`` fraction by score — value-identical to
    ``percent_rank ≤ keep_ratio`` under the (score, tie) order, but
    computed as an exact distributed selection instead of a global
    single-task window sort (the round-1 scale-killer):

    1. ``approxQuantile`` splits the score range into ~``n_buckets``
       bands; one tiny aggregate gives exact per-band counts, locating
       the band that contains global rank k = ⌊ratio·(n−1)⌋+1.
    2. Bands strictly better than the boundary band are kept wholesale
       (a pushed-down filter, no sort); only the boundary band
       (~n/n_buckets rows) is ranked exactly in one keyed window task.

    Tie semantics match percent_rank: without ``tie_col`` ties share a
    rank and are kept or dropped together. NULL scores are excluded from
    the n/k accounting AND from the output (a row with no score cannot
    be "in the top fraction by score") — explicit semantics, not the
    silent band-0 placement the earlier band-union form gave them.
    Degenerate distributions (all scores equal) collapse to one band —
    the same cost class as the global sort they'd need anyway.

    The selection makes several passes over ``df`` (count, quantile,
    band counts, boundary rank), so it is persisted MEMORY_AND_DISK for
    their duration and unpersisted before returning (``persist=False``
    if the caller manages caching) — the returned plan is a single
    filter over ``df``, so the caller's action re-reads it once.
    """
    if persist:
        from pyspark import StorageLevel

        df = df.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        nn = df.filter(F.col(score_col).isNotNull())
        n = nn.count()
        if n <= 1:
            return nn
        k = int(math.floor(keep_ratio * (n - 1) + 1e-9)) + 1
        if k >= n:
            return nn

        probs = [i / n_buckets for i in range(1, n_buckets)]
        bounds = sorted(set(nn.stat.approxQuantile(score_col, probs, 0.001)))
        if bounds:
            arr = F.array(*[F.lit(float(b)) for b in bounds])
            # band id = #boundaries strictly below the score: equal scores
            # always land in the same band, so ties never straddle bands
            band = F.size(
                F.filter(arr, lambda b: b < F.col(score_col).cast("double"))
            )
        else:
            band = F.lit(0)
        banded = nn.withColumn("_kb", band)

        counts = {r["_kb"]: r["cnt"] for r in
                  banded.groupBy("_kb").agg(F.count("*").alias("cnt")).collect()}
        order_ids = sorted(counts, reverse=not ascending)
        cum = 0
        boundary_band, rank_before = order_ids[-1], 0
        for b in order_ids:
            if cum + counts[b] >= k:
                boundary_band, rank_before = b, cum
                break
            cum += counts[b]

        # rank ONLY the boundary band (~n/n_buckets rows) in one keyed
        # window task, but just to fetch the k-th row's values: the
        # returned plan is then a pure filter on (score, tie) — no
        # union, no window, one reference to df
        order = [F.col(score_col).asc() if ascending else F.col(score_col).desc()]
        if tie_col:
            order.append(F.col(tie_col).asc())
        w = Window.partitionBy("_kb").orderBy(*order)
        kth = (
            banded.filter(F.col("_kb") == boundary_band)
            .withColumn("_kr", F.row_number().over(w))
            .filter(F.col("_kr") == k - rank_before)
            .select(score_col, *( [tie_col] if tie_col else [] ))
            .collect()
        )[0]
        s_star = kth[score_col]
        sc = F.col(score_col)
        if ascending:
            pred = sc < F.lit(s_star)
        else:
            pred = sc > F.lit(s_star)
        if tie_col:
            # row_number semantics: ties at s* split by the tie column
            t_star = kth[tie_col]
            pred = pred | ((sc == F.lit(s_star)) & (F.col(tie_col) <= F.lit(t_star)))
        else:
            # rank semantics: ties at s* are kept or dropped together,
            # and the k-th row's score being s* implies they are kept
            pred = pred | (sc == F.lit(s_star))
        return nn.filter(pred)
    finally:
        if persist:
            df.unpersist()


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
