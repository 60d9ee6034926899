"""Vectorized cosine-scoring kernels for the ANN / embedding-dedup family.

Round-2 measured the interpreted higher-order-lambda pair scoring
(``zip_with``/``aggregate``) at ~10× slower than a NumPy GEMM over
Arrow batches (12.5M pair dot products: 43 s lambda vs 3.8 s GEMM —
see dedup.py's TF-IDF dense regime, the in-repo precedent). This
module moves every per-pair cosine in the similarity/dedup family onto
that fast path while keeping the join *topology* (broadcast queries,
per-cell equi-restriction) unchanged.

Scale notes (the 100 TB story):
* ``brute_topk`` never shuffles the corpus: queries are a small
  broadcast matrix, each Arrow batch does one BLAS GEMM against it and
  keeps a running top-k per query, so a partition emits at most
  ``n_queries × k`` rows regardless of its size.
* The per-cell kernels cogroup on the coarse cell id (the same shuffle
  the old equi-join did) and tile the candidate side in id-ascending
  blocks, so memory is ``rows_per_batch × block`` — an n×n similarity
  matrix is never materialized.
* Tie semantics match the SQL oracles exactly: scores are rounded to
  6 dp *before* ranking and ties break on ascending neighbor id. The
  kernels get this for free by laying candidates out in ascending-id
  order and using a *stable* argsort on the rounded negated scores —
  no per-row Python tie fixups.

Reference parity: the cosine itself mirrors
image_deduplication_filter.py:122-157 / knn_similarity_filter.py:143-197
(all-pairs cosine over unit-normalized embeddings).
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

#: candidate-side tile width: bounds kernel memory at
#: ``batch_rows × BLOCK`` doubles irrespective of cell size.
BLOCK = 8192

#: hard cap on the broadcast query matrix (rows) for the brute path —
#: beyond this the caller should IVF-restrict instead.
MAX_BROADCAST_QUERIES = 100_000


def _round6(x: np.ndarray) -> np.ndarray:
    """ROUND(x, 6) with the DuckDB oracle's semantics — half away from
    zero evaluated on the binary product ``x*1e6`` (DuckDB rounds via
    ``std::round(x*10^p)/10^p``), not numpy's half-to-even. For
    |x| ≤ 2 the ``+0.5`` add is exact in float64 (0.5 is a multiple of
    ``ulp(|x|*1e6)``), so in the cosine range this matches std::round
    bit-for-bit. Residual disclosure: Spark's own ``F.round`` (HALF_UP
    over the value's shortest decimal repr) can differ from both when a
    value's decimal expansion sits within one ulp of a .5 boundary —
    inherent to double storage; the kernels target the DuckDB oracle
    the driver hashes against (ADVICE r3 item 1)."""
    return np.copysign(np.floor(np.abs(x) * 1e6 + 0.5), x) / 1e6


def _mat(col: pd.Series) -> np.ndarray:
    """Stack an Arrow list column into a (n, dim) float64 matrix."""
    return np.vstack(col.to_numpy()).astype(np.float64)


def _unit(M: np.ndarray) -> np.ndarray:
    """Row-normalize; zero rows stay zero (cosine vs them is 0, ranked
    last, matching SQL where 0/0 would be NULL-ish edge data)."""
    n = np.linalg.norm(M, axis=1, keepdims=True)
    return M / np.where(n == 0.0, 1.0, n)


def _merge_topk(
    run_sims: np.ndarray, run_ids: np.ndarray,
    blk_sims: np.ndarray, blk_ids: np.ndarray, k: int
):
    """Merge a running per-query top-k with a new candidate block.

    Both inputs are (nq, ≤k)-ish column-stacked candidate sets whose
    columns are in ascending-id order *within* each set, and every id in
    ``run_ids`` precedes every id in ``blk_ids`` (blocks are consumed in
    ascending id order) — so a stable argsort on the rounded negated
    sims breaks ties by ascending id exactly like the SQL window
    ``ORDER BY cosine DESC, neighbor_id ASC``."""
    sims = np.concatenate([run_sims, blk_sims], axis=1)
    ids = np.concatenate([run_ids, blk_ids], axis=1)
    order = np.argsort(-sims, axis=1, kind="stable")[:, :k]
    rows = np.arange(sims.shape[0])[:, None]
    return sims[rows, order], ids[rows, order]


#: cap on the transient (nq × block) sims buffer: 2^25 doubles = 256 MB
SIMS_BUDGET = 1 << 25


def _topk_against(
    Q: np.ndarray, q_ids: np.ndarray,
    C: np.ndarray, c_ids: np.ndarray, k: int,
):
    """Top-k cosine candidates of each Q row against C (self-matches by
    id excluded), tiled over C in id order. Returns (sims, ids) of shape
    (nq, ≤k) each, sorted by (cosine desc, id asc). C must be given in
    ascending c_ids order.

    The candidate tile narrows as the query count grows so the transient
    sims matrix stays ≤ SIMS_BUDGET doubles — at the 100k-query
    broadcast gate a fixed 8192-wide tile would be a 6.5 GB allocation
    per partition."""
    nq = Q.shape[0]
    block = max(64, min(BLOCK, SIMS_BUDGET // max(1, nq)))
    run_sims = np.empty((nq, 0))
    run_ids = np.empty((nq, 0), dtype=c_ids.dtype)
    for lo in range(0, C.shape[0], block):
        Cb = C[lo:lo + block]
        ib = c_ids[lo:lo + block]
        sims = _round6(Q @ Cb.T)
        sims[q_ids[:, None] == ib[None, :]] = -np.inf  # self
        order = np.argsort(-sims, axis=1, kind="stable")[:, :k]
        rows = np.arange(nq)[:, None]
        run_sims, run_ids = _merge_topk(
            run_sims, run_ids, sims[rows, order],
            np.broadcast_to(ib, sims.shape)[rows, order], k
        )
    return run_sims, run_ids


def _pair_frame(q_ids, run_sims, run_ids, id_a="query_id", id_b="neighbor_id"):
    """Flatten per-query top-k arrays to a (id_a, id_b, cosine) frame,
    dropping -inf padding (queries with < k real candidates)."""
    kk = run_sims.shape[1]
    if kk == 0:
        return pd.DataFrame({id_a: q_ids[:0], id_b: run_ids.ravel(), "cosine": []})
    flat_q = np.repeat(q_ids, kk)
    flat_s = run_sims.ravel()
    flat_n = run_ids.ravel()
    keep = np.isfinite(flat_s)
    return pd.DataFrame(
        {id_a: flat_q[keep], id_b: flat_n[keep], "cosine": flat_s[keep]}
    )


def _out_schema(df: DataFrame, id_col: str, a: str, b: str) -> StructType:
    t = df.schema[id_col].dataType
    return StructType([
        StructField(a, t), StructField(b, t),
        StructField("cosine", DoubleType()),
    ])


def broadcast_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    cell_col: str | None = None,
    _qpdf: pd.DataFrame | None = None,
) -> DataFrame:
    """Top-k cosine neighbors of each query against the corpus, with an
    optional IVF restriction applied *inside* the kernel.

    Queries collect to a broadcast unit matrix (gated at
    ``MAX_BROADCAST_QUERIES``); the corpus streams through
    ``mapInPandas`` — one GEMM per Arrow batch (per cell when
    ``cell_col`` is set: each query only scores candidates in its probe
    cell), a running per-query top-k per partition (≤ nq×k rows out per
    partition), then one tiny global window merge in the caller. The
    corpus is never shuffled — for the IVF case this beats the cogroup
    path (zero exchanges instead of two) whenever the query batch fits
    the broadcast gate. A query id may appear once per probe cell
    (multi-probe); candidates live in exactly one cell so no duplicate
    pairs arise."""
    cols = [id_col, emb_col] + ([cell_col] if cell_col else [])
    qpdf = queries.select(*cols).toPandas() if _qpdf is None else _qpdf
    if len(qpdf) > MAX_BROADCAST_QUERIES:
        raise ValueError(
            f"broadcast_topk: {len(qpdf)} queries exceed the broadcast "
            f"gate ({MAX_BROADCAST_QUERIES}); use the cogroup IVF path"
        )
    q_ids = qpdf[id_col].to_numpy()
    Qn = _unit(_mat(qpdf[emb_col])) if len(qpdf) else np.empty((0, 1))
    if cell_col:
        cells = qpdf[cell_col].to_numpy()
        by_cell = {c: np.nonzero(cells == c)[0] for c in np.unique(cells)}
    else:
        by_cell = None
    from ..cache import scoped_broadcast

    # registered for cache.release_all(): without it every call leaves a
    # broadcast block on driver+executors for the session's life
    bc = scoped_broadcast(
        embeddings.sparkSession.sparkContext.broadcast((q_ids, Qn, by_cell))
    )
    schema = _out_schema(embeddings, id_col, "query_id", "neighbor_id")

    def part(batches: Iterable[pd.DataFrame]):
        qids, Q, cell_idx = bc.value
        nq = len(qids)
        if nq == 0:
            return
        run_s = np.empty((nq, 0))
        run_i = np.empty((nq, 0), dtype=qids.dtype)

        def fold(Qsub, qsub_ids, rows_idx, Cn, cids):
            nonlocal run_s, run_i
            # per-batch top-k for this query subset, then a lexsort
            # merge into the running state (cross-batch ids are not
            # globally ordered, so the id tiebreak needs the lexsort)
            s, i = _topk_against(Qsub, qsub_ids, Cn, cids, k)
            w = s.shape[1]
            if w == 0:
                return
            pad = run_s.shape[1]
            both_s = np.concatenate([run_s[rows_idx], s], axis=1)
            both_i = np.concatenate([run_i[rows_idx], i], axis=1)
            rr = np.arange(len(rows_idx))[:, None]
            order = np.lexsort((both_i, -both_s), axis=1)[:, :k]
            m_s, m_i = both_s[rr, order], both_i[rr, order]
            if m_s.shape[1] > pad:  # widen running state once
                grow = m_s.shape[1] - pad
                run_s = np.pad(run_s, ((0, 0), (0, grow)),
                               constant_values=-np.inf)
                # pad slots carry -inf sims so their order is moot, but
                # the lexsort tiebreak still COMPARES them — a numeric 0
                # against string ids raises TypeError, so pad with an
                # id-dtype-appropriate sentinel (ADVICE r3 item 3)
                fill = "" if run_i.dtype.kind in "OUS" else 0
                run_i = np.concatenate(
                    [run_i, np.full((nq, grow), fill, dtype=run_i.dtype)],
                    axis=1,
                )
            run_s[rows_idx, :m_s.shape[1]] = m_s
            run_i[rows_idx, :m_i.shape[1]] = m_i

        for pdf in batches:
            if len(pdf) == 0:
                continue
            # ascending-id layout makes the stable argsort break ties
            # by neighbor id, matching ORDER BY cosine DESC, id ASC
            pdf = pdf.sort_values(id_col)
            if cell_idx is None:
                Cn = _unit(_mat(pdf[emb_col]))
                cids = pdf[id_col].to_numpy()
                fold(Q, qids, np.arange(nq), Cn, cids)
            else:
                for c, grp in pdf.groupby(cell_col, sort=False):
                    rows_idx = cell_idx.get(c)
                    if rows_idx is None or len(rows_idx) == 0:
                        continue
                    Cn = _unit(_mat(grp[emb_col]))
                    cids = grp[id_col].to_numpy()
                    fold(Q[rows_idx], qids[rows_idx], rows_idx, Cn, cids)
        out = _pair_frame(qids, run_s, run_i)
        if len(out):
            yield out

    corpus_cols = [id_col, emb_col] + ([cell_col] if cell_col else [])
    return embeddings.select(*corpus_cols).mapInPandas(part, schema)


def brute_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Exact (un-restricted) top-k — see ``broadcast_topk``."""
    return broadcast_topk(embeddings, queries, k, id_col, emb_col)


def _cell_topk_fn(k: int):
    def fn(qdf: pd.DataFrame, cdf: pd.DataFrame) -> pd.DataFrame:
        if len(qdf) == 0 or len(cdf) == 0:
            return pd.DataFrame({"query_id": [], "neighbor_id": [], "cosine": []})
        cdf = cdf.sort_values("_cid")
        Q = _unit(_mat(qdf["_qemb"]))
        C = _unit(_mat(cdf["_cemb"]))
        s, i = _topk_against(
            Q, qdf["_qid"].to_numpy(), C, cdf["_cid"].to_numpy(), k
        )
        return _pair_frame(qdf["_qid"].to_numpy(), s, i)
    return fn


def cell_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    cell_col: str = "cell",
) -> DataFrame:
    """IVF-restricted top-k: candidates limited to the query's coarse
    cell. Cogroup on cell id (the same single shuffle the old equi-join
    did), GEMM + running top-k inside each cell. Emits per-cell top-k;
    callers ranking across probe cells re-window on the (tiny) result."""
    # NB: cogrouped applyInPandas silently prunes right-side columns
    # whose names collide with the left side — rename both lanes
    q = queries.select(
        F.col(id_col).alias("_qid"), F.col(cell_col).alias("cell"),
        F.col(emb_col).alias("_qemb"),
    )
    c = embeddings.select(
        F.col(id_col).alias("_cid"), F.col(cell_col).alias("cell"),
        F.col(emb_col).alias("_cemb"),
    )
    schema = _out_schema(embeddings, id_col, "query_id", "neighbor_id")
    return (
        q.groupBy("cell")
        .cogroup(c.groupBy("cell"))
        .applyInPandas(_cell_topk_fn(k), schema)
    )


def cell_knn_scores(
    df: DataFrame,
    k: int,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    cell_col: str = "cell",
    n_buckets: int = 8,
) -> DataFrame:
    """Per-row mean cosine to its k nearest neighbors within its cell
    (the KNNSimilarityFilter score, knn_similarity_filter.py:143-197).

    All-pairs-per-cell, but salted: the query side is split into
    ``n_buckets`` id-hash buckets per cell and the candidate side is
    replicated per bucket, so a handful of cells still fans out to
    cells×buckets tasks (round-2 lesson: tiny-cardinality keys collapse
    parallelism). Returns (id_col, knn_score) with the oracle's
    round(avg(round(cos,6)),6) arithmetic."""
    q = df.select(
        F.col(id_col).alias("_qid"), F.col(cell_col).alias("cell"),
        F.col(emb_col).alias("_qemb"),
        F.pmod(F.hash(F.col(id_col)), F.lit(n_buckets)).alias("_bkt"),
    )
    c = df.select(
        F.col(id_col).alias("_cid"), F.col(cell_col).alias("cell"),
        F.col(emb_col).alias("_cemb"),
        F.explode(F.expr(f"sequence(0, {n_buckets - 1})")).alias("_bkt"),
    )
    id_type = df.schema[id_col].dataType
    schema = StructType(
        [StructField(id_col, id_type), StructField("knn_score", DoubleType())]
    )

    def fn(qdf: pd.DataFrame, cdf: pd.DataFrame) -> pd.DataFrame:
        if len(qdf) == 0 or len(cdf) == 0:
            return pd.DataFrame({id_col: qdf["_qid"][:0], "knn_score": []})
        cdf = cdf.sort_values("_cid")
        Q = _unit(_mat(qdf["_qemb"]))
        C = _unit(_mat(cdf["_cemb"]))
        s, _ = _topk_against(
            Q, qdf["_qid"].to_numpy(), C, cdf["_cid"].to_numpy(), k
        )
        with np.errstate(invalid="ignore"):
            score = _round6(np.nanmean(np.where(np.isfinite(s), s, np.nan), axis=1))
        out = pd.DataFrame({id_col: qdf["_qid"].to_numpy(), "knn_score": score})
        # rows with no same-cell neighbor don't appear at all (the SQL
        # join semantics: no pair rows → absent from the score relation)
        return out[np.isfinite(score)]

    return (
        q.groupBy("cell", "_bkt")
        .cogroup(c.groupBy("cell", "_bkt"))
        .applyInPandas(fn, schema)
    )


def cell_dup_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    cell_col: str = "cell",
    n_buckets: int = 8,
) -> DataFrame:
    """Within-cell pairs (id_a < id_b) with cosine ≥ threshold — the
    candidate set of ImageDeduplicateFilter-style near-dup marking
    (image_deduplication_filter.py:122-157). Same salted cogroup layout
    as ``cell_knn_scores``; tiles candidate columns so memory stays
    batch×BLOCK."""
    q = df.select(
        F.col(id_col).alias("id_a"), F.col(cell_col).alias("cell"),
        F.col(emb_col).alias("_qemb"),
        F.pmod(F.hash(F.col(id_col)), F.lit(n_buckets)).alias("_bkt"),
    )
    c = df.select(
        F.col(id_col).alias("id_b"), F.col(cell_col).alias("cell"),
        F.col(emb_col).alias("_cemb"),
        F.explode(F.expr(f"sequence(0, {n_buckets - 1})")).alias("_bkt"),
    )
    schema = _out_schema(df, id_col, "id_a", "id_b")
    thr = float(threshold)

    def fn(qdf: pd.DataFrame, cdf: pd.DataFrame) -> pd.DataFrame:
        if len(qdf) == 0 or len(cdf) == 0:
            return pd.DataFrame({"id_a": qdf["id_a"][:0], "id_b": [], "cosine": []})
        A = _unit(_mat(qdf["_qemb"]))
        aids = qdf["id_a"].to_numpy()
        B = _unit(_mat(cdf["_cemb"]))
        bids = cdf["id_b"].to_numpy()
        outs = []
        block = max(64, min(BLOCK, SIMS_BUDGET // max(1, len(aids))))
        for lo in range(0, len(bids), block):
            Bb, ib = B[lo:lo + block], bids[lo:lo + block]
            sims = _round6(A @ Bb.T)
            mask = (sims >= thr) & (aids[:, None] < ib[None, :])
            ii, jj = np.nonzero(mask)
            if len(ii):
                outs.append(pd.DataFrame(
                    {"id_a": aids[ii], "id_b": ib[jj], "cosine": sims[ii, jj]}
                ))
        if not outs:
            return pd.DataFrame({"id_a": aids[:0], "id_b": bids[:0], "cosine": []})
        return pd.concat(outs, ignore_index=True)

    return (
        q.groupBy("cell", "_bkt")
        .cogroup(c.groupBy("cell", "_bkt"))
        .applyInPandas(fn, schema)
    )
