"""Faithful numpy port of the reference DataTailorFilter math
(core_vision/filter/datatailor_filter.py) — the sequential test oracle
for operators/datatailor.py.

Each function mirrors one reference method line-for-line in semantics
(informativeness :169-215, clustering :217-238, uniqueness :240-287,
representativeness :289-349, selection :352-373); the model-bound
feature extraction (:96-167) is replaced by the caller-provided
matrices, exactly as the engine replaces it with the deterministic
md5 featurizer.

The clusterer here is deliberately NAIVE from-definition average
linkage — every step recomputes the mean pairwise cosine distance
between cluster pairs from the raw point matrix — structurally
independent of the engine's Lance-Williams incremental form, so their
agreement is a real cross-check (both reproduce sklearn
AgglomerativeClustering(metric='cosine', linkage='average') whenever
pair distances are distinct; average linkage is reducible, so greedy
min-pair merging yields the NN-chain dendrogram)."""

from __future__ import annotations

import numpy as np


def informativeness(token_features_list: list[np.ndarray]) -> np.ndarray:
    out = np.zeros(len(token_features_list))
    for i, tf in enumerate(token_features_list):
        if tf is None or tf.shape[0] < 2:
            continue
        sv = np.linalg.svd(tf.astype(np.float32), compute_uv=False)
        sv = sv[sv > 1e-8]
        if len(sv) == 0:
            continue
        p = sv / sv.sum()
        out[i] = -np.sum(p * np.log(p + 1e-10))
    return out


def cluster_labels(X: np.ndarray, clustering_threshold: float = 0.1) -> np.ndarray:
    n = X.shape[0]
    if n <= 2:
        return np.zeros(n, dtype=int)
    n_clusters = min(max(2, int(n * clustering_threshold)), n // 2)
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    D = 1.0 - Xn @ Xn.T
    clusters: list[list[int]] = [[i] for i in range(n)]
    while len(clusters) > n_clusters:
        best, bi, bj = np.inf, -1, -1
        for a in range(len(clusters)):
            for b in range(a + 1, len(clusters)):
                d = float(D[np.ix_(clusters[a], clusters[b])].mean())
                if d < best:
                    best, bi, bj = d, a, b
        clusters[bi] = clusters[bi] + clusters[bj]
        clusters.pop(bj)
    labels = np.zeros(n, dtype=int)
    # label values are arbitrary in the reference (sklearn); the engine
    # numbers by smallest member — only the PARTITION is compared
    for k, members in enumerate(sorted(clusters, key=min)):
        labels[members] = k
    return labels


def uniqueness(
    X: np.ndarray, labels: np.ndarray, inf: np.ndarray
) -> np.ndarray:
    out = np.zeros(len(X))
    for c in np.unique(labels):
        idx = np.where(labels == c)[0]
        if len(idx) <= 1:
            continue
        ci = inf[idx]
        w = ci / ci.sum() if ci.sum() > 0 else np.full(len(idx), 1.0 / len(idx))
        for i, gi in enumerate(idx):
            d = np.linalg.norm(X[idx] - X[gi : gi + 1], axis=1)
            d[i] = 0.0
            out[gi] = np.sum(d * w)
    return out


def representativeness(
    X: np.ndarray, labels: np.ndarray, inf: np.ndarray
) -> np.ndarray:
    n = len(X)
    cells = np.unique(labels)
    if len(cells) <= 1:
        return np.ones(n)
    cents = np.stack([X[labels == c].mean(axis=0) for c in cells])
    cents = cents / (np.linalg.norm(cents, axis=1, keepdims=True) + 1e-8)
    cn = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
    sims = cn @ cn.T  # sklearn cosine_similarity re-normalizes
    out = np.zeros(n)
    for ci, c in enumerate(cells):
        other = sims[ci].copy()
        other[ci] = 0.0  # reference zeroes self, keeping exp(0)=1 in the sum
        tau = np.exp(other).sum() / (len(cells) - 1)
        idx = np.where(labels == c)[0]
        w = (
            inf[idx] / inf[idx].sum()
            if inf[idx].sum() > 0
            else np.full(len(idx), 1.0 / len(idx))
        )
        out[idx] = tau * w
    return out


def perform_selection(
    inf: np.ndarray, uni: np.ndarray, rep: np.ndarray, keep_ratio: float
) -> np.ndarray:
    n = len(inf)
    # stable argsorts: the reference's default quicksort leaves tie
    # order unspecified; the engine pins ties to index-ascending ranks
    # (exact_ranks tie_col), which is exactly stable argsort — so the
    # port determinizes the same way (collab ties are common: the sum
    # of three integer ranks)
    inf_n = np.argsort(np.argsort(inf, kind="stable"), kind="stable") / n
    uni_n = np.argsort(np.argsort(uni, kind="stable"), kind="stable") / n
    rep_n = np.argsort(np.argsort(rep, kind="stable"), kind="stable") / n
    collab = (1 / 3) * inf_n + (2 / 3) * (uni_n + rep_n) / 2
    n_select = max(1, int(n * keep_ratio))
    return np.sort(np.argsort(collab, kind="stable")[-n_select:])


def run(
    token_features_list: list[np.ndarray],
    X: np.ndarray,
    keep_ratio: float = 0.8,
    clustering_threshold: float = 0.1,
) -> dict:
    inf = informativeness(token_features_list)
    labels = cluster_labels(X, clustering_threshold)
    uni = uniqueness(X, labels, inf)
    rep = representativeness(X, labels, inf)
    sel = perform_selection(inf, uni, rep, keep_ratio)
    mask = np.zeros(len(X), dtype=bool)
    mask[sel] = True
    return {
        "informativeness": inf,
        "labels": labels,
        "uniqueness": uni,
        "representativeness": rep,
        "selected": mask,
    }
