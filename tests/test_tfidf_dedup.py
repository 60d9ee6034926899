"""tfidf_cosine_near_dup vs a NumPy port of the TfidfVectorizer formula
(the reference's TextDuplicateFilter metric,
image_diversity_filter.py:20-34): token pattern, smooth idf, l2 norm,
pairwise cosine, keep-first dup marking."""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from dataflow_mm_lrt_spark.operators.dedup import tfidf_cosine_near_dup

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy dog",          # exact dup of 0
    "the quick brown fox leaps over the lazy dog",          # near dup of 0
    "completely different content about spark shuffles",
    "spark shuffles and partitions for distributed joins",
    "xy",                                                   # too short (<3 chars)
    "the quick brown fox jumps over the lazy dog today",    # near dup of 0
]


def numpy_tfidf_dups(texts, threshold=0.8):
    """TfidfVectorizer defaults: \\b\\w\\w+\\b tokens on lowercase,
    idf = ln((1+n)/(1+df)) + 1, l2-normalized; dup = cosine >= t vs any
    earlier doc."""
    token = re.compile(r"\b\w\w+\b")
    docs = [Counter(token.findall(t.lower())) for t in texts]
    vocab = sorted({w for d in docs for w in d})
    n = len(texts)
    df = Counter(w for d in docs for w in d.keys())
    idf = {w: np.log((1 + n) / (1 + df[w])) + 1 for w in vocab}
    M = np.zeros((n, len(vocab)))
    for i, d in enumerate(docs):
        for w, c in d.items():
            M[i, vocab.index(w)] = c * idf[w]
        norm = np.linalg.norm(M[i])
        if norm > 0:
            M[i] /= norm
    cos = M @ M.T
    is_dup, max_cos = [], []
    for j in range(n):
        earlier = [round(cos[i, j], 6) for i in range(j) if round(cos[i, j], 6) >= threshold]
        is_dup.append(bool(earlier))
        max_cos.append(max(earlier) if earlier else 0.0)
    return is_dup, max_cos


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(CORPUS)), "text": CORPUS})
    )


def test_matches_numpy_reference(spark, docs_df):
    exp_dup, exp_cos = numpy_tfidf_dups(CORPUS)
    got = {
        r["doc_id"]: r
        for r in tfidf_cosine_near_dup(docs_df).collect()
    }
    for i in range(len(CORPUS)):
        assert got[i]["is_dup"] == exp_dup[i], f"doc {i}"
        assert abs(got[i]["max_cosine"] - exp_cos[i]) < 1e-6, f"doc {i}"
    # semantic spot checks
    assert got[1]["is_dup"] is True and got[1]["max_cosine"] == 1.0
    assert got[0]["is_dup"] is False
    assert got[3]["is_dup"] is False
    assert got[5]["too_short"] is True
    assert not any(got[i]["too_short"] for i in (0, 1, 2, 3, 4, 6))
