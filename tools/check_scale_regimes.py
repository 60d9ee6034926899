"""Oracle-verify the scale-regime switches the sf0.01 driver never
enters (VERDICT r6 ask #2).

Three operators change algorithm with input size; the driver's 500-row
oracle only ever exercises the small-input side of each gate. This
script forces the big-input regime on oracle-checkable fixtures and
hashes the result against the SAME DuckDB oracle the driver uses:

* ``tfidf_sparse``      — dedup.tfidf_cosine_near_dup with
  ``dense_vocab_cap=0``: the id-bucketed inverted-index join (the
  100 TB path) instead of the dense broadcast GEMM, at sf0.1 (5 000
  docs) against ``ORACLES['dedup_tfidf_cosine']``.
* ``datatailor_chunked`` — datatailor_select (agglomerative, identical
  algorithm) with ``_cluster_uniqueness`` forced to ``max_members=64``
  so every real cluster takes the n_chunks > 1 (row-chunk × col-chunk)
  partial-sum path, at sf0.01 against the committed golden oracle.
* ``tfidf_sparse_small`` — the sparse regime on the driver's own sf0.01
  fixture (regime differs, answer must not).

(The agglomerative↔k-means method switch is NOT oracle-hashable — the
two clusterings legitimately differ — and stays covered by the parity
tests in tests/test_datatailor.py.)

Usage::  python tools/check_scale_regimes.py [out.json]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

from dataflow_mm_lrt_spark import cache
from dataflow_mm_lrt_spark.contract import ORACLES
from dataflow_mm_lrt_spark.operators import datatailor as dt
from dataflow_mm_lrt_spark.operators import dedup
from dataflow_mm_lrt_spark.session import build_session
from pyspark.sql import functions as F

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def _hash(pdf: pd.DataFrame) -> str:
    return hashlib.md5(
        pdf.to_csv(index=False, float_format="%.6g").encode()
    ).hexdigest()


def _compare(got: pd.DataFrame, want: pd.DataFrame) -> dict:
    got, want = _canon(got), _canon(want)
    return {
        "rows": [len(got), len(want)],
        "rows_match": len(got) == len(want),
        "schema_match": list(got.columns) == list(want.columns)
        and [str(t) for t in got.dtypes] == [str(t) for t in want.dtypes],
        "hash_match": _hash(got) == _hash(want),
    }


def _oracle(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.sql(sql).df()


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "CORRECTNESS_scale_regimes_r07.json"
    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict] = {}

    # -- tfidf inverted-index regime (forced via dense_vocab_cap=0) ----
    for name, sf_dir in (
        ("tfidf_sparse_sf0.1", "/root/testdata/sf0.1"),
        ("tfidf_sparse_small", "/root/testdata/sf0.01"),
    ):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        got = dedup.tfidf_cosine_near_dup(
            docs, threshold=0.8, dense_vocab_cap=0
        ).toPandas()
        want = _oracle(sf_dir, ORACLES["dedup_tfidf_cosine"])
        results[name] = {"regime": "inverted-index (dense gate forced shut)",
                         **_compare(got, want)}
        cache.release_all()

    # -- DataTailor chunked-GEMM uniqueness (forced via max_members) ---
    sf_dir = "/root/testdata/sf0.01"
    orig = dt._cluster_uniqueness

    def forced(df, id_col, emb_col, max_members=64):
        return orig(df, id_col, emb_col, max_members)

    dt._cluster_uniqueness = forced
    try:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            F.col("doc_id").alias("vec_id"), "text"
        )
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        got = dt.datatailor_select(
            emb.join(docs, on="vec_id"), id_col="vec_id",
            embedding_col="embedding", text_col="text",
            keep_ratio=0.7, method="agglomerative",
        ).toPandas()
        for c in ("informativeness", "uniqueness", "representativeness"):
            from dataflow_mm_lrt_spark.operators.gemm import _round6
            import numpy as np

            got[c] = _round6(got[c].to_numpy(dtype=np.float64))
        want = _oracle(sf_dir, ORACLES["datatailor_select"])
        results["datatailor_chunked_sf0.01"] = {
            "regime": "n_chunks>1 cogroup partial sums (max_members=64)",
            **_compare(got, want),
        }
    finally:
        dt._cluster_uniqueness = orig
    cache.release_all()

    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))
    spark.stop()
    return sum(
        0 if all(v for k, v in r.items() if k.endswith("_match")) else 1
        for r in results.values()
    )


if __name__ == "__main__":
    raise SystemExit(main())
