"""Replicates the driver's correctness gate locally: every
``queries()`` entry vs its DuckDB ``oracle_sql()`` twin at sf0.001 —
row count, column names, and exact order-insensitive values.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from dataflow_mm_lrt_spark.contract import (
    EXTRA_ORACLES,
    EXTRA_QUERIES,
    ORACLES,
    QUERIES,
    entry_query,
)

# Driver sees QUERIES (≤50 rows); extras are value-checked here only.
ALL_QUERIES = {**QUERIES, **EXTRA_QUERIES}
ALL_ORACLES = {**ORACLES, **EXTRA_ORACLES}

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    pdf = pdf.sort_values(list(pdf.columns)).reset_index(drop=True)
    return pdf


@pytest.mark.parametrize("name", sorted(ALL_QUERIES))
def test_query_matches_oracle(spark, duck, name):
    if name not in ALL_ORACLES:
        # deliberately oracle-less (iterative ops): the driver records a
        # rows-only check — assert the query runs and returns rows
        out = ALL_QUERIES[name](spark, SF_DIR)
        assert out.count() > 0
        return
    got = ALL_QUERIES[name](spark, SF_DIR).toPandas()
    exp = duck.sql(ALL_ORACLES[name]).df()
    assert sorted(got.columns) == sorted(exp.columns), (
        f"{name}: columns {sorted(got.columns)} vs {sorted(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name}: rows {len(got)} vs {len(exp)}"
    g, e = _canon(got), _canon(exp)
    for c in g.columns:
        gv, ev = g[c].to_numpy(), e[c].to_numpy()
        if np.issubdtype(g[c].dtype, np.floating):
            both_nan = pd.isna(gv) & pd.isna(ev)
            ok = both_nan | (gv == ev)
        else:
            ok = gv == ev
        assert ok.all(), (
            f"{name}.{c}: first diff at row {int(np.argmin(ok))}: "
            f"{gv[np.argmin(ok)]!r} vs {ev[np.argmin(ok)]!r}"
        )


def test_entry_runs(spark):
    out = entry_query(spark, SF_DIR).toPandas()
    assert len(out) > 0
    assert {"lang", "lang_pred", "n_docs", "avg_quality", "total_tokens"} <= set(
        out.columns
    )


def test_driver_contract_stays_within_50_rows():
    """The driver's correctness report records at most 50 rows
    (insertion-ordered) — r03 silently dropped entry 51. Keep the
    driver-visible dict at the cap; overflow belongs in EXTRA_QUERIES."""
    assert len(QUERIES) <= 50
    assert set(ORACLES) <= set(QUERIES)
    assert set(EXTRA_ORACLES) <= set(EXTRA_QUERIES)
    assert not (set(EXTRA_QUERIES) & set(QUERIES))


def test_bench_headline_names_are_contract_entries():
    """bench.py resolves HEADLINE names from QUERIES ∪ EXTRA_QUERIES —
    a rename that forgets the HEADLINE list would crash the driver's
    per-round bench run."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_mod", "/root/repo/bench.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    missing = [n for n in mod.HEADLINE if n not in ALL_QUERIES]
    assert not missing, missing
