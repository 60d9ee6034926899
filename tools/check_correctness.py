"""Driver-mimic correctness gate: run every contract ``QUERIES`` entry
against its DuckDB ``ORACLES`` twin at an arbitrary scale factor and
report per-query row/schema/value-hash matches as one JSON line each.

Usage::

    python tools/check_correctness.py [SF_DIR] [name ...]

Defaults to /root/testdata/sf0.01 (the driver's correctness scale).
Passing names restricts the run to those entries.  Exit code is the
number of failing entries, so ``&& echo ok`` works in shell.

This is the same comparison tests/test_contract_oracle.py performs at
sf0.001, lifted to a standalone script so a pre-round sanity pass at the
driver's own scale doesn't pay the pytest fixture tax per query.
"""

from __future__ import annotations

import hashlib
import json
import sys

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

from dataflow_mm_lrt_spark.contract import (
    EXTRA_ORACLES,
    EXTRA_QUERIES,
    ORACLES as _ORACLES,
    QUERIES as _QUERIES,
)

# pre-round sanity covers EXTRA (non-driver-visible) entries too
QUERIES = {**_QUERIES, **EXTRA_QUERIES}
ORACLES = {**_ORACLES, **EXTRA_ORACLES}
from dataflow_mm_lrt_spark.session import build_session

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


def _value_hash(pdf: pd.DataFrame) -> str:
    body = pdf.to_csv(index=False, float_format="%.6g").encode()
    return hashlib.md5(body).hexdigest()


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    names = [a for a in args if "/" not in a] or sorted(QUERIES)

    spark = build_session()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = 0
    for name in names:
        rec: dict = {"name": name}
        try:
            got = _canon(QUERIES[name](spark, sf_dir).toPandas())
            if name in ORACLES:
                want = _canon(con.sql(ORACLES[name]).df())
                rec["rows"] = [len(got), len(want)]
                rec["rows_match"] = len(got) == len(want)
                rec["schema_match"] = list(got.columns) == list(want.columns)
                if rec["schema_match"] and rec["rows_match"]:
                    rec["hash_match"] = _value_hash(got) == _value_hash(want)
                    if not rec["hash_match"]:
                        diff = (got != want) & ~(got.isna() & want.isna())
                        cols = [c for c in got.columns if diff[c].any()]
                        rec["diff_cols"] = cols[:5]
                else:
                    rec["hash_match"] = False
            else:
                rec["rows"] = [len(got), None]
                rec["rows_match"] = rec["schema_match"] = True
                rec["hash_match"] = None  # rows-only entry, by design
            ok = rec["rows_match"] and rec["schema_match"] and rec["hash_match"] is not False
        except Exception as exc:  # noqa: BLE001 — report, keep going
            rec["err"] = f"{type(exc).__name__}: {exc}"[:200]
            ok = False
        if not ok:
            failures += 1
        print(json.dumps(rec))
    print(f"# {len(names) - failures}/{len(names)} ok", file=sys.stderr)
    return failures


if __name__ == "__main__":
    raise SystemExit(main())
