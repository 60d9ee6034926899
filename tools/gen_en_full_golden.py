#!/usr/bin/env python
"""Generate the committed golden parquet behind the `normalize_en_full`
DuckDB oracle (VERDICT r4 item 3).

The full Whisper-style en normalizer ends in a per-word sequential FST
(functions/whisper_en_numbers.py) that SQL cannot express, so the DuckDB
oracle cannot COMPUTE the expected value — but it can LOOK IT UP. This
script runs the pure-Python twin (oracle/whisper_en.py
english_text_normalizer_full — itself validated against 600+
non-circular golden vectors in tests/test_whisper_en_golden.py, an
independent inverse number→words speller, and the real
whisper_normalizer package where installed) over every distinct input
the contract query derives from the driver fixtures, keyed by the md5
of the derived input text so one golden file serves any sf whose inputs
it covers (sf0.001 for the in-repo tests, sf0.01 for the driver).

Regenerate after changing the normalizer, the snippet list, or the
fixtures:  python tools/gen_en_full_golden.py
"""

from __future__ import annotations

import hashlib
import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataflow_mm_lrt_spark.contract import _EN_NUM_SNIPPETS  # noqa: E402
from dataflow_mm_lrt_spark.oracle.whisper_en import (  # noqa: E402
    english_text_normalizer_full,
)

SF_DIRS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01")
TARGET = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "dataflow_mm_lrt_spark",
    "goldens",
    "normalize_en_full.parquet",
)


def derived_inputs(sf_dirs=SF_DIRS) -> dict[str, str]:
    """{input_md5: derived _en_text} — the same snippet-prefix
    derivation as contract.q_normalize_en_full, in pandas."""
    k = len(_EN_NUM_SNIPPETS)
    snip = dict(enumerate(_EN_NUM_SNIPPETS))
    inputs: dict[str, str] = {}
    for d in sf_dirs:
        docs = pd.read_parquet(
            os.path.join(d, "documents.parquet"), columns=["doc_id", "text"]
        )
        en = docs["doc_id"].mod(k).map(snip) + " " + docs["text"].fillna("")
        for t in en:
            inputs.setdefault(hashlib.md5(t.encode("utf-8")).hexdigest(), t)
    return inputs


def main() -> None:
    inputs = derived_inputs()
    golden = pd.DataFrame(
        {
            "input_md5": list(inputs.keys()),
            "text_norm": [
                english_text_normalizer_full(t) for t in inputs.values()
            ],
        }
    ).sort_values("input_md5", ignore_index=True)
    os.makedirs(os.path.dirname(TARGET), exist_ok=True)
    golden.to_parquet(TARGET, index=False)
    print(f"wrote {len(golden)} golden rows → {TARGET}")


if __name__ == "__main__":
    main()
