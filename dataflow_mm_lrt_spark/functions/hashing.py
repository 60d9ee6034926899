"""Cross-dialect deterministic hashing (MinHash / SimHash primitives).

Both engines lack a shared hash function, so the engine derives 60-bit
integers from md5 hex prefixes — identical in Spark
(``conv(substr(md5(s),1,15),16,10)``) and DuckDB
(``CAST('0x'||substr(md5(s),1,15) AS BIGINT)``) — and builds the k
MinHash permutations as ``(a_i*h + b_i) mod p`` with constants from a
seeded RNG (seed 42, mirroring the reference's seeded determinism,
mcts_tree_refiner.py:71-73).

At cluster scale this keeps the whole MinHash/LSH pipeline inside
whole-stage codegen: shingle → explode → min-aggregate per permutation,
no Python anywhere.
"""

from __future__ import annotations

import numpy as np

from .dialect import DIALECTS

MERSENNE_P = (1 << 61) - 1


def md5_int_sql(dialect: str, s: str) -> str:
    """60-bit integer from the md5 of a string expression."""
    if dialect == "spark":
        return f"cast(conv(substr(md5({s}), 1, 15), 16, 10) as bigint)"
    return f"CAST(('0x' || substr(md5({s}), 1, 15)) AS BIGINT)"


def minhash_coeffs(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE_P, size=num_perm, dtype=np.int64)
    b = rng.integers(0, MERSENNE_P, size=num_perm, dtype=np.int64)
    return a, b


def perm_hash_sql(dialect: str, h: str, a: int, b: int) -> str:
    """One MinHash permutation of a 60-bit hash expression ``h``.

    Uses 128-bit intermediate math: DuckDB promotes via HUGEINT, Spark
    via DECIMAL(38,0) — both exact for a*h+b with a,b,h < 2^61.
    """
    if dialect == "spark":
        return (
            f"cast((cast({a} as decimal(38,0)) * cast({h} as decimal(38,0))"
            f" + {b}) % {MERSENNE_P} as bigint)"
        )
    return f"CAST((({a}::HUGEINT * {h}::HUGEINT + {b}::HUGEINT) % {MERSENNE_P}) AS BIGINT)"


def shingles_sql(dialect: str, t: str, n: int = 3) -> str:
    """Word n-gram shingles of the normalized text as an array of strings
    (distinct). For texts shorter than n words, the whole text is the
    single shingle (so every doc has ≥1 shingle)."""
    d = DIALECTS[dialect]
    toks = d.filter(d.split(f"lower({t})", r"\s+"), "w", "w <> ''")
    if dialect == "spark":
        # O(1) element_at per gram position — a slice() inside the
        # transform is O(i) per position, turning shingling into an
        # O(words²) interpreted loop (measured ~10× slower at 100-word
        # docs); the short-text branch keeps the whole-text-shingle
        # semantics without out-of-bounds element_at under ANSI mode
        parts = ", ".join(f"element_at(_tk, i + {j + 1})" for j in range(n))
        grams = (
            f"CASE WHEN size(_tk) < {n} THEN array(array_join(_tk, ' ')) "
            f"ELSE transform(sequence(0, size(_tk) - {n}), "
            f"i -> concat_ws(' ', {parts})) END"
        )
        # lambda let-binding: evaluate the token filter ONCE per row and
        # reference it as _tk everywhere (inlining it would re-run the
        # filter inside every element_at of the inner lambda)
        return (
            f"element_at(transform(array({toks}), "
            f"_tk -> array_distinct({grams})), 1)"
        )
    grams = (
        f"list_transform(range(0, greatest(len({toks}) - {n}, 0) + 1), "
        f"i -> array_to_string({toks}[i + 1: i + {n}], ' '))"
    )
    return f"list_distinct({grams})"
