"""MCTS reasoning-chain extraction (core_text/refine/mcts_tree_refiner.py).

Faithful re-expression of the chain-building recursion
(mcts_tree_refiner.py:11-64): per node, wrong-rollout → backtrack
message → correct-rollout chains plus direct-correct chains, recursing
into children of non-terminal nodes; per row the chains are deduped and
capped with a seeded sample (:96-100).

Documented determinism deltas vs the reference (which is not
reproducible itself):
* dedup keeps *first occurrence order* instead of ``list(set(...))``
  (python set order varies across processes);
* the cap-sample rng is seeded per row as (seed, row_id) instead of one
  sequential ``random.Random(42)`` shared across rows (row order is not
  defined in a distributed table).

Runs as an Arrow-batched pandas UDF (tree JSON → array<string>); the
tree parse itself is row-local and cannot be expressed natively.
"""

from __future__ import annotations

import json
import random

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

BACKTRACK_MESSAGE = "Wait, this seems off. Let's try something else."


def _process_text_chain(chain: list[str]) -> tuple[str, str]:
    """mcts_tree_refiner.py:11-27."""
    if not chain:
        return "", ""
    if chain[0].startswith("<image>") or chain[0].endswith("<image>"):
        chain = chain[1:]
    if not chain:
        return "", ""
    final_answer = (
        chain[-1].replace("<answer>", "").replace("</answer>", "").strip()
    )
    cleaned = []
    for line in chain[:-1]:
        line = line.replace("<think>", "").replace("</think>", "")
        line = line.replace("<answer>", "").replace("</answer>", "")
        cleaned.append(line.strip())
    return " ".join(cleaned), final_answer


def build_chains(node: dict, backtrack: str = BACKTRACK_MESSAGE) -> list[str]:
    """mcts_tree_refiner.py:30-64."""
    rollouts = node.get("rollouts", [])
    correct = [r for r in rollouts if r.get("reward", 0.0) >= 1.0]
    wrong = [r for r in rollouts if r.get("reward", 0.0) < 1.0]
    chains: list[str] = []
    for wr in wrong:
        wc, _ = _process_text_chain(wr.get("ephemeral_texts", []))
        if not wc:
            continue
        wc += f"\n{backtrack}"
        for cr in correct:
            cc, ca = _process_text_chain(cr.get("ephemeral_texts", []))
            chains.append(f"<think>\n{wc}\n{cc}\n</think>\n<answer> {ca} </answer>")
    for cr in correct:
        cc, ca = _process_text_chain(cr.get("ephemeral_texts", []))
        chains.append(f"<think>\n{cc}\n</think>\n<answer> {ca} </answer>")
    if not node.get("is_terminal", False):
        for child in node.get("children", []):
            chains.extend(build_chains(child, backtrack))
    return chains


def chains_for_tree(tree_json: str | None, row_id: int,
                    max_chains: int = 10_000, seed: int = 42) -> list[str]:
    if not tree_json:
        return []
    try:
        tree = json.loads(tree_json) if isinstance(tree_json, str) else tree_json
        raw = build_chains(tree)
        deduped = list(dict.fromkeys(raw))  # first-occurrence order
        if len(deduped) > max_chains:
            rng = random.Random((seed, row_id))
            deduped = rng.sample(deduped, max_chains)
        return deduped
    except Exception:
        return []


def mcts_tree_refiner(
    df: DataFrame,
    tree_col: str = "tree",
    id_col: str = "doc_id",
    output_col: str = "chains",
    max_chains: int = 10_000,
    seed: int = 42,
) -> DataFrame:
    @F.pandas_udf(ArrayType(StringType()))
    def _chains(trees: pd.Series, ids: pd.Series) -> pd.Series:
        return pd.Series(
            [
                chains_for_tree(t, int(i), max_chains, seed)
                for t, i in zip(trees, ids)
            ]
        )

    return df.withColumn(output_col, _chains(F.col(tree_col), F.col(id_col)))
