"""Refiner / evaluator / MCTS operator tests."""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql.types import DoubleType

from dataflow_mm_lrt_spark.operators import mcts, refine
from dataflow_mm_lrt_spark.oracle import reference_port as ref


def test_functional_refiner_constant_and_column(spark):
    df = spark.createDataFrame(pd.DataFrame({"a": [1.0, 2.0], "b": [10.0, 20.0]}))
    out = refine.functional_refiner(
        df,
        func=lambda x, y, scale: (x + y) * scale,
        input_map={"x": "a", "y": "b", "scale": 2.0},
        output_col="z",
        output_type=DoubleType(),
    ).toPandas()
    assert sorted(out["z"]) == [22.0, 44.0]


def test_prompt_template_fill(spark):
    df = spark.createDataFrame(pd.DataFrame({"q": ["what", "why"], "c": ["a", "b"]}))
    out = refine.prompt_template_fill(
        df, "Q: {} C: {}", ["q", "c"], "prompt"
    ).toPandas()
    assert set(out["prompt"]) == {"Q: what C: a", "Q: why C: b"}


def test_range_filter_schema_tolerant(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"fps": [10.0, 30.0, 60.0], "blur": [0.1, 0.5, 0.9]})
    )
    out = refine.range_filter(
        df, {"fps": (20, 50), "blur": (None, 0.8), "missing_col": (0, 1)}
    ).toPandas()
    assert len(out) == 1 and out.iloc[0]["fps"] == 30.0
    try:
        refine.range_filter(df, {"missing_col": (0, 1)}, strict=True)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_answer_eval_matches_port(spark):
    rows = pd.DataFrame(
        {
            "rid": [0, 1, 2, 3],
            "solution": ["<answer>B</answer>", "<answer>3.14</answer>",
                          "<answer>a b c d</answer>", "<answer>10</answer>"],
            "model_output": ["<answer>B</answer>", "<answer>3.15</answer>",
                              "<answer>a b x d</answer>", "<answer>11</answer>"],
            "problem_type": ["multiple choice", "numerical", "OCR", "regression"],
        }
    )
    exp = [
        ref.calculate_reward(s, o, q)
        for s, o, q in zip(rows.solution, rows.model_output, rows.problem_type)
    ]
    # keyed, not positional: the operator spreads its input, so output
    # row order is not the input order
    got = (
        refine.answer_eval(spark.createDataFrame(rows))
        .toPandas()
        .set_index("rid")["reward"]
    )
    assert all(abs(got[i] - e) < 1e-9 for i, e in enumerate(exp))


def test_basic_normalize(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"text": ["Hello, (aside) [TAG] World!!  Multi   space"]})
    )
    out = refine.basic_normalize_text(df).toPandas()
    assert out.iloc[0]["text_norm"] == "hello world multi space"


def _tree():
    return {
        "rollouts": [
            {"reward": 1.0, "ephemeral_texts": ["<think>step ok</think>", "<answer>42</answer>"]},
            {"reward": 0.0, "ephemeral_texts": ["<think>bad step</think>", "<answer>7</answer>"]},
        ],
        "is_terminal": False,
        "children": [
            {
                "rollouts": [
                    {"reward": 1.0, "ephemeral_texts": ["deep", "<answer>x</answer>"]}
                ],
                "is_terminal": True,
                "children": [],
            }
        ],
    }


def test_mcts_chains_match_reference_recursion(spark):
    tree_json = json.dumps(_tree())
    expected = mcts.build_chains(_tree())
    # wrong→backtrack→correct chain + direct-correct + child direct
    assert len(expected) == 3
    assert any("Wait, this seems off" in c for c in expected)

    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "tree": [tree_json]}))
    got = mcts.mcts_tree_refiner(df).toPandas().iloc[0]["chains"]
    assert list(got) == list(dict.fromkeys(expected))


def test_mcts_handles_garbage(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "tree": ["not json", None]})
    )
    got = mcts.mcts_tree_refiner(df).toPandas()
    assert all(len(c) == 0 for c in got["chains"])


def test_wiki_qa_refiner_matches_port(spark):
    from dataflow_mm_lrt_spark.oracle.reference_port import parse_wiki_qa

    texts = [
        "Wikipedia Article: The sky is blue.\n---\nQuestion Answer Pairs:\n"
        "1. Question: What color is the sky?\n   Answer: **Blue**\n"
        "2. Q: Why?\n   A: Rayleigh scattering",
        "no qa markers here at all",
        "",
        "### Article: X.\nQ&A\n- Question: a?\n- Answer: b",
    ]
    df = spark.createDataFrame(pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))
    got = refine.wiki_qa_refiner(df).toPandas().sort_values("doc_id")
    for t, row in zip(texts, got.itertuples(index=False)):
        exp = parse_wiki_qa(t)
        assert row.wiki_qa["context"] == exp["context"], t
        got_qas = [
            {"question": qa["question"], "answer": qa["answer"]}
            for qa in row.wiki_qa["qas"]
        ]
        assert got_qas == exp["qas"], t


def test_answer_eval_vectorized_matches_port_fuzz(spark):
    """The grouped/vectorized dispatch (r3) vs the row-loop reference
    port over a messy mixed batch: nulls, missing tags, unparsable
    numbers, free-form, unknown types, exotic float forms."""
    import itertools

    sols = ["<answer>B</answer>", "<answer>3.14</answer>", "<answer></answer>",
            "no tags at all", None, "<answer>1,234.5</answer>",
            "<answer>1_0</answer>", "<answer>infinity</answer>",
            "<answer>the cat sat on the mat</answer>"]
    outs = ["<answer> B </answer>", "<answer>3.1401</answer>", "<answer>x</answer>",
            None, "<answer>B</answer>", "<answer>1234.5</answer>",
            "<answer>10</answer>", "<answer>inf</answer>",
            "<answer>a cat sat on a mat</answer>"]
    qts = ["multiple choice", "numerical", "OCR", "free-form", "regression",
           "unknown", None]
    rows = pd.DataFrame(
        [(s, o, q) for (s, o), q in itertools.product(zip(sols, outs), qts)],
        columns=["solution", "model_output", "problem_type"],
    )
    got = refine.answer_eval(
        spark.createDataFrame(rows)
    ).toPandas()
    for _, r in got.iterrows():
        exp = ref.calculate_reward(
            r["solution"] or "", r["model_output"] or "", r["problem_type"] or ""
        )
        assert abs(r["reward"] - exp) < 1e-9, (
            r["solution"], r["model_output"], r["problem_type"], r["reward"], exp
        )
