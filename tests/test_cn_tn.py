"""Chinese TextNorm structural port: whitelist-protected erhua removal,
banjiao folding, filler strip, punctuation→space, EN-aware space
removal — engine pandas-UDF vs the port, plus edge cases pinned to the
reference loop semantics (cn_tn.py:1020-1116)."""

from __future__ import annotations

import pandas as pd

from dataflow_mm_lrt_spark.operators.refine import chinese_normalize_text
from dataflow_mm_lrt_spark.oracle.cn_tn_port import (
    remove_erhua,
    remove_space,
    text_norm_zh,
)


def test_erhua_whitelist_protection():
    assert remove_erhua("他女儿在那边儿") == "他女儿在那边"
    assert remove_erhua("儿童节快乐") == "儿童节快乐"
    assert remove_erhua("台儿庄战役在哪儿") == "台儿庄战役在哪"
    assert remove_erhua("哪儿都行") == "哪都行"
    assert remove_erhua("没有任何目标字") == "没有任何目标字"


def test_banjiao_and_puncs():
    assert text_norm_zh("ＡＢＣ１２３：ｄｅｆ", to_banjiao=True) == "ABC123 def"
    # without banjiao the fullwidth colon is still a CJK punc? It is in
    # CN_PUNCS_NONSTOP → space either way, but letters stay fullwidth
    assert text_norm_zh("ＡＢ！", to_banjiao=False) == "ＡＢ "


def test_fillers_and_case():
    assert text_norm_zh("呃这个啊很好", remove_fillers=True) == "这个很好"
    assert text_norm_zh("Abc", to_upper=True) == "ABC"
    assert text_norm_zh("Abc", to_lower=True) == "abc"


def test_remove_space_keeps_en_separation():
    assert remove_space("hello 世界 world") == "hello世界world"
    assert remove_space("hello world") == "hello world"
    assert remove_space("甲 乙 丙") == "甲乙丙"


def test_engine_matches_port(spark):
    cases = [
        "他女儿在那边儿，好吗",
        "呃这个啊很好！",
        "ＡＢＣ１２３：ｄｅｆ",
        "儿童节快乐 with ascii tail",
        "台儿庄战役在哪儿",
        "",
    ]
    df = spark.createDataFrame(pd.DataFrame({"doc_id": range(len(cases)), "text": cases}))
    got = {r["doc_id"]: r["text_norm"] for r in chinese_normalize_text(df).collect()}
    for i, c in enumerate(cases):
        exp = text_norm_zh(
            c, to_banjiao=True, remove_fillers=True, do_remove_erhua=True
        )
        assert got[i] == exp, f"case {i}: {c!r}"
