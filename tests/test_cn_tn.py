"""Chinese TextNorm structural port: whitelist-protected erhua removal,
banjiao folding, filler strip, punctuation→space, EN-aware space
removal — engine pandas-UDF vs the port, plus edge cases pinned to the
reference loop semantics (cn_tn.py:1020-1116)."""

from __future__ import annotations

import pandas as pd
import pytest

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
    assert text_norm_zh("ＡＢＣ１２３：ｄｅｆ", to_banjiao=True) == "ABC一百二十三 def"
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
        # pure pass-throughs: must hit the vectorized fast path and
        # still byte-match the per-row port (prefilter regression)
        "这是一句没有触发字符的话",
        "plain ascii words only",
        "贰 as a capital-form numeral is untouched",
        # trigger-char edge cases for the prefilter's superset claim
        "^leading caret",
        "trailing dollar$",
        "B二B 公司",
        "百分之五十 vs 50％",
    ]
    df = spark.createDataFrame(pd.DataFrame({"doc_id": range(len(cases)), "text": cases}))
    got = {r["doc_id"]: r["text_norm"] for r in chinese_normalize_text(df).collect()}
    for i, c in enumerate(cases):
        exp = text_norm_zh(
            c, to_banjiao=True, remove_fillers=True, do_remove_erhua=True
        )
        assert got[i] == exp, f"case {i}: {c!r}"


# ---------------------------------------------------------------------------
# round 3: normalize_nsw (number verbalizer) — direct parity vs the
# reference's own cn_tn.py where present (read-only import, env-gated)
# ---------------------------------------------------------------------------

import os

REF_CN_TN = "/root/reference/dataflow/operators/core_audio/refine/cn_tn.py"


def _ref_module():
    import importlib.util

    spec = importlib.util.spec_from_file_location("ref_cn_tn", REF_CN_TN)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


NSW_CASES = [
    "我有123个苹果", "总共2.5元", "占比3.5%", "2024年1月5日开会",
    "电话13912345678联系", "分数是3/4", "他花了1000块", "编号12345678",
    "P2P平台", "O2O和B2C", "1990年代", "200只羊", "22个人", "10005种可能",
    "0805号房间", "95年出生", "每月8号发工资", "涨了0.5个百分点",
    "他在1层住了12天", "010-12345678是固话", "+86 13800138000也行",
    "1.5万元", "第2名", "一共1000000元", "借我100块钱", "2月14日情人节",
]


def test_normalize_nsw_cases_stable():
    """Golden behaviors of the verbalizer (validated against the
    reference implementation when it is available)."""
    from dataflow_mm_lrt_spark.functions.cn_tn_numbers import normalize_nsw, num2chn

    assert normalize_nsw("我有123个苹果") == "我有一百二十三个苹果"
    assert normalize_nsw("占比3.5%") == "占比百分之三点五"
    assert normalize_nsw("2024年1月5日开会") == "二零二四年一月五日开会"
    assert normalize_nsw("电话13912345678联系") == "电话一三九一二三四五六七八联系"
    assert normalize_nsw("分数是3/4") == "分数是四分之三"
    assert normalize_nsw("P2P平台") == "P2P平台"
    assert num2chn("10005") == "一万零五"
    assert num2chn("200") == "两百"
    assert num2chn("22") == "二十二"
    assert num2chn("0.5") == "零点五"


@pytest.mark.skipif(not os.path.exists(REF_CN_TN), reason="reference not present")
def test_normalize_nsw_matches_reference():
    from dataflow_mm_lrt_spark.functions.cn_tn_numbers import normalize_nsw

    ref = _ref_module()
    for c in NSW_CASES:
        assert normalize_nsw(c) == ref.normalize_nsw(c), c


@pytest.mark.skipif(not os.path.exists(REF_CN_TN), reason="reference not present")
def test_normalize_nsw_matches_reference_fuzz():
    """Random digit-bearing CJK strings: same output as the reference."""
    import random

    from dataflow_mm_lrt_spark.functions.cn_tn_numbers import normalize_nsw, num2chn

    ref = _ref_module()
    rng = random.Random(7)
    frags = ["个", "元", "块", "%", "年", "月", "日", "号", "只", "米",
             "张", "去", "买", "在", "了", " ", "/", ".", "-", "第"]
    for _ in range(400):
        parts = []
        for _ in range(rng.randint(1, 8)):
            if rng.random() < 0.5:
                parts.append(str(rng.randint(0, 10 ** rng.randint(1, 10))))
            else:
                parts.append(rng.choice(frags))
        s = "".join(parts)
        assert normalize_nsw(s) == ref.normalize_nsw(s), repr(s)
    for _ in range(400):
        n = str(rng.randint(0, 10 ** rng.randint(1, 14)))
        if rng.random() < 0.3:
            n += "." + str(rng.randint(0, 999))
        assert num2chn(n) == ref.num2chn(n), n


@pytest.mark.skipif(not os.path.exists(REF_CN_TN), reason="reference not present")
def test_text_norm_zh_matches_reference_textnorm():
    """Full pipeline parity: the port (which the Spark operator wraps)
    vs the reference's TextNorm with matching options, digits included."""
    ref = _ref_module()
    tn = ref.TextNorm(to_banjiao=True, remove_fillers=True, remove_erhua=True)
    for c in NSW_CASES + ["呃他有１２３个苹果啊", "那边儿有95只鸟"]:
        assert text_norm_zh(
            c, to_banjiao=True, remove_fillers=True, do_remove_erhua=True
        ) == tn(c), c


def test_trigger_free_strings_are_identity():
    """The zh prefilter contract (operators/refine.py): a row containing
    none of the port-exported trigger chars must be a byte identity
    under every option combination the prefilter short-circuits — ties
    the trigger set to the tables that consume it (ADVICE r4)."""
    import string

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from dataflow_mm_lrt_spark.functions.cn_tn_numbers import (
        NSW_EXTRA_TRIGGER_CHARS,
    )
    from dataflow_mm_lrt_spark.oracle.cn_tn_port import (
        ERHUA_TRIGGER_CHAR,
        FILLER_CHARS,
        PUNCS,
        QJ2BJ_TRANSFORM,
    )

    trigger = (
        set(PUNCS)
        | set(FILLER_CHARS)
        | {ERHUA_TRIGGER_CHAR}
        | set(NSW_EXTRA_TRIGGER_CHARS)
        | {chr(c) for c in QJ2BJ_TRANSFORM}
        | set(string.digits)
        | set(string.whitespace)  # remove_space=True variant
    )
    # plain CJK + ASCII letters, minus every trigger char
    alphabet = st.characters(
        codec="utf-8",
        categories=("Lu", "Ll", "Lo"),
        exclude_characters="".join(sorted(trigger)),
    )

    @settings(max_examples=300, deadline=None)
    @given(st.text(alphabet=alphabet, max_size=40))
    def check(s):
        assert (
            text_norm_zh(
                s,
                to_banjiao=True,
                remove_fillers=True,
                do_remove_erhua=True,
                do_remove_space=True,
            )
            == s
        )

    check()


def test_t2s_conversion_and_pipeline_placement():
    """cc_mode='t2s' (cn_tn.py:1078-1084 OpenCC hook, curated char
    table in functions/cc_t2s.py): conversion applies FIRST, so a
    traditional char that becomes a filler/erhua/number target is then
    processed by the later passes exactly like native simplified
    input."""
    from dataflow_mm_lrt_spark.functions.cc_t2s import T2S_MAP, t2s

    assert t2s("這個學生說漢語") == "这个学生说汉语"
    assert t2s("火車站在廣場東邊") == "火车站在广场东边"
    assert t2s("電腦網絡與圖書館") == "电脑网络与图书馆"
    assert t2s("already simplified 已经简化") == "already simplified 已经简化"
    # simplified text is a fixed point of the whole table
    simplified = "".join(T2S_MAP.values())
    assert t2s(simplified) == simplified
    # pipeline: conversion first, then fillers/erhua/puncs as usual
    assert (
        text_norm_zh(
            "呃這邊兒有幾個問題！",
            to_banjiao=True,
            remove_fillers=True,
            do_remove_erhua=True,
            cc_mode="t2s",
        )
        == "这边有几个问题 "
    )
    # s2t is honestly gated, not silently wrong
    with pytest.raises(NotImplementedError):
        text_norm_zh("abc", cc_mode="s2t")


def test_t2s_engine_matches_port(spark):
    from dataflow_mm_lrt_spark.operators.refine import chinese_normalize_text

    texts = [
        "這個學生在臺北買了兩本書",
        "呃那邊兒的火車站很遠啊",
        "ＡＢＣ１２３：他說了５６７個詞",
        "plain english stays put",
        "已经是简体的一句话",
    ]
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    out = chinese_normalize_text(
        spark.createDataFrame(pdf),
        to_banjiao=True,
        remove_fillers=True,
        remove_erhua=True,
        cc_mode="t2s",
    )
    got = {r["doc_id"]: r["text_norm"] for r in out.collect()}
    for i, t in enumerate(texts):
        exp = text_norm_zh(
            t,
            to_banjiao=True,
            remove_fillers=True,
            do_remove_erhua=True,
            cc_mode="t2s",
        )
        assert got[i] == exp, f"{t!r}: {got[i]!r} != {exp!r}"
