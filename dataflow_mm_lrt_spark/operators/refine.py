"""Refiner / generic-projection operators (SURVEY.md §2.2, §2.7, §2.8).

* ``functional_refiner`` — the reference's generic row-fn glue operator
  (core_text/refine/functional_refiner.py:47-66: ``df[output] =
  f(**row-mapped kwargs)``, non-column kwargs pass through as constants)
  re-expressed as an Arrow-batched pandas UDF (the reference's per-row
  ``df.apply(axis=1)`` becomes one vectorized call per batch).
* ``prompt_template_fill`` — PromptTemplatedQAGenerator's template step
  (prompt_templated_qa_generator.py:115-121) as native ``format_string``
  (the model call itself is serving-bound and out of scope; this is the
  deterministic projection the engine owns).
* ``range_filter`` — VideoScoreFilter's multi-criteria range predicate
  (video_score_filter.py:160-286) incl. the schema-tolerant behavior:
  a criterion whose column is missing is skipped unless strict
  (video_score_filter.py:183,196).
* ``answer_eval`` — GeneralTextAnswerEvaluator
  (general_text_answer_evaluator.py:102-150) as a vectorized pandas UDF
  over (solution, model_output, question_type); LLM-free metric subset.
* ``basic_normalize_text`` — the BasicTextNormalizer-equivalent cleanup
  used by TextNormalizer for non-en/zh languages
  (audio_text_normalizer.py:20-44): lowercase, drop bracketed spans,
  strip symbol characters, collapse whitespace. Native Catalyst.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DataType, DoubleType


def functional_refiner(
    df: DataFrame,
    func: Callable[..., object],
    input_map: dict[str, str | object],
    output_col: str,
    output_type: DataType,
    vectorized: bool = False,
) -> DataFrame:
    """``df[output] = func(**kwargs)`` where kwargs values naming columns
    bind the column, anything else passes through as a constant
    (functional_refiner.py:58-62). ``vectorized=True`` expects ``func``
    to accept/return pd.Series; otherwise it is mapped element-wise
    inside the Arrow batch."""
    cols = [v for v in input_map.values() if isinstance(v, str) and v in df.columns]
    consts = {k: v for k, v in input_map.items()
              if not (isinstance(v, str) and v in df.columns)}
    col_keys = [k for k, v in input_map.items()
                if isinstance(v, str) and v in df.columns]

    @F.pandas_udf(output_type)
    def _apply(*series: pd.Series) -> pd.Series:
        kwargs = dict(zip(col_keys, series))
        if vectorized:
            return func(**kwargs, **consts)
        frame = pd.DataFrame(kwargs)
        return frame.apply(
            lambda row: func(**row.to_dict(), **consts), axis=1
        )

    return df.withColumn(output_col, _apply(*[F.col(c) for c in cols]))


def prompt_template_fill(
    df: DataFrame,
    template: str,
    field_cols: list[str],
    output_col: str = "prompt",
) -> DataFrame:
    """Fill ``{}``-style template slots from columns, JVM-side."""
    fmt = template.replace("{}", "%s")
    return df.withColumn(
        output_col, F.format_string(fmt, *[F.col(c) for c in field_cols])
    )


def range_filter(
    df: DataFrame,
    criteria: dict[str, tuple[float | None, float | None]],
    strict: bool = False,
) -> DataFrame:
    """AND of per-column [lo, hi] range predicates. Missing columns are
    skipped unless strict (then: error), mirroring
    VideoScoreFilter(strict_mode)."""
    preds = []
    for col, (lo, hi) in criteria.items():
        if col not in df.columns:
            if strict:
                raise ValueError(f"range_filter: missing column {col!r}")
            continue
        p = F.lit(True)
        if lo is not None:
            p = p & (F.col(col) >= lo)
        if hi is not None:
            p = p & (F.col(col) <= hi)
        preds.append(p)
    if not preds:
        return df
    out = preds[0]
    for p in preds[1:]:
        out = out & p
    return df.filter(out)


def answer_eval(
    df: DataFrame,
    solution_col: str = "solution",
    output_col: str = "model_output",
    qtype_col: str = "problem_type",
    reward_col: str = "reward",
) -> DataFrame:
    """Per-row reward by question type (multiple choice / numerical /
    OCR-WER / free-form ROUGE / regression), Arrow-batched; dispatch + tag extraction follow
    general_text_answer_evaluator.py:102-150 via the tested port."""
    from ..oracle.reference_port import (
        compute_rouge_score,
        normalize_number,
        wer,
    )

    @F.pandas_udf(DoubleType())
    def _reward(sol: pd.Series, out: pd.Series, qt: pd.Series) -> pd.Series:
        import re

        import numpy as np

        # vectorized tag extraction + per-question-type group dispatch;
        # per-row Python survives only inside the inherently sequential
        # WER / ROUGE string kernels (general_text_answer_evaluator.py:
        # 102-150 semantics, diffed against the row-loop port in tests)
        pat = r"<answer>\s*(.*?)\s*</answer>"
        g = (
            sol.fillna("").str.extract(pat, flags=re.DOTALL)[0]
            .str.strip().fillna("")
        )
        o = (
            out.fillna("").str.extract(pat, flags=re.DOTALL)[0]
            .str.strip().fillna("")
        )
        res = pd.Series(0.0, index=sol.index)

        def nums(s: pd.Series) -> pd.Series:
            v = pd.to_numeric(s.str.replace(",", "", regex=False), errors="coerce")
            # pandas' parser and float() disagree on a few exotic forms
            # ("1_0", "infinity") — re-parse only the coerced misses
            miss = v.isna() & (s != "")
            if miss.any():
                v.loc[miss] = [normalize_number(x) for x in s.loc[miss]]
            return v.astype(float)

        for q, idx in qt.fillna("").groupby(qt.fillna("")).groups.items():
            gg, oo = g.loc[idx], o.loc[idx]
            if q == "multiple choice":
                res.loc[idx] = (gg == oo).astype(float)
            elif q == "numerical":
                sep = gg.str.contains(r"[.,]") == oo.str.contains(r"[.,]")
                gn, on = nums(gg), nums(oo)
                ok = sep & gn.notna() & on.notna() & (gn.round(2) == on.round(2))
                res.loc[idx] = ok.astype(float)
            elif q == "regression":
                gn, on = nums(gg), nums(oo)
                rel = np.minimum(
                    1.0,
                    np.maximum(
                        0.0, ((on - gn).abs() + 1e-9) / (gn.abs() + 1e-9)
                    ),
                )
                # inf-inf → NaN: the reference's max(0.0, nan) keeps 0.0
                # (Python comparison), so NaN rel means reward 1.0
                rel = np.where(np.isnan(rel), 0.0, rel)
                res.loc[idx] = np.where(gn.notna() & on.notna(), 1 - rel, 0.0)
            elif q == "OCR":
                res.loc[idx] = [
                    max(0.0, min(1.0, 1 - wer(a, b))) for a, b in zip(gg, oo)
                ]
            elif q == "free-form":
                res.loc[idx] = [
                    max(0.0, min(1.0, compute_rouge_score(a, b)))
                    for a, b in zip(gg, oo)
                ]
        return res

    # WER/ROUGE kernels are per-row Python on 2 of 5 dispatch branches —
    # heavy enough to repay spreading a narrow batch input (see
    # _spread_batch; no-op for streaming / many-split inputs)
    return _spread_batch(df).withColumn(
        reward_col, _reward(F.col(solution_col), F.col(output_col), F.col(qtype_col))
    )


def basic_normalize_text(
    df: DataFrame, text_col: str = "text", out_col: str = "text_norm"
) -> DataFrame:
    """BasicTextNormalizer-equivalent: lowercase → remove [(...)]/[...]
    spans → non-word symbols to space → collapse whitespace → trim."""
    e = f"lower({text_col})"
    e = f"regexp_replace({e}, '[<\\\\[][^>\\\\]]*[>\\\\]]', '')"
    e = f"regexp_replace({e}, '\\\\(([^)]+?)\\\\)', '')"
    e = f"regexp_replace({e}, '[^\\\\p{{L}}\\\\p{{N}}\\\\s]', ' ')"
    e = f"trim(regexp_replace({e}, '\\\\s+', ' '))"
    return df.withColumn(out_col, F.expr(e))


def english_normalize_text(
    df: DataFrame, text_col: str = "text", out_col: str = "text_norm"
) -> DataFrame:
    """TextNormalizer's ``language="en"`` path
    (audio_text_normalizer.py:29-31 → whisper EnglishTextNormalizer):
    the full contraction/filler/symbol pipeline as one Catalyst
    expression chain (see functions/whisper_en.py for scope notes)."""
    from ..functions.whisper_en import english_normalize_sql

    # the regexp chain is CPU-heavy enough that a 1-file bench corpus
    # must not run it on one core (same rationale as _spread_batch)
    return _spread_batch(df).withColumn(
        out_col, F.expr(english_normalize_sql("spark", text_col))
    )


def _spread_batch(df: DataFrame) -> DataFrame:
    """Arrow-UDF stages over a small file count would otherwise run in
    as few tasks as there are input splits (a 1-file bench corpus = one
    core doing all the per-row work) — spread batch inputs to the
    cluster parallelism first. No-op on streaming frames (repartition
    would add an exchange per micro-batch) and at real scale where
    splits >> cores (dedup._spread's guard)."""
    if df.isStreaming:
        return df
    from .dedup import _spread

    return _spread(df)


def english_normalize_full(
    df: DataFrame, text_col: str = "text", out_col: str = "text_norm"
) -> DataFrame:
    """The COMPLETE Whisper-style en pipeline: the SQL prefix of
    ``english_normalize_text`` runs JVM-side, then the spelled-number
    FST + British→American spelling table (the two passes
    functions/whisper_en.py scopes out of SQL) as one Arrow-batched
    stage, then the final symbol regexes vectorized in pandas. The
    word-by-word FST is inherently sequential per row, hence per-row
    Python inside the Arrow batch (functions/whisper_en_numbers.py)."""
    import re as _re

    from pyspark.sql.types import StringType

    from ..functions.whisper_en import english_normalize_sql
    from ..functions.whisper_en_numbers import (
        EnglishNumberNormalizer,
        EnglishSpellingNormalizer,
    )

    df = _spread_batch(df)
    pre = F.expr(english_normalize_sql("spark", text_col, pre_numbers=True))

    @F.pandas_udf(StringType())
    def _post(texts: pd.Series) -> pd.Series:
        num = EnglishNumberNormalizer()
        spell = EnglishSpellingNormalizer()
        # trigger prefilter: a row with no digit, no number word and no
        # GB spelling is a pure pass-through for both data passes — for
        # those the FST's only observable effect is the token re-join,
        # which vectorizes; the per-row state machine runs only on rows
        # that can change (typically a small minority of a corpus)
        num_words = sorted(num.words | {"half"}, key=len, reverse=True)
        trigger = _re.compile(
            r"\d|\b(?:" + "|".join(map(_re.escape, num_words)) + r")\b"
        )
        # spelling trigger via token set-membership, not a giant regex
        # alternation: the table is ~1100 entries now and Python re
        # scans alternatives linearly per position, while dict lookups
        # on the split tokens are O(tokens) — the same exact-token
        # semantics EnglishSpellingNormalizer itself applies
        mapping = spell.mapping
        s = texts.fillna("")
        spell_slow = s.map(
            lambda t: any(w in mapping for w in t.split())
        )
        slow = s.str.contains(trigger) | spell_slow
        out = s.str.split().str.join(" ")
        out.loc[slow] = s.loc[slow].map(lambda t: spell(num(t)))
        out = out.str.replace(r"[.$¢€£]([^0-9])", r" \1", regex=True)
        out = out.str.replace(r"([^0-9])%", r"\1 ", regex=True)
        out = out.str.replace(r"\s+", " ", regex=True)
        return out

    return df.withColumn(out_col, _post(pre))


def chinese_normalize_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "text_norm",
    to_banjiao: bool = True,
    remove_fillers: bool = True,
    remove_erhua: bool = True,
    remove_space: bool = False,
    cc_mode: str = "",
) -> DataFrame:
    """TextNormalizer's ``language="zh"`` path (audio_text_normalizer.py:
    32-41 → cn_tn.TextNorm): rule-driven subset via the tested port
    inside an Arrow-batched pandas UDF (the erhua whitelist scan is a
    sequential string loop — not expressible as SQL; see
    oracle/cn_tn_port.py for the scoped-out number verbalizer).
    ``cc_mode='t2s'`` enables the curated traditional→simplified char
    conversion first, like the reference's OpenCC hook
    (cn_tn.py:1078-1084; functions/cc_t2s.py for scope)."""
    from pyspark.sql.types import StringType

    from ..functions.cn_tn_numbers import NSW_EXTRA_TRIGGER_CHARS
    from ..oracle.cn_tn_port import (
        ERHUA_TRIGGER_CHAR,
        FILLER_CHARS,
        PUNCS,
        QJ2BJ_TRANSFORM,
        text_norm_zh,
    )

    # trigger prefilter (VERDICT r3 item 3), mirroring the en path: a row
    # containing NONE of the characters any pass can touch is a byte
    # identity — vectorize those, run the per-row pipeline only on rows
    # that can change. Built ENTIRELY from the ports' own exported
    # tables so it cannot drift: fullwidth block (QJ2BJ), fillers,
    # ERHUA_TRIGGER_CHAR, CJK+ASCII punctuation (PUNCS; includes ^ and
    # $, whose edge-strip quirk normalize_nsw inherits from the public
    # cn_tn), digits (every NSW category), and NSW_EXTRA_TRIGGER_CHARS
    # (％ fold, letter-二-letter restore — declared next to the passes
    # that consume them). Superset-safe: a trigger char only sends the
    # row to the slow path; the trigger-free-identity property test in
    # tests/test_cn_tn.py enforces completeness.
    import re as _re
    import string as _string

    trigger_chars = (
        set(PUNCS)
        | set(FILLER_CHARS)
        | {ERHUA_TRIGGER_CHAR}
        | set(NSW_EXTRA_TRIGGER_CHARS)
        | {chr(c) for c in QJ2BJ_TRANSFORM}
        | set(_string.digits)
    )
    if remove_space:
        trigger_chars |= set(_string.whitespace)
    if cc_mode:
        from ..functions.cc_t2s import T2S_TRIGGER_CHARS

        trigger_chars |= set(T2S_TRIGGER_CHARS)
    trigger_re = "[" + "".join(map(_re.escape, sorted(trigger_chars))) + "]"

    @F.pandas_udf(StringType())
    def _norm(texts: pd.Series) -> pd.Series:
        s = texts.fillna("")
        slow = s.str.contains(trigger_re, regex=True)
        out = s.copy()
        out.loc[slow] = s.loc[slow].map(
            lambda t: text_norm_zh(
                t,
                to_banjiao=to_banjiao,
                remove_fillers=remove_fillers,
                do_remove_erhua=remove_erhua,
                do_remove_space=remove_space,
                cc_mode=cc_mode,
            )
        )
        return out

    return _spread_batch(df).withColumn(out_col, _norm(F.col(text_col)))


def wiki_qa_refiner(
    df: DataFrame,
    text_col: str = "text",
    output_col: str = "wiki_qa",
) -> DataFrame:
    """WikiQARefiner (wiki_qa_refiner.py:22-79): tolerant parse of
    'Wikipedia article + QA' text into a typed struct
    {context string, qas array<struct<question,answer>>}, via the tested
    reference port inside an Arrow-batched pandas UDF."""
    from pyspark.sql.types import ArrayType, StringType, StructField, StructType

    from ..oracle.reference_port import parse_wiki_qa

    schema = StructType(
        [
            StructField("context", StringType()),
            StructField(
                "qas",
                ArrayType(
                    StructType(
                        [
                            StructField("question", StringType()),
                            StructField("answer", StringType()),
                        ]
                    )
                ),
            ),
        ]
    )

    from ..oracle.reference_port import (
        WIKI_QA_FALLBACK_PATTERN,
        WIKI_QA_SPLIT_PATTERN,
    )

    @F.pandas_udf(schema)
    def _parse(texts: pd.Series) -> pd.DataFrame:
        # prefilter (VERDICT r3 item 5): a row matching NEITHER dispatch
        # pattern takes the no-QA branch, whose whole effect is
        # whitespace normalization — vectorized here; the tolerant
        # per-row parse runs only on rows with QA markers (a small
        # minority of a real document corpus). The patterns are the
        # port's own module constants, so the split cannot drift.
        s = texts.fillna("").astype(str)
        slow = s.str.contains(WIKI_QA_SPLIT_PATTERN) | s.str.contains(
            WIKI_QA_FALLBACK_PATTERN
        )
        context = (
            s.str.replace(r"\s+", " ", regex=True).str.strip().tolist()
        )
        qas: list[list] = [[] for _ in range(len(s))]
        for i in slow.to_numpy().nonzero()[0]:
            p = parse_wiki_qa(s.iloc[i])
            context[i] = p["context"]
            qas[i] = [(qa["question"], qa["answer"]) for qa in p["qas"]]
        return pd.DataFrame({"context": context, "qas": qas})

    # NB: no _spread_batch here — with the prefilter the parse is so
    # light that the repartition exchange costs more than it buys
    # (measured 0.60 s -> 1.00 s at sf0.1); the heavy-UDF refiners
    # (zh, en-full) are the ones that repay the shuffle
    return df.withColumn(output_col, _parse(F.col(text_col)))
