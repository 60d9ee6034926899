"""The reference's 15 heuristic text-quality rules as declarative SQL.

Faithful re-expression of ``RuleBaseFilter._apply_text_filters``
(/root/reference/dataflow/operators/core_vision/filter/rule_base_filter.py:243-354)
as *pure SQL expressions* in two dialects (Spark SQL for the engine,
DuckDB SQL for the oracle). The Spark side therefore runs entirely inside
whole-stage codegen — no Python in the hot path at any scale.

Each ``rule_*`` function returns a boolean *fail* expression (true → the
row fails that rule). ``keep_expr`` is the conjunction the engine uses;
a text is kept iff it is non-blank and no rule fires.

Known deliberate deltas from the reference Python (documented + covered
by the oracle-port tests in ``tests/test_text_rules.py``):

* ``\\s`` here is ASCII whitespace (Java/RE2 default) while python
  ``str.split()`` splits on unicode whitespace — fixtures are ASCII.
* rule 15 skips the NFD normalization step of ``normalize()``
  (rule_base_filter.py:53-54): NFD can neither create/destroy the
  substring ``javascript`` nor change line emptiness.
* ``str.isupper()`` is rendered as ``upper(w)=w AND lower(w)<>w`` (all
  cased chars upper + at least one cased char) — identical on ASCII.
"""

from __future__ import annotations

import string

from .dialect import DIALECTS, Dialect

# thresholds (reference defaults, rule_base_filter.py:72-84)
ELLIPSIS_THRESHOLD = 0.3
MEAN_WORD_LENGTH_MIN = 3
MEAN_WORD_LENGTH_MAX = 20
SYMBOL_WORD_RATIO_THRESHOLD = 0.4
ID_CARD_THRESHOLD = 3
NO_PUNC_THRESHOLD = 112
CURLY_BRACKET_THRESHOLD = 0.025
CAPITAL_WORDS_THRESHOLD = 0.2
LOREM_IPSUM_THRESHOLD = 3e-8
UNIQUE_WORDS_THRESHOLD = 0.1
BULLETPOINT_THRESHOLD = 0.9
JAVASCRIPT_THRESHOLD = 3
WATERMARKS = ["Copyright", "Watermark", "Confidential"]

# rule_base_filter.py:167-171 (verbatim, incl. the unescaped dots of I.D.)
ID_PATTERN = (
    r"(身\s{0,10}份|id\s{0,10}number\s{0,10}|identification|identity|"
    r"\s{0,10}ID\s{0,10}No\s{0,10}|id\s{0,10}card\s{0,10}|"
    r"NRIC\s{0,10}number\s{0,10}|IC\s{0,10}number\s{0,10}|"
    r"resident\s{0,10}registration\s{0,10}|I.D.\s{0,10}Number\s{0,10})"
)

# rule_base_filter.py:175-180
SPECIAL_CHAR_PATTERNS = [
    r"u200e",
    r"&#247;|\? :",
    "[�□]|\\{\\/U\\}",
    r"U\+26[0-F][0-D]|U\+273[3-4]|U\+1F[3-6][0-4][0-F]|U\+1F6[8-F][0-F]",
]

# rule_base_filter.py:183-190 — the ；/; suffixed variants are substrings
# of the plain '&entity' form, so checking the two prefixes suffices.
HTML_ENTITY_NAMES = [
    "nbsp", "lt", "gt", "amp", "quot", "apos", "hellip", "ndash",
    "mdash", "lsquo", "rsquo", "ldquo", "rdquo",
]

BULLET_CHARS = "•‣▶◀◦■□▪▫–"
SYMBOLS = ["#", "...", "…"]

_PUNCT = string.punctuation


def _tokens(d: Dialect, t: str, lowered: bool = False) -> str:
    """python ``text.split()`` — whitespace tokens, empties removed."""
    src = f"lower({t})" if lowered else t
    return d.filter(d.split(src, r"\s+"), "w", "w <> ''")


def _lines(d: Dialect, t: str) -> str:
    """split_paragraphs with identity normalizer (rule_base_filter.py:22-34):
    physical lines, blank (all-whitespace) lines removed."""
    blank_line = d.rlike("l", r"^\s*$")
    return d.filter(d.split(t, "\n"), "l", f"NOT {blank_line}")


def rule_blank(d: Dialect, t: str) -> str:
    """rule_base_filter.py:245-246 — null/empty/whitespace-only text."""
    no_ws = d.regexp_replace_all(t, r"\s", "")
    return f"({t} IS NULL OR length({no_ws}) = 0)"


def rule_colon_end(d: Dialect, t: str) -> str:
    """rule 1 (:252)."""
    return f"({t} LIKE '%:')"


def rule_ellipsis_lines(d: Dialect, t: str) -> str:
    """rule 2 (:256-261): ≥30% of non-blank lines end (after rstrip) with
    ``...`` or ``…``."""
    lines = _lines(d, t)
    ell = d.filter(lines, "l", d.rlike("l", r"(\.\.\.|…)\s*$"))
    return (
        f"(({d.size(ell)} * 1e0) / greatest({d.size(lines)}, 1)"
        f" >= {ELLIPSIS_THRESHOLD})"
    )


def rule_mean_word_length(d: Dialect, t: str) -> str:
    """rule 3 (:264-268): mean token length outside [3, 20)."""
    no_ws = d.regexp_replace_all(t, r"\s", "")
    chars = f"length({no_ws})"
    nw = d.size(_tokens(d, t))
    mean = f"(({chars} * 1e0) / greatest({nw}, 1))"
    return f"({mean} < {MEAN_WORD_LENGTH_MIN} OR {mean} >= {MEAN_WORD_LENGTH_MAX})"


def rule_symbol_word_ratio(d: Dialect, t: str) -> str:
    """rule 4 (:271-275): (#count + '...'count + '…'count)/words ≥ 0.4."""
    syms = " + ".join(d.count_literal(t, s) for s in SYMBOLS)
    nw = d.size(_tokens(d, t))
    return f"((({syms}) * 1e0) / greatest({nw}, 1) >= {SYMBOL_WORD_RATIO_THRESHOLD})"


def rule_html_entity(d: Dialect, t: str) -> str:
    """rule 5 (:278-279)."""
    checks = []
    for e in HTML_ENTITY_NAMES:
        checks.append(f"contains({t}, {d.lit('&' + e)})")
        checks.append(f"contains({t}, {d.lit('＆' + e)})")
    return "(" + " OR ".join(checks) + ")"


def rule_id_card(d: Dialect, t: str) -> str:
    """rule 6 (:282-284): ≥3 case-insensitive ID-pattern matches."""
    return f"({d.regexp_count(t, '(?i)' + ID_PATTERN)} >= {ID_CARD_THRESHOLD})"


def rule_no_punc_run(d: Dialect, t: str) -> str:
    """rule 7 (:287-299): longest punctuation-free sentence > 112 words."""
    sent_wc = d.size(d.filter(d.split("s", r"\s+"), "w", "w <> ''"))
    per_para = d.transform(d.split("p", "[–.!?,;•/|…]"), "s", sent_wc)
    all_counts = f"flatten({d.transform(d.split(t, chr(10)), 'p', per_para)})"
    return f"({d.array_max(all_counts)} > {NO_PUNC_THRESHOLD})"


def rule_special_chars(d: Dialect, t: str) -> str:
    """rule 8 (:302-303)."""
    return "(" + " OR ".join(d.rlike(t, p) for p in SPECIAL_CHAR_PATTERNS) + ")"


def rule_watermark(d: Dialect, t: str) -> str:
    """rule 9 (:306-307) — case-sensitive."""
    return d.rlike(t, "|".join(WATERMARKS))


def rule_curly_bracket(d: Dialect, t: str) -> str:
    """rule 10 (:310-313)."""
    cnt = f"({d.count_literal(t, '{')} + {d.count_literal(t, '}')})"
    return f"(({cnt} * 1e0) / greatest(length({t}), 1) >= {CURLY_BRACKET_THRESHOLD})"


def rule_capital_words(d: Dialect, t: str) -> str:
    """rule 11 (:316-319): fraction of all-caps tokens > 0.2 (strict)."""
    toks = _tokens(d, t)
    caps = d.filter(toks, "w", "(upper(w) = w AND lower(w) <> w)")
    return (
        f"(({d.size(caps)} * 1e0) / greatest({d.size(toks)}, 1)"
        f" > {CAPITAL_WORDS_THRESHOLD})"
    )


def rule_lorem_ipsum(d: Dialect, t: str) -> str:
    """rule 12 (:323-326)."""
    cnt = d.regexp_count(f"lower({t})", "lorem ipsum")
    return f"(({cnt} * 1e0) / greatest(length({t}), 1) > {LOREM_IPSUM_THRESHOLD})"


def rule_unique_words(d: Dialect, t: str) -> str:
    """rule 13 (:330-334): distinct(lower tokens)/tokens ≤ 0.1."""
    toks = _tokens(d, t, lowered=True)
    return (
        f"(({d.size(d.array_distinct(toks))} * 1e0) / greatest({d.size(toks)}, 1)"
        f" <= {UNIQUE_WORDS_THRESHOLD})"
    )


def rule_bulletpoint_lines(d: Dialect, t: str) -> str:
    """rule 14 (:338-343): >90% of non-blank lines start (after lstrip)
    with a bullet char."""
    lines = _lines(d, t)
    bullets = d.filter(lines, "l", d.rlike("l", r"^\s*[" + BULLET_CHARS + "]"))
    return (
        f"(({d.size(bullets)} * 1e0) / greatest({d.size(lines)}, 1)"
        f" > {BULLETPOINT_THRESHOLD})"
    )


def rule_javascript_lines(d: Dialect, t: str) -> str:
    """rule 15 (:346-352): over normalized non-empty lines (punct removed,
    lowered, whitespace collapsed — rule_base_filter.py:36-56), fail unless
    ≤3 lines or ≥3 lines without 'javascript'."""
    inner = f"lower(translate(l, {d.lit(_PUNCT)}, {d.lit('')}))"
    collapsed = d.regexp_replace_all(inner, r"\s+", " ")
    norm = f"trim({collapsed})"
    nl = d.filter(d.transform(d.split(t, "\n"), "l", norm), "x", "x <> ''")
    n = d.size(nl)
    js = d.size(d.filter(nl, "x", "contains(x, 'javascript')"))
    return (
        f"({n} > 0 AND NOT ({n} <= 3 OR ({n} - {js}) >= {JAVASCRIPT_THRESHOLD}))"
    )


# ordered rule registry: name -> builder(dialect, text_expr) -> fail-bool SQL
RULES = {
    "colon_end": rule_colon_end,
    "ellipsis_lines": rule_ellipsis_lines,
    "mean_word_length": rule_mean_word_length,
    "symbol_word_ratio": rule_symbol_word_ratio,
    "html_entity": rule_html_entity,
    "id_card": rule_id_card,
    "no_punc_run": rule_no_punc_run,
    "special_chars": rule_special_chars,
    "watermark": rule_watermark,
    "curly_bracket": rule_curly_bracket,
    "capital_words": rule_capital_words,
    "lorem_ipsum": rule_lorem_ipsum,
    "unique_words": rule_unique_words,
    "bulletpoint_lines": rule_bulletpoint_lines,
    "javascript_lines": rule_javascript_lines,
}


def keep_sql(dialect: str, t: str) -> str:
    """Boolean SQL: text passes all 15 rules (and is non-blank)."""
    d = DIALECTS[dialect]
    fails = " OR ".join(fn(d, t) for fn in RULES.values())
    return f"(NOT {rule_blank(d, t)} AND NOT ({fails}))"


def rule_flag_sql(dialect: str, rule: str, t: str) -> str:
    """Boolean SQL: the named rule *fires* (row would fail)."""
    d = DIALECTS[dialect]
    if rule == "blank":
        return rule_blank(d, t)
    return RULES[rule](d, t)


def keep_expr(t: str = "text"):
    """Spark Column for the full keep predicate (lazy import)."""
    from pyspark.sql import functions as F

    return F.expr(keep_sql("spark", t))
