"""Chinese NSW (non-standard-word) number verbalization — the
``normalize_nsw`` pass of the reference's zh TextNormalizer
(cn_tn.py:169-983; that file is itself the public Qwen2-Audio /
speechio ``cn_tn.py``, per its own header).

Re-expressed as a token-list pipeline instead of the reference's
ChineseChar class hierarchy: a digit string becomes a list of
``("d", value)`` / ``("u", power)`` / ``("p",)`` tokens via the same
largest-unit-below-length recursion (mid numbering system: 万=10^4,
亿=10^8, 兆=10^12, …), then the 两-substitution and rendering rules
apply over the list. Only the simplified-script output the reference's
TextNorm actually uses is implemented (big/traditional renderings are
out of scope).

The category regexes (date / money / phone / fraction / percent /
quantifier / digit-run / cardinal, applied in that order with
first-occurrence replacement) are data tables reproduced from the
public source, like the erhua whitelist in oracle/cn_tn_port.py.
"""

from __future__ import annotations

import re

_DIGITS = "零一二三四五六七八九"
_LIANG = "两"
_POINT = "点"

#: mid numbering system: (power, glyph), ascending power
_UNITS: list[tuple[int, str]] = [(1, "十"), (2, "百"), (3, "千"), (4, "万")] + [
    ((i + 2) * 4, g) for i, g in enumerate("亿兆京垓秭穰沟涧正载")
]
_GLYPH = dict(_UNITS)


def _int_tokens(value_string: str) -> list:
    """cn_tn.py num2chn.get_value: recursive largest-unit split. The
    left split keeps leading zeros (they re-enter recursion and emit a
    single 零 when a zero-run precedes a lone digit)."""
    stripped = value_string.lstrip("0")
    if not stripped:
        return []
    if len(stripped) == 1:
        d = [("d", int(stripped))]
        if len(value_string) != len(stripped):
            return [("d", 0)] + d
        return d
    power = max(p for p, _ in _UNITS if p < len(stripped))
    return (
        _int_tokens(value_string[:-power])
        + [("u", power)]
        + _int_tokens(stripped[-power:])
    )


def num2chn(number_string: str, alt_two: bool = True, use_units: bool = True) -> str:
    """Digit string (optionally with one '.') → simplified CJK reading.

    ``use_units=False`` reads digit-by-digit (telephone / year style);
    ``alt_two`` renders 2 as 两 before a non-十 unit when not itself
    following a 十 unit (the reference's liang rule)."""
    int_dec = number_string.split(".")
    if len(int_dec) == 1:
        int_string, dec_string = int_dec[0], ""
    elif len(int_dec) == 2:
        int_string, dec_string = int_dec
    else:
        raise ValueError(
            f"invalid input num string with more than one dot: {number_string}"
        )

    if use_units and len(int_string) > 1:
        toks = _int_tokens(int_string)
    else:
        toks = [("d", int(c)) for c in int_string]
    if dec_string:
        toks += [("p",)] + [("d", int(c)) for c in dec_string]

    def render(i: int, tok) -> str:
        if tok[0] == "p":
            return _POINT
        if tok[0] == "u":
            return _GLYPH[tok[1]]
        if alt_two and tok[1] == 2:
            nxt = toks[i + 1] if i + 1 < len(toks) else None
            prev = toks[i - 1] if i > 0 else None
            if (
                nxt is not None and nxt[0] == "u" and nxt[1] != 1
                and (prev is None or (prev[0] == "u" and prev[1] != 1))
            ):
                return _LIANG
        return _DIGITS[tok[1]]

    result = "".join(render(i, t) for i, t in enumerate(toks))
    if result.startswith(_POINT):
        result = _DIGITS[0] + result
    # 一十X → 十X (ten..nineteen drop the leading yi)
    if len(result) >= 2 and result[0] == "一" and result[1] == "十":
        result = result[1:]
    return result


# ---------------------------------------------------------------------------
# category rewriters (cn_tn.py:748-925) as functions over num2chn
# ---------------------------------------------------------------------------

def _digits_chn(s: str) -> str:
    return num2chn(s, alt_two=False, use_units=False)


def _telephone_chn(s: str, fixed: bool = False) -> str:
    if fixed:
        return "".join(_digits_chn(p) for p in s.split("-"))
    return "".join(_digits_chn(p) for p in s.strip("+").split())


def _fraction_chn(s: str) -> str:
    numerator, denominator = s.split("/")
    return num2chn(denominator) + "分之" + num2chn(numerator)


def _date_chn(s: str) -> str:
    try:
        year, other = s.strip().split("年", 1)
        year = _digits_chn(year) + "年"
    except ValueError:
        other, year = s, ""
    month = day = ""
    if other:
        try:
            month, day = other.strip().split("月", 1)
            month = num2chn(month) + "月"
        except ValueError:
            day, month = s, ""
        if day:
            day = num2chn(day[:-1]) + day[-1]
    return year + month + day


def _money_chn(s: str) -> str:
    for m, _ in re.findall(r"(\d+(\.\d+)?)", s):
        s = s.replace(m, num2chn(m))
    return s


def _percentage_chn(s: str) -> str:
    return "百分之" + num2chn(s.strip().strip("%"))


# ---------------------------------------------------------------------------
# normalize_nsw (cn_tn.py:928-1017): category regexes in fixed order,
# first-occurrence replacement, ^/$ sentinels
# ---------------------------------------------------------------------------

# data tables from the public source (cn_tn.py:42-51)
CURRENCY_UNITS = r"((亿|千万|百万|万|千|百)|(亿|千万|百万|万|千|百|)元|(亿|千万|百万|万|千|百|)块|角|毛|分)"
COM_QUANTIFIERS = (
    "(匹|张|座|回|场|尾|条|个|首|阙|阵|网|炮|顶|丘|棵|只|支|袭|辆|挑|担|颗|壳|窠|曲|墙|群|腔|"
    "砣|座|客|贯|扎|捆|刀|令|打|手|罗|坡|山|岭|江|溪|钟|队|单|双|对|出|口|头|脚|板|跳|枝|件|贴|"
    "针|线|管|名|位|身|堂|课|本|页|家|户|层|丝|毫|厘|分|钱|两|斤|担|铢|石|钧|锱|忽|(千|毫|微)克|"
    "毫|厘|分|寸|尺|丈|里|寻|常|铺|程|(千|分|厘|毫|微)米|撮|勺|合|升|斗|石|盘|碗|碟|叠|桶|笼|盆|"
    "盒|杯|钟|斛|锅|簋|篮|盘|桶|罐|瓶|壶|卮|盏|箩|箱|煲|啖|袋|钵|年|月|日|季|刻|时|周|天|秒|分|旬|"
    "纪|岁|世|更|夜|春|夏|秋|冬|代|伏|辈|丸|泡|粒|颗|幢|堆|条|根|支|道|面|片|张|颗|块)"
)

_P_DATE = re.compile(
    r"\D+((([089]\d|(19|20)\d{2})年)?(\d{1,2}月(\d{1,2}[日号])?)?)"
)
_P_MONEY = re.compile(
    r"\D+((\d+(\.\d+)?)[多余几]?" + CURRENCY_UNITS + r"(\d" + CURRENCY_UNITS + r"?)?)"
)
_P_MOBILE = re.compile(r"\D((\+?86 ?)?1([38]\d|5[0-35-9]|7[678]|9[89])\d{8})\D")
_P_FIXED = re.compile(r"\D((0(10|2[1-3]|[3-9]\d{2})-?)?[1-9]\d{6,7})\D")
_P_FRACTION = re.compile(r"(\d+/\d+)")
_P_PERCENT = re.compile(r"(\d+(\.\d+)?%)")
_P_QUANTIFIER = re.compile(r"(\d+(\.\d+)?)[多余几]?" + COM_QUANTIFIERS)
_P_DIGIT_RUN = re.compile(r"(\d{4,32})")
_P_CARDINAL = re.compile(r"(\d+(\.\d+)?)")
_P_LETTER2 = re.compile(r"(([a-zA-Z]+)二([a-zA-Z]+))")


#: Characters outside the caller's other trigger tables (digits, PUNCS,
#: fillers, fullwidth block) that any normalize_nsw pass can touch on
#: RAW input: ％ (folded to % before the percent pass) and 二 (the
#: letter-二-letter → letter-2-letter restore fires with no digit
#: present). The zh prefilter (operators/refine.py text_norm_zh path)
#: consumes this — keep it in sync with the passes above; the
#: trigger-free-identity property test (tests/test_cn_tn.py) enforces
#: the contract hypothesis-style.
NSW_EXTRA_TRIGGER_CHARS = frozenset({"％", "二"})


#: cheap NECESSARY-condition gates for the category passes. Every
#: non-no-op replacement of a pass requires at least one of the gated
#: characters in the text at that point (date: a literal 年 or 月 next
#: to digits; money: a currency unit char; everything but letter-二
#: -letter: a digit), so skipping a gated-out findall is an identity —
#: it could only have produced empty or absent matches, whose
#: ``replace(m, f(m), 1)`` calls were already no-ops. The gates matter
#: because the \D+-prefixed patterns backtrack O(n²) over long
#: digit-free stretches (measured 1.25 ms per _P_MONEY.findall on a
#: 300-char corpus row — the dominant normalize_zh cost).
_P_HAS_DIGIT = re.compile(r"\d")
_P_HAS_DATE_CHAR = re.compile("[年月]")
# money's payload is \d+(\.\d+)?[多余几]?<unit>…: any non-empty match
# contains this digit→unit adjacency, and probing for it is O(n) with
# no \D+ backtracking (a bare unit-char probe still let 百分点 rows pay
# the full quadratic findall)
_P_HAS_CURRENCY_CHAR = re.compile(r"\d(\.\d+)?[多余几]?[亿万千百元块角毛分]")


def normalize_nsw(raw_text: str) -> str:
    """Verbalize dates, money, phone numbers, fractions, percentages,
    quantified cardinals, long digit runs, and remaining cardinals —
    same categories, order, and first-occurrence replacement as the
    public cn_tn normalize_nsw."""
    text = "^" + raw_text + "$"

    # no pass below (except ％-fold and letter-二-letter) can rewrite a
    # digit-free text, and the passes only ever CONSUME digits, so one
    # up-front probe gates them all
    if _P_HAS_DIGIT.search(text):
        if _P_HAS_DATE_CHAR.search(text):
            for m in _P_DATE.findall(text):
                text = text.replace(m[0], _date_chn(m[0]), 1)
        if _P_HAS_CURRENCY_CHAR.search(text):
            for m in _P_MONEY.findall(text):
                text = text.replace(m[0], _money_chn(m[0]), 1)
        for m in _P_MOBILE.findall(text):
            text = text.replace(m[0], _telephone_chn(m[0]), 1)
        for m in _P_FIXED.findall(text):
            text = text.replace(m[0], _telephone_chn(m[0], fixed=True), 1)
        for m in _P_FRACTION.findall(text):
            text = text.replace(m, _fraction_chn(m), 1)
        text = text.replace("％", "%")
        for m in _P_PERCENT.findall(text):
            text = text.replace(m[0], _percentage_chn(m[0]), 1)
        for m in _P_QUANTIFIER.findall(text):
            text = text.replace(m[0], num2chn(m[0]), 1)
        for m in _P_DIGIT_RUN.findall(text):
            text = text.replace(m, _digits_chn(m), 1)
        for m in _P_CARDINAL.findall(text):
            text = text.replace(m[0], num2chn(m[0]), 1)
    else:
        text = text.replace("％", "%")
    # restore P2P, O2O, B2C, … (letter-二-letter back to the digit)
    if "二" in text:
        for m in _P_LETTER2.findall(text):
            text = text.replace(m[0], m[1] + "2" + m[2], 1)

    return text.lstrip("^").rstrip("$")
