"""Structural port of the reference's Chinese ``TextNorm`` (test oracle).

Mirrors cn_tn.py's option pipeline (cn_tn.py:1082-1116) for the
rule-driven steps — fullwidth→halfwidth (QJ2BJ, :63-160, the standard
U+FF01–FF5E shift + ideographic space), case folding, filler removal
(:31), whitelist-protected erhua removal (:1020-1044), punctuation→space
(:54-59) and inter-token space handling (:1047-1056). The
``normalize_nsw`` number verbalizer (cn_tn.py:928-1017) is real as of
round 3 — functions/cn_tn_numbers.py re-expresses the full CJK
cardinal / digit / telephone / date / money / fraction / percent
verbalization. ``cc_mode`` (OpenCC) and ``check_chars`` (vocabulary
table) remain out of container scope.
"""

from __future__ import annotations

import re
import string

from ..functions.cn_tn_numbers import normalize_nsw

# cn_tn.py:31
FILLER_CHARS = ["呃", "啊"]

# cn_tn.py:33-40 (verbatim whitelist: 儿 kept when part of these words)
ER_WHITELIST = (
    "(儿女|儿子|儿孙|女儿|儿媳|妻儿|"
    "胎儿|婴儿|新生儿|婴幼儿|幼儿|少儿|小儿|儿歌|儿童|儿科|托儿所|孤儿|"
    "儿戏|儿化|台儿庄|鹿儿岛|正儿八经|吊儿郎当|生儿育女|托儿带女|养儿防老|痴儿呆女|"
    "佳儿佳妇|儿怜兽扰|儿无常父|儿不嫌母丑|儿行千里母担忧|儿大不由爷|苏乞儿)"
)
ER_WHITELIST_PATTERN = re.compile(ER_WHITELIST)

# cn_tn.py:63-160 — fullwidth → halfwidth
QJ2BJ_TRANSFORM = {0x3000: " "}
QJ2BJ_TRANSFORM.update({0xFF01 + i: chr(0x21 + i) for i in range(0x5E)})

# cn_tn.py:54-59 — CJK + ASCII punctuation replaced with space
CN_PUNCS_STOP = "！？｡。"
CN_PUNCS_NONSTOP = (
    "＂＃＄％＆＇（）＊＋，－／：；＜＝＞＠［＼］＾＿｀｛｜｝～｟｠｢｣､、〃《》「」"
    "『』【】〔〕〖〗〘〙〚〛〜〝〞〟〰〾〿–—‘’‛“”„‟…‧﹏·〈〉-"
)
PUNCS = CN_PUNCS_STOP + CN_PUNCS_NONSTOP + string.punctuation
PUNCS_TRANSFORM = str.maketrans(PUNCS, " " * len(PUNCS), "")


#: the only character the erhua pass can touch — exported so the zh
#: prefilter (operators/refine.py) derives its trigger set from the
#: port's own tables instead of hard-coding it
ERHUA_TRIGGER_CHAR = "儿"


def remove_erhua(text: str) -> str:
    """cn_tn.py:1020-1044, loop-for-loop: drop 儿 unless the next
    whitelist hit starts at or before it."""
    new_str = ""
    while re.search("儿", text):
        a = re.search("儿", text).span()
        remove_er_flag = 0
        if ER_WHITELIST_PATTERN.search(text):
            b = ER_WHITELIST_PATTERN.search(text).span()
            if b[0] <= a[0]:
                remove_er_flag = 1
        if remove_er_flag == 0:
            new_str = new_str + text[0 : a[0]]
            text = text[a[1] :]
        else:
            new_str = new_str + text[0 : b[1]]
            text = text[b[1] :]
    return new_str + text


_EN_CHARS = set(string.ascii_letters + string.digits + "'")


def remove_space(text: str) -> str:
    """cn_tn.py:1047-1056: drop whitespace except between EN tokens."""
    tokens = text.split()
    new = []
    for k, t in enumerate(tokens):
        if k != 0 and tokens[k - 1][-1] in _EN_CHARS and t[0] in _EN_CHARS:
            new.append(" ")
        new.append(t)
    return "".join(new)


def text_norm_zh(
    text: str,
    to_banjiao: bool = False,
    to_upper: bool = False,
    to_lower: bool = False,
    remove_fillers: bool = False,
    do_remove_erhua: bool = False,
    do_remove_space: bool = False,
    cc_mode: str = "",
) -> str:
    """TextNorm.__call__ (cn_tn.py:1082-1116) minus check_chars
    (module docstring). ``cc_mode='t2s'`` applies the curated
    traditional→simplified char table FIRST, matching the reference's
    OpenCC placement (cn_tn.py:1083-1084); ``'s2t'`` is gated — the
    simplified→traditional direction is one→many at char level and
    cannot be done faithfully without OpenCC's phrase data."""
    text = text or ""
    if cc_mode == "t2s":
        from ..functions.cc_t2s import t2s

        text = t2s(text)
    elif cc_mode:
        raise NotImplementedError(
            f"cc_mode={cc_mode!r}: only 't2s' is supported without the "
            "OpenCC package (s2t is one-to-many at char granularity)"
        )
    if to_banjiao:
        text = text.translate(QJ2BJ_TRANSFORM)
    if to_upper:
        text = text.upper()
    if to_lower:
        text = text.lower()
    if remove_fillers:
        for c in FILLER_CHARS:
            text = text.replace(c, "")
    if do_remove_erhua:
        text = remove_erhua(text)
    text = normalize_nsw(text)
    text = text.translate(PUNCS_TRANSFORM)
    if do_remove_space:
        text = remove_space(text)
    return text
