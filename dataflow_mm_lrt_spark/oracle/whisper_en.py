"""Row-at-a-time Python twin of ``functions/whisper_en.py`` (test oracle).

Mirrors the public Whisper ``EnglishTextNormalizer`` pipeline that the
reference's TextNormalizer selects for ``language="en"``
(audio_text_normalizer.py:29-31). The spelled-number FST and the
British→American spelling table are identity passes here, matching the
engine's documented scope — unless the real ``whisper_normalizer``
package is importable, in which case ``external_normalizer()`` returns
it so parity tests can measure the delta directly.
"""

from __future__ import annotations

import re
import unicodedata

from ..functions.whisper_en import IGNORE_PATTERN, KEEP_SYMBOLS, REPLACERS


def remove_symbols_and_diacritics(s: str, keep: str = "") -> str:
    """NFKD-decompose, drop combining marks, symbols/punct → space."""
    out = []
    for c in unicodedata.normalize("NFKD", s):
        if c in keep:
            out.append(c)
        elif unicodedata.category(c) == "Mn":
            continue
        elif unicodedata.category(c)[0] in "MSP":
            out.append(" ")
        else:
            out.append(c)
    return "".join(out)


def english_text_normalizer(s: str) -> str:
    s = (s or "").lower()
    s = re.sub(r"[<\[][^>\]]*[>\]]", "", s)
    s = re.sub(r"\(([^)]+?)\)", "", s)
    s = re.sub(IGNORE_PATTERN, "", s)
    s = re.sub(r"\s+'", "'", s)
    for pat, repl in REPLACERS:
        s = re.sub(pat, repl, s)
    s = re.sub(r"(\d),(\d)", r"\1\2", s)
    s = re.sub(r"\.([^0-9]|$)", r" \1", s)
    s = remove_symbols_and_diacritics(s, keep=KEEP_SYMBOLS)
    # number / spelling standardization: identity (see module docstring)
    s = re.sub(r"[.$¢€£]([^0-9])", r" \1", s)
    s = re.sub(r"([^0-9])%", r"\1 ", s)
    s = re.sub(r"\s+", " ", s)
    return s


def english_text_normalizer_full(s: str) -> str:
    """The complete pipeline including the number FST and the spelling
    table (functions/whisper_en_numbers.py) — the Python twin of
    ``operators/refine.english_normalize_full``."""
    from ..functions.whisper_en_numbers import (
        EnglishNumberNormalizer,
        EnglishSpellingNormalizer,
    )

    s = (s or "").lower()
    s = re.sub(r"[<\[][^>\]]*[>\]]", "", s)
    s = re.sub(r"\(([^)]+?)\)", "", s)
    s = re.sub(IGNORE_PATTERN, "", s)
    s = re.sub(r"\s+'", "'", s)
    for pat, repl in REPLACERS:
        s = re.sub(pat, repl, s)
    s = re.sub(r"(\d),(\d)", r"\1\2", s)
    s = re.sub(r"\.([^0-9]|$)", r" \1", s)
    s = remove_symbols_and_diacritics(s, keep=KEEP_SYMBOLS)
    s = EnglishNumberNormalizer()(s)
    s = EnglishSpellingNormalizer()(s)
    s = re.sub(r"[.$¢€£]([^0-9])", r" \1", s)
    s = re.sub(r"([^0-9])%", r"\1 ", s)
    s = re.sub(r"\s+", " ", s)
    return s


def external_normalizer():
    """The real whisper_normalizer EnglishTextNormalizer if installed."""
    try:
        from whisper_normalizer.english import EnglishTextNormalizer

        return EnglishTextNormalizer()
    except ImportError:
        return None
