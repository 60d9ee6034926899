"""Whisper-style English text normalization as declarative SQL (dual
dialect).

The reference's TextNormalizer selects ``EnglishTextNormalizer`` from the
public ``whisper_normalizer`` package for ``language="en"``
(audio_text_normalizer.py:29-31) — the normalizer published with OpenAI
Whisper (MIT). This module re-expresses that pipeline as one chained
``regexp_replace`` expression so the en path runs JVM-side in whole-stage
codegen (and identically in DuckDB for the oracle):

1. lowercase
2. drop ``[bracketed]``/``<tagged>`` and ``(parenthesized)`` spans
3. drop hesitation fillers (hmm/mm/mhm/mmm/uh/um)
4. attach dangling apostrophes, expand contractions and spelled titles
   (won't → will not, mr → mister, 'll → will, …)
5. join digit groups (1,000 → 1000), turn sentence periods into spaces
   while keeping decimal points
6. replace remaining symbols with spaces, keeping the numeric symbols
   ``.%$¢€£``; strip their non-numeric uses afterwards
7. collapse whitespace

Documented deltas vs the full package (same rationale as
``normalize_sql``'s NFD note):

* the spelled-number FST (``EnglishNumberNormalizer``) and the
  British→American spelling table (``EnglishSpellingNormalizer``, a
  ~2k-entry data file shipped with the package) are identity passes —
  neither a data file nor an FST belongs in a SQL expression; the
  Python twin in ``oracle/whisper_en.py`` upgrades to the real package
  automatically when it is importable, so the delta is measurable;
* unicode NFKD + combining-mark removal has no SQL equivalent — on
  non-ASCII input combining marks become spaces instead of vanishing.
"""

from __future__ import annotations

from .dialect import DIALECTS

# Hesitation fillers removed outright (whisper_normalizer english.py).
IGNORE_PATTERN = r"\b(hmm|mm|mhm|mmm|uh|um)\b"

# Ordered (pattern, replacement) pairs — order is semantic (specific
# contractions before the generic 's/'d/'ll fallbacks).
REPLACERS: list[tuple[str, str]] = [
    # common contractions
    (r"\bwon't\b", "will not"),
    (r"\bcan't\b", "can not"),
    (r"\blet's\b", "let us"),
    (r"\bain't\b", "aint"),
    (r"\by'all\b", "you all"),
    (r"\bwanna\b", "want to"),
    (r"\bgotta\b", "got to"),
    (r"\bgonna\b", "going to"),
    (r"\bi'ma\b", "i am going to"),
    (r"\bimma\b", "i am going to"),
    (r"\bwoulda\b", "would have"),
    (r"\bcoulda\b", "could have"),
    (r"\bshoulda\b", "should have"),
    (r"\bma'am\b", "madam"),
    # spelled titles / prefixes
    (r"\bmr\b", "mister "),
    (r"\bmrs\b", "missus "),
    (r"\bst\b", "saint "),
    (r"\bdr\b", "doctor "),
    (r"\bprof\b", "professor "),
    (r"\bcapt\b", "captain "),
    (r"\bgov\b", "governor "),
    (r"\bald\b", "alderman "),
    (r"\bgen\b", "general "),
    (r"\bsen\b", "senator "),
    (r"\brep\b", "representative "),
    (r"\bpres\b", "president "),
    (r"\brev\b", "reverend "),
    (r"\bhon\b", "honorable "),
    (r"\basst\b", "assistant "),
    (r"\bassoc\b", "associate "),
    (r"\blt\b", "lieutenant "),
    (r"\bcol\b", "colonel "),
    (r"\bjr\b", "junior "),
    (r"\bsr\b", "senior "),
    (r"\besq\b", "esquire "),
    # perfect tenses
    (r"'d been\b", " had been"),
    (r"'s been\b", " has been"),
    (r"'d gone\b", " had gone"),
    (r"'s gone\b", " has gone"),
    (r"'d done\b", " had done"),
    (r"'s got\b", " has got"),
    # general contractions
    (r"n't\b", " not"),
    (r"'re\b", " are"),
    (r"'s\b", " is"),
    (r"'d\b", " would"),
    (r"'ll\b", " will"),
    (r"'t\b", " not"),
    (r"'ve\b", " have"),
    (r"'m\b", " am"),
]

KEEP_SYMBOLS = ".%$¢€£"


def english_normalize_sql(dialect: str, t: str, pre_numbers: bool = False) -> str:
    """The EnglishTextNormalizer pipeline (minus number/spelling data
    passes) as a single SQL string expression.

    ``pre_numbers=True`` stops right before the number-FST slot (after
    the symbol cleanup) — ``operators/refine.english_normalize_full``
    runs this SQL prefix JVM-side, then the Python number/spelling stage
    (functions/whisper_en_numbers.py), then the final three regexes."""
    d = DIALECTS[dialect]
    b1 = d.backref(1)
    e = f"lower({t})"
    e = d.regexp_replace_all(e, r"[<\[][^>\]]*[>\]]", "")
    e = d.regexp_replace_all(e, r"\(([^)]+?)\)", "")
    e = d.regexp_replace_all(e, IGNORE_PATTERN, "")
    e = d.regexp_replace_all(e, r"\s+'", "'")
    for pat, repl in REPLACERS:
        e = d.regexp_replace_all(e, pat, repl)
    e = d.regexp_replace_all(e, r"(\d),(\d)", f"{b1}{d.backref(2)}")
    e = d.regexp_replace_all(e, r"\.([^0-9]|$)", f" {b1}")
    # symbols → space, keeping numeric symbols (SQL stand-in for
    # remove_symbols_and_diacritics; exact on ASCII)
    e = d.regexp_replace_all(e, r"[^\p{L}\p{N}\s.%$¢€£]", " ")
    if pre_numbers:
        return e
    e = d.regexp_replace_all(e, r"[.$¢€£]([^0-9])", f" {b1}")
    e = d.regexp_replace_all(e, r"([^0-9])%", f"{b1} ")
    e = d.regexp_replace_all(e, r"\s+", " ")
    return e
