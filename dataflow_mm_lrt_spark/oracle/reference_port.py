"""Faithful Python ports of reference operator semantics (test oracle).

Each function mirrors, branch for branch, a routine in
``/root/reference`` (citations inline). These are deliberately
row-at-a-time and unoptimized — they exist so the vectorized/declarative
engine can be diffed against the reference behavior in tests.
"""

from __future__ import annotations

import re
import string
import unicodedata

# ---------------------------------------------------------------------------
# normalize() — rule_base_filter.py:36-56
# ---------------------------------------------------------------------------


def normalize(
    text: str,
    remove_punct: bool = True,
    lowercase: bool = True,
    nfd_unicode: bool = True,
    white_space: bool = True,
) -> str:
    if remove_punct:
        text = text.translate(str.maketrans("", "", string.punctuation))
    if lowercase:
        text = text.lower()
    if white_space:
        text = text.strip()
        text = re.sub(r"\s+", " ", text)
    if nfd_unicode:
        text = unicodedata.normalize("NFD", text)
    return text


def split_paragraphs(text: str, normalizer, remove_empty: bool = True):
    """rule_base_filter.py:22-34 (returns line strings, not slices)."""
    slices = [
        normalizer(text[m.start() : m.end()])
        for m in re.finditer(r"([^\n]*\n|[^\n]+$)", text)
    ]
    if remove_empty:
        slices = [s for s in slices if s.strip()]
    return slices


# ---------------------------------------------------------------------------
# RuleBaseFilter._apply_text_filters — rule_base_filter.py:243-354
# ---------------------------------------------------------------------------

_SENT = re.compile(r"\b[^.!?\n]+[.!?]*", re.UNICODE)
_ID_PATTERN = re.compile(
    r"(身\s{0,10}份|id\s{0,10}number\s{0,10}|identification|identity|"
    r"\s{0,10}ID\s{0,10}No\s{0,10}|id\s{0,10}card\s{0,10}|"
    r"NRIC\s{0,10}number\s{0,10}|IC\s{0,10}number\s{0,10}|"
    r"resident\s{0,10}registration\s{0,10}|I.D.\s{0,10}Number\s{0,10})",
    re.I,
)
_SPECIAL_CHAR_PATTERNS = [
    r"u200e",
    r"&#247;|\? :",
    "[�□]|\\{\\/U\\}",
    r"U\+26[0-F][0-D]|U\+273[3-4]|U\+1F[3-6][0-4][0-F]|U\+1F6[8-F][0-F]",
]
_HTML_ENTITIES: list[str] = []
for _e in ["nbsp", "lt", "gt", "amp", "quot", "apos", "hellip", "ndash",
           "mdash", "lsquo", "rsquo", "ldquo", "rdquo"]:
    _HTML_ENTITIES.extend(
        [f"&{_e}；", f"&{_e};", f"＆{_e}；", f"＆{_e};", f"＆{_e}", f"&{_e}"]
    )
_BULLETS = ("•", "‣", "▶", "◀", "◦",
            "■", "□", "▪", "▫", "–")
_LOREM = re.compile(r"lorem ipsum", re.IGNORECASE)
_SYMBOLS = ["#", "...", "…"]
_WATERMARKS = ["Copyright", "Watermark", "Confidential"]


def apply_text_filters(text: str) -> bool:  # noqa: C901 (mirrors reference)
    """True iff the text passes all 15 rules (reference :243-354)."""
    if not text or not text.strip():
        return False
    words = text.split()
    num_words = len(words)

    if text.endswith(":"):
        return False

    raw_lines = split_paragraphs(text, lambda x: x, remove_empty=True)
    if raw_lines:
        ellipsis = sum(l.rstrip().endswith(("...", "…")) for l in raw_lines)
        if len(raw_lines) > 0 and ellipsis / len(raw_lines) >= 0.3:
            return False

    if num_words > 0:
        mean_len = sum(len(w) for w in words) / num_words
        if mean_len < 3 or mean_len >= 20:
            return False

    if num_words > 0:
        num_symbols = float(sum(text.count(s) for s in _SYMBOLS))
        if num_symbols / num_words >= 0.4:
            return False

    if any(e in text for e in _HTML_ENTITIES):
        return False

    if len(_ID_PATTERN.findall(text)) >= 3:
        return False

    max_wc = 0
    for paragraph in text.split("\n"):
        if len(paragraph.strip()) == 0:
            continue
        for sentence in re.split("[–.!?,;•/|…]", paragraph):
            max_wc = max(max_wc, len(sentence.split()))
    if max_wc > 112:
        return False

    if any(re.search(p, text) for p in _SPECIAL_CHAR_PATTERNS):
        return False

    if _WATERMARKS and re.search("|".join(_WATERMARKS), text):
        return False

    if len(text) > 0:
        if (text.count("{") + text.count("}")) / len(text) >= 0.025:
            return False

    if num_words > 0:
        if sum(map(str.isupper, words)) / num_words > 0.2:
            return False

    if len(text) > 0:
        if len(_LOREM.findall(text.lower())) / len(text) > 3e-8:
            return False

    if num_words > 0:
        norm_words = tuple(text.lower().split())
        if len(set(norm_words)) / len(norm_words) <= 0.1:
            return False

    if raw_lines and len(raw_lines) > 0:
        bullets = sum(l.lstrip().startswith(_BULLETS) for l in raw_lines)
        if bullets / len(raw_lines) > 0.9:
            return False

    norm_lines = split_paragraphs(text, normalize, remove_empty=True)
    if norm_lines:
        n = len(norm_lines)
        js = sum("javascript" in l.lower() for l in norm_lines)
        if not (n <= 3 or n - js >= 3):
            return False

    return True


# ---------------------------------------------------------------------------
# Conversation2Message — conversation_to_message.py:31-104
# ---------------------------------------------------------------------------


def parse_multimodal_tokens(text: str):
    """conversation_to_message.py:31-47."""
    counts = {
        "image": len(re.findall(r"<image>", text)),
        "video": len(re.findall(r"<video>", text)),
        "audio": len(re.findall(r"<audio>", text)),
    }
    cleaned = (
        text.replace("<image>", "").replace("<video>", "").replace("<audio>", "").strip()
    )
    cleaned = re.sub(r"\n+", "\n", cleaned).strip()
    return counts, cleaned


def conversation_to_messages(turns, system_prompt: str = "You are a helpful agent."):
    """conversation_to_message.py:49-104 for one conversation.

    ``turns``: iterable of (role, text) in turn order, role in the
    reference spelling ('human' → user, anything else → assistant).
    Returns list of {role, content} messages with empty turns skipped.
    """
    messages = [{"role": "system", "content": system_prompt}]
    for role, value in turns:
        mapped = "user" if role == "human" else "assistant"
        _, cleaned = parse_multimodal_tokens(value)
        if not cleaned:
            continue
        messages.append({"role": mapped, "content": cleaned})
    return messages


def conversation_to_messages_with_modalities(
    turns, modal_paths, system_prompt: str = "You are a helpful agent."
):
    """conversation_to_message.py:49-104 including modality splicing
    (:75-95) for one conversation: each turn's modal tokens consume the
    conversation-level path lists in turn order; a token past the end of
    its list raises ValueError (reference :92). ``turns``: [(role, text)]
    in turn order (source 'system' turns pre-filtered, as in the plain
    path); ``modal_paths``: {"image": [...], "video": [...], "audio":
    [...]}. Content items are typed dicts; the system message is wrapped
    in the same typed-list shape for schema uniformity (the reference
    leaves it a bare string — documented delta)."""
    messages = [
        {"role": "system", "content": [{"type": "text", "text": system_prompt}]}
    ]
    used = {"image": 0, "video": 0, "audio": 0}
    for role, value in turns:
        mapped = "user" if role == "human" else "assistant"
        counts, cleaned = parse_multimodal_tokens(value)
        content = []
        for m in ("image", "video", "audio"):
            for _ in range(counts[m]):
                paths = modal_paths.get(m, [])
                if used[m] < len(paths):
                    content.append({"type": m, "ref": paths[used[m]]})
                    used[m] += 1
                else:
                    raise ValueError(f"modality {m} token/path count mismatch")
        if cleaned:
            content.append({"type": "text", "text": cleaned})
        if not content:
            continue
        messages.append({"role": mapped, "content": content})
    return messages


# ---------------------------------------------------------------------------
# TextDuplicateFilter keep-first semantics — image_diversity_filter.py:20-34
# (exact-match specialization used by the engine: a text is kept iff its
#  normalized form has not been seen before, in stream order)
# ---------------------------------------------------------------------------


def keep_first_dedup(texts) -> list[bool]:
    seen: set[str] = set()
    out = []
    for t in texts:
        key = normalize(t)
        if key in seen:
            out.append(False)
        else:
            seen.add(key)
            out.append(True)
    return out


# ---------------------------------------------------------------------------
# GeneralTextAnswerEvaluator — general_text_answer_evaluator.py:46-150
# (LLM-free: multiple choice / numerical / regression / OCR-WER / free-form ROUGE)
# ---------------------------------------------------------------------------


def extract_answer(text: str) -> str:
    m = re.search(r"<answer>\s*(.*?)\s*</answer>", text, re.DOTALL)
    return m.group(1).strip() if m else ""


def normalize_number(s: str):
    try:
        return float(s.replace(",", ""))
    except Exception:
        return None


def wer(reference: str, hypothesis: str) -> float:
    ref, hyp = reference.split(), hypothesis.split()
    m, n = len(ref), len(hyp)
    d = [[0] * (n + 1) for _ in range(m + 1)]
    for i in range(m + 1):
        d[i][0] = i
    for j in range(n + 1):
        d[0][j] = j
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            if ref[i - 1] == hyp[j - 1]:
                d[i][j] = d[i - 1][j - 1]
            else:
                d[i][j] = 1 + min(d[i - 1][j], d[i][j - 1], d[i - 1][j - 1])
    return d[m][n] / max(1, m)


def _rouge_tokens(text: str) -> list[str]:
    """rouge_score's default tokenization: lowercase, alphanumeric runs
    (the reference's ``use_stemmer=True`` Porter stemming is an external
    NLTK dependency — documented off here)."""
    return re.findall(r"[a-z0-9]+", (text or "").lower())


def _rouge_f(p: float, r: float) -> float:
    return 0.0 if p + r == 0 else 2 * p * r / (p + r)


def _rouge_n(ref: list[str], hyp: list[str], n: int) -> float:
    from collections import Counter

    rg = Counter(tuple(ref[i : i + n]) for i in range(len(ref) - n + 1))
    hg = Counter(tuple(hyp[i : i + n]) for i in range(len(hyp) - n + 1))
    if not rg or not hg:
        return 0.0
    overlap = sum(min(c, hg[g]) for g, c in rg.items())
    return _rouge_f(overlap / sum(hg.values()), overlap / sum(rg.values()))


def _rouge_l(ref: list[str], hyp: list[str]) -> float:
    if not ref or not hyp:
        return 0.0
    m, n = len(ref), len(hyp)
    d = [[0] * (n + 1) for _ in range(m + 1)]
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            d[i][j] = (
                d[i - 1][j - 1] + 1
                if ref[i - 1] == hyp[j - 1]
                else max(d[i - 1][j], d[i][j - 1])
            )
    lcs = d[m][n]
    return _rouge_f(lcs / n, lcs / m)


def compute_rouge_score(reference: str, hypothesis: str) -> float:
    """general_text_answer_evaluator.py:95-100: mean of ROUGE-1/2/L
    F-measures (stemming delta documented in ``_rouge_tokens``)."""
    ref, hyp = _rouge_tokens(reference), _rouge_tokens(hypothesis)
    return (_rouge_n(ref, hyp, 1) + _rouge_n(ref, hyp, 2) + _rouge_l(ref, hyp)) / 3


def calculate_reward(gt_solution: str, model_output: str, question_type: str) -> float:
    out_ans = extract_answer(model_output)
    gt_ans = extract_answer(gt_solution)
    if question_type == "multiple choice":
        return 1.0 if out_ans.strip() == gt_ans.strip() else 0.0
    if question_type == "numerical":
        if (("." in gt_ans) or ("," in gt_ans)) != (("." in out_ans) or ("," in out_ans)):
            return 0.0
        g, o = normalize_number(gt_ans), normalize_number(out_ans)
        if g is None or o is None:
            return 0.0
        return 1.0 if round(g, 2) == round(o, 2) else 0.0
    if question_type == "OCR":
        return max(0.0, min(1.0, 1 - wer(gt_ans, out_ans)))
    if question_type == "free-form":
        return max(0.0, min(1.0, compute_rouge_score(gt_ans, out_ans)))
    if question_type == "regression":
        g, o = normalize_number(gt_ans), normalize_number(out_ans)
        if g is None or o is None:
            return 0.0
        rel = min(1.0, max(0.0, (abs(o - g) + 1e-9) / (abs(g) + 1e-9)))
        return 1 - rel
    return 0.0


# ---------------------------------------------------------------------------
# WikiQARefiner.parse_wiki_qa — wiki_qa_refiner.py:8-79
# ---------------------------------------------------------------------------


def _normalize_whitespace(s: str) -> str:
    return re.sub(r"\s+", " ", s or "").strip()


def _clean_markdown_markers(s: str) -> str:
    if not s:
        return ""
    return re.sub(r"\*+", "", s).strip()


# module-level so the Spark operator's vectorized prefilter can share
# EXACTLY these dispatch patterns (a row matching neither is a pure
# whitespace-normalize pass-through — see operators/refine.wiki_qa_refiner)
WIKI_QA_SPLIT_PATTERN = re.compile(
    r"(?i)(?:\n|^)\s*(?:###|\*\*|---)?\s*"
    r"(?:Question[-–—\s]*Answer\s*Pairs|Q&A|QA|Questions?)\s*(?::|\*\*|---)?",
)
WIKI_QA_FALLBACK_PATTERN = re.compile(
    r"(?i)(?:\n|^)\s*(?:-\s*)?(?:Question|Q)\s*[:：]"
)


def parse_wiki_qa(text: str) -> dict:
    """Tolerant parse of 'Wikipedia article + QA' text into
    {context, qas} (wiki_qa_refiner.py:22-79, branch for branch)."""
    if not isinstance(text, str) or not text.strip():
        return {"context": "", "qas": []}

    match_split = WIKI_QA_SPLIT_PATTERN.search(text)
    if match_split:
        raw_context = text[: match_split.start()]
        raw_qa_section = text[match_split.end():]
    else:
        fallback = WIKI_QA_FALLBACK_PATTERN.search(text)
        if fallback:
            raw_context = text[: fallback.start()]
            raw_qa_section = text[fallback.start():]
        else:
            return {"context": _normalize_whitespace(text), "qas": []}

    context_clean = re.sub(
        r"(?i)^\s*(?:###\s*)?(?:Wikipedia\s+)?Article\s*:?", "", raw_context
    ).strip()
    context_clean = re.sub(r"\s*---+\s*$", "", context_clean)
    context_clean = _normalize_whitespace(context_clean)

    qas = []
    qa_blocks = re.split(
        r"(?m)^\s*(?:\d+[\.\)]|[-•*]\s*)?(?:Question|Q)\s*[:：]?", raw_qa_section
    )
    for block in qa_blocks:
        if not block.strip():
            continue
        ans_match = re.search(
            r"(?i)(?:\n|^|\s+)(?:-\s*)?(?:Answer|A)\s*[:：]\s*(.*)", block, re.DOTALL
        )
        if ans_match:
            q = _normalize_whitespace(_clean_markdown_markers(block[: ans_match.start()]))
            a = _normalize_whitespace(_clean_markdown_markers(ans_match.group(1)))
            if q and a:
                qas.append({"question": q, "answer": a})
    return {"context": context_clean, "qas": qas}
