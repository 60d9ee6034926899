"""Deterministic synthetic transcript generator (seed 42).

Generates the engine's primary payload per ``/root/repo/FIXTURES.md``:

* ``transcripts``  — (conv_id, turn_idx, role, text, tool, ts), emitted in
  shuffled order with late events, hot (skewed) conversations and known
  dirty-text cases that hit every branch of the reference text filters
  (/root/reference/dataflow/operators/core_vision/filter/rule_base_filter.py:243-354)
  and the keep-first dedup semantics
  (/root/reference/dataflow/operators/core_vision/filter/image_diversity_filter.py:20-34).
* ``tool_events``  — (conv_id, turn_idx, tool, payload, ts), the right side
  of the stream-stream join; ~10% dangling keys, some beyond the join bound.

Everything is numpy-vectorized and seed-stable; no external data.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
BASE_TS = np.datetime64("2024-01-01T00:00:00", "us")

# Dirty-text templates: each hits a specific reference filter branch.
_DIRTY_TEMPLATES = [
    "this line of perfectly ordinary prose ends with a colon:",                 # colon rule
    "first thought trails off...\nsecond thought also trails off...\nhm ok",    # ellipsis ratio
    "a b c d e f g h i j k l m n o p",                                          # mean word len < 3
    "extraordinarily hyperextended multisyllabic terminological constructions dominate everything here completely",  # still passes; long-word case
    "### ### ### ... ... pick one # now",                                       # symbol/word ratio
    "copy this &nbsp; and &amp; everywhere please",                             # html entity
    "id number 1 then id number 2 then id number 3 appear here",                # id-card regex x3
    " ".join(f"w{i}" for i in range(130)),                                      # no-punct 130-word run-on
    "strange marker u200e appears mid sentence",                                # special chars
    "Copyright notice embedded in the body of the text",                        # watermark
    "{ \"a\": { \"b\": { } } }",                                                # curly ratio + short
    "THIS ENTIRE LINE SHOUTS VERY LOUDLY AT EVERYONE READING IT",               # caps ratio
    "lorem ipsum dolor sit amet consectetur adipiscing elit",                   # lorem ipsum
    "same same same same same same same same same same same same",              # unique-words ratio
    "• first bullet\n• second bullet\n• third bullet",           # bullet ratio
    "enable javascript\nplease enable javascript\njavascript required\njavascript needed\nok",  # javascript rule
    "please look at this <image> and also this <video> for context",            # multimodal tokens
]

_CLEAN_WORDS = np.array(
    "the quick brown fox jumps over a lazy dog while tokens stream past the window "
    "agents call tools and users reply with context grounded answers about data "
    "pipelines shuffles partitions and carefully ordered conversation turns".split()
)

_TOOLS = np.array(["search", "python", "browser"])


@dataclass(frozen=True)
class GenSpec:
    n_convs: int = 200
    mean_turns: int = 30
    hot_frac: float = 0.01       # ~1% of conversations are hot (skew)
    hot_multiplier: int = 100
    dirty_frac: float = 0.25     # fraction of turns drawn from dirty templates
    dup_frac: float = 0.08       # fraction of turns duplicating an earlier turn
    late_frac: float = 0.05      # fraction with event time pulled earlier
    tool_frac: float = 0.10
    step_seconds: float = 30.0
    session_gap_frac: float = 0.03  # turns that open a > session-gap hole


def _clean_sentence(rng: np.random.Generator, n: int) -> np.ndarray:
    """n deterministic clean sentences (fully vectorized — identical
    strings to the join-based form, byte for byte)."""
    words = rng.choice(_CLEAN_WORDS, size=(n, 12)).astype(str)
    out = np.char.capitalize(words[:, 0])
    for j in range(1, words.shape[1]):
        out = np.char.add(np.char.add(out, " "), words[:, j])
    return np.char.add(out, ".")


def generate_transcripts(spec: GenSpec = GenSpec(), seed: int = SEED) -> pd.DataFrame:
    rng = np.random.default_rng(seed)

    n_hot = max(1, int(spec.n_convs * spec.hot_frac))
    turns_per_conv = rng.poisson(spec.mean_turns, size=spec.n_convs).clip(min=4)
    hot_ids = rng.choice(spec.n_convs, size=n_hot, replace=False)
    turns_per_conv[hot_ids] = turns_per_conv[hot_ids] * spec.hot_multiplier

    conv_idx = np.repeat(np.arange(spec.n_convs), turns_per_conv)
    turn_idx = np.concatenate([np.arange(t) for t in turns_per_conv]).astype(np.int32)
    n = len(conv_idx)

    conv_id = np.array([f"conv{k:06d}" for k in range(spec.n_convs)])[conv_idx]

    # roles: turn 0 is 'system' for ~50% of convs; others alternate human/assistant
    # ('human' is the reference spelling, conversation_to_message.py:76);
    # ~10% of non-system turns become 'tool'.
    has_system = rng.random(spec.n_convs) < 0.5
    role = np.where(turn_idx % 2 == 0, "human", "assistant").astype(object)
    sys_mask = (turn_idx == 0) & has_system[conv_idx]
    role[sys_mask] = "system"
    tool_mask = (rng.random(n) < spec.tool_frac) & ~sys_mask
    role[tool_mask] = "tool"

    tool = np.full(n, None, dtype=object)
    tool[tool_mask] = rng.choice(_TOOLS, size=int(tool_mask.sum()))

    # text: mix of clean sentences, dirty templates, and duplicates
    text = _clean_sentence(rng, n).astype(object)
    dirty_mask = rng.random(n) < spec.dirty_frac
    dirty_pick = rng.integers(0, len(_DIRTY_TEMPLATES), size=n)
    text[dirty_mask] = np.array(_DIRTY_TEMPLATES, dtype=object)[dirty_pick[dirty_mask]]
    # exact duplicates of an earlier row (tests keep-first dedup): copy text
    # from a strictly earlier global index
    dup_mask = (rng.random(n) < spec.dup_frac) & (np.arange(n) > 0)
    src = (rng.random(n) * np.arange(n)).astype(np.int64)
    text[dup_mask] = text[src[dup_mask]]

    # event time: base + conv offset + turn_idx*step + jitter; ~5% late;
    # some turns open a gap larger than any reasonable session gap (>1h)
    conv_offset = rng.integers(0, 86_400, size=spec.n_convs).astype("timedelta64[s]")
    jitter_us = rng.integers(0, int(spec.step_seconds * 1e6 / 3), size=n)
    gap_mask = rng.random(n) < spec.session_gap_frac
    extra_gap = np.where(gap_mask, 3 * 3600 * (1 + (turn_idx % 3)), 0)
    base = (
        BASE_TS
        + conv_offset[conv_idx]
        + (turn_idx.astype(np.int64) * int(spec.step_seconds * 1e6)
           + extra_gap.astype(np.int64) * 1_000_000
           + jitter_us).astype("timedelta64[us]")
    )
    late_mask = rng.random(n) < spec.late_frac
    base[late_mask] -= np.timedelta64(90, "s")  # within-watermark lateness
    deep_late = late_mask & (rng.random(n) < 0.1)
    base[deep_late] -= np.timedelta64(2, "h")   # beyond-watermark lateness

    df = pd.DataFrame(
        {
            "conv_id": conv_id,
            "turn_idx": turn_idx,
            "role": role.astype(str),
            "text": text.astype(str),
            "tool": tool,
            "ts": pd.Series(base),
        }
    )
    # emit rows in shuffled order so stable re-ordering is actually exercised
    perm = rng.permutation(n)
    return df.iloc[perm].reset_index(drop=True)


def generate_tool_events(transcripts: pd.DataFrame, seed: int = SEED) -> pd.DataFrame:
    """Tool-call events: 90% match a tool turn, 10% dangling."""
    rng = np.random.default_rng(seed + 1)
    tool_turns = transcripts[transcripts["tool"].notna()].reset_index(drop=True)
    n = len(tool_turns)
    keep = rng.random(n) < 0.9

    matched = tool_turns[keep]
    delta_s = rng.integers(-120, 120, size=len(matched))
    ev = pd.DataFrame(
        {
            "conv_id": matched["conv_id"].to_numpy(),
            "turn_idx": matched["turn_idx"].to_numpy(),
            "tool": matched["tool"].to_numpy(),
            "ts": matched["ts"].to_numpy() + delta_s.astype("timedelta64[s]"),
        }
    )
    # dangling events: conv/turn pairs that do not exist in transcripts
    n_dangle = max(1, n // 10)
    dangle = pd.DataFrame(
        {
            "conv_id": [f"conv{990000 + i:06d}" for i in range(n_dangle)],
            "turn_idx": np.arange(n_dangle, dtype=np.int32),
            "tool": rng.choice(_TOOLS, size=n_dangle),
            "ts": np.repeat(BASE_TS, n_dangle)
            + rng.integers(0, 86_400, size=n_dangle).astype("timedelta64[s]"),
        }
    )
    out = pd.concat([ev, dangle], ignore_index=True)
    out["payload"] = [
        '{"call_id": %d, "args": {"q": "step %d"}}' % (i, t)
        for i, t in enumerate(out["turn_idx"].to_numpy())
    ]
    out["turn_idx"] = out["turn_idx"].astype(np.int32)
    perm = rng.permutation(len(out))
    return out.iloc[perm].reset_index(drop=True)[
        ["conv_id", "turn_idx", "tool", "payload", "ts"]
    ]


def spec_for_sf(sf: float) -> GenSpec:
    """FIXTURES.md §5 scale points: sf0.001≈200 convs, sf0.01≈2k, sf0.1≈20k."""
    return GenSpec(n_convs=max(8, int(200_000 * sf)))


def write_dataset(out_dir: str, sf: float = 0.001, seed: int = SEED,
                  n_files: int = 8, arrival: str = "shuffled") -> dict[str, str]:
    """Materialize transcripts + tool_events as multi-file parquet datasets
    (multiple files so a file-based stream source has real micro-batches).

    ``arrival``: 'shuffled' (adversarial, default — global random arrival
    order, exercises the reordering contract) or 'sorted' (event-time
    order — the steady-state shape of a real stream, where the watermark
    advances continuously and state stays bounded)."""
    spec = spec_for_sf(sf)
    tr = generate_transcripts(spec, seed)
    ev = generate_tool_events(tr, seed)
    if arrival == "sorted":
        tr = tr.sort_values("ts", kind="mergesort").reset_index(drop=True)
        ev = ev.sort_values("ts", kind="mergesort").reset_index(drop=True)
    paths = {}
    for name, df in (("transcripts", tr), ("tool_events", ev)):
        d = os.path.join(out_dir, name)
        os.makedirs(d, exist_ok=True)
        table = pa.Table.from_pandas(df, preserve_index=False)
        chunk = max(1, (len(df) + n_files - 1) // n_files)
        base_mtime = 1_700_000_000
        for i in range(0, len(df), chunk):
            fp = os.path.join(d, f"part-{i//chunk:05d}.parquet")
            pq.write_table(table.slice(i, chunk), fp)
            # strictly increasing mtimes → deterministic file-stream order
            os.utime(fp, (base_mtime + i // chunk, base_mtime + i // chunk))
        paths[name] = d
    return paths


def append_punctuation_file(dataset_dir: str, ts: "np.datetime64") -> str:
    """Append a single far-future heartbeat row (dummy conversation) so an
    availableNow drain advances the watermark past all real data and the
    stateful stage flushes every buffered turn (test/ops pattern)."""
    df = pd.DataFrame(
        {
            "conv_id": ["__punctuation__"],
            "turn_idx": np.array([0], dtype=np.int32),
            "role": ["system"],
            "text": ["heartbeat"],
            "tool": pd.Series([None], dtype=object),
            "ts": pd.Series([pd.Timestamp(ts)]),
        }
    )
    schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.int32()),
            ("role", pa.string()),
            ("text", pa.string()),
            ("tool", pa.string()),
            ("ts", pa.timestamp("us")),
        ]
    )
    fp = os.path.join(dataset_dir, "part-zz-punctuation.parquet")
    pq.write_table(pa.Table.from_pandas(df, schema=schema, preserve_index=False), fp)
    os.utime(fp, (1_800_000_000, 1_800_000_000))
    return fp
