"""assemble_with_modalities vs the reference-port splicing loop:
in-order path consumption across turns, typed content items, empty-turn
skip, and the count-mismatch error (conversation_to_message.py:75-95)."""

from __future__ import annotations

import pandas as pd
import pytest

from dataflow_mm_lrt_spark.operators.assembly import assemble_with_modalities
from dataflow_mm_lrt_spark.oracle.reference_port import (
    conversation_to_messages_with_modalities,
)

TURNS = [
    # (conv_id, turn_idx, role, text)
    ("c1", 0, "human", "look at <image> and <image> please"),
    ("c1", 1, "gpt", "here is a <video> reply"),
    ("c1", 2, "human", "<image>"),  # modal-only turn: kept (content non-empty)
    ("c1", 3, "gpt", ""),  # empty turn: skipped
    ("c2", 0, "human", "no tokens at all"),
    ("c2", 1, "gpt", "an <audio> response"),
]
MODS = {
    "c1": {"image": ["i1", "i2", "i3"], "video": ["v1"], "audio": []},
    "c2": {"image": [], "video": [], "audio": ["a1"]},
}


def _frames(spark, mods):
    turns = spark.createDataFrame(
        pd.DataFrame(TURNS, columns=["conv_id", "turn_idx", "role", "text"])
    )
    modalities = spark.createDataFrame(
        pd.DataFrame(
            [
                (c, m["image"], m["video"], m["audio"])
                for c, m in mods.items()
            ],
            columns=["conv_id", "image_paths", "video_paths", "audio_paths"],
        )
    )
    return turns, modalities


def _canon(messages):
    out = []
    for m in messages:
        content = []
        for c in m["content"]:
            content.append((c["type"], c.get("ref"), c.get("text")))
        out.append((m["role"], tuple(content)))
    return out


def test_splice_matches_reference_port(spark):
    turns, modalities = _frames(spark, MODS)
    got = {
        r["conv_id"]: r["messages"]
        for r in assemble_with_modalities(turns, modalities).collect()
    }
    for conv in ("c1", "c2"):
        conv_turns = [(r, t) for c, _, r, t in TURNS if c == conv]
        exp = conversation_to_messages_with_modalities(conv_turns, MODS[conv])
        got_canon = [
            (m["role"], tuple((c["type"], c["ref"], c["text"]) for c in m["content"]))
            for m in got[conv]
        ]
        assert got_canon == _canon(exp), conv


def test_splice_consumes_in_turn_order(spark):
    turns, modalities = _frames(spark, MODS)
    got = {
        r["conv_id"]: r["messages"]
        for r in assemble_with_modalities(turns, modalities).collect()
    }
    c1_imgs = [
        c["ref"]
        for m in got["c1"]
        for c in m["content"]
        if c["type"] == "image"
    ]
    assert c1_imgs == ["i1", "i2", "i3"]


def test_count_mismatch_raises(spark):
    bad = {k: dict(v) for k, v in MODS.items()}
    bad["c1"] = {"image": ["i1"], "video": ["v1"], "audio": []}  # 3 tokens, 1 path
    turns, modalities = _frames(spark, bad)
    with pytest.raises(ValueError, match="modality token count"):
        assemble_with_modalities(turns, modalities, strict=True)
    # lazy mode: flagged, not raised
    out = {
        r["conv_id"]: r["modality_mismatch"]
        for r in assemble_with_modalities(turns, modalities, strict=False).collect()
    }
    assert out["c1"] is True and out["c2"] is False


def test_missing_modalities_row_surfaces_as_mismatch(spark):
    """A token-bearing conversation with NO modalities row must register
    modality_mismatch=true (strict=False) / raise (strict=True) — the
    inner-join form silently dropped it (ADVICE r2)."""
    turns, modalities = _frames(spark, {"c2": MODS["c2"]})  # c1 row absent
    out = assemble_with_modalities(turns, modalities, strict=False).collect()
    by_conv = {r["conv_id"]: r for r in out}
    assert set(by_conv) == {"c1", "c2"}
    assert by_conv["c1"]["modality_mismatch"] is True
    assert by_conv["c2"]["modality_mismatch"] is False
    with pytest.raises(ValueError, match="modality token count"):
        assemble_with_modalities(turns, modalities, strict=True)
