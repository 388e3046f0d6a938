"""Golden end-to-end fixture test (SURVEY.md §5.2 item 2): the full spine
output at sf0.001 is byte-compared against a committed golden — any change
to date formatting, key synthesis, header serialization, ordinals, or
mention ordering shows up as a diff here."""

from __future__ import annotations

import json
import os

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "spine_sf0001.jsonl")


def test_spine_matches_golden(spark):
    from knowledgebot_spark.registry import load

    df = load()["kb_spine_full"].fn(spark, "/root/testdata/sf0.001")
    got = sorted(
        (json.dumps(r.asDict(), sort_keys=True, ensure_ascii=False) for r in df.collect()),
    )
    with open(GOLDEN, encoding="utf-8") as fh:
        want = sorted(line.rstrip("\n") for line in fh if line.strip())
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g == w, f"golden mismatch:\n got: {g}\nwant: {w}"


import pytest

_WAVE_GOLDENS = (
    "llm_kmeans_embeddings",
    "llm_mmr_rerank",
    "rel_pattern_detect",
)


@pytest.mark.parametrize("name", _WAVE_GOLDENS)
def test_wave_golden(spark, name):
    """Late-round ops with small stable outputs pin their sf0.001 result
    byte-for-byte: any drift in quantization, greedy tie-breaks, or
    sessionization shows as a diff here before the oracle ever runs."""
    from knowledgebot_spark.registry import load

    df = load()[name].fn(spark, "/root/testdata/sf0.001")
    got = sorted(
        json.dumps(r.asDict(), sort_keys=True, ensure_ascii=False)
        for r in df.collect()
    )
    path = os.path.join(os.path.dirname(__file__), "golden", f"{name}_sf0001.jsonl")
    with open(path, encoding="utf-8") as fh:
        want = sorted(line.rstrip("\n") for line in fh if line.strip())
    assert got == want
