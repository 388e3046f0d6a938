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
