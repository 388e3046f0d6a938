#!/usr/bin/env python3
"""Regenerate QUERY_STAMPS.json — per query: the round it was last
driver-green and the closure hash (stamps.closure_hash) of its
implementation AT that round's code.

"That round's code" = the commit that ADDED ``CORRECTNESS_r{N}.json``:
the driver commits each round's evidence together with the round's
final tree, so the added-commit snapshot is exactly what the driver
hash-checked.  Run this once per round (after the driver lands the new
CORRECTNESS file) so registry.load()'s changed-since-stamp rotation
compares against fresh stamps.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

from knowledgebot_spark import registry, stamps  # noqa: E402

_MODULE_FILES = [m.replace(".", "/") + ".py" for m in registry._MODULES]


def _stamp_commit(rnd: int) -> str | None:
    out = subprocess.run(
        ["git", "log", "--diff-filter=A", "--format=%H", "--",
         f"CORRECTNESS_r{rnd:02d}.json"],
        cwd=ROOT, capture_output=True, text=True,
    ).stdout.split()
    if not out:  # driver files historically also exist unpadded
        out = subprocess.run(
            ["git", "log", "--diff-filter=A", "--format=%H", "--",
             f"CORRECTNESS_r{rnd}.json"],
            cwd=ROOT, capture_output=True, text=True,
        ).stdout.split()
    # newest add wins: if the evidence file was ever deleted and re-added
    # (revert + reland), the driver's LATEST commit of it is the tree the
    # hashes must be computed from
    return out[0] if out else None


_SHOW_CACHE: dict[tuple[str, str], str | None] = {}


def _git_show(commit: str, path: str) -> str | None:
    key = (commit, path)
    if key not in _SHOW_CACHE:
        p = subprocess.run(
            ["git", "show", f"{commit}:{path}"],
            cwd=ROOT, capture_output=True, text=True,
        )
        _SHOW_CACHE[key] = p.stdout if p.returncode == 0 else None
    return _SHOW_CACHE[key]


def main() -> None:
    registry.load()
    last = registry.last_green_round()
    commits = {rnd: _stamp_commit(rnd) for rnd in sorted(set(last.values()))}
    out: dict[str, dict] = {}
    unresolved: list[str] = []
    for name, rnd in sorted(last.items()):
        qd = registry._REGISTRY.get(name)
        commit = commits.get(rnd)
        h = None
        if qd is not None and commit:
            fn_name = qd.fn.__name__
            # the module registering it today, then every other catalog
            # module at that commit (queries migrate between modules)
            candidates = [qd.fn.__module__.replace(".", "/") + ".py"]
            candidates += [f for f in _MODULE_FILES if f not in candidates]
            for path in candidates:
                text = _git_show(commit, path)
                if text is None:
                    continue
                h = stamps.closure_hash(text, fn_name)
                if h is not None:
                    break
        if h is None:
            unresolved.append(name)
        out[name] = {"round": rnd, "hash": h}
    stamps.STAMPS_PATH.write_text(
        json.dumps(out, indent=1, sort_keys=True) + "\n", encoding="utf-8"
    )
    n_hashed = sum(1 for v in out.values() if v["hash"])
    print(f"stamped {n_hashed}/{len(out)} queries -> {stamps.STAMPS_PATH}")
    if unresolved:
        print(f"unresolved (fall back to staleness): {unresolved}")


if __name__ == "__main__":
    main()
