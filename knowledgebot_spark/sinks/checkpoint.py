"""Checkpoint state (SURVEY.md §2.1 S8/K5, §4 O6).

The reference persists ``{'last_run_timestamp': epoch}`` in a JSON state
file, defaulting to 0 on missing/corrupt (KnowledgeBot.py:133-165), and —
race-safely — stamps the *pre-scan* time so messages arriving mid-run are
re-examined next run (KnowledgeBot.py:110).

Engine form: a one-row JSON state document under ``state_path``; commit is
write-new-then-atomic-rename so a crashed run never truncates state.  In
streaming mode the Structured Streaming checkpoint directory subsumes this
(streaming/pipeline.py).
"""

from __future__ import annotations

import json
import os
import tempfile

DEFAULT_STATE = {"last_run_timestamp": 0}


def load_state(state_path: str) -> dict:
    """S8: read state; missing or corrupt -> default (KnowledgeBot.py:133-155)."""
    path = os.path.join(state_path, "state.json")
    try:
        with open(path, encoding="utf-8") as fh:
            state = json.load(fh)
        if not isinstance(state, dict) or "last_run_timestamp" not in state:
            return dict(DEFAULT_STATE)
        return state
    except (OSError, ValueError):
        return dict(DEFAULT_STATE)


def save_state(state_path: str, state: dict) -> None:
    """K5: atomic overwrite (write temp + rename)."""
    os.makedirs(state_path, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=state_path, suffix=".json.tmp")
    try:
        with os.fdopen(fd, "w", encoding="utf-8") as fh:
            json.dump(state, fh)
        os.replace(tmp, os.path.join(state_path, "state.json"))
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


class IncrementalRun:
    """Pre-scan-stamped incremental run (KnowledgeBot.py:110 semantics).

    >>> run = IncrementalRun(state_path, now_micros)
    >>> ckpt = run.checkpoint_micros     # filter messages > ckpt
    ... process ...
    >>> run.commit()                     # persists the PRE-scan stamp
    """

    def __init__(self, state_path: str, now_micros: int):
        self.state_path = state_path
        self.start_micros = now_micros          # stamped BEFORE the scan
        self.checkpoint_micros = int(load_state(state_path)["last_run_timestamp"])

    def commit(self) -> None:
        save_state(self.state_path, {"last_run_timestamp": self.start_micros})
