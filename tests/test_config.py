"""Config layer semantics (SURVEY.md §2.1 P13, §2.2 chunk-wiring fix)."""

import pytest

from knowledgebot_spark.config import EngineConfig, parse_bool, parse_list


def test_truthy_parsing():
    # Config/Schema.py:83 semantics
    for v in ("true", "1", "yes", "on", "TRUE", " Yes "):
        assert parse_bool(v) is True
    for v in ("false", "0", "no", "off", "", "banana"):
        assert parse_bool(v) is False
    assert parse_bool(None, default=True) is True


def test_list_parsing():
    # Config/Schema.py:119-122 semantics
    assert parse_list("a, b ,c") == ["a", "b", "c"]
    assert parse_list("a,,b,") == ["a", "b"]
    assert parse_list(None) == []
    assert parse_list(["x"]) == ["x"]


def test_overlap_guard():
    # The reference infinite-loops when overlap >= chunk_size
    # (TextProcessor.py:34-48); the engine rejects it at config time.
    with pytest.raises(ValueError, match="chunk_overlap"):
        EngineConfig(chunk_size=10, chunk_overlap=10)
    with pytest.raises(ValueError, match="chunk_overlap"):
        EngineConfig(chunk_size=10, chunk_overlap=15)
    cfg = EngineConfig(chunk_size=10, chunk_overlap=9)
    assert cfg.chunk_size == 10


def test_from_env_wires_chunking():
    # SURVEY.md §2.2: VECTOR_DB_CHUNK_LENGTH/OVERLAP were never threaded into
    # chunk_text in the reference; the engine wires them through.
    cfg = EngineConfig.from_env(
        {"KB_CHUNK_LENGTH": "64", "KB_CHUNK_OVERLAP": "16", "KB_ENABLE_LLM": "yes",
         "KB_CHANNELS": "general, random"}
    )
    assert cfg.chunk_size == 64
    assert cfg.chunk_overlap == 16
    assert cfg.enable_llm is True
    assert cfg.channels == ["general", "random"]
