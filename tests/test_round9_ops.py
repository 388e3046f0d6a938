"""Round-9 additions: token-keyed LM vocab mapping (the promised scale
path), re-certification rotation support, incremental champion
maintenance, streaming thread-latency SLO."""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import functions as F


# --- token-keyed vocab mapping (VERDICT r08 #3) -------------------------------


def test_lm_vocab_mapping_paths_agree(spark, sf_dir):
    """The token-keyed broadcast-join mapping (_lm_vocab_mapped_tokens, now
    the catalog path) must be BIT-IDENTICAL to the original O(V)-per-token
    array_contains scan it replaced — same docs kept, same positional token
    sequences, same '<unk>' rewrites."""
    from knowledgebot_spark.queries_llm import (
        _lm_vocab_mapped_tokens,
        _lm_vocab_mapped_tokens_scan,
        _t,
    )

    d = _t(spark, sf_dir, "documents")
    is_train = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "cc"
    toks = d.select(
        "doc_id",
        is_train.alias("is_train"),
        F.filter(F.split(F.lower("text"), " "), lambda t: t != "").alias("t"),
    )
    unigrams = toks.filter("is_train").select(F.explode("t").alias("w"))
    # a deliberately TINY vocab (far below _LM_VOCAB=200, which covers the
    # whole sf0.001 token set) so '<unk>' rewrites actually occur and the
    # equality check exercises both branches of the mapping
    vocab = (
        unigrams.groupBy("w")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), F.asc("w"))
        .limit(25)
        .select("w")
    )
    joined = {
        r.doc_id: (r.is_train, tuple(r.mt))
        for r in _lm_vocab_mapped_tokens(toks, vocab).collect()
    }
    scanned = {
        r.doc_id: (r.is_train, tuple(r.mt))
        for r in _lm_vocab_mapped_tokens_scan(toks, vocab).collect()
    }
    assert joined == scanned
    assert joined, "model guarantees multi-token documents"
    # the mapping actually rewrites something (otherwise the test is vacuous)
    assert any("<unk>" in mt for _, mt in joined.values())


def test_lm_perplexity_no_array_contains_in_plan(spark, sf_dir):
    """The O(V)-per-token array_contains scan is GONE from both LM query
    plans — vocab membership resolves through the token-keyed join."""
    from knowledgebot_spark.registry import load

    cat = load()
    for name in ("llm_lm_perplexity", "llm_kneser_ney_lm"):
        df = cat[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        assert "array_contains" not in plan, name
