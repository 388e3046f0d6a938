"""Degenerate-input robustness net: the at-risk catalog families must
EXECUTE (not necessarily match an oracle) on legal-but-extreme data —
duplicate timestamps, zero/negative values, empty/whitespace documents,
zero-norm embeddings.  Spark 4 runs ANSI mode by default, where an
unguarded /0 aborts the whole job; round 4's review found three such
latent aborts (time-weighted avg, period-over-period, IVF featurize), so
this pins the fixed behavior catalog-wide for the families that compute
ratios over data-dependent denominators.

A full-catalog sweep (184/184 queries, zero crashes) ran against the same
fixture shape on 2026-08-14; this permanent test keeps the highest-risk
subset in the suite at bounded cost."""

from __future__ import annotations

import datetime

import pytest

from knowledgebot_spark.registry import load

# Queries that read ONLY events/documents/embeddings (the tables this
# fixture builds) and divide by data-dependent quantities.
AT_RISK = [
    "rel_time_weighted_avg",
    "rel_period_over_period",
    "rel_rolling_zscore",
    "rel_gap_fill_locf",
    "rel_markov_transitions",
    "rel_session_paths",
    "rel_cohort_retention",
    "rel_rolling_1h_range",
    "llm_knn_graph",
    "llm_pagerank_knn",
    "llm_sim_bruteforce",
    "llm_sim_filtered",
    "llm_dedup_embedding",
    "llm_text_stats",
    "llm_text_quality",
    "llm_freq_tokens_sketch",
    "llm_curriculum_order",
    "llm_repetition",
    "llm_quality_filter_quantile",
    "llm_bpe_merge_learn",
    "rel_cm_heavy_hitters",
    "llm_gram_matrix",  # zero-norm + 1e-30 vectors through the int matmul
    "llm_power_iteration",  # max|u| renormalizer against near-zero mass
    # round 7
    "llm_cc_alternating_star",  # near-dup edge set may be tiny or empty
    "llm_quality_classifier",  # empty-text docs hash to the '' feature
    "llm_leakage_safe_split",  # group keys collapse on repeated prefixes
    "llm_random_projection",  # zero-norm + 1e-30 vectors through the matmul
    "llm_kneser_ney_lm",  # near-empty train split, all-<unk> mapping
    # round 8
    "llm_dedup_champion",  # empty/whitespace docs -> possibly zero clusters
    # round 9
    "llm_lm_perplexity",  # token-keyed mapping: empty arrays posexplode to nothing
    "stream_champion_upsert",  # ledgers may end a run with zero edges
]


@pytest.fixture(scope="module")
def adversarial_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("adversarial"))
    ts0 = datetime.datetime(2024, 1, 5, 10, 0, 0)
    events = [
        # duplicate timestamps, zero + negative values, zero-sum day
        (900001, ts0, 9001, "view", 0.0, "{}"),
        (900002, ts0, 9001, "view", -5.0, "{}"),
        (900003, ts0, 9001, "click", 5.0, "{}"),
        (900004, ts0 + datetime.timedelta(days=1), 9002, "purchase", -1.5, "{}"),
        (900005, ts0 + datetime.timedelta(days=1), 9002, "purchase", 1.5, "{}"),
    ] + [
        (i, ts0 + datetime.timedelta(minutes=7 * i), 9000 + (i % 5), "view", float(i % 13), "{}")
        for i in range(40)
    ]
    spark.createDataFrame(
        events,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string",
    ).write.parquet(f"{d}/events.parquet")
    docs = [
        (1, "", "en", "srcX", 0),            # empty
        (2, "   ", "en", "srcX", 3),          # whitespace only
        (3, "a", "en", "srcX", 1),            # single char
        (4, "zz " * 50, "en", "srcX", 150),   # pure repetition
        (5, "the quick brown fox jumps over the lazy dog", "en", "srcY", 43),
        (6, "plain text document with several ordinary words", "en", "srcY", 47),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{d}/documents.parquet")
    vecs = [(0, [1.0] * 64, 3), (1, [0.0] * 64, 3), (2, [1e-30] * 64, 3)] + [
        (10 + i, [float((i + j) % 7) for j in range(64)], i % 4) for i in range(20)
    ]
    spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{d}/embeddings.parquet")
    return d


@pytest.mark.parametrize("name", AT_RISK)
def test_query_survives_degenerate_inputs(spark, adversarial_dir, name):
    fn = load()[name].fn
    fn(spark, adversarial_dir).write.format("noop").mode("overwrite").save()
