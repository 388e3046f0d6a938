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


# --- incremental champion maintenance (VERDICT r08 #5) -------------------------


def test_champion_upsert_incremental_matches_oneshot_and_redelivery_stable(
    spark, sf_dir, tmp_path
):
    """Two-batch incremental maintenance must converge to the one-shot
    llm_dedup_champion answer, and RE-DELIVERING the last batch must leave
    the champion table bit-identical (ledger appends are duplicate-
    insensitive; the champion rewrite is an idempotent function of the
    ledgers)."""
    from knowledgebot_spark.queries_corpus import llm_dedup_champion
    from knowledgebot_spark.queries_streaming import (
        _champion_maintain,
        _champion_table,
    )
    from knowledgebot_spark.tables import read_table

    base = str(tmp_path / "champ_state")
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    mid = docs.agg(F.expr("percentile_approx(doc_id, 0.5)")).collect()[0][0]
    b1 = docs.filter(F.col("doc_id") <= mid)
    b2 = docs.filter(F.col("doc_id") > mid)

    _champion_maintain(base, b1, 0)
    _champion_maintain(base, b2, 1)
    incremental = {tuple(r) for r in _champion_table(spark, base).collect()}
    oneshot = {tuple(r) for r in llm_dedup_champion(spark, sf_dir).collect()}
    assert incremental == oneshot
    assert incremental, "model guarantees near-dup clusters"

    # re-deliver batch 2 (foreachBatch replay after a partial failure)
    _champion_maintain(base, b2, 1)
    redelivered = {tuple(r) for r in _champion_table(spark, base).collect()}
    assert redelivered == incremental


def test_stream_champion_upsert_matches_batch_champion(spark, sf_dir):
    """The registered streaming query (availableNow, foreachBatch) lands on
    the same final champion table as the batch query."""
    from knowledgebot_spark.queries_corpus import llm_dedup_champion
    from knowledgebot_spark.queries_streaming import stream_champion_upsert

    streamed = {tuple(r) for r in stream_champion_upsert(spark, sf_dir).collect()}
    batch = {tuple(r) for r in llm_dedup_champion(spark, sf_dir).collect()}
    assert streamed == batch


# --- monster-cluster champion election (VERDICT r08 #4) ------------------------


def test_champion_election_monster_cluster(spark, tmp_path):
    """Champion-election skew pin: ONE duplicate cluster holding >50% of
    the near-dup node set (a corpus that is mostly copies of one document)
    must elect exactly one champion — the longest member, doc_id ascending
    on ties — and the cluster-keyed window must complete with the monster
    cluster as its partition bound (documented in SCALING.md)."""
    from knowledgebot_spark.queries_corpus import llm_dedup_champion

    base_words = " ".join(f"w{i}" for i in range(40))
    rows = []
    # 60 exact copies (jaccard 1.0 pairwise) ...
    for i in range(60):
        rows.append((i, base_words, "en", "wiki", len(base_words)))
    # ... one elongated near-dup member: +5 words keeps jaccard ~0.89 >= 0.8
    long_text = base_words + " " + " ".join(f"x{i}" for i in range(5))
    rows.append((60, long_text, "en", "wiki", len(long_text)))
    # unrelated singletons (no near-dup edges)
    for i in range(61, 71):
        t = " ".join(f"u{i}_{j}" for j in range(30))
        rows.append((i, t, "en", "web", len(t)))
    d = str(tmp_path / "monster")
    os.makedirs(d, exist_ok=True)
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(os.path.join(d, "documents.parquet"))

    out = llm_dedup_champion(spark, d).collect()
    assert len(out) == 1  # singletons form no clusters
    champ = out[0]
    assert champ.cluster_id == 0  # min member id labels the cluster
    assert champ.cluster_size == 61
    assert champ.n_dropped == 60
    assert champ.champion_doc_id == 60  # the longest member wins, not min-id


# --- streaming thread-latency SLO (VERDICT r08 #6) -----------------------------


def test_stream_thread_latency_matches_batch(spark, sf_dir):
    """The watermarked stream-stream join must reproduce the batch
    kb_thread_latency numbers exactly on the same fixture (the model's
    replies lag ~11 min, far inside the 7-day watermark, so no drops)."""
    from knowledgebot_spark.queries_pipeline import kb_thread_latency
    from knowledgebot_spark.queries_streaming import stream_thread_latency

    streamed = [tuple(r) for r in stream_thread_latency(spark, sf_dir).collect()]
    batch = [tuple(r) for r in kb_thread_latency(spark, sf_dir).collect()]
    assert streamed == batch
    assert streamed, "model guarantees thread replies"


def test_stream_thread_latency_multi_batch_replay(spark, sf_dir):
    """Batch boundaries are a harness artifact: replaying the message
    stream one file per micro-batch (KB_STREAM_MAX_FILES=1) must produce
    the SAME SLO table as the single-batch run — join state carries
    parents across batch boundaries until the reply watermark passes
    parent + 7 days."""
    from knowledgebot_spark.queries_pipeline import kb_thread_latency
    from knowledgebot_spark.queries_streaming import stream_thread_latency

    os.environ["KB_STREAM_MAX_FILES"] = "1"
    try:
        streamed = [
            tuple(r) for r in stream_thread_latency(spark, sf_dir).collect()
        ]
    finally:
        del os.environ["KB_STREAM_MAX_FILES"]
    batch = [tuple(r) for r in kb_thread_latency(spark, sf_dir).collect()]
    assert streamed == batch


def test_champion_maintain_out_of_order_batches(spark, sf_dir, tmp_path):
    """Arrival order must not matter: delivering the HIGH-doc_id half
    first still converges to the one-shot champion table (edges are
    symmetric and bucket collision is monotone in the seen set — unlike
    stream_neardup_gate, champion maintenance carries no id-order
    precondition)."""
    from knowledgebot_spark.queries_corpus import llm_dedup_champion
    from knowledgebot_spark.queries_streaming import (
        _champion_maintain,
        _champion_table,
    )
    from knowledgebot_spark.tables import read_table

    base = str(tmp_path / "champ_ooo")
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    mid = docs.agg(F.expr("percentile_approx(doc_id, 0.5)")).collect()[0][0]
    _champion_maintain(base, docs.filter(F.col("doc_id") > mid), 0)
    _champion_maintain(base, docs.filter(F.col("doc_id") <= mid), 1)
    incremental = {tuple(r) for r in _champion_table(spark, base).collect()}
    oneshot = {tuple(r) for r in llm_dedup_champion(spark, sf_dir).collect()}
    assert incremental == oneshot


# --- epoch-capped source mixing (round 9) --------------------------------------


def test_epoch_mixture_recipe_invariants(spark, sf_dir):
    """The mixture plan's exact-integer contract: weights apportion to
    EXACTLY 10000 e4 units (largest remainder), full_epochs respects the
    cap, the tail covers the residual with overshoot < one document, and
    achieved tokens land between the capped target and target + last-doc
    overshoot."""
    from knowledgebot_spark.queries_llm import _EPOCH_CAP, llm_epoch_mixture

    rows = llm_epoch_mixture(spark, sf_dir).collect()
    assert rows
    assert sum(r.weight_e4 for r in rows) == 10000
    for r in rows:
        assert 0 <= r.full_epochs <= _EPOCH_CAP
        capped = min(r.target_tokens, _EPOCH_CAP * r.n_tokens)
        residual = capped % r.n_tokens
        if residual == 0:
            assert r.n_tail_docs == 0 and r.tail_tokens == 0
        else:
            # greedy prefix: covers the residual, overshoot < one doc
            assert r.tail_tokens >= residual
            assert r.n_tail_docs >= 1
        assert r.achieved_tokens == r.full_epochs * r.n_tokens + r.tail_tokens
        assert r.epoch_cap_hit == (r.target_tokens > _EPOCH_CAP * r.n_tokens)
        if r.epoch_cap_hit:
            # cap binding: exactly the cap's worth of full epochs, no tail
            assert r.full_epochs == _EPOCH_CAP
            assert r.n_tail_docs == 0 and r.tail_tokens == 0


def test_epoch_mixture_tail_matches_pandas_replay(spark, sf_dir):
    """Pure-pandas replay of one source's tail selection: the docs chosen
    for the partial epoch are exactly the md5-order greedy prefix."""
    import hashlib

    from knowledgebot_spark.queries_llm import _EPOCH_CAP, llm_epoch_mixture

    plan = {r.source: r for r in llm_epoch_mixture(spark, sf_dir).collect()}
    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    docs["n_toks"] = docs["text"].str.lower().str.split(" ").str.len()
    docs["h"] = docs["doc_id"].map(
        lambda i: hashlib.md5(f"{i}:epoch".encode()).hexdigest()
    )
    src = sorted(plan)[0]
    sub = docs[docs["source"] == src].sort_values(["h", "doc_id"])
    r = plan[src]
    capped = min(r.target_tokens, _EPOCH_CAP * r.n_tokens)
    residual = capped % r.n_tokens
    cum_prev, n_sel, tok_sel = 0, 0, 0
    for t in sub["n_toks"]:
        if cum_prev >= residual:
            break
        n_sel += 1
        tok_sel = cum_prev + t
        cum_prev += t
    assert (r.n_tail_docs, r.tail_tokens) == (n_sel, tok_sel)
