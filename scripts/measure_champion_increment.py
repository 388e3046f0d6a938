"""Measure the incremental-champion claim (SCALING.md's increment-vs-
recompute experiment, first run in round 9, re-run after the round-10
delta-CC + stats-ledger refresh):

  1. build the ledgers from a (N - batch)-doc bootstrap batch,
  2. maintain one ~1% batch incrementally (the nightly-ingest shape),
  3. compare against the one-shot full recompute at the same scale.

Usage:
    python scripts/measure_champion_increment.py [scaled_dir] [batch_frac]

Defaults: /tmp/scale10x (regenerate with scripts/inflate_testdata.py if
/tmp was wiped) and 0.011 (~the round-9 550-doc batch at 50k docs).
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    scaled = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale10x"
    frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.011

    from pyspark.sql import functions as F

    from knowledgebot_spark.queries_corpus import llm_dedup_champion
    from knowledgebot_spark.queries_streaming import (
        _champion_maintain,
        _champion_table,
    )
    from knowledgebot_spark.session import get_session
    from knowledgebot_spark.tables import read_table

    spark = get_session()
    spark.sparkContext.setLogLevel("ERROR")

    docs = read_table(spark, scaled, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    n = docs.count()
    cut = docs.approxQuantile("doc_id", [1.0 - frac], 0.0001)[0]
    boot = docs.filter(F.col("doc_id") <= cut)
    inc = docs.filter(F.col("doc_id") > cut)
    n_inc = inc.count()
    print(f"docs={n}  bootstrap={n - n_inc}  increment={n_inc}")

    base = f"/tmp/knowledgebot_spark/measure_champion/{os.path.basename(scaled)}"
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base, exist_ok=True)

    t0 = time.time()
    _champion_maintain(base, boot, 0)
    t_boot = time.time() - t0
    print(f"bootstrap maintain: {t_boot:.2f}s")

    t0 = time.time()
    _champion_maintain(base, inc, 1)
    t_inc = time.time() - t0
    print(f"incremental maintain ({n_inc} docs): {t_inc:.2f}s")

    t0 = time.time()
    full = llm_dedup_champion(spark, scaled)
    full.write.format("noop").mode("overwrite").save()
    t_full = time.time() - t0
    print(f"one-shot full recompute: {t_full:.2f}s")
    print(f"increment/full ratio: {t_inc / t_full:.3f}  (win {t_full / t_inc:.1f}x)")

    incr = {tuple(r) for r in _champion_table(spark, base).collect()}
    ones = {tuple(r) for r in full.collect()}
    print(f"tables equal: {incr == ones}  (clusters={len(ones)})")

    # --- sparse increment (round 10): the shape the sharded manifest is
    # FOR — a tiny batch touching a handful of components (3 exact dups of
    # existing docs) against the full accumulated ledgers.  The dense ~1%
    # batch above touches ~every shard (inflation maximizes the dup
    # graph); nightly ingest on a realistic corpus looks like THIS.
    from knowledgebot_spark.queries_streaming import _manifest_load

    sparse = (
        docs.orderBy("doc_id")
        .limit(3)
        .select(
            (F.col("doc_id") + 1_000_000_000).alias("doc_id"),
            "text", "lang", "source", "n_chars",
        )
    )
    man_before = _manifest_load(f"{base}/snap")
    t0 = time.time()
    _champion_maintain(base, sparse, 2)
    t_sparse = time.time() - t0
    man_after = _manifest_load(f"{base}/snap")
    lab_b, lab_a = man_before["tables"]["labels"], man_after["tables"]["labels"]
    rewritten = sorted(s for s in lab_a if lab_a[s] != lab_b.get(s))
    print(
        f"sparse increment (3 dup docs): {t_sparse:.2f}s  "
        f"shards rewritten: {len(rewritten)}/{man_after['n_shards']}"
    )


if __name__ == "__main__":
    main()
