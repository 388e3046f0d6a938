"""Property tests for the round-3 second-wave operators.

Each test pins a semantic invariant the oracle's value-hash can't express
directly: result-equivalence to a naive formulation, coverage/partition
properties, and assignment stability.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from knowledgebot_spark.registry import load


def _q(name):
    return load()[name].fn


def test_gaps_islands_partition_days(spark, sf_dir):
    """Streaks partition each user's active days: per-user streak_days sums
    to the distinct active-day count, and consecutive streaks are separated
    by a real gap (start > prev end + 1 day)."""
    out = _q("rel_gaps_islands")(spark, sf_dir).collect()
    from knowledgebot_spark.tables import read_table

    ev = (
        read_table(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("d"))
        .distinct()
        .groupBy("user_id")
        .count()
        .collect()
    )
    active = {r.user_id: r["count"] for r in ev}
    per_user: dict = {}
    for r in out:
        per_user.setdefault(r.user_id, []).append(r)
    assert set(per_user) == set(active)
    import datetime

    for uid, streaks in per_user.items():
        assert sum(s.streak_days for s in streaks) == active[uid]
        streaks.sort(key=lambda s: s.streak_start)
        for prev, nxt in zip(streaks, streaks[1:]):
            prev_end = datetime.date.fromisoformat(prev.streak_end)
            nxt_start = datetime.date.fromisoformat(nxt.streak_start)
            assert (nxt_start - prev_end).days > 1, f"adjacent streaks not merged for {uid}"
        for s in streaks:
            start = datetime.date.fromisoformat(s.streak_start)
            end = datetime.date.fromisoformat(s.streak_end)
            assert (end - start).days == s.streak_days - 1, "streak span != day count"


def test_salted_join_equals_plain_join(spark, sf_dir):
    """The 8-way salted join must be row-identical to the plain join."""
    salted = {
        (r.l_returnflag, r.n_items, r.nation_sum)
        for r in _q("rel_salted_join")(spark, sf_dir).collect()
    }
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    plain = {
        (r.l_returnflag, r.n_items, r.nation_sum)
        for r in li.join(s, li.l_suppkey == s.s_suppkey)
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("s_nationkey").cast("bigint")).alias("nation_sum"),
        )
        .collect()
    }
    assert salted == plain


def test_bitmap_agg_bits_are_nation_membership(spark, sf_dir):
    """rel_conditional_agg's bit_or bitmap has exactly the bits of the
    distinct nationkey%16 values present in each segment."""
    out = {r.c_mktsegment: r.nation_bitmap for r in _q("rel_conditional_agg")(spark, sf_dir).collect()}
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    expected = {
        r.c_mktsegment: r.nations
        for r in c.groupBy("c_mktsegment")
        .agg(F.collect_set(F.pmod("c_nationkey", F.lit(16))).alias("nations"))
        .collect()
    }
    for seg, bitmap in out.items():
        bits = {i for i in range(16) if bitmap & (1 << i)}
        assert bits == set(expected[seg]), seg


def test_fuzzy_join_matches_bruteforce(spark, sf_dir):
    """Blocked levenshtein join finds exactly the brute-force pair set
    (the first-letter block is a complete blocking key for dist<=4 pairs
    only if matching pairs share a first letter — assert the subset
    relation plus in-block completeness, which is what blocking promises)."""
    names = [r.n_name for r in spark.read.parquet(f"{sf_dir}/nation.parquet").collect()]

    def lev(a: str, b: str) -> int:
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[len(b)]

    brute = {
        (a, b)
        for a in names
        for b in names
        if a < b and a[0] == b[0] and lev(a, b) <= 4
    }
    got = {(r.name_a, r.name_b) for r in _q("rel_fuzzy_join")(spark, sf_dir).collect()}
    assert got == brute


def test_token_budget_is_greedy_prefix(spark, sf_dir):
    """The selected set is exactly the maximal prefix of the
    (quality DESC, doc_id) ordering whose cumulative tokens fit."""
    rows = _q("llm_token_budget")(spark, sf_dir).collect()
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    scored = d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        F.round(F.least(F.col("n_chars") / 2000.0, F.lit(1.0)), 6).alias("quality"),
    ).collect()
    ordered = sorted(scored, key=lambda r: (-r.quality, r.doc_id))
    cum, expect = 0, []
    for r in ordered:
        cum += r.n_tokens
        if cum > 20000:
            break
        expect.append(r.doc_id)
    assert [r.doc_id for r in sorted(rows, key=lambda r: (-r.quality, r.doc_id))] == expect
    assert all(r.cum_tokens <= 20000 for r in rows)


def test_train_val_split_is_stable_pure_function(spark, sf_dir):
    """Split membership is a pure function of doc_id: two runs agree, every
    doc lands in exactly one split, and ratios are near 80/10/10."""
    run1 = {r.split: r.n_docs for r in _q("llm_train_val_split")(spark, sf_dir).collect()}
    run2 = {r.split: r.n_docs for r in _q("llm_train_val_split")(spark, sf_dir).collect()}
    assert run1 == run2
    total = sum(run1.values())
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert total == n_docs
    assert abs(run1.get("train", 0) / total - 204 / 256) < 0.08
    assert abs(run1.get("val", 0) / total - 26 / 256) < 0.06


def test_audio_windows_cover_signal(spark, sf_dir):
    """Window plumbing invariants: first window starts at 0, hop is sr/2,
    every window lies inside the signal, and the count is
    floor((n_samples - sr) / hop) + 1."""
    rows = _q("llm_multimodal_audio")(spark, sf_dir).collect()
    by_asset: dict = {}
    for r in rows:
        by_asset.setdefault(r.asset_id, []).append(r)
    for aid, ws in by_asset.items():
        ws.sort(key=lambda r: r.window_no)
        sr, n = ws[0].sample_rate, ws[0].n_samples
        hop = sr // 2
        assert ws[0].start_sample == 0
        assert [w.start_sample for w in ws] == [i * hop for i in range(len(ws))]
        assert all(w.end_sample == w.start_sample + sr for w in ws)
        assert all(w.end_sample <= n for w in ws)
        assert len(ws) == (n - sr) // hop + 1


def test_resize_targets_preserve_aspect_and_bounds(spark, sf_dir):
    """Longer side maps to exactly 224; aspect ratio error is bounded by
    the 1px rounding quantum; no dimension exceeds 224 or drops below 1."""
    rows = _q("llm_multimodal_resize")(spark, sf_dir).collect()
    for r in rows:
        long_side = max(r.width, r.height)
        assert max(r.target_w, r.target_h) == 224
        assert 1 <= min(r.target_w, r.target_h) <= 224
        exact_w = r.width * 224.0 / long_side
        exact_h = r.height * 224.0 / long_side
        assert abs(r.target_w - exact_w) <= 0.5 or (r.target_w == 1 and exact_w < 1)
        assert abs(r.target_h - exact_h) <= 0.5 or (r.target_h == 1 and exact_h < 1)
