"""Property tests for the round-4 operators: mergeable sketches (KLL /
theta), the ordered event funnel, and the incremental-ingest curation
family.

Each test pins an invariant the oracle's value-hash can't express: sketch
estimates honoring their published error bounds, funnel monotonicity, and
conservation laws on the dedup/filter accounting.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from knowledgebot_spark.registry import load
from knowledgebot_spark.tables import read_table


def _q(name):
    return load()[name].fn


def test_kll_quantiles_within_rank_band(spark, sf_dir):
    """Every per-group AND the merged-sketch median lands inside the exact
    [0.45, 0.55] rank band (KLL guarantees ~1.65% rank error at k=200)."""
    rows = _q("rel_kll_quantiles")(spark, sf_dir).collect()
    assert len(rows) >= 2
    assert {r.grp for r in rows} >= {"ALL"}
    assert all(r.within_tol for r in rows)


def test_theta_setops_exact_identities(spark, sf_dir):
    """|R∪A| = |R| + |A| − |R∩A| on the exact side, and every sketch
    estimate is gated within 5%."""
    out = {r.op: r for r in _q("rel_theta_setops")(spark, sf_dir).collect()}
    assert set(out) == {"union", "intersect", "diff_r_minus_a"}
    assert all(r.within_tol for r in out.values())
    li = read_table(spark, sf_dir, "lineitem")
    n_r, n_a = (
        li.filter(F.col("l_returnflag") == flag)
        .select("l_orderkey")
        .distinct()
        .count()
        for flag in ("R", "A")
    )
    assert out["union"].exact_n == n_r + n_a - out["intersect"].exact_n
    assert out["diff_r_minus_a"].exact_n == n_r - out["intersect"].exact_n


def test_funnel_monotone_and_bounded(spark, sf_dir):
    """Stage counts shrink monotonically and never exceed the distinct
    user count; stage-1 count equals the distinct viewers."""
    row = _q("rel_funnel_conversion")(spark, sf_dir).collect()[0]
    assert row.n_view >= row.n_view_click >= row.n_view_click_purchase >= 0
    ev = read_table(spark, sf_dir, "events")
    viewers = (
        ev.filter(F.col("event_type") == "view")
        .select("user_id")
        .distinct()
        .count()
    )
    assert row.n_view == viewers


def test_vocab_coverage_conservation(spark, sf_dir):
    """Per-source OOV never exceeds the token count, rates are in [0, 1],
    and the corpus-wide token total matches an independent count."""
    rows = _q("llm_vocab_coverage")(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_oov <= r.n_tokens
        assert 0.0 <= r.oov_rate <= 1.0
    d = read_table(spark, sf_dir, "documents")
    total = (
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("t"))
        .filter(F.length("t") > 0)
        .count()
    )
    assert sum(r.n_tokens for r in rows) == total


def test_vocab_coverage_broadcasts_vocab(spark, sf_dir):
    """The induced vocab must broadcast into the coverage join — a
    shuffle-by-term on the token stream would be the 100 TB bottleneck."""
    plan = (
        _q("llm_vocab_coverage")(spark, sf_dir)
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    assert "BroadcastHashJoin" in plan


def test_incremental_dedup_conservation(spark, sf_dir):
    """n_dup + n_kept == n_docs per incoming source; only incoming sources
    (src10..src19) appear; incoming doc totals match the table."""
    rows = _q("llm_dedup_incremental")(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_dup + r.n_kept == r.n_docs
        assert r.source.startswith("src1") and len(r.source) == 5
    d = read_table(spark, sf_dir, "documents")
    incoming = (
        d.filter(F.col("source").rlike("^src1[0-9]$"))
        .groupBy("source")
        .count()
        .collect()
    )
    expect = {r.source: r["count"] for r in incoming}
    assert {r.source: r.n_docs for r in rows} == expect


def test_quality_filter_quantile_cut(spark, sf_dir):
    """The per-source cut keeps ~80%: kept count equals the number of docs
    with percent_rank >= 0.2, which for n docs is n - ceil((n-1) * 0.2)
    ... pinned instead by recomputation: every source keeps at least 75%
    and drops at least one doc (sf0.001+ has >= 5 docs per source)."""
    rows = _q("llm_quality_filter_quantile")(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r.n_kept <= r.n_docs
        assert r.n_kept >= 0.75 * r.n_docs
        if r.n_docs >= 5:
            assert r.n_kept < r.n_docs
        assert r.min_kept_quality is not None


def test_scd2_intervals_tile(spark, sf_dir):
    """Per customer: versions are 1..n, consecutive intervals tile
    (valid_to of version k == valid_from of version k+1), and exactly one
    version is current (open-ended sentinel)."""
    rows = _q("rel_scd2_intervals")(spark, sf_dir).collect()
    assert rows
    per: dict = {}
    for r in rows:
        per.setdefault(r.o_custkey, []).append(r)
    for cust, vs in per.items():
        vs.sort(key=lambda r: r.version_no)
        assert [r.version_no for r in vs] == list(range(1, len(vs) + 1))
        assert sum(r.is_current for r in vs) == 1
        assert vs[-1].is_current and vs[-1].valid_to == "9999-12-31 00:00:00"
        for a, b in zip(vs, vs[1:]):
            assert a.valid_to == b.valid_from


def test_dq_checks_clean_testdata(spark, sf_dir):
    """The generated testdata satisfies every constraint — all five checks
    report zero violations (the suite exists to catch regressions in
    loaders/sinks that would break these invariants)."""
    rows = _q("rel_dq_checks")(spark, sf_dir).collect()
    assert [r.check_name for r in rows] == [
        "orders_orderkey_unique",
        "orders_custkey_not_null",
        "orders_customer_ref_integrity",
        "lineitem_orders_ref_integrity",
        "orders_totalprice_positive",
    ]
    assert all(r.n_violations == 0 for r in rows)
