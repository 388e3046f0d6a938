"""Driver-contract invariants: catalog loads, names unique, oracle keys are
a subset of query keys, entry() contract shape."""

from __future__ import annotations


def test_catalog_loads_and_oracle_subset():
    from knowledgebot_spark.registry import load, oracle_sql, queries

    catalog = load()
    assert len(catalog) >= 60
    q = queries()
    o = oracle_sql()
    assert set(o) <= set(q)
    # since round 5 EVERY query carries an oracle — approximate/fitted-model
    # ops emit gated-hash contracts (exact values + quality booleans) instead
    # of falling back to rows-only.  A new rows-only query needs a deliberate
    # decision, not a missing sql=.
    assert set(o) == set(q), f"rows-only queries: {sorted(set(q) - set(o))}"


def test_output_order_is_evidence_policy():
    """The driver hash-checks only the FIRST 50 queries() entries, so output
    ordering is part of the correctness-evidence contract: never-checked
    queries sort first (new work enters the window immediately); then
    queries whose implementation CHANGED since their last green stamp
    (round 11: evidence must follow code churn, not just age); then
    checked queries by the round they were LAST hash-green, ascending —
    the re-certification rotation that keeps driver evidence from aging
    once coverage is closed.  Ties break by _OUTPUT_ORDER module rank,
    then registration order."""
    from knowledgebot_spark import stamps
    from knowledgebot_spark.registry import _OUTPUT_ORDER, last_green_round, load

    last = last_green_round()
    catalog = load()
    changed = stamps.changed_since_stamp(last)
    rank = {m: i for i, m in enumerate(_OUTPUT_ORDER)}

    def cls(n: str) -> int:
        return 0 if n not in last else (1 if n in changed else 2)

    keys = [
        (cls(n), last.get(n, 0), rank.get(qd.fn.__module__, len(rank)))
        for n, qd in catalog.items()
    ]
    assert keys == sorted(keys), "catalog not ordered (class, staleness, rank)"
    window = list(catalog)[:50]
    # every window slot outranks anything outside it under the same key
    outside = list(catalog)[50:]
    if outside:
        max_in = max((cls(n), last.get(n, 0)) for n in window)
        min_out = min((cls(n), last.get(n, 0)) for n in outside)
        assert max_in <= min_out, "window skips a higher-priority query"
    # never-checked queries always claim window slots first
    unchecked_total = sum(1 for n in catalog if n not in last)
    expected = min(50, unchecked_total)
    assert sum(n not in last for n in window) == expected
    # changed-since-stamp queries claim the next slots
    assert sum(n in changed for n in window) == min(
        50 - expected, len([n for n in changed if n in last])
    )


def test_driver_evidence_derivation():
    """driver_green() mirrors the CORRECTNESS files: every hash-green name
    appears, failed/rows-only rows do not."""
    import json
    import pathlib

    from knowledgebot_spark.registry import driver_green

    root = pathlib.Path(__file__).resolve().parents[1]
    expected = set()
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        for name, row in json.loads(p.read_text()).items():
            if isinstance(row, dict) and row.get("hash_match") is True:
                expected.add(name)
    assert driver_green() == frozenset(expected)
    assert len(expected) >= 90  # cumulative r02-r04 evidence


def test_entry_runs(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "msg_key" in df.columns and "content" in df.columns
