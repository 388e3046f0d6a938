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
    ordering is part of the correctness-evidence contract: queries that have
    ever earned a hash_match:true driver row (the generated DRIVER_GREEN
    set) sort last; among the never-checked rest, modules surface in
    _OUTPUT_ORDER with registration order within a module."""
    from knowledgebot_spark._driver_evidence import DRIVER_GREEN
    from knowledgebot_spark.registry import _OUTPUT_ORDER, load

    catalog = load()
    rank = {m: i for i, m in enumerate(_OUTPUT_ORDER)}
    keys = [
        (n in DRIVER_GREEN, rank.get(qd.fn.__module__, len(rank)))
        for n, qd in catalog.items()
    ]
    assert keys == sorted(keys), "catalog not ordered (unchecked-first, module rank)"
    window = list(catalog)[:50]
    # every window slot goes to a query with no prior driver evidence, as
    # long as any remain
    unchecked_total = sum(1 for n in catalog if n not in DRIVER_GREEN)
    expected = min(50, unchecked_total)
    assert sum(n not in DRIVER_GREEN for n in window) == expected


def test_driver_evidence_module_is_current():
    """_driver_evidence.py must be regenerated (scripts/gen_driver_evidence)
    whenever a new CORRECTNESS_r*.json lands, or the rotation re-burns
    already-proven queries."""
    import importlib.util
    import pathlib

    root = pathlib.Path(__file__).resolve().parents[1]
    spec = importlib.util.spec_from_file_location(
        "_gen_evidence", root / "scripts" / "gen_driver_evidence.py"
    )
    gen = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gen)
    from knowledgebot_spark._driver_evidence import DRIVER_GREEN

    assert frozenset(gen.collect()) == DRIVER_GREEN


def test_entry_runs(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "msg_key" in df.columns and "content" in df.columns
