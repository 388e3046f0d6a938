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
    # the vast majority must be oracle-checked; rows-only is reserved for
    # genuinely non-SQL-reproducible ops (HLL sketch, MLlib fitted models)
    assert len(o) >= round(len(q) * 0.95)


def test_entry_runs(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "msg_key" in df.columns and "content" in df.columns
