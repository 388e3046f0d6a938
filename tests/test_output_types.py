"""Catalog-wide output-schema audit (VERDICT r02 item 3).

The driver's correctness gate canonicalizes query outputs through pandas;
complex-typed cells (arrays, maps, structs), decimals, and binary crash or
dtype-diverge in that bridge (the r02 sweep aborted on rel_higher_order's
raw array columns).  Every registered query must therefore emit only
driver-safe scalar columns.  This test builds every catalog DataFrame (plan
only — no execution) and asserts the schema.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from knowledgebot_spark.registry import load

SAFE_TYPES = (
    T.StringType,
    T.LongType,
    T.IntegerType,
    T.ShortType,
    T.ByteType,
    T.DoubleType,
    T.FloatType,
    T.BooleanType,
    T.DateType,
    T.TimestampType,
)

# Queries whose build step *executes* (streaming AvailableNow drains, sink
# round-trips) are still audited — they just cost seconds, not millis.


def _catalog():
    return sorted(load().items())


@pytest.mark.parametrize("name,qd", _catalog(), ids=[n for n, _ in _catalog()])
def test_output_schema_is_driver_safe(spark, sf_dir, name, qd):
    df = qd.fn(spark, sf_dir)
    bad = [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in df.schema.fields
        if not isinstance(f.dataType, SAFE_TYPES)
    ]
    assert not bad, (
        f"{name} emits driver-unsafe column types {bad}; serialize complex "
        "types to strings (array_join/to_json) and cast decimals in-query"
    )
