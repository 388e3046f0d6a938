"""Timestamp-semantics canary tests (VERDICT r03 item 4).

pyspark minor bumps have silently changed how parquet TIMESTAMP(NANOS) is
delivered (nanos-as-long under a legacy conf -> native TIMESTAMP_NTZ on
4.1); round 3's streaming family shipped 1970-dated windows because of it.
These tests pin the loader's defenses: the epoch-unit detector, the
year-plausibility canary, and batch/streaming reader agreement.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from knowledgebot_spark import tables


def _long_ts_df(spark, value):
    return spark.createDataFrame(
        [(value,)], StructType([StructField("ts", LongType())])
    )


@pytest.mark.parametrize(
    "raw,unit",
    [
        (1704067798, "seconds"),
        (1704067798778549, "micros"),
        (1704067798778549000, "nanos"),
    ],
)
def test_events_ts_unit_detection(spark, raw, unit):
    """The bigint fallback maps seconds/micros/nanos longs to the same
    2024-01-01 instant by magnitude."""
    out = tables._events_ts_from_long(_long_ts_df(spark, raw), raw)
    got = out.select(F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("s")).first().s
    assert got == "2024-01-01 00:09:58", f"{unit} long misdecoded: {got}"


def test_events_canary_accepts_testdata(spark, sf_dir):
    """read_table's one-row canary passes on real testdata and yields a
    timestamp-typed, 2024-dated ts column."""
    df = tables.read_table(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] in ("timestamp", "timestamp_ntz")
    y = df.select(F.year("ts").alias("y")).first().y
    assert 2000 <= y <= 2100


def test_events_canary_rejects_epoch_shift(spark):
    """A reader regression that lands events in 1970 fails loudly at load."""
    df = _long_ts_df(spark, 1704067798778549)  # micros
    shifted = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    with pytest.raises(AssertionError, match="canary"):
        tables._canary(shifted, "synthetic")


def test_batch_and_streaming_ts_agree(spark, sf_dir):
    """The streaming reader's declared schema and the batch loader must
    produce the same first-event wall-clock instant (formatted under the
    pinned UTC session TZ) — the exact invariant the r03 bug broke."""
    from knowledgebot_spark.streaming import pipeline as sp

    batch_min = (
        tables.read_table(spark, sf_dir, "events")
        .select(F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("m"))
        .first()
        .m
    )
    stream_min = (
        sp.run_to_memory(
            sp.read_events_stream(spark, sf_dir)
            .groupBy()
            .agg(F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("m")),
            "complete",
        )
        .first()
        .m
    )
    assert batch_min.startswith("20"), batch_min
    assert stream_min == batch_min
