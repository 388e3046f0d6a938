"""Testdata table loaders.

``events.parquet`` stores ``ts`` as parquet TIMESTAMP(NANOS), which Spark
has no native type for; the session sets
``spark.sql.legacy.parquet.nanosAsLong`` and this loader converts the raw
nanosecond longs to a proper TimestampType (the data's actual precision is
microseconds, so the truncation is lossless — DuckDB reads the same file as
TIMESTAMP_NS and compares at micros).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df
