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

# (session id, path) -> loaded DataFrame.  Schema inference runs a small
# footer-reading Spark job per spark.read.parquet() call, and even a
# schema-pinned reader costs several py4j round-trips; query builders
# re-read the same static tables constantly, so cache the (immutable)
# DataFrame itself — building a catalog DataFrame then launches ZERO jobs
# (asserted by tests/test_plans.py::test_tfidf_builds_without_spark_job)
# and re-uses one analyzed relation per table.  At 100 TB the same
# discipline applies: a production catalog pins schemas (metastore /
# contract files) instead of re-footer-scanning per query.
_DF_CACHE: dict = {}


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir}/{name}.parquet"
    key = (id(spark), path)
    df = _DF_CACHE.get(key)
    if df is None:
        schema = spark.read.parquet(path).schema
        df = spark.read.schema(schema).parquet(path)
        if name == "events" and dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        _DF_CACHE[key] = df
    return df
