"""Inflate sf0.1 testdata N-fold into a target dir for scaling stress runs
(SCALING.md method).  Facts are replicated with key shifts; documents get
per-copy token perturbation so dedup candidate volume stays realistic;
dimensions are passed through unchanged so join semantics hold.

Usage: python scripts/inflate_testdata.py [factor] [out_dir]
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from knowledgebot_spark.session import get_session
from knowledgebot_spark.tables import TABLES

SRC = "/root/testdata/sf0.1"
FACTOR = int(sys.argv[1]) if len(sys.argv) > 1 else 10
OUT = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/scale{FACTOR}x"

INFLATED = {"documents", "events", "orders", "lineitem", "embeddings"}


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    spark = get_session()
    spark.sparkContext.setLogLevel("ERROR")
    copies = spark.range(FACTOR).withColumnRenamed("id", "copy")
    for t in TABLES:
        src = f"{SRC}/{t}.parquet"
        dst = f"{OUT}/{t}.parquet"
        if t not in INFLATED:
            shutil.copy(src, dst + ".tmp")
            shutil.move(dst + ".tmp", dst)
            continue
        df = spark.read.parquet(src).crossJoin(F.broadcast(copies))
        if t == "documents":
            df = df.withColumn(
                "doc_id", F.col("doc_id") + F.col("copy") * 10_000_000
            ).withColumn(
                "text",
                F.when(F.col("copy") == 0, F.col("text")).otherwise(
                    F.concat_ws(" ", "text", F.concat(F.lit("c"), "copy"))
                ),
            )
        elif t == "events":
            df = df.withColumn(
                "event_id", F.col("event_id") + F.col("copy") * 10_000_000
            ).withColumn(
                # Spark 4.1 reads TIMESTAMP(NANOS) as timestamp_ntz; shift
                # each copy by 5 seconds via interval arithmetic
                "ts",
                F.col("ts") + F.expr("make_interval(0,0,0,0,0,0, copy * 5)"),
            )
        elif t == "orders":
            df = df.withColumn(
                "o_orderkey", F.col("o_orderkey") + F.col("copy") * 100_000_000
            )
        elif t == "lineitem":
            df = df.withColumn(
                "l_orderkey", F.col("l_orderkey") + F.col("copy") * 100_000_000
            )
        elif t == "embeddings":
            df = df.withColumn(
                "vec_id", F.col("vec_id") + F.col("copy") * 10_000_000
            )
        df.drop("copy").write.mode("overwrite").parquet(dst)
        print(f"inflated {t} x{FACTOR} -> {dst}")


if __name__ == "__main__":
    main()
