"""SparkSession factory.

UTC session timezone is load-bearing: the reference formats dates with
``datetime.fromtimestamp(ts, tz=timezone.utc)`` (KnowledgeBot.py:481,517),
so every date-derivation operator (P4/P5) assumes UTC.

Scale posture (100 TB): AQE on (runtime re-plan, skew-join splitting,
partition coalescing), broadcast threshold left at default so small dims
(region/nation/users/channels) broadcast automatically, and shuffle
partitions sized from the environment so a real cluster can raise it to
O(cores * 2..4) while local tests stay small.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_session(
    app_name: str = "knowledgebot-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults applied."""
    active = SparkSession.getActiveSession()
    if active is not None and master is None and extra_conf is None:
        if shuffle_partitions is not None:
            # runtime-settable — apply instead of silently dropping it
            # (getOrCreate would ignore builder confs on an active session)
            active.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
        return active

    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"))
    # Minimum input splits >= available parallelism: a table whose files are
    # smaller than maxPartitionBytes otherwise scans as ONE task, so every
    # pre-shuffle expression (token hashing, regex extraction) runs on one
    # core.  Same rule a real cluster wants — measured 20-30% off the heavy
    # catalog queries locally.
    try:
        cpu_count = int(str(master).split("[")[1].rstrip("]"))
    except (IndexError, ValueError):
        cpu_count = os.cpu_count() or 8
    min_partitions = int(
        os.environ.get("SPARK_MIN_PARTITIONS", str(max(cpu_count, 8)))
    )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # SPARK_GRAFT_AQE=false lets the robustness sweep prove results are
        # layout-independent with runtime re-planning disabled too
        .config(
            "spark.sql.adaptive.enabled",
            os.environ.get("SPARK_GRAFT_AQE", "true"),
        )
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # keep partition columns as written (msg_date '20250101' stays a
        # string on read-back — the keyed sink round-trips its own schema)
        .config("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
        # NOTE: spark.sql.legacy.parquet.nanosAsLong is deliberately NOT set:
        # Spark 4.1 ignores it and reads TIMESTAMP(NANOS) natively as
        # TIMESTAMP_NTZ; tables.read_table carries a unit-detecting fallback
        # plus a canary for older/newer reader semantics.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.files.minPartitionNum", str(min_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    return builder.getOrCreate()
