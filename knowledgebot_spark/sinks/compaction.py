"""Small-file compaction for the keyed parquet sink (SURVEY.md §4 O7).

Every incremental ``upsert_chunks`` run rewrites its affected partitions
with however many tasks the batch plan produced, so a hot partition
accretes one-file-per-run.  At 100 TB that is the classic lakehouse
small-file problem: scan parallelism degrades to file count, footer reads
dominate, and the NameNode/listing cost grows without bound.  This module
is the maintenance half of the sink contract: find fragmented partitions
from directory *metadata* (never data), rewrite ONLY those via dynamic
partition overwrite, one shuffle keyed on the partition columns so each
partition lands in exactly one task -> exactly one file.

The reference has no analogue (it writes one .txt per chunk and never
compacts — the pathology, not the cure); the compaction policy follows
the public Delta/Iceberg OPTIMIZE design: pick rewrite candidates by
file-count threshold, rewrite partition-atomically, leave cold partitions
untouched.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from knowledgebot_spark.sinks.keyed_parquet import DEFAULT_PARTITIONS

_PCT = re.compile(r"%([0-9A-F]{2})")


def _unescape_partition_value(value: str) -> str:
    """Inverse of Hive escapePathName (keyed_parquet._escape_partition_value):
    '%' itself is always escaped as %25, so the decode is unambiguous."""
    return _PCT.sub(lambda m: chr(int(m.group(1), 16)), value)


def partition_file_counts(
    path: str, partition_cols: tuple[str, ...] = DEFAULT_PARTITIONS
) -> dict[tuple, int]:
    """(partition values) -> number of data files, from a driver-side
    directory walk.  This is partition METADATA (dir names + file counts),
    the same listing any table format keeps in its manifest — never row
    data; cost is O(partitions + files), not O(rows)."""
    counts: dict[tuple, int] = {}
    depth = len(partition_cols)
    for root, _dirs, files in os.walk(path):
        rel = os.path.relpath(root, path)
        if rel == ".":
            continue
        parts = rel.split(os.sep)
        if len(parts) != depth:
            continue
        values = []
        ok = True
        for col, comp in zip(partition_cols, parts):
            prefix = f"{col}="
            if not comp.startswith(prefix):
                ok = False
                break
            values.append(_unescape_partition_value(comp[len(prefix):]))
        if not ok:
            continue
        n = sum(1 for f in files if f.endswith(".parquet"))
        if n:
            counts[tuple(values)] = n
    return counts


def compact_keyed_table(
    spark: SparkSession,
    path: str,
    partition_cols: tuple[str, ...] = DEFAULT_PARTITIONS,
    max_files_per_partition: int = 1,
) -> int:
    """Rewrite every partition holding more than ``max_files_per_partition``
    data files down to one file each; returns the number of partitions
    compacted.  Cold partitions are never read or written (dynamic
    partition overwrite replaces only the partitions present in the
    rewrite set)."""
    fragmented = [
        values
        for values, n in partition_file_counts(path, partition_cols).items()
        if n > max_files_per_partition
    ]
    if not fragmented:
        return 0

    pred = F.lit(False)
    for values in fragmented:
        clause = F.lit(True)
        for col, val in zip(partition_cols, values):
            clause = clause & (F.col(col) == F.lit(val))
        pred = pred | clause

    rows = spark.read.parquet(path).filter(pred)
    # One hash shuffle on the partition key: every partition tuple maps to
    # exactly one task, so the writer emits exactly one file per partition.
    (
        rows.repartition(*[F.col(c) for c in partition_cols])
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )
    return len(fragmented)
