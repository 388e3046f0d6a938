"""Generic MERGE INTO (upsert/delete) as a relational operator.

The reference's sink merges by delete-then-rewrite at file granularity
(KnowledgeBot.py:351-379,483-485 — re-expressed in sinks/keyed_parquet.py);
this module is the *relational* form of the same contract: given a target
table and a source of amendments, produce the post-MERGE row set

  * matched + delete-flag      -> row removed
  * matched                    -> source (updated) values
  * source-only (not deleted)  -> inserted
  * target-only                -> unchanged

which is exactly ANSI ``MERGE INTO`` with WHEN MATCHED THEN UPDATE /
WHEN MATCHED AND is_delete THEN DELETE / WHEN NOT MATCHED THEN INSERT,
and the row-level semantics Delta/Iceberg writers implement physically.

Scale posture (100 TB): one full-outer equi-join on the merge key — a
single hash shuffle per side, sort-merge asymptotics, no nested loops.
In a production lakehouse the join is preceded by file/partition pruning
on the source's key range (see sinks/keyed_parquet.py for the keyed
partition-pruned physical variant); the relational semantics here are
what that pruning must preserve.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SRC_MARK = "__src_present"


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    delete_col: str | None = None,
) -> DataFrame:
    """Post-MERGE rows of ``target`` amended by ``source``.

    ``source`` must carry every ``target`` column (same names); an optional
    boolean ``delete_col`` marks amendments that delete instead of upsert.
    Merge keys are assumed non-null on both sides (standard MERGE
    precondition; null keys would never match and insert as new rows).
    """
    src = source.withColumn(_SRC_MARK, F.lit(True)).alias("s")
    tgt = target.alias("t")
    cond = None
    for k in keys:
        c = F.col(f"t.{k}") == F.col(f"s.{k}")
        cond = c if cond is None else (cond & c)
    joined = tgt.join(src, cond, "full_outer")

    src_present = F.col(f"s.{_SRC_MARK}").isNotNull()
    if delete_col is not None:
        deleted = src_present & F.coalesce(F.col(f"s.{delete_col}"), F.lit(False))
    else:
        deleted = F.lit(False)

    out = []
    for c in target.columns:
        if c in keys:
            out.append(F.coalesce(F.col(f"s.{c}"), F.col(f"t.{c}")).alias(c))
        else:
            out.append(
                F.when(src_present, F.col(f"s.{c}"))
                .otherwise(F.col(f"t.{c}"))
                .alias(c)
            )
    return joined.filter(~deleted).select(*out)
