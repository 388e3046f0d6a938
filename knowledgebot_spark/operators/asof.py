"""Distributed as-of (point-in-time) join.

Spark has no native ASOF JOIN (DuckDB/Pandas/kdb do); the naive encoding —
a non-equi range join — plans as BroadcastNestedLoopJoin and dies at scale.
This is the scalable formulation: UNION both sides tagged, single shuffle
on the join key, and a running ``last(right_payload, ignorenulls=True)``
window carries the most recent right row forward onto each left row.

  cost = one hash shuffle on (key) + one sort within partitions —
  identical asymptotics to a regular sort-merge join, no pair explosion,
  AQE-skew-splittable.  At 100 TB both sides stream through the same
  exchange; nothing is broadcast and nothing is quadratic.

Tie semantics match DuckDB ``ASOF JOIN ... ON r.ts <= l.ts`` (inclusive):
a right row AT the left timestamp wins over an earlier one; among right
rows sharing the same (key, ts), the one with the greatest tiebreak column
wins (callers should dedupe or accept that documented choice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    right_cols: tuple[str, ...] = (),
    tiebreak_col: str | None = None,
    how: str = "left",
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the closest right row with matching ``on``
    key: ``direction='backward'`` (default) takes the latest right row at
    or before the left timestamp (``right.ts <= left.ts``);
    ``'forward'`` the earliest at or after it (``right.ts >= left.ts``) —
    the pandas ``merge_asof`` direction semantics, both inclusive.  The
    forward form is the SAME union + tagged-sort + running-last plan with
    the timestamp ordering reversed — identical cost.

    ``right_cols`` are the right-side payload columns to carry (returned
    as ``asof_<name>``).  ``how='inner'`` drops left rows with no match in
    the chosen direction; ``'left'`` keeps them with null payload.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    payload = F.struct(
        *[F.col(c) for c in (ts_col, *right_cols)],
        *( [F.col(tiebreak_col).alias("_tb")] if tiebreak_col else [] ),
    )
    r = right.select(
        F.col(on),
        F.col(ts_col),
        F.lit(0).alias("_side"),  # right sorts BEFORE left at equal ts => inclusive <=
        payload.alias("_asof"),
    )
    # left keeps ALL its columns; align by adding the tag + null payload
    lhs = left.withColumn("_side", F.lit(1)).withColumn(
        "_asof", F.lit(None).cast(r.schema["_asof"].dataType)
    )
    # bring right rows into the left schema with nulls for left-only columns
    left_only = [c for c in lhs.columns if c not in (on, ts_col, "_side", "_asof")]
    rhs = r
    for c in left_only:
        rhs = rhs.withColumn(c, F.lit(None).cast(lhs.schema[c].dataType))
    unioned = lhs.unionByName(rhs.select(lhs.columns))

    # right (side 0) sorts before left (side 1) at equal ts => inclusive <=;
    # among same-(key, ts) right rows the greatest tiebreak sorts last and
    # wins the running last()
    ts_ord = F.col(ts_col).asc() if direction == "backward" else F.col(ts_col).desc()
    order = [ts_ord, F.col("_side").asc()]
    if tiebreak_col:
        order.append(
            F.when(F.col("_side") == 0, F.col("_asof._tb")).asc_nulls_first()
        )
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "_carry", F.last("_asof", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("_side") == 1).select(
        *[F.col(c) for c in left.columns],
        F.col(f"_carry.{ts_col}").alias(f"asof_{ts_col}"),
        *[F.col(f"_carry.{c}").alias(f"asof_{c}") for c in right_cols],
    )
    if how == "inner":
        out = out.filter(F.col(f"asof_{ts_col}").isNotNull())
    return out
