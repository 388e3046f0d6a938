"""Binned point-in-interval range join — the scale path for range joins.

Spark plans a non-equi join as BroadcastNestedLoopJoin (fine when one side
broadcasts — see rel_join_range) or a cartesian shuffle (never fine).  When
BOTH sides are large, the standard fix (public Databricks/Flink "range join
optimization") is binning: quantize the range dimension into fixed-width
bins, explode each interval over the bins it overlaps, equi-join points to
intervals on the bin id, then refine with the exact predicate.

  * each point falls in exactly ONE bin, so a (point, interval) pair meets
    in at most one bin — no post-join dedup needed;
  * the equi-join shuffles hash-partitioned on bin id: sort-merge/shuffled-
    hash asymptotics, no pair explosion;
  * cost knob: bin_width ≈ median interval length keeps the per-interval
    explode factor ~2 and bounds bin fan-in; a hot bin is a data-skew
    problem handled by AQE skew-join like any other key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BIN = "__range_bin"


def bin_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with lo <= point < hi,
    via bin-equi-join + refine.  Output columns: points' then intervals'
    (minus the helper bin).  Intervals are assumed half-open [lo, hi) with
    lo <= hi; null bounds never match (SQL comparison semantics)."""
    p = points.withColumn(_BIN, F.floor(F.col(point_col) / bin_width))
    i = intervals.withColumn(
        _BIN,
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bin_width),
                F.floor(F.col(hi_col) / bin_width),
            )
        ),
    )
    refined = (F.col(point_col) >= F.col(lo_col)) & (
        F.col(point_col) < F.col(hi_col)
    )
    return p.join(i, [_BIN], how).filter(refined).drop(_BIN)
