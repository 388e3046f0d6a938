"""Distributed global ranking / cumulative primitives.

A ``Window.orderBy(...)`` with no ``partitionBy`` collapses the input onto a
single task — fine over a post-aggregate or top-k-cut relation, a
scale-killer over a corpus.  These helpers compute EXACT global
row_number / running-sum / ntile without ever forming a single partition,
entirely with JVM-side operators:

  1. range-partition the input on the order key (one shuffle; the range
     sampler keeps partitions balanced) and MATERIALIZE it once,
  2. rank / cumulate WITHIN each range partition via an ordinary
     partitioned window keyed on ``spark_partition_id()``,
  3. add per-partition offsets: a tiny aggregate (one row per partition)
     cumulated over |partitions| rows and broadcast back.

Correctness of the two-branch design requires the main branch and the
offsets branch to observe IDENTICAL range-partition boundaries.  That is
NOT something the planner guarantees for two separate exchanges over the
same logical input: the range sampler draws a fresh sample per exchange
execution, and two non-reused rangepartitioning exchanges over identical
data can assign different boundaries (where results used to come out
consistent, it was because a ReusedExchange / stage reuse happened to
fire — an optimization, not a contract).  So ``_ranged`` materializes the
ranged relation ONCE via ``localCheckpoint(eager=True)`` (the repo's
established pattern, cf. llm_semdedup / llm_pagerank_knn / llm_mmr_rerank):
the range shuffle executes exactly once, both consumers read the same
persisted blocks, and boundary agreement is structural rather than
planner-dependent.  The cost is one MEMORY_AND_DISK materialization of the
ranged relation — linear, spillable, and it replaces what was previously a
full second scan + key-only shuffle, so the trade is roughly neutral in
I/O and sound where the old plan was not.  Fault-tolerance caveat:
``localCheckpoint`` TRUNCATES LINEAGE — if an executor holding checkpoint
blocks is lost mid-job, Spark cannot recompute them and the job fails
(rather than silently recomputing with fresh, possibly different,
boundaries; for this operator fail-stop is the correct failure mode, since
a recomputed range sample could disagree across the two branches).
Long-running production jobs on preemptible nodes should substitute a
reliable ``checkpoint()`` to durable storage at the same call site — same
semantics, survives executor loss, one extra write.  The only
unpartitioned window left runs over
|partitions| rows — bounded by cluster configuration, not data volume.

Callers must pass a total order (include a unique tiebreaker); results are
then identical to the single-partition formulation row for row —
property-tested in ``tests/test_ranking.py``, which also asserts the
runtime guard: the offsets relation's grand total equals the input count
(``_TOTAL`` with ``per_part=count``), which could not hold under boundary
disagreement between branches.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__gr_pid"
_LOCAL = "__gr_local"
_OFFSET = "__gr_offset"
_TOTAL = "__gr_total"


def _ranged(df: DataFrame, order_cols: list[Column], num_partitions: int | None):
    if num_partitions is None:
        parts = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        num_partitions = int(parts)
    # explicit partition count (AQE leaves user repartitions alone), then
    # localCheckpoint so the seeded range sampling happens exactly once and
    # the main + offsets branches share one physical partitioning — see the
    # module docstring for why two separate exchanges would be unsound
    return (
        df.repartitionByRange(num_partitions, *order_cols)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint(eager=True)
    )


def _offsets(ranged: DataFrame, per_part: Column) -> DataFrame:
    """(pid, offset, total) — offset = sum of ``per_part`` over LOWER pids."""
    counts = ranged.groupBy(_PID).agg(per_part.alias("_n"))
    w = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    return counts.select(
        _PID,
        F.coalesce(F.sum("_n").over(w), F.lit(0)).cast("long").alias(_OFFSET),
        F.sum("_n").over(
            Window.orderBy(_PID).rangeBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).cast("long").alias(_TOTAL),
    )


def with_global_row_number(
    df: DataFrame,
    order_cols: list[Column],
    out: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append an exact global ``row_number`` over ``order_cols`` (must be a
    total order) without a single-partition window."""
    ranged = _ranged(df, order_cols, num_partitions)
    local = ranged.withColumn(
        _LOCAL,
        F.row_number().over(Window.partitionBy(_PID).orderBy(*order_cols)),
    )
    offs = _offsets(ranged, F.count(F.lit(1)))
    return (
        local.join(F.broadcast(offs), _PID)
        .withColumn(out, (F.col(_OFFSET) + F.col(_LOCAL)).cast("long"))
        .drop(_PID, _LOCAL, _OFFSET, _TOTAL)
    )


def with_global_cumsum(
    df: DataFrame,
    order_cols: list[Column],
    value: Column,
    out: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append an exact global running sum of ``value`` over ``order_cols``
    (rows between unbounded preceding and current row)."""
    ranged = _ranged(df, order_cols, num_partitions).withColumn("__gr_val", value)
    local = ranged.withColumn(
        _LOCAL,
        F.sum("__gr_val").over(
            Window.partitionBy(_PID)
            .orderBy(*order_cols)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    offs = _offsets(ranged, F.sum("__gr_val"))
    return (
        local.join(F.broadcast(offs), _PID)
        .withColumn(out, F.col(_OFFSET) + F.col(_LOCAL))
        .drop(_PID, _LOCAL, _OFFSET, _TOTAL, "__gr_val")
    )


def with_global_rank_cumsum(
    df: DataFrame,
    order_cols: list[Column],
    value: Column,
    rn_out: str = "rn",
    cum_out: str = "cum",
    total_out: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Append exact global ``row_number`` AND running sum of ``value`` over
    ``order_cols`` in ONE ranged pass (shared materialized partitioning, one
    offsets relation carrying both the count and the value prefix-sums).
    When ``total_out`` is given, also append the grand total of ``value`` —
    replacing a ``sum() OVER ()`` whole-relation window at zero extra
    cost (the offsets relation already knows it)."""
    ranged = _ranged(df, order_cols, num_partitions).withColumn("__gr_val", value)
    w_loc = Window.partitionBy(_PID).orderBy(*order_cols)
    local = ranged.withColumn(
        _LOCAL, F.row_number().over(w_loc)
    ).withColumn(
        "__gr_lcum",
        F.sum("__gr_val").over(
            w_loc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    counts = ranged.groupBy(_PID).agg(
        F.count(F.lit(1)).alias("_n"), F.sum("__gr_val").alias("_s")
    )
    w_prev = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.orderBy(_PID).rangeBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offs = counts.select(
        _PID,
        F.coalesce(F.sum("_n").over(w_prev), F.lit(0)).cast("long").alias(_OFFSET),
        F.coalesce(F.sum("_s").over(w_prev), F.lit(0)).alias("__gr_soff"),
        F.sum("_s").over(w_all).alias(_TOTAL),
    )
    out = (
        local.join(F.broadcast(offs), _PID)
        .withColumn(rn_out, (F.col(_OFFSET) + F.col(_LOCAL)).cast("long"))
        .withColumn(cum_out, F.col("__gr_soff") + F.col("__gr_lcum"))
    )
    if total_out is not None:
        out = out.withColumn(total_out, F.col(_TOTAL))
    return out.drop(_PID, _LOCAL, _OFFSET, _TOTAL, "__gr_val", "__gr_lcum", "__gr_soff")


def with_global_ntile(
    df: DataFrame,
    order_cols: list[Column],
    n_buckets: int,
    out: str = "tile",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append an exact global ``ntile(n_buckets)`` over ``order_cols``.

    Standard SQL ntile semantics: with N rows, the first N % n buckets get
    ceil(N/n) rows, the rest floor(N/n) — derived arithmetically from the
    global row number and total count (both exact), matching
    ``F.ntile(n).over(Window.orderBy(...))`` row for row."""
    ranged = _ranged(df, order_cols, num_partitions)
    local = ranged.withColumn(
        _LOCAL,
        F.row_number().over(Window.partitionBy(_PID).orderBy(*order_cols)),
    )
    offs = _offsets(ranged, F.count(F.lit(1)))
    rn = F.col(_OFFSET) + F.col(_LOCAL)  # 1-based global row number
    # all-integer arithmetic (Spark `/` is double division, exact only to
    # 2^53 — `div` keeps bigint/bigint in the integer domain at any scale)
    q_floor = F.expr(f"{_TOTAL} div {n_buckets}")
    r = F.col(_TOTAL) % F.lit(n_buckets)
    big = r * (q_floor + 1)  # rows covered by the (q+1)-sized buckets
    tile = F.when(
        rn <= big,
        F.expr(f"({_OFFSET} + {_LOCAL} - 1) div ({_TOTAL} div {n_buckets} + 1)") + 1,
    ).otherwise(
        r
        + F.expr(
            f"({_OFFSET} + {_LOCAL} - 1 - ({_TOTAL} % {n_buckets})"
            f" * ({_TOTAL} div {n_buckets} + 1))"
            f" div greatest({_TOTAL} div {n_buckets}, 1)"
        )
        + 1
    )
    return (
        local.join(F.broadcast(offs), _PID)
        .withColumn(out, tile.cast("int"))
        .drop(_PID, _LOCAL, _OFFSET, _TOTAL)
    )
