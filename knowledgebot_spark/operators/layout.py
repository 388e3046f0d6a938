"""Multi-dimensional data layout: Z-order (Morton) clustering keys.

At 100 TB, single-column sort keys only help range predicates on that one
column; queries that box-filter on TWO correlated keys (partkey x
suppkey, tenant x time, ...) read ~every file under any 1-D layout.
Interleaving the bits of both keys (Morton order) makes file/row-group
min-max zone maps selective in BOTH dimensions at once: a box query
overlaps O(perimeter) of the Z-curve instead of O(rows), so a
``repartitionByRange`` + sort on the Z key turns parquet footer stats
into a 2-D spatial index with zero runtime machinery.

Everything here is JVM-side built-ins (shift/and/or under whole-stage
codegen) — no UDFs; the Z key of a billion rows costs one projection.

Reference parity: none (the reference has no storage layout tier);
pattern follows the Delta/Iceberg OPTIMIZE ZORDER design as published.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each column into one BIGINT
    Morton key.  Columns must be non-negative integers that fit in
    ``bits`` bits — quantize/bucket first if they don't (the caller owns
    the mapping; ranks or min-max scaling both work).  With n columns,
    bit i of column j lands at position ``i*n + j``, so the total key
    width is ``bits * n`` (must stay <= 63).

    The expression is a flat OR-chain of shift/mask terms — pure
    whole-stage-codegen arithmetic, no UDF, no shuffle.
    """
    ncols = [F.col(c) if isinstance(c, str) else c for c in cols]
    n = len(ncols)
    if bits * n > 63:
        raise ValueError(f"zorder key would need {bits * n} bits; max 63")
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        for j, c in enumerate(ncols):
            bit = F.shiftright(c.cast("bigint"), i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 16,
    bits: int = 16,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered by the Z-order
    of ``cols``: range-partition on the Z key (balanced file sizes via
    the range sampler), sort within partitions so row-group min/max
    stats are tight, drop the key before writing.  Readers need no
    special support — parquet zone maps + pushed filters do the
    skipping."""
    z = zorder_key(cols, bits=bits).alias("__zkey")
    (
        df.withColumn("__zkey", z)
        .repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
