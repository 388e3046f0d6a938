"""Z-order layout (operators/layout.py + rel_zorder_skipping): the key
construction is pinned against a pure-python Morton reference, and the
staged files' parquet footers prove real 2-D zone-map skippability —
the property the query's docstring claims and the value hash can't see."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def catalog():
    from knowledgebot_spark.registry import load

    return load()


def _morton(vals: tuple[int, ...], bits: int) -> int:
    z = 0
    n = len(vals)
    for i in range(bits):
        for j, v in enumerate(vals):
            z |= ((v >> i) & 1) << (i * n + j)
    return z


def test_zorder_key_matches_python_reference(spark):
    from knowledgebot_spark.operators.layout import zorder_key

    df = spark.range(0, 300).select(
        (F.col("id") * 7 % 256).alias("x"), (F.col("id") * 13 % 256).alias("y")
    )
    rows = df.withColumn("z", zorder_key(["x", "y"], bits=8)).collect()
    for r in rows:
        assert r.z == _morton((r.x, r.y), 8), (r.x, r.y)


def test_zorder_key_width_guard():
    from knowledgebot_spark.operators.layout import zorder_key

    with pytest.raises(ValueError):
        zorder_key(["a", "b", "c", "d"], bits=16)  # 64 bits > 63


def _overlapping_files(base: str, pred) -> tuple[int, int]:
    """(files whose [min,max] column stats overlap the box, total files)."""
    files = [
        os.path.join(base, f)
        for f in os.listdir(base)
        if f.endswith(".parquet")
    ]
    hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        stats = {}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                s = col.statistics
                if s is None or not s.has_min_max:
                    continue
                lo, hi = stats.get(name, (s.min, s.max))
                stats[name] = (min(lo, s.min), max(hi, s.max))
        if pred(stats):
            hit += 1
    return hit, len(files)


def test_zorder_files_are_skippable_on_both_dimensions(spark, sf_dir, catalog):
    row = catalog["rel_zorder_skipping"].fn(spark, sf_dir).collect()[0]
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    assert row.n_total_rows == li.count()  # staging lost nothing
    pmax, smax = li.agg(F.max("l_partkey"), F.max("l_suppkey")).collect()[0]
    p_hi, s_lo, s_hi = pmax // 8, smax // 4, smax // 2

    def overlaps(stats) -> bool:
        plo, phi = stats["l_partkey"]
        slo, shi = stats["l_suppkey"]
        return plo <= p_hi and shi >= s_lo and slo <= s_hi

    base = f"/tmp/knowledgebot_spark/fmt/{os.path.basename(sf_dir.rstrip('/'))}/lineitem_zorder"
    hit, total = _overlapping_files(base, overlaps)
    assert total == 16
    # the 1/8 x 1/4 box must leave at least half the files skippable on
    # footer stats alone
    assert hit <= total // 2, f"z-order box overlapped {hit}/{total} files"

    # baseline: the same data hash-scattered into 16 files is NOT skippable
    scatter = f"{base}_scatter_baseline"
    if not os.path.exists(os.path.join(scatter, "_SUCCESS")):
        li.repartition(16, "l_orderkey").write.mode("overwrite").parquet(scatter)
    s_hit, s_total = _overlapping_files(scatter, overlaps)
    assert s_total == 16
    assert s_hit > hit, "hash layout should overlap strictly more files"
    assert s_hit >= s_total - 1  # scattered stats cover ~the full domain
