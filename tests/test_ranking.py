"""operators/ranking.py: exact global row_number / cumsum / ntile computed
via range-partition + partition-offset must equal the single-partition
window formulation row for row, and must never plan an unpartitioned window
over the input (only over the |partitions|-row offset relation)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from knowledgebot_spark.operators import ranking as rk


@pytest.fixture()
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_global_row_number_matches_single_partition(docs):
    order = [F.col("n_chars").desc(), F.col("doc_id").asc()]
    got = rk.with_global_row_number(docs, order, out="rn", num_partitions=7)
    naive = docs.withColumn("rn", F.row_number().over(Window.orderBy(*order)))
    diff = got.select("doc_id", "rn").exceptAll(naive.select("doc_id", "rn"))
    assert diff.count() == 0
    assert got.count() == docs.count()


def test_global_cumsum_matches_single_partition(docs):
    order = [F.col("doc_id").asc()]
    got = rk.with_global_cumsum(
        docs, order, F.col("n_chars").cast("long"), out="cum", num_partitions=5
    )
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    naive = docs.withColumn("cum", F.sum(F.col("n_chars").cast("long")).over(w))
    diff = got.select("doc_id", "cum").exceptAll(naive.select("doc_id", "cum"))
    assert diff.count() == 0


@pytest.mark.parametrize("n_buckets", [4, 10, 1000])
def test_global_ntile_matches_single_partition(docs, n_buckets):
    # n_buckets=1000 exceeds the row count at sf0.001 -> exercises the
    # N < n degenerate branch (one row per non-empty bucket)
    order = [F.col("n_chars").asc(), F.col("doc_id").asc()]
    got = rk.with_global_ntile(docs, order, n_buckets, out="tile", num_partitions=6)
    naive = docs.withColumn("tile", F.ntile(n_buckets).over(Window.orderBy(*order)))
    diff = got.select("doc_id", "tile").exceptAll(naive.select("doc_id", "tile"))
    assert diff.count() == 0


def test_no_corpus_unpartitioned_window_in_plan(docs):
    got = rk.with_global_row_number(
        docs, [F.col("doc_id").asc()], out="rn", num_partitions=7
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    # the offset branch's tiny window is partitionless by design; the main
    # branch's window must be keyed on the pid column
    assert "windowspecdefinition(__gr_pid" in plan
    # both branches range-partition; the offsets branch is column-pruned to
    # the order keys (cheap second pass — ReusedExchange cannot fire across
    # differently-pruned projections)
    assert plan.count("rangepartitioning") >= 1

def test_ranking_ops_on_empty_input(spark):
    empty = spark.createDataFrame([], "doc_id long, n_chars long")
    order = [F.col("doc_id").asc()]
    assert rk.with_global_row_number(empty, order, num_partitions=4).count() == 0
    assert (
        rk.with_global_cumsum(
            empty, order, F.col("n_chars"), num_partitions=4
        ).count()
        == 0
    )
    assert rk.with_global_ntile(empty, order, 4, num_partitions=4).count() == 0


def test_rank_cumsum_combined_matches_separate(docs):
    order = [F.col("n_chars").desc(), F.col("doc_id").asc()]
    both = rk.with_global_rank_cumsum(
        docs, order, F.col("n_chars").cast("long"),
        rn_out="rn", cum_out="cum", total_out="tot", num_partitions=5,
    )
    rn_only = rk.with_global_row_number(docs, order, out="rn", num_partitions=5)
    cum_only = rk.with_global_cumsum(
        docs, order, F.col("n_chars").cast("long"), out="cum", num_partitions=5
    )
    assert (
        both.select("doc_id", "rn").exceptAll(rn_only.select("doc_id", "rn")).count()
        == 0
    )
    assert (
        both.select("doc_id", "cum")
        .exceptAll(cum_only.select("doc_id", "cum"))
        .count()
        == 0
    )
    total = docs.agg(F.sum(F.col("n_chars").cast("long"))).first()[0]
    assert both.select("tot").distinct().first()[0] == total
