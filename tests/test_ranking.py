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
    # the ranged relation is materialized once (localCheckpoint) so both
    # branches share ONE physical range partitioning — the downstream plan
    # must therefore scan the checkpointed RDD, not re-shuffle, and contain
    # NO rangepartitioning exchange of its own
    assert "ExistingRDD" in plan or "Scan ExistingRDD" in plan
    assert "rangepartitioning" not in plan


def test_offsets_total_guards_boundary_agreement(docs):
    """Runtime guard from the round-5 advice: the offsets relation's grand
    total must equal the input count — an invariant that cannot hold if the
    offsets branch saw different partition boundaries (e.g. rows double-
    counted or dropped across disagreeing pid assignments)."""
    n = docs.count()
    ranged = rk._ranged(docs, [F.col("doc_id").asc()], num_partitions=7)
    offs = rk._offsets(ranged, F.count(F.lit(1)))
    totals = [r[rk._TOTAL] for r in offs.collect()]
    assert totals and all(t == n for t in totals)
    # and end-to-end: every row survives the pid join (no orphaned pids)
    got = rk.with_global_row_number(docs, [F.col("doc_id").asc()], num_partitions=7)
    assert got.count() == n

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


def test_global_ranking_property_random_inputs(spark):
    """Hypothesis property: for arbitrary (key, value) multisets —
    duplicates, negatives, skew — the distributed row_number/cumsum/ntile
    agree with the single-partition window formulation row for row."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        rows=st.lists(
            st.tuples(st.integers(-5, 5), st.integers(-100, 100)),
            min_size=1,
            max_size=60,
        ),
        parts=st.integers(1, 9),
        buckets=st.integers(1, 7),
    )
    def check(rows, parts, buckets):
        df = spark.createDataFrame(
            [(i, k, v) for i, (k, v) in enumerate(rows)], "id int, k int, v long"
        )
        order = [F.col("k").asc(), F.col("v").desc(), F.col("id").asc()]
        got = rk.with_global_rank_cumsum(
            df, order, F.col("v"), rn_out="rn", cum_out="cum",
            total_out="tot", num_partitions=parts,
        )
        w = Window.orderBy(*order)
        naive = df.withColumn("rn", F.row_number().over(w)).withColumn(
            "cum",
            F.sum("v").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        g = {r.id: (r.rn, r.cum, r.tot) for r in got.collect()}
        total = sum(v for _, v in rows)
        for r in naive.collect():
            assert g[r.id] == (r.rn, r.cum, total), (r.id, g[r.id], (r.rn, r.cum))
        nt = rk.with_global_ntile(df, order, buckets, out="t", num_partitions=parts)
        naive_t = df.withColumn("t", F.ntile(buckets).over(w))
        gt = {r.id: r.t for r in nt.collect()}
        for r in naive_t.collect():
            assert gt[r.id] == r.t, (r.id, gt[r.id], r.t, buckets)

    check()
