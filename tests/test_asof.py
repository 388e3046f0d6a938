"""As-of join semantics: inclusive boundary, tie-break, null handling, and
the scale-critical plan shape (single hash shuffle, never a nested-loop
range join)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from knowledgebot_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01T00:10:00")),   # after two rights
            (2, 10, _ts("2024-01-01T00:05:00")),   # EXACTLY at a right ts
            (3, 10, _ts("2024-01-01T00:00:30")),   # between rights
            (4, 20, _ts("2024-01-01T00:01:00")),   # other key
            (5, 30, _ts("2024-01-01T00:01:00")),   # key with NO right rows
            (6, 10, _ts("2023-12-31T23:00:00")),   # before any right
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01T00:00:00"), 1.0),
            (10, _ts("2024-01-01T00:05:00"), 2.0),
            (20, _ts("2024-01-01T00:00:00"), 9.0),
        ],
        "user_id long, ts timestamp, value double",
    )
    return left, right


def test_asof_semantics(spark):
    left, right = _frames(spark)
    out = {
        r.event_id: (r.asof_ts, r.asof_value)
        for r in asof_join(left, right, on="user_id", ts_col="ts",
                           right_cols=("value",)).collect()
    }
    assert out[1] == (_ts("2024-01-01T00:05:00"), 2.0)   # latest prior
    assert out[2] == (_ts("2024-01-01T00:05:00"), 2.0)   # inclusive <=
    assert out[3] == (_ts("2024-01-01T00:00:00"), 1.0)   # between
    assert out[4] == (_ts("2024-01-01T00:00:00"), 9.0)   # per-key isolation
    assert out[5] == (None, None)                        # no right rows
    assert out[6] == (None, None)                        # before any right
    # inner drops the unmatched rows
    inner = asof_join(left, right, on="user_id", ts_col="ts",
                      right_cols=("value",), how="inner")
    assert {r.event_id for r in inner.collect()} == {1, 2, 3, 4}


def test_asof_tiebreak_greatest_wins(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01T00:10:00"))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01T00:00:00"), 1.0, 100),
            (10, _ts("2024-01-01T00:00:00"), 2.0, 200),  # same ts, greater id
        ],
        "user_id long, ts timestamp, value double, rid long",
    )
    out = asof_join(
        left, right, on="user_id", ts_col="ts", right_cols=("value",),
        tiebreak_col="rid",
    ).collect()[0]
    assert out.asof_value == 2.0


def test_asof_plan_single_shuffle_no_nested_loop(spark, sf_dir):
    from knowledgebot_spark.registry import load

    df = load()["rel_asof_join"].fn(spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # union + window formulation: there is no join operator at all
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_asof_forward_matches_bruteforce(spark):
    """direction='forward' must attach the EARLIEST right row at-or-after
    each left timestamp (inclusive), per key — checked against the
    quadratic brute-force on a small fixture with equal-ts edges."""
    from pyspark.sql import functions as F

    from knowledgebot_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10), (1, 15), (1, 30), (2, 5), (2, 50), (3, 7)],
        "k int, ts int",
    )
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 20, 101.0), (2, 4, 200.0), (2, 60, 201.0)],
        "k int, ts int, v double",
    )
    got = {
        (r.k, r.ts): (r.asof_ts, r.asof_v)
        for r in asof_join(
            left, right, on="k", ts_col="ts", right_cols=("v",),
            direction="forward",
        ).collect()
    }
    rr = [(r.k, r.ts, r.v) for r in right.collect()]
    for (k, ts), (ats, av) in got.items():
        cand = sorted((rt, rv) for rk, rt, rv in rr if rk == k and rt >= ts)
        want = cand[0] if cand else (None, None)
        assert (ats, av) == want, (k, ts, ats, av, want)
    # inclusive edge: left (1,10) must take right (1,10), not (1,20)
    assert got[(1, 10)] == (10, 100.0)
    # no future row -> nulls under how='left'
    assert got[(1, 30)] == (None, None)
