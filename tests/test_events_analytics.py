"""Semantic invariants for the behavioral-analytics family
(queries_events.py) that the oracle value-hash can't express: retention
conservation, Markov row-stochasticity, path-session accounting, and
time-weighted-average boundedness."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from knowledgebot_spark.registry import load
from knowledgebot_spark.tables import read_table


def _q(name):
    return load()[name].fn


def test_cohort_day_zero_counts_every_user(spark, sf_dir):
    """Every user is active on their own cohort day, so the sum of n_active
    at day_offset=0 equals the number of distinct users, and no offset's
    count exceeds its cohort's day-0 count."""
    rows = _q("rel_cohort_retention")(spark, sf_dir).collect()
    n_users = (
        read_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    day0 = {r.cohort_day: r.n_active for r in rows if r.day_offset == 0}
    assert sum(day0.values()) == n_users
    for r in rows:
        assert 0 <= r.day_offset <= 14
        assert r.n_active <= day0[r.cohort_day]


def test_markov_rows_are_stochastic(spark, sf_dir):
    """Outgoing probabilities per state sum to 1, and total transition count
    is n_events − n_users (each user's last event has no successor)."""
    rows = _q("rel_markov_transitions")(spark, sf_dir).collect()
    ev = read_table(spark, sf_dir, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert sum(r.n for r in rows) == n_events - n_users
    by_state: dict = {}
    for r in rows:
        by_state.setdefault(r.event_type, 0.0)
        by_state[r.event_type] += r.p
    for state, total in by_state.items():
        assert abs(total - 1.0) < 1e-4, (state, total)


def test_session_paths_shape_and_bounds(spark, sf_dir):
    """Paths are 1..3 '>'-joined event types; top-10 is ordered by count
    desc then path, and no path count exceeds the total session count."""
    rows = _q("rel_session_paths")(spark, sf_dir).collect()
    assert 0 < len(rows) <= 10
    pat = re.compile(r"^[a-z]+(>[a-z]+){0,2}$")
    assert all(pat.match(r.path) for r in rows)
    counts = [r.n_sessions for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_time_weighted_avg_bounded_by_extremes(spark, sf_dir):
    """A time-weighted average is a convex combination of the observed
    values, so it lies within each user's [min, max] value range."""
    out = {r.user_id: r for r in _q("rel_time_weighted_avg")(spark, sf_dir).collect()}
    ev = read_table(spark, sf_dir, "events")
    extremes = {
        r.user_id: (r.lo, r.hi)
        for r in ev.groupBy("user_id")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    }
    assert out
    for uid, r in out.items():
        lo, hi = extremes[uid]
        assert lo - 1e-6 <= r.twa_value <= hi + 1e-6
        assert r.observed_s > 0
        assert r.n_spans >= 1


def test_gap_fill_grid_is_dense_per_user(spark, sf_dir):
    """Grid output is exactly one row per user-hour between each user's
    first and last truncated hour (inclusive), values carry forward (never
    NULL thanks to the sentinel), and row count matches the closed-form
    span sum."""
    rows = _q("rel_gap_fill_locf")(spark, sf_dir).collect()
    ev = read_table(spark, sf_dir, "events")
    spans = {
        r.user_id: int(r.span)
        for r in ev.groupBy("user_id")
        .agg(
            (
                (
                    F.unix_micros(F.date_trunc("hour", F.max("ts")).cast("timestamp"))
                    - F.unix_micros(F.date_trunc("hour", F.min("ts")).cast("timestamp"))
                )
                / 3_600_000_000
                + 1
            ).alias("span")
        )
        .collect()
    }
    per_user: dict = {}
    for r in rows:
        per_user[r.user_id] = per_user.get(r.user_id, 0) + 1
        assert r.value is not None
    assert per_user == spans
    assert len(rows) == sum(spans.values())


def test_pagerank_is_deterministic_distribution(spark, sf_dir):
    """Top-20 ranks are strictly positive, sorted desc, bounded above the
    teleport floor (1-d)/N, and two independent builds agree exactly
    (shuffle order never leaks into the rounded ranks)."""
    from knowledgebot_spark.registry import load as _load

    fn = _load()["llm_pagerank_knn"].fn
    a = [(r.vec_id, r.rank) for r in fn(spark, sf_dir).collect()]
    b = [(r.vec_id, r.rank) for r in fn(spark, sf_dir).collect()]
    assert a == b
    n = read_table(spark, sf_dir, "embeddings").count()
    # 5e-9 slack: emitted ranks are round(r, 8), so a zero-in-degree node
    # sitting exactly on the teleport floor can round half a grain below it
    floor = (1.0 - 0.85) / n - 5e-9
    ranks = [r for _, r in a]
    assert ranks == sorted(ranks, reverse=True)
    assert all(r >= floor for r in ranks)
    assert len(a) == 20


def test_rolling_zscore_flags_match_recomputation(spark, sf_dir):
    """Every flagged row recomputes to |z| > 2.5 from its user's trailing
    window (independent pandas recomputation), and zero-sigma windows
    never flag (try_divide yields NULL, filtered)."""
    rows = _q("rel_rolling_zscore")(spark, sf_dir).collect()
    ev = (
        read_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "ts", "value")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    flagged = {r.event_id: r.z for r in rows}
    n_checked = 0
    for _, g in ev.groupby("user_id"):
        vals = list(g.value)
        ids = list(g.event_id)
        for i in range(len(vals)):
            prior = vals[max(0, i - 20) : i]
            if len(prior) < 10:
                assert ids[i] not in flagged
                continue
            import statistics

            mu = statistics.fmean(prior)
            sigma = statistics.stdev(prior)
            if sigma == 0:
                assert ids[i] not in flagged
                continue
            z = (vals[i] - mu) / sigma
            assert (abs(z) > 2.5) == (ids[i] in flagged), ids[i]
            if ids[i] in flagged:
                assert abs(flagged[ids[i]] - round(z, 4)) < 1e-9
                n_checked += 1
    assert n_checked == len(flagged) > 0


def test_period_over_period_math_and_order(spark, sf_dir):
    """pct_change recomputes from the revenue pair, no zero baselines
    survive the filter, and rows arrive largest-absolute-mover first."""
    rows = _q("rel_period_over_period")(spark, sf_dir).collect()
    assert 0 < len(rows) <= 15
    for r in rows:
        assert r.prev_revenue != 0
        expect = round((r.revenue - r.prev_revenue) / r.prev_revenue * 100, 2)
        assert abs(r.pct_change - expect) < 1e-9
    mags = [abs(r.pct_change) for r in rows]
    assert mags == sorted(mags, reverse=True)


def test_gap_fill_equal_timestamp_ties_resolve_by_event_id(spark, tmp_path):
    """Two observations at the SAME (user, ts): the carried value must be
    the higher event_id's (the ordering tie-break), not shuffle luck."""
    import datetime

    d = str(tmp_path / "ties")
    ts0 = datetime.datetime(2024, 5, 1, 10, 15, 0)
    rows = [
        (1, ts0, 7, "view", 100.0, "{}"),
        (2, ts0, 7, "view", 200.0, "{}"),
        (3, datetime.datetime(2024, 5, 1, 12, 40, 0), 7, "view", 300.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string",
    ).write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = {r.hour: r.value for r in _q("rel_gap_fill_locf")(spark, d).collect()}
    assert out == {
        "2024-05-01 10:00:00": -1.0,  # grid instant precedes both events
        "2024-05-01 11:00:00": 200.0,  # higher event_id wins the tie
        "2024-05-01 12:00:00": 200.0,
    }


def test_rolling_1h_range_matches_bruteforce(spark, sf_dir):
    """The temporal RANGE frame equals the brute-force definition (all of
    the user's events within the trailing hour, inclusive) on real data."""
    rows = _q("rel_rolling_1h_range")(spark, sf_dir).collect()
    ev = (
        read_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "ts", "value")
        .toPandas()
    )
    by_user: dict = {}
    for t in ev.itertuples():
        by_user.setdefault(t.user_id, []).append((t.ts, t.value, t.event_id))
    got = {r.event_id: (r.n_1h, r.sum_1h) for r in rows}
    import datetime

    hour = datetime.timedelta(hours=1)
    n_checked = 0
    for uid, evs in by_user.items():
        for ts, _, eid in evs:
            in_frame = [v for (t2, v, _) in evs if ts - hour <= t2 <= ts]
            assert got[eid][0] == len(in_frame)
            assert abs(got[eid][1] - round(sum(in_frame), 2)) < 1e-9
            n_checked += 1
    assert n_checked == len(got)


def _locf_reference(events, grid_hours):
    """Pure-python LOCF: last event value at or before the grid instant,
    ties broken by event_id; -1.0 sentinel before the first observation."""
    out = {}
    for h in grid_hours:
        best = None
        for (ts, value, eid) in events:
            if ts <= h and (best is None or (ts, eid) > (best[0], best[1])):
                best = (ts, eid, value)
        out[h] = round(best[2], 2) if best else -1.0
    return out


def test_gap_fill_matches_reference_on_random_inputs(spark, tmp_path):
    """Hypothesis: gap-fill equals the brute-force LOCF reference on random
    event sets, including duplicate timestamps and multi-user mixes."""
    import datetime

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    base = datetime.datetime(2024, 6, 1, 0, 0, 0)

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        data=st.lists(
            st.tuples(
                st.integers(1, 3),  # user
                st.integers(0, 60 * 10),  # minutes offset (10h span)
                st.integers(-50, 50),  # value*10
            ),
            min_size=1,
            max_size=25,
        )
    )
    def check(data):
        rows = [
            (
                i,
                base + datetime.timedelta(minutes=m),
                u,
                "view",
                v / 10.0,
                "{}",
            )
            for i, (u, m, v) in enumerate(data)
        ]
        d = str(tmp_path / f"gf_{abs(hash(tuple(data))) % 10**8}")
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string",
        ).write.mode("overwrite").parquet(f"{d}/events.parquet")
        got = {
            (r.user_id, r.hour): r.value
            for r in _q("rel_gap_fill_locf")(spark, d).collect()
        }
        by_user: dict = {}
        for i, (u, m, v) in enumerate(data):
            by_user.setdefault(u, []).append(
                (base + datetime.timedelta(minutes=m), v / 10.0, i)
            )
        expect = {}
        for u, evs in by_user.items():
            h0 = min(t for t, _, _ in evs).replace(minute=0, second=0, microsecond=0)
            h1 = max(t for t, _, _ in evs).replace(minute=0, second=0, microsecond=0)
            hours = []
            h = h0
            while h <= h1:
                hours.append(h)
                h += datetime.timedelta(hours=1)
            ref = _locf_reference(evs, hours)
            for h, v in ref.items():
                expect[(u, h.strftime("%Y-%m-%d %H:00:00"))] = v
        assert got == expect

    check()


def test_running_distinct_conservation(spark, sf_dir):
    """new_users sums to the distinct user count; the cumulative column is
    the prefix sum and ends at the total."""
    rows = sorted(
        _q("rel_running_distinct")(spark, sf_dir).collect(), key=lambda r: r.day
    )
    total = read_table(spark, sf_dir, "events").select("user_id").distinct().count()
    assert sum(r.new_users for r in rows) == total
    run = 0
    for r in rows:
        run += r.new_users
        assert r.cumulative_users == run
    assert rows[-1].cumulative_users == total


def test_ngram_novelty_first_doc_is_fully_novel(spark, sf_dir):
    """The lowest doc_id with >=3 tokens has novelty 1.0 (nothing precedes
    it), every ratio recomputes from its counts, and novelty is weakly
    anchored: n_novel <= n_grams."""
    from knowledgebot_spark.registry import load as _load

    rows = {r.doc_id: r for r in _load()["llm_ngram_novelty"].fn(spark, sf_dir).collect()}
    first = min(rows)
    assert rows[first].novelty == 1.0
    from decimal import ROUND_HALF_UP, Decimal

    for r in rows.values():
        assert 0 < r.n_novel <= r.n_grams or r.n_novel == 0
        # Spark round() is HALF_UP; Python round() is half-even
        expect = float(
            Decimal(str(r.n_novel / r.n_grams)).quantize(
                Decimal("0.0001"), ROUND_HALF_UP
            )
        )
        assert abs(r.novelty - expect) < 1e-9
