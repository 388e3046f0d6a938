"""Behavioral / time-series analytics over the ``events`` table.

The reference's data model is an event log (Slack messages ordered by a
timestamp cursor, KnowledgeBot.py:137-176 incremental scan); this module is
the warehouse-analytics surface a production deployment runs ON such a log:
cohort retention, sequence (Markov) transition matrices, sessionized path
mining, and time-weighted gauges.  All pure Spark built-ins.

Scale posture (100 TB event log), applied throughout:
  * every shuffle is keyed by ``user_id`` (bounded per-key state: one first
    event, one lag row, one running session counter) — no whole-log sort,
    no self-join on time ranges;
  * per-user windows carry O(1) frame state (lag/lead/row_number), never
    collect_list over history;
  * outputs aggregate to bounded cardinality (cohorts x offsets, type x
    type transitions, top-k paths) before any driver-visible stage;
  * time math runs on epoch micros (``unix_micros``) — integer arithmetic
    inside whole-stage codegen, identical truncation semantics on the
    DuckDB oracle (``epoch_us``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from knowledgebot_spark.registry import register
from knowledgebot_spark.tables import read_table as _t


def _micros(col) -> F.Column:
    # events.ts is TIMESTAMP_NTZ on pyspark 4.1; unix_micros wants TIMESTAMP.
    # Session TZ is pinned UTC (registry._REQUIRED_CONFS) so the cast is a
    # pure reinterpretation — verified equal to DuckDB epoch_us on testdata.
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


# --- cohort retention ---------------------------------------------------------

@register(
    "rel_cohort_retention",
    sql="""
WITH cohort AS (
  SELECT user_id, CAST(date_trunc('day', min(ts)) AS DATE) AS cohort_day
  FROM events GROUP BY user_id
)
SELECT strftime(c.cohort_day, '%Y-%m-%d') AS cohort_day,
  CAST(date_diff('day', c.cohort_day, CAST(date_trunc('day', e.ts) AS DATE)) AS INTEGER)
    AS day_offset,
  CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active
FROM events e JOIN cohort c ON e.user_id = c.user_id
WHERE date_diff('day', c.cohort_day, CAST(date_trunc('day', e.ts) AS DATE)) <= 14
GROUP BY 1, 2
""",
    tags=("events", "cohort", "retention"),
)
def rel_cohort_retention(spark: SparkSession, sf: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-seen day, activity
    counted per day-offset (0..14).  The canonical growth-analytics query.

    Shape: one user-keyed hash agg to build the cohort dim, one user-keyed
    shuffle join back to the log, one hash agg to (cohort_day, offset) —
    output cardinality is |days| x 15 regardless of log size.  The cohort
    side is |users| rows (tiny next to the log) so at scale it broadcasts
    or AQE picks a shuffled hash join keyed the same as the agg that
    produced it; never a window over the whole history.
    """
    ev = _t(spark, sf, "events")
    cohort = ev.groupBy("user_id").agg(
        F.to_date(F.date_trunc("day", F.min("ts"))).alias("cohort_day")
    )
    joined = ev.join(cohort, "user_id").select(
        "user_id",
        "cohort_day",
        F.datediff(F.to_date(F.date_trunc("day", "ts")), F.col("cohort_day"))
        .cast("int")
        .alias("day_offset"),
    )
    return (
        joined.filter(F.col("day_offset") <= 14)
        .groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            "day_offset",
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


# --- Markov transition matrix -------------------------------------------------

@register(
    "rel_markov_transitions",
    sql="""
WITH seq AS (
  SELECT event_type,
    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      AS next_type
  FROM events
), pairs AS (
  SELECT event_type, next_type, count(*) AS n
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY event_type, next_type
)
SELECT event_type, next_type, n,
  round(n * 1.0 / sum(n) OVER (PARTITION BY event_type), 6) AS p
FROM pairs
""",
    tags=("events", "sequence", "markov"),
)
def rel_markov_transitions(spark: SparkSession, sf: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences:
    P(next_type | event_type).  The behavioral-model building block
    (next-action prediction, anomaly scoring on improbable transitions).

    Shape: one lead() window keyed by user_id (O(1) frame state), one hash
    agg to the |types|^2 pair matrix, then the normalizing window runs on
    that already-tiny matrix — the expensive part of the query never sees
    more than one shuffle of the log, and the per-user ORDER BY sorts only
    within each user's partition-local run, not globally.
    """
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    )
    pairs = (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count("*").alias("n"))
    )
    norm = Window.partitionBy("event_type")
    return pairs.select(
        "event_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(norm), 6).alias("p"),
    )


# --- sessionized path mining --------------------------------------------------

@register(
    "rel_session_paths",
    sql="""
WITH marked AS (
  SELECT user_id, ts, event_id, event_type,
    CASE WHEN lag(ts) OVER w IS NULL
           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
         THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT *, sum(new_s) OVER (
    PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING
  ) AS sid
  FROM marked
), ranked AS (
  SELECT user_id, sid, event_type,
    row_number() OVER (PARTITION BY user_id, sid ORDER BY ts, event_id) AS rn
  FROM sess
), paths AS (
  SELECT user_id, sid,
    string_agg(event_type, '>' ORDER BY rn) AS path
  FROM ranked WHERE rn <= 3 GROUP BY user_id, sid
)
SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
FROM paths GROUP BY path
ORDER BY n_sessions DESC, path LIMIT 10
""",
    tags=("events", "session", "path-mining", "top-k"),
)
def rel_session_paths(spark: SparkSession, sf: str) -> DataFrame:
    """Top-10 session-opening paths: sessionize on a 30-minute inactivity
    gap (gaps-and-islands over epoch-micro deltas), take each session's
    first three event types as an ordered path, count path frequencies.
    Clickstream path mining — the "what do users do first" query.

    Shape: all three windows share ONE partitioning (user_id) so Catalyst
    plans a single sort+shuffle for the whole window stack; the rn <= 3
    filter bounds per-session state to 3 rows before the ordered listagg;
    the path space is small by construction (|types|^3 max) and the final
    top-10 is TakeOrderedAndProject, never a global sort.
    """
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 1_800_000_000  # 30 minutes in micros
    marked = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            F.lag("ts").over(w).isNull()
            | (_micros("ts") - _micros(F.lag("ts").over(w)) > gap_us),
            1,
        )
        .otherwise(0)
        .alias("new_s"),
    )
    sess = marked.withColumn(
        "sid", F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    ws = Window.partitionBy("user_id", "sid").orderBy("ts", "event_id")
    ranked = sess.withColumn("rn", F.row_number().over(ws))
    paths = (
        ranked.filter(F.col("rn") <= 3)
        .groupBy("user_id", "sid")
        .agg(
            F.expr("listagg(event_type, '>') WITHIN GROUP (ORDER BY rn)").alias(
                "path"
            )
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(10)
    )


# --- time-weighted average ----------------------------------------------------

@register(
    "rel_time_weighted_avg",
    sql="""
WITH spans AS (
  SELECT user_id, value,
    epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
      - epoch_us(ts) AS dur_us
  FROM events
)
SELECT user_id,
  round(sum(value * dur_us) / sum(dur_us), 4) AS twa_value,
  round(sum(dur_us) / 1000000.0, 1) AS observed_s,
  CAST(count(*) AS BIGINT) AS n_spans
FROM spans WHERE dur_us IS NOT NULL
GROUP BY user_id
""",
    tags=("events", "time-series", "gauge"),
)
def rel_time_weighted_avg(spark: SparkSession, sf: str) -> DataFrame:
    """Time-weighted average of a gauge: each reading holds until the next
    one, so its weight is the micros until the user's next event
    (last-observation-carried-forward).  The correct way to average
    irregularly-sampled metrics — a plain avg() over-weights bursts.

    Shape: one lead() window keyed by user_id, one user-keyed hash agg;
    weights are integer micro deltas (codegen'd, no timestamp objects in
    the agg loop).  This is the hypertable time_weight() shape expressed
    as window + agg — no interpolation join, no per-user collect.
    """
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    spans = ev.select(
        "user_id",
        "value",
        (_micros(F.lead("ts").over(w)) - _micros("ts")).alias("dur_us"),
    )
    return (
        spans.filter(F.col("dur_us").isNotNull())
        .groupBy("user_id")
        .agg(
            # try_divide: a user whose spans are all zero-duration (events
            # sharing one timestamp) has sum(dur_us)=0 — ANSI mode would
            # abort the whole job on the plain divide; NULL matches the
            # oracle's 0.0/0.0 result.
            F.round(
                F.try_divide(F.sum(F.col("value") * F.col("dur_us")), F.sum("dur_us")), 4
            ).alias("twa_value"),
            F.round(F.sum("dur_us") / F.lit(1_000_000.0), 1).alias("observed_s"),
            F.count("*").alias("n_spans"),
        )
    )


# --- gap-fill / resample with LOCF --------------------------------------------

@register(
    "rel_gap_fill_locf",
    sql="""
WITH bounds AS (
  SELECT user_id, date_trunc('hour', min(ts)) AS h0, date_trunc('hour', max(ts)) AS h1
  FROM events GROUP BY user_id
), grid AS (
  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS ts
  FROM bounds
), u AS (
  SELECT user_id, ts, value, 0 AS is_grid, event_id FROM events
  UNION ALL
  SELECT user_id, ts, NULL AS value, 1 AS is_grid, -1 AS event_id FROM grid
), filled AS (
  SELECT user_id, ts, is_grid,
    last_value(value IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY ts, is_grid, event_id ROWS UNBOUNDED PRECEDING
    ) AS locf
  FROM u
)
SELECT user_id, strftime(ts, '%Y-%m-%d %H:00:00') AS hour,
  round(coalesce(locf, -1.0), 2) AS value
FROM filled WHERE is_grid = 1
""",
    tags=("events", "time-series", "gap-fill", "resample"),
)
def rel_gap_fill_locf(spark: SparkSession, sf: str) -> DataFrame:
    """Resample each user's irregular event stream onto a regular hourly
    grid, carrying the last observed value forward (LOCF) — the
    hypertable ``time_bucket_gapfill + locf`` shape.  Grid hours before a
    user's first observation emit the sentinel -1.0 (documented; NULL
    would also round-trip).

    Shape: the grid is GENERATED per user from their own [first, last]
    hour bounds (sequence + explode — no calendar dim join, no global
    grid), then a single union + one user-keyed window computes the fill
    via last(value, ignorenulls) with events ordered before grid points
    at equal timestamps.  Everything shuffles once on user_id; window
    frame state is one scalar.  Output cardinality is sum of per-user
    active spans in hours — proportional to entity-hours, not to raw
    event volume, which is what makes gap-fill viable on a 100 TB log."""
    ev = _t(spark, sf, "events")
    bounds = ev.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    grid = bounds.select(
        "user_id",
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("ts"),
    ).select(
        "user_id",
        "ts",
        F.lit(None).cast("double").alias("value"),
        F.lit(1).alias("is_grid"),
        F.lit(-1).cast("long").alias("event_id"),
    )
    obs = ev.select("user_id", "ts", "value", F.lit(0).alias("is_grid"), "event_id")
    u = obs.unionByName(grid)
    # event_id tie-break: multiple observations at one (user, ts) would
    # otherwise make the carried value depend on shuffle order (grid rows
    # are unique per (user, hour); their -1 sentinel never collides).
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_grid", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.withColumn("locf", F.last("value", ignorenulls=True).over(w))
    return filled.filter(F.col("is_grid") == 1).select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:00:00").alias("hour"),
        F.round(F.coalesce("locf", F.lit(-1.0)), 2).alias("value"),
    )


# --- rolling z-score anomaly flags --------------------------------------------

@register(
    "rel_rolling_zscore",
    sql="""
WITH stats AS (
  SELECT event_id, user_id, ts, value,
    avg(value) OVER w AS mu,
    stddev_samp(value) OVER w AS sigma,
    count(*) OVER w AS n_prior
  FROM events
  WINDOW w AS (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING
  )
)
SELECT event_id, user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
  round((value - mu) / sigma, 4) AS z
FROM stats
WHERE n_prior >= 10 AND sigma > 0 AND abs((value - mu) / sigma) > 2.5
""",
    tags=("events", "anomaly", "window-frame"),
)
def rel_rolling_zscore(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming-style anomaly detection in batch: each event's value is
    scored against the trailing 20-observation window of ITS OWN user
    (ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING — the current row is
    excluded so the anomaly can't dilute its own baseline), flagging
    |z| > 2.5 once at least 10 priors exist.

    Shape: one user-keyed window shuffle; the bounded ROWS frame keeps
    per-row state at 21 values regardless of history length (a RANGE or
    UNBOUNDED frame would not).  This is the monitoring query a pipeline
    runs over its own telemetry — and the batch twin of what
    transformWithState implements incrementally on the stream."""
    ev = _t(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    stats = ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.avg("value").over(w).alias("mu"),
        F.stddev_samp("value").over(w).alias("sigma"),
        F.count("*").over(w).alias("n_prior"),
    )
    # try_divide: the sigma > 0 conjunct below is only safe while Spark
    # evaluates And left-to-right; NULL-on-zero removes the ANSI
    # DIVIDE_BY_ZERO landmine if Catalyst ever reorders the conjuncts.
    z = F.try_divide(F.col("value") - F.col("mu"), F.col("sigma"))
    return (
        stats.filter(
            (F.col("n_prior") >= 10) & (F.col("sigma") > 0) & (F.abs(z) > 2.5)
        )
        .select(
            "event_id",
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
            F.round(z, 4).alias("z"),
        )
    )


# --- period-over-period movers ------------------------------------------------

@register(
    "rel_period_over_period",
    sql="""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
    round(sum(value), 2) AS revenue
  FROM events GROUP BY 1, 2
), chained AS (
  SELECT event_type, d, revenue,
    lag(revenue) OVER (PARTITION BY event_type ORDER BY d) AS prev_revenue
  FROM daily
)
SELECT event_type, strftime(d, '%Y-%m-%d') AS day, revenue, prev_revenue,
  round((revenue - prev_revenue) / prev_revenue * 100, 2) AS pct_change
FROM chained
WHERE prev_revenue IS NOT NULL AND prev_revenue <> 0
ORDER BY abs(round((revenue - prev_revenue) / prev_revenue * 100, 2)) DESC,
  event_type, day
LIMIT 15
""",
    tags=("events", "period-over-period", "top-k"),
)
def rel_period_over_period(spark: SparkSession, sf: str) -> DataFrame:
    """Period-over-period movement report: daily value totals per event
    type, day-over-day percent change via lag(), top-15 largest absolute
    movers.  The dashboard query behind every "what spiked yesterday"
    alert.

    Shape: the fact table collapses to |types| x |days| rows in ONE hash
    agg before any window runs — the lag() and the final TakeOrdered see
    only the tiny aggregate, so the query's cost is the scan + one
    partial+final agg no matter how large the log grows."""
    ev = _t(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.to_date(F.date_trunc("day", "ts")).alias("d")
    ).agg(F.round(F.sum("value"), 2).alias("revenue"))
    w = Window.partitionBy("event_type").orderBy("d")
    chained = daily.withColumn("prev_revenue", F.lag("revenue").over(w))
    # A zero-revenue baseline day is legal input (refunds netting out);
    # excluded on BOTH sides — a percent change against 0 is undefined —
    # and try_divide keeps even a reordered plan abort-free under ANSI.
    pct = F.round(
        F.try_divide(F.col("revenue") - F.col("prev_revenue"), F.col("prev_revenue"))
        * 100,
        2,
    )
    return (
        chained.filter(
            F.col("prev_revenue").isNotNull() & (F.col("prev_revenue") != 0)
        )
        .select(
            "event_type",
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "revenue",
            "prev_revenue",
            pct.alias("pct_change"),
        )
        .orderBy(F.abs(F.col("pct_change")).desc(), "event_type", "day")
        .limit(15)
    )


# --- temporal RANGE frame (rolling interval window) ---------------------------

@register(
    "rel_rolling_1h_range",
    sql="""
SELECT event_id, user_id,
  CAST(count(*) OVER w AS BIGINT) AS n_1h,
  round(sum(value) OVER w, 2) AS sum_1h
FROM events
WINDOW w AS (
  PARTITION BY user_id ORDER BY ts
  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
)
""",
    tags=("events", "window-frame", "range-interval", "rolling"),
)
def rel_rolling_1h_range(spark: SparkSession, sf: str) -> DataFrame:
    """Rolling trailing-hour aggregates via a TEMPORAL RANGE frame —
    ``RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW`` — the
    frame type ROWS cannot express (the window is defined by TIME
    distance, so burst hours hold many rows and quiet hours few).  The
    rolling-rate / velocity-check primitive (fraud counters, rate
    limiting, trailing-hour load).

    Shape: one user-keyed window; Spark maintains the range frame with a
    sliding two-pointer over the partition-local sort, so state is the
    in-frame aggregate, not the history.  RANGE frames require a single
    ORDER BY key — the deliberate contrast with every ROWS frame in this
    module (which tie-break on event_id; here same-instant rows share a
    frame, which is exactly the semantics a time-distance window wants).
    """
    ev = _t(spark, sf, "events")
    # Python rangeBetween takes numeric boundaries, so the ORDER BY key is
    # epoch MICROS (exact, no truncation) and the frame is 3.6e9 micros —
    # value-identical to DuckDB's RANGE INTERVAL 1 HOUR over the timestamp.
    w = (
        Window.partitionBy("user_id")
        .orderBy(_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("n_1h"),
        F.round(F.sum("value").over(w), 2).alias("sum_1h"),
    )


# --- cumulative distinct users ------------------------------------------------

@register(
    "rel_running_distinct",
    sql="""
WITH first_seen AS (
  SELECT user_id, CAST(date_trunc('day', min(ts)) AS DATE) AS d
  FROM events GROUP BY user_id
), per_day AS (
  SELECT d, count(*) AS new_users FROM first_seen GROUP BY d
)
SELECT strftime(d, '%Y-%m-%d') AS day, CAST(new_users AS BIGINT) AS new_users,
  CAST(sum(new_users) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS BIGINT)
    AS cumulative_users
FROM per_day
""",
    tags=("events", "running-distinct", "growth"),
)
def rel_running_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """Cumulative distinct users by day — the growth-curve query.  The
    naive formulation (count(DISTINCT user) OVER (ORDER BY day)) needs
    per-frame distinct state and most engines refuse it; the scalable
    identity is first-seen-day per user (one user-keyed agg) -> new users
    per day (one tiny agg) -> running sum over |days| rows.  The only
    unbounded-window sort runs over the per-day table, which is bounded
    by the calendar, not the log."""
    ev = _t(spark, sf, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.to_date(F.date_trunc("day", F.min("ts"))).alias("d")
    )
    per_day = first_seen.groupBy("d").agg(F.count("*").alias("new_users"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return per_day.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "new_users",
        F.sum("new_users").over(w).alias("cumulative_users"),
    )


# --- robust outliers: median absolute deviation (wave 4) ----------------------

@register(
    "rel_mad_outliers",
    sql="""
WITH med AS (
  SELECT event_type, median(value) AS med FROM events GROUP BY event_type
), dev AS (
  SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS adev
  FROM events e JOIN med m USING (event_type)
), mad AS (
  SELECT event_type, median(adev) AS mad FROM dev GROUP BY event_type
)
SELECT d.event_type, CAST(count(*) AS BIGINT) AS n,
  round(min(d.med), 6) AS med, round(min(m.mad), 6) AS mad,
  CAST(sum(CASE WHEN d.adev > 3 * m.mad THEN 1 ELSE 0 END) AS BIGINT)
    AS n_outliers,
  round(sum(CASE WHEN d.adev > 3 * m.mad THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
    AS outlier_pct
FROM dev d JOIN mad m USING (event_type)
GROUP BY d.event_type
""",
    tags=("events", "robust-stats", "outliers"),
)
def rel_mad_outliers(spark: SparkSession, sf: str) -> DataFrame:
    """Robust outlier detection via median absolute deviation: per event
    type, flag |value - median| > 3 * MAD.  Unlike rel_rolling_zscore's
    mean/stddev, the median/MAD pair has a 50% breakdown point — the
    estimator itself cannot be dragged by the outliers it is hunting,
    which is why data-quality gates prefer it on heavy-tailed telemetry.

    Shape: two exact-median aggregations keyed by event_type with the
    tiny |types|-row results broadcast back — the log shuffles on its
    natural key twice and is never globally sorted.  Exact median is the
    oracle-parity choice (Spark and DuckDB both interpolate even-count
    middles identically); at 100 TB swap in approx_percentile(0.5) and a
    tolerance gate, the rel_approx_percentile pattern, for one-pass
    sketched medians.
    """
    ev = _t(spark, sf, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(F.median("value").alias("med"))
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(F.median("adev").alias("mad"))
    flagged = dev.join(F.broadcast(mad), "event_type")
    is_out = (F.col("adev") > 3 * F.col("mad")).cast("long")
    return flagged.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.min("med"), 6).alias("med"),
        F.round(F.min("mad"), 6).alias("mad"),
        F.sum(is_out).alias("n_outliers"),
        F.round(F.sum(is_out) / F.count("*"), 6).alias("outlier_pct"),
    )


# --- last-touch attribution (wave 4) ------------------------------------------

@register(
    "rel_last_touch_attribution",
    sql="""
WITH seq AS (
  SELECT user_id, event_type, epoch_us(ts) AS tus,
    max(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click
  FROM events
)
SELECT CASE
    WHEN last_click IS NULL THEN '0_none'
    WHEN tus - last_click < 60000000 THEN '1_lt1m'
    WHEN tus - last_click < 300000000 THEN '2_1to5m'
    WHEN tus - last_click < 1800000000 THEN '3_5to30m'
    WHEN tus - last_click < 7200000000 THEN '4_30mto2h'
    ELSE '5_ge2h' END AS delay_bucket,
  CAST(count(*) AS BIGINT) AS n_purchases,
  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM seq WHERE event_type = 'purchase'
GROUP BY 1
""",
    tags=("events", "attribution", "funnel"),
)
def rel_last_touch_attribution(spark: SparkSession, sf: str) -> DataFrame:
    """Last-touch attribution: each purchase credits the user's most
    recent STRICTLY PRIOR click, and purchases histogram into
    click-to-convert delay buckets (plus '0_none' for unattributed).
    The marketing-analytics sibling of rel_funnel_conversion — same log,
    but per-conversion credit assignment instead of stage reach.

    Shape: one user-keyed window whose conditional running max carries
    O(1) frame state (rows unbounded-preceding to 1-preceding keeps the
    self-row out, so a click and purchase sharing a timestamp cannot
    self-attribute); delay math is integer epoch-micros inside codegen;
    the final agg lands on a 6-row histogram.  No joins at all — the
    attribution "lookup" rides the same shuffle as the sessionizers.
    """
    ev = _t(spark, sf, "events").select(
        "user_id", "event_id", "event_type", _micros("ts").alias("tus")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("tus", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seq = ev.withColumn(
        "last_click",
        F.max(F.when(F.col("event_type") == "click", F.col("tus"))).over(w),
    )
    delay = F.col("tus") - F.col("last_click")
    bucket = (
        F.when(F.col("last_click").isNull(), "0_none")
        .when(delay < 60_000_000, "1_lt1m")
        .when(delay < 300_000_000, "2_1to5m")
        .when(delay < 1_800_000_000, "3_5to30m")
        .when(delay < 7_200_000_000, "4_30mto2h")
        .otherwise("5_ge2h")
    )
    return (
        seq.filter(F.col("event_type") == "purchase")
        .groupBy(bucket.alias("delay_bucket"))
        .agg(
            F.count("*").alias("n_purchases"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


# --- CUPED variance-reduced experiment readout (wave 5) -----------------------

_CUPED_CUTOFF = "2024-01-16"  # events span 2024-01-01 .. 2024-01-30


@register(
    "rel_cuped_experiment",
    sql=f"""
WITH per_user AS (
  SELECT user_id,
    CAST(user_id % 2 AS INTEGER) AS variant,
    sum(CASE WHEN CAST(ts AS DATE) < DATE '{_CUPED_CUTOFF}' THEN value
             ELSE 0.0 END) AS x,
    sum(CASE WHEN CAST(ts AS DATE) >= DATE '{_CUPED_CUTOFF}' THEN value
             ELSE 0.0 END) AS y
  FROM events GROUP BY user_id
), stats AS (
  SELECT covar_pop(x, y) / var_pop(x) AS theta, avg(x) AS mx FROM per_user
), adj AS (
  SELECT variant, y, y - theta * (x - mx) AS y_adj
  FROM per_user CROSS JOIN stats
)
SELECT variant, CAST(count(*) AS BIGINT) AS n_users,
  round(avg(y), 6) AS mean_y,
  round(avg(y_adj), 6) AS mean_y_adj,
  round(1 - var_pop(y_adj) / var_pop(y), 6) AS var_reduction
FROM adj GROUP BY variant
""",
    tags=("events", "experimentation", "cuped"),
)
def rel_cuped_experiment(spark: SparkSession, sf: str) -> DataFrame:
    """CUPED variance-reduced experiment readout: per-variant post-period
    means adjusted by each user's PRE-period activity (y' = y - theta *
    (x - E[x]), theta = cov(x,y)/var(x)) — the standard trick that lets
    an A/B platform reach significance on a fraction of the traffic.
    Variant assignment is user_id parity (a stand-in for the hash-bucket
    assignment llm_train_val_split models), pre/post split at a fixed
    calendar cutoff.

    Shape: the log collapses to one row per user in a single user-keyed
    hash agg (both period sums as conditional aggregates in one pass —
    never two scans); theta and E[x] are a 1-row broadcast scalar
    (covar_pop/var_pop over |users| rows); the adjusted readout is a
    |variants|-row agg.  At 100 TB nothing beyond the per-user collapse
    ever shuffles.  Cross-engine float drift in the co-moment
    aggregations is absorbed by 6dp rounding on ratio outputs only (the
    rel_stats_agg precedent).
    """
    ev = _t(spark, sf, "events")
    d = F.expr("CAST(ts AS DATE)")
    per_user = ev.groupBy("user_id").agg(
        F.sum(
            F.when(d < F.lit(_CUPED_CUTOFF).cast("date"), F.col("value")).otherwise(
                0.0
            )
        ).alias("x"),
        F.sum(
            F.when(d >= F.lit(_CUPED_CUTOFF).cast("date"), F.col("value")).otherwise(
                0.0
            )
        ).alias("y"),
    ).withColumn("variant", (F.col("user_id") % 2).cast("int"))
    stats = per_user.agg(
        (F.covar_pop("x", "y") / F.var_pop("x")).alias("theta"),
        F.avg("x").alias("mx"),
    )
    adj = per_user.crossJoin(F.broadcast(stats)).select(
        "variant",
        "y",
        (F.col("y") - F.col("theta") * (F.col("x") - F.col("mx"))).alias("y_adj"),
    )
    return adj.groupBy("variant").agg(
        F.count("*").alias("n_users"),
        F.round(F.avg("y"), 6).alias("mean_y"),
        F.round(F.avg("y_adj"), 6).alias("mean_y_adj"),
        F.round(1 - F.var_pop("y_adj") / F.var_pop("y"), 6).alias("var_reduction"),
    )


# --- additive seasonal decomposition (wave 6) ---------------------------------

@register(
    "rel_seasonal_decompose",
    sql="""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1
), t AS (
  SELECT h, y,
    CAST(floor(avg(y) OVER (ORDER BY h
      ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING) * 10000 + 0.5)
      AS BIGINT) AS trend_e4
  FROM hourly
), s AS (
  SELECT h, y, trend_e4,
    CAST(floor(avg(y * 10000 - trend_e4)
      OVER (PARTITION BY extract(hour FROM h)) + 0.5) AS BIGINT)
      AS seasonal_e4
  FROM t
)
SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS hour_ts, y,
  round(trend_e4 / 10000.0, 4) AS trend,
  round(seasonal_e4 / 10000.0, 4) AS seasonal,
  round((y * 10000 - trend_e4 - seasonal_e4) / 10000.0, 4) AS resid
FROM s
""",
    tags=("events", "timeseries", "seasonal"),
)
def rel_seasonal_decompose(spark: SparkSession, sf: str) -> DataFrame:
    """Classical additive decomposition of the hourly event-count series:
    trend (centered 25-hour moving average), hour-of-day seasonal (mean
    of the detrended series per hour slot), residual (what anomaly
    detectors should actually monitor — rel_rolling_zscore on raw counts
    alarms every rush hour; on this residual it alarms only genuine
    deviations).

    Shape: the log collapses to one row per hour FIRST (hash agg keyed by
    the hour bucket, map-side combinable), so the two windows and the
    seasonal mean all run over a |hours|-sized series — bounded by the
    TIME SPAN, not event volume; a year is 8,760 rows no matter how many
    trillions of events produced them.  The centered frame is exact at
    the series edges in both engines (ROWS frames truncate identically).

    Determinism: trend and seasonal re-quantize to e4 fixed-point right
    at their window (avg over exact integers is a correctly-rounded
    double in both engines, floor(x*1e4+.5) pins it), so the residual is
    pure BIGINT arithmetic — the float formulation flipped a 4dp
    rounding boundary when the seasonal mean summed doubles in different
    orders.
    """
    ev = _t(spark, sf, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count("*").alias("y")
    )
    wt = Window.orderBy("h").rowsBetween(-12, 12)
    t = hourly.select(
        "h",
        "y",
        F.floor(F.avg("y").over(wt) * 10000 + F.lit(0.5))
        .cast("long")
        .alias("trend_e4"),
    )
    ws = Window.partitionBy(F.hour("h"))
    s = t.select(
        "h",
        "y",
        "trend_e4",
        F.floor(
            F.avg(F.col("y") * 10000 - F.col("trend_e4")).over(ws) + F.lit(0.5)
        )
        .cast("long")
        .alias("seasonal_e4"),
    )
    return s.select(
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour_ts"),
        "y",
        F.round(F.col("trend_e4") / 10000.0, 4).alias("trend"),
        F.round(F.col("seasonal_e4") / 10000.0, 4).alias("seasonal"),
        F.round(
            (F.col("y") * 10000 - F.col("trend_e4") - F.col("seasonal_e4"))
            / 10000.0,
            4,
        ).alias("resid"),
    )


# --- session pattern detection (CEP-lite) (wave 7) ----------------------------

_PATTERNS = (
    ("funnel_vcp", "v.*c.*p"),  # view -> click -> purchase, in order
    ("bounce_single", "^.$"),  # one-event session
    ("error_repeat", "e.*e"),  # two or more errors in one session
)


@register(
    "rel_pattern_detect",
    sql=f"""
WITH seq AS (
  SELECT user_id, event_id, epoch_us(ts) AS tus,
    substr(event_type, 1, 1) AS initial,
    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
        (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
      THEN 1 ELSE 0 END AS new_sess
  FROM events
), sess AS (
  SELECT user_id,
    sum(new_sess) OVER (PARTITION BY user_id ORDER BY tus, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid,
    tus, event_id, initial
  FROM seq
), paths AS (
  SELECT user_id, sid,
    string_agg(initial, '' ORDER BY tus, event_id) AS path
  FROM sess GROUP BY user_id, sid
), hits AS (
  SELECT count(*) AS total,
    {", ".join(f"sum(CASE WHEN regexp_matches(path, '{rx}') THEN 1 ELSE 0 END) AS h{i}" for i, (_, rx) in enumerate(_PATTERNS))}
  FROM paths
)
{" UNION ALL ".join(f"SELECT '{name}' AS pattern, CAST(h{i} AS BIGINT) AS n_sessions, CAST(total AS BIGINT) AS total_sessions, round(h{i} * 1.0 / total, 6) AS share FROM hits" for i, (name, _) in enumerate(_PATTERNS))}
""",
    tags=("events", "sessions", "pattern", "cep"),
)
def rel_pattern_detect(spark: SparkSession, sf: str) -> DataFrame:
    """Sequential pattern detection over sessionized event paths —
    MATCH_RECOGNIZE-lite: each 30-minute-gap session becomes an ordered
    initial string ('vvcp...') and regexes classify it (ordered funnel
    view->click->purchase, single-event bounce, repeated errors).  The
    CEP workload (fraud sequences, UX funnels) expressed with listagg +
    rlike instead of a dedicated pattern engine.

    Shape: the same user-keyed window stack as rel_session_paths builds
    session ids with O(1) frame state; per-session strings are bounded by
    session length (minutes of activity, not corpus size); the regex
    classification is one conditional aggregate over |sessions| rows
    folding to a 3-row report.  Patterns are anchored on single-char
    initials so Spark's rlike (Java regex) and DuckDB's regexp_matches
    (RE2) agree — no lookaround, no class shorthand divergence.
    """
    ev = _t(spark, sf, "events").select(
        "user_id",
        "event_id",
        _micros("ts").alias("tus"),
        F.substring("event_type", 1, 1).alias("initial"),
    )
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    seq = ev.withColumn(
        "new_sess",
        F.when(
            F.col("tus") - F.lag("tus").over(w) > 1_800_000_000, 1
        ).otherwise(0),
    )
    sess = seq.withColumn(
        "sid",
        F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    paths = sess.groupBy("user_id", "sid").agg(
        F.expr(
            "listagg(initial) WITHIN GROUP (ORDER BY tus, event_id)"
        ).alias("path")
    )
    hits = paths.agg(
        F.count("*").alias("total"),
        *[
            F.sum(F.col("path").rlike(rx).cast("long")).alias(f"h{i}")
            for i, (_, rx) in enumerate(_PATTERNS)
        ],
    )
    stack_args = ", ".join(
        f"'{name}', h{i}" for i, (name, _) in enumerate(_PATTERNS)
    )
    return hits.selectExpr(
        f"stack({len(_PATTERNS)}, {stack_args}) AS (pattern, n_sessions)",
        "total AS total_sessions",
    ).select(
        "pattern",
        "n_sessions",
        "total_sessions",
        F.round(F.col("n_sessions") / F.col("total_sessions"), 6).alias("share"),
    )


# --- rolling window of distinct actives (wave 9) ------------------------------

@register(
    "rel_rolling_wau",
    sql="""
WITH days AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS d FROM events
), expanded AS (
  SELECT DISTINCT user_id, d + CAST(gs.o AS INTEGER) AS win_day
  FROM days CROSS JOIN generate_series(0, 6) gs(o)
)
SELECT strftime(win_day, '%Y-%m-%d') AS win_day,
  CAST(count(DISTINCT user_id) AS BIGINT) AS wau
FROM expanded
GROUP BY win_day
""",
    tags=("events", "growth", "rolling-distinct"),
)
def rel_rolling_wau(spark: SparkSession, sf: str) -> DataFrame:
    """Rolling 7-day active users (WAU): for each day, how many distinct
    users were active in the trailing week — THE growth metric, and the
    canonical example of a rolling DISTINCT, which no window frame can
    express (COUNT(DISTINCT) OVER a frame is unsupported in both
    engines).

    The scale formulation: each (user, active-day) pair EXPANDS to the 7
    window-days it contributes to (a bounded 7x fan-out of the already
    user-day-deduped activity table, not of the raw log), then one hash
    agg counts distinct users per window day.  The alternative — self-
    joining the activity table against a day spine on a range predicate
    — shuffles the same rows but loses the fixed fan-out bound.  At 100
    TB the inner distinct and the outer count-distinct both partial-agg
    map-side; swap count_distinct for an HLL sketch (rel_hll_sketch) when
    exactness can yield to memory.  WAU days past the data's end are
    reported as the window drains — the standard trailing-window tail.
    """
    ev = _t(spark, sf, "events")
    days = ev.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("d")
    )
    expanded = (
        days.crossJoin(F.broadcast(spark.range(7).select(F.col("id").alias("o"))))
        .select("user_id", F.date_add(F.col("d"), F.col("o").cast("int")).alias("win_day"))
        .distinct()
    )
    return expanded.groupBy(
        F.date_format("win_day", "yyyy-MM-dd").alias("win_day")
    ).agg(F.countDistinct("user_id").alias("wau"))


# --- k-anonymity audit (wave 9) -----------------------------------------------

_KANON_K = 5


@register(
    "rel_k_anonymity",
    sql=f"""
WITH groups AS (
  SELECT event_type, CAST(user_id % 100 AS INTEGER) AS user_cohort,
    CAST(date_trunc('day', ts) AS DATE) AS d,
    CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2, 3
)
SELECT CASE WHEN n < {_KANON_K} THEN 'violating' ELSE 'anonymous' END
    AS status,
  CAST(count(*) AS BIGINT) AS n_groups,
  CAST(sum(n) AS BIGINT) AS n_rows,
  CAST(min(n) AS BIGINT) AS min_group, CAST(max(n) AS BIGINT) AS max_group
FROM groups GROUP BY 1
""",
    tags=("privacy", "k-anonymity", "governance"),
)
def rel_k_anonymity(spark: SparkSession, sf: str) -> DataFrame:
    """k-anonymity audit over a quasi-identifier tuple (event type, user
    cohort, day): how many QI groups have fewer than k={_KANON_K} members,
    and how many rows sit in those re-identifiable groups — the
    data-governance gate a training-data release runs before publishing
    event-derived features (a group of 1 IS an individual).

    Shape: one hash agg to the QI-group table (map-side combinable),
    one constant-size classification agg on top.  The release fix for
    violations — generalize the QI (coarser cohorts/dates) or suppress
    the rows — reruns this same query with a different grouping, so the
    audit cost is one aggregation per candidate generalization.
    """
    ev = _t(spark, sf, "events")
    groups = ev.groupBy(
        "event_type",
        (F.col("user_id") % 100).cast("int").alias("user_cohort"),
        F.to_date(F.date_trunc("day", "ts")).alias("d"),
    ).agg(F.count("*").alias("n"))
    status = F.when(F.col("n") < _KANON_K, "violating").otherwise("anonymous")
    return groups.groupBy(status.alias("status")).agg(
        F.count("*").alias("n_groups"),
        F.sum("n").alias("n_rows"),
        F.min("n").alias("min_group"),
        F.max("n").alias("max_group"),
    )


# --- CUSUM change-point detection (wave 9) ------------------------------------

@register(
    "rel_cusum_changepoint",
    sql="""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS d, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
), stats AS (
  SELECT CAST(count(*) AS BIGINT) AS nd, CAST(sum(n) AS BIGINT) AS s,
    CAST(sum(n * n) AS BIGINT) AS q
  FROM daily
), scal AS (
  SELECT CAST(floor(s * 10000.0 / nd + 0.5) AS BIGINT) AS mu_e4,
    CAST(floor(3 * sqrt((q - s * 1.0 * s / nd) / nd) * 10000 + 0.5) AS BIGINT)
      AS thr_e4
  FROM stats
), dev AS (
  SELECT d, n, n * 10000 - mu_e4 AS y_e4, thr_e4
  FROM daily CROSS JOIN scal
), run AS (
  SELECT d, n, thr_e4,
    CAST(sum(y_e4) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s_t
  FROM dev
), cum AS (
  SELECT d, n, thr_e4, s_t,
    CAST(min(s_t) OVER (ORDER BY d
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS m_run
  FROM run
)
SELECT strftime(d, '%Y-%m-%d') AS day, n,
  round((s_t - least(m_run, 0)) / 10000.0, 4) AS cusum,
  s_t - least(m_run, 0) > thr_e4 AS is_alarm
FROM cum
""",
    tags=("events", "changepoint", "monitoring"),
)
def rel_cusum_changepoint(spark: SparkSession, sf: str) -> DataFrame:
    """One-sided CUSUM change-point detection over the daily event-count
    series: alarm when the cumulative positive deviation from the series
    mean exceeds 3 sigma — the sequential mean-shift detector SPC charts
    and pipeline-volume monitors run (a stuck upstream producer shows
    here days before a threshold-on-raw-counts alarm).

    The CUSUM recursion s_t = max(0, s_{t-1} + y_t) is not directly
    window-expressible, but it has the prefix closed form
    s_t = S_t - min(0, min_{j<=t} S_j) — a running sum plus a running
    minimum OVER that running sum (current row included: a fresh global
    minimum resets the statistic to exactly zero), two stacked O(1)-state windows on the
    |days|-sized series (bounded by time span, the seasonal-decompose
    argument).  Mean and the 3-sigma threshold derive from exact integer
    sums (count/sum/sum-of-squares), re-quantized to e4 fixed point, so
    every comparison is BIGINT math — no cross-engine float gate.
    """
    ev = _t(spark, sf, "events")
    daily = ev.groupBy(
        F.to_date(F.date_trunc("day", "ts")).alias("d")
    ).agg(F.count("*").alias("n"))
    stats = daily.agg(
        F.count("*").alias("nd"),
        F.sum("n").alias("s"),
        F.sum(F.col("n") * F.col("n")).alias("q"),
    )
    scal = stats.select(
        F.floor(F.col("s") * 10000.0 / F.col("nd") + 0.5)
        .cast("long")
        .alias("mu_e4"),
        F.floor(
            3
            * F.sqrt(
                (F.col("q") - F.col("s") * 1.0 * F.col("s") / F.col("nd"))
                / F.col("nd")
            )
            * 10000
            + 0.5
        )
        .cast("long")
        .alias("thr_e4"),
    )
    dev = daily.crossJoin(F.broadcast(scal)).select(
        "d",
        "n",
        (F.col("n") * 10000 - F.col("mu_e4")).alias("y_e4"),
        "thr_e4",
    )
    w_run = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    cum = dev.select(
        "d",
        "n",
        "thr_e4",
        F.sum("y_e4").over(w_run).alias("s_t"),
    ).withColumn("m_run", F.min("s_t").over(w_run).cast("long"))
    cusum_e4 = F.col("s_t") - F.least(F.col("m_run"), F.lit(0).cast("long"))
    return cum.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "n",
        F.round(cusum_e4 / 10000.0, 4).alias("cusum"),
        (cusum_e4 > F.col("thr_e4")).alias("is_alarm"),
    )


# --- time-constrained funnel (wave 9) -----------------------------------------

_TCF_WINDOW_US = 3_600_000_000  # each next stage must land within 1 hour


@register(
    "rel_funnel_time_constrained",
    sql=f"""
WITH s1 AS (
  SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS t2
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click' AND epoch_us(e.ts) > s1.t1
    AND epoch_us(e.ts) - s1.t1 <= {_TCF_WINDOW_US}
  GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS t3
  FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.t2
    AND epoch_us(e.ts) - s2.t2 <= {_TCF_WINDOW_US}
  GROUP BY e.user_id
)
SELECT CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_view,
  CAST((SELECT count(*) FROM s2) AS BIGINT) AS n_click_1h,
  CAST((SELECT count(*) FROM s3) AS BIGINT) AS n_purchase_1h
""",
    tags=("events", "funnel", "time-constrained"),
)
def rel_funnel_time_constrained(spark: SparkSession, sf: str) -> DataFrame:
    """Time-constrained ordered funnel: view -> click -> purchase where
    each NEXT stage must land within one hour of the previous stage's
    qualifying time — the windowed-funnel semantics product analytics
    actually uses (an unconstrained funnel credits a purchase three weeks
    after the click; this one doesn't).  Same first-qualifying-time
    per-stage semantics as rel_funnel_conversion, restricted to the
    decay window.

    Shape: three user-keyed min-aggs chained by joins on the (tiny)
    qualified-user sets — each stage's output is a shrinking user
    dimension that broadcasts into the next stage's scan; the time
    constraint is integer epoch-micro arithmetic pushed into the join
    filter.  The three stage counts crossJoin as 1-row scalars
    (rel_funnel_conversion's allowlisted pattern).
    """
    ev = _t(spark, sf, "events").select(
        "user_id", "event_type", _micros("ts").alias("tus")
    )
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("tus").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(
            (F.col("tus") > F.col("t1"))
            & (F.col("tus") - F.col("t1") <= _TCF_WINDOW_US)
        )
        .groupBy("user_id")
        .agg(F.min("tus").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(
            (F.col("tus") > F.col("t2"))
            & (F.col("tus") - F.col("t2") <= _TCF_WINDOW_US)
        )
        .groupBy("user_id")
        .agg(F.min("tus").alias("t3"))
    )
    return (
        s1.agg(F.count("*").alias("n_view"))
        .crossJoin(s2.agg(F.count("*").alias("n_click_1h")))
        .crossJoin(s3.agg(F.count("*").alias("n_purchase_1h")))
    )


# --- activity heatmap (wave 11) -----------------------------------------------

@register(
    "rel_activity_heatmap",
    sql="""
SELECT CAST(EXTRACT(isodow FROM ts) AS INTEGER) AS dow,
  CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hod,
  CAST(count(*) AS BIGINT) AS n,
  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY 1, 2
""",
    tags=("events", "heatmap", "reporting"),
)
def rel_activity_heatmap(spark: SparkSession, sf: str) -> DataFrame:
    """Day-of-week x hour-of-day activity heatmap — the capacity-planning
    and staffing dashboard query (when does load actually arrive), and
    the visual twin of rel_seasonal_decompose's hour-of-day seasonal
    component.  ISO day numbering (Mon=1) on both engines.

    Shape: one hash agg to a bounded 7 x 24 grid; the distinct-user
    count shuffles on the grid key with per-cell user sets bounded by
    the population.  Nothing else — the simplest query in the events
    family on purpose: the point is the 168-cell contract.
    """
    ev = _t(spark, sf, "events")
    return ev.groupBy(
        F.dayofweek("ts").alias("raw_dow"),
        F.hour("ts").alias("hod"),
    ).agg(
        F.count("*").alias("n"),
        F.countDistinct("user_id").alias("n_users"),
    ).select(
        # Spark dayofweek: Sun=1..Sat=7; ISO wants Mon=1..Sun=7
        F.expr("CAST(CASE WHEN raw_dow = 1 THEN 7 ELSE raw_dow - 1 END AS INT)")
        .alias("dow"),
        "hod",
        "n",
        "n_users",
    )


# --- new vs returning split (wave 11) -----------------------------------------

@register(
    "rel_new_vs_returning",
    sql="""
WITH first_seen AS (
  SELECT user_id, CAST(date_trunc('day', min(ts)) AS DATE) AS first_day
  FROM events GROUP BY user_id
), daily AS (
  SELECT DISTINCT e.user_id, CAST(date_trunc('day', e.ts) AS DATE) AS d,
    f.first_day
  FROM events e JOIN first_seen f ON e.user_id = f.user_id
)
SELECT strftime(d, '%Y-%m-%d') AS day,
  CAST(sum(CASE WHEN d = first_day THEN 1 ELSE 0 END) AS BIGINT) AS new_users,
  CAST(sum(CASE WHEN d > first_day THEN 1 ELSE 0 END) AS BIGINT)
    AS returning_users
FROM daily GROUP BY day
""",
    tags=("events", "growth", "new-vs-returning"),
)
def rel_new_vs_returning(spark: SparkSession, sf: str) -> DataFrame:
    """Daily new-vs-returning active-user split: each (user, active day)
    classifies against the user's first-seen day — the growth-accounting
    companion to rel_cohort_retention (same first-seen dimension, daily
    composition instead of a triangle) and rel_rolling_wau (level vs
    mix).

    Shape: the first-seen dim is one user-keyed min-agg (tiny, broadcast
    back); activity dedupes to user-days before classification so the
    output is composition of ACTIVES, not events; final agg lands on
    |days| rows.  All integer counts.
    """
    ev = _t(spark, sf, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.to_date(F.date_trunc("day", F.min("ts"))).alias("first_day")
    )
    daily = (
        ev.select("user_id", F.to_date(F.date_trunc("day", "ts")).alias("d"))
        .distinct()
        .join(F.broadcast(first_seen), "user_id")
    )
    return daily.groupBy(
        F.date_format("d", "yyyy-MM-dd").alias("day")
    ).agg(
        F.sum((F.col("d") == F.col("first_day")).cast("long")).alias("new_users"),
        F.sum((F.col("d") > F.col("first_day")).cast("long")).alias(
            "returning_users"
        ),
    )


# --- retention decay fit (wave 11) --------------------------------------------

@register(
    "rel_retention_decay_fit",
    sql="""
WITH cohort AS (
  SELECT user_id, CAST(date_trunc('day', min(ts)) AS DATE) AS cohort_day
  FROM events GROUP BY user_id
), act AS (
  SELECT c.cohort_day,
    CAST(date_diff('day', c.cohort_day, CAST(date_trunc('day', e.ts) AS DATE))
      AS INTEGER) AS day_off,
    CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active
  FROM events e JOIN cohort c ON e.user_id = c.user_id
  WHERE date_diff('day', c.cohort_day, CAST(date_trunc('day', e.ts) AS DATE))
    BETWEEN 1 AND 14
  GROUP BY 1, 2
), base AS (
  SELECT cohort_day, CAST(count(*) AS BIGINT) AS cohort_size
  FROM cohort GROUP BY cohort_day
), rates AS (
  SELECT a.day_off, a.cohort_day,
    ln(a.n_active * 1.0 / b.cohort_size) AS log_rate
  FROM act a JOIN base b ON a.cohort_day = b.cohort_day
  WHERE a.n_active > 0
)
SELECT round(regr_slope(log_rate, day_off), 6) AS decay_slope,
  round(regr_intercept(log_rate, day_off), 6) AS log_intercept,
  round(exp(regr_intercept(log_rate, day_off)
    + 30 * regr_slope(log_rate, day_off)), 6) AS projected_day30_rate,
  CAST(count(*) AS BIGINT) AS n_points
FROM rates
""",
    tags=("events", "retention", "curve-fit"),
)
def rel_retention_decay_fit(spark: SparkSession, sf: str) -> DataFrame:
    """Exponential retention-decay fit: the cohort triangle's daily
    retention rates (offsets 1..14, pooled across cohorts) regress
    log-linearly against the offset, giving ONE decay constant and a
    projected day-30 rate — the summary a growth model consumes where
    rel_cohort_retention gives the raw surface (r(t) ~ e^(a + bt), the
    standard first-order retention model).

    Shape: the cohort/activity aggregation is rel_cohort_retention's
    (user-keyed aggs, bounded output); the regression runs regr_slope /
    regr_intercept over the ~|cohorts| x 14 rate points — a single
    co-moment aggregate, the rel_stats_agg cross-engine precedent, with
    6dp rounding on the fitted outputs.
    """
    ev = _t(spark, sf, "events")
    cohort = ev.groupBy("user_id").agg(
        F.to_date(F.date_trunc("day", F.min("ts"))).alias("cohort_day")
    )
    act = (
        ev.join(cohort, "user_id")
        .select(
            "cohort_day",
            "user_id",
            F.datediff(F.to_date(F.date_trunc("day", "ts")), F.col("cohort_day"))
            .cast("int")
            .alias("offset"),
        )
        .filter(F.col("offset").between(1, 14))
        .groupBy("cohort_day", "offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )
    base = cohort.groupBy("cohort_day").agg(F.count("*").alias("cohort_size"))
    rates = (
        act.join(base, "cohort_day")
        .filter(F.col("n_active") > 0)
        .select(
            "offset",
            F.log(F.col("n_active") / F.col("cohort_size")).alias("log_rate"),
        )
    )
    slope = F.expr("regr_slope(log_rate, offset)")
    intercept = F.expr("regr_intercept(log_rate, offset)")
    return rates.agg(
        F.round(slope, 6).alias("decay_slope"),
        F.round(intercept, 6).alias("log_intercept"),
        F.round(F.exp(intercept + 30 * slope), 6).alias("projected_day30_rate"),
        F.count("*").alias("n_points"),
    )
