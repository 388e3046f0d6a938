"""Generalized relational surface (SURVEY.md §2.3) as named, oracle-checked
queries over the TPC-H-ish testdata tables.

Every query here is pure Spark built-ins (JVM-side, whole-stage codegen) —
the engine's job is to declare, expose, and test this surface, relying on
Catalyst for pushdown/pruning/join planning.  Floating-point aggregates are
ROUNDed identically on both sides because summation order differs between
engines (documented deviation; values agree to well below the rounding
grain).

Scale notes (100 TB posture), applied throughout:
  * small dims (region/nation/part/supplier/customer) joined with explicit
    broadcast() hints — no shuffle on the fact side;
  * top-k always ORDER BY + LIMIT (planner emits TakeOrderedAndProject,
    never a global sort);
  * aggregations are partial+final hash aggs by construction;
  * windows partition by bounded keys (customer, brand, user) — no
    whole-table single-partition windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from knowledgebot_spark.registry import register
from knowledgebot_spark.tables import read_table as _t


# --- aggregation -------------------------------------------------------------

@register(
    "rel_pricing_summary",
    sql="""
SELECT l_returnflag, l_linestatus,
  round(sum(l_quantity), 2) AS sum_qty,
  round(sum(l_extendedprice), 2) AS sum_base_price,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
  round(avg(l_quantity), 4) AS avg_qty,
  round(avg(l_extendedprice), 4) AS avg_price,
  round(avg(l_discount), 4) AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    tags=("agg", "hash-agg"),
)
def rel_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1 shape: partial+final hash agg, predicate pushed to scan."""
    li = _t(spark, sf, "lineitem").filter(
        F.expr("l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'")
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(disc), 2).alias("sum_disc_price"),
        F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@register(
    "rel_distinct_agg",
    sql="""
SELECT l_returnflag,
  count(DISTINCT l_suppkey) AS n_supp,
  count(DISTINCT l_partkey) AS n_part,
  round(sum(l_quantity), 2) AS sum_qty
FROM lineitem GROUP BY l_returnflag
""",
    tags=("agg", "distinct-agg"),
)
def rel_distinct_agg(spark: SparkSession, sf: str) -> DataFrame:
    return _t(spark, sf, "lineitem").groupBy("l_returnflag").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct("l_partkey").alias("n_part"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


@register(
    "rel_rollup",
    sql="""
SELECT
  CASE WHEN GROUPING(l_returnflag) = 1 THEN 'ALL' ELSE l_returnflag END AS flag,
  CASE WHEN GROUPING(l_linestatus) = 1 THEN 'ALL' ELSE l_linestatus END AS status,
  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
    tags=("agg", "rollup"),
)
def rel_rollup(spark: SparkSession, sf: str) -> DataFrame:
    li = _t(spark, sf, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").alias("g_flag"),
        F.grouping("l_linestatus").alias("g_status"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count("*").alias("n"),
    ).select(
        F.when(F.col("g_flag") == 1, "ALL").otherwise(F.col("l_returnflag")).alias("flag"),
        F.when(F.col("g_status") == 1, "ALL")
        .otherwise(F.col("l_linestatus"))
        .alias("status"),
        "sum_qty",
        "n",
    )


@register(
    "rel_cube",
    sql="""
SELECT
  CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL' ELSE o_orderstatus END AS status,
  CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL' ELSE o_orderpriority END AS priority,
  count(*) AS n, round(sum(o_totalprice), 2) AS total
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
    tags=("agg", "cube"),
)
def rel_cube(spark: SparkSession, sf: str) -> DataFrame:
    o = _t(spark, sf, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").alias("g_status"),
        F.grouping("o_orderpriority").alias("g_prio"),
        F.count("*").alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    ).select(
        F.when(F.col("g_status") == 1, "ALL").otherwise(F.col("o_orderstatus")).alias("status"),
        F.when(F.col("g_prio") == 1, "ALL")
        .otherwise(F.col("o_orderpriority"))
        .alias("priority"),
        "n",
        "total",
    )


@register(
    "rel_grouping_sets",
    sql="""
SELECT
  CASE WHEN GROUPING(c_mktsegment) = 1 THEN 'ALL' ELSE c_mktsegment END AS segment,
  CASE WHEN GROUPING(c_nationkey) = 1 THEN -1 ELSE c_nationkey END AS nationkey,
  count(*) AS n, round(avg(c_acctbal), 4) AS avg_bal
FROM customer GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
""",
    tags=("agg", "grouping-sets"),
)
def rel_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    c = _t(spark, sf, "customer")
    c.createOrReplaceTempView("rel_gs_customer")
    return spark.sql(
        """
SELECT
  CASE WHEN GROUPING(c_mktsegment) = 1 THEN 'ALL' ELSE c_mktsegment END AS segment,
  CASE WHEN GROUPING(c_nationkey) = 1 THEN -1 ELSE c_nationkey END AS nationkey,
  count(*) AS n, round(avg(c_acctbal), 4) AS avg_bal
FROM rel_gs_customer GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
"""
    )


@register(
    "rel_approx_distinct",
    sql="""
SELECT l_returnflag,
  CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
  CAST(count(*) AS BIGINT) AS n,
  TRUE AS approx_within_5pct
FROM lineitem GROUP BY l_returnflag
""",
    tags=("agg", "approx"),
)
def rel_approx_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """approx_count_distinct (HLL++, rsd=0.01) — the raw estimate differs
    from DuckDB's estimator, so the falsifiable contract is encoded
    in-query: emit the exact count plus a boolean asserting the estimate
    lands within 5% of it; the oracle states the exact count and TRUE.  An
    estimator drifting out of tolerance now FAILS the hash gate instead of
    hiding behind a rows-only check."""
    agg = _t(spark, sf, "lineitem").groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx"),
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.count("*").alias("n"),
    )
    return agg.select(
        "l_returnflag",
        "exact_parts",
        "n",
        (
            F.abs(F.col("approx") - F.col("exact_parts"))
            <= 0.05 * F.col("exact_parts")
        ).alias("approx_within_5pct"),
    )


# --- joins -------------------------------------------------------------------

@register(
    "rel_topk_revenue",
    sql="""
SELECT o.o_orderkey, strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
  round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY o.o_orderkey, o.o_orderdate
ORDER BY revenue DESC, o.o_orderkey
LIMIT 10
""",
    tags=("join", "topk"),
)
def rel_topk_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q3 shape: broadcast the filtered customer dim, shuffle only on
    the orderkey agg; top-k via TakeOrderedAndProject."""
    c = _t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    joined = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
    )
    return (
        joined.groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "revenue",
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "rel_region_revenue",
    sql="""
SELECT r.r_name AS region, round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
  count(*) AS n_lineitems
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
""",
    tags=("join", "multi-join"),
)
def rel_region_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q5 shape: star join — every dim broadcast, single shuffle for
    the final region agg."""
    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return joined.groupBy(F.col("r_name").alias("region")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
        F.count("*").alias("n_lineitems"),
    )


@register(
    "rel_join_semi",
    sql="""
SELECT c_mktsegment, count(*) AS n_customers
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
GROUP BY c_mktsegment
""",
    tags=("join", "semi"),
)
def rel_join_semi(spark: SparkSession, sf: str) -> DataFrame:
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


@register(
    "rel_join_anti",
    sql="""
SELECT n.n_name AS nation, count(*) AS n_customers_no_p_orders
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
GROUP BY n.n_name
""",
    tags=("join", "anti"),
)
def rel_join_anti(spark: SparkSession, sf: str) -> DataFrame:
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders").filter(F.col("o_orderstatus") == "P")
    n = _t(spark, sf, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count("*").alias("n_customers_no_p_orders"))
    )


@register(
    "rel_join_full",
    sql="""
WITH cust AS (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY 1),
     supp AS (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier GROUP BY 1)
SELECT coalesce(cust.nk, supp.nk) AS nationkey,
  coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
FROM cust FULL OUTER JOIN supp ON cust.nk = supp.nk
""",
    tags=("join", "full-outer"),
)
def rel_join_full(spark: SparkSession, sf: str) -> DataFrame:
    cust = (
        _t(spark, sf, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_cust"))
    )
    supp = (
        _t(spark, sf, "supplier")
        .groupBy(F.col("s_nationkey").alias("snk"))
        .agg(F.count("*").alias("n_supp"))
    )
    j = cust.join(supp, cust.nk == supp.snk, "full_outer")
    return j.select(
        F.coalesce("nk", "snk").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@register(
    "rel_join_right",
    sql="""
SELECT p.p_brand, count(l.l_orderkey) AS n_lineitems
FROM lineitem l RIGHT JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
""",
    tags=("join", "right-outer"),
)
def rel_join_right(spark: SparkSession, sf: str) -> DataFrame:
    li = _t(spark, sf, "lineitem")
    p = _t(spark, sf, "part")
    return (
        li.join(p, li.l_partkey == p.p_partkey, "right")
        .groupBy("p_brand")
        .agg(F.count("l_orderkey").alias("n_lineitems"))
    )


@register(
    "rel_join_range",
    sql="""
SELECT s.s_suppkey, count(*) AS n_richer_customers
FROM supplier s JOIN customer c ON c.c_acctbal > s.s_acctbal + 1000
GROUP BY s.s_suppkey
""",
    tags=("join", "non-equi"),
)
def rel_join_range(spark: SparkSession, sf: str) -> DataFrame:
    """Non-equi (theta) join: small side broadcast -> BroadcastNestedLoop,
    never a cartesian shuffle."""
    s = _t(spark, sf, "supplier")
    c = _t(spark, sf, "customer")
    return (
        c.join(F.broadcast(s), c.c_acctbal > s.s_acctbal + 1000)
        .groupBy("s_suppkey")
        .agg(F.count("*").alias("n_richer_customers"))
    )


# --- windows -----------------------------------------------------------------

@register(
    "rel_window_rank",
    sql="""
SELECT * FROM (
  SELECT p_brand, p_partkey, round(p_retailprice, 2) AS price,
    CAST(dense_rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS INTEGER) AS rk
  FROM part
) WHERE rk <= 3
""",
    tags=("window", "rank"),
)
def rel_window_rank(spark: SparkSession, sf: str) -> DataFrame:
    p = _t(spark, sf, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        p.select(
            "p_brand",
            "p_partkey",
            F.round("p_retailprice", 2).alias("price"),
            F.dense_rank().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= 3)
    )


@register(
    "rel_window_analytic",
    sql="""
SELECT o_custkey, o_orderkey,
  CAST(coalesce(date_diff('day', lag(o_orderdate) OVER w, o_orderdate), -1) AS INTEGER) AS days_since_prev,
  strftime(first_value(o_orderdate) OVER w, '%Y-%m-%d') AS first_order,
  strftime(lead(o_orderdate) OVER w, '%Y-%m-%d') AS next_order
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
    tags=("window", "analytic"),
)
def rel_window_analytic(spark: SparkSession, sf: str) -> DataFrame:
    o = _t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.coalesce(
            F.datediff("o_orderdate", F.lag("o_orderdate").over(w)), F.lit(-1)
        ).alias("days_since_prev"),
        F.date_format(F.first("o_orderdate").over(w), "yyyy-MM-dd").alias("first_order"),
        F.date_format(F.lead("o_orderdate").over(w), "yyyy-MM-dd").alias("next_order"),
    )


@register(
    "rel_window_running_sum",
    sql="""
SELECT o_custkey, o_orderkey,
  round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
FROM orders
""",
    tags=("window", "frame-rows"),
)
def rel_window_running_sum(spark: SparkSession, sf: str) -> DataFrame:
    o = _t(spark, sf, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


@register(
    "rel_window_range_frame",
    sql="""
SELECT p_partkey, p_brand, p_size,
  round(sum(p_retailprice) OVER (PARTITION BY p_brand ORDER BY p_size
        RANGE BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS nearby_price
FROM part
""",
    tags=("window", "frame-range"),
)
def rel_window_range_frame(spark: SparkSession, sf: str) -> DataFrame:
    p = _t(spark, sf, "part")
    w = Window.partitionBy("p_brand").orderBy("p_size").rangeBetween(-2, 0)
    return p.select(
        "p_partkey",
        "p_brand",
        "p_size",
        F.round(F.sum("p_retailprice").over(w), 2).alias("nearby_price"),
    )


@register(
    "rel_window_ntile",
    sql="""
SELECT tile, count(*) AS n, round(min(c_acctbal), 2) AS min_bal, round(max(c_acctbal), 2) AS max_bal
FROM (
  SELECT c_acctbal, CAST(ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS INTEGER) AS tile
  FROM customer
) GROUP BY tile
""",
    tags=("window", "ntile"),
)
def rel_window_ntile(spark: SparkSession, sf: str) -> DataFrame:
    """ntile(4) quartiles over the customer table — computed as a
    DISTRIBUTED exact ntile (operators/ranking.py) so the quartile
    assignment never collapses the table onto one task; values are
    identical to the window-function formulation."""
    from knowledgebot_spark.operators import ranking as rk

    c = _t(spark, sf, "customer")
    return (
        rk.with_global_ntile(
            c.select("c_acctbal", "c_custkey"),
            [F.col("c_acctbal").asc(), F.col("c_custkey").asc()],
            4,
            out="tile",
        )
        .select("c_acctbal", "tile")
        .groupBy("tile")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("c_acctbal"), 2).alias("min_bal"),
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
        )
    )


# --- sort / limit / set ops --------------------------------------------------

@register(
    "rel_topk_sort",
    sql="""
SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
LIMIT 15
""",
    tags=("sort", "topk"),
)
def rel_topk_sort(spark: SparkSession, sf: str) -> DataFrame:
    return (
        _t(spark, sf, "lineitem")
        .select("l_orderkey", "l_linenumber", F.round("l_extendedprice", 2).alias("price"))
        .orderBy(F.desc("price"), "l_orderkey", "l_linenumber")
        .limit(15)
    )


@register(
    "rel_set_union",
    sql="""
SELECT nk, CAST(sum(n) AS BIGINT) AS n FROM (
  SELECT c_nationkey AS nk, count(*) AS n FROM customer GROUP BY 1
  UNION ALL
  SELECT s_nationkey AS nk, count(*) AS n FROM supplier GROUP BY 1
) GROUP BY nk
""",
    tags=("setop", "union"),
)
def rel_set_union(spark: SparkSession, sf: str) -> DataFrame:
    c = (
        _t(spark, sf, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count("*").alias("n"))
    )
    s = (
        _t(spark, sf, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count("*").alias("n"))
    )
    return c.unionByName(s).groupBy("nk").agg(F.sum("n").alias("n"))


@register(
    "rel_set_intersect",
    sql="""
SELECT c_nationkey AS nk FROM customer
INTERSECT
SELECT s_nationkey AS nk FROM supplier
""",
    tags=("setop", "intersect"),
)
def rel_set_intersect(spark: SparkSession, sf: str) -> DataFrame:
    c = _t(spark, sf, "customer").select(F.col("c_nationkey").alias("nk"))
    s = _t(spark, sf, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.intersect(s)


@register(
    "rel_set_except",
    sql="""
SELECT c_nationkey AS nk FROM customer
EXCEPT
SELECT s_nationkey AS nk FROM supplier
""",
    tags=("setop", "except"),
)
def rel_set_except(spark: SparkSession, sf: str) -> DataFrame:
    c = _t(spark, sf, "customer").select(F.col("c_nationkey").alias("nk"))
    s = _t(spark, sf, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.subtract(s)  # EXCEPT DISTINCT (exceptAll keeps surplus dups)


# --- scalar function families ------------------------------------------------

@register(
    "rel_scalar_string",
    sql="""
SELECT p_partkey,
  upper(p_name) AS name_upper,
  CAST(length(p_name) AS INTEGER) AS name_len,
  substr(p_name, 1, 8) AS name_prefix,
  replace(p_type, ' ', '_') AS type_joined,
  lpad(CAST(p_size AS STRING), 4, '0') AS size_padded,
  reverse(p_brand) AS brand_rev,
  CAST(strpos(p_name, 'a') AS INTEGER) AS first_a,
  concat_ws('|', p_brand, p_type) AS brand_type
FROM part
""",
    tags=("scalar", "string"),
)
def rel_scalar_string(spark: SparkSession, sf: str) -> DataFrame:
    p = _t(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_joined"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.reverse("p_brand").alias("brand_rev"),
        F.instr("p_name", "a").alias("first_a"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
    )


@register(
    "rel_scalar_date",
    sql="""
SELECT o_orderkey,
  CAST(year(o_orderdate) AS INTEGER) AS yr,
  CAST(month(o_orderdate) AS INTEGER) AS mth,
  CAST(day(o_orderdate) AS INTEGER) AS dom,
  strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
  strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
  CAST(date_diff('day', o_orderdate, TIMESTAMP '2000-01-01 00:00:00') AS INTEGER) AS days_to_y2k
FROM orders
""",
    tags=("scalar", "date"),
)
def rel_scalar_date(spark: SparkSession, sf: str) -> DataFrame:
    o = _t(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mth"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.date_format(F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"), "yyyy-MM-dd").alias(
            "due_date"
        ),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.datediff(F.lit("2000-01-01").cast("date"), "o_orderdate").alias("days_to_y2k"),
    )


@register(
    "rel_scalar_math",
    sql="""
SELECT l_orderkey, l_linenumber,
  round(l_extendedprice * 0.1, 4) AS tithe,
  round(abs(l_discount - 0.05), 6) AS disc_dev,
  CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
  CAST(floor(l_quantity / 7) AS BIGINT) AS qty_sevenths,
  CAST(l_linenumber % 3 AS INTEGER) AS line_mod,
  round(power(l_quantity, 2), 4) AS qty_sq,
  round(sqrt(l_extendedprice), 6) AS price_sqrt,
  round(ln(l_extendedprice + 1), 6) AS price_ln,
  CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign
FROM lineitem
""",
    tags=("scalar", "math"),
)
def rel_scalar_math(spark: SparkSession, sf: str) -> DataFrame:
    li = _t(spark, sf, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # 4dp: prices carry 2 decimals, so *0.1 sits exactly on the .005
        # boundary at 2dp — engines disagree there; 4dp is exact
        F.round(F.col("l_extendedprice") * 0.1, 4).alias("tithe"),
        F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("disc_dev"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor(F.col("l_quantity") / 7).alias("qty_sevenths"),
        (F.col("l_linenumber") % 3).alias("line_mod"),
        F.round(F.pow("l_quantity", F.lit(2)), 4).alias("qty_sq"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
    )


@register(
    "rel_scalar_array",
    sql="""
SELECT doc_id,
  CAST(len(str_split(text, ' ')) AS INTEGER) AS n_tokens,
  str_split(text, ' ')[1] AS first_token,
  array_to_string(list_sort(str_split(text, ' ')[1:5]), ',') AS first5_sorted,
  CAST(len(list_distinct(str_split(text, ' '))) AS INTEGER) AS n_distinct,
  list_contains(str_split(text, ' '), 'spark') AS has_spark
FROM documents
""",
    tags=("scalar", "array"),
)
def rel_scalar_array(spark: SparkSession, sf: str) -> DataFrame:
    d = _t(spark, sf, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.element_at(toks, 1).alias("first_token"),
        F.array_join(F.array_sort(F.slice(toks, 1, 5)), ",").alias("first5_sorted"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.array_contains(toks, "spark").alias("has_spark"),
    )


@register(
    "rel_scalar_json",
    sql="""
SELECT CAST(CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS INTEGER) AS k_bucket,
  count(*) AS n, round(sum(value), 2) AS sum_value
FROM events
GROUP BY 1
""",
    tags=("scalar", "json", "map"),
)
def rel_scalar_json(spark: SparkSession, sf: str) -> DataFrame:
    e = _t(spark, sf, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.groupBy((k % 10).alias("k_bucket"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
    )


@register(
    "rel_scalar_conditional",
    sql="""
SELECT c_custkey,
  CASE WHEN c_acctbal < 0 THEN 'debt' WHEN c_acctbal < 5000 THEN 'low' ELSE 'high' END AS bal_class,
  round(least(c_acctbal, 5000.0), 2) AS capped,
  round(greatest(c_acctbal, 0.0), 2) AS floored,
  coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_masked
FROM customer
""",
    tags=("scalar", "conditional"),
)
def rel_scalar_conditional(spark: SparkSession, sf: str) -> DataFrame:
    c = _t(spark, sf, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("bal_class"),
        F.round(F.least("c_acctbal", F.lit(5000.0)), 2).alias("capped"),
        F.round(F.greatest("c_acctbal", F.lit(0.0)), 2).alias("floored"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg_masked"
        ),
    )


# --- event-time windows (batch equivalents of the streaming ops) -------------

@register(
    "rel_events_tumbling",
    sql="""
SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
  event_type, count(*) AS n, round(sum(value), 2) AS sum_value
FROM events GROUP BY 1, 2
""",
    tags=("streaming", "tumbling"),
)
def rel_events_tumbling(spark: SparkSession, sf: str) -> DataFrame:
    e = _t(spark, sf, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@register(
    "rel_events_sliding",
    sql="""
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, count(*) AS n, round(sum(value), 2) AS sum_value
FROM (
  SELECT e.*, time_bucket(INTERVAL '30 minutes', e.ts) - k.k * INTERVAL '30 minutes' AS ws
  FROM events e, (VALUES (0), (1)) k(k)
)
WHERE ts >= ws AND ts < ws + INTERVAL '60 minutes'
GROUP BY ws
""",
    tags=("streaming", "sliding"),
)
def rel_events_sliding(spark: SparkSession, sf: str) -> DataFrame:
    e = _t(spark, sf, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n",
            "sum_value",
        )
    )


@register(
    "rel_events_session",
    sql="""
WITH marked AS (
  SELECT user_id, ts, value,
    CASE WHEN lag(ts) OVER w IS NULL
           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sess AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
  count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM sess GROUP BY user_id, sid
""",
    tags=("streaming", "session"),
)
def rel_events_session(spark: SparkSession, sf: str) -> DataFrame:
    """session_window (30 min gap) in batch mode; oracle recreates sessions
    via gaps-and-islands.  Session merge rule: an event strictly inside
    prev_ts + gap extends the session (Spark semantics)."""
    e = _t(spark, sf, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.min("ts").alias("min_ts"),
        )
        .select(
            "user_id",
            F.date_format("min_ts", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "rel_dedup_keep_first",
    sql="""
SELECT user_id, event_type, first_event_id, strftime(first_ts, '%Y-%m-%d %H:%M:%S') AS first_ts
FROM (
  SELECT user_id, event_type, event_id AS first_event_id, ts AS first_ts,
    row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
  FROM events
) WHERE rn = 1
""",
    tags=("dedup", "window"),
)
def rel_dedup_keep_first(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic dedup-keep-earliest (the well-defined form of
    dropDuplicates; streaming variant lives in streaming/pipeline.py)."""
    e = _t(spark, sf, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.select(
            "user_id",
            "event_type",
            F.col("event_id").alias("first_event_id"),
            F.col("ts").alias("first_ts"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            "first_event_id",
            F.date_format("first_ts", "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
        )
    )


# --- skew handling: salted two-phase aggregation ------------------------------

@register(
    "rel_salted_agg",
    sql="""
SELECT l_returnflag, count(*) AS n,
  CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM lineitem GROUP BY l_returnflag
""",
    tags=("agg", "skew", "salting"),
)
def rel_salted_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Salted two-phase aggregation — the manual skew-mitigation pattern for
    hot keys (l_returnflag has only 3 values, so a naive groupBy sends each
    key's entire volume to one reducer).  Phase 1 aggregates on
    (key, salt=orderkey%16) spreading each hot key over 16 reducers; phase 2
    combines the 3x16 partials.  Exact integer cents so the two-phase
    result is bit-equal to the single-phase oracle."""
    li = _t(spark, sf, "lineitem").select(
        "l_returnflag",
        F.expr("CAST(floor(l_extendedprice * 100) AS BIGINT)").alias("cents"),
        F.pmod("l_orderkey", F.lit(16)).alias("salt"),
    )
    partial = li.groupBy("l_returnflag", "salt").agg(
        F.count("*").alias("pn"), F.sum("cents").alias("pc")
    )
    return partial.groupBy("l_returnflag").agg(
        F.sum("pn").alias("n"), F.sum("pc").alias("sum_cents")
    )


# --- bucketed co-located join (shuffle-free big-big join) ---------------------

@register(
    "rel_bucketed_join",
    sql="""
SELECT o_orderpriority, count(*) AS n_items,
  CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
""",
    tags=("join", "bucketed", "co-located"),
)
def rel_bucketed_join(spark: SparkSession, sf: str) -> DataFrame:
    """Big-big join with BOTH sides bucketed on the join key: lineitem and
    orders are written once as 8-bucket tables, after which the join plans
    with NO Exchange on either side (co-located SMJ reading bucket files
    directly) — the pre-shuffle pattern that amortizes one shuffle across
    every downstream join at 100 TB.  Plan asserted in tests/test_plans.py.
    """
    import os

    import shutil

    tag = os.path.basename(sf.rstrip("/")).replace(".", "_")
    lt, ot = f"kb_bkt_lineitem_{tag}", f"kb_bkt_orders_{tag}"
    catalog_tables = {t.name for t in spark.catalog.listTables()}
    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    for t in (lt, ot):
        if t not in catalog_tables:
            # stale location from a previous session's catalog
            shutil.rmtree(os.path.join(warehouse, t.lower()), ignore_errors=True)
    if lt not in catalog_tables:
        _t(spark, sf, "lineitem").select(
            "l_orderkey",
            F.expr("CAST(floor(l_extendedprice * 100) AS BIGINT)").alias("cents"),
        ).write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode(
            "overwrite"
        ).saveAsTable(lt)
    if ot not in catalog_tables:
        _t(spark, sf, "orders").select(
            "o_orderkey", "o_orderpriority"
        ).write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode(
            "overwrite"
        ).saveAsTable(ot)

    li, orders = spark.table(lt), spark.table(ot)
    # force the merge strategy: at tiny SFs auto-broadcast would kick in and
    # hide the point of the demo (at 100 TB neither side broadcasts)
    joined = li.hint("merge").join(orders, li.l_orderkey == orders.o_orderkey)
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_items"), F.sum("cents").alias("sum_cents")
    )


# --- multiset set ops + schema-tolerant union ---------------------------------

@register(
    "rel_set_intersect_all",
    sql="""
SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
INTERSECT ALL
SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
""",
    tags=("setop", "intersect-all"),
)
def rel_set_intersect_all(spark: SparkSession, sf: str) -> DataFrame:
    """INTERSECT ALL: multiset semantics — duplicates survive up to the
    minimum multiplicity on each side."""
    o = _t(spark, sf, "orders")
    a = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("k")
    )
    b = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("k"))
    return a.intersectAll(b)


@register(
    "rel_set_except_all",
    sql="""
SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
EXCEPT ALL
SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
""",
    tags=("setop", "except-all"),
)
def rel_set_except_all(spark: SparkSession, sf: str) -> DataFrame:
    """EXCEPT ALL: surplus duplicate occurrences survive."""
    o = _t(spark, sf, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("k"))
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("k")
    )
    return a.exceptAll(b)


@register(
    "rel_union_missing_columns",
    sql="""
SELECT n_nationkey AS k, n_name AS name, NULL AS extra FROM nation
UNION ALL
SELECT r_regionkey AS k, r_name AS name, 'region' AS extra FROM region
""",
    tags=("setop", "unionByName", "allowMissingColumns"),
)
def rel_union_missing_columns(spark: SparkSession, sf: str) -> DataFrame:
    """unionByName(allowMissingColumns=True): schema-tolerant append — the
    missing column null-fills (the schema-drift pattern for evolving
    pipeline tables)."""
    n = _t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("k"), F.col("n_name").alias("name")
    )
    r = _t(spark, sf, "region").select(
        F.col("r_regionkey").alias("k"),
        F.col("r_name").alias("name"),
        F.lit("region").alias("extra"),
    )
    return n.unionByName(r, allowMissingColumns=True)


# --- pivot / unpivot ----------------------------------------------------------

@register(
    "rel_pivot",
    sql="""
SELECT c_mktsegment,
  CAST(count(*) FILTER (WHERE c_nationkey % 5 = 0) AS BIGINT) AS nk0,
  CAST(count(*) FILTER (WHERE c_nationkey % 5 = 1) AS BIGINT) AS nk1,
  CAST(count(*) FILTER (WHERE c_nationkey % 5 = 2) AS BIGINT) AS nk2,
  CAST(count(*) FILTER (WHERE c_nationkey % 5 = 3) AS BIGINT) AS nk3,
  CAST(count(*) FILTER (WHERE c_nationkey % 5 = 4) AS BIGINT) AS nk4
FROM customer GROUP BY c_mktsegment
""",
    tags=("agg", "pivot"),
)
def rel_pivot(spark: SparkSession, sf: str) -> DataFrame:
    """groupBy().pivot() with explicit pivot values (explicit values keep
    the plan single-pass — no extra distinct-values job)."""
    c = _t(spark, sf, "customer").withColumn(
        "nk_bucket", F.pmod("c_nationkey", F.lit(5))
    )
    p = (
        c.groupBy("c_mktsegment")
        .pivot("nk_bucket", [0, 1, 2, 3, 4])
        .agg(F.count(F.lit(1)))
    )
    renames = [F.col("c_mktsegment")] + [
        F.coalesce(F.col(str(i)), F.lit(0)).alias(f"nk{i}") for i in range(5)
    ]
    return p.select(*renames)


@register(
    "rel_unpivot",
    sql="""
SELECT r_name, metric, val FROM (
  SELECT r_name, CAST(r_regionkey AS BIGINT) AS region_key,
    CAST(length(r_name) AS BIGINT) AS name_len
  FROM region
) UNPIVOT (val FOR metric IN (region_key, name_len))
""",
    tags=("agg", "unpivot", "melt"),
)
def rel_unpivot(spark: SparkSession, sf: str) -> DataFrame:
    """unpivot/melt: wide -> long."""
    r = _t(spark, sf, "region").select(
        "r_name",
        F.col("r_regionkey").cast("bigint").alias("region_key"),
        F.length("r_name").cast("bigint").alias("name_len"),
    )
    return r.unpivot("r_name", ["region_key", "name_len"], "metric", "val")


# --- higher-order array functions ---------------------------------------------

@register(
    "rel_higher_order",
    sql="""
SELECT n_nationkey,
  array_to_string([x * 2 for x in ks], ',') AS doubled,
  array_to_string([x for x in ks if x % 2 = 0], ',') AS evens,
  CAST(len([x for x in ks if x > 10]) > 0 AS BOOLEAN) AS any_gt10,
  CAST(len([x for x in ks if x <= 25]) = len(ks) AS BOOLEAN) AS all_le25,
  list_reduce(ks, (a, b) -> a + b) AS total,
  array_to_string([ks[i] + i for i in generate_series(1, len(ks))], ',') AS idx_shifted
FROM (SELECT n_nationkey, [n_nationkey, n_nationkey + 1, n_nationkey + 2] AS ks FROM nation)
""",
    tags=("scalar", "higher-order"),
)
def rel_higher_order(spark: SparkSession, sf: str) -> DataFrame:
    """transform / filter / exists / forall / aggregate / indexed-lambda —
    the full higher-order function family, JVM-evaluated.

    Array results are serialized to ','-joined strings so the output schema
    is driver-canonicalizer-safe (pandas sort_values chokes on ndarray
    cells); same pattern as rel_map_functions' canon()."""

    def canon(arr_col):
        return F.array_join(F.transform(arr_col, lambda x: x.cast("string")), ",")

    n = _t(spark, sf, "nation").withColumn(
        "ks",
        F.array(
            F.col("n_nationkey"),
            F.col("n_nationkey") + 1,
            F.col("n_nationkey") + 2,
        ),
    )
    return n.select(
        "n_nationkey",
        canon(F.transform("ks", lambda x: x * 2)).alias("doubled"),
        canon(F.filter("ks", lambda x: x % 2 == 0)).alias("evens"),
        F.exists("ks", lambda x: x > 10).alias("any_gt10"),
        F.forall("ks", lambda x: x <= 25).alias("all_le25"),
        F.aggregate("ks", F.lit(0).cast("bigint"), lambda a, b: a + b).alias("total"),
        canon(F.transform("ks", lambda x, i: x + i + 1)).alias("idx_shifted"),
    )


# --- exact percentiles --------------------------------------------------------

@register(
    "rel_percentile",
    sql="""
SELECT l_returnflag,
  round(quantile_cont(l_quantity, 0.5), 4) AS p50,
  round(quantile_cont(l_quantity, 0.9), 4) AS p90,
  round(quantile_cont(l_extendedprice, 0.99), 4) AS price_p99
FROM lineitem GROUP BY l_returnflag
""",
    tags=("agg", "percentile"),
)
def rel_percentile(spark: SparkSession, sf: str) -> DataFrame:
    """Exact continuous percentiles (Spark `percentile` == DuckDB
    quantile_cont: linear interpolation)."""
    li = _t(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(l_quantity, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(l_extendedprice, 0.99)"), 4).alias("price_p99"),
    )


# --- subqueries ---------------------------------------------------------------

@register(
    "rel_scalar_subquery",
    sql="""
SELECT c_custkey, round(c_acctbal, 2) AS bal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) * 1.8 FROM customer)
""",
    tags=("subquery", "scalar"),
)
def rel_scalar_subquery(spark: SparkSession, sf: str) -> DataFrame:
    """Uncorrelated scalar subquery in a filter (planner evaluates the
    subquery once and broadcasts the scalar)."""
    c = _t(spark, sf, "customer")
    c.createOrReplaceTempView("rel_sq_customer")
    return spark.sql(
        """
        SELECT c_custkey, round(c_acctbal, 2) AS bal
        FROM rel_sq_customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) * 1.8 FROM rel_sq_customer)
        """
    )


@register(
    "rel_correlated_exists",
    sql="""
SELECT s_suppkey, s_name FROM supplier s
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 49
)
""",
    tags=("subquery", "correlated-exists"),
)
def rel_correlated_exists(spark: SparkSession, sf: str) -> DataFrame:
    """Correlated EXISTS — planned as a left-semi join."""
    s = _t(spark, sf, "supplier")
    li = _t(spark, sf, "lineitem")
    s.createOrReplaceTempView("rel_ce_supplier")
    li.createOrReplaceTempView("rel_ce_lineitem")
    return spark.sql(
        """
        SELECT s_suppkey, s_name FROM rel_ce_supplier s
        WHERE EXISTS (
          SELECT 1 FROM rel_ce_lineitem l
          WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 49
        )
        """
    )


# --- null semantics -----------------------------------------------------------

@register(
    "rel_null_semantics",
    sql="""
WITH t AS (
  SELECT o_orderkey,
    CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderpriority END AS clerk,
    CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE round(o_totalprice, 2) END AS price
  FROM orders WHERE o_orderkey <= 2000
)
SELECT o_orderkey, coalesce(clerk, 'NO-CLERK') AS clerk_filled,
  coalesce(price, 0.0) AS price_filled,
  CAST(clerk IS NOT DISTINCT FROM NULL AS BOOLEAN) AS clerk_is_null,
  CAST(clerk IS NOT DISTINCT FROM '1-URGENT' AS BOOLEAN) AS is_clerk1
FROM t
""",
    tags=("scalar", "null-semantics", "eqNullSafe"),
)
def rel_null_semantics(spark: SparkSession, sf: str) -> DataFrame:
    """NULL handling: na.fill and null-safe equality (<=>)."""
    o = _t(spark, sf, "orders").filter(F.col("o_orderkey") <= 2000)
    t = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, None)
        .otherwise(F.col("o_orderpriority"))
        .alias("clerk"),
        F.when(F.col("o_orderkey") % 5 == 0, None)
        .otherwise(F.round("o_totalprice", 2))
        .alias("price"),
    )
    flagged = t.withColumn(
        "clerk_is_null", F.col("clerk").eqNullSafe(F.lit(None))
    ).withColumn("is_clerk1", F.col("clerk").eqNullSafe(F.lit("1-URGENT")))
    filled = flagged.na.fill({"clerk": "NO-CLERK", "price": 0.0})
    return filled.select(
        "o_orderkey",
        F.col("clerk").alias("clerk_filled"),
        F.col("price").alias("price_filled"),
        "clerk_is_null",
        "is_clerk1",
    )


@register(
    "rel_window_ignore_nulls",
    sql="""
SELECT o_orderkey,
  last_value(gap_price IGNORE NULLS) OVER (
    PARTITION BY o_custkey ORDER BY o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS last_seen_price
FROM (
  SELECT o_orderkey, o_custkey,
    CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE round(o_totalprice, 2) END AS gap_price
  FROM orders WHERE o_orderkey <= 2000
)
""",
    tags=("window", "ignore-nulls"),
)
def rel_window_ignore_nulls(spark: SparkSession, sf: str) -> DataFrame:
    """last_value(..., ignoreNulls) — gap-fill forward (the sensor/event
    carry-forward pattern)."""
    o = _t(spark, sf, "orders").filter(F.col("o_orderkey") <= 2000)
    t = o.select(
        "o_orderkey",
        "o_custkey",
        F.when(F.col("o_orderkey") % 3 == 0, None)
        .otherwise(F.round("o_totalprice", 2))
        .alias("gap_price"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return t.select(
        "o_orderkey",
        F.last("gap_price", ignorenulls=True).over(w).alias("last_seen_price"),
    )


# --- map higher-order functions -----------------------------------------------

@register(
    "rel_map_functions",
    sql="""
SELECT n_nationkey,
  'len:' || CAST(n_nationkey * 2 AS VARCHAR) || ',reg:' || CAST(n_regionkey * 2 AS VARCHAR) AS doubled_entries,
  CASE WHEN n_nationkey % 2 = 0 THEN 'len:' || CAST(n_nationkey AS VARCHAR) ELSE '' END AS even_entries,
  CAST(n_nationkey + n_regionkey AS BIGINT) AS zipped_sum
FROM nation
""",
    tags=("scalar", "map-higher-order"),
)
def rel_map_functions(spark: SparkSession, sf: str) -> DataFrame:
    """transform_values / map_filter / map_zip_with over a constructed map,
    canonicalized to sorted entry strings for the oracle."""
    n = _t(spark, sf, "nation").withColumn(
        "m",
        F.create_map(
            F.lit("len"), F.col("n_nationkey").cast("bigint"),
            F.lit("reg"), F.col("n_regionkey").cast("bigint"),
        ),
    )
    doubled = F.transform_values("m", lambda k, v: v * 2)
    evens = F.map_filter(
        "m", lambda k, v: (k == "len") & (F.col("n_nationkey") % 2 == 0)
    )
    zipped = F.map_zip_with(
        "m",
        F.create_map(
            F.lit("len"), F.col("n_regionkey").cast("bigint"),
            F.lit("reg"), F.col("n_nationkey").cast("bigint"),
        ),
        lambda k, v1, v2: v1 + v2,
    )

    def canon(col):
        return F.array_join(
            F.array_sort(
                F.transform(
                    F.map_entries(col),
                    lambda e: F.concat(e["key"], F.lit(":"), e["value"].cast("string")),
                )
            ),
            ",",
        )

    return n.select(
        "n_nationkey",
        canon(doubled).alias("doubled_entries"),
        canon(evens).alias("even_entries"),
        F.element_at(zipped, F.lit("len")).alias("zipped_sum"),
    )


@register(
    "rel_explode_outer",
    sql="""
SELECT n_nationkey, t.part
FROM (
  SELECT n_nationkey,
    CASE WHEN n_nationkey % 6 = 0 THEN []::VARCHAR[]
         ELSE str_split(n_name, 'A') END AS parts
  FROM nation
) n
LEFT JOIN LATERAL (SELECT unnest(n.parts) AS part) t ON TRUE
""",
    tags=("scalar", "explode-outer"),
)
def rel_explode_outer(spark: SparkSession, sf: str) -> DataFrame:
    """explode_outer: rows with empty arrays survive with NULL (plain
    explode would drop them — the row-preserving flatten)."""
    n = _t(spark, sf, "nation").select(
        "n_nationkey",
        F.when(F.col("n_nationkey") % 6 == 0, F.array().cast("array<string>"))
        .otherwise(F.split("n_name", "A"))
        .alias("parts"),
    )
    return n.select("n_nationkey", F.explode_outer("parts").alias("part"))


@register(
    "rel_json_roundtrip",
    sql="""
SELECT event_id,
  CAST(props::JSON ->> 'k' AS BIGINT) AS k_parsed,
  '{"id":' || CAST(event_id AS VARCHAR) || ',"k":' || (props::JSON ->> 'k') || '}' AS rebuilt
FROM events WHERE props IS NOT NULL AND event_id <= 500
""",
    tags=("scalar", "json", "from_json", "to_json"),
)
def rel_json_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """from_json (typed parse) + to_json (re-serialize): the structured
    JSON column path, not just string extraction."""
    e = _t(spark, sf, "events").filter(
        F.col("props").isNotNull() & (F.col("event_id") <= 500)
    )
    parsed = e.select(
        "event_id", F.from_json("props", "k bigint").alias("p")
    )
    return parsed.select(
        "event_id",
        F.col("p.k").alias("k_parsed"),
        F.to_json(
            F.struct(F.col("event_id").alias("id"), F.col("p.k").alias("k"))
        ).alias("rebuilt"),
    )


@register(
    "rel_asof_join",
    sql="""
WITH clicks AS (SELECT * FROM events WHERE event_type = 'click'),
views AS (
  SELECT user_id, ts, value, event_id FROM events WHERE event_type = 'view'
  QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1
)
SELECT c.event_id, c.user_id,
  strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
  strftime(v.ts, '%Y-%m-%d %H:%M:%S') AS view_ts,
  v.value AS view_value
FROM clicks c ASOF LEFT JOIN views v
  ON c.user_id = v.user_id AND v.ts <= c.ts
""",
    tags=("join", "asof"),
)
def rel_asof_join(spark: SparkSession, sf: str) -> DataFrame:
    """As-of (point-in-time) join — each click gets the user's most recent
    view at-or-before it.  Spark has no ASOF JOIN and the range-join
    encoding is BroadcastNestedLoopJoin (quadratic); operators/asof.py
    implements the scalable union + tagged-sort + running-last formulation:
    ONE hash shuffle on user_id, sort-merge asymptotics, no pair explosion
    (plan-asserted in tests/test_plans.py).  Oracle: DuckDB native
    ASOF LEFT JOIN."""
    from knowledgebot_spark.operators.asof import asof_join
    from pyspark.sql import Window as W

    e = _t(spark, sf, "events")
    clicks = e.filter(F.col("event_type") == "click")
    views = (
        e.filter(F.col("event_type") == "view")
        .withColumn(
            "_rn",
            F.row_number().over(
                W.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
            ),
        )
        .filter(F.col("_rn") == 1)
        .select("user_id", "ts", "value")
    )
    joined = asof_join(clicks, views, on="user_id", ts_col="ts", right_cols=("value",))
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.date_format("asof_ts", "yyyy-MM-dd HH:mm:ss").alias("view_ts"),
        F.col("asof_value").alias("view_value"),
    )


@register(
    "rel_merge_upsert",
    sql="""
WITH src AS (
  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
         o_totalprice + 1000.0 AS o_totalprice, o_orderdate, o_orderpriority,
         (o_orderkey % 13 = 0) AS is_delete
  FROM orders WHERE o_orderkey % 7 = 0
  UNION ALL
  SELECT o_orderkey + 10000000, o_custkey, 'N', 100.0, o_orderdate,
         o_orderpriority, false
  FROM orders WHERE o_orderkey % 97 = 0
), merged AS (
  SELECT
    CASE WHEN s.is_delete IS NOT NULL THEN s.o_orderstatus
         ELSE t.o_orderstatus END AS o_orderstatus,
    CASE WHEN s.is_delete IS NOT NULL THEN s.o_totalprice
         ELSE t.o_totalprice END AS o_totalprice
  FROM orders t FULL JOIN src s ON t.o_orderkey = s.o_orderkey
  WHERE NOT COALESCE(s.is_delete, false)
)
SELECT o_orderstatus,
  CAST(count(*) AS BIGINT) AS n_orders,
  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
FROM merged GROUP BY o_orderstatus
""",
    tags=("merge", "upsert", "join"),
)
def rel_merge_upsert(spark: SparkSession, sf: str) -> DataFrame:
    """ANSI MERGE INTO semantics (WHEN MATCHED UPDATE / WHEN MATCHED AND
    is_delete DELETE / WHEN NOT MATCHED INSERT) via operators/merge.py —
    the relational twin of the keyed sink's delete-then-rewrite
    (KnowledgeBot.py:351-379,483-485).  Amendments derive deterministically
    from orders: every 7th key updated (+1000.00), every 13th-of-those
    deleted, every 97th key re-inserted under a disjoint key range.  One
    full-outer equi-join on the merge key (single hash shuffle per side,
    no nested loops — plan-asserted); output is the post-merge status
    summary in exact integer cents (half-up, identical on both engines)."""
    from knowledgebot_spark.operators.merge import merge_upsert

    o = _t(spark, sf, "orders")
    upd = (
        o.filter(F.col("o_orderkey") % 7 == 0)
        .withColumn("o_orderstatus", F.lit("U"))
        .withColumn("o_totalprice", F.col("o_totalprice") + F.lit(1000.0))
        .withColumn("is_delete", F.col("o_orderkey") % 13 == 0)
    )
    ins = (
        o.filter(F.col("o_orderkey") % 97 == 0)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.lit(10000000))
        .withColumn("o_orderstatus", F.lit("N"))
        .withColumn("o_totalprice", F.lit(100.0))
        .withColumn("is_delete", F.lit(False))
    )
    merged = merge_upsert(
        o, upd.unionByName(ins), keys=["o_orderkey"], delete_col="is_delete"
    )
    return merged.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")).alias(
            "cents"
        ),
    )


@register(
    "rel_join_interval_binned",
    sql="""
SELECT s.s_suppkey,
  CAST(count(*) AS BIGINT) AS n_in_band,
  CAST(sum(CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
FROM supplier s JOIN customer c
  ON c.c_acctbal >= s.s_acctbal AND c.c_acctbal < s.s_acctbal + 500.0
GROUP BY s.s_suppkey
""",
    tags=("join", "range", "binned"),
)
def rel_join_interval_binned(spark: SparkSession, sf: str) -> DataFrame:
    """Point-in-interval range join via operators/rangejoin.py binning —
    the BOTH-SIDES-LARGE scale path rel_join_range (broadcast BNLJ) cannot
    take: intervals explode over overlapping fixed-width bins, points
    equi-join on the bin id (one hash shuffle per side, sort-merge
    asymptotics), exact [lo, hi) refine after.  Plan-asserted to contain
    no nested-loop/cartesian join.  Oracle: the same BETWEEN predicate
    joined directly in DuckDB."""
    from knowledgebot_spark.operators.rangejoin import bin_interval_join

    s = _t(spark, sf, "supplier").select(
        "s_suppkey",
        F.col("s_acctbal").alias("lo"),
        (F.col("s_acctbal") + F.lit(500.0)).alias("hi"),
    )
    c = _t(spark, sf, "customer").select("c_custkey", "c_acctbal")
    joined = bin_interval_join(
        c, s, point_col="c_acctbal", lo_col="lo", hi_col="hi", bin_width=500.0
    )
    return joined.groupBy("s_suppkey").agg(
        F.count("*").alias("n_in_band"),
        F.sum(F.floor(F.col("c_acctbal") * 100 + 0.5).cast("bigint")).alias(
            "cents"
        ),
    )


# --- statistical aggregates ---------------------------------------------------

@register(
    "rel_stats_agg",
    sql="""
SELECT l_returnflag,
  round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
  round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qp,
  round(covar_pop(l_quantity, l_extendedprice), 2) AS covar_qp_pop,
  round(stddev_samp(l_extendedprice), 2) AS sd_price,
  round(var_pop(l_discount), 6) AS var_disc,
  round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
  round(regr_intercept(l_extendedprice, l_quantity), 2) AS intercept,
  round(regr_r2(l_extendedprice, l_quantity), 6) AS r2
FROM lineitem GROUP BY l_returnflag
""",
    tags=("agg", "stats"),
)
def rel_stats_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Statistical aggregate family: corr / covariance / stddev / variance
    plus the regr_* linear-regression aggregates — all single-pass
    partial+final hash aggs (each is a moments computation Catalyst folds
    into one Aggregate; no second scan, no window).  Spark's skewness /
    kurtosis are deliberately absent: their population-moment definitions
    differ from DuckDB's sample-corrected estimators, so they cannot share
    one oracle text (documented deviation)."""
    li = _t(spark, sf, "lineitem")
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr(q, p), 6).alias("corr_qty_price"),
        F.round(F.covar_samp(q, p), 2).alias("covar_qp"),
        F.round(F.covar_pop(q, p), 2).alias("covar_qp_pop"),
        F.round(F.stddev_samp(p), 2).alias("sd_price"),
        F.round(F.var_pop("l_discount"), 6).alias("var_disc"),
        F.round(F.regr_slope(p, q), 4).alias("slope"),
        F.round(F.regr_intercept(p, q), 2).alias("intercept"),
        F.round(F.regr_r2(p, q), 6).alias("r2"),
    )


# --- deterministic hash functions --------------------------------------------

@register(
    "rel_hash_functions",
    sql="""
SELECT p_partkey,
  md5(p_name) AS md5_name,
  sha256(p_name) AS sha_name,
  CAST(length(p_name) AS BIGINT) AS name_len
FROM part
""",
    tags=("scalar", "hash"),
)
def rel_hash_functions(spark: SparkSession, sf: str) -> DataFrame:
    """Cryptographic digest functions (md5 / sha2-256) — cross-engine
    bit-exact over UTF-8 input, JVM-evaluated inside whole-stage codegen.
    These are the primitives the dedup family builds on (content keys in
    llm_dedup_exact, shingle hashing in MinHash): this query pins their
    cross-engine stability standalone.  Scan prunes to p_partkey, p_name
    only."""
    return _t(spark, sf, "part").select(
        "p_partkey",
        F.md5("p_name").alias("md5_name"),
        F.sha2(F.col("p_name"), 256).alias("sha_name"),
        F.length("p_name").cast("long").alias("name_len"),
    )


# --- ordered string aggregation (listagg) ------------------------------------

@register(
    "rel_listagg",
    sql="""
SELECT n_regionkey,
  string_agg(n_name, ', ' ORDER BY n_name) AS names,
  CAST(count(*) AS BIGINT) AS n
FROM nation GROUP BY n_regionkey
""",
    tags=("agg", "listagg"),
)
def rel_listagg(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered string aggregation: Spark 4 ``listagg(...) WITHIN GROUP
    (ORDER BY ...)`` vs DuckDB ``string_agg(... ORDER BY ...)``.  The
    in-agg ORDER BY makes the result deterministic under any partitioning
    (shuffle order never leaks into the output) — same discipline as the
    sorted collect_list in A1/J2."""
    return _t(spark, sf, "nation").groupBy("n_regionkey").agg(
        F.expr("listagg(n_name, ', ') WITHIN GROUP (ORDER BY n_name)").alias(
            "names"
        ),
        F.count("*").alias("n"),
    )


# --- lateral join (correlated per-row subquery) ------------------------------

@register(
    "rel_lateral_join",
    sql="""
SELECT n.n_nationkey, l.c_custkey, l.c_acctbal
FROM nation n, LATERAL (
  SELECT c_custkey, c_acctbal FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_custkey LIMIT 3
) l
""",
    tags=("join", "lateral"),
)
def rel_lateral_join(spark: SparkSession, sf: str) -> DataFrame:
    """LATERAL correlated subquery with per-row ORDER BY + LIMIT (top-3
    customers per nation).  Catalyst decorrelates this into a windowed
    rank over the customer side — one shuffle on c_nationkey, never a
    per-outer-row rescan — which is exactly the plan you'd hand-write at
    100 TB; the declarative LATERAL form just proves the surface."""
    _t(spark, sf, "nation").createOrReplaceTempView("rel_lat_nation")
    _t(spark, sf, "customer").createOrReplaceTempView("rel_lat_customer")
    return spark.sql("""
SELECT n.n_nationkey, l.c_custkey, l.c_acctbal
FROM rel_lat_nation n, LATERAL (
  SELECT c_custkey, c_acctbal FROM rel_lat_customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_custkey LIMIT 3
) l
""")


# --- recursive CTE ------------------------------------------------------------

@register(
    "rel_recursive_cte",
    sql="""
WITH RECURSIVE chain(rk, nk, depth) AS (
  SELECT n_regionkey, min(n_nationkey), 1 FROM nation GROUP BY n_regionkey
  UNION ALL
  SELECT c.rk,
         (SELECT min(n_nationkey) FROM nation n
          WHERE n.n_regionkey = c.rk AND n.n_nationkey > c.nk),
         c.depth + 1
  FROM chain c
  WHERE EXISTS (SELECT 1 FROM nation n
                WHERE n.n_regionkey = c.rk AND n.n_nationkey > c.nk)
)
SELECT rk AS n_regionkey,
  CAST(max(depth) AS BIGINT) AS chain_len,
  CAST(max(nk) AS BIGINT) AS last_key
FROM chain GROUP BY rk
""",
    tags=("recursive", "cte"),
)
def rel_recursive_cte(spark: SparkSession, sf: str) -> DataFrame:
    """WITH RECURSIVE (Spark 4 recursive CTEs): iterative linked-list walk
    over each region's nation keys — the anchor seeds min(n_nationkey) per
    region, each step advances to the next-larger key, and the final agg
    reports chain length (= nations per region) and the last key reached.
    Exercises a genuinely iterative plan (UnionLoop) the relational
    surface otherwise never touches; both engines run the identical query
    text.  Bounded: iteration count = max group size, and each step is a
    broadcast-size frontier (one row per region)."""
    _t(spark, sf, "nation").createOrReplaceTempView("nation_rec")
    return spark.sql("""
WITH RECURSIVE chain(rk, nk, depth) AS (
  SELECT n_regionkey, min(n_nationkey), 1 FROM nation_rec GROUP BY n_regionkey
  UNION ALL
  SELECT c.rk,
         (SELECT min(n_nationkey) FROM nation_rec n
          WHERE n.n_regionkey = c.rk AND n.n_nationkey > c.nk),
         c.depth + 1
  FROM chain c
  WHERE EXISTS (SELECT 1 FROM nation_rec n
                WHERE n.n_regionkey = c.rk AND n.n_nationkey > c.nk)
)
SELECT rk AS n_regionkey,
  CAST(max(depth) AS BIGINT) AS chain_len,
  CAST(max(nk) AS BIGINT) AS last_key
FROM chain GROUP BY rk
""")


# --- date/interval arithmetic -------------------------------------------------

@register(
    "rel_interval_arith",
    sql="""
SELECT o_orderkey,
  strftime(CAST(o_orderdate AS DATE) + INTERVAL 90 DAY, '%Y-%m-%d') AS plus90,
  strftime(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH, '%Y-%m-%d') AS plus2m,
  strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
  CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
  CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
  CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-01') AS BIGINT)
    AS age_days
FROM orders
""",
    tags=("scalar", "date", "interval"),
)
def rel_interval_arith(spark: SparkSession, sf: str) -> DataFrame:
    """Date/interval arithmetic family: day and calendar-month addition
    (month-end clamping semantics agree across engines: Jan 31 + 1 month =
    Feb 29), last_day / trunc-to-month, quarter, day-of-week (Spark is
    1=Sunday, DuckDB 0=Sunday — oracle shifts by +1), and day diffs
    against a fixed horizon.  All JVM built-ins in one codegen stage; the
    scan prunes to (o_orderkey, o_orderdate)."""
    d = F.to_date("o_orderdate")
    iso = "yyyy-MM-dd"
    return _t(spark, sf, "orders").select(
        "o_orderkey",
        F.date_format(F.date_add(d, 90), iso).alias("plus90"),
        F.date_format(F.add_months(d, 2), iso).alias("plus2m"),
        F.date_format(F.last_day(d), iso).alias("month_end"),
        F.date_format(F.trunc(d, "month"), iso).alias("month_start"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
        F.dayofweek("o_orderdate").cast("long").alias("dow"),
        F.datediff(F.lit("1998-12-01").cast("date"), d).cast("long").alias(
            "age_days"
        ),
    )


# --- cascaded time-bucket rollup (hypertable pattern) -------------------------

@register(
    "rel_events_rollup_cascade",
    sql="""
WITH mn AS (
  SELECT date_trunc('minute', ts) AS m, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1
), hr AS (
  SELECT date_trunc('hour', m) AS h, CAST(sum(n) AS BIGINT) AS n,
    CAST(sum(cents) AS BIGINT) AS cents
  FROM mn GROUP BY 1
), dy AS (
  SELECT date_trunc('day', h) AS d, CAST(sum(n) AS BIGINT) AS n,
    CAST(sum(cents) AS BIGINT) AS cents
  FROM hr GROUP BY 1
)
SELECT 'minute' AS grain, strftime(m, '%Y-%m-%d %H:%M:%S') AS bucket, n, cents FROM mn
UNION ALL
SELECT 'hour' AS grain, strftime(h, '%Y-%m-%d %H:%M:%S') AS bucket, n, cents FROM hr
UNION ALL
SELECT 'day' AS grain, strftime(d, '%Y-%m-%d %H:%M:%S') AS bucket, n, cents FROM dy
""",
    tags=("agg", "rollup", "time-series"),
)
def rel_events_rollup_cascade(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-resolution time rollup built as a CASCADE: the hour aggregate
    re-aggregates the minute aggregate and the day re-aggregates the hour —
    never re-scanning the fact table (the hypertable / continuous-aggregate
    pattern).  At 100 TB this is the difference between one fact scan and
    three: coarser grains read ~1/60th the rows of the grain below, and the
    measures (counts, integer cents) are associative so partial
    re-aggregation is exact.  One shuffle per grain, each over an
    already-reduced input."""
    ev = _t(spark, sf, "events").select(
        F.date_trunc("minute", "ts").alias("m"),
        F.floor(F.col("value") * 100).cast("bigint").alias("c"),
    )
    fmt = lambda c: F.date_format(c, "yyyy-MM-dd HH:mm:ss")  # noqa: E731
    minute = ev.groupBy("m").agg(
        F.count("*").alias("n"), F.sum("c").alias("cents")
    )
    hour = minute.groupBy(F.date_trunc("hour", "m").alias("h")).agg(
        F.sum("n").alias("n"), F.sum("cents").alias("cents")
    )
    day = hour.groupBy(F.date_trunc("day", "h").alias("d")).agg(
        F.sum("n").alias("n"), F.sum("cents").alias("cents")
    )
    return (
        minute.select(
            F.lit("minute").alias("grain"), fmt("m").alias("bucket"), "n", "cents"
        )
        .unionAll(
            hour.select(
                F.lit("hour").alias("grain"), fmt("h").alias("bucket"), "n", "cents"
            )
        )
        .unionAll(
            day.select(
                F.lit("day").alias("grain"), fmt("d").alias("bucket"), "n", "cents"
            )
        )
    )


# --- approximate percentile (tolerance-gated) ---------------------------------

@register(
    "rel_approx_percentile",
    sql="""
SELECT l_returnflag,
  round(quantile_cont(l_extendedprice, 0.5), 4) AS exact_p50,
  round(quantile_cont(l_extendedprice, 0.95), 4) AS exact_p95,
  TRUE AS p50_within_1pct,
  TRUE AS p95_within_1pct
FROM lineitem GROUP BY l_returnflag
""",
    tags=("agg", "approx", "percentile"),
)
def rel_approx_percentile(spark: SparkSession, sf: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna sketch, accuracy 10000) gated
    the same way as rel_approx_distinct: the query emits the exact
    percentiles plus in-query booleans asserting the sketch lands within
    1% of them, so estimator drift FAILS the hash gate instead of hiding
    behind a rows-only check.  The sketch is the 100 TB path (mergeable,
    single-pass, bounded memory); the exact percentile is the oracle
    anchor."""
    li = _t(spark, sf, "lineitem")
    gate = (
        "abs(approx_percentile(l_extendedprice, {p}, 10000) - "
        "percentile(l_extendedprice, {p})) <= "
        "0.01 * abs(percentile(l_extendedprice, {p}))"
    )
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("exact_p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.95)"), 4).alias("exact_p95"),
        F.expr(gate.format(p="0.5")).alias("p50_within_1pct"),
        F.expr(gate.format(p="0.95")).alias("p95_within_1pct"),
    )


# --- arg-min/max aggregates ---------------------------------------------------

@register(
    "rel_arg_minmax",
    sql="""
SELECT c_mktsegment,
  max_by(c_name, c_custkey) AS newest_name,
  min_by(c_name, c_custkey) AS oldest_name,
  CAST(max(c_custkey) AS BIGINT) AS max_key,
  CAST(min(c_custkey) AS BIGINT) AS min_key
FROM customer GROUP BY c_mktsegment
""",
    tags=("agg", "arg-minmax"),
)
def rel_arg_minmax(spark: SparkSession, sf: str) -> DataFrame:
    """max_by / min_by (argmax/argmin) aggregates — fetch the row attribute
    at the extremum WITHOUT a self-join or window: single-pass hash agg
    carrying (value, arg) pairs, partial+final mergeable.  At 100 TB this
    replaces the classic "join back on the max" double-scan.  The ordering
    key is c_custkey (unique), so the argmax is deterministic on both
    engines."""
    c = _t(spark, sf, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.max_by("c_name", "c_custkey").alias("newest_name"),
        F.min_by("c_name", "c_custkey").alias("oldest_name"),
        F.max("c_custkey").alias("max_key"),
        F.min("c_custkey").alias("min_key"),
    )


# --- conditional + bitmap aggregates ------------------------------------------

@register(
    "rel_conditional_agg",
    sql="""
SELECT c_mktsegment,
  CAST(count_if(c_acctbal > 5000) AS BIGINT) AS n_high_bal,
  bool_and(c_acctbal >= 0) AS all_nonneg,
  bool_or(c_acctbal > 9900) AS any_near_cap,
  CAST(bit_or(1 << CAST(c_nationkey % 16 AS INTEGER)) AS BIGINT) AS nation_bitmap,
  CAST(bit_xor(CAST(c_custkey AS BIGINT)) AS BIGINT) AS key_parity
FROM customer GROUP BY c_mktsegment
""",
    tags=("agg", "conditional", "bitmap"),
)
def rel_conditional_agg(spark: SparkSession, sf: str) -> DataFrame:
    """count_if / bool_and / bool_or plus BITMAP aggregation: bit_or over a
    one-hot nation mask builds a 16-bit membership bitmap per segment in one
    pass — the poor-man's roaring bitmap, the standard trick for distinct-
    membership rollups at 100 TB (a bitmap OR is mergeable and fixed-width,
    where collect_set would balloon).  bit_xor gives an order-insensitive
    parity check usable as a cheap content checksum."""
    c = _t(spark, sf, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.expr("count_if(c_acctbal > 5000)").alias("n_high_bal"),
        F.expr("bool_and(c_acctbal >= 0)").alias("all_nonneg"),
        F.expr("bool_or(c_acctbal > 9900)").alias("any_near_cap"),
        F.expr(
            "bit_or(shiftleft(1, CAST(c_nationkey % 16 AS INT)))"
        ).cast("bigint").alias("nation_bitmap"),
        F.expr("bit_xor(CAST(c_custkey AS BIGINT))").alias("key_parity"),
    )


# --- regexp function family ---------------------------------------------------

@register(
    "rel_regexp_family",
    sql="""
SELECT c_custkey,
  CAST(regexp_extract(c_name, '#([0-9]+)', 1) AS BIGINT) AS name_id,
  regexp_replace(c_name, '[0-9]', '#', 'g') AS masked,
  CAST(len(regexp_extract_all(c_name, '0+')) AS INTEGER) AS n_zero_runs,
  regexp_matches(c_name, '^Customer#[0-9]{9}$') AS well_formed
FROM customer
""",
    tags=("scalar", "regexp"),
)
def rel_regexp_family(spark: SparkSession, sf: str) -> DataFrame:
    """regexp_extract / replace-all / extract_all+count / rlike — the
    regexp scalar family, all JVM-codegen (no Python).  Note the dialect
    seam the oracle encodes: DuckDB regexp_replace needs the explicit 'g'
    flag for replace-all while Spark replaces all matches by default."""
    c = _t(spark, sf, "customer")
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", "#([0-9]+)", 1).cast("bigint").alias("name_id"),
        F.regexp_replace("c_name", "[0-9]", "#").alias("masked"),
        F.size(F.expr("regexp_extract_all(c_name, '0+', 0)")).alias("n_zero_runs"),
        F.col("c_name").rlike("^Customer#[0-9]{9}$").alias("well_formed"),
    )


# --- ordered-set aggregates: median + mode ------------------------------------

@register(
    "rel_mode_median",
    sql="""
SELECT l_returnflag,
  CAST(floor(median(l_extendedprice) * 100) AS BIGINT) AS med_price_cents,
  CAST(floor(median(l_quantity) * 10) AS BIGINT) AS med_qty_deci,
  mode(CASE WHEN l_quantity <= 9 THEN 'low'
            WHEN l_quantity <= 30 THEN 'mid'
            ELSE 'high' END) AS mode_band
FROM lineitem GROUP BY l_returnflag
""",
    tags=("agg", "ordered-set"),
)
def rel_mode_median(spark: SparkSession, sf: str) -> DataFrame:
    """median() and mode() ordered-set aggregates.  mode() runs over a
    3-value quantity band whose construction guarantees a unique winner
    ('mid' spans 21 of the 50 uniform quantity values), because mode ties
    are resolved arbitrarily by both engines and would be
    non-deterministic; a production profiler wanting full tie data uses the
    count-groupBy form instead.  Medians are emitted as floor()ed
    cents/deci-units (not round()) because an even-count median averages two
    values and can land exactly on a .5 rounding tie, which the engines
    resolve differently."""
    li = _t(spark, sf, "lineitem")
    band = (
        F.when(F.col("l_quantity") <= 9, "low")
        .when(F.col("l_quantity") <= 30, "mid")
        .otherwise("high")
    )
    return li.groupBy("l_returnflag").agg(
        F.floor(F.median("l_extendedprice") * 100).cast("long").alias("med_price_cents"),
        F.floor(F.median("l_quantity") * 10).cast("long").alias("med_qty_deci"),
        F.mode(band).alias("mode_band"),
    )


# --- gaps and islands ---------------------------------------------------------

@register(
    "rel_gaps_islands",
    sql="""
WITH days AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d FROM events
), marked AS (
  SELECT user_id, d,
    d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d) AS INTEGER) AS grp
  FROM days
)
SELECT user_id,
  strftime(min(d), '%Y-%m-%d') AS streak_start,
  strftime(max(d), '%Y-%m-%d') AS streak_end,
  CAST(count(*) AS BIGINT) AS streak_days
FROM marked GROUP BY user_id, grp
""",
    tags=("window", "gaps-islands", "time-series"),
)
def rel_gaps_islands(spark: SparkSession, sf: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of consecutive active DAYS per user
    via the date-minus-row_number constant-group trick — one window keyed
    by user (no self-join, no recursive expansion) plus one groupBy, both
    shuffling on user_id only.  This is how you sessionize calendar
    activity at 100 TB: the distinct() first collapses the fact table to
    at most |users|x|days| rows before any window state is built."""
    ev = _t(spark, sf, "events")
    days = ev.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    marked = days.withColumn(
        "grp", F.date_sub("d", F.row_number().over(w))
    )
    return marked.groupBy("user_id", "grp").agg(
        F.date_format(F.min("d"), "yyyy-MM-dd").alias("streak_start"),
        F.date_format(F.max("d"), "yyyy-MM-dd").alias("streak_end"),
        F.count("*").alias("streak_days"),
    ).drop("grp")


# --- TPC-H Q3: shipping priority ----------------------------------------------

@register(
    "rel_shipping_priority",
    sql="""
SELECT l_orderkey,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
  strftime(o_orderdate, '%Y-%m-%d') AS order_date,
  o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < DATE '1995-03-15'
  AND l_shipdate > DATE '1995-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey LIMIT 10
""",
    tags=("join", "topk", "tpch-q3"),
)
def rel_shipping_priority(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q3 shape: segment-filtered customer (broadcast) -> orders
    (date-pruned at the scan) -> lineitem, aggregated per order, top-10 by
    revenue via TakeOrderedAndProject.  Both selective filters sit ON the
    scans (PushedFilters), so the expensive lineitem join only sees
    surviving orders; the customer dim broadcasts.  Deterministic tiebreak
    (revenue DESC, l_orderkey)."""
    c = _t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf, "orders").filter(F.col("o_orderdate") < "1995-03-15")
    li = _t(spark, sf, "lineitem").filter(F.col("l_shipdate") > "1995-03-15")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


# --- skew handling: salted join -----------------------------------------------

@register(
    "rel_salted_join",
    sql="""
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_items,
  CAST(sum(CAST(s_nationkey AS BIGINT)) AS BIGINT) AS nation_sum
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY l_returnflag
""",
    tags=("join", "skew", "salting"),
)
def rel_salted_join(spark: SparkSession, sf: str) -> DataFrame:
    """Manually SALTED join — the skew-join companion to rel_salted_agg.
    The big (fact) side gets a random-free deterministic salt
    (l_orderkey % 8) appended to its join key; the small (dim) side is
    EXPLODED 8x, one replica per salt value, so every (key, salt) pair
    matches exactly once.  A hot l_suppkey's rows now land on 8 reducers
    instead of 1.  Result is provably identical to the unsalted join (the
    oracle runs the plain join); AQE's skewedJoin does this adaptively, the
    manual form is for engines/pipelines where AQE cannot see the skew
    (e.g. pre-partitioned bucketing)."""
    li = _t(spark, sf, "lineitem").select(
        "l_returnflag",
        "l_suppkey",
        F.pmod("l_orderkey", F.lit(8)).alias("salt"),
    )
    s = (
        _t(spark, sf, "supplier")
        .select(F.col("s_suppkey").alias("l_suppkey"), "s_nationkey")
        .withColumn("salt", F.explode(F.expr("sequence(0, 7)")))
    )
    joined = li.join(s, ["l_suppkey", "salt"])
    return joined.groupBy("l_returnflag").agg(
        F.count("*").alias("n_items"),
        F.sum(F.col("s_nationkey").cast("bigint")).alias("nation_sum"),
    )


# --- multi-column distinct aggregation (Expand) -------------------------------

@register(
    "rel_count_distinct_multi",
    sql="""
SELECT o_orderpriority,
  CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
  CAST(count(DISTINCT strftime(o_orderdate, '%Y-%m')) AS BIGINT) AS n_months,
  CAST(count(*) AS BIGINT) AS n_orders
FROM orders GROUP BY o_orderpriority
""",
    tags=("agg", "multi-distinct"),
)
def rel_count_distinct_multi(spark: SparkSession, sf: str) -> DataFrame:
    """Multiple count(DISTINCT ...) over DIFFERENT columns in one
    aggregation — Catalyst plans this with an Expand (one row replica per
    distinct group) feeding a single shuffle, not one job per distinct.
    The month distinct is a derived expression, showing distinct-on-expr.
    At 100 TB you watch the Expand multiplier (here 3x) and switch
    wide multi-distincts to approx_count_distinct (rel_approx_distinct)
    when exactness is negotiable."""
    o = _t(spark, sf, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct(F.date_format("o_orderdate", "yyyy-MM")).alias("n_months"),
        F.count("*").alias("n_orders"),
    )


# --- error-safe (TRY) arithmetic and casts ------------------------------------

@register(
    "rel_try_arith",
    sql="""
SELECT o_orderkey,
  TRY_CAST(substr(o_orderpriority, 1, 1) AS INTEGER) AS prio_num,
  TRY_CAST(o_orderstatus AS INTEGER) AS status_num,
  CAST(floor(o_totalprice * 100 / nullif(o_custkey % 10, 0)) AS BIGINT) AS per_bucket_cents,
  coalesce(TRY_CAST(o_orderstatus AS INTEGER), -1) AS status_or_default
FROM orders
""",
    tags=("scalar", "try", "error-safe"),
)
def rel_try_arith(spark: SparkSession, sf: str) -> DataFrame:
    """Error-safe scalar family: try_cast (malformed input -> NULL, never a
    task failure) and try_divide (div-by-zero -> NULL).  At 100 TB this is
    the difference between a pipeline that survives the one malformed row
    in shard 7,312 and one that dies 6 hours in: wrap the cast, quarantine
    the NULLs.  The oracle encodes the dialect seam — DuckDB spells
    try_divide as x / nullif(y, 0)."""
    o = _t(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.expr("try_cast(substr(o_orderpriority, 1, 1) AS INT)").alias("prio_num"),
        F.expr("try_cast(o_orderstatus AS INT)").alias("status_num"),
        F.floor(
            F.try_divide(F.col("o_totalprice") * 100, F.pmod("o_custkey", F.lit(10)))
        )
        .cast("bigint")
        .alias("per_bucket_cents"),
        F.coalesce(
            F.expr("try_cast(o_orderstatus AS INT)"), F.lit(-1)
        ).alias("status_or_default"),
    )


# --- blocked fuzzy join (entity resolution) -----------------------------------

@register(
    "rel_fuzzy_join",
    sql="""
SELECT a.n_name AS name_a, b.n_name AS name_b,
  CAST(levenshtein(a.n_name, b.n_name) AS INTEGER) AS edit_dist
FROM nation a JOIN nation b
  ON substr(a.n_name, 1, 1) = substr(b.n_name, 1, 1)
 AND a.n_name < b.n_name
WHERE levenshtein(a.n_name, b.n_name) <= 4
""",
    tags=("join", "fuzzy", "entity-resolution"),
)
def rel_fuzzy_join(spark: SparkSession, sf: str) -> DataFrame:
    """Blocked fuzzy matching (entity resolution): candidate pairs come
    from an EQUI-join on a blocking key (first letter), then the expensive
    levenshtein similarity runs only within blocks — never an all-pairs
    cross join (the catalog-wide no-cartesian plan test covers this query
    too).  The a < b predicate halves the pair space and drops self-pairs.
    Production blocking keys are phonetic codes or LSH buckets; the
    structure is identical."""
    n = _t(spark, sf, "nation")
    a = n.select(F.col("n_name").alias("name_a"))
    b = n.select(F.col("n_name").alias("name_b"))
    return (
        a.join(
            b,
            (F.substring("name_a", 1, 1) == F.substring("name_b", 1, 1))
            & (F.col("name_a") < F.col("name_b")),
        )
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("edit_dist") <= 4)
    )


# --- distribution window functions --------------------------------------------

@register(
    "rel_window_distribution",
    sql="""
SELECT p_brand, p_partkey,
  round(percent_rank() OVER w, 6) AS pct_rank,
  round(cume_dist() OVER w, 6) AS cume,
  CAST(row_number() OVER w AS INTEGER) AS rn
FROM part
WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey)
""",
    tags=("window", "distribution"),
)
def rel_window_distribution(spark: SparkSession, sf: str) -> DataFrame:
    """percent_rank / cume_dist distribution window functions — relative
    standing within a partition, the building block for per-group quantile
    flags without a percentile sort.  Order key (price, partkey) is unique
    so ranks are deterministic; both functions are rank-arithmetic over the
    same single window sort."""
    p = _t(spark, sf, "part")
    w = Window.partitionBy("p_brand").orderBy("p_retailprice", "p_partkey")
    return p.select(
        "p_brand",
        "p_partkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.row_number().over(w).alias("rn"),
    )


# --- precise mergeable distinct via bitmaps -----------------------------------

@register(
    "rel_bitmap_distinct",
    sql="""
SELECT o_orderpriority,
  CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers_bitmap,
  CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers_exact
FROM orders GROUP BY o_orderpriority
""",
    tags=("agg", "bitmap", "distinct"),
)
def rel_bitmap_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """PRECISE distinct counting via bitmap aggregates (Spark 3.5 bitmap_*
    family): keys bucket into 32k-bit bitmaps (bitmap_bucket_number /
    bitmap_bit_position), per-bucket bitmaps OR-merge
    (bitmap_construct_agg), and the final count sums per-bucket popcounts.
    Unlike count(DISTINCT) this is fully MERGEABLE fixed-width state —
    partials combine across executors, stages, even incremental runs —
    and unlike HLL (rel_approx_distinct) it is exact.  The query emits the
    bitmap-derived count next to plain count(DISTINCT); the oracle
    asserts they are equal column-for-column."""
    o = _t(spark, sf, "orders")
    per_bucket = o.groupBy(
        "o_orderpriority",
        F.expr("bitmap_bucket_number(o_custkey)").alias("bucket"),
    ).agg(
        F.expr("bitmap_construct_agg(bitmap_bit_position(o_custkey))").alias("bm")
    )
    return (
        per_bucket.groupBy("o_orderpriority")
        .agg(
            F.sum(F.expr("bitmap_count(bm)")).alias("n_customers_bitmap"),
        )
        .join(
            o.groupBy("o_orderpriority").agg(
                F.countDistinct("o_custkey").alias("n_customers_exact")
            ),
            "o_orderpriority",
        )
    )


# --- VARIANT semi-structured type ---------------------------------------------

@register(
    "rel_variant_json",
    sql="""
SELECT event_type,
  CAST(count(*) AS BIGINT) AS n,
  CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
  CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
FROM events GROUP BY event_type
""",
    tags=("scalar", "variant", "semi-structured"),
)
def rel_variant_json(spark: SparkSession, sf: str) -> DataFrame:
    """Semi-structured data through the VARIANT type (Spark 4):
    parse_json once into a binary-encoded variant column, then typed
    variant_get extractions — the schema-on-read path that replaces
    repeated string JSON parsing (parse once, extract many, predicate
    pushdown into the variant's shredded columns on supporting readers).
    The oracle reads the same payloads with DuckDB's JSON extraction."""
    ev = _t(spark, sf, "events").withColumn("v", F.parse_json("props"))
    return (
        ev.select(
            "event_type",
            F.expr("variant_get(v, '$.k', 'bigint')").alias("k"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
    )


# --- data profiling (ANALYZE-style column statistics) ------------------------

_PROFILE_COLS = ("l_quantity", "l_returnflag", "l_shipdate", "l_extendedprice")


@register(
    "rel_profile_table",
    sql="""
SELECT 'l_quantity' AS column_name, count(*) AS n_rows,
  CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
  count(DISTINCT l_quantity) AS n_distinct,
  CAST(min(l_quantity) AS VARCHAR) AS min_value,
  CAST(max(l_quantity) AS VARCHAR) AS max_value
FROM lineitem
UNION ALL
SELECT 'l_returnflag', count(*),
  CAST(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT),
  count(DISTINCT l_returnflag),
  CAST(min(l_returnflag) AS VARCHAR), CAST(max(l_returnflag) AS VARCHAR)
FROM lineitem
UNION ALL
SELECT 'l_shipdate', count(*),
  CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
  count(DISTINCT l_shipdate),
  CAST(min(l_shipdate) AS VARCHAR), CAST(max(l_shipdate) AS VARCHAR)
FROM lineitem
UNION ALL
SELECT 'l_extendedprice', count(*),
  CAST(sum(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
  count(DISTINCT l_extendedprice),
  CAST(min(l_extendedprice) AS VARCHAR), CAST(max(l_extendedprice) AS VARCHAR)
FROM lineitem
""",
    tags=("profiling", "analyze", "multi-distinct"),
)
def rel_profile_table(spark: SparkSession, sf: str) -> DataFrame:
    """ANALYZE-style data profiling: per-column row/null/distinct counts and
    min/max, computed in ONE pass over the fact table (multi-distinct
    rewrites to a single Expand-based aggregate under Catalyst — 4 distinct
    groups share one scan+shuffle, where the naive per-column formulation
    scans 4x), then reshaped to one row per column with stack().  The
    profiling pattern every ingestion pipeline runs for schema-drift and
    null-regression gates."""
    li = _t(spark, sf, "lineitem")
    aggs = [F.count("*").alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs += [
            F.sum(F.isnull(c).cast("long")).alias(f"nulls_{c}"),
            F.count_distinct(F.col(c)).alias(f"nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"max_{c}"),
        ]
    one = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', nulls_{c}, nd_{c}, min_{c}, max_{c}" for c in _PROFILE_COLS
    )
    return one.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
        "(column_name, n_nulls, n_distinct, min_value, max_value)",
        "n_rows",
    ).select(
        "column_name", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value"
    )


# --- mergeable HLL sketches (DataSketches) -----------------------------------

@register(
    "rel_hll_sketch",
    sql="""
SELECT l_returnflag AS grp, count(DISTINCT l_orderkey) AS exact_distinct, true AS within_tol
FROM lineitem GROUP BY l_returnflag
UNION ALL
SELECT 'ALL', count(DISTINCT l_orderkey), true FROM lineitem
""",
    tags=("approx", "hll-sketch", "mergeable"),
)
def rel_hll_sketch(spark: SparkSession, sf: str) -> DataFrame:
    """Mergeable distinct-count sketches (Apache DataSketches HLL): each
    group aggregates to a sketch, and the corpus-wide figure comes from
    hll_union_agg over the PER-GROUP sketches — no second scan of the fact
    table.  Mergeability is the property that matters at 100 TB: partial
    sketches combine across partitions/days/shards without rescanning, the
    same way the map-side partials combine here.  Like rel_approx_distinct,
    the oracle gate is the in-query tolerance boolean (sketch internals are
    not SQL-reproducible; estimates sit well inside 5% at this
    cardinality), alongside the exact distinct count."""
    li = _t(spark, sf, "lineitem")
    per = li.groupBy(F.col("l_returnflag").alias("grp")).agg(
        F.hll_sketch_agg("l_orderkey").alias("sk"),
        F.count_distinct("l_orderkey").alias("exact_distinct"),
    )
    gated = per.select(
        "grp",
        "exact_distinct",
        (
            F.abs(F.hll_sketch_estimate("sk") - F.col("exact_distinct"))
            / F.col("exact_distinct")
            <= 0.05
        ).alias("within_tol"),
    )
    merged = per.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    total_exact = li.agg(F.count_distinct("l_orderkey").alias("exact_distinct"))
    merged_row = merged.crossJoin(F.broadcast(total_exact)).select(
        F.lit("ALL").alias("grp"),
        "exact_distinct",
        (
            F.abs(F.col("est") - F.col("exact_distinct"))
            / F.col("exact_distinct")
            <= 0.05
        ).alias("within_tol"),
    )
    return gated.unionByName(merged_row)


# --- mergeable KLL quantile sketches (DataSketches) ---------------------------

@register(
    "rel_kll_quantiles",
    sql="""
SELECT l_returnflag AS grp,
  round(quantile_cont(l_extendedprice, 0.5), 4) AS exact_median,
  true AS within_tol
FROM lineitem GROUP BY l_returnflag
UNION ALL
SELECT 'ALL', round(quantile_cont(l_extendedprice, 0.5), 4), true FROM lineitem
""",
    tags=("approx", "kll-sketch", "quantiles", "mergeable"),
)
def rel_kll_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    """Mergeable quantile sketches (Apache DataSketches KLL): each group
    aggregates l_extendedprice into a KLL sketch, and the corpus-wide
    median comes from kll_merge_agg over the PER-GROUP sketches — the
    mergeability that lets 100 TB jobs compute daily/shard-level sketches
    once and combine them for any rollup without rescanning (the exact
    `percentile` by contrast buffers all values per group).  The oracle
    gate is rank-based, matching KLL's guarantee (rank error ~1.65% at the
    default k=200): the estimated median must land between the exact 0.45
    and 0.55 quantiles.  Exact medians ride along for the hash check
    (Spark `percentile` == DuckDB `quantile_cont`, linear interpolation)."""
    li = _t(spark, sf, "lineitem")
    band = F.expr("percentile(l_extendedprice, array(0.45, 0.5, 0.55))")
    per = li.groupBy(F.col("l_returnflag").alias("grp")).agg(
        F.kll_sketch_agg_double("l_extendedprice").alias("sk"),
        band.alias("band"),
    )
    in_band = lambda est, b: est.between(  # noqa: E731
        F.element_at(b, 1), F.element_at(b, 3)
    )
    gated = per.select(
        "grp",
        F.round(F.element_at("band", 2), 4).alias("exact_median"),
        in_band(
            F.kll_sketch_get_quantile_double("sk", F.lit(0.5)), F.col("band")
        ).alias("within_tol"),
    )
    merged = per.agg(F.kll_merge_agg_double("sk").alias("mk"))
    total_band = li.agg(band.alias("band"))
    merged_row = merged.crossJoin(F.broadcast(total_band)).select(
        F.lit("ALL").alias("grp"),
        F.round(F.element_at("band", 2), 4).alias("exact_median"),
        in_band(
            F.kll_sketch_get_quantile_double("mk", F.lit(0.5)), F.col("band")
        ).alias("within_tol"),
    )
    return gated.unionByName(merged_row)


# --- theta sketch distinct set operations -------------------------------------

@register(
    "rel_theta_setops",
    sql="""
WITH flags AS (
  SELECT l_orderkey,
    max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS in_r,
    max(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS in_a
  FROM lineitem GROUP BY l_orderkey
)
SELECT op, exact_n, true AS within_tol FROM (
  SELECT 'union' AS op,
    CAST(sum(CASE WHEN in_r = 1 OR in_a = 1 THEN 1 ELSE 0 END) AS BIGINT) AS exact_n,
    1 AS ord
  FROM flags
  UNION ALL
  SELECT 'intersect',
    CAST(sum(CASE WHEN in_r = 1 AND in_a = 1 THEN 1 ELSE 0 END) AS BIGINT), 2
  FROM flags
  UNION ALL
  SELECT 'diff_r_minus_a',
    CAST(sum(CASE WHEN in_r = 1 AND in_a = 0 THEN 1 ELSE 0 END) AS BIGINT), 3
  FROM flags
) ORDER BY ord
""",
    tags=("approx", "theta-sketch", "set-ops", "mergeable"),
)
def rel_theta_setops(spark: SparkSession, sf: str) -> DataFrame:
    """Distinct-set ALGEBRA without materializing the sets (Apache
    DataSketches Theta): ONE scan builds a sketch of the distinct
    l_orderkey values on each side (returned vs accepted lineitems), then
    union/intersection/difference cardinalities come from sketch ops on
    two tiny summaries.  This is the cross-shard overlap-estimation
    pattern for corpus dedup at 100 TB — |A∩B| across snapshots without
    shuffling either side's key set (HLL can union but never intersect;
    theta is the sketch that supports the full algebra).  Gate: each
    estimate within 5% of the exact figure, computed by a groupBy-orderkey
    flags pass that serves as the oracle."""
    li = _t(spark, sf, "lineitem")
    sk = li.agg(
        F.theta_sketch_agg(F.when(F.col("l_returnflag") == "R", F.col("l_orderkey"))).alias("s_r"),
        F.theta_sketch_agg(F.when(F.col("l_returnflag") == "A", F.col("l_orderkey"))).alias("s_a"),
    ).select(
        F.theta_sketch_estimate(F.theta_union("s_r", "s_a")).alias("est_union"),
        F.theta_sketch_estimate(F.theta_intersection("s_r", "s_a")).alias("est_intersect"),
        F.theta_sketch_estimate(F.theta_difference("s_r", "s_a")).alias("est_diff"),
    )
    flags = li.groupBy("l_orderkey").agg(
        F.max((F.col("l_returnflag") == "R").cast("int")).alias("in_r"),
        F.max((F.col("l_returnflag") == "A").cast("int")).alias("in_a"),
    )
    exact = flags.agg(
        F.sum(((F.col("in_r") == 1) | (F.col("in_a") == 1)).cast("long")).alias("x_union"),
        F.sum(((F.col("in_r") == 1) & (F.col("in_a") == 1)).cast("long")).alias("x_intersect"),
        F.sum(((F.col("in_r") == 1) & (F.col("in_a") == 0)).cast("long")).alias("x_diff"),
    )
    both = sk.crossJoin(F.broadcast(exact))
    return both.selectExpr(
        "stack(3, "
        "  'union',          x_union,     abs(est_union - x_union) <= 0.05 * x_union, "
        "  'intersect',      x_intersect, abs(est_intersect - x_intersect) <= 0.05 * x_intersect, "
        "  'diff_r_minus_a', x_diff,      abs(est_diff - x_diff) <= 0.05 * x_diff"
        ") AS (op, exact_n, within_tol)"
    )


# --- ordered event funnel ------------------------------------------------------

@register(
    "rel_funnel_conversion",
    sql="""
WITH s1 AS (
  SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id
)
SELECT (SELECT count(*) FROM s1) AS n_view,
       (SELECT count(*) FROM s2) AS n_view_click,
       (SELECT count(*) FROM s3) AS n_view_click_purchase
""",
    tags=("events", "funnel", "sequence"),
)
def rel_funnel_conversion(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered conversion funnel (view -> click -> purchase, strictly
    increasing timestamps): the canonical behavioral-sequence query.  Each
    stage is a user-keyed hash agg joined to the previous stage's first-hit
    time — every shuffle keyed by user_id, with the event-type predicates
    pushed to each scan (verified: PushedFilters carries the type
    equality) and stage cardinality monotonically shrinking, so later
    stages broadcast against the event scan at any realistic funnel
    selectivity.  No window-over-whole-history sort and no per-user
    collect_list: state per user is one timestamp per stage, which is what
    keeps the shape viable on an unbounded event log at 100 TB."""
    ev = _t(spark, sf, "events")
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    counts = [
        s1.agg(F.count("*").alias("n_view")),
        s2.agg(F.count("*").alias("n_view_click")),
        s3.agg(F.count("*").alias("n_view_click_purchase")),
    ]
    out = counts[0].crossJoin(F.broadcast(counts[1])).crossJoin(
        F.broadcast(counts[2])
    )
    return out


# --- SCD2 validity intervals ---------------------------------------------------

@register(
    "rel_scd2_intervals",
    sql="""
WITH h AS (
  SELECT o_custkey, o_orderdate, o_orderstatus, o_orderkey,
    lead(o_orderdate) OVER w AS next_date,
    row_number() OVER w AS version_no
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
)
SELECT o_custkey, CAST(version_no AS INTEGER) AS version_no, o_orderstatus,
  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS valid_from,
  coalesce(strftime(next_date, '%Y-%m-%d %H:%M:%S'), '9999-12-31 00:00:00')
    AS valid_to,
  next_date IS NULL AS is_current
FROM h
WHERE o_custkey <= 300
""",
    tags=("scd2", "window", "warehouse"),
)
def rel_scd2_intervals(spark: SparkSession, sf: str) -> DataFrame:
    """Slowly-changing-dimension type-2 reconstruction: turn an event-style
    history (orders per customer) into validity intervals — valid_from =
    the change date, valid_to = the NEXT change (open interval sentinel
    9999-12-31 for the current version), version_no = change ordinal.
    One window shuffle keyed by the dimension's natural key; lead() is the
    whole trick, no self-join (the naive FROM h a JOIN h b ON b.date >
    a.date formulation is quadratic per key).  The shape every warehouse
    uses to snapshot mutable entities, and the inverse of the as-of join
    (rel_asof_join probes these intervals)."""
    o = _t(spark, sf, "orders").filter(F.col("o_custkey") <= 300)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    h = o.select(
        "o_custkey",
        "o_orderdate",
        "o_orderstatus",
        F.lead("o_orderdate").over(w).alias("next_date"),
        F.row_number().over(w).cast("int").alias("version_no"),
    )
    fmt = "yyyy-MM-dd HH:mm:ss"
    return h.select(
        "o_custkey",
        "version_no",
        "o_orderstatus",
        F.date_format("o_orderdate", fmt).alias("valid_from"),
        F.coalesce(
            F.date_format("next_date", fmt), F.lit("9999-12-31 00:00:00")
        ).alias("valid_to"),
        F.isnull("next_date").alias("is_current"),
    )


# --- declarative data-quality checks ------------------------------------------

@register(
    "rel_dq_checks",
    sql="""
SELECT 'orders_orderkey_unique' AS check_name,
  CAST((SELECT count(*) - count(DISTINCT o_orderkey) FROM orders) AS BIGINT)
    AS n_violations, 1 AS ord
UNION ALL
SELECT 'orders_custkey_not_null',
  CAST((SELECT count(*) FROM orders WHERE o_custkey IS NULL) AS BIGINT), 2
UNION ALL
SELECT 'orders_customer_ref_integrity',
  CAST((SELECT count(*) FROM orders o LEFT JOIN customer c
        ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL) AS BIGINT), 3
UNION ALL
SELECT 'lineitem_orders_ref_integrity',
  CAST((SELECT count(DISTINCT l_orderkey) FROM lineitem l LEFT JOIN orders o
        ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL) AS BIGINT), 4
UNION ALL
SELECT 'orders_totalprice_positive',
  CAST((SELECT count(*) FROM orders WHERE o_totalprice <= 0) AS BIGINT), 5
ORDER BY ord
""",
    tags=("data-quality", "constraints", "warehouse"),
)
def rel_dq_checks(spark: SparkSession, sf: str) -> DataFrame:
    """Declarative data-quality suite (the Deequ/dbt-test shape): key
    uniqueness, non-null, referential integrity (anti-join), and a value
    constraint — each check reduced to a violation COUNT so the whole
    suite is a handful of aggregates unioned into one tiny report.
    Referential checks are left-anti joins that shuffle only the key
    columns (column pruning reaches the scan); uniqueness is
    count - count_distinct in one pass.  At 100 TB this runs as the
    ingest gate in front of every pipeline here — violations fail the
    run, the report is the evidence."""
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    li = _t(spark, sf, "lineitem")
    uniq = o.agg(
        (F.count("*") - F.count_distinct("o_orderkey")).alias("n")
    ).select(F.lit("orders_orderkey_unique").alias("check_name"), "n",
             F.lit(1).alias("ord"))
    nn = o.filter(F.col("o_custkey").isNull()).agg(
        F.count("*").alias("n")
    ).select(F.lit("orders_custkey_not_null").alias("check_name"), "n",
             F.lit(2).alias("ord"))
    ref_oc = (
        o.select("o_custkey")
        .join(F.broadcast(c.select("c_custkey")),
              F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .agg(F.count("*").alias("n"))
        .select(F.lit("orders_customer_ref_integrity").alias("check_name"),
                "n", F.lit(3).alias("ord"))
    )
    ref_lo = (
        li.select("l_orderkey")
        .distinct()
        .join(o.select("o_orderkey"),
              F.col("l_orderkey") == F.col("o_orderkey"), "left_anti")
        .agg(F.count("*").alias("n"))
        .select(F.lit("lineitem_orders_ref_integrity").alias("check_name"),
                "n", F.lit(4).alias("ord"))
    )
    pos = o.filter(F.col("o_totalprice") <= 0).agg(
        F.count("*").alias("n")
    ).select(F.lit("orders_totalprice_positive").alias("check_name"), "n",
             F.lit(5).alias("ord"))
    out = uniq.unionByName(nn).unionByName(ref_oc).unionByName(ref_lo).unionByName(pos)
    return out.select(
        "check_name", F.col("n").cast("long").alias("n_violations"), "ord"
    ).orderBy("ord")


# --- null-safe equi-join ------------------------------------------------------

@register(
    "rel_null_safe_join",
    sql="""
WITH c AS (
  SELECT nullif(c_custkey % 7, 3) AS k, c_custkey FROM customer
), s AS (
  SELECT nullif(s_suppkey % 7, 3) AS k, s_suppkey FROM supplier
)
SELECT coalesce(CAST(c.k AS VARCHAR), 'NULL') AS join_key,
  CAST(count(*) AS BIGINT) AS n_pairs,
  CAST(count(DISTINCT c.c_custkey) AS BIGINT) AS n_customers,
  CAST(count(DISTINCT s.s_suppkey) AS BIGINT) AS n_suppliers
FROM c JOIN s ON c.k IS NOT DISTINCT FROM s.k
GROUP BY 1
""",
    tags=("join", "null-safe", "eqNullSafe"),
)
def rel_null_safe_join(spark: SparkSession, sf: str) -> DataFrame:
    """NULL-SAFE equi-join (``<=>`` as the JOIN predicate): NULL keys
    match each other instead of silently dropping — the semantics MERGE
    pipelines and SCD lookups need when the business key is nullable
    (plain equality would lose every NULL-keyed row on both sides).
    Spark plans ``<=>`` as a HASHED join key (null-safe equality is still
    an equi-predicate), NOT a nested loop — same shuffle shape as a plain
    join, which is why this is safe at 100 TB where an anti-join +
    union-all workaround would double the shuffles.  NULL keys are
    injected deterministically via nullif (the TPC-H testdata is
    NULL-free); DuckDB's IS NOT DISTINCT FROM states the identical
    semantics."""
    c = _t(spark, sf, "customer").select(
        F.nullif(F.pmod("c_custkey", F.lit(7)), F.lit(3)).alias("ck"), "c_custkey"
    )
    s = _t(spark, sf, "supplier").select(
        F.nullif(F.pmod("s_suppkey", F.lit(7)), F.lit(3)).alias("sk"), "s_suppkey"
    )
    joined = c.join(s, c["ck"].eqNullSafe(s["sk"]))
    return joined.groupBy(
        F.coalesce(F.col("ck").cast("string"), F.lit("NULL")).alias("join_key")
    ).agg(
        F.count("*").alias("n_pairs"),
        F.countDistinct("c_custkey").alias("n_customers"),
        F.countDistinct("s_suppkey").alias("n_suppliers"),
    )


# --- nth_value window ---------------------------------------------------------

@register(
    "rel_window_nth_value",
    sql="""
SELECT o_custkey,
  CAST(o_orderkey AS BIGINT) AS o_orderkey,
  first_value(o_orderkey) OVER w AS first_order,
  nth_value(o_orderkey, 2) OVER w AS second_order,
  nth_value(o_orderkey, 3) OVER w AS third_order
FROM orders
WINDOW w AS (
  PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
)
QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) <= 5
""",
    tags=("window", "nth-value"),
)
def rel_window_nth_value(spark: SparkSession, sf: str) -> DataFrame:
    """nth_value analytics: each of a customer's first five orders sees
    the customer's 1st/2nd/3rd order ids as of that row (running frame —
    NULL until the nth row exists).  The "compare me to the customer's
    early behavior" primitive (first-purchase cohorting, second-order
    conversion).  One window partitioning shared by all four functions,
    running ROWS frame so state is three remembered values."""
    o = _t(spark, sf, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wr = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.first("o_orderkey").over(w).alias("first_order"),
            F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
            F.nth_value("o_orderkey", 3).over(w).alias("third_order"),
            F.row_number().over(wr).alias("rn"),
        )
        .filter(F.col("rn") <= 5)
        .drop("rn")
    )


# --- key-skew diagnosis -------------------------------------------------------

@register(
    "rel_skew_report",
    sql="""
WITH per_key AS (
  SELECT l_orderkey, count(*) AS n FROM lineitem GROUP BY l_orderkey
)
SELECT CAST(count(*) AS BIGINT) AS n_keys,
  CAST(max(n) AS BIGINT) AS max_per_key,
  CAST(min(n) AS BIGINT) AS min_per_key,
  round(avg(n), 4) AS avg_per_key,
  CAST(quantile_disc(n, 0.5) AS BIGINT) AS p50,
  CAST(quantile_disc(n, 0.99) AS BIGINT) AS p99,
  round(sum(CASE WHEN n >= 7 THEN n ELSE 0 END) * 1.0 / sum(n), 4)
    AS heavy_key_row_share
FROM per_key
""",
    tags=("diagnostics", "skew", "agg"),
)
def rel_skew_report(spark: SparkSession, sf: str) -> DataFrame:
    """Join/agg-key skew diagnosis: the distribution of per-key row counts
    (max, quantiles, and the row share held by heavy keys) — the number
    you need BEFORE choosing between a plain shuffle join, salting
    (rel_salted_join), or trusting AQE's skew-join split.  At 100 TB this
    runs as a cheap profiling pass over the prospective key: one
    partial+final count agg, then a second agg over |keys| rows; nothing
    here scales with row width.  percentile_disc (type-preserving, an
    actual observed value) rather than interpolated percentile — a p99
    of 7.5 rows is not actionable."""
    li = _t(spark, sf, "lineitem")
    per_key = li.groupBy("l_orderkey").agg(F.count("*").alias("n"))
    heavy = F.when(F.col("n") >= 7, F.col("n")).otherwise(F.lit(0))
    return per_key.agg(
        F.count("*").alias("n_keys"),
        F.max("n").alias("max_per_key"),
        F.min("n").alias("min_per_key"),
        F.round(F.avg("n"), 4).alias("avg_per_key"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY n)")
        .cast("bigint")
        .alias("p50"),
        F.expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY n)")
        .cast("bigint")
        .alias("p99"),
        F.round(F.sum(heavy) / F.sum("n"), 4).alias("heavy_key_row_share"),
    )


# --- Pareto concentration analysis (wave 4) -----------------------------------

@register(
    "rel_pareto_share",
    sql="""
WITH rev AS (
  SELECT l_partkey,
    CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5)
      AS BIGINT)) AS BIGINT) AS rev_e4
  FROM lineitem GROUP BY l_partkey
), ranked AS (
  SELECT l_partkey, rev_e4,
    row_number() OVER (ORDER BY rev_e4 DESC, l_partkey) AS rank,
    CAST(sum(rev_e4) OVER (ORDER BY rev_e4 DESC, l_partkey
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_e4,
    CAST(sum(rev_e4) OVER () AS BIGINT) AS total_e4
  FROM rev
)
SELECT CAST(rank AS BIGINT) AS rank, l_partkey, rev_e4,
  round(cum_e4 * 1.0 / total_e4, 6) AS cum_share
FROM ranked
WHERE (cum_e4 - rev_e4) * 10 < total_e4 * 8
""",
    tags=("window", "pareto", "concentration"),
)
def rel_pareto_share(spark: SparkSession, sf: str) -> DataFrame:
    """Pareto (80/20) concentration: parts ranked by revenue with
    cumulative share, trimmed to the head that carries the first 80% of
    total revenue — the skew-diagnosis twin of rel_skew_report framed as
    a business question (which SKUs dominate, how concentrated is the
    fact table really).

    Shape: the fact scan collapses to a |parts|-sized aggregate first
    (partkey-keyed shuffle, map-side partial agg); rank, cumulative sum,
    and the grand total then come from the DISTRIBUTED ranking operator
    (operators/ranking.py, one ranged pass — the |parts| relation is
    dim-LIKE at sf0.1 but grows with the catalog, so it never lands on a
    single task either).

    Determinism: per-item revenue quantizes to fixed-point e4 BIGINTs
    before summing (2dp prices x 2dp discounts are exact at 4dp), so the
    ranking keys, the cumulative sum, and the 80% cut — rewritten as the
    integer comparison (cum - rev) * 10 < total * 8 — are all exact
    integer math; a float formulation flipped round(x, 2) half-boundaries
    between engines on real money sums.  Headroom: total_e4 * 10 must fit
    BIGINT, good to ~1e17 total revenue (drop to e2 cents beyond).
    """
    from knowledgebot_spark.operators import ranking as rk

    li = _t(spark, sf, "lineitem")
    item_e4 = F.expr(
        "CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)"
    )
    rev = li.groupBy("l_partkey").agg(F.sum(item_e4).alias("rev_e4"))
    ranked = rk.with_global_rank_cumsum(
        rev,
        [F.col("rev_e4").desc(), F.col("l_partkey").asc()],
        F.col("rev_e4"),
        rn_out="rank",
        cum_out="cum_e4",
        total_out="total_e4",
    )
    return ranked.filter(
        (F.col("cum_e4") - F.col("rev_e4")) * 10 < F.col("total_e4") * 8
    ).select(
        F.col("rank").cast("long").alias("rank"),
        "l_partkey",
        "rev_e4",
        F.round(F.col("cum_e4") / F.col("total_e4"), 6).alias("cum_share"),
    )


# --- equi-depth histogram (ANALYZE statistics) (wave 7) -----------------------

_EQD_BUCKETS = 16
_EQD_FRACS = ", ".join(f"{i / _EQD_BUCKETS}" for i in range(1, _EQD_BUCKETS))


@register(
    "rel_equi_depth_histogram",
    sql=f"""
WITH cuts AS (
  SELECT quantile_cont(l_extendedprice, [{_EQD_FRACS}]) AS qs FROM lineitem
)
SELECT CAST(1 + len(list_filter(qs, c -> l_extendedprice > c)) AS INTEGER)
    AS bucket,
  CAST(count(*) AS BIGINT) AS n_rows,
  round(min(l_extendedprice), 2) AS lo,
  round(max(l_extendedprice), 2) AS hi
FROM lineitem CROSS JOIN cuts
GROUP BY 1
""",
    tags=("statistics", "histogram", "analyze"),
)
def rel_equi_depth_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """Equi-depth (equi-height) histogram of l_extendedprice — the
    optimizer statistic ANALYZE collects for selectivity estimation, and
    the range-partitioner's split-point computation: 15 exact quantile
    cutpoints split the column into 16 buckets of near-equal population,
    and the report shows each bucket's row count and value range.

    Shape: ONE aggregation computes all 15 interpolated quantiles (both
    engines use the same (n-1)*q interpolation, so the cutpoints are
    bit-identical doubles); the 1-row cutpoint array broadcasts via
    crossJoin (the llm_tfidf_topterm scalar pattern) and bucket
    assignment is an in-row array scan — a second narrow pass, no sort.
    At 100 TB swap the exact quantiles for approx_percentile and gate
    with a rank-band tolerance (the rel_kll_quantiles pattern); the
    assignment pass is unchanged.
    """
    li = _t(spark, sf, "lineitem")
    cuts = li.agg(
        F.expr(f"percentile(l_extendedprice, array({_EQD_FRACS}))").alias("qs")
    )
    return (
        li.crossJoin(F.broadcast(cuts))
        .select(
            F.expr(
                "CAST(1 + size(filter(qs, c -> l_extendedprice > c)) AS INT)"
            ).alias("bucket"),
            "l_extendedprice",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.round(F.min("l_extendedprice"), 2).alias("lo"),
            F.round(F.max("l_extendedprice"), 2).alias("hi"),
        )
    )


# --- TPC-H Q10 shape: returned-item customer ranking (wave 9) -----------------

@register(
    "rel_returned_customers",
    sql="""
WITH rev AS (
  SELECT c.c_custkey, c.c_name, n.n_name,
    CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 10000 + 0.5)
      AS BIGINT)) AS BIGINT) AS rev_e4
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  WHERE l.l_returnflag = 'R'
  GROUP BY c.c_custkey, c.c_name, n.n_name
)
SELECT c_custkey, c_name, n_name, rev_e4
FROM rev ORDER BY rev_e4 DESC, c_custkey LIMIT 20
""",
    tags=("tpch", "q10", "join"),
)
def rel_returned_customers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q10 shape: which customers returned the most merchandise —
    lineitem filtered to returnflag 'R', joined through orders to
    customer and nation, ranked by lost revenue, top 20.  The classic
    fact -> bridge -> dim -> dim join chain with a selective fact filter.

    Shape: the returnflag predicate pushes to the lineitem scan
    (~quarter of rows survive); customer and nation broadcast; the only
    big shuffle is fact⋈orders on the orderkey.  Revenue quantizes to
    exact e4 BIGINTs before ranking (rel_pareto_share's determinism
    rule), and the top-20 plans as TakeOrderedAndProject.
    """
    li = _t(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    o = _t(spark, sf, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf, "customer").select("c_custkey", "c_name", "c_nationkey")
    n = _t(spark, sf, "nation").select("n_nationkey", "n_name")
    item_e4 = F.expr(
        "CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)"
    )
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(item_e4).alias("rev_e4"))
    )
    return rev.orderBy(F.desc("rev_e4"), F.asc("c_custkey")).limit(20)


# --- TPC-H Q7 shape: cross-nation volume shipping (wave 9) --------------------

@register(
    "rel_volume_shipping",
    sql="""
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
  CAST(EXTRACT(year FROM l.l_shipdate) AS INTEGER) AS ship_year,
  CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 10000 + 0.5)
    AS BIGINT)) AS BIGINT) AS volume_e4
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation ns ON s.s_nationkey = ns.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation nc ON c.c_nationkey = nc.n_nationkey
WHERE ns.n_name <> nc.n_name
GROUP BY 1, 2, 3
""",
    tags=("tpch", "q7", "join"),
)
def rel_volume_shipping(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q7 shape: cross-border trade volume — revenue between every
    (supplier nation, customer nation) pair per ship year, domestic flows
    excluded.  The five-way star join whose output is the nation x nation
    x year trade matrix.

    Shape: supplier/customer/nation all broadcast (dims); the fact
    shuffles once on orderkey for the orders bridge; the inequality
    filter runs post-join on two broadcast-provided columns; output is
    bounded by |nations|^2 x |years| regardless of fact size.  Exact e4
    revenue again — the matrix hashes as integers.
    """
    li = _t(spark, sf, "lineitem")
    s = _t(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    o = _t(spark, sf, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf, "nation")
    ns = n.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    nc = n.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("cust_nation")
    )
    item_e4 = F.expr(
        "CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)"
    )
    j = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return j.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("l_shipdate").cast("int").alias("ship_year"),
    ).agg(F.sum(item_e4).alias("volume_e4"))


# --- Benford first-digit screening (wave 10) ----------------------------------

@register(
    "rel_benford_screen",
    sql="""
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(floor(l_extendedprice) AS BIGINT) AS VARCHAR), 1, 1)
    AS INTEGER) AS d
  FROM lineitem WHERE l_extendedprice >= 1
), counts AS (
  SELECT d, CAST(count(*) AS BIGINT) AS observed FROM digits GROUP BY d
), total AS (
  SELECT CAST(sum(observed) AS BIGINT) AS n FROM counts
)
SELECT c.d AS digit, c.observed,
  round(t.n * ln(1.0 + 1.0 / c.d) / ln(10.0), 4) AS expected,
  round(pow(c.observed - t.n * ln(1.0 + 1.0 / c.d) / ln(10.0), 2)
    / (t.n * ln(1.0 + 1.0 / c.d) / ln(10.0)), 6) AS chi2_term
FROM counts c CROSS JOIN total t
""",
    tags=("data-quality", "benford", "screening"),
)
def rel_benford_screen(spark: SparkSession, sf: str) -> DataFrame:
    """Benford's-law screening of the price column: observed vs expected
    first-digit counts with per-digit chi-square terms — the forensic
    data-quality test for fabricated or truncated numeric columns
    (naturally-occurring multi-magnitude amounts follow
    P(d) = log10(1 + 1/d); synthetic uniform data, like this testdata,
    fails loudly — which is exactly what the screen is for).

    Shape: first digit is string math on the integer part (no float
    formatting dialects), one 9-row hash agg, the total as a 1-row
    broadcast scalar.  Counts are exact; expected values and chi-square
    terms evaluate ln/pow on identical inputs in both engines, rounded
    for the hash.
    """
    li = _t(spark, sf, "lineitem").filter(F.col("l_extendedprice") >= 1)
    digits = li.select(
        F.substring(
            F.floor("l_extendedprice").cast("bigint").cast("string"), 1, 1
        )
        .cast("int")
        .alias("d")
    )
    counts = digits.groupBy("d").agg(F.count("*").alias("observed"))
    total = counts.agg(F.sum("observed").alias("n"))
    expected = F.col("n") * F.log(1.0 + 1.0 / F.col("d")) / F.log(F.lit(10.0))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            F.col("d").alias("digit"),
            "observed",
            F.round(expected, 4).alias("expected"),
            F.round(
                F.pow(F.col("observed") - expected, 2) / expected, 6
            ).alias("chi2_term"),
        )
    )


# --- ABC revenue classification (wave 11) -------------------------------------

@register(
    "rel_abc_classification",
    sql="""
WITH rev AS (
  SELECT l_partkey,
    CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5)
      AS BIGINT)) AS BIGINT) AS rev_e4
  FROM lineitem GROUP BY l_partkey
), ranked AS (
  SELECT l_partkey, rev_e4,
    CAST(sum(rev_e4) OVER (ORDER BY rev_e4 DESC, l_partkey
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_e4,
    CAST(sum(rev_e4) OVER () AS BIGINT) AS total_e4
  FROM rev
), classed AS (
  SELECT l_partkey, rev_e4,
    CASE WHEN (cum_e4 - rev_e4) * 10 < total_e4 * 8 THEN 'A'
         WHEN (cum_e4 - rev_e4) * 100 < total_e4 * 95 THEN 'B'
         ELSE 'C' END AS abc
  FROM ranked
)
SELECT abc, CAST(count(*) AS BIGINT) AS n_parts,
  CAST(sum(rev_e4) AS BIGINT) AS class_rev_e4
FROM classed GROUP BY abc
""",
    tags=("window", "abc", "inventory"),
)
def rel_abc_classification(spark: SparkSession, sf: str) -> DataFrame:
    """ABC classification: parts partitioned into A (the head carrying
    the first 80% of revenue), B (next 15%), C (the tail) — the
    inventory-management standard built on rel_pareto_share's exact
    cumulative machinery, collapsed to the 3-class report procurement
    actually consumes (count and revenue mass per class).

    Same determinism rules: e4 fixed-point revenue, integer comparisons
    for both class boundaries — a row's class is decided by the share
    BEFORE it, so boundary rows land in the cheaper class consistently
    in both engines.  Shape: distributed cumulative ranking
    (operators/ranking.py, like rel_pareto_share), then a 3-row agg.
    """
    from knowledgebot_spark.operators import ranking as rk

    li = _t(spark, sf, "lineitem")
    item_e4 = F.expr(
        "CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)"
    )
    rev = li.groupBy("l_partkey").agg(F.sum(item_e4).alias("rev_e4"))
    ranked = rk.with_global_rank_cumsum(
        rev,
        [F.col("rev_e4").desc(), F.col("l_partkey").asc()],
        F.col("rev_e4"),
        rn_out="_rank",
        cum_out="cum_e4",
        total_out="total_e4",
    ).select("l_partkey", "rev_e4", "cum_e4", "total_e4")
    prior = F.col("cum_e4") - F.col("rev_e4")
    abc = (
        F.when(prior * 10 < F.col("total_e4") * 8, "A")
        .when(prior * 100 < F.col("total_e4") * 95, "B")
        .otherwise("C")
    )
    return ranked.groupBy(abc.alias("abc")).agg(
        F.count("*").alias("n_parts"),
        F.sum("rev_e4").alias("class_rev_e4"),
    )


# --- exact distributed quantiles (round 5) ------------------------------------

@register(
    "rel_exact_quantiles_distributed",
    sql="""
WITH ranked AS (
  SELECT l_extendedprice AS p,
    row_number() OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn
  FROM lineitem
), n AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM lineitem),
qs AS (
  SELECT * FROM (VALUES (0.25, 1, 4), (0.5, 1, 2), (0.75, 3, 4), (0.9, 9, 10))
    AS t(q, num, den)
), sel AS (
  SELECT q, CAST((n.n_rows * num + den - 1) // den AS BIGINT) AS rn_sel, n.n_rows
  FROM qs CROSS JOIN n
)
SELECT CAST(sel.q AS DOUBLE) AS q, sel.rn_sel, sel.n_rows, round(ranked.p, 2) AS value
FROM sel JOIN ranked ON ranked.rn = sel.rn_sel
""",
    tags=("quantile", "exact", "distributed-rank"),
)
def rel_exact_quantiles_distributed(spark: SparkSession, sf: str) -> DataFrame:
    """EXACT type-1 quantiles (p25/p50/p75/p90 of l_extendedprice) over an
    arbitrarily large table without a single-partition sort and without
    approximation: global row_number via operators/ranking.py
    (range-partition + partition-offset), then the 4 selection ranks —
    computed with INTEGER arithmetic, ceil(N*num/den) = (N*num+den-1) div
    den, so both engines agree even where N*0.9 is inexact in doubles —
    fetched by a 4-row broadcast join against the ranked relation.

    This is the exact complement to rel_approx_percentile: approx for
    monitoring, this for the audited cut (e.g. a quality-score threshold
    that must be reproducible to the row at 100 TB).  Cost: one range
    shuffle of (p, keys) + a reused-exchange partition-count agg; the
    quantile fetch itself broadcasts 4 rows."""
    from knowledgebot_spark.operators import ranking as rk

    li = _t(spark, sf, "lineitem").select(
        F.col("l_extendedprice").alias("p"), "l_orderkey", "l_linenumber"
    )
    ranked = rk.with_global_row_number(
        li,
        [F.col("p").asc(), F.col("l_orderkey").asc(), F.col("l_linenumber").asc()],
        out="rn",
    )
    n = li.agg(F.count("*").cast("bigint").alias("n_rows"))
    qs = spark.createDataFrame(
        [(0.25, 1, 4), (0.5, 1, 2), (0.75, 3, 4), (0.9, 9, 10)],
        "q double, num int, den int",
    )
    sel = qs.crossJoin(F.broadcast(n)).select(
        "q",
        F.expr("CAST((n_rows * num + den - 1) div den AS BIGINT)").alias("rn_sel"),
        "n_rows",
    )
    return ranked.join(F.broadcast(sel), ranked.rn == sel.rn_sel).select(
        "q", "rn_sel", "n_rows", F.round("p", 2).alias("value")
    )


# --- sweep-line concurrency (round 5) -----------------------------------------

@register(
    "rel_concurrency_sweep",
    sql="""
WITH marked AS (
  SELECT user_id, ts, event_id,
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
), bounds AS (
  SELECT user_id, sid, min(ts) AS s_start, max(ts) AS s_end
  FROM sess GROUP BY user_id, sid
), deltas AS (
  SELECT epoch_us(s_start) AS ts_us, 1 AS d FROM bounds
  UNION ALL
  SELECT epoch_us(s_end) + 1, -1 FROM bounds
), net AS (
  SELECT ts_us, CAST(sum(d) AS BIGINT) AS nd FROM deltas GROUP BY ts_us
), cum AS (
  SELECT ts_us,
    CAST(sum(nd) OVER (ORDER BY ts_us ROWS UNBOUNDED PRECEDING) AS BIGINT)
      AS concurrency
  FROM net
)
SELECT ts_us, concurrency FROM cum
ORDER BY concurrency DESC, ts_us LIMIT 10
""",
    tags=("events", "sweep-line", "concurrency", "distributed-rank"),
)
def rel_concurrency_sweep(spark: SparkSession, sf: str) -> DataFrame:
    """Peak concurrent sessions by sweep line: sessionize on the 30-minute
    inactivity gap (the rel_session_paths machinery), turn each session
    into a +1 boundary at its start and a -1 at its end (+1us, so
    single-event sessions still count at their instant), and prefix-sum
    the net deltas in timestamp order — the classic interval-overlap
    algorithm (room occupancy, connection-pool load, live concurrency)
    that no window FRAME can express, because the overlap count at t
    depends on ALL earlier boundaries.

    The prefix sum is the DISTRIBUTED global cumsum
    (operators/ranking.py): boundary timestamps are corpus-scale (two per
    session, microsecond-granular), so a single-partition ORDER BY window
    would collapse the whole sweep onto one task at 100 TB.  Per-ts net
    deltas are exact integers; the top-10 peak moments come out of a
    TakeOrdered, never a global sort."""
    from knowledgebot_spark.operators import ranking as rk
    from knowledgebot_spark.queries_events import _micros

    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 1_800_000_000
    marked = ev.select(
        "user_id",
        "ts",
        "event_id",
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
    bounds = sess.groupBy("user_id", "sid").agg(
        F.min("ts").alias("s_start"), F.max("ts").alias("s_end")
    )
    deltas = bounds.select(
        _micros("s_start").alias("ts_us"), F.lit(1).alias("d")
    ).unionAll(
        bounds.select((_micros("s_end") + 1).alias("ts_us"), F.lit(-1).alias("d"))
    )
    net = deltas.groupBy("ts_us").agg(F.sum("d").cast("bigint").alias("nd"))
    cum = rk.with_global_cumsum(
        net, [F.col("ts_us").asc()], F.col("nd"), out="concurrency"
    )
    return (
        cum.select("ts_us", F.col("concurrency").cast("bigint").alias("concurrency"))
        .orderBy(F.desc("concurrency"), F.asc("ts_us"))
        .limit(10)
    )


# --- partition pruning (round 5) ----------------------------------------------

def _stage_orders_by_year(spark: SparkSession, sf: str) -> str:
    """Stage (once per sf dir) the year-partitioned orders layout shared by
    rel_partition_pruning (static pruning) and rel_dpp_join (dynamic
    pruning).  One helper on purpose: both queries must consume the SAME
    path, partition column, and written shape — duplicated staging blocks
    would let one silently read the other's stale layout after a change."""
    import os

    base = (
        f"/tmp/knowledgebot_spark/fmt/{os.path.basename(sf.rstrip('/'))}"
        "/orders_by_year"
    )
    if not os.path.exists(os.path.join(base, "_SUCCESS")):
        (
            _t(spark, sf, "orders")
            .withColumn("order_year", F.date_format("o_orderdate", "yyyy"))
            .write.mode("overwrite")
            .partitionBy("order_year")
            .parquet(base)
        )
    return base


@register(
    "rel_partition_pruning",
    sql="""
SELECT strftime(o_orderdate, '%Y') AS order_year,
  CAST(count(*) AS BIGINT) AS n_orders,
  round(sum(o_totalprice), 2) AS revenue
FROM orders
WHERE strftime(o_orderdate, '%Y') IN ('1995', '1996')
GROUP BY 1
""",
    tags=("scan", "partition-pruning", "layout"),
)
def rel_partition_pruning(spark: SparkSession, sf: str) -> DataFrame:
    """Static partition pruning — the single biggest I/O lever at 100 TB:
    orders staged as a year-partitioned parquet dataset
    (``order_year=YYYY/`` directories), then read back with a partition
    predicate.  Catalyst resolves the predicate against directory
    METADATA, so the scan lists and reads only the 2 matching partitions
    of 7 — ``PartitionFilters: [isnotnull(order_year), order_year IN
    (1995,1996)]`` in the plan with zero data filters, the layout
    counterpart of the PushedFilters row-group pruning the rest of the
    catalog relies on (plan-asserted in tests/test_plans.py).

    The stage writes once per (sf, code-version) and is re-read by later
    runs — idempotent, like the other format stages.  Values are
    identical to scanning the flat table: the oracle states the same
    aggregate from the unpartitioned file."""
    base = _stage_orders_by_year(spark, sf)
    back = (
        spark.read
        # partition values must come back as strings, not inferred ints —
        # registry pins partitionColumnTypeInference off, this is explicit
        # belt-and-braces for sessions built elsewhere
        .option("basePath", base)
        .parquet(base)
        .filter(F.col("order_year").isin("1995", "1996"))
    )
    return back.groupBy("order_year").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    ).select(F.col("order_year").cast("string").alias("order_year"), "n_orders", "revenue")


# --- as-of directions: forward + nearest (round 5) ----------------------------

@register(
    "rel_asof_directions",
    sql="""
WITH clicks AS (SELECT * FROM events WHERE event_type = 'click'),
views AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'view'
  QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1
),
back AS (
  SELECT c.event_id, c.user_id, c.ts AS cts, v.ts AS bts
  FROM clicks c ASOF LEFT JOIN views v
    ON c.user_id = v.user_id AND v.ts <= c.ts
),
fwd AS (
  SELECT c.event_id, v.ts AS fts
  FROM clicks c ASOF LEFT JOIN views v
    ON c.user_id = v.user_id AND v.ts >= c.ts
)
SELECT b.event_id, b.user_id,
  strftime(b.cts, '%Y-%m-%d %H:%M:%S') AS click_ts,
  strftime(b.bts, '%Y-%m-%d %H:%M:%S') AS back_ts,
  strftime(f.fts, '%Y-%m-%d %H:%M:%S') AS fwd_ts,
  CASE
    WHEN b.bts IS NULL AND f.fts IS NULL THEN 'none'
    WHEN b.bts IS NULL THEN 'forward'
    WHEN f.fts IS NULL THEN 'backward'
    WHEN epoch_us(f.fts) - epoch_us(b.cts)
         < epoch_us(b.cts) - epoch_us(b.bts) THEN 'forward'
    ELSE 'backward'
  END AS nearest
FROM back b JOIN fwd f ON b.event_id = f.event_id
""",
    tags=("join", "asof", "direction"),
)
def rel_asof_directions(spark: SparkSession, sf: str) -> DataFrame:
    """The full pandas-merge_asof direction surface on the scalable as-of
    plan: for each click, the user's latest view at-or-before
    (``backward``), earliest view at-or-after (``forward``), and which of
    the two is nearest in event time (ties -> backward, the pandas rule).
    Forward is the SAME union + tagged-sort + running-last formulation
    with the sort reversed — one hash shuffle per direction, no
    BroadcastNestedLoopJoin anywhere (the naive range encoding), and the
    two direction results meet on the unique click event_id.  Oracle:
    two native DuckDB ASOF joins (<= and >=) composed."""
    from knowledgebot_spark.operators.asof import asof_join
    from knowledgebot_spark.queries_events import _micros

    e = _t(spark, sf, "events")
    clicks = e.filter(F.col("event_type") == "click")
    views = (
        e.filter(F.col("event_type") == "view")
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
            ),
        )
        .filter(F.col("_rn") == 1)
        .select("user_id", "ts")
    )
    back = asof_join(clicks, views, on="user_id", ts_col="ts").select(
        "event_id", "user_id", "ts", F.col("asof_ts").alias("bts")
    )
    fwd = asof_join(
        clicks, views, on="user_id", ts_col="ts", direction="forward"
    ).select(F.col("event_id").alias("f_event_id"), F.col("asof_ts").alias("fts"))
    j = back.join(fwd, back.event_id == fwd.f_event_id)
    nearest = (
        F.when(F.col("bts").isNull() & F.col("fts").isNull(), "none")
        .when(F.col("bts").isNull(), "forward")
        .when(F.col("fts").isNull(), "backward")
        .when(
            _micros("fts") - _micros("ts") < _micros("ts") - _micros("bts"),
            "forward",
        )
        .otherwise("backward")
    )
    return j.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.date_format("bts", "yyyy-MM-dd HH:mm:ss").alias("back_ts"),
        F.date_format("fts", "yyyy-MM-dd HH:mm:ss").alias("fwd_ts"),
        nearest.alias("nearest"),
    )


# --- TPC-H Q21 shape: waiting suppliers (round 5) -----------------------------

@register(
    "rel_waiting_suppliers",
    sql="""
WITH lo AS (
  SELECT l.l_orderkey, l.l_suppkey,
    (l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY) AS is_late
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'
), per_supp AS (
  SELECT l_orderkey, l_suppkey, bool_or(is_late) AS late
  FROM lo GROUP BY l_orderkey, l_suppkey
), per_order AS (
  SELECT l_orderkey,
    count(*) AS n_supp,
    sum(CASE WHEN late THEN 1 ELSE 0 END) AS n_late
  FROM per_supp GROUP BY l_orderkey
), waiting AS (
  SELECT ps.l_suppkey, ps.l_orderkey
  FROM per_supp ps JOIN per_order po ON ps.l_orderkey = po.l_orderkey
  WHERE ps.late AND po.n_supp > 1 AND po.n_late = 1
)
SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM waiting w
JOIN supplier s ON s.s_suppkey = w.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE n.n_name = 'NATION_3'
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 20
""",
    tags=("join", "tpch-q21", "semi-anti-composition"),
)
def rel_waiting_suppliers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q21 shape — suppliers who kept finished orders waiting: for
    multi-supplier orders where EXACTLY ONE supplier shipped late (>90
    days after the order date — this dataset carries no commit/receipt
    dates), count the orders each such supplier solely delayed.  The
    textbook formulation is a correlated EXISTS + NOT EXISTS pair; that
    plans as two extra joins against lineitem.  This is the scalable
    rewrite: ONE orderkey-keyed aggregation computes per-order supplier
    and late-supplier counts, and the exists/not-exists pair becomes the
    integer predicate (n_supp > 1 AND n_late = 1) — the semi/anti
    composition collapsed into a group-by, with supplier and nation dims
    broadcast and the top-20 as TakeOrderedAndProject."""
    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders").filter(F.col("o_orderstatus") == "F")
    s = _t(spark, sf, "supplier")
    n = _t(spark, sf, "nation").filter(F.col("n_name") == "NATION_3")
    lo = li.join(
        o.select("o_orderkey", "o_orderdate"),
        li.l_orderkey == o.o_orderkey,
    ).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        ).alias("is_late"),
    )
    per_supp = lo.groupBy("l_orderkey", "l_suppkey").agg(
        F.bool_or("is_late").alias("late")
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum(F.when(F.col("late"), 1).otherwise(0)).alias("n_late"),
    )
    waiting = (
        per_supp.filter(F.col("late"))
        .join(per_order, "l_orderkey")
        .filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
    )
    dim = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", "s_name"
    )
    return (
        waiting.join(F.broadcast(dim), waiting.l_suppkey == dim.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").cast("bigint").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


# --- TPC-H Q4 shape: order priority checking (round 5) ------------------------

@register(
    "rel_order_priority_check",
    sql="""
SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
""",
    tags=("join", "tpch-q4", "semi-join"),
)
def rel_order_priority_check(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q4 shape — order priority checking: how many orders placed in
    one quarter had at least one line item shipped late (>60 days after
    the order date; this dataset carries no commit/receipt dates).  The
    correlated EXISTS plans as a LEFT SEMI join: the equi-key
    (l_orderkey = o_orderkey) carries the shuffle and the lateness
    predicate rides along as the join's residual condition, so lineitem
    is touched exactly once and never materializes matches beyond the
    first.  The quarter filter pushes to the orders scan; the final
    aggregate is 5 groups."""
    o = _t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp_ntz"))
    )
    li = _t(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("bigint").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --- TPC-H Q13 shape: customer order-count distribution (round 5) -------------

@register(
    "rel_customer_order_distribution",
    sql="""
WITH c_orders AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
SELECT CAST(c_count AS BIGINT) AS c_count, CAST(count(*) AS BIGINT) AS custdist
FROM c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
    tags=("join", "tpch-q13", "outer-join", "double-agg"),
)
def rel_customer_order_distribution(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q13 shape — distribution of customers by order count: LEFT
    OUTER join customer->orders with a residual filter ON THE JOIN (not
    WHERE — customers with zero qualifying orders must survive with
    c_count = 0; the '1-URGENT' priority exclusion stands in for the
    reference query's comment NOT LIKE).  Two-level aggregation: the
    first keyed by custkey (shuffle-partitioned on the join key, so AQE
    can fold it into the join's exchange), the second over the tiny
    c_count domain (map-side partials, ~tens of groups)."""
    c = _t(spark, sf, "customer").select("c_custkey")
    o = _t(spark, sf, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    cond = (F.col("c_custkey") == F.col("o_custkey")) & (
        F.col("o_orderpriority") != F.lit("1-URGENT")
    )
    per_cust = (
        c.join(o, cond, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy(F.col("c_count").cast("bigint").alias("c_count"))
        .agg(F.count("*").cast("bigint").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# --- TPC-H Q18 shape: large-volume customers (round 5) ------------------------

@register(
    "rel_large_volume_customers",
    sql="""
WITH big AS (
  SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300
)
SELECT c.c_name, c.c_custkey, o.o_orderkey,
  strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
  round(o.o_totalprice, 2) AS totalprice,
  b.total_qty
FROM big b
JOIN orders o ON b.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY totalprice DESC, o.o_orderkey
LIMIT 100
""",
    tags=("join", "tpch-q18", "having", "topk"),
)
def rel_large_volume_customers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q18 shape — large-volume customers: the IN (GROUP BY ...
    HAVING) subquery rewritten as aggregate-then-join.  The orderkey
    aggregation is the only fact-sized shuffle and the HAVING cut (>300
    units) drops ~all of it before any join, so the surviving handful of
    orders joins orders (equi, orderkey) and broadcast customer; top-100
    plans as TakeOrderedAndProject.  Quantities and prices quantize to
    2dp before ranking (round-before-rank convention)."""
    li = _t(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty_raw"))
        .filter(F.col("qty_raw") > 300)
        .select("l_orderkey", F.round("qty_raw", 2).alias("total_qty"))
    )
    o = _t(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = _t(spark, sf, "customer").select("c_custkey", "c_name")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


# --- TPC-H Q22 shape: idle customers with above-average balance (round 5) -----

@register(
    "rel_idle_customer_balance",
    sql="""
WITH avg_bal AS (
  SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0.0
)
SELECT c.c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
  round(sum(c.c_acctbal), 2) AS totacctbal
FROM customer c, avg_bal
WHERE c.c_acctbal > avg_bal.a
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
  )
GROUP BY c.c_nationkey
ORDER BY c.c_nationkey
""",
    tags=("join", "tpch-q22", "anti-join", "scalar-subquery"),
)
def rel_idle_customer_balance(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q22 shape — sales opportunity: customers holding an
    above-average positive balance with no order since 2000-01-01
    (Q22's "no orders in 7 years" clause at this dataset's time range),
    grouped by nation (standing in for the reference's phone country
    code, which this dataset lacks).  The scalar subquery is a 1-row
    aggregate crossJoined in as a broadcast scalar (the llm_tfidf_topterm
    pattern); the NOT EXISTS plans as a LEFT ANTI join on custkey with
    the date cut pushed to the orders scan.  At scale the anti-join
    shuffles on the custkey both sides already carry and the final
    aggregate is |nations| groups."""
    c = _t(spark, sf, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(F.avg("c_acctbal").alias("a"))
    )
    o = (
        _t(spark, sf, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp_ntz"))
        .select("o_custkey")
    )
    rich = c.crossJoin(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("a"))
    idle = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return (
        idle.groupBy("c_nationkey")
        .agg(
            F.count("*").cast("bigint").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


# --- Count-Min heavy hitters (round 5) ----------------------------------------

_CM_D = 4  # hash rows
_CM_W = 8192  # cells per row
_CM_PHI = 0.001  # heavy-hitter threshold as a fraction of the token stream


@register(
    "rel_cm_heavy_hitters",
    sql=f"""
WITH toks AS (
  SELECT [x for x in str_split(trim(lower(text)), ' ') if x <> ''] AS t
  FROM documents
), sh AS (
  SELECT unnest([t[i] || ' ' || t[i + 1]
      for i in generate_series(1, len(t) - 1)]) AS s
  FROM toks WHERE len(t) >= 2
), f AS (
  SELECT s, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY s
)
SELECT s AS bigram, n,
  true AS cm_detected, true AS cm_no_underestimate, true AS cm_within_bound
FROM f, (SELECT sum(n) AS total FROM f) t
WHERE n > {_CM_PHI} * total
ORDER BY n DESC, bigram
""",
    tags=("approx", "count-min", "heavy-hitters", "mergeable"),
)
def rel_cm_heavy_hitters(spark: SparkSession, sf: str) -> DataFrame:
    """Count-Min-sketch heavy hitters over the word-bigram stream — the
    fourth classic mergeable sketch alongside rel_hll_sketch /
    rel_kll_quantiles / rel_theta_setops, same gated-oracle discipline.

    The sketch IS a relation: explode each key d=4 ways to
    (row j, cell xxhash64(key, j) mod w=8192) and sum counts per cell —
    identical to per-occurrence increments (counter addition commutes),
    but built from the already-collapsed frequency relation so the
    map-side combine has done the heavy lifting.  Cells merge across
    partitions/shards/days by addition, the 100 TB sketch-once-
    rollup-anywhere property; the materialized sketch is <= d*w rows and
    broadcasts to the candidate probe (point estimate = min over the d
    cells), so the only fact-sized shuffle is the frequency hash agg.

    Hash-gated like the HLL/KLL rows: reported rows are the EXACT
    heavy hitters (frequency > 0.001 of the stream — SQL-reproducible
    values), and the sketch earns its keep through in-query booleans that
    a broken sketch flips: cm_detected (the estimate also crosses the
    threshold — guaranteed, CM never underestimates), cm_no_underestimate
    (est >= exact, the structural invariant), cm_within_bound
    (est - exact <= ceil(e*N/w), the Cormode-Muthukrishnan error bound;
    deterministic for a fixed dataset + seed)."""
    import math

    d = _t(spark, sf, "documents")
    toks = d.select(
        F.filter(
            F.split(F.trim(F.lower("text")), " "), lambda x: x != ""
        ).alias("t")
    )
    bigrams = toks.filter(F.size("t") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1), i ->"
                " concat(element_at(t, i), ' ', element_at(t, i + 1)))"
            )
        ).alias("s")
    )
    f = bigrams.groupBy("s").agg(F.count("*").cast("bigint").alias("n"))
    rows = spark.range(_CM_D).select(F.col("id").cast("int").alias("j"))
    keyed = f.crossJoin(F.broadcast(rows)).select(
        "s",
        "n",
        "j",
        F.pmod(F.xxhash64("s", "j"), F.lit(_CM_W)).alias("cell"),
    )
    sketch = keyed.groupBy("j", "cell").agg(F.sum("n").alias("cell_sum"))
    est = (
        keyed.join(F.broadcast(sketch), ["j", "cell"])
        .groupBy("s", "n")
        .agg(F.min("cell_sum").alias("est"))
    )
    total = f.agg(F.sum("n").alias("total"))
    bound = F.ceil(F.lit(math.e) * F.col("total") / F.lit(_CM_W))
    return (
        est.crossJoin(F.broadcast(total))
        .filter(F.col("n") > F.lit(_CM_PHI) * F.col("total"))
        .select(
            F.col("s").alias("bigram"),
            "n",
            (F.col("est") > F.lit(_CM_PHI) * F.col("total")).alias("cm_detected"),
            (F.col("est") >= F.col("n")).alias("cm_no_underestimate"),
            ((F.col("est") - F.col("n")) <= bound).alias("cm_within_bound"),
        )
        .orderBy(F.desc("n"), F.asc("bigram"))
    )


# --- Z-order layout + zone-map skipping (round 6) ------------------------------

@register(
    "rel_zorder_skipping",
    sql="""
WITH bounds AS (
  SELECT CAST(max(l_partkey) AS BIGINT) AS pmax,
    CAST(max(l_suppkey) AS BIGINT) AS smax
  FROM lineitem
)
SELECT CAST(count(*) AS BIGINT) AS n_box_rows,
  CAST(coalesce(sum(CAST(l_quantity AS BIGINT)), 0) AS BIGINT) AS box_qty,
  CAST(coalesce(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5)
    AS BIGINT)), 0) AS BIGINT) AS box_rev_e4,
  (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_total_rows
FROM lineitem, bounds
WHERE l_partkey <= pmax // 8
  AND l_suppkey BETWEEN smax // 4 AND smax // 2
""",
    tags=("layout", "zorder", "zone-map", "staging"),
)
def rel_zorder_skipping(spark: SparkSession, sf: str) -> DataFrame:
    """Z-order (Morton) layout — the multi-dimensional counterpart of
    rel_partition_pruning's directory pruning: lineitem staged as 16
    parquet files range-partitioned + sorted on the bit-interleaved
    (partkey, suppkey) key (``operators/layout.py``; keys min-max
    scaled to 12 bits each with broadcast scalars, monotone per
    dimension so file zone maps stay tight on the ORIGINAL columns),
    then a 2-D box query (low partkey band x middle suppkey band) runs
    against the staged layout.  Under any 1-D sort one of the two
    predicates would overlap ~every file; under Z-order the box
    overlaps O(perimeter) of the curve — tests/test_layout.py reads
    the parquet footers and proves >= half the files are skippable on
    min/max stats alone, and strictly more than under a hash layout.
    Values are layout-invariant: the oracle states the same box
    aggregate from the flat table, and total row count proves the
    staging lost nothing.  At 100 TB this is the difference between a
    2-key lookup reading 16 TB and reading 250 GB."""
    import os

    from knowledgebot_spark.operators.layout import write_zordered, zorder_key

    base = f"/tmp/knowledgebot_spark/fmt/{os.path.basename(sf.rstrip('/'))}/lineitem_zorder"
    li = _t(spark, sf, "lineitem")
    if not os.path.exists(os.path.join(base, "_SUCCESS")):
        bounds = li.agg(
            F.max("l_partkey").cast("bigint").alias("pmax"),
            F.max("l_suppkey").cast("bigint").alias("smax"),
        )
        scaled = li.crossJoin(F.broadcast(bounds)).select(
            li["*"],
            # monotone 12-bit quantization: floor(key * 4096 / (max+1))
            F.expr("CAST(l_partkey * 4096 div (pmax + 1) AS BIGINT)").alias("pq"),
            F.expr("CAST(l_suppkey * 4096 div (smax + 1) AS BIGINT)").alias("sq"),
        )
        write_zordered(
            scaled.drop("pmax", "smax"), base, ["pq", "sq"], n_files=16, bits=12
        )
    back = spark.read.parquet(base)
    bounds = li.agg(
        F.max("l_partkey").cast("bigint").alias("pmax"),
        F.max("l_suppkey").cast("bigint").alias("smax"),
    )
    box = back.crossJoin(F.broadcast(bounds)).filter(
        (F.col("l_partkey") <= F.expr("pmax div 8"))
        & (F.col("l_suppkey") >= F.expr("smax div 4"))
        & (F.col("l_suppkey") <= F.expr("smax div 2"))
    )
    total = back.agg(F.count("*").cast("bigint").alias("n_total_rows"))
    rev_e4 = F.expr(
        "CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)"
    )
    return (
        box.agg(
            F.count("*").cast("bigint").alias("n_box_rows"),
            F.coalesce(F.sum(F.col("l_quantity").cast("bigint")), F.lit(0))
            .cast("bigint")
            .alias("box_qty"),
            F.coalesce(F.sum(rev_e4), F.lit(0)).cast("bigint").alias("box_rev_e4"),
        )
        .crossJoin(F.broadcast(total))
    )


# --- Bloom-filter join pruning (round 6) ---------------------------------------

# 3 seeds x 63-bit words: positions stay in [0, 62] so no shift ever
# touches the sign bit (DuckDB rejects 1<<63; Spark wraps negative).
_BLOOM_WORDS = 1024
_BLOOM_BITS = _BLOOM_WORDS * 63
_BLOOM_SEEDS = (17, 29, 47)


def _bloom_pos_sql(key: str, seed: int) -> str:
    """Portable position hash: md5 is bit-identical across engines (the
    kb_embed parity trick), so Spark and DuckDB build the SAME filter."""
    return (
        f"('0x' || substr(md5(CAST({key} AS VARCHAR) || ':{seed}'), 1, 12))::BIGINT"
        f" % {_BLOOM_BITS}"
    )


@register(
    "rel_bloom_join_prune",
    sql=f"""
WITH dim AS (
  SELECT o_orderkey FROM orders
  WHERE o_orderpriority = '1-URGENT'
    AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
),
bloom AS (
  SELECT pos // 63 AS word_idx, CAST(bit_or(1::BIGINT << (pos % 63)) AS BIGINT) AS bits
  FROM (
    SELECT {_bloom_pos_sql('o_orderkey', 17)} AS pos FROM dim
    UNION ALL SELECT {_bloom_pos_sql('o_orderkey', 29)} FROM dim
    UNION ALL SELECT {_bloom_pos_sql('o_orderkey', 47)} FROM dim
  ) GROUP BY 1
),
probe AS (
  SELECT l_orderkey, CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT) AS rev_e4,
    {_bloom_pos_sql('l_orderkey', 17)} AS p1,
    {_bloom_pos_sql('l_orderkey', 29)} AS p2,
    {_bloom_pos_sql('l_orderkey', 47)} AS p3
  FROM lineitem
),
cand AS (
  SELECT pr.l_orderkey, pr.rev_e4
  FROM probe pr
  JOIN bloom b1 ON b1.word_idx = pr.p1 // 63
  JOIN bloom b2 ON b2.word_idx = pr.p2 // 63
  JOIN bloom b3 ON b3.word_idx = pr.p3 // 63
  WHERE ((b1.bits >> (pr.p1 % 63)) & 1) = 1
    AND ((b2.bits >> (pr.p2 % 63)) & 1) = 1
    AND ((b3.bits >> (pr.p3 % 63)) & 1) = 1
),
matched AS (
  SELECT c.l_orderkey, c.rev_e4 FROM cand c JOIN dim d ON c.l_orderkey = d.o_orderkey
),
plain AS (
  SELECT l.l_orderkey,
    CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 10000 + 0.5) AS BIGINT) AS rev_e4
  FROM lineitem l JOIN dim d ON l.l_orderkey = d.o_orderkey
)
SELECT
  (SELECT CAST(count(*) AS BIGINT) FROM probe) AS n_fact_rows,
  (SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_candidates,
  (SELECT CAST(count(*) AS BIGINT) FROM matched) AS n_matched,
  (SELECT CAST(coalesce(sum(rev_e4), 0) AS BIGINT) FROM matched) AS revenue_e4,
  (SELECT count(*) FROM matched) = (SELECT count(*) FROM plain)
    AND (SELECT coalesce(sum(rev_e4), 0) FROM matched)
      = (SELECT coalesce(sum(rev_e4), 0) FROM plain) AS no_false_negatives
""",
    tags=("join", "bloom", "runtime-filter", "semi-join-prune"),
)
def rel_bloom_join_prune(spark: SparkSession, sf: str) -> DataFrame:
    """Bloom-filter join pruning — the runtime-filter pattern for star
    joins whose dim-side filter output is too large to broadcast as a
    key set but trivially fits as BITS: the selective dim (urgent 1997
    orders) collapses to a 1024-word x 63-bit Bloom filter (one bit_or
    aggregate, 8 KB regardless of dim cardinality), the filter
    broadcasts into the fact scan, and only rows passing all 3 hash
    probes reach the real shuffle join — at 100 TB the fact-side
    exchange shrinks by the dim's selectivity (~6%) at the cost of one
    8 KB broadcast, exactly what Spark's own
    ``runtime.bloomFilter`` rewrite does, built here from portable
    primitives (md5 position hashes, bit-identical in DuckDB, so the
    oracle constructs the SAME filter).  The final equality join drops
    Bloom false positives; ``no_false_negatives`` pins the containment
    guarantee (candidate superset covers the exact join) in-query, and
    the emitted candidate/matched counts expose the false-positive rate
    to the driver hash.  Positions use 63-bit words so no shift touches
    the sign bit on either engine."""
    o = _t(spark, sf, "orders")
    dim = o.filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    ).select("o_orderkey")

    def pos(key: str, seed: int) -> F.Column:
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col(key).cast("string"), F.lit(f":{seed}"))), 1, 12
                ),
                16,
                10,
            ).cast("bigint")
            % _BLOOM_BITS
        )

    positions = None
    for seed in _BLOOM_SEEDS:
        p = dim.select(pos("o_orderkey", seed).alias("pos"))
        positions = p if positions is None else positions.unionAll(p)
    bloom = (
        positions.groupBy(F.expr("pos div 63").alias("word_idx"))
        .agg(
            F.bit_or(
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 63 AS INT))")
            ).alias("bits")
        )
    )

    li = _t(spark, sf, "lineitem")
    rev = F.expr(
        "CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)"
    )
    probe = li.select(
        "l_orderkey",
        rev.alias("rev_e4"),
        pos("l_orderkey", 17).alias("p1"),
        pos("l_orderkey", 29).alias("p2"),
        pos("l_orderkey", 47).alias("p3"),
    )
    cand = probe
    for i, p in enumerate(("p1", "p2", "p3"), start=1):
        b = bloom.select(
            F.col("word_idx").alias(f"w{i}"), F.col("bits").alias(f"bits{i}")
        )
        cand = cand.join(
            F.broadcast(b), F.expr(f"{p} div 63") == F.col(f"w{i}")
        ).filter(F.expr(f"(shiftright(bits{i}, CAST({p} % 63 AS INT)) & 1) = 1"))
    cand = cand.select("l_orderkey", "rev_e4")

    matched = cand.join(dim, cand.l_orderkey == dim.o_orderkey).select("l_orderkey", "rev_e4")
    plain = li.join(dim, li.l_orderkey == dim.o_orderkey).select(rev.alias("rev_e4"))

    counts = (
        probe.agg(F.count("*").cast("bigint").alias("n_fact_rows"))
        .crossJoin(F.broadcast(cand.agg(F.count("*").cast("bigint").alias("n_candidates"))))
        .crossJoin(
            F.broadcast(
                matched.agg(
                    F.count("*").cast("bigint").alias("n_matched"),
                    F.coalesce(F.sum("rev_e4"), F.lit(0)).cast("bigint").alias("revenue_e4"),
                )
            )
        )
        .crossJoin(
            F.broadcast(
                plain.agg(
                    F.count("*").cast("bigint").alias("pn"),
                    F.coalesce(F.sum("rev_e4"), F.lit(0)).cast("bigint").alias("prev"),
                )
            )
        )
    )
    return counts.select(
        "n_fact_rows",
        "n_candidates",
        "n_matched",
        "revenue_e4",
        (
            (F.col("n_matched") == F.col("pn")) & (F.col("revenue_e4") == F.col("prev"))
        ).alias("no_false_negatives"),
    )


# --- incremental view maintenance with retractions (round 6) -------------------

# The maintained view: per-month order counts + exact e2 revenue over a
# sliding window.  Base materializes [1999-01, 1999-05); the refresh
# slides to [1999-02, 1999-06) by merging an INSERT delta (+May) and a
# RETRACT delta (-January) into the stored partials — the base window's
# rows are never rescanned.
_IVM_BASE_LO, _IVM_BASE_HI = "1999-01-01", "1999-05-01"
_IVM_NEW_LO, _IVM_NEW_HI = "1999-02-01", "1999-06-01"
_IVM_INS_LO = _IVM_BASE_HI  # insert delta = [base_hi, new_hi)


@register(
    "rel_incremental_view_refresh",
    sql=f"""
SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
  CAST(count(*) AS BIGINT) AS n_orders,
  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_e2
FROM orders
WHERE o_orderdate >= TIMESTAMP '{_IVM_NEW_LO} 00:00:00'
  AND o_orderdate < TIMESTAMP '{_IVM_NEW_HI} 00:00:00'
GROUP BY 1 ORDER BY 1
""",
    tags=("warehouse", "incremental-view", "retraction", "staging"),
)
def rel_incremental_view_refresh(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental materialized-view maintenance with retractions: a
    per-month (count, exact-e2 revenue) view materialized over
    [1999-01, 1999-05) is slid to [1999-02, 1999-06) by merging two
    DELTAS into the stored partials — an insert delta (+May's partial
    agg) and a retract delta (-January's, weight -1) — via a
    full-outer-shaped grouped merge in which counts/sums ADD and
    groups whose merged count reaches zero drop out.  The base
    window's fact rows are never rescanned: refresh cost is
    O(|delta| + |view|), independent of the view's history — the
    batch statement of Structured Streaming's update-mode aggregation
    state, and the reason aggregates maintained this way must be
    MERGEABLE partials (count/sum here; the HLL/KLL/theta/CM/gram
    relations merge the same way).  The oracle recomputes the slid
    window directly from the fact table, so a wrong merge (lost
    retraction, double-counted insert, ghost zero-count group)
    hash-fails.  The driver-visible result is layout-invariant;
    staging is write-once per (sf, window) like the other staging
    queries."""
    import os

    base_dir = (
        f"/tmp/knowledgebot_spark/fmt/{os.path.basename(sf.rstrip('/'))}/ivm_base"
    )
    o = _t(spark, sf, "orders")
    month = F.date_format("o_orderdate", "yyyy-MM").alias("order_month")
    price_e2 = F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")

    def window_agg(lo: str, hi: str, weight: int) -> DataFrame:
        return (
            o.filter(
                (F.col("o_orderdate") >= F.lit(lo).cast("timestamp_ntz"))
                & (F.col("o_orderdate") < F.lit(hi).cast("timestamp_ntz"))
            )
            .groupBy(month)
            .agg(
                (F.count("*") * weight).cast("bigint").alias("n_orders"),
                (F.sum(price_e2) * weight).cast("bigint").alias("revenue_e2"),
            )
        )

    if not os.path.exists(os.path.join(base_dir, "_SUCCESS")):
        window_agg(_IVM_BASE_LO, _IVM_BASE_HI, 1).write.mode("overwrite").parquet(
            base_dir
        )

    base = spark.read.parquet(base_dir)
    insert_delta = window_agg(_IVM_INS_LO, _IVM_NEW_HI, 1)
    retract_delta = window_agg(_IVM_BASE_LO, _IVM_NEW_LO, -1)
    merged = (
        base.unionByName(insert_delta)
        .unionByName(retract_delta)
        .groupBy("order_month")
        .agg(
            F.sum("n_orders").cast("bigint").alias("n_orders"),
            F.sum("revenue_e2").cast("bigint").alias("revenue_e2"),
        )
        .filter(F.col("n_orders") > 0)
    )
    return merged.orderBy("order_month")


# --- order-invariant table fingerprint (round 6) -------------------------------

# Row hash inputs are restricted to cross-engine-canonical strings:
# BIGINT casts (identical decimal text in Spark and DuckDB), fixed-point
# money, and strftime'd dates — never raw doubles, whose VARCHAR
# rendering differs between engines.
_FP_ROW = (
    "concat_ws('|', CAST(o_orderkey AS STRING), CAST(o_custkey AS STRING), "
    "o_orderstatus, o_orderpriority, "
    "CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS STRING), "
    "date_format(o_orderdate, 'yyyy-MM-dd'))"
)
_FP_ROW_DUCK = (
    "concat_ws('|', CAST(o_orderkey AS VARCHAR), CAST(o_custkey AS VARCHAR), "
    "o_orderstatus, o_orderpriority, "
    "CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS VARCHAR), "
    "strftime(o_orderdate, '%Y-%m-%d'))"
)


@register(
    "rel_table_fingerprint",
    sql=f"""
WITH canon AS (
  SELECT o_orderkey, {_FP_ROW_DUCK} AS row_str FROM orders
),
h AS (
  SELECT o_orderkey,
    ('0x' || substr(md5(row_str), 1, 15))::BIGINT AS h60,
    ('0x' || substr(md5(row_str), 17, 8))::BIGINT AS h32
  FROM canon
),
clean AS (
  SELECT CAST(count(*) AS BIGINT) AS n_rows,
    CAST(bit_xor(h60) AS BIGINT) AS xor60,
    CAST(sum(h32) AS BIGINT) AS sum32
  FROM h
),
mutated AS (
  -- the replica with ONE field of ONE row corrupted (+1 cent on the
  -- minimum orderkey): recompute the canonical string accordingly
  SELECT CASE WHEN o_orderkey = (SELECT min(o_orderkey) FROM orders)
    THEN concat_ws('|', CAST(o_orderkey AS VARCHAR), CAST(o_custkey AS VARCHAR),
      o_orderstatus, o_orderpriority,
      CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) + 1 AS VARCHAR),
      strftime(o_orderdate, '%Y-%m-%d'))
    ELSE {_FP_ROW_DUCK} END AS row_str
  FROM orders
),
hm AS (
  SELECT ('0x' || substr(md5(row_str), 1, 15))::BIGINT AS h60,
    ('0x' || substr(md5(row_str), 17, 8))::BIGINT AS h32
  FROM mutated
),
dirty AS (
  SELECT CAST(bit_xor(h60) AS BIGINT) AS xor60, CAST(sum(h32) AS BIGINT) AS sum32
  FROM hm
)
SELECT c.n_rows, c.xor60, c.sum32,
  (c.xor60 <> d.xor60 OR c.sum32 <> d.sum32) AS corruption_detected
FROM clean c, dirty d
""",
    tags=("reconciliation", "fingerprint", "order-invariant", "mergeable"),
)
def rel_table_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    """Order-invariant table fingerprint — the anti-entropy primitive for
    verifying replicas/migrations at 100 TB without moving data: each
    row canonicalizes to a cross-engine-stable string (BIGINT casts,
    fixed-point money, formatted dates — never raw doubles, whose text
    rendering differs between engines), hashes once with md5, and the
    table collapses to (count, bit_xor of 60-bit hashes, sum of 32-bit
    hashes).  Both aggregates are order-invariant AND mergeable — xor
    and addition commute across partitions, shards, and clusters, so
    two sides of a replication fence each compute 24 bytes and compare.
    The pair covers each other's blind spots: xor misses even-count
    duplicate swaps, the 32-bit sum misses nothing short of engineered
    collisions but its signed-int64 accumulator can overflow alone at
    ~2^31 rows of ~2^32-sized terms (count bounds it; shard the sum or
    widen to decimal beyond that).  The query also fingerprints a replica
    with ONE cent corrupted on one row and emits
    ``corruption_detected`` — the single-bit-flip sensitivity the
    mechanism exists for, pinned behind the driver hash."""
    o = _t(spark, sf, "orders")
    row_str = F.expr(_FP_ROW)
    # Spark lacks DuckDB's 0x-prefix string->int cast; conv() is the
    # portable equivalent (same md5 hex, same integer)
    h60 = F.conv(F.substring(F.md5(row_str), 1, 15), 16, 10).cast("bigint")
    h32 = F.conv(F.substring(F.md5(row_str), 17, 8), 16, 10).cast("bigint")
    clean = o.agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.bit_xor(h60).cast("bigint").alias("xor60"),
        F.sum(h32).cast("bigint").alias("sum32"),
    )
    min_key = o.agg(F.min("o_orderkey").alias("mk"))
    mut_price = F.expr(
        "CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"
        " + CASE WHEN o_orderkey = mk THEN 1 ELSE 0 END AS STRING)"
    )
    mut_str = F.expr(
        "concat_ws('|', CAST(o_orderkey AS STRING), CAST(o_custkey AS STRING), "
        "o_orderstatus, o_orderpriority, mut_price_str, "
        "date_format(o_orderdate, 'yyyy-MM-dd'))"
    )
    mutated = (
        o.crossJoin(F.broadcast(min_key))
        .withColumn("mut_price_str", mut_price)
        .withColumn("row_str", mut_str)
    )
    mh60 = F.conv(F.substring(F.md5(F.col("row_str")), 1, 15), 16, 10).cast("bigint")
    mh32 = F.conv(F.substring(F.md5(F.col("row_str")), 17, 8), 16, 10).cast("bigint")
    dirty = mutated.agg(
        F.bit_xor(mh60).cast("bigint").alias("d_xor60"),
        F.sum(mh32).cast("bigint").alias("d_sum32"),
    )
    return clean.crossJoin(F.broadcast(dirty)).select(
        "n_rows",
        "xor60",
        "sum32",
        (
            (F.col("xor60") != F.col("d_xor60")) | (F.col("sum32") != F.col("d_sum32"))
        ).alias("corruption_detected"),
    )


# --- table maintenance: small-file compaction planning (round 7) --------------

_COMPACT_FILES = 499   # synthetic file inventory: orderkey mod buckets
_COMPACT_BINS = 40     # target bin count (target_bytes = total div 40 + 1)


@register(
    "rel_compaction_plan",
    sql=f"""
WITH files AS (
  SELECT o_orderkey % {_COMPACT_FILES} AS file_id,
    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
      AS size_bytes
  FROM orders GROUP BY 1
),
t AS (
  SELECT CAST(CAST(sum(size_bytes) AS BIGINT) // {_COMPACT_BINS} + 1 AS BIGINT)
    AS target FROM files
),
packed AS (
  SELECT file_id, size_bytes, t.target,
    CAST(sum(size_bytes) OVER (
      ORDER BY size_bytes DESC, file_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM files CROSS JOIN t
)
SELECT CAST((cum - 1) // target AS BIGINT) AS bin_id,
  CAST(count(*) AS BIGINT) AS n_files,
  CAST(sum(size_bytes) AS BIGINT) AS bin_bytes,
  CAST(max(size_bytes) AS BIGINT) AS max_file_bytes,
  CAST(min(target) AS BIGINT) AS target_bytes,
  CAST(CAST(sum(size_bytes) AS BIGINT) * 10000 // min(target) AS BIGINT)
    AS fill_e4
FROM packed GROUP BY 1 ORDER BY 1
""",
    tags=("maintenance", "compaction", "bin-packing", "distributed-cumsum"),
)
def rel_compaction_plan(spark: SparkSession, sf: str) -> DataFrame:
    """Small-file compaction planner — the table-maintenance pass every
    keyed-parquet / lakehouse layout needs once streaming ingest has
    sprayed thousands of under-sized files (the keyed sink's dynamic
    partition overwrites produce exactly this).  Files (here a synthetic
    but deterministic inventory: orderkey mod {_COMPACT_FILES} buckets,
    size = fixed-point byte proxy) are ordered size-DESC and packed by
    PREFIX SUM into target-sized rewrite bins: bin_id = (cum - 1) div
    target.  This is next-fit-decreasing relaxed for distribution — the
    only sequential state is the running sum, computed with the exact
    distributed cumsum (operators/ranking.py: range partition + offsets,
    no single-partition window), so planning a 10M-file inventory is one
    linear pass + one tiny shuffle.  Capacity bound is honest: a bin can
    overshoot target by less than its largest member file (fill_e4 makes
    the overshoot visible per bin); classic FFD packs ~equally well but
    is inherently sequential.  All arithmetic exact int64 on both
    engines."""
    from knowledgebot_spark.operators import ranking as rk

    o = _t(spark, sf, "orders")
    files = o.groupBy(
        (F.col("o_orderkey") % _COMPACT_FILES).alias("file_id")
    ).agg(
        F.sum(F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
        .cast("bigint")
        .alias("size_bytes")
    )
    tot = files.agg(
        F.expr(f"CAST(sum(size_bytes) div {_COMPACT_BINS} + 1 AS BIGINT)").alias(
            "target"
        )
    )
    sized = files.crossJoin(F.broadcast(tot))
    packed = rk.with_global_cumsum(
        sized,
        [F.col("size_bytes").desc(), F.col("file_id").asc()],
        F.col("size_bytes"),
        out="cum",
    )
    return (
        packed.withColumn("bin_id", F.expr("CAST((cum - 1) div target AS BIGINT)"))
        .groupBy("bin_id")
        .agg(
            F.count("*").cast("bigint").alias("n_files"),
            F.sum("size_bytes").cast("bigint").alias("bin_bytes"),
            F.max("size_bytes").cast("bigint").alias("max_file_bytes"),
            F.min("target").cast("bigint").alias("target_bytes"),
            F.expr("CAST(sum(size_bytes) * 10000 div min(target) AS BIGINT)").alias(
                "fill_e4"
            ),
        )
        .orderBy("bin_id")
    )


# --- reconciliation: row-level snapshot diff (round 7) -------------------------


@register(
    "rel_snapshot_diff",
    sql="""
WITH canon AS (
  SELECT o_orderkey AS k,
    substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) AS c1,
    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
    o_custkey, o_orderstatus, o_orderpriority,
    strftime(o_orderdate, '%Y-%m-%d') AS day
  FROM orders
),
base AS (
  SELECT k, concat_ws('|', CAST(k AS VARCHAR), CAST(o_custkey AS VARCHAR),
    o_orderstatus, o_orderpriority, CAST(cents AS VARCHAR), day) AS row_b
  FROM canon
),
replica AS (
  SELECT k, concat_ws('|', CAST(k AS VARCHAR), CAST(o_custkey AS VARCHAR),
    o_orderstatus, o_orderpriority,
    CAST(cents + (CASE WHEN c1 = 'f' THEN 1 ELSE 0 END) AS VARCHAR), day)
    AS row_r
  FROM canon WHERE c1 <> '0'
  UNION ALL
  SELECT k + 1099511627776,
    concat_ws('|', CAST(k + 1099511627776 AS VARCHAR), CAST(o_custkey AS VARCHAR),
    o_orderstatus, o_orderpriority, CAST(cents AS VARCHAR), day)
  FROM canon WHERE c1 = 'a'
),
diff AS (
  SELECT coalesce(b.k, r.k) AS k,
    CASE WHEN b.row_b IS NULL THEN 'added'
         WHEN r.row_r IS NULL THEN 'removed'
         WHEN b.row_b <> r.row_r THEN 'changed'
         ELSE 'unchanged' END AS change_type
  FROM base b FULL OUTER JOIN replica r ON b.k = r.k
)
SELECT change_type, CAST(count(*) AS BIGINT) AS n_rows,
  CAST(bit_xor(('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 15))::BIGINT)
    AS BIGINT) AS key_xor60
FROM diff GROUP BY 1 ORDER BY 1
""",
    tags=("reconciliation", "snapshot-diff", "full-outer-join", "cdc"),
)
def rel_snapshot_diff(spark: SparkSession, sf: str) -> DataFrame:
    """Row-level diff between two table snapshots — the drill-down
    companion to rel_table_fingerprint: the fingerprint says IN 24 BYTES
    whether two replicas agree; this query says WHICH keys were added,
    removed, or changed, and proves it with an order-invariant xor
    checksum of the key set per change class.  The replica is derived
    deterministically from the base (md5-keyed drift: 1/16 of keys
    deleted, 1/16 mutated by one cent, 1/16 duplicated under new keys
    offset by 2^40 — beyond any realistic orderkey range, so synthetic
    'added' keys can never collide with live keys and the join side
    stays unique at any SF), so both engines diff identical snapshots.  Shape: ONE full outer
    join on the snapshot key — both sides hash-partition by key, so at
    100 TB the diff is co-partitioned, skew-free (unique keys), and
    linear; bucketed/sorted snapshot layouts make it shuffle-free.  The
    canonical row string uses the fingerprint's cross-engine rules
    (fixed-point money, formatted dates, never raw doubles)."""
    raw = _t(spark, sf, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1).alias("c1"),
        F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").alias("cents"),
        "o_custkey",
        "o_orderstatus",
        "o_orderpriority",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"),
    )

    def row_str(k, cents):
        return F.concat_ws(
            "|",
            k.cast("string"),
            F.col("o_custkey").cast("string"),
            F.col("o_orderstatus"),
            F.col("o_orderpriority"),
            cents.cast("string"),
            F.col("day"),
        )

    base = raw.select("k", row_str(F.col("k"), F.col("cents")).alias("row_b"))
    kept = raw.filter(F.col("c1") != "0").select(
        "k",
        row_str(
            F.col("k"),
            F.col("cents") + (F.col("c1") == "f").cast("bigint"),
        ).alias("row_r"),
    )
    added = raw.filter(F.col("c1") == "a").select(
        (F.col("k") + (1 << 40)).alias("k"),
        row_str(F.col("k") + (1 << 40), F.col("cents")).alias("row_r"),
    )
    replica = kept.unionAll(added)
    diff = base.join(replica, "k", "full").select(
        "k",
        F.when(F.col("row_b").isNull(), "added")
        .when(F.col("row_r").isNull(), "removed")
        .when(F.col("row_b") != F.col("row_r"), "changed")
        .otherwise("unchanged")
        .alias("change_type"),
    )
    key_h = F.conv(F.substring(F.md5(F.col("k").cast("string")), 1, 15), 16, 10).cast(
        "bigint"
    )
    return (
        diff.groupBy("change_type")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.bit_xor(key_h).cast("bigint").alias("key_xor60"),
        )
        .orderBy("change_type")
    )


# --- dynamic partition pruning (round 7, wave 2) --------------------------------


@register(
    "rel_dpp_join",
    sql="""
SELECT strftime(o_orderdate, '%Y') AS order_year,
  CAST(count(*) AS BIGINT) AS n_orders,
  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
    AS revenue_e2
FROM orders
WHERE strftime(o_orderdate, '%Y') >= '1996'
GROUP BY 1 ORDER BY 1
""",
    tags=("scan", "partition-pruning", "dynamic", "join", "layout"),
)
def rel_dpp_join(spark: SparkSession, sf: str) -> DataFrame:
    """DYNAMIC partition pruning — the join-driven sibling of
    rel_partition_pruning's static case, and the bigger lever at 100 TB
    because real dashboards filter the DIMENSION, not the fact's
    partition column: the fact is the year-partitioned orders layout
    (same staged dataset), the filter lives on a small dim relation, and
    Catalyst inserts a runtime pruning subquery (``dynamicpruning#`` in
    the scan's PartitionFilters, asserted by tests/test_round7_ops.py)
    that reuses the broadcast to skip entire fact partitions BEFORE any
    fact I/O happens.  Without DPP this plan reads every year and throws
    most of it away at the join; with it, partition elimination tracks
    dim selectivity at runtime — no query rewrite, no manual predicate
    copying.  Values are oracled against the plain filtered aggregate;
    revenue is exact integer cents (no rounded-double sums)."""
    base = _stage_orders_by_year(spark, sf)
    o = _t(spark, sf, "orders")
    fact = spark.read.option("basePath", base).parquet(base)
    dim = (
        o.select(F.date_format("o_orderdate", "yyyy").alias("dim_year"))
        .distinct()
        .filter(F.col("dim_year") >= "1996")
    )
    return (
        fact.join(F.broadcast(dim), fact.order_year == dim.dim_year)
        .groupBy(F.col("order_year").cast("string").alias("order_year"))
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
            .cast("bigint")
            .alias("revenue_e2"),
        )
        .orderBy("order_year")
    )


# --- sketch-based join-size estimation (round 7, wave 2) ------------------------

_AMS_D = 4    # sketch rows (independent hash functions)
_AMS_W = 512  # cells per row


@register(
    "rel_join_cardinality_sketch",
    sql=f"""
WITH l AS (SELECT l_partkey AS k FROM lineitem),
exact AS (
  SELECT CAST(sum(c * c) AS BIGINT) AS exact_pairs
  FROM (SELECT count(*) AS c FROM l GROUP BY k)
),
cells AS (
  SELECT j, ('0x' || substr(md5('cm' || CAST(j AS VARCHAR) || '_'
      || CAST(k AS VARCHAR)), 1, 4))::INT % {_AMS_W} AS cell
  FROM l, generate_series(1, {_AMS_D}) AS t(j)
),
cm AS (
  SELECT j, cell, CAST(count(*) AS BIGINT) AS cnt FROM cells GROUP BY 1, 2
),
est AS (
  SELECT CAST(min(e) AS BIGINT) AS est_pairs
  FROM (SELECT j, sum(cnt * cnt) AS e FROM cm GROUP BY j)
)
SELECT exact_pairs, est_pairs,
  CAST(est_pairs * 10000 // exact_pairs AS BIGINT) AS over_ratio_e4,
  est_pairs >= exact_pairs AS est_ge_exact
FROM exact CROSS JOIN est
""",
    tags=("sketch", "join-cardinality", "f2", "ams", "mergeable"),
)
def rel_join_cardinality_sketch(spark: SparkSession, sf: str) -> DataFrame:
    """Self-join size (the second frequency moment F2 = sum of squared
    key frequencies) estimated from a Count-Min sketch inner product —
    the statistic a cost-based planner needs BEFORE attempting a join on
    a possibly-skewed key, answering 'how many pairs will this explode
    into?' without running the join.  The sketch is {_AMS_D} rows x
    {_AMS_W} md5-derived cells; est = min over rows of sum(cell^2),
    which is >= the true F2 by construction (collisions only ADD mass —
    the in-query est_ge_exact gate pins the guarantee) and close when
    the heavy keys dominate, exactly the regime where the estimate
    matters.  Shape: the sketch build is one (j, cell)-keyed hash agg
    whose map-side partials collapse every task to <= {_AMS_D}*{_AMS_W}
    rows — the shuffle is sketch-sized, not data-sized, and the sketch
    merges BY ADDITION across shards/days like the other sketch ops.
    The exact F2 (computed here as the oracle gate) costs a full
    key-keyed shuffle — the thing the sketch exists to avoid.  All
    exact int64; at 100x data the cells hold ~117k counts, squared sums
    ~7e12, far inside int64."""
    lkeys = _t(spark, sf, "lineitem").select(F.col("l_partkey").alias("k"))
    exact = (
        lkeys.groupBy("k")
        .agg(F.count("*").alias("c"))
        .agg(F.sum(F.expr("c * c")).cast("bigint").alias("exact_pairs"))
    )
    cells = lkeys.select(
        F.explode(F.sequence(F.lit(1), F.lit(_AMS_D))).alias("j"), "k"
    ).selectExpr(
        "j",
        "CAST(conv(substr(md5(concat('cm', CAST(j AS STRING), '_', "
        f"CAST(k AS STRING))), 1, 4), 16, 10) AS INT) % {_AMS_W} AS cell",
    )
    cm = cells.groupBy("j", "cell").agg(F.count("*").alias("cnt"))
    est = (
        cm.groupBy("j")
        .agg(F.sum(F.expr("cnt * cnt")).alias("e"))
        .agg(F.min("e").cast("bigint").alias("est_pairs"))
    )
    return exact.crossJoin(F.broadcast(est)).select(
        "exact_pairs",
        "est_pairs",
        F.expr("CAST(est_pairs * 10000 div exact_pairs AS BIGINT)").alias(
            "over_ratio_e4"
        ),
        (F.col("est_pairs") >= F.col("exact_pairs")).alias("est_ge_exact"),
    )


# --- schema evolution: mergeSchema reads (round 7, wave 3) -----------------------


@register(
    "rel_schema_evolution",
    sql="""
WITH src AS (
  SELECT o_orderkey,
    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
    strftime(o_orderdate, '%Y') AS y
  FROM orders
),
unioned AS (
  SELECT o_orderkey, cents, NULL AS priority_rank, 'v1' AS file_gen
  FROM src WHERE y < '1996'
  UNION ALL
  SELECT o_orderkey, cents, o_orderkey % 5 AS priority_rank, 'v2' AS file_gen
  FROM src WHERE y >= '1996'
)
SELECT file_gen,
  CAST(count(*) AS BIGINT) AS n_rows,
  CAST(count(priority_rank) AS BIGINT) AS n_with_new_col,
  CAST(sum(coalesce(priority_rank, -1)) AS BIGINT) AS rank_sum,
  CAST(sum(cents) AS BIGINT) AS cents_sum
FROM unioned GROUP BY 1 ORDER BY 1
""",
    tags=("scan", "schema-evolution", "mergeSchema", "layout"),
)
def rel_schema_evolution(spark: SparkSession, sf: str) -> DataFrame:
    """Read-side schema evolution — the lakehouse reality that a 100 TB
    table's old files were written BEFORE a column existed: generation v1
    (orders before 1996) is staged without ``priority_rank``, generation
    v2 (1996+) with it, and one ``mergeSchema`` read reconciles both —
    v1 rows surface the new column as NULL (count(priority_rank) proves
    exactly the v2 rows carry it), while every original column aggregates
    across generations unchanged.  This is the contract that lets a
    pipeline add columns WITHOUT rewriting history; writer-side evolution
    is the keyed sink's generation semantics (kb_ddl_roundtrip).  Stage
    writes once per sf dir (same idempotent guard as the other layout
    stages); the oracle states the same result as a UNION of the two
    generations' logical shapes."""
    import os

    base = (
        f"/tmp/knowledgebot_spark/fmt/{os.path.basename(sf.rstrip('/'))}"
        "/orders_two_gen"
    )
    o = _t(spark, sf, "orders").select(
        "o_orderkey",
        F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").alias("cents"),
        F.date_format("o_orderdate", "yyyy").alias("y"),
    )
    if not os.path.exists(os.path.join(base, "_STAGED")):
        (
            o.filter(F.col("y") < "1996")
            .select("o_orderkey", "cents", F.lit("v1").alias("file_gen"))
            .write.mode("overwrite")
            .parquet(f"{base}/gen=v1")
        )
        (
            o.filter(F.col("y") >= "1996")
            .select(
                "o_orderkey",
                "cents",
                (F.col("o_orderkey") % 5).alias("priority_rank"),
                F.lit("v2").alias("file_gen"),
            )
            # overwrite, NOT append: a crash between this write and the
            # _STAGED touch must reconverge on retry, not double gen=v2.
            .write.mode("overwrite")
            .parquet(f"{base}/gen=v2")
        )
        open(os.path.join(base, "_STAGED"), "w").close()
    merged = spark.read.option("mergeSchema", "true").parquet(
        f"{base}/gen=v1", f"{base}/gen=v2"
    )
    return (
        merged.groupBy("file_gen")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.count("priority_rank").cast("bigint").alias("n_with_new_col"),
            F.sum(F.coalesce(F.col("priority_rank"), F.lit(-1)))
            .cast("bigint")
            .alias("rank_sum"),
            F.sum("cents").cast("bigint").alias("cents_sum"),
        )
        .orderBy("file_gen")
    )
