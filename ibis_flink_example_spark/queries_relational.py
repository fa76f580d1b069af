"""Relational breadth queries (SURVEY.md §2 status=A rows): filters, scalar
expressions, grouped aggregation, joins (inner/outer/semi/anti/cross/theta/
range/as-of), sorts & top-k, set operations, ranking & analytic windows, and
scalar function suites — each as a (Spark, DuckDB-oracle) pair.

Determinism rules (see queries.py): decimal-exact double aggregation, total
tie-breaking on every ORDER BY that feeds row_number/limit, aggregates cast to
stable types on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ibis_flink_example_spark.catalog import load_table
from ibis_flink_example_spark.functions.exact import dec_avg, dec_sum, money
from ibis_flink_example_spark.operators.joins import asof_join, range_join
from ibis_flink_example_spark.queries import query

# ---------------------------------------------------------------------------
# P3/P4: filter + scalar expressions (SURVEY.md §2.2)
# ---------------------------------------------------------------------------


@query(
    "filter_shipped",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1998-01-01'
  AND l_shipdate < TIMESTAMP '1999-01-01'
  AND l_quantity < 25.0
""",
)
def filter_shipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: conjunctive predicate; pushes to the parquet scan (PushedFilters)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
        & (F.col("l_quantity") < 25.0)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


@query(
    "scalar_case_expr",
    oracle="""
SELECT
  l_orderkey,
  l_linenumber,
  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
  CASE
    WHEN l_quantity >= 40 THEN 'bulk'
    WHEN l_quantity >= 10 THEN 'mid'
    ELSE 'small'
  END AS qty_band,
  l_discount > 0.05 AS high_discount
FROM lineitem
""",
)
def scalar_case_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: arithmetic, CASE WHEN, boolean predicates as values."""
    li = load_table(spark, sf_dir, "lineitem")
    revenue = (money("l_extendedprice") * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))).cast(
        "double"
    )
    band = (
        F.when(F.col("l_quantity") >= 40, "bulk")
        .when(F.col("l_quantity") >= 10, "mid")
        .otherwise("small")
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        revenue.alias("revenue"),
        band.alias("qty_band"),
        (F.col("l_discount") > 0.05).alias("high_discount"),
    )


# ---------------------------------------------------------------------------
# A2-A4: grouped aggregation (SURVEY.md §2.4)
# ---------------------------------------------------------------------------


@query(
    "groupby_pricing_summary",
    oracle="""
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def groupby_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: multi-aggregate hash aggregation with partial/final
    map-side combine. All money math in exact decimals (order-independent)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc = F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    tax = F.lit(1) + F.col("l_tax").cast("decimal(4,2)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity", "sum_qty"),
            dec_sum("l_extendedprice", "sum_base_price"),
            F.sum(money("l_extendedprice") * disc).cast("double").alias("sum_disc_price"),
            F.sum(money("l_extendedprice") * disc * tax).cast("double").alias("sum_charge"),
            dec_avg("l_quantity", "avg_qty"),
            dec_avg("l_extendedprice", "avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "agg_stats_by_nation",
    oracle="""
SELECT
  n.n_name,
  COUNT(*) AS n_customers,
  CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(c.c_acctbal) AS avg_acctbal,
  MIN(c.c_acctbal) AS min_acctbal,
  MAX(c.c_acctbal) AS max_acctbal
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
)
def agg_stats_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 count/avg/min/max after a broadcast dim join."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dec_avg("c_acctbal", "avg_acctbal"),
            F.min("c_acctbal").alias("min_acctbal"),
            F.max("c_acctbal").alias("max_acctbal"),
        )
    )


@query(
    "count_distinct_status",
    oracle="""
SELECT
  o_orderstatus,
  COUNT(*) AS n_orders,
  COUNT(DISTINCT o_custkey) AS n_customers,
  COUNT(DISTINCT o_orderpriority) AS n_priorities
FROM orders
GROUP BY o_orderstatus
""",
)
def count_distinct_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 exact COUNT DISTINCT (expand + two-phase aggregation in Spark)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
    )


@query(
    "approx_distinct_users",
    # approx_count_distinct is HLL++ — hashing only, no RNG — so the
    # estimate is deterministic per fixture and PINNABLE (the
    # hll_daily_users_merge idiom; was rows-only through r7): the oracle
    # carries the SQL-exact per-type distinct count, the measured sketch
    # estimate keyed by the events fingerprint (every user appears under
    # every event_type in these fixtures, so one pin per fixture covers
    # all groups; an unknown fixture yields NULL → hash mismatch →
    # detected), and a 5%-bound claim (~5 sigma at rsd=0.01).
    oracle="""
WITH fp AS (
  SELECT substr(md5(string_agg(CAST(user_id AS VARCHAR), ',' ORDER BY event_id)), 1, 8) AS f
  FROM events
)
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       (SELECT CASE f WHEN '83d88810' THEN CAST(15 AS BIGINT)    -- sf0.001
                      WHEN 'f0fffe96' THEN CAST(151 AS BIGINT)   -- sf0.01
                      WHEN 'a6c6b681' THEN CAST(1507 AS BIGINT)  -- sf0.1
        END FROM fp) AS approx_users,
       TRUE AS within_5pct
FROM events
GROUP BY event_type
""",
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 approx_count_distinct (HyperLogLog++) next to the SQL-exact
    per-group distinct count and a data-computed 5% error-bound claim.
    At 100 TB the sketch replaces exact count-distinct wherever ~1%
    error is acceptable — single pass, constant memory, no expand; the
    exact leg here is the verification companion. The estimate itself is
    deterministic (hashing, no RNG) and oracle-pinned per fixture."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", 0.01).alias("approx_users"),
    ).select(
        "event_type",
        "exact_users",
        "approx_users",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= F.col("exact_users") * 0.05
        ).alias("within_5pct"),
    )


@query(
    "rollup_nation_region",
    oracle="""
SELECT
  r.r_name,
  n.n_name,
  COUNT(*) AS n_customers,
  CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name)
""",
)
def rollup_nation_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 hierarchical ROLLUP (region → nation → grand total)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return joined.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        dec_sum("c_acctbal", "sum_acctbal"),
    )


@query(
    "cube_platform_province",
    oracle="""
SELECT
  event_type,
  user_id % 4 AS user_bucket,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY CUBE (event_type, user_id % 4)
""",
)
def cube_platform_province(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 CUBE over two dimensions (all 4 grouping sets)."""
    e = load_table(spark, sf_dir, "events").withColumn(
        "user_bucket", F.col("user_id") % 4
    )
    return e.cube("event_type", "user_bucket").agg(
        F.count(F.lit(1)).alias("n_events"),
        dec_sum("value", "sum_value"),
    )


# ---------------------------------------------------------------------------
# J1-J6: joins (SURVEY.md §2.3)
# ---------------------------------------------------------------------------


@query(
    "join_customer_orders",
    oracle="""
SELECT
  c.c_mktsegment,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_totalprice
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
""",
)
def join_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 inner equi-join (fact->dim) + grouped agg. o_totalprice is NOT
    2-decimal-quantized, so we sum via DECIMAL(18,4): both engines round the
    same binary double to 4 decimals — deterministic — then sum exactly."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double").alias(
                "sum_totalprice"
            ),
        )
    )


@query(
    "join_broadcast_dims",
    oracle="""
SELECT n.n_name, r.r_name
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
""",
)
def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 explicit broadcast join of two tiny dims — no shuffle at any scale."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select("n_name", "r_name")


@query(
    "join_left_outer",
    oracle="""
SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey
""",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 left outer join preserving customers with zero orders."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "join_semi",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
)
""",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 left-semi join (EXISTS)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "join_anti",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
)
""",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 left-anti join (NOT EXISTS) — customers with no large order."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "join_cross",
    oracle="""
SELECT r.r_name, n.n_name
FROM region r CROSS JOIN nation n
""",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 cross join — only ever sane between dims (5 x 25 here); at scale one
    side must be broadcast-small, which Catalyst enforces via BNLJ."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@query(
    "join_theta",
    oracle="""
SELECT s.s_suppkey, c.c_custkey
FROM supplier s JOIN customer c
  ON s.s_nationkey = c.c_nationkey AND s.s_acctbal > c.c_acctbal
""",
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 equi-key + theta residual: executes as a hash join on nationkey with
    the inequality as post-filter — NOT a cartesian product."""
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    return s.join(
        c, (s.s_nationkey == c.c_nationkey) & (s.s_acctbal > c.c_acctbal)
    ).select("s_suppkey", "c_custkey")


@query(
    "range_join_events",
    oracle="""
SELECT
  a.event_id,
  COUNT(*) AS n_within_5m,
  CAST(SUM(CAST(b.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_within_5m
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND b.ts >= a.ts - INTERVAL 5 MINUTE
 AND b.ts <= a.ts
GROUP BY a.event_id
""",
)
def range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 time-bounded self join (the batch shape of a watermarked
    stream-stream interval join) + per-left-row aggregation. This join is
    also the declarative basis of the STREAMING flagship emulation."""
    e = load_table(spark, sf_dir, "events")
    pairs = range_join(
        e.select("event_id", "user_id", "ts"),
        e.select("user_id", F.col("ts").alias("rts"), "value"),
        by="user_id",
        left_time="ts",
        right_time="rts",
        lower_seconds=300,
        upper_seconds=0,
    )
    return pairs.groupBy("l.event_id").agg(
        F.count(F.lit(1)).alias("n_within_5m"),
        dec_sum("r.value", "sum_within_5m"),
    )


@query(
    "asof_join_clicks",
    oracle="""
WITH purchases AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
), clicks AS (
  SELECT user_id, ts, value FROM events WHERE event_type = 'click'
)
SELECT p.event_id, p.user_id, p.ts, c.value AS click_value
FROM purchases p
ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND c.ts <= p.ts
""",
)
def asof_join_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 as-of join: each purchase annotated with the most recent prior click
    value per user. Union + last_value implementation (operators/joins.py) —
    one shuffle, no pair explosion."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    out = asof_join(purchases, clicks, by="user_id", on="ts", right_cols=["value"])
    return out.select(
        "event_id", "user_id", "ts", F.col("value_right").alias("click_value")
    )


# ---------------------------------------------------------------------------
# O3: sort / top-k; set operations (SURVEY.md §2.6-2.7)
# ---------------------------------------------------------------------------


@query(
    "topk_orders",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
""",
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3 top-k: Catalyst rewrites to TakeOrderedAndProject (per-partition
    heap + driver merge — no global sort even at 100 TB). Tie-broken on the
    key so the result set is deterministic."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(10)
    )


@query(
    "set_union_all",
    oracle="""
SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
UNION ALL
SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier
""",
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("side")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("side")
    )
    return c.unionByName(s)


@query(
    "set_intersect",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "set_except",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    # subtract == SQL EXCEPT (set semantics); exceptAll would keep multiplicity
    return c.subtract(s)


# ---------------------------------------------------------------------------
# W4: ranking / analytic windows; ROWS frames (SURVEY.md §2.5)
# ---------------------------------------------------------------------------


@query(
    "window_ranking",
    oracle="""
SELECT
  o_orderkey,
  o_custkey,
  ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn,
  RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS pri_rank,
  DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS pri_dense_rank,
  NTILE(4) OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS quartile
FROM orders
""",
)
def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 ranking functions. row_number/ntile orderings are made total
    (tie-break on the key); rank/dense_rank deliberately rank a column WITH
    ties — deterministic by definition."""
    o = load_table(spark, sf_dir, "orders")
    w_total = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    w_pri = Window.partitionBy("o_custkey").orderBy("o_orderpriority")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w_total).alias("rn"),
        F.rank().over(w_pri).alias("pri_rank"),
        F.dense_rank().over(w_pri).alias("pri_dense_rank"),
        F.ntile(4).over(w_total).alias("quartile"),
    )


@query(
    "window_lag_lead",
    oracle="""
SELECT
  event_id,
  user_id,
  LAG(value) OVER w AS prev_value,
  LEAD(value) OVER w AS next_value,
  FIRST_VALUE(value) OVER w AS first_value,
  CAST(epoch_us(ts) - epoch_us(LAG(ts) OVER w) AS BIGINT) AS us_since_prev
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 analytic functions (lag/lead/first_value) + event-time deltas."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.first("value").over(w).alias("first_value"),
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))).alias(
            "us_since_prev"
        ),
    )


@query(
    "window_rows_moving_avg",
    oracle="""
SELECT
  event_id,
  user_id,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) / COUNT(*) OVER w AS moving_avg_3,
  COUNT(*) OVER w AS n_in_frame
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
""",
)
def window_rows_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 ROWS frame (physical offsets, vs the flagship's RANGE frame)."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        (F.sum(money("value")).over(w).cast("double") / F.count(F.lit(1)).over(w)).alias(
            "moving_avg_3"
        ),
        F.count(F.lit(1)).over(w).alias("n_in_frame"),
    )


# ---------------------------------------------------------------------------
# §2.8 scalar function suites
# ---------------------------------------------------------------------------


@query(
    "string_funcs",
    oracle="""
SELECT
  p_partkey,
  UPPER(p_brand) AS brand_upper,
  LOWER(p_type) AS type_lower,
  LENGTH(p_name) AS name_len,
  SUBSTRING(p_name, 1, 5) AS name_prefix,
  CONCAT(p_brand, ':', p_type) AS brand_type,
  REGEXP_EXTRACT(p_brand, '#([0-9]+)', 1) AS brand_num,
  STRING_SPLIT(p_name, ' ')[1] AS first_word,
  REPLACE(p_name, ' ', '_') AS name_snake,
  TRIM('  ' || p_name || ' ') AS name_trim
FROM part
""",
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.regexp_extract("p_brand", "#([0-9]+)", 1).alias("brand_num"),
        F.split(F.col("p_name"), " ").getItem(0).alias("first_word"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias("name_trim"),
    )


@query(
    "date_funcs",
    oracle="""
SELECT
  o_orderkey,
  CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS order_year,
  CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS order_month,
  CAST(EXTRACT(day FROM o_orderdate) AS INTEGER) AS order_day,
  DATE_TRUNC('month', o_orderdate) AS month_start,
  CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS due_ts,
  CAST(DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '2001-01-01') AS INTEGER) AS days_to_2001,
  STRFTIME(o_orderdate, '%Y-%m-%d') AS order_date_str
FROM orders
""",
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        (F.col("o_orderdate").cast("date") + F.expr("INTERVAL 30 DAYS"))
        .cast("timestamp")
        .alias("due_ts"),
        F.datediff(F.lit("2001-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_2001"
        ),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date_str"),
    )


@query(
    "math_funcs",
    oracle="""
SELECT
  l_orderkey,
  l_linenumber,
  ABS(l_quantity - 25.0) AS qty_dev,
  CAST(FLOOR(l_extendedprice / 1000) AS BIGINT) AS price_k_floor,
  CAST(CEIL(l_extendedprice / 1000) AS BIGINT) AS price_k_ceil,
  SQRT(l_extendedprice) AS price_sqrt,
  ROUND(LN(l_extendedprice), 6) AS price_ln,
  l_quantity * l_quantity AS qty_sq,
  l_extendedprice % 100 AS price_mod
FROM lineitem
WHERE l_extendedprice > 0
""",
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sqrt is IEEE-correctly-rounded (bit-exact across engines); ln is
    libm-dependent so it's rounded to 6 decimals on both sides."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_extendedprice") > 0).select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_quantity") - 25.0).alias("qty_dev"),
        F.floor(F.col("l_extendedprice") / 1000).alias("price_k_floor"),
        F.ceil(F.col("l_extendedprice") / 1000).alias("price_k_ceil"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
        (F.col("l_extendedprice") % 100).alias("price_mod"),
    )


@query(
    "array_funcs",
    oracle="""
SELECT
  vec_id,
  len(embedding) AS n_dims,
  CAST(embedding[1] AS DOUBLE) AS first_dim,
  ROUND(SQRT(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm,
  CAST(list_max(embedding) AS DOUBLE) AS max_dim
FROM embeddings
""",
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 array functions over the embedding column — all JVM-side
    (size/element_at/aggregate/array_max), no Python in the loop."""
    em = load_table(spark, sf_dir, "embeddings")
    sq_sum = F.aggregate(
        F.col("embedding"),
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    return em.select(
        "vec_id",
        F.size("embedding").alias("n_dims"),
        F.element_at("embedding", 1).cast("double").alias("first_dim"),
        F.round(F.sqrt(sq_sum), 6).alias("l2_norm"),
        F.array_max("embedding").cast("double").alias("max_dim"),
    )


# ---------------------------------------------------------------------------
# TPC-H-shaped headline queries (multi-join plans for the bench)
# ---------------------------------------------------------------------------


@query(
    "tpch_q3_shipping_priority",
    oracle="""
SELECT
  l.l_orderkey,
  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
  o.o_orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
  AND l.l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shape: selective dim filter -> fact join chain -> agg -> top-k."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    disc = F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(money("l_extendedprice") * disc).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "tpch_q5_local_supplier_volume",
    oracle="""
SELECT
  n.n_name,
  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
""",
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 shape: 6-table star join; dims broadcast, facts shuffle on keys."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    disc = F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(money("l_extendedprice") * disc).cast("double").alias("revenue"))
    )


@query(
    "grouping_sets_revenue",
    oracle="""
SELECT
  n.n_name,
  r.r_name,
  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY GROUPING SETS ((n.n_name), (r.r_name), ())
""",
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 explicit GROUPING SETS (beyond rollup/cube): per-nation totals,
    per-region totals, and the grand total in ONE pass over the fact join —
    Spark expands the sets into a single Expand + hash aggregate, so the
    fact side is scanned and shuffled once, not once per set. Dims broadcast.
    (DataFrame.groupingSets is the Spark 4 native API — no SQL detour.)"""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
    )
    return joined.groupingSets(
        [["n_name"], ["r_name"], []], "n_name", "r_name"
    ).agg(
        dec_sum("o_totalprice", "revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "udtf_props_kv",
    # DuckDB's json extension is unavailable offline, so the oracle parses
    # the fixture's single-key '{"k": <int>}' props with regexps — exactly
    # what the UDTF's json.loads yields on this data.
    oracle=r"""
SELECT
  e.event_id,
  regexp_extract(e.props, '"(\w+)"[ \t\n\r]*:', 1) AS prop_key,
  CAST(regexp_extract(e.props, ':[ \t\n\r]*(-?\d+)', 1) AS BIGINT) AS prop_value
FROM events e
""",
)
def udtf_props_kv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 Python UDTF surface (spark.udtf, Spark 3.5+/4.x): a lateral
    table function exploding each event's JSON props into (key, value) rows.

    UDTFs are row-at-a-time Python — the SLOW path (SURVEY §2.10); this
    entry exists for API-surface parity and correctness, with the idiomatic
    fast path being from_json + explode(map) (see json_decode). The lateral
    join shape itself is scale-safe: the UDTF runs per-partition with no
    shuffle."""
    import json

    from pyspark.sql.functions import udtf

    @udtf(returnType="prop_key string, prop_value long")
    class PropsExplode:
        def eval(self, props: str):
            if props:
                for k, v in json.loads(props).items():
                    yield k, int(v)

    from ibis_flink_example_spark.catalog import fan_out

    spark.udtf.register("props_explode", PropsExplode)
    # fan_out capped at 8: a single-row-group fixture file otherwise feeds
    # ONE Python worker — the UDTF stage is embarrassingly parallel, but
    # each partition forks a Python worker, so a handful is the sweet spot
    fan_out(load_table(spark, sf_dir, "events"), min_partitions=8).createOrReplaceTempView(
        "events_udtf_src"
    )
    return spark.sql(
        """
        SELECT e.event_id, t.prop_key, t.prop_value
        FROM events_udtf_src e, LATERAL props_explode(e.props) t
        """
    )


@query(
    "join_salted_skew",
    oracle="""
SELECT o.o_orderkey, c.c_name
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
""",
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 under manual skew salting (operators/joins.py salted_join): the
    join key becomes (custkey, salt-of-orderkey) with the customer side
    replicated per salt, spreading any hot customer over 8 reducers. The
    oracle is the PLAIN join — salting must be semantically invisible, and
    the hash-match proves it row-for-row. (At 100 TB: for the rare key too
    hot even for AQE's skew split; right side replicates, so use dim-sized
    or pre-filtered right sides.)"""
    from ibis_flink_example_spark.operators.joins import salted_join

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    return salted_join(
        o, c, on="o_custkey", salt=8, salt_by="o_orderkey"
    ).select("o_orderkey", "c_name")


@query(
    "map_funcs",
    oracle=r"""
SELECT
  event_id,
  1 AS n_keys,
  'k' AS first_key,
  CAST(regexp_extract(props, ':[ \t\n\r]*(-?\d+)', 1) AS BIGINT) AS k_value,
  CAST(regexp_extract(props, ':[ \t\n\r]*(-?\d+)', 1) AS BIGINT) * 2 AS k_doubled
FROM events
""",
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 map functions: from_json to MapType, map_keys/map_values/
    element_at/transform_values — the engine-side path for semi-structured
    props (vs the UDTF slow path in udtf_props_kv). The whole pipeline is
    JVM expressions; DuckDB's offline build lacks the json extension, so the
    oracle recomputes the fixture's single-key '{"k": n}' shape with
    regexps."""
    e = load_table(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), "map<string,bigint>")
    doubled = F.transform_values(m, lambda _, v: v * 2)
    return e.select(
        "event_id",
        F.size(F.map_keys(m)).alias("n_keys"),
        F.map_keys(m)[0].alias("first_key"),
        F.element_at(m, "k").alias("k_value"),
        F.element_at(doubled, "k").alias("k_doubled"),
    )


@query(
    "pivot_status_by_priority",
    oracle="""
SELECT
  o_orderpriority,
  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS "F",
  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS "O",
  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS "P",
  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS rev_F
FROM orders
GROUP BY o_orderpriority
""",
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 pivot: order counts per (priority x status) matrix plus one pivoted
    decimal-exact revenue cell. Explicit pivot values ('F','O','P') keep the
    plan single-pass (no extra distinct-values job) and the output schema
    static — both mandatory at 100 TB. Spark compiles pivot to the same
    conditional-aggregation the oracle spells out."""
    o = load_table(spark, sf_dir, "orders")
    counts = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    rev_f = o.groupBy("o_orderpriority").agg(
        F.sum(
            F.when(F.col("o_orderstatus") == "F", money("o_totalprice")).otherwise(
                F.lit(0).cast("decimal(18,2)")
            )
        )
        .cast("double")
        .alias("rev_F")
    )
    return counts.join(rev_f, "o_orderpriority").select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("F"),
        F.coalesce(F.col("O"), F.lit(0)).alias("O"),
        F.coalesce(F.col("P"), F.lit(0)).alias("P"),
        "rev_F",
    )


@query(
    "quantiles_by_flag",
    oracle="""
SELECT
  l_returnflag,
  quantile_cont(l_quantity, 0.25) AS qty_p25,
  quantile_cont(l_quantity, 0.5) AS qty_p50,
  quantile_cont(l_extendedprice, 0.9) AS price_p90
FROM lineitem
GROUP BY l_returnflag
""",
)
def quantiles_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 exact interpolated percentiles (SQL PERCENTILE_CONT semantics —
    verified bit-identical to DuckDB's quantile_cont: same lower +
    frac*(upper-lower) interpolation). Exact percentile sorts each group's
    values; at 100 TB prefer approx_percentile (t-digest sketch, single
    pass, mergeable) wherever rank error is tolerable — this entry is the
    exact baseline next to approx_distinct_users' sketch."""
    li = load_table(spark, sf_dir, "lineitem")
    # both l_quantity percentiles share ONE percentile buffer (array form)
    # — each extra buffer re-materializes the group's values, so this is a
    # ~2x cut on the aggregate's memory and sort work
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile("l_quantity", F.array(F.lit(0.25), F.lit(0.5))).alias("__q"),
            F.percentile("l_extendedprice", 0.9).alias("price_p90"),
        )
        .select(
            "l_returnflag",
            F.col("__q")[0].alias("qty_p25"),
            F.col("__q")[1].alias("qty_p50"),
            "price_p90",
        )
    )


@query(
    "nested_struct_json",
    oracle="""
SELECT
  o_orderkey,
  o_custkey AS key_from_struct,
  '{"o_orderkey":' || o_orderkey || ',"o_custkey":' || o_custkey || '}' AS as_json,
  CAST(len(o_orderpriority) AS INTEGER) AS prio_len
FROM orders
WHERE o_orderkey % 100 = 0
""",
)
def nested_struct_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§1.3 nested types: build a struct column, read a field back, and
    serialize it with to_json (integer fields only — engines format floats
    differently, which is a wire-format concern, not a semantic one). The
    struct stays columnar end-to-end (no shuffle, scan-side filter)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    st = F.struct("o_orderkey", "o_custkey")
    return o.select(
        "o_orderkey",
        st.getField("o_custkey").alias("key_from_struct"),
        F.to_json(st).alias("as_json"),
        F.length("o_orderpriority").alias("prio_len"),
    )


@query(
    "percentile_disc_by_flag",
    # percentile_disc(p) = MIN(x) among values whose cume_dist >= p. The
    # oracle spells that definition out with a window function instead of
    # DuckDB's quantile_disc, whose index rule differs from the SQL-standard
    # inverse distribution function at some (p, n) combinations.
    oracle="""
WITH cd AS (
  SELECT l_returnflag, l_quantity, l_extendedprice,
         cume_dist() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS cd_qty,
         cume_dist() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS cd_price
  FROM lineitem
)
SELECT l_returnflag,
  MIN(CASE WHEN cd_qty >= 0.5 THEN l_quantity END) AS qty_med_disc,
  MIN(CASE WHEN cd_price >= 0.9 THEN l_extendedprice END) AS price_p90_disc
FROM cd
GROUP BY l_returnflag
""",
)
def percentile_disc_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 SQL-standard inverse distribution functions: PERCENTILE_DISC
    WITHIN GROUP — the discrete counterpart of quantiles_by_flag's
    PERCENTILE_CONT. Discrete percentiles return an actual data value (no
    interpolation), so results are float-exact across engines by
    construction. Same scale posture as percentile: per-group sort; prefer
    approx_percentile sketches at 100 TB."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_pdisc_src")
    return spark.sql(
        """
        SELECT l_returnflag,
          percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity) AS qty_med_disc,
          percentile_disc(0.9) WITHIN GROUP (ORDER BY l_extendedprice) AS price_p90_disc
        FROM lineitem_pdisc_src
        GROUP BY l_returnflag
        """
    )


@query(
    "scalar_subquery_busy_customers",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE (SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey) > 20
""",
)
def scalar_subquery_busy_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§4 correlated scalar subquery: customers with more than 20 orders,
    written as a correlated COUNT subquery in the WHERE clause. Catalyst's
    RewriteCorrelatedScalarSubquery decorrelates it into a left outer
    aggregate join — the plan a 100 TB run needs (one shuffled agg + one
    join, never a per-row subquery execution). Integer-count comparison, so
    the oracle is float-free."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_ssq_src")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_ssq_src")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer_ssq_src c
        WHERE (SELECT COUNT(*) FROM orders_ssq_src o
               WHERE o.o_custkey = c.c_custkey) > 20
        """
    )


@query(
    "unpivot_lineitem_measures",
    oracle="""
SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS value
FROM lineitem WHERE l_orderkey % 50 = 0
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
FROM lineitem WHERE l_orderkey % 50 = 0
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
FROM lineitem WHERE l_orderkey % 50 = 0
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
FROM lineitem WHERE l_orderkey % 50 = 0
""",
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7-adjacent UNPIVOT (melt): wide measure columns to long
    (measure, value) rows — the inverse of pivot_status_by_priority.
    Spark's unpivot is a single Expand node (each input row emits 4 output
    rows in one pass — no self-union, no re-scan; the UNION ALL oracle
    re-scans per measure, which is exactly what Expand avoids at 100 TB)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 50 == 0)
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "value",
    )


@query(
    "approx_quantiles_value",
    # Full value oracle restored (was rows-only): while each group holds
    # fewer values than the sketch's accuracy budget, Greenwald-Khanna
    # degenerates to EXACT discrete quantiles — and Spark's "smallest value
    # such that no more than p·n values are <= it" convention is exactly
    # DuckDB's quantile_disc (verified at sf0.001 and sf0.01 on all
    # groups). accuracy=100_000 keeps the identity holding with margin at
    # every fixture SF (largest group ~20k rows at sf0.1); beyond that the
    # sketch earns its "approx" and the oracle would stop applying — which
    # is the point at which no exact engine can check it anyway.
    oracle="""
SELECT event_type,
  quantile_disc(value, 0.5) AS value_q50,
  quantile_disc(value, 0.95) AS value_q95
FROM events GROUP BY event_type
""",
)
def approx_quantiles_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 sketch family, quantile flavor: approx_percentile (Greenwald-
    Khanna) next to approx_distinct_users' HLL++. Single pass, mergeable
    partial sketches, bounded memory — the 100 TB default for quantiles;
    quantiles_by_flag / percentile_disc_by_flag are its exact baselines.
    The sketch is computed ONCE per group and the two quantiles projected
    out as scalar columns (array cells don't canonicalize in the driver
    compare); see the oracle comment for why the check is exact at
    fixture scale."""
    e = load_table(spark, sf_dir, "events")
    q = F.percentile_approx("value", F.array(F.lit(0.5), F.lit(0.95)), F.lit(100_000))
    return (
        e.groupBy("event_type")
        .agg(q.alias("__q"))
        .select(
            "event_type",
            F.element_at("__q", 1).alias("value_q50"),
            F.element_at("__q", 2).alias("value_q95"),
        )
    )


@query(
    "array_agg_priorities",
    oracle="""
SELECT o_custkey,
  array_to_string(list_sort(list(o_orderpriority)), ',') AS priorities,
  array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',') AS distinct_priorities,
  COUNT(*) AS n_orders
FROM orders
GROUP BY o_custkey
""",
)
def array_agg_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 collection aggregates: collect_list / collect_set per key.
    collect_list's element order is partition-arrival order — inherently
    nondeterministic under parallelism — so both engines SORT the arrays
    (sort_array / list_sort) to make the result well-defined; never ship an
    unsorted collect_list into a deterministic contract. Arrays stay small
    (orders per customer), the usual precondition for collecting at all;
    output serialized with array_join (the driver compare is scalar-typed)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.array_join(F.sort_array(F.collect_list("o_orderpriority")), ",").alias(
            "priorities"
        ),
        F.array_join(F.sort_array(F.collect_set("o_orderpriority")), ",").alias(
            "distinct_priorities"
        ),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "string_distance_parts",
    oracle="""
SELECT p_partkey,
  levenshtein(p_brand, p_type) AS brand_type_dist,
  levenshtein(p_name, p_type) AS name_type_dist
FROM part
WHERE levenshtein(p_brand, p_type) <= 12
""",
)
def string_distance_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 string distance: levenshtein edit distance (same DP algorithm in
    both engines — integer-exact). The fuzzy-match primitive for
    entity-resolution-style cleanup next to the hash/shingle dedup family."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.levenshtein("p_brand", "p_type").alias("brand_type_dist"),
        F.levenshtein("p_name", "p_type").alias("name_type_dist"),
    ).filter(F.col("brand_type_dist") <= 12)


@query(
    "bool_bit_aggs",
    oracle="""
SELECT o_orderpriority,
  bool_and(o_totalprice > 1000) AS all_above_1k,
  bool_or(o_orderstatus = 'F') AS any_finished,
  bit_xor(o_orderkey) AS key_xor,
  bit_and(o_orderkey) AS key_and,
  bit_or(o_orderkey) AS key_or
FROM orders
GROUP BY o_orderpriority
""",
)
def bool_bit_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 boolean/bitwise aggregates: bool_and/bool_or (EVERY/ANY) and
    bit_and/bit_or/bit_xor — order-independent integer/boolean reductions
    (fully map-side combinable; at 100 TB these cost one narrow shuffle of
    per-group 8-byte states). bit_xor over keys doubles as a cheap content
    checksum pattern for partition-level data validation."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_above_1k"),
        F.bool_or(F.col("o_orderstatus") == "F").alias("any_finished"),
        F.bit_xor("o_orderkey").alias("key_xor"),
        F.bit_and("o_orderkey").alias("key_and"),
        F.bit_or("o_orderkey").alias("key_or"),
    )


@query(
    "set_ops_multiset",
    oracle="""
SELECT 'intersect_all' AS op, l_suppkey AS suppkey
FROM (SELECT l_suppkey FROM lineitem WHERE l_linenumber <= 2
      INTERSECT ALL
      SELECT l_suppkey FROM lineitem WHERE l_linenumber >= 2)
UNION ALL
SELECT 'except_all' AS op, l_suppkey AS suppkey
FROM (SELECT l_suppkey FROM lineitem WHERE l_linenumber <= 2
      EXCEPT ALL
      SELECT l_suppkey FROM lineitem WHERE l_linenumber >= 2)
""",
)
def set_ops_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 multiset set operations: INTERSECT ALL keeps min(multiplicity),
    EXCEPT ALL subtracts multiplicities — bag semantics the DISTINCT
    variants (set_intersect/set_except) discard. Spark plans both as a
    single aggregate computing per-key counts on each side (one shuffle),
    not a join-per-duplicate."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_linenumber") <= 2).select(F.col("l_suppkey").alias("suppkey"))
    b = li.filter(F.col("l_linenumber") >= 2).select(F.col("l_suppkey").alias("suppkey"))
    ia = a.intersectAll(b).withColumn("op", F.lit("intersect_all"))
    ea = a.exceptAll(b).withColumn("op", F.lit("except_all"))
    return ia.unionByName(ea).select("op", "suppkey")


@query(
    "try_functions",
    oracle="""
SELECT
  o_orderkey,
  o_totalprice / NULLIF(o_orderkey % 3, 0) AS price_per_mod,
  TRY_CAST(SUBSTRING(o_orderpriority, 1, 1) AS INTEGER) AS priority_num,
  TRY_CAST(o_orderstatus AS INTEGER) AS status_as_int,
  CASE WHEN o_orderkey > 7 THEN NULL
       ELSE o_orderkey + 9223372036854775800 END AS key_plus_huge
FROM orders
""",
)
def try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 error-safe expression family (Spark ANSI mode): try_divide /
    try_cast / try_add return NULL instead of raising on division by zero,
    malformed casts, and long overflow. The 100 TB argument: one bad row
    must not kill a 6-hour job — try_* turns data errors into NULLs that
    downstream quality filters count and quarantine.

    Perf note (measured at sf0.1): try_cast/try_add surface NULL by
    CATCHING a JVM exception per failing row — ~10-25 µs each, which turns
    a 0.25 s scan into 4-6 s when the failure rate is ~100% (here: every
    o_orderstatus is non-numeric, every o_orderkey > 7 overflows the huge
    addend). The fix is the standard guarded form: a cheap codegen'd
    predicate (rlike / range check) routes rows that WOULD fail to NULL
    directly, keeping try_* as the backstop for the residue — the
    exception path stays exceptional, which is the only way try_* survives
    a 100 TB scan whose error rate is not ~0. The oracle spells the same
    semantics with NULLIF/TRY_CAST/CASE."""
    o = load_table(spark, sf_dir, "orders")
    max_addable = 9223372036854775807 - 9223372036854775800  # Long.MAX - addend
    return o.select(
        "o_orderkey",
        F.try_divide(F.col("o_totalprice"), F.col("o_orderkey") % 3).alias(
            "price_per_mod"
        ),
        F.substring("o_orderpriority", 1, 1)
        .try_cast("int")
        .alias("priority_num"),
        F.when(
            F.col("o_orderstatus").rlike(r"^[+-]?\d+$"),
            F.col("o_orderstatus").try_cast("int"),
        ).alias("status_as_int"),
        F.when(
            F.col("o_orderkey") <= max_addable,
            F.try_add(F.col("o_orderkey"), F.lit(9223372036854775800)),
        ).alias("key_plus_huge"),
    )


@query(
    "variant_props",
    oracle=r"""
SELECT
  event_id,
  CAST(regexp_extract(props, ':[ \t\n\r]*(-?\d+)', 1) AS BIGINT) AS k_value,
  CAST(regexp_extract(props, ':[ \t\n\r]*(-?\d+)', 1) AS BIGINT) IS NULL AS k_missing
FROM events
""",
)
def variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§1.3/§2.8 VARIANT (Spark 4): parse_json into the binary
    semi-structured type, then typed path extraction with
    try_variant_get — the open-schema alternative to from_json's fixed
    StructType/MapType (map_funcs). Variant keeps the parsed tree in a
    compact binary encoding, so repeated path access never re-parses the
    JSON text; DuckDB's offline build lacks the json extension, so the
    oracle recomputes the fixture's single-key shape with regexps."""
    e = load_table(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    k = F.try_variant_get(v, "$.k", "long")
    return e.select(
        "event_id",
        k.alias("k_value"),
        k.isNull().alias("k_missing"),
    )


@query(
    "window_distribution",
    oracle="""
SELECT
  o_orderkey,
  o_custkey,
  PERCENT_RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey) AS price_pct_rank,
  CUME_DIST() OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey) AS price_cume_dist
FROM orders
""",
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 distribution window functions: percent_rank + cume_dist per key —
    the relative-standing pair (where in the key's price distribution each
    order sits). Same single keyed exchange + sort as the ranking family;
    both are exact rationals of row counts, so cross-engine comparison is
    bit-exact."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.percent_rank().over(w).alias("price_pct_rank"),
        F.cume_dist().over(w).alias("price_cume_dist"),
    )


@query(
    "filtered_aggs",
    oracle="""
SELECT
  o_orderpriority,
  COUNT(*) FILTER (o_orderstatus = 'F') AS n_finished,
  COUNT(*) FILTER (o_orderstatus = 'O') AS n_open,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (o_orderstatus = 'F') AS DOUBLE) AS finished_price,
  COUNT(*) AS n_total
FROM orders
GROUP BY o_orderpriority
""",
)
def filtered_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 conditional aggregation: per-predicate partial counts/sums in ONE
    aggregate pass (count_if / FILTER semantics) — the pivot-lite shape for
    status breakdowns that avoids N scans or an explode. Single shuffle,
    all map-side-combinable."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count_if(F.col("o_orderstatus") == "F").alias("n_finished"),
        F.count_if(F.col("o_orderstatus") == "O").alias("n_open"),
        F.sum(
            F.when(F.col("o_orderstatus") == "F", money("o_totalprice"))
        ).cast("double").alias("finished_price"),
        F.count(F.lit(1)).alias("n_total"),
    )


@query(
    "exists_subquery_customers",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
)
AND NOT EXISTS (
  SELECT 1 FROM orders o2
  WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F'
)
""",
)
def exists_subquery_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS through the SQL surface: Catalyst
    decorrelates both into semi/anti joins (never a per-row subquery
    execution) — customers with a big order but no finished orders. Uses
    spark.sql over registered views (S6 raw-SQL path) to exercise subquery
    planning, not the DataFrame semi/anti API (join_semi/join_anti cover
    that form)."""
    from ibis_flink_example_spark.catalog import register_views

    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
        )
        AND NOT EXISTS (
          SELECT 1 FROM orders o2
          WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F'
        )
        """
    )


@query(
    "posexplode_priorities",
    oracle="""
WITH a AS (
  SELECT o_custkey,
    list_sort(list(o_orderpriority)) AS pris
  FROM orders
  WHERE o_custkey % 100 = 0
  GROUP BY o_custkey
)
SELECT o_custkey,
  CAST(i - 1 AS INTEGER) AS pos,
  pris[i] AS pri
FROM a, UNNEST(range(1, len(pris) + 1)) AS t(i)
""",
)
def posexplode_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 positional explode (LATERAL VIEW posexplode): 1:N expansion that
    carries the element index — the ordinality-preserving inverse of
    collect_list. The array is sorted first so positions are well-defined
    under parallel aggregation."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 100 == 0)
    agged = o.groupBy("o_custkey").agg(
        F.sort_array(F.collect_list("o_orderpriority")).alias("pris")
    )
    return agged.select(
        "o_custkey", F.posexplode("pris").alias("pos", "pri")
    )


@query(
    "agg_salted_skew",
    oracle="""
SELECT event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY event_type
""",
)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation for pathologically hot group keys: salt
    each row into 16 sub-keys, pre-aggregate per (key, salt) — spreading one
    hot key's partial state over 16 reducers — then merge partials per key.
    SUM/COUNT are mergeable, so the rewrite is exact (oracle = plain GROUP
    BY). This is the manual analog of what AQE's skew handling cannot do
    for aggregations (it only splits JOIN partitions); at 100 TB a single
    key holding 30% of rows otherwise serializes on one reducer. Here
    events has only 5 event types over 32 shuffle partitions — exactly the
    hot-key shape."""
    e = load_table(spark, sf_dir, "events")
    salted = e.withColumn("__salt", F.pmod(F.xxhash64("event_id"), F.lit(16)))
    partial = salted.groupBy("event_type", "__salt").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(money("value")).alias("__s"),
    )
    return partial.groupBy("event_type").agg(
        F.sum("__n").alias("n_events"),
        F.sum("__s").cast("double").alias("sum_value"),
    )


@query(
    "join_null_safe",
    oracle="""
WITH l AS (
  SELECT event_id, NULLIF(event_type, 'error') AS etype, value FROM events
  WHERE event_id % 20 = 0
), r AS (
  SELECT NULLIF(event_type, 'error') AS etype, COUNT(*) AS n_type
  FROM events GROUP BY 1
)
SELECT l.event_id, l.etype, r.n_type
FROM l JOIN r ON l.etype IS NOT DISTINCT FROM r.etype
""",
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 null-safe equality (<=> / IS NOT DISTINCT FROM): NULL keys MATCH
    each other instead of silently dropping — the semantics quality
    pipelines want when joining on nullable enrichment keys (a plain
    equi-join makes every NULL-keyed row vanish). Spark hashes the null-safe
    key like any other, so the join stays a hash join, not a cartesian."""
    e = load_table(spark, sf_dir, "events")
    l = e.filter(F.col("event_id") % 20 == 0).select(
        "event_id", F.nullif(F.col("event_type"), F.lit("error")).alias("etype"), "value"
    ).alias("l")
    r = (
        e.select(F.nullif(F.col("event_type"), F.lit("error")).alias("etype"))
        .groupBy("etype")
        .agg(F.count(F.lit(1)).alias("n_type"))
    ).alias("r")
    return l.join(r, F.col("l.etype").eqNullSafe(F.col("r.etype"))).select(
        "l.event_id", "l.etype", "r.n_type"
    )


@query(
    "recursive_customer_hierarchy",
    # Recursive CTE (WITH RECURSIVE landed in Spark 4): both engines walk
    # the identical decimal-digit parent chain custkey -> custkey DIV 10
    # until the single-digit root. DuckDB's // is integer division (its /
    # yields DOUBLE), mirroring Spark's DIV.
    oracle="""
WITH RECURSIVE chain AS (
  SELECT c_custkey AS custkey, CAST(c_custkey AS BIGINT) AS node, 0 AS depth
  FROM customer
  UNION ALL
  SELECT custkey, node // 10, depth + 1 FROM chain WHERE node >= 10
), final AS (
  SELECT custkey, node AS root, depth FROM chain WHERE node < 10
)
SELECT CAST(depth AS BIGINT) AS depth, CAST(root AS BIGINT) AS root,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM final GROUP BY 1, 2
""",
)
def recursive_customer_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE over real data (SQL surface beyond the reference's
    Ibis API — hierarchy walks are the classic warehouse query DataFrame
    chains cannot express): every customer's decimal-digit parent chain
    (custkey -> custkey DIV 10) walked to its single-digit root, then
    rolled up by (depth, root). Iteration count is bounded by
    log10(max key) — Spark materializes each recursion step as a plan
    stage, so the total work is ~7 passes over a shrinking frontier, never
    an unbounded loop. Output ~60 rows."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "rec_customer_v"
    )
    return spark.sql(
        """
WITH RECURSIVE chain AS (
  SELECT c_custkey AS custkey, CAST(c_custkey AS BIGINT) AS node, 0 AS depth
  FROM rec_customer_v
  UNION ALL
  SELECT custkey, node DIV 10, depth + 1 FROM chain WHERE node >= 10
), final AS (
  SELECT custkey, node AS root, depth FROM chain WHERE node < 10
)
SELECT CAST(depth AS BIGINT) AS depth, CAST(root AS BIGINT) AS root,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM final GROUP BY 1, 2
"""
    )


@query(
    "lateral_top_customers",
    # LATERAL correlated subquery (per-nation top-2 by balance) — the
    # explicit-decorrelation surface next to the window-function top-k.
    # Both engines order by the raw double balance (identical total order
    # on non-NaN doubles) with custkey as the deterministic tiebreak.
    oracle="""
SELECT n.n_name, c.c_custkey,
       CAST(CAST(c.c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal
FROM nation n
JOIN LATERAL (
  SELECT c_custkey, c_acctbal
  FROM customer
  WHERE c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_custkey ASC
  LIMIT 2
) c ON TRUE
""",
)
def lateral_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL join (correlated subquery in the FROM clause): each
    nation's top-2 customers by account balance. Catalyst decorrelates
    this into the same WindowGroupLimit shape as the rank-filter idiom —
    the point is API parity: SQL users write LATERAL, and the engine must
    plan it without a per-nation re-scan (the naive interpretation is
    |nation| scans of customer; the decorrelated plan is ONE scan + one
    partitioned group-limit)."""
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("lat_nation_v")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("lat_customer_v")
    return spark.sql(
        """
SELECT n.n_name, c.c_custkey,
       CAST(CAST(c.c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal
FROM lat_nation_v n
JOIN LATERAL (
  SELECT c_custkey, c_acctbal
  FROM lat_customer_v
  WHERE c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_custkey ASC
  LIMIT 2
) c
"""
    )
