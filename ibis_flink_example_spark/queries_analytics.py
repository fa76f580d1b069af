"""Event-journey analytics queries (funnel + cohort retention) over the
``events`` fixture — the per-user complement of the reference's per-event
trailing window (reference: window_aggregation.py:73-80 aggregates around
each event; these aggregate along each user's ordered journey).

The funnel oracle is deliberately a DIFFERENT formulation (chained
min-over-join CTEs) from the Spark implementation (running-min window
algebra): both compute the same standard funnel semantics, so a hash match
cross-checks the semantics, not just the arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ibis_flink_example_spark.catalog import load_table
from ibis_flink_example_spark.operators import funnel as FN
from ibis_flink_example_spark.queries import query

_FUNNEL_STEPS = ["view", "click", "purchase"]


# Independent join-chain formulation of the funnel semantics: t1 =
# min(view); t2 = min(click with ts > t1); t3 = min(purchase with ts >
# t2); stage count = users with t_k non-null. Shared by the batch query
# and the streaming twin (queries_streaming.py).
FUNNEL_ORACLE = """
WITH t1 AS (
  SELECT user_id, MIN(ts) AS t FROM events WHERE event_type = 'view' GROUP BY 1
), t2 AS (
  SELECT e.user_id, MIN(e.ts) AS t
  FROM events e JOIN t1 ON e.user_id = t1.user_id
  WHERE e.event_type = 'click' AND e.ts > t1.t
  GROUP BY 1
), t3 AS (
  SELECT e.user_id, MIN(e.ts) AS t
  FROM events e JOIN t2 ON e.user_id = t2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > t2.t
  GROUP BY 1
)
SELECT 'view' AS stage, 1 AS stage_idx, (SELECT COUNT(*) FROM t1) AS n_users
UNION ALL
SELECT 'click', 2, (SELECT COUNT(*) FROM t2)
UNION ALL
SELECT 'purchase', 3, (SELECT COUNT(*) FROM t3)
"""


@query("funnel_view_click_purchase", oracle=FUNNEL_ORACLE)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence funnel view → click → purchase: users counted at
    each stage, where each stage's event must occur strictly after the
    user's previous-stage completion. Spark side is single-shuffle window
    algebra (operators/funnel.py); the oracle is the k-way join chain —
    two independent formulations of the standard funnel definition."""
    events = load_table(spark, sf_dir, "events")
    return FN.funnel_counts(events, _FUNNEL_STEPS)


@query(
    "cohort_retention_weekly",
    oracle="""
WITH f AS (
  SELECT user_id, MIN(ts) AS first_ts FROM events GROUP BY 1
), a AS (
  SELECT e.user_id,
    date_trunc('week', f.first_ts) AS cohort_week,
    CAST(date_diff('day',
      CAST(date_trunc('week', f.first_ts) AS DATE),
      CAST(date_trunc('week', e.ts) AS DATE)) // 7 AS INTEGER) AS week_offset
  FROM events e JOIN f ON e.user_id = f.user_id
)
SELECT cohort_week, week_offset, COUNT(DISTINCT user_id) AS n_active_users
FROM a GROUP BY 1, 2
""",
)
def cohort_retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort-retention triangle: users bucketed by first-event week,
    distinct-counted per activity-week offset. One user-keyed shuffle
    (reused between the first-event aggregation and the join) plus the
    (cohort, offset) rollup."""
    events = load_table(spark, sf_dir, "events")
    return FN.cohort_retention(events, period="week")


@query(
    "event_transitions",
    oracle="""
WITH o AS (
  SELECT event_type,
    LEAD(event_type) OVER (
      PARTITION BY user_id ORDER BY ts ASC, event_id ASC
    ) AS next_event
  FROM events
), c AS (
  SELECT event_type, next_event, COUNT(*) AS n_transitions
  FROM o WHERE next_event IS NOT NULL GROUP BY 1, 2
)
SELECT event_type, next_event, n_transitions,
  CAST(n_transitions AS DOUBLE) /
    CAST(CAST(SUM(n_transitions) OVER (PARTITION BY event_type) AS BIGINT)
      AS DOUBLE) AS p_transition
FROM c
""",
)
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over user journeys: lead()
    pairing on one user-keyed exchange, (from, to) rollup, per-source
    probability over the |event_types|² aggregate. p_transition is one
    double division of two exact counts — engine-exact."""
    events = load_table(spark, sf_dir, "events")
    return FN.event_transitions(events)


# Integer-cents z-test: z² > 3² ⇔ (n·x − s)² > 9·(n·q − s²); see
# operators/funnel.py:trailing_anomaly_flags for the derivation. Shared by
# the batch query and the streaming twin (queries_streaming.py) — both
# reproduce the batch semantics exactly on a drained in-order run.
ANOMALY_ZSCORE_ORACLE = """
WITH c AS (
  SELECT event_id, user_id, ts, value,
    CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), w AS (
  SELECT event_id, user_id, value, cents,
    COUNT(*) OVER win AS n,
    CAST(COALESCE(SUM(cents) OVER win, 0) AS BIGINT) AS s,
    CAST(COALESCE(SUM(cents * cents) OVER win, 0) AS BIGINT) AS q
  FROM c
  WINDOW win AS (
    PARTITION BY user_id ORDER BY ts ASC, event_id ASC
    ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING
  )
)
SELECT event_id, user_id, value,
  CAST(n AS INTEGER) AS n_prior,
  (n >= 5 AND
   (n * cents - s) * (n * cents - s) > 9 * (n * q - s * s)) AS is_anomaly
FROM w
"""


@query("events_anomaly_zscore", oracle=ANOMALY_ZSCORE_ORACLE)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window anomaly detection: each event tested against the
    mean ± 3σ of the user's previous 20 events — the monitoring companion
    of the reference's trailing SUM (same ROWS frame; reference
    window_aggregation.py:73-80). The z-test runs entirely in integer
    cents, so the flag is bit-identical across engines and partition
    orders. One user-keyed exchange; window math stays in codegen."""
    events = load_table(spark, sf_dir, "events")
    return FN.trailing_anomaly_flags(events)


@query(
    "attribution_last_touch",
    oracle="""
WITH w AS (
  SELECT event_id, user_id, ts, event_type,
    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
               IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
    ) AS touch_type,
    last_value(CASE WHEN event_type <> 'purchase' THEN ts END
               IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
    ) AS touch_ts
  FROM events
)
SELECT event_id, user_id, ts,
  CASE WHEN touch_ts IS NOT NULL
        AND ts - touch_ts <= INTERVAL 7 DAY THEN touch_type END
    AS attributed_to,
  (touch_ts IS NOT NULL AND ts - touch_ts <= INTERVAL 7 DAY)
    AS is_attributed
FROM w WHERE event_type = 'purchase'
""",
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing attribution: each purchase credited to the user's LAST
    preceding non-purchase touch within a 7-day window. last_value(...
    IGNORE NULLS) over a ROWS prefix frame finds the touch in one pass on
    the same user-keyed exchange the journey operators share — no
    self-join, no per-purchase subquery (which would be quadratic at
    100 TB). The purchase filter happens after the window (Catalyst cannot
    push it through), but column pruning holds the scan to 4 columns."""
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    non_purchase = F.col("event_type") != "purchase"
    touch_type = F.last(
        F.when(non_purchase, F.col("event_type")), ignorenulls=True
    ).over(w)
    touch_ts = F.last(
        F.when(non_purchase, F.col("ts")), ignorenulls=True
    ).over(w)
    # exact-µs comparison — cast("long") would truncate to seconds and
    # diverge from the oracle's INTERVAL arithmetic for sub-second gaps
    in_window = touch_ts.isNotNull() & (
        F.unix_micros(F.col("ts")) - F.unix_micros(touch_ts)
        <= 7 * 24 * 3600 * 1_000_000
    )
    return (
        events.select(
            "event_id",
            "user_id",
            "ts",
            "event_type",
            F.when(in_window, touch_type).alias("attributed_to"),
            in_window.alias("is_attributed"),
        )
        .where(F.col("event_type") == "purchase")
        .drop("event_type")
    )


def with_session_seq(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """The ONE definition of batch session assignment (gaps-and-islands on
    the user key): gap flag (lag) → running-sum session sequence. Shared
    by sessionize_stats, top_event_paths, and mirrored by the streaming
    twin — the 30-min session rule must never fork. Returns the events
    frame plus a ``session_seq`` column; all stages share one user-keyed
    exchange."""
    from pyspark.sql.window import Window

    ordered = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    gap_us = gap_minutes * 60 * 1_000_000
    prev_ts = F.lag("ts").over(ordered)
    new_session = (
        prev_ts.isNull()
        | (F.unix_micros(F.col("ts")) - F.unix_micros(prev_ts) > gap_us)
    ).cast("int")
    running = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.withColumn("session_seq", F.sum(new_session).over(running))


@query(
    "sessionize_stats",
    oracle="""
WITH g AS (
  SELECT user_id, event_id, ts, value,
    CASE WHEN lag(ts) OVER w IS NULL
           OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END
      AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
), s AS (
  SELECT user_id, ts, value,
    CAST(SUM(new_session) OVER (
      PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS BIGINT) AS session_seq
  FROM g
)
SELECT user_id, session_seq,
  MIN(ts) AS session_start,
  MAX(ts) AS session_end,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM s GROUP BY 1, 2
""",
)
def sessionize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit session-ID assignment (30-min inactivity gap) + per-session
    stats — the row-level complement of the session_window aggregate
    (which emits windows, not session membership). Gaps-and-islands on the
    user key: gap flag (lag) → running-sum session sequence → session
    rollup, all sharing ONE user-keyed exchange (hash(user) clusters
    (user, session) for free — same plan shape as the SCD2 build)."""
    from ibis_flink_example_spark.functions.exact import dec_sum

    events = load_table(spark, sf_dir, "events")
    with_seq = with_session_seq(events).select(
        "user_id", "ts", "value", "session_seq"
    )
    return with_seq.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        dec_sum("value", "sum_value"),
    )


@query(
    "rolling_wau",
    oracle="""
WITH d AS (
  SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
  FROM events
), ex AS (
  SELECT day + CAST(o.o AS INTEGER) AS obs_day, user_id
  FROM d, (SELECT unnest(range(0, 7)) AS o) o
), days AS (SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS obs_day FROM events)
SELECT CAST(ex.obs_day AS TIMESTAMP) AS obs_day,
  CAST(COUNT(DISTINCT ex.user_id) AS BIGINT) AS wau
FROM ex JOIN days USING (obs_day)
GROUP BY 1
""",
)
def rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users per day — the exact distributed form:
    each (day, user) pair is expanded to the 7 observation days it
    counts toward (a bounded map-side ×7 explode of the DEDUPLICATED
    day-user pairs, not raw events), then one (day → distinct user)
    rollup. The interval-join alternative re-scans events per day; a
    per-day HLL loses exactness. Observation days are restricted to days
    that actually occur in the data (same as the oracle)."""
    events = load_table(spark, sf_dir, "events")
    day_user = events.select(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"), "user_id"
    ).distinct()
    expanded = day_user.select(
        F.explode(
            F.sequence(F.lit(0), F.lit(6))
        ).alias("o"),
        "day",
        "user_id",
    ).select(F.date_add(F.col("day"), F.col("o")).alias("obs_day"), "user_id")
    days = events.select(
        F.date_trunc("day", F.col("ts")).cast("date").alias("obs_day")
    ).distinct()
    return (
        expanded.join(F.broadcast(days), "obs_day")
        .groupBy("obs_day")
        .agg(F.countDistinct("user_id").alias("wau"))
        # DATE maps to pandas object on the Spark side but datetime64 via
        # DuckDB — emit TIMESTAMP on both sides for a comparable dtype
        .select(
            F.col("obs_day").cast("timestamp").alias("obs_day"), "wau"
        )
    )


@query(
    "market_basket_pairs",
    oracle="""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
)
SELECT part_a, part_b, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM pairs GROUP BY 1, 2
HAVING COUNT(*) >= 2
ORDER BY n_orders DESC, part_a ASC, part_b ASC LIMIT 50
""",
)
def market_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket analysis: top co-purchased part pairs with support
    >= 2 orders. The within-order self-join is NATURALLY bounded (a TPC-H
    order has <= 7 line items → <= 21 pairs), so unlike document-shingle
    joins no hot-key cap is needed — the orderkey join key's fan-out is
    structurally limited. Pair counting shuffles on (part_a, part_b) with
    map-side partials; the top-50 plans as TakeOrderedAndProject, never a
    global sort over the pair space."""
    items = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = items.alias("a"), items.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("part_a"),
        F.col("b.l_partkey").alias("part_b"),
    )
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .where(F.col("n_orders") >= 2)
        .orderBy(
            F.col("n_orders").desc(), F.col("part_a").asc(), F.col("part_b").asc()
        )
        .limit(50)
    )


@query(
    "stats_corr_price_qty",
    # Bivariate statistics with NO catastrophic cancellation: every sum is
    # DECIMAL over integer cents, and the centered second moments are the
    # EXACT integer differences Dxy = n*sxy - sx*sy (DECIMAL(38,0) /
    # HUGEINT — fits: |n*sxy| < 2e24), computed BEFORE any double cast.
    # A float `sxx - sx*sx/n` chain would cancel catastrophically on
    # near-constant columns (sx^2 > 2^53); here each D suffers exactly one
    # rounding (the final int->double cast), and the closing divisions are
    # the identical chain in both engines — bit-equal AND accurate.
    oracle="""
WITH m AS (
  SELECT l_returnflag,
    COUNT(*) AS n,
    SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS sx,
    SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS sy,
    SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
        * CAST(round(l_quantity * 100) AS BIGINT)) AS sxy,
    SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
        * CAST(round(l_extendedprice * 100) AS BIGINT)) AS sxx,
    SUM(CAST(round(l_quantity * 100) AS BIGINT)
        * CAST(round(l_quantity * 100) AS BIGINT)) AS syy
  FROM lineitem GROUP BY 1
), d AS (
  SELECT l_returnflag, n,
    CAST(n * sxy - sx * sy AS DOUBLE) AS dxy,
    CAST(n * sxx - sx * sx AS DOUBLE) AS dxx,
    CAST(n * syy - sy * sy AS DOUBLE) AS dyy
  FROM m
)
SELECT l_returnflag, CAST(n AS BIGINT) AS n,
  dxy / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) / 10000.0 AS covar_samp,
  dxy / sqrt(dxx * dyy) AS corr_price_qty,
  dxy / dyy / 100.0 AS regr_slope_price_on_qty
FROM d
""",
)
def stats_corr_price_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate aggregate statistics (corr / sample covariance / OLS
    slope) of extended price vs quantity per return flag. Spark's builtin
    corr()/covar_samp() accumulate doubles in partition order
    (nondeterministic across runs, unmatchable across engines), so the
    moments are exact DECIMAL sums of integer cents — one partial-
    aggregated groupBy, map-side combine, 6 numeric columns over the scan —
    and the centered differences n*sxy - sx*sy stay in EXACT integer
    arithmetic until one final cast (no raw-moment cancellation; the
    algebra-vs-numpy agreement is property-tested). covar/slope rescaled
    to dollar/unit terms; corr's scale factors cancel."""
    li = load_table(spark, sf_dir, "lineitem")
    from ibis_flink_example_spark.functions.exact import cents

    px, qy = cents("l_extendedprice"), cents("l_quantity")
    dec = lambda col: F.sum(col.cast("decimal(38,0)"))  # noqa: E731
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        dec(px).alias("sx"),
        dec(qy).alias("sy"),
        dec(px * qy).alias("sxy"),
        dec(px * px).alias("sxx"),
        dec(qy * qy).alias("syy"),
    )
    nd = F.col("n").cast("decimal(38,0)")
    d = m.select(
        "l_returnflag",
        "n",
        (nd * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double").alias("dxy"),
        (nd * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double").alias("dxx"),
        (nd * F.col("syy") - F.col("sy") * F.col("sy")).cast("double").alias("dyy"),
    )
    dn = F.col("n").cast("double")
    return d.select(
        "l_returnflag",
        "n",
        (F.col("dxy") / (dn * (dn - F.lit(1.0))) / F.lit(10000.0)).alias("covar_samp"),
        (F.col("dxy") / F.sqrt(F.col("dxx") * F.col("dyy"))).alias("corr_price_qty"),
        (F.col("dxy") / F.col("dyy") / F.lit(100.0)).alias("regr_slope_price_on_qty"),
    )


@query(
    "date_spine_daily_revenue",
    # The gap-filling shape: a generated calendar spine LEFT-joined with
    # the daily rollup so zero-activity days appear with explicit zeros.
    oracle="""
WITH b AS (
  SELECT CAST(date_trunc('day', MIN(o_orderdate)) AS DATE) AS lo,
         CAST(date_trunc('day', MAX(o_orderdate)) AS DATE) AS hi
  FROM orders
), spine AS (
  SELECT CAST(UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day FROM b
), d AS (
  SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
    CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1
)
SELECT CAST(spine.day AS TIMESTAMP) AS day,
  COALESCE(d.revenue, 0.0) AS revenue,
  COALESCE(d.n_orders, 0) AS n_orders
FROM spine LEFT JOIN d USING (day)
""",
)
def date_spine_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-spine gap filling: daily order revenue over the FULL
    min..max date range, zero-filled for days with no orders — the
    timeseries-regularization step every downstream window/forecast op
    assumes. The spine is generated from the (1-row) bounds aggregate with
    sequence+explode — no driver collect — and both join sides are
    day-cardinality, so the daily rollup broadcasts to the preserved spine
    (the non-preserved side is the only one a BroadcastHashJoin can
    build); the only data-sized shuffle is the rollup's own day-keyed
    exchange."""
    from ibis_flink_example_spark.functions.exact import dec_sum

    orders = load_table(spark, sf_dir, "orders")
    day = F.date_trunc("day", F.col("o_orderdate")).cast("date")
    bounds = orders.agg(
        F.min(day).alias("lo"), F.max(day).alias("hi")
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("day")
    )
    daily = orders.groupBy(day.alias("day")).agg(
        dec_sum("o_totalprice", "revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    # spine is the PRESERVED side of the outer join, and BroadcastHashJoin
    # can only build the NON-preserved side — so the broadcast hint goes on
    # daily (equally day-cardinality, so equally tiny). A hint on spine
    # would be silently ignored and plan a shuffle join.
    return (
        spine.join(F.broadcast(daily), "day", "left")
        .select(
            F.col("day").cast("timestamp").alias("day"),
            F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
            F.coalesce("n_orders", F.lit(0).cast("long")).alias("n_orders"),
        )
    )


@query(
    "gap_fill_locf",
    # Forward fill (last observation carried forward) on the user x day
    # grid: per-user daily closing value, holes filled from the most
    # recent prior day. Pure picks (no cross-row float arithmetic).
    oracle="""
WITH b AS (
  SELECT CAST(date_trunc('day', MIN(ts)) AS DATE) AS lo,
         CAST(date_trunc('day', MAX(ts)) AS DATE) AS hi
  FROM events
), spine AS (
  SELECT CAST(UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day FROM b
), u AS (SELECT DISTINCT user_id FROM events),
daily AS (
  SELECT user_id, day, value FROM (
    SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day, value,
      ROW_NUMBER() OVER (
        PARTITION BY user_id, CAST(date_trunc('day', ts) AS DATE)
        ORDER BY ts DESC, event_id DESC
      ) AS rn
    FROM events
  ) WHERE rn = 1
)
SELECT g.user_id, CAST(g.day AS TIMESTAMP) AS day,
  last_value(d.value IGNORE NULLS) OVER (
    PARTITION BY g.user_id ORDER BY g.day
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS value_filled,
  d.value IS NOT NULL AS is_observed
FROM (SELECT u.user_id, spine.day FROM u CROSS JOIN spine) g
LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day
""",
)
def gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCF forward fill: each user's daily closing event value carried
    forward across no-activity days on the full calendar spine. Daily
    close = max of the (ts, event_id, value) struct — one keyed exchange
    with map-side partials, deterministic tiebreak — then the user x day
    grid (the op's inherent output size) left-joins observations and a
    per-user ordered window fills holes with last(ignorenulls). Days
    before a user's first observation stay NULL (nothing to carry)."""
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).cast("date")
    daily = (
        events.groupBy("user_id", day.alias("day"))
        .agg(F.max(F.struct("ts", "event_id", "value")).alias("m"))
        .select("user_id", "day", F.col("m.value").alias("value"))
    )
    bounds = events.agg(F.min(day).alias("lo"), F.max(day).alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("day")
    )
    users = events.select("user_id").distinct()
    grid = users.join(F.broadcast(spine))
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("day").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            F.col("day").cast("timestamp").alias("day"),
            F.last("value", ignorenulls=True).over(w).alias("value_filled"),
            F.col("value").isNotNull().alias("is_observed"),
        )
    )


@query(
    "running_distinct_users",
    # Cumulative distinct = rollup of FIRST-SEEN days (each user counted
    # on exactly one day), then a running sum over the tiny day axis —
    # the exact distributed form; a naive per-day COUNT(DISTINCT u WHERE
    # day <= d) rescans events once per day.
    oracle="""
WITH fs AS (
  SELECT user_id, MIN(CAST(date_trunc('day', ts) AS DATE)) AS day
  FROM events GROUP BY 1
), nu AS (
  SELECT day, CAST(COUNT(*) AS BIGINT) AS new_users FROM fs GROUP BY 1
), days AS (
  SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day FROM events
)
SELECT CAST(days.day AS TIMESTAMP) AS day,
  COALESCE(nu.new_users, 0) AS new_users,
  CAST(SUM(COALESCE(nu.new_users, 0)) OVER (
    ORDER BY days.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS BIGINT) AS cumulative_users
FROM days LEFT JOIN nu USING (day)
""",
)
def running_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per active day. The distinct-over-prefix
    is rewritten as first-seen-day attribution (min(day) per user — one
    user-keyed exchange over deduplicated pairs) + a day-level rollup;
    the final running sum orders only the DAY axis (bounded cardinality —
    an unpartitioned window over the post-aggregation frame, not over
    events)."""
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).cast("date")
    first_seen = events.groupBy("user_id").agg(F.min(day).alias("day"))
    new_users = first_seen.groupBy("day").agg(
        F.count(F.lit(1)).alias("new_users")
    )
    days = events.select(day.alias("day")).distinct()
    w = Window.orderBy(F.col("day").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    nu = F.coalesce("new_users", F.lit(0).cast("long"))
    return (
        days.join(new_users, "day", "left")
        .select(
            F.col("day").cast("timestamp").alias("day"),
            nu.alias("new_users"),
            F.sum(nu).over(w).alias("cumulative_users"),
        )
    )


@query(
    "conversion_latency_stats",
    # Funnel latency distribution: per converting user the view -> first
    # subsequent purchase delay; percentiles are DISCRETE order statistics
    # (rank selection on exact integer microseconds — engine-exact, no
    # interpolation ulp risk), the mean is one double division at the end.
    oracle="""
WITH t1 AS (
  SELECT user_id, MIN(ts) AS t FROM events WHERE event_type = 'view' GROUP BY 1
), t2 AS (
  SELECT e.user_id, MIN(e.ts) AS t
  FROM events e JOIN t1 ON e.user_id = t1.user_id
  WHERE e.event_type = 'purchase' AND e.ts > t1.t
  GROUP BY 1
), d AS (
  SELECT epoch_us(t2.t) - epoch_us(t1.t) AS delay_us
  FROM t2 JOIN t1 ON t2.user_id = t1.user_id
), r AS (
  SELECT delay_us, ROW_NUMBER() OVER (ORDER BY delay_us) AS rk FROM d
), a AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
    CAST(MIN(delay_us) AS DOUBLE) / 1000000.0 AS min_s,
    CAST(MAX(delay_us) AS DOUBLE) / 1000000.0 AS max_s,
    CAST(SUM(delay_us) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1000000.0 AS avg_s
  FROM d
)
SELECT a.n_converted, a.min_s,
  (SELECT CAST(delay_us AS DOUBLE) / 1000000.0 FROM r
    WHERE rk = (a.n_converted + 1) // 2) AS p50_s,
  (SELECT CAST(delay_us AS DOUBLE) / 1000000.0 FROM r
    WHERE rk = (9 * a.n_converted + 9) // 10) AS p90_s,
  a.max_s, a.avg_s
FROM a
""",
)
def conversion_latency_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution (first view -> first subsequent
    purchase): count, min/max, discrete p50/p90, mean — the funnel-health
    scalar row next to funnel_view_click_purchase's stage counts. Delays
    are exact integer microseconds; percentiles select order statistics by
    rank (ceil(q*n) with integer arithmetic), so no interpolation ever
    mixes floats. The rank window orders only the per-user delay frame
    (one row per converting user, post-aggregation). Always returns
    exactly ONE row — zero conversions yield NULL stats, not zero rows."""
    return conversion_latency_impl(load_table(spark, sf_dir, "events"))


def conversion_latency_impl(events: DataFrame) -> DataFrame:
    from pyspark.sql.window import Window

    t1 = (
        events.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    t2 = (
        events.join(t1, "user_id")
        .where((F.col("event_type") == "purchase") & (F.col("ts") > F.col("t1")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    # Materialize the (tiny: one row per converting user) delay frame once —
    # aggs + both rank probes reuse it instead of re-running the events
    # scan and joins per branch. Caller-release contract as elsewhere: the
    # checkpoint blocks live as long as the returned plan.
    delays = (
        t2.join(t1, "user_id")
        .select(
            (F.unix_micros("t2") - F.unix_micros("t1")).alias("delay_us")
        )
        .localCheckpoint(eager=True)
    )
    ranked = delays.select(
        "delay_us",
        F.row_number().over(Window.orderBy(F.col("delay_us").asc())).alias("rk"),
    )
    aggs = delays.agg(
        F.count(F.lit(1)).alias("n_converted"),
        (F.min("delay_us").cast("double") / 1_000_000.0).alias("min_s"),
        (F.max("delay_us").cast("double") / 1_000_000.0).alias("max_s"),
        (
            F.sum("delay_us").cast("double")
            / F.count(F.lit(1)).cast("double")
            / 1_000_000.0
        ).alias("avg_s"),
    )
    sec = (F.col("delay_us").cast("double") / 1_000_000.0)
    # LEFT joins so zero conversions still yields the oracle's single row
    # (rk=0 matches nothing -> NULL percentiles, like the scalar subqueries)
    p50 = (
        aggs.select(((F.col("n_converted") + 1) / 2).cast("long").alias("rk"))
        .join(ranked, "rk", "left")
        .select(sec.alias("p50_s"))
    )
    p90 = (
        aggs.select(((9 * F.col("n_converted") + 9) / 10).cast("long").alias("rk"))
        .join(ranked, "rk", "left")
        .select(sec.alias("p90_s"))
    )
    return (
        aggs.crossJoin(p50)
        .crossJoin(p90)
        .select("n_converted", "min_s", "p50_s", "p90_s", "max_s", "avg_s")
    )


@query(
    "ab_value_ttest",
    # Welch two-sample t over exact integer-cents moments: one conditional-
    # aggregation pass splits variants; the centered moments Da = na*ssa -
    # sa^2 and the mean-difference numerator Dm = sa*nb - sb*na stay in
    # EXACT DECIMAL/HUGEINT integer arithmetic until a single double cast
    # (no raw-moment or mean-difference cancellation), then an identical
    # double chain closes t and the Welch df in both engines.
    oracle="""
WITH m AS (
  SELECT
    COUNT(*) FILTER (user_id % 2 = 0) AS na,
    COUNT(*) FILTER (user_id % 2 = 1) AS nb,
    SUM(CAST(round(value * 100) AS BIGINT)) FILTER (user_id % 2 = 0) AS sa,
    SUM(CAST(round(value * 100) AS BIGINT)) FILTER (user_id % 2 = 1) AS sb,
    SUM(CAST(round(value * 100) AS BIGINT) * CAST(round(value * 100) AS BIGINT))
      FILTER (user_id % 2 = 0) AS ssa,
    SUM(CAST(round(value * 100) AS BIGINT) * CAST(round(value * 100) AS BIGINT))
      FILTER (user_id % 2 = 1) AS ssb
  FROM events
), v AS (
  SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
    CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) / 100.0 AS mean_a,
    CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) / 100.0 AS mean_b,
    CAST(na * ssa - sa * sa AS DOUBLE)
      / (CAST(na AS DOUBLE) * CAST(na AS DOUBLE) * (CAST(na AS DOUBLE) - 1.0))
      AS va_n,
    CAST(nb * ssb - sb * sb AS DOUBLE)
      / (CAST(nb AS DOUBLE) * CAST(nb AS DOUBLE) * (CAST(nb AS DOUBLE) - 1.0))
      AS vb_n,
    CAST(sa * nb - sb * na AS DOUBLE)
      / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS dm_cents
  FROM m
)
SELECT n_a, n_b, mean_a, mean_b,
  dm_cents / sqrt(va_n + vb_n) AS t_stat,
  (va_n + vb_n) * (va_n + vb_n)
    / (va_n * va_n / (CAST(n_a AS DOUBLE) - 1.0)
       + vb_n * vb_n / (CAST(n_b AS DOUBLE) - 1.0)) AS df_welch
FROM v
""",
)
def ab_value_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: Welch's unequal-variance t-statistic for
    event value between two deterministic user buckets (user_id parity —
    the assignment rule is part of the query so the oracle reproduces it).
    ONE conditional-aggregation pass over events computes both variants'
    exact integer-cents moments (no per-variant rescan, no shuffle beyond
    the single global agg); the centered moments and the mean-difference
    numerator stay in exact integer arithmetic until one double cast
    (cancellation-free — property-tested against numpy), and the t/df
    chain is identical in both engines. The cents scale cancels inside t
    (both dm_cents and sqrt(v) carry cents)."""
    from ibis_flink_example_spark.functions.exact import cents

    events = load_table(spark, sf_dir, "events")
    c = cents("value")
    is_a = F.col("user_id") % 2 == 0
    dec = lambda col: F.sum(col.cast("decimal(38,0)"))  # noqa: E731
    m = events.agg(
        F.count(F.when(is_a, 1)).alias("na"),
        F.count(F.when(~is_a, 1)).alias("nb"),
        dec(F.when(is_a, c)).alias("sa"),
        dec(F.when(~is_a, c)).alias("sb"),
        dec(F.when(is_a, c * c)).alias("ssa"),
        dec(F.when(~is_a, c * c)).alias("ssb"),
    )
    nad, nbd = (
        F.col("na").cast("decimal(38,0)"),
        F.col("nb").cast("decimal(38,0)"),
    )
    dna, dnb = F.col("na").cast("double"), F.col("nb").cast("double")
    v = m.select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        (F.col("sa").cast("double") / dna / F.lit(100.0)).alias("mean_a"),
        (F.col("sb").cast("double") / dnb / F.lit(100.0)).alias("mean_b"),
        (
            (nad * F.col("ssa") - F.col("sa") * F.col("sa")).cast("double")
            / (dna * dna * (dna - F.lit(1.0)))
        ).alias("va_n"),
        (
            (nbd * F.col("ssb") - F.col("sb") * F.col("sb")).cast("double")
            / (dnb * dnb * (dnb - F.lit(1.0)))
        ).alias("vb_n"),
        (
            (F.col("sa") * nbd - F.col("sb") * nad).cast("double") / (dna * dnb)
        ).alias("dm_cents"),
    )
    se = F.col("va_n") + F.col("vb_n")
    return v.select(
        "n_a",
        "n_b",
        "mean_a",
        "mean_b",
        (F.col("dm_cents") / F.sqrt(se)).alias("t_stat"),
        (
            se * se
            / (
                F.col("va_n") * F.col("va_n") / (F.col("n_a").cast("double") - F.lit(1.0))
                + F.col("vb_n") * F.col("vb_n") / (F.col("n_b").cast("double") - F.lit(1.0))
            )
        ).alias("df_welch"),
    )


@query(
    "ntile_acctbal_quartiles",
    # ntile inside nation partitions (SQL-standard larger-groups-first
    # split, deterministic under the total (acctbal, custkey) order), then
    # a per-(nation, quartile) rollup.
    oracle="""
WITH q AS (
  SELECT c_nationkey, c_acctbal,
    ntile(4) OVER (
      PARTITION BY c_nationkey ORDER BY c_acctbal ASC, c_custkey ASC
    ) AS quartile
  FROM customer
)
SELECT c_nationkey, CAST(quartile AS INTEGER) AS quartile,
  CAST(COUNT(*) AS BIGINT) AS n_customers,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal,
  MIN(c_acctbal) AS min_acctbal,
  MAX(c_acctbal) AS max_acctbal
FROM q GROUP BY 1, 2
""",
)
def ntile_acctbal_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Account-balance quartiles per nation via ntile(4) — the bucketing
    window the distribution family (percent_rank/cume_dist in
    window_distribution) doesn't cover. Partitioned by nation so the sort
    is per-partition (never a global total order); custkey tiebreak makes
    tile assignment deterministic; quartile rollup reuses the same
    nation-keyed exchange."""
    from pyspark.sql.window import Window

    from ibis_flink_example_spark.functions.exact import dec_sum

    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc()
    )
    q = cust.select(
        "c_nationkey", "c_acctbal", F.ntile(4).over(w).alias("quartile")
    )
    return q.groupBy("c_nationkey", "quartile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        dec_sum("c_acctbal", "sum_acctbal"),
        F.min("c_acctbal").alias("min_acctbal"),
        F.max("c_acctbal").alias("max_acctbal"),
    )


@query(
    "item_similarity_topk",
    # Cosine similarity between parts from co-purchase counts:
    # sim = co / sqrt(n_a * n_b) — all three inputs exact integers, one
    # identical double chain per pair; the float orders only the top-k cut
    # and ties break on the integer key pair.
    oracle="""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), np AS (
  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n FROM items GROUP BY 1
), co AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
    CAST(COUNT(*) AS BIGINT) AS n_co
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= 2
)
SELECT co.part_a, co.part_b, co.n_co,
  CAST(co.n_co AS DOUBLE)
    / sqrt(CAST(na.n AS DOUBLE) * CAST(nb.n AS DOUBLE)) AS cosine_sim
FROM co JOIN np na ON co.part_a = na.l_partkey
        JOIN np nb ON co.part_b = nb.l_partkey
ORDER BY cosine_sim DESC, part_a ASC, part_b ASC LIMIT 20
""",
)
def item_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative similarity: cosine between parts over the
    order-basket incidence (the recommender building block on top of the
    market-basket pairs). Pair generation is structurally bounded (<= 21
    pairs/order); per-part counts join back broadcast-eligible; the top-20
    plans as TakeOrderedAndProject — never a global pair-space sort.

    The deduplicated incidence is localCheckpoint-ed: it feeds FOUR plan
    subtrees (both self-join sides + both count joins) and Spark plans no
    ReusedExchange across them, so without materialization the table would
    be scanned and deduplicated four times. 16 bytes/row held once beats
    4x the scan at any scale; blocks live as long as the returned plan
    (caller-release contract as elsewhere)."""
    items = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .localCheckpoint(eager=True)
    )
    np_ = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n"))
    a, b = items.alias("a"), items.alias("b")
    co = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_co"))
        .where(F.col("n_co") >= 2)
    )
    na = np_.select(F.col("l_partkey").alias("part_a"), F.col("n").alias("na"))
    nb = np_.select(F.col("l_partkey").alias("part_b"), F.col("n").alias("nb"))
    sim = (
        co.join(na, "part_a")
        .join(nb, "part_b")
        .select(
            "part_a",
            "part_b",
            "n_co",
            (
                F.col("n_co").cast("double")
                / F.sqrt(F.col("na").cast("double") * F.col("nb").cast("double"))
            ).alias("cosine_sim"),
        )
    )
    return sim.orderBy(
        F.col("cosine_sim").desc(), F.col("part_a").asc(), F.col("part_b").asc()
    ).limit(20)


@query(
    "relational_division_customers",
    # Relational division ("FOR ALL"): customers whose orders span EVERY
    # priority class — the set-containment quotient, via the standard
    # distinct-count == universe-count rewrite (no nested NOT EXISTS).
    oracle="""
WITH u AS (
  SELECT CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_all FROM orders
), pc AS (
  SELECT o_custkey,
    CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_priorities
  FROM orders GROUP BY 1
)
SELECT pc.o_custkey, pc.n_priorities
FROM pc CROSS JOIN u WHERE pc.n_priorities = u.n_all
""",
)
def relational_division_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational division: customers who have ordered under ALL existing
    priority classes. The double-NOT-EXISTS formulation re-correlates per
    candidate; the scalable rewrite is two aggregations over ONE scan
    shape — per-customer distinct-priority counts vs the (1-row,
    cross-joined) universe count."""
    orders = load_table(spark, sf_dir, "orders")
    universe = orders.agg(
        F.countDistinct("o_orderpriority").alias("n_all")
    )
    per_cust = orders.groupBy("o_custkey").agg(
        F.countDistinct("o_orderpriority").alias("n_priorities")
    )
    return (
        per_cust.crossJoin(F.broadcast(universe))
        .where(F.col("n_priorities") == F.col("n_all"))
        .select("o_custkey", "n_priorities")
    )


@query(
    "mode_priority_by_nation",
    # Exact MODE with a deterministic tiebreak (highest count, then
    # lexicographically smallest value) — the argmax idiom that stays
    # engine-exact where a builtin mode()'s tie choice would not.
    oracle="""
WITH cnt AS (
  SELECT c.c_nationkey, o.o_orderpriority,
    CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
)
SELECT c_nationkey, o_orderpriority AS mode_priority, n_orders
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY c_nationkey ORDER BY n_orders DESC, o_orderpriority ASC
  ) AS rk FROM cnt
) WHERE rk = 1
""",
)
def mode_priority_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most common order priority per customer nation — exact mode via
    count + rank-1 selection with a total tiebreak order (count desc,
    value asc), so ties resolve identically in any engine. The orders →
    customer join broadcasts the dimension side; the mode window rides the
    count aggregation's nation partitioning."""
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    cnt = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_nationkey", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("n_orders").desc(), F.col("o_orderpriority").asc()
    )
    return (
        cnt.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "c_nationkey",
            F.col("o_orderpriority").alias("mode_priority"),
            "n_orders",
        )
    )


@query(
    "top_event_paths",
    # Clickstream path analysis: the first 3 event types of every session
    # (30-min gaps) concatenated into a path string, global top-20 paths.
    # concat_ws skips NULLs identically in both engines, so short sessions
    # fold to their natural prefix.
    oracle="""
WITH g AS (
  SELECT user_id, event_id, ts, event_type,
    CASE WHEN lag(ts) OVER w IS NULL
           OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END
      AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
), seq AS (
  SELECT user_id, event_id, ts, event_type,
    CAST(SUM(new_session) OVER (
      PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS BIGINT) AS session_seq
  FROM g
), s AS (
  SELECT user_id, event_type, session_seq,
    ROW_NUMBER() OVER (
      PARTITION BY user_id, session_seq ORDER BY ts ASC, event_id ASC
    ) AS rn
  FROM seq
), p AS (
  SELECT user_id, session_seq,
    concat_ws('>',
      MAX(CASE WHEN rn = 1 THEN event_type END),
      MAX(CASE WHEN rn = 2 THEN event_type END),
      MAX(CASE WHEN rn = 3 THEN event_type END)) AS path
  FROM s WHERE rn <= 3 GROUP BY 1, 2
)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM p GROUP BY 1
ORDER BY n_sessions DESC, path ASC LIMIT 20
""",
)
def top_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top session-opening event paths (first 3 event types per 30-min
    session) — the clickstream path-analysis rollup on the same
    gaps-and-islands frame as sessionize_stats. Path assembly is
    conditional-aggregation (MAX(CASE rn)) — never an order-sensitive
    collect_list — and the top-20 plans as TakeOrderedAndProject. All
    session work shares ONE user-keyed exchange."""
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    with_seq = with_session_seq(events).select(
        "user_id", "ts", "event_id", "event_type", "session_seq"
    )
    rn = F.row_number().over(
        Window.partitionBy("user_id", "session_seq").orderBy(
            F.col("ts").asc(), F.col("event_id").asc()
        )
    )
    first3 = with_seq.withColumn("rn", rn).where(F.col("rn") <= 3)
    paths = first3.groupBy("user_id", "session_seq").agg(
        F.concat_ws(
            ">",
            F.max(F.when(F.col("rn") == 1, F.col("event_type"))),
            F.max(F.when(F.col("rn") == 2, F.col("event_type"))),
            F.max(F.when(F.col("rn") == 3, F.col("event_type"))),
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), F.col("path").asc())
        .limit(20)
    )


@query(
    "benford_leading_digit",
    # Benford's-law data-quality screen: leading-digit distribution of
    # order totals. Digit extraction goes through INTEGER cents rendered
    # as a decimal string (float-to-string formatting differs between
    # engines; integer formatting does not).
    oracle="""
WITH d AS (
  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1)
              AS INTEGER) AS digit
  FROM orders WHERE o_totalprice > 0
), t AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM d)
SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_orders,
  CAST(COUNT(*) AS DOUBLE) / CAST(t.total AS DOUBLE) AS frac
FROM d CROSS JOIN t GROUP BY digit, t.total
""",
)
def benford_leading_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law screen over order totals — the classic fraud /
    synthetic-data smell test, as a one-exchange digit rollup. The digit
    comes from the integer-cents decimal rendering (engine-stable, unlike
    float formatting); the denominator is the SUM over the <=9-row digit
    rollup (an unpartitioned window over the post-aggregation frame), so
    the table is scanned exactly once."""
    from pyspark.sql.window import Window

    from ibis_flink_example_spark.functions.exact import cents

    orders = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 0)
    d = orders.select(
        F.substring(cents("o_totalprice").cast("string"), 1, 1)
        .cast("int")
        .alias("digit")
    )
    total = F.sum("n_orders").over(Window.partitionBy())
    return (
        d.groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .select(
            "digit",
            "n_orders",
            (F.col("n_orders").cast("double") / total.cast("double")).alias("frac"),
        )
    )


@query(
    "concurrent_sessions_peak",
    # Sweep-line interval algebra: peak concurrent sessions per day.
    # Session intervals ([start, end+gap)) become +1/-1 boundary events;
    # within each day the running boundary sum gives the intra-day curve,
    # and the day's true peak adds the CARRY-IN (sessions still open at
    # day start = cumulative net delta of all earlier days) — without it,
    # intervals crossing midnight are dropped from the next day's count
    # and an ends-only day would report a negative "peak". peak(day) =
    # carry_in + max(0, max intra-day running sum): the max(0,..) term
    # covers the day-start instant itself (an ends-only day's peak is the
    # carry-in, before any boundary fires). Ends sort before starts at the
    # same instant (half-open intervals — an end and a start at t do not
    # overlap).
    oracle="""
WITH g AS (
  SELECT user_id, event_id, ts,
    CASE WHEN lag(ts) OVER w IS NULL
           OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END
      AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
), seq AS (
  SELECT user_id, ts,
    CAST(SUM(new_session) OVER (
      PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS BIGINT) AS session_seq
  FROM g
), iv AS (
  SELECT user_id, session_seq, MIN(ts) AS s,
    MAX(ts) + INTERVAL 30 MINUTE AS e
  FROM seq GROUP BY 1, 2
), b AS (
  SELECT s AS t, 1 AS delta FROM iv
  UNION ALL
  SELECT e AS t, -1 AS delta FROM iv
), curve AS (
  SELECT CAST(date_trunc('day', t) AS DATE) AS day, delta, t,
    CAST(SUM(delta) OVER (
      PARTITION BY CAST(date_trunc('day', t) AS DATE)
      ORDER BY t ASC, delta ASC
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS BIGINT) AS running
  FROM b
), per_day AS (
  SELECT day,
    CAST(MAX(running) AS BIGINT) AS day_max,
    CAST(SUM(delta) AS BIGINT) AS day_net,
    MIN(t) AS min_t
  FROM curve GROUP BY 1
), carried AS (
  SELECT day, day_max, min_t,
    CAST(COALESCE(SUM(day_net) OVER (
      ORDER BY day ASC ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
    ), 0) AS BIGINT) AS carry_in
  FROM per_day
)
SELECT CAST(day AS TIMESTAMP) AS day,
  -- the bare carry_in is the concurrency over [00:00, first boundary) —
  -- an EMPTY interval when the first boundary fires exactly at midnight
  -- (a session ending at 00:00 is already closed at the day-start
  -- instant, half-open), so the floor applies only when min_t > 00:00
  CAST(carry_in + CASE WHEN min_t > CAST(day AS TIMESTAMP)
                       THEN GREATEST(day_max, 0) ELSE day_max END
       AS BIGINT) AS peak_concurrent
FROM carried
""",
)
def concurrent_sessions_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per boundary-active day — the sweep-line
    interval-algebra rollup (capacity planning over session intervals).
    Intervals come from the shared with_session_seq frame (materialized
    once — they feed both union branches and Spark plans no ReusedExchange
    across them); each contributes a +1 (start) and -1 (end+gap) boundary.
    The running sum partitions by DAY (never one global ordered pass) and
    each day's peak adds the carry-in of sessions still open from earlier
    days (the day-axis cumulative is over the tiny post-aggregation day
    frame). Half-open tie rule (-1 before +1 at the same instant) and the
    midnight carry are both pinned by mini-fixture tests."""
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    iv = (
        with_session_seq(events)
        .groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("s"),
            (F.max("ts") + F.expr("interval 30 minutes")).alias("e"),
        )
        .localCheckpoint(eager=True)  # feeds both boundary branches
    )
    b = iv.select(F.col("s").alias("t"), F.lit(1).alias("delta")).unionByName(
        iv.select(F.col("e").alias("t"), F.lit(-1).alias("delta"))
    )
    day = F.date_trunc("day", F.col("t")).cast("date")
    sweep = Window.partitionBy("day").orderBy(
        F.col("t").asc(), F.col("delta").asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    curve = b.withColumn("day", day).select(
        "day", "delta", "t", F.sum("delta").over(sweep).alias("running")
    )
    per_day = curve.groupBy("day").agg(
        F.max("running").alias("day_max"),
        F.sum("delta").alias("day_net"),
        F.min("t").alias("min_t"),
    )
    carry = Window.orderBy(F.col("day").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    # bare carry_in = concurrency over [00:00, first boundary): an empty
    # interval when the first boundary is exactly midnight (half-open — a
    # session ending at 00:00 is closed at the day-start instant)
    floor_applies = F.col("min_t") > F.col("day").cast("timestamp")
    day_candidate = F.when(
        floor_applies, F.greatest(F.col("day_max"), F.lit(0).cast("long"))
    ).otherwise(F.col("day_max"))
    return per_day.select(
        F.col("day").cast("timestamp").alias("day"),
        (
            F.coalesce(F.sum("day_net").over(carry), F.lit(0)) + day_candidate
        ).alias("peak_concurrent"),
    )


@query(
    "lang_distribution_drift",
    # Distribution-drift monitor: total variation distance between the
    # language mixes of two deterministic corpus halves (doc_id parity —
    # the split rule is part of the query). TVD = 0.5 * sum |pa - pb|;
    # each |pa - pb| is quantized to integer 1e-9 units BEFORE the
    # cross-language sum, so the aggregate is order-exact; one double
    # division closes.
    oracle="""
WITH h AS (
  SELECT lang,
    CAST(COUNT(*) FILTER (doc_id % 2 = 0) AS BIGINT) AS na,
    CAST(COUNT(*) FILTER (doc_id % 2 = 1) AS BIGINT) AS nb
  FROM documents GROUP BY 1
), t AS (
  SELECT CAST(SUM(na) AS BIGINT) AS ta, CAST(SUM(nb) AS BIGINT) AS tb FROM h
), q AS (
  SELECT CAST(floor(abs(CAST(na AS DOUBLE) / CAST(ta AS DOUBLE)
                        - CAST(nb AS DOUBLE) / CAST(tb AS DOUBLE))
                   * 1000000000.0 + 0.5) AS BIGINT) AS d_x1e9
  FROM h CROSS JOIN t
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_langs,
  CAST(SUM(d_x1e9) AS BIGINT) AS sum_absdiff_x1e9,
  CAST(SUM(d_x1e9) AS DOUBLE) / 2000000000.0 AS tvd
FROM q
""",
)
def lang_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus drift monitoring: total variation distance between the
    language distributions of two halves of the corpus (the
    snapshot-vs-snapshot shape of training-mix drift detection). One
    conditional-aggregation pass computes both halves' counts per
    language; per-language |pa - pb| is fixed-point quantized before the
    cross-language sum so the scalar is engine- and order-exact."""
    docs = load_table(spark, sf_dir, "documents")
    is_a = F.col("doc_id") % 2 == 0
    h = docs.groupBy("lang").agg(
        F.count(F.when(is_a, 1)).alias("na"),
        F.count(F.when(~is_a, 1)).alias("nb"),
    )
    t = h.agg(F.sum("na").alias("ta"), F.sum("nb").alias("tb"))
    d = (
        h.crossJoin(F.broadcast(t))
        .select(
            F.floor(
                F.abs(
                    F.col("na").cast("double") / F.col("ta").cast("double")
                    - F.col("nb").cast("double") / F.col("tb").cast("double")
                )
                * 1_000_000_000.0
                + 0.5
            )
            .cast("long")
            .alias("d_x1e9")
        )
    )
    return d.agg(
        F.count(F.lit(1)).alias("n_langs"),
        F.sum("d_x1e9").alias("sum_absdiff_x1e9"),
        (F.sum("d_x1e9").cast("double") / 2_000_000_000.0).alias("tvd"),
    )


@query(
    "hll_daily_users_merge",
    # HLL sketches are deterministic for a given input (no RNG — hashing
    # only), but their estimates are not SQL-reproducible, so the oracle
    # pins the MEASURED merged estimate per fixture (keyed by an order-
    # independent md5 fingerprint of the user_id sequence — the same idiom
    # as ann_recall_ivf) next to the SQL-exact distinct count and a
    # relative-error bound claim computed from data. Any change in sketch
    # build, persistence, or merge flips the pinned value.
    oracle="""
WITH fp AS (
  SELECT substr(md5(string_agg(CAST(user_id AS VARCHAR), ',' ORDER BY event_id)), 1, 8) AS f
  FROM events
)
SELECT CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       (SELECT CASE f WHEN '83d88810' THEN CAST(15 AS BIGINT)    -- sf0.001
                      WHEN 'f0fffe96' THEN CAST(150 AS BIGINT)   -- sf0.01
                      WHEN 'a6c6b681' THEN CAST(1488 AS BIGINT)  -- sf0.1
        END FROM fp) AS merged_est,
       TRUE AS within_2pct
FROM events
""",
)
def hll_daily_users_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog sketch as a FIRST-CLASS mergeable artifact (the
    cardinality twin of the streaming CMS): per-day user sketches built
    with ``hll_sketch_agg`` (lgConfigK 12, ~2.5 KB each), persisted to
    parquet as binary columns, read back, and merged with
    ``hll_union_agg`` into the all-time distinct-user estimate — the
    incremental-distinct pattern that replaces a users-sized exact
    COUNT(DISTINCT) shuffle at 100 TB: each new day appends ONE sketch
    row; history is never rescanned. Emits the SQL-exact distinct count,
    the measured merged estimate (oracle-pinned per fixture), and the
    relative-error bound |merged - exact| <= 2% of exact, computed from
    data. Note the union estimate may differ slightly from a single
    direct sketch (1488 vs 1494 vs exact 1500 at sf0.1) — pinning the
    merged value captures exactly what the artifact path produces."""
    from ibis_flink_example_spark.catalog import scratch_dir

    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.expr("hll_sketch_agg(user_id, 12)").alias("sk")
    )
    d = scratch_dir("hll_daily_users", sf_dir)
    daily.write.mode("overwrite").parquet(d)  # the persisted artifact
    back = spark.read.parquet(d)
    merged = back.agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk, true))").alias("merged_est"),
        F.count(F.lit(1)).alias("n_days"),
    )
    exact = events.agg(F.countDistinct("user_id").alias("exact_users"))
    return merged.crossJoin(F.broadcast(exact)).select(
        "n_days",
        "exact_users",
        "merged_est",
        (
            F.abs(F.col("merged_est") - F.col("exact_users"))
            <= F.col("exact_users") * 0.02
        ).alias("within_2pct"),
    )


@query(
    "kll_daily_value_quantiles",
    # KLL is a RANDOMIZED sketch (compactor coin flips), so its estimates
    # cannot be oracle-pinned like the deterministic CMS/HLL values.
    # Instead the oracle carries the SQL-EXACT discrete p50/p90 (order
    # statistics via integer-cents rank arithmetic) and TRUE claims for
    # the sketch's rank-error bound: the Spark side ranks each estimate
    # against the exact CDF and asserts |rank - q| <= 5% — ~6 sigma above
    # the k=256 guarantee (~0.8% at 68% conf), so the booleans hold for
    # every run while any real regression (wrong merge, wrong column,
    # stale sketch) still flips the hash.
    oracle="""
WITH v AS (
  SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events
), r AS (
  SELECT cents, row_number() OVER (ORDER BY cents) AS rn, COUNT(*) OVER () AS n
  FROM v
)
SELECT
  CAST((SELECT COUNT(DISTINCT CAST(ts AS DATE)) FROM events) AS BIGINT) AS n_days,
  CAST(MAX(n) AS BIGINT) AS n_values,
  CAST(MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN cents END) AS BIGINT)
    AS exact_p50_cents,
  CAST(MAX(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT) THEN cents END) AS BIGINT)
    AS exact_p90_cents,
  TRUE AS p50_rank_within_5pct,
  TRUE AS p90_rank_within_5pct
FROM r
""",
)
def kll_daily_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL quantile sketch as a MERGEABLE artifact (the quantile member of
    the sketch family next to CMS-frequency and HLL-cardinality): per-day
    sketches of event value (integer cents, k=256 — ~2 KB each) built with
    ``kll_sketch_agg_bigint``, persisted to parquet, read back, and folded
    into the all-time sketch with the binary ``kll_sketch_merge_bigint``
    (deterministic fold order via the sorted day list). At 100 TB this
    replaces a full re-sort per quantile refresh: each day appends one
    sketch row and the merge touches 30 tiny rows. Output: SQL-exact
    discrete p50/p90 companions plus rank-tolerance claims for the sketch
    estimates, both computed from data (see oracle note on why the
    estimates themselves cannot be pinned)."""
    from ibis_flink_example_spark.catalog import scratch_dir

    events = load_table(spark, sf_dir, "events")
    cents = events.select(
        F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("cents"),
        F.to_date("ts").alias("day"),
    )
    daily = cents.groupBy("day").agg(
        F.kll_sketch_agg_bigint("cents", F.lit(256)).alias("sk")
    )
    d = scratch_dir("kll_daily_value", sf_dir)
    daily.write.mode("overwrite").parquet(d)  # the persisted artifact
    back = spark.read.parquet(d)
    # collect_list has NO ordering contract after a shuffle, so the fold
    # order is fixed by sorting the collected (day, sk) structs — the
    # fold order feeds the randomized KLL merge, and an unordered fold
    # would make the merged sketch vary run-to-run
    merged = back.agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("day", "sk"))),
            lambda s: s["sk"],
        ).alias("a"),
        F.count(F.lit(1)).alias("n_days"),
    )
    # Fold tail sized by the array itself (size-1, floored at 0 for the
    # single-day case) — a fixed slice length would silently drop days
    # past the constant, violating the no-silent-caps rule.
    msk = F.aggregate(
        F.slice(
            F.col("a"), F.lit(2), F.greatest(F.size("a") - 1, F.lit(0))
        ),
        F.element_at("a", 1),
        lambda acc, x: F.kll_sketch_merge_bigint(acc, x),
    )
    est = merged.select(
        "n_days",
        F.kll_sketch_get_quantile_bigint(msk, F.lit(0.5)).alias("est_p50"),
        F.kll_sketch_get_quantile_bigint(msk, F.lit(0.9)).alias("est_p90"),
    )
    # Exact discrete order statistics + the estimates' true ranks in ONE
    # pass over the cents column: broadcast the one-row estimate frame,
    # then conditional aggregation gives rank counts; the exact p50/p90
    # come from the value-sorted rank (a global sort — inherent to an
    # EXACT global quantile; this is the verification companion, the
    # sketch path above is the scale path).
    from pyspark.sql.window import Window

    ranked = (
        cents.select("cents")
        .crossJoin(F.broadcast(est))
        .select(
            "cents",
            "n_days",
            "est_p50",
            "est_p90",
            F.row_number().over(Window.orderBy("cents")).alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
        )
    )
    # integer rank targets (ceil(q*n) as BIGINT — same arithmetic as the
    # oracle); all claims close over row-level columns, one aggregation
    return ranked.agg(
        F.max("n_days").alias("n_days"),
        F.max("n").alias("n_values"),
        F.max(
            F.when(F.col("rn") == F.ceil(F.col("n") * 0.5).cast("bigint"), F.col("cents"))
        ).alias("exact_p50_cents"),
        F.max(
            F.when(F.col("rn") == F.ceil(F.col("n") * 0.9).cast("bigint"), F.col("cents"))
        ).alias("exact_p90_cents"),
        (
            F.abs(
                F.sum(F.when(F.col("cents") <= F.col("est_p50"), 1).otherwise(0))
                / F.max("n")
                - 0.5
            )
            <= 0.05
        ).alias("p50_rank_within_5pct"),
        (
            F.abs(
                F.sum(F.when(F.col("cents") <= F.col("est_p90"), 1).otherwise(0))
                / F.max("n")
                - 0.9
            )
            <= 0.05
        ).alias("p90_rank_within_5pct"),
    )


@query(
    "chisq_event_dow",
    # Chi-square test of independence between event_type and day-of-week,
    # made cross-engine EXACT: each cell's term is computed in a fixed
    # IEEE-754 op sequence — diff = o*n - r*c exactly in int64 (|diff| <
    # 2^53, so the double cast is lossless), then double square / divide,
    # then fixed-point floor — and the per-cell BIGINTs sum exactly in any
    # partition order. A naive SUM of double terms would differ across
    # engines/partitionings. DuckDB dayofweek is 0=Sunday..6, mirrored as
    # dayofweek()-1 on the Spark side.
    oracle="""
WITH o AS (
  SELECT event_type, dayofweek(ts) AS dow, CAST(COUNT(*) AS BIGINT) AS o
  FROM events GROUP BY 1, 2
), m AS (
  SELECT event_type, dow, o,
    SUM(o) OVER (PARTITION BY event_type) AS r,
    SUM(o) OVER (PARTITION BY dow) AS c,
    SUM(o) OVER () AS n
  FROM o
), t AS (
  SELECT event_type, dow,
    CAST(floor(
      CAST(o * n - r * c AS DOUBLE) * CAST(o * n - r * c AS DOUBLE)
      / (CAST(n AS DOUBLE) * CAST(r AS DOUBLE) * CAST(c AS DOUBLE))
      * 1000000 + 0.5) AS BIGINT) AS term_x1e6
  FROM m
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
  CAST((SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) - 1 FROM events)
     * (SELECT CAST(COUNT(DISTINCT dayofweek(ts)) AS BIGINT) - 1 FROM events)
     AS BIGINT) AS dof,
  CAST(SUM(term_x1e6) AS BIGINT) AS chi2_x1e6
FROM t
""",
)
def chisq_event_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence screen (event_type x day-of-week) — the
    categorical drift/DQ companion of the Welch t-test: one contingency
    aggregation (cells = |types| x 7, tiny), margins via windows over the
    CELL table (never a second scan of events), and an exactly-summable
    fixed-point statistic (see oracle note). At 100 TB the single events
    scan is the whole cost; everything after runs on <100 rows."""
    events = load_table(spark, sf_dir, "events")
    cells = events.groupBy(
        "event_type", (F.dayofweek("ts") - 1).alias("dow")
    ).agg(F.count(F.lit(1)).alias("o"))
    from pyspark.sql.window import Window

    m = cells.select(
        "event_type",
        "dow",
        "o",
        F.sum("o").over(Window.partitionBy("event_type")).alias("r"),
        F.sum("o").over(Window.partitionBy("dow")).alias("c"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    diff = (F.col("o") * F.col("n") - F.col("r") * F.col("c")).cast("double")
    term = F.floor(
        diff * diff
        / (F.col("n").cast("double") * F.col("r").cast("double") * F.col("c").cast("double"))
        * 1_000_000
        + 0.5
    ).cast("bigint")
    t = m.select("event_type", "dow", term.alias("term_x1e6"))
    # dof computed in the SAME final aggregation over the cell table —
    # a separate cells.agg() would re-scan events (no subtree reuse
    # without an exchange), doubling the only at-scale cost
    return t.agg(
        F.count(F.lit(1)).alias("n_cells"),
        (
            (F.countDistinct("event_type") - 1) * (F.countDistinct("dow") - 1)
        ).cast("bigint").alias("dof"),
        F.sum("term_x1e6").alias("chi2_x1e6"),
    ).select("n_cells", "dof", "chi2_x1e6")


@query(
    "stats_mad_value",
    # Exact median absolute deviation via DISCRETE order statistics
    # (rank = ceil(q*n), integer cents end-to-end — the interpolation-free
    # idiom every exact percentile in this repo uses): median in pass 1,
    # |x - median| re-ranked in pass 2. No floats anywhere until the
    # driver reads the integer cents.
    oracle="""
WITH v AS (
  -- NULLs excluded explicitly: Spark's ORDER BY ranks NULLS FIRST,
  -- DuckDB's NULLS LAST — an unfiltered NULL would shift every rank and
  -- silently diverge the median (both sides filter identically)
  SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS c FROM events
  WHERE value IS NOT NULL
), r AS (
  SELECT c, row_number() OVER (ORDER BY c) AS rn, COUNT(*) OVER () AS n FROM v
), med AS (
  SELECT MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN c END) AS m FROM r
), d AS (
  SELECT abs(c - (SELECT m FROM med)) AS ad FROM v
), r2 AS (
  SELECT ad, row_number() OVER (ORDER BY ad) AS rn, COUNT(*) OVER () AS n FROM d
)
SELECT
  CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_values,
  (SELECT m FROM med) AS median_cents,
  (SELECT MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN ad END) FROM r2)
    AS mad_cents
""",
)
def stats_mad_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust dispersion: exact median absolute deviation of event value —
    the outlier-resistant sigma for anomaly thresholds (1.4826*MAD), next
    to the moment-based corr/t-test family. Two discrete-order-statistic
    passes (median, then median of absolute deviations), integer cents
    throughout. An exact global quantile inherently needs a global
    ordering; both passes sort only the single bigint column (the 100 TB
    practice is the KLL sketch cousin — kll_daily_value_quantiles — with
    this as the verification-grade exact form)."""
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    # NULL filter mirrors the oracle exactly (see oracle note on the
    # engines' opposite NULL sort order)
    cents = events.filter(F.col("value").isNotNull()).select(
        F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("c")
    )
    r = cents.select(
        "c",
        F.row_number().over(Window.orderBy("c")).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    med = r.agg(
        F.max(
            F.when(F.col("rn") == F.ceil(F.col("n") * 0.5).cast("bigint"), F.col("c"))
        ).alias("m"),
        F.max("n").alias("n_values"),
    )
    d = cents.crossJoin(F.broadcast(med)).select(
        F.abs(F.col("c") - F.col("m")).alias("ad"), "m", "n_values"
    )
    r2 = d.select(
        "ad",
        "m",
        "n_values",
        F.row_number().over(Window.orderBy("ad")).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    return r2.agg(
        F.max("n_values").alias("n_values"),
        F.max("m").alias("median_cents"),
        F.max(
            F.when(F.col("rn") == F.ceil(F.col("n") * 0.5).cast("bigint"), F.col("ad"))
        ).alias("mad_cents"),
    )


@query(
    "seasonal_decompose_revenue",
    # Classical additive decomposition (STL-lite) made cross-engine EXACT
    # via the pinned-IEEE-sequence argument (the chisq idiom, NOT the
    # pure-integer rational idiom): numerators/denominators are exact
    # BIGINTs (cents sums, window counts), and each emitted component is
    # floor(double(num)/double(den) * scale + 0.5) — a fixed sequence of
    # IEEE-754 ops on exactly-representable integers (all < 2^53 by
    # construction: cents sums are bounded by total corpus revenue),
    # identical in both engines. No float value is ever ACCUMULATED
    # across rows, so partition order never enters.
    oracle="""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1
), tr AS (
  SELECT day, cents,
    CAST(SUM(cents) OVER w AS BIGINT) AS tr_sum,
    CAST(COUNT(*) OVER w AS BIGINT) AS tr_n
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
), dt AS (
  -- detrended value as an exact rational: cents - tr_sum/tr_n
  -- = (cents*tr_n - tr_sum) / tr_n
  SELECT day, cents, tr_sum, tr_n,
    dayofweek(day) AS dow,
    cents * tr_n - tr_sum AS dt_num,
    tr_n AS dt_den
  FROM tr
), se AS (
  -- seasonal = weekday mean of the detrended rationals: since dt_den
  -- varies only at the series edges, sum rationals over a common
  -- denominator product is exact but explodes; instead quantize each
  -- detrended value FIRST (fixed point, deterministic) then average the
  -- integers — the same rule on both engines
  SELECT day, cents, tr_sum, tr_n, dow,
    CAST(floor(CAST(dt_num AS DOUBLE) / dt_den * 100 + 0.5) AS BIGINT)
      AS dt_x100
  FROM dt
), sm AS (
  SELECT dow,
    CAST(SUM(dt_x100) AS BIGINT) AS s_sum,
    CAST(COUNT(*) AS BIGINT) AS s_n
  FROM se GROUP BY 1
)
SELECT CAST(se.day AS TIMESTAMP) AS day,
  CAST(se.cents AS DOUBLE) / 100.0 AS revenue,
  CAST(floor(CAST(se.tr_sum AS DOUBLE) / se.tr_n + 0.5) AS BIGINT)
    AS trend_cents,
  CAST(floor(CAST(sm.s_sum AS DOUBLE) / sm.s_n + 0.5) AS BIGINT)
    AS seasonal_x100,
  CAST(se.dt_x100 - floor(CAST(sm.s_sum AS DOUBLE) / sm.s_n + 0.5)
    AS BIGINT) AS residual_x100
FROM se JOIN sm ON se.dow = sm.dow
""",
)
def seasonal_decompose_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal decomposition of daily revenue (STL-lite: 7-day
    centered-MA trend, weekday-mean seasonal, residual) — the trend/
    seasonality monitor for any daily KPI. All heavy work happens on the
    DAILY aggregate (~2400 rows at sf0.1): the only corpus-sized cost is
    the first groupBy(day); the unpartitioned windows after it run over
    the tiny day frame (same design as concurrent_sessions_peak).
    Components are exact fixed-point integers (see oracle note) so the
    driver hash is stable across engines and partitionings."""
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")).alias(
            "cents"
        )
    )
    w = Window.orderBy("day").rowsBetween(-3, 3)
    tr = daily.select(
        "day",
        "cents",
        F.sum("cents").over(w).alias("tr_sum"),
        F.count(F.lit(1)).over(w).alias("tr_n"),
    )
    se = tr.select(
        "day",
        "cents",
        "tr_sum",
        "tr_n",
        (F.dayofweek("day") - 1).alias("dow"),  # DuckDB dow: 0=Sunday
        F.floor(
            (F.col("cents") * F.col("tr_n") - F.col("tr_sum")).cast("double")
            / F.col("tr_n")
            * 100
            + 0.5
        )
        .cast("bigint")
        .alias("dt_x100"),
    )
    sm = se.groupBy("dow").agg(
        F.sum("dt_x100").alias("s_sum"), F.count(F.lit(1)).alias("s_n")
    )
    seasonal = F.floor(
        F.col("s_sum").cast("double") / F.col("s_n") + 0.5
    ).cast("bigint")
    return (
        se.join(F.broadcast(sm), "dow")
        .select(
            F.col("day").cast("timestamp").alias("day"),
            (F.col("cents").cast("double") / 100.0).alias("revenue"),
            F.floor(F.col("tr_sum").cast("double") / F.col("tr_n") + 0.5)
            .cast("bigint")
            .alias("trend_cents"),
            seasonal.alias("seasonal_x100"),
            (F.col("dt_x100") - seasonal).cast("bigint").alias("residual_x100"),
        )
    )


@query(
    "attribution_time_decay",
    # Multi-touch time-decay attribution made EXACT: weight 2^(-days_back)
    # becomes the INTEGER 2^(6 - days_back) after scaling by 2^6 (the max
    # lookback is 6 whole days), so each purchase's credit shares are
    # integer rationals num/den; the emitted per-channel totals are sums
    # of floor(1e6*num/den + 0.5) BIGINTs — identical in any engine and
    # partition order.
    oracle="""
WITH touches AS (
  SELECT event_id, user_id, ts, event_type FROM events
  WHERE event_type <> 'purchase'
), pairs AS (
  SELECT p.event_id AS purchase_id, t.event_type AS channel,
    -- LEAST clamp: the inclusive join bound admits days_back = 7 at the
    -- exact boundary, where 2**(6-7) = 0.5 is no longer an integer and
    -- Spark's bigint cast (truncate) and DuckDB's (half-even) diverge —
    -- clamping to 6 keeps every weight a true integer on both sides
    CAST(2 AS BIGINT) ** (6 - LEAST(CAST(6 AS BIGINT),
        CAST(floor(epoch_us(p.ts - t.ts) / 86400000000.0) AS BIGINT)))
      AS w
  FROM events p
  JOIN touches t
    ON p.user_id = t.user_id
   AND t.ts < p.ts
   AND t.ts >= p.ts - INTERVAL 7 DAY
  WHERE p.event_type = 'purchase'
), den AS (
  SELECT purchase_id, CAST(SUM(w) AS BIGINT) AS den FROM pairs GROUP BY 1
), shares AS (
  SELECT pairs.channel,
    CAST(floor(1000000.0 * pairs.w / den.den + 0.5) AS BIGINT) AS share_x1e6
  FROM pairs JOIN den USING (purchase_id)
)
SELECT channel,
  CAST(COUNT(*) AS BIGINT) AS n_credited_touches,
  CAST(SUM(share_x1e6) AS BIGINT) AS total_credit_x1e6
FROM shares GROUP BY 1
""",
)
def attribution_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch TIME-DECAY attribution (the fractional-credit sibling
    of attribution_last_touch): every purchase splits credit across ALL
    its prior-7-day touches with weight 2^(-days_back), normalized per
    purchase. The purchase-touch pairing is a user-keyed RANGE join —
    pair volume is bounded by touches-per-user-per-week, never all-pairs
    — and the power-of-two weights keep the whole computation in integer
    arithmetic (see oracle note). Output: per-channel credited-touch
    count and total fractional credit."""
    events = load_table(spark, sf_dir, "events")
    touches = events.filter(F.col("event_type") != "purchase").select(
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("t_ts"),
        F.col("event_type").alias("channel"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    # clamped at 6: see the oracle note — the inclusive 7-day bound can
    # yield days_back = 7 exactly, whose 2**(-1) weight is non-integer
    days_back = F.least(
        F.lit(6).cast("bigint"),
        F.floor(
            (F.unix_micros("p_ts") - F.unix_micros("t_ts")) / 86_400_000_000.0
        ).cast("bigint"),
    )
    pairs = (
        purchases.join(
            touches,
            (F.col("p_user") == F.col("t_user"))
            & (F.col("t_ts") < F.col("p_ts"))
            & (F.col("t_ts") >= F.col("p_ts") - F.expr("INTERVAL 7 DAYS")),
        )
        .select(
            "purchase_id",
            "channel",
            F.pow(F.lit(2.0), (F.lit(6) - days_back).cast("double"))
            .cast("bigint")
            .alias("w"),
        )
    )
    from pyspark.sql.window import Window

    den = Window.partitionBy("purchase_id")
    shares = pairs.select(
        "channel",
        F.floor(
            1_000_000.0 * F.col("w") / F.sum("w").over(den) + 0.5
        )
        .cast("bigint")
        .alias("share_x1e6"),
    )
    return shares.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_credited_touches"),
        F.sum("share_x1e6").alias("total_credit_x1e6"),
    )


# ---------------------------------------------------------------------------
# Iterative graph analytics: fixed-point PageRank
# ---------------------------------------------------------------------------


def _pagerank_oracle(iters: int) -> str:
    """Unrolled fixed-point PageRank oracle: one CTE per iteration — the
    same integer recurrence the Spark loop runs (operators/graph.py), so
    a hash match proves iteration-for-iteration equality. Unrolling (vs
    WITH RECURSIVE) sidesteps the SQL-standard ban on aggregates in the
    recursive term, which both engines enforce."""
    head = """
WITH pairs AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
), edges AS (
  SELECT 2 * l_partkey AS src, 2 * l_suppkey + 1 AS dst FROM pairs
  UNION ALL
  SELECT 2 * l_suppkey + 1 AS src, 2 * l_partkey AS dst FROM pairs
), deg AS (
  SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY 1
), r0 AS (
  SELECT node, CAST(1000000000 AS BIGINT) AS rank FROM deg
)"""
    step = """, r{k} AS (
  SELECT d0.node,
         CAST(150000000 + (85 * COALESCE(s.s, 0)) // 100 AS BIGINT) AS rank
  FROM deg d0 LEFT JOIN (
    SELECT e.dst AS node, SUM(r.rank // d.deg) AS s
    FROM edges e
    JOIN r{prev} r ON r.node = e.src
    JOIN deg d ON d.node = e.src
    GROUP BY 1
  ) s ON s.node = d0.node
)"""
    tail = f"""
SELECT CASE WHEN r.node % 2 = 0 THEN 'part' ELSE 'supplier' END AS node_type,
       CAST(r.node // 2 AS BIGINT) AS node_key,
       r.rank AS rank_fp,
       d.deg AS degree
FROM r{iters} r JOIN deg d ON d.node = r.node
ORDER BY rank_fp DESC, node_key ASC, node_type ASC
LIMIT 15
"""
    return (
        head
        + "".join(step.format(k=k, prev=k - 1) for k in range(1, iters + 1))
        + tail
    )


_PAGERANK_ITERS = 5


@query(
    "pagerank_part_supplier",
    # Fixed-point integer PageRank (scale 1e9, damping 85/100, floor
    # division everywhere — DuckDB // and Spark DIV agree on positive
    # operands), 5 iterations unrolled in the oracle. The graph is the
    # symmetrized part<->supplier bipartite incidence from lineitem, so
    # every node has in-edges and no damping mass is lost.
    oracle=_pagerank_oracle(_PAGERANK_ITERS),
)
def pagerank_part_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative distributed PageRank (operators/graph.py) over the
    part<->supplier co-purchase graph: authority scores for supplier/part
    importance weighting — the iterative-algorithm family (with BPE) the
    reference's dedup clustering stops short of. Per iteration: one join
    of the checkpointed edge frame with the |V|-row rank frame + one
    keyed aggregation; lineage is cut per step (localCheckpoint), so the
    5-iteration plan never deepens. Top-15 output with deterministic
    (rank, key, type) tie-break."""
    from ibis_flink_example_spark.operators import graph as G

    li = load_table(spark, sf_dir, "lineitem")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    edges = pairs.select(
        (2 * F.col("l_partkey")).alias("src"),
        (2 * F.col("l_suppkey") + 1).alias("dst"),
    ).unionAll(
        pairs.select(
            (2 * F.col("l_suppkey") + 1).alias("src"),
            (2 * F.col("l_partkey")).alias("dst"),
        )
    )
    ranked = G.pagerank(edges, iters=_PAGERANK_ITERS)
    return (
        ranked.select(
            F.when(F.col("node") % 2 == 0, F.lit("part"))
            .otherwise(F.lit("supplier"))
            .alias("node_type"),
            F.expr("node DIV 2").cast("long").alias("node_key"),
            F.col("rank").alias("rank_fp"),
            F.col("deg").alias("degree"),
        )
        .orderBy(
            F.col("rank_fp").desc(), F.col("node_key").asc(), F.col("node_type").asc()
        )
        .limit(15)
    )


def _connected_components_oracle(iters: int) -> str:
    """Unrolled min-label-propagation oracle: one CTE per iteration of the
    EXACT Jacobi recurrence the distributed path runs (operators/dedup.py
    ``connected_components``): labels(k+1)[v] = least(labels(k)[v],
    min over edges(v,u) of labels(k)[u]), seeded with each edge node's own
    id. A fixed unroll is exact whether or not the loop early-exits:
    min-label is monotone and idempotent at fixpoint, so extra unrolled
    steps are no-ops — the same argument the PageRank/BFS oracles use."""
    head = """
WITH chain AS (
  SELECT c_custkey AS a,
         LEAD(c_custkey) OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS b
  FROM customer
), edges AS (
  SELECT a AS src, b AS dst FROM chain WHERE b IS NOT NULL
  UNION
  SELECT b AS src, a AS dst FROM chain WHERE b IS NOT NULL
), l0 AS (
  SELECT DISTINCT src, src AS component FROM edges
)"""
    step = """, l{k} AS (
  SELECT l.src,
         LEAST(l.component, COALESCE(m.mc, l.component)) AS component
  FROM l{prev} l LEFT JOIN (
    SELECT e.src AS s2, MIN(ld.component) AS mc
    FROM edges e JOIN l{prev} ld ON ld.src = e.dst
    GROUP BY e.src
  ) m ON m.s2 = l.src
)"""
    tail = f"""
SELECT src AS c_custkey, component FROM l{iters}
UNION ALL
SELECT c_custkey, c_custkey AS component FROM customer
WHERE c_custkey NOT IN (SELECT src FROM edges)
"""
    return (
        head
        + "".join(step.format(k=k, prev=k - 1) for k in range(1, iters + 1))
        + tail
    )


_CC_ITERS = 6


@query(
    "connected_components_distributed",
    oracle=_connected_components_oracle(_CC_ITERS),
)
def connected_components_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DISTRIBUTED arm of ``connected_components`` (operators/dedup.py)
    as a first-class query: min-label propagation over a per-nation
    customer chain graph (consecutive custkeys within a nation), with
    ``driver_cc_max_edges=0`` pinning the distributed path regardless of
    fixture size — the >100k-edge branch every near-dup clustering takes
    at 100 TB, where the candidate graph cannot be collected (label state
    never leaves the cluster; per-iteration lineage is checkpoint-cut and
    superseded checkpoints released). The chain's diameter exceeds the
    ``_CC_ITERS`` propagation rounds, so every registered run exercises
    the full iteration budget, and the unrolled oracle proves
    iteration-for-iteration equality (not just final-fixpoint agreement).
    Nations with a single customer arrive as singletons via the anti-join
    arm. Full convergence vs driver union-find is pinned separately in
    unit tests; this row pins the distributed machinery itself."""
    from ibis_flink_example_spark.operators.dedup import connected_components
    from pyspark.sql.window import Window

    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    w = Window.partitionBy("c_nationkey").orderBy("c_custkey")
    chain = c.select(
        F.col("c_custkey").alias("id_a"),
        F.lead("c_custkey").over(w).alias("id_b"),
    ).filter(F.col("id_b").isNotNull())
    return connected_components(
        chain,
        c.select("c_custkey"),
        id_col="c_custkey",
        max_iterations=_CC_ITERS,
        driver_cc_max_edges=0,
        # k-step-transform contract BY DESIGN: the unrolled oracle pins the
        # _CC_ITERS-step labels, not a fixpoint (see docstring) — opt out
        # of the converged-or-raise default.
        require_convergence=False,
    )


@query(
    "key_skew_profile",
    # Shuffle-key skew diagnostics computed SCALE-SAFELY: instead of
    # ranking every (event_type, user_id) count (a per-group sort over
    # |keys| rows), collapse to the counts-of-counts histogram first —
    # the cumulative window then runs over DISTINCT count values only
    # (tiny regardless of key cardinality). Percentiles are discrete
    # order statistics via integer rank arithmetic (ceil(q*n) with no
    # float); skew ratio is fixed-point BIGINT (max * n_keys * 1e6 DIV
    # total — overflow-safe while max*n_keys < ~9e12, far beyond any
    # per-event-type fixture or realistic per-key profile).
    oracle="""
WITH pk AS (
  SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
), coc AS (
  SELECT event_type, n, CAST(COUNT(*) AS BIGINT) AS m
  FROM pk GROUP BY 1, 2
), cum AS (
  SELECT event_type, n, m,
    CAST(SUM(m) OVER (PARTITION BY event_type ORDER BY n) AS BIGINT) AS cm,
    CAST(SUM(m) OVER (PARTITION BY event_type) AS BIGINT) AS nk,
    CAST(SUM(n * m) OVER (PARTITION BY event_type) AS BIGINT) AS tot,
    CAST(MAX(n) OVER (PARTITION BY event_type) AS BIGINT) AS mx
  FROM coc
)
SELECT event_type,
  MAX(nk) AS n_keys,
  MAX(tot) AS total_rows,
  MAX(mx) AS max_rows,
  MIN(CASE WHEN cm >= (nk + 1) // 2 THEN n END) AS p50_rows,
  MIN(CASE WHEN cm >= (99 * nk + 99) // 100 THEN n END) AS p99_rows,
  MAX(mx) * MAX(nk) * 1000000 // MAX(tot) AS skew_x1e6
FROM cum GROUP BY 1
""",
)
def key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ops diagnostics for shuffle planning: per event_type, the
    distribution of rows-per-key (user_id) — key count, max, discrete
    p50/p99, and the max/mean skew ratio that decides whether a join on
    this key needs salting or AQE skew splitting. The counts-of-counts
    formulation keeps every window over the distinct-count frame, so the
    profile itself is runnable on the 100 TB table it profiles."""
    events = load_table(spark, sf_dir, "events")
    pk = events.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    coc = pk.groupBy("event_type", "n").agg(F.count(F.lit(1)).alias("m"))
    coc.createOrReplaceTempView("skew_coc_v")
    return spark.sql(
        """
WITH cum AS (
  SELECT event_type, n, m,
    SUM(m) OVER (PARTITION BY event_type ORDER BY n) AS cm,
    SUM(m) OVER (PARTITION BY event_type) AS nk,
    SUM(n * m) OVER (PARTITION BY event_type) AS tot,
    MAX(n) OVER (PARTITION BY event_type) AS mx
  FROM skew_coc_v
)
SELECT event_type,
  MAX(nk) AS n_keys,
  MAX(tot) AS total_rows,
  MAX(mx) AS max_rows,
  MIN(CASE WHEN cm >= (nk + 1) DIV 2 THEN n END) AS p50_rows,
  MIN(CASE WHEN cm >= (99 * nk + 99) DIV 100 THEN n END) AS p99_rows,
  MAX(mx) * MAX(nk) * 1000000 DIV MAX(tot) AS skew_x1e6
FROM cum GROUP BY 1
"""
    )


@query(
    "stats_winsorized_value",
    # Robust location stats per event_type: p05/p95 winsorized and trimmed
    # sums over fixed-point micros (floor(value*1e6 + 0.5) — the repo's
    # established double->integer idiom). Cut points are DISCRETE order
    # statistics at integer ranks ceil(0.05n)/ceil(0.95n) (no
    # interpolation, engine-exact); sums/counts are BIGINT; the one final
    # double division (winsorized mean) is a single engine-exact op.
    oracle="""
WITH v AS (
  SELECT event_type,
         CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS micros
  FROM events WHERE value IS NOT NULL
), ranked AS (
  SELECT event_type, micros,
    row_number() OVER (PARTITION BY event_type ORDER BY micros) AS rn,
    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM v
), cuts AS (
  SELECT event_type, MAX(n) AS n,
    MIN(CASE WHEN rn = (5 * n + 99) // 100 THEN micros END) AS p05,
    MIN(CASE WHEN rn = (95 * n + 99) // 100 THEN micros END) AS p95
  FROM ranked GROUP BY 1
)
SELECT v.event_type,
  MAX(c.n) AS n_events,
  MAX(c.p05) AS p05_micros,
  MAX(c.p95) AS p95_micros,
  CAST(SUM(LEAST(GREATEST(v.micros, c.p05), c.p95)) AS BIGINT)
    AS winsor_sum_micros,
  CAST(SUM(LEAST(GREATEST(v.micros, c.p05), c.p95)) AS DOUBLE)
    / CAST(MAX(c.n) AS DOUBLE) / 1000000.0 AS winsor_mean,
  CAST(COUNT(CASE WHEN v.micros BETWEEN c.p05 AND c.p95 THEN 1 END)
    AS BIGINT) AS trim_n,
  CAST(SUM(CASE WHEN v.micros BETWEEN c.p05 AND c.p95 THEN v.micros END)
    AS BIGINT) AS trim_sum_micros
FROM v JOIN cuts c ON c.event_type = v.event_type
GROUP BY 1
""",
)
def stats_winsorized_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust statistics the anomaly/quality screens build on: winsorized
    and trimmed value sums per event_type with discrete p05/p95 cut
    points. The rank pass is a per-group sort (same posture as
    percentile_disc — swap in the KLL sketch cuts at 100 TB); the cuts
    frame is |groups| rows and broadcast-joins back onto the value rows
    for one clamp-and-aggregate pass."""
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    v = events.filter(F.col("value").isNotNull()).select(
        "event_type",
        F.floor(F.col("value") * 1_000_000 + F.lit(0.5))
        .cast("long")
        .alias("micros"),
    )
    wr = Window.partitionBy("event_type").orderBy("micros")
    wg = Window.partitionBy("event_type")
    ranked = v.select(
        "event_type",
        "micros",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wg).alias("n"),
    )
    cuts = ranked.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.min(
            F.when(
                F.col("rn") == F.expr("(5 * n + 99) DIV 100"), F.col("micros")
            )
        ).alias("p05"),
        F.min(
            F.when(
                F.col("rn") == F.expr("(95 * n + 99) DIV 100"), F.col("micros")
            )
        ).alias("p95"),
    )
    clamped = v.join(F.broadcast(cuts), "event_type").select(
        "event_type",
        "n",
        "p05",
        "p95",
        F.least(F.greatest(F.col("micros"), F.col("p05")), F.col("p95")).alias(
            "w"
        ),
        F.col("micros").between(F.col("p05"), F.col("p95")).alias("in_band"),
        "micros",
    )
    return clamped.groupBy("event_type").agg(
        F.max("n").alias("n_events"),
        F.max("p05").alias("p05_micros"),
        F.max("p95").alias("p95_micros"),
        F.sum("w").alias("winsor_sum_micros"),
        (
            F.sum("w").cast("double")
            / F.max("n").cast("double")
            / F.lit(1_000_000.0)
        ).alias("winsor_mean"),
        F.count(F.when(F.col("in_band"), F.lit(1))).alias("trim_n"),
        F.sum(F.when(F.col("in_band"), F.col("micros"))).alias(
            "trim_sum_micros"
        ),
    )


@query(
    "rollup_reuse_hierarchy",
    # Rollup hierarchy derived level-from-level: weekly and monthly are
    # computed FROM the daily aggregate (legal because DECIMAL sums are
    # exact and associative — re-aggregating daily sums equals
    # aggregating the base), not from three scans of orders. The oracle
    # mirrors the same derivation; date_trunc('week') is ISO-Monday in
    # both engines.
    oracle="""
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS period,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
           AS rev
  FROM orders GROUP BY 1
), weekly AS (
  SELECT date_trunc('week', period) AS period,
         CAST(SUM(n_orders) AS BIGINT) AS n_orders,
         CAST(SUM(rev) AS DECIMAL(18,2)) AS rev
  FROM daily GROUP BY 1
), monthly AS (
  SELECT date_trunc('month', period) AS period,
         CAST(SUM(n_orders) AS BIGINT) AS n_orders,
         CAST(SUM(rev) AS DECIMAL(18,2)) AS rev
  FROM daily GROUP BY 1
)
SELECT 'day' AS level, period, n_orders, CAST(rev AS DOUBLE) AS revenue
FROM daily
UNION ALL
SELECT 'week' AS level, period, n_orders, CAST(rev AS DOUBLE) AS revenue
FROM weekly
UNION ALL
SELECT 'month' AS level, period, n_orders, CAST(rev AS DOUBLE) AS revenue
FROM monthly
""",
)
def rollup_reuse_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-rollup pattern: the day/week/month hierarchy where
    each coarser level re-aggregates the FINER level's frame instead of
    re-scanning the base table — at 100 TB the daily rollup is ~5 orders
    of magnitude smaller than orders, so the weekly/monthly passes are
    free, and Catalyst reuses the daily aggregation's exchange across
    all three union branches (plan-audited ReusedExchange)."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_trunc("day", "o_orderdate").alias("period")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("rev"),
    )

    def _up(unit: str) -> DataFrame:
        return daily.groupBy(
            F.date_trunc(unit, "period").alias("period")
        ).agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("rev").cast("decimal(18,2)").alias("rev"),
        )

    def _lvl(df: DataFrame, name: str) -> DataFrame:
        return df.select(
            F.lit(name).alias("level"),
            "period",
            "n_orders",
            F.col("rev").cast("double").alias("revenue"),
        )

    return (
        _lvl(daily, "day")
        .unionAll(_lvl(_up("week"), "week"))
        .unionAll(_lvl(_up("month"), "month"))
    )


@query(
    "event_pattern_match",
    # MATCH_RECOGNIZE-gap filler: per-user journeys encoded as ordered
    # single-char strings (c/e/p/s/v by event initial, ordered by ts then
    # event_id — a deterministic total order), then REGEX pattern classes
    # evaluated over the encoded string: adjacency patterns a subsequence
    # funnel cannot express (view IMMEDIATELY followed by purchase;
    # view->clicks->purchase with nothing in between; any error strictly
    # before the first purchase). Both engines build the identical string
    # (string_agg ORDER BY == sort_array(collect_list(struct))) and use
    # the common RE2/Java regex dialect.
    oracle="""
WITH enc AS (
  SELECT user_id,
    string_agg(CASE event_type
        WHEN 'click' THEN 'c' WHEN 'error' THEN 'e'
        WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
        ELSE 'v' END, '' ORDER BY ts ASC, event_id ASC) AS journey
  FROM events GROUP BY 1
)
SELECT
  CAST(COUNT(*) AS BIGINT) AS n_users,
  CAST(SUM(CASE WHEN regexp_matches(journey, 'vp') THEN 1 ELSE 0 END)
    AS BIGINT) AS n_impulse_vp,
  CAST(SUM(CASE WHEN regexp_matches(journey, 'vc+p') THEN 1 ELSE 0 END)
    AS BIGINT) AS n_clean_chain,
  CAST(SUM(CASE WHEN regexp_matches(journey, '^[^p]*e[^p]*p') THEN 1
    ELSE 0 END) AS BIGINT) AS n_error_before_purchase,
  CAST(SUM(length(journey)) AS BIGINT) AS total_events
FROM enc
""",
)
def event_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern analytics (the MATCH_RECOGNIZE surface Spark SQL
    lacks): encode each user's journey as an ordered character string in
    ONE user-keyed aggregation, then evaluate regex adjacency patterns
    map-side over the |users|-row encoded frame. The encode is the only
    shuffle; journeys are bounded by per-user event counts (cap/sample
    upstream for pathological users at 100 TB)."""
    events = load_table(spark, sf_dir, "events")
    chr_col = (
        F.when(F.col("event_type") == "click", "c")
        .when(F.col("event_type") == "error", "e")
        .when(F.col("event_type") == "purchase", "p")
        .when(F.col("event_type") == "signup", "s")
        .otherwise("v")
    )
    enc = (
        events.select(
            "user_id", F.struct("ts", "event_id").alias("o"), chr_col.alias("ch")
        )
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("o", "ch"))),
                    lambda x: x["ch"],
                ),
                "",
            ).alias("journey")
        )
    )
    return enc.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(
            F.when(F.col("journey").rlike("vp"), 1).otherwise(0)
        ).alias("n_impulse_vp"),
        F.sum(
            F.when(F.col("journey").rlike("vc+p"), 1).otherwise(0)
        ).alias("n_clean_chain"),
        F.sum(
            F.when(F.col("journey").rlike("^[^p]*e[^p]*p"), 1).otherwise(0)
        ).alias("n_error_before_purchase"),
        F.sum(F.length("journey")).alias("total_events"),
    )


@query(
    "k_anonymity_audit",
    # Privacy-release audit: k-anonymity over the quasi-identifier tuple
    # (lang, source, n_chars DIV 100) — group sizes k, then the
    # distribution the release decision reads: singleton groups, groups
    # below k=5, share of ROWS living in sub-5 groups (fixed point), and
    # the discrete median k via the counts-of-counts collapse (the skew
    # profile's scale-safe idiom: no window ever touches row-level data).
    oracle="""
WITH qi AS (
  SELECT lang, source, n_chars // 100 AS size_bucket,
         CAST(COUNT(*) AS BIGINT) AS k
  FROM documents GROUP BY 1, 2, 3
), coc AS (
  SELECT k, CAST(COUNT(*) AS BIGINT) AS m FROM qi GROUP BY 1
), cum AS (
  SELECT k, m,
    CAST(SUM(m) OVER (ORDER BY k) AS BIGINT) AS cm,
    CAST(SUM(m) OVER () AS BIGINT) AS ng,
    CAST(SUM(k * m) OVER () AS BIGINT) AS nrows
  FROM coc
)
SELECT
  MAX(ng) AS n_groups,
  MAX(nrows) AS n_rows,
  CAST(COALESCE(SUM(CASE WHEN k = 1 THEN m END), 0) AS BIGINT)
    AS n_singleton_groups,
  CAST(COALESCE(SUM(CASE WHEN k < 5 THEN m END), 0) AS BIGINT)
    AS n_groups_below_5,
  CAST(COALESCE(SUM(CASE WHEN k < 5 THEN k * m END), 0) * 1000000
    // MAX(nrows) AS BIGINT) AS rows_below_5_share_x1e6,
  CAST(MIN(k) AS BIGINT) AS min_k,
  MIN(CASE WHEN cm >= (ng + 1) // 2 THEN k END) AS median_k
FROM cum
""",
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Responsible-release surface: k-anonymity audit over a
    quasi-identifier tuple. Two keyed aggregations (QI -> k, k -> m)
    collapse the table to the k-histogram before any window runs, so the
    audit is one QI-keyed exchange plus tiny-frame arithmetic at any
    scale; the sub-5 row share is exact fixed point."""
    docs = load_table(spark, sf_dir, "documents")
    qi = docs.groupBy(
        "lang", "source", F.expr("n_chars DIV 100").alias("size_bucket")
    ).agg(F.count(F.lit(1)).alias("k"))
    coc = qi.groupBy("k").agg(F.count(F.lit(1)).alias("m"))
    coc.createOrReplaceTempView("kanon_coc_v")
    return spark.sql(
        """
WITH cum AS (
  SELECT k, m,
    SUM(m) OVER (ORDER BY k) AS cm,
    SUM(m) OVER () AS ng,
    SUM(k * m) OVER () AS nrows
  FROM kanon_coc_v
)
SELECT
  MAX(ng) AS n_groups,
  MAX(nrows) AS n_rows,
  COALESCE(SUM(CASE WHEN k = 1 THEN m END), 0) AS n_singleton_groups,
  COALESCE(SUM(CASE WHEN k < 5 THEN m END), 0) AS n_groups_below_5,
  COALESCE(SUM(CASE WHEN k < 5 THEN k * m END), 0) * 1000000
    DIV MAX(nrows) AS rows_below_5_share_x1e6,
  MIN(k) AS min_k,
  MIN(CASE WHEN cm >= (ng + 1) DIV 2 THEN k END) AS median_k
FROM cum
"""
    )


def _bfs_oracle(hops: int) -> str:
    """Unrolled frontier-expansion BFS oracle: per hop, the fresh frontier
    is the neighbor set minus everything already visited — the same
    anti-join recurrence operators/graph.py:bfs_distances runs."""
    head = """
WITH pairs AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
), edges AS (
  SELECT 2 * l_partkey AS src, 2 * l_suppkey + 1 AS dst FROM pairs
  UNION ALL
  SELECT 2 * l_suppkey + 1 AS src, 2 * l_partkey AS dst FROM pairs
), v0 AS (
  SELECT DISTINCT 2 * s_suppkey + 1 AS node, 0 AS dist
  FROM supplier WHERE s_nationkey = 0
)"""
    step = """, f{k} AS (
  SELECT DISTINCT e.dst AS node
  FROM edges e JOIN v{prev} v ON v.node = e.src AND v.dist = {prev_d}
  WHERE NOT EXISTS (SELECT 1 FROM v{prev} w WHERE w.node = e.dst)
), v{k} AS (
  SELECT node, dist FROM v{prev} UNION ALL SELECT node, {k} FROM f{k}
)"""
    tail = f"""
SELECT CAST(dist AS INTEGER) AS dist,
  CASE WHEN node % 2 = 0 THEN 'part' ELSE 'supplier' END AS node_type,
  CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM v{hops} GROUP BY 1, 2
"""
    return (
        head
        + "".join(
            step.format(k=k, prev=k - 1, prev_d=k - 1)
            for k in range(1, hops + 1)
        )
        + tail
    )


_BFS_HOPS = 3


@query(
    "bfs_reach_from_nation0",
    # Frontier-expansion BFS (graph family #2 next to PageRank's dense
    # fixpoint): hop distances from nation-0's suppliers across the
    # symmetrized part<->supplier graph, rolled up to (distance,
    # node-type) counts. The oracle unrolls the identical
    # expand/anti-join recurrence CTE-per-hop; distances are unique
    # minima by construction, so no min-aggregation ambiguity exists.
    oracle=_bfs_oracle(_BFS_HOPS),
)
def bfs_reach_from_nation0(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supply-chain reach analysis: how much of the part/supplier
    universe is within k alternating hops of one nation's suppliers
    (operators/graph.py:bfs_distances). Per hop the join side is the
    FRONTIER (count-guarded broadcast), never the visited set, so work
    tracks frontier size — the property that keeps BFS tractable on a
    100 TB edge list."""
    from ibis_flink_example_spark.operators import graph as G

    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    edges = pairs.select(
        (2 * F.col("l_partkey")).alias("src"),
        (2 * F.col("l_suppkey") + 1).alias("dst"),
    ).unionAll(
        pairs.select(
            (2 * F.col("l_suppkey") + 1).alias("src"),
            (2 * F.col("l_partkey")).alias("dst"),
        )
    )
    seeds = supplier.filter(F.col("s_nationkey") == 0).select(
        (2 * F.col("s_suppkey") + 1).alias("node")
    )
    visited = G.bfs_distances(edges, seeds, max_hops=_BFS_HOPS)
    return visited.groupBy(
        "dist",
        F.when(F.col("node") % 2 == 0, F.lit("part"))
        .otherwise(F.lit("supplier"))
        .alias("node_type"),
    ).agg(F.count(F.lit(1)).alias("n_nodes"))


@query(
    "cusum_revenue_shift",
    # One-sided CUSUM changepoint detection made WINDOW-expressible: the
    # recursive clamp s_k = max(0, s_{k-1} + dev_k) equals
    # prefix_k - running_min(prefix) over prefix = cumsum(dev) — so the
    # sequential-looking detector is two ordered windows over the tiny
    # DAILY frame, all integer cents. dev = daily - global mean - slack
    # (slack = mean DIV 20, i.e. 5%); alarm when s exceeds 5x slack.
    oracle="""
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS day,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT) AS cents
  FROM orders GROUP BY 1
), ref AS (
  SELECT CAST(SUM(cents) // COUNT(*) AS BIGINT) AS mu,
         CAST((SUM(cents) // COUNT(*)) // 20 AS BIGINT) AS slack
  FROM daily
), pre AS (
  SELECT day, cents,
    CAST(SUM(cents - ref.mu - ref.slack) OVER (ORDER BY day) AS BIGINT)
      AS prefix
  FROM daily CROSS JOIN ref
), cusum AS (
  SELECT day, cents,
    prefix - LEAST(CAST(MIN(prefix) OVER (
      ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS BIGINT), 0) AS s
  FROM pre
)
SELECT c.day, c.cents, CAST(c.s AS BIGINT) AS cusum_cents,
  (c.s > 5 * ref.slack) AS alarm
FROM cusum c CROSS JOIN ref
""",
)
def cusum_revenue_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changepoint surveillance over daily revenue: the one-sided CUSUM
    detector, usually written as a sequential clamp recursion, computed
    declaratively via the prefix - running-min identity (clamped at the
    start: min taken against 0). Corpus cost is the one day rollup;
    both windows run over the |days| frame. Integer cents throughout —
    mean and slack are floor-divided scalars broadcast back."""
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_trunc("day", "o_orderdate").alias("day")
    ).agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)") * 100))
        .cast("long")
        .alias("cents")
    )
    ref = daily.agg(
        F.expr("CAST(SUM(cents) DIV COUNT(*) AS BIGINT)").alias("mu"),
        F.expr("CAST((SUM(cents) DIV COUNT(*)) DIV 20 AS BIGINT)").alias(
            "slack"
        ),
    )
    pre = daily.crossJoin(F.broadcast(ref)).select(
        "day",
        "cents",
        "slack",
        (F.col("cents") - F.col("mu") - F.col("slack")).alias("dev"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    cusum = pre.select(
        "day",
        "cents",
        "slack",
        (
            F.sum("dev").over(w)
            - F.least(F.min(F.sum("dev").over(w)).over(w), F.lit(0))
        ).alias("s"),
    )
    return cusum.select(
        "day",
        "cents",
        F.col("s").cast("long").alias("cusum_cents"),
        (F.col("s") > 5 * F.col("slack")).alias("alarm"),
    )


@query(
    "weighted_median_price",
    # Weighted median (quantity-weighted extended price) per return
    # flag, computed SCALE-SAFELY: collapse to (flag, price-cents) ->
    # total weight first, then the cumulative window runs over DISTINCT
    # price points only. The weighted median is the first price whose
    # doubled cumulative weight reaches the total — integer cents and
    # integer quantity weights, no interpolation, engine-exact.
    oracle="""
WITH w AS (
  SELECT l_returnflag AS flag,
    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS wt
  FROM lineitem GROUP BY 1, 2
), cum AS (
  SELECT flag, cents, wt,
    CAST(SUM(wt) OVER (PARTITION BY flag ORDER BY cents) AS BIGINT) AS cw,
    CAST(SUM(wt) OVER (PARTITION BY flag) AS BIGINT) AS tw
  FROM w
)
SELECT flag,
  MAX(tw) AS total_weight,
  CAST(COUNT(*) AS BIGINT) AS n_price_points,
  MIN(CASE WHEN 2 * cw >= tw THEN cents END) AS wmedian_cents
FROM cum GROUP BY 1
""",
)
def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust stats: the quantity-weighted median price per return flag.
    The counts-of-counts collapse (group to distinct price points before
    the cumulative window) keeps the ordered pass off row-level data —
    the same idiom as key_skew_profile, so the statistic is runnable at
    any fact-table scale."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    w = lineitem.groupBy(
        F.col("l_returnflag").alias("flag"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    ).agg(F.sum(F.col("l_quantity").cast("long")).alias("wt"))
    w.createOrReplaceTempView("wmed_w_v")
    return spark.sql(
        """
WITH cum AS (
  SELECT flag, cents, wt,
    SUM(wt) OVER (PARTITION BY flag ORDER BY cents) AS cw,
    SUM(wt) OVER (PARTITION BY flag) AS tw
  FROM wmed_w_v
)
SELECT flag,
  MAX(tw) AS total_weight,
  COUNT(*) AS n_price_points,
  MIN(CASE WHEN 2 * cw >= tw THEN cents END) AS wmedian_cents
FROM cum GROUP BY 1
"""
    )


@query(
    "quantile_normalize_value",
    # Quantile normalization (the ML-preprocessing transform): each
    # group's values mapped onto the GLOBAL empirical distribution at
    # the same discrete quantile position p = ceil(r * n / n_g). Ranks
    # use the deterministic (micros, event_id) total order, so the value
    # at any global rank is unique; all arithmetic is integer. The total
    # count comes from a ONE-ROW aggregate cross join (BNLJ_ALLOWED
    # scalar idiom) — a COUNT(*) OVER () would force the whole group
    # side under Exchange SinglePartition and serialize the event_type
    # windows. The ceil product runs in HUGEINT/DECIMAL(38,0): the
    # BIGINT form r*n approaches n^2 and overflows past ~3e9 rows.
    # Output: per-group summary of the normalized micros (sums/
    # extremes), which pins every mapped value through the BIGINT sum.
    oracle="""
WITH v AS (
  SELECT event_type, event_id,
    CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS micros
  FROM events WHERE value IS NOT NULL
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v
), g AS (
  SELECT event_type, micros,
    row_number() OVER (PARTITION BY event_type ORDER BY micros, event_id)
      AS r,
    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS ng
  FROM v
), gdist AS (
  SELECT micros AS gmicros,
    row_number() OVER (ORDER BY micros, event_id) AS gr
  FROM v
), mapped AS (
  SELECT g.event_type, gdist.gmicros
  FROM g CROSS JOIN tot
  JOIN gdist ON gdist.gr = CAST(
    (CAST(g.r AS HUGEINT) * tot.n + g.ng - 1) // g.ng AS BIGINT)
)
SELECT event_type,
  CAST(COUNT(*) AS BIGINT) AS n_values,
  CAST(SUM(gmicros) AS BIGINT) AS sum_normalized_micros,
  MIN(gmicros) AS min_normalized_micros,
  MAX(gmicros) AS max_normalized_micros
FROM mapped GROUP BY 1
""",
)
def quantile_normalize_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ML preprocessing: quantile-normalize each event_type's value
    distribution onto the global one (discrete positions, ceil rank
    arithmetic — no interpolation, so cross-engine exact). The global
    rank pass is a total-order sort — same posture as percentile_disc:
    swap the mapping table for KLL sketch quantiles at 100 TB; the
    group-side windows stay hash-partitioned by event_type (the total
    count arrives as a one-row scalar broadcast, never a global
    window)."""
    events = load_table(spark, sf_dir, "events")
    v = events.filter(F.col("value").isNotNull()).select(
        "event_type",
        "event_id",
        F.floor(F.col("value") * 1_000_000 + F.lit(0.5))
        .cast("long")
        .alias("micros"),
    )
    v.createOrReplaceTempView("qnorm_v_v")
    return spark.sql(
        """
WITH tot AS (
  SELECT COUNT(*) AS n FROM qnorm_v_v
), g AS (
  SELECT event_type, micros,
    row_number() OVER (PARTITION BY event_type ORDER BY micros, event_id)
      AS r,
    COUNT(*) OVER (PARTITION BY event_type) AS ng
  FROM qnorm_v_v
), gdist AS (
  SELECT micros AS gmicros,
    row_number() OVER (ORDER BY micros, event_id) AS gr
  FROM qnorm_v_v
), mapped AS (
  SELECT g.event_type, gdist.gmicros
  FROM g CROSS JOIN tot
  JOIN gdist ON gdist.gr = CAST(
    (CAST(g.r AS DECIMAL(38,0)) * tot.n + g.ng - 1) DIV g.ng AS BIGINT)
)
SELECT event_type,
  COUNT(*) AS n_values,
  SUM(gmicros) AS sum_normalized_micros,
  MIN(gmicros) AS min_normalized_micros,
  MAX(gmicros) AS max_normalized_micros
FROM mapped GROUP BY 1
"""
    )


@query(
    "cms_join_size_estimate",
    # AMS/CMS join-cardinality estimation QA (the planner-side use of the
    # frequency sketch): |A JOIN B on user_id| estimated as the min-over-
    # depths inner product of two 32 KB sketches, vs the exact size
    # sum(c_a * c_b). Following the cms_term_counts oracle pattern, the
    # SQL side carries the exact size and TRUE literals for the two
    # claims the Spark side COMPUTES from data — the structural one-sided
    # bound est >= exact, and the eps-bound est - exact <=
    # ceil(e/width * N_a * N_b) — so any hashing/merge regression flips
    # the driver hash.
    oracle="""
WITH c AS (
  SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
), pairs(a, b) AS (
  VALUES ('view', 'purchase'), ('view', 'click'), ('click', 'purchase')
)
SELECT p.a || '_x_' || p.b AS pair,
  CAST(COALESCE(SUM(ca.n * cb.n), 0) AS BIGINT) AS exact_join_size,
  TRUE AS est_ge_exact,
  TRUE AS overest_within_eps
FROM pairs p
LEFT JOIN c ca ON ca.event_type = p.a
LEFT JOIN c cb ON cb.event_type = p.b AND cb.user_id = ca.user_id
GROUP BY 1
""",
)
def cms_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-size estimation without the join: per event-type pair, the
    CMS inner-product estimate of the user-keyed join cardinality vs the
    exact size. At 100 TB this is how a planner sizes a shuffle before
    paying for it — each sketch is one bounded aggregation (<= depth x
    width cells regardless of row count) and the estimate is a
    sketch-sized dot product. Claims are computed, not assumed: the
    one-sided bound and the eps*Na*Nb overestimate bound both ride the
    driver hash."""
    import math

    from ibis_flink_example_spark.operators.sketches import (
        cms_build,
        cms_inner_product,
    )

    width, depth = 1024, 4
    events = load_table(spark, sf_dir, "events").select(
        "event_type", "user_id"
    ).localCheckpoint(eager=True)  # feeds 3 sketches + 3 exact legs

    def _arm(t: str):
        part = events.filter(F.col("event_type") == t)
        sketch = cms_build(part, "user_id", width=width, depth=depth)
        counts = part.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
        total = part.agg(F.count(F.lit(1)).alias("tot"))
        return sketch, counts, total

    arms = {t: _arm(t) for t in ("view", "click", "purchase")}
    out = None
    for a, b in (("view", "purchase"), ("view", "click"), ("click", "purchase")):
        sk_a, cnt_a, tot_a = arms[a]
        sk_b, cnt_b, tot_b = arms[b]
        est = cms_inner_product(sk_a, sk_b, depth=depth)
        exact = (
            cnt_a.join(cnt_b.withColumnRenamed("n", "nb"), "user_id")
            .agg(
                # decimal product: the per-key count product approaches
                # n^2 — BIGINT-unsafe at the scale this query advertises
                F.coalesce(
                    F.sum(F.col("n").cast("decimal(38,0)") * F.col("nb")),
                    F.lit(0).cast("decimal(38,0)"),
                )
                .cast("long")
                .alias("exact_join_size")
            )
        )
        row = (
            exact.crossJoin(est)
            .crossJoin(tot_a.select(F.col("tot").alias("tot_a")))
            .crossJoin(tot_b.select(F.col("tot").alias("tot_b")))
            .select(
                F.lit(f"{a}_x_{b}").alias("pair"),
                "exact_join_size",
                (F.col("est") >= F.col("exact_join_size")).alias(
                    "est_ge_exact"
                ),
                (
                    F.col("est") - F.col("exact_join_size")
                    <= F.ceil(
                        F.lit(math.e / width)
                        * F.col("tot_a")
                        * F.col("tot_b")
                    )
                ).alias("overest_within_eps"),
            )
        )
        out = row if out is None else out.unionAll(row)
    return out


@query(
    "hll_intersection_users",
    # Sketch set algebra, completing the union-merge story
    # (hll_daily_users_merge): distinct-user INTERSECTION per event-type
    # pair via inclusion-exclusion over three HLL estimates
    # (|A|+|B|-|A∪B| — HLL unions natively, intersections only via I/E).
    # The estimates are deterministic for fixed data (DataSketches HLL is
    # a deterministic algorithm) but not SQL-reproducible, so the oracle
    # carries the EXACT intersection plus a TRUE literal for the ONE
    # claim that is tenable for ANY intersection size: the clamped
    # estimate GREATEST(0, I/E) errs by at most 10% of the exact value
    # PLUS 2% of (|Â|+|B̂|) — I/E noise scales with the sketch
    # magnitudes (lgK 12 ≈ 1.6%/sketch), not with the intersection, so a
    # pure relative bound would be a coin flip at exact ≈ 0 (r7 review
    # finding; the earlier est_positive claim had the same flaw). Empty
    # arms coalesce to estimate 0 instead of NULL-poisoning the claim.
    oracle="""
WITH pairs(a, b) AS (
  VALUES ('view', 'purchase'), ('view', 'click'), ('click', 'purchase')
), u AS (
  SELECT DISTINCT event_type, user_id FROM events
)
SELECT p.a || '_x_' || p.b AS pair,
  CAST((SELECT COUNT(*) FROM u ua JOIN u ub
        ON ua.user_id = ub.user_id
        AND ua.event_type = p.a AND ub.event_type = p.b) AS BIGINT)
    AS exact_intersection,
  TRUE AS est_within_tolerance
FROM pairs p
""",
)
def hll_intersection_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-intersection cardinality from mergeable sketches: how
    many users both viewed and purchased, estimated WITHOUT a distinct
    join — three HLL estimates and inclusion-exclusion (clamped at 0).
    At 100 TB the sketches are the only state (KBs per segment,
    mergeable across days/partitions); the exact leg here is the QA
    companion. Per-type sketches and distinct-user frames are built ONCE
    and reused across the pairs (the cms_join_size_estimate arm-caching
    pattern); the tolerance claim is computed from data and rides the
    driver hash."""
    events = load_table(spark, sf_dir, "events").select(
        "event_type", "user_id"
    ).localCheckpoint(eager=True)

    types = ("view", "click", "purchase")
    sketches = {
        t: events.filter(F.col("event_type") == t).agg(
            F.expr("hll_sketch_agg(user_id, 12)").alias(f"sk_{t}")
        )
        for t in types
    }
    distinct_users = {
        t: events.filter(F.col("event_type") == t).select("user_id").distinct()
        for t in types
    }

    out = None
    for a, b in (("view", "purchase"), ("view", "click"), ("click", "purchase")):
        both = (
            events.filter(F.col("event_type").isin(a, b))
            .agg(F.expr("hll_sketch_agg(user_id, 12)").alias("sk_u"))
        )
        exact = (
            distinct_users[a]
            .join(distinct_users[b], "user_id")
            .agg(F.count(F.lit(1)).cast("long").alias("exact_intersection"))
        )
        # COALESCE each term: an empty arm's sketch is NULL and would
        # otherwise NULL-poison the estimate and the claim
        est_a = f"COALESCE(hll_sketch_estimate(sk_{a}), 0)"
        est_b = f"COALESCE(hll_sketch_estimate(sk_{b}), 0)"
        est_u = "COALESCE(hll_sketch_estimate(sk_u), 0)"
        row = (
            sketches[a]
            .crossJoin(sketches[b])
            .crossJoin(both)
            .crossJoin(exact)
            .select(
                F.lit(f"{a}_x_{b}").alias("pair"),
                "exact_intersection",
                F.expr(
                    f"GREATEST(0, {est_a} + {est_b} - {est_u})"
                ).alias("est"),
                F.expr(f"{est_a} + {est_b}").alias("mass"),
            )
            .select(
                "pair",
                "exact_intersection",
                (
                    F.abs(F.col("est") - F.col("exact_intersection"))
                    <= 0.10 * F.col("exact_intersection")
                    + 0.02 * F.col("mass")
                ).alias("est_within_tolerance"),
            )
        )
        out = row if out is None else out.unionAll(row)
    return out


@query(
    "twap_user_value",
    # Time-weighted average price (TWAP): each observation holds until the
    # next one (last holds to midnight), weights are exact event-time
    # microseconds, values are integer cents, and the final average is ONE
    # integer floor division with the sign factored out (Spark DIV
    # truncates toward zero, DuckDB // floors — identical only on
    # non-negatives, and value is not guaranteed non-negative in general).
    oracle=r"""
WITH e AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
    epoch_us(ts) AS t_us,
    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
    LEAD(epoch_us(ts)) OVER (
      PARTITION BY user_id, CAST(ts AS DATE) ORDER BY ts, event_id
    ) AS nxt_us,
    epoch_us(CAST(CAST(ts AS DATE) + INTERVAL 1 DAY AS TIMESTAMP)) AS eod_us
  FROM events
), wt AS (
  SELECT user_id, day, cents,
         COALESCE(nxt_us, eod_us) - t_us AS dt_us
  FROM e
), g AS (
  SELECT user_id, day,
    CAST(COUNT(*) AS BIGINT) AS n_events,
    CAST(SUM(dt_us) AS BIGINT) AS weight_us,
    CAST(SUM(cents * dt_us) AS BIGINT) AS num
  FROM wt GROUP BY 1, 2
)
SELECT user_id, day, n_events, weight_us,
  CAST(CASE WHEN num < 0 THEN -((-num) // weight_us)
            ELSE num // weight_us END AS BIGINT) AS twap_cents
FROM g
""",
)
def twap_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval algebra #2 (next to concurrent_sessions_peak): per
    user/day time-weighted average of `value` — each event's value holds
    until the next event (the last until midnight), the finance-style
    TWAP every metering/billing pipeline computes. ONE user/day-keyed
    window pass then one aggregation on the same partitioning (Catalyst
    reuses the exchange); weights are exact microsecond integers, so the
    aggregation is order-independent and the result engine-exact."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.to_date("ts").alias("day"),
        F.unix_micros("ts").alias("t_us"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        "ts",
        "event_id",
    )
    w = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
    eod = F.unix_micros(
        F.to_timestamp(F.date_add(F.col("day"), 1))
    )
    wt = e.select(
        "user_id",
        "day",
        "cents",
        (
            F.coalesce(F.lead("t_us").over(w), eod) - F.col("t_us")
        ).alias("dt_us"),
    )
    g = wt.groupBy("user_id", "day").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("dt_us").cast("long").alias("weight_us"),
        F.sum(F.col("cents") * F.col("dt_us")).cast("long").alias("num"),
    )
    return g.select(
        "user_id",
        # DATE -> TIMESTAMP for the comparator (the date_spine idiom:
        # pandas renders Spark DateType as object but DuckDB DATE as
        # datetime64)
        F.col("day").cast("timestamp").alias("day"),
        "n_events",
        "weight_us",
        F.expr(
            "CAST(CASE WHEN num < 0 THEN -((-num) DIV weight_us) "
            "ELSE num DIV weight_us END AS BIGINT)"
        ).alias("twap_cents"),
    )


@query(
    "triangle_count_copurchase",
    # Same algorithm unrolled in SQL: canonical distinct edges, (degree,
    # id)-oriented adjacency, wedge self-join, closing-edge semi-join.
    # Every count is an exact integer; the 10% order sample is the md5
    # threshold (pure function of o_orderkey, identical hex both sides).
    oracle=r"""
WITH basket AS (
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey
  WHERE substr(md5(CAST(o_orderkey AS STRING)), 1, 4) < '199a'
), e AS (
  SELECT DISTINCT x.pk AS a, y.pk AS b
  FROM basket x JOIN basket y ON x.ok = y.ok AND x.pk < y.pk
), deg AS (
  SELECT v, CAST(COUNT(*) AS BIGINT) AS deg FROM (
    SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e
  ) GROUP BY 1
), oriented AS (
  SELECT CASE WHEN (da.deg, a) < (db.deg, b) THEN a ELSE b END AS u,
         CASE WHEN (da.deg, a) < (db.deg, b) THEN b ELSE a END AS x,
         CASE WHEN (da.deg, a) < (db.deg, b) THEN db.deg ELSE da.deg END AS deg_x
  FROM e
  JOIN deg da ON da.v = e.a
  JOIN deg db ON db.v = e.b
), wedges AS (
  SELECT l.x AS v, r.x AS w
  FROM oriented l JOIN oriented r ON l.u = r.u
  WHERE (l.deg_x, l.x) < (r.deg_x, r.x)
), tri AS (
  SELECT 1 FROM wedges WHERE EXISTS (
    SELECT 1 FROM oriented o WHERE o.u = wedges.v AND o.x = wedges.w
  )
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM wedges) AS n_wedges,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM tri) AS n_triangles
""",
)
def triangle_count_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distributed triangle count (operators/graph.py:triangle_count,
    degree-orientation à la Suri & Vassilvitskii) over the part
    co-purchase graph: parts are adjacent iff they appear in the same
    order, on a deterministic 10% md5 sample of orders (the QA-scale
    probe — the operator itself takes any edge list). Completes the graph
    family (PageRank = authority, BFS = reachability, CC = clusters,
    triangles = local clustering/community strength — the spam-subgraph
    signal in web-corpus curation). The (degree, id) orientation bounds
    wedge generation by O(|E|^1.5) regardless of hub skew."""
    from ibis_flink_example_spark.operators import sampling as SA
    from ibis_flink_example_spark.operators.graph import triangle_count

    orders = SA.hash_sample(
        load_table(spark, sf_dir, "orders"), "o_orderkey", 0.1
    ).select("o_orderkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    )
    basket = li.join(
        orders.withColumnRenamed("o_orderkey", "ok"), "ok"
    ).distinct()
    rhs = basket.withColumnRenamed("pk", "pk2")
    edges = (
        basket.join(rhs, "ok")
        .filter(F.col("pk") < F.col("pk2"))
        .select(F.col("pk").alias("src"), F.col("pk2").alias("dst"))
    )
    return triangle_count(edges, src_col="src", dst_col="dst")


@query(
    "ks_value_by_bucket",
    # Integer-exact two-sample KS over cents: ECDF gaps as
    # |cum_a*n_b - cum_b*n_a| HUGEINT products, sup + argmax, one final
    # x1e6 floor division; the alpha=.05 critical value uses the c(.05)
    # literal x sqrt (correctly-rounded) — mirrored op-for-op.
    oracle="""
WITH g AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS value,
    CAST(COUNT(*) FILTER (user_id % 2 = 0) AS BIGINT) AS ca,
    CAST(COUNT(*) FILTER (user_id % 2 = 1) AS BIGINT) AS cb
  FROM events GROUP BY 1
), c AS (
  SELECT value,
    CAST(SUM(ca) OVER (ORDER BY value
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_a,
    CAST(SUM(cb) OVER (ORDER BY value
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_b,
    CAST(SUM(ca) OVER () AS BIGINT) AS n_a,
    CAST(SUM(cb) OVER () AS BIGINT) AS n_b
  FROM g
), d AS (
  SELECT value, n_a, n_b,
    abs(CAST(cum_a AS HUGEINT) * n_b - CAST(cum_b AS HUGEINT) * n_a) AS diff,
    MAX(abs(CAST(cum_a AS HUGEINT) * n_b - CAST(cum_b AS HUGEINT) * n_a))
      OVER () AS dmax
  FROM c
), m AS (
  SELECT MAX(n_a) AS n_a, MAX(n_b) AS n_b, MAX(diff) AS d,
    CAST(MIN(CASE WHEN diff = dmax THEN value END) AS BIGINT) AS d_at_value
  FROM d
)
SELECT n_a, n_b,
  CAST(d * 1000000 // (CAST(n_a AS HUGEINT) * n_b) AS BIGINT) AS d_x1e6,
  d_at_value,
  CAST(floor(1358102 * sqrt(
    (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
    / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)))) AS BIGINT)
    AS d_crit_05_x1e6,
  CAST(d * 1000000 // (CAST(n_a AS HUGEINT) * n_b) AS BIGINT)
    > CAST(floor(1358102 * sqrt(
        (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
        / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)))) AS BIGINT)
    AS reject_05
FROM m
""",
)
def ks_value_by_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov D between the same user-parity
    buckets as ab_value_ttest (operators/evaluation.py:ks_two_sample) —
    the distribution-level drift readout next to the moment-level t: a
    reweighted tail with matched means is invisible to Welch's t and loud
    here. Corpus collapses to per-cent-value class counts first (the ROC
    score-domain idiom); the sup and its location are exact integers."""
    from ibis_flink_example_spark.functions.exact import cents
    from ibis_flink_example_spark.operators.evaluation import ks_two_sample

    events = load_table(spark, sf_dir, "events")
    prepared = events.select(
        cents("value").alias("value_cents"),
        (F.col("user_id") % 2 == 0).alias("is_a"),
    )
    return ks_two_sample(prepared, value_col="value_cents", group_col="is_a")


def _bloom_fpr_oracle(m_bits: int = 1024, k: int = 3) -> str:
    from ibis_flink_example_spark.operators.sampling import hex_prefix_int_sql

    def pos(key_sql: str, i: int) -> str:
        h = f"substr(md5(CAST({key_sql} AS STRING) || ':bloom:{i}'), 1, 8)"
        return f"({hex_prefix_int_sql(h, 8)} % {m_bits})"

    branches = " ".join(
        f"WHEN {i} THEN {pos('key', i)}" for i in range(k)
    )
    unions = "\n    UNION ALL ".join(
        f"SELECT {pos('key', i)} AS pos FROM members" for i in range(k)
    )
    idx = "[" + ", ".join(str(i) for i in range(k)) + "]"
    return f"""
WITH members AS (
  SELECT DISTINCT c_custkey AS key FROM customer WHERE c_nationkey = 0
),
cells AS (
  SELECT pos // 32 AS word,
         CAST(1 AS BIGINT) << CAST(pos % 32 AS INTEGER) AS mask
  FROM ({unions})
),
words AS (SELECT word, bit_or(mask) AS w FROM cells GROUP BY 1),
probes AS (SELECT DISTINCT o_custkey AS key FROM orders),
pp AS (
  SELECT key, CASE t.i {branches} END AS pos
  FROM probes, UNNEST({idx}) t(i)
),
flags AS (
  SELECT pp.key,
    bool_and(COALESCE((w >> CAST(pos % 32 AS INTEGER)) & 1, 0) = 1)
      AS predicted
  FROM pp LEFT JOIN words ON words.word = pp.pos // 32
  GROUP BY 1
),
joined AS (
  SELECT f.predicted, (m.key IS NOT NULL) AS actual
  FROM flags f LEFT JOIN members m ON m.key = f.key
)
SELECT
  (SELECT CAST(COUNT(*) AS BIGINT) FROM members) AS n_keys,
  CAST(COUNT(*) AS BIGINT) AS n_probes,
  CAST(SUM(CASE WHEN actual THEN 1 ELSE 0 END) AS BIGINT) AS n_members,
  CAST(SUM(CASE WHEN predicted THEN 1 ELSE 0 END) AS BIGINT) AS n_predicted,
  CAST(SUM(CASE WHEN predicted AND NOT actual THEN 1 ELSE 0 END) AS BIGINT)
    AS n_false_positives,
  CAST(SUM(CASE WHEN actual AND NOT predicted THEN 1 ELSE 0 END) AS BIGINT)
    AS n_false_negatives,
  CAST(SUM(CASE WHEN predicted AND NOT actual THEN 1 ELSE 0 END) * 1000000
       // NULLIF(COUNT(*) - SUM(CASE WHEN actual THEN 1 ELSE 0 END), 0)
       AS BIGINT) AS fpr_x1e6
FROM joined
"""


@query("bloom_semijoin_fpr", oracle=_bloom_fpr_oracle(1024, 3))
def bloom_semijoin_fpr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Membership-sketch QA: Spark's runtime bloom-filter semi-join
    reduction made explicit (operators/sketches.py:bloom_build/probe) —
    build a 1024-bit, 3-hash md5-positioned filter over nation-0 customer
    keys, broadcast it as ONE row, tag every distinct orders customer
    map-side, and measure the sketch against the exact semi-join: false
    negatives must be ZERO (the one-sided guarantee, asserted as an
    output column the value-hash pins), false positives price the
    reduction. The filter CONTENTS are engine-exact (md5 positions,
    32-bit words — bit 63 overflows DuckDB's checked shift), so the
    oracle rebuilds the identical bitmap. At 100 TB this shape runs as:
    dim-side build (sketch size independent of |keys|), broadcast,
    fact-scan pre-filter before any exchange."""
    from ibis_flink_example_spark.operators.sketches import (
        bloom_build,
        bloom_probe,
    )

    cust = load_table(spark, sf_dir, "customer")
    members = cust.filter(F.col("c_nationkey") == 0).select(
        F.col("c_custkey").alias("key")
    ).distinct()
    bloom = bloom_build(members, "key", m_bits=1024, k=3)
    probes = (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("key"))
        .distinct()
    )
    tagged = bloom_probe(probes, "key", bloom, m_bits=1024, k=3)
    actual = tagged.join(
        members.withColumn("__is_member", F.lit(True)), "key", "left"
    ).withColumn("actual", F.coalesce(F.col("__is_member"), F.lit(False)))
    return actual.agg(
        F.max("n_keys").alias("n_keys"),
        F.count(F.lit(1)).cast("long").alias("n_probes"),
        F.count(F.when(F.col("actual"), 1)).cast("long").alias("n_members"),
        F.count(F.when(F.col("bloom_maybe"), 1)).cast("long").alias("n_predicted"),
        F.count(F.when(F.col("bloom_maybe") & ~F.col("actual"), 1))
        .cast("long")
        .alias("n_false_positives"),
        F.count(F.when(F.col("actual") & ~F.col("bloom_maybe"), 1))
        .cast("long")
        .alias("n_false_negatives"),
        F.expr(
            "CAST(COUNT(CASE WHEN bloom_maybe AND NOT actual THEN 1 END) * 1000000 "
            "DIV NULLIF(COUNT(1) - COUNT(CASE WHEN actual THEN 1 END), 0) AS BIGINT)"
        ).alias("fpr_x1e6"),
    )


def _bootstrap_oracle(b: int = 40, trim: int = 2) -> str:
    from ibis_flink_example_spark.operators.sampling import (
        POISSON1_THRESHOLDS_X2_32,
        hex_prefix_int_sql,
    )

    thr = "[" + ", ".join(str(t) for t in POISSON1_THRESHOLDS_X2_32) + "]"
    u = hex_prefix_int_sql(
        "substr(md5(CAST(event_id AS STRING) || ':boot:' "
        "|| CAST(t.b AS STRING)), 1, 8)",
        8,
    )
    return f"""
WITH fanned AS (
  SELECT t.b, CAST(round(value * 100) AS BIGINT) AS v,
    CAST(len(list_filter({thr}, x -> {u} >= x)) AS BIGINT) AS w
  FROM events, UNNEST(range(0, {b})) AS t(b)
), reps AS (
  SELECT b,
    CAST(CAST(SUM(w * v) AS HUGEINT) * 1000000 // SUM(w) AS BIGINT)
      AS mean_x1e6
  FROM fanned GROUP BY 1 HAVING SUM(w) > 0
), ranked AS (
  SELECT mean_x1e6,
    ROW_NUMBER() OVER (ORDER BY mean_x1e6, b) AS rn
  FROM reps
), ci AS (
  SELECT
    MAX(CASE WHEN rn = {1 + trim} THEN mean_x1e6 END) AS ci_lo_mean_x1e6,
    MAX(CASE WHEN rn = {b - trim} THEN mean_x1e6 END) AS ci_hi_mean_x1e6
  FROM ranked
)
SELECT
  (SELECT CAST(COUNT(*) AS BIGINT) FROM events) AS n_rows,
  CAST({b} AS BIGINT) AS b,
  (SELECT CAST(CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS HUGEINT)
          * 1000000 // COUNT(*) AS BIGINT) FROM events) AS point_mean_x1e6,
  ci_lo_mean_x1e6, ci_hi_mean_x1e6
FROM ci
"""


@query("poisson_bootstrap_mean_ci", oracle=_bootstrap_oracle(40, 2))
def poisson_bootstrap_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed-bootstrap confidence interval for mean event value
    (operators/sampling.py:poisson_bootstrap_mean_ci): 40 Poisson(1)
    resampling replicates, each row's per-replicate weight a frozen
    inverse-CDF draw from md5(id:boot:b) — the standard distributed
    bootstrap (per-row local weights, no global resample coordination),
    here made fully deterministic and engine-exact: integer weighted
    sums, one floor division per replicate mean, and a rank-based
    trimmed interval (2nd..39th order statistic ≈ central 90%). The
    error-bar companion to ab_value_ttest's parametric readout. Fan-out
    is an in-row explode over a fan_out-widened scan (single-split
    fixtures must not run the x40 fan-out as one task); the u-draw is
    one codegen'd md5 per fanned row with a plain comparison-ladder
    weight (no higher-order lambda — project-collapse would inline the
    hash per threshold term and drop out of codegen); the only exchange
    is the 40-group aggregation with map-side partials; rank selection
    runs on the 40-row frame."""
    from ibis_flink_example_spark.functions.exact import cents
    from ibis_flink_example_spark.operators.sampling import (
        poisson_bootstrap_mean_ci as boot,
    )

    events = load_table(spark, sf_dir, "events").select(
        "event_id", cents("value").alias("value_cents")
    )
    return boot(
        events, id_col="event_id", value_col="value_cents",
        n_replicates=40, trim=2,
    )
