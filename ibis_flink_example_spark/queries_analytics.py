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
    from pyspark.sql.window import Window

    from ibis_flink_example_spark.functions.exact import dec_sum

    events = load_table(spark, sf_dir, "events")
    ordered = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    gap_us = 30 * 60 * 1_000_000
    prev_ts = F.lag("ts").over(ordered)
    new_session = (
        prev_ts.isNull()
        | (F.unix_micros(F.col("ts")) - F.unix_micros(prev_ts) > gap_us)
    ).cast("int")
    running = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    with_seq = events.select(
        "user_id",
        "ts",
        "value",
        F.sum(new_session).over(running).alias("session_seq"),
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
