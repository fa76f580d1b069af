"""Event-sequence (funnel) and cohort analytics over event streams — the
product-analytics surface of the reference's domain (payment/click events;
reference: window_aggregation.py computes a per-event trailing aggregate,
these operators compute the complementary per-user journey aggregates).

Both operators are single-logical-shuffle designs: every window and
aggregation is keyed by ``user``, so Catalyst plans ONE hash exchange on the
user key and reuses its partitioning for the follow-up aggregation; the
final stage/cohort rollup moves only |users| (funnel) or |user-weeks|
(cohort) rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def funnel_stage_times(
    events: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user earliest completion time of each funnel stage, where stage
    k+1 must occur STRICTLY after the user's stage-k completion.

    Semantics (the standard funnel definition): t_1 = min ts of a step-1
    event; t_{k+1} = min ts of a step-(k+1) event with ts > t_k. A user
    reaches stage k iff t_k is non-null.

    Implementation is pure window algebra — no arrays, no Python, no
    self-joins: for each row, ``t_k_so_far`` (the min qualifying step-k
    time among this user's events up to the current row in time order) is a
    running-min window expression; an event qualifies for step k+1 iff its
    type matches and ``ts > t_k_so_far``. A per-user min of qualifying
    times then equals the join-chain definition exactly (for an event at
    time t, the prefix min of qualifying step-k times is the global
    qualifying min whenever that min ≤ t — and the strict inequality
    discards exactly the t ≤ min cases). Ties at equal timestamps are
    handled by the strictness of ``>`` on the VALUE, so the window's
    tie-order is irrelevant.

    One shuffle: the window and the groupBy share the user key, so the
    aggregation reuses the window's hash partitioning. At 100 TB this is
    the funnel shape you want — the alternative k-way self-join re-shuffles
    the event table once per step.

    Returns one row per user: (user_col, t_1 .. t_k aliased ``t_<step>``).
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(type_col).asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ts = F.col(ts_col)
    qualifies: list[Column] = [F.col(type_col) == steps[0]]
    for prev_idx, step in enumerate(steps[1:]):
        t_prev_so_far = F.min(
            F.when(qualifies[prev_idx], ts)
        ).over(w)
        qualifies.append((F.col(type_col) == step) & (ts > t_prev_so_far))
    flagged = events.select(
        F.col(user_col),
        ts.alias("__ts"),
        *[q.alias(f"__q{i}") for i, q in enumerate(qualifies)],
    )
    return flagged.groupBy(user_col).agg(
        *[
            F.min(F.when(F.col(f"__q{i}"), F.col("__ts"))).alias(f"t_{s}")
            for i, s in enumerate(steps)
        ]
    )


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Stage-level funnel rollup: (stage, stage_idx, n_users) — how many
    users reached each stage in order. n_users is non-increasing in
    stage_idx by construction.

    All stage counts come out of ONE aggregation over the per-user stage
    times (count(t_k) ignores nulls), then a map-only explode reshapes the
    single row to one row per stage — the per-stage-union alternative would
    re-run the whole window pipeline once per stage."""
    times = funnel_stage_times(
        events, steps, user_col=user_col, ts_col=ts_col, type_col=type_col
    )
    one_row = times.agg(
        *[F.count(F.col(f"t_{s}")).alias(f"n_{i}") for i, s in enumerate(steps)]
    )
    stages = F.array(
        *[
            F.struct(
                F.lit(s).alias("stage"),
                F.lit(i + 1).alias("stage_idx"),
                F.col(f"n_{i}").alias("n_users"),
            )
            for i, s in enumerate(steps)
        ]
    )
    return one_row.select(F.explode(stages).alias("x")).select("x.*")


def cohort_retention(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Classic cohort-retention triangle: users grouped by the period of
    their FIRST event (the cohort), counted distinct in each subsequent
    activity period, keyed by offset.

    Plan: one groupBy(user) for first-event times, joined back on the user
    key (partitioning reused), then a (cohort, offset) rollup over
    |user-periods| rows. ``period`` is 'week' or 'day' (fixed-length
    units whose offsets are exact day arithmetic; month/quarter would
    need months_between, not datediff).

    Returns (cohort_<period>, <period>_offset, n_active_users).
    """
    days_per = {"week": 7, "day": 1}
    if period not in days_per:
        raise ValueError(
            f"period must be one of {sorted(days_per)} (got {period!r})"
        )
    first = events.groupBy(user_col).agg(F.min(ts_col).alias("__first_ts"))
    cohort = F.date_trunc(period, F.col("__first_ts"))
    activity = F.date_trunc(period, F.col(ts_col))
    days = days_per[period]
    joined = events.join(first, on=user_col).select(
        F.col(user_col),
        cohort.alias(f"cohort_{period}"),
        (F.datediff(activity, cohort) / days)
        .cast("int")
        .alias(f"{period}_offset"),
    )
    return joined.groupBy(f"cohort_{period}", f"{period}_offset").agg(
        F.countDistinct(user_col).alias("n_active_users")
    )


def event_transitions(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition counts over each user's ordered event
    journey: (event_type, next_event, n_transitions, p_transition).

    ``lead`` over (user, ts, tiebreak) pairs each event with its successor
    — one user-keyed exchange; the (from, to) rollup then moves only the
    paired rows, and the per-source probability window runs over the tiny
    |event_types|² aggregate. ``p_transition`` is one deterministic double
    division of two exact counts, so it is engine-exact.
    """
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    paired = events.select(
        F.col(type_col).alias("event_type"),
        F.lead(type_col).over(w).alias("next_event"),
    ).where(F.col("next_event").isNotNull())
    counts = paired.groupBy("event_type", "next_event").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    per_source = Window.partitionBy("event_type")
    return counts.select(
        "event_type",
        "next_event",
        "n_transitions",
        (
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(per_source).cast("double")
        ).alias("p_transition"),
    )


def trailing_anomaly_flags(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    lookback: int = 20,
    min_prior: int = 5,
    z_threshold: int = 3,
) -> DataFrame:
    """Per-event anomaly flag against the user's own trailing history: the
    event is anomalous iff its value deviates from the mean of the previous
    ``lookback`` events by more than ``z_threshold`` population standard
    deviations (given at least ``min_prior`` prior events).

    The streaming-monitor companion of the reference's trailing-window SUM
    (window_aggregation.py:73-80) — same ROWS-frame shape, different
    statistic.

    Engine-exactness: float stddev is order-dependent, so the z-test is
    evaluated ENTIRELY in integer cents. With x = cents, s = Σ prior cents,
    q = Σ prior cents², n = prior count, μ = s/n and population variance
    σ² = (n·q − s²)/n²:

        z² = (x − μ)²/σ² = (n·x − s)² / (n·q − s²)
        z² > T²  ⇔  (n·x − s)² > T² · (n·q − s²)

    — both sides exact BIGINTs (≲ lookback²·cents² ≈ 10¹⁵ ≪ 2⁶³ for
    2-decimal values up to 10⁴), so the flag is bit-identical in any
    engine at any partition order.

    One user-keyed exchange; everything else is map-side window math
    inside whole-stage codegen.
    """
    # value is 2-decimal quantized; round() kills the float representation
    # error before the integer cast (exact in any engine).
    cents = F.round(F.col(value_col) * 100).cast("bigint")
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
        .rowsBetween(-lookback, -1)
    )
    n = F.count(F.lit(1)).over(w)
    s = F.sum(cents).over(w)
    q = F.sum(cents * cents).over(w)
    x = cents
    dev2 = (n * x - s) * (n * x - s)  # n²·(x − μ)²
    var_n2 = n * q - s * s  # n²·σ² (≥ 0 by Cauchy–Schwarz)
    is_anomaly = (n >= min_prior) & (
        dev2 > F.lit(z_threshold * z_threshold) * var_n2
    )
    return events.select(
        F.col(id_col),
        F.col(user_col),
        F.col(value_col),
        n.cast("int").alias("n_prior"),
        is_anomaly.alias("is_anomaly"),
    )
