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
    |user-periods| rows. ``period`` is any ``date_trunc`` unit.

    Returns (cohort_<period>, <period>_offset, n_active_users).
    """
    first = events.groupBy(user_col).agg(F.min(ts_col).alias("__first_ts"))
    cohort = F.date_trunc(period, F.col("__first_ts"))
    activity = F.date_trunc(period, F.col(ts_col))
    days = {"week": 7, "day": 1}[period]
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
