"""Slowly-changing-dimension (type 2) history build — the warehouse-side
companion of the MERGE upsert (queries_warehouse.py): collapse an attribute
change stream into effective-dated validity intervals.

This is the classic gaps-and-islands shape, expressed so Catalyst plans ONE
key exchange end-to-end:

    change flag  = state != lag(state)         (window over key)
    segment id   = running sum of change flags (window over key)
    interval     = groupBy(key, segment)       (reuses the key partitioning:
                   hash(key) clusters (key, segment) for free)
    valid_to     = lead(valid_from) over key   (reuses it again)

Every stage is keyed by the dimension key, so the shuffle happens once; at
100 TB the cost is one exchange of the change stream plus in-partition
window math — no self-joins, no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scd2_from_changes(
    changes: DataFrame,
    *,
    key_col: str,
    state_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Collapse an ordered attribute change stream into SCD2 intervals.

    Input: one row per observation (key, state, ts, tiebreak). Consecutive
    equal states merge into one interval; a state change opens a new one.
    ``tiebreak_col`` makes same-timestamp observations deterministic.

    Returns (key, state, valid_from, valid_to, is_current, n_observations):
    ``valid_from`` = first observation ts of the interval, ``valid_to`` =
    start of the next interval (NULL for the current one), ``is_current`` =
    valid_to IS NULL.
    """
    ordered = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    # null-safe comparison: a NULL state must open its own segment, not
    # silently merge into the preceding one (plain != yields NULL, which
    # the running SUM would skip). The first row of a key is "changed" too
    # unless its state is NULL and so is the (absent) predecessor — cover
    # it with an explicit row_number()==1 test rather than lag().isNull().
    first_row = F.row_number().over(ordered) == 1
    changed = (
        first_row | ~F.col(state_col).eqNullSafe(F.lag(state_col).over(ordered))
    ).cast("int")
    running = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    seg = changes.select(
        F.col(key_col),
        F.col(state_col),
        F.col(ts_col),
        F.sum(changed).over(running).alias("__seg"),
    )
    intervals = seg.groupBy(key_col, "__seg").agg(
        F.first(state_col).alias(state_col),  # constant within a segment
        F.min(ts_col).alias("valid_from"),
        F.count(F.lit(1)).cast("int").alias("n_observations"),
    )
    # __seg is the time-order of segments; ordering by it (not just
    # valid_from) keeps valid_to deterministic when a state flips within a
    # single timestamp granule (two segments sharing a valid_from).
    succession = Window.partitionBy(key_col).orderBy(F.col("__seg").asc())
    valid_to = F.lead("valid_from").over(succession)
    return intervals.select(
        F.col(key_col),
        F.col(state_col),
        F.col("valid_from"),
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
        F.col("n_observations"),
    )
