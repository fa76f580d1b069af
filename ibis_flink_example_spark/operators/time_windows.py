"""Time windows (SURVEY.md §2.5 W3): tumbling, sliding, session — one
implementation each that works on BOTH batch and streaming DataFrames
(build batch-first, wrap for streaming; SURVEY.md §7.1).

All three are plain ``groupBy`` over Spark's window expressions, so Catalyst
gets partial aggregation (map-side combine) for free: at 100 TB a tumble is
one shuffle of pre-aggregated (key, window) partials, not raw rows. The
sliding window shares the same operator with overlap factor size/slide —
keep that ratio small at scale (each row lands in size/slide partials).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _windowed(df: DataFrame, window_col: Column, keys: list[str], aggs: dict[str, Column]) -> DataFrame:
    out = df.groupBy(window_col.alias("w"), *keys).agg(
        *[expr.alias(name) for name, expr in aggs.items()]
    )
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *keys,
        *aggs.keys(),
    )


def tumble(
    df: DataFrame, time_col: str, size: str, aggs: dict[str, Column], keys: list[str] | None = None
) -> DataFrame:
    """Fixed, non-overlapping windows: ``size`` like '60 seconds'."""
    return _windowed(df, F.window(time_col, size), keys or [], aggs)


def slide(
    df: DataFrame,
    time_col: str,
    size: str,
    step: str,
    aggs: dict[str, Column],
    keys: list[str] | None = None,
) -> DataFrame:
    """Overlapping windows of ``size`` advancing every ``step``; each row
    belongs to size/step windows (epoch-aligned, like Flink HOP)."""
    return _windowed(df, F.window(time_col, size, step), keys or [], aggs)


def session(
    df: DataFrame, time_col: str, gap: str, aggs: dict[str, Column], keys: list[str] | None = None
) -> DataFrame:
    """Gap-based session windows: events closer than ``gap`` merge; the
    window closes at last_event + gap. Streaming: requires a watermark and
    works in update/complete (merging sessions can't append early)."""
    return _windowed(df, F.session_window(time_col, gap), keys or [], aggs)
