"""STREAMING per-row event-time range over-window — the one operator in the
reference that Spark has no built-in streaming counterpart for
(SURVEY.md §7.3 item 1). Flink runs it as a keyed OverAggregate with managed
state (window_aggregation.py:73-80); Spark rejects window functions on
streaming DataFrames, so we provide two designs:

(a) ``streaming_range_over_sum`` — declarative watermarked SELF-JOIN:
      left  = stream (the trigger rows)
      right = stream (the frame contents)
      join on key equality AND r.ts ∈ [l.ts − lookback, l.ts]
      then per-left-row SUM grouped by the left row's identity.
    Provably equivalent to the batch RANGE frame (each left row pairs with
    exactly its frame, peers included; the row always matches itself so an
    inner join loses nothing). State is join state bounded by
    watermark + lookback; append output mode. This is the default: Catalyst
    plans it, AQE/state-eviction handle scale.

(b) ``stateful_range_over_sum`` (streaming/stateful.py) — a per-key
    applyInPandasWithState buffer: cheaper state (one buffer per key instead
    of join state), custom code.

CANONICAL CHOICE — design (b). Measured under the production RocksDB
state-store provider at sf0.1 (100k events, availableNow drain, round 8):
(b) ≈ 2.4 s; (a) ≈ 9-12 s, i.e. ~4x. The gap is STRUCTURAL, not a tuning
artifact: (a) plans TWO stateful operators (stream-stream join + per-row
aggregation) and writes every input row into RocksDB state on BOTH join
sides plus once more as an aggregation group, where (b) writes one
(ts, value) buffer entry per row. A/B sweeps of state partitions
(1/4/8/16/24/32) and ``rocksdb.trackTotalNumberOfRows`` moved nothing
outside run-to-run noise. At 100 TB the same shape is the scale-killer:
join-state volume on a hot key is rows x 2 sides x the watermark+lookback
horizon, vs (b)'s single bounded buffer. Design (a) stays registered as
the fully-declarative bracket — it proves Catalyst can plan the operator
end-to-end and carries its own oracle row — but production deployments
should take (b).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ibis_flink_example_spark.functions.exact import money


def streaming_range_over_sum(
    stream: DataFrame,
    *,
    key: str,
    time_col: str,
    measure: str,
    row_id: str,
    lookback_seconds: float,
    delay_seconds: float,
    out_col: str,
    exact_decimal: bool = True,
) -> DataFrame:
    """Design (a): watermarked self-join + per-row aggregation.

    ``stream`` must be a streaming DataFrame with event-time ``time_col``;
    ``row_id`` is a unique row identity column (orderId / event_id).
    Returns an append-mode streaming DataFrame with one row per input row:
    (row_id, key, time_col, out_col).
    """
    left = (
        stream.select(row_id, key, time_col)
        .withWatermark(time_col, f"{delay_seconds} seconds")
        .alias("l")
    )
    right = (
        stream.select(
            F.col(key).alias("r_key"),
            F.col(time_col).alias("r_ts"),
            F.col(measure).alias("r_measure"),
        )
        .withWatermark("r_ts", f"{delay_seconds} seconds")
        .alias("r")
    )
    lookback_us = int(lookback_seconds * 1_000_000)
    cond = (
        (F.col(f"l.{key}") == F.col("r.r_key"))
        & (F.unix_micros(F.col("r.r_ts")) >= F.unix_micros(F.col(f"l.{time_col}")) - F.lit(lookback_us))
        & (F.col("r.r_ts") <= F.col(f"l.{time_col}"))
    )
    pairs = left.join(right, on=cond, how="inner")
    measure_col = money("r_measure") if exact_decimal else F.col("r_measure")
    # Grouping includes the watermarked event-time column, so append mode can
    # finalize each row's aggregate once the watermark passes its timestamp.
    return pairs.groupBy(F.col(f"l.{row_id}"), F.col(f"l.{key}"), F.col(f"l.{time_col}")).agg(
        F.sum(measure_col).cast("double").alias(out_col)
    )
