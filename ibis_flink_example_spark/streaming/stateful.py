"""Design (b) for the streaming over-window: a custom stateful operator via
``applyInPandasWithState`` (SURVEY.md §2.9 T3, §2.10) — the Spark analog of
Flink's keyed OverAggregate state (a per-key buffer of (ts, value) pairs,
evicted as event time advances past the lookback).

Semantics note vs design (a): results are emitted per micro-batch from the
rows IN that batch, using state from all prior batches + the current one.
Within a batch, rows are processed in event-time order, so for any input
split the emitted aggregate for each row equals the batch RANGE-frame result
over rows seen so far — identical to (a) and to the batch oracle when the
input arrives in watermark-respecting order.

Late-row contract (Flink `OverAggregate` parity, SURVEY.md §2.9 T2): the
buffer retains ``lookback + delay`` of history behind each key's max event
time, so a row up to ``delay`` late still finds its exact frame. Rows MORE
than ``delay`` behind the key's max are dropped (no emission) — the per-key
analog of the watermark drop, applied deterministically inside the operator
because Spark's own late-row filter lags one micro-batch behind. Per-key max
is a lower bound on the global max, so this drops a subset of what Flink's
global watermark would — never a correct-in-Flink row.

State size: one (ts, value) list per key, pruned to the lookback+delay
horizon — O(key_cardinality x frame density), the bound Flink's operator
carries.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T


def stateful_range_over_sum(
    stream: DataFrame,
    *,
    key: str,
    time_col: str,
    measure: str,
    row_id: str,
    lookback_seconds: float,
    delay_seconds: float,
    out_col: str,
) -> DataFrame:
    """Streaming per-row trailing SUM via per-key buffer state.

    ``stream``: streaming DataFrame with event-time ``time_col`` (watermark is
    applied here). Returns an append stream (row_id, key, time_col, out_col).
    """
    lookback_us = int(lookback_seconds * 1_000_000)
    delay_us = int(delay_seconds * 1_000_000)

    in_schema = stream.schema
    out_schema = T.StructType(
        [
            T.StructField(row_id, in_schema[row_id].dataType),
            T.StructField(key, in_schema[key].dataType),
            T.StructField(time_col, T.TimestampType()),
            T.StructField(out_col, T.DoubleType()),
        ]
    )
    # State: parallel arrays of event-time (µs) and measure values kept
    # inside the lookback horizon of the max timestamp seen.
    state_schema = T.StructType(
        [
            T.StructField("ts_us", T.ArrayType(T.LongType())),
            T.StructField("vals", T.ArrayType(T.DoubleType())),
        ]
    )

    def update(
        key_tuple: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            ts_us, vals = state.get
            buf_ts = list(ts_us)
            buf_vals = list(vals)
        else:
            buf_ts, buf_vals = [], []
        outs = []
        for pdf in pdfs:
            pdf = pdf.sort_values(time_col, kind="mergesort")
            # normalize to µs regardless of pandas datetime unit (ns or µs)
            row_ts_us = pdf[time_col].astype("datetime64[us]").astype("int64").to_numpy()
            row_vals = pdf[measure].to_numpy()
            row_ids = pdf[row_id].to_numpy()
            sums = []
            emit_mask = []
            for i in range(len(pdf)):
                t = int(row_ts_us[i])
                # per-key watermark drop: more than `delay` behind this key's
                # max seen event time -> late, no emission (T2 semantics)
                if buf_ts and t < buf_ts[-1] - delay_us:
                    emit_mask.append(False)
                    continue
                emit_mask.append(True)
                # insert in sorted position (append is O(1) for in-order data)
                buf_ts.append(t)
                buf_vals.append(float(row_vals[i]))
                if len(buf_ts) > 1 and buf_ts[-2] > t:
                    order = sorted(range(len(buf_ts)), key=buf_ts.__getitem__)
                    buf_ts = [buf_ts[j] for j in order]
                    buf_vals = [buf_vals[j] for j in order]
                # evict entries older than lookback+delay behind max ts seen:
                # the extra `delay` slack keeps exact frames for rows that
                # arrive up to the allowed lateness out of order
                horizon = buf_ts[-1] - lookback_us - delay_us
                k = 0
                while k < len(buf_ts) and buf_ts[k] < horizon:
                    k += 1
                if k:
                    buf_ts = buf_ts[k:]
                    buf_vals = buf_vals[k:]
                # frame = entries in [t - lookback, t] (2-decimal exact sum
                # in integer cents to stay order-independent)
                lo = t - lookback_us
                cents = sum(
                    round(v * 100)
                    for bt, v in zip(buf_ts, buf_vals)
                    if lo <= bt <= t
                )
                sums.append(cents / 100.0)
            mask = np.asarray(emit_mask, dtype=bool)
            outs.append(
                pd.DataFrame(
                    {
                        row_id: row_ids[mask],
                        key: [key_tuple[0]] * len(sums),
                        time_col: pdf[time_col].to_numpy()[mask],
                        out_col: sums,
                    }
                )
            )
        state.update((buf_ts, buf_vals))
        yield from outs

    watermarked = stream.select(row_id, key, time_col, measure).withWatermark(
        time_col, f"{delay_seconds} seconds"
    )
    return watermarked.groupBy(key).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
