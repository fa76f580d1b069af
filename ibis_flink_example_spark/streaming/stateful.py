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
    # State: parallel arrays of event-time (µs) and measure values in integer
    # cents (2-decimal-exact, order-independent sums) kept inside the
    # lookback+delay horizon of the max timestamp seen.
    state_schema = T.StructType(
        [
            T.StructField("ts_us", T.ArrayType(T.LongType())),
            T.StructField("cents", T.ArrayType(T.LongType())),
        ]
    )

    def update(
        key_tuple: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        """Vectorized trailing-sum: one numpy pass per (key, batch) instead of
        a per-row Python loop over the buffer (O(n log n) vs O(n·frame)).

        Correctness notes:
        - Late cut is vs the PRIOR batches' max only: within the sorted batch
          a row can never be late relative to same-batch rows (its own ts is
          part of the running max), so the evolving-max rule of the row-at-a-
          time formulation collapses to one vector compare.
        - Eviction can't change any emitted frame: evicted entries sit below
          max - lookback - delay, while every non-late row's frame floor is
          >= max - delay - lookback. So eviction happens once, at the end.
        - RANGE-frame peers (equal ts) are all included via searchsorted
          side='right' — exact SQL RANGE ... CURRENT ROW semantics.
        - Sums accumulate integer cents (exact for 2-decimal measures); one
          float division at the end.
        """
        if state.exists:
            s_ts, s_cents = state.get
            prior_ts = np.asarray(s_ts, dtype=np.int64)
            prior_cents = np.asarray(s_cents, dtype=np.int64)
        else:
            prior_ts = np.empty(0, dtype=np.int64)
            prior_cents = np.empty(0, dtype=np.int64)

        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(time_col, kind="mergesort")
        # normalize to µs regardless of pandas datetime unit (ns or µs)
        row_ts = pdf[time_col].astype("datetime64[us]").astype("int64").to_numpy()
        # half-up quantization — the SAME idiom as the batch twins and SQL
        # oracles (np.rint is half-to-even and would diverge on exact .5
        # products if the 2-decimal input contract were ever violated)
        row_cents = np.floor(pdf[measure].to_numpy() * 100 + 0.5).astype(np.int64)

        # per-key watermark drop (T2): more than `delay` behind the key's max
        keep = (
            row_ts >= prior_ts[-1] - delay_us
            if len(prior_ts)
            else np.ones(len(row_ts), dtype=bool)
        )
        kept_ts = row_ts[keep]
        kept_cents = row_cents[keep]

        # merged sorted timeline = surviving buffer + this batch's rows
        all_ts = np.concatenate([prior_ts, kept_ts])
        all_cents = np.concatenate([prior_cents, kept_cents])
        order = np.argsort(all_ts, kind="stable")
        all_ts = all_ts[order]
        all_cents = all_cents[order]
        cum = np.cumsum(all_cents)

        # frame [t - lookback, t] per kept row: prefix-sum difference
        hi = np.searchsorted(all_ts, kept_ts, side="right")
        lo = np.searchsorted(all_ts, kept_ts - lookback_us, side="left")
        sums = (cum[hi - 1] - np.where(lo > 0, cum[lo - 1], 0)) / 100.0

        # evict once: keep lookback+delay of history behind the new max
        if len(all_ts):
            cut = np.searchsorted(
                all_ts, all_ts[-1] - lookback_us - delay_us, side="left"
            )
            state.update((all_ts[cut:].tolist(), all_cents[cut:].tolist()))

        yield pd.DataFrame(
            {
                row_id: pdf[row_id].to_numpy()[keep],
                key: np.repeat(key_tuple[0], len(kept_ts)),
                time_col: pdf[time_col].to_numpy()[keep],
                out_col: sums,
            }
        )

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


def stateful_rows_anomaly(
    stream: DataFrame,
    *,
    key: str,
    time_col: str,
    measure: str,
    row_id: str,
    lookback: int = 20,
    min_prior: int = 5,
    z_threshold: int = 3,
    delay_seconds: float = 15.0,
) -> DataFrame:
    """Streaming twin of ``operators/funnel.py:trailing_anomaly_flags``:
    per-key ROWS-frame z-test (|x − μ| > z·σ over the previous ``lookback``
    events) as a custom stateful operator — the monitoring pipeline shape
    (payment-fraud flags over the reference's payment stream).

    State per key is O(lookback): the last ``lookback`` (ts_us, id, cents)
    triples plus a lifetime counter (so ``n_prior`` matches the batch
    semantics before the buffer fills). The z-test runs in integer cents —
    identical to the batch operator, so a drained in-order run equals the
    batch oracle row-for-row. Late rows: ROWS frames are arrival-
    order-sensitive, so rows more than ``delay_seconds`` behind the key's
    max event time are dropped (same per-key watermark contract as
    ``stateful_range_over_sum``); rows within the delay are merged into
    (ts, id) order with the retained buffer before framing. A straggler
    whose frame would extend past the retained buffer into EVICTED
    history is tested (and reports ``n_prior``) over the retained
    horizon only — a truncated-but-consistent frame, never corrupted
    state; in-order arrival never truncates.
    """
    delay_us = int(delay_seconds * 1_000_000)
    t2 = z_threshold * z_threshold

    in_schema = stream.schema
    out_schema = T.StructType(
        [
            T.StructField(row_id, in_schema[row_id].dataType),
            T.StructField(key, in_schema[key].dataType),
            T.StructField(measure, T.DoubleType()),
            T.StructField("n_prior", T.IntegerType()),
            T.StructField("is_anomaly", T.BooleanType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("ts_us", T.ArrayType(T.LongType())),
            T.StructField("ids", T.ArrayType(T.LongType())),
            T.StructField("cents", T.ArrayType(T.LongType())),
            T.StructField("n_seen", T.LongType()),
        ]
    )

    def update(
        key_tuple: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            s_ts, s_ids, s_cents, n_seen = state.get
            buf_ts = np.asarray(s_ts, dtype=np.int64)
            buf_ids = np.asarray(s_ids, dtype=np.int64)
            buf_cents = np.asarray(s_cents, dtype=np.int64)
            n_seen = int(n_seen)
        else:
            buf_ts = np.empty(0, dtype=np.int64)
            buf_ids = np.empty(0, dtype=np.int64)
            buf_cents = np.empty(0, dtype=np.int64)
            n_seen = 0

        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values([time_col, row_id], kind="mergesort")
        row_ts = pdf[time_col].astype("datetime64[us]").astype("int64").to_numpy()
        row_ids = pdf[row_id].to_numpy(dtype=np.int64)
        # half-up quantization — the SAME idiom as the batch twins and SQL
        # oracles (np.rint is half-to-even and would diverge on exact .5
        # products if the 2-decimal input contract were ever violated)
        row_cents = np.floor(pdf[measure].to_numpy() * 100 + 0.5).astype(np.int64)
        row_vals = pdf[measure].to_numpy()

        keep = (
            row_ts >= buf_ts[-1] - delay_us
            if len(buf_ts)
            else np.ones(len(row_ts), dtype=bool)
        )
        k_ts, k_ids = row_ts[keep], row_ids[keep]
        k_cents, k_vals = row_cents[keep], row_vals[keep]

        # Merge buffer + batch into (ts, id) order. In-order replay appends;
        # a within-delay straggler lands in its exact batch-semantics slot.
        all_ts = np.concatenate([buf_ts, k_ts])
        all_ids = np.concatenate([buf_ids, k_ids])
        all_cents = np.concatenate([buf_cents, k_cents])
        order = np.lexsort((all_ids, all_ts))
        all_ts, all_ids, all_cents = all_ts[order], all_ids[order], all_cents[order]

        cum_s = np.concatenate([[0], np.cumsum(all_cents)])
        cum_q = np.concatenate([[0], np.cumsum(all_cents * all_cents)])
        # merged position of each new row (positions of batch entries in the
        # merged order = where their concat-indices ended up)
        pos_of = np.empty(len(order), dtype=np.int64)
        pos_of[order] = np.arange(len(order))
        new_pos = pos_of[len(buf_ts):]

        # prior-`lookback` frame in merged coordinates; rows that predate the
        # retained buffer are already beyond lookback by construction
        hidden = n_seen - len(buf_ts)  # evicted history (all older than buffer)
        total_before = new_pos + hidden
        n = np.minimum(total_before, lookback).astype(np.int64)
        # A straggler sorting before retained-buffer entries can have a
        # frame extending into EVICTED history; clamp to the retained
        # horizon (lo >= 0) — without this, negative lo wraps the numpy
        # prefix arrays and corrupts s/q. In-order arrival never clamps
        # (new rows sort after the whole buffer, so new_pos >= n always).
        n = np.minimum(n, new_pos)
        lo = new_pos - n
        s = cum_s[new_pos] - cum_s[lo]
        q = cum_q[new_pos] - cum_q[lo]
        x = all_cents[new_pos]
        dev = n * x - s
        flagged = (n >= min_prior) & (dev * dev > t2 * (n * q - s * s))

        n_seen += len(k_ts)
        cut = max(0, len(all_ts) - lookback)
        state.update(
            (
                all_ts[cut:].tolist(),
                all_ids[cut:].tolist(),
                all_cents[cut:].tolist(),
                n_seen,
            )
        )

        yield pd.DataFrame(
            {
                row_id: k_ids,
                key: np.repeat(key_tuple[0], len(k_ids)),
                measure: k_vals,
                # n/flagged are indexed by concat order = batch sorted
                # order, so they align with k_ids element-wise
                "n_prior": n.astype(np.int32),
                "is_anomaly": flagged,
            }
        )

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


def stateful_funnel_stages(
    stream: DataFrame,
    steps: list[str],
    *,
    key: str,
    time_col: str,
    type_col: str,
) -> DataFrame:
    """Streaming funnel (operators/funnel.py semantics): per-key stage
    completion times maintained as keyed state — t_1 = min ts of a step-1
    event; t_{k+1} = min ts of a step-(k+1) event strictly after t_k.

    Processing each micro-batch in event-time order makes the sequential
    update equal the batch definition on a drained in-order run (the
    prefix-min argument in funnel_stage_times' docstring). State per key is
    k timestamps — O(1), watermark-free by design (a funnel stage, once
    reached, never un-happens; there is nothing to evict).

    Emits the CURRENT (t_1..t_k) per key per micro-batch (epoch-µs, -1 for
    unreached) plus a monotone batch sequence ``update_seq``; the drained
    snapshot is the max-``update_seq`` row per key (run_available_now
    output post-processed with max_by).
    """
    n_steps = len(steps)
    out_schema = T.StructType(
        [
            T.StructField(key, stream.schema[key].dataType),
            T.StructField("update_seq", T.LongType()),
            *[
                T.StructField(f"t_{s}_us", T.LongType())
                for s in steps
            ],
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("times", T.ArrayType(T.LongType())),
            T.StructField("seq", T.LongType()),
        ]
    )

    def update(
        key_tuple: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            times_list, seq = state.get
            times = list(times_list)
            seq = int(seq)
        else:
            times = [-1] * n_steps
            seq = 0

        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(time_col, kind="mergesort")
        ts_us = pdf[time_col].astype("datetime64[us]").astype("int64").to_numpy()
        types = pdf[type_col].to_numpy()

        step_idx = {s: i for i, s in enumerate(steps)}
        for t, ty in zip(ts_us, types):
            i = step_idx.get(ty)
            if i is None:
                continue
            if i == 0:
                if times[0] == -1 or t < times[0]:
                    times[0] = int(t)
            else:
                prev = times[i - 1]
                if prev != -1 and t > prev and (times[i] == -1 or t < times[i]):
                    times[i] = int(t)

        seq += 1
        state.update((times, seq))
        yield pd.DataFrame(
            {
                key: [key_tuple[0]],
                "update_seq": [seq],
                **{f"t_{s}_us": [times[i]] for i, s in enumerate(steps)},
            }
        )

    return stream.select(key, time_col, type_col).groupBy(key).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def make_sessionize_update(
    *,
    key: str,
    time_col: str,
    measure: str,
    tiebreak_col: str,
    gap_us: int,
    delay_us: int,
):
    """Build the per-key ``applyInPandasWithState`` update function for
    stateful_sessionize. Factored out so the property tests can drive the
    EXACT production merge/finalize logic against an independent batch
    reference with a fake GroupState — no duplicated algorithm copies (the
    returned closure is still self-contained for pickling; cloudpickle
    serializes nested closures by value)."""

    def update(
        key_tuple: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            s_starts, s_lasts, s_ns, s_cents, emitted_seq, max_seen = state.get
            sessions = [
                [int(a), int(b), int(c), int(d)]
                for a, b, c, d in zip(s_starts, s_lasts, s_ns, s_cents)
            ]
            emitted_seq, max_seen = int(emitted_seq), int(max_seen)
        else:
            sessions, emitted_seq, max_seen = [], 0, -(1 << 62)

        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values([time_col, tiebreak_col], kind="mergesort")
        row_ts = pdf[time_col].astype("datetime64[us]").astype("int64").to_numpy()
        # half-up — same idiom as every 2-decimal money path in the package
        row_cents = np.floor(pdf[measure].to_numpy() * 100 + 0.5).astype(np.int64)

        import bisect

        for t, c in zip(row_ts, row_cents):
            t, c = int(t), int(c)
            if t < max_seen - delay_us:
                continue  # beyond the per-key lateness budget: drop
            max_seen = max(max_seen, t)
            # position of the first session starting after t
            i = bisect.bisect_right([s[0] for s in sessions], t)
            prev = sessions[i - 1] if i > 0 else None
            nxt = sessions[i] if i < len(sessions) else None
            # t >= prev[0] by bisect, so prev-adjacency is just the gap test
            # (a t inside prev's [start, last] span gives t - last <= 0)
            near_prev = prev is not None and t - prev[1] <= gap_us
            near_next = nxt is not None and nxt[0] - t <= gap_us
            if near_prev and near_next:
                # bridges two unsettled sessions into one
                prev[1] = max(prev[1], nxt[1])
                prev[2] += nxt[2] + 1
                prev[3] += nxt[3] + c
                del sessions[i]
            elif near_prev:
                prev[1] = max(prev[1], t)
                prev[2] += 1
                prev[3] += c
            elif near_next:
                nxt[0] = min(nxt[0], t)
                nxt[2] += 1
                nxt[3] += c
            else:
                sessions.insert(i, [t, t, 1, c])

        # finalize: watermark passed end+gap -> no admissible row can join
        wm = max_seen - delay_us
        n_final = 0
        while n_final < len(sessions) and sessions[n_final][1] + gap_us < wm:
            n_final += 1
        finals = sessions[:n_final]
        sessions = sessions[n_final:]
        state.update(
            (
                [s[0] for s in sessions],
                [s[1] for s in sessions],
                [s[2] for s in sessions],
                [s[3] for s in sessions],
                emitted_seq + n_final,
                max_seen,
            )
        )

        yield pd.DataFrame(
            {
                key: np.repeat(key_tuple[0], n_final),
                "session_seq": np.arange(
                    emitted_seq + 1, emitted_seq + n_final + 1, dtype=np.int64
                ),
                "session_start": np.array(
                    [s[0] for s in finals], dtype="datetime64[us]"
                ),
                "session_end": np.array(
                    [s[1] for s in finals], dtype="datetime64[us]"
                ),
                "n_events": np.array([s[2] for s in finals], dtype=np.int64),
                "sum_value": np.array([s[3] for s in finals], dtype=np.float64)
                / 100.0,
            }
        )

    return update


def stateful_sessionize(
    stream: DataFrame,
    *,
    key: str,
    time_col: str,
    measure: str,
    tiebreak_col: str,
    gap_seconds: float,
    delay_seconds: float,
) -> DataFrame:
    """Streaming session assignment with EXPLICIT session IDs — the
    streaming twin of the batch gaps-and-islands sessionize
    (queries_analytics.py:sessionize_stats; W3 session semantics carried on
    T3 keyed state instead of session_window, which emits windows but not
    session membership/sequence numbers).

    Emission is WATERMARK-FINAL: a session is emitted only once the key's
    watermark (max seen event time − ``delay_seconds``) passes
    ``session_end + gap_seconds`` — at that point no admissible straggler
    can extend or bridge it, so every emitted row is identical to the
    batch gaps-and-islands result over the same admitted events. (Emitting
    eagerly when a successor merely exceeds the gap would be wrong: a
    within-delay straggler landing in the tail of the gap window can
    BRIDGE the emitted session with the open one — batch would merge them,
    append-mode cannot retract.)

    Per-key state is the list of UNSETTLED sessions (start, last, n,
    cents) — those the watermark hasn't finalized — plus the count of
    sessions already emitted (for seq numbering). A new row merges into an
    adjacent session (within gap on either side), bridges two into one, or
    opens its own; rows more than ``delay_seconds`` behind the key's max
    are dropped (per-key watermark, same T2 contract as
    stateful_range_over_sum). Unsettled sessions per key are bounded by
    delay/gap ratio + 1 — O(1) state for any fixed configuration.
    Randomized equivalence against an independent batch reference is
    pinned in tests/test_properties.py.

    Output: (key, session_seq, session_start, session_end, n_events,
    sum_value) — identical column contract to the batch query; sums carry
    integer cents internally (2-decimal-exact, order-independent).
    """
    gap_us = int(gap_seconds * 1_000_000)
    delay_us = int(delay_seconds * 1_000_000)

    out_schema = T.StructType(
        [
            T.StructField(key, stream.schema[key].dataType),
            T.StructField("session_seq", T.LongType()),
            T.StructField("session_start", T.TimestampType()),
            T.StructField("session_end", T.TimestampType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("sum_value", T.DoubleType()),
        ]
    )
    # parallel arrays over unsettled sessions, in start order
    state_schema = T.StructType(
        [
            T.StructField("starts", T.ArrayType(T.LongType())),
            T.StructField("lasts", T.ArrayType(T.LongType())),
            T.StructField("ns", T.ArrayType(T.LongType())),
            T.StructField("cents", T.ArrayType(T.LongType())),
            T.StructField("emitted_seq", T.LongType()),
            T.StructField("max_seen", T.LongType()),
        ]
    )

    update = make_sessionize_update(
        key=key,
        time_col=time_col,
        measure=measure,
        tiebreak_col=tiebreak_col,
        gap_us=gap_us,
        delay_us=delay_us,
    )
    watermarked = stream.select(key, time_col, tiebreak_col, measure).withWatermark(
        time_col, f"{delay_seconds} seconds"
    )
    return watermarked.groupBy(key).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
