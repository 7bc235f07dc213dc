"""Custom stateful streaming operator: gap sessionization with
``applyInPandasWithState`` (SURVEY.md §2.2 S25; the reference has no
streaming at all, so this is north-star surface).

Semantics: per-user 30-minute-inactivity sessions. A session CLOSES when a
newer event arrives more than the gap after it (or when the event-time
timeout fires after the watermark passes ``last_ts + gap``). Closed sessions
are emitted append-mode; the open tail session stays in the state store.

Scale notes: state is keyed by user_id — one shuffle, state size bounded by
|active users| x O(1) aggregates (we never store raw events, only the open
session's running aggregates). The watermark bounds how long an idle user's
open session is retained before the timeout closes it. This is exactly the
structure that survives a Kafka source at production rates.

Determinism: the test/oracle path replays the events table as ONE microbatch
(single input file, no maxFilesPerTrigger), so every user's full history is
in the first invocation; the emitted rows are then exactly "all closed
sessions, plus open sessions whose event-time timeout fires under the final
watermark" — SQL-expressible, hence the DuckDB oracle in queries.py.

Money-sum policy: per-event values quantize to integer micros and sum in
int64 — exact and order-independent, matching SUM(CAST(value AS
DECIMAL(28,6))) on the oracle side. The quantization is vectorized
(np.rint of value*1e6) with a Decimal fallback only for values within
float-error distance of a .5-micro rounding boundary.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal
from typing import Any, Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

GAP_US = 30 * 60 * 1_000_000
_Q6 = Decimal("0.000001")

SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

# Open-session running aggregates (value sum carried as exact micros).
SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("sum_micros", T.LongType()),
    ]
)


def _value_micros(values: np.ndarray) -> np.ndarray:
    """value -> round(value * 1e6) as int64, bit-matching a DECIMAL(28,6)
    cast. Vectorized float rounding, with a Decimal recomputation for the
    (measure-zero) values whose *1e6 image lands within float error of a
    .5 boundary."""
    scaled = values * 1e6
    frac = scaled - np.floor(scaled)
    risky = np.abs(frac - 0.5) < 1e-5
    out = np.rint(scaled)
    if risky.any():
        for i in np.nonzero(risky)[0]:
            # ROUND_HALF_UP (ties away from zero), NOT the Decimal default
            # half-even: DuckDB's CAST(double AS DECIMAL(28,6)) rounds
            # exact .5-micro ties away from zero (e.g. 0.0078125 ->
            # 0.007813), so half-even here would emit a sum 1 micro off
            # on exactly the boundary values this fallback exists for.
            out[i] = float(
                Decimal(float(values[i])).quantize(
                    _Q6, rounding=ROUND_HALF_UP
                ) * 1_000_000
            )
    return out.astype(np.int64)


def _emit_frame(user_id: int, sessions: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": np.full(len(sessions), user_id, dtype=np.int64),
            "session_start": pd.to_datetime(sessions["start"], unit="us"),
            "session_end": pd.to_datetime(sessions["end"], unit="us"),
            "n_events": sessions["n"].to_numpy(),
            "sum_value": sessions["mic"].to_numpy() / 1e6,
        }
    )


def close_user_sessions(
    key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state
) -> Iterator[pd.DataFrame]:
    """The applyInPandasWithState function for one user's batch of events."""
    (user_id,) = key

    if state.hasTimedOut:
        start_us, last_us, n, sum_mic = state.get
        state.remove()
        yield _emit_frame(
            user_id,
            pd.DataFrame(
                {"start": [start_us], "end": [last_us], "n": [n], "mic": [sum_mic]}
            ),
        )
        return

    pdf = pd.concat(list(pdfs), ignore_index=True)
    pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
    ts_us = (pdf["ts"].astype("int64") // 1000).to_numpy()
    mic = _value_micros(pdf["value"].to_numpy(dtype=np.float64))

    # Vectorized session split: new session where the gap exceeds GAP_US.
    is_new = np.concatenate([[True], np.diff(ts_us) > GAP_US])
    if state.exists:
        start_us, last_us, n0, mic0 = state.get
        # The first incoming event continues the open session unless the gap
        # from its last event exceeds GAP_US.
        is_new[0] = ts_us[0] - last_us > GAP_US
    sid = np.cumsum(is_new)

    g = pd.DataFrame({"sid": sid, "ts": ts_us, "mic": mic}).groupby("sid")
    sess = pd.DataFrame(
        {
            "start": g["ts"].first(),
            "end": g["ts"].last(),
            "n": g.size(),
            "mic": g["mic"].sum(),
        }
    )
    if state.exists and not is_new[0]:
        # Merge carried aggregates into the first session of this batch.
        sess.iloc[0, sess.columns.get_loc("start")] = min(
            int(start_us), int(sess.iloc[0]["start"])
        )
        sess.iloc[0, sess.columns.get_loc("end")] = max(
            int(last_us), int(sess.iloc[0]["end"])
        )
        sess.iloc[0, sess.columns.get_loc("n")] += int(n0)
        sess.iloc[0, sess.columns.get_loc("mic")] += int(mic0)
    elif state.exists:
        # Gap closed the carried session: emit it ahead of this batch's.
        carried = pd.DataFrame(
            {"start": [start_us], "end": [last_us], "n": [n0], "mic": [mic0]}
        )
        sess = pd.concat([carried, sess], ignore_index=True)

    open_row = sess.iloc[-1]
    state.update(
        (int(open_row["start"]), int(open_row["end"]), int(open_row["n"]),
         int(open_row["mic"]))
    )
    # Close the open session once event time passes last_ts + gap. A
    # LATE batch (all events below the watermark — applyInPandasWithState
    # does NOT drop late rows) would put that instant in the past, and
    # setTimeoutTimestamp rejects timestamps under the watermark with
    # INVALID_TIMEOUT_TIMESTAMP, killing the whole query. Clamp to just
    # above the watermark: the session closes on the next watermark
    # advance, which is the earliest legal moment anyway.
    timeout_ms = (int(open_row["end"]) + GAP_US) // 1000
    wm_ms = state.getCurrentWatermarkMs()
    state.setTimeoutTimestamp(max(timeout_ms, wm_ms + 1))

    closed = sess.iloc[:-1]
    if len(closed):
        yield _emit_frame(user_id, closed)


def sessionize_stream(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Stateful sessionization over a streaming events frame."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events.withWatermark("ts", watermark)
        .select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            close_user_sessions,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
