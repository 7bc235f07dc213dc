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
in the first invocation; the emitted rows are then exactly "all sessions
except each user's last" — SQL-expressible, hence the DuckDB oracle in
queries.py. Money-sum policy: per-event values quantize to DECIMAL micros
and sum exactly (order-independent), matching SUM(CAST(value AS
DECIMAL(28,6))) on the oracle side.
"""

from __future__ import annotations

from decimal import Decimal
from typing import Any, Iterator, Tuple

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

# Open-session running aggregates; the decimal sum rides as a string so the
# state store schema stays primitive.
SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("sum_str", T.StringType()),
    ]
)


def _dec_sum(values) -> Decimal:
    total = Decimal(0)
    for v in values:
        total += Decimal(v).quantize(_Q6)
    return total


def _emit_frame(user_id: int, sessions: list[Tuple[int, int, int, Decimal]]) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id] * len(sessions),
            "session_start": pd.to_datetime([s[0] for s in sessions], unit="us"),
            "session_end": pd.to_datetime([s[1] for s in sessions], unit="us"),
            "n_events": [s[2] for s in sessions],
            "sum_value": [float(s[3]) for s in sessions],
        }
    )


def close_user_sessions(
    key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state
) -> Iterator[pd.DataFrame]:
    """The applyInPandasWithState function for one user's batch of events."""
    (user_id,) = key

    if state.hasTimedOut:
        start_us, last_us, n, sum_str = state.get
        state.remove()
        yield _emit_frame(user_id, [(start_us, last_us, n, Decimal(sum_str))])
        return

    pdf = pd.concat(list(pdfs), ignore_index=True)
    pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
    ts_us = (pdf["ts"].astype("int64") // 1000).to_numpy()
    values = pdf["value"].to_numpy()

    # Running aggregates carried over from the open session, if any.
    if state.exists:
        start_us, last_us, n, sum_str = state.get
        cur = [int(start_us), int(last_us), int(n), Decimal(sum_str)]
    else:
        cur = None

    closed: list[Tuple[int, int, int, Decimal]] = []
    for t, v in zip(ts_us, values):
        t = int(t)
        if cur is not None and t - cur[1] > GAP_US:
            closed.append(tuple(cur))
            cur = None
        if cur is None:
            cur = [t, t, 0, Decimal(0)]
        cur[1] = max(cur[1], t)
        cur[2] += 1
        cur[3] += Decimal(float(v)).quantize(_Q6)

    state.update((cur[0], cur[1], cur[2], str(cur[3])))
    # Close the open session once event time passes last_ts + gap.
    state.setTimeoutTimestamp((cur[1] + GAP_US) // 1000)

    if closed:
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
