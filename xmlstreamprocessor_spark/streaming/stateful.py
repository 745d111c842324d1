"""Custom stateful streaming operator via applyInPandasWithState — the
streaming escape hatch, analogous to the reference's Custom parser hook
(Parser.cs:318-331) but for arbitrary per-key state machines.

Implemented operator: a sessionizer with explicit state (open-session
start/last/count per user).  Sessions closed by a gap within the data are
emitted immediately; the open session is kept in state and emitted on
processing-time timeout (or end-of-replay in tests).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_last", TimestampType()),
        StructField("n_events", LongType()),
        StructField("status", StringType()),  # closed | open
    ]
)

SESSION_STATE = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
    ]
)

_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap


def _make_sessionize_fn(timeout_ms: int | None):
    def _sessionize_fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_last": [pd.Timestamp(last_us, unit="us")],
                    "n_events": [n],
                    "status": ["closed"],
                }
            )
            return

        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us = last_us = None
            n = 0

        out_rows: list[tuple] = []
        ts_all = pd.concat([pdf["ts"] for pdf in pdfs]).sort_values()
        for ts in ts_all:
            ts_us = ts.value // 1000
            if start_us is None:
                start_us, last_us, n = ts_us, ts_us, 1
            elif ts_us - last_us > _GAP_US:
                out_rows.append((user_id, start_us, last_us, n, "closed"))
                start_us, last_us, n = ts_us, ts_us, 1
            else:
                last_us, n = ts_us, n + 1
        state.update((start_us, last_us, n))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        if out_rows:
            yield pd.DataFrame(
                {
                    "user_id": [r[0] for r in out_rows],
                    "session_start": [pd.Timestamp(r[1], unit="us") for r in out_rows],
                    "session_last": [pd.Timestamp(r[2], unit="us") for r in out_rows],
                    "n_events": [r[3] for r in out_rows],
                    "status": [r[4] for r in out_rows],
                }
            )

    return _sessionize_fn


def sessionize_stateful(events: DataFrame, timeout_ms: int | None = 60_000) -> DataFrame:
    """Per-user stateful sessionization over a streaming events DataFrame
    (columns: user_id, ts).  State is O(1) per user; scale-out is by the
    groupBy key like any stateful streaming op.

    ``timeout_ms`` closes idle open sessions on a processing-time timeout
    (production behavior).  Pass ``None`` for gap-closed-only semantics —
    deterministic regardless of wall-clock, which is what tests compare
    against a batch twin."""
    timeout_conf = (
        GroupStateTimeout.NoTimeout
        if timeout_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return events.select("user_id", "ts").groupBy("user_id").applyInPandasWithState(
        _make_sessionize_fn(timeout_ms),
        outputStructType=SESSION_OUTPUT,
        stateStructType=SESSION_STATE,
        outputMode="append",
        timeoutConf=timeout_conf,
    )


def _make_event_time_fn(gap_us: int):
    gap_ms = gap_us // 1000

    def _fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_last": [pd.Timestamp(last_us, unit="us")],
                    "n_events": [n],
                    "status": ["closed"],
                }
            )
            return

        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us = last_us = None
            n = 0

        out_rows: list[tuple] = []
        ts_all = pd.concat([pdf["ts"] for pdf in pdfs]).sort_values()
        for ts in ts_all:
            ts_us = ts.value // 1000
            if start_us is None:
                start_us, last_us, n = ts_us, ts_us, 1
            elif ts_us - last_us > gap_us:
                out_rows.append((user_id, start_us, last_us, n, "closed"))
                start_us, last_us, n = ts_us, ts_us, 1
            else:
                last_us, n = ts_us, n + 1
        state.update((start_us, last_us, n))
        # close when the event-time watermark passes the session's gap
        # horizon — deterministic, no wall clock involved
        state.setTimeoutTimestamp(last_us // 1000 + gap_ms)
        if out_rows:
            yield pd.DataFrame(
                {
                    "user_id": [r[0] for r in out_rows],
                    "session_start": [pd.Timestamp(r[1], unit="us") for r in out_rows],
                    "session_last": [pd.Timestamp(r[2], unit="us") for r in out_rows],
                    "n_events": [r[3] for r in out_rows],
                    "status": [r[4] for r in out_rows],
                }
            )

    return _fn


def sessionize_event_time(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Event-time sessionization: sessions close when the watermark passes
    last_event + gap — fully deterministic (replaying the same data gives
    identical output, unlike processing-time timeouts), which is the
    production configuration for late-data-tolerant pipelines."""
    gap_us = gap_minutes * 60 * 1_000_000
    return (
        events.select("user_id", "ts")
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_event_time_fn(gap_us),
            outputStructType=SESSION_OUTPUT,
            stateStructType=SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
