"""Custom stateful streaming operator: session aggregation with
``applyInPandasWithState`` (SURVEY.md §2.9 extension — the reference has no
streaming at all; this is the Spark-native pattern for operators whose state
outlives a micro-batch).

Contract: events grouped by key; a session closes when a later event for the
same key arrives more than ``gap_minutes`` after the session's last event
(or when processing-time timeout fires). Closed sessions are APPENDED
downstream as (key, session_start, session_end, n_events, total_value);
open sessions live in the state store across batches.

State per key is O(1) — (start, last_ts, count, sum) — which is what makes
this run on an unbounded stream where a groupBy over raw events could not.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def _session_fn(gap_minutes: int, event_time: bool = False):
    gap_us = gap_minutes * 60 * 1_000_000
    gap_ms = gap_minutes * 60 * 1000

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple] = []

        if state.hasTimedOut:
            if state.exists:
                start_us, last_us, n, total = state.get
                closed.append((user_id, start_us, last_us, n, total))
                state.remove()
        else:
            rows = pd.concat(list(pdfs))
            rows = rows.sort_values("ts")
            ts_us = rows["ts"].astype("int64")  # ns → keep µs below
            if state.exists:
                start_us, last_us, n, total = state.get
            else:
                start_us = last_us = None
                n, total = 0, 0.0
            for t_ns, v in zip(ts_us, rows["value"]):
                t_us = t_ns // 1000
                if start_us is None:
                    start_us, last_us, n, total = t_us, t_us, 1, float(v)
                elif t_us - last_us > gap_us:
                    closed.append((user_id, start_us, last_us, n, total))
                    start_us, last_us, n, total = t_us, t_us, 1, float(v)
                else:
                    last_us, n, total = t_us, n + 1, total + float(v)
            state.update((start_us, last_us, n, total))
            if event_time:
                # close when the WATERMARK (not the wall clock) passes
                # last_event + gap: late data within the allowed lateness
                # still extends the session; data later than that was
                # already dropped upstream by withWatermark. Spark rejects
                # a timeout at-or-before the current watermark, so clamp.
                wm_ms = state.getCurrentWatermarkMs()
                state.setTimeoutTimestamp(max(last_us // 1000 + gap_ms, wm_ms + 1))
            else:
                state.setTimeoutDuration(gap_ms)

        if closed:
            out = pd.DataFrame(
                closed,
                columns=["user_id", "start_us", "end_us", "n_events", "total_value"],
            )
            out["session_start"] = pd.to_datetime(out.pop("start_us"), unit="us")
            out["session_end"] = pd.to_datetime(out.pop("end_us"), unit="us")
            yield out[
                ["user_id", "session_start", "session_end", "n_events", "total_value"]
            ]

    return fn


def streaming_sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
) -> DataFrame:
    """Stateful session aggregation over a stream with columns
    (user_id long, ts timestamp, value double). Emits closed sessions only
    (append semantics); open sessions persist in state with a
    processing-time timeout of one gap."""
    return events.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_minutes),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def streaming_sessionize_event_time(
    events: DataFrame,
    gap_minutes: int = 30,
    late_minutes: int = 10,
) -> DataFrame:
    """Event-time twin of :func:`streaming_sessionize`: sessions close when
    the WATERMARK passes ``last_event + gap``, not when a processing-time
    timer fires — the correct semantics when the stream replays history,
    stalls, or delivers late (the processing-time variant would close
    sessions during a 30-minute ingestion pause even though, in event time,
    the user never left).

    Late-data contract (standard watermark semantics): events up to
    ``late_minutes`` behind the max seen event time still reach the operator
    and extend/merge into their session; events later than that are dropped
    by ``withWatermark`` before the state store, so emitted session
    boundaries are final — append mode stays correct."""
    return (
        events.withWatermark("ts", f"{late_minutes} minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_minutes, event_time=True),
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
