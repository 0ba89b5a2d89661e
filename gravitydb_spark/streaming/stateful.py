"""Custom stateful streaming operator — ``applyInPandasWithState``.

The batch sessionizer (relational_queries.events_sessionize) re-expressed
as a continuous operator: per-user session state (current session start,
last-seen time, event count) lives in the state store, sessions are
emitted when the inactivity gap closes them. This is the pattern for any
custom stateful operator the built-in window/watermark machinery can't
express (SURVEY.md §2.9 — entirely absent in the reference).
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

__all__ = ["stream_sessionize"]

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start_s", LongType()),
        StructField("session_end_s", LongType()),
        StructField("n_events", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("start_s", LongType()),
        StructField("last_s", LongType()),
        StructField("n", LongType()),
    ]
)


def _sessionize_group(
    key, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Fold this micro-batch's events (epoch seconds) into session state;
    emit every session closed by a gap > 1800s."""
    (user_id,) = key
    if state.exists:
        start_s, last_s, n = state.get
    else:
        start_s, last_s, n = None, None, 0

    closed = []
    secs: list[int] = []
    for pdf in pdfs:
        secs.extend(int(s) for s in pdf["sec"])
    for s in sorted(secs):
        if start_s is None:
            start_s, last_s, n = s, s, 1
        elif s - last_s > 1800:
            closed.append((user_id, start_s, last_s, n))
            start_s, last_s, n = s, s, 1
        else:
            last_s, n = s, n + 1
    if start_s is not None:
        state.update((start_s, last_s, n))
    if closed:
        yield pd.DataFrame(
            closed, columns=["user_id", "session_start_s", "session_end_s", "n_events"]
        )


def stream_sessionize(events_stream: DataFrame) -> DataFrame:
    """``events_stream`` needs ``user_id`` (long) and ``sec`` (epoch
    seconds, long). Emits closed sessions; the final open session per user
    stays in state (flushed by timeout in production)."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
