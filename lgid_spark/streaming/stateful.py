"""Custom stateful streaming operator: session aggregation via
applyInPandasWithState (SURVEY §2.10 W4 sessionization, streaming form).

Batch sessionization (queries/windowed.sessionize) needs the whole
history; the streaming form keeps per-user state (session start, last
event time, count) and emits a session row when the gap timeout fires —
bounded state, incremental output, the standard continuous-ingest shape
for the 100 TB target's event telemetry.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_MS = 30 * 60 * 1000

OUTPUT_DDL = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, closed_by string"
)
STATE_DDL = "start_ms bigint, last_ms bigint, n bigint"


def _update(
    key: Tuple[int],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    rows = []
    if state.hasTimedOut:
        start_ms, last_ms, n = state.get
        rows.append((user_id, start_ms, last_ms, n, "timeout"))
        state.remove()
    else:
        ts_ms: list[int] = []
        for pdf in pdfs:
            # drop NaT BEFORE the int64 cast: pandas silently turns NaT
            # into the -2^63 ns sentinel, which would fabricate a
            # year-1677 session start and mis-split the real one
            ts = pdf["ts"].dropna()
            ts_ms.extend((ts.astype("int64") // 1_000_000).tolist())
        ts_ms.sort()
        if not ts_ms:
            # batch held only null-timestamp rows: nothing to sessionize
            if state.exists:
                state.setTimeoutDuration(SESSION_GAP_MS)
            return
        if state.exists:
            start_ms, last_ms, n = state.get
        else:
            start_ms, last_ms, n = ts_ms[0], ts_ms[0], 0
        for t in ts_ms:
            if t - last_ms > SESSION_GAP_MS:
                rows.append((user_id, start_ms, last_ms, n, "gap"))
                start_ms, n = t, 0
            last_ms = t
            n += 1
        state.update((start_ms, last_ms, n))
        state.setTimeoutDuration(SESSION_GAP_MS)
    out = pd.DataFrame(
        rows,
        columns=["user_id", "start_ms", "last_ms", "n_events", "closed_by"],
    )
    if not out.empty:
        out["session_start"] = pd.to_datetime(out.pop("start_ms"), unit="ms")
        out["session_end"] = pd.to_datetime(out.pop("last_ms"), unit="ms")
        out = out[["user_id", "session_start", "session_end",
                   "n_events", "closed_by"]]
        yield out


def sessionize_stream(events: DataFrame) -> DataFrame:
    """events(user_id bigint, ts timestamp) stream → closed-session rows.

    Processing-time timeouts close idle sessions; gap splits inside a
    batch close eagerly. State per user is three longs — at 10^9 users
    this is ~24 GB across the cluster, partitioned by the groupBy key."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_DDL,
        stateStructType=STATE_DDL,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
