"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState``.

Spark's built-in session window (``F.session_window``) covers windowed
aggregation; this operator demonstrates the ARBITRARY-state path — per-key
state (open session start/end/count) maintained across micro-batches, with
timeout-driven emission, the shape any custom stateful operator
(counters, CDC merge, online features) takes on Structured Streaming.

Scale: state is one small struct per active key, partitioned by the
grouping key across executors; event-time timeout + watermark bound both
state size and lateness.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["sessionize_stream"]

_OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
_STATE_SCHEMA = "start long, end long, n long"


def sessionize_stream(
    stream_df: DataFrame,
    user_col: str = "user_id",
    time_col: str = "ts",
    gap_seconds: int = 1800,
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """Emit (user_id, session_start, session_end, n_events) rows; a session
    closes when no event arrives within ``gap_seconds`` of its last event
    (decided by the event-time timeout, so late data within the watermark
    still extends the right session)."""
    gap_ms = gap_seconds * 1000

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user,) = key
        if state.hasTimedOut:
            start, end, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user],
                    "session_start": [pd.Timestamp(start, unit="ms")],
                    "session_end": [pd.Timestamp(end, unit="ms")],
                    "n_events": [n],
                }
            )
            return

        ts_ms: list[int] = []
        for pdf in pdfs:
            ts_ms.extend(int(t.value // 1_000_000) for t in pdf[time_col])
        ts_ms.sort()
        if state.exists:
            start, end, n = state.get
        else:
            start, end, n = ts_ms[0], ts_ms[0], 0
        closed = []
        for t in ts_ms:
            if t - end > gap_ms:
                closed.append((start, end, n))
                start, n = t, 0
            else:
                # a late event (earlier micro-batch gap) can precede the
                # open session's recorded start — report the true earliest
                start = min(start, t)
            end = max(end, t)
            n += 1
        state.update((start, end, n))
        state.setTimeoutTimestamp(end + gap_ms)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="ms") for s, _, _ in closed],
                    "session_end": [pd.Timestamp(e, unit="ms") for _, e, _ in closed],
                    "n_events": [c for _, _, c in closed],
                }
            )

    return (
        stream_df.withWatermark(time_col, watermark_delay)
        .groupBy(user_col)
        .applyInPandasWithState(
            fn,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
