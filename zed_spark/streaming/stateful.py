"""Custom stateful streaming operator: per-user session tracking via
applyInPandasWithState.

The batch analog is analytics.sessionize (gap-based windows); this
is the streaming form a real event pipeline needs: state = the open
session per user (start, last-seen, count); a session closes when
the gap timeout fires or a new event arrives past the gap.

Scale: state is partitioned by user key across executors; the state
store checkpoints incrementally. This demonstrates the full custom-
stateful plumbing (state schema, timeouts, output modes) with a
deterministic, testable operator.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events int, closed boolean"
)
STATE_SCHEMA = "start long, last long, n int"

_GAP_SECONDS = 30 * 60


def _make_tracker(use_timeout: bool):
    def _track_sessions(
        key: tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        """State update: fold this micro-batch's events into the open
        session; emit closed sessions + the current open one."""
        (user_id,) = key
        if use_timeout and state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start, unit="s")],
                    "session_end": [pd.Timestamp(last, unit="s")],
                    "n_events": [n],
                    "closed": [True],
                }
            )
            return

        ts: list[int] = []
        for pdf in batches:
            ts.extend(pdf["ts"].astype("int64") // 1_000_000_000)
        ts.sort()

        start, last, n = state.get if state.exists else (None, None, 0)
        out_rows: list[tuple] = []
        for t in ts:
            if start is None:
                start, last, n = t, t, 1
            elif t - last > _GAP_SECONDS:
                out_rows.append((start, last, n, True))
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1
        if start is not None:
            state.update((int(start), int(last), int(n)))
            if use_timeout:
                state.setTimeoutDuration(_GAP_SECONDS * 1000)
            out_rows.append((start, last, n, False))

        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(out_rows),
                "session_start": [pd.Timestamp(s, unit="s") for s, _, _, _ in out_rows],
                "session_end": [pd.Timestamp(e, unit="s") for _, e, _, _ in out_rows],
                "n_events": [n for _, _, n, _ in out_rows],
                "closed": [c for _, _, _, c in out_rows],
            }
        )

    return _track_sessions


def streaming_sessions(events: DataFrame, close_on_timeout: bool = False) -> DataFrame:
    """events (streaming, with ts + user_id) → session rows.

    close_on_timeout=True registers processing-time timers that emit
    a final closed row when a session goes idle — the production
    mode. Leave False for bounded backfills driven by
    processAllAvailable(): pending timers keep the query busy
    indefinitely, so a drain-style run never returns with timers on
    (observed: the query hangs, not a latency issue).
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if close_on_timeout
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _make_tracker(close_on_timeout),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
