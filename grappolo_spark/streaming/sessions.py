"""Custom stateful streaming operator: gap-based sessionization.

Built-in windowed aggregation can't express "a session ends after N idle
minutes" — the canonical case for a CUSTOM stateful operator. This uses
``applyInPandasWithState`` (Arrow-batched per-group state, event-time
timeout): per user the open session lives in the state store; a batch's
events extend it or close it (gap exceeded), and the event-time timeout
closes the final session once the watermark passes ``session_end + gap``.

Scale shape: state is O(active users) and partitioned by the group key;
each micro-batch touches only the users present in it plus timed-out keys.
Checkpointing makes it exactly-once and restartable like every other
superstep in this engine.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, value_sum double"
)
STATE_SCHEMA = "start long, end long, n long, vs double"

_US = 1_000_000  # state timestamps are stored as epoch-microseconds


def sessionize(
    events_stream: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "30 minutes",
) -> DataFrame:
    """(user_id, session_start, session_end, n_events, value_sum), one row
    per CLOSED session (append semantics)."""
    gap_us = gap_minutes * 60 * _US

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed = []

        def emit(s):
            closed.append(
                {
                    "user_id": user_id,
                    "session_start": pd.Timestamp(s[0], unit="us"),
                    "session_end": pd.Timestamp(s[1], unit="us"),
                    "n_events": s[2],
                    "value_sum": s[3],
                }
            )

        if state.hasTimedOut:
            if state.exists:
                emit(state.get)
                state.remove()
        else:
            rows = pd.concat(list(pdfs))
            rows = rows.sort_values("ts")
            # normalize to ns resolution first: pandas 2.x may hand Arrow
            # timestamps through at us resolution, and a bare
            # astype('int64') would then be off by 1000x in the gap math
            ts_us = (
                rows["ts"].astype("datetime64[ns]").astype("int64") // 1000
            ).tolist()  # ns -> us
            vals = rows["value"].tolist()
            cur = list(state.get) if state.exists else None
            for t, v in zip(ts_us, vals):
                if cur is None:
                    cur = [t, t, 1, float(v)]
                elif t - cur[1] > gap_us:
                    emit(cur)
                    cur = [t, t, 1, float(v)]
                else:
                    cur[1] = max(cur[1], t)
                    cur[2] += 1
                    cur[3] += float(v)
            state.update(tuple(cur))
            state.setTimeoutTimestamp((cur[1] + gap_us) // 1000)  # ms
        if closed:
            yield pd.DataFrame(closed)

    ev = (
        events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .select("user_id", "ts", "value")
    )
    return ev.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def py_sessionize(rows, gap_minutes: int = 30):
    """Pure-python oracle: ALL sessions (incl. the trailing open one) per
    user over (user_id, ts_epoch_us, value) tuples."""
    gap_us = gap_minutes * 60 * _US
    by_user: dict = {}
    for u, t, v in sorted(rows):
        s = by_user.setdefault(u, [])
        if s and t - s[-1][1] <= gap_us:
            cur = s[-1]
            cur[1] = max(cur[1], t)
            cur[2] += 1
            cur[3] += float(v)
        else:
            s.append([t, t, 1, float(v)])
    return {
        (u, c[0], c[1], c[2], round(c[3], 6))
        for u, ss in by_user.items()
        for c in ss
    }
