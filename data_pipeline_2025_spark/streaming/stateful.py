"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` — the Spark-native mechanism for operator
semantics the built-in windowed aggregations can't express
(arbitrary per-key state machines; SURVEY.md §2.9 T7 maps the
reference's absence of these to "we add them as engine capability").

Semantics: per user, events sorted by event time; a gap >
``gap_minutes`` closes the current session. CLOSED sessions are
emitted (append mode); the trailing open session stays in state
across micro-batches — exactly how a production sessionizer behaves,
and asserted against the batch sessionizer (q29) in
tests/test_stateful.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, events bigint"
)
STATE_SCHEMA = "start bigint, last bigint, n bigint"


def sessionize_stream(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        ts_us: list[int] = []
        for pdf in pdfs:
            ts_us.extend((pdf["ts"].astype("int64") // 1000).tolist())
        ts_us.sort()
        if state.exists:
            start, last, n = state.get
        else:
            start = last = None
            n = 0
        closed: list[tuple] = []
        for t in ts_us:
            if start is None:
                start, last, n = t, t, 1
            elif t - last > gap_us:
                closed.append((user_id, start, last, n))
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1
        if start is not None:
            state.update((int(start), int(last), int(n)))
        if closed:
            out = pd.DataFrame(
                closed, columns=["user_id", "session_start", "session_end", "events"]
            )
            out["session_start"] = pd.to_datetime(out["session_start"], unit="us")
            out["session_end"] = pd.to_datetime(out["session_end"], unit="us")
            yield out

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
