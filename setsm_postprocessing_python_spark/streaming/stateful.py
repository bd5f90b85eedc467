"""Custom stateful streaming operator: per-host crawl sessionization.

applyInPandasWithState over the pages stream: consecutive pages from the
same host within `gap` seconds form one crawl session; when the gap
expires (event-time timeout against the watermark), the session is
emitted with its page count and span. This is the engine's example of a
stateful operator Spark's built-ins don't provide (the reference has no
streaming; resumable-batch is covered by plans/manifest.py — this is the
streaming-native extension point).

State per host is one (start, last, count) tuple — bounded, and expired
by timeout, so state size is O(active hosts), independent of stream length.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = ("group_id string, session_start long, session_end long, "
                  "n_pages long, closed boolean")
STATE_SCHEMA = "start long, last long, n long"
SESSION_GAP_S = 3600


def _sessionize(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    (group_id,) = key
    if state.hasTimedOut:
        start, last, n = state.get
        state.remove()
        yield pd.DataFrame([{"group_id": group_id, "session_start": start,
                             "session_end": last, "n_pages": n,
                             "closed": True}])
        return
    ts = []
    for pdf in pdfs:
        ts.extend(int(t) for t in pdf["warc_epoch"])
    if not ts:
        return
    ts.sort()
    if state.exists:
        start, last, n = state.get
    else:
        start, last, n = ts[0], ts[0], 0
    out = []
    for t in ts:
        if t - last > SESSION_GAP_S:
            out.append({"group_id": group_id, "session_start": start,
                        "session_end": last, "n_pages": n, "closed": True})
            start, n = t, 0
        last = max(last, t)
        n += 1
    state.update((start, last, n))
    state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + SESSION_GAP_S * 1000)
    out.append({"group_id": group_id, "session_start": start,
                "session_end": last, "n_pages": n, "closed": False})
    yield pd.DataFrame(out)


def crawl_sessions(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Sessionize the pages stream per host (update mode)."""
    return (stream.withWatermark("warc_ts", watermark)
            .groupBy("group_id")
            .applyInPandasWithState(
                _sessionize, SESSION_SCHEMA, STATE_SCHEMA,
                "update", GroupStateTimeout.EventTimeTimeout))
