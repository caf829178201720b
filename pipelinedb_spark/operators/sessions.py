"""Sessionization: group per-user event streams into sessions split by
inactivity gaps — the canonical custom stateful streaming operator
(and a standard training-data/behavioral-analytics primitive).

Two forms with identical semantics:

* ``sessionize`` — batch/overlay form: one window pass (lag → gap flag
  → running sum) entirely in JVM expressions.  One shuffle keyed by
  user.
* ``sessionize_stream`` — Structured Streaming form using
  ``applyInPandasWithState``: per-user state carries (last_ts,
  session_seq); a session emits either when a later event of the same
  user crosses the gap, or when the event-time watermark passes
  last_ts + gap (EventTimeTimeout).  This is the "custom stateful
  operator" escape hatch the engine offers for semantics Spark's
  windowed aggregations can't express.

  Event-time (not processing-time) timeout is deliberate: a
  processing-time timeout makes the micro-batch engine self-trigger
  empty batches forever to re-evaluate wall-clock timers — a livelock
  for ``processAllAvailable`` callers and a warm-idle cost at scale —
  while an event-time timer only advances with the watermark, i.e.
  with data.
"""

from __future__ import annotations

import datetime
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def sessionize(df: DataFrame, user_col: str = "user_id",
               ts_col: str = "ts", gap_seconds: float = 1800.0,
               id_col: str = "event_id") -> DataFrame:
    """Assign a session_id to every event: sessions break when the gap
    to the previous event of the same user exceeds ``gap_seconds``.
    session_id = (user, index of session for that user, 1-based)."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    prev_ts = F.lag(F.col(ts_col)).over(w)
    new_session = (prev_ts.isNull() |
                   (F.col(ts_col).cast("timestamp").cast("double")
                    - prev_ts.cast("timestamp").cast("double")
                    > gap_seconds)).cast("int")
    return df.withColumn(
        "session_seq",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"))


def session_stats(df: DataFrame, user_col: str = "user_id",
                  ts_col: str = "ts", gap_seconds: float = 1800.0,
                  id_col: str = "event_id") -> DataFrame:
    """One row per session: bounds, event count."""
    s = sessionize(df, user_col, ts_col, gap_seconds, id_col)
    return (s.groupBy(user_col, "session_seq")
            .agg(F.min(ts_col).alias("session_start"),
                 F.max(ts_col).alias("session_end"),
                 F.count("*").alias("n_events")))


_SESSION_OUT = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_start", T.TimestampType()),
    T.StructField("session_end", T.TimestampType()),
    T.StructField("n_events", T.LongType()),
])

_SESSION_STATE = "last_ts DOUBLE, start_ts DOUBLE, n LONG"


def sessionize_stream(stream_df: DataFrame, gap_seconds: float = 1800.0,
                      user_col: str = "user_id", ts_col: str = "ts",
                      watermark_delay: str = "10 seconds"):
    """Streaming sessionization via applyInPandasWithState with
    EventTimeTimeout: a session closes when a later event of the same
    user crosses the gap, or when the watermark passes last_ts + gap.
    Returns a DataFrame ready for ``writeStream``."""
    from pyspark.sql.streaming.state import (GroupState,
                                             GroupStateTimeout)

    gap = float(gap_seconds)

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (user,) = key
        out = []
        if state.exists:
            last_ts, start_ts, n = state.get
        else:
            last_ts, start_ts, n = None, None, 0
        if state.hasTimedOut:
            if last_ts is not None:
                out.append((user,
                            datetime.datetime.utcfromtimestamp(start_ts),
                            datetime.datetime.utcfromtimestamp(last_ts),
                            n))
            state.remove()
        else:
            rows = pd.concat(list(pdfs)) if pdfs else pd.DataFrame()
            if len(rows):
                ts = rows[ts_col].astype("datetime64[us]").astype("int64") / 1e6
                for t in sorted(ts):
                    if last_ts is not None and t - last_ts > gap:
                        out.append((user,
                                    datetime.datetime.utcfromtimestamp(start_ts),
                                    datetime.datetime.utcfromtimestamp(last_ts),
                                    n))
                        start_ts, n = t, 0
                    if start_ts is None:
                        start_ts = t
                    last_ts = t
                    n += 1
                state.update((last_ts, start_ts, n))
                # close the open session once the watermark passes
                # last_ts + gap; the timer must sit strictly beyond the
                # current watermark or Spark rejects it
                state.setTimeoutTimestamp(
                    max(int((last_ts + gap) * 1000),
                        state.getCurrentWatermarkMs() + 1))
        yield pd.DataFrame(out, columns=["user_id", "session_start",
                                         "session_end", "n_events"])

    return (stream_df.withWatermark(ts_col, watermark_delay)
            .groupBy(user_col)
            .applyInPandasWithState(fn, _SESSION_OUT, _SESSION_STATE,
                                    "append",
                                    GroupStateTimeout.EventTimeTimeout))
