"""Sessionization: batch/window form vs hand-computed sessions, and
the applyInPandasWithState streaming form."""

import datetime
import os

from pyspark.sql import functions as F


def _ts(minute, second=0):
    return datetime.datetime(2024, 1, 1, 10, minute, second)


def test_sessionize_batch(spark):
    from pipelinedb_spark.operators.sessions import session_stats

    rows = [
        # user 1: two sessions (gap > 30 min between minute 10 and 50)
        (1, 100, _ts(0)), (1, 101, _ts(10)), (1, 102, _ts(50)),
        # user 2: one session
        (2, 200, _ts(5)), (2, 201, _ts(6)),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
    out = {(r["user_id"], r["session_seq"]): r
           for r in session_stats(df, gap_seconds=1800).collect()}
    assert len(out) == 3
    s11 = out[(1, 1)]
    assert s11["n_events"] == 2 and s11["session_end"] == _ts(10)
    s12 = out[(1, 2)]
    assert s12["n_events"] == 1 and s12["session_start"] == _ts(50)
    assert out[(2, 1)]["n_events"] == 2


def test_sessionize_stream_stateful(spark, tmp_path):
    """applyInPandasWithState + EventTimeTimeout: sessions emit when a
    later event crosses the inactivity gap, and open sessions flush
    once the watermark passes last_ts + gap."""
    from pipelinedb_spark.operators.sessions import sessionize_stream

    src = str(tmp_path / "sess_src")
    os.makedirs(src, exist_ok=True)
    out_dir = str(tmp_path / "sess_out")
    ckpt = str(tmp_path / "sess_ckpt")

    stream = (spark.readStream
              .schema("user_id long, ts timestamp")
              .json(src))
    sessions = sessionize_stream(stream, gap_seconds=1800)
    q = (sessions.writeStream.format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", ckpt)
         .outputMode("append")
         .start())
    try:
        with open(os.path.join(src, "b1.json"), "w") as f:
            f.write('{"user_id": 1, "ts": "2024-01-01T10:00:00"}\n'
                    '{"user_id": 1, "ts": "2024-01-01T10:05:00"}\n')
        q.processAllAvailable()
        # batch 2: an event 2 hours later closes the first session
        with open(os.path.join(src, "b2.json"), "w") as f:
            f.write('{"user_id": 1, "ts": "2024-01-01T12:00:00"}\n')
        q.processAllAvailable()
        got = spark.read.parquet(out_dir).collect()
        assert len(got) == 1
        s = got[0]
        assert s["user_id"] == 1 and s["n_events"] == 2
        assert s["session_start"] == datetime.datetime(2024, 1, 1, 10, 0)
        assert s["session_end"] == datetime.datetime(2024, 1, 1, 10, 5)

        # batches 3+4: another user's events push the watermark past
        # 12:00 + gap; user 1's open session times out and flushes
        # (timers fire against the watermark of the *previous* batch,
        # hence two batches)
        with open(os.path.join(src, "b3.json"), "w") as f:
            f.write('{"user_id": 2, "ts": "2024-01-01T13:00:00"}\n')
        q.processAllAvailable()
        with open(os.path.join(src, "b4.json"), "w") as f:
            f.write('{"user_id": 2, "ts": "2024-01-01T13:00:01"}\n')
        q.processAllAvailable()
        flushed = [r for r in spark.read.parquet(out_dir).collect()
                   if r["user_id"] == 1 and r["n_events"] == 1]
        assert len(flushed) == 1
        assert flushed[0]["session_start"] == datetime.datetime(2024, 1, 1, 12, 0)
        assert flushed[0]["session_end"] == datetime.datetime(2024, 1, 1, 12, 0)
    finally:
        q.stop()
