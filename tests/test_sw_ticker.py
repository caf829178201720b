"""Sliding-window output-stream ticker + streaming exactly-once."""

import os
import time


def test_sw_ticker_emits_decay(ctx):
    # ticker emission is reader-gated by default (combiner.c:1619-1622);
    # this test reads the raw osrel tail, so opt into retention
    ctx.track_output_streams = True
    ctx.create_stream("tk1", "k string, v long")
    ctx.create_view(
        "cv_tick",
        "SELECT k, count(*) AS n FROM tk1 "
        "WHERE arrival_timestamp > clock_timestamp() - interval '60 seconds' "
        "GROUP BY k")
    ctx.insert("tk1", [{"k": "a", "v": 1}, {"k": "a", "v": 2}])
    now = time.time()

    # first tick: the group appears (old=None)
    n1 = ctx.tick_sw("cv_tick", now=now)
    assert n1 == 1
    # same instant again: nothing changed → no emission
    assert ctx.tick_sw("cv_tick", now=now + 1) == 0
    # after the window slides past everything: group disappears
    n3 = ctx.tick_sw("cv_tick", now=now + 300)
    assert n3 == 1
    rows = ctx.output_of("cv_tick").collect()
    assert len(rows) == 2
    first, last = rows[0], rows[1]
    assert first["old"] is None and first["new"]["n"] == 2
    assert last["new"] is None and last["old"]["n"] == 2
    # ticker also reaped the expired steps
    assert ctx.read_matrel("cv_tick").count() == 0


def test_streaming_epoch_replay_is_idempotent(ctx, tmp_path):
    """Replayed foreachBatch epochs (restart recovery) must not
    double-count (effectively-once; the marker is keyed by checkpoint
    location so independent queries don't share counters)."""
    from pipelinedb_spark.streaming.runtime import _foreach_batch

    ctx.create_stream("eo1", "k string, v long")
    ctx.create_view("cv_eo", "SELECT k, count(*) AS n FROM eo1 GROUP BY k")
    handle = _foreach_batch(ctx, "eo1", str(tmp_path / "ck_eo1"))
    batch = ctx.spark.createDataFrame([("a", 1)], ["k", "v"])
    handle(batch, 0)
    handle(batch, 1)
    handle(batch, 1)  # replay of epoch 1 after simulated crash
    handle(batch, 0)  # stale replay
    assert ctx.read_view("cv_eo").collect()[0]["n"] == 2


def test_output_of_with_seq_orders_across_segments(ctx):
    """output_of's multi-segment parquet scan orders files for split
    packing, not emission order (round-11 soak finding: 'last new per
    group' grabbed the FIRST tick on long runs) — with_seq=True
    carries each row's segment index so the old/new chain folds in
    emission order."""
    import time

    ctx.track_output_streams = True
    ctx.create_stream("tks", "k string, v long")
    ctx.create_view(
        "cv_tks",
        "SELECT k, count(*) AS n FROM tks "
        "WHERE arrival_timestamp > clock_timestamp() - interval '60 seconds' "
        "GROUP BY k")
    now = time.time()
    for i in range(5):  # 5 emitting ticks -> 5 segments
        ctx.insert("tks", [{"k": "a", "v": i}])
        assert ctx.tick_sw("cv_tks", now=now + i) == 1
    rows = (ctx.output_of("cv_tks", with_seq=True)
            .orderBy("_seq").collect())
    assert len(rows) == 5
    assert [r["_seq"] for r in rows] == sorted(r["_seq"] for r in rows)
    # the chain folds exactly in _seq order: n = 1..5, old = prev new
    prev = None
    for i, r in enumerate(rows):
        o = None if r["old"] is None else r["old"].asDict()
        assert o == prev, (i, o, prev)
        assert r["new"]["n"] == i + 1
        prev = r["new"].asDict()
    # without with_seq the schema is unchanged (no _seq column)
    assert "_seq" not in ctx.output_of("cv_tks").columns


def test_sw_tick_snapshot_survives_engine_restart(spark, tmp_path):
    """The tick snapshot is persisted (engine.py tick_sw docstring:
    'tick state survives an engine restart, so the first post-restart
    tick diffs against the last emitted snapshot instead of
    re-emitting every group as an insert') — previously a claim with
    no test.  A fresh PipelineContext over the same root must emit
    NOTHING when the window contents haven't changed, and exactly the
    changed group when they have."""
    import datetime
    import time

    from pipelinedb_spark import PipelineContext

    root = str(tmp_path / "pdb")
    now = time.time()
    at = datetime.datetime.utcfromtimestamp(now - 30)

    c1 = PipelineContext(spark, root=root, num_buckets=8,
                         track_output_streams=True)
    c1.create_stream("tkr", "k string, v long")
    c1.create_view(
        "cv_tkr",
        "SELECT k, count(*) AS n FROM tkr "
        "WHERE arrival_timestamp > clock_timestamp() "
        "- interval '3600 seconds' GROUP BY k")
    c1.insert("tkr", [{"k": "a", "v": 1, "arrival_timestamp": at},
                      {"k": "b", "v": 2, "arrival_timestamp": at}])
    assert c1.tick_sw("cv_tkr", now=now) == 2   # both appear
    # NOTE: no c1.close() — close() removes the root; a restart test
    # abandons the old context (crash analog) and reopens the root

    # engine restart: catalog + matrel + tick snapshot replay from disk
    c2 = PipelineContext(spark, root=root, num_buckets=8,
                         track_output_streams=True)
    # unchanged window -> the post-restart tick must NOT re-emit
    assert c2.tick_sw("cv_tkr", now=now + 1) == 0
    # one group changes -> exactly one change row
    c2.insert("tkr", [{"k": "a", "v": 3,
                       "arrival_timestamp": at}])
    assert c2.tick_sw("cv_tkr", now=now + 2) == 1
    rows = (c2.output_of("cv_tkr", with_seq=True)
            .orderBy("_seq").collect())
    assert len(rows) == 3
    last = rows[-1]
    assert last["old"]["n"] == 1 and last["new"]["n"] == 2 \
        and last["new"]["k"] == "a"
    c2.close()


def test_with_seq_anchored_when_root_path_contains_seg_n(spark,
                                                         tmp_path):
    """Round-11 review: a bare seg_(\\d+) regex matched the FIRST
    occurrence anywhere in the absolute path — a store root like
    .../seg_3/pdb stamped every row _seq=3, silently breaking the
    emission-order chain fold.  The extraction is now anchored to the
    dir that directly contains the file."""
    import time

    from pipelinedb_spark import PipelineContext

    root = str(tmp_path / "seg_3" / "pdb")  # adversarial root
    c = PipelineContext(spark, root=root, num_buckets=4,
                        track_output_streams=True)
    try:
        c.create_stream("tka", "k string, v long")
        c.create_view(
            "cv_tka",
            "SELECT k, count(*) AS n FROM tka "
            "WHERE arrival_timestamp > clock_timestamp() - interval "
            "'60 seconds' GROUP BY k")
        now = time.time()
        for i in range(3):
            c.insert("tka", [{"k": "a", "v": i}])
            assert c.tick_sw("cv_tka", now=now + i) == 1
        rows = (c.output_of("cv_tka", with_seq=True)
                .orderBy("_seq").collect())
        assert len({r["_seq"] for r in rows}) == 3  # not all seg_3
        assert [r["new"]["n"] for r in rows] == [1, 2, 3]
    finally:
        c.close()
