"""Crash injection at the streaming epoch bridge (round 7).

The foreachBatch bridge historically had a documented at-least-once
window: the epoch marker write is not atomic with the matrel merge,
so a crash in between replayed one epoch into an already-merged
matrel.  Round 7 closes it with per-view transactional epoch tags
(the (appId, version) idempotent-writes pattern — the tag rides the
SAME atomic manifest swap as the data).  These tests drive the real
``_foreach_batch`` handler with injected crashes and assert
effectively-once per view across every window, including
commit-interval pending loss.

"Crash" = the handler raises mid-sequence, then a FRESH
PipelineContext is opened over the same root (catalog replay) and
the epoch is re-delivered, exactly like Structured Streaming's
restart replay.
"""

import os

import pytest

from pipelinedb_spark import PipelineContext
from pipelinedb_spark.streaming.runtime import _foreach_batch


def _mk_ctx(spark, root, interval=1):
    ctx = PipelineContext(spark, root=root, num_buckets=4,
                          commit_interval_batches=interval)
    if "s" not in ctx.streams:
        ctx.create_stream("s", "k string, v long")
        ctx.create_view("cv_f",
                        "SELECT k, count(*) AS n, sum(v) AS s "
                        "FROM s GROUP BY k")
    return ctx


def _batch(spark, rows):
    return spark.createDataFrame(rows, "k string, v long")


def _state(ctx):
    return {r["k"]: (r["n"], r["s"])
            for r in ctx.read_view("cv_f").collect()}


class _MarkerFault:
    """Raise on os.replace targeting the epoch marker (the crash
    window between the matrel merge and the marker write)."""

    def __init__(self, monkeypatch, token="last_epoch"):
        self.token = token
        self.orig = os.replace
        monkeypatch.setattr(os, "replace", self)

    def __call__(self, src, dst, **kw):
        if self.token in str(dst):
            raise OSError("injected: crash before marker write")
        return self.orig(src, dst, **kw)


def test_replay_after_marker_crash_does_not_double_merge(
        spark, tmp_path, monkeypatch):
    """Crash between merge and marker, then replay: the view's
    (appId, epoch) tag — committed atomically with the data — makes
    the replayed epoch a no-op instead of a double merge."""
    root = str(tmp_path / "pdb")
    ck = str(tmp_path / "ck")
    ctx = _mk_ctx(spark, root)
    handle = _foreach_batch(ctx, "s", ck)
    handle(_batch(spark, [("a", 1), ("b", 2)]), 0)
    assert _state(ctx) == {"a": (1, 1), "b": (1, 2)}

    _MarkerFault(monkeypatch)
    with pytest.raises(OSError, match="injected"):
        handle(_batch(spark, [("a", 10)]), 1)  # merged, marker lost
    monkeypatch.undo()
    assert _state(ctx) == {"a": (2, 11), "b": (1, 2)}
    # NOTE: close() deletes the root (DROP-everything semantics); a
    # crash is simulated by simply abandoning the context

    # restart: fresh context over the same root, epoch 1 re-delivered
    ctx2 = _mk_ctx(spark, root)
    handle2 = _foreach_batch(ctx2, "s", ck)
    handle2(_batch(spark, [("a", 10)]), 1)  # replay — must be no-op
    assert _state(ctx2) == {"a": (2, 11), "b": (1, 2)}
    # and the stream keeps flowing normally afterwards
    handle2(_batch(spark, [("b", 5)]), 2)
    assert _state(ctx2) == {"a": (2, 11), "b": (2, 7)}
    ctx2.close()


def test_commit_interval_pending_loss_is_redelivered(
        spark, tmp_path):
    """commit_interval_batches > 1: epochs pending (uncommitted) at a
    crash must be re-delivered, not skipped — the marker only
    advances at commit boundaries."""
    root = str(tmp_path / "pdb")
    ck = str(tmp_path / "ck")
    ctx = _mk_ctx(spark, root, interval=2)
    handle = _foreach_batch(ctx, "s", ck)
    handle(_batch(spark, [("a", 1)]), 0)   # pending, no commit
    marker = [p for p in
              os.listdir(os.path.join(root, "epochs"))] \
        if os.path.isdir(os.path.join(root, "epochs")) else []
    assert not any("last_epoch" in m for m in marker)  # not advanced
    # crash: pending batches die with the (abandoned) context

    ctx2 = _mk_ctx(spark, root, interval=2)
    handle2 = _foreach_batch(ctx2, "s", ck)
    handle2(_batch(spark, [("a", 1)]), 0)  # re-delivered
    handle2(_batch(spark, [("a", 2)]), 1)  # interval commit
    assert _state(ctx2) == {"a": (2, 3)}
    ctx2.close()


def test_commit_interval_replay_of_committed_epoch_skipped(
        spark, tmp_path, monkeypatch):
    """Crash between an interval commit and the marker write: only
    the LAST epoch replays (Spark re-runs the in-progress batch);
    the accumulate-time guard sees its version already committed and
    drops it instead of buffering it into the next interval."""
    root = str(tmp_path / "pdb")
    ck = str(tmp_path / "ck")
    ctx = _mk_ctx(spark, root, interval=2)
    handle = _foreach_batch(ctx, "s", ck)
    handle(_batch(spark, [("a", 1)]), 0)       # pending
    _MarkerFault(monkeypatch)
    with pytest.raises(OSError, match="injected"):
        handle(_batch(spark, [("a", 2)]), 1)   # commits, marker lost
    monkeypatch.undo()
    assert _state(ctx) == {"a": (2, 3)}

    ctx2 = _mk_ctx(spark, root, interval=2)
    handle2 = _foreach_batch(ctx2, "s", ck)
    handle2(_batch(spark, [("a", 2)]), 1)      # replay of committed
    handle2(_batch(spark, [("a", 4)]), 2)      # new pending
    handle2(_batch(spark, [("a", 8)]), 3)      # interval commit
    assert _state(ctx2) == {"a": (4, 15)}      # each epoch once
    ctx2.close()


def test_txn_tags_are_per_view_and_per_source(spark, tmp_path):
    """Two CVs on one stream each track the epoch independently (a
    view created later must not inherit another view's progress), and
    the tag is keyed by checkpoint so a fresh streaming query starts
    clean."""
    root = str(tmp_path / "pdb")
    ck = str(tmp_path / "ck")
    ctx = _mk_ctx(spark, root)
    handle = _foreach_batch(ctx, "s", ck)
    handle(_batch(spark, [("a", 1)]), 0)
    ctx.create_view("cv_g", "SELECT count(*) AS n FROM s")
    handle(_batch(spark, [("a", 2)]), 1)
    assert _state(ctx) == {"a": (2, 3)}
    assert ctx.read_view("cv_g").collect()[0]["n"] == 1  # post-create
    # a NEW checkpoint (fresh streaming query) restarts epoch ids at
    # 0 — per-checkpoint app ids keep it from being skipped
    handle_b = _foreach_batch(ctx, "s", str(tmp_path / "ck2"))
    handle_b(_batch(spark, [("a", 100)]), 0)
    assert _state(ctx) == {"a": (3, 103)}
    ctx.close()
