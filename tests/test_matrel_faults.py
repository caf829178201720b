"""Crash-injection suite for the matrel store (round-7 task 4).

The store's durability argument is: every multi-step sequence
(commit = data write → manifest swap → GC; drop_buckets = read →
manifest → GC; compaction; grace-stamped unlink) leaves a reopened
store reading EXACTLY the pre- or post-state — never partial, never
lost rows — and a replay of the failed operation converges.  These
tests make that argument by monkeypatching ``os.replace`` (the
manifest swap, matrel.py ``_write_manifest``) and ``shutil.rmtree``
(the GC unlink) to raise at each step, then asserting the invariant
on a FRESH MatrelStore over the same directory.

Reference analog: PipelineDB's combiner commits are at-least-once
into a transactional heap (src/combiner.c); here the atomic manifest
swap plays the transaction-commit role.
"""

import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

from pipelinedb_spark.matrel import BUCKET_COL, MatrelStore


def _merge_fn(df):
    return df.groupBy("k", BUCKET_COL).agg(F.sum("n").alias("n"))


def _batch(spark, rows):
    return spark.createDataFrame(rows, "k string, n long")


def _state(store):
    df = store.read()
    if df is None:
        return {}
    return {r["k"]: r["n"] for r in df.collect()}


class _ManifestSwapFault:
    """Raise on the Nth os.replace targeting this store's MANIFEST;
    delegate everything else (Spark/json tempfiles untouched)."""

    def __init__(self, monkeypatch, store, fail_on_call=1):
        self.manifest = store._manifest_path
        self.remaining = fail_on_call
        self.orig = os.replace
        monkeypatch.setattr(os, "replace", self)

    def __call__(self, src, dst, **kw):
        if os.path.abspath(dst) == os.path.abspath(self.manifest):
            self.remaining -= 1
            if self.remaining == 0:
                raise OSError("injected: crash at manifest swap")
        return self.orig(src, dst, **kw)


class _RmtreeFault:
    """Raise on any rmtree under the store dir (GC unlink step)."""

    def __init__(self, monkeypatch, store):
        self.root = os.path.abspath(store.dir)
        self.orig = shutil.rmtree
        self.hits = 0
        monkeypatch.setattr(shutil, "rmtree", self)

    def __call__(self, path, **kw):
        if os.path.abspath(str(path)).startswith(self.root):
            self.hits += 1
            raise OSError("injected: crash during GC unlink")
        return self.orig(path, **kw)


@pytest.fixture()
def store(spark, tmp_path):
    s = MatrelStore(spark, str(tmp_path), "m", num_buckets=4)
    s.gc_grace_seconds = 0.0
    yield s


def test_commit_crash_before_manifest_swap_reads_pre_state(
        spark, tmp_path, store, monkeypatch):
    """Data files written, manifest swap dies → reopened store reads
    the PRE-state; replaying the merge converges to the post-state
    (the orphan version dir is overwritten by the retry, then GC'd)."""
    store.merge(_batch(spark, [("a", 1), ("b", 2)]), ["k"], _merge_fn)
    pre = _state(store)
    assert pre == {"a": 1, "b": 2}

    _ManifestSwapFault(monkeypatch, store)
    with pytest.raises(OSError, match="injected"):
        store.merge(_batch(spark, [("a", 10), ("c", 5)]), ["k"],
                    _merge_fn)
    monkeypatch.undo()

    # crash recovery = a fresh store over the same directory
    re1 = MatrelStore(spark, str(tmp_path), "m", num_buckets=4)
    re1.gc_grace_seconds = 0.0
    assert _state(re1) == pre  # exactly pre-state, nothing partial
    # the orphan in-flight version dir exists but is invisible
    orphans = {e for e in os.listdir(re1.dir) if e.startswith("v")}
    assert len(orphans) >= 2  # committed v1 + orphan v2

    # replay converges (at-least-once commit: retry the whole batch)
    re1.merge(_batch(spark, [("a", 10), ("c", 5)]), ["k"], _merge_fn)
    assert _state(re1) == {"a": 11, "b": 2, "c": 5}


def test_commit_crash_during_gc_reads_post_state(
        spark, tmp_path, store, monkeypatch):
    """Manifest swapped, GC unlink dies → the commit IS durable
    (post-state), stale dirs remain until a later sweep succeeds."""
    for i in range(4):  # accumulate versions beyond the keep_last tail
        store.merge(_batch(spark, [("a", 1), ("b", 1)]), ["k"],
                    _merge_fn)
    fault = _RmtreeFault(monkeypatch, store)
    with pytest.raises(OSError, match="injected"):
        store.merge(_batch(spark, [("a", 1)]), ["k"], _merge_fn)
    assert fault.hits >= 1
    monkeypatch.undo()

    re1 = MatrelStore(spark, str(tmp_path), "m", num_buckets=4)
    re1.gc_grace_seconds = 0.0
    assert _state(re1) == {"a": 5, "b": 4}  # post-state: merge landed
    # recovery sweep removes what the crashed GC left behind
    before = {e for e in os.listdir(re1.dir) if e.startswith("v")}
    re1.gc_sweep()
    after = {e for e in os.listdir(re1.dir) if e.startswith("v")}
    assert after < before
    assert _state(re1) == {"a": 5, "b": 4}


def test_drop_buckets_crash_at_manifest_keeps_all_rows(
        spark, tmp_path, monkeypatch):
    """drop_buckets dies at the manifest write → reopened store still
    holds every row; the retry drops exactly the doomed buckets."""
    store = MatrelStore(spark, str(tmp_path), "m", num_buckets=4)
    store.gc_grace_seconds = 0.0
    rows = [(f"k{i}", i) for i in range(16)]
    store.merge(_batch(spark, rows), ["k"], _merge_fn)
    pre = _state(store)
    assert len(pre) == 16
    doomed = store.bucket_ids()[:2]

    _ManifestSwapFault(monkeypatch, store)
    with pytest.raises(OSError, match="injected"):
        store.drop_buckets(doomed)
    monkeypatch.undo()

    re1 = MatrelStore(spark, str(tmp_path), "m", num_buckets=4)
    re1.gc_grace_seconds = 0.0
    assert _state(re1) == pre  # nothing lost, nothing partial

    n = re1.drop_buckets(doomed)
    assert n > 0
    kept = _state(re1)
    assert len(kept) == 16 - n
    assert set(re1.bucket_ids()) == \
        set(store.bucket_ids()) - set(doomed)


def test_compact_crash_at_manifest_preserves_state(
        spark, tmp_path, monkeypatch):
    """Compaction's full-overwrite commit dies at the manifest swap →
    reopened store reads the same rows from the OLD dirs; a retried
    compact succeeds and drops the old versions."""
    store = MatrelStore(spark, str(tmp_path), "m", num_buckets=4)
    store.gc_grace_seconds = 0.0
    for i in range(3):
        store.merge(_batch(spark, [("a", 1), (f"k{i}", i)]), ["k"],
                    _merge_fn)
    pre = _state(store)

    _ManifestSwapFault(monkeypatch, store)
    with pytest.raises(OSError, match="injected"):
        store.compact()
    monkeypatch.undo()

    re1 = MatrelStore(spark, str(tmp_path), "m", num_buckets=4)
    re1.gc_grace_seconds = 0.0
    assert _state(re1) == pre
    dropped = re1.compact()
    assert dropped >= 1
    assert _state(re1) == pre
    live = re1._referenced_dirs()
    assert len(live) == 1  # fully packed


def test_compact_crash_during_gc_then_sweep_converges(
        spark, tmp_path, monkeypatch):
    """Compaction commits, the old-dir unlink dies → state is the
    compacted one; a later gc_sweep finishes the cleanup."""
    store = MatrelStore(spark, str(tmp_path), "m", num_buckets=4)
    store.gc_grace_seconds = 0.0
    for i in range(3):
        store.merge(_batch(spark, [("a", 1), (f"k{i}", i)]), ["k"],
                    _merge_fn)
    pre = _state(store)

    fault = _RmtreeFault(monkeypatch, store)
    with pytest.raises(OSError, match="injected"):
        store.compact()
    assert fault.hits >= 1
    monkeypatch.undo()

    re1 = MatrelStore(spark, str(tmp_path), "m", num_buckets=4)
    re1.gc_grace_seconds = 0.0
    assert _state(re1) == pre  # compacted data is the live data
    assert len(re1._referenced_dirs()) == 1
    re1.gc_sweep()
    on_disk = {e for e in os.listdir(re1.dir) if e.startswith("v")
               and os.path.isdir(os.path.join(re1.dir, e))}
    assert on_disk == re1._referenced_dirs()
    assert _state(re1) == pre


def test_grace_stamped_unlink_crash_preserves_marker_contract(
        spark, tmp_path, monkeypatch):
    """Under a nonzero grace: the first sweep stamps, the unlink pass
    crashes mid-delete → re-sweeping after the grace still removes
    the dir, and live data is never touched (the marker stamp is
    inside the doomed dir, so a crash can't orphan the accounting)."""
    store = MatrelStore(spark, str(tmp_path), "m", num_buckets=4)
    store.gc_grace_seconds = 0.3
    for i in range(2):
        store.merge(_batch(spark, [("a", 1)]), ["k"], _merge_fn)
    store.compact()  # dereferences old dirs; grace holds them on disk
    pre = _state(store)
    held = {e for e in os.listdir(store.dir) if e.startswith("v")} \
        - store._referenced_dirs()
    assert held  # grace kept the old dirs
    # markers stamped inside each held dir
    for d in held:
        assert os.path.exists(os.path.join(store.dir, d, ".unref_ts"))

    time.sleep(0.35)  # grace expires
    fault = _RmtreeFault(monkeypatch, store)
    with pytest.raises(OSError, match="injected"):
        store.gc_sweep()
    assert fault.hits >= 1
    monkeypatch.undo()
    assert _state(store) == pre  # live data untouched by the crash

    store.gc_sweep()  # retry completes the unlink
    remaining = {e for e in os.listdir(store.dir) if e.startswith("v")
                 and os.path.isdir(os.path.join(store.dir, e))}
    assert remaining == store._referenced_dirs()
    assert _state(store) == pre


def test_truncate_crash_keeps_rows(spark, tmp_path, monkeypatch):
    """truncate is a single manifest swap: a crash there leaves every
    row readable (pre-state), and the retry empties the store."""
    store = MatrelStore(spark, str(tmp_path), "m", num_buckets=4)
    store.gc_grace_seconds = 0.0
    store.merge(_batch(spark, [("a", 1), ("b", 2)]), ["k"], _merge_fn)
    pre = _state(store)

    _ManifestSwapFault(monkeypatch, store)
    with pytest.raises(OSError, match="injected"):
        store.truncate()
    monkeypatch.undo()

    re1 = MatrelStore(spark, str(tmp_path), "m", num_buckets=4)
    assert _state(re1) == pre
    re1.truncate()
    assert re1.read() is None


def test_pin_crash_at_manifest_swap_is_atomic(spark, tmp_path, store,
                                              monkeypatch):
    """A pin is one manifest swap: a crash mid-pin leaves the
    reopened store with NO pin and unchanged data (never a torn
    record); the retry lands it whole, and a crash mid-UNPIN leaves
    the pin intact and still GC-protecting its dirs."""
    store.merge(_batch(spark, [("a", 1), ("b", 2)]), ["k"], _merge_fn)
    pre = _state(store)

    _ManifestSwapFault(monkeypatch, store)
    with pytest.raises(OSError, match="injected"):
        store.pin("run")
    monkeypatch.undo()

    re1 = MatrelStore(spark, str(tmp_path), "m", num_buckets=4)
    re1.gc_grace_seconds = 0.0
    assert re1.pins() == {}          # nothing torn
    assert _state(re1) == pre
    rec = re1.pin("run")             # replay lands whole
    assert re1.pins()["run"]["buckets"] == rec["buckets"]

    # crash mid-unpin: pin survives, dirs stay protected
    re1.merge(_batch(spark, [("a", 9)]), ["k"], _merge_fn)
    _ManifestSwapFault(monkeypatch, re1)
    with pytest.raises(OSError, match="injected"):
        re1.unpin("run")
    monkeypatch.undo()

    re2 = MatrelStore(spark, str(tmp_path), "m", num_buckets=4)
    re2.gc_grace_seconds = 0.0
    assert "run" in re2.pins()
    assert {r["k"]: r["n"] for r in
            re2.read_pinned("run").collect()} == pre
    re2.unpin("run")                 # replay converges
    assert re2.pins() == {}
