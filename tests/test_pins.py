"""Named snapshot pins on IndexStore (round-11 reach): a training run
pins the exact dir set it consumed (`pin`), gc never reclaims pinned
dirs, `read_pinned` replays the snapshot bit-for-bit regardless of
later appends / replace-commits / retrains, and `unpin` releases the
dirs back to the normal grace-then-reclaim lifecycle.

The pin record is captured INSIDE the commit critical section (one
manifest swap), so it can never name a half-committed set, and every
OTHER manifest swap (commit/tag) must carry pins through untouched —
the carry is what keeps pinned dirs invisible to gc.
"""

import os

import pytest

import pipelinedb_spark.manifestio as mio
from pipelinedb_spark.indexstore import IndexStore


def _store(tmp_path, fmt="rename"):
    s = IndexStore(str(tmp_path / "idx"), gc_grace_seconds=0.0,
                   manifest_format=fmt)
    s.init_if_needed(meta={"batches": 0})
    return s


def _add(s, spark, values, replace=False):
    staged = s.stage()
    spark.createDataFrame([(int(v),) for v in values], "v int") \
        .coalesce(1).write.parquet(staged)
    return s.commit(staged, replace=replace,
                    meta_fn=lambda m: {**m,
                                       "batches": m["batches"] + 1})


def _vals(df):
    return sorted(r.v for r in df.collect())


@pytest.mark.parametrize("fmt", ["rename", "condput"])
def test_pin_survives_append_replace_and_gc(tmp_path, spark, fmt):
    s = _store(tmp_path, fmt)
    _add(s, spark, [1, 2])
    _add(s, spark, [3])
    rec = s.pin("run-a")
    assert rec["version"] == s.read_manifest()["version"] - 1
    assert rec["meta"]["batches"] == 2
    pinned_dirs = [os.path.join(s.root, d) for d in rec["dirs"]]

    _add(s, spark, [4])                      # append after the pin
    _add(s, spark, [9, 9], replace=True)     # full rebuild
    s.gc()                                   # grace 0: eager reclaim

    # live read sees only the rebuild; the pin replays the snapshot
    assert _vals(s.read(spark)) == [9, 9]
    assert _vals(s.read_pinned(spark, "run-a")) == [1, 2, 3]
    assert all(os.path.isdir(p) for p in pinned_dirs)


def test_pins_carried_through_commits_and_tag(tmp_path, spark):
    s = _store(tmp_path)
    _add(s, spark, [1])
    s.pin("keep")
    _add(s, spark, [2])
    s.tag(txn=("app", 7))
    s.tag(meta_fn=lambda m: {**m, "extra": True})
    assert "keep" in s.pins()
    assert s.pins()["keep"]["dirs"] == \
        [os.path.basename(p) for p in s.dirs()[:1]]
    assert s.txn_version("app") == 7  # tag passengers unaffected


def test_pin_name_collision_and_unpin_missing(tmp_path, spark):
    s = _store(tmp_path)
    _add(s, spark, [1])
    s.pin("x")
    with pytest.raises(FileExistsError):
        s.pin("x")
    with pytest.raises(KeyError):
        s.unpin("y")
    with pytest.raises(KeyError):
        s.read_pinned(spark, "y")


def test_pin_same_name_race_loser_raises(tmp_path, spark,
                                         monkeypatch):
    """ADVICE round 11: two writers race pin() with the SAME name.
    The CAS loser's head re-read shows a pin under that name — but it
    is the RIVAL's record (different dirs/version).  A name-only
    applied probe would declare success and hand back the loser's
    never-committed record; the record-compare probe must instead
    drive the retry into the documented FileExistsError, leaving the
    rival's pin untouched."""
    root = str(tmp_path / "idx")
    a = IndexStore(root, gc_grace_seconds=60.0,
                   manifest_format="condput", commit_lock=False)
    a.init_if_needed(meta={"batches": 0})
    b = IndexStore(root, gc_grace_seconds=60.0,
                   manifest_format="condput", commit_lock=False)
    _add(a, spark, [1, 2])

    real_io_fn = a._io
    fired = {"n": 0}

    class _RaceIO:
        """First write attempt loses the CAS to a rival that appends
        a dir and pins the same name — the head A re-reads carries
        the rival's pin record."""

        def __init__(self, io):
            self._wrapped = io

        def __getattr__(self, k):
            return getattr(self._wrapped, k)

        def write(self, m, seq):
            if fired["n"] == 0:
                fired["n"] += 1
                _add(b, spark, [3])
                b.pin("run")
            return self._wrapped.write(m, seq)

    monkeypatch.setattr(a, "_io", lambda: _RaceIO(real_io_fn()))
    with pytest.raises(FileExistsError):
        a.pin("run")
    # the pin that survives is the rival's 2-dir record, bit for bit
    assert fired["n"] == 1
    assert a.pins()["run"] == b.pins()["run"]
    assert len(a.pins()["run"]["dirs"]) == 2
    assert _vals(a.read_pinned(spark, "run")) == [1, 2, 3]


def test_unpin_releases_dirs_to_gc(tmp_path, spark):
    s = _store(tmp_path)
    _add(s, spark, [1])
    rec = s.pin("tmp")
    _add(s, spark, [2], replace=True)
    s.gc()
    old = os.path.join(s.root, rec["dirs"][0])
    assert os.path.isdir(old)   # pinned: survived the rebuild's gc
    s.unpin("tmp")
    s.gc()
    assert not os.path.isdir(old)  # released: reclaimed (grace 0)
    assert _vals(s.read(spark)) == [2]


def test_shared_dir_held_by_second_pin(tmp_path, spark):
    s = _store(tmp_path)
    _add(s, spark, [1])
    s.pin("a")
    s.pin("b")                   # same snapshot, second ref
    _add(s, spark, [2], replace=True)
    s.unpin("a")
    s.gc()
    assert _vals(s.read_pinned(spark, "b")) == [1]  # still held
    s.unpin("b")
    s.gc()
    assert list(s.pins()) == []


def test_pin_through_object_store_adapter(tmp_path, spark,
                                          monkeypatch):
    """Pins are manifest content, so they must ride the condput
    object-store path like everything else."""
    from tests.test_s3_client import S3ObjectClient, _FakeS3Service
    svc = _FakeS3Service()
    monkeypatch.setattr(
        mio, "CLIENT_FACTORY",
        lambda d: S3ObjectClient("bkt", os.path.abspath(d),
                                 client=svc))
    s = _store(tmp_path, fmt="condput")
    _add(s, spark, [5, 6])
    s.pin("run")
    _add(s, spark, [7], replace=True)
    s.gc()
    assert _vals(s.read_pinned(spark, "run")) == [5, 6]
    assert _vals(s.read(spark)) == [7]


def test_module_level_pin_helpers(tmp_path, spark):
    from pipelinedb_spark.indexstore import (pin_index,
                                             read_pinned_index)
    s = _store(tmp_path)
    _add(s, spark, [1, 2])
    rec = pin_index(s.root, "run")
    assert rec["dirs"] == s.pins()["run"]["dirs"]
    _add(s, spark, [3], replace=True)
    s.gc()
    assert _vals(read_pinned_index(spark, s.root, "run")) == [1, 2]
