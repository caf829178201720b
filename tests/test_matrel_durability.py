"""Matrel store durability: atomic manifest swap isolates readers from
in-flight writes; orphaned version dirs never corrupt reads; GC keeps
a bounded version tail."""

import json
import os

from pyspark.sql import functions as F


def test_orphan_version_dir_is_ignored(ctx):
    ctx.create_stream("du1", "k string, v long")
    ctx.create_view("cv_du", "SELECT k, sum(v) AS s FROM du1 GROUP BY k")
    ctx.insert("du1", [{"k": "a", "v": 1}])
    mdir = ctx.views["cv_du"].matrel.dir
    # simulate a crashed merge: version dir written, manifest never
    # swapped (the non-atomic window)
    orphan = os.path.join(mdir, "v999", "__bp=0")
    os.makedirs(orphan, exist_ok=True)
    with open(os.path.join(orphan, "garbage.txt"), "w") as f:
        f.write("not parquet")
    assert ctx.read_view("cv_du").collect()[0]["s"] == 1
    ctx.insert("du1", [{"k": "a", "v": 2}])
    assert ctx.read_view("cv_du").collect()[0]["s"] == 3


def test_manifest_only_references_live_buckets(ctx):
    ctx.create_stream("du2", "k string, v long")
    ctx.create_view("cv_du2", "SELECT k, count(*) AS n FROM du2 GROUP BY k")
    # exercise the version-tail GC itself (the default 60s in-flight-
    # reader grace would keep every dir of this sub-second burst)
    ctx.views["cv_du2"].matrel.gc_grace_seconds = 0
    for i in range(5):
        ctx.insert("du2", [{"k": f"k{i % 2}", "v": i}])
    store = ctx.views["cv_du2"].matrel
    with open(os.path.join(store.dir, "MANIFEST")) as f:
        manifest = json.load(f)
    for path in manifest["buckets"].values():
        assert os.path.isdir(path), path
    # GC bounds the version tail
    versions = [d for d in os.listdir(store.dir) if d.startswith("v")]
    assert len(versions) <= 4, versions


def test_bucket_pruned_merge_touches_subset(ctx):
    """A batch hitting one group must not rewrite every bucket."""
    ctx.create_stream("du3", "k string, v long")
    ctx.create_view("cv_du3", "SELECT k, count(*) AS n FROM du3 GROUP BY k")
    ctx.insert("du3", [{"k": f"key{i}", "v": i} for i in range(64)])
    store = ctx.views["cv_du3"].matrel
    with open(os.path.join(store.dir, "MANIFEST")) as f:
        before = json.load(f)["buckets"]
    # 64 keys hash across >1 bucket entry (packed commits share one
    # version DIR, so count manifest entries, not distinct paths)
    assert len(before) > 1
    ctx.insert("du3", [{"k": "key0", "v": 99}])
    with open(os.path.join(store.dir, "MANIFEST")) as f:
        after = json.load(f)["buckets"]
    changed = [b for b in after if after[b] != before.get(b)]
    assert len(changed) == 1  # exactly the bucket containing key0


def test_json_object_int_sum_cv(ctx):
    ctx.create_stream("js2", "k string, props string")
    ctx.create_view("cv_jsum",
                    "SELECT k, json_object_int_sum(props) AS sums "
                    "FROM js2 GROUP BY k")
    ctx.insert("js2", [{"k": "a", "props": '{"x": 1, "y": 2}'},
                       {"k": "a", "props": '{"x": 10}'}])
    ctx.insert("js2", [{"k": "a", "props": '{"y": 5, "z": 7}'}])
    import json as _json
    row = ctx.read_view("cv_jsum").collect()[0]
    assert _json.loads(row["sums"]) == {"x": 11, "y": 7, "z": 7}


def test_dump_restore_roundtrip(ctx, tmp_path):
    """dump → truncate → restore reproduces the CV exactly, restored
    states stay combinable with new inserts, merge=True combines two
    dumps, and a definition mismatch is rejected (reference
    test_dump_restore.py)."""
    import pytest
    from pipelinedb_spark import CQError

    ctx.create_stream("dr1", "k string, v double, u long")
    ctx.create_view("cv_dr", "SELECT k, count(*) AS n, avg(v) AS a, "
                             "exact_count_distinct(u) AS ndv "
                             "FROM dr1 GROUP BY k")
    ctx.insert("dr1", [{"k": "a", "v": 1.0, "u": 1},
                       {"k": "a", "v": 3.0, "u": 2},
                       {"k": "b", "v": 5.0, "u": 1}])
    before = sorted(tuple(r) for r in ctx.read_view("cv_dr").collect())

    dump = str(tmp_path / "dump_cv_dr")
    n = ctx.dump_state("cv_dr", dump)
    assert n == 2  # one state row per group

    ctx.truncate_view("cv_dr")
    assert ctx.read_view("cv_dr").count() == 0
    assert ctx.restore_state("cv_dr", dump) == 2
    assert sorted(tuple(r) for r in ctx.read_view("cv_dr").collect()) == before

    # restored partial states remain combinable with fresh inserts
    ctx.insert("dr1", [{"k": "a", "v": 5.0, "u": 3}])
    got = {r["k"]: r for r in ctx.read_view("cv_dr").collect()}
    assert got["a"]["n"] == 3 and got["a"]["a"] == 3.0 and got["a"]["ndv"] == 3

    # merge=True: combining a dump into live state sums the partials
    ctx.truncate_view("cv_dr")
    ctx.restore_state("cv_dr", dump, merge=True)
    ctx.restore_state("cv_dr", dump, merge=True)
    got = {r["k"]: r for r in ctx.read_view("cv_dr").collect()}
    assert got["a"]["n"] == 4 and got["b"]["n"] == 2
    assert got["a"]["a"] == 2.0          # avg unchanged by doubling
    assert got["a"]["ndv"] == 2          # distinct set unchanged

    # definition mismatch rejected
    ctx.create_view("cv_other", "SELECT k, count(*) AS n FROM dr1 GROUP BY k")
    with pytest.raises(CQError):
        ctx.restore_state("cv_other", dump)


def test_reader_snapshot_survives_later_commits(ctx):
    """Snapshot isolation under packed commits: a DataFrame captured
    before later merges still collects the OLD values afterwards —
    the version tail GC (keep_last=2) must not unlink files a handed-
    out plan references within that window."""
    ctx.create_stream("du5", "k string, v long")
    ctx.create_view("cv_du5", "SELECT k, sum(v) AS s FROM du5 GROUP BY k")
    ctx.insert("du5", [{"k": "a", "v": 1}, {"k": "b", "v": 10}])
    snap = ctx.read_view("cv_du5")
    ctx.insert("du5", [{"k": "a", "v": 100}])
    ctx.insert("du5", [{"k": "b", "v": 1000}])
    # the snapshot still reflects the state at capture time
    assert {r["k"]: r["s"] for r in snap.collect()} == {"a": 1, "b": 10}
    # and the live view sees everything
    assert {r["k"]: r["s"] for r in ctx.read_view("cv_du5").collect()} \
        == {"a": 101, "b": 1010}


def test_compact_drops_old_versions_keeps_values(ctx):
    """compact_view (VACUUM FULL analog): after many partial commits,
    compaction rewrites live rows into one version, removes every old
    dir, and reads are value-identical before/after; subsequent
    inserts keep merging."""
    ctx.create_stream("du6", "k string, v long")
    ctx.create_view("cv_du6", "SELECT k, sum(v) AS s FROM du6 GROUP BY k")
    for i in range(6):
        ctx.insert("du6", [{"k": f"k{i % 3}", "v": i}])
    store = ctx.views["cv_du6"].matrel
    before = sorted(tuple(r) for r in ctx.read_view("cv_du6").collect())
    refs_before = store._referenced_dirs()
    store.gc_grace_seconds = 0  # synchronous: no concurrent readers
    removed = ctx.compact_view("cv_du6")
    # compact() counts DEREFERENCED dirs (grace may defer the unlink)
    assert removed == len(refs_before - store._referenced_dirs())
    assert removed >= 1 and len(store._referenced_dirs()) == 1
    assert sum(1 for e in os.listdir(store.dir)
               if e.startswith("v")) == 1
    assert sorted(tuple(r) for r in ctx.read_view("cv_du6").collect()) \
        == before
    # still mergeable afterwards
    ctx.insert("du6", [{"k": "k0", "v": 100}])
    got = {r["k"]: r["s"] for r in ctx.read_view("cv_du6").collect()}
    assert got["k0"] == dict(before)["k0"] + 100
