"""View-level snapshot pins (round-11 reach): pin_view captures a
continuous view's exact state — the matrel bucket map, under the
view's commit lock — and read_view_pinned replays it forever, across
later inserts, compactions, truncates, and sliding-window expiry.
The matrel pin is the indexstore pin discipline (test_pins.py)
applied to the engine's materialization store.
"""

import os
import time

import pytest


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_pin_survives_later_inserts_and_compaction(ctx):
    ctx.create_stream("p1", "k string, v long")
    ctx.create_view("cv_p1",
                    "SELECT k, count(*) AS n, sum(v) AS s FROM p1 "
                    "GROUP BY k")
    ctx.insert("p1", [{"k": "a", "v": 1}, {"k": "b", "v": 10}])
    rec = ctx.pin_view("cv_p1", "run-1")
    assert rec["buckets"] and "at" in rec
    snapshot = _rows(ctx.read_view("cv_p1"))

    ctx.insert("p1", [{"k": "a", "v": 5}, {"k": "c", "v": 7}])
    mat = ctx.views["cv_p1"].matrel
    mat.gc_grace_seconds = 0.0
    mat.compact()          # full rewrite dereferences the old dirs
    mat.gc_sweep()

    assert _rows(ctx.read_view_pinned("cv_p1", "run-1")) == snapshot
    live = _rows(ctx.read_view("cv_p1"))
    assert live != snapshot
    assert ("a", 2, 6) in live and ("c", 1, 7) in live


def test_pin_survives_truncate(ctx):
    ctx.create_stream("p2", "k string, v long")
    ctx.create_view("cv_p2",
                    "SELECT k, sum(v) AS s FROM p2 GROUP BY k")
    ctx.insert("p2", [{"k": "x", "v": 3}])
    ctx.pin_view("cv_p2", "before")
    ctx.truncate_view("cv_p2")
    assert ctx.read_view("cv_p2").count() == 0
    assert _rows(ctx.read_view_pinned("cv_p2", "before")) == [("x", 3)]


def test_sw_pin_frozen_after_window_slides_and_reap(ctx):
    """The SW case: the pin's recorded `at` fixes the window cutoff,
    so the pinned read returns the same rows after the live window
    has slid past them AND after the reaper dropped the expired step
    buckets (pinned dirs are GC-exempt)."""
    ctx.create_stream("p3", "k string, v long")
    ctx.create_view(
        "cv_p3",
        "SELECT k, count(*) AS n FROM p3 "
        "WHERE arrival_timestamp > clock_timestamp() - interval "
        "'30 seconds' GROUP BY k")
    ctx.insert("p3", [{"k": "a", "v": 1}, {"k": "a", "v": 2}])
    ctx.pin_view("cv_p3", "tick")
    pinned_now = _rows(ctx.read_view_pinned("cv_p3", "tick"))
    assert pinned_now == [("a", 2)]

    later = time.time() + 600
    assert ctx.read_view("cv_p3", at=later).count() == 0  # live decays
    mat = ctx.views["cv_p3"].matrel
    mat.gc_grace_seconds = 0.0
    # one matrel state row (group 'a') expires
    assert ctx.reap_ttl("cv_p3", now=later) == 1
    mat.gc_sweep()
    assert ctx.read_matrel("cv_p3").count() == 0
    # the pin still replays the original window
    assert _rows(ctx.read_view_pinned("cv_p3", "tick")) == [("a", 2)]


def test_unpin_releases_and_collision_raises(ctx):
    ctx.create_stream("p4", "k string, v long")
    ctx.create_view("cv_p4",
                    "SELECT k, count(*) AS n FROM p4 GROUP BY k")
    ctx.insert("p4", [{"k": "a", "v": 1}])
    rec = ctx.pin_view("cv_p4", "dup")
    with pytest.raises(FileExistsError):
        ctx.pin_view("cv_p4", "dup")
    with pytest.raises(KeyError):
        ctx.unpin_view("cv_p4", "never")
    with pytest.raises(KeyError):
        ctx.read_view_pinned("cv_p4", "never")

    mat = ctx.views["cv_p4"].matrel
    pinned_dir = os.path.join(
        mat.dir, next(iter(rec["buckets"].values())).split(os.sep)[0])
    ctx.insert("p4", [{"k": "b", "v": 2}])
    mat.gc_grace_seconds = 0.0
    mat.compact()
    mat.gc_sweep()
    assert os.path.isdir(pinned_dir)      # held by the pin
    ctx.unpin_view("cv_p4", "dup")
    assert ctx.view_pins("cv_p4") == {}
    mat.gc_sweep()
    assert not os.path.isdir(pinned_dir)  # released


def test_pin_reads_equal_live_at_pin_time_fuzz(ctx):
    """Pin after every batch; each pin must equal the live read taken
    at its pin instant, verified at the end after all batches (the
    snapshot-isolation property, multi-pin)."""
    ctx.create_stream("p5", "k string, v long")
    ctx.create_view("cv_p5",
                    "SELECT k, count(*) AS n, sum(v) AS s FROM p5 "
                    "GROUP BY k")
    want = {}
    for i in range(4):
        ctx.insert("p5", [{"k": f"k{j % 3}", "v": j + i}
                          for j in range(6)])
        ctx.pin_view("cv_p5", f"b{i}")
        want[f"b{i}"] = _rows(ctx.read_view("cv_p5"))
    mat = ctx.views["cv_p5"].matrel
    mat.gc_grace_seconds = 0.0
    mat.compact()
    mat.gc_sweep()
    for name, rows in want.items():
        assert _rows(ctx.read_view_pinned("cv_p5", name)) == rows


def test_combine_read_over_pin(ctx):
    """Re-rollup under a coarser grouping from a PIN's states: the
    run's summaries stay derivable from the exact snapshot it
    consumed, not from whatever the live matrel has become."""
    ctx.create_stream("p6", "k string, g string, v long")
    ctx.create_view("cv_p6",
                    "SELECT k, g, count(*) AS n, avg(v) AS a FROM p6 "
                    "GROUP BY k, g")
    ctx.insert("p6", [{"k": "a", "g": "x", "v": 2},
                      {"k": "a", "g": "y", "v": 4},
                      {"k": "b", "g": "x", "v": 10}])
    ctx.pin_view("cv_p6", "run")
    want = _rows(ctx.combine_read("cv_p6", group_by=["k"]))
    ctx.insert("p6", [{"k": "a", "g": "x", "v": 100},
                      {"k": "c", "g": "z", "v": 5}])
    # live rollup moved; the pinned rollup reproduces the snapshot
    assert _rows(ctx.combine_read("cv_p6", group_by=["k"])) != want
    assert _rows(ctx.combine_read("cv_p6", group_by=["k"],
                                  pin="run")) == want
    assert want == [("a", 2, 3.0), ("b", 1, 10.0)]


def test_pin_under_concurrent_inserts_never_torn(ctx):
    """Atomicity under a live writer: every batch inserts exactly one
    row per key, and a batch becomes visible in ONE manifest swap —
    so any pin taken concurrently must show EQUAL counts across all
    keys (a torn pin would catch some buckets at batch i and others
    at i-1).  pin_view serializes on the view's commit lock."""
    import threading

    keys = ["k0", "k1", "k2", "k3"]
    ctx.create_stream("p7", "k string, v long")
    ctx.create_view("cv_p7",
                    "SELECT k, count(*) AS n FROM p7 GROUP BY k")
    ctx.insert("p7", [{"k": k, "v": 0} for k in keys])  # batch 1

    stop = threading.Event()
    errs = []

    def writer():
        try:
            for i in range(12):
                if stop.is_set():
                    return
                ctx.insert("p7", [{"k": k, "v": i} for k in keys])
        except Exception as e:  # surfaced in the main thread
            errs.append(e)

    th = threading.Thread(target=writer)
    th.start()
    try:
        for i in range(6):
            ctx.pin_view("cv_p7", f"c{i}")
    finally:
        stop.set()
        th.join()
    assert not errs, errs

    for i in range(6):
        rows = _rows(ctx.read_view_pinned("cv_p7", f"c{i}"))
        counts = {n for _k, n in rows}
        assert len(rows) == len(keys)
        assert len(counts) == 1, (i, rows)  # never torn across buckets


def test_pin_model_fuzz_random_op_sequences(spark, tmp_path):
    """Model-based fuzz at the MatrelStore layer: random sequences of
    merge / compact / truncate / pin / unpin / gc_sweep checked
    against a pure-Python model.  Invariants per step: live read ==
    model live state; every pin reads == the model state captured at
    its pin step — regardless of how many rewrites happened since."""
    import random

    from pyspark.sql import functions as F

    from pipelinedb_spark.matrel import BUCKET_COL, MatrelStore

    def merge_fn(df):
        return df.groupBy("k", BUCKET_COL).agg(F.sum("n").alias("n"))

    def read_all(store):
        df = store.read()
        return {} if df is None else \
            {r["k"]: r["n"] for r in df.collect()}

    rnd = random.Random(20260816)
    for trial in range(3):
        root = str(tmp_path / f"t{trial}")
        store = MatrelStore(spark, root, "m", num_buckets=4)
        store.gc_grace_seconds = 0.0
        model_live: dict[str, int] = {}
        model_pins: dict[str, dict] = {}
        ops = [rnd.choice(["merge", "merge", "merge", "pin",
                           "compact", "truncate", "unpin", "sweep"])
               for _ in range(12)]
        for step, op in enumerate(ops):
            if op == "merge":
                rows = [(f"k{rnd.randint(0, 5)}", rnd.randint(1, 9))
                        for _ in range(rnd.randint(1, 4))]
                delta = {}
                for k, n in rows:
                    delta[k] = delta.get(k, 0) + n
                store.merge(
                    spark.createDataFrame(rows, "k string, n long"),
                    ["k"], merge_fn)
                for k, n in delta.items():
                    model_live[k] = model_live.get(k, 0) + n
            elif op == "pin":
                name = f"p{step}"
                store.pin(name)
                model_pins[name] = dict(model_live)
            elif op == "unpin" and model_pins:
                name = rnd.choice(sorted(model_pins))
                store.unpin(name)
                del model_pins[name]
            elif op == "compact":
                store.compact()
            elif op == "truncate":
                store.truncate()
                model_live = {}
            elif op == "sweep":
                store.gc_sweep()
            assert read_all(store) == model_live, (trial, step, op)
        # final: every surviving pin replays its captured state
        for name, want in model_pins.items():
            df = store.read_pinned(name)
            got = {} if df is None else \
                {r["k"]: r["n"] for r in df.collect()}
            assert got == want, (trial, name)


def test_truncate_carries_replay_tags(ctx, spark):
    """Review round-11: truncate used to rebuild the manifest without
    txns — a replayed pre-truncate epoch would then re-apply into the
    emptied matrel, resurrecting deliberately-truncated rows."""
    from pyspark.sql import functions as F

    ctx.create_stream("p8", "k string, v long")
    ctx.create_view("cv_p8",
                    "SELECT k, count(*) AS n FROM p8 GROUP BY k")
    ctx.insert("p8", [{"k": "a", "v": 1}])
    mat = ctx.views["cv_p8"].matrel

    def merge_fn(df):
        from pipelinedb_spark.matrel import BUCKET_COL
        cols = [c for c in df.columns
                if c not in ("k", BUCKET_COL)]
        return df.groupBy("k", BUCKET_COL).agg(
            *[F.sum(c).alias(c) for c in cols])

    assert mat.txn_version("app") is None
    mat.merge(spark.createDataFrame([("z", 1)], "k string, n long"),
              ["k"], lambda df: df.groupBy(
                  "k", "__bucket").agg(F.sum("n").alias("n")),
              txn=("app", 7))
    assert mat.txn_version("app") == 7
    mat.truncate()
    assert mat.txn_version("app") == 7  # replay tag survives


def test_stale_stats_never_walks_pinned_dirs(ctx, spark,
                                             monkeypatch):
    """Review round-11: _commit prunes pinned-only dirs from the
    byte-accounting map, so stale_stats' info-missing fallback would
    _du-walk the whole pinned snapshot on EVERY call (maybe_compact
    runs per micro-batch).  The pinned skip must come first."""
    import pipelinedb_spark.matrel as matrel_mod

    ctx.create_stream("p9", "k string, v long")
    ctx.create_view("cv_p9",
                    "SELECT k, count(*) AS n FROM p9 GROUP BY k")
    ctx.insert("p9", [{"k": "a", "v": 1}])
    rec = ctx.pin_view("cv_p9", "hold")
    # rewrite the pinned buckets so the pinned dir leaves accounting
    ctx.insert("p9", [{"k": "a", "v": 2}])
    mat = ctx.views["cv_p9"].matrel
    mat.gc_grace_seconds = 0.0
    mat.compact()

    pinned_dir = os.path.join(
        mat.dir, next(iter(rec["buckets"].values())).split(os.sep)[0])
    walked = []
    orig = matrel_mod._du

    def spy(path):
        walked.append(os.path.abspath(path))
        return orig(path)

    monkeypatch.setattr(matrel_mod, "_du", spy)
    mat.stale_stats()
    assert os.path.abspath(pinned_dir) not in walked


def test_combine_read_over_pin_does_not_flush(ctx):
    """Review round-11: the pinned rollup reads an immutable record —
    it must not trigger a combiner merge (the live manifest version
    must not move)."""
    ctx.create_stream("p10", "k string, g string, v long")
    ctx.create_view("cv_p10",
                    "SELECT k, g, count(*) AS n FROM p10 "
                    "GROUP BY k, g")
    ctx.insert("p10", [{"k": "a", "g": "x", "v": 1}])
    ctx.pin_view("cv_p10", "run")
    mat = ctx.views["cv_p10"].matrel
    ctx.insert("p10", [{"k": "b", "g": "y", "v": 2}])  # stays pending
    v0 = mat._read_manifest()["version"]
    got = _rows(ctx.combine_read("cv_p10", group_by=["k"], pin="run"))
    assert got == [("a", 1)]
    assert mat._read_manifest()["version"] == v0  # no flush/merge ran
    # the live path still flushes and sees the pending batch
    live = _rows(ctx.combine_read("cv_p10", group_by=["k"]))
    assert ("b", 1) in live
