"""Crash-injection suite for the persisted operator indexes (round-8
task 1) — the matrel fault discipline (test_matrel_faults.py) extended
to every index store: IVF, IVF-PQ, MinHash-LSH, span-dedup windows,
BM25.

The durability argument mirrors the matrel's: every mutation
(persist/rebuild, append, retrain) is a staged write published by ONE
atomic manifest swap (indexstore.IndexStore.commit), so a crash at
any step leaves a reopened index reading EXACTLY the pre- or
post-state — never a partial batch, never a destroyed index — and a
replay of the failed operation converges.  Faults are injected by
monkeypatching ``os.replace`` (the manifest swap), ``os.rename`` (the
stage→version-dir publish), and ``shutil.rmtree`` (the GC unlink).

Reference analog: PipelineDB mutates its matrels inside Postgres
transactions (src/pipeline_combine.c); the manifest swap plays the
transaction-commit role here.
"""

import glob
import os
import shutil
import time

import numpy as np
import pytest
from pyspark.sql import functions as F

from pipelinedb_spark.indexstore import (MANIFEST, IndexStore,
                                         open_index, read_index)


class _ManifestSwapFault:
    """Raise on the Nth os.replace targeting this index's manifest;
    delegate everything else (json tempfiles, Spark commits)."""

    def __init__(self, monkeypatch, root, fail_on_call=1):
        self.manifest = os.path.abspath(os.path.join(root, MANIFEST))
        self.remaining = fail_on_call
        self.orig = os.replace
        monkeypatch.setattr(os, "replace", self)

    def __call__(self, src, dst, **kw):
        if os.path.abspath(dst) == self.manifest:
            self.remaining -= 1
            if self.remaining == 0:
                raise OSError("injected: crash at manifest swap")
        return self.orig(src, dst, **kw)


class _PublishFault:
    """Raise on the os.rename that publishes a stage dir under root —
    the crash point BETWEEN the data write and the manifest swap."""

    def __init__(self, monkeypatch, root):
        self.root = os.path.abspath(root)
        self.orig = os.rename
        monkeypatch.setattr(os, "rename", self)

    def __call__(self, src, dst, **kw):
        s = os.path.abspath(str(src))
        if (os.path.dirname(s) == self.root
                and os.path.basename(s).startswith(".stage-")):
            raise OSError("injected: crash at stage publish")
        return self.orig(src, dst, **kw)


class _RmtreeFault:
    def __init__(self, monkeypatch, root):
        self.root = os.path.abspath(root)
        self.orig = shutil.rmtree
        self.hits = 0
        monkeypatch.setattr(shutil, "rmtree", self)

    def __call__(self, path, **kw):
        if os.path.abspath(str(path)).startswith(self.root):
            self.hits += 1
            raise OSError("injected: crash during GC unlink")
        return self.orig(path, **kw)


def _no_grace(monkeypatch):
    """Index operators construct their own IndexStore with the default
    grace; zero it so tests observe immediate GC."""
    monkeypatch.setattr(
        IndexStore, "__init__",
        lambda self, root, gc_grace_seconds=60.0: (
            setattr(self, "root", root),
            setattr(self, "gc_grace_seconds", 0.0))[0] or None)


def _vecs(spark, n, id0=0, dim=8, seed=3):
    rng = np.random.RandomState(seed + id0)
    return spark.createDataFrame(
        [(id0 + i, rng.randn(dim).tolist()) for i in range(n)],
        "vec_id long, embedding array<double>")


def _index_rows(spark, path):
    return {r["vec_id"] for r in
            read_index(spark, path).select("vec_id").collect()}


# ------------------------------------------------------------- IVF

def test_ivf_initial_persist_crash_leaves_no_index(spark, tmp_path,
                                                   monkeypatch):
    from pipelinedb_spark.operators.similarity import ivf_persist

    path = str(tmp_path / "ivf")
    _ManifestSwapFault(monkeypatch, path, fail_on_call=2)  # 1st = init
    with pytest.raises(OSError, match="injected"):
        ivf_persist(_vecs(spark, 40), path, n_lists=4)
    monkeypatch.undo()
    # nothing published: the manifest (if present) references no dirs
    s = IndexStore(path)
    assert not s.exists() or s.read_manifest()["dirs"] == []
    # retry converges
    ivf_persist(_vecs(spark, 40), path, n_lists=4)
    assert len(_index_rows(spark, path)) == 40


def test_ivf_append_crash_at_swap_reads_pre_state(spark, tmp_path,
                                                  monkeypatch):
    """Data files staged, swap dies → reopened index has NO trace of
    the batch (rows, staleness accounting, probe results); the retry
    admits it exactly once."""
    from pipelinedb_spark.operators.similarity import (ivf_append,
                                                       ivf_persist,
                                                       ivf_staleness)

    path = str(tmp_path / "ivf")
    ivf_persist(_vecs(spark, 40), path, n_lists=4)
    pre_rows = _index_rows(spark, path)
    pre_stale = ivf_staleness(path)

    _ManifestSwapFault(monkeypatch, path)
    with pytest.raises(OSError, match="injected"):
        ivf_append(spark, path, _vecs(spark, 20, id0=1000))
    monkeypatch.undo()

    assert _index_rows(spark, path) == pre_rows        # no partial batch
    st = ivf_staleness(path)
    assert st["appended_n"] == pre_stale["appended_n"]  # accounting too

    assert ivf_append(spark, path, _vecs(spark, 20, id0=1000)) == 20
    assert len(_index_rows(spark, path)) == 60
    assert ivf_staleness(path)["appended_n"] == 20


def test_ivf_retrain_crash_never_destroys_index(spark, tmp_path,
                                                monkeypatch):
    """THE round-7 gap: retrain used to overwrite in place.  Now the
    rebuild stages beside the live dirs — a crash at the swap leaves
    the old index fully readable (data + centroids + accounting) and
    a crash at the publish rename leaves it untouched too."""
    from pipelinedb_spark.operators.similarity import (ivf_persist,
                                                       ivf_append,
                                                       ivf_retrain,
                                                       ivf_staleness,
                                                       ivf_topk_persisted)

    path = str(tmp_path / "ivf")
    ivf_persist(_vecs(spark, 40), path, n_lists=4)
    ivf_append(spark, path, _vecs(spark, 20, id0=1000))
    pre_rows = _index_rows(spark, path)
    pre_cent = np.load(open_index(path).artifact("_centroids.npy"))

    # crash point 1: stage publish (data written, nothing visible)
    _PublishFault(monkeypatch, path)
    with pytest.raises(OSError, match="injected"):
        ivf_retrain(spark, path)
    monkeypatch.undo()
    assert _index_rows(spark, path) == pre_rows
    np.testing.assert_array_equal(
        np.load(open_index(path).artifact("_centroids.npy")), pre_cent)

    # crash point 2: manifest swap
    _ManifestSwapFault(monkeypatch, path)
    with pytest.raises(OSError, match="injected"):
        ivf_retrain(spark, path)
    monkeypatch.undo()
    assert _index_rows(spark, path) == pre_rows
    assert ivf_staleness(path)["appended_n"] == 20  # old accounting

    # retry completes: accounting reset, index still whole, probes run
    ivf_retrain(spark, path)
    assert _index_rows(spark, path) == pre_rows
    assert ivf_staleness(path)["appended_n"] == 0
    q = _vecs(spark, 3, id0=0)
    assert ivf_topk_persisted(spark, path, q, k=3, nprobe=4).count() > 0


def test_ivf_commit_gc_crash_is_durable_and_sweep_converges(
        spark, tmp_path, monkeypatch):
    """Manifest swapped, the retired-dir unlink dies → the retrain IS
    durable; a later gc() finishes the cleanup."""
    from pipelinedb_spark.operators.similarity import (ivf_persist,
                                                       ivf_retrain)

    _no_grace(monkeypatch)
    path = str(tmp_path / "ivf")
    ivf_persist(_vecs(spark, 40), path, n_lists=4)
    fault = _RmtreeFault(monkeypatch, path)
    with pytest.raises(OSError, match="injected"):
        ivf_retrain(spark, path)
    assert fault.hits >= 1
    monkeypatch.setattr(shutil, "rmtree", fault.orig)

    assert len(_index_rows(spark, path)) == 40  # post-state durable
    s = IndexStore(path, gc_grace_seconds=0.0)
    live = {os.path.basename(d) for d in s.dirs()}
    on_disk = {e for e in os.listdir(path)
               if os.path.isdir(os.path.join(path, e))}
    assert on_disk > live  # crashed GC left the retired dir
    s.gc()
    on_disk = {e for e in os.listdir(path)
               if os.path.isdir(os.path.join(path, e))}
    assert on_disk == live
    assert len(_index_rows(spark, path)) == 40


def test_gc_grace_holds_retired_dirs_for_inflight_readers(
        spark, tmp_path, monkeypatch):
    """Under a nonzero grace a retrain's retired dir survives the
    commit-time GC (stamped), and a sweep after expiry removes it."""
    from pipelinedb_spark.operators.similarity import (ivf_persist,
                                                       ivf_retrain)

    path = str(tmp_path / "ivf")
    ivf_persist(_vecs(spark, 30), path, n_lists=2)
    old_dir = open_index(path).base_dir()
    ivf_retrain(spark, path)  # default grace: old dir must survive
    assert os.path.exists(old_dir)
    assert os.path.exists(os.path.join(old_dir, ".unref_ts"))

    s = IndexStore(path, gc_grace_seconds=0.05)
    time.sleep(0.06)
    s.gc()
    assert not os.path.exists(old_dir)
    assert len(_index_rows(spark, path)) == 30


# ------------------------------------------------------------ IVF-PQ

def test_ivfpq_append_and_retrain_crash_read_pre_state(spark, tmp_path,
                                                       monkeypatch):
    from pipelinedb_spark.operators.pq import (ivfpq_append,
                                               ivfpq_load_codec,
                                               ivfpq_persist,
                                               ivfpq_retrain,
                                               ivfpq_staleness)

    path = str(tmp_path / "pq")
    ivfpq_persist(_vecs(spark, 80, dim=16), path, n_lists=4, m=4,
                  ksub=16, sample=256)
    pre_rows = _index_rows(spark, path)
    pre_codec = ivfpq_load_codec(path)

    _ManifestSwapFault(monkeypatch, path)
    with pytest.raises(OSError, match="injected"):
        ivfpq_append(spark, path, _vecs(spark, 30, id0=500, dim=16))
    monkeypatch.undo()
    assert _index_rows(spark, path) == pre_rows
    assert ivfpq_staleness(path)["appended_n"] == 0

    assert ivfpq_append(spark, path,
                        _vecs(spark, 30, id0=500, dim=16)) == 30

    _ManifestSwapFault(monkeypatch, path)
    with pytest.raises(OSError, match="injected"):
        ivfpq_retrain(spark, path)
    monkeypatch.undo()
    # old codec bytes still served, all 110 rows readable
    np.testing.assert_array_equal(ivfpq_load_codec(path).centroids,
                                  pre_codec.centroids)
    assert len(_index_rows(spark, path)) == 110

    ivfpq_retrain(spark, path)
    assert len(_index_rows(spark, path)) == 110
    assert ivfpq_staleness(path)["appended_n"] == 0


# ------------------------------------------------------- span windows

def test_span_append_crash_leaves_no_partial_windows(spark, tmp_path,
                                                     monkeypatch):
    """ADVICE r7: a crashed append used to leave a partial window
    batch that silently under-marked later duplicates.  Now the probe
    sees all-or-nothing."""
    from pipelinedb_spark.operators.spandedup import (span_index_append,
                                                      span_index_persist,
                                                      span_index_probe)

    path = str(tmp_path / "span")
    words = " ".join(f"w{i}" for i in range(30))
    corpus = spark.createDataFrame([(1, words)], "doc_id long, text string")
    span_index_persist(corpus, path, window=5)
    batch = spark.createDataFrame([(2, words + " unique tail here")],
                                  "doc_id long, text string")

    def probe_spans():
        nxt = spark.createDataFrame([(3, words)],
                                    "doc_id long, text string")
        return {(r["doc_id"], r["span_start"], r["span_end"])
                for r in span_index_probe(spark, path, nxt).collect()}

    pre = probe_spans()
    _ManifestSwapFault(monkeypatch, path)
    with pytest.raises(OSError, match="injected"):
        span_index_append(spark, path, batch)
    monkeypatch.undo()
    assert probe_spans() == pre  # no partial window rows visible

    span_index_append(spark, path, batch)  # replay converges
    assert probe_spans() == pre  # same spans (doc 1 already covered)


# ------------------------------------------------------------ LSH

def test_lsh_append_crash_probe_unchanged_then_replay(spark, tmp_path,
                                                      monkeypatch):
    from pipelinedb_spark.operators.dedup import (lsh_index_append,
                                                  lsh_index_persist,
                                                  lsh_index_probe)

    path = str(tmp_path / "lsh")
    mk = lambda i, t: (i, t * 6)
    corpus = spark.createDataFrame(
        [mk(i, f"alpha beta gamma delta epsilon zeta {i} ")
         for i in range(10)], "doc_id long, text string")
    lsh_index_persist(corpus, path, num_hashes=16, bands=4)
    batch = spark.createDataFrame(
        [mk(100, "alpha beta gamma delta epsilon zeta 1 ")],
        "doc_id long, text string")

    def cands():
        return {(r["corpus_id"], r["new_id"]) for r in
                lsh_index_probe(spark, path, batch).collect()}

    pre = cands()
    assert pre  # the near-dup is found against the base corpus

    _ManifestSwapFault(monkeypatch, path)
    with pytest.raises(OSError, match="injected"):
        lsh_index_append(spark, path, batch)
    monkeypatch.undo()
    assert cands() == pre  # crashed append invisible

    lsh_index_append(spark, path, batch)
    post = cands()
    assert (100, 100) not in post and pre <= post


# ------------------------------------------------------------ BM25

def test_bm25_rebuild_crash_keeps_old_index_consistent(spark, tmp_path,
                                                       monkeypatch):
    """The three BM25 tables (postings/doc_lens/dfs) commit in ONE
    swap: a crashed rebuild can't mix versions across tables."""
    from pipelinedb_spark.operators.retrieval import (bm25_index,
                                                      bm25_load,
                                                      bm25_persist,
                                                      bm25_search)

    path = str(tmp_path / "bm25")
    docs1 = spark.createDataFrame(
        [(1, "spark streaming engine"), (2, "postgres continuous view")],
        "doc_id long, text string")
    bm25_persist(bm25_index(docs1), path)
    pre = [(r["doc_id"], round(r["score"], 9)) for r in
           bm25_search(bm25_load(spark, path), "spark engine").collect()]

    docs2 = spark.createDataFrame(
        [(1, "entirely different words"), (3, "spark spark spark")],
        "doc_id long, text string")
    _ManifestSwapFault(monkeypatch, path)
    with pytest.raises(OSError, match="injected"):
        bm25_persist(bm25_index(docs2), path)
    monkeypatch.undo()

    got = [(r["doc_id"], round(r["score"], 9)) for r in
           bm25_search(bm25_load(spark, path), "spark engine").collect()]
    assert got == pre  # old index, old scores — nothing mixed

    bm25_persist(bm25_index(docs2), path)
    idx = bm25_load(spark, path)
    assert idx["n_docs"] == 2
    top = bm25_search(idx, "spark").collect()
    assert top and top[0]["doc_id"] == 3


# ------------------------------------------------- store invariants

def test_stage_orphans_invisible_and_collected(spark, tmp_path,
                                               monkeypatch):
    """A crash BEFORE publish leaves a .stage-* orphan: readers never
    see it, and a zero-grace gc removes it."""
    from pipelinedb_spark.operators.similarity import (ivf_append,
                                                       ivf_persist)

    path = str(tmp_path / "ivf")
    ivf_persist(_vecs(spark, 30), path, n_lists=2)
    _PublishFault(monkeypatch, path)
    with pytest.raises(OSError, match="injected"):
        ivf_append(spark, path, _vecs(spark, 10, id0=700))
    monkeypatch.undo()

    orphans = glob.glob(f"{path}/.stage-*")
    assert orphans  # data written, never published
    assert len(_index_rows(spark, path)) == 30

    s = IndexStore(path, gc_grace_seconds=0.0)
    # the automatic (commit-path) GC must NEVER touch stage dirs — a
    # stage dir is indistinguishable from a concurrent writer's
    # in-flight parquet write (review finding, round 8)
    s.gc()
    assert glob.glob(f"{path}/.stage-*")
    # an explicit maintenance sweep (caller asserts no active writer)
    # reclaims the crashed-writer orphan
    s.gc(include_stage=True)
    assert not glob.glob(f"{path}/.stage-*")
    assert len(_index_rows(spark, path)) == 30


def test_inflight_version_dirs_never_collected(tmp_path):
    """A v-dir numbered above the manifest version is a concurrent
    writer's in-flight commit — gc must not touch it."""
    root = str(tmp_path / "idx")
    s = IndexStore(root, gc_grace_seconds=0.0)
    s.init_if_needed()
    inflight = os.path.join(root, "v00005-abc123")
    os.makedirs(inflight)
    s.gc()
    assert os.path.exists(inflight)


def test_append_compaction_preserves_probe_results(spark, tmp_path):
    """Continuous ingest accumulates one version dir per epoch;
    span/lsh compaction rewrites them into one dir via a
    replace-commit without changing any probe result."""
    from pipelinedb_spark.indexstore import open_index
    from pipelinedb_spark.operators.spandedup import (
        span_index_append, span_index_compact, span_index_persist,
        span_index_probe)

    path = str(tmp_path / "span")
    words = " ".join(f"w{i}" for i in range(40))
    corpus = spark.createDataFrame([(1, words)], "doc_id long, text string")
    span_index_persist(corpus, path, window=5)
    for i in range(3):
        extra = spark.createDataFrame(
            [(10 + i, f"unique {i} " * 10 + words[:60])],
            "doc_id long, text string")
        span_index_append(spark, path, extra)
    assert len(open_index(path).dirs()) == 4

    probe = spark.createDataFrame([(99, words)], "doc_id long, text string")

    def spans():
        return sorted((r["doc_id"], r["span_start"], r["span_end"])
                      for r in span_index_probe(spark, path, probe)
                      .collect())

    pre = spans()
    assert span_index_compact(spark, path) == 4
    assert len(open_index(path).dirs()) == 1
    assert spans() == pre
    assert span_index_compact(spark, path) == 0  # already compact

    from pipelinedb_spark.operators.dedup import (lsh_index_append,
                                                  lsh_index_compact,
                                                  lsh_index_persist,
                                                  lsh_index_probe)
    lpath = str(tmp_path / "lsh")
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta {i} " * 6) for i in range(8)],
        "doc_id long, text string")
    lsh_index_persist(docs, lpath, num_hashes=16, bands=4)
    batch = spark.createDataFrame(
        [(100, "alpha beta gamma delta 1 " * 6)],
        "doc_id long, text string")
    lsh_index_append(spark, lpath, batch)

    def cands():
        return sorted((r["corpus_id"], r["new_id"]) for r in
                      lsh_index_probe(spark, lpath, batch).collect())

    pre = cands()
    assert lsh_index_compact(spark, lpath) == 2
    assert len(open_index(lpath).dirs()) == 1
    assert cands() == pre


def test_index_append_txn_replay_skipped(spark, tmp_path):
    """IndexStore txn tags (the matrel idempotent-writes pattern):
    a replayed streaming epoch is skipped by every append operator."""
    from pipelinedb_spark.operators.similarity import (ivf_append,
                                                       ivf_persist)

    path = str(tmp_path / "ivf")
    ivf_persist(_vecs(spark, 30), path, n_lists=2)
    batch = _vecs(spark, 10, id0=500)
    assert ivf_append(spark, path, batch, txn=("src", 1)) == 10
    assert ivf_append(spark, path, batch, txn=("src", 1)) == 0  # replay
    assert ivf_append(spark, path, batch, txn=("src", 0)) == 0  # older
    assert len(_index_rows(spark, path)) == 40
    assert ivf_append(spark, path, _vecs(spark, 5, id0=900),
                      txn=("src", 2)) == 5
    assert open_index(path).txn_version("src") == 2
    assert open_index(path).txn_version("other") is None


def test_commit_clears_stale_grace_stamp_and_concurrent_appends(
        spark, tmp_path):
    """Review findings (round 8): (a) a grace stamp left on a stage
    dir by a pre-commit GC pass must not ride into the committed
    version dir (it would void the retirement grace window later);
    (b) concurrent commits serialize on the advisory lock — no append
    is ever lost to a manifest read-modify-write race."""
    import threading

    root = str(tmp_path / "idx")
    s = IndexStore(root, gc_grace_seconds=300.0)
    s.init_if_needed()

    # (a) stamp rides in → must be stripped at commit
    staged = s.stage()
    os.makedirs(staged)
    with open(os.path.join(staged, ".unref_ts"), "w") as f:
        f.write(repr(time.time() - 10_000))   # long-expired stamp
    with open(os.path.join(staged, "f.txt"), "w") as f:
        f.write("x")
    final = s.commit(staged, replace=True)
    assert not os.path.exists(os.path.join(final, ".unref_ts"))
    # retire it; the commit-path GC must HOLD it (grace not expired)
    staged2 = s.stage()
    os.makedirs(staged2)
    with open(os.path.join(staged2, "f.txt"), "w") as f:
        f.write("y")
    s.commit(staged2, replace=True)
    assert os.path.exists(final)   # held under grace, stamp was fresh

    # (b) 8 threads append concurrently: all 8 dirs live afterwards
    s2 = IndexStore(str(tmp_path / "idx2"), gc_grace_seconds=0.0)
    s2.init_if_needed()
    errs = []

    def appender(i):
        try:
            st = s2.stage()
            os.makedirs(st)
            with open(os.path.join(st, f"{i}.txt"), "w") as f:
                f.write(str(i))
            s2.commit(st, replace=False)
        except Exception as e:      # pragma: no cover
            errs.append(e)

    ts = [threading.Thread(target=appender, args=(i,))
          for i in range(8)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert not errs
    assert len(s2.dirs()) == 8     # nothing lost to the RMW race
    assert s2.read_manifest()["version"] == 8


def test_empty_batch_append_tags_without_version_dir(spark, tmp_path):
    """Review finding: empty streaming epochs must advance the replay
    tag WITHOUT accumulating empty version dirs (one per epoch would
    bloat every later probe's union)."""
    from pipelinedb_spark.operators.similarity import (ivf_append,
                                                       ivf_persist)
    from pipelinedb_spark.operators.spandedup import (span_index_append,
                                                      span_index_persist)

    path = str(tmp_path / "ivf")
    ivf_persist(_vecs(spark, 20), path, n_lists=2)
    empty = _vecs(spark, 0)
    assert ivf_append(spark, path, empty, txn=("s", 1)) == 0
    st = open_index(path)
    assert len(st.dirs()) == 1          # no empty dir
    assert st.txn_version("s") == 1     # but the epoch is marked done
    assert ivf_append(spark, path, empty, txn=("s", 1)) == 0  # replay

    sp = str(tmp_path / "span")
    span_index_persist(spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(30)))],
        "doc_id long, text string"), sp, window=5)
    tiny = spark.createDataFrame([(2, "too short")],
                                 "doc_id long, text string")
    assert span_index_append(spark, sp, tiny, txn=("s", 1)) is True
    st = open_index(sp)
    assert len(st.dirs()) == 1 and st.txn_version("s") == 1
