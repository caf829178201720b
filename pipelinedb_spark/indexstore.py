"""Versioned on-disk store for persisted operator indexes (IVF,
IVF-PQ, MinHash-LSH, span-dedup window index) — the matrel manifest
discipline (matrel.py:123 ``_write_manifest``) extended to the index
stores, closing the round-7 durability gap: retrains used to
``mode("overwrite")`` the only copy in place (a mid-job crash
destroyed the index) and appends had no commit marker (a mid-job
crash left an undetectable partial batch).

Reference analog: PipelineDB persists its matrels inside Postgres
transactions (src/pipeline_combine.c), so every multi-step index
mutation is atomic there for free; on plain files / object storage we
reproduce that with an atomic-pointer manifest.

Layout under ``root``::

    _manifest.json       atomic pointer, swapped with os.replace
    v00001-3fa9c1/       committed data dirs: parquet (optionally
                         partitionBy'd) + artifacts (_codec.npz,
                         _centroids.npy — underscore-prefixed so
                         Spark file listings skip them)
    .stage-8c02d4/       in-flight writes; never referenced by a
                         manifest, never listed by a reader

Manifest::

    {"version": N,                  monotone commit counter
     "dirs":    ["v00001-..", ..],  live data dirs, oldest first;
                                    dirs[0] is the BASE (the last
                                    replace-commit) and owns the
                                    artifacts
     "meta":    {...}}              operator params + drift counters

Commit protocol: the caller writes parquet (and artifacts) into
``stage()``, then calls ``commit(staged, replace=..., meta=...)``
which renames the stage to a version dir and swaps the manifest ONCE
— data, artifacts, and meta accounting become visible together or
not at all.  A crash before the swap leaves a ``.stage-*`` orphan or
an unreferenced version dir that no reader ever lists; a crash after
the swap is simply the post-state.  Readers resolve the live dir set
from the manifest and never list ``root`` itself.

GC mirrors matrel._gc: a dereferenced dir is stamped with
``.unref_ts`` on the first sweep that finds it and unlinked on a
later sweep once the stamp is older than ``gc_grace_seconds`` —
protecting in-flight readers whose lazy plans still hold the old
paths.  Version dirs numbered ABOVE the manifest version are
in-flight commits by a concurrent writer and are never collected;
``.stage-*`` dirs are never touched by automatic GC at all (they are
indistinguishable from an in-flight write).  Commits serialize on an
advisory O_EXCL lock.

Production note: this store assumes a filesystem with atomic rename
(local disk, NFS, HDFS).  On S3-class object storage the same
pointer-swap discipline needs a transactional table format
(Delta/Iceberg/Hudi) or a conditional-put manifest — exactly the
substitution matrel.py documents for its own manifest; every
read/commit call site is layout-agnostic, so the swap is contained
to this module.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import tempfile
import time
import uuid

from pyspark.sql import DataFrame

MANIFEST = "_manifest.json"
_VDIR_RE = re.compile(r"^v(\d+)-[0-9a-f]+$")
# replay-tag retention, as matrel.MAX_TXN_SOURCES: sources idle for 64
# commits have no in-flight replay to detect
MAX_TXN_SOURCES = 64


class IndexStore:
    def __init__(self, root: str, gc_grace_seconds: float = 60.0):
        self.root = root
        self.gc_grace_seconds = gc_grace_seconds

    # -- manifest ------------------------------------------------------
    @property
    def manifest_path(self) -> str:
        return os.path.join(self.root, MANIFEST)

    def exists(self) -> bool:
        return os.path.exists(self.manifest_path)

    def read_manifest(self) -> dict:
        with open(self.manifest_path) as f:
            return json.load(f)

    def _write_manifest(self, m: dict) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.root, prefix="_manifest")
        with os.fdopen(fd, "w") as f:
            json.dump(m, f)
        os.replace(tmp, self.manifest_path)  # atomic swap

    def init_if_needed(self, meta: dict | None = None) -> None:
        os.makedirs(self.root, exist_ok=True)
        if not self.exists():
            self._write_manifest({"version": 0, "dirs": [],
                                  "meta": meta or {}})

    def _commit_lock(self, timeout: float = 120.0,
                     stale_after: float = 600.0):
        """Advisory commit lock (O_CREAT|O_EXCL): two concurrent
        commits would otherwise read-modify-write the manifest and
        the loser's dir list would silently drop the winner's append.
        A lock older than ``stale_after`` is from a crashed committer
        and is broken; waiting longer than ``timeout`` raises."""
        import contextlib

        path = os.path.join(self.root, "_commit.lock")

        @contextlib.contextmanager
        def lock():
            deadline = time.time() + timeout
            while True:
                try:
                    fd = os.open(path, os.O_CREAT | os.O_EXCL
                                 | os.O_WRONLY)
                    os.close(fd)
                    break
                except FileExistsError:
                    try:
                        if time.time() - os.path.getmtime(path) \
                                > stale_after:
                            os.remove(path)  # crashed committer
                            continue
                    except OSError:
                        continue
                    if time.time() > deadline:
                        raise TimeoutError(
                            f"commit lock busy > {timeout}s: {path}")
                    time.sleep(0.05)
            try:
                yield
            finally:
                try:
                    os.remove(path)
                except OSError:
                    pass

        return lock()

    # -- staging + commit ----------------------------------------------
    def stage(self) -> str:
        """A fresh write target invisible to every reader (dot-prefixed
        and unreferenced).  The caller writes parquet + artifacts here,
        then calls :meth:`commit`."""
        self.init_if_needed()
        return os.path.join(self.root, f".stage-{uuid.uuid4().hex[:12]}")

    def commit(self, staged: str, replace: bool,
               meta: dict | None = None,
               txn: tuple[str, int] | None = None) -> str:
        """Publish a staged dir in one atomic manifest swap.

        ``replace=True`` dereferences every current dir (retrain /
        rebuild — the old version stays on disk until its GC grace
        expires, so a crash mid-commit can never lose the index);
        ``replace=False`` appends the dir to the live set (batch
        admit).  ``meta`` (when given) replaces the manifest meta IN
        THE SAME SWAP — drift accounting can never disagree with the
        data it covers.  ``txn=(app_id, version)`` rides the swap too
        (the matrel idempotent-writes pattern, matrel.py txns): a
        replayed streaming epoch is detected by ``txn_version`` and
        skipped instead of double-appended.  Returns the committed
        dir's absolute path."""
        with self._commit_lock():
            m = self.read_manifest()
            version = m["version"] + 1
            final = f"v{version:05d}-{uuid.uuid4().hex[:6]}"
            fpath = os.path.join(self.root, final)
            os.rename(staged, fpath)
            # a pre-commit GC pass may have grace-stamped the stage
            # dir; the stamp must not ride into the committed dir, or
            # a LATER dereference would skip its grace window
            try:
                os.remove(os.path.join(fpath, ".unref_ts"))
            except OSError:
                pass
            dirs = ([] if replace else list(m["dirs"])) + [final]
            out = {"version": version, "dirs": dirs,
                   "meta": meta if meta is not None else m.get("meta", {})}
            txns = dict(m.get("txns", {}))
            if txn is not None:
                app, ver = txn
                prev = txns.get(app)
                txns[app] = [max(int(ver),
                                 int(prev[0] if prev is not None else -1)),
                             version]
                if len(txns) > MAX_TXN_SOURCES:  # most recent kept
                    txns = dict(sorted(txns.items(),
                                       key=lambda kv: kv[1][1],
                                       reverse=True)[:MAX_TXN_SOURCES])
            if txns:
                out["txns"] = txns
            self._write_manifest(out)
        self.gc()
        return fpath

    def txn_version(self, app_id: str) -> int | None:
        """Last epoch committed for ``app_id`` — None if never seen
        (or evicted from the bounded tag map)."""
        v = self.read_manifest().get("txns", {}).get(app_id)
        return int(v[0]) if v is not None else None

    def tag(self, txn: tuple[str, int] | None = None,
            meta: dict | None = None) -> None:
        """Manifest-only commit (no data dir): advance the replay txn
        tag and/or the meta.  The EMPTY-batch path — an empty
        streaming epoch must mark itself done without accumulating an
        empty version dir per epoch."""
        if txn is None and meta is None:
            return
        with self._commit_lock():
            m = self.read_manifest()
            version = m["version"] + 1
            out = {"version": version, "dirs": m["dirs"],
                   "meta": meta if meta is not None
                   else m.get("meta", {})}
            txns = dict(m.get("txns", {}))
            if txn is not None:
                app, ver = txn
                prev = txns.get(app)
                txns[app] = [max(int(ver),
                                 int(prev[0] if prev is not None
                                     else -1)), version]
                if len(txns) > MAX_TXN_SOURCES:
                    txns = dict(sorted(txns.items(),
                                       key=lambda kv: kv[1][1],
                                       reverse=True)[:MAX_TXN_SOURCES])
            if txns:
                out["txns"] = txns
            self._write_manifest(out)

    # -- read side -------------------------------------------------------
    def dirs(self) -> list[str]:
        return [os.path.join(self.root, d)
                for d in self.read_manifest()["dirs"]]

    def base_dir(self) -> str:
        """The dir of the last replace-commit — where artifacts
        (codec/centroids) live."""
        return self.dirs()[0]

    def artifact(self, name: str) -> str:
        return os.path.join(self.base_dir(), name)

    def read(self, spark) -> DataFrame:
        """Union over the live dirs.  Filters above the union push into
        each child scan (Catalyst PushDownPredicates), so partition
        pruning on e.g. ``list_id``/``band`` survives the versioned
        layout."""
        paths = self.dirs()
        if not paths:
            raise ValueError(f"index at {self.root} holds no data")
        out = spark.read.parquet(paths[0])
        for p in paths[1:]:
            out = out.unionByName(spark.read.parquet(p))
        return out

    # -- meta --------------------------------------------------------------
    def meta(self) -> dict:
        return self.read_manifest().get("meta", {})

    # -- GC ------------------------------------------------------------------
    def gc(self, include_stage: bool = False) -> None:
        """Unlink dereferenced version dirs (grace-stamped, the
        matrel._gc contract).  Never touches live dirs or version
        dirs numbered above the manifest version (in-flight commits).

        ``.stage-*`` dirs are skipped unless ``include_stage=True``:
        a stage dir is indistinguishable from a CONCURRENT writer's
        in-flight parquet write (which can legitimately run longer
        than any grace), so the automatic commit-path GC must never
        touch them — crashed-writer orphans are reclaimed by an
        explicit maintenance sweep that knows no writer is active."""
        m = self.read_manifest()
        live = set(m["dirs"])
        now = time.time()
        for entry in os.listdir(self.root):
            path = os.path.join(self.root, entry)
            if not os.path.isdir(path) or entry in live:
                continue
            vm = _VDIR_RE.match(entry)
            if vm is not None and int(vm.group(1)) > m["version"]:
                continue  # in-flight commit by a concurrent writer
            if vm is None:
                if not (include_stage and entry.startswith(".stage-")):
                    continue
            if self.gc_grace_seconds > 0:
                marker = os.path.join(path, ".unref_ts")
                try:
                    with open(marker) as f:
                        unref_at = float(f.read().strip() or now)
                except OSError:
                    try:
                        with open(marker, "w") as f:
                            f.write(repr(now))
                    except OSError:
                        pass
                    continue  # grace starts now; delete on a later pass
                if now - unref_at < self.gc_grace_seconds:
                    continue  # possibly still scanned
            shutil.rmtree(path, ignore_errors=True)


def open_index(root: str, gc_grace_seconds: float = 60.0) -> IndexStore:
    s = IndexStore(root, gc_grace_seconds)
    if not s.exists():
        raise ValueError(
            f"no index manifest under {root}: the path predates the "
            "versioned layout or was never persisted — re-run the "
            "operator's *_persist")
    return s


def read_index(spark, root: str) -> DataFrame:
    """Read an index's live rows (all committed dirs unioned)."""
    return open_index(root).read(spark)
