"""Matrel (materialization table) store.

The reference stores a CV's partial aggregate states in an ordinary heap
table with an expression hash index on the group key for point-lookup
merges (``src/pipeline_query.c:1786-1803``, ``src/combiner.c:399``,
``src/matrel.c:92-226``).  On Spark we instead keep the matrel as a
**hash-bucketed parquet table with versioned bucket directories**:

* each group row carries ``__bucket = pmod(xxhash64(group cols), N)``;
* a merge touches only the buckets that appear in the incoming delta —
  untouched buckets carry forward by reference in the manifest, so a
  micro-batch that hits k groups rewrites O(k/N · table), not the whole
  table.  This is the parquet analog of PipelineDB's group-hash index
  point updates, and it is what keeps incremental maintenance viable at
  100 TB (a Delta/Iceberg MERGE would play the same role on a real
  deployment; this store has no external dependencies).
* versioned directories + an atomically-replaced MANIFEST give readers
  snapshot isolation and make merges idempotent on retry (the Spark
  checkpoint analog of the reference's at-least-once combiner commits).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BUCKET_COL = "__bucket"


class MatrelStore:
    def __init__(self, spark: SparkSession, root: str, name: str,
                 num_buckets: int = 32) -> None:
        self.spark = spark
        self.name = name
        self.dir = os.path.join(root, name)
        self.num_buckets = num_buckets
        os.makedirs(self.dir, exist_ok=True)
        self._manifest_path = os.path.join(self.dir, "MANIFEST")
        if not os.path.exists(self._manifest_path):
            self._write_manifest({"version": 0, "buckets": {}})

    # -- manifest ----------------------------------------------------------
    def _read_manifest(self) -> dict:
        with open(self._manifest_path) as f:
            return json.load(f)

    def _write_manifest(self, m: dict) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.dir)
        with os.fdopen(fd, "w") as f:
            json.dump(m, f)
        os.replace(tmp, self._manifest_path)  # atomic swap

    # -- read --------------------------------------------------------------
    def is_empty(self) -> bool:
        return not self._read_manifest()["buckets"]

    def read(self, buckets: list[int] | None = None) -> DataFrame | None:
        m = self._read_manifest()
        entries = m["buckets"]
        if buckets is not None:
            entries = {str(b): p for b in buckets
                       if (p := entries.get(str(b))) is not None}
        paths = sorted(set(entries.values()))
        if not paths:
            return None
        df = self.spark.read.parquet(*paths)
        if buckets is not None:
            df = df.filter(F.col(BUCKET_COL).isin([int(b) for b in buckets]))
        return df

    # -- merge -------------------------------------------------------------
    def bucket_expr(self, group_cols: list[str]):
        if not group_cols:
            return F.lit(0)
        return F.pmod(F.xxhash64(*[F.col(c) for c in group_cols]),
                      F.lit(self.num_buckets)).cast("int")

    def merge(self, delta: DataFrame, group_cols: list[str],
              merge_agg_fn,
              affected: list[int] | None = None,
              pin_old: bool = False,
              constrain_fn=None
              ) -> tuple[DataFrame | None, DataFrame]:
        """Merge a batch of partial-state rows into the matrel.

        ``merge_agg_fn(df)`` must group ``df`` by ``group_cols`` +
        ``__bucket`` and produce one merged state row per group.

        ``affected`` may pass the delta's distinct bucket ids when the
        caller already computed them (saves a probe job); otherwise
        they are collected here.

        ``pin_old`` snapshots the old affected-bucket rows
        (localCheckpoint) so the returned ``old`` stays readable after
        this commit's version GC unlinks the files it came from — set
        it when you will consume ``old`` after the merge (e.g. for
        old/new change rows).  The merged write then reads the pinned
        blocks instead of re-scanning the old parquet, so the extra
        job pays for itself.

        Returns ``(old_rows_of_affected_buckets, merged_affected)`` so
        the caller can compute old/new output-stream rows.  Mirrors the
        combiner flow (``combine()`` → ``select_existing_groups`` →
        ``sync_combine``, ``src/combiner.c:1323-1633``).
        """
        if BUCKET_COL not in delta.columns:
            delta = delta.withColumn(BUCKET_COL, self.bucket_expr(group_cols))
        if affected is None:
            affected = [r[BUCKET_COL] for r in
                        delta.select(BUCKET_COL).distinct().collect()]
        old = self.read(affected)
        if old is not None and pin_old:
            old = old.localCheckpoint(eager=True)
        unioned = delta if old is None else old.unionByName(delta)
        merged = merge_agg_fn(unioned)
        if constrain_fn is not None:
            # matrel CHECK constraints (reference matrel_constraints.sql):
            # violating upserts are rejected — the group keeps its
            # previous row (or is dropped entirely when new)
            merged = constrain_fn(old, merged)
        self._commit(merged, affected)
        return old, merged

    def overwrite(self, states: DataFrame, group_cols: list[str]) -> None:
        """Replace the whole matrel (truncate+load / combine_table)."""
        states = states.withColumn(BUCKET_COL, self.bucket_expr(group_cols))
        self._commit(states, None, full=True)

    def delete_where(self, condition) -> int:
        """TTL reaper: rewrite buckets dropping rows matching
        ``condition`` (reference ``src/reaper.c:63-128``).

        One probe job computes the delete count AND the affected bucket
        set together (was two counts + a distinct = 3 jobs), then one
        write rewrites only the affected buckets.  SQL DELETE
        semantics: only rows where the condition is TRUE are deleted
        (a NULL predicate keeps the row)."""
        cur = self.read()
        if cur is None:
            return 0
        hit = F.coalesce(condition, F.lit(False))
        probe = cur.agg(
            F.count(F.when(hit, True)).alias("deleted"),
            F.collect_set(F.when(hit, F.col(BUCKET_COL))).alias("bks")
        ).first()
        deleted = int(probe["deleted"])
        if not deleted:
            return 0
        affected = sorted(int(b) for b in probe["bks"])
        self._commit(self.read(affected).filter(~hit), affected)
        return deleted

    def truncate(self) -> None:
        m = self._read_manifest()
        self._write_manifest({"version": m["version"] + 1, "buckets": {}})

    def _commit(self, df: DataFrame, affected: list[int] | None,
                full: bool = False) -> None:
        m = self._read_manifest()
        version = m["version"] + 1
        vdir = os.path.join(self.dir, f"v{version}")
        # Partition the write by bucket so each bucket lands in its own
        # directory (manifest entries point at leaf dirs).  partitionBy
        # strips its column from the data files, so write a duplicate
        # ``__bp`` and keep ``__bucket`` as a data column for reads.
        df.withColumn("__bp", F.col(BUCKET_COL)) \
            .write.mode("overwrite").partitionBy("__bp").parquet(vdir)
        new_buckets = {} if full else dict(m["buckets"])
        if full:
            affected = None
        present = set()
        for entry in os.listdir(vdir):
            if entry.startswith("__bp="):
                b = entry.split("=", 1)[1]
                present.add(b)
                new_buckets[b] = os.path.join(vdir, entry)
        if affected is not None:
            # affected buckets whose merged result is empty → drop
            for b in affected:
                if str(b) not in present and str(b) in new_buckets:
                    new_buckets.pop(str(b))
        self._write_manifest({"version": version, "buckets": new_buckets})
        self._gc(keep_version=version)

    def _gc(self, keep_version: int, keep_last: int = 2) -> None:
        """Drop version dirs no longer referenced (keep a small tail for
        in-flight readers)."""
        live_dirs = {os.path.relpath(p, self.dir).split(os.sep)[0]
                     for p in self._read_manifest()["buckets"].values()}
        for entry in os.listdir(self.dir):
            if not entry.startswith("v"):
                continue
            try:
                v = int(entry[1:])
            except ValueError:
                continue
            if entry not in live_dirs and v < keep_version - keep_last:
                shutil.rmtree(os.path.join(self.dir, entry), ignore_errors=True)

    def rename(self, new_name: str) -> None:
        """Move the store to a sibling directory and rewrite manifest
        paths (the store's directory is derived from the CV name, so a
        view rename must carry the data for catalog replay to find
        it)."""
        parent = os.path.dirname(self.dir)
        new_dir = os.path.join(parent, new_name)
        if os.path.exists(new_dir):
            raise FileExistsError(f"matrel dir {new_dir} already exists")
        old_dir = self.dir
        os.rename(old_dir, new_dir)
        self.name = new_name
        self.dir = new_dir
        self._manifest_path = os.path.join(new_dir, "MANIFEST")
        m = self._read_manifest()
        m["buckets"] = {b: os.path.join(new_dir, os.path.relpath(p, old_dir))
                        for b, p in m["buckets"].items()}
        self._write_manifest(m)

    def drop(self) -> None:
        shutil.rmtree(self.dir, ignore_errors=True)
