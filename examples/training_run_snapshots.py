#!/usr/bin/env python
"""Reproducible training-run snapshots with named pins.

A training run that reads continuously-maintained state — a
deduplication index that keeps ingesting, a continuous view whose
aggregates keep merging — cannot be reproduced from "the current
state" a week later.  Pins fix the exact bytes a run consumed:

* ``pin_index(path, name)`` snapshots a persisted operator index
  (MinHash-LSH, IVF/IVF-PQ, span windows, BM25): the pin names the
  exact committed dir set, GC never reclaims it, and
  ``read_pinned_index`` replays it bit-for-bit after any number of
  later appends, compactions, or retrains.

* ``ctx.pin_view(view, name)`` does the same for a continuous
  view's materialization: the matrel's whole bucket→version map is
  captured atomically under the view's commit lock, so the pin can
  never interleave with a combiner merge.  A pinned SLIDING-WINDOW
  view additionally freezes the window cutoff at the pin instant —
  it returns the same rows forever, even after the live window has
  slid past them and the reaper dropped the expired step buckets.

Run: python examples/training_run_snapshots.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from pipelinedb_spark import PipelineContext, get_spark
    from pipelinedb_spark.indexstore import (IndexStore, pin_index,
                                             read_pinned_index)

    spark = get_spark("training_run_snapshots")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="pdb_pins_")
    try:
        # ---- 1. pin a continuous view mid-stream --------------------
        ctx = PipelineContext(spark, root=os.path.join(work, "pdb"),
                              num_buckets=8)
        ctx.create_stream("events", "source string, tokens long")
        ctx.create_view(
            "corpus_stats",
            "SELECT source, count(*) AS docs, sum(tokens) AS tokens "
            "FROM events GROUP BY source")
        ctx.insert("events", [{"source": "web", "tokens": 120},
                              {"source": "web", "tokens": 80},
                              {"source": "code", "tokens": 300}])

        rec = ctx.pin_view("corpus_stats", "run-2026-08-16")
        print("pinned corpus_stats at manifest version",
              rec["version"])

        # ingest keeps going; the live view moves on
        ctx.insert("events", [{"source": "web", "tokens": 999},
                              {"source": "books", "tokens": 50}])
        mat = ctx.views["corpus_stats"].matrel
        mat.gc_grace_seconds = 0.0
        mat.compact()            # full rewrite + eager GC
        mat.gc_sweep()

        print("live :", sorted(tuple(r) for r in
                               ctx.read_view("corpus_stats").collect()))
        print("run  :", sorted(tuple(r) for r in
                               ctx.read_view_pinned(
                                   "corpus_stats",
                                   "run-2026-08-16").collect()))

        # ---- 2. pin a persisted index across a rebuild --------------
        idx_root = os.path.join(work, "docs_idx")
        store = IndexStore(idx_root, gc_grace_seconds=0.0)
        store.init_if_needed(meta={})
        staged = store.stage()
        spark.range(5).selectExpr("id AS doc_id").write.parquet(staged)
        store.commit(staged, replace=False)

        pin_index(idx_root, "run-2026-08-16")

        staged = store.stage()  # a later full rebuild
        spark.range(100, 103).selectExpr("id AS doc_id") \
            .write.parquet(staged)
        store.commit(staged, replace=True)
        store.gc()

        print("index live rows :",
              store.read(spark).count())          # 3 (the rebuild)
        print("index run rows  :",
              read_pinned_index(spark, idx_root,
                                "run-2026-08-16").count())  # 5

        # ---- 3. release when the run's artifacts expire --------------
        ctx.unpin_view("corpus_stats", "run-2026-08-16")
        store.unpin("run-2026-08-16")
        store.gc()  # pinned dirs now reclaimable
        ctx.close()
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
