#!/usr/bin/env python
"""Round-8 scale probes: wall-clock ratio on 10× data for the new
paths, plus plan assertions — the per-round evidence that the
round's operators hold their complexity class (BENCH_SCALING_R7OPS
pattern).

Probes:
* dsir_sample at large n (the distributed threshold path): selects
  30% of the corpus; asserts the returned plan is a plain filter
  (no TakeOrderedAndProject / global sort / SinglePartition) and
  reports the 10× wall ratio.
* extract_main_text (jusText-class block scoring) over synthesized
  WARC-like pages: docs/s at 1× and 10× page count.
* span_index_append + compact: append cost stays O(batch) as the
  INDEX grows 10×, and compaction restores one-dir probes.

Usage: python scripts/scale_probe_r8.py [--small sf0.01_dir]
       [--big sf0.1_dir]
Appends the "r8_ops" entry to BENCH_SCALING_R8OPS.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed(fn):
    t0 = time.monotonic()
    out = fn()
    return out, time.monotonic() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", default="/root/testdata/sf0.01")
    ap.add_argument("--big", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from pipelinedb_spark import get_spark

    spark = get_spark("scale_probe_r8")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}

    # ---- dsir_sample distributed threshold path ----------------------
    from pipelinedb_spark.operators.dsir import dsir_fit, dsir_sample

    def run_dsir(sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
            .select("doc_id", "text")
        total = docs.count()
        n = max(1, int(total * 0.3))
        target = docs.limit(200)
        model = dsir_fit(docs, target)
        sel = dsir_sample(docs, None, n=n, model=model,
                          exact_merge_max=0)
        plan = sel._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" not in plan
        assert "SinglePartition" not in plan
        got = sel.count()
        assert got == n, (got, n)
        return n

    run_dsir(args.small)       # warmup: JIT, Arrow pools, broadcast
    n_s, t_small = _timed(lambda: run_dsir(args.small))
    n_b, t_big = _timed(lambda: run_dsir(args.big))
    out["dsir_sample_largen"] = {
        "n_small": n_s, "n_big": n_b,
        "sec_small": round(t_small, 2), "sec_big": round(t_big, 2),
        "ratio_10x": round(t_big / t_small, 2),
        "plan": "filter-only (asserted)"}

    # ---- extract_main_text throughput ---------------------------------
    from pipelinedb_spark.operators.warc import extract_main_text

    nav = ("<nav>" + "".join(f'<li><a href="/{i}">item {i}</a></li>'
                             for i in range(12)) + "</nav>")
    paras = "".join(
        f"<p>paragraph {i} with enough connective prose that the "
        f"committee would have reviewed and agreed upon it during "
        f"the long meeting about the budget.</p>" for i in range(12))
    page = (f"<html><body>{nav}<article>{paras}</article>"
            f"{nav}</body></html>").encode()

    def run_extract(n_pages):
        pages = spark.createDataFrame(
            [(i, bytearray(page)) for i in range(n_pages)],
            "doc_id long, payload binary")
        from pyspark.sql import types as T

        def kern(batches):
            import pandas as pd
            for pdf in batches:
                yield pd.DataFrame({
                    "doc_id": pdf["doc_id"],
                    "n_chars": [len(extract_main_text(bytes(p)))
                                for p in pdf["payload"]]})
        res = pages.repartition(32).mapInPandas(kern, T.StructType([
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_chars", T.LongType())]))
        assert res.agg(F.min("n_chars")).first()[0] > 500
        return n_pages

    run_extract(2_000)         # warmup
    _, te_small = _timed(lambda: run_extract(2_000))
    _, te_big = _timed(lambda: run_extract(20_000))
    out["extract_main_text"] = {
        "pages_small": 2000, "pages_big": 20000,
        "sec_small": round(te_small, 2), "sec_big": round(te_big, 2),
        "ratio_10x": round(te_big / te_small, 2),
        "docs_per_sec_big": round(20000 / te_big)}

    # ---- span index: append cost vs index size ------------------------
    import shutil
    import tempfile

    from pipelinedb_spark.indexstore import open_index
    from pipelinedb_spark.operators.spandedup import (
        span_index_append, span_index_compact, span_index_persist,
        span_index_probe)

    def mk_docs(sf_dir, limit=None):
        d = spark.read.parquet(f"{sf_dir}/documents.parquet") \
            .select("doc_id", "text")
        return d.limit(limit) if limit else d

    def append_cost(sf_dir):
        root = tempfile.mkdtemp(prefix="r8span")
        idx = os.path.join(root, "idx")
        span_index_persist(mk_docs(sf_dir), idx, window=20)
        batch = mk_docs(args.small, limit=200) \
            .withColumn("doc_id", F.col("doc_id") + 10_000_000)
        _, t = _timed(lambda: span_index_append(spark, idx, batch))
        shutil.rmtree(root, ignore_errors=True)
        return t

    append_cost(args.small)    # warmup
    ta_small = append_cost(args.small)
    ta_big = append_cost(args.big)
    out["span_append_vs_index_size"] = {
        "sec_small_index": round(ta_small, 2),
        "sec_big_index": round(ta_big, 2),
        # same 200-doc batch against a 10× index: O(batch) appends
        # should hold this near 1.0
        "ratio_10x_index": round(ta_big / ta_small, 2)}

    # compaction sanity on an appended index
    root = tempfile.mkdtemp(prefix="r8span2")
    idx = os.path.join(root, "idx")
    span_index_persist(mk_docs(args.small, 500), idx, window=20)
    for i in range(4):
        span_index_append(
            spark, idx, mk_docs(args.small, 100)
            .withColumn("doc_id", F.col("doc_id") + (i + 1) * 10_000_000))
    probe = mk_docs(args.small, 50)
    pre = span_index_probe(spark, idx, probe).count()
    ndirs = span_index_compact(spark, idx)
    post = span_index_probe(spark, idx, probe).count()
    assert pre == post and len(open_index(idx).dirs()) == 1
    out["span_compact"] = {"dirs_compacted": ndirs,
                           "probe_rows_stable": pre == post}
    shutil.rmtree(root, ignore_errors=True)

    print(json.dumps(out))
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_SCALING_R8OPS.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
