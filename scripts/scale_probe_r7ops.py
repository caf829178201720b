#!/usr/bin/env python
"""Scaling-trend probe for the round-7 operators: span-level
exact-substring dedup, DSIR importance weighting, BPE word counting /
encoding, IVF-PQ encode + search.  Times each at sf0.1 and the
10x-replicated sf1 and reports the ratio (≤ ~10 ⇒ at-most-linear).

Shared models (BPE merges, PQ codec) are trained ONCE on the small
side and reused at both scales so the probe measures the corpus-scale
SCAN paths, not driver-side training (which is bounded by vocabulary /
sample size by construction).

Emits ONE JSON line; refreshes BENCH_SCALING_R7OPS.json when run from
the repo root.

Usage: python scripts/scale_probe_r7ops.py [--small ...] [--big ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _noop_sink(df):
    df.write.format("noop").mode("overwrite").save()


def _timed(fn) -> float:
    t0 = time.monotonic()
    fn()
    return time.monotonic() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", default="/root/testdata/sf0.1")
    ap.add_argument("--big", default="/tmp/sfgen/sf1")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from pipelinedb_spark import get_spark
    from pipelinedb_spark.operators.bpe import bpe_train, bpe_word_counts
    from pipelinedb_spark.operators.dsir import dsir_weights
    from pipelinedb_spark.operators.pq import (ivfpq_topk, pq_encode,
                                               pq_train)
    from pipelinedb_spark.operators.spandedup import duplicated_spans

    spark = get_spark("scale_probe_r7ops")
    spark.sparkContext.setLogLevel("ERROR")

    small_docs = spark.read.parquet(f"{args.small}/documents.parquet")
    small_emb = spark.read.parquet(f"{args.small}/embeddings.parquet") \
        .select("vec_id", "embedding")
    tok = bpe_train(small_docs, vocab_size=512, max_words=100_000)
    codec = pq_train(small_emb, n_lists=16, m=8, ksub=64)
    target = small_docs.limit(200).select("text")

    def probes(sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
            .select("vec_id", "embedding")
        queries = emb.filter(F.col("vec_id") < 20)
        return {
            "duplicated_spans": lambda: _noop_sink(
                duplicated_spans(docs, window=12)),
            "dsir_weights": lambda: _noop_sink(
                dsir_weights(docs, target)),
            "bpe_word_counts": lambda: _noop_sink(
                bpe_word_counts(docs)),
            "bpe_encode": lambda: _noop_sink(
                tok.token_count(docs)),
            "pq_encode": lambda: _noop_sink(
                pq_encode(emb, codec)),
            "ivfpq_topk": lambda: _noop_sink(
                ivfpq_topk(emb, queries, k=5, codec=codec,
                           nprobe=4, rerank=50)),
        }

    out = {"small": args.small, "big": args.big, "factor": 10,
           "queries": {}}
    for sf_key, sf_dir in (("small", args.small), ("big", args.big)):
        for name, fn in probes(sf_dir).items():
            best = min(_timed(fn) for _ in range(args.runs))
            out["queries"].setdefault(name, {})[sf_key] = round(best, 3)
            print(f"# {sf_key} {name}: {best:.1f}s", file=sys.stderr,
                  flush=True)
    for name, q in out["queries"].items():
        q["ratio"] = round(q["big"] / q["small"], 2) if q["small"] else None
    print(json.dumps(out))
    with open("BENCH_SCALING_R7OPS.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
