#!/usr/bin/env python
"""Scaling-trend probe for the curation operators (quality, PII,
decontamination, semantic dedup): time each at sf0.1 and at a
10x-replicated sf1 (scripts/gen_scale.py data) and report the ratio.

Single-scan operators (quality/pii) should be ~linear; the LSH-based
semantic dedup should stay well under quadratic.  Emits ONE JSON line
and (when run from the repo root) refreshes BENCH_SCALING_CURATION.json.

Usage: python scripts/scale_probe_curation.py [--small /root/testdata/sf0.1]
                                              [--big /tmp/sfgen/sf1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _noop_sink(df):
    """Force full computation without driver-side collect overhead."""
    df.write.format("noop").mode("overwrite").save()


def probes(spark, sf_dir):
    from pyspark.sql import functions as F

    from pipelinedb_spark.operators.curation import (contamination_pairs,
                                                     pack_sequences,
                                                     stratified_sample)
    from pipelinedb_spark.operators.lm import (lm_logprob_scores,
                                               train_bigram_lm)
    from pipelinedb_spark.operators.pii import pii_profile, pii_redact
    from pipelinedb_spark.operators.quality import (gopher_filter,
                                                    repetition_profile)
    from pipelinedb_spark.operators.retrieval import (bm25_index,
                                                      bm25_search)
    from pipelinedb_spark.operators.similarity import semantic_clusters
    from pipelinedb_spark.operators.text import (bpe_ish_token_count,
                                                 token_count)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
        .select("vec_id", "embedding")
    eval_set = (docs.filter(F.col("doc_id") % 100 == 7)
                .select(F.col("doc_id").alias("eval_id"), "text"))
    return {
        "repetition_profile": lambda: _noop_sink(repetition_profile(docs)),
        "gopher_filter": lambda: _noop_sink(gopher_filter(docs)),
        "pii_profile": lambda: _noop_sink(pii_profile(docs)),
        "pii_redact": lambda: _noop_sink(pii_redact(docs)),
        "bpe_token_count": lambda: _noop_sink(
            docs.select(bpe_ish_token_count(F.col("text")).alias("n"))),
        "decontamination": lambda: _noop_sink(
            contamination_pairs(docs, eval_set, min_hits=3)),
        "stratified_sample": lambda: _noop_sink(
            stratified_sample(docs, {"src0": 0.5}, "source", "doc_id",
                              default_fraction=0.9)),
        # production-shaped config: near-identical threshold with
        # enough LSH bits that buckets stay small at any corpus size.
        # bits=3 (the sf0.001 recall-test setting) would be 8 buckets
        # per table — ~(N/8)^2 candidate pairs per table, quadratic by
        # construction at 500k vectors.  The 10x replicas are exact
        # duplicates (gen_scale copies embeddings), so the big side
        # also measures real 10-clique dedup work.
        "semantic_clusters": lambda: _noop_sink(
            semantic_clusters(emb, 0.99, bits=16, tables=8)),
        "bigram_lm_score": lambda: _noop_sink(
            lm_logprob_scores(docs, train_bigram_lm(docs))),
        "bm25_search": lambda: _noop_sink(
            bm25_search(bm25_index(docs), "key value merge hash",
                        k=100)),
        "pack_sequences": lambda: _noop_sink(
            pack_sequences(docs.withColumn(
                "n_tok", token_count(F.col("text"))),
                max_tokens=512, token_col="n_tok")),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", default="/root/testdata/sf0.1")
    ap.add_argument("--big", default="/tmp/sfgen/sf1")
    ap.add_argument("--runs", type=int, default=1)
    args = ap.parse_args()

    from pipelinedb_spark import get_spark
    spark = get_spark("scale_probe_curation")
    spark.sparkContext.setLogLevel("ERROR")

    out = {"small": args.small, "big": args.big, "factor": 10,
           "queries": {}}
    for sf_key, sf_dir in (("small", args.small), ("big", args.big)):
        for name, fn in probes(spark, sf_dir).items():
            best = min(_timed(fn) for _ in range(args.runs))
            out["queries"].setdefault(name, {})[sf_key] = round(best, 3)
            print(f"# {sf_key} {name}: {best:.1f}s", file=sys.stderr,
                  flush=True)
    for name, q in out["queries"].items():
        q["ratio"] = round(q["big"] / q["small"], 2) if q["small"] else None
    print(json.dumps(out))


def _timed(fn) -> float:
    t0 = time.monotonic()
    fn()
    return time.monotonic() - t0


if __name__ == "__main__":
    main()
