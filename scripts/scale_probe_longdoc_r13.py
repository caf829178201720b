#!/usr/bin/env python
"""Round-13 long-document scaling probe: the HOF-lambda fixes turned
shingles/grams/bigrams/chunking from O(len²) to O(len) per document —
this probe PINS that trend by timing the fixed operators on synthetic
corpora whose documents grow 2k → 20k → 100k tokens (corpus token
count held constant, so a linear operator reads a FLAT series and the
old quadratic plans would read ×10 per decade).  Appends
"longdoc_scaling_r13" to BENCH_SCALING.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    from pyspark.sql import functions as F

    from pipelinedb_spark import get_spark
    from pipelinedb_spark.operators.curation import chunk_documents
    from pipelinedb_spark.operators.dedup import word_shingles
    from pipelinedb_spark.operators.lm import _bigram_pairs
    from pipelinedb_spark.operators.quality import (
        duplicate_ngram_char_fraction, top_ngram_char_fraction)

    spark = get_spark("longdoc_probe_r13")
    spark.sparkContext.setLogLevel("ERROR")

    TOTAL_TOKENS = 3_200_000        # constant corpus mass per tier

    def corpus(tokens_per_doc: int):
        ndocs = TOTAL_TOKENS // tokens_per_doc
        # deterministic pseudo-text, vocab ~1k, built JVM-side
        return (spark.range(ndocs).select(
            F.col("id").alias("doc_id"),
            F.array_join(
                F.transform(
                    F.sequence(F.lit(0), F.lit(tokens_per_doc - 1)),
                    lambda i: F.concat(
                        F.lit("w"),
                        F.pmod(F.xxhash64(i
                                          + F.col("id") * 1000003),
                               F.lit(997)).cast("string"))),
                " ").alias("text")).localCheckpoint(eager=True))

    def ops(df):
        return {
            "shingles": lambda: df.select(F.sum(F.size(word_shingles(
                F.col("text"), 3))).alias("n")),
            "gopher_grams": lambda: df.select(
                F.sum(top_ngram_char_fraction(F.col("text"), 3)
                      + duplicate_ngram_char_fraction(F.col("text"), 8)
                      ).alias("n")),
            "bigram_pairs": lambda: df.select(F.sum(F.size(
                _bigram_pairs(F.col("text")))).alias("n")),
            "chunking": lambda: chunk_documents(
                df, chunk_tokens=512, overlap=64).agg(
                F.count("*").alias("n")),
        }

    tiers = [2_000, 20_000, 100_000]
    out: dict = {
        "what": "fixed corpus mass (3.2M tokens), document length "
                "2k/20k/100k tokens: post-HOF-fix operators must read "
                "a ~flat series (linear in tokens); the pre-r13 "
                "formulations were O(len^2) per doc and would grow "
                "~10x per tier",
        "tokens_per_doc": tiers,
    }
    for tpd in tiers:
        df = corpus(tpd)
        df.count()
        for name, build in ops(df).items():
            t0 = time.perf_counter()
            build().write.mode("overwrite").format("noop").save()
            sec = round(time.perf_counter() - t0, 2)
            out.setdefault(name, []).append(sec)
            print(f"{tpd} tok/doc {name}: {sec}s", flush=True)
        df.unpersist()
    for name in ("shingles", "gopher_grams", "bigram_pairs",
                 "chunking"):
        s = out[name]
        out[name + "_ratio_per_decade"] = [
            round(s[i + 1] / s[i], 2) for i in range(len(s) - 1)]

    path = os.path.join(ROOT, "BENCH_SCALING.json")
    data = json.load(open(path)) if os.path.exists(path) else {}
    data["longdoc_scaling_r13"] = out
    with open(path, "w") as f:
        json.dump(data, f, indent=2)
    print(json.dumps({k: out[k] for k in out if k.endswith("_ratio_per_decade")}))


if __name__ == "__main__":
    main()
