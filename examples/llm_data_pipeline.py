#!/usr/bin/env python
"""End-to-end LLM training-data pipeline on pipelinedb_spark operators:

  raw documents
    → exact dedup (md5 canonicalization)
    → MinHash-LSH near-dup candidates + exact-Jaccard verify
    → connected-component clusters, keep one canonical doc each
    → text quality filter (lang-id, stopword ratio, quality score)
    → corpus stats (token counts, vocabulary)

Every stage is the scale path (LSH banding, bucketed self-joins pinned
shuffle-hash, no driver-side loops) — the same code runs on a cluster
against a 100 TB corpus by changing the input path.

Usage: python examples/llm_data_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from pyspark.sql import functions as F

    from pipelinedb_spark import get_spark
    from pipelinedb_spark.operators.dedup import (dedup_clusters,
                                                  exact_duplicates,
                                                  lsh_verified_pairs)
    from pipelinedb_spark.operators.text import analyze_documents

    spark = get_spark("llm_data_pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()

    # 1. exact dedup: keep the minimum doc_id per distinct content
    canon = exact_duplicates(docs).select(
        F.col("canonical_id").alias("doc_id"))
    docs1 = docs.join(canon, "doc_id", "left_semi")
    n1 = docs1.count()

    # 2. near-dup pairs: LSH candidates, exact Jaccard >= 0.5 verify
    pairs = lsh_verified_pairs(docs1, threshold=0.5)

    # 3. dedup clusters: keep the canonical (minimum-id) member
    clusters = dedup_clusters(pairs)
    drop = clusters.filter(F.col("doc_id") != F.col("cluster_id")) \
        .select("doc_id")
    docs2 = docs1.join(drop, "doc_id", "left_anti")
    n2 = docs2.count()

    # 4. quality filter: english-ish, low-garbage documents
    profiled = analyze_documents(docs2)
    kept = profiled.filter((F.col("quality") >= 0.3) &
                           (F.col("n_tokens").between(5, 100000)))
    n3 = kept.count()

    # 5. corpus stats
    stats = kept.agg(
        F.count("*").alias("docs"),
        F.sum("n_tokens").alias("tokens"),
        F.round(F.avg("quality"), 4).alias("avg_quality")).collect()[0]
    langs = (kept.groupBy("lang").count()
             .orderBy(F.desc("count")).limit(5).collect())

    print(f"raw documents:        {n0}")
    print(f"after exact dedup:    {n1}  (-{n0 - n1})")
    print(f"after near-dup dedup: {n2}  (-{n1 - n2})")
    print(f"after quality filter: {n3}  (-{n2 - n3})")
    print(f"tokens kept: {stats['tokens']}, avg quality "
          f"{stats['avg_quality']}")
    print("top langs:", [(r["lang"], r["count"]) for r in langs])


if __name__ == "__main__":
    main()
