#!/usr/bin/env python
"""Continuous ingest with incremental near-dup admission control.

The production shape for a continuously-growing training corpus:

  file drop dir → stream → python transform:
        probe the PERSISTED MinHash-LSH index (no corpus recompute),
        drop batch docs that near-duplicate an admitted doc,
        probe the PERSISTED span index and scrub passages that
        duplicate already-admitted content (keep-one policy),
        append the cleaned survivors to BOTH indexes
      → admitted-docs output stream → CV: per-source admission stats

Run: python examples/continuous_ingest_dedup.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

from pyspark.sql import functions as F


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from pipelinedb_spark import PipelineContext, get_spark
    from pipelinedb_spark.operators.dedup import (lsh_index_append,
                                                  lsh_index_persist,
                                                  lsh_index_probe)
    from pipelinedb_spark.operators.spandedup import (
        remove_duplicated_spans, span_index_append, span_index_persist,
        span_index_probe)

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = tempfile.mkdtemp(prefix="ingest_dedup_")
    spark = get_spark("continuous_ingest_dedup")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # seed the index with the existing corpus (one-time cost)
    idx_path = os.path.join(work, "lsh_idx")
    lsh_index_persist(docs.select("doc_id", "text"), idx_path)
    span_path = os.path.join(work, "span_idx")
    span_index_persist(docs.select("doc_id", "text"), span_path,
                       window=6)

    ctx = PipelineContext(spark, root=os.path.join(work, "pdb"),
                          num_buckets=16)
    ctx.create_stream("docs_in",
                      "doc_id long, text string, source string")

    def admit(df):
        """Per-batch admission: near-dups of admitted docs are
        dropped (doc level), duplicated passages are scrubbed (span
        level), cleaned survivors enter both indexes — later batches
        dedup against them too."""
        batch = df.select("doc_id", "text", "source").localCheckpoint()
        hits = lsh_index_probe(spark, idx_path, batch) \
            .filter(F.col("est_jaccard") >= 0.7) \
            .select(F.col("new_id").alias("doc_id")).distinct()
        survivors = batch.join(hits, "doc_id", "left_anti") \
            .localCheckpoint()
        spans = span_index_probe(spark, span_path, survivors)
        cleaned = remove_duplicated_spans(survivors, spans=spans) \
            .localCheckpoint()
        lsh_index_append(spark, idx_path, cleaned)
        span_index_append(spark, span_path, cleaned)
        return cleaned.withColumn("admitted", F.lit(True))

    ctx.create_python_transform("admission", "docs_in", admit)
    ctx.create_view("cv_admission",
                    "SELECT source, count(*) AS admitted, "
                    "sum(removed_tokens) AS scrubbed_tokens "
                    "FROM output_of('admission') GROUP BY source")

    # batch 1: two fresh docs + one near-copy of an indexed doc
    seed = docs.orderBy("doc_id").limit(1).collect()[0]
    ctx.insert("docs_in", [
        {"doc_id": 10_000, "text": seed["text"] + " extra tail",
         "source": "crawl"},                       # near-dup: dropped
        {"doc_id": 10_001, "source": "crawl",
         "text": "a genuinely new document with fresh words here"},
        {"doc_id": 10_002, "source": "forum",
         "text": "another brand new document nothing like the rest"},
        # mostly-new doc CONTAINING a passage lifted verbatim from an
        # indexed doc: survives doc-level LSH, span probe scrubs the
        # lifted passage
        {"doc_id": 10_003, "source": "forum",
         "text": ("totally different framing paragraph here before "
                  + " ".join(seed["text"].split(" ")[:8])
                  + " and then an original conclusion follows")},
    ])
    # batch 2: a copy of a batch-1 SURVIVOR — caught because survivors
    # were appended to the index
    ctx.insert("docs_in", [
        {"doc_id": 20_000, "source": "crawl",
         "text": "a genuinely new document with fresh words here"},
    ])

    for r in sorted(ctx.read_view("cv_admission").collect(),
                    key=lambda r: r["source"]):
        print(f"source={r['source']}: admitted={r['admitted']}, "
              f"scrubbed_tokens={r['scrubbed_tokens']}")
    # expected: crawl admitted=1 (10_001; 10_000 and 20_000 dropped),
    # forum admitted=2 with 10_003's lifted passage scrubbed

    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
