#!/usr/bin/env python
"""End-to-end LLM training-data pipeline on pipelinedb_spark operators:

  raw documents
    → exact dedup (md5 canonicalization)
    → MinHash-LSH near-dup candidates + exact-Jaccard verify
    → connected-component clusters, keep one canonical doc each
    → span-level exact-substring scrub (repeated ≥K-token passages
      removed, one canonical copy survives — Lee et al. 2021)
    → repetition filter (Gopher dup-line/dup-n-gram/top-n-gram rules)
    → text quality filter (lang-id, stopword ratio, quality score)
    → PII redaction (typed placeholders, residue-free)
    → benchmark decontamination (8-gram overlap vs a held-out set)
    → semantic dedup over embeddings (LSH + exact cosine, one
      canonical vector per cluster)
    → deterministic source mixing (hash-stratified sampling)
    → DSIR importance resampling toward a target domain (hashed
      n-gram log-ratio weights, Gumbel top-k)
    → corpus stats (whitespace + BPE-ish + trained-BPE token counts)

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

    # 3b. span-level exact-substring scrub: remove repeated >=12-token
    # passages (boilerplate that survives doc-level dedup), keeping
    # one canonical copy corpus-wide
    from pipelinedb_spark.operators.spandedup import remove_duplicated_spans
    docs2 = remove_duplicated_spans(docs2, window=12, keep="first")
    n_scrubbed = docs2.agg(F.sum("removed_tokens")).collect()[0][0] or 0
    docs2 = docs2.drop("removed_tokens")

    # 4. repetition filter: drop loopy/templated docs (Gopher rules,
    # minus the word-count gate — the synthetic corpus is short-doc)
    from pipelinedb_spark.operators.quality import GOPHER_RULES, gopher_filter
    rep_rules = {k: v for k, v in GOPHER_RULES.items()
                 if k not in ("word_count", "mean_word_length")}
    docs3 = gopher_filter(docs2, rules=rep_rules)
    n3 = docs3.count()

    # 5. quality filter: english-ish, low-garbage documents
    profiled = analyze_documents(docs3)
    kept = profiled.filter((F.col("quality") >= 0.3) &
                           (F.col("n_tokens").between(5, 100000)))
    n4 = kept.count()

    # 6. PII redaction (typed placeholders; counts before/after)
    from pipelinedb_spark.operators.pii import pii_profile, pii_redact
    n_pii = pii_profile(kept).agg(F.sum("n_pii")).collect()[0][0]
    kept = pii_redact(kept)

    # 7. benchmark decontamination: hold out every 100th doc as a
    # stand-in eval set, drop training docs sharing ≥3 distinct
    # 8-grams with it
    from pipelinedb_spark.operators.curation import decontaminate
    eval_set = (docs.filter(F.col("doc_id") % 100 == 7)
                .select(F.col("doc_id").alias("eval_id"), "text"))
    train = decontaminate(
        kept.join(eval_set.select(F.col("eval_id").alias("doc_id")),
                  "doc_id", "left_anti"),
        eval_set, min_hits=3)
    n5 = train.count()

    # 8. semantic dedup on the embedding table (vec_id ≍ doc_id here)
    from pipelinedb_spark.operators.similarity import semantic_dedup
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
        .select("vec_id", "embedding")
    sem_kept = semantic_dedup(emb, threshold=0.45, bits=3, tables=24) \
        .select(F.col("vec_id").alias("doc_id"))
    train = train.join(sem_kept, "doc_id", "left_semi") \
        .unionByName(train.join(emb.select(F.col("vec_id")
                                           .alias("doc_id")),
                                "doc_id", "left_anti"))
    n6 = train.count()

    # 9. deterministic source mixing: downweight the two largest
    # sources (stable under retries/repartitioning — hash, not rand)
    from pipelinedb_spark.operators.curation import stratified_sample
    top2 = [r["source"] for r in train.groupBy("source").count()
            .orderBy(F.desc("count")).limit(2).collect()]
    mixed = stratified_sample(train, {s: 0.5 for s in top2},
                              strata_col="source", key_col="doc_id",
                              default_fraction=1.0)
    n7 = mixed.count()

    # 9b. DSIR: importance-resample toward a target domain (here, the
    # highest-quality decile stands in for "looks like the reference
    # corpus"); hashed-ngram weights, Gumbel top-k w/o replacement
    from pipelinedb_spark.operators.dsir import dsir_sample
    n_target = max(50, n7 // 10)
    target = mixed.orderBy(F.desc("quality")).limit(n_target) \
        .select("text")
    selected = dsir_sample(mixed, target, n=max(1, int(n7 * 0.8)),
                           buckets=4096).drop("dsir_logw")
    n8 = selected.count()

    # 9c. diversity anchors: greedy k-center over the surviving
    # docs' embeddings — 16 exemplars spreading the embedding space
    # (eval-set seeds / clustering anchors); the last pick's distance
    # bounds the covering radius within 2× of optimal
    from pipelinedb_spark.operators.similarity import kcenter_select
    sel_emb = emb.join(selected.select(F.col("doc_id")
                                       .alias("vec_id")),
                       "vec_id", "left_semi")
    anchors = kcenter_select(sel_emb, k=16).collect()
    radius = min(a["sel_dist"] for a in anchors)

    # 10. sequence packing: deterministic greedy sample packing into
    # 512-token training sequences
    from pipelinedb_spark.operators.curation import pack_sequences
    packed = pack_sequences(selected, max_tokens=512,
                            token_col="n_tokens")
    n_seqs = packed.select("seq_id").distinct().count()

    # 11. corpus stats — incl. EXACT token counts under a tokenizer
    # trained on this corpus (the number a training budget uses)
    from pipelinedb_spark.operators.bpe import bpe_train
    from pipelinedb_spark.operators.text import bpe_ish_token_count
    tok = bpe_train(selected, vocab_size=512, max_words=50_000)
    stats = tok.token_count(selected, out_col="bpe_exact").agg(
        F.count("*").alias("docs"),
        F.sum("n_tokens").alias("tokens"),
        F.sum(bpe_ish_token_count(F.col("text"))).alias("bpe_tokens"),
        F.sum("bpe_exact").alias("bpe_exact"),
        F.round(F.avg("quality"), 4).alias("avg_quality")).collect()[0]
    langs = (selected.groupBy("lang").count()
             .orderBy(F.desc("count")).limit(5).collect())

    print(f"raw documents:          {n0}")
    print(f"after exact dedup:      {n1}  (-{n0 - n1})")
    print(f"after near-dup dedup:   {n2}  (-{n1 - n2})")
    print(f"span-scrubbed tokens:   {n_scrubbed}")
    print(f"after repetition filter:{n3}  (-{n2 - n3})")
    print(f"after quality filter:   {n4}  (-{n3 - n4})")
    print(f"PII spans redacted:     {n_pii}")
    print(f"after decontamination:  {n5}  (-{n4 - n5} + eval holdout)")
    print(f"after semantic dedup:   {n6}  (-{n5 - n6})")
    print(f"after source mixing:    {n7}  (-{n6 - n7})")
    print(f"after DSIR selection:   {n8}  (-{n7 - n8})")
    print(f"diversity anchors:      {len(anchors)}  "
          f"(k-center radius ≤ {radius:.3f})")
    print(f"packed into sequences:  {n_seqs}  (max 512 tokens each)")
    print(f"tokens kept: {stats['tokens']} ws / {stats['bpe_tokens']} "
          f"bpe-ish / {stats['bpe_exact']} trained-bpe "
          f"(vocab {tok.vocab_size}), avg quality {stats['avg_quality']}")
    print("top langs:", [(r["lang"], r["count"]) for r in langs])


if __name__ == "__main__":
    main()
