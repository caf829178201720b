"""Corpus curation operators for LLM training-data pipelines:
benchmark decontamination and deterministic stratified sampling.

Scale stance (100 TB corpus, small eval sets / fraction tables):

* decontamination is ONE corpus scan producing (doc, gram-hash) pairs
  joined against a BROADCAST eval-gram table — the eval side is
  benchmark-sized (thousands of docs), never the corpus, so the join
  is shuffle-free on the corpus side;
* sampling is a pure Column predicate on a per-row hash — one scan, no
  shuffle, no RNG state, reproducible across retries/executors (a
  seeded ``F.rand`` is NOT stable under task retry; hashing is).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def contamination_pairs(corpus: DataFrame, eval_set: DataFrame,
                        text_col: str = "text",
                        id_col: str = "doc_id",
                        eval_id_col: str = "eval_id",
                        ngram: int = 8,
                        min_hits: int = 1) -> DataFrame:
    """Benchmark decontamination: corpus docs sharing ≥ ``min_hits``
    distinct ``ngram``-token shingles with any eval document.

    The standard train/test-overlap check (n-gram collision against
    the eval set, as popularized by public LM training reports).
    Returns (doc_id, eval_id, n_hits).  The eval gram table is
    broadcast — eval sets are benchmark-sized; the corpus side stays a
    single scan with no self-shuffle.

    Gram hashing runs in the dedup Arrow kernel (r16; guide §4.2
    native batch work over interpreted expressions): the Catalyst
    ``transform(chained_ngrams, xxhash64)`` expression tree evaluated
    its lambda per ELEMENT and measured 11–12 s of this operator's
    ~14 s at 50k docs; ``gram_array_index`` computes the same distinct
    gram sets vectorized (~10×).  Hit counts only need the hash to be
    collision-free and CONSISTENT across the two join sides — the
    same argument the xxhash64 form already relied on vs the
    string-gram oracle — and the kernel's 64-bit gram hash is both
    (it is shingle_index's hash; pinned against duckdb string grams
    by test_curation.py)."""
    from .dedup import gram_array_index
    eval_grams = (gram_array_index(eval_set, eval_id_col, text_col, ngram)
                  .select(F.col("doc_id").alias(eval_id_col),
                          F.explode("grams").alias("__g")))
    doc_grams = (gram_array_index(corpus, id_col, text_col, ngram)
                 .select(F.col("doc_id").alias(id_col),
                         F.explode("grams").alias("__g")))
    hits = (doc_grams
            .join(F.broadcast(eval_grams), "__g")
            .groupBy(id_col, eval_id_col)
            .agg(F.count("*").alias("n_hits"))
            .filter(F.col("n_hits") >= min_hits))
    return hits


def decontaminate(corpus: DataFrame, eval_set: DataFrame,
                  text_col: str = "text", id_col: str = "doc_id",
                  ngram: int = 8, min_hits: int = 1) -> DataFrame:
    """Drop contaminated docs: corpus minus contamination_pairs hits
    (left_anti join on the doc id — no corpus shuffle; the hit table
    is contamination-sized)."""
    hits = (contamination_pairs(corpus, eval_set, text_col, id_col,
                                ngram=ngram, min_hits=min_hits)
            .select(id_col).distinct())
    return corpus.join(F.broadcast(hits), id_col, "left_anti")


def hash_sample(df: DataFrame, fraction: float, key_col: str,
                seed: int = 0) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose
    xxhash64(key, seed) falls in the bottom ``fraction`` of the hash
    space.  Unlike ``df.sample``, the decision is a pure function of
    the key — stable under task retries, partitioning changes, AND
    across runs, so downstream tables stay consistent."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    # map hash to [0,1): shift into non-negative 63-bit space first
    u = (F.shiftrightunsigned(F.xxhash64(F.col(key_col), F.lit(seed)), 1)
         / F.lit(float(1 << 63)))
    return df.filter(u < F.lit(float(fraction)))


def stratified_sample(df: DataFrame, fractions: dict[str, float],
                      strata_col: str, key_col: str,
                      default_fraction: float = 0.0,
                      seed: int = 0) -> DataFrame:
    """Deterministic per-stratum sampling (``sampleBy`` with stable
    hash decisions): e.g. data-mixing by source/language with exact,
    reproducible membership.  ``fractions`` maps stratum value →
    keep fraction; unlisted strata keep ``default_fraction``."""
    for v in fractions.values():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"fractions must be in [0,1], got {v}")
    frac = F.lit(float(default_fraction))
    for value, f_keep in fractions.items():
        frac = F.when(F.col(strata_col) == value,
                      F.lit(float(f_keep))).otherwise(frac)
    u = (F.shiftrightunsigned(F.xxhash64(F.col(key_col), F.lit(seed)), 1)
         / F.lit(float(1 << 63)))
    return df.filter(u < frac)


def plan_mixture(df: DataFrame, weights: dict[str, float],
                 token_col: str, strata_col: str = "source",
                 budget_tokens: int | None = None) -> dict[str, float]:
    """Token-budget mixture planning: given per-stratum target WEIGHTS
    and a total token budget, compute per-stratum keep fractions from
    the corpus's actual per-stratum token totals.

    target_s = budget · weight_s / Σweights, frac_s = min(1,
    target_s / tokens_s).  A stratum smaller than its target keeps
    everything (frac 1.0) — the standard under-sampled-domain case;
    re-weighting by repetition is the trainer's job, not the
    sampler's.  One small aggregate (|strata| rows) collects to the
    driver; unlisted strata get fraction 0."""
    from pyspark.sql import functions as F
    totals = {r[strata_col]: r["t"] for r in
              df.groupBy(strata_col)
              .agg(F.sum(token_col).alias("t")).collect()}
    if budget_tokens is None:
        budget_tokens = sum(totals.get(s, 0) for s in weights)
    wsum = float(sum(weights.values()))
    fracs = {}
    for s, w in weights.items():
        tok = totals.get(s, 0)
        target = budget_tokens * (w / wsum)
        fracs[s] = 1.0 if tok <= target else (target / tok if tok else 0.0)
    return fracs


def sample_mixture(df: DataFrame, weights: dict[str, float],
                   token_col: str, key_col: str,
                   strata_col: str = "source",
                   budget_tokens: int | None = None,
                   seed: int = 0) -> DataFrame:
    """plan_mixture + deterministic stratified sampling in one call —
    the data-mixing step of a training pipeline, reproducible across
    runs/retries because membership is a pure hash predicate."""
    fracs = plan_mixture(df, weights, token_col, strata_col,
                         budget_tokens)
    return stratified_sample(df, fracs, strata_col, key_col,
                             default_fraction=0.0, seed=seed)


def pack_sequences(df: DataFrame, max_tokens: int,
                   token_col: str, id_col: str = "doc_id",
                   seed: int = 0) -> DataFrame:
    """Deterministic greedy sequence packing (training sample packing):
    assign each document a (seq_id, seq_pos) such that token counts
    within a sequence sum to ≤ ``max_tokens`` (a single over-long doc
    gets its own sequence, flagged ``needs_truncation``).

    Scale shape: packing is PARTITION-LOCAL — docs are hash-
    redistributed on xxhash64(id, seed) and greedily packed within
    each partition in hash order, so the result is deterministic
    under retries and independent of input partitioning, and no
    global coordination exists (global bin packing at corpus scale is
    neither needed nor what production packers do).  seq_id =
    partition_id · 2³² + local sequence index."""
    import pandas as pd
    from pyspark import TaskContext
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    n_parts = max(1, df.sparkSession.sparkContext.defaultParallelism)
    keyed = (df.withColumn("__h", F.xxhash64(F.col(id_col), F.lit(seed)))
             .repartition(n_parts, F.col("__h"))
             .sortWithinPartitions("__h"))
    schema = T.StructType(
        [f for f in df.schema.fields]
        + [T.StructField("seq_id", T.LongType()),
           T.StructField("seq_pos", T.IntegerType()),
           T.StructField("needs_truncation", T.BooleanType())])
    out_cols = [f.name for f in df.schema.fields]

    def gen(batches):
        pid = TaskContext.get().partitionId()
        base = pid << 32
        seq, used, pos = 0, 0, 0
        for pdf in batches:
            seq_ids, seq_poss, truncs = [], [], []
            for tok in pdf[token_col]:
                tok = int(tok) if tok is not None and tok == tok else 0
                over = tok > max_tokens
                # close on MEMBERSHIP (pos>0), not token mass: a
                # zero-token doc leaves used==0 but still occupies the
                # sequence, and an over-long doc must never join it
                if pos > 0 and (used + tok > max_tokens or over):
                    seq, used, pos = seq + 1, 0, 0
                seq_ids.append(base + seq)
                seq_poss.append(pos)
                truncs.append(over)
                used += tok
                pos += 1
                if over:  # over-long doc sits alone; close its seq
                    seq, used, pos = seq + 1, 0, 0
            out = pdf[out_cols].copy()
            out["seq_id"] = pd.array(seq_ids, dtype="int64")
            out["seq_pos"] = pd.array(seq_poss, dtype="int32")
            out["needs_truncation"] = truncs
            yield out

    return keyed.mapInPandas(gen, schema)


def chunk_documents(df: DataFrame, chunk_tokens: int = 512,
                    overlap: int = 0, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Split documents into fixed-budget token chunks with optional
    overlap (RAG / context-window preparation — the read-side sibling
    of ``pack_sequences``).  One row per chunk: every original column
    except ``text_col``, plus (chunk_id, text, n_tokens); chunk texts
    are the whitespace tokens re-joined single-spaced (the
    tokenization contract every text operator here shares).

    A doc with n tokens yields 1 + ceil(max(0, n-chunk)/stride)
    chunks (stride = chunk - overlap): consecutive chunks share
    exactly ``overlap`` tokens, the last chunk may be short, and an
    empty/whitespace-only/null doc yields no rows.

    Scale shape: pure Catalyst higher-order functions over the split
    array — split/sequence/transform/slice all inside whole-stage
    codegen, no shuffle, no Python; chunk output is produced in the
    same scan that reads the text column.
    """
    if chunk_tokens <= 0:
        raise ValueError("chunk_tokens must be > 0")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("overlap must be in [0, chunk_tokens)")
    stride = chunk_tokens - overlap
    toks = F.filter(F.split(F.col(text_col), " "),
                    lambda w: w != "")
    n = F.size(toks)

    # let-binding via a 1-element transform: the chunk lambda below
    # slices the token array per chunk, and referencing `toks` (the
    # split expression) directly from inside it would make Catalyst
    # re-evaluate the split per chunk — O(len²/stride) per document
    # (r13 scale finding, see quality._grams).  Wrapping the array in
    # F.array and taking it as the outer lambda's ARGUMENT binds it to
    # a lambda variable, so the inner slices read a materialized array.
    def _chunks_of(t):
        tn = F.size(t)
        nchunks = (F.lit(1)
                   + F.ceil((F.greatest(tn - F.lit(chunk_tokens),
                                        F.lit(0)))
                            / F.lit(stride)).cast("int"))
        return F.transform(
            F.sequence(F.lit(0), nchunks - 1),
            lambda i: F.struct(
                i.cast("long").alias("chunk_id"),
                F.array_join(F.slice(t, i * stride + 1,
                                     chunk_tokens), " ").alias("text"),
                F.least(F.lit(chunk_tokens),
                        tn - i * stride).cast("long").alias("n_tokens")))

    chunks = F.get(F.transform(F.array(toks), _chunks_of), 0)
    keep = [c for c in df.columns if c != text_col]
    from . import spread_input
    return (spread_input(df).withColumn("__toks_n", n)
            .filter(F.col("__toks_n") > 0)
            .withColumn("__c", F.explode(chunks))
            .select(*keep, F.col("__c.chunk_id").alias("chunk_id"),
                    F.col("__c.text").alias(text_col),
                    F.col("__c.n_tokens").alias("n_tokens")))
