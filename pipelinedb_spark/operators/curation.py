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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _gram_hashes(text: Column, n: int) -> Column:
    """xxhash64 of each n-token shingle (token-concat with a separator
    that cannot appear inside whitespace tokens)."""
    ws = F.split(text, " ")
    m = F.size(ws) - (n - 1)
    # sequence(0, -1) yields a DESCENDING [0, -1] in Spark, not an
    # empty array: a doc shorter than n tokens would otherwise emit
    # two partial grams (harmless for contamination joins — a
    # partial gram can't equal any real n-gram — but wrong in
    # principle and it skews gram counts).
    idx = F.when(m > 0, F.sequence(F.lit(0), m - 1)) \
        .otherwise(F.array().cast("array<int>"))
    return F.transform(
        idx, lambda i: F.xxhash64(F.concat_ws(
            "\x1f", *[F.get(ws, i + k) for k in range(n)])))


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
    single scan with no self-shuffle."""
    eval_grams = (eval_set
                  .select(F.col(eval_id_col),
                          F.explode(F.array_distinct(
                              _gram_hashes(F.col(text_col), ngram)))
                          .alias("__g"))
                  .distinct())
    doc_grams = corpus.select(
        F.col(id_col),
        F.explode(F.array_distinct(_gram_hashes(F.col(text_col), ngram)))
        .alias("__g"))
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
