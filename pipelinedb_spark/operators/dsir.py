"""DSIR-style data selection: hashed n-gram importance resampling
(Xie et al. 2023, "Data Selection for Language Models via Importance
Resampling").

Given a small TARGET corpus (the domain you want more of) and the raw
corpus, estimate bag-of-hashed-ngram unigram+bigram distributions for
both, weight every raw document by its log importance ratio
log p_target(doc) − log p_raw(doc), and resample with Gumbel top-k.
This is the standard principled alternative to rule-based quality
filters when "quality" means "looks like this reference set".

Spark shape at 100 TB:

* Feature space is ``buckets`` hashed slots (default 10k), so BOTH
  distributions are B-sized vectors: the raw-corpus estimate is one
  Arrow scan emitting per-batch partial (bucket, count) rows → a
  partial-aggregable groupBy — never a vocabulary-scale table; the
  collected result is B rows regardless of corpus size.
* The log-ratio vector (B doubles, ~80 KB) ships to executors in the
  scoring kernel's closure; per-doc weights are one more scan — no
  joins at all in the scoring path.
* Resampling is Gumbel top-k: a deterministic per-doc Gumbel key from
  xxhash64(id, seed) and a global TakeOrdered — sampling WITHOUT
  replacement proportional to softmax(logw / temperature), no
  acceptance loop, no driver-side weight table.

Feature hashing uses pd.util.hash_array with ``categorize=False``
(the sketch-surface contract — see the NUL-suffix collision note in
dedup.py) and the same flat-batch vectorized shape as the dedup
kernels.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["hashed_ngram_counts", "dsir_fit", "DSIRModel",
           "dsir_weights", "dsir_sample"]

_MIX = np.uint64(0xFF51AFD7ED558CCD)
_BIGRAM_MULT = np.uint64(0x9E3779B97F4A7C15)


def _batch_doc_buckets(texts, buckets: int):
    """(doc_idx, bucket) for every unigram AND bigram feature of an
    Arrow batch — one flat token-hash pass, one shifted combine for
    bigrams, murmur-style finalize, mod B.  Duplicate features are
    KEPT (bag counts, not sets)."""
    tok_lists = [t.split(" ") if isinstance(t, str) else []
                 for t in texts]
    tok_lists = [[w for w in ts if w] for ts in tok_lists]
    lens = np.fromiter((len(ts) for ts in tok_lists), dtype=np.int64,
                       count=len(tok_lists))
    offs = np.zeros(len(tok_lists) + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    total = int(offs[-1])
    if total == 0:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    flat = np.empty(total, dtype=object)
    pos = 0
    for ts in tok_lists:
        flat[pos:pos + len(ts)] = ts
        pos += len(ts)
    th = pd.util.hash_array(flat, categorize=False).astype(np.uint64)
    tok_doc = np.repeat(np.arange(len(tok_lists), dtype=np.int64),
                        lens)
    # unigrams
    u = th * _MIX
    u ^= u >> np.uint64(33)
    # bigrams: adjacent pairs within one doc
    n = total
    m = n - 1
    if m > 0:
        b = th[:m] * _BIGRAM_MULT + th[1:] * _MIX
        b ^= b >> np.uint64(29)
        valid = tok_doc[:m] == tok_doc[1:]
        b = b[valid]
        bdoc = tok_doc[:m][valid]
    else:
        b = np.empty(0, dtype=np.uint64)
        bdoc = np.empty(0, dtype=np.int64)
    gdoc = np.concatenate([tok_doc, bdoc])
    gb = (np.concatenate([u, b]) % np.uint64(buckets)).astype(np.int64)
    return gdoc, gb


def hashed_ngram_counts(df: DataFrame, text_col: str = "text",
                        buckets: int = 10_000) -> DataFrame:
    """Corpus-wide hashed unigram+bigram bucket counts: (bucket, n).
    Per-batch partial bincount → groupBy sum, so shuffle volume is
    ≤ B rows per task and the result is B rows at any corpus size."""
    from . import spread_input
    src = spread_input(df.select(F.col(text_col).alias("text")))

    def gen(batches):
        for pdf in batches:
            _, gb = _batch_doc_buckets(pdf["text"], buckets)
            if len(gb):
                c = np.bincount(gb, minlength=0)
                nz = np.nonzero(c)[0]
                yield pd.DataFrame({"bucket": nz, "n": c[nz]})

    part = src.mapInPandas(gen, T.StructType([
        T.StructField("bucket", T.LongType()),
        T.StructField("n", T.LongType())]))
    return part.groupBy("bucket").agg(F.sum("n").alias("n"))


def _bucket_logprobs(counts: DataFrame, buckets: int,
                     alpha: float) -> np.ndarray:
    """Collect the (≤ B)-row count table and return the add-alpha
    smoothed log-probability vector."""
    vec = np.zeros(buckets, dtype=np.float64)
    for r in counts.collect():
        vec[int(r["bucket"])] = float(r["n"])
    vec += alpha
    return np.log(vec) - np.log(vec.sum())


class DSIRModel:
    """Frozen log-ratio vector (log p_target − log p_raw per bucket)
    with save/load — fit once on the corpus+target, then score every
    arriving ingest batch without recomputing either distribution
    (the continuous-ingest shape: the dsir analog of a persisted
    LSH/span/IVF index)."""

    def __init__(self, ratio: np.ndarray):
        self.ratio = np.asarray(ratio, dtype=np.float64)
        self.buckets = len(self.ratio)

    def save(self, path: str) -> None:
        tmp = path + ".tmp.npy"   # suffix stops np.save renaming it
        np.save(tmp, self.ratio)
        os.replace(tmp, path)

    @classmethod
    def load(cls, path: str) -> "DSIRModel":
        with open(path, "rb") as f:
            return cls(np.load(f))


def dsir_fit(corpus: DataFrame, target: DataFrame,
             text_col: str = "text", buckets: int = 10_000,
             alpha: float = 1.0) -> DSIRModel:
    """Estimate both hashed-ngram distributions (each a B-row
    aggregate at any corpus size) and freeze the log ratio."""
    pt = _bucket_logprobs(hashed_ngram_counts(target, text_col, buckets),
                          buckets, alpha)
    pr = _bucket_logprobs(hashed_ngram_counts(corpus, text_col, buckets),
                          buckets, alpha)
    return DSIRModel(pt - pr)


def dsir_weights(corpus: DataFrame, target: DataFrame | None = None,
                 text_col: str = "text", buckets: int = 10_000,
                 alpha: float = 1.0, out_col: str = "dsir_logw",
                 model: DSIRModel | None = None) -> DataFrame:
    """Append log importance weights log p_target − log p_raw under
    hashed-ngram bag models.  Either pass ``target`` (the small
    reference corpus; the raw distribution is estimated from
    ``corpus`` itself) or a pre-fit ``model`` — the frozen-ratio path
    for scoring ingest batches against a fixed raw/target estimate.
    Add-``alpha`` smoothing keeps unseen buckets finite."""
    if model is None:
        if target is None:
            raise ValueError("pass either target or model")
        model = dsir_fit(corpus, target, text_col, buckets, alpha)
    ratio = model.ratio
    buckets = model.buckets

    @F.pandas_udf(T.DoubleType())
    def logw(texts: pd.Series) -> pd.Series:
        gdoc, gb = _batch_doc_buckets(texts, buckets)
        out = np.zeros(len(texts), dtype=np.float64)
        if len(gb):
            np.add.at(out, gdoc, ratio[gb])
        return pd.Series(out)

    from . import spread_input
    return spread_input(corpus).withColumn(out_col,
                                           logw(F.col(text_col)))


def dsir_sample(corpus: DataFrame, target: DataFrame | None, n: int,
                id_col: str = "doc_id", text_col: str = "text",
                buckets: int = 10_000, alpha: float = 1.0,
                temperature: float = 1.0, seed: int = 7,
                model: DSIRModel | None = None,
                exact_merge_max: int = 65_536) -> DataFrame:
    """Select ``n`` documents ~ softmax(dsir_logw / temperature)
    without replacement via the Gumbel top-k trick: key = logw/T + G_i
    with G_i = −ln(−ln u_i) and u_i a deterministic uniform from
    xxhash64(id, seed).  Repeatable under a fixed seed; temperature→0
    approaches arg-top-n by weight; large T approaches uniform.

    Selection is DISTRIBUTED for large n (the round-7 scale fix: a
    global ``orderBy().limit(n)`` always compiles to
    TakeOrderedAndProject, whose final merge funnels all n selected
    rows — DSIR's production n is the training-set size — through one
    node).  For ``n > exact_merge_max`` the n-th Gumbel key is
    located instead: approxQuantile gives a threshold within a known
    rank error, one distributed filter count measures it, and the
    exact boundary key is resolved from a bounded, COLUMN-PRUNED
    TakeOrdered over ~n/256 8-byte keys (never full rows) that
    reduces to a single scalar.  The returned plan is a plain filter
    over the scored corpus — every selected row stays on its
    executor.  Gumbel keys are hash-derived doubles, so ties are
    ~impossible and the result matches the small-n path exactly.
    Threshold probing rescans the scoring kernel a few times; the
    model is fit ONCE either way (dsir_fit collects B-row tables up
    front), so each rescan is one cheap Arrow pass."""
    if temperature <= 0:
        raise ValueError("temperature must be > 0")
    w = dsir_weights(corpus, target, text_col, buckets, alpha,
                     model=model)
    # xxhash64 → int64; map to (0,1) open interval
    u = (F.xxhash64(F.col(id_col), F.lit(seed)).cast("double")
         / F.lit(float(2 ** 64)) + F.lit(0.5))
    u = F.least(F.greatest(u, F.lit(1e-12)), F.lit(1.0 - 1e-12))
    gumbel = -F.log(-F.log(u))
    key = F.col("dsir_logw") / F.lit(float(temperature)) + gumbel
    keyed = w.withColumn("__gk", key)
    if n <= exact_merge_max:
        # small n: the single-node merge is exactly n rows — fine
        return keyed.orderBy(F.desc("__gk")).limit(n).drop("__gk")

    total = keyed.count()
    if n >= total:
        return keyed.drop("__gk")
    frac = n / total
    # rank error ≤ eps·total ≈ n/512 on either side of the cut; the
    # GK sketch costs O(1/eps) driver memory, floored at 1e-6 (~10⁶
    # sketch entries) so a tiny selection fraction over a huge corpus
    # can't blow the driver — the boundary trim then handles up to
    # ~2e-6·total 8-byte keys, still column-pruned and bounded
    eps = max(frac / 512, 1e-6)
    t = keyed.stat.approxQuantile("__gk", [1.0 - frac], eps)[0]
    k_above = keyed.filter(F.col("__gk") > t).count()
    if k_above >= n:
        drop = k_above - n
        if drop == 0:
            t_star, inclusive = t, False
        else:
            # exact key of the drop-th smallest ABOVE t: a bounded
            # TakeOrdered over ≤ ~2·eps·total pruned key values,
            # reduced to one scalar before it reaches the driver
            t_star = (keyed.filter(F.col("__gk") > t).select("__gk")
                      .orderBy(F.asc("__gk")).limit(drop)
                      .agg(F.max("__gk")).first()[0])
            inclusive = False
    else:
        need = n - k_above
        t_star = (keyed.filter(F.col("__gk") <= t).select("__gk")
                  .orderBy(F.desc("__gk")).limit(need)
                  .agg(F.min("__gk")).first()[0])
        inclusive = True
    cond = (F.col("__gk") >= t_star) if inclusive \
        else (F.col("__gk") > t_star)
    return keyed.filter(cond).drop("__gk")
