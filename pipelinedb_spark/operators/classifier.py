"""Trainable linear text classifier over hashed n-gram features —
the fasttext-style quality filter real curation pipelines train
(positive = reference corpus, negative = random crawl) and apply at
corpus scale (CCNet / LLaMA / RedPajama recipe).

Dependency-free and Spark-shaped:

* **Features** are the SAME hashed unigram+bigram buckets dsir.py
  uses (B slots, default 4096), transformed log(1+count) and
  L2-normalized per doc — the standard tf-ish fasttext input.
* **Training is driver-side numpy** over a BOUNDED deterministic
  sample (the ivf_train contract: hash-ordered TakeOrdered per
  class), full-batch logistic regression with L2 — the model scales
  with B, never the corpus; a few thousand docs × 4k buckets is a
  ~100 MB dense problem that converges in milliseconds.
* **Scoring is one Arrow scan** with the (B+1)-float weight vector in
  the kernel closure — no joins, no shuffle, same shape as
  dsir_weights.

vs DSIR: DSIR is generative (importance ratio of two bag models) and
needs no labels beyond the target set; the classifier is
discriminative — it can use curated negatives and typically separates
"quality" better when good negative examples exist.  Pipelines run
either or both; the package now ships both on one feature space.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .dsir import _batch_doc_buckets

__all__ = ["train_text_classifier", "LinearTextClassifier"]


def _doc_feature_matrix(texts, buckets: int) -> np.ndarray:
    """(n_docs, buckets) dense log(1+count), L2-normalized rows."""
    gdoc, gb = _batch_doc_buckets(list(texts), buckets)
    x = np.zeros((len(texts), buckets), dtype=np.float64)
    if len(gb):
        np.add.at(x, (gdoc, gb), 1.0)
    x = np.log1p(x)
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    return x / np.maximum(norms, 1e-12)


def _sample_texts(df: DataFrame, text_col: str, sample: int,
                  seed: int) -> list:
    """Deterministic hash-ordered sample of DISTINCT texts: corpora
    arrive dup-heavy (dedup usually runs after quality gating), and
    without the distinct a document duplicated k times would occupy
    up to k of the ``sample`` slots — the classifier would train on
    far fewer distinct examples than requested (round-8 task 6).
    Distinct-then-hash-order stays one shuffle: the groupBy and the
    TakeOrdered both key on the text."""
    rows = (df.select(F.col(text_col).alias("t"))
            .distinct()
            .orderBy(F.xxhash64(F.col("t"), F.lit(seed)))
            .limit(sample).collect())
    return [r["t"] or "" for r in rows]


class LinearTextClassifier:
    """Logistic regression over hashed n-gram features: w (B floats)
    + bias; ships to executors in the scoring kernel closure."""

    def __init__(self, weights: np.ndarray, bias: float):
        self.weights = np.asarray(weights, dtype=np.float64)
        self.bias = float(bias)
        self.buckets = len(self.weights)

    # -- driver-side (tests / small jobs) -----------------------------

    def predict_proba(self, texts) -> np.ndarray:
        x = _doc_feature_matrix(texts, self.buckets)
        z = x @ self.weights + self.bias
        return 1.0 / (1.0 + np.exp(-z))

    # -- Spark scoring -------------------------------------------------

    def scores(self, df: DataFrame, text_col: str = "text",
               out_col: str = "clf_score") -> DataFrame:
        """Append P(positive | doc) — one Arrow scan, no joins.

        The kernel is SPARSE: it never builds the (batch × buckets)
        dense matrix the trainer uses (10k rows × 4k buckets would be
        ~330 MB of float64 per in-flight Arrow batch — an executor
        OOM at exactly the corpus scale this path exists for).  The
        per-doc dot product and L2 norm accumulate from the (doc,
        bucket, count) triples directly, O(features in batch)."""
        w = self.weights.copy()
        b = self.bias
        buckets = self.buckets

        from . import spread_input
        df = spread_input(df)

        @F.pandas_udf(T.DoubleType())
        def score(texts: pd.Series) -> pd.Series:
            n = len(texts)
            gdoc, gb = _batch_doc_buckets(list(texts), buckets)
            z = np.zeros(n)
            if len(gb):
                keys = gdoc * buckets + gb
                uk, cnt = np.unique(keys, return_counts=True)
                docs = uk // buckets
                f = np.log1p(cnt)             # log(1+count) feature
                z_num = np.zeros(n)
                np.add.at(z_num, docs, f * w[uk % buckets])
                n2 = np.zeros(n)
                np.add.at(n2, docs, f * f)    # row L2 norm²
                z = z_num / np.maximum(np.sqrt(n2), 1e-12)
            return pd.Series(1.0 / (1.0 + np.exp(-(z + b))))

        return df.withColumn(out_col, score(F.col(text_col)))

    def filter(self, df: DataFrame, threshold: float = 0.5,
               text_col: str = "text") -> DataFrame:
        """Keep docs scored ≥ threshold (score column dropped)."""
        return (self.scores(df, text_col, "__clf")
                .filter(F.col("__clf") >= threshold).drop("__clf"))

    # -- persistence ----------------------------------------------------

    def save(self, path: str) -> None:
        tmp = path + ".tmp.npz"
        np.savez(tmp, weights=self.weights, bias=np.array([self.bias]))
        os.replace(tmp, path)

    @classmethod
    def load(cls, path: str) -> "LinearTextClassifier":
        z = np.load(path)
        return cls(z["weights"], float(z["bias"][0]))


def train_text_classifier(positive: DataFrame, negative: DataFrame,
                          text_col: str = "text", buckets: int = 4096,
                          sample: int = 2000, iters: int = 300,
                          lr: float = 2.0, l2: float = 1e-4,
                          seed: int = 7) -> LinearTextClassifier:
    """Fit the classifier on bounded per-class samples (deterministic
    hash order, ≤ ``sample`` docs each).  Full-batch gradient descent
    on L2-regularized logistic loss; deterministic — same inputs,
    same model.  Returns the fitted LinearTextClassifier."""
    pos = _sample_texts(positive, text_col, sample, seed)
    neg = _sample_texts(negative, text_col, sample, seed + 1)
    if not pos or not neg:
        raise ValueError("both classes need at least one document")
    x = np.vstack([_doc_feature_matrix(pos, buckets),
                   _doc_feature_matrix(neg, buckets)])
    y = np.concatenate([np.ones(len(pos)), np.zeros(len(neg))])
    n = len(y)
    # class weighting keeps an imbalanced sample from collapsing to
    # the majority class
    cw = np.where(y == 1, n / (2.0 * len(pos)), n / (2.0 * len(neg)))
    w = np.zeros(buckets)
    b = 0.0
    for _ in range(iters):
        z = x @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = cw * (p - y)
        gw = x.T @ g / n + l2 * w
        gb = float(g.mean())
        w -= lr * gw
        b -= lr * gb
    return LinearTextClassifier(w, b)
