"""N-gram language-model quality scoring (the CCNet-style filter): a
bigram LM with add-alpha smoothing trained on a reference corpus, and
per-document mean log-probability scores — low-probability documents
are gibberish/boilerplate candidates, high-probability ones are
fluent text.

Scale shape (100 TB corpus):

* training is two aggregations keyed by token strings — the bigram
  table scales with corpus VOCABULARY (bounded), not corpus size, and
  both shuffles ride 8-to-40-byte keys;
* scoring explodes each doc's bigram positions (corpus-scaled) and
  joins the count tables — both joins are pinned ``shuffle_hash``
  because the count tables scale with vocabulary (a broadcast is only
  right for small/pruned vocabularies: pass ``min_count`` to prune);
* everything is Column expressions over strings, so the duckdb oracle
  reproduces scores exactly (same smoothing arithmetic, same ln).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _words(text: Column) -> Column:
    return F.filter(F.split(text, " "), lambda w: w != "")


def _bigram_pairs(text: Column) -> Column:
    """array<struct<w1,w2>> of adjacent token pairs."""
    # the r13 linear-time shifted-slice zip, shared (functions/
    # ngrams.py) — the index transform with `F.get(ws, i)` in the
    # lambda re-evaluated the split per element, O(len²) per document
    from pipelinedb_spark.functions.ngrams import shifted_pairs
    return shifted_pairs(_words(text))


def train_bigram_lm(corpus: DataFrame, text_col: str = "text",
                    min_count: int = 1) -> dict:
    """Count tables for a bigram LM: returns
    {"bigrams": DF(w1,w2,n12), "unigrams": DF(w1,n1),
    "vocab_size": int}.  ``min_count`` prunes rare bigrams (counts
    below it) — smoothing handles the pruned mass; unigrams are never
    pruned (they are the smoothing denominator)."""
    pairs = corpus.select(
        F.explode(_bigram_pairs(F.col(text_col))).alias("p"))
    bigrams = (pairs.groupBy(F.col("p.w1").alias("w1"),
                             F.col("p.w2").alias("w2"))
               .agg(F.count("*").alias("n12")))
    if min_count > 1:
        bigrams = bigrams.filter(F.col("n12") >= min_count)
    unigrams = (corpus.select(F.explode(_words(F.col(text_col)))
                              .alias("w1"))
                .groupBy("w1").agg(F.count("*").alias("n1")))
    vocab_size = unigrams.count()
    return {"bigrams": bigrams, "unigrams": unigrams,
            "vocab_size": vocab_size}


def lm_logprob_scores(df: DataFrame, lm: dict, text_col: str = "text",
                      id_col: str = "doc_id",
                      alpha: float = 0.4) -> DataFrame:
    """Per-document mean bigram log-probability under the LM:
    mean over positions of ln((n12 + α) / (n1 + α·V)).

    Unseen bigrams/unigrams contribute the smoothed floor.  Docs with
    fewer than 2 tokens score NULL (no bigram evidence).  Both count
    joins are pinned shuffle_hash — the tables scale with vocabulary,
    so the small-corpus broadcast pick would be wrong at scale."""
    v = float(lm["vocab_size"])
    pairs = df.select(
        F.col(id_col),
        F.explode(_bigram_pairs(F.col(text_col))).alias("p"))
    pairs = pairs.select(id_col, F.col("p.w1").alias("w1"),
                         F.col("p.w2").alias("w2"))
    joined = (pairs
              .join(lm["bigrams"].hint("shuffle_hash"),
                    ["w1", "w2"], "left")
              .join(lm["unigrams"].hint("shuffle_hash"), ["w1"], "left"))
    lp = F.log((F.coalesce(F.col("n12"), F.lit(0)) + F.lit(alpha)) /
               (F.coalesce(F.col("n1"), F.lit(0)) + F.lit(alpha * v)))
    scored = joined.groupBy(id_col).agg(
        F.avg(lp).alias("lm_logprob"),
        F.count("*").alias("n_bigrams"))
    return (df.select(id_col)
            .join(scored, id_col, "left")
            .select(id_col, "lm_logprob",
                    F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams")))


def lm_filter(df: DataFrame, lm: dict, min_logprob: float,
              text_col: str = "text", id_col: str = "doc_id",
              alpha: float = 0.4) -> DataFrame:
    """Keep documents whose mean bigram log-probability is at least
    ``min_logprob`` (docs without bigram evidence are dropped) — the
    fluency gate of a CCNet-style pipeline."""
    scores = lm_logprob_scores(df, lm, text_col, id_col, alpha)
    keep = scores.filter(F.col("lm_logprob") >= min_logprob) \
        .select(id_col)
    return df.join(keep, id_col, "left_semi")
