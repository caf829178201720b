"""Fasttext-style linear classifier: separability, gradient sanity vs
a numeric check, Spark-vs-driver score parity, save/load, filter."""

import numpy as np
import pytest

from pipelinedb_spark.operators.classifier import (LinearTextClassifier,
                                                   train_text_classifier)

B = 512

SPORTS = ["the team won the match today", "score a goal in the match",
          "coach benched the squad after the match",
          "the final score was a late goal",
          "team and coach celebrate the win",
          "a replay of the match winning goal"]
CODE = ["def foo returns an int value", "import numpy as a module",
        "the class defines a lambda helper",
        "dict and list comprehension syntax",
        "refactor the module import graph",
        "unit test the helper function"]


def _frames(spark):
    pos = spark.createDataFrame([(t,) for t in SPORTS], "text string")
    neg = spark.createDataFrame([(t,) for t in CODE], "text string")
    return pos, neg


def test_train_separates_domains_and_is_deterministic(spark):
    pos, neg = _frames(spark)
    m1 = train_text_classifier(pos, neg, buckets=B)
    m2 = train_text_classifier(pos, neg, buckets=B)
    assert np.array_equal(m1.weights, m2.weights) and m1.bias == m2.bias
    p_pos = m1.predict_proba(SPORTS)
    p_neg = m1.predict_proba(CODE)
    assert p_pos.min() > 0.8 and p_neg.max() < 0.2
    # held-out-ish probes
    assert m1.predict_proba(["goal score replay team"])[0] > 0.5
    assert m1.predict_proba(["import def class lambda"])[0] < 0.5


def test_spark_scores_match_driver_and_filter(spark):
    pos, neg = _frames(spark)
    m = train_text_classifier(pos, neg, buckets=B)
    allwords = SPORTS + CODE
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(allwords)],
        "doc_id long, text string")
    got = {r["doc_id"]: r["clf_score"] for r in
           m.scores(df).collect()}
    want = m.predict_proba(allwords)
    for i in range(len(allwords)):
        assert got[i] == pytest.approx(want[i], abs=1e-12)
    kept = {r["doc_id"] for r in m.filter(df, 0.5).collect()}
    assert kept == set(range(len(SPORTS)))


def test_gradient_direction_numeric_check():
    """One GD step must reduce the (regularized, class-weighted)
    loss — checked against a numeric evaluation of the same loss."""
    from pipelinedb_spark.operators.classifier import _doc_feature_matrix

    x = np.vstack([_doc_feature_matrix(SPORTS, B),
                   _doc_feature_matrix(CODE, B)])
    y = np.concatenate([np.ones(len(SPORTS)), np.zeros(len(CODE))])
    l2 = 1e-4

    def loss(w, b):
        z = x @ w + b
        ll = np.logaddexp(0, z) - y * z
        return ll.mean() + 0.5 * l2 * (w @ w)

    w = np.zeros(B)
    b = 0.0
    before = loss(w, b)
    p = 1.0 / (1.0 + np.exp(-(x @ w + b)))
    g = p - y
    w2 = w - 0.5 * (x.T @ g / len(y) + l2 * w)
    b2 = b - 0.5 * g.mean()
    assert loss(w2, b2) < before


def test_save_load_roundtrip(spark, tmp_path):
    pos, neg = _frames(spark)
    m = train_text_classifier(pos, neg, buckets=B)
    p = str(tmp_path / "clf.npz")
    m.save(p)
    m2 = LinearTextClassifier.load(p)
    assert np.array_equal(m.weights, m2.weights) and m.bias == m2.bias


def test_empty_class_rejected(spark):
    pos, _ = _frames(spark)
    empty = spark.createDataFrame([], "text string")
    with pytest.raises(ValueError):
        train_text_classifier(pos, empty, buckets=B)


def test_dup_heavy_corpus_samples_distinct_docs(spark):
    """Round-8 task 6: a 90%-duplicate corpus must not waste the
    bounded sample slots on copies — _sample_texts takes DISTINCT
    texts, so the trainer sees ~`sample` distinct examples and
    separation quality holds."""
    from pipelinedb_spark.operators.classifier import _sample_texts

    rng = np.random.RandomState(4)
    sports_w = ["team", "goal", "match", "score", "coach", "replay"]
    code_w = ["def", "import", "class", "lambda", "dict", "module"]
    distinct_pos = [" ".join(rng.choice(sports_w, 5)) + f" s{i}"
                    for i in range(300)]
    distinct_neg = [" ".join(rng.choice(code_w, 5)) + f" c{i}"
                    for i in range(300)]
    # each distinct doc duplicated 10x -> 90% duplicates
    pos = spark.createDataFrame([(t,) for t in distinct_pos * 10],
                                "text string")
    neg = spark.createDataFrame([(t,) for t in distinct_neg * 10],
                                "text string")

    got = _sample_texts(pos, "text", 200, seed=7)
    assert len(got) == 200
    assert len(set(got)) == 200          # every slot a distinct doc
    assert set(got) <= set(distinct_pos)
    # determinism under the same seed
    assert got == _sample_texts(pos, "text", 200, seed=7)

    clf = train_text_classifier(pos, neg, buckets=B, sample=200,
                                iters=150, seed=0)
    p_pos = clf.predict_proba(distinct_pos[::10])
    p_neg = clf.predict_proba(distinct_neg[::10])
    assert p_pos.mean() > 0.9 and p_neg.mean() < 0.1
