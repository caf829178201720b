"""DSIR importance resampling: count parity between the distributed
pass and a driver-side reference, exact weight math vs numpy, domain
up-weighting behavior, deterministic Gumbel sampling."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pipelinedb_spark.operators.dsir import (_batch_doc_buckets,
                                             dsir_sample, dsir_weights,
                                             hashed_ngram_counts)

B = 512


def _ref_counts(texts, buckets=B):
    _, gb = _batch_doc_buckets(list(texts), buckets)
    return np.bincount(gb, minlength=buckets)


def _ref_logprobs(texts, buckets=B, alpha=1.0):
    v = _ref_counts(texts, buckets).astype(np.float64) + alpha
    return np.log(v) - np.log(v.sum())


SPORTS = ["the team won the match", "score goal match replay team",
          "coach bench the squad won", "match score the final goal"]
CODE = ["def foo return int x", "class bar import numpy module",
        "lambda args return dict x", "import module def class foo"]


def test_distributed_counts_match_reference(spark):
    df = spark.createDataFrame([(t,) for t in SPORTS + CODE],
                               "text string")
    got = {r["bucket"]: r["n"]
           for r in hashed_ngram_counts(df, buckets=B).collect()}
    want = _ref_counts(SPORTS + CODE)
    assert got == {int(b): int(want[b]) for b in np.nonzero(want)[0]}
    assert sum(got.values()) == int(want.sum())


def test_weights_match_numpy_reference(spark):
    corpus_texts = SPORTS + CODE
    corpus = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus_texts)],
        "doc_id long, text string")
    target = spark.createDataFrame([(t,) for t in SPORTS], "text string")
    res = {r["doc_id"]: r["dsir_logw"] for r in
           dsir_weights(corpus, target, buckets=B).collect()}
    pt = _ref_logprobs(SPORTS)
    pr = _ref_logprobs(corpus_texts)
    ratio = pt - pr
    for i, t in enumerate(corpus_texts):
        gdoc, gb = _batch_doc_buckets([t], B)
        want = float(ratio[gb].sum())
        assert abs(res[i] - want) < 1e-9, (i, res[i], want)


def test_target_domain_upweighted_and_sampled(spark):
    corpus = spark.createDataFrame(
        [(i, t) for i, t in enumerate(SPORTS + CODE)],
        "doc_id long, text string")
    target = spark.createDataFrame([(t,) for t in SPORTS], "text string")
    w = {r["doc_id"]: r["dsir_logw"] for r in
         dsir_weights(corpus, target, buckets=B).collect()}
    sports_ids = set(range(len(SPORTS)))
    assert min(w[i] for i in sports_ids) > \
        max(w[i] for i in w if i not in sports_ids)
    # near-greedy sampling picks the sports docs
    got = {r["doc_id"] for r in
           dsir_sample(corpus, target, n=4, buckets=B,
                       temperature=1e-6).collect()}
    assert got == sports_ids


def test_sample_deterministic_and_validated(spark):
    corpus = spark.createDataFrame(
        [(i, t) for i, t in enumerate(SPORTS + CODE)],
        "doc_id long, text string")
    target = spark.createDataFrame([(t,) for t in SPORTS], "text string")
    a = {r["doc_id"] for r in
         dsir_sample(corpus, target, n=3, buckets=B, seed=1).collect()}
    b = {r["doc_id"] for r in
         dsir_sample(corpus, target, n=3, buckets=B, seed=1).collect()}
    assert a == b and len(a) == 3
    with pytest.raises(ValueError):
        dsir_sample(corpus, target, n=3, temperature=0.0)


def test_empty_and_null_text_weight_zero_features(spark):
    corpus = spark.createDataFrame([(0, ""), (1, None), (2, "w w w")],
                                   "doc_id long, text string")
    target = spark.createDataFrame([("w w",)], "text string")
    res = {r["doc_id"]: r["dsir_logw"] for r in
           dsir_weights(corpus, target, buckets=B).collect()}
    assert res[0] == 0.0 and res[1] == 0.0
    assert res[2] != 0.0


def test_dsir_model_fit_save_load_batch_scoring(spark, tmp_path):
    """Frozen-model path: fit once, save/load, score a NEW batch
    without recomputing distributions — weights must match the
    fit-time ratio applied to the batch's features."""
    import numpy as np

    from pipelinedb_spark.operators.dsir import DSIRModel, dsir_fit

    corpus = spark.createDataFrame(
        [(i, t) for i, t in enumerate(SPORTS + CODE)],
        "doc_id long, text string")
    target = spark.createDataFrame([(t,) for t in SPORTS], "text string")
    m = dsir_fit(corpus, target, buckets=B)
    p = str(tmp_path / "dsir_ratio.npy")
    m.save(p)
    m2 = DSIRModel.load(p)
    assert np.array_equal(m.ratio, m2.ratio) and m2.buckets == B

    batch = spark.createDataFrame(
        [(100, "match score goal team"), (101, "import def class")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["dsir_logw"] for r in
           dsir_weights(batch, model=m2).collect()}
    for did, txt in [(100, "match score goal team"),
                     (101, "import def class")]:
        gdoc, gb = _batch_doc_buckets([txt], B)
        assert abs(got[did] - float(m.ratio[gb].sum())) < 1e-9
    assert got[100] > 0 > got[101]   # sports batch doc up, code down

    # model-driven sampling needs no target frame
    from pipelinedb_spark.operators.dsir import dsir_sample
    picked = dsir_sample(corpus, None, n=4, buckets=B,
                         temperature=1e-6, model=m2).collect()
    assert {r["doc_id"] for r in picked} == set(range(len(SPORTS)))


def test_large_n_sample_distributed_and_equivalent(spark):
    """Round-8 task 3 (the r7 weak item): for n above the
    exact-merge cutoff, dsir_sample must (a) return EXACTLY the same
    document set as the TakeOrdered small-n path, and (b) compile to
    a distributed filter — no TakeOrderedAndProject / global sort /
    single-partition exchange anywhere in the returned plan."""
    rng = np.random.RandomState(11)
    words = ["team", "goal", "match", "import", "def", "class",
             "score", "module", "coach", "lambda"]
    rows = [(i, " ".join(rng.choice(words, 6)))
            for i in range(3000)]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    target = spark.createDataFrame([(t,) for t in SPORTS], "text string")

    n = 500
    small = dsir_sample(corpus, target, n=n, buckets=B, seed=3,
                        exact_merge_max=1 << 30)
    large = dsir_sample(corpus, target, n=n, buckets=B, seed=3,
                        exact_merge_max=0)
    small_ids = {r["doc_id"] for r in small.collect()}
    large_ids = {r["doc_id"] for r in large.collect()}
    assert len(large_ids) == n
    assert large_ids == small_ids

    plan = large._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" not in plan
    assert "Sort [" not in plan
    assert "SinglePartition" not in plan

    # n >= corpus returns everything, still as a plain scan
    allof = dsir_sample(corpus, target, n=5000, buckets=B, seed=3,
                        exact_merge_max=0)
    assert allof.count() == 3000
