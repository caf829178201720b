"""IVF-PQ: codec roundtrip quality, determinism, recall vs brute
force on the real embeddings table, index-reuse equivalence."""

import numpy as np
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    from pipelinedb_spark.querybank import t
    return t(spark, SF, "embeddings").cache()


def _clustered(n=400, dim=32, k=10, seed=3):
    rng = np.random.RandomState(seed)
    cent = rng.randn(k, dim)
    v = cent[rng.randint(0, k, n)] + 0.1 * rng.randn(n, dim)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


# ------------------------------------------------------- codec units

def test_codec_roundtrip_beats_coarse_only():
    from pipelinedb_spark.operators.pq import PQCodec, _kmeans
    from pipelinedb_spark.operators.similarity import _spherical_kmeans

    v = _clustered()
    cent = _spherical_kmeans(v, 8)
    assign = (v @ cent.T).argmax(axis=1)
    resid = v - cent[assign]
    books = np.stack([
        _kmeans(resid[:, s * 8:(s + 1) * 8], 64, iters=10, seed=s)
        for s in range(4)])
    codec = PQCodec(cent, books)
    lists, codes = codec.encode_block(v)
    assert codes.shape == (len(v), 4) and codes.dtype == np.uint8
    rec = codec.decode_block(lists, codes)
    pq_err = np.linalg.norm(rec - v, axis=1).mean()
    coarse_err = np.linalg.norm(cent[lists] - v, axis=1).mean()
    assert pq_err < coarse_err * 0.8      # residual codes add precision
    # determinism
    lists2, codes2 = codec.encode_block(v)
    assert (lists == lists2).all() and (codes == codes2).all()


def test_codec_validates_shapes():
    from pipelinedb_spark.operators.pq import PQCodec
    with pytest.raises(ValueError):
        PQCodec(np.zeros((4, 30)), np.zeros((4, 16, 8)))  # 4·8 != 30


def test_pq_train_validations(emb):
    from pipelinedb_spark.operators.pq import pq_train
    with pytest.raises(ValueError):
        pq_train(emb, m=7)               # 7 does not divide 64
    with pytest.raises(ValueError):
        pq_train(emb, ksub=300)          # > one byte


# ------------------------------------------------------- spark paths

def test_pq_encode_schema_and_size(emb):
    from pipelinedb_spark.operators.pq import pq_encode, pq_train
    codec = pq_train(emb, n_lists=8, m=8, ksub=32, sample=512)
    codes = pq_encode(emb, codec)
    rows = codes.collect()
    assert len(rows) == emb.count()
    assert all(len(r["codes"]) == 8 for r in rows)          # m bytes
    assert all(0 <= r["list_id"] < 8 for r in rows)


def test_ivfpq_recall_with_rerank(spark):
    """Top-k recall vs exact brute force on CLUSTERABLE data (the
    contract IVF makes: near neighbors share coarse lists — on
    uniform vectors recall is nprobe/n_lists by construction, for
    IVF-Flat and IVF-PQ alike): ADC shortlist + exact rerank recovers
    the true neighbors while scanning ~nprobe/n_lists of the corpus
    at 1/32 the bytes."""
    from pipelinedb_spark.operators.pq import ivfpq_topk
    from pipelinedb_spark.operators.similarity import brute_force_topk

    v = _clustered(n=400, dim=32, k=8, seed=5)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(v)],
        "vec_id long, embedding array<double>")
    q = emb.filter(F.col("vec_id") < 20)
    bf = {}
    for r in brute_force_topk(emb, q, k=5, exact=False).collect():
        bf.setdefault(r["q_id"], set()).add(r["n_id"])
    pq = {}
    res = ivfpq_topk(emb, q, k=5, n_lists=8, m=8, ksub=64,
                     nprobe=3, rerank=50, sample=512).collect()
    for r in res:
        pq.setdefault(r["q_id"], set()).add(r["n_id"])
    recall = (sum(len(bf[i] & pq.get(i, set())) for i in bf)
              / sum(len(s) for s in bf.values()))
    assert recall >= 0.9, recall
    # reranked cosines are exact: spot-check one against numpy
    r0 = res[0]
    a, b = v[r0["q_id"]], v[r0["n_id"]]
    want = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert abs(r0["cosine"] - want) < 1e-9


def test_ivfpq_full_probe_rerank_equals_brute_force(emb):
    """nprobe = n_lists + rerank ≥ corpus: the shortlist contains
    every candidate, so exact rerank must equal brute force."""
    from pipelinedb_spark.operators.pq import ivfpq_topk
    from pipelinedb_spark.operators.similarity import brute_force_topk

    q = emb.filter(F.col("vec_id") < 5)
    n = emb.count()
    bf = {(r["q_id"], r["n_id"], r["rk"]) for r in
          brute_force_topk(emb, q, k=5, exact=False).collect()}
    pq = {(r["q_id"], r["n_id"], r["rk"]) for r in
          ivfpq_topk(emb, q, k=5, n_lists=8, m=8, ksub=64, nprobe=8,
                     rerank=n, sample=512).collect()}
    assert bf == pq


def test_ivfpq_reuse_codec_and_codes(emb):
    """Pre-trained codec + pre-encoded codes (the persisted-index
    path) must give the same answer as the end-to-end call."""
    from pipelinedb_spark.operators.pq import (ivfpq_topk, pq_encode,
                                               pq_train)
    q = emb.filter(F.col("vec_id") < 10)
    kw = dict(k=5, n_lists=8, m=8, ksub=64, nprobe=4, sample=512)
    full = {(r["q_id"], r["n_id"], r["rk"]) for r in
            ivfpq_topk(emb, q, **kw).collect()}
    codec = pq_train(emb, n_lists=8, m=8, ksub=64, sample=512)
    codes = pq_encode(emb, codec).cache()
    reused = {(r["q_id"], r["n_id"], r["rk"]) for r in
              ivfpq_topk(emb, q, codec=codec, codes=codes,
                         **kw).collect()}
    assert full == reused
    # determinism across runs
    again = {(r["q_id"], r["n_id"], r["rk"]) for r in
             ivfpq_topk(emb, q, codec=codec, codes=codes,
                        **kw).collect()}
    assert reused == again


def test_ivfpq_persisted_matches_inmemory_and_prunes(emb, spark,
                                                     tmp_path):
    """Persisted index: identical results to the in-memory path with
    the same codec; probes land in PartitionFilters; the ADC scan's
    ReadSchema carries codes but NOT the embedding column (columnar
    pruning keeps full vectors on disk)."""
    from pipelinedb_spark.operators.pq import (ivfpq_load_codec,
                                               ivfpq_persist,
                                               ivfpq_topk, pq_encode,
                                               ivfpq_topk_persisted)

    path = str(tmp_path / "pqidx")
    codec = ivfpq_persist(emb, path, n_lists=8, m=8, ksub=64,
                          sample=512)
    q = emb.filter(F.col("vec_id") < 10)
    mem = {(r["q_id"], r["n_id"], r["rk"]) for r in
           ivfpq_topk(emb, q, k=5, codec=codec,
                      codes=pq_encode(emb, codec),
                      nprobe=4, rerank=50).collect()}
    per = ivfpq_topk_persisted(spark, path, q, k=5, nprobe=4,
                               rerank=50)
    assert {(r["q_id"], r["n_id"], r["rk"])
            for r in per.collect()} == mem

    plan = per._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "list_id" in plan
    # the ADC-side scan reads codes without the vector column
    import re
    adc_scans = [s for s in re.findall(r"ReadSchema: \S+", plan)
                 if "codes" in s]
    assert adc_scans and all("embedding" not in s for s in adc_scans)
    # codec roundtrips through _codec.npz
    c2 = ivfpq_load_codec(path)
    assert (c2.centroids == codec.centroids).all()
    assert (c2.codebooks == codec.codebooks).all()


def test_pq_encode_survives_null_and_malformed_vectors(emb, spark,
                                                       tmp_path):
    """One bad row must not kill a batch (the multimodal decoder-
    hardening contract): null / wrong-dim / NaN vectors are dropped
    from the encode output and from persist/append accounting."""
    from pipelinedb_spark.operators.pq import (ivfpq_append,
                                               ivfpq_persist,
                                               pq_encode, pq_train)

    codec = pq_train(emb, n_lists=8, m=8, ksub=32, sample=512)
    good = [r["embedding"] for r in emb.limit(3).collect()]
    bad = spark.createDataFrame(
        [(0, good[0]), (1, None), (2, good[1][:7]),
         (3, [float("nan")] * len(good[0])), (4, good[2])],
        "vec_id long, embedding array<double>")
    rows = pq_encode(bad, codec).collect()
    assert sorted(r["n_id"] for r in rows) == [0, 4]

    path = str(tmp_path / "pq_badrows")
    ivfpq_persist(bad, path, codec=codec)
    from pipelinedb_spark.operators.similarity import _read_meta
    assert _read_meta(path)["build_n"] == 2
    assert ivfpq_append(spark, path, bad) == 2


def test_ivfpq_append_and_staleness(spark, tmp_path):
    """Append extends the persisted index under the frozen codec
    (appended rows retrievable), drift accounting rides the write:
    an in-distribution append keeps the staleness ratio ~1, a shifted
    batch pushes last_ratio well above it."""
    import numpy as np

    from pipelinedb_spark.operators.pq import (ivfpq_append,
                                               ivfpq_persist,
                                               ivfpq_staleness,
                                               ivfpq_topk_persisted)

    rng = np.random.RandomState(11)
    dim = 16

    def clustered(centers, n_per, id0):
        rows = []
        for ci, c in enumerate(centers):
            pts = c + 0.05 * rng.randn(n_per, dim)
            pts /= np.linalg.norm(pts, axis=1, keepdims=True)
            rows += [(id0 + ci * n_per + i, pts[i].tolist())
                     for i in range(n_per)]
        return rows

    base = clustered(np.eye(dim)[:4], 60, 0)
    corpus = spark.createDataFrame(base,
                                   "vec_id long, embedding array<double>")
    path = str(tmp_path / "pqidx_app")
    ivfpq_persist(corpus, path, n_lists=4, m=8, ksub=64, sample=512)

    # in-distribution batch: same clusters, new ids — ratio stays ~1
    indist = spark.createDataFrame(clustered(np.eye(dim)[:4], 10, 5000),
                                   "vec_id long, embedding array<double>")
    n = ivfpq_append(spark, path, indist)
    assert n == 40
    s1 = ivfpq_staleness(path)
    assert s1["appended_n"] == 40
    assert s1["ratio"] == pytest.approx(
        s1["appended_mean_dist"] / s1["build_mean_dist"])
    assert s1["ratio"] < 1.5
    # an appended near-copy of a corpus vector retrieves its cluster
    q = spark.createDataFrame([base[0]], "vec_id long, "
                              "embedding array<double>")
    top = ivfpq_topk_persisted(spark, path, q, k=3, nprobe=4,
                               rerank=20).collect()
    assert top and top[0]["cosine"] > 0.98

    # disjoint shifted clusters → last_ratio climbs well above 1
    shifted = spark.createDataFrame(
        clustered(-np.eye(dim)[4:8], 15, 10000),
        "vec_id long, embedding array<double>")
    ivfpq_append(spark, path, shifted)
    s2 = ivfpq_staleness(path)
    assert s2["last_ratio"] > 1.5, s2


def test_ivfpq_approx_scores_without_rerank(emb):
    """No-rerank path: per-query exactly k rows, rk 1..k, and the ADC
    score of the true nearest neighbor correlates with exact cosine
    (approximation sanity, not equality)."""
    from pipelinedb_spark.operators.pq import ivfpq_topk

    q = emb.filter(F.col("vec_id") < 8)
    res = ivfpq_topk(emb, q, k=3, n_lists=8, m=8, ksub=64,
                     nprobe=8, sample=512).collect()
    per_q = {}
    for r in res:
        per_q.setdefault(r["q_id"], []).append(r["rk"])
    assert set(per_q) == set(range(8))
    assert all(sorted(v) == [1, 2, 3] for v in per_q.values())


def test_ivfpq_retrain_recovers_recall_and_resets_accounting(spark,
                                                             tmp_path):
    """After drifted appends, retrain re-fits codec + codebooks from
    the stored vectors: staleness accounting resets and probes over
    the drifted data find their true neighbors again."""
    import numpy as np

    from pipelinedb_spark.operators.pq import (ivfpq_append,
                                               ivfpq_persist,
                                               ivfpq_retrain,
                                               ivfpq_staleness,
                                               ivfpq_topk_persisted)

    rng = np.random.RandomState(3)
    dim = 16

    def clustered(centers, n_per, id0):
        rows = []
        for ci, c in enumerate(centers):
            pts = c + 0.05 * rng.randn(n_per, dim)
            pts /= np.linalg.norm(pts, axis=1, keepdims=True)
            rows += [(id0 + ci * n_per + i, pts[i].tolist())
                     for i in range(n_per)]
        return rows

    path = str(tmp_path / "pq_retrain")
    corpus = spark.createDataFrame(
        clustered(np.eye(dim)[:4], 50, 0),
        "vec_id long, embedding array<double>")
    ivfpq_persist(corpus, path, n_lists=4, m=8, ksub=64, sample=512)
    shifted_rows = clustered(-np.eye(dim)[4:8], 30, 10000)
    shifted = spark.createDataFrame(shifted_rows,
                                    "vec_id long, embedding array<double>")
    ivfpq_append(spark, path, shifted)
    assert ivfpq_staleness(path)["last_ratio"] > 1.5

    ivfpq_retrain(spark, path)
    st = ivfpq_staleness(path)
    assert st["appended_n"] == 0
    from pipelinedb_spark.operators.similarity import _read_meta
    assert _read_meta(path)["build_n"] == 320  # base 200 + appended 120
    # a drifted query now probes a list that actually holds its
    # cluster: its nearest neighbors are fellow shifted vectors
    q = spark.createDataFrame([shifted_rows[0]],
                              "vec_id long, embedding array<double>")
    top = ivfpq_topk_persisted(spark, path, q, k=5, nprobe=1,
                               rerank=20).collect()
    assert len(top) == 5
    assert all(r["n_id"] >= 10000 for r in top)
    assert top[0]["cosine"] > 0.97   # within the 0.05 cluster noise
