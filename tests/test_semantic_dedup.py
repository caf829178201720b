"""Semantic (embedding) dedup: cluster assignments equal a pure-python
union-find over exact all-pairs cosine; the LSH path recalls the
quadratic path's clusters; dedup keeps exactly one canonical row per
cluster.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pipelinedb_spark.operators.similarity import (semantic_clusters,
                                                   semantic_dedup)

# sf0.001's synthetic embeddings top out at cosine ≈0.48 off-diagonal
# (7 pairs ≥ 0.45, forming real multi-member components); production
# semantic-dedup thresholds (~0.85) have no data here, so the test
# exercises the same composition at the density the corpus provides.
THRESHOLD = 0.45
# at p = 1-acos(0.45)/π ≈ 0.65 per bit, bits=3/tables=24 gives
# per-pair miss ≈5e-4 (the neardup_pairs low-threshold setting; the
# 0.85-threshold default bits=8/tables=32 would miss ~37% down here)
LSH = dict(bits=3, tables=24)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
        .select("vec_id", "embedding")


@pytest.fixture(scope="module")
def expected_clusters(emb):
    """Union-find over exact numpy cosine pairs ≥ threshold."""
    rows = sorted((r["vec_id"], np.array(r["embedding"], dtype=np.float64))
                  for r in emb.collect())
    ids = [r[0] for r in rows]
    m = np.stack([r[1] for r in rows])
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sim = m @ m.T
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    n = len(ids)
    for i in range(n):
        for j in range(i + 1, n):
            if sim[i, j] >= THRESHOLD:
                ri, rj = find(ids[i]), find(ids[j])
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    return {i: find(i) for i in ids}


def test_quadratic_clusters_match_union_find(emb, expected_clusters):
    got = {r["vec_id"]: r["cluster_id"]
           for r in semantic_clusters(emb, THRESHOLD,
                                      allow_quadratic=True).collect()}
    assert got == expected_clusters
    # the corpus actually contains non-trivial clusters
    assert any(v != k for k, v in expected_clusters.items())


def test_lsh_path_recalls_quadratic_clusters(emb, expected_clusters):
    got = {r["vec_id"]: r["cluster_id"]
           for r in semantic_clusters(emb, THRESHOLD, **LSH).collect()}
    # demand ≥99% of assignments agree and every disagreement is a
    # SPLIT (never a spurious merge)
    agree = sum(got[i] == c for i, c in expected_clusters.items())
    assert agree / len(expected_clusters) >= 0.99
    for i, c in got.items():
        if c != expected_clusters[i]:
            # the LSH cluster must be a subset of the true cluster
            assert expected_clusters[c] == expected_clusters[i]


def test_dedup_keeps_one_canonical_per_cluster(emb, expected_clusters):
    kept = {r["vec_id"] for r in
            semantic_dedup(emb, THRESHOLD, allow_quadratic=True)
            .select("vec_id").collect()}
    canon = {c for c in expected_clusters.values()}
    assert kept == canon
