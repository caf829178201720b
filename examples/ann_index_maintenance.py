#!/usr/bin/env python
"""ANN index lifecycle under continuous ingest: build → append →
staleness check → retrain.

A production embedding store is append-heavy: the coarse quantizer
(IVF centroids) is frozen at build time, and recall decays when the
arriving distribution drifts away from it.  pipelinedb_spark keeps
an O(1) drift signal: every build/append records the mean assignment
distance (1 − cosine to the nearest centroid) by riding the write
job's Observation into ``_meta.json`` — no extra pass, no data read
to CHECK the signal.  When the appended/build distance ratio climbs,
``ivf_retrain`` re-fits the quantizer from the vectors already in
the index and resets the accounting.

Run: python examples/ann_index_maintenance.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import numpy as np
    from pyspark.sql import functions as F

    from pipelinedb_spark import get_spark
    from pipelinedb_spark.operators.similarity import (
        ivf_append, ivf_persist, ivf_retrain, ivf_staleness,
        ivf_topk_persisted)

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("ann_index_maintenance")
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n, dim = emb.count(), len(emb.first()["embedding"])
    path = os.path.join(tempfile.mkdtemp(prefix="ann_ex_"), "ivf")
    print(f"corpus: {n} vectors, dim={dim}")

    # 1. build: partitioned-by-list parquet + centroids + drift meta
    ivf_persist(emb, path, n_lists=16)
    st = ivf_staleness(path)
    print(f"built: build_mean_dist={st['build_mean_dist']:.4f}")

    # 2. steady-state appends (same distribution): ratio stays ~1
    batch = emb.filter(F.col("vec_id") % 7 == 0) \
        .withColumn("vec_id", F.col("vec_id") + 10_000_000)
    ivf_append(spark, path, batch)
    st = ivf_staleness(path)
    print(f"after in-distribution append: ratio={st['ratio']:.2f} "
          f"(appended {st['appended_n']})")

    # 3. drift: vectors from a different region of the sphere
    rng = np.random.RandomState(11)
    base = rng.randn(dim)
    drift_rows = []
    for i in range(500):
        v = -base + 0.1 * rng.randn(dim)
        v = v / np.linalg.norm(v)
        drift_rows.append((20_000_000 + i, v.tolist()))
    drift = spark.createDataFrame(
        drift_rows, "vec_id long, embedding array<double>")
    ivf_append(spark, path, drift)
    st = ivf_staleness(path)
    due = st["last_ratio"] > 1.1 or st["ratio"] > 1.1
    print(f"after drifted append: cumulative ratio={st['ratio']:.2f}, "
          f"last-batch ratio={st['last_ratio']:.2f}"
          + (" → retrain due" if due else ""))

    # 4. retrain in place from the stored vectors; accounting resets
    ivf_retrain(spark, path)
    st = ivf_staleness(path)
    print(f"after retrain: build_mean_dist={st['build_mean_dist']:.4f}, "
          f"appended_n={st['appended_n']}")

    # 5. probes prune at the partition level throughout
    q = drift.limit(3)
    top = ivf_topk_persisted(spark, path, q, k=3, nprobe=2)
    print("post-retrain probe over drifted queries:")
    top.show(9, truncate=False)

    # 6. same lifecycle at 1/8th the candidate-scan bytes: IVF-PQ.
    # The persisted table carries (id, vec, codes); the ADC pass
    # reads only the m-byte codes column, rerank touches vectors for
    # the shortlist alone, and append/staleness mirror the IVF flow.
    from pipelinedb_spark.operators.pq import (ivfpq_append,
                                               ivfpq_persist,
                                               ivfpq_staleness,
                                               ivfpq_topk_persisted)
    pq_path = os.path.join(os.path.dirname(path), "ivfpq")
    ivfpq_persist(emb, pq_path, n_lists=16, m=8, ksub=64)
    ivfpq_append(spark, pq_path, batch)
    st = ivfpq_staleness(pq_path)
    print(f"ivf-pq: {dim * 8}B/vec scanned → 8B/vec codes; "
          f"in-distribution append ratio={st['ratio']:.2f}")
    pq_top = ivfpq_topk_persisted(spark, pq_path, emb.limit(3),
                                  k=3, nprobe=4, rerank=30)
    print("ivf-pq probe (ADC shortlist + exact rerank):")
    pq_top.show(9, truncate=False)

    shutil.rmtree(os.path.dirname(path), ignore_errors=True)


if __name__ == "__main__":
    main()
