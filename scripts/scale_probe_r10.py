#!/usr/bin/env python
"""Round-10 scale probes (the BENCH_SCALING_R*OPS pattern).

* kcenter_over_centroids at REAL k (k=1024) over >=1M vectors — the
  composition shipped in round 9 had no large-k datapoint.  Asserts:
  - the assignment pass is ONE Spark job (one vectorized scan, no
    per-exemplar jobs, no shuffle);
  - driver RSS stays bounded (the greedy runs over the n_centroids
    matrix, never the corpus — a corpus-sized collect would show up
    as ~256 MB+ here);
  - exemplar ranks cover k distinct values and the covering radius
    is finite.
  Reports wall at 100k and 1M vectors (10x ratio: the corpus passes
  are the pre-reduce sample scan + the single assignment scan, so
  the ratio should be far below 10x-per-k — the k passes moved to
  the driver matrix).

* text_profile at 1x and 10x documents after the LANG_ID_PREFIX cap —
  the 8 script regexp scans now touch at most 4 KB/doc; asserts the
  plan stays JVM-only (no Python/Arrow eval in the profile path).

Usage: python scripts/scale_probe_r10.py
Writes BENCH_SCALING_R10OPS.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from probeutil import rss_mb as _rss_mb





def _timed(fn):
    t0 = time.monotonic()
    out = fn()
    return out, time.monotonic() - t0


def main() -> None:
    from pyspark.sql import functions as F

    from pipelinedb_spark import get_spark

    spark = get_spark("scale_probe_r10")
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    out: dict = {}

    # ---------------- kcenter_over_centroids at k=1024 ----------------
    from pipelinedb_spark.operators.similarity import kcenter_over_centroids

    DIM = 32

    def vectors(n):
        cols = [F.sin(F.col("id") * (1.37 + 0.11 * j) + j)
                for j in range(DIM)]
        return (spark.range(n)
                .select(F.col("id").alias("vec_id"),
                        F.array(*cols).cast("array<double>")
                        .alias("embedding")))

    def run_kcenter(n, k=1024, tag=""):
        corpus = vectors(n)
        rss0 = _rss_mb()
        t0 = time.monotonic()
        # construction is EAGER for the pre-reduce (ivf_train sample +
        # driver greedy); the returned assignment DF is lazy
        assigned = kcenter_over_centroids(corpus, k=k,
                                          n_centroids=k, sample=8192)
        build_s = time.monotonic() - t0
        sc.setJobGroup(f"kc-assign-{tag}", "kcenter assignment pass")
        t0 = time.monotonic()
        assigned.write.mode("overwrite").format("noop").save()
        assign_s = time.monotonic() - t0
        jobs = sc.statusTracker().getJobIdsForGroup(f"kc-assign-{tag}")
        sc.setJobGroup("kc-verify", "coverage stats")
        stats = assigned.agg(
            F.countDistinct("exemplar").alias("n_ex"),
            F.max("exemplar_dist").alias("radius"),
            F.count("*").alias("n")).first()
        rss1 = _rss_mb()
        return {
            "n_vectors": n, "k": k, "dim": DIM,
            "build_sec": round(build_s, 3),
            "assign_sec": round(assign_s, 3),
            "assign_jobs": len(jobs),
            "driver_rss_delta_mb": round(rss1 - rss0, 1),
            "exemplars_used": int(stats["n_ex"]),
            "covering_radius": round(float(stats["radius"]), 6),
            "rows_assigned": int(stats["n"]),
        }

    small = run_kcenter(100_000, tag="s")
    big = run_kcenter(1_000_000, tag="b")
    assert big["assign_jobs"] == 1, big           # ONE assignment job
    assert big["rows_assigned"] == 1_000_000
    # the greedy ran over the 1024x32 centroid matrix, not the corpus:
    # a corpus-sized driver materialization (1M x 32 doubles = 256 MB)
    # would blow straight through this bound
    assert big["driver_rss_delta_mb"] < 200, big
    assert big["exemplars_used"] > 900            # k ranks actually used
    assert big["covering_radius"] < 2.0
    out["kcenter_1024_100k"] = small
    out["kcenter_1024_1m"] = big
    out["kcenter_wall_ratio_10x"] = round(
        (big["build_sec"] + big["assign_sec"])
        / max(small["build_sec"] + small["assign_sec"], 1e-9), 2)

    # ---------------- text_profile after the prefix cap ----------------
    from pipelinedb_spark.operators.text import analyze_documents

    def docs(mult=1):
        d = spark.read.parquet(
            "/root/testdata/sf0.1/documents.parquet") \
            .select("doc_id", "text")
        if mult > 1:
            reps = spark.range(mult).withColumnRenamed("id", "rep")
            d = (d.crossJoin(reps)
                 .select((F.col("doc_id") * mult + F.col("rep"))
                         .alias("doc_id"), "text"))
        return d

    prof1 = analyze_documents(docs(1))
    plan = prof1._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "ArrowEval" not in plan, plan
    _, t1 = _timed(lambda: prof1.write.mode("overwrite")
                   .format("noop").save())
    _, t10 = _timed(lambda: analyze_documents(docs(10))
                    .write.mode("overwrite").format("noop").save())
    out["text_profile_jvm_only"] = True
    out["text_profile_1x_sec"] = round(t1, 3)
    out["text_profile_10x_sec"] = round(t10, 3)
    out["text_profile_ratio_10x"] = round(t10 / max(t1, 1e-9), 2)

    print(json.dumps(out))
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_SCALING_R10OPS.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
