#!/usr/bin/env python
"""Profile dedup_cluster_assignment at sf10 (guide §1 measure first):
split the query's wall time into its two halves — jaccard_pairs (gram
kernel + self-join + size attach) and the dedup_clusters label loop —
and record per-phase jobs via statusTracker so the round's report can
attribute before optimizing.  Writes /tmp/profile_dedup_r16.json."""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    from pipelinedb_spark import get_spark
    from pipelinedb_spark.operators.dedup import dedup_clusters, jaccard_pairs

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfgen/sf10"
    spark = get_spark("profile_dedup_r16")
    spark.sparkContext.setLogLevel("ERROR")
    st = spark.sparkContext.statusTracker()

    def noop(df) -> None:
        df.write.mode("overwrite").format("noop").save()

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    out: dict = {"sf_dir": sf_dir,
                 "loadavg": round(os.getloadavg()[0], 2)}

    # warm the JVM/codegen on a tiny slice first so phase timings are
    # not dominated by first-query startup
    spark.sparkContext.setJobDescription("warmup")
    noop(jaccard_pairs(docs.limit(200), threshold=0.5))

    sc = spark.sparkContext

    def jobs_in(group: str, fn):
        sc.setJobGroup(group, group)
        try:
            t0 = time.perf_counter()
            r = fn()
            dt = time.perf_counter() - t0
        finally:
            sc.setJobGroup(None, None)
        return r, round(dt, 3), len(st.getJobIdsForGroup(group))

    for rep in range(2):
        p, t_pairs, n_jobs_pairs = jobs_in(
            f"pairs_{rep}",
            lambda: jaccard_pairs(docs, threshold=0.5)
            .localCheckpoint(eager=True))
        labels, t_loop, n_jobs_loop = jobs_in(
            f"loop_{rep}", lambda: dedup_clusters(p))
        _, t_noop, _ = jobs_in(f"noop_{rep}", lambda: noop(labels))
        out[f"rep{rep}"] = {
            "jaccard_pairs_sec": t_pairs,
            "cluster_loop_sec": t_loop,
            "final_noop_sec": t_noop,
            "jaccard_jobs": n_jobs_pairs,
            "cluster_jobs": n_jobs_loop,
            "n_pairs": p.count(),
        }
        print(out[f"rep{rep}"], flush=True)

    with open("/tmp/profile_dedup_r16.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
