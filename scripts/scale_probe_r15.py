#!/usr/bin/env python
"""Round-15 10x-data scaling refresh: continues the per-round subset
ratio series (r11 2.65 -> r12 2.42 -> r13 2.10 -> r14 2.19) on the current tree —
same protocol as the r13 entry: SCALE_SUBSET at sf0.1 then at sf1
(10x replication of sf0.1 via scripts/gen_scale.py) in ONE Spark
session, best-of-3 per query after a warm pass.  Appends
"headline_scaling_r15" to BENCH_SCALING.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    from bench import SCALE_SUBSET
    from pipelinedb_spark import get_spark
    from pipelinedb_spark.querybank import Q

    sf1_dir = "/tmp/sfgen/sf1"
    if not os.path.isdir(sf1_dir):
        from scripts.gen_scale import generate
        generate("/root/testdata/sf0.1", 10, sf1_dir)

    spark = get_spark("scale_probe_r15")
    spark.sparkContext.setLogLevel("ERROR")

    def best3(fn, sf_dir: str) -> float:
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite") \
                .format("noop").save()
            runs.append(time.perf_counter() - t0)
        return round(min(runs), 3)

    out: dict = {"what": "round-15 10x-data scaling subset (sf0.1 -> "
                         "sf1, same session); headline plans are "
                         "unchanged this round — the point continues "
                         "the cross-round ratio series"}
    for key, sf_dir in (("sf0_1_sec", "/root/testdata/sf0.1"),
                        ("sf1_sec", sf1_dir)):
        out[key] = {}
        for name in SCALE_SUBSET:
            out[key][name] = best3(Q[name], sf_dir)
            print(f"{key} {name}: {out[key][name]}", flush=True)
    out["ratio_10x_data"] = {
        n: round(out["sf1_sec"][n] / out["sf0_1_sec"][n], 2)
        for n in SCALE_SUBSET}
    t01 = round(sum(out["sf0_1_sec"].values()), 3)
    t1 = round(sum(out["sf1_sec"].values()), 3)
    out["subset_total_sf0.1"] = t01
    out["subset_total_sf1"] = t1
    out["total_ratio"] = round(t1 / t01, 2)

    path = os.path.join(ROOT, "BENCH_SCALING.json")
    data = json.load(open(path)) if os.path.exists(path) else {}
    data["headline_scaling_r15"] = out
    with open(path, "w") as f:
        json.dump(data, f, indent=2)
    print(json.dumps({"total_ratio": out["total_ratio"],
                      "sf0.1": t01, "sf1": t1}))


if __name__ == "__main__":
    main()
