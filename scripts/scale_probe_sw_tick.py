#!/usr/bin/env python
"""High-cardinality SW ticker probe: tick_sw over hundreds of
thousands of groups must stay one distributed snapshot + one
full-outer diff — no driver collect of CV rows, bounded driver RSS,
and exact no-op elision (an untouched group emits NOTHING even at
300k groups).

Three ticks tell the story:
  1. first tick  — every group appears (old=NULL insert),
  2. half the groups get new data — exactly those emit updates,
  3. window slides past everything — every group emits a delete and
     the expired steps drop at the manifest level.

Usage: python scripts/scale_probe_sw_tick.py [--groups 300000]
Appends/refreshes "sw_tick_cardinality" in BENCH_SCALING_R11OPS.json.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from probeutil import rss_kb as _rss_kb





def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--groups", type=int, default=300_000)
    ap.add_argument("--workdir", default="/tmp/probe_sw_tick")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_SCALING_R11OPS.json"))
    args = ap.parse_args()
    k = args.groups

    from pyspark.sql import functions as F

    from pipelinedb_spark import PipelineContext, get_spark

    shutil.rmtree(args.workdir, ignore_errors=True)
    spark = get_spark("probe_sw_tick")
    spark.sparkContext.setLogLevel("ERROR")
    ctx = PipelineContext(spark, root=os.path.join(args.workdir, "pdb"),
                          num_buckets=8, track_output_streams=True)
    ctx.create_stream("hs", "v long")
    ctx.create_view(
        "cv_hs",
        f"SELECT v % {k} AS g, count(*) AS n, sum(v) AS sv FROM hs "
        "WHERE arrival_timestamp > clock_timestamp() "
        "- interval '3600 seconds' GROUP BY v % " + str(k))

    now = time.time()

    def batch(n_rows: int, offset: int, at: float):
        return (spark.range(n_rows)
                .select((F.col("id") + offset).alias("v"),
                        F.timestamp_seconds(F.lit(at))
                        .alias("arrival_timestamp")))

    rss0 = _rss_kb()
    # 2 rows per group
    ctx.insert("hs", batch(2 * k, 0, now - 30))

    t0 = time.monotonic()
    n1 = ctx.tick_sw("cv_hs", now=now)
    t1 = time.monotonic() - t0
    assert n1 == k, n1                       # every group appears

    # touch exactly half the groups (v in [0, k/2))
    ctx.insert("hs", batch(k // 2, 0, now - 10))
    t0 = time.monotonic()
    n2 = ctx.tick_sw("cv_hs", now=now + 1)
    t2 = time.monotonic() - t0
    assert n2 == k // 2, n2                  # no-op elision holds at 300k

    # window slides past everything: every group disappears and the
    # expired steps drop at the manifest level
    t0 = time.monotonic()
    n3 = ctx.tick_sw("cv_hs", now=now + 4000)
    t3 = time.monotonic() - t0
    assert n3 == k, n3
    assert ctx.read_matrel("cv_hs").count() == 0
    rss1 = _rss_kb()

    entry = {
        "what": "tick_sw over high-cardinality SW CV: distributed "
                "snapshot + full-outer diff, no driver collect of CV "
                "rows; exact no-op elision and exact delete emission",
        "groups": k,
        "tick1_all_insert_sec": round(t1, 2),
        "tick2_half_update_sec": round(t2, 2),
        "tick3_all_delete_sec": round(t3, 2),
        "emitted": [n1, n2, n3],
        "driver_rss_mb_start": rss0 // 1024,
        "driver_rss_mb_end": rss1 // 1024,
        "rss_growth_mb": (rss1 - rss0) // 1024,
    }
    data = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            data = json.load(f)
    data["sw_tick_cardinality"] = entry
    with open(args.out, "w") as f:
        json.dump(data, f, indent=2)
    print(json.dumps(entry))
    ctx.close()


if __name__ == "__main__":
    main()
