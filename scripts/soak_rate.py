#!/usr/bin/env python
"""Rate-source streaming soak: a LIVE continuously-generating source
(Spark's built-in `rate` format — no connector jar needed) through the
full chain rate → SQL transform → CV over the transform's output
stream, with one FORCED mid-run restart.

Proves a second continuously-generating source through the same
runtime as the file-drop soak (scripts/soak_streaming.py), and
validates effectively-once across the restart on live data: at the
end, count == exact distinct == max+1 (no duplicates from the replayed
epoch, no gaps from the aborted one).

Usage: python scripts/soak_rate.py [--rps 2000] [--seconds 45]
Appends/refreshes the "rate_soak" entry in BENCH_SCALING.json.
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
    ap.add_argument("--rps", type=int, default=2000)
    ap.add_argument("--seconds", type=float, default=45.0)
    ap.add_argument("--workdir", default="/tmp/soak_rate")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_SCALING.json"))
    args = ap.parse_args()

    from pipelinedb_spark import PipelineContext, get_spark
    from pipelinedb_spark.streaming.runtime import attach_rate_stream

    shutil.rmtree(args.workdir, ignore_errors=True)
    spark = get_spark("soak_rate")
    spark.sparkContext.setLogLevel("ERROR")
    ctx = PipelineContext(spark, root=os.path.join(args.workdir, "pdb"),
                          num_buckets=8)
    ctx.create_stream("rate_in", "v long")
    ctx.create_transform("t_rate", "SELECT v, v % 16 AS b FROM rate_in")
    ctx.create_view("cv_rate_soak",
                    "SELECT b, count(*) AS n FROM output_of('t_rate') "
                    "GROUP BY b")
    ctx.create_view("cv_rate_total",
                    "SELECT count(*) AS n, exact_count_distinct(v) AS d, "
                    "max(v) AS mx FROM output_of('t_rate')")

    def attach():
        return attach_rate_stream(ctx, "rate_in",
                                  rows_per_second=args.rps,
                                  value_exprs={"v": "value"})

    rss0 = _rss_kb()
    t0 = time.monotonic()
    att = attach()
    half = args.seconds / 2.0
    while time.monotonic() - t0 < half:
        time.sleep(0.5)
    att.stop()  # forced restart point, mid-stream
    att = attach()
    while time.monotonic() - t0 < args.seconds:
        time.sleep(0.5)
    att.process_all_available()
    att.stop()
    wall = time.monotonic() - t0
    rss1 = _rss_kb()

    r = ctx.read_view("cv_rate_total").collect()[0]
    n, d, mx = int(r["n"]), int(r["d"]), int(r["mx"])
    batches = ctx.streams["rate_in"].input_batches
    effectively_once = (n == d == mx + 1)
    entry = {
        "what": "rate source -> SQL transform -> CVs with one forced "
                "mid-run restart (live-source crash-recovery analog)",
        "rows_per_second_target": args.rps,
        "rows_ingested": n,
        "sustained_rows_per_sec": round(n / wall, 1),
        "micro_batches": batches,
        "batches_per_sec": round(batches / wall, 2),
        "wall_sec": round(wall, 1),
        "effectively_once": effectively_once,
        "count": n, "distinct": d, "max_plus_1": mx + 1,
        "driver_rss_mb_start": rss0 // 1024,
        "driver_rss_mb_end": rss1 // 1024,
    }
    data = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            data = json.load(f)
    data["rate_soak"] = entry
    with open(args.out, "w") as f:
        json.dump(data, f, indent=2)
    print(json.dumps(entry))
    assert effectively_once, (n, d, mx)
    ctx.close()


if __name__ == "__main__":
    main()
