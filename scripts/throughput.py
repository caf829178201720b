#!/usr/bin/env python
"""Engine ingest throughput: rows/sec through continuous views at the
reference's operating envelope (10k-row micro-batches — PipelineDB's
`batch_size` default, src/config.c:365-371).

Usage: python scripts/throughput.py [n_batches] [batch_rows] [n_cvs]
                                    [track] [parallel]

``track`` (0/1, default 0) opts into unconditional output-stream
emission (track_output_streams=True); the default measures the
engine-default reader-gated commit path.  ``parallel`` (0/1, default
1) toggles the concurrent per-view dispatch — run both at n_cvs>1 to
measure the batch-parallel speedup.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    batch_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    n_cvs = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    track = bool(int(sys.argv[4])) if len(sys.argv) > 4 else False
    parallel = bool(int(sys.argv[5])) if len(sys.argv) > 5 else True

    from pipelinedb_spark import PipelineContext, get_spark
    from pyspark.sql import functions as F

    spark = get_spark("throughput")
    spark.sparkContext.setLogLevel("ERROR")
    ctx = PipelineContext(spark, num_buckets=32,
                          track_output_streams=track)
    ctx.parallel_dispatch = parallel
    ctx.create_stream("tp", "k string, v double, ts timestamp")
    for i in range(n_cvs):
        ctx.create_view(
            f"cv_tp{i}",
            "SELECT k, count(*) AS n, sum(v) AS s, avg(v) AS a, "
            "min(v) AS lo, max(v) AS hi FROM tp GROUP BY k")

    # pre-built batches (generation excluded from timing)
    batches = []
    for b in range(n_batches):
        df = (spark.range(batch_rows)
              .select((F.concat(F.lit("k"), (F.col("id") % 1000))).alias("k"),
                      (F.col("id") * 1.5 + b).alias("v"),
                      F.current_timestamp().alias("ts"))
              .localCheckpoint(eager=True))
        batches.append(df)

    t0 = time.perf_counter()
    for df in batches:
        ctx.insert("tp", df)
    elapsed = time.perf_counter() - t0
    total = n_batches * batch_rows
    print(f"batches={n_batches} rows/batch={batch_rows} cvs={n_cvs} "
          f"parallel={int(parallel)}")
    print(f"elapsed={elapsed:.2f}s  rows/sec={total / elapsed:,.0f}  "
          f"sec/batch={elapsed / n_batches:.3f}")
    ctx.close()


if __name__ == "__main__":
    main()
