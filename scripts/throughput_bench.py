#!/usr/bin/env python
"""Per-round streaming-ingest throughput artifact (r14 verdict task 2).

The bench bank measures the read/batch path; the reference's core
loop is insert -> worker partial-agg -> combiner merge (worker.c:
339-467, combiner.c:1323-1633), and until r15 the repo's rows/s
numbers lived only in soak notes.  This script runs a FIXED workload —
N micro-batches through four representative continuous views attached
to one stream:

  plain_agg          count/sum/avg/min/max GROUP BY k
  sw_step            the same aggs under a sliding-window predicate
                     (step-bucketed matrel, overlay at read)
  sketch_ndv         count(DISTINCT uid) -> HLL rewrite (sketch limb)
  stream_table_join  stream JOIN dim ON uid, GROUP BY tier

— and records rows/s plus the full per-batch commit-latency series
into THROUGHPUT_r{N}.json.  A regression tripwire compares against
the newest prior THROUGHPUT_r*.json: a run whose CAL-NORMALIZED
throughput falls below ``REGRESSION_BAR`` (0.7x) of the prior round
is flagged in the artifact, and tests/test_throughput_tripwire.py
fails the suite on a flagged artifact.  Normalization uses the same
frozen bench_cal workload the headline bench uses (host noise on a
shared box reaches 2x; r14's sweep ran on a host measured 37.7%
degraded mid-run — a raw-only bar would false-flag every such round,
while a cal-normalized bar keeps the detector honest).

The batch size is the reference's operating envelope (10k rows —
PipelineDB batch_size default, src/config.c:365-371).

Usage: python scripts/throughput_bench.py --json THROUGHPUT_r15.json
           [--batches 20] [--batch-rows 10000] [--cal-sf SF_DIR]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REGRESSION_BAR = 0.7
# waive an intentional throughput change here, with the reason
EXPLAINED: dict[str, str] = {}

N_KEYS = 1000        # group cardinality of the ingest stream
N_UIDS = 1000        # dim-join key cardinality (100% hit rate on dim)


def _latest_prev(exclude: str | None) -> str | None:
    best, best_r = None, -1
    for p in glob.glob(os.path.join(REPO, "THROUGHPUT_r*.json")):
        if exclude and os.path.basename(p) == os.path.basename(exclude):
            continue
        m = re.search(r"_r(\d+)\.json$", p)
        if m and int(m.group(1)) > best_r:
            best, best_r = p, int(m.group(1))
    return best


def build_workload(spark, n_batches: int, batch_rows: int):
    """The fixed 4-CV workload plus pre-materialized input batches
    (generation excluded from timing)."""
    from pipelinedb_spark import PipelineContext
    from pyspark.sql import functions as F

    ctx = PipelineContext(spark, num_buckets=32)
    dim = spark.range(N_UIDS).select(
        F.col("id").cast("int").alias("uid"),
        F.concat(F.lit("tier"), (F.col("id") % 8)).alias("tier"))
    ctx.register_table("tp_dim", dim)
    ctx.create_stream("tp", "k string, uid int, v double")
    ctx.create_view(
        "tp_plain_agg",
        "SELECT k, count(*) AS n, sum(v) AS s, avg(v) AS a, "
        "min(v) AS lo, max(v) AS hi FROM tp GROUP BY k")
    ctx.create_view(
        "tp_sw_step",
        "SELECT k, count(*) AS n, sum(v) AS s FROM tp "
        "WHERE arrival_timestamp > clock_timestamp() "
        "- interval '10 minutes' GROUP BY k")
    ctx.create_view(
        "tp_sketch_ndv",
        "SELECT k, count(DISTINCT uid) AS ndv FROM tp GROUP BY k")
    ctx.create_view(
        "tp_stj",
        "SELECT tier, count(*) AS n, sum(v) AS total FROM tp "
        "JOIN tp_dim ON tp.uid = tp_dim.uid GROUP BY tier")

    batches = []
    for b in range(n_batches):
        df = (spark.range(batch_rows)
              .select(F.concat(F.lit("k"),
                               (F.col("id") % N_KEYS)).alias("k"),
                      ((F.col("id") * 37 + b * 11) % N_UIDS)
                      .cast("int").alias("uid"),
                      (F.col("id") * 1.5 + b).alias("v"))
              .localCheckpoint(eager=True))
        batches.append(df)
    return ctx, batches


def sanity_check(ctx, total_rows: int) -> bool:
    """A throughput number for a broken commit path is worthless:
    verify the plain-agg CV saw every row and the join CV saw every
    row (dim hit rate is 100% by construction)."""
    import pyspark.sql.functions as F
    n_plain = (ctx.read_view("tp_plain_agg")
               .agg(F.sum("n")).collect()[0][0])
    n_join = ctx.read_view("tp_stj").agg(F.sum("n")).collect()[0][0]
    n_sw = (ctx.read_view("tp_sw_step")
            .agg(F.sum("n")).collect()[0][0])
    return (n_plain == total_rows and n_join == total_rows
            and n_sw == total_rows)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", required=True)
    ap.add_argument("--batches", type=int, default=20)
    ap.add_argument("--batch-rows", type=int, default=10_000)
    ap.add_argument("--cal-sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from pipelinedb_spark import get_spark
    import bench_cal

    spark = get_spark("throughput_bench")
    spark.sparkContext.setLogLevel("ERROR")

    cal_before = bench_cal.cal_best(spark, args.cal_sf, reps=3)
    ctx, batches = build_workload(spark, args.batches, args.batch_rows)

    per_batch: list[float] = []
    t0 = time.perf_counter()
    for df in batches:
        tb = time.perf_counter()
        ctx.insert("tp", df)
        per_batch.append(time.perf_counter() - tb)
    elapsed = time.perf_counter() - t0
    total_rows = args.batches * args.batch_rows
    rows_per_sec = total_rows / elapsed

    ok = sanity_check(ctx, total_rows)
    cal_after = bench_cal.cal_best(spark, args.cal_sf, reps=3)
    ctx.close()

    srt = sorted(per_batch)
    art = {
        "workload": "4cv_ingest_v1",   # bump on ANY workload change —
        # cross-round ratios are only meaningful at the same version
        "batches": args.batches,
        "batch_rows": args.batch_rows,
        "total_rows": total_rows,
        "cvs": ["plain_agg", "sw_step", "sketch_ndv",
                "stream_table_join"],
        "elapsed_sec": round(elapsed, 3),
        "rows_per_sec": round(rows_per_sec, 1),
        "per_batch_sec": {
            "mean": round(statistics.mean(per_batch), 4),
            "p50": round(srt[len(srt) // 2], 4),
            "max": round(max(per_batch), 4),
            "series": [round(x, 4) for x in per_batch],
        },
        "sanity_rows_exact": ok,
        "cal": {"workload": "bench_cal.cal_best r13-frozen",
                "sf_dir": args.cal_sf,
                "before_sec": round(cal_before, 3),
                "after_sec": round(cal_after, 3)},
    }

    prev_path = _latest_prev(exclude=args.json)
    art["prev_artifact"] = prev_path
    art["regression_bar"] = REGRESSION_BAR
    art["regression_flagged"] = []
    if prev_path:
        with open(prev_path) as f:
            prev = json.load(f)
        if prev.get("workload") == art["workload"] and \
                prev.get("rows_per_sec"):
            raw_ratio = rows_per_sec / prev["rows_per_sec"]
            art["prev_rows_per_sec"] = prev["rows_per_sec"]
            art["raw_ratio"] = round(raw_ratio, 3)
            # host-speed correction: this box vs the prior round's
            # box, measured by the frozen cal workload in the same
            # session minutes apart.  cal slower now -> scale the
            # achieved throughput up before judging.
            prev_cal = (prev.get("cal") or {}).get("before_sec")
            cal_adj = None
            if prev_cal and cal_before:
                cal_adj = cal_before / prev_cal
            art["cal_host_ratio"] = (round(cal_adj, 3)
                                     if cal_adj else None)
            norm_ratio = raw_ratio * (cal_adj or 1.0)
            art["cal_normalized_ratio"] = round(norm_ratio, 3)
            if norm_ratio < REGRESSION_BAR:
                why = EXPLAINED.get("rows_per_sec")
                if why:
                    art["regression_waived"] = why
                else:
                    art["regression_flagged"] = ["rows_per_sec"]
        else:
            art["prev_rows_per_sec"] = None  # workload version changed

    with open(args.json, "w") as f:
        json.dump(art, f, indent=1)
    print(json.dumps({k: art[k] for k in
                      ("rows_per_sec", "elapsed_sec",
                       "sanity_rows_exact", "raw_ratio",
                       "cal_normalized_ratio", "regression_flagged")
                      if k in art}))
    if not ok:
        sys.exit(1)
    if art["regression_flagged"]:
        print(f"THROUGHPUT REGRESSION: cal-normalized ratio "
              f"{art['cal_normalized_ratio']} < {REGRESSION_BAR} vs "
              f"{prev_path} — fix it or waive in EXPLAINED with a "
              "reason")
        sys.exit(2)


if __name__ == "__main__":
    main()
