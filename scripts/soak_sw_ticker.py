#!/usr/bin/env python
"""Sliding-window osrel ticker under the streaming runtime at soak
length (round-10 verdict task 6 — the last untested INTERACTION
between two individually-tested streaming pieces).

Chain under test: rate source → stream → SW CV (60 s window, 3 s
steps) with `tick_sw` firing every few seconds for --seconds, with
FORCED mid-run restarts.  The rate source's own `timestamp` column is
used as arrival_timestamp, so event time is deterministic across
epoch replays and identical for every reader CQ.

Verification:

* **Replayed oracle at every quiesce point** (each restart boundary +
  the final stop): the engine's per-group SW state (the last emitted
  `new` in the osrel) must equal a snapshot REPLAYED from an
  independent step-grid CV (per (group, floor(arrival/step)) counts —
  the worker/merge path, not tick_sw's snapshot/diff path) using the
  documented in-window rule step*stp >= t - window - step.  A stop()
  can abort a dispatch between the two CVs' commits, leaving them one
  epoch apart until the replay lands — the compare retries through
  one short re-attach/stop cycle before counting as a failure.
* **Chain consistency over the FULL osrel**: per group, every change
  row's `old` equals the previously emitted `new` (None first), and
  old != new (no-op elision held for every one of the ~360 ticks,
  most taken under live concurrent ingest).
* **Flat driver RSS** sampled across the run (the tick snapshot is a
  swapped parquet pair, not an accumulating checkpoint chain).

Usage: python scripts/soak_sw_ticker.py [--seconds 1800] [--rps 300]
Appends/refreshes "sw_ticker_soak" in BENCH_SCALING.json.
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
    ap.add_argument("--rps", type=int, default=300)
    ap.add_argument("--seconds", type=float, default=1800.0)
    ap.add_argument("--tick-every", type=float, default=5.0)
    ap.add_argument("--window", type=int, default=60)
    ap.add_argument("--restarts", type=int, default=3,
                    help="evenly spaced quiesce/restart points")
    ap.add_argument("--workdir", default="/tmp/soak_sw_ticker")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_SCALING.json"))
    args = ap.parse_args()

    from pipelinedb_spark import PipelineContext, get_spark
    from pipelinedb_spark.streaming.runtime import attach_rate_stream

    shutil.rmtree(args.workdir, ignore_errors=True)
    spark = get_spark("soak_sw_ticker")
    spark.sparkContext.setLogLevel("ERROR")
    ctx = PipelineContext(spark, root=os.path.join(args.workdir, "pdb"),
                          num_buckets=8, track_output_streams=True)
    # the chain check reads the FULL emission history; the default
    # 256-segment replay tail would prune a 30-minute run's head
    ctx.osrel_retention_segments = 1 << 16

    ctx.create_stream("swr", "v long")
    ctx.create_view(
        "cv_swt",
        f"SELECT v % 8 AS b, count(*) AS n, sum(v) AS sv FROM swr "
        f"WHERE arrival_timestamp > clock_timestamp() "
        f"- interval '{args.window} seconds' GROUP BY v % 8")
    plan = ctx.views["cv_swt"].plan
    step = float(plan.sw_step_seconds)
    win = float(plan.sw_seconds)
    # independent step-grid archive: same floor arithmetic as the SW
    # worker's step bucketing (double epoch / step), different
    # aggregation path
    ctx.create_view(
        "cv_grid",
        f"SELECT v % 8 AS b, "
        f"floor(CAST(arrival_timestamp AS DOUBLE) / {step}) AS stp, "
        f"count(*) AS n, sum(v) AS sv FROM swr "
        f"GROUP BY v % 8, "
        f"floor(CAST(arrival_timestamp AS DOUBLE) / {step})")

    def attach():
        return attach_rate_stream(
            ctx, "swr", rows_per_second=args.rps,
            value_exprs={"v": "value", "arrival_timestamp": "timestamp"})

    def expected(at: float) -> dict[int, tuple[int, int]]:
        cutoff = at - win - step
        agg: dict[int, list[int]] = {}
        for r in ctx.read_view("cv_grid").collect():
            if float(r["stp"]) * step >= cutoff:
                a = agg.setdefault(int(r["b"]), [0, 0])
                a[0] += int(r["n"])
                a[1] += int(r["sv"])
        return {b: (n, sv) for b, (n, sv) in agg.items()}

    def osrel_in_order():
        """Emission-ordered change rows (output_of row order across
        segments is scan order, not emission order — _seq carries the
        segment index)."""
        return (ctx.output_of("cv_swt", with_seq=True)
                .orderBy("_seq").collect())

    def engine_state() -> dict[int, tuple[int, int]]:
        """Per-group last emitted `new` from the osrel — the ticker's
        own cumulative claim (NOT a fresh read of the CV)."""
        state: dict[int, tuple[int, int] | None] = {}
        for row in osrel_in_order():
            side = row["new"] if row["new"] is not None else None
            b = int((row["new"] or row["old"])["b"])
            state[b] = ((int(side["n"]), int(side["sv"]))
                        if side is not None else None)
        return {b: v for b, v in state.items() if v is not None}

    rss = [("start", _rss_kb())]
    ticks = 0
    emitted = 0
    quiesce_checks = []
    t0 = time.monotonic()
    boundaries = [args.seconds * (i + 1) / args.restarts
                  for i in range(args.restarts)]
    att = attach()
    next_tick = time.monotonic() + args.tick_every
    bi = 0
    while bi < len(boundaries):
        now_m = time.monotonic()
        if now_m - t0 >= boundaries[bi]:
            # quiesce: stop, settle the possibly-torn epoch through a
            # short re-attach, then tick + replay-compare
            att.stop()
            ok = False
            for attempt in range(3):
                tq = time.time()
                emitted += ctx.tick_sw("cv_swt", now=tq)
                ticks += 1
                got = engine_state()
                want = expected(tq)
                if got == want:
                    ok = True
                    break
                att = attach()     # let the aborted epoch replay
                time.sleep(2.0)
                att.stop()
            quiesce_checks.append(
                {"at_sec": round(now_m - t0, 1), "match": ok,
                 "attempts": attempt + 1, "groups": len(want)})
            assert ok, (f"quiesce {bi}: engine state != replayed "
                        f"oracle after retries\n got={got}\nwant={want}")
            rss.append((f"quiesce{bi}", _rss_kb()))
            bi += 1
            if bi < len(boundaries):
                att = attach()     # restart: next leg runs live
            continue
        if now_m >= next_tick:
            emitted += ctx.tick_sw("cv_swt", now=time.time())
            ticks += 1
            next_tick = now_m + args.tick_every
        time.sleep(0.2)
    wall = time.monotonic() - t0
    rss.append(("end", _rss_kb()))

    # full-history chain consistency, most ticks under live ingest
    last_new: dict[int, dict | None] = {}
    chain_rows = 0
    for row in osrel_in_order():
        old, new = row["old"], row["new"]
        b = int((new or old)["b"])
        prev = last_new.get(b)
        o = None if old is None else old.asDict()
        n = None if new is None else new.asDict()
        assert o == prev, (b, o, prev)
        assert o != n, (b, o)          # no-op elision held
        last_new[b] = n
        chain_rows += 1
    # the final quiesce compare pinned the end state against the
    # oracle; the chain walk must land on that same state
    final_state = {b: (int(v["n"]), int(v["sv"]))
                   for b, v in last_new.items() if v is not None}
    assert final_state == engine_state()

    grid_rows = ctx.read_view("cv_grid").count()
    rss_mb = {k: v // 1024 for k, v in rss}
    entry = {
        "what": "rate source -> SW CV with osrel ticker, "
                f"{args.restarts} forced restarts; replayed step-grid "
                "oracle at every quiesce point, full-history old/new "
                "chain check, flat RSS",
        "rows_per_second_target": args.rps,
        "wall_sec": round(wall, 1),
        "ticks": ticks,
        "osrel_rows": chain_rows,
        "emitted_change_rows": emitted,
        "quiesce_checks": quiesce_checks,
        "grid_cells": grid_rows,
        "driver_rss_mb": rss_mb,
        "rss_growth_mb": rss_mb.get("end", 0) - rss_mb.get("start", 0),
    }
    data = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            data = json.load(f)
    data["sw_ticker_soak"] = entry
    with open(args.out, "w") as f:
        json.dump(data, f, indent=2)
    print(json.dumps(entry))
    assert all(c["match"] for c in quiesce_checks)
    ctx.close()


if __name__ == "__main__":
    main()
