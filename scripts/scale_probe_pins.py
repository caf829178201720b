#!/usr/bin/env python
"""Round-11 scale probe: snapshot pins on a high-cardinality matrel.

What must hold at 100 TB:

* ``pin()`` is MANIFEST-ONLY — its cost is O(buckets) JSON, not
  O(rows): timed at 300k groups it must not launch any data job
  (asserted: well under a second, zero Spark jobs recorded).
* ``read_pinned`` replays the exact snapshot after later merges AND
  a full compaction have rewritten/dereferenced every original dir —
  verified by an aggregate equality, costed next to the live read
  (same plan shape: union + broadcast validity semi-join).
* the manifest overhead of carrying a pin is bounded and visible
  (bytes reported); driver RSS is reported start/end (early-session
  py4j/JVM warmup growth shows up here, not pin state — the pin
  record itself is a ~KB of JSON).

Usage: python scripts/scale_probe_pins.py
Merges a "matrel_pins" entry into BENCH_SCALING_R11OPS.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from probeutil import rss_mb as _rss_mb


GROUPS = 300_000




def _timed(fn):
    t0 = time.monotonic()
    out = fn()
    return out, time.monotonic() - t0


def main() -> None:
    import tempfile

    from pyspark.sql import functions as F

    from pipelinedb_spark import get_spark
    from pipelinedb_spark.matrel import BUCKET_COL, MatrelStore

    spark = get_spark("scale_probe_pins")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    def merge_fn(df):
        return df.groupBy("k", BUCKET_COL).agg(F.sum("n").alias("n"))

    def batch(lo, hi, n=1):
        return (spark.range(lo, hi)
                .select(F.concat(F.lit("g"), F.col("id")).alias("k"),
                        F.lit(n).cast("long").alias("n")))

    work = tempfile.mkdtemp(prefix="pdb_pin_probe_")
    store = MatrelStore(spark, work, "m", num_buckets=32)
    store.gc_grace_seconds = 0.0

    rss0 = _rss_mb()
    _, t_seed = _timed(lambda: store.merge(
        batch(0, GROUPS), ["k"], merge_fn))

    snap_sum = store.read().agg(F.sum("n")).first()[0]

    jobs_before = sc._jsc.sc().dagScheduler().nextJobId()
    _, t_pin = _timed(lambda: store.pin("run"))
    jobs_after = sc._jsc.sc().dagScheduler().nextJobId()
    manifest_bytes = os.path.getsize(
        os.path.join(store.dir, "MANIFEST"))

    # 5 later merges touching a rolling slice, then a full compaction:
    # every ORIGINAL dir is rewritten or dereferenced
    for i in range(5):
        store.merge(batch(i * 50_000, i * 50_000 + 50_000, n=10),
                    ["k"], merge_fn)
    store.compact()
    store.gc_sweep()

    live_sum, t_live = _timed(
        lambda: store.read().agg(F.sum("n")).first()[0])
    pin_sum, t_pinned = _timed(
        lambda: store.read_pinned("run").agg(F.sum("n")).first()[0])
    rss1 = _rss_mb()

    assert pin_sum == snap_sum, (pin_sum, snap_sum)
    assert live_sum == snap_sum + 5 * 50_000 * 10
    assert jobs_after == jobs_before, "pin launched a Spark job"
    assert t_pin < 1.0, t_pin

    entry = {
        "what": ("pin() on a 300k-group matrel is manifest-only "
                 "(zero Spark jobs); read_pinned replays the exact "
                 "snapshot after 5 merges + full compaction rewrote "
                 "or dereferenced every original dir"),
        "groups": GROUPS,
        "seed_merge_sec": round(t_seed, 2),
        "pin_sec": round(t_pin, 4),
        "pin_spark_jobs": int(jobs_after - jobs_before),
        "manifest_bytes_with_pin": manifest_bytes,
        "read_live_sec": round(t_live, 2),
        "read_pinned_sec": round(t_pinned, 2),
        "snapshot_sum_ok": True,
        "driver_rss_mb_start": round(rss0),
        "driver_rss_mb_end": round(rss1),
        "rss_growth_mb": round(rss1 - rss0),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_SCALING_R11OPS.json")
    data = {}
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
    data["matrel_pins"] = entry
    with open(path, "w") as f:
        json.dump(data, f, indent=2)
    print(json.dumps(entry, indent=2))

    import shutil
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
