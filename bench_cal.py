"""FROZEN calibration workload — round-13 bench protocol. DO NOT EDIT.

Three rounds of spin/bw microprobes (r10-r12) proved that what slows
Spark on a shared box — memory-bandwidth pressure, scheduler jitter,
I/O contention — is largely invisible to a register spin loop and a
single 128 MB memcpy: identical r12 code read 14.3 s / 24.9 s / 37.2 s
in three same-box sessions while the microprobes stamped
"steady_slow_host 1.004".  The fix (r12 verdict task 1) is
WORKLOAD-LEVEL calibration: this module carries a frozen replica of
the round-1 q1 plan (lineitem scan → decimal-limb groupBy, the same
scan/shuffle/codegen mix as the headline sweep) plus one fixed,
data-independent 20M-row/1M-group shuffle+agg job.  bench.py runs `cal_best`
in the SAME Spark session immediately before and after the headline
sweep and stamps both times plus their drift into the artifact, so a
cross-round reader divides by a quantity measured by Spark itself on
the same box minutes apart.

Frozen means frozen: any edit to the plans here invalidates every
cross-round cal-normalized comparison.  The q1 replica is a snapshot
of querybank.q1 as of round 13 and deliberately does NOT import
querybank — future tuning of the live q1 must not move the yardstick.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F
from pyspark.sql import types as T

_LIMB = 20
_LIMB_MASK = (1 << _LIMB) - 1


def _dsum(col, scale: int = 6):
    c = col if not isinstance(col, str) else F.col(col)
    q = F.floor(c.cast("double") * F.lit(float(10 ** scale))
                + F.lit(0.5)).cast("long")
    hi = F.sum(F.shiftright(q, 2 * _LIMB))
    mid = F.sum(F.shiftright(q, _LIMB).bitwiseAND(F.lit(_LIMB_MASK)))
    lo = F.sum(q.bitwiseAND(F.lit(_LIMB_MASK)))
    d = T.DecimalType(38, 0)
    total = (hi.cast(d) * F.lit(1 << (2 * _LIMB)).cast(d)
             + mid.cast(d) * F.lit(1 << _LIMB).cast(d)
             + lo.cast(d))
    return (total.cast("double") / F.lit(float(10 ** scale)))


def _q1_replica(spark, sf_dir: str):
    # ×4 self-union: each calibration leg must be heavy enough
    # (~0.3 s+ hot at sf0.1) that the driver's fixed per-job
    # scheduling overhead — which keeps JIT-improving for ~100 jobs —
    # stays under the 10% drift budget; sub-second legs measured the
    # overhead, not the plan (profiled r13: 1M-row legs read 24%
    # before/after drift, this shape reads ~3%)
    li0 = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    li = li0
    for _ in range(3):
        li = li.unionByName(li0)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (li.filter(F.col("l_shipdate") <=
                      F.expr("TIMESTAMP_NTZ '1998-09-02 00:00:00'"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(_dsum("l_quantity").alias("sum_qty"),
                 _dsum("l_extendedprice").alias("sum_base_price"),
                 _dsum(disc_price).alias("sum_disc_price"),
                 _dsum(charge).alias("sum_charge"),
                 (_dsum("l_quantity") / F.count("*")).alias("avg_qty"),
                 (_dsum("l_extendedprice") / F.count("*"))
                 .alias("avg_price"),
                 (_dsum("l_discount") / F.count("*")).alias("avg_disc"),
                 F.count("*").alias("count_order")))


def _shuffle_20m(spark):
    """Fixed 20M-row / 1M-group two-stage shuffle+agg, fully
    data-independent: range → 1M-key hash groupBy (real hash-table +
    exchange volume, ~1.2 s hot on the r13 box) → coarse
    re-aggregation.  Exercises exchange, partial/final agg split, and
    whole-stage codegen without touching any table."""
    df = spark.range(20_000_000)
    k = F.pmod(F.xxhash64(F.col("id")), F.lit(1_000_000)).alias("k")
    g1 = df.groupBy(k).agg(
        F.count("*").alias("n"),
        F.sum(F.col("id") % 997).alias("s"),
        F.avg((F.col("id") * 31) % 1009).alias("a"),
        F.max(F.col("id") * 7 % 911).alias("m"))
    return (g1.groupBy(F.pmod(F.col("k"), F.lit(64)).alias("kk"))
            .agg(F.sum("n").alias("n"), F.sum("s").alias("s"),
                 F.avg("a").alias("a"), F.max("m").alias("m")))


def cal_pass(spark, sf_dir: str) -> float:
    """One full calibration pass (both legs through the noop sink);
    returns wall seconds."""
    t0 = time.perf_counter()
    _q1_replica(spark, sf_dir).write.mode("overwrite") \
        .format("noop").save()
    _shuffle_20m(spark).write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0


def cal_best(spark, sf_dir: str, reps: int = 3,
             warm: int = 0) -> float:
    """Best-of-``reps`` calibration passes (peak capability — the same
    statistic as the headline best-of-5 and the spin probe).  ``warm``
    untimed passes run first to pay codegen JIT and scan-cache warmup;
    the before-sweep call needs 2 (a single warm pass still left the
    first timed pass ~20% hot-session-slow at sf0.01), the after-sweep
    call rides the already-hot session."""
    for _ in range(warm):
        cal_pass(spark, sf_dir)
    return round(min(cal_pass(spark, sf_dir) for _ in range(reps)), 3)
