"""Randomized engine-equivalence soak: interleave inserts, reads,
flushes, dump/restore and constraint-free merging across several CV
shapes, then require the incrementally-maintained matrels to equal the
one-shot batch answer over the union of every inserted row (the
reference's regress pattern generalized to a randomized schedule)."""

import random

from pyspark.sql import functions as F


def test_randomized_incremental_equals_batch(ctx, spark):
    rng = random.Random(0xC0FFEE)
    ctx.create_stream("fz", "k string, u long, v double")
    ctx.create_view("fz_plain",
                    "SELECT k, count(*) AS n, sum(v) AS s, avg(v) AS a, "
                    "min(v) AS lo, max(v) AS hi, "
                    "exact_count_distinct(u) AS ndv FROM fz GROUP BY k")
    ctx.create_view("fz_distinct", "SELECT DISTINCT k, u FROM fz")
    ctx.create_view("fz_global",
                    "SELECT count(*) AS n, sum(v) AS s FROM fz")
    ctx.create_view("fz_append", "SELECT k FROM fz")

    all_rows = []
    keys = ["a", "b", "c", "d"]
    for step in range(10):
        batch = [{"k": rng.choice(keys),
                  "u": rng.randrange(6),
                  "v": round(rng.uniform(-50, 50), 3)}
                 for _ in range(rng.randrange(1, 40))]
        all_rows.extend(batch)
        ctx.insert("fz", batch)
        # interleave reads (forces flush paths) on a random CV
        if step % 3 == rng.randrange(3):
            ctx.read_view(rng.choice(
                ["fz_plain", "fz_distinct", "fz_global"])).collect()
        if step == 5:
            # mid-schedule dump → truncate → restore must be lossless
            ctx.dump_state("fz_plain", str(ctx.root) + "/fzdump")
            ctx.truncate_view("fz_plain")
            ctx.restore_state("fz_plain", str(ctx.root) + "/fzdump")

    batch_df = spark.createDataFrame(
        [(r["k"], r["u"], r["v"]) for r in all_rows],
        "k string, u long, v double")
    batch_df.createOrReplaceTempView("fz_batch")

    got = sorted((r["k"], r["n"], round(r["s"], 6), round(r["a"], 9),
                  r["lo"], r["hi"], r["ndv"])
                 for r in ctx.read_view("fz_plain").collect())
    exp = sorted((r["k"], r["n"], round(r["s"], 6), round(r["a"], 9),
                  r["lo"], r["hi"], r["ndv"])
                 for r in spark.sql(
                     "SELECT k, count(*) AS n, sum(v) AS s, avg(v) AS a, "
                     "min(v) AS lo, max(v) AS hi, "
                     "count(DISTINCT u) AS ndv "
                     "FROM fz_batch GROUP BY k").collect())
    assert got == exp

    got = sorted((r["k"], r["u"])
                 for r in ctx.read_view("fz_distinct").collect())
    exp = sorted((r["k"], r["u"]) for r in spark.sql(
        "SELECT DISTINCT k, u FROM fz_batch").collect())
    assert got == exp

    g = ctx.read_view("fz_global").collect()[0]
    assert g["n"] == len(all_rows)
    assert abs(g["s"] - sum(r["v"] for r in all_rows)) < 1e-6

    got = sorted(r["k"] for r in ctx.read_view("fz_append").collect())
    assert got == sorted(r["k"] for r in all_rows)


def test_randomized_round5_shapes_equal_batch(ctx, spark):
    """Round-5 surfaces under a randomized schedule: arrival-order
    LIMIT/OFFSET, mixed group+agg select items, and a delta-combining
    downstream CV — all must equal the batch answer over the union of
    every inserted row."""
    rng = random.Random(0xBEEF5)
    ctx.create_stream("fz2", "k string, u long, v double")
    ctx.create_view("fz2_limit", "SELECT k FROM fz2 LIMIT 17 OFFSET 5")
    ctx.create_view("fz2_mixed",
                    "SELECT u + avg(v) AS m, count(*) AS n "
                    "FROM fz2 GROUP BY u")
    ctx.create_view("fz2_up",
                    "SELECT k, count(*) AS c, avg(v) AS a "
                    "FROM fz2 GROUP BY k")
    ctx.create_view("fz2_dc",
                    "SELECT combine((delta).c) AS c, "
                    "combine((delta).a) AS a FROM output_of('fz2_up')")

    all_rows = []
    keys = ["a", "b", "c"]
    for step in range(8):
        batch = [{"k": rng.choice(keys), "u": rng.randrange(4),
                  "v": round(rng.uniform(-9, 9), 3)}
                 for _ in range(rng.randrange(1, 25))]
        all_rows.extend(batch)
        ctx.insert("fz2", batch)
        if rng.randrange(2):
            ctx.read_view(rng.choice(
                ["fz2_limit", "fz2_mixed", "fz2_dc"])).collect()

    # LIMIT/OFFSET: the first 17 arrivals after skipping 5, in insert
    # order (multiset compare — the view returns exactly those rows)
    exp_lim = sorted(r["k"] for r in all_rows[5:22])
    got_lim = sorted(r["k"] for r in ctx.read_view("fz2_limit").collect())
    assert got_lim == exp_lim

    batch_df = spark.createDataFrame(
        [(r["k"], r["u"], r["v"]) for r in all_rows],
        "k string, u long, v double")
    batch_df.createOrReplaceTempView("fz2_batch")
    got_m = sorted((r["n"], round(r["m"], 9))
                   for r in ctx.read_view("fz2_mixed").collect())
    exp_m = sorted((r["n"], round(r["m"], 9)) for r in spark.sql(
        "SELECT u + avg(v) AS m, count(*) AS n FROM fz2_batch "
        "GROUP BY u").collect())
    assert got_m == exp_m

    # delta combine: exact global count and WEIGHTED avg
    r = ctx.read_view("fz2_dc").collect()[0]
    assert r["c"] == len(all_rows)
    exp_avg = sum(x["v"] for x in all_rows) / len(all_rows)
    assert abs(r["a"] - exp_avg) < 1e-9
