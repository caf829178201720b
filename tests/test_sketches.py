"""Sketch library: accuracy vs exact answers, merge associativity, and
engine integration (sketch states as matrel columns).

Mirrors the reference tests hll.sql / topk.sql / dist.sql / freq.sql /
bloom.sql / cont_*_agg.sql.
"""

import numpy as np
import pytest


# -- pure sketch unit behavior ------------------------------------------------

def test_tdigest_quantiles_close_to_exact():
    from pipelinedb_spark.sketches.tdigest import TDigest
    rng = np.random.default_rng(7)
    data = rng.normal(100, 15, 50_000)
    td = TDigest()
    # build from 10 merged partials (the combinable path)
    parts = np.array_split(data, 10)
    digs = [TDigest().add_many(p) for p in parts]
    acc = digs[0]
    for d in digs[1:]:
        acc = acc.merge(d)
    td2 = TDigest.deserialize(acc.serialize())
    for q in (0.1, 0.5, 0.9, 0.99):
        exact = np.quantile(data, q)
        assert abs(td2.quantile(q) - exact) < 0.8, q
    assert abs(td2.cdf(100.0) - 0.5) < 0.02
    assert td2.count() == 50_000


def test_cms_frequencies():
    from pipelinedb_spark.sketches.cms import CountMinSketch
    rng = np.random.default_rng(3)
    vals = rng.zipf(1.5, 20_000).astype(str)
    a, b = vals[:10_000], vals[10_000:]
    s1 = CountMinSketch(); s1.add_many(np.array(a, dtype=object))
    s2 = CountMinSketch(); s2.add_many(np.array(b, dtype=object))
    merged = CountMinSketch.deserialize(s1.merge(s2).serialize())
    import collections
    truth = collections.Counter(vals)
    for key, exact in truth.most_common(20):
        est = merged.query(key)
        assert exact <= est <= exact + 0.005 * len(vals), key
    assert merged.total() == 20_000


def test_space_saving_topk():
    from pipelinedb_spark.sketches.topk import SpaceSaving
    rng = np.random.default_rng(11)
    vals = [str(v) for v in rng.zipf(1.3, 30_000) if v < 10_000]
    half = len(vals) // 2
    s1 = SpaceSaving(5).add_many(vals[:half])
    s2 = SpaceSaving(5).add_many(vals[half:])
    merged = SpaceSaving.deserialize(s1.merge(s2).serialize())
    import collections
    truth = [k for k, _ in collections.Counter(vals).most_common(3)]
    got = [k for k, _ in merged.topk(3)]
    assert got == truth


def test_bloom_contains_and_union():
    from pipelinedb_spark.sketches.bloom import BloomFilter
    a = BloomFilter().add_many(np.array([f"a{i}" for i in range(5000)], dtype=object))
    b = BloomFilter().add_many(np.array([f"b{i}" for i in range(5000)], dtype=object))
    u = BloomFilter.deserialize(a.union(b).serialize())
    assert u.contains("a42") and u.contains("b4999")
    false_pos = sum(u.contains(f"c{i}") for i in range(2000)) / 2000
    assert false_pos < 0.05
    assert abs(u.cardinality() - 10_000) / 10_000 < 0.05
    inter = a.intersection(b)
    hits = sum(inter.contains(f"a{i}") for i in range(1000))
    assert hits < 200  # intersection of disjoint sets ≈ empty


# -- engine integration: sketch aggregates in continuous views ----------------

def test_cv_topk_and_freq(ctx):
    from pipelinedb_spark import register_sketch_aggs
    register_sketch_aggs()
    from pipelinedb_spark.functions import sketch_fns as sf

    ctx.create_stream("sk1", "k string, v long")
    ctx.create_view("cv_topk", "SELECT k, topk_agg(v, 3) AS tk FROM sk1 GROUP BY k")
    ctx.create_view("cv_freq", "SELECT k, freq_agg(v) AS fq FROM sk1 GROUP BY k")
    rows1 = [{"k": "a", "v": v} for v in [1] * 50 + [2] * 30 + [3] * 10 + [4] * 5]
    rows2 = [{"k": "a", "v": v} for v in [1] * 25 + [2] * 40 + [5] * 2]
    ctx.insert("sk1", rows1)
    ctx.insert("sk1", rows2)
    tk = ctx.read_view("cv_topk").collect()[0]["tk"]
    top = sf.topk_py(bytes(tk), 3)
    assert [v for v, _ in top] == ["1", "2", "3"]
    assert dict(top)["1"] == 75 and dict(top)["2"] == 70
    fq = ctx.read_view("cv_freq").collect()[0]["fq"]
    assert sf.freq_py(bytes(fq), 1) == 75
    assert sf.freq_total_py(bytes(fq)) == len(rows1) + len(rows2)


def test_cv_weighted_topk(ctx):
    """topk_agg(x, k, weight): counts advance by weight (reference
    weighted FSS topkfuncs.c:34-686, test topk.sql weighted cases)."""
    from pipelinedb_spark import register_sketch_aggs
    register_sketch_aggs()
    from pipelinedb_spark.functions import sketch_fns as sf

    ctx.create_stream("skw", "k string, v long, w long")
    ctx.create_view("cv_wtopk",
                    "SELECT k, topk_agg(v, 3, w) AS tk FROM skw GROUP BY k")
    # weights dominate raw frequency: v=9 appears once with weight 100
    ctx.insert("skw", [{"k": "a", "v": 1, "w": 2}] * 10 +
                      [{"k": "a", "v": 2, "w": 1}] * 15 +
                      [{"k": "a", "v": 9, "w": 100}])
    ctx.insert("skw", [{"k": "a", "v": 3, "w": 5}] * 4)
    tk = ctx.read_view("cv_wtopk").collect()[0]["tk"]
    top = dict(sf.topk_py(bytes(tk), 3))
    assert top["9"] == 100          # single row, weight 100
    assert top["1"] == 20           # 10 rows * weight 2
    assert top["3"] == 20           # merged across batches: 4 * 5
    # NULL weight counts as 1 (matches unweighted transition)
    ctx.insert("skw", [{"k": "b", "v": 7, "w": None}] * 3)
    tkb = [r["tk"] for r in ctx.read_view("cv_wtopk").collect()
           if r["k"] == "b"][0]
    assert dict(sf.topk_py(bytes(tkb), 1))["7"] == 3


def test_cv_percentile_and_dist(ctx):
    from pipelinedb_spark import register_sketch_aggs
    register_sketch_aggs()
    from pipelinedb_spark.functions import sketch_fns as sf

    ctx.create_stream("sk2", "g string, x double")
    ctx.create_view(
        "cv_pc",
        "SELECT g, percentile_cont(0.5) WITHIN GROUP (ORDER BY x) AS med, "
        "dist_agg(x) AS dd FROM sk2 GROUP BY g")
    data = list(range(1, 1001))
    ctx.insert("sk2", [{"g": "a", "x": float(v)} for v in data[:500]])
    ctx.insert("sk2", [{"g": "a", "x": float(v)} for v in data[500:]])
    row = ctx.read_view("cv_pc").collect()[0]
    assert abs(row["med"] - 500.5) < 10
    assert abs(sf.dist_quantile_py(bytes(row["dd"]), 0.9) - 900.5) < 15
    assert abs(sf.dist_cdf_py(bytes(row["dd"]), 250.0) - 0.25) < 0.02


def test_cv_bloom(ctx):
    from pipelinedb_spark import register_sketch_aggs
    register_sketch_aggs()
    from pipelinedb_spark.functions import sketch_fns as sf

    ctx.create_stream("sk3", "k string, v string")
    ctx.create_view("cv_bloom", "SELECT k, bloom_agg(v) AS bf FROM sk3 GROUP BY k")
    ctx.insert("sk3", [{"k": "a", "v": f"x{i}"} for i in range(100)])
    ctx.insert("sk3", [{"k": "a", "v": f"y{i}"} for i in range(100)])
    bf = ctx.read_view("cv_bloom").collect()[0]["bf"]
    assert sf.bloom_contains_py(bytes(bf), "x5")
    assert sf.bloom_contains_py(bytes(bf), "y99")
    assert not sf.bloom_contains_py(bytes(bf), "zzz-not-there")


def test_sketch_probe_functions_in_cv_sql(ctx):
    """Sketch probes compose with sketch aggregates inside CV SQL —
    the reference's `SELECT topk(topk_agg(x, 3)) FROM s` shape."""
    from pipelinedb_spark import register_sketch_aggs
    register_sketch_aggs()
    ctx.create_stream("sq1", "k string, v long")
    ctx.create_view(
        "cv_probe",
        "SELECT k, topk_values(topk_agg(v, 3), 3) AS top3, "
        "hll_cardinality(hll_agg(v)) AS ndv_est FROM sq1 GROUP BY k")
    ctx.insert("sq1", [{"k": "a", "v": v} for v in [1] * 10 + [2] * 5 + [3]])
    ctx.insert("sq1", [{"k": "a", "v": v} for v in [2] * 10])
    row = ctx.read_view("cv_probe").collect()[0]
    assert row["top3"] == ["2", "1", "3"]
    assert abs(row["ndv_est"] - 3) <= 1


def test_hll_element_functions(spark):
    """hll_empty / hll_add / hll_print / hll_cardinality(element) —
    the element-wise HLL surface (reference sql:1086-1206)."""
    import pyspark.sql.functions as F
    from pipelinedb_spark.functions import sketch_fns as sf
    from pipelinedb_spark.sketches.hll import HyperLogLog

    # driver-side sanity on the estimator
    h = HyperLogLog()
    for i in range(5000):
        h.add(f"v{i}")
    assert abs(h.cardinality() - 5000) / 5000 < 0.03
    assert "cardinality" in h.summary()

    df = spark.range(1000).select(
        F.lit(1).alias("g"), F.col("id").cast("string").alias("v"))
    # fold element updates: state column threaded through hll_add
    folded = df.select(sf.hll_add(sf.hll_empty(), F.col("v")).alias("h"))
    one = folded.select(
        sf.hll_cardinality(F.col("h"), element_format=True).alias("c"),
        sf.hll_print(F.col("h")).alias("p")).collect()[0]
    assert one["c"] == 1 and "HyperLogLog" in one["p"]
    # pairwise merge of element states
    merged = folded.limit(2).agg(
        F.collect_list("h").alias("hs")).select(
        sf.hll_merge(F.col("hs")[0], F.col("hs")[1]).alias("m"))
    got = merged.select(
        sf.hll_cardinality(F.col("m"), element_format=True).alias("c")
    ).collect()[0]["c"]
    assert got == 2


def test_sketch_element_updaters(spark):
    """bloom_add / topk_increment / freq_add / dist_add /
    tdigest_compress / *_empty constructors."""
    import pyspark.sql.functions as F
    from pipelinedb_spark.functions import sketch_fns as sf

    df = spark.createDataFrame([("x",), ("y",)], ["v"])
    row = df.select(
        sf.bloom_contains(sf.bloom_add(sf.bloom_empty(), F.col("v")),
                          F.col("v")).alias("has_self"),
        sf.bloom_contains(sf.bloom_add(sf.bloom_empty(), F.col("v")),
                          F.lit("absent-key")).alias("has_absent"),
        sf.freq(sf.freq_add(sf.freq_add(sf.cmsketch_empty(), F.col("v")),
                            F.col("v"), 2), F.col("v")).alias("f3"),
        sf.topk_values(
            sf.topk_increment(sf.topk_empty(3), F.col("v"), 5),
            F.lit(1)).alias("top1"),
        sf.dist_quantile(
            sf.tdigest_compress(
                sf.dist_add(sf.dist_add(sf.dist_empty(), F.lit(1.0)),
                            F.lit(3.0))),
            F.lit(1.0)).alias("dmax"),
    ).collect()[0]
    assert row["has_self"] is True
    assert row["has_absent"] is False
    assert row["f3"] == 3
    assert row["top1"] == ["x"] or row["top1"] == ["y"]
    assert row["dmax"] == 3.0


def test_percentile_cont_array_in_cv(ctx):
    """percentile_cont(ARRAY[..]) WITHIN GROUP through the CV engine —
    the float8[] aggregate form (sql:1538,1569)."""
    from pipelinedb_spark import register_sketch_aggs
    register_sketch_aggs()
    ctx.create_stream("pca1", "k string, v double")
    ctx.create_view(
        "cv_pca",
        "SELECT k, percentile_cont(ARRAY[0.25, 0.5, 0.75]) "
        "WITHIN GROUP (ORDER BY v) AS qs FROM pca1 GROUP BY k")
    ctx.insert("pca1", [{"k": "a", "v": float(i)} for i in range(1, 101)])
    qs = ctx.read_view("cv_pca").collect()[0]["qs"]
    assert len(qs) == 3
    for got, want in zip(qs, [25.0, 50.0, 75.0]):
        assert abs(got - want) <= 3.0, (got, want)
    # scalar form still works
    ctx.create_view(
        "cv_pcs",
        "SELECT k, percentile_cont(0.5) WITHIN GROUP (ORDER BY v) AS med "
        "FROM pca1 GROUP BY k")
    ctx.insert("pca1", [{"k": "b", "v": float(i)} for i in range(1, 11)])
    rows = {r["k"]: r["med"] for r in ctx.read_view("cv_pcs").collect()}
    assert abs(rows["b"] - 5.5) <= 1.0
