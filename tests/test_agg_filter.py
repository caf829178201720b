"""Aggregate FILTER (WHERE ...) in continuous queries.

The reference parses FILTER on worker aggregates and strips it from the
combiner aggregation (src/analyzer.c:3053-3068); cont_dist_agg.sql:38
exercises it with ``dist_agg(x) FILTER (WHERE x > 30)`` inside a
sliding-window CV.  Here the filter is folded into the worker's partial
inputs (every registry aggregate is NULL-strict, so nulling non-matching
rows ≡ removing them) and the combiner merges plain states.
"""

import pytest


def by_k(df, col):
    return {r["k"]: r[col] for r in df.collect()}


def test_count_star_filter(ctx):
    ctx.create_stream("fs1", "k string, v long")
    ctx.create_view(
        "cv_f1",
        "SELECT k, count(*) FILTER (WHERE v > 10) AS big, "
        "count(*) AS n FROM fs1 GROUP BY k")
    ctx.insert("fs1", [{"k": "a", "v": 5}, {"k": "a", "v": 20},
                       {"k": "b", "v": 11}])
    ctx.insert("fs1", [{"k": "a", "v": 30}, {"k": "b", "v": 2}])
    got = {r["k"]: (r["big"], r["n"]) for r in ctx.read_view("cv_f1").collect()}
    assert got == {"a": (2, 3), "b": (1, 2)}


def test_sum_avg_filter_across_batches(ctx):
    ctx.create_stream("fs2", "k string, v double")
    ctx.create_view(
        "cv_f2",
        "SELECT k, sum(v) FILTER (WHERE v > 0) AS pos_sum, "
        "avg(v) FILTER (WHERE v < 0) AS neg_avg, "
        "count(v) FILTER (WHERE v = 0) AS zeros FROM fs2 GROUP BY k")
    ctx.insert("fs2", [{"k": "a", "v": 1.0}, {"k": "a", "v": -2.0},
                       {"k": "a", "v": 0.0}])
    ctx.insert("fs2", [{"k": "a", "v": 3.0}, {"k": "a", "v": -4.0}])
    row = ctx.read_view("cv_f2").collect()[0]
    assert row["pos_sum"] == pytest.approx(4.0)
    assert row["neg_avg"] == pytest.approx(-3.0)
    assert row["zeros"] == 1


def test_filter_no_matching_rows_yields_null(ctx):
    # a group where the filter matched nothing: sum is NULL, count 0
    ctx.create_stream("fs3", "k string, v long")
    ctx.create_view(
        "cv_f3",
        "SELECT k, sum(v) FILTER (WHERE v > 100) AS s, "
        "count(v) FILTER (WHERE v > 100) AS n FROM fs3 GROUP BY k")
    ctx.insert("fs3", [{"k": "a", "v": 1}, {"k": "a", "v": 2}])
    row = ctx.read_view("cv_f3").collect()[0]
    assert row["s"] is None and row["n"] == 0


def test_sw_dist_agg_filter(ctx):
    """cont_dist_agg.sql:38 — dist_agg(x) FILTER (WHERE x > 30) inside
    a sliding-window CV; quantiles must reflect only matching rows."""
    from pipelinedb_spark import register_sketch_aggs
    register_sketch_aggs()
    from pipelinedb_spark.functions import sketch_fns as sf

    ctx.create_stream("fsw", "x double")
    ctx.create_view(
        "cv_fsw",
        "SELECT dist_agg(x) FILTER (WHERE x > 30) AS dd FROM fsw "
        "WHERE arrival_timestamp > clock_timestamp() - interval '1 hour'")
    ctx.insert("fsw", [{"x": float(v)} for v in range(1, 51)])
    ctx.insert("fsw", [{"x": float(v)} for v in range(51, 101)])
    dd = ctx.read_view("cv_fsw").collect()[0]["dd"]
    # only 31..100 are in the digest: median ≈ 65.5, min-ish q ≈ 31
    assert abs(sf.dist_quantile_py(bytes(dd), 0.5) - 65.5) < 3.0
    assert sf.dist_quantile_py(bytes(dd), 0.0) >= 30.5


def test_count_distinct_filter(ctx):
    # count(DISTINCT x) FILTER → hll over the filtered rows
    ctx.create_stream("fs4", "k string, v long")
    ctx.create_view(
        "cv_f4",
        "SELECT k, count(DISTINCT v) FILTER (WHERE v % 2 = 0) AS nd "
        "FROM fs4 GROUP BY k")
    ctx.insert("fs4", [{"k": "a", "v": i} for i in range(20)])
    ctx.insert("fs4", [{"k": "a", "v": i} for i in range(10, 30)])
    row = ctx.read_view("cv_f4").collect()[0]
    assert row["nd"] == 15  # evens in 0..29, HLL exact at this size


def test_array_agg_filter(ctx):
    ctx.create_stream("fs5", "k string, v long")
    ctx.create_view(
        "cv_f5",
        "SELECT k, array_agg(v) FILTER (WHERE v >= 10) AS arr "
        "FROM fs5 GROUP BY k")
    ctx.insert("fs5", [{"k": "a", "v": 1}, {"k": "a", "v": 10}])
    ctx.insert("fs5", [{"k": "a", "v": 20}, {"k": "a", "v": 3}])
    row = ctx.read_view("cv_f5").collect()[0]
    assert sorted(row["arr"]) == [10, 20]


def test_filter_in_expression_and_percentile_param_untouched(ctx):
    from pipelinedb_spark import register_sketch_aggs
    register_sketch_aggs()
    ctx.create_stream("fs6", "k string, v double")
    ctx.create_view(
        "cv_f6",
        "SELECT k, "
        "percentile_cont(0.5) WITHIN GROUP (ORDER BY v) "
        "FILTER (WHERE v > 0) AS med_pos, "
        "sum(v) FILTER (WHERE v > 0) / count(*) AS ratio "
        "FROM fs6 GROUP BY k")
    ctx.insert("fs6", [{"k": "a", "v": float(v)}
                       for v in [-5, -5, 1, 2, 3, 4, 5]])
    row = ctx.read_view("cv_f6").collect()[0]
    assert abs(row["med_pos"] - 3.0) < 0.6  # median of 1..5
    assert row["ratio"] == pytest.approx(15.0 / 7.0)


def test_malformed_filter_rejected(ctx):
    from pipelinedb_spark import CQError
    ctx.create_stream("fs7", "k string, v long")
    with pytest.raises(CQError, match="FILTER"):
        ctx.create_view(
            "cv_f7", "SELECT k, count(*) FILTER (v > 1) AS n "
                     "FROM fs7 GROUP BY k")
