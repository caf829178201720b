"""Phase-0/1 end-to-end: create_stream → create_view → insert →
read_view, combinable aggregate correctness across micro-batches.

Mirrors the reference regress pattern (create stream + CV → INSERT
batches → SELECT with ORDER BY → compare), e.g. cont_avg.sql,
cont_count.sql, cont_min_max.sql.
"""

import pytest
from pyspark.sql import functions as F


def rows_of(df, *cols):
    out = [tuple(r) for r in df.select(*cols).collect()]
    return sorted(out, key=lambda t: tuple((v is None, str(v)) for v in t))


def test_count_group(ctx):
    ctx.create_stream("s1", "k string, v long")
    ctx.create_view("cv_count", "SELECT k, count(*) AS cnt FROM s1 GROUP BY k")
    ctx.insert("s1", [{"k": "a", "v": 1}, {"k": "b", "v": 2}, {"k": "a", "v": 3}])
    ctx.insert("s1", [{"k": "a", "v": 4}, {"k": "c", "v": 5}])
    assert rows_of(ctx.read_view("cv_count"), "k", "cnt") == [
        ("a", 3), ("b", 1), ("c", 1)]


def test_avg_sum_min_max_across_batches(ctx):
    ctx.create_stream("s2", "k string, v double")
    ctx.create_view(
        "cv_stats",
        "SELECT k, avg(v) AS a, sum(v) AS s, min(v) AS lo, max(v) AS hi, "
        "count(v) AS n FROM s2 GROUP BY k")
    ctx.insert("s2", [{"k": "x", "v": 1.0}, {"k": "x", "v": 2.0},
                      {"k": "y", "v": 10.0}])
    ctx.insert("s2", [{"k": "x", "v": 3.0}, {"k": "y", "v": -10.0}])
    got = {r["k"]: r for r in ctx.read_view("cv_stats").collect()}
    assert got["x"]["a"] == pytest.approx(2.0)
    assert got["x"]["s"] == pytest.approx(6.0)
    assert got["x"]["lo"] == 1.0 and got["x"]["hi"] == 3.0
    assert got["y"]["a"] == pytest.approx(0.0)
    assert got["y"]["n"] == 2


def test_global_agg_no_group(ctx):
    ctx.create_stream("s3", "v long")
    ctx.create_view("cv_g", "SELECT count(*) AS cnt, sum(v) AS s FROM s3")
    ctx.insert("s3", [{"v": 1}, {"v": 2}])
    ctx.insert("s3", [{"v": 3}])
    row = ctx.read_view("cv_g").collect()
    assert len(row) == 1
    assert row[0]["cnt"] == 3 and row[0]["s"] == 6


def test_expr_of_aggs_and_where(ctx):
    ctx.create_stream("s4", "k string, v long")
    ctx.create_view(
        "cv_expr",
        "SELECT k, sum(v) / count(*) AS ratio, count(*) AS n "
        "FROM s4 WHERE v > 0 GROUP BY k")
    ctx.insert("s4", [{"k": "a", "v": 2}, {"k": "a", "v": 4},
                      {"k": "a", "v": -100}, {"k": "b", "v": 9}])
    got = {r["k"]: r for r in ctx.read_view("cv_expr").collect()}
    assert got["a"]["ratio"] == pytest.approx(3.0)
    assert got["a"]["n"] == 2
    assert got["b"]["ratio"] == pytest.approx(9.0)


def test_stddev_variance(ctx):
    ctx.create_stream("s5", "k string, v double")
    ctx.create_view(
        "cv_var",
        "SELECT k, var_samp(v) AS vs, stddev(v) AS sd, var_pop(v) AS vp "
        "FROM s5 GROUP BY k")
    vals = [1.0, 2.0, 3.0, 4.0, 10.0]
    ctx.insert("s5", [{"k": "a", "v": v} for v in vals[:3]])
    ctx.insert("s5", [{"k": "a", "v": v} for v in vals[3:]])
    import statistics
    row = ctx.read_view("cv_var").collect()[0]
    assert row["vs"] == pytest.approx(statistics.variance(vals))
    assert row["sd"] == pytest.approx(statistics.stdev(vals))
    assert row["vp"] == pytest.approx(statistics.pvariance(vals))


def test_bivar_corr_regr(ctx):
    ctx.create_stream("s6", "x double, y double")
    ctx.create_view(
        "cv_regr",
        "SELECT corr(y, x) AS c, regr_slope(y, x) AS m, "
        "regr_intercept(y, x) AS b, regr_count(y, x) AS n FROM s6")
    pts = [(1.0, 3.0), (2.0, 5.0), (3.0, 7.0), (4.0, 9.1)]
    ctx.insert("s6", [{"x": x, "y": y} for x, y in pts[:2]])
    ctx.insert("s6", [{"x": x, "y": y} for x, y in pts[2:]])
    row = ctx.read_view("cv_regr").collect()[0]
    import numpy as np
    xs = np.array([p[0] for p in pts]); ys = np.array([p[1] for p in pts])
    slope, intercept = np.polyfit(xs, ys, 1)
    assert row["m"] == pytest.approx(slope)
    assert row["b"] == pytest.approx(intercept)
    assert row["c"] == pytest.approx(np.corrcoef(xs, ys)[0, 1])
    assert row["n"] == 4


def test_distinct_and_set_agg(ctx):
    ctx.create_stream("s7", "k string, v long")
    ctx.create_view("cv_d", "SELECT DISTINCT k, v FROM s7")
    ctx.create_view(
        "cv_set",
        "SELECT k, set_agg(v) AS vals, exact_count_distinct(v) AS nd "
        "FROM s7 GROUP BY k")
    ctx.insert("s7", [{"k": "a", "v": 1}, {"k": "a", "v": 1},
                      {"k": "a", "v": 2}, {"k": "b", "v": 1}])
    ctx.insert("s7", [{"k": "a", "v": 2}, {"k": "a", "v": 3}])
    assert rows_of(ctx.read_view("cv_d"), "k", "v") == [
        ("a", 1), ("a", 2), ("a", 3), ("b", 1)]
    got = {r["k"]: r for r in ctx.read_view("cv_set").collect()}
    assert got["a"]["vals"] == [1, 2, 3]
    assert got["a"]["nd"] == 3


def test_keyed_min_max_first_values(ctx):
    ctx.create_stream("s8", "k string, ts long, v string")
    ctx.create_view(
        "cv_kmm",
        "SELECT k, keyed_min(ts, v) AS first_v, keyed_max(ts, v) AS last_v, "
        "first_values(2, ts) AS fv FROM s8 GROUP BY k")
    ctx.insert("s8", [{"k": "a", "ts": 5, "v": "e"}, {"k": "a", "ts": 1, "v": "x"}])
    ctx.insert("s8", [{"k": "a", "ts": 9, "v": "z"}, {"k": "a", "ts": 3, "v": "m"}])
    row = ctx.read_view("cv_kmm").collect()[0]
    assert row["first_v"] == "x" and row["last_v"] == "z"
    assert [r["c0"] for r in row["fv"]] == [1, 3]


def test_hll_count_distinct_rewrite(ctx):
    ctx.create_stream("s9", "k string, v long")
    ctx.create_view("cv_hll",
                    "SELECT k, count(DISTINCT v) AS ndv FROM s9 GROUP BY k")
    ctx.insert("s9", [{"k": "a", "v": i % 50} for i in range(500)])
    ctx.insert("s9", [{"k": "a", "v": i % 80} for i in range(500)])
    row = ctx.read_view("cv_hll").collect()[0]
    assert abs(row["ndv"] - 80) <= 2  # HLL estimate


def test_matrel_and_truncate(ctx):
    ctx.create_stream("s10", "k string, v long")
    ctx.create_view("cv_t", "SELECT k, count(*) AS n FROM s10 GROUP BY k")
    ctx.insert("s10", [{"k": "a", "v": 1}])
    m = ctx.read_matrel("cv_t")
    assert "n__n" in m.columns and "__bucket" in m.columns
    ctx.truncate_view("cv_t")
    assert ctx.read_view("cv_t").count() == 0
    ctx.insert("s10", [{"k": "b", "v": 1}])
    assert rows_of(ctx.read_view("cv_t"), "k", "n") == [("b", 1)]


def test_combine_read_rerollup(ctx):
    ctx.create_stream("s11", "g1 string, g2 string, v long")
    ctx.create_view(
        "cv_c", "SELECT g1, g2, avg(v) AS a, count(*) AS n "
                "FROM s11 GROUP BY g1, g2")
    ctx.insert("s11", [{"g1": "x", "g2": "p", "v": 1},
                       {"g1": "x", "g2": "q", "v": 3},
                       {"g1": "y", "g2": "p", "v": 10}])
    # combine() re-rollup to coarser grouping: avg must be weighted
    got = {r["g1"]: r for r in
           ctx.combine_read("cv_c", group_by=["g1"]).collect()}
    assert got["x"]["a"] == pytest.approx(2.0)
    assert got["x"]["n"] == 2
    # global combine
    row = ctx.combine_read("cv_c").collect()[0]
    assert row["a"] == pytest.approx(14.0 / 3.0)


def test_ddl_validation_errors(ctx):
    from pipelinedb_spark import CQError
    ctx.create_stream("s12", "k string, v long")
    ctx.create_stream("s12b", "k string, v long")
    with pytest.raises(CQError):
        ctx.create_view("bad1", "SELECT k, count(*) FROM s12 GROUP BY k HAVING count(*) > 1")
    with pytest.raises(CQError):
        ctx.create_view("bad2", "SELECT k FROM s12 ORDER BY k")
    with pytest.raises(CQError):
        ctx.create_view("bad3", "SELECT * FROM s12")
    with pytest.raises(CQError):
        ctx.create_view("bad4", "SELECT s12.k, count(*) FROM s12 JOIN s12b ON s12.k = s12b.k GROUP BY s12.k")
    with pytest.raises(CQError):
        ctx.create_view("bad5", "SELECT k, v FROM s12 GROUP BY k")
    with pytest.raises(CQError):
        ctx.create_view("bad6", "SELECT rank() OVER (ORDER BY v) FROM s12")


def test_unknown_stream_column_rejected_at_create(ctx):
    """CREATE-time worker-plan resolution: a CQ referencing a column
    the stream doesn't declare errors immediately (reference
    analyze_cont_view.sql 'column doesn't exist')."""
    import pytest
    from pipelinedb_spark import CQError
    ctx.create_stream("val1", "x int, key string")
    with pytest.raises(CQError, match="(?i)invalid continuous query"):
        ctx.create_view("cv_badcol",
                        "SELECT col, count(*) AS n FROM val1 GROUP BY col")
    # the failed create must leave no registration behind
    ctx.create_view("cv_goodcol",
                    "SELECT key, count(*) AS n FROM val1 GROUP BY key")
    ctx.insert("val1", [{"x": 1, "key": "a"}])
    assert ctx.read_view("cv_goodcol").collect()[0]["n"] == 1


def test_no_aggregate_append_cv(ctx):
    """No-aggregate CVs materialize every projected event row
    (reference create_cont_view.sql cqcreate0-2); duplicates are
    preserved as a multiset, and the sliding-window no-agg form
    (cqcreate5) expires rows with the window."""
    import time
    ctx.create_stream("ap_s", "key int, url string")
    ctx.create_view("cq0", "SELECT key FROM ap_s")
    ctx.create_view("cq1", "SELECT substring(url, 1, 2) AS su FROM ap_s")
    ctx.insert("ap_s", [{"key": 1, "url": "abc"},
                        {"key": 2, "url": "abd"}])
    ctx.insert("ap_s", [{"key": 1, "url": "zzz"}])
    assert sorted(r["key"] for r in ctx.read_view("cq0").collect()) \
        == [1, 1, 2]
    assert sorted(r["su"] for r in ctx.read_view("cq1").collect()) \
        == ["ab", "ab", "zz"]

    # SW no-agg CV (cqcreate5): rows leave the window
    ctx.create_view("cq5", "SELECT key FROM ap_s WHERE arrival_timestamp "
                           "> clock_timestamp() - interval '1 hour'")
    ctx.insert("ap_s", [{"key": 7, "url": "x"}, {"key": 7, "url": "y"}])
    assert sorted(r["key"] for r in ctx.read_view("cq5").collect()) == [7, 7]
    assert ctx.read_view("cq5", at=time.time() + 7200).count() == 0


def test_sanity_target_list_shapes(ctx):
    """cont_view_sanity.sql: aggregates before group columns in the
    target list, aggregates over expressions (max(x + y)), expressions
    OF aggregates (count(*) + sum(v)), and group-by-expression keys all
    materialize and merge correctly across batches."""
    ctx.create_stream("san1", "key string, value double, x int, y int, "
                              "k string, v int")
    ctx.create_view("cv_weird_tl",
                    "SELECT count(*) AS cnt, key, sum(value) AS s "
                    "FROM san1 GROUP BY key")
    ctx.create_view("cv_agg_of_expr",
                    "SELECT key, count(*) AS cnt, max(x + y) AS mxy "
                    "FROM san1 GROUP BY key")
    ctx.create_view("cv_expr_of_agg",
                    "SELECT k, count(*) + sum(v) AS cs FROM san1 "
                    "GROUP BY k")
    ctx.create_view("cv_grp_expr",
                    "SELECT count(*) AS cnt, substring(key, 1, 2) AS su "
                    "FROM san1 GROUP BY substring(key, 1, 2)")

    ctx.insert("san1", [
        {"key": "x", "value": 10.0, "x": -1000, "y": 1000, "k": "a", "v": 1},
        {"key": "x", "value": 20.0, "x": 0, "y": 1, "k": "a", "v": 2},
        {"key": "y", "value": 200.0, "x": 1, "y": 0, "k": "b", "v": 4},
    ])
    ctx.insert("san1", [
        {"key": "x", "value": 30.0, "x": 10, "y": 20, "k": "a", "v": 3},
        {"key": "z", "value": 1.0, "x": -1000, "y": 1001, "k": "b", "v": 5},
    ])

    weird = {r["key"]: (r["cnt"], r["s"])
             for r in ctx.read_view("cv_weird_tl").collect()}
    assert weird == {"x": (3, 60.0), "y": (1, 200.0), "z": (1, 1.0)}
    # column ORDER matches the declared target list
    assert ctx.read_view("cv_weird_tl").columns == ["cnt", "key", "s"]

    aoe = {r["key"]: r["mxy"]
           for r in ctx.read_view("cv_agg_of_expr").collect()}
    assert aoe == {"x": 30, "y": 1, "z": 1}

    eoa = {r["k"]: r["cs"] for r in ctx.read_view("cv_expr_of_agg").collect()}
    assert eoa == {"a": 3 + 6, "b": 2 + 9}

    # group-by-expression: 'x'/'y'/'z' all 1-char keys → su = key here;
    # add multi-char keys to actually exercise the substring
    ctx.insert("san1", [{"key": "aab", "value": 0.0, "x": 0, "y": 0,
                         "k": "c", "v": 0},
                        {"key": "aaz", "value": 0.0, "x": 0, "y": 0,
                         "k": "c", "v": 0}])
    gexp = {r["su"]: r["cnt"] for r in ctx.read_view("cv_grp_expr").collect()}
    assert gexp["aa"] == 2
