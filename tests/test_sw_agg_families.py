"""Sliding-window twins of each aggregate family: a wide-window SW CV
must equal its non-SW twin while all data is in-window, and the
re-combined overlay must finalize correctly across step buckets.

Mirrors the reference's cont_sw_avg.sql / cont_sw_sum.sql /
cont_sw_count.sql / cont_sw_min_max.sql / cont_sw_regr.sql /
cont_sw_stats.sql twins.
"""

import math

import pytest

AGG_EXPRS = [
    ("count(*) AS n", lambda vals: len(vals)),
    ("sum(v) AS s", lambda vals: sum(vals)),
    ("avg(v) AS a", lambda vals: sum(vals) / len(vals)),
    ("min(v) AS lo", lambda vals: min(vals)),
    ("max(v) AS hi", lambda vals: max(vals)),
    ("stddev_samp(v) AS sd", None),
    ("var_pop(v) AS vp", None),
    ("exact_count_distinct(v) AS ndv", lambda vals: len(set(vals))),
]

VALUES = {
    "a": [1.0, 2.0, 2.0, 5.0, -3.0],
    "b": [10.0, 10.0, 40.0],
}


@pytest.mark.parametrize("agg_sql,expected_fn",
                         AGG_EXPRS, ids=[a.split("(")[0] + "_" + a.split(" AS ")[1]
                                         for a, _ in AGG_EXPRS])
def test_sw_equals_batch(ctx, agg_sql, expected_fn):
    name = agg_sql.split(" AS ")[1]
    stream = f"sws_{name}"
    ctx.create_stream(stream, "k string, v double")
    ctx.create_view(
        f"cv_sw_{name}",
        f"SELECT k, {agg_sql} FROM {stream} "
        "WHERE arrival_timestamp > clock_timestamp() - interval '1 hour' "
        "GROUP BY k")
    ctx.create_view(
        f"cv_full_{name}",
        f"SELECT k, {agg_sql} FROM {stream} GROUP BY k")
    # two batches so states actually merge across steps
    for chunk in (slice(0, 2), slice(2, None)):
        rows = [{"k": k, "v": v} for k, vs in VALUES.items()
                for v in vs[chunk]]
        ctx.insert(stream, rows)

    sw = {r["k"]: r[name] for r in ctx.read_view(f"cv_sw_{name}").collect()}
    full = {r["k"]: r[name] for r in ctx.read_view(f"cv_full_{name}").collect()}
    assert set(sw) == set(full) == set(VALUES)
    for k in VALUES:
        if isinstance(sw[k], float):
            assert sw[k] == pytest.approx(full[k], rel=1e-12), (name, k)
        else:
            assert sw[k] == full[k], (name, k)
        if expected_fn is not None:
            assert full[k] == pytest.approx(expected_fn(VALUES[k])), (name, k)


def test_sw_regr_twin(ctx):
    import numpy as np
    ctx.create_stream("sws_regr", "x double, y double")
    agg = ("corr(y, x) AS c, regr_slope(y, x) AS m, "
           "regr_intercept(y, x) AS b")
    ctx.create_view(
        "cv_sw_regr",
        f"SELECT {agg} FROM sws_regr "
        "WHERE arrival_timestamp > clock_timestamp() - interval '1 hour'")
    ctx.create_view("cv_full_regr", f"SELECT {agg} FROM sws_regr")
    pts = [(1.0, 2.9), (2.0, 5.2), (3.0, 6.8), (4.0, 9.3), (5.0, 10.9)]
    ctx.insert("sws_regr", [{"x": x, "y": y} for x, y in pts[:3]])
    ctx.insert("sws_regr", [{"x": x, "y": y} for x, y in pts[3:]])
    sw = ctx.read_view("cv_sw_regr").collect()[0]
    full = ctx.read_view("cv_full_regr").collect()[0]
    xs = np.array([p[0] for p in pts]); ys = np.array([p[1] for p in pts])
    slope, intercept = np.polyfit(xs, ys, 1)
    for field, want in (("c", np.corrcoef(xs, ys)[0, 1]),
                        ("m", slope), ("b", intercept)):
        assert sw[field] == pytest.approx(full[field], rel=1e-12)
        assert full[field] == pytest.approx(want)


def test_sw_collapses_step_buckets(ctx):
    """Rows landing in different step buckets must re-combine into one
    overlay row per group on read (reference view_combines,
    src/analyzer.c:2798-2805) — regression: merge keyed on _step
    returned one row per bucket."""
    import datetime
    ctx.create_stream("sws_steps", "k string, v double")
    ctx.create_view(
        "cv_sw_steps",
        "SELECT k, count(*) AS n, sum(v) AS sv, avg(v) AS av FROM sws_steps "
        "WHERE arrival_timestamp > clock_timestamp() - interval '1 hour' "
        "GROUP BY k")
    now = datetime.datetime.now(datetime.timezone.utc)
    mins = datetime.timedelta(minutes=1)
    # 1-hour window -> 3-minute steps; 30 and 20 minutes ago differ
    ctx.insert("sws_steps", [
        {"k": "x", "v": 1.0, "arrival_timestamp": now - 30 * mins},
        {"k": "y", "v": 7.0, "arrival_timestamp": now - 30 * mins}])
    ctx.insert("sws_steps", [
        {"k": "x", "v": 2.0, "arrival_timestamp": now - 20 * mins}])
    ctx.insert("sws_steps", [  # out of window: must not count
        {"k": "x", "v": 100.0, "arrival_timestamp": now - 180 * mins}])
    rows = sorted(tuple(r) for r in ctx.read_view("cv_sw_steps").collect())
    assert rows == [("x", 2, 3.0, 1.5), ("y", 1, 7.0, 7.0)]


def test_sw_with_grouping_sets(ctx):
    """Sliding window combined with GROUPING SETS: per-set rows keep
    their grouping_id while step buckets re-combine on read
    (reference cont_grouping_sets.sql + sliding windows,
    src/analyzer.c:2819-2859)."""
    import datetime
    ctx.create_stream("swgs", "x string, y string, v double")
    ctx.create_view(
        "cv_swgs",
        "SELECT x, y, count(*) AS n, sum(v) AS s FROM swgs "
        "WHERE arrival_timestamp > clock_timestamp() - interval '1 hour' "
        "GROUP BY GROUPING SETS ((x, y), (x), ())")
    now = datetime.datetime.now(datetime.timezone.utc)
    mins = datetime.timedelta(minutes=1)
    ctx.insert("swgs", [
        {"x": "a", "y": "p", "v": 1.0, "arrival_timestamp": now - 30 * mins},
        {"x": "a", "y": "q", "v": 2.0, "arrival_timestamp": now - 30 * mins}])
    ctx.insert("swgs", [  # different step bucket
        {"x": "b", "y": "p", "v": 4.0, "arrival_timestamp": now - 20 * mins},
        {"x": "a", "y": "p", "v": 8.0, "arrival_timestamp": now - 20 * mins}])
    ctx.insert("swgs", [  # out of window
        {"x": "a", "y": "p", "v": 100.0,
         "arrival_timestamp": now - 240 * mins}])
    rows = {(r["x"], r["y"]): (r["n"], r["s"])
            for r in ctx.read_view("cv_swgs").collect()}
    assert rows[("a", "p")] == (2, 9.0)
    assert rows[("a", "q")] == (1, 2.0)
    assert rows[("b", "p")] == (1, 4.0)
    assert rows[("a", None)] == (3, 11.0)
    assert rows[("b", None)] == (1, 4.0)
    assert rows[(None, None)] == (4, 15.0)
    assert len(rows) == 6


def test_sw_ordered_and_hypothetical_sets(ctx):
    """SW twins of the ordered-set and hypothetical-set rewrites plus
    bool/object aggs (reference cont_sw_os_agg.sql, cont_sw_hs_agg.sql,
    cont_sw_bool_agg.sql, cont_sw_object_agg.sql): with every row
    in-window, the SW overlay (t-digest / counter states re-combined
    across step buckets) must match the batch answer."""
    from pipelinedb_spark import register_sketch_aggs
    register_sketch_aggs()

    ctx.create_stream("swos", "k string, v double")
    ctx.create_view(
        "cv_swos",
        "SELECT k, percentile_cont(0.5) WITHIN GROUP (ORDER BY v) AS med, "
        "rank(3.0) WITHIN GROUP (ORDER BY v) AS rk, "
        "cume_dist(3.0) WITHIN GROUP (ORDER BY v) AS cd, "
        "bool_and(v > 0) AS all_pos, bool_or(v > 90) AS any_big "
        "FROM swos "
        "WHERE arrival_timestamp > clock_timestamp() - interval '1 hour' "
        "GROUP BY k")
    vals = {"a": [1.0, 2.0, 3.0, 4.0, 100.0], "b": [5.0, -7.0, 9.0]}
    rows = [{"k": k, "v": v} for k, vs in vals.items() for v in vs]
    ctx.insert("swos", rows[: len(rows) // 2])
    ctx.insert("swos", rows[len(rows) // 2:])
    got = {r["k"]: r for r in ctx.read_view("cv_swos").collect()}
    # exact medians at this size (t-digest is exact for tiny inputs)
    assert abs(got["a"]["med"] - 3.0) < 0.3
    assert abs(got["b"]["med"] - 5.0) < 0.5
    # hypothetical rank of 3.0: count_less + 1
    assert got["a"]["rk"] == 3 and got["b"]["rk"] == 2
    assert abs(got["a"]["cd"] - 4 / 6) < 1e-9   # (leq + 1)/(n + 1)
    assert got["a"]["all_pos"] is True and got["b"]["all_pos"] is False
    assert got["a"]["any_big"] is True and got["b"]["any_big"] is False
