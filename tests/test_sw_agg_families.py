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
