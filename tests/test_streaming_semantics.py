"""Engine streaming semantics: transforms, output streams (old/new/
delta + chaining), sliding windows with decay, TTL reaper, stream-table
joins, hypothetical-set aggs, json aggs.

Mirrors reference tests cont_transform.sql, output_streams.sql,
delta_streams.sql, test_sliding_windows.py, ttl_expiration.sql,
stream_table_join.sql, cont_hs_agg.sql, cont_json_agg.sql.
"""

import time

import pytest
from pyspark.sql import functions as F


def test_transform_and_outputfunc(ctx):
    captured = []
    # reading the retained osrel tail with NO downstream reader needs
    # the history-retention opt-in (default emission is reader-gated,
    # reference src/combiner.c:1477-1489)
    ctx.track_output_streams = True
    ctx.create_stream("ts1", "x int, y int")
    ctx.create_transform(
        "t_double",
        "SELECT x * 2 AS x2, y FROM ts1 WHERE x > 0",
        outputfunc=lambda df: captured.append(df.count()))
    ctx.insert("ts1", [{"x": 1, "y": 10}, {"x": -5, "y": 20}, {"x": 3, "y": 30}])
    out = ctx.output_of("t_double")
    assert sorted((r["x2"], r["y"]) for r in out.collect()) == [(2, 10), (6, 30)]
    assert captured == [2]


def test_transform_chain_into_cv(ctx):
    """Transform output stream feeds a downstream CV (the
    insert_into_stream chaining pattern, reference stream_fdw.c:589)."""
    ctx.create_stream("ts2", "k string, v long")
    ctx.create_transform("t_filter", "SELECT k, v FROM ts2 WHERE v >= 10")
    ctx.create_view("cv_chain",
                    "SELECT k, count(*) AS n, sum(v) AS s "
                    "FROM output_of('t_filter') GROUP BY k")
    ctx.insert("ts2", [{"k": "a", "v": 5}, {"k": "a", "v": 15},
                       {"k": "b", "v": 20}])
    ctx.insert("ts2", [{"k": "a", "v": 25}])
    got = {r["k"]: r for r in ctx.read_view("cv_chain").collect()}
    assert got["a"]["n"] == 2 and got["a"]["s"] == 40
    assert got["b"]["n"] == 1 and got["b"]["s"] == 20


def test_output_stream_old_new_delta(ctx):
    ctx.track_output_streams = True  # no reader; keep the history tail
    ctx.create_stream("os1", "x int, y int")
    ctx.create_view("cv_os", "SELECT x, sum(y) AS s FROM os1 GROUP BY x")
    ctx.insert("os1", [{"x": 1, "y": 10}])
    ctx.insert("os1", [{"x": 1, "y": 5}, {"x": 2, "y": 7}])
    rows = ctx.output_of("cv_os").collect()
    # insert events: old is NULL; update events: old -> new with delta
    ins = [r for r in rows if r["old"] is None]
    upd = [r for r in rows if r["old"] is not None]
    assert {(r["new"]["x"], r["new"]["s"]) for r in ins} == {(1, 10), (2, 7)}
    assert len(upd) == 1
    u = upd[0]
    assert u["old"]["s"] == 10 and u["new"]["s"] == 15 and u["delta"]["s"] == 5


def test_noop_update_elision(ctx):
    """A batch that doesn't change a group's value must not emit an
    output-stream row for it (reference compare_slots combiner.c:731)."""
    ctx.track_output_streams = True  # no reader; keep the history tail
    ctx.create_stream("os2", "k string, v int")
    ctx.create_view("cv_min", "SELECT k, min(v) AS lo FROM os2 GROUP BY k")
    ctx.insert("os2", [{"k": "a", "v": 5}])
    ctx.insert("os2", [{"k": "a", "v": 9}])  # min unchanged
    rows = ctx.output_of("cv_min").collect()
    assert len(rows) == 1  # only the initial insert


def test_cv_over_cv_output_stream(ctx):
    """CV reading another CV's output stream (dataflow DAG)."""
    ctx.create_stream("os3", "k string, v long")
    ctx.create_view("cv_a", "SELECT k, count(*) AS n FROM os3 GROUP BY k")
    ctx.create_view("cv_updates",
                    "SELECT count(*) AS changes FROM output_of('cv_a')")
    ctx.insert("os3", [{"k": "a", "v": 1}])
    ctx.insert("os3", [{"k": "a", "v": 2}, {"k": "b", "v": 3}])
    # 1 insert event + (1 update + 1 insert) = 3 change rows
    assert ctx.read_view("cv_updates").collect()[0]["changes"] == 3


def test_sliding_window_decay(ctx):
    """SW values must decay as the window slides (reference
    test_sliding_windows.py:5-45): read at a later wall-clock 'now'."""
    ctx.create_stream("sw1", "k string, v long")
    ctx.create_view(
        "cv_sw",
        "SELECT k, count(*) AS n, sum(v) AS s FROM sw1 "
        "WHERE arrival_timestamp > clock_timestamp() - interval '30 seconds' "
        "GROUP BY k")
    cv = ctx.views["cv_sw"]
    assert cv.plan.sw_seconds == 30.0
    ctx.insert("sw1", [{"k": "a", "v": 1}, {"k": "a", "v": 2}])
    now = time.time()
    got = {r["k"]: r for r in ctx.read_view("cv_sw", at=now).collect()}
    assert got["a"]["n"] == 2 and got["a"]["s"] == 3
    # 2 minutes later every step is out of window
    later = now + 120
    assert ctx.read_view("cv_sw", at=later).count() == 0


def test_sliding_window_combine_equals_full(ctx):
    """combine() over a wide-enough SW CV equals the non-SW CV
    (reference test_sliding_windows.py equivalence check)."""
    ctx.create_stream("sw2", "k string, v long")
    ctx.create_view(
        "cv_sw_wide",
        "SELECT k, count(*) AS n FROM sw2 "
        "WHERE arrival_timestamp > clock_timestamp() - interval '1 hour' "
        "GROUP BY k")
    ctx.create_view("cv_all", "SELECT k, count(*) AS n FROM sw2 GROUP BY k")
    ctx.insert("sw2", [{"k": "a", "v": i} for i in range(10)])
    ctx.insert("sw2", [{"k": "b", "v": i} for i in range(5)])
    sw = {r["k"]: r["n"] for r in ctx.read_view("cv_sw_wide").collect()}
    full = {r["k"]: r["n"] for r in ctx.read_view("cv_all").collect()}
    assert sw == full


def test_ttl_reaper(ctx):
    ctx.create_stream("tt1", "k string, v long")
    ctx.create_view(
        "cv_ttl",
        "SELECT k, count(*) AS n FROM tt1 "
        "WHERE arrival_timestamp > clock_timestamp() - interval '10 seconds' "
        "GROUP BY k")
    ctx.insert("tt1", [{"k": "a", "v": 1}])
    assert ctx.read_matrel("cv_ttl").count() == 1
    # reap as if 10 minutes passed: everything expired
    deleted = ctx.reap_ttl("cv_ttl", now=time.time() + 600)
    assert deleted == 1
    assert ctx.read_matrel("cv_ttl").count() == 0


def test_stream_table_join(ctx, spark):
    """Stream-table join inside a CQ (reference stream_table_join.sql):
    one stream, static dimension, join in the worker."""
    dim = spark.createDataFrame(
        [(1, "gold"), (2, "silver")], ["uid", "tier"])
    ctx.register_table("users_dim", dim)
    ctx.create_stream("stj", "uid int, amount double")
    ctx.create_view(
        "cv_by_tier",
        "SELECT tier, count(*) AS n, sum(amount) AS total "
        "FROM stj JOIN users_dim ON stj.uid = users_dim.uid GROUP BY tier")
    ctx.insert("stj", [{"uid": 1, "amount": 10.0}, {"uid": 2, "amount": 5.0}])
    ctx.insert("stj", [{"uid": 1, "amount": 2.5}, {"uid": 99, "amount": 100.0}])
    got = {r["tier"]: r for r in ctx.read_view("cv_by_tier").collect()}
    assert got["gold"]["n"] == 2 and got["gold"]["total"] == 12.5
    assert got["silver"]["n"] == 1


def test_hypothetical_set_aggs(ctx):
    ctx.create_stream("hs1", "g string, x long")
    ctx.create_view(
        "cv_hs",
        "SELECT g, rank(50, x) AS rk, percent_rank(50, x) AS pr, "
        "cume_dist(50, x) AS cd FROM hs1 GROUP BY g")
    ctx.insert("hs1", [{"g": "a", "x": v} for v in [10, 20, 30, 40]])
    ctx.insert("hs1", [{"g": "a", "x": v} for v in [60, 70, 80, 90]])
    row = ctx.read_view("cv_hs").collect()[0]
    assert row["rk"] == 5            # 4 values below 50 → rank 5
    assert row["pr"] == pytest.approx(0.5)
    assert row["cd"] == pytest.approx(5 / 9)


def test_json_aggs(ctx):
    ctx.create_stream("js1", "k string, v long")
    ctx.create_view(
        "cv_json",
        "SELECT k, json_agg(v) AS arr, json_object_agg(v, v) AS obj "
        "FROM js1 GROUP BY k")
    ctx.insert("js1", [{"k": "a", "v": 1}, {"k": "a", "v": 2}])
    row = ctx.read_view("cv_json").collect()[0]
    import json
    assert sorted(json.loads(row["arr"])) == [1, 2]
    assert json.loads(row["obj"]) == {"1": 1, "2": 2}


def test_activate_deactivate(ctx):
    ctx.create_stream("ad1", "k string, v long")
    ctx.create_view("cv_ad", "SELECT k, count(*) AS n FROM ad1 GROUP BY k")
    ctx.insert("ad1", [{"k": "a", "v": 1}])
    ctx.deactivate("cv_ad")
    ctx.insert("ad1", [{"k": "a", "v": 2}])  # ignored while inactive
    ctx.activate("cv_ad")
    ctx.insert("ad1", [{"k": "a", "v": 3}])
    assert ctx.read_view("cv_ad").collect()[0]["n"] == 2


def test_delta_stream_typed_consumption(ctx):
    """Downstream CV aggregates typed fields of the change rows:
    summing (delta).n gives total row count (delta_streams.sql)."""
    ctx.create_stream("ds1", "k string, v long")
    ctx.create_view("cv_base", "SELECT k, count(*) AS n FROM ds1 GROUP BY k")
    ctx.create_view(
        "cv_from_delta",
        "SELECT sum(delta.n) AS total_rows, count(*) AS n_changes "
        "FROM output_of('cv_base')")
    ctx.insert("ds1", [{"k": "a", "v": 1}, {"k": "b", "v": 2}])
    ctx.insert("ds1", [{"k": "a", "v": 3}])
    row = ctx.read_view("cv_from_delta").collect()[0]
    assert row["total_rows"] == 3  # deltas sum to total inserted rows
    assert row["n_changes"] == 3   # 2 inserts + 1 update


def test_delta_stream_postgres_field_syntax(ctx):
    """Reference syntax `(delta).col` / `(new).col` (delta_streams.sql)
    normalizes to Spark struct access in downstream CQs."""
    ctx.create_stream("ds2", "k string, v long")
    ctx.create_view("cv_base2", "SELECT k, sum(v) AS s FROM ds2 GROUP BY k")
    ctx.create_view(
        "cv_pg_delta",
        "SELECT sum((delta).s) AS dsum, max((new).s) AS peak "
        "FROM output_of('cv_base2')")
    ctx.insert("ds2", [{"k": "a", "v": 10}])
    ctx.insert("ds2", [{"k": "a", "v": 5}])
    row = ctx.read_view("cv_pg_delta").collect()[0]
    assert row["dsum"] == 15 and row["peak"] == 15


def test_sw_expiration_vacuum(ctx):
    """sw_expiration.sql: a sliding-window CV's matrel accumulates
    per-step rows beyond the visible window; ttl_expire (the vacuum
    analog) deletes expired step buckets without changing in-window
    reads, and the view repopulates after new inserts.  Window
    evaluation time is injected (read_view(at=...), reap_ttl(now=...))
    so the test is latency-independent."""
    import time

    ctx.create_stream("swx", "key string")
    ctx.create_view(
        "sw_vac",
        "SELECT key, count(*) AS n FROM swx "
        "WHERE arrival_timestamp > clock_timestamp() - interval '30 second' "
        "GROUP BY key")
    for _ in range(2):
        ctx.insert("swx", [{"key": k} for k in "abc"])
    time.sleep(0.5)
    for _ in range(2):
        ctx.insert("swx", [{"key": k} for k in "abc"])
    t_mid = time.time()
    got = {r["key"]: r["n"]
           for r in ctx.read_view("sw_vac", at=t_mid).collect()}
    assert got == {"a": 4, "b": 4, "c": 4}
    # out-of-window but unreaped: view (at a later clock) is empty
    # while the matrel still holds the step rows (regress's
    # "count(view) < count(mrel)" probe)
    later = t_mid + 120
    assert ctx.read_view("sw_vac", at=later).count() == 0
    n_mrel = ctx.read_matrel("sw_vac").count()
    assert n_mrel >= 3
    # reap with everything still in-window: nothing deleted
    assert ctx.reap_ttl("sw_vac", now=t_mid) == 0
    # the implicit SW TTL (window + 2 steps) lapses at the later clock
    assert ctx.reap_ttl("sw_vac", now=later) == n_mrel
    assert ctx.read_matrel("sw_vac").count() == 0
    # the view repopulates from fresh inserts after the vacuum
    ctx.insert("swx", [{"key": "a"}, {"key": "b"}])
    got = {r["key"]: r["n"] for r in ctx.read_view("sw_vac").collect()}
    assert got == {"a": 1, "b": 1}


def test_delta_stream_combine_states(ctx, spark):
    """Mirror of reference delta_streams.sql delta1-delta7: downstream
    CVs combining DELTA STREAMS re-merge the upstream PARTIAL STATES
    (hidden delta_states struct), so weighted avg, COUNT DISTINCT and
    sketch unions are exact — finalized delta values alone could not
    give these results (avg of avgs)."""
    from pipelinedb_spark import CQError, register_sketch_aggs
    register_sketch_aggs()
    ctx.create_stream("dcs", "x int, y int")
    ctx.create_view("dl1", "SELECT x, count(*) AS count, sum(y) AS sum, "
                           "avg(x + y) AS avg FROM dcs GROUP BY x")
    ctx.create_view("dl2", "SELECT combine((delta).count) AS count, "
                           "combine((delta).sum) AS sum, "
                           "combine((delta).avg) AS avg "
                           "FROM output_of('dl1')")
    ctx.insert("dcs", [{"x": v % 10, "y": v} for v in range(1, 101)])
    r = ctx.read_view("dl2").collect()[0]
    # expected/delta_streams.out:18-21
    assert (r["count"], r["sum"], r["avg"]) == (100, 5050, 55.0)
    ctx.insert("dcs", [{"x": v % 10, "y": v} for v in range(1, 101)])
    r = ctx.read_view("dl2").collect()[0]
    # expected/delta_streams.out:24-27: avg stays 55 (weighted!)
    assert (r["count"], r["sum"], r["avg"]) == (200, 10100, 55.0)
    # sketch-state combine across groups (delta5/delta6)
    ctx.create_view("dl5", "SELECT x, bloom_agg(y) AS bloom_agg "
                           "FROM dcs GROUP BY x")
    ctx.create_view("dl6", "SELECT (new).x % 2 AS x, "
                           "combine((delta).bloom_agg) AS bloom_agg "
                           "FROM output_of('dl5') GROUP BY x")
    ctx.insert("dcs", [{"x": v % 10, "y": v} for v in range(1, 101)])
    got = {r["x"]: r["c"] for r in ctx.sql(
        "SELECT x, bloom_cardinality(bloom_agg) AS c FROM dl6 "
        "ORDER BY x").collect()}
    assert got == {0: 50, 1: 50}  # expected/delta_streams.out delta6
    # STJ with delta streams (delta7)
    ctx.register_table("dl_t", spark.createDataFrame(
        [(i,) for i in range(1, 11)], "x int"))
    ctx.create_view("dl7",
                    "SELECT t.x AS x, combine((os.delta).count) AS count, "
                    "combine((os.delta).sum) AS sum "
                    "FROM dl1_osrel os JOIN dl_t t ON (os.delta).x = t.x "
                    "GROUP BY t.x")
    ctx.insert("dcs", [{"x": v % 10, "y": v} for v in range(1, 101)])
    r = ctx.sql("SELECT combine(count) AS count, combine(sum) AS sum "
                "FROM dl7").collect()[0]
    assert (r["count"], r["sum"]) == (90, 4500)
    # SWs don't have delta streams (delta_streams.sql:4-5)
    ctx.create_view("dl_sw", "SELECT x, count(*) AS count FROM dcs "
                    "WHERE arrival_timestamp > clock_timestamp() - "
                    "interval '1 hour' GROUP BY x")
    with pytest.raises(CQError, match='column "delta" does not exist'):
        ctx.create_view("dl0", "SELECT combine((delta).count) AS n "
                               "FROM output_of('dl_sw')")


def test_insert_into_stream_outputfunc(ctx):
    """Mirror of reference cont_transform.sql ct0/ct1: a transform
    with outputfunc=insert_into_stream('target') forwards its output
    rows positionally into the target stream, feeding that stream's
    CVs; invalid output shapes fail at CREATE (ct_invalid cases)."""
    from pipelinedb_spark import CQError

    ctx.create_stream("ct_s0", "x int")
    ctx.create_stream("ct_s1", "x int")
    ctx.create_view("ct0", "SELECT x, count(*) AS count FROM ct_s0 "
                           "GROUP BY x")
    ctx.create_transform(
        "ct1", "SELECT x % 4 AS x FROM ct_s1 WHERE x > 10 AND x < 50",
        outputfunc=ctx.insert_into_stream("ct_s0"))
    ctx.insert("ct_s1", [{"x": v} for v in range(0, 101)])
    got = {r["x"]: r["count"] for r in ctx.read_view("ct0").collect()}
    assert got == {0: 10, 1: 10, 2: 9, 3: 10}  # residues of 11..49
    # validation: arity / type mismatches error at CREATE
    ctx.create_stream("ct_s", "x int, y string")
    with pytest.raises(CQError, match="does not match|columns"):
        ctx.create_transform(
            "ct_invalid", "SELECT y, x FROM ct_s",
            outputfunc=ctx.insert_into_stream("ct_s"))
    with pytest.raises(CQError, match="expects"):
        ctx.create_transform(
            "ct_invalid2", "SELECT x FROM ct_s",
            outputfunc=ctx.insert_into_stream("ct_s"))
    ctx.create_transform(   # int + text literal: valid (ct_valid)
        "ct_valid", "SELECT x, 'a' AS s FROM ct_s",
        outputfunc=ctx.insert_into_stream("ct_s"))
    with pytest.raises(CQError, match="unknown stream"):
        ctx.insert_into_stream("nope")


def test_non_aggregate_sliding_window_cv(ctx):
    """Mirror of reference pipeline_regress.sql: a projection-only CV
    with a sliding-window predicate (>= and parenthesized window expr)
    shows rows while in-window and expires them after; the second(ts)
    truncation form (our second_trunc) groups by second."""
    import time

    ctx.create_stream("prs", "user_id int, page_id int")
    ctx.create_view(
        "pr_v",
        "SELECT user_id, page_id, arrival_timestamp AS ts FROM prs "
        "WHERE arrival_timestamp >= "
        "(clock_timestamp() - interval '90 minutes')")
    ctx.insert("prs", [{"user_id": 1, "page_id": 1}])
    ctx.insert("prs", [{"user_id": 2, "page_id": 2}])
    got = sorted((r["user_id"], r["page_id"])
                 for r in ctx.read_view("pr_v").collect())
    assert got == [(1, 1), (2, 2)]
    assert ctx.read_view("pr_v", at=time.time() + 7200).count() == 0
    # the aggregate variant with second-granularity grouping
    ctx.create_stream("prs2", "foobar string")
    ctx.create_view(
        "pr_agg",
        "SELECT second_trunc(arrival_timestamp) AS secondstamp, foobar, "
        "count(*) AS count FROM prs2 "
        "WHERE arrival_timestamp > clock_timestamp() - interval '7 day' "
        "GROUP BY second_trunc(arrival_timestamp), foobar")
    ctx.insert("prs2", [{"foobar": "foo"}, {"foobar": "foo"}])
    ctx.insert("prs2", [{"foobar": "foo"}, {"foobar": "bar"}])
    counts = {}
    for r in ctx.read_view("pr_agg").collect():
        counts[r["foobar"]] = counts.get(r["foobar"], 0) + r["count"]
    assert counts == {"foo": 3, "bar": 1}


def test_sw_predicate_over_timestamp_expression(ctx):
    """Reference pipeline_regress.sql sw_ts_expr2: the sliding-window
    predicate may wrap the timestamp in a function call; the window
    and step bucketing follow the expression."""
    import time

    ctx.create_stream("swe", "x int")
    ctx.create_view(
        "sw_expr",
        "SELECT minute_trunc(arrival_timestamp) AS m, count(*) AS count "
        "FROM swe WHERE minute_trunc(arrival_timestamp) > "
        "clock_timestamp() - interval '5 minute' "
        "GROUP BY minute_trunc(arrival_timestamp)")
    ctx.insert("swe", [{"x": 1}, {"x": 1}])
    ctx.insert("swe", [{"x": 1}, {"x": 1}])
    assert sum(r["count"] for r in ctx.read_view("sw_expr").collect()) == 4
    assert ctx.read_view("sw_expr", at=time.time() + 600).count() == 0


def test_delta_combine_with_commit_interval_and_filter(spark, tmp_path):
    """Cross-feature: delta-stream combine stays exact when the
    upstream commits every N batches (accumulated deltas emit at the
    commit) and when the upstream aggregate carries a FILTER clause."""
    from pipelinedb_spark import PipelineContext

    ctx = PipelineContext(spark, root=str(tmp_path / "dci"),
                          num_buckets=8, commit_interval_batches=2)
    ctx.create_stream("dsI", "x int, y int")
    ctx.create_view("uI", "SELECT x, count(*) AS c, avg(y) AS a "
                          "FROM dsI GROUP BY x")
    ctx.create_view("dI", "SELECT combine((delta).c) AS c, "
                          "combine((delta).a) AS a FROM output_of('uI')")
    ctx.insert("dsI", [{"x": v % 5, "y": v} for v in range(50)])
    ctx.insert("dsI", [{"x": v % 5, "y": v} for v in range(50, 100)])
    r = ctx.read_view("dI").collect()[0]
    assert (r["c"], r["a"]) == (100, 49.5)  # exact weighted avg

    ctx2 = PipelineContext(spark, root=str(tmp_path / "dcf"),
                           num_buckets=8)
    ctx2.create_stream("fsF", "x int, y int")
    ctx2.create_view("uF", "SELECT x, count(*) FILTER (WHERE y > 10) "
                           "AS big FROM fsF GROUP BY x")
    ctx2.create_view("dF", "SELECT combine((delta).big) AS big "
                           "FROM output_of('uF')")
    ctx2.insert("fsF", [{"x": v % 3, "y": v} for v in range(30)])
    assert ctx2.read_view("dF").collect()[0]["big"] == 19
    ctx2.close()
