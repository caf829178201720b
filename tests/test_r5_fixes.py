"""Round-5 hardening regressions: user-overridden quality rules are
honored; matrel version extraction anchors to the store dir (a CV
named like a version dir must not break multi-version reads); one
failing view in a batch no longer starves committed siblings of their
output-stream deltas; re-binding a replayed python transform
refreshes its empty output-stream schema."""

import os

import pytest
from pyspark.sql import functions as F


def test_quality_rule_override_is_honored(spark):
    from pipelinedb_spark.operators.quality import (
        GOPHER_RULES, duplicate_line_fraction, quality_flags)

    df = spark.createDataFrame(
        [(1, "same line\nsame line\nsame line\nother line")],
        "doc_id long, text string")
    # stock rule (threshold 0.30) fails this doc
    strict = quality_flags(
        df, rules={"dup_line_frac": GOPHER_RULES["dup_line_frac"]})
    assert strict.collect()[0]["ok_dup_line_frac"] is False
    # a user-supplied lambda under the SAME built-in name must be
    # evaluated, not silently replaced by the stock definition
    loose = quality_flags(
        df, rules={"dup_line_frac":
                   lambda t: duplicate_line_fraction(t) <= 0.95})
    row = loose.collect()[0]
    assert row["ok_dup_line_frac"] is True
    assert row["passes_quality"] is True


def test_cv_named_like_version_dir_reads_multi_version(ctx):
    """Store dir name 'v2' matches the version-dir pattern; the
    version extraction must take the dir CONTAINING the file, not the
    first /vN/ in the absolute path (which here is the store itself
    and would drop every older-version row from reads)."""
    ctx.create_stream("vs", "k string, v long")
    ctx.create_view("v2", "SELECT k, sum(v) AS s FROM vs GROUP BY k")
    ctx.insert("vs", [{"k": f"k{j}", "v": 1} for j in range(64)])
    ctx.insert("vs", [{"k": "k0", "v": 10}])  # rewrites one bucket
    store = ctx.views["v2"].matrel
    import json
    with open(os.path.join(store.dir, "MANIFEST")) as f:
        manifest = json.load(f)["buckets"]
    vdirs = {os.path.relpath(p, store.dir).split(os.sep)[0]
             for p in manifest.values()}
    assert len(vdirs) >= 2  # the multi-path validity-join read path
    got = {r["k"]: r["s"] for r in ctx.read_view("v2").collect()}
    exp = {f"k{j}": 1 for j in range(64)}
    exp["k0"] = 11
    assert got == exp


def test_sibling_view_emits_when_one_view_fails(ctx):
    ctx.create_stream("pf", "k string, v long")
    ctx.create_view("pf_a", "SELECT k, sum(v) AS s FROM pf GROUP BY k")
    ctx.create_view("pf_b", "SELECT k, count(*) AS n FROM pf GROUP BY k")
    # downstream CQ observes pf_a's deltas — with the old all-or-
    # nothing dispatch, pf_b's crash skipped this emission entirely
    ctx.create_view("pf_down",
                    "SELECT count(*) AS n FROM output_of('pf_a')")

    def boom(*a, **k):
        raise RuntimeError("combiner crash")

    ctx.views["pf_b"].process_batch = boom
    with pytest.raises(RuntimeError, match="combiner crash"):
        ctx.insert("pf", [{"k": "a", "v": 1}])
    # sibling committed AND emitted: the downstream CV saw the delta
    assert ctx.read_view("pf_a").collect()[0]["s"] == 1
    assert ctx.read_view("pf_down").collect()[0]["n"] == 1
    assert ctx.views["pf_b"].stats.errors == 1


def test_rebind_refreshes_empty_osrel_schema(spark, tmp_path):
    from pipelinedb_spark import PipelineContext

    root = str(tmp_path / "pdb_sch")
    ctx = PipelineContext(spark, root=root, num_buckets=8)
    ctx.create_stream("s1", "k string, v long")
    ctx.create_python_transform(
        "up", "s1", lambda df: df.withColumn("v", F.col("v") + 1))

    ctx2 = PipelineContext(spark, root=root, num_buckets=8)
    assert not ctx2.streams["up_osrel"].schema.fields  # lambda unbound
    ctx2.set_transform_fn(
        "up", lambda df: df.withColumn("v", F.col("v") + 1))
    names = [f.name for f in ctx2.streams["up_osrel"].schema.fields]
    assert names[:2] == ["k", "v"]  # (+ implicit arrival_timestamp)
    # CREATE over output_of must validate against the refreshed schema
    # BEFORE any batch has flowed
    ctx2.create_view("cv_up",
                     "SELECT k, sum(v) AS s FROM output_of('up') "
                     "GROUP BY k")
    ctx2.insert("s1", [{"k": "a", "v": 1}])
    assert ctx2.read_view("cv_up").collect()[0]["s"] == 2
    ctx2.close()


def test_combine_validation_errors(ctx, spark):
    """Reference targeted errors (user_combine.sql:8-22 /
    expected/user_combine.out:8-22)."""
    from pipelinedb_spark import CQError

    ctx.create_stream("ucv", "k string, x long")
    ctx.create_view("cv_val", "SELECT k, avg(x) AS a FROM ucv GROUP BY k")
    ctx.insert("ucv", [{"k": "a", "x": 1}])
    # combine only accepts a single colref as an argument
    with pytest.raises(CQError, match="single aggregate column"):
        ctx.sql("SELECT combine(a + 1) FROM cv_val")
    with pytest.raises(CQError, match="does not exist"):
        ctx.sql("SELECT combine(a, a) FROM cv_val")
    # combine isn't allowed on tables
    ctx.register_table("plain_t", spark.createDataFrame(
        [(0,), (1,), (2,)], "v long"))
    with pytest.raises(CQError, match="not a continuous view"):
        ctx.sql("SELECT combine(v) FROM plain_t")
    # combine is only allowed on aggregate columns
    with pytest.raises(CQError, match="not an aggregate column"):
        ctx.sql("SELECT combine(k) FROM cv_val")
    # column doesn't exist
    with pytest.raises(CQError, match='column "nothere" does not exist'):
        ctx.sql("SELECT combine(nothere) FROM cv_val")


def test_sw_combine_token(ctx):
    """sw_combine() is registered alongside combine() in the reference
    (pipelinedb--1.0.0.sql:135-140); over a SW CV both window-filter
    the states before re-merging."""
    ctx.create_stream("swc", "k string, v long")
    ctx.create_view(
        "cv_swc",
        "SELECT k, count(*) AS n FROM swc "
        "WHERE arrival_timestamp > clock_timestamp() - interval '1 hour' "
        "GROUP BY k")
    ctx.insert("swc", [{"k": "a", "v": i} for i in range(7)])
    ctx.insert("swc", [{"k": "b", "v": i} for i in range(3)])
    a = ctx.sql("SELECT sw_combine(n) AS n FROM cv_swc").collect()[0]["n"]
    b = ctx.sql("SELECT combine(n) AS n FROM cv_swc").collect()[0]["n"]
    assert a == b == 10


def test_combine_detection_is_relation_based(ctx, spark):
    """A table COLUMN alias named like a CV must not trigger the
    combine rewrite; with no CV relation and no combine() call the
    query runs as plain SQL."""
    ctx.create_stream("rb", "k string, v long")
    ctx.create_view("cv_rb", "SELECT k, sum(v) AS s FROM rb GROUP BY k")
    ctx.insert("rb", [{"k": "a", "v": 5}])
    # a plain table whose COLUMN is named exactly like the CV
    ctx.register_table("dim_rb", spark.createDataFrame(
        [("a", 1)], ["cv_rb", "w"]))
    # FROM references only the table; 'cv_rb' appears as a column —
    # must run as plain SQL (no combine present)
    got = ctx.sql("SELECT cv_rb, w FROM dim_rb").collect()
    assert [(r["cv_rb"], r["w"]) for r in got] == [("a", 1)]
    # and WITH a combine() call on that shape → table error, not a
    # silent rewrite against the unrelated CV
    from pipelinedb_spark import CQError
    with pytest.raises(CQError, match="not a continuous view"):
        ctx.sql("SELECT combine(w) FROM dim_rb")


def test_malformed_combine_surfaces_analysis_error(ctx):
    """A validated combine query with a bad WHERE column surfaces the
    underlying analysis error instead of falling through to plain SQL
    (old behavior: generic unresolved-combine error)."""
    from pipelinedb_spark import CQError

    ctx.create_stream("mf", "k string, v long")
    ctx.create_view("cv_mf", "SELECT k, sum(v) AS s FROM mf GROUP BY k")
    ctx.insert("mf", [{"k": "a", "v": 1}])
    with pytest.raises(CQError, match="invalid combine query"):
        ctx.sql("SELECT combine(s) FROM cv_mf WHERE no_such_col > 0")


def test_auto_compaction_bounds_disk_under_churn(ctx, spark):
    """Continuous merge churn with a never-touched cold bucket: the
    cold bucket pins its version dir, so the hot buckets' superseded
    rows in that dir are dead bytes no GC reclaims.  The reaper's
    stale-ratio trigger must compact automatically and keep on-disk
    bytes within a constant factor of live data — no manual compact()
    calls."""
    from pipelinedb_spark.matrel import _du
    from pipelinedb_spark.streaming.runtime import TTLReaper

    ctx.create_stream("ac", "k string, v long")
    ctx.create_view("cv_ac",
                    "SELECT k, count(*) AS n, sum(v) AS s "
                    "FROM ac GROUP BY k")
    store = ctx.views["cv_ac"].matrel
    store.gc_grace_seconds = 0  # synchronous churn: no racing readers
    # partition candidate keys by matrel bucket so hot churn never
    # touches the cold bucket
    pad = "x" * 2000
    cand = [f"key{i:04d}_{pad}" for i in range(120)] + \
           [f"c{i}" for i in range(40)]
    bmap = {r["k"]: r["b"] for r in
            spark.createDataFrame([(k,) for k in cand], "k string")
            .select("k", store.bucket_expr(["k"]).alias("b")).collect()}
    cold_bucket = bmap[f"c{0}"]
    cold = [k for k in cand if bmap[k] == cold_bucket
            and k.startswith("c")][:3]
    hot = [k for k in cand if bmap[k] != cold_bucket
           and k.startswith("key")][:60]
    assert cold and len(hot) >= 40
    reaper = TTLReaper(ctx, interval_seconds=3600,
                       compact_stale_ratio=0.5)  # driven synchronously
    rounds = 6
    ctx.insert("ac", [{"k": k, "v": 1} for k in cold + hot])
    reaper.reap_once()
    for _ in range(rounds - 1):
        ctx.insert("ac", [{"k": k, "v": 1} for k in hot])
        reaper.reap_once()
    assert reaper.compactions >= 1, "stale-ratio trigger never fired"
    live, stale = store.stale_stats()
    # bounded amplification: dead bytes stay under ratio x live (plus
    # the transient <=2-version GC tail the estimate counts as stale)
    assert stale <= 1.5 * live, (live, stale)
    assert _du(store.dir) <= 4 * max(live, 1)
    # correctness across compactions: cold rows intact, hot counts
    # accumulated through every round
    got = {r["k"]: (r["n"], r["s"])
           for r in ctx.read_view("cv_ac").collect()}
    for k in cold:
        assert got[k] == (1, 1), k
    for k in hot:
        assert got[k] == (rounds, rounds), k


def test_cont_os_agg_percentile_shapes(ctx):
    """Mirror of reference cont_os_agg.sql: global percentile CV,
    ARRAY-form grouped percentile, and a select item SUMMING two
    WITHIN GROUP aggregates over different ORDER BY expressions."""
    from pipelinedb_spark import register_sketch_aggs
    register_sketch_aggs()
    ctx.create_stream("osrm", "g int, x int, y int, z int")
    ctx.create_view("pc0", "SELECT percentile_cont(0.23) "
                           "WITHIN GROUP (ORDER BY x) AS p FROM osrm")
    ctx.create_view("pc1", "SELECT g, percentile_cont("
                           "ARRAY[0, 0.2, 0.4, 0.6, 0.8, 1.0]) "
                           "WITHIN GROUP (ORDER BY x - y) AS ps "
                           "FROM osrm GROUP BY g")
    ctx.create_view("pc2", "SELECT percentile_cont(0.67) "
                           "WITHIN GROUP (ORDER BY x) + "
                           "percentile_cont(0.88) "
                           "WITHIN GROUP (ORDER BY z) AS v FROM osrm")
    rows = [{"g": v % 10, "x": v, "y": -v, "z": v} for v in range(100)]
    ctx.insert("osrm", rows[:60])
    ctx.insert("osrm", rows[60:])
    # rank-error contract on uniform 0..99 (t-digest is near-exact at
    # this cardinality; the reference's expected values are likewise
    # its own t-digest's output, not exact order statistics)
    p = ctx.read_view("pc0").collect()[0]["p"]
    assert abs(p - 22.77) < 2.0, p
    g0 = {r["g"]: r["ps"] for r in ctx.read_view("pc1").collect()}
    assert set(g0) == set(range(10))
    ps = g0[0]  # x - y = 2x over x in {0,10,...,90}
    assert len(ps) == 6 and ps[0] == 0.0 and ps[-1] == 180.0
    assert all(a <= b for a, b in zip(ps, ps[1:]))
    v = ctx.read_view("pc2").collect()[0]["v"]
    assert abs(v - (66.33 + 87.12)) < 4.0, v


def test_cont_limit_offset_arrival_order(ctx):
    """Mirror of reference cont_limit.sql: LIMIT 9 OFFSET 3 returns
    arrivals 4..12 in arrival order; the matrel keeps every row (the
    reference's $pk serial == our _seq column); restart-safe."""
    ctx.create_stream("cls", "x int")
    ctx.create_view("cqlimit", "SELECT x FROM cls LIMIT 9 OFFSET 3")
    for lo in range(1, 22, 3):
        ctx.insert("cls", [{"x": lo}, {"x": lo + 1}, {"x": lo + 2}])
    got = sorted(r["x"] for r in ctx.read_view("cqlimit").collect())
    assert got == list(range(4, 13))  # expected/cont_limit.out:12-22
    assert ctx.read_matrel("cqlimit").count() == 21
    # later arrivals never displace the first limit+offset rows
    ctx.insert("cls", [{"x": 99}])
    got = sorted(r["x"] for r in ctx.read_view("cqlimit").collect())
    assert got == list(range(4, 13))


def test_drop_view_with_output_stream_dependents(ctx):
    """Reference output_streams.sql:23: a CV whose output stream feeds
    another CQ can't be dropped without CASCADE; CASCADE drops the
    dependents too."""
    from pipelinedb_spark import CQError

    ctx.create_stream("dvs", "x int")
    ctx.create_view("os0", "SELECT count(*) AS count FROM dvs")
    ctx.create_view("os0_out", "SELECT (old).count AS old_count, "
                               "(new).count AS new_count "
                               "FROM output_of('os0')")
    with pytest.raises(CQError, match="depend"):
        ctx.drop_view("os0")
    assert "os0" in ctx.views and "os0_out" in ctx.views
    ctx.drop_view("os0_out")               # leaf drops fine
    ctx.drop_view("os0")                   # now unreferenced
    assert "os0" not in ctx.views
    # cascade path drops the whole chain
    ctx.create_view("os1", "SELECT count(*) AS count FROM dvs")
    ctx.create_view("os1_out", "SELECT (new).count AS c "
                               "FROM output_of('os1')")
    ctx.create_view("os1_out2", "SELECT count(*) AS n "
                                "FROM output_of('os1_out')")
    ctx.drop_view("os1", cascade=True)
    assert not ({"os1", "os1_out", "os1_out2"} & set(ctx.views))


def test_concurrent_inserts_vs_reaper_compaction(ctx):
    """The per-view commit lock must keep merges exact while the
    background reaper thread reaps TTL'd rows and auto-compacts: a
    racing manifest swap would silently drop a merge's bucket updates
    (mirrors the reference's combine_table-under-inserts py test)."""
    import threading
    import time as _time

    from pipelinedb_spark.streaming.runtime import TTLReaper

    ctx.create_stream("cc", "k string, v long")
    ctx.create_view("cv_cc", "SELECT k, count(*) AS n, sum(v) AS s "
                             "FROM cc GROUP BY k")
    reaper = TTLReaper(ctx, interval_seconds=0.05,
                       compact_stale_ratio=0.1)  # compact aggressively
    reaper.start()
    try:
        rounds = 12
        for r in range(rounds):
            ctx.insert("cc", [{"k": f"k{j}", "v": 1} for j in range(16)])
            _time.sleep(0.02)
    finally:
        reaper.stop()
    got = {r["k"]: (r["n"], r["s"])
           for r in ctx.read_view("cv_cc").collect()}
    assert got == {f"k{j}": (rounds, rounds) for j in range(16)}


def test_insert_into_stream_cycle_detected(ctx):
    """A transform forwarding into its own input stream must hit the
    cycle guard instead of recursing unboundedly (the nested insert
    continues the dispatch-depth chain)."""
    from pipelinedb_spark import CQError

    ctx.create_stream("cyc", "x int")
    ctx.create_transform("loopback", "SELECT x FROM cyc",
                         outputfunc=ctx.insert_into_stream("cyc"))
    with pytest.raises(CQError, match="cycle"):
        ctx.insert("cyc", [{"x": 1}])


def test_limit_cv_emission_not_truncated(ctx):
    """finalize's LIMIT/OFFSET is overlay-only: a LIMIT CV's
    output-stream rows carry EVERY change (the internal keyed frames
    must never be truncated to arbitrary rows)."""
    ctx.create_stream("lt", "x int")
    ctx.create_view("cv_lt", "SELECT x FROM lt LIMIT 3 OFFSET 1")
    ctx.create_view("cv_lt_down",
                    "SELECT count(*) AS n FROM output_of('cv_lt')")
    for v in range(8):
        ctx.insert("lt", [{"x": v}])
    # overlay: arrivals 2..4 (skip 1, take 3)
    assert sorted(r["x"] for r in ctx.read_view("cv_lt").collect()) \
        == [1, 2, 3]
    # downstream saw a change row for EVERY insert, not a truncated set
    assert ctx.read_view("cv_lt_down").collect()[0]["n"] == 8


def test_offset_without_limit(ctx):
    """OFFSET with no LIMIT skips the first arrivals and returns the
    rest (SQL semantics), instead of being silently ignored."""
    ctx.create_stream("ow", "x int")
    ctx.create_view("cv_ow", "SELECT x FROM ow OFFSET 3")
    for v in range(7):
        ctx.insert("ow", [{"x": v}])
    assert sorted(r["x"] for r in ctx.read_view("cv_ow").collect()) \
        == [3, 4, 5, 6]


def test_combine_over_cv_in_subquery(ctx):
    """combine() still fires when the CV sits inside a FROM subquery
    (the relation-based detection recurses into subselects)."""
    ctx.create_stream("sq", "k string, v long")
    ctx.create_view("cv_sq", "SELECT k, count(*) AS n FROM sq GROUP BY k")
    ctx.insert("sq", [{"k": "a", "v": 1}, {"k": "b", "v": 2}])
    row = ctx.sql("SELECT combine(n) AS n FROM (SELECT * FROM cv_sq) t") \
        .collect()[0]
    assert row["n"] == 2


def test_decode_pixels_corrupt_payloads_yield_null_rows(spark):
    """Corrupt/truncated BMP+PPM headers and NULL payloads produce
    null-stats rows; only genuinely compressed containers raise."""
    from pipelinedb_spark.operators.multimodal import decode_pixels

    rows = [(1, "image", bytearray(b"BM\x01\x02garbage")),
            (2, "image", bytearray(b"P6 junk")),
            (3, "image", None),
            (4, "image", bytearray(b"BM" + b"\x00" * 100))]
    df = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary")
    got = {r["media_id"]: r for r in decode_pixels(df).collect()}
    assert len(got) == 4
    for mid in (1, 2, 3, 4):
        assert got[mid]["format"] is None and got[mid]["px_sum"] is None
