"""Durable catalog: a fresh PipelineContext over an existing root
replays stream/CV/transform DDL and re-attaches matrels (the
pipelinedb.cont_query catalog analog)."""

import pytest


def test_catalog_replay(spark, tmp_path):
    from pipelinedb_spark import PipelineContext

    root = str(tmp_path / "pdb")
    ctx = PipelineContext(spark, root=root, num_buckets=8)
    ctx.create_stream("c1", "k string, v long")
    ctx.create_view("cv1", "SELECT k, count(*) AS n, sum(v) AS s "
                           "FROM c1 GROUP BY k")
    ctx.create_transform("t1", "SELECT k, v * 2 AS v2 FROM c1")
    ctx.create_view("cv2", "SELECT count(*) AS n FROM output_of('t1')")
    ctx.insert("c1", [{"k": "a", "v": 1}, {"k": "b", "v": 2}])

    # fresh context, same root: definitions replay, state re-attaches
    ctx2 = PipelineContext(spark, root=root, num_buckets=8)
    assert set(ctx2.views) == {"cv1", "cv2"}
    assert set(ctx2.transforms) == {"t1"}
    assert "c1" in ctx2.streams
    got = {r["k"]: r for r in ctx2.read_view("cv1").collect()}
    assert got["a"]["n"] == 1 and got["b"]["s"] == 2
    # and keeps working
    ctx2.insert("c1", [{"k": "a", "v": 10}])
    got = {r["k"]: r for r in ctx2.read_view("cv1").collect()}
    assert got["a"]["n"] == 2 and got["a"]["s"] == 11
    assert ctx2.read_view("cv2").collect()[0]["n"] >= 1


def test_catalog_drop_view(spark, tmp_path):
    from pipelinedb_spark import PipelineContext

    root = str(tmp_path / "pdb2")
    ctx = PipelineContext(spark, root=root, num_buckets=8)
    ctx.create_stream("c2", "k string")
    ctx.create_view("cv_gone", "SELECT count(*) AS n FROM c2")
    ctx.drop_view("cv_gone")
    ctx2 = PipelineContext(spark, root=root, num_buckets=8)
    assert "cv_gone" not in ctx2.views


def test_alter_stream_add_column(spark, tmp_path):
    """ALTER STREAM ADD COLUMN (reference commands.c:360-381,
    pipeline_stream.c:63-84): existing CVs keep running, new inserts
    populate the new column, new CVs may reference it, and the widened
    schema survives catalog replay."""
    from pipelinedb_spark import CQError, PipelineContext
    import pytest

    root = str(tmp_path / "pdb_alter")
    ctx = PipelineContext(spark, root=root, num_buckets=8)
    ctx.create_stream("sa", "k string, v long")
    ctx.create_view("cv_old", "SELECT k, count(*) AS n, sum(v) AS s "
                              "FROM sa GROUP BY k")
    ctx.insert("sa", [{"k": "a", "v": 1}])

    ctx.alter_stream("sa", add_column="w double")
    # old CV still consumes post-alter inserts (w ignored by its plan)
    ctx.insert("sa", [{"k": "a", "v": 2, "w": 0.5}])
    got = {r["k"]: r for r in ctx.read_view("cv_old").collect()}
    assert got["a"]["n"] == 2 and got["a"]["s"] == 3
    # a new CV can aggregate the new column
    ctx.create_view("cv_new", "SELECT k, sum(w) AS sw FROM sa GROUP BY k")
    ctx.insert("sa", [{"k": "a", "v": 3, "w": 1.5},
                      {"k": "b", "w": 2.0}])
    got = {r["k"]: r for r in ctx.read_view("cv_new").collect()}
    assert got["a"]["sw"] == 1.5 and got["b"]["sw"] == 2.0
    # rejections: duplicate column, unknown stream, osrel, non-ADD
    with pytest.raises(CQError):
        ctx.alter_stream("sa", add_column="v long")
    with pytest.raises(CQError):
        ctx.alter_stream("nope", add_column="x int")
    with pytest.raises(CQError):
        ctx.alter_stream("cv_old_osrel", add_column="x int")
    with pytest.raises(CQError):
        ctx.alter_stream("sa")

    # replay: fresh context sees the widened schema and keeps working
    ctx2 = PipelineContext(spark, root=root, num_buckets=8)
    assert "w" in ctx2.streams["sa"].schema.fieldNames()
    ctx2.insert("sa", [{"k": "b", "v": 9, "w": 4.0}])
    got = {r["k"]: r for r in ctx2.read_view("cv_new").collect()}
    assert got["b"]["sw"] == 6.0
    got = {r["k"]: r for r in ctx2.read_view("cv_old").collect()}
    assert got["b"]["s"] == 9


def test_drop_stream_cascade(spark, tmp_path):
    """DROP stream requires cascade when CQs read it; cascade drops
    the dependent CQ closure including CQs chained over output
    streams (reference 'drop cascades to view' notices)."""
    import pytest
    from pipelinedb_spark import CQError, PipelineContext

    root = str(tmp_path / "pdb_drop")
    ctx = PipelineContext(spark, root=root, num_buckets=4)
    ctx.create_stream("dc_s", "k string, v long")
    ctx.create_view("dc_cv", "SELECT k, count(*) AS n FROM dc_s GROUP BY k")
    ctx.create_transform("dc_t", "SELECT k, v * 2 AS v2 FROM dc_s")
    ctx.create_view("dc_chain",
                    "SELECT count(*) AS n FROM output_of('dc_t')")
    ctx.insert("dc_s", [{"k": "a", "v": 1}])

    with pytest.raises(CQError):
        ctx.drop_stream("dc_s")                 # readers exist
    with pytest.raises(CQError):
        ctx.drop_stream("dc_cv_osrel", cascade=True)  # osrel protected
    with pytest.raises(CQError):
        ctx.drop_stream("nope")

    ctx.drop_stream("dc_s", cascade=True)
    assert not ctx.views and not ctx.transforms
    assert "dc_s" not in ctx.streams and "dc_t_osrel" not in ctx.streams

    # catalog agrees after replay
    ctx2 = PipelineContext(spark, root=root, num_buckets=4)
    assert not ctx2.views and not ctx2.transforms and "dc_s" not in ctx2.streams

    # drop_transform alone detaches only the transform
    ctx2.create_stream("dc_s2", "k string")
    ctx2.create_transform("dc_t2", "SELECT k FROM dc_s2")
    ctx2.drop_transform("dc_t2")
    assert not ctx2.transforms
    assert ctx2.streams["dc_s2"].readers == []


def test_rename_view(spark, tmp_path):
    """ALTER VIEW RENAME (cont_alter.sql:5-7): create, insert, rename,
    read under the new name, insert more, catalog replay agrees; a
    downstream CQ over output_of(old) keeps receiving; direct matrel
    rename is rejected like the reference."""
    from pipelinedb_spark import PipelineContext, CQError

    root = str(tmp_path / "pdb_rn")
    ctx = PipelineContext(spark, root=root, num_buckets=4)
    ctx.create_stream("rn_s", "k string, v long")
    ctx.create_view("rn_cv", "SELECT k, count(*) AS n FROM rn_s GROUP BY k")
    ctx.create_view("rn_down",
                    "SELECT count(*) AS changes FROM output_of('rn_cv')")
    ctx.insert("rn_s", [{"k": "a", "v": 1}, {"k": "b", "v": 2}])

    with pytest.raises(CQError, match="cannot rename materialization"):
        ctx.rename_matrel("rn_cv_mrel")
    with pytest.raises(CQError, match="does not exist"):
        ctx.rename_view("nope", "other")
    with pytest.raises(CQError, match="already in use"):
        ctx.rename_view("rn_cv", "rn_down")

    ctx.rename_view("rn_cv", "lolcat")
    assert "rn_cv" not in ctx.views and "lolcat" in ctx.views
    got = {r["k"]: r["n"] for r in ctx.read_view("lolcat").collect()}
    assert got == {"a": 1, "b": 1}
    # merges continue under the new name, and the downstream CQ over
    # the (renamed) output stream still receives change rows
    ctx.insert("rn_s", [{"k": "a", "v": 3}])
    got = {r["k"]: r["n"] for r in ctx.read_view("lolcat").collect()}
    assert got == {"a": 2, "b": 1}
    assert ctx.read_view("rn_down").collect()[0]["changes"] >= 3

    # replay from the catalog: new name resolves, old is gone,
    # matrel contents survived the rename
    ctx2 = PipelineContext(spark, root=root, num_buckets=4)
    assert "lolcat" in ctx2.views and "rn_cv" not in ctx2.views
    got = {r["k"]: r["n"] for r in ctx2.read_view("lolcat").collect()}
    assert got == {"a": 2, "b": 1}
    ctx2.insert("rn_s", [{"k": "c", "v": 9}])
    got = {r["k"]: r["n"] for r in ctx2.read_view("lolcat").collect()}
    assert got == {"a": 2, "b": 1, "c": 1}
