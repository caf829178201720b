"""Durable catalog: a fresh PipelineContext over an existing root
replays stream/CV/transform DDL and re-attaches matrels (the
pipelinedb.cont_query catalog analog)."""


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
