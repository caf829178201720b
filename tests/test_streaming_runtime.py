"""Structured Streaming attachment: file-drop source feeding a CV
through foreachBatch (the Kafka-shaped production path)."""

import os
import time


def test_file_stream_feeds_cv(ctx, spark, tmp_path):
    from pipelinedb_spark.streaming.runtime import attach_file_stream

    src_dir = str(tmp_path / "drop")
    os.makedirs(src_dir, exist_ok=True)

    ctx.create_stream("fs1", "k string, v long")
    ctx.create_view("cv_fs", "SELECT k, count(*) AS n, sum(v) AS s "
                             "FROM fs1 GROUP BY k")

    att = attach_file_stream(ctx, "fs1", src_dir, fmt="json")
    try:
        with open(os.path.join(src_dir, "batch1.json"), "w") as f:
            f.write('{"k": "a", "v": 1}\n{"k": "a", "v": 2}\n{"k": "b", "v": 5}\n')
        att.process_all_available()
        got = {r["k"]: r for r in ctx.read_view("cv_fs").collect()}
        assert got["a"]["n"] == 2 and got["a"]["s"] == 3
        assert got["b"]["n"] == 1

        with open(os.path.join(src_dir, "batch2.json"), "w") as f:
            f.write('{"k": "a", "v": 10}\n')
        att.process_all_available()
        got = {r["k"]: r for r in ctx.read_view("cv_fs").collect()}
        assert got["a"]["n"] == 3 and got["a"]["s"] == 13
    finally:
        att.stop()


def test_file_stream_restart_exactly_once(ctx, spark, tmp_path):
    """Stop the attachment, restart against the same checkpoint, add
    more files: counts must reflect each row exactly once."""
    from pipelinedb_spark.streaming.runtime import attach_file_stream

    src_dir = str(tmp_path / "drop2")
    os.makedirs(src_dir, exist_ok=True)
    ctx.create_stream("fs2", "k string, v long")
    ctx.create_view("cv_fs2", "SELECT k, count(*) AS n FROM fs2 GROUP BY k")

    ckpt = str(tmp_path / "ckpt2")
    att = attach_file_stream(ctx, "fs2", src_dir, fmt="json",
                             checkpoint_dir=ckpt)
    with open(os.path.join(src_dir, "b1.json"), "w") as f:
        f.write('{"k": "a", "v": 1}\n{"k": "a", "v": 2}\n')
    att.process_all_available()
    att.stop()

    # restart against the same checkpoint; drop another file
    att2 = attach_file_stream(ctx, "fs2", src_dir, fmt="json",
                              checkpoint_dir=ckpt)
    try:
        with open(os.path.join(src_dir, "b2.json"), "w") as f:
            f.write('{"k": "a", "v": 3}\n')
        att2.process_all_available()
        assert ctx.read_view("cv_fs2").collect()[0]["n"] == 3
    finally:
        att2.stop()


def test_rate_stream_attachment(ctx):
    """Synthetic rate source feeds a CV continuously."""
    import time as _time
    from pipelinedb_spark.streaming.runtime import attach_rate_stream

    ctx.create_stream("rs1", "k string, v long")
    ctx.create_view("cv_rate", "SELECT k, count(*) AS n FROM rs1 GROUP BY k")
    att = attach_rate_stream(
        ctx, "rs1", rows_per_second=200,
        value_exprs={"k": "concat('k', value % 4)", "v": "value"})
    try:
        deadline = _time.time() + 30
        total = 0
        while _time.time() < deadline:
            att.process_all_available()
            rows_ = ctx.read_view("cv_rate").collect()
            total = sum(r["n"] for r in rows_)
            if total >= 100:
                break
            _time.sleep(0.5)
        assert total >= 100, total
    finally:
        att.stop()


def test_double_attachment_rejected(spark, tmp_path):
    """Epoch ids are per streaming query: a second live attachment to
    the same stream would interleave counters, so it is rejected."""
    import pytest
    from pipelinedb_spark import CQError, PipelineContext
    from pipelinedb_spark.streaming.runtime import attach_rate_stream

    ctx = PipelineContext(spark, root=str(tmp_path / "pdb2"), num_buckets=4)
    ctx.create_stream("rs", "v long")
    ctx.create_view("cv_rs", "SELECT count(*) AS n FROM rs")
    att = attach_rate_stream(ctx, "rs", rows_per_second=10,
                             value_exprs={"v": "value"})
    try:
        with pytest.raises(CQError, match="already has an active"):
            attach_rate_stream(ctx, "rs", rows_per_second=10,
                               value_exprs={"v": "value"})
    finally:
        att.stop()
    # after stop, re-attachment is allowed again
    att2 = attach_rate_stream(ctx, "rs", rows_per_second=10,
                              value_exprs={"v": "value"})
    att2.stop()
    ctx.close()


def test_background_ttl_reaper(ctx):
    """TTLReaper periodically deletes expired rows across TTL'd CVs
    (reference reaper process, src/reaper.c:228-352)."""
    import time
    from pipelinedb_spark.streaming.runtime import TTLReaper

    ctx.create_stream("rp_s", "k string, ts timestamp")
    ctx.create_view("cv_rp", "SELECT k, max(ts) AS mx, count(*) AS n "
                             "FROM rp_s GROUP BY k")
    ctx.set_ttl("cv_rp", "1 second", "mx")
    import datetime
    old = datetime.datetime.utcnow() - datetime.timedelta(hours=1)
    now = datetime.datetime.utcnow() + datetime.timedelta(hours=1)
    ctx.insert("rp_s", [{"k": "dead", "ts": old}, {"k": "live", "ts": now}])
    reaper = TTLReaper(ctx, interval_seconds=0.5).start()
    try:
        deadline = time.time() + 30
        while time.time() < deadline:
            ks = [r["k"] for r in ctx.read_view("cv_rp").collect()]
            if ks == ["live"]:
                break
            time.sleep(0.5)
        assert ks == ["live"]
        assert reaper.deleted >= 1
    finally:
        reaper.stop()


def test_file_stream_through_python_transform_chain(ctx, spark, tmp_path):
    """Structured Streaming source → python curation transform → CV:
    dropped files flow through pii_redact continuously, the CV over
    the transform's output stream aggregates, and redaction is
    visible in the retained output rows."""
    from pipelinedb_spark.streaming.runtime import attach_file_stream

    def redact(df):
        from pipelinedb_spark.operators.pii import pii_redact
        return pii_redact(df)

    src_dir = str(tmp_path / "drop_pt")
    os.makedirs(src_dir, exist_ok=True)
    ctx.create_stream("fs_pt", "doc_id long, text string")
    ctx.create_python_transform("pt_clean", "fs_pt", redact)
    ctx.create_view("cv_pt", "SELECT count(*) AS n_docs "
                             "FROM output_of('pt_clean')")

    att = attach_file_stream(ctx, "fs_pt", src_dir, fmt="json")
    try:
        with open(os.path.join(src_dir, "d1.json"), "w") as f:
            f.write('{"doc_id": 1, "text": "mail x@y.io now"}\n'
                    '{"doc_id": 2, "text": "nothing private"}\n')
        att.process_all_available()
        assert ctx.read_view("cv_pt").collect()[0]["n_docs"] == 2
        out = {r["doc_id"]: r["text"]
               for r in ctx.output_of("pt_clean").collect()}
        assert "<email>" in out[1] and "x@y.io" not in out[1]
        assert out[2] == "nothing private"
    finally:
        att.stop()


def test_rate_stream_transform_cv_restart_effectively_once(spark, tmp_path):
    """A LIVE continuously-generating source through the full chain
    (rate source → SQL transform → CV over its output stream) with a
    forced mid-run restart: every generated value must be counted
    EXACTLY once — no duplicates from the replayed epoch (the marker
    skip), no gaps from the aborted one (reference
    test_crash_recovery.py analog for a live source)."""
    import time as _time

    from pipelinedb_spark import PipelineContext
    from pipelinedb_spark.streaming.runtime import attach_rate_stream

    ctx = PipelineContext(spark, root=str(tmp_path / "rrr"), num_buckets=4)
    ctx.create_stream("rr_e2e", "v long")
    ctx.create_transform("t_rr", "SELECT v, v % 4 AS b FROM rr_e2e")
    ctx.create_view("cv_rr",
                    "SELECT count(*) AS n, exact_count_distinct(v) AS d, "
                    "max(v) AS mx FROM output_of('t_rr')")

    def run_until(att, min_batches, min_rows, deadline_s=40):
        deadline = _time.time() + deadline_s
        while _time.time() < deadline:
            att.process_all_available()
            rows = ctx.read_view("cv_rr").collect()
            r = rows[0] if rows else None
            if (r is not None
                    and ctx.streams["rr_e2e"].input_batches >= min_batches
                    and (r["n"] or 0) >= min_rows):
                return r
            _time.sleep(0.3)
        raise AssertionError("rate soak did not reach target in time")

    att = attach_rate_stream(ctx, "rr_e2e", rows_per_second=300,
                             value_exprs={"v": "value"})
    try:
        r1 = run_until(att, min_batches=2, min_rows=50)
    finally:
        att.stop()  # forced restart point (mid-stream)
    # reattach: same ctx root → same checkpoint; the rate source
    # resumes from its committed offset, replayed epochs are skipped
    att2 = attach_rate_stream(ctx, "rr_e2e", rows_per_second=300,
                              value_exprs={"v": "value"})
    try:
        r2 = run_until(att2, min_batches=2, min_rows=r1["n"] + 50)
    finally:
        att2.stop()
    # effectively-once: count == distinct (no dupes) == max+1 (no gaps)
    assert r2["n"] == r2["d"] == r2["mx"] + 1, r2
    ctx.close()


def test_file_stream_with_stream_table_join_cv(ctx, spark, tmp_path):
    """A CV with a complex FROM (stream-table join) must resolve its
    SQL against the foreachBatch session's temp-view catalog — the
    cloned-session bug made SQL transforms/joined CVs silently read
    the empty CREATE-time probe under streaming attachments."""
    from pipelinedb_spark.streaming.runtime import attach_file_stream

    src_dir = str(tmp_path / "drop_j")
    os.makedirs(src_dir, exist_ok=True)
    ctx.register_table("dim_j", spark.createDataFrame(
        [("a", "east"), ("b", "west")], "k string, region string"))
    ctx.create_stream("fsj", "k string, v long")
    ctx.create_view("cv_fsj",
                    "SELECT region, sum(v) AS s "
                    "FROM fsj JOIN dim_j ON fsj.k = dim_j.k "
                    "GROUP BY region")
    # a SQL (non-python) transform on the same stream: the other
    # surface of the cloned-session catalog bug
    ctx.track_output_streams = True
    ctx.create_transform("t_fsj", "SELECT k, v * 10 AS v10 FROM fsj")

    att = attach_file_stream(ctx, "fsj", src_dir, fmt="json")
    try:
        with open(os.path.join(src_dir, "j1.json"), "w") as f:
            f.write('{"k": "a", "v": 1}\n{"k": "a", "v": 2}\n'
                    '{"k": "b", "v": 5}\n')
        att.process_all_available()
        got = {r["region"]: r["s"]
               for r in ctx.read_view("cv_fsj").collect()}
        assert got == {"east": 3, "west": 5}
        vs = sorted(r["v10"] for r in ctx.output_of("t_fsj").collect())
        assert vs == [10, 20, 50]
    finally:
        att.stop()


def test_socket_stream_attachment(ctx):
    """Live TCP line source (Spark's built-in socket format, no
    connector jar): JSON lines flow through the same foreachBatch
    commit path into a CV; malformed lines are dropped per-row."""
    import json as _json
    import socket
    import threading
    import time as _time

    from pipelinedb_spark.streaming.runtime import attach_socket_stream

    ctx.create_stream("sock_s", "k string, v long")
    ctx.create_view("cv_sock",
                    "SELECT k, count(*) AS n, sum(v) AS s "
                    "FROM sock_s GROUP BY k")

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    stop = threading.Event()

    def serve():
        conn, _ = srv.accept()
        with conn:
            lines = [_json.dumps({"k": f"k{i % 3}", "v": i})
                     for i in range(30)]
            lines.insert(10, "this is not json")  # dropped per-row
            for ln in lines:
                conn.sendall((ln + "\n").encode())
            # keep the connection open until the reader is done (the
            # socket source treats EOF as end-of-stream)
            stop.wait(45)
        srv.close()

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    att = attach_socket_stream(ctx, "sock_s", "127.0.0.1", port)
    try:
        deadline = _time.time() + 40
        total = 0
        while _time.time() < deadline:
            att.process_all_available()
            rows = ctx.read_view("cv_sock").collect()
            total = sum(r["n"] for r in rows)
            if total >= 30:
                break
            _time.sleep(0.5)
        got = {r["k"]: (r["n"], r["s"])
               for r in ctx.read_view("cv_sock").collect()}
        # 30 valid rows, malformed line dropped: k0/k1/k2 x 10 each
        assert sum(n for n, _ in got.values()) == 30, got
        assert got["k0"] == (10, sum(range(0, 30, 3)))
        assert got["k1"] == (10, sum(range(1, 30, 3)))
        assert got["k2"] == (10, sum(range(2, 30, 3)))
    finally:
        stop.set()
        att.stop()
