"""WARC ingestion: record grammar, gzip member framing, HTTP
unwrapping, HTML→text extraction, and the handoff into the curation
pipeline — all against a builder-written WARC writer oracle."""

import gzip
import os

import pytest


def _warc_record(rtype, uri, rid, payload, extra=()):
    hdr = [f"WARC/1.0",
           f"WARC-Type: {rtype}",
           f"WARC-Record-ID: <urn:uuid:{rid}>",
           f"WARC-Date: 2026-01-02T03:04:05Z"]
    if uri:
        hdr.append(f"WARC-Target-URI: {uri}")
    hdr.extend(extra)
    hdr.append(f"Content-Length: {len(payload)}")
    return ("\r\n".join(hdr) + "\r\n\r\n").encode() + payload + \
        b"\r\n\r\n"


def _http_response(body, ctype="text/html; charset=utf-8",
                   status=200):
    head = (f"HTTP/1.1 {status} OK\r\n"
            f"Content-Type: {ctype}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n").encode()
    return head + body


HTML = (b"<html><head><title>T</title>"
        b"<script>var x = '<ignored>';</script>"
        b"<style>p { color: red }</style></head>"
        b"<body><h1>Heading</h1><p>Hello &amp; welcome "
        b"to the &lt;crawl&gt;.</p></body></html>")


def _build_archive():
    recs = [
        _warc_record("warcinfo", None, "info-1", b"software: test"),
        _warc_record("request", "http://a.example/", "req-1",
                     b"GET / HTTP/1.1\r\n\r\n"),
        _warc_record("response", "http://a.example/", "resp-1",
                     _http_response(HTML)),
        _warc_record("response", "http://b.example/data.bin", "resp-2",
                     _http_response(b"\x00" * 64,
                                    ctype="application/octet-stream")),
        _warc_record("response", "http://c.example/plain", "resp-3",
                     _http_response(b"just plain text here",
                                    ctype="text/plain", status=404)),
    ]
    return recs


@pytest.fixture()
def warc_dir(tmp_path):
    recs = _build_archive()
    plain = b"".join(recs)
    (tmp_path / "crawl-00000.warc").write_bytes(plain)
    # spec framing: one gzip MEMBER per record
    gz = b"".join(gzip.compress(r) for r in recs)
    (tmp_path / "crawl-00001.warc.gz").write_bytes(gz)
    return str(tmp_path)


def test_read_warc_both_framings(spark, warc_dir):
    from pipelinedb_spark.operators.warc import read_warc

    df = read_warc(spark, warc_dir)
    rows = df.collect()
    # 3 responses per file × 2 files (requests/warcinfo filtered)
    assert len(rows) == 6
    by_uri = {}
    for r in rows:
        by_uri.setdefault(r["target_uri"], []).append(r)
    a = by_uri["http://a.example/"][0]
    assert a["record_type"] == "response"
    assert a["http_status"] == 200
    assert "text/html" in a["content_type"]
    assert bytes(a["payload"]) == HTML  # HTTP envelope stripped
    assert a["payload_length"] == len(HTML)
    assert a["truncated"] is False
    assert a["warc_date"] == "2026-01-02T03:04:05Z"
    c = by_uri["http://c.example/plain"][0]
    assert c["http_status"] == 404
    # plain and gzip framings parse identically
    plain_uris = sorted(r["target_uri"] for r in rows
                        if r["warc_file"].endswith(".warc"))
    gz_uris = sorted(r["target_uri"] for r in rows
                     if r["warc_file"].endswith(".warc.gz"))
    assert plain_uris == gz_uris


def test_read_warc_payload_limit_truncates(spark, warc_dir):
    from pipelinedb_spark.operators.warc import read_warc

    df = read_warc(spark, warc_dir, payload_limit=10)
    a = [r for r in df.collect()
         if r["target_uri"] == "http://a.example/"][0]
    assert len(bytes(a["payload"])) == 10
    assert a["payload_length"] == len(HTML)  # true size preserved
    assert a["truncated"] is True


def test_html_to_text_and_document_handoff(spark, warc_dir):
    """HTML bodies become curation-ready documents: script/style
    dropped, entities decoded, binary responses skipped, doc_id
    stable across re-reads."""
    from pipelinedb_spark.operators.quality import gopher_filter
    from pipelinedb_spark.operators.warc import (html_to_text_py,
                                                 read_warc,
                                                 warc_text_documents)

    text = html_to_text_py(HTML)
    assert "Heading" in text and "Hello & welcome" in text
    assert "<crawl>" in text
    assert "var x" not in text and "color: red" not in text

    docs = warc_text_documents(read_warc(spark, warc_dir))
    rows = docs.collect()
    urls = sorted(r["url"] for r in rows)
    # binary response excluded; html + plain kept, from both files
    assert urls == ["http://a.example/", "http://a.example/",
                    "http://c.example/plain", "http://c.example/plain"]
    ids1 = sorted(r["doc_id"] for r in rows)
    ids2 = sorted(r["doc_id"] for r in
                  warc_text_documents(read_warc(spark, warc_dir))
                  .collect())
    assert ids1 == ids2  # stable keying across re-runs
    # flows straight into the quality operators (filter composes on
    # the extracted text column; tiny pages mostly fail the rules —
    # the point here is the seam, not the verdict)
    filtered = gopher_filter(docs.select("doc_id", "text"))
    assert filtered.count() <= 4


def test_attach_archive_stream_continuous_warc(spark, tmp_path):
    """Continuous crawl ingestion: WARC shards dropped in a directory
    flow through extraction into a stream; CVs update per shard, and
    a restarted attachment (same checkpoint) replays nothing."""
    import shutil

    from pipelinedb_spark import PipelineContext
    from pipelinedb_spark.streaming.runtime import attach_archive_stream

    root = str(tmp_path / "pdb")
    drop = tmp_path / "shards"
    drop.mkdir()
    ctx = PipelineContext(spark, root=root, num_buckets=4)
    ctx.create_stream(
        "crawl", "doc_id long, url string, fetched_at string, "
                 "text string")
    ctx.create_view("cv_crawl",
                    "SELECT url, count(*) AS n FROM crawl GROUP BY url")

    recs = _build_archive()
    (drop / "seg-0.warc").write_bytes(b"".join(recs))
    att = attach_archive_stream(ctx, "crawl", str(drop), kind="warc",
                                checkpoint_dir=str(tmp_path / "ck"))
    try:
        att.process_all_available()
        got = {r["url"]: r["n"] for r in
               ctx.read_view("cv_crawl").collect()}
        # html + plain responses of the shard (binary skipped)
        assert got == {"http://a.example/": 1,
                       "http://c.example/plain": 1}
        # a second shard arrives → incremental update
        (drop / "seg-1.warc").write_bytes(recs[2])
        att.process_all_available()
        got = {r["url"]: r["n"] for r in
               ctx.read_view("cv_crawl").collect()}
        assert got["http://a.example/"] == 2
    finally:
        att.stop()
    # restart against the same checkpoint: nothing re-ingested
    att2 = attach_archive_stream(ctx, "crawl", str(drop), kind="warc",
                                 checkpoint_dir=str(tmp_path / "ck"))
    try:
        att2.process_all_available()
        got = {r["url"]: r["n"] for r in
               ctx.read_view("cv_crawl").collect()}
        assert got == {"http://a.example/": 2,
                       "http://c.example/plain": 1}
    finally:
        att2.stop()
    shutil.rmtree(root, ignore_errors=True)


def test_attach_archive_stream_tar(spark, tmp_path):
    """WebDataset shards → media stream → per-kind CV, continuously."""
    from pipelinedb_spark import PipelineContext
    from pipelinedb_spark.streaming.runtime import attach_archive_stream
    from test_archives import _make_tar
    from test_operators import _make_png

    import numpy as np
    img = np.full((4, 4, 3), 77, dtype=np.uint8)
    drop = tmp_path / "shards"
    drop.mkdir()
    (drop / "s0.tar").write_bytes(_make_tar([
        ("0001.png", _make_png(img, 2)), ("0001.txt", b"cap one"),
        ("0002.png", _make_png(img, 2)), ("0002.txt", b"cap two")]))
    ctx = PipelineContext(spark, root=str(tmp_path / "pdb"),
                          num_buckets=4)
    ctx.create_stream("media", "media_id long, key string, "
                               "kind string, payload binary, "
                               "caption string")
    ctx.create_view("cv_media",
                    "SELECT kind, count(*) AS n FROM media "
                    "GROUP BY kind")
    att = attach_archive_stream(ctx, "media", str(drop), kind="tar",
                                checkpoint_dir=str(tmp_path / "ck"))
    try:
        att.process_all_available()
        assert {(r["kind"], r["n"]) for r in
                ctx.read_view("cv_media").collect()} == {("image", 2)}
    finally:
        att.stop()


def test_warc_corrupt_and_garbage_tolerance(spark, tmp_path):
    """Leading garbage between records is skipped; a truncated final
    record yields the records before it, not an exception."""
    from pipelinedb_spark.operators.warc import (parse_warc_records,
                                                 read_warc)

    recs = _build_archive()
    blob = b"JUNK" * 10 + recs[2] + b"\x00\xff" + recs[4]
    parsed = list(parse_warc_records(blob))
    assert len(parsed) == 2
    truncated = blob + recs[3][:40]  # header cut mid-way
    assert len(list(parse_warc_records(truncated))) == 2
    (tmp_path / "bad.warc").write_bytes(truncated)
    rows = read_warc(spark, str(tmp_path)).collect()
    assert len(rows) == 2
