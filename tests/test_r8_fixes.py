"""Round-8 fixes from VERDICT/ADVICE r7 (beyond the index-store fault
suite in test_index_faults.py and the dsir/classifier additions in
their own files): WARC framing recovery on a bad Content-Length, the
blake2b doc_id contract, and the bounded matrel txns map."""

import pytest
from pyspark.sql import functions as F

from pipelinedb_spark.matrel import MAX_TXN_SOURCES, MatrelStore
from pipelinedb_spark.operators.warc import parse_warc_records


def _rec(rtype, rid, payload, clen=None):
    body = payload
    hdr = (f"WARC/1.0\r\n"
           f"WARC-Type: {rtype}\r\n"
           f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
           f"WARC-Target-URI: http://e.com/{rid}\r\n")
    hdr += (f"Content-Length: {len(body) if clen is None else clen}\r\n"
            if clen != "omit" else "")
    return hdr.encode() + b"\r\n" + body + b"\r\n\r\n"


def test_warc_bad_content_length_no_phantom_records():
    """ADVICE r7: a missing/unparseable Content-Length used to resume
    the scan INSIDE the unterminated body, so literal 'WARC/' text in
    an HTML payload became a phantom record with misattributed bytes.
    Now the parser recovers at the next real record boundary."""
    # payload contains a bare 'WARC/' that a naive rescan would bite on
    evil = b"<html>see WARC/1.0 spec at iso.org</html>"
    data = (_rec("response", "r1", evil, clen="omit")
            + _rec("response", "r2", b"<html>second</html>"))
    got = list(parse_warc_records(data))
    assert len(got) == 2
    assert got[0][0]["warc-record-id"].endswith("r1>")
    assert got[0][1] == evil            # full body, boundary-framed
    assert got[1][0]["warc-record-id"].endswith("r2>")
    assert got[1][1] == b"<html>second</html>"

    # unparseable length, no later record: remainder becomes the body
    tail = _rec("response", "r3", evil, clen="xyz")
    got = list(parse_warc_records(tail))
    assert len(got) == 1
    assert got[0][1].startswith(evil)

    # well-formed records keep exact length framing (even when the
    # payload embeds a full record-boundary byte sequence)
    tricky = b"<html>\r\n\r\nWARC/1.0 inline</html>"
    data = (_rec("response", "r4", tricky)
            + _rec("response", "r5", b"ok"))
    got = list(parse_warc_records(data))
    assert [p for _, p in got] == [tricky, b"ok"]


def test_warc_doc_id_blake2b_not_crc(spark, tmp_path):
    """ADVICE r7: doc_id must come from a well-mixed hash (truncated
    blake2b), not packed CRC32s — correlated crawl URLs collide far
    above the birthday floor under a linear CRC."""
    import gzip

    from pipelinedb_spark.operators.warc import warc_text_documents

    html = b"<html><p>" + b"hello corpus text " * 30 + b"</p></html>"
    http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
            + html)
    recs = b"".join(_rec("response", f"r{i}", http) for i in range(40))
    p = tmp_path / "a.warc.gz"
    p.write_bytes(gzip.compress(recs))
    files = spark.read.format("binaryFile").load(str(p)) \
        .select("path", "content")
    from pipelinedb_spark.operators.warc import warc_records
    docs = warc_text_documents(warc_records(files), min_chars=10)
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    assert len(ids) == 40
    assert len(set(ids)) == 40          # all distinct
    assert all(0 < i < 2 ** 63 for i in ids)
    # deterministic contract: blake2b("rid|uri") truncated to 63 bits
    import hashlib
    row = docs.select("doc_id", "url").first()
    rid = f"<urn:uuid:r0>"
    did = int.from_bytes(hashlib.blake2b(
        f"{rid}|http://e.com/r0".encode(), digest_size=8).digest(),
        "big") & 0x7FFF_FFFF_FFFF_FFFF
    assert did in ids


def test_matrel_txns_map_bounded(spark, tmp_path):
    """ADVICE r7: app_id embeds the checkpoint path, so every
    re-attachment minted a permanent manifest entry.  The map now
    keeps only the MAX_TXN_SOURCES most recently touched sources,
    and replay detection still works for live ones."""
    store = MatrelStore(spark, str(tmp_path), "m", num_buckets=2)
    store.gc_grace_seconds = 0.0

    def merge_fn(df):
        from pipelinedb_spark.matrel import BUCKET_COL
        return df.groupBy("k", BUCKET_COL).agg(F.sum("n").alias("n"))

    batch = spark.createDataFrame([("a", 1)], "k string, n long")
    for i in range(MAX_TXN_SOURCES + 10):
        store.merge(batch, ["k"], merge_fn, txn=(f"app{i}", 1))

    m = store._read_manifest()
    assert len(m["txns"]) == MAX_TXN_SOURCES
    # the oldest sources were evicted, the newest retained
    assert store.txn_version("app0") is None
    assert store.txn_version(f"app{MAX_TXN_SOURCES + 9}") == 1
    # a retained source keeps monotone replay detection
    store.merge(batch, ["k"], merge_fn,
                txn=(f"app{MAX_TXN_SOURCES + 9}", 5))
    assert store.txn_version(f"app{MAX_TXN_SOURCES + 9}") == 5
