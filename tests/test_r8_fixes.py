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


# --------------------------------------------- boilerplate extraction

_NAV = ("<nav>\n<ul>\n" + "\n".join(
    f'<li><a href="/{w}">{w.title()}</a></li>'
    for w in ["home", "about", "products", "pricing", "blog",
              "careers", "contact", "login"]) + "\n</ul>\n</nav>")
_FOOTER = ('<footer><p>© 2026 Example Corp. '
           '<a href="/tos">Terms of Service</a> | '
           '<a href="/privacy">Privacy Policy</a> | '
           '<a href="/cookies">Cookie Settings</a></p></footer>')
_PARAS = [
    "The committee reviewed the proposal in detail and found that "
    "most of the objections were already addressed in the second "
    "draft, which had been circulated to every member before the "
    "meeting was called to order.",
    "After a long discussion about the budget, the members agreed "
    "that the new funding should be spread over three years so that "
    "no single department would have to absorb the whole cost at "
    "once.",
    "A final vote was scheduled for the following week, and the "
    "chair asked that any remaining comments be submitted in "
    "writing before the end of the month so they could be included "
    "in the record.",
]
_ARTICLE_PAGE = ("<html><head><title>Minutes</title>"
                 "<script>analytics()</script></head>\n<body>\n"
                 + _NAV
                 + "\n<article>\n<h1>Committee minutes</h1>\n"
                 + "\n".join(f"<p>{p}</p>" for p in _PARAS)
                 + "\n</article>\n" + _NAV + "\n" + _FOOTER
                 + "\n</body></html>").encode()


def test_extract_main_text_drops_boilerplate_keeps_article():
    """Round-8 task 5: density extraction keeps the article prose
    (including its short heading, sandwiched between good blocks)
    and drops nav/footer link lists that tag-strip passes through."""
    from pipelinedb_spark.operators.warc import (extract_main_text,
                                                 html_to_text_py)

    strip = extract_main_text(_ARTICLE_PAGE, method="strip")
    assert strip == html_to_text_py(_ARTICLE_PAGE)
    assert "Pricing" in strip and "Privacy Policy" in strip  # baseline

    dense = extract_main_text(_ARTICLE_PAGE)  # default: density
    for p in _PARAS:
        assert p in dense
    assert "Committee minutes" in dense       # heading survives
    assert "Pricing" not in dense             # nav gone
    assert "Privacy Policy" not in dense      # footer gone
    assert "analytics()" not in dense

    # tiny/degenerate pages fall back to tag-strip, never empty
    tiny = b"<html><body><p>short note.</p></body></html>"
    assert extract_main_text(tiny) == html_to_text_py(tiny)
    # hostile markup never raises
    assert isinstance(extract_main_text(b"<a<<>>&#x; \xff<p"), str)
    with pytest.raises(ValueError):
        extract_main_text(tiny, method="nope")


def test_density_extraction_improves_gopher_pass_rate(spark, tmp_path):
    """The VERDICT 'done' bar: on boilerplate-heavy fixture pages the
    Gopher filter keeps density-extracted documents that tag-strip
    extraction fails (duplicated nav lines push the dup-line rules
    over threshold)."""
    import gzip

    from pipelinedb_spark.operators.quality import gopher_filter
    from pipelinedb_spark.operators.warc import (read_warc,
                                                 warc_text_documents)

    def rec(i):
        http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                + _ARTICLE_PAGE)
        return _rec("response", f"p{i}", http)

    p = tmp_path / "crawl.warc.gz"
    p.write_bytes(gzip.compress(b"".join(rec(i) for i in range(4))))
    records = read_warc(spark, str(tmp_path))

    kept_strip = gopher_filter(
        warc_text_documents(records, method="strip")).count()
    kept_dense = gopher_filter(
        warc_text_documents(records, method="density")).count()
    assert kept_dense == 4
    assert kept_strip < kept_dense


# ------------------------------------------------ fast-codec seam

def test_decode_backend_resolution_without_pillow():
    """Round-8 task 4 plumbing, PIL-free half: 'auto' falls back to
    the pure decoders, explicit 'pil' fails loudly, and decode_pixels
    under 'auto' equals 'pure' bit-for-bit."""
    from pipelinedb_spark.operators.multimodal import (
        pil_available, resolve_decode_backend)

    if pil_available():
        pytest.skip("Pillow installed: covered by the parity test")
    assert resolve_decode_backend("auto") == "pure"
    assert resolve_decode_backend("pure") == "pure"
    with pytest.raises(ImportError):
        resolve_decode_backend("pil")
    with pytest.raises(ValueError):
        resolve_decode_backend("libjpeg")


def test_pil_dispatch_plumbing_with_fake_backend(spark, monkeypatch):
    """The PIL code path itself (open → format map → mode → array),
    exercised through a minimal fake PIL so the dispatch is tested in
    THIS container too: stats under the fake-pil backend must equal
    the pure backend on a BMP fixture."""
    import io
    import sys
    import types

    import numpy as np
    from test_operators import _make_bmp

    from pipelinedb_spark.operators import multimodal as mm

    img = (np.arange(12 * 9 * 3).reshape(12, 9, 3) % 251).astype(
        np.uint8)
    payload = _make_bmp(img)

    class _FakeIm:
        format, mode, info = "BMP", "RGB", {}

        def __init__(self, arr):
            self._a = arr

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def __array__(self, dtype=None):
            return self._a

    def _open(fp):
        data = fp.read()
        arr = mm.decode_bmp_py(data)
        assert arr is not None
        return _FakeIm(arr)

    fake_image = types.ModuleType("PIL.Image")
    fake_image.open = _open
    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = fake_image
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", fake_image)

    assert mm.pil_available()
    assert mm.resolve_decode_backend("auto") == "pil"
    fmt, arr = mm._decode_any(payload, "pil")
    assert fmt == "bmp"
    np.testing.assert_array_equal(arr, img)

    df = spark.createDataFrame([(1, bytearray(payload))],
                               "media_id long, payload binary")
    # executors don't see the monkeypatched module: compare the
    # kernel-level decode driver-side, and the Spark plumbing purely
    pure_rows = mm.decode_pixels(df, backend="pure").collect()
    assert pure_rows[0]["format"] == "bmp"
    assert pure_rows[0]["width"] == 9 and pure_rows[0]["height"] == 12


@pytest.mark.skipif(
    not __import__("importlib").util.find_spec("PIL"),
    reason="Pillow not installed — parity oracle self-skips")
def test_pil_backend_parity_with_pure_decoders(spark):
    """Round-8 task 4 parity oracle (runs only where Pillow exists):
    exact equality for BMP/PNG/GIF, bounded error for JPEG."""
    import numpy as np
    from test_operators import _make_bmp, _make_gif, _make_jpeg, _make_png

    from pipelinedb_spark.operators import multimodal as mm

    rng = np.random.RandomState(2)
    img = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
    fixtures = {
        "bmp": bytes(_make_bmp(img)),
        "png": bytes(_make_png(img, ctype=2)),
        "gif": bytes(_make_gif((img[:, :, 0] % 4),
                               palette=[(i, i, i) for i in
                                        (0, 85, 170, 255)])),
        "jpg": bytes(_make_jpeg(img)),
    }
    for fmt, payload in fixtures.items():
        f_pure, a_pure = mm._decode_any(payload, "pure")
        f_pil, a_pil = mm._decode_any(payload, "pil")
        assert f_pure == f_pil == fmt
        if fmt == "jpg":
            assert a_pil.shape == a_pure.shape
            diff = np.abs(a_pil.astype(int) - a_pure.astype(int))
            assert diff.mean() <= 2.0 and diff.max() <= 32
        else:
            np.testing.assert_array_equal(
                a_pil[..., :3] if a_pil.shape[-1] > a_pure.shape[-1]
                else a_pil, a_pure if a_pil.shape == a_pure.shape
                else a_pure[..., :3])
