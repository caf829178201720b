"""Round-7 fixes and features.

Covers the four ADVICE items (corrupt-WAV fmt validation, multi-scan
JPEG, GIF disposal 3, track_output_streams doc) plus the round-7 task
list: progressive JPEG, interlaced GIF/Adam7 PNG, matrel fault
injection (separate file), IVF staleness, Kafka decode contract and
batch-parallel CV dispatch (separate tests where noted).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from test_operators import (_make_gif, _make_jpeg,  # noqa: E402
                            _make_png, _make_progressive_jpeg,
                            _make_wav)


# ---------------------------------------------------------------- WAV

def test_corrupt_wav_fmt_yields_null_row_not_crash(spark):
    """A WAV whose fmt chunk declares channels=0 or rate=0 must flow
    to a null-stats row (the corrupt-container contract), never kill
    the batch with ZeroDivisionError (ADVICE r6)."""
    from pipelinedb_spark.operators.multimodal import (decode_audio,
                                                       decode_wav_py)

    good = _make_wav(np.sin(np.arange(800) / 10.0) * 0.4, 8000)
    bad_ch = bytearray(good)
    bad_rate = bytearray(good)
    # fmt chunk body starts at offset 20: code(2) ch(2) rate(4) ...
    bad_ch[22:24] = (0).to_bytes(2, "little")
    bad_rate[24:28] = (0).to_bytes(4, "little")
    for payload in (bytes(bad_ch), bytes(bad_rate)):
        with pytest.raises(ValueError, match="corrupt WAV fmt"):
            decode_wav_py(payload)
    df = spark.createDataFrame(
        [(1, "audio", bytearray(good)),
         (2, "audio", bad_ch), (3, "audio", bad_rate)],
        "media_id long, kind string, payload binary")
    got = {r["media_id"]: r for r in decode_audio(df).collect()}
    assert got[1]["rms"] is not None
    assert got[2]["rms"] is None and got[3]["rms"] is None


# ---------------------------------------------------------------- GIF

def test_gif_disposal_restore_to_previous():
    """Disposal 3 restores the sub-rect to its pre-draw pixels, so a
    frame after a disposal-3 overlay sees the ORIGINAL canvas, not
    the overlay (ADVICE r6: was silently treated as 'keep')."""
    from pipelinedb_spark.operators.multimodal import \
        decode_gif_frames_py

    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255],
                    [9, 9, 9]], dtype=np.uint8)
    base = np.zeros((6, 6), dtype=np.uint8)          # red canvas
    overlay = np.full((2, 2), 1, dtype=np.uint8)     # green patch
    dot = np.full((1, 1), 2, dtype=np.uint8)         # blue pixel
    gif = _make_gif(None, pal, frames=[
        (base, 0, 0, None, 0),
        (overlay, 2, 2, None, 3),   # disposal 3: restore-to-previous
        (dot, 0, 0, None, 0)])
    frames = decode_gif_frames_py(gif)
    assert len(frames) == 3
    want1 = pal[base].copy()
    want1[2:4, 2:4] = pal[1]
    assert np.array_equal(frames[1], want1)
    # frame 2: the green patch must be GONE (restored to red), only
    # the blue dot differs from the base canvas
    want2 = pal[base].copy()
    want2[0, 0] = pal[2]
    assert np.array_equal(frames[2], want2)


def test_gif_interlaced_decode_matches_progressive_order():
    """Interlaced GIF rows (4-pass storage order) are scattered back
    to raster order — decode matches the non-interlaced oracle
    exactly (round-7 task 3)."""
    from pipelinedb_spark.operators.multimodal import decode_gif_py

    rng = np.random.RandomState(17)
    for h, w in [(1, 5), (2, 3), (5, 4), (8, 8), (13, 7), (16, 9)]:
        pal = rng.randint(0, 256, (8, 3))
        idx = rng.randint(0, 8, (h, w))
        plain = decode_gif_py(_make_gif(idx, pal))
        inter = decode_gif_py(_make_gif(idx, pal, interlace=True))
        assert np.array_equal(inter, plain), (h, w)
        assert np.array_equal(plain, pal[idx])


# -------------------------------------------------------------- matrel

def test_compact_returns_dereferenced_count_under_grace(spark,
                                                        tmp_path):
    """VERDICT r6 residue: with a nonzero GC grace, compact() used to
    report 0 (it counted on-disk removals, which the grace defers).
    It now reports the number of version dirs dereferenced."""
    from pyspark.sql import functions as F

    from pipelinedb_spark.matrel import BUCKET_COL, MatrelStore

    store = MatrelStore(spark, str(tmp_path), "m", num_buckets=4)
    store.gc_grace_seconds = 3600.0  # grace holds every old dir
    for i in range(3):
        store.merge(
            spark.createDataFrame([("a", 1), (f"k{i}", i)],
                                  "k string, n long"),
            ["k"],
            lambda df: df.groupBy("k", BUCKET_COL)
                         .agg(F.sum("n").alias("n")))
    pre = {r["k"]: r["n"] for r in store.read().collect()}
    removed = store.compact()
    assert removed >= 1  # dereferenced, even though still on disk
    held = {e for e in os.listdir(store.dir) if e.startswith("v")} \
        - store._referenced_dirs()
    assert held  # grace kept them
    assert {r["k"]: r["n"] for r in store.read().collect()} == pre


# ----------------------------------------------------------------- IVF

def test_ivf_writes_one_file_per_list(spark, tmp_path):
    """VERDICT r6 residue: ivf_persist/ivf_append must hash-repartition
    on list_id before the dynamic-partition write — otherwise every
    input partition writes one file per list it holds (partitions ×
    lists small files per append; at 100 TB that degrades every later
    probe's listing)."""
    import glob

    from pipelinedb_spark.operators.similarity import (ivf_append,
                                                       ivf_persist)

    rng = np.random.RandomState(13)
    path = str(tmp_path / "ivf")
    corpus = spark.createDataFrame(
        [(i, rng.randn(8).tolist()) for i in range(200)],
        "vec_id long, embedding array<double>").repartition(16)
    ivf_persist(corpus, path, n_lists=4)
    n0 = len(glob.glob(f"{path}/v*/list_id=*/*.parquet"))
    assert n0 <= 4  # ≈ one file per list, NOT 16×4
    extra = spark.createDataFrame(
        [(1000 + i, rng.randn(8).tolist()) for i in range(60)],
        "vec_id long, embedding array<double>").repartition(11)
    assert ivf_append(spark, path, extra) == 60
    n1 = len(glob.glob(f"{path}/v*/list_id=*/*.parquet"))
    assert n1 - n0 <= 4  # the append added ≈ one file per list
    # appends cast to the index's element type: an array<float> index
    # + array<double> batch must stay readable as ONE schema
    flt = spark.createDataFrame(
        [(i, [float(i), 0.5, 0.25, 0.0, 0.0, 0.0, 0.0, 0.0])
         for i in range(50)],
        "vec_id long, embedding array<float>")
    fpath = str(tmp_path / "ivf_f")
    ivf_persist(flt, fpath, n_lists=2)
    dbl = spark.createDataFrame(
        [(100 + i, rng.randn(8).tolist()) for i in range(20)],
        "vec_id long, embedding array<double>")
    assert ivf_append(spark, fpath, dbl) == 20
    from pipelinedb_spark.indexstore import read_index
    full = read_index(spark, fpath)
    assert full.count() == 70  # mixed-type write would fail this scan
    assert full.schema["embedding"].dataType.elementType.simpleString() \
        == "float"


def test_ivf_staleness_and_retrain_recovers_recall(spark, tmp_path):
    """Round-7 task 5: appending a shifted distribution pushes the
    O(1) staleness ratio well above 1; ivf_retrain re-fits the
    quantizer from the stored vectors, resets the accounting, and
    recovers probe recall on the shifted data."""
    from pipelinedb_spark.operators.similarity import (
        ivf_append, ivf_persist, ivf_retrain, ivf_staleness,
        ivf_topk_persisted)

    rng = np.random.RandomState(5)
    dim = 16

    def clustered(centers, n_per, id0):
        rows = []
        for ci, c in enumerate(centers):
            pts = c + 0.05 * rng.randn(n_per, dim)
            pts /= np.linalg.norm(pts, axis=1, keepdims=True)
            rows += [(id0 + ci * n_per + i, pts[i].tolist())
                     for i in range(n_per)]
        return rows

    base_centers = np.eye(dim)[:4]                  # axis clusters
    shift_centers = -np.eye(dim)[4:8]               # disjoint, shifted
    base = clustered(base_centers, 60, 0)
    path = str(tmp_path / "ivf")
    corpus = spark.createDataFrame(base,
                                   "vec_id long, embedding array<double>")
    ivf_persist(corpus, path, n_lists=4)
    st0 = ivf_staleness(path)
    assert st0["appended_n"] == 0 and np.isnan(st0["ratio"])

    shifted = clustered(shift_centers, 60, 10_000)
    extra = spark.createDataFrame(shifted,
                                  "vec_id long, embedding array<double>")
    assert ivf_append(spark, path, extra) == len(shifted)
    st1 = ivf_staleness(path)
    # shifted vectors sit far from the frozen centroids
    assert st1["appended_n"] == len(shifted)
    assert st1["ratio"] > 1.5, st1
    assert st1["last_ratio"] > 1.5, st1  # last-batch signal too

    def recall_at3():
        """nprobe=1 recall@3 for shifted-cluster queries vs numpy
        brute force over everything stored in the index."""
        from pipelinedb_spark.indexstore import read_index
        stored = {r["vec_id"]: np.array(r["embedding"]) for r in
                  read_index(spark, path)
                  .select("vec_id", "embedding").collect()}
        ids = sorted(stored)
        mat = np.stack([stored[i] for i in ids])
        qrows = shifted[::20][:12]
        q = spark.createDataFrame(qrows,
                                  "vec_id long, embedding array<double>")
        got = ivf_topk_persisted(spark, path, q, k=3, nprobe=1)
        mine = {}
        for r in got.collect():
            mine.setdefault(r["q_id"], set()).add(r["n_id"])
        hit = tot = 0
        for qid, qv in qrows:
            qv = np.array(qv)
            sims = mat @ qv
            order = [ids[j] for j in np.argsort(-sims) if ids[j] != qid]
            want = set(order[:3])
            hit += len(want & mine.get(qid, set()))
            tot += 3
        return hit / tot

    before = recall_at3()
    ivf_retrain(spark, path)
    st2 = ivf_staleness(path)
    assert st2["appended_n"] == 0  # accounting reset
    after = recall_at3()
    assert after >= 0.99, (before, after)
    assert after >= before


# ----------------------------------------------------- dispatch

def test_parallel_dispatch_equivalent_to_serial(spark, tmp_path):
    """Round-7 task 8: concurrent per-view dispatch (each CV owns its
    matrel store) produces bit-identical view state to the serial
    path across multi-batch ingest, including a view with a
    stream-table join and one with FILTER aggregates."""
    from pipelinedb_spark import PipelineContext

    def run(parallel, root):
        ctx = PipelineContext(spark, root=root, num_buckets=8)
        ctx.parallel_dispatch = parallel
        ctx.register_table(
            "dimp", spark.createDataFrame(
                [("a", "x"), ("b", "y"), ("c", "x")],
                "k string, grp string"))
        ctx.create_stream("pd", "k string, v double")
        ctx.create_view("pd1",
                        "SELECT k, count(*) AS n, sum(v) AS s "
                        "FROM pd GROUP BY k")
        ctx.create_view("pd2",
                        "SELECT count(*) FILTER (WHERE v > 2) AS hi, "
                        "avg(v) AS a FROM pd")
        ctx.create_view("pd3",
                        "SELECT grp, sum(v) AS s FROM "
                        "(SELECT pd.v, dimp.grp FROM pd "
                        "JOIN dimp ON pd.k = dimp.k) GROUP BY grp")
        ctx.create_view("pd4",
                        "SELECT k, max(v) AS mx, min(v) AS mn "
                        "FROM pd GROUP BY k")
        for b in range(3):
            ctx.insert("pd", [{"k": k, "v": float(b * 10 + i)}
                              for i, k in enumerate("abcab")])
        out = {v: sorted(map(tuple,
                             ctx.read_view(v).collect()))
               for v in ("pd1", "pd2", "pd3", "pd4")}
        ctx.close()
        return out

    serial = run(False, str(tmp_path / "ser"))
    par = run(True, str(tmp_path / "par"))
    assert par == serial


# -------------------------------------------------------------- Kafka

def _kafka_wire_df(spark, values):
    """A micro-batch shaped exactly like Spark's Kafka source output
    (key/value binary + topic/partition/offset/timestamp metadata)."""
    import datetime
    rows = [(None, bytearray(v), "t", 0, i,
             datetime.datetime(2026, 1, 1), 0)
            for i, v in enumerate(values)]
    return spark.createDataFrame(
        rows, "key binary, value binary, topic string, partition int, "
              "offset long, timestamp timestamp, timestampType int")


def test_kafka_decode_contract_without_broker(spark):
    """Round-7 task 7: the value-decode path of attach_kafka_stream is
    a pure DataFrame transform (kafka_decode), exercised here against
    a manually-built wire-shaped micro-batch — valid JSON decodes
    against the declared schema, extra fields are ignored, missing
    fields are null, malformed/garbage payloads are dropped."""
    from pyspark.sql import types as T

    from pipelinedb_spark.streaming.runtime import kafka_decode

    schema = T.StructType([T.StructField("k", T.StringType()),
                           T.StructField("v", T.DoubleType())])
    raw = _kafka_wire_df(spark, [
        b'{"k": "a", "v": 1.5}',
        b'{"k": "b", "v": 2.5, "extra": 9}',   # extra field ignored
        b'{"k": "c"}',                          # missing field -> null
        b'not json at all',                     # dropped
        b'{"broken": ',                         # dropped
    ])
    got = sorted((r["k"], r["v"]) for r in
                 kafka_decode(raw, schema).collect())
    assert got == [("a", 1.5), ("b", 2.5), ("c", None)]


def test_kafka_reader_options_validation():
    from pipelinedb_spark.engine import CQError
    from pipelinedb_spark.streaming.runtime import kafka_reader_options

    opts = kafka_reader_options("h1:9092,h2:9092", "events",
                                "earliest")
    assert opts == {"kafka.bootstrap.servers": "h1:9092,h2:9092",
                    "subscribe": "events",
                    "startingOffsets": "earliest"}
    # per-partition JSON form passes through
    j = '{"events": {"0": 23}}'
    assert kafka_reader_options("h", "events", j)["startingOffsets"] == j
    with pytest.raises(CQError, match="startingOffsets"):
        kafka_reader_options("h", "events", "yesterday")
    with pytest.raises(CQError, match="bootstrap"):
        kafka_reader_options("", "events")


def _kafka_connector_present(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider")
        return True
    except Exception:
        return False


def test_kafka_attach_e2e_when_connector_present(ctx):
    """Real end-to-end Kafka attachment — runs only where the
    spark-sql-kafka connector jar (and a broker at
    $KAFKA_BOOTSTRAP) are available; this container ships neither,
    so the test self-skips with the reason.  Without the jar the
    attachment must fail with the documented CQError, which is
    asserted instead."""
    from pipelinedb_spark.engine import CQError
    from pipelinedb_spark.streaming.runtime import attach_kafka_stream

    ctx.create_stream("ke", "k string, v double")
    ctx.create_view("cv_ke",
                    "SELECT k, count(*) AS n FROM ke GROUP BY k")
    if not _kafka_connector_present(ctx.spark):
        with pytest.raises(CQError, match="connector"):
            attach_kafka_stream(ctx, "ke", "localhost:9092", "t")
        pytest.skip("spark-sql-kafka connector jar not on the "
                    "classpath in this container")
    bootstrap = os.environ.get("KAFKA_BOOTSTRAP")
    if not bootstrap:
        pytest.skip("connector present but no broker configured "
                    "(set KAFKA_BOOTSTRAP=host:port)")
    att = attach_kafka_stream(ctx, "ke", bootstrap, "pdb_e2e",
                              starting_offsets="earliest")
    try:
        att.process_all_available()
        assert ctx.read_view("cv_ke") is not None
    finally:
        att.stop()


def test_media_header_tiff_and_webp():
    """TIFF (both byte orders) and WebP (VP8 lossy / VP8L lossless /
    VP8X extended) header metadata parse dependency-free."""
    from pipelinedb_spark.operators.multimodal import parse_media_header

    # TIFF little-endian: IFD at 8 with ImageWidth=129, ImageLength=64
    def tiff(bo):
        import struct
        e = "<" if bo == "little" else ">"
        head = (b"II*\x00" if bo == "little" else b"MM\x00*") \
            + struct.pack(e + "I", 8)
        ifd = struct.pack(e + "H", 2)
        ifd += struct.pack(e + "HHI", 256, 3, 1) \
            + struct.pack(e + "H", 129) + b"\x00\x00"
        ifd += struct.pack(e + "HHI", 257, 4, 1) \
            + struct.pack(e + "I", 64)
        return head + ifd + struct.pack(e + "I", 0)

    for bo in ("little", "big"):
        m = parse_media_header(tiff(bo))
        assert (m["width"], m["height"]) == (129, 64), bo

    # WebP VP8 (lossy): sync 9D 01 2A then 14-bit w/h
    vp8 = (b"RIFF" + (30).to_bytes(4, "little") + b"WEBP"
           + b"VP8 " + (12).to_bytes(4, "little")
           + b"\x00\x00\x00" + b"\x9d\x01\x2a"
           + (320).to_bytes(2, "little") + (240).to_bytes(2, "little"))
    m = parse_media_header(vp8)
    assert (m["width"], m["height"]) == (320, 240)
    # WebP VP8L (lossless): sig 0x2F then packed 14-bit minus-one
    bits = (511) | (255 << 14)
    vp8l = (b"RIFF" + (13).to_bytes(4, "little") + b"WEBP"
            + b"VP8L" + (5).to_bytes(4, "little") + b"\x2f"
            + bits.to_bytes(4, "little"))
    m = parse_media_header(vp8l)
    assert (m["width"], m["height"]) == (512, 256)
    # WebP VP8X (extended): 24-bit canvas minus-one
    vp8x = (b"RIFF" + (18).to_bytes(4, "little") + b"WEBP"
            + b"VP8X" + (10).to_bytes(4, "little")
            + b"\x00\x00\x00\x00"
            + (1023).to_bytes(3, "little") + (767).to_bytes(3, "little"))
    m = parse_media_header(vp8x)
    assert (m["width"], m["height"]) == (1024, 768)
    # truncated TIFF → None, not an exception
    assert parse_media_header(b"II*\x00\x08\x00") is None


def _mp4_box(typ: bytes, payload: bytes) -> bytes:
    return (len(payload) + 8).to_bytes(4, "big") + typ + payload


def test_media_header_mp4():
    """ISO-BMFF: video tkhd canvas + stsz frame count + audio mdhd
    timescale, hand-assembled per ISO/IEC 14496-12."""
    from pipelinedb_spark.operators.multimodal import parse_media_header

    ftyp = _mp4_box(b"ftyp", b"isom" + bytes(4) + b"isomiso2")
    tkhd = _mp4_box(b"tkhd", bytes(76)
                    + (640 << 16).to_bytes(4, "big")
                    + (360 << 16).to_bytes(4, "big"))
    hdlr_v = _mp4_box(b"hdlr", bytes(8) + b"vide" + bytes(12))
    stsz = _mp4_box(b"stsz", bytes(4) + bytes(4)
                    + (240).to_bytes(4, "big"))
    minf = _mp4_box(b"minf", _mp4_box(b"stbl", stsz))
    trak_v = _mp4_box(b"trak", tkhd + _mp4_box(b"mdia", hdlr_v + minf))
    mdhd_a = _mp4_box(b"mdhd", bytes(12) + (48000).to_bytes(4, "big")
                      + bytes(8))
    hdlr_a = _mp4_box(b"hdlr", bytes(8) + b"soun" + bytes(12))
    trak_a = _mp4_box(b"trak", _mp4_box(b"mdia", mdhd_a + hdlr_a))
    p = ftyp + _mp4_box(b"moov", trak_v + trak_a) \
        + _mp4_box(b"mdat", bytes(16))
    m = parse_media_header(p)
    assert m == {"width": 640, "height": 360,
                 "n_frames": 240, "sample_rate": 48000}

    # version-1 tkhd (64-bit times) shifts the canvas by 12 bytes
    tkhd1 = _mp4_box(b"tkhd", b"\x01" + bytes(87)
                     + (1920 << 16).to_bytes(4, "big")
                     + (1080 << 16).to_bytes(4, "big"))
    trak1 = _mp4_box(b"trak", tkhd1 + _mp4_box(b"mdia", hdlr_v + minf))
    m = parse_media_header(ftyp + _mp4_box(b"moov", trak1))
    assert (m["width"], m["height"]) == (1920, 1080)

    # 64-bit largesize moov header
    body = trak_v
    large = (1).to_bytes(4, "big") + b"moov" \
        + (len(body) + 16).to_bytes(8, "big") + body
    m = parse_media_header(ftyp + large)
    assert (m["width"], m["n_frames"]) == (640, 240)

    # ftyp with no moov → None, truncated → None (never an exception)
    assert parse_media_header(ftyp + _mp4_box(b"mdat", b"xx")) is None
    assert parse_media_header(p[:40]) is None


def _ebml(eid: int, payload: bytes) -> bytes:
    i = eid.to_bytes((eid.bit_length() + 7) // 8, "big")
    n = len(payload)
    for ln in range(1, 9):
        if n < (1 << (7 * ln)) - 1:
            return i + ((1 << (7 * ln)) | n).to_bytes(ln, "big") + payload
    raise ValueError


def test_media_header_matroska():
    """Matroska/WebM: EBML varint walk → PixelWidth/Height, audio
    SamplingFrequency, n_frames = Duration·TimestampScale /
    DefaultDuration."""
    import struct

    from pipelinedb_spark.operators.multimodal import parse_media_header

    video = _ebml(0xE0, _ebml(0xB0, (1280).to_bytes(2, "big"))
                  + _ebml(0xBA, (720).to_bytes(2, "big")))
    trk_v = _ebml(0xAE, _ebml(0x83, b"\x01")
                  + _ebml(0x23E383, (40_000_000).to_bytes(4, "big"))
                  + video)
    trk_a = _ebml(0xAE, _ebml(0x83, b"\x02")
                  + _ebml(0xE1, _ebml(0xB5, struct.pack(">f", 44100.0))))
    tracks = _ebml(0x1654AE6B, trk_v + trk_a)
    # 8000 ms at the default 1 ms scale → 8 s → 200 frames at 25 fps
    info = _ebml(0x1549A966,
                 _ebml(0x2AD7B1, (1_000_000).to_bytes(3, "big"))
                 + _ebml(0x4489, struct.pack(">d", 8000.0)))
    p = _ebml(0x1A45DFA3, b"") + _ebml(0x18538067, info + tracks)
    m = parse_media_header(p)
    assert m == {"width": 1280, "height": 720,
                 "n_frames": 200, "sample_rate": 44100}

    # unknown-size Segment (live-streamed files): body runs to EOF
    seg_unknown = (0x18538067).to_bytes(4, "big") + b"\xff" \
        + info + tracks
    m = parse_media_header(_ebml(0x1A45DFA3, b"") + seg_unknown)
    assert (m["width"], m["sample_rate"]) == (1280, 44100)

    # video-only (no Info): dimensions parse, n_frames honestly None
    p2 = _ebml(0x1A45DFA3, b"") + _ebml(0x18538067, tracks)
    m = parse_media_header(p2)
    assert (m["width"], m["height"], m["n_frames"]) == (1280, 720, None)

    # truncated mid-varint / mid-element → never an exception
    for cut in (3, 5, 7, 11, len(p) - 3):
        parse_media_header(p[:cut])  # must not raise


# ------------------------------------------------------ decode fuzz

def test_decoder_fuzz_corrupt_payloads_never_escape(spark):
    """100 TB robustness contract: for ANY byte mutation of a valid
    payload (bit flips, truncation, splices) the decode path either
    returns a (possibly garbage) image, returns null-corrupt, or
    raises NotImplementedError for an honestly-gated sub-format —
    never any other exception, since one escaped error kills the
    whole Spark batch.  This previously leaked zlib.error (corrupt
    PNG IDAT) and KeyError (JPEG scan referencing an undeclared
    Huffman table)."""
    from pipelinedb_spark.operators.multimodal import _decode_any

    rng = np.random.RandomState(99)
    img = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    pal = rng.randint(0, 256, (8, 3))
    seeds = [
        _make_png(img, 2),
        _make_png(img, 2, interlace=True),
        _make_gif(rng.randint(0, 8, (12, 12)), pal),
        _make_jpeg(img),
        _make_progressive_jpeg(img),
    ]
    checked = 0
    for payload in seeds:
        b = bytearray(payload)
        for trial in range(120):
            m = bytearray(b)
            op = trial % 3
            if op == 0:    # flip a random byte
                pos = rng.randint(0, len(m))
                m[pos] ^= 1 << rng.randint(0, 8)
            elif op == 1:  # truncate
                m = m[:rng.randint(1, len(m))]
            else:          # splice random garbage
                pos = rng.randint(0, len(m))
                m[pos:pos + 4] = bytes(rng.randint(0, 256, 4).tolist())
            try:
                _decode_any(bytes(m))
            except NotImplementedError:
                pass  # honest sub-format gate
            checked += 1
    assert checked == 600


def test_decoder_hostile_dimensions_raise_before_alloc():
    """A header declaring absurd dimensions must raise ValueError
    (→ null row) BEFORE any dimension-sized allocation — an executor
    OOM cannot be caught.  Also: a decompression-bomb PNG IDAT may
    not inflate past what the declared dimensions could need."""
    import struct
    import zlib

    from pipelinedb_spark.operators.jpeg import decode_jpeg_py
    from pipelinedb_spark.operators.multimodal import (_decode_any,
                                                       decode_gif_py,
                                                       decode_png_py)

    # PNG declaring 60000x60000
    def chunk(cid, body):
        c = cid + body
        return struct.pack(">I", len(body)) + c \
            + struct.pack(">I", zlib.crc32(c))
    ihdr = struct.pack(">IIBBBBB", 60000, 60000, 8, 2, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(b"\x00" * 100))
           + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="implausible"):
        decode_png_py(png)
    assert _decode_any(png) == (None, None)

    # decompression bomb: tiny IDAT inflating to ~256 MB against a
    # small declared image — bounded inflate keeps it at need-bytes
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    bomb = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"\x00" * (1 << 28), 9))
            + chunk(b"IEND", b""))
    out = decode_png_py(bomb)  # decodes the first rows, stays small
    assert out.shape == (4, 4, 3)

    # GIF logical screen 50000x50000
    gif = bytearray(_make_gif(np.zeros((2, 2), dtype=np.uint8),
                              [[0, 0, 0]]))
    gif[6:8] = (50000).to_bytes(2, "little")
    gif[8:10] = (50000).to_bytes(2, "little")
    with pytest.raises(ValueError, match="implausible"):
        decode_gif_py(bytes(gif))

    # JPEG SOF declaring 65000x65000
    jpg = bytearray(_make_jpeg(np.zeros((8, 8, 3), dtype=np.uint8)))
    i = bytes(jpg).find(b"\xff\xc0")
    jpg[i + 5:i + 7] = (65000).to_bytes(2, "big")
    jpg[i + 7:i + 9] = (65000).to_bytes(2, "big")
    with pytest.raises(ValueError, match="implausible"):
        decode_jpeg_py(bytes(jpg))
    assert _decode_any(bytes(jpg)) == (None, None)


# ---------------------------------------------------------------- PNG

def test_png_adam7_interlaced_exact_decode():
    """Adam7-interlaced PNG (7 independently-filtered passes, every
    filter type exercised) decodes to exactly the same pixels as the
    non-interlaced encoding (round-7 task 3)."""
    from pipelinedb_spark.operators.multimodal import decode_png_py

    rng = np.random.RandomState(41)
    # shapes that hit empty passes (w or h < pass offsets) and ragged
    # pass widths; color types gray/RGB/RGBA/palette
    for (h, w), ctype in [((1, 1), 0), ((3, 2), 2), ((7, 5), 6),
                          ((8, 8), 2), ((13, 11), 0), ((20, 17), 6),
                          ((9, 16), 2)]:
        nch = {0: 1, 2: 3, 6: 4}[ctype]
        shape = (h, w) if nch == 1 else (h, w, nch)
        img = rng.randint(0, 256, shape).astype(np.uint8)
        plain = decode_png_py(_make_png(img, ctype))
        inter = decode_png_py(_make_png(img, ctype, interlace=True))
        assert np.array_equal(inter, plain), (h, w, ctype)
        assert np.array_equal(
            plain.reshape(shape) if nch == 1 else plain, img)
    # palette + Adam7
    pal = rng.randint(0, 256, (16, 3))
    idx = rng.randint(0, 16, (10, 6)).astype(np.uint8)
    got = decode_png_py(_make_png(idx, 3, palette=pal,
                                  interlace=True))
    assert np.array_equal(got, pal[idx])


def test_bmp_8bit_palette_and_32bit():
    """8-bit palette and 32-bit BGRA BMPs decode (both common in real
    corpora); RLE compression stays honestly gated."""
    from pipelinedb_spark.operators.multimodal import decode_bmp_py

    rng = np.random.RandomState(53)
    h, w = 5, 7

    def bmp(bpp, body, extra_dib=b"", palette=b""):
        off = 14 + 40 + len(palette)
        header = (b"BM" + (off + len(body)).to_bytes(4, "little")
                  + b"\x00" * 4 + off.to_bytes(4, "little"))
        dib = ((40).to_bytes(4, "little")
               + w.to_bytes(4, "little", signed=True)
               + h.to_bytes(4, "little", signed=True)
               + (1).to_bytes(2, "little")
               + bpp.to_bytes(2, "little")
               + (0).to_bytes(4, "little")
               + len(body).to_bytes(4, "little") + b"\x00" * 16)
        return header + dib + palette + body

    # 32-bit BGRA, bottom-up
    img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
    body = b"".join(
        np.concatenate([img[y, :, ::-1],
                        np.full((w, 1), 255, np.uint8)],
                       axis=1).tobytes()
        for y in range(h - 1, -1, -1))
    got = decode_bmp_py(bmp(32, body))
    assert np.array_equal(got, img)

    # 8-bit palette (BGRX entries), row stride padded to 4
    pal = rng.randint(0, 256, (16, 3)).astype(np.uint8)
    pal_bytes = b"".join(bytes([b, g, r, 0]) for r, g, b in pal)
    idx = rng.randint(0, 16, (h, w)).astype(np.uint8)
    stride = (w + 3) & ~3
    body = b"".join(
        idx[y].tobytes() + b"\x00" * (stride - w)
        for y in range(h - 1, -1, -1))
    p8 = bmp(8, body, palette=pal_bytes)
    # ncol field (offset 46) left 0 → defaults to 256; set it to 16
    p8 = p8[:46] + (16).to_bytes(4, "little") + p8[50:]
    got = decode_bmp_py(p8)
    assert np.array_equal(got, pal[idx])

    # RLE-compressed → honest gate
    rle = bmp(8, body, palette=pal_bytes)
    rle = rle[:30] + (1).to_bytes(4, "little") + rle[34:]
    with pytest.raises(NotImplementedError, match="compression=1"):
        decode_bmp_py(rle)


def test_png_16bit_depth_decode():
    """16-bit PNG decodes at full precision byte-wise (filters are
    per-byte per PNG spec §9) and emits the high byte — matches the
    8-bit encoding of the same high bytes exactly, across filters,
    color types, and Adam7."""
    from pipelinedb_spark.operators.multimodal import decode_png_py

    rng = np.random.RandomState(47)
    for (h, w), ctype, nch in [((6, 5), 0, 1), ((9, 7), 2, 3),
                               ((8, 8), 6, 4), ((13, 3), 4, 2)]:
        shape = (h, w) if nch == 1 else (h, w, nch)
        img16 = rng.randint(0, 65536, shape).astype(np.uint16)
        filters = [(y * 3) % 5 for y in range(h)]  # exercise all
        got = decode_png_py(_make_png(img16, ctype, filters=filters,
                                      depth=16))
        want = (img16 >> 8).astype(np.uint8).reshape(h, w, nch)
        assert np.array_equal(got, want), (h, w, ctype)
        # Adam7 + 16-bit together
        got_i = decode_png_py(_make_png(img16, ctype, depth=16,
                                        interlace=True))
        assert np.array_equal(got_i, want), ("adam7", h, w, ctype)
    # unsupported depth/color combos stay honestly gated
    p = bytearray(_make_png(np.zeros((4, 4, 3), dtype=np.uint8), 2))
    p[24] = 4  # depth 4 with RGB is not a legal/supported combo
    with pytest.raises(NotImplementedError, match="depth=4"):
        decode_png_py(bytes(p))


def test_png_sub_byte_depths():
    """1/2/4-bit PNGs (scanned documents, small palettes) decode:
    MSB-first bit unpacking after byte-wise unfiltering, gray scaled
    to the full 8-bit range, palette indices mapped through PLTE."""
    from pipelinedb_spark.operators.multimodal import decode_png_py

    rng = np.random.RandomState(59)
    # 1-bit black/white "scan" with ragged width (padding bits)
    bw = rng.randint(0, 2, (11, 13)).astype(np.uint8)
    got = decode_png_py(_make_png(bw, 0, depth=1,
                                  filters=[y % 5 for y in range(11)]))
    assert np.array_equal(got[..., 0], bw * 255)
    # 2-bit gray: 0,85,170,255
    g2 = rng.randint(0, 4, (6, 9)).astype(np.uint8)
    got = decode_png_py(_make_png(g2, 0, depth=2))
    assert np.array_equal(got[..., 0], g2 * 85)
    # 4-bit palette
    pal = rng.randint(0, 256, (16, 3)).astype(np.uint8)
    idx = rng.randint(0, 16, (7, 5)).astype(np.uint8)
    got = decode_png_py(_make_png(idx, 3, palette=pal, depth=4,
                                  filters=[0, 1, 2, 3, 4, 0, 1]))
    assert np.array_equal(got, pal[idx])


# --------------------------------------------------------------- JPEG

def test_progressive_jpeg_scan_script_deterministic():
    """Full Annex-G scan script (interleaved DC first/refine,
    per-component AC bands with EOB runs, AC refinement with
    correction bits) reconstructs a smooth image within baseline
    tolerance; decode stats flow through the Spark decode_pixels
    path for SOF2 payloads (round-7 task 2)."""
    from pipelinedb_spark.operators.jpeg import decode_jpeg_py

    rng = np.random.RandomState(23)
    base = rng.randint(70, 186, (4, 5, 3)).repeat(8, 0).repeat(8, 1)
    img = np.clip(base + rng.randint(-5, 6, base.shape),
                  0, 255).astype(np.uint8)
    p = _make_progressive_jpeg(img)
    assert b"\xff\xc2" in p  # really SOF2
    got = decode_jpeg_py(p)
    assert got.shape == img.shape
    assert np.max(np.abs(got.astype(int) - img.astype(int))) <= 4
    # sparse coefficients (real quant) → multi-block EOB runs
    quant = np.clip(np.arange(64).reshape(8, 8) * 3, 1, 120)
    smooth = np.clip(np.round(
        128 + 60 * np.sin(np.arange(40) / 9.0)[:, None, None]
        + np.zeros((40, 48, 3))), 0, 255).astype(np.uint8)
    got = decode_jpeg_py(_make_progressive_jpeg(smooth, quant=quant))
    assert np.max(np.abs(got.astype(int) - smooth.astype(int))) <= 24


def test_progressive_jpeg_spark_decode_pixels(spark):
    """SOF2 payloads produce real stats rows via decode_pixels."""
    from pipelinedb_spark.operators.multimodal import decode_pixels

    img = np.full((16, 16, 3), 200, dtype=np.uint8)
    img[:, :, 2] = 40
    p = _make_progressive_jpeg(img)
    df = spark.createDataFrame([(1, "image", bytearray(p))],
                               "media_id long, kind string, payload binary")
    row = decode_pixels(df).collect()[0]
    assert (row["width"], row["height"]) == (16, 16)
    assert row["mean_r"] == pytest.approx(200.0, abs=2)
    assert row["mean_b"] == pytest.approx(40.0, abs=2)


def test_multiscan_baseline_jpeg_per_component_scans():
    """Baseline (SOF0) streams with one full-band scan per component
    decode correctly; a stream missing a component's scan raises
    instead of silently emitting zero coefficients (ADVICE r6)."""
    from pipelinedb_spark.operators.jpeg import decode_jpeg_py

    rng = np.random.RandomState(29)
    base = rng.randint(60, 196, (3, 2, 3)).repeat(8, 0).repeat(8, 1)
    img = np.clip(base + rng.randint(-4, 5, base.shape),
                  0, 255).astype(np.uint8)
    ms = _make_progressive_jpeg(
        img, script=[([ci], 0, 63, 0, 0) for ci in range(3)],
        sof=0xC0)
    single = decode_jpeg_py(_make_jpeg(img))
    got = decode_jpeg_py(ms)
    assert np.max(np.abs(got.astype(int) - img.astype(int))) <= 4
    assert np.array_equal(got, single)
    truncated = _make_progressive_jpeg(
        img, script=[([ci], 0, 63, 0, 0) for ci in range(2)],
        sof=0xC0)
    with pytest.raises(ValueError, match="scan coverage incomplete"):
        decode_jpeg_py(truncated)


def test_progressive_jpeg_420_subsampled():
    """4:2:0 progressive (the dominant real-corpus shape): the
    interleaved DC scans walk 2×2 luma blocks per MCU while the AC
    scans cover each component's TRUE block extent — including
    non-multiple-of-16 dimensions where the MCU padding and the
    component extent differ."""
    from pipelinedb_spark.operators.jpeg import decode_jpeg_py

    rng = np.random.RandomState(31)
    ylum = np.clip(rng.randint(90, 166, (5, 4)).repeat(8, 0)
                   .repeat(8, 1) + rng.randint(-5, 6, (40, 32)),
                   20, 235).astype(np.float64)
    # constant chroma → nearest-upsample introduces no chroma error
    img = np.stack([ylum + 1.402 * 20,
                    ylum - 0.344136 * (-10) - 0.714136 * 20,
                    ylum + 1.772 * (-10)], axis=-1)
    img = np.clip(np.round(img), 0, 255).astype(np.uint8)
    got = decode_jpeg_py(_make_progressive_jpeg(img, subsample=True))
    assert got.shape == img.shape
    assert np.max(np.abs(got.astype(int) - img.astype(int))) <= 4
    ragged = img[:37, :27]  # ragged MCUs and component extents
    got2 = decode_jpeg_py(_make_progressive_jpeg(ragged,
                                                 subsample=True))
    assert got2.shape == ragged.shape
    assert np.max(np.abs(got2.astype(int) - ragged.astype(int))) <= 4


def test_progressive_jpeg_dc_only_partial_scripts():
    """Partial progressive scripts are themselves valid streams: a
    DC-only script decodes to the blockwise-mean image (the classic
    'first progressive pass' preview)."""
    from pipelinedb_spark.operators.jpeg import decode_jpeg_py

    img = np.zeros((16, 16), dtype=np.uint8)
    img[:8] = 80
    img[8:] = 200
    p = _make_progressive_jpeg(
        img, script=[([0], 0, 0, 0, 1), ([0], 0, 0, 1, 0)])
    got = decode_jpeg_py(p)[..., 0]
    # each 8x8 block is constant → DC alone reconstructs exactly
    assert np.max(np.abs(got.astype(int) - img.astype(int))) <= 1


def _avi(frames_jpeg: list, w: int, h: int) -> bytes:
    def chunk(cid, body):
        return (cid + len(body).to_bytes(4, "little") + body
                + (b"\x00" if len(body) & 1 else b""))
    avih_body = (bytes(16) + len(frames_jpeg).to_bytes(4, "little")
                 + bytes(12) + w.to_bytes(4, "little")
                 + h.to_bytes(4, "little") + bytes(16))
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih_body))
    movi = chunk(b"LIST", b"movi"
                 + b"".join(chunk(b"00dc", f) for f in frames_jpeg))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def test_mjpeg_avi_real_frame_decode(spark):
    """MJPEG-in-AVI: the movi chunks are JPEGs the in-repo decoder
    handles — sample_video_frames emits REAL per-frame pixel stats
    for a second video container beside GIF; header metadata parses;
    a corrupt frame skips without killing the clip."""
    import numpy as np

    from pipelinedb_spark.operators.multimodal import (
        decode_avi_frames_py, parse_media_header, sample_video_frames)
    from test_operators import _make_jpeg

    levels = [64, 128, 192]
    jpegs = [_make_jpeg(np.full((16, 16, 3), v, dtype=np.uint8))
             for v in levels]
    avi = _avi(jpegs, 16, 16)

    m = parse_media_header(avi)
    assert m == {"width": 16, "height": 16, "n_frames": 3,
                 "sample_rate": None}

    frames = decode_avi_frames_py(avi)
    assert len(frames) == 3
    for fr, v in zip(frames, levels):
        assert fr.shape == (16, 16, 3)
        assert abs(float(fr.mean()) - v) <= 4   # JPEG roundtrip bound

    df = spark.createDataFrame([(7, "video", bytearray(avi))],
                               "media_id long, kind string, "
                               "payload binary")
    rows = sorted((r["frame_idx"], round(r["mean_r"]))
                  for r in sample_video_frames(df).collect())
    assert [i for i, _ in rows] == [0, 1, 2]
    for (_, mr), v in zip(rows, levels):
        assert abs(mr - v) <= 4
    assert sample_video_frames(df, every_n=2).count() == 2

    # one corrupt frame skips; the rest decode
    bad = _avi([jpegs[0], b"\xff\xd8corrupt", jpegs[2]], 16, 16)
    assert len(decode_avi_frames_py(bad)) == 2
    # truncated payload → never an exception
    for cut in (4, 11, 30, len(avi) - 5):
        decode_avi_frames_py(avi[:cut])
    # non-AVI → None
    assert decode_avi_frames_py(b"RIFF\x04\x00\x00\x00WAVE") is None


def test_audio_container_metadata_flac_ogg_mp3():
    """FLAC STREAMINFO, Ogg Vorbis id-header + last-page granule, and
    MP3 frame header + Xing tag all parse dependency-free into the
    (sample_rate, n_frames) fields the WAV branch reports."""
    from pipelinedb_spark.operators.multimodal import parse_media_header

    # FLAC: rate 44100 (20 bits), 2 ch, 16 bps, 123456 total samples
    si = bytearray(34)
    rate, total = 44100, 123456
    si[10] = (rate >> 12) & 0xFF
    si[11] = (rate >> 4) & 0xFF
    si[12] = ((rate & 0xF) << 4) | ((2 - 1) << 1) | ((16 - 1) >> 4)
    si[13] = (((16 - 1) & 0xF) << 4) | ((total >> 32) & 0xF)
    si[14:18] = (total & 0xFFFFFFFF).to_bytes(4, "big")
    flac = b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big") + bytes(si)
    m = parse_media_header(flac)
    assert (m["sample_rate"], m["n_frames"]) == (44100, 123456)

    # Ogg Vorbis: first page w/ id packet, last page w/ granule 48000
    def ogg_page(granule, body, seq):
        seg = bytes([len(body)])
        return (b"OggS\x00\x02" + granule.to_bytes(8, "little")
                + b"\x01\x02\x03\x04" + seq.to_bytes(4, "little")
                + b"\x00\x00\x00\x00" + b"\x01" + seg + body)
    ident = (b"\x01vorbis" + bytes(4) + bytes([2])
             + (22050).to_bytes(4, "little") + bytes(16))
    ogg = ogg_page(0, ident, 0) + ogg_page(48000, b"\x05x", 1)
    m = parse_media_header(ogg)
    assert (m["sample_rate"], m["n_frames"]) == (22050, 48000)

    # MP3: ID3v2 skip + MPEG1 Layer III 44.1k stereo + Xing 100 frames
    hdr = bytes([0xFF, 0xFB, 0x90, 0x00])   # V1 L3, 44100, stereo
    frame = bytearray(417)
    frame[:4] = hdr
    frame[4 + 32:4 + 36] = b"Xing"
    frame[4 + 36:4 + 40] = (1).to_bytes(4, "big")       # flags: frames
    frame[4 + 40:4 + 44] = (100).to_bytes(4, "big")
    id3 = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 10]) + bytes(10)
    m = parse_media_header(id3 + bytes(frame))
    assert (m["sample_rate"], m["n_frames"]) == (44100, 100 * 1152)
    # mono MPEG2 rate table
    m2 = parse_media_header(bytes([0xFF, 0xF3, 0x90, 0xC0]) + bytes(40))
    assert m2["sample_rate"] == 22050 and m2["n_frames"] is None

    # truncation never raises
    for payload in (flac, ogg, id3 + bytes(frame)):
        for cut in (3, 5, 9, 15, len(payload) - 3):
            parse_media_header(payload[:cut])


def test_png_adam7_sub_byte_depths_decode():
    """Code-review regression: the bounded-inflate cap under-counted
    Adam7 sub-byte passes (each pass rounds rows up to whole bytes),
    rejecting valid narrow 1/2/4-bit interlaced PNGs as 'truncated'.
    Interlaced must now match the non-interlaced oracle exactly."""
    from test_operators import _make_png

    from pipelinedb_spark.operators.multimodal import decode_png_py

    rng = np.random.RandomState(5)
    for h, w, d in [(64, 8, 1), (33, 3, 2), (17, 5, 4), (9, 1, 1),
                    (7, 23, 2)]:
        img = (rng.randint(0, 1 << d, (h, w))
               * (255 // ((1 << d) - 1))).astype(np.uint8)
        a = decode_png_py(_make_png(img, 0, interlace=True, depth=d))
        b = decode_png_py(_make_png(img, 0, depth=d))
        assert np.array_equal(a, b), (h, w, d)
