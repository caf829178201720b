"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched mapInPandas.

The container has no codec libraries.  Container-HEADER metadata
(PNG/JPEG/GIF/WAV) and pixel decode of BMP, binary PPM, PNG (DEFLATE
via stdlib ``zlib`` + scanline unfilter), GIF (pure-Python LZW), and
baseline + progressive JPEG (operators/jpeg.py — Huffman entropy
decode + vectorized IDCT) are all real, dependency-free byte/numpy
parsing, including Adam7-interlaced PNG, interlaced GIF, and MJPEG
video frames inside AVI containers.  Only
rare sub-formats (mixed-precision/sampling JPEG pyramids,
16-bit PPM) remain behind ``NotImplementedError``
— the Spark-side plumbing (schemas, batch iteration, partition
sizing, UDF signatures) is exactly what a production deployment
keeps, swapping those branches for PIL/ffmpeg.

Scale notes: media blobs dominate row size, so ``media_partitions``
repartitions by a size-aware key before the UDF to keep Arrow batches
under the executor memory budget; metadata-only operations never touch
the binary column (column pruning drops it at the parquet scan).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import spread_input

_HAS_CODECS = False  # PIL / soundfile / av are not in this container

# Decoder allocation guard: a corrupt/hostile header declaring huge
# dimensions must raise (→ null row) BEFORE any allocation sized by
# those dimensions — an executor OOM from one payload cannot be
# caught.  64 Mpx (≈192 MB RGB) comfortably covers real corpora.
_MAX_PIXELS = 64 * 1024 * 1024


def _check_dims(w: int, h: int) -> None:
    if w < 1 or h < 1 or w * h > _MAX_PIXELS:
        raise ValueError(f"implausible image dimensions {w}x{h}")

MEDIA_META_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("sample_rate", T.IntegerType()),
])


def attach_binary(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", kind: str = "image") -> DataFrame:
    """Build a media table from a text table for plumbing tests: the
    payload is the utf-8 bytes of the text (a stand-in for real pixel/
    sample data)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"))


def parse_media_header(payload: bytes) -> dict | None:
    """REAL container-header metadata — dependency-free byte parsing
    of the standard formats (this part of 'decode' needs no codec
    library): PNG IHDR, JPEG SOF frame header, GIF logical screen
    descriptor, TIFF first-IFD width/length tags (both byte orders),
    WebP VP8/VP8L/VP8X frame headers, WAV RIFF fmt/data chunks,
    AVI MainAVIHeader (canvas + total frames), MP4/ISO-BMFF moov
    track metadata (video canvas + frame count, audio sample rate),
    Matroska/WebM EBML track metadata, FLAC STREAMINFO, Ogg Vorbis
    identification header + last-page granule, MP3 frame header +
    Xing/Info VBR tag.
    Returns None when the payload is not a recognized container
    (callers fall back to the deterministic fake so plumbing tests
    stay engine-agnostic)."""
    p = payload
    try:
        if p[:8] == b"\x89PNG\r\n\x1a\n" and p[12:16] == b"IHDR":
            return {"width": int.from_bytes(p[16:20], "big"),
                    "height": int.from_bytes(p[20:24], "big"),
                    "n_frames": 1, "sample_rate": None}
        if p[:2] == b"\xff\xd8":  # JPEG: scan segments for SOFn
            i = 2
            while i + 9 < len(p):
                if p[i] != 0xFF:
                    i += 1
                    continue
                marker = p[i + 1]
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    i += 2
                    continue
                seg_len = int.from_bytes(p[i + 2:i + 4], "big")
                if marker == 0xDE or (0xC0 <= marker <= 0xCF
                                      and marker not in (0xC4, 0xC8,
                                                         0xCC)):
                    # DHP (hierarchical, Annex J) shares the SOF
                    # layout and carries the authoritative FULL image
                    # size — it precedes every frame header, so
                    # returning on the first size-bearing marker is
                    # correct for both stream shapes
                    return {"width": int.from_bytes(p[i + 7:i + 9], "big"),
                            "height": int.from_bytes(p[i + 5:i + 7], "big"),
                            "n_frames": 1, "sample_rate": None}
                i += 2 + seg_len
            return None
        if p[:6] in (b"GIF87a", b"GIF89a"):
            return {"width": int.from_bytes(p[6:8], "little"),
                    "height": int.from_bytes(p[8:10], "little"),
                    "n_frames": max(1, p.count(b"\x00\x21\xf9")) or 1,
                    "sample_rate": None}
        if p[:4] in (b"II*\x00", b"MM\x00*"):  # TIFF: first IFD
            bo = "little" if p[:2] == b"II" else "big"
            ifd = int.from_bytes(p[4:8], bo)
            n = int.from_bytes(p[ifd:ifd + 2], bo)
            tw = th = None
            for e in range(n):
                o = ifd + 2 + 12 * e
                tag = int.from_bytes(p[o:o + 2], bo)
                typ = int.from_bytes(p[o + 2:o + 4], bo)
                if tag in (256, 257):
                    val = int.from_bytes(
                        p[o + 8:o + 10] if typ == 3 else p[o + 8:o + 12],
                        bo)
                    if tag == 256:
                        tw = val
                    else:
                        th = val
            if tw is not None and th is not None:
                return {"width": tw, "height": th,
                        "n_frames": 1, "sample_rate": None}
            return None
        if p[:4] == b"RIFF" and p[8:12] == b"WEBP":
            cid = p[12:16]
            if cid == b"VP8X":  # extended: 24-bit LE canvas-1
                return {"width": int.from_bytes(p[24:27], "little") + 1,
                        "height": int.from_bytes(p[27:30], "little") + 1,
                        "n_frames": 1, "sample_rate": None}
            if cid == b"VP8 " and p[23:26] == b"\x9d\x01\x2a":
                return {"width": int.from_bytes(p[26:28], "little")
                        & 0x3FFF,
                        "height": int.from_bytes(p[28:30], "little")
                        & 0x3FFF,
                        "n_frames": 1, "sample_rate": None}
            if cid == b"VP8L" and p[20] == 0x2F:  # lossless
                bits = int.from_bytes(p[21:25], "little")
                return {"width": (bits & 0x3FFF) + 1,
                        "height": ((bits >> 14) & 0x3FFF) + 1,
                        "n_frames": 1, "sample_rate": None}
            return None
        if p[:4] == b"RIFF" and p[8:12] == b"AVI ":
            # MainAVIHeader: avih chunk inside LIST hdrl —
            # dwTotalFrames @16, dwWidth @32, dwHeight @36
            for cid, a, b in _riff_chunks(p, 12, len(p)):
                if cid == b"LIST" and p[a:a + 4] == b"hdrl":
                    for c2, a2, b2 in _riff_chunks(p, a + 4, b):
                        if c2 == b"avih" and b2 - a2 >= 40:
                            return {
                                "width": int.from_bytes(
                                    p[a2 + 32:a2 + 36], "little"),
                                "height": int.from_bytes(
                                    p[a2 + 36:a2 + 40], "little"),
                                "n_frames": int.from_bytes(
                                    p[a2 + 16:a2 + 20], "little"),
                                "sample_rate": None}
            return None
        if p[:4] == b"RIFF" and p[8:12] == b"WAVE":
            i, rate, frames = 12, None, None
            while i + 8 <= len(p):
                cid = p[i:i + 4]
                clen = int.from_bytes(p[i + 4:i + 8], "little")
                if cid == b"fmt " and i + 24 <= len(p):
                    channels = int.from_bytes(p[i + 10:i + 12], "little")
                    rate = int.from_bytes(p[i + 12:i + 16], "little")
                    bits = int.from_bytes(p[i + 22:i + 24], "little")
                elif cid == b"data" and rate is not None:
                    bytes_per_frame = max(1, channels * (bits // 8))
                    frames = clen // bytes_per_frame
                i += 8 + clen + (clen & 1)
            if rate is not None:
                return {"width": None, "height": None,
                        "n_frames": frames, "sample_rate": rate}
        if len(p) >= 12 and p[4:8] == b"ftyp":
            return _parse_mp4(p)
        if p[:4] == b"\x1a\x45\xdf\xa3":  # EBML (Matroska / WebM)
            return _parse_mkv(p)
        if p[:4] == b"fLaC":
            return _parse_flac(p)
        if p[:4] == b"OggS":
            return _parse_ogg(p)
        if p[:3] == b"ID3" or (len(p) > 1 and p[0] == 0xFF
                               and (p[1] & 0xE0) == 0xE0):
            return _parse_mp3(p)
        return None
    except (IndexError, ValueError):
        return None  # truncated/corrupt container


def _parse_flac(p: bytes):
    """FLAC STREAMINFO (first metadata block, spec-mandated): sample
    rate (20 bits), channels, total samples (36 bits) — the exact
    fields the WAV branch reports."""
    if p[4] & 0x7F != 0 or len(p) < 8 + 34:  # first block must be
        return None                          # STREAMINFO (type 0)
    b = p[8:8 + 34]
    rate = (b[10] << 12) | (b[11] << 4) | (b[12] >> 4)
    total = ((b[13] & 0x0F) << 32) | int.from_bytes(b[14:18], "big")
    if rate == 0:
        return None
    return {"width": None, "height": None,
            "n_frames": total or None, "sample_rate": rate}


def _parse_ogg(p: bytes):
    """Ogg Vorbis: identification header (\\x01vorbis) for channels/
    rate; total samples from the LAST page's granule position (how
    players compute Ogg duration without decoding)."""
    idp = p.find(b"\x01vorbis", 0, 512)
    if idp < 0:
        return None
    rate = int.from_bytes(p[idp + 12:idp + 16], "little")
    if rate == 0:
        return None
    total = None
    last = p.rfind(b"OggS")
    if last >= 0 and last + 14 <= len(p):
        g = int.from_bytes(p[last + 6:last + 14], "little",
                           signed=True)
        if g > 0:
            total = g
    return {"width": None, "height": None,
            "n_frames": total, "sample_rate": rate}


_MP3_RATES = {3: (44100, 48000, 32000),   # MPEG1
              2: (22050, 24000, 16000),   # MPEG2
              0: (11025, 12000, 8000)}    # MPEG2.5


def _parse_mp3(p: bytes):
    """MP3: first frame header after any ID3v2 tag → sample rate;
    sample count from the Xing/Info VBR tag when present (frames ×
    samples-per-frame; the standard duration path for VBR files)."""
    i = 0
    if p[:3] == b"ID3" and len(p) >= 10:  # syncsafe 28-bit size
        sz = ((p[6] & 0x7F) << 21) | ((p[7] & 0x7F) << 14) \
            | ((p[8] & 0x7F) << 7) | (p[9] & 0x7F)
        i = 10 + sz
    end = min(len(p) - 4, i + 65536)
    while i <= end:
        if p[i] == 0xFF and (p[i + 1] & 0xE0) == 0xE0:
            ver = (p[i + 1] >> 3) & 3
            layer = (p[i + 1] >> 1) & 3
            sr_idx = (p[i + 2] >> 2) & 3
            if ver != 1 and layer != 0 and sr_idx != 3:
                rate = _MP3_RATES[ver][sr_idx]
                # Layer III samples/frame: 1152 (MPEG1) else 576
                spf = 1152 if ver == 3 else 576
                if layer == 3:           # Layer I
                    spf = 384
                elif layer == 2:         # Layer II
                    spf = 1152
                total = None
                mono = ((p[i + 3] >> 6) & 3) == 3
                # Xing/Info sits after the Layer-III side info:
                # MPEG1 32B stereo / 17B mono; MPEG2(.5) 17B / 9B
                side = (17 if mono else 32) if ver == 3 \
                    else (9 if mono else 17)
                off = i + 4 + side
                if p[off:off + 4] in (b"Xing", b"Info") \
                        and p[off + 7] & 1:
                    total = int.from_bytes(p[off + 8:off + 12],
                                           "big") * spf
                return {"width": None, "height": None,
                        "n_frames": total, "sample_rate": rate}
            i += 1
        else:
            i += 1
    return None


def _mp4_boxes(p: bytes, start: int, end: int):
    """Iterate ISO-BMFF boxes in p[start:end): (type, body_lo, body_hi).
    Handles 64-bit largesize (size==1) and to-end boxes (size==0)."""
    i = start
    while i + 8 <= end:
        size = int.from_bytes(p[i:i + 4], "big")
        typ = p[i + 4:i + 8]
        hdr = 8
        if size == 1:
            if i + 16 > end:
                return
            size = int.from_bytes(p[i + 8:i + 16], "big")
            hdr = 16
        elif size == 0:
            size = end - i
        if size < hdr:
            return  # corrupt: would not advance
        yield typ, i + hdr, min(i + size, end)
        i += size


def _mp4_child(p: bytes, lo: int, hi: int, typ: bytes):
    for t, a, b in _mp4_boxes(p, lo, hi):
        if t == typ:
            return a, b
    return None


def _parse_mp4(p: bytes):
    """MP4 / ISO-BMFF (ftyp-branded: mp4/mov/m4a/3gp/heic...) track
    metadata from the moov box tree: video tkhd canvas (16.16 fixed),
    video stsz sample count as n_frames, audio mdhd timescale as the
    sample rate (the timescale IS the rate in standard encodes).
    Spec: ISO/IEC 14496-12 box grammar — public, parsed from scratch.
    """
    moov = _mp4_child(p, 0, len(p), b"moov")
    if moov is None:
        return None
    width = height = n_frames = rate = None
    for t, lo, hi in _mp4_boxes(p, *moov):
        if t != b"trak":
            continue
        mdia = _mp4_child(p, lo, hi, b"mdia")
        if mdia is None:
            continue
        hdlr = _mp4_child(p, *mdia, b"hdlr")
        handler = p[hdlr[0] + 8:hdlr[0] + 12] if hdlr else b""
        if handler == b"vide" and width is None:
            tkhd = _mp4_child(p, lo, hi, b"tkhd")
            if tkhd is not None:
                a = tkhd[0]
                off = a + (88 if p[a] == 1 else 76)  # v1: 64-bit times
                if off + 8 <= tkhd[1]:
                    width = int.from_bytes(p[off:off + 4], "big") >> 16
                    height = int.from_bytes(p[off + 4:off + 8], "big") >> 16
            minf = _mp4_child(p, *mdia, b"minf")
            stbl = minf and _mp4_child(p, *minf, b"stbl")
            stsz = stbl and _mp4_child(p, *stbl, b"stsz")
            if stsz and stsz[0] + 12 <= stsz[1]:
                n_frames = int.from_bytes(p[stsz[0] + 8:stsz[0] + 12],
                                          "big")
        elif handler == b"soun" and rate is None:
            mdhd = _mp4_child(p, *mdia, b"mdhd")
            if mdhd is not None:
                a = mdhd[0]
                ts_off = a + (20 if p[a] == 1 else 12)
                if ts_off + 4 <= mdhd[1]:
                    rate = int.from_bytes(p[ts_off:ts_off + 4], "big")
    if width is None and rate is None:
        return None
    return {"width": width, "height": height,
            "n_frames": n_frames, "sample_rate": rate}


def _ebml_read(p: bytes, i: int, is_id: bool):
    """Read one EBML varint at i → (value, next_i).  IDs keep their
    length-marker bits (matched against the spec's full-ID constants);
    sizes strip them; an all-ones size means unknown → None."""
    b0 = p[i]
    if b0 == 0:
        raise ValueError("invalid EBML varint")
    ln = 8 - b0.bit_length() + 1
    raw = int.from_bytes(p[i:i + ln], "big")
    if is_id:
        return raw, i + ln
    val = raw & ((1 << (7 * ln)) - 1)
    if val == (1 << (7 * ln)) - 1:
        val = None  # unknown-size element (streamed files)
    return val, i + ln


def _ebml_walk(p: bytes, lo: int, hi: int):
    """Iterate child elements: (id, body_lo, body_hi)."""
    i = lo
    while i < hi:
        eid, j = _ebml_read(p, i, True)
        size, k = _ebml_read(p, j, False)
        end = hi if size is None else min(k + size, hi)
        yield eid, k, end
        if end <= i:
            return
        i = end


def _ebml_float(p: bytes, lo: int, hi: int):
    import struct as _struct
    n = hi - lo
    if n == 4:
        return _struct.unpack(">f", p[lo:hi])[0]
    if n == 8:
        return _struct.unpack(">d", p[lo:hi])[0]
    return None


def _parse_mkv(p: bytes):
    """Matroska / WebM metadata via from-scratch EBML parsing (RFC
    8794 varints + the public Matroska element IDs): video PixelWidth/
    PixelHeight, audio SamplingFrequency; n_frames reconstructed as
    Segment duration / the video track's DefaultDuration (ns per
    frame) when both are present — frame counts aren't stored at the
    container level."""
    width = height = rate = None
    dur_scaled = None
    ts_scale = 1_000_000          # Matroska default: 1 ms
    default_dur_ns = None
    for eid, lo, hi in _ebml_walk(p, 0, len(p)):
        if eid != 0x18538067:     # Segment
            continue
        for sid, slo, shi in _ebml_walk(p, lo, hi):
            if sid == 0x1549A966:  # Info
                for iid, ilo, ihi in _ebml_walk(p, slo, shi):
                    if iid == 0x2AD7B1:
                        ts_scale = int.from_bytes(p[ilo:ihi], "big")
                    elif iid == 0x4489:
                        dur_scaled = _ebml_float(p, ilo, ihi)
            elif sid == 0x1654AE6B:  # Tracks
                for tid, tlo, thi in _ebml_walk(p, slo, shi):
                    if tid != 0xAE:  # TrackEntry
                        continue
                    ttype = 0
                    tdur = None
                    vids = auds = None
                    for eid2, elo, ehi in _ebml_walk(p, tlo, thi):
                        if eid2 == 0x83:
                            ttype = int.from_bytes(p[elo:ehi], "big")
                        elif eid2 == 0x23E383:
                            tdur = int.from_bytes(p[elo:ehi], "big")
                        elif eid2 == 0xE0:
                            vids = (elo, ehi)
                        elif eid2 == 0xE1:
                            auds = (elo, ehi)
                    if ttype == 1 and vids and width is None:
                        default_dur_ns = tdur
                        for vid, vlo, vhi in _ebml_walk(p, *vids):
                            if vid == 0xB0:
                                width = int.from_bytes(p[vlo:vhi], "big")
                            elif vid == 0xBA:
                                height = int.from_bytes(p[vlo:vhi], "big")
                    elif ttype == 2 and auds and rate is None:
                        for aid, alo, ahi in _ebml_walk(p, *auds):
                            if aid == 0xB5:
                                f = _ebml_float(p, alo, ahi)
                                if f:
                                    rate = int(round(f))
    if width is None and rate is None:
        return None
    n_frames = None
    if dur_scaled and default_dur_ns:
        n_frames = max(1, int(round(dur_scaled * ts_scale
                                    / default_dur_ns)))
    return {"width": width, "height": height,
            "n_frames": n_frames, "sample_rate": rate}


def _fake_decode(payload: bytes, kind: str) -> dict:
    """Deterministic stand-in for a real decoder.  Derives plausible
    metadata purely from payload length so any engine can oracle it."""
    n = len(payload)
    if kind == "image":
        return {"width": n % 1920 + 1, "height": n % 1080 + 1,
                "n_frames": 1, "sample_rate": None}
    if kind == "video":
        return {"width": n % 1920 + 1, "height": n % 1080 + 1,
                "n_frames": n % 300 + 1, "sample_rate": None}
    if kind == "audio":
        return {"width": None, "height": None,
                "n_frames": n % 480000 + 1, "sample_rate": 16000}
    return {"width": None, "height": None, "n_frames": None,
            "sample_rate": None}


def extract_metadata(df: DataFrame) -> DataFrame:
    """mapInPandas decode: payload → typed metadata.  Arrow-batched;
    the binary column never round-trips through Python rows."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # real container headers first (PNG/JPEG/GIF/WAV parse
            # without codec libs); deterministic fake for opaque
            # payloads so plumbing tests stay engine-agnostic
            metas = [parse_media_header(p) or _fake_decode(p, k)
                     for p, k in zip(pdf["payload"], pdf["kind"])]
            out = pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": [len(p) for p in pdf["payload"]],
                "width": [m["width"] for m in metas],
                "height": [m["height"] for m in metas],
                "n_frames": [m["n_frames"] for m in metas],
                "sample_rate": [m["sample_rate"] for m in metas],
            })
            yield out

    return spread_input(df).mapInPandas(kernel, MEDIA_META_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame
    index.  The frame *pixels* decode is stubbed (`NotImplementedError`
    if called with real codecs off at the pixel level); indices and
    batch shapes are real."""
    meta = extract_metadata(df)
    return meta.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1,
                             F.lit(every_n))).alias("frame_idx"))


PIXEL_STATS_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("format", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("px_sum", T.LongType()),
    T.StructField("mean_r", T.DoubleType()),
    T.StructField("mean_g", T.DoubleType()),
    T.StructField("mean_b", T.DoubleType()),
])


def decode_bmp_py(p: bytes):
    """Uncompressed BMP → (h, w, 3) uint8 RGB array: 24-bit BGR,
    32-bit BGRA (alpha dropped), and 8-bit palette.  Pure numpy/byte
    parsing — no codec library.  Returns None when the payload is not
    a BMP; raises NotImplementedError for RLE-compressed or sub-byte
    palette BMPs."""
    import numpy as np
    if p[:2] != b"BM" or len(p) < 54:  # full header or it's corrupt
        return None
    off = int.from_bytes(p[10:14], "little")
    hdr = int.from_bytes(p[14:18], "little")  # DIB header size
    w = int.from_bytes(p[18:22], "little", signed=True)
    h = int.from_bytes(p[22:26], "little", signed=True)
    bpp = int.from_bytes(p[28:30], "little")
    comp = int.from_bytes(p[30:34], "little")
    if bpp not in (1, 4, 8, 16, 24, 32) or comp not in (0, 1, 2, 3):
        return None  # implausible header → corrupt, not a BMP
    if comp != 0 or bpp not in (8, 24, 32):
        raise NotImplementedError(
            f"BMP compression={comp} bpp={bpp}: only uncompressed "
            "8/24/32-bit BMP decodes without codec libraries")
    top_down, h = h < 0, abs(h)
    _check_dims(w, h)
    nb = bpp // 8
    row_bytes = (w * nb + 3) & ~3
    arr = np.frombuffer(p, dtype=np.uint8, offset=off,
                        count=row_bytes * h)
    arr = arr.reshape(h, row_bytes)[:, :w * nb].reshape(h, w, nb)
    if not top_down:
        arr = arr[::-1]
    if bpp == 8:  # palette: BGRX entries right after the DIB header
        ncol = int.from_bytes(p[46:50], "little") or 256
        pal = np.frombuffer(p, dtype=np.uint8, offset=14 + hdr,
                            count=ncol * 4).reshape(ncol, 4)
        return pal[arr[..., 0]][..., 2::-1]  # index → BGR → RGB
    return arr[..., 2::-1]  # BGR(A) → RGB, alpha dropped


def decode_ppm_py(p: bytes):
    """Binary PPM (P6, maxval ≤ 255) → (h, w, 3) uint8 RGB array.
    Returns None when the payload is not a P6 PPM."""
    import numpy as np
    if p[:2] != b"P6":
        return None
    # header: P6 <w> <h> <maxval> separated by whitespace/comments
    i, fields = 2, []
    while len(fields) < 3:
        while i < len(p) and p[i:i + 1].isspace():
            i += 1
        if p[i:i + 1] == b"#":
            while i < len(p) and p[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(p) and not p[j:j + 1].isspace():
            j += 1
        fields.append(int(p[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not supported")
    arr = np.frombuffer(p, dtype=np.uint8, offset=i, count=w * h * 3)
    return arr.reshape(h, w, 3)


_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def decode_png_py(p: bytes):
    """PNG → (h, w, c) uint8 array, dependency-free: PNG pixel data is
    DEFLATE (stdlib ``zlib``) under per-scanline filters, so the full
    decode needs no codec library.  Supports bit depths 8 and 16
    (16-bit samples decode at full precision and emit the high byte —
    the standard 8-bit rendering), color types 0 (gray), 2 (RGB),
    3 (palette), 4 (gray+alpha), 6 (RGBA), sub-byte depths 1/2/4 for
    gray and palette images, both non-interlaced and Adam7-interlaced.
    Returns None when the payload is not a PNG; raises
    NotImplementedError only for depth/color combinations the spec
    itself forbids or that never occur in training corpora."""
    import zlib

    import numpy as np
    if p[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    w = h = depth = ctype = interlace = None
    palette = None
    idat = []
    i = 8
    while i + 8 <= len(p):
        clen = int.from_bytes(p[i:i + 4], "big")
        cid = p[i + 4:i + 8]
        body = p[i + 8:i + 8 + clen]
        if cid == b"IHDR":
            w = int.from_bytes(body[0:4], "big")
            h = int.from_bytes(body[4:8], "big")
            depth, ctype = body[8], body[9]
            interlace = body[12]
        elif cid == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif cid == b"IDAT":
            idat.append(body)
        elif cid == b"IEND":
            break
        i += 12 + clen  # len + id + crc
    if w is None or not idat:
        return None
    if depth not in (1, 2, 4, 8, 16) or ctype not in (0, 2, 3, 4, 6) \
            or interlace not in (0, 1) \
            or (depth == 16 and ctype == 3) \
            or (depth < 8 and ctype not in (0, 3)):
        raise NotImplementedError(
            f"PNG depth={depth} color={ctype} interlace={interlace}: "
            "unsupported depth/color combination")
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    _check_dims(w, h)
    if depth >= 8:
        bpp = nch * (depth // 8)   # filter unit: BYTES per pixel

        def stride_of(pw):
            return pw * bpp
    else:
        bpp = 1  # sub-byte depths filter on whole bytes (spec §9)

        def stride_of(pw):
            return (pw * nch * depth + 7) // 8
    # bounded inflate: a decompression-bomb IDAT must not expand past
    # what the declared dimensions can legitimately need.  Adam7 is
    # summed EXACTLY per pass: sub-byte depths round every pass row
    # up to whole bytes, so narrow interlaced 1/2/4-bit images need
    # MORE than h·(stride+2) — the old flat bound rejected them as
    # "truncated" (code-review finding)
    if interlace == 1:
        need = 8
        for xs, ys, xstep, ystep in _ADAM7:
            pw = (w - xs + xstep - 1) // xstep if w > xs else 0
            ph = (h - ys + ystep - 1) // ystep if h > ys else 0
            if pw and ph:
                need += ph * (stride_of(pw) + 1)
    else:
        need = h * (stride_of(w) + 2) + 8
    raw = zlib.decompressobj().decompress(b"".join(idat), need)

    def unfilter_block(data, ph, pw):
        """Unfilter ph rows of a pw-pixel-wide (sub-)image and expand
        to (ph, pw*nch) samples (byte samples, or unpacked+scaled
        sub-byte samples)."""
        rows = _png_unfilter(data, ph, stride_of(pw), bpp)
        if depth >= 8:
            return rows
        samples = _png_unpack_bits(rows, pw * nch, depth)
        if ctype == 0:  # gray: scale to full 8-bit range
            samples = samples * (255 // ((1 << depth) - 1))
        return samples.astype(np.uint8)

    unit = nch * (2 if depth == 16 else 1)  # bytes per OUTPUT pixel
    if interlace == 1:  # Adam7: 7 independently-filtered sub-images
        out = np.zeros((h, w, unit), dtype=np.uint8)
        off = 0
        for xs, ys, xstep, ystep in _ADAM7:
            pw = (w - xs + xstep - 1) // xstep if w > xs else 0
            ph = (h - ys + ystep - 1) // ystep if h > ys else 0
            if pw == 0 or ph == 0:
                continue
            need = ph * (stride_of(pw) + 1)
            if len(raw) < off + need:
                raise ValueError("truncated PNG pixel data")
            sub = unfilter_block(raw[off:off + need], ph, pw)
            off += need
            out[ys::ystep, xs::xstep] = sub.reshape(ph, pw, unit)
        arr = out
    else:
        stride = stride_of(w)
        if len(raw) < h * (stride + 1):
            raise ValueError("truncated PNG pixel data")
        arr = unfilter_block(raw[:h * (stride + 1)], h,
                             w).reshape(h, w, unit)
    if depth == 16:
        # big-endian sample pairs → high byte (the 8-bit rendering;
        # the full 16-bit value exists here if a caller ever needs it)
        arr = arr.reshape(h, w, nch, 2)[..., 0]
    if ctype == 3:
        if palette is None:
            raise ValueError("palette PNG without PLTE chunk")
        arr = palette[arr[..., 0]]
    return arr


def _png_unpack_bits(rows: np.ndarray, n_samples: int,
                     depth: int) -> np.ndarray:
    """(h, stride_bytes) packed rows → (h, n_samples) sample values,
    MSB-first within each byte (PNG sub-byte sample order)."""
    import numpy as np
    bits = np.unpackbits(rows, axis=1)
    if depth == 1:
        samples = bits
    else:
        grp = bits.reshape(rows.shape[0], -1, depth)
        weights = 1 << np.arange(depth - 1, -1, -1)
        samples = (grp * weights).sum(axis=2)
    return samples[:, :n_samples]


def _png_unfilter(raw: bytes, h: int, stride: int,
                  bpp: int) -> np.ndarray:
    """Reverse the per-scanline PNG filters over one (sub-)image of
    ``h`` rows × ``stride`` bytes/row with ``bpp`` bytes/pixel →
    (h, stride).  The filter unit is the BYTE regardless of bit depth
    (PNG spec §9: 16-bit images filter each byte of the big-endian
    pair; sub-byte depths use bpp = 1)."""
    import numpy as np
    lines = np.frombuffer(raw, dtype=np.uint8,
                          count=h * (stride + 1)).reshape(h, stride + 1)
    filters, data = lines[:, 0], lines[:, 1:]
    out = np.empty((h, stride), dtype=np.uint8)
    # Unfilter (PNG spec §9): Sub/Up/Average/Paeth reference the
    # reconstructed left/up bytes, so rows go in order; within a row
    # the left-reference recurrence is sequential per PIXEL but
    # vectorizes across channels (a = out[y, x - bpp]).
    for y in range(h):
        f = filters[y]
        cur = data[y].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(
            stride, dtype=np.int32)
        if f == 0:
            out[y] = cur
        elif f == 2:  # Up
            out[y] = (cur + prev) & 0xFF
        elif f == 1:  # Sub: recon[x] = Σ cur[0..x] per channel lane
            out[y] = (cur.reshape(-1, bpp).cumsum(axis=0) & 0xFF) \
                .reshape(stride)
        elif f in (3, 4):
            row = np.zeros(stride, dtype=np.int32)
            for x in range(0, stride, bpp):
                a = row[x - bpp:x] if x else np.zeros(bpp, dtype=np.int32)
                seg = slice(x, x + bpp)
                if f == 3:  # Average
                    row[seg] = (cur[seg] + (a + prev[seg]) // 2) & 0xFF
                else:  # Paeth
                    b = prev[seg]
                    c = (prev[x - bpp:x] if x
                         else np.zeros(bpp, dtype=np.int32))
                    pp = a + b - c
                    pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                    pred = np.where((pa <= pb) & (pa <= pc), a,
                                    np.where(pb <= pc, b, c))
                    row[seg] = (cur[seg] + pred) & 0xFF
            out[y] = row
        else:
            raise ValueError(f"invalid PNG filter type {f}")
    return out


def _lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """GIF-variant LZW decode (LSB-first variable-width codes, clear /
    end codes, max 12-bit) → list of palette indices."""
    clear = 1 << min_code_size
    end = clear + 1
    table: list[bytes] = []

    def reset():
        nonlocal table, width, next_code
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1
        next_code = end + 1

    width = next_code = 0
    reset()
    out: list[int] = []
    acc = bits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << bits
        bits += 8
        while bits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            bits -= width
            if code == clear:
                reset()
                prev = None
                continue
            if code == end:
                return out
            if code < next_code and code < len(table) and (
                    code < clear or table[code]):
                entry = table[code]
            elif code == next_code and prev is not None:
                entry = prev + prev[:1]
            else:
                raise ValueError(f"corrupt LZW stream: code {code}")
            out.extend(entry)
            if prev is not None and next_code < 4096:
                table.append(prev + entry[:1])
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
            prev = entry
    return out


def decode_gif_frames_py(p: bytes, max_frames: int | None = None):
    """GIF → list of composited (H, W, 3) uint8 RGB frames (the
    logical-screen canvas after each image), dependency-free via the
    pure-Python LZW above.  Handles sub-rectangle frames, local color
    tables, transparency, and disposal none/keep (0/1) and
    restore-background (2); returns None when the payload is not a
    restore-background (2), and restore-to-previous (3); deinterlaces
    interlaced frames (4-pass row scatter per GIF89a appendix E);
    returns None when the payload is not a GIF.  GIF is the one
    animated container that decodes without codec libraries, so the
    video frame-sampling path is REAL for it."""
    import numpy as np
    if p[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    W = int.from_bytes(p[6:8], "little")
    H = int.from_bytes(p[8:10], "little")
    _check_dims(W, H)
    flags = p[10]
    bg_index = p[11]
    gct = None
    i = 13
    if flags & 0x80:  # global color table
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(p, dtype=np.uint8, offset=13,
                            count=n * 3).reshape(n, 3)
        i += n * 3
    bg_rgb = (gct[bg_index] if gct is not None
              and bg_index < len(gct) else np.zeros(3, np.uint8))
    canvas = np.broadcast_to(bg_rgb, (H, W, 3)).copy()
    frames: list[np.ndarray] = []
    transparent = None   # per-upcoming-frame transparent index
    disposal = 0
    while i < len(p):
        b0 = p[i]
        if b0 == 0x21:  # extension
            label = p[i + 1]
            i += 2
            if label == 0xF9 and p[i] >= 4:  # graphic control
                gfl = p[i + 1]
                disposal = (gfl >> 2) & 0x07
                transparent = p[i + 4] if gfl & 0x01 else None
            while p[i]:
                i += 1 + p[i]
            i += 1
        elif b0 == 0x2C:  # image descriptor
            left = int.from_bytes(p[i + 1:i + 3], "little")
            top = int.from_bytes(p[i + 3:i + 5], "little")
            w = int.from_bytes(p[i + 5:i + 7], "little")
            h = int.from_bytes(p[i + 7:i + 9], "little")
            lflags = p[i + 9]
            i += 10
            ct = gct
            if lflags & 0x80:  # local color table
                n = 2 << (lflags & 0x07)
                ct = np.frombuffer(p, dtype=np.uint8, offset=i,
                                   count=n * 3).reshape(n, 3)
                i += n * 3
            interlaced = bool(lflags & 0x40)
            min_code = p[i]
            i += 1
            chunks = []
            while p[i]:
                chunks.append(p[i + 1:i + 1 + p[i]])
                i += 1 + p[i]
            i += 1  # block terminator
            idx = _lzw_decode(b"".join(chunks), min_code)
            if len(idx) < w * h:
                raise ValueError("truncated GIF pixel data")
            if ct is None:
                raise ValueError("GIF frame without a color table")
            arr = np.asarray(idx[:w * h], dtype=np.int32).reshape(h, w)
            if interlaced:
                # GIF89a appendix E: rows stored as 4 passes
                # (0,8,16… / 4,12… / 2,6,10… / 1,3,5…) — scatter back.
                order = np.concatenate([np.arange(0, h, 8),
                                        np.arange(4, h, 8),
                                        np.arange(2, h, 4),
                                        np.arange(1, h, 2)])
                deint = np.empty_like(arr)
                deint[order] = arr
                arr = deint
            rect = canvas[top:top + h, left:left + w]
            saved = rect.copy() if disposal == 3 else None
            if transparent is not None:
                mask = arr != transparent
                rect[mask] = ct[arr[mask]]
            else:
                rect[...] = ct[arr]
            frames.append(canvas.copy())
            if disposal == 2:  # restore rect to background
                canvas[top:top + h, left:left + w] = bg_rgb
            elif disposal == 3:  # restore rect to pre-draw pixels
                canvas[top:top + h, left:left + w] = saved
            transparent, disposal = None, 0
            if max_frames is not None and len(frames) >= max_frames:
                return frames
        elif b0 == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"corrupt GIF block 0x{b0:02x}")
    return frames or None


def decode_gif_py(p: bytes):
    """GIF first frame → (h, w, 3) uint8 RGB (see
    :func:`decode_gif_frames_py` for the full animation)."""
    frames = decode_gif_frames_py(p, max_frames=1)
    return frames[0] if frames else None


def decode_jpeg_py(p: bytes):
    """JPEG → (h, w, c) uint8 array — full dependency-free codec in
    operators/jpeg.py (baseline/progressive/lossless/12-bit Huffman
    plus arithmetic SOF9/SOF10/SOF11 entropy decode, hierarchical
    Annex-J frame pyramids with differential SOF5-7 (Huffman) and
    SOF13-15 (arithmetic) frames, dequant, vectorized IDCT, chroma
    upsample, YCbCr→RGB) — every T.81 frame type decodes, including
    subsampled and 12-bit pyramids; only mixed-precision/sampling
    pyramids raise NotImplementedError there."""
    from pipelinedb_spark.operators.jpeg import decode_jpeg_py as _dec
    return _dec(p)


def decode_pixels(df: DataFrame, backend: str = "auto") -> DataFrame:
    """Pixel decode → per-image channel statistics.  ``backend`` is
    the fast-codec seam: 'pil' decodes through Pillow when installed
    (the production path — C codecs), 'pure' uses the dependency-free
    decoders (24-bit BMP, binary PPM, PNG incl. Adam7 via stdlib
    zlib, GIF incl. interlaced via pure-Python LZW, and
    baseline/progressive/lossless/12-bit/arithmetic/hierarchical JPEG
    in operators/jpeg.py + jpegarith.py — hierarchical pyramids
    including differential-lossless SOF7 decode for real), 'auto'
    (default) picks pil when importable.  Under 'pure', rare
    sub-formats (mixed-precision/sampling JPEG pyramids) raise
    NotImplementedError — under 'pil' they decode for real.
    Unrecognized payloads yield a null-stats row (format NULL) rather
    than failing the batch."""
    backend = resolve_decode_backend(backend)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        null_row = (None,) * 8

        # _decode_any: corrupt containers → (None, None) → null row;
        # only honestly-gated sub-formats raise
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                if p is None:
                    rows.append((mid,) + null_row)
                    continue
                fmt, arr = _decode_any(bytes(p), backend)
                if arr is None:
                    rows.append((mid,) + null_row)
                    continue
                h, w, c = arr.shape
                # channel means: gray replicates into r/g/b; alpha
                # (GA/RGBA) is excluded from the color means
                means = arr[..., :3 if c >= 3 else 1].reshape(
                    h * w, -1).mean(axis=0)
                if means.shape[0] == 1:
                    means = [means[0]] * 3
                rows.append((mid, fmt, w, h, c, int(arr.sum()),
                             float(means[0]), float(means[1]),
                             float(means[2])))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              PIXEL_STATS_SCHEMA.fields])

    return spread_input(df).mapInPandas(kernel, PIXEL_STATS_SCHEMA)


FRAME_STATS_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("mean_r", T.DoubleType()),
    T.StructField("mean_g", T.DoubleType()),
    T.StructField("mean_b", T.DoubleType()),
])


def _riff_chunks(p: bytes, start: int, end: int):
    """Iterate RIFF sub-chunks: (fourcc, body_lo, body_hi).  Chunks
    are word-aligned (odd sizes pad one byte)."""
    i = start
    while i + 8 <= end:
        cid = p[i:i + 4]
        size = int.from_bytes(p[i + 4:i + 8], "little")
        lo = i + 8
        hi = min(lo + size, end)
        yield cid, lo, hi
        i = lo + size + (size & 1)


def decode_avi_frames_py(p: bytes, max_frames: int | None = None):
    """MJPEG-in-AVI → list of (h, w, 3) uint8 RGB frames: the RIFF
    'movi' list's video chunks (``NNdc``/``NNdb``, incl. ``rec ``
    sub-lists) are baseline/progressive JPEGs that the in-repo
    decoder (jpeg.py) handles — REAL video pixel decode with no codec
    library, the same way animated GIF is handled.  Returns None when
    the payload is not an AVI; frames whose JPEG payload is a gated
    sub-format raise NotImplementedError (recognized-but-gated, the
    _decode_any contract); other per-frame corruption skips just that
    frame."""
    import numpy as np

    if len(p) < 12 or p[:4] != b"RIFF" or p[8:12] != b"AVI ":
        return None
    frames = []

    def walk(lo, hi):
        for cid, a, b in _riff_chunks(p, lo, hi):
            if max_frames is not None and len(frames) >= max_frames:
                return
            if cid == b"LIST":
                walk(a + 4, b)   # skip the 4-byte list type
            elif (len(cid) == 4 and cid[2:4] in (b"dc", b"db")
                  and p[a:a + 2] == b"\xff\xd8"):
                try:
                    arr = decode_jpeg_py(p[a:b])
                except NotImplementedError:
                    raise
                except Exception:
                    continue   # one corrupt frame must not kill the clip
                if arr is None:
                    continue
                if arr.shape[2] == 1:   # grayscale MJPEG → RGB stats
                    arr = np.repeat(arr, 3, axis=2)
                frames.append(arr[:, :, :3])

    walk(12, len(p))
    return frames


def _decode_video_frames(p: bytes):
    """GIF or MJPEG-AVI → frame list (the two animated containers
    that decode dependency-free), else None."""
    if p[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif_frames_py(p)
    return decode_avi_frames_py(p)


def sample_video_frames(df: DataFrame, every_n: int = 1) -> DataFrame:
    """REAL video frame sampling: decode every ``every_n``-th frame of
    animated-GIF and MJPEG-AVI payloads (the two animated containers
    that decode without codec libraries) to RGB and emit per-frame
    channel stats.  Other payloads produce no rows — for containers
    needing real codecs (h264 mp4 etc.) use :func:`frame_sample`,
    which samples INDICES from header metadata without decoding."""
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                try:
                    frames = _decode_video_frames(bytes(p)) \
                        if p is not None else None
                except NotImplementedError:
                    raise
                except Exception:  # corrupt container → skip row
                    frames = None
                if not frames:
                    continue
                for fi in range(0, len(frames), every_n):
                    fr = frames[fi]
                    m = fr.reshape(-1, 3).mean(axis=0)
                    rows.append((mid, fi, fr.shape[1], fr.shape[0],
                                 float(m[0]), float(m[1]), float(m[2])))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              FRAME_STATS_SCHEMA.fields])

    return spread_input(df).mapInPandas(kernel, FRAME_STATS_SCHEMA)


_PIL_FMT = {"JPEG": "jpg", "PNG": "png", "GIF": "gif", "BMP": "bmp",
            "PPM": "ppm"}


def pil_available() -> bool:
    try:
        import PIL.Image  # noqa: F401
        return True
    except Exception:
        return False


def resolve_decode_backend(backend: str = "auto") -> str:
    """The fast-codec seam (round-8 task 4): 'pil' decodes through
    Pillow (libjpeg-turbo/zlib C codecs, ~2 orders faster than the
    pure-Python Huffman path on JPEG), 'pure' is the dependency-free
    reference, 'auto' picks pil when importable.  Resolved once on
    the driver so a whole job uses one backend."""
    if backend == "auto":
        return "pil" if pil_available() else "pure"
    if backend == "pil" and not pil_available():
        raise ImportError("backend='pil' requested but Pillow is not "
                          "importable — install Pillow or use 'auto'")
    if backend not in ("pil", "pure"):
        raise ValueError(f"unknown decode backend {backend!r}")
    return backend


def _decode_pil(p: bytes):
    """(fmt, (h, w, c) uint8 array) via Pillow, or (None, None) when
    Pillow can't read the payload (caller falls back to the pure
    decoders).  Channel semantics match the pure decoders: L→1,
    LA→2, RGB→3, RGBA→4; palette expands by transparency; exotic
    modes (CMYK, 16-bit) normalize to RGB."""
    import io

    from PIL import Image
    try:
        with Image.open(io.BytesIO(p)) as im:
            fmt = _PIL_FMT.get(im.format)
            if fmt is None:
                return None, None
            if im.mode == "P":
                im = im.convert(
                    "RGBA" if "transparency" in im.info else "RGB")
            elif im.mode not in ("L", "LA", "RGB", "RGBA"):
                im = im.convert("RGB")
            arr = np.asarray(im)
            if arr.ndim == 2:
                arr = arr[:, :, None]
            return fmt, arr
    except Exception:
        return None, None


def _decode_any(p: bytes, backend: str = "pure"):
    """(fmt, array) via the selected backend, or (None, None) for
    unrecognized/corrupt payloads.  backend='pil' tries Pillow first
    and falls back to the pure decoders for anything it can't read
    (including a missing Pillow on an executor that differs from the
    driver).

    Contract: ANY failure parsing untrusted bytes is "corrupt" →
    null row (a 100 TB batch must survive every malformed payload a
    crawl can contain — corrupt DEFLATE streams raise zlib.error,
    references to undeclared JPEG Huffman tables raise KeyError, and
    so on; enumerating exception types is a losing game).  Only
    NotImplementedError passes through: it marks a RECOGNIZED format
    gated by design, which the caller must surface, not null out.
    (Under 'pil' the gated sub-formats decode for real instead —
    that IS the production swap the gates document.)"""
    if backend == "pil":
        try:
            fmt, a = _decode_pil(p)
            if a is not None:
                return fmt, a
        except Exception:
            pass
    try:
        for fmt, fn in (("bmp", decode_bmp_py), ("ppm", decode_ppm_py),
                        ("png", decode_png_py), ("gif", decode_gif_py),
                        ("jpg", decode_jpeg_py)):
            a = fn(p)
            if a is not None:
                return fmt, a
    except NotImplementedError:
        raise
    except Exception:
        pass
    return None, None


def resize_bilinear_py(arr, out_h: int, out_w: int):
    """(h, w, c) uint8 → (out_h, out_w, c) uint8, bilinear with
    edge-clamped half-pixel centers (align_corners=False — the
    convention of the mainstream tensor libraries).  Fully vectorized:
    two gathers + lerp, no Python pixel loop."""
    import numpy as np
    h, w = arr.shape[:2]
    # source coordinate of each output pixel center
    ys = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    a = arr[y0][:, x0].astype(np.float64)
    b = arr[y0][:, x1].astype(np.float64)
    c = arr[y1][:, x0].astype(np.float64)
    d = arr[y1][:, x1].astype(np.float64)
    top = a * (1 - wx) + b * wx
    bot = c * (1 - wx) + d * wx
    out = top * (1 - wy) + bot * wy
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


RESIZED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("format", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("pixels", T.BinaryType()),   # raw HWC uint8
])


def resize_images(df: DataFrame, out_h: int, out_w: int,
                  backend: str = "auto") -> DataFrame:
    """Decode → bilinear-resize to a fixed (out_h, out_w) → raw HWC
    uint8 tensor bytes: the image side of a training-data pipeline
    (every sample the same shape, ready for batching).  Grayscale/
    palette inputs are expanded to their natural channel count;
    unrecognized payloads yield a null-pixels row.  ``backend`` as in
    :func:`decode_pixels` (the Pillow fast-codec seam).

    Scale shape: mapInPandas over size-aware partitions
    (``media_partitions``); output rows are out_h*out_w*c bytes, so
    downstream writers see fixed-size records regardless of source
    image dimensions."""
    backend = resolve_decode_backend(backend)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                fmt = arr = None
                if p is not None:
                    fmt, arr = _decode_any(bytes(p), backend)
                if arr is None:
                    rows.append((mid, None, None, None, None, None))
                    continue
                res = resize_bilinear_py(arr, out_h, out_w)
                rows.append((mid, fmt, out_w, out_h, res.shape[2],
                             res.tobytes()))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              RESIZED_SCHEMA.fields])

    return spread_input(df).mapInPandas(kernel, RESIZED_SCHEMA)


# IMA/DVI ADPCM reference tables (IMA "Recommended Practices for
# Enhancing Digital Audio Compatibility", public domain algorithm)
_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8] * 2, dtype=np.int32)
_IMA_STEP = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767], dtype=np.int32)


def _ima_adpcm_decode(data: bytes, channels: int, block_align: int):
    """IMA ADPCM 'data' bytes → int16-range int32 samples shaped
    (n, channels).  Blocks are independent, so the sequential nibble
    recursion runs vectorized ACROSS blocks×channels — the per-step
    Python loop is samples-per-block long, not total-samples long."""
    if block_align < 4 * channels + 4 * channels:
        raise ValueError(f"implausible ADPCM block_align {block_align}")
    nblocks = len(data) // block_align
    if nblocks == 0:
        return np.zeros((0, channels), dtype=np.int32)
    raw = np.frombuffer(data, np.uint8,
                        nblocks * block_align).reshape(nblocks, -1)
    hdr = raw[:, :4 * channels].reshape(nblocks, channels, 4)
    pred = (hdr[:, :, 0].astype(np.int32)
            | (hdr[:, :, 1].astype(np.int32) << 8))
    pred = (pred ^ 0x8000) - 0x8000          # sign-extend int16
    idx = np.clip(hdr[:, :, 2].astype(np.int32), 0, 88)
    body = raw[:, 4 * channels:]
    ngroups = body.shape[1] // (4 * channels)
    body = body[:, :ngroups * 4 * channels].reshape(
        nblocks, ngroups, channels, 4)
    nib = np.empty((nblocks, ngroups, channels, 8), np.uint8)
    nib[..., 0::2] = body & 0x0F             # low nibble first
    nib[..., 1::2] = body >> 4
    out = np.empty((nblocks, channels, 1 + ngroups * 8), np.int32)
    out[:, :, 0] = pred                      # header predictor = sample 0
    for t in range(ngroups * 8):
        g, k = divmod(t, 8)
        n = nib[:, g, :, k].astype(np.int32)
        step = _IMA_STEP[idx]
        diff = ((step >> 3)
                + np.where(n & 1, step >> 2, 0)
                + np.where(n & 2, step >> 1, 0)
                + np.where(n & 4, step, 0))
        pred = np.clip(np.where(n & 8, pred - diff, pred + diff),
                       -32768, 32767)
        idx = np.clip(idx + _IMA_INDEX[n], 0, 88)
        out[:, :, t + 1] = pred
    return out.transpose(0, 2, 1).reshape(-1, channels)


# MS-ADPCM (WAVE format 2) fixed tables (public Microsoft
# "Multimedia Standards Update" spec / libsndfile ms_adpcm)
_MS_COEFS = np.array([[256, 0], [512, -256], [0, 0], [192, 64],
                      [240, 0], [460, -208], [392, -232]],
                     dtype=np.int64)
_MS_ADAPT = np.array([230, 230, 230, 230, 307, 409, 512, 614,
                      768, 614, 512, 409, 307, 230, 230, 230],
                     dtype=np.int64)


def _ms_adpcm_decode(data: bytes, channels: int, block_align: int):
    """MS-ADPCM 'data' bytes → int16-range samples (n, channels),
    vectorized across blocks (per-nibble recursion runs over a
    (nblocks, channels) state, as the IMA decoder)."""
    hdr_len = 7 * channels
    if block_align <= hdr_len:
        raise ValueError(f"implausible ADPCM block_align {block_align}")
    nblocks = len(data) // block_align
    if nblocks == 0:
        return np.zeros((0, channels), dtype=np.int64)
    raw = np.frombuffer(data, np.uint8,
                        nblocks * block_align).reshape(nblocks, -1)

    def i16(lo, hi):
        v = lo.astype(np.int64) | (hi.astype(np.int64) << 8)
        return (v ^ 0x8000) - 0x8000

    pred_idx = np.clip(raw[:, 0:channels].astype(np.int64), 0, 6)
    off = channels
    delta = i16(raw[:, off:off + 2 * channels:2],
                raw[:, off + 1:off + 2 * channels:2])
    off += 2 * channels
    s1 = i16(raw[:, off:off + 2 * channels:2],
             raw[:, off + 1:off + 2 * channels:2])
    off += 2 * channels
    s2 = i16(raw[:, off:off + 2 * channels:2],
             raw[:, off + 1:off + 2 * channels:2])
    c1 = _MS_COEFS[pred_idx][:, :, 0]
    c2 = _MS_COEFS[pred_idx][:, :, 1]
    body = raw[:, hdr_len:]
    n_nib = body.shape[1] * 2
    # nibble stream interleaves channels sample-by-sample (hi first)
    nib = np.empty((nblocks, n_nib), np.uint8)
    nib[:, 0::2] = body >> 4
    nib[:, 1::2] = body & 0x0F
    steps = n_nib // channels
    out = np.empty((nblocks, channels, 2 + steps), np.int64)
    out[:, :, 0] = s2
    out[:, :, 1] = s1
    for t in range(steps):
        n = nib[:, t * channels:(t + 1) * channels].astype(np.int64)
        signed = n - ((n & 8) << 1)          # 4-bit two's complement
        pred = (s1 * c1 + s2 * c2) // 256 + signed * delta
        pred = np.clip(pred, -32768, 32767)
        s2, s1 = s1, pred
        delta = np.maximum((_MS_ADAPT[n] * delta) // 256, 16)
        out[:, :, 2 + t] = pred
    return out.transpose(0, 2, 1).reshape(-1, channels)


# G.711 companded codecs: 8-bit log PCM → int16 (exact table decode)
def _g711_tables():
    seg = np.arange(256)
    # μ-law (format 7)
    u = ~seg & 0xFF
    sign = np.where(u & 0x80, -1, 1)
    exp = (u >> 4) & 7
    mant = u & 0x0F
    ulaw = sign * ((((mant << 3) + 0x84) << exp) - 0x84)
    # A-law (format 6) — ITU sign convention: bit 7 SET = positive
    a = seg ^ 0x55
    sign_a = np.where(a & 0x80, 1, -1)
    exp_a = (a >> 4) & 7
    mant_a = a & 0x0F
    mag = np.where(exp_a == 0, (mant_a << 4) + 8,
                   ((mant_a << 4) + 0x108) << (exp_a - 1))
    alaw = sign_a * mag
    return ulaw.astype(np.int32), alaw.astype(np.int32)


_ULAW_TABLE, _ALAW_TABLE = _g711_tables()


def decode_wav_py(p: bytes):
    """RIFF/WAVE → (samples float64 in [-1, 1] shaped (n, ch),
    sample_rate).  8/16/32-bit integer PCM, 32/64-bit float PCM,
    IMA/DVI ADPCM (0x11), MS-ADPCM (0x02), and G.711 A-law/μ-law
    (0x06/0x07); the 'fact' chunk trims ADPCM block padding.
    Returns None when the payload is not a WAV; raises
    NotImplementedError for other compressed codecs (mp3-in-wav,
    GSM)."""
    import numpy as np
    if p[:4] != b"RIFF" or p[8:12] != b"WAVE":
        return None
    i, fmt_code, channels, rate, bits = 12, None, None, None, None
    block_align, fact_samples = 0, None
    data = None
    while i + 8 <= len(p):
        cid = p[i:i + 4]
        clen = int.from_bytes(p[i + 4:i + 8], "little")
        if cid == b"fmt ":
            fmt_code = int.from_bytes(p[i + 8:i + 10], "little")
            channels = int.from_bytes(p[i + 10:i + 12], "little")
            rate = int.from_bytes(p[i + 12:i + 16], "little")
            block_align = int.from_bytes(p[i + 20:i + 22], "little")
            bits = int.from_bytes(p[i + 22:i + 24], "little")
        elif cid == b"fact":
            fact_samples = int.from_bytes(p[i + 8:i + 12], "little")
        elif cid == b"data":
            data = p[i + 8:i + 8 + clen]
        i += 8 + clen + (clen & 1)
    if fmt_code is None or data is None:
        raise ValueError("truncated WAV: missing fmt/data chunk")
    if channels < 1 or rate < 1:
        raise ValueError(
            f"corrupt WAV fmt chunk: channels={channels} rate={rate}")
    if fmt_code in (0x02, 0x11):  # MS-ADPCM / IMA ADPCM
        dec = _ms_adpcm_decode if fmt_code == 0x02 else _ima_adpcm_decode
        s = dec(data, channels, block_align)
        if fact_samples is not None:
            s = s[:fact_samples]
        return s.astype(np.float64) / 32768.0, rate
    if fmt_code in (0x06, 0x07):  # G.711 A-law / μ-law
        tbl = _ALAW_TABLE if fmt_code == 0x06 else _ULAW_TABLE
        x = tbl[np.frombuffer(data, dtype=np.uint8)] \
            .astype(np.float64) / 32768.0
        n = (len(x) // channels) * channels
        return x[:n].reshape(-1, channels), rate
    if fmt_code not in (1, 3):  # PCM / IEEE float
        raise NotImplementedError(
            f"WAV format {fmt_code}: only PCM, float, G.711, and "
            "IMA/MS ADPCM decode without codec libraries")
    if fmt_code == 3:
        dt = {32: "<f4", 64: "<f8"}.get(bits)
        if dt is None:
            raise ValueError(f"invalid float WAV bit depth {bits}")
        x = np.frombuffer(data, dtype=dt).astype(np.float64)
    elif bits == 8:
        x = (np.frombuffer(data, dtype=np.uint8)
             .astype(np.float64) - 128) / 128.0
    elif bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    elif bits == 32:
        x = np.frombuffer(data, dtype="<i4").astype(np.float64) / 2**31
    else:
        raise NotImplementedError(f"{bits}-bit integer WAV")
    n = (len(x) // channels) * channels
    return x[:n].reshape(-1, channels), rate


AUDIO_STATS_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("n_samples", T.LongType()),
    T.StructField("duration_s", T.DoubleType()),
    T.StructField("rms", T.DoubleType()),
    T.StructField("peak", T.DoubleType()),
    T.StructField("zero_cross_rate", T.DoubleType()),
])


def decode_audio(df: DataFrame) -> DataFrame:
    """WAV PCM decode → per-clip audio statistics (duration, RMS,
    peak, zero-crossing rate), dependency-free.  Non-WAV payloads
    yield a null-stats row."""
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                dec = None
                if p is not None:
                    try:
                        dec = decode_wav_py(bytes(p))
                    except NotImplementedError:
                        raise
                    except Exception:  # corrupt container → null row
                        dec = None
                if dec is None:
                    rows.append((mid,) + (None,) * 7)
                    continue
                x, rate = dec
                mono = x.mean(axis=1)
                zc = float(np.mean(np.signbit(mono[1:])
                                   != np.signbit(mono[:-1]))) \
                    if len(mono) > 1 else 0.0
                rows.append((mid, rate, x.shape[1], x.shape[0],
                             x.shape[0] / rate,
                             float(np.sqrt((x ** 2).mean())),
                             float(np.abs(x).max(initial=0.0)), zc))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              AUDIO_STATS_SCHEMA.fields])

    return spread_input(df).mapInPandas(kernel, AUDIO_STATS_SCHEMA)


AUDIO_FRAMES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("t_start_s", T.DoubleType()),
    T.StructField("rms", T.DoubleType()),
    T.StructField("zero_cross_rate", T.DoubleType()),
])


def audio_frame_features(df: DataFrame, frame_ms: int = 25,
                         hop_ms: int = 10) -> DataFrame:
    """Windowed audio features (RMS energy + zero-crossing rate per
    frame) — the feature-extraction step of a speech pipeline, one
    output row per frame.  Vectorized framing via stride tricks."""
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "t_start_s": [],
                   "rms": [], "zero_cross_rate": []}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                try:
                    dec = decode_wav_py(bytes(p)) if p is not None \
                        else None
                except NotImplementedError:
                    raise
                except Exception:  # corrupt container → skip row
                    dec = None
                if dec is None:
                    continue  # frame explosion: skip non-audio rows
                x, rate = dec
                mono = x.mean(axis=1)
                flen = max(1, rate * frame_ms // 1000)
                hop = max(1, rate * hop_ms // 1000)
                if len(mono) < flen:
                    continue
                nfr = 1 + (len(mono) - flen) // hop
                frames = np.lib.stride_tricks.as_strided(
                    mono, shape=(nfr, flen),
                    strides=(mono.strides[0] * hop, mono.strides[0]))
                rms = np.sqrt((frames ** 2).mean(axis=1))
                zc = np.mean(np.signbit(frames[:, 1:])
                             != np.signbit(frames[:, :-1]), axis=1)
                out["media_id"].extend([mid] * nfr)
                out["frame_idx"].extend(range(nfr))
                out["t_start_s"].extend((np.arange(nfr) * hop
                                         / rate).tolist())
                out["rms"].extend(rms.tolist())
                out["zero_cross_rate"].extend(zc.tolist())
            yield pd.DataFrame(out)

    return df.mapInPandas(kernel, AUDIO_FRAMES_SCHEMA)


def media_partitions(df: DataFrame, target_bytes: int = 64 << 20,
                     avg_blob_bytes: int = 1 << 20) -> DataFrame:
    """Repartition so each Arrow batch stays within memory budget when
    blobs are large (rows-per-partition ≈ target/avg_blob)."""
    rows_per_part = max(1, target_bytes // avg_blob_bytes)
    n = max(1, df.sparkSession.sparkContext.defaultParallelism)
    return df.repartition(n, F.pmod(F.xxhash64("media_id"), F.lit(rows_per_part)))
