"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched mapInPandas.

The container has no codec libraries, so the *decode* kernels are
stubbed behind ``_HAS_CODECS`` with a deterministic fake used for
tests; the Spark-side plumbing — schemas, batch iteration, partition
sizing, UDF signatures — is real and is exactly what a production
deployment would keep, swapping only the kernel body (PIL/ffmpeg).

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
            metas = [_fake_decode(p, k) for p, k in
                     zip(pdf["payload"], pdf["kind"])]
            if not _HAS_CODECS:
                pass  # real decoders would replace _fake_decode here
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


def decode_pixels(df: DataFrame):
    """Real pixel decode — unavailable in this container."""
    raise NotImplementedError(
        "pixel decode requires PIL/ffmpeg; this container ships without "
        "codecs. extract_metadata/frame_sample exercise the plumbing.")


def media_partitions(df: DataFrame, target_bytes: int = 64 << 20,
                     avg_blob_bytes: int = 1 << 20) -> DataFrame:
    """Repartition so each Arrow batch stays within memory budget when
    blobs are large (rows-per-partition ≈ target/avg_blob)."""
    rows_per_part = max(1, target_bytes // avg_blob_bytes)
    n = max(1, df.sparkSession.sparkContext.defaultParallelism)
    return df.repartition(n, F.pmod(F.xxhash64("media_id"), F.lit(rows_per_part)))
