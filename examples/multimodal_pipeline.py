#!/usr/bin/env python
"""Multimodal training-data pipeline, end-to-end and dependency-free.

Every stage below runs real decode — no codec libraries:

  documents table → synthesize PNG/GIF/WAV payloads (stand-ins for a
  crawled media corpus; the encoders live in the test suite)
    → extract_metadata   (container headers, binary column pruned)
    → decode_pixels      (per-image channel stats: PNG zlib+unfilter,
                          GIF LZW, baseline JPEG Huffman+IDCT, BMP/PPM)
    → resize_images      (bilinear → fixed 32x32x3 tensor bytes, the
                          shape a training loader batches)
    → sample_video_frames (animated GIF: composited frames → stats)
    → decode_audio        (WAV PCM → duration/RMS/peak/ZCR)
    → join back to text quality scores → one curated multimodal table

Scale notes printed at the end: metadata never reads the payload
column (column pruning), media rows are size-aware partitioned before
the Arrow UDFs, and every decode is a mapInPandas batch — the exact
plumbing a PIL/ffmpeg-backed production swap keeps.

Run: python examples/multimodal_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import numpy as np


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    sys.path.insert(0, os.path.join(root, "tests"))
    from test_operators import _make_gif, _make_png, _make_wav

    from pyspark.sql import functions as F

    from pipelinedb_spark import get_spark
    from pipelinedb_spark.operators.multimodal import (
        decode_audio, decode_pixels, extract_metadata, media_partitions,
        resize_images, sample_video_frames)
    from pipelinedb_spark.operators.text import analyze_documents

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/testdata/sf0.001"
    spark = get_spark("multimodal_pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # synthesize a media corpus: deterministic payloads per doc_id
    # (images for most, an animated GIF every 7th, audio every 5th)
    def synth(doc_id: int) -> tuple[str, bytes]:
        rng = np.random.RandomState(doc_id % 2**31)
        if doc_id % 5 == 0:
            t = np.arange(4000) / 8000.0
            wav = 0.4 * np.sin(2 * np.pi * (100 + doc_id % 300) * t)
            return "audio", _make_wav(wav, 8000)
        pal = rng.randint(0, 256, (8, 3))
        if doc_id % 7 == 0:
            frames = [(rng.randint(0, 8, (16, 16)).astype(np.uint8),
                       0, 0, None, 0) for _ in range(3)]
            return "video", _make_gif(None, pal, frames=frames)
        img = rng.randint(0, 256, (24, 16, 3))
        return "image", _make_png(img, ctype=2)

    ids = [r[0] for r in docs.select("doc_id").collect()]
    media_rows = [(i,) + synth(i) for i in ids]
    media = spark.createDataFrame(
        media_rows, "media_id long, kind string, payload binary")
    media = media_partitions(media, avg_blob_bytes=4 << 10)

    meta = extract_metadata(media)
    px = decode_pixels(media.filter("kind = 'image'"))
    tensors = resize_images(media.filter("kind = 'image'"), 32, 32)
    vframes = sample_video_frames(media.filter("kind = 'video'"))
    audio = decode_audio(media.filter("kind = 'audio'"))

    quality = analyze_documents(docs).select("doc_id", "quality")
    curated = (tensors.filter("pixels IS NOT NULL")
               .join(quality, tensors.media_id == quality.doc_id)
               .filter("quality > 0.2")
               .select("media_id", "format", "width", "height",
                       "channels", "quality"))

    print("media rows:", media.count())
    print("metadata kinds:",
          sorted((r["kind"], r["cnt"]) for r in
                 meta.groupBy("kind")
                 .agg(F.count("*").alias("cnt")).collect()))
    print("decoded image stats rows:", px.filter(
        "format IS NOT NULL").count())
    print("fixed-shape tensors:", curated.count(),
          "curated (quality-joined)")
    print("video frames sampled:", vframes.count())
    print("audio clips decoded:", audio.filter(
        "rms IS NOT NULL").count())
    print("\nscale shape: metadata plan prunes the payload column;"
          "\ndecodes are Arrow-batched mapInPandas over size-aware"
          "\npartitions; every stage is a DataFrame op (no driver"
          "\nloops except this demo's synth step).")


if __name__ == "__main__":
    main()
