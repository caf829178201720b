"""Tar-shard ingestion (the WebDataset layout) — how large multimodal
training corpora actually ship: thousands of ~1 GB ``.tar`` shards
whose members are grouped by key prefix::

    000001.jpg   000001.txt   000001.json
    000002.jpg   000002.txt   000002.json

Spark-first shape: ``binaryFile`` distributes the SHARDS (one task
per tar — tar has no central index, so members stream sequentially),
``tarfile`` over an in-memory buffer walks the members, and samples
re-assemble by key prefix into one row per training example with a
``map<string, binary>`` of extension → payload.  From there the
multimodal operators take over (``decode_pixels`` on the image entry,
text/quality operators on the caption).

Scale notes: mirrors operators/warc.py — size shards against
executor memory (the public corpora ship ~1 GB shards for exactly
this reason), cap carried payloads with ``payload_limit``, and add
parallelism with more shards, not bigger ones.
"""

from __future__ import annotations

import io
import os
import tarfile
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TAR_MEMBER_SCHEMA = T.StructType([
    T.StructField("shard", T.StringType()),
    T.StructField("member", T.StringType()),
    T.StructField("key", T.StringType()),
    T.StructField("ext", T.StringType()),
    T.StructField("size", T.LongType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("truncated", T.BooleanType()),
    T.StructField("idx", T.LongType()),   # archive member position
])

SAMPLE_SCHEMA = T.StructType([
    T.StructField("shard", T.StringType()),
    T.StructField("key", T.StringType()),
    T.StructField("entries", T.MapType(T.StringType(), T.BinaryType())),
])


def _split_key_ext(name: str) -> tuple[str, str]:
    """WebDataset key split: everything up to the FIRST dot of the
    basename is the sample key, the rest is the extension (so
    ``a/000001.seg.json`` → key ``a/000001``, ext ``seg.json``)."""
    d, base = os.path.split(name)
    stem, _, ext = base.partition(".")
    return (os.path.join(d, stem) if d else stem), ext


def tar_members(files: DataFrame,
                payload_limit: int = 16 << 20) -> DataFrame:
    """(path, content) shard rows → one row per member file (the
    kernel behind :func:`read_tar`, factored so the SAME parse runs
    over a streaming binaryFile source)."""
    files = files.select("path", "content")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                try:
                    tf = tarfile.open(fileobj=io.BytesIO(bytes(blob)),
                                      mode="r:*")
                except (tarfile.TarError, OSError):
                    continue  # corrupt shard → skip, don't kill batch
                with tf:
                    try:
                        idx = 0
                        for m in tf:
                            if not m.isfile():
                                continue
                            f = tf.extractfile(m)
                            if f is None:
                                continue
                            data = f.read(payload_limit + 1)
                            tr = len(data) > payload_limit
                            key, ext = _split_key_ext(m.name)
                            rows.append((fpath, m.name, key, ext,
                                         int(m.size),
                                         data[:payload_limit], tr, idx))
                            idx += 1
                    except (tarfile.TarError, OSError, EOFError):
                        pass  # truncated mid-stream: keep members read
            yield pd.DataFrame(rows, columns=[
                f.name for f in TAR_MEMBER_SCHEMA.fields])

    return files.mapInPandas(kernel, TAR_MEMBER_SCHEMA)


def read_tar(spark: SparkSession, path: str,
             payload_limit: int = 16 << 20,
             glob: str = "*.tar*") -> DataFrame:
    """Tar shards under ``path`` → one row per member file.
    Compressed shards (``.tar.gz``) decode via the stdlib; members
    larger than ``payload_limit`` are truncated with the true size
    kept in ``size`` and ``truncated`` set."""
    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", glob)
             .load(path))
    return tar_members(files, payload_limit)


def zip_members(files: DataFrame,
                payload_limit: int = 16 << 20) -> DataFrame:
    """(path, content) zip-archive rows → one row per member file —
    same schema as :func:`tar_members`, so WebDataset-style grouping
    works over zip shards too (some public datasets ship zip)."""
    import zipfile

    files = files.select("path", "content")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                try:
                    zf = zipfile.ZipFile(io.BytesIO(bytes(blob)))
                except (zipfile.BadZipFile, OSError):
                    continue  # corrupt shard → skip, don't kill batch
                with zf:
                    idx = 0
                    for m in zf.infolist():
                        if m.is_dir():
                            continue
                        try:
                            with zf.open(m) as f:
                                data = f.read(payload_limit + 1)
                        except (zipfile.BadZipFile, OSError,
                                NotImplementedError):
                            continue  # unsupported compression/corrupt
                        tr = len(data) > payload_limit
                        key, ext = _split_key_ext(m.filename)
                        rows.append((fpath, m.filename, key, ext,
                                     int(m.file_size),
                                     data[:payload_limit], tr, idx))
                        idx += 1
            yield pd.DataFrame(rows, columns=[
                f.name for f in TAR_MEMBER_SCHEMA.fields])

    return files.mapInPandas(kernel, TAR_MEMBER_SCHEMA)


def read_zip(spark: SparkSession, path: str,
             payload_limit: int = 16 << 20,
             glob: str = "*.zip") -> DataFrame:
    """Zip shards under ``path`` → one row per member (see
    :func:`read_tar`; stored + deflate members via stdlib)."""
    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", glob)
             .load(path))
    return zip_members(files, payload_limit)


def webdataset_samples(members: DataFrame) -> DataFrame:
    """Member rows → one row per SAMPLE: entries grouped by key
    prefix into a map<ext, payload>.  Members of one sample sit
    adjacently in one shard (the WebDataset contract), so grouping
    happens inside the per-shard partition — ``groupBy`` over
    (shard, key) shuffles only when members crossed batch
    boundaries, and Spark's map-side partial aggregation keeps that
    shuffle to one combined row per sample."""
    from pyspark.sql import functions as F

    # duplicate member names are LEGAL in tar (an appended member
    # supersedes) and map_from_entries throws on duplicate keys —
    # dedup per (shard, key, ext) keeping the LAST archive occurrence
    # (max_by on the member index), then build the map.  Both aggs
    # are map-side combinable.
    dedup = (members
             .groupBy("shard", "key", "ext")
             .agg(F.max_by("payload", "idx").alias("payload")))
    return (dedup
            .groupBy("shard", "key")
            .agg(F.map_from_entries(
                F.collect_list(F.struct("ext", "payload")))
                .alias("entries")))


def webdataset_media(samples: DataFrame,
                     image_exts: tuple[str, ...] = ("jpg", "jpeg",
                                                    "png", "gif",
                                                    "bmp", "ppm"),
                     caption_exts: tuple[str, ...] = ("txt", "cls",
                                                      "json")
                     ) -> DataFrame:
    """Samples → the (media_id, kind, payload, caption) shape the
    multimodal + text operators consume: first matching image entry
    becomes the payload, first caption-ish entry decodes as utf-8
    text.  media_id is a stable hash of (shard, key)."""
    from pyspark.sql import functions as F

    img = F.coalesce(*[F.col("entries").getItem(e)
                       for e in image_exts])
    cap = F.coalesce(*[F.col("entries").getItem(e)
                       for e in caption_exts])
    return (samples.select(
        F.abs(F.xxhash64("shard", "key")).alias("media_id"),
        F.col("key"),
        F.lit("image").alias("kind"),
        img.alias("payload"),
        F.decode(cap, "utf-8").alias("caption"))
        .filter(F.col("payload").isNotNull()))
