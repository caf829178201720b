#!/usr/bin/env python
"""Continuous-ingest soak through the Structured Streaming runtime at
sf1-equivalent document volume (10× sf0.1 = 50k docs, BENCH-ONLY
derived data — correctness oracles always run on driver testdata).

Path under test: attach_file_stream (maxFilesPerTrigger=1, ≥50
micro-batches) → python curation transform (Gopher quality gate + PII
redaction) → CV aggregating the transform's output stream — the same
chain as tests/test_py_transform.py, under sustained load.

Measures: sustained docs/s end-to-end, micro-batch cadence, driver RSS
at the start vs the end of the run (the osrel segment-log retention
must bound driver/disk state), and the osrel segment count under load.

Usage: python scripts/soak_streaming.py [--factor 10] [--files 50]
Appends/refreshes the "streaming_soak" entry in BENCH_SCALING.json.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from probeutil import rss_kb as _rss_kb


RSS_SAMPLES: list[int] = []




def curate(df):
    """Module-level so the catalog can re-import it by name."""
    from pyspark.sql import functions as F

    from pipelinedb_spark.operators.pii import pii_redact
    from pipelinedb_spark.operators.quality import GOPHER_RULES, gopher_filter

    RSS_SAMPLES.append(_rss_kb())
    rules = {k: GOPHER_RULES[k]
             for k in ("word_count", "dup_line_frac", "top_2gram_char_frac")}
    out = pii_redact(gopher_filter(df, rules=rules))
    return out.withColumn("n_tokens",
                          F.size(F.split(F.col("text"), r"\s+")))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--files", type=int, default=50)
    ap.add_argument("--workdir", default="/tmp/soak_streaming")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_SCALING.json"))
    args = ap.parse_args()

    import duckdb

    from pipelinedb_spark import PipelineContext, get_spark

    shutil.rmtree(args.workdir, ignore_errors=True)
    drop = os.path.join(args.workdir, "drop")
    os.makedirs(drop, exist_ok=True)

    # sf1-equivalent docs, replica-offset ids + per-replica token tag
    # (same recipe as gen_scale.py), pre-split into one file per
    # micro-batch
    con = duckdb.connect()
    stride = con.sql(f"SELECT max(doc_id)+1 FROM "
                     f"'{args.src}/documents.parquet'").fetchone()[0]
    n_total = 0
    per_file = []
    staged = os.path.join(args.workdir, "staged.parquet")
    con.sql(f"""
        COPY (
          SELECT doc_id + r * {stride} AS doc_id,
                 concat('rep', r, ' ', text) AS text, lang, source
          FROM '{args.src}/documents.parquet',
               (SELECT unnest(range({args.factor})) AS r)
        ) TO '{staged}' (FORMAT parquet)
    """)
    n_total = con.sql(f"SELECT count(*) FROM '{staged}'").fetchone()[0]
    rows_per_file = (n_total + args.files - 1) // args.files
    for i in range(args.files):
        con.sql(f"""
            COPY (SELECT * FROM '{staged}'
                  ORDER BY doc_id
                  LIMIT {rows_per_file} OFFSET {i * rows_per_file})
            TO '{os.path.join(drop, f"part_{i:04d}.parquet")}'
            (FORMAT parquet)
        """)
        per_file.append(rows_per_file)

    spark = get_spark("soak_streaming")
    spark.sparkContext.setLogLevel("ERROR")
    ctx = PipelineContext(spark, root=os.path.join(args.workdir, "pdb"),
                          num_buckets=32)
    # demonstrate the segment-log bound under load: retention well
    # below the batch count, so GC must actually reclaim
    ctx.osrel_retention_segments = 16
    ctx.create_stream("docs_in",
                      "doc_id long, text string, lang string, "
                      "source string")
    ctx.create_python_transform("curator", "docs_in", curate)
    ctx.create_view("cv_soak",
                    "SELECT lang, source, count(*) AS n_docs, "
                    "sum(n_tokens) AS toks "
                    "FROM output_of('curator') GROUP BY lang, source")

    from pipelinedb_spark.streaming.runtime import attach_file_stream
    ckpt = os.path.join(args.workdir, "ckpt")
    att = attach_file_stream(
        ctx, "docs_in", drop, fmt="parquet",
        checkpoint_dir=ckpt,
        reader_options={"maxFilesPerTrigger": "1"})
    rss0 = _rss_kb()
    t0 = time.monotonic()
    att.process_all_available()
    wall = time.monotonic() - t0
    att.stop()
    rss1 = _rss_kb()

    # committed micro-batch count from the effectively-once marker
    from pipelinedb_spark.streaming.runtime import _epoch_path
    with open(_epoch_path(ctx, "docs_in", ckpt)) as f:
        batches = int(f.read().strip()) + 1
    result_rows = ctx.read_view("cv_soak").collect()
    ingested = sum(r["n_docs"] for r in result_rows)
    osrel_dir = os.path.join(ctx.osrel_root, "curator_osrel")
    n_segs = len([e for e in os.listdir(osrel_dir)
                  if e.startswith("seg_")]) if os.path.isdir(osrel_dir) else 0
    # RSS trend: mean of the first 5 vs last 5 per-batch samples
    head = sum(RSS_SAMPLES[:5]) / max(1, len(RSS_SAMPLES[:5]))
    tail = sum(RSS_SAMPLES[-5:]) / max(1, len(RSS_SAMPLES[-5:]))

    entry = {
        "what": ("continuous-ingest soak: attach_file_stream "
                 "(maxFilesPerTrigger=1) -> python curation transform "
                 "(gopher+pii) -> CV, sf1-equivalent docs"),
        "docs_total": int(n_total),
        "docs_through_cv": int(ingested),
        "micro_batches": batches,
        "wall_sec": round(wall, 2),
        "docs_per_sec": round(n_total / wall, 1),
        "sec_per_batch": round(wall / max(1, batches), 3),
        "osrel_segments_after": n_segs,
        "driver_rss_mb_start": round(rss0 / 1024, 1),
        "driver_rss_mb_end": round(rss1 / 1024, 1),
        "driver_rss_mb_batch_head5": round(head / 1024, 1),
        "driver_rss_mb_batch_tail5": round(tail / 1024, 1),
    }
    print(json.dumps(entry, indent=1))
    doc = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            doc = json.load(f)
    doc["streaming_soak"] = entry
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=1)
    ctx = None


if __name__ == "__main__":
    main()
