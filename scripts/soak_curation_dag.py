#!/usr/bin/env python
"""Curation-DAG soak (round-8 task 7): N streaming epochs of the full
WARC → extract → span-probe/clean → classifier gate → DSIR score →
BPE count → CV chain, with a per-epoch span-index append, measuring
sustained docs/s, epoch cadence, and driver RSS head vs tail (the
persisted index grows one version dir per epoch; driver state must
stay flat).  A forced mid-run restart (fresh PipelineContext +
re-delivered epoch) asserts effectively-once on both sinks — the same
invariant tests/test_curation_dag.py pins, here under sustained load.

Usage: python scripts/soak_curation_dag.py [--epochs 30] [--pages 40]
Appends/refreshes the "curation_dag_soak" entry in BENCH_SCALING.json.
"""

from __future__ import annotations

import argparse
import gzip
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from probeutil import rss_kb as _rss_kb





def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--pages", type=int, default=40)
    args = ap.parse_args()

    import numpy as np
    from pyspark.sql import functions as F

    from pipelinedb_spark import PipelineContext, get_spark
    from pipelinedb_spark.indexstore import read_index
    from pipelinedb_spark.operators.bpe import BPETokenizer
    from pipelinedb_spark.operators.classifier import \
        train_text_classifier
    from pipelinedb_spark.operators.dsir import dsir_fit, dsir_weights
    from pipelinedb_spark.operators.spandedup import (
        remove_duplicated_spans, span_index_append, span_index_persist,
        span_index_probe)
    from pipelinedb_spark.operators.warc import (warc_records,
                                                 warc_text_documents)
    from pipelinedb_spark.streaming.runtime import _foreach_batch

    spark = get_spark("soak_curation_dag")
    spark.sparkContext.setLogLevel("ERROR")

    work = "/tmp/soak_curation_dag"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)

    rng = np.random.RandomState(7)
    prose_w = ["committee", "reviewed", "the", "proposal", "and",
               "most", "members", "agreed", "that", "funding",
               "should", "be", "spread", "over", "budget", "years"]
    junk_w = ["def", "import", "class", "lambda", "dict", "module"]
    boiler = ("subscribe to our newsletter for updates about every "
              "committee meeting this season")

    def prose(i):
        return (" ".join(rng.choice(prose_w, 40)) + f" m{i} "
                + " ".join(rng.choice(prose_w, 40)))

    def page(paras):
        return ("<html><body>\n"
                + "\n".join(f"<p>{p}</p>" for p in paras)
                + "\n</body></html>").encode()

    def rec(rid, payload):
        http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                + payload)
        hdr = (f"WARC/1.0\r\nWARC-Type: response\r\n"
               f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
               f"WARC-Target-URI: http://e.com/{rid}\r\n"
               f"Content-Length: {len(http)}\r\n\r\n").encode()
        return hdr + http + b"\r\n\r\n"

    def shard(e):
        recs = [rec(f"e{e}p{p}", page([boiler, prose(f"{e}_{p}"),
                                       boiler]))
                for p in range(args.pages)]
        recs.append(rec(f"e{e}junk",
                        page([" ".join(rng.choice(junk_w, 50))])))
        f = os.path.join(work, f"shard-{e}.warc.gz")
        with open(f, "wb") as fh:
            fh.write(gzip.compress(b"".join(recs)))
        return f

    pos = spark.createDataFrame([(prose(f"t{i}"),) for i in range(40)],
                                "text string")
    neg = spark.createDataFrame(
        [(" ".join(rng.choice(junk_w, 50)),) for i in range(40)],
        "text string")
    clf = train_text_classifier(pos, neg, buckets=512, sample=100,
                                iters=120, seed=0)
    dsir_model = dsir_fit(neg.unionByName(pos), pos, buckets=512)
    tok = BPETokenizer([])

    span_idx = os.path.join(work, "span_idx")
    seed = spark.createDataFrame([(0, boiler + " " + boiler)],
                                 "doc_id long, text string")
    span_index_persist(seed, span_idx, window=5)

    root = os.path.join(work, "pdb")
    ck = os.path.join(work, "ck")

    def mk_ctx():
        ctx = PipelineContext(spark, root=root, num_buckets=8)
        if "curated" not in ctx.streams:
            ctx.create_stream("curated",
                              "src string, doc_id long, n_tokens long")
            ctx.create_view("cv_cur",
                            "SELECT src, count(*) AS n_docs, "
                            "sum(n_tokens) AS total_tokens "
                            "FROM curated GROUP BY src")
        return ctx

    def run_epoch(ctx, handler, e, path):
        files = (spark.read.format("binaryFile").load(path)
                 .select("path", "content"))
        docs = warc_text_documents(warc_records(files), min_chars=5) \
            .select("doc_id", "url", "text") \
            .localCheckpoint(eager=True)
        spans = span_index_probe(spark, span_idx, docs, keep="first")
        cleaned = remove_duplicated_spans(docs, spans=spans, window=5) \
            .drop("removed_tokens")
        kept = clf.filter(cleaned, threshold=0.5)
        scored = dsir_weights(kept, model=dsir_model)
        counted = tok.token_count(scored, out_col="n_tokens")
        batch = counted.select(
            F.lit(f"e{e}").alias("src"), "doc_id",
            F.col("n_tokens").cast("long")).localCheckpoint(eager=True)
        handler(batch, e)
        span_index_append(spark, span_idx, kept, txn=("dag", e))

    ctx = mk_ctx()
    handler = _foreach_batch(ctx, "curated", ck)
    rss, times = [], []
    t_start = time.monotonic()
    restart_at = args.epochs // 2
    for e in range(args.epochs):
        if e == restart_at:
            # forced restart: abandon the context, reopen the root,
            # REPLAY the previous epoch before continuing
            ctx = mk_ctx()
            handler = _foreach_batch(ctx, "curated", ck)
            run_epoch(ctx, handler, e - 1, shard_path)  # replay: no-op
        shard_path = shard(e)
        t0 = time.monotonic()
        run_epoch(ctx, handler, e, shard_path)
        times.append(time.monotonic() - t0)
        rss.append(_rss_kb())
    elapsed = time.monotonic() - t_start

    # effectively-once across the restart: every epoch exactly once
    state = {r["src"]: (r["n_docs"], r["total_tokens"])
             for r in ctx.read_view("cv_cur").collect()}
    assert len(state) == args.epochs, len(state)
    assert all(n == args.pages for n, _ in state.values()), state
    idx_rows = read_index(spark, span_idx).count()
    versions = len(read_index(spark, span_idx).inputFiles())

    head = sum(rss[:5]) / 5
    tail = sum(rss[-5:]) / 5
    docs_total = args.epochs * (args.pages + 1)
    out = {
        "epochs": args.epochs,
        "pages_per_epoch": args.pages,
        "docs_per_sec": round(docs_total / elapsed, 1),
        "sec_per_epoch": round(sum(times) / len(times), 2),
        "restart_replayed_epoch": restart_at - 1,
        "effectively_once": True,
        "span_index_rows": int(idx_rows),
        "span_index_files": int(versions),
        "driver_rss_mb_head5": round(head / 1024, 1),
        "driver_rss_mb_tail5": round(tail / 1024, 1),
        "rss_growth_pct": round(100.0 * (tail - head) / head, 1),
    }
    print(json.dumps(out))

    bench = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_SCALING.json")
    data = {}
    if os.path.exists(bench):
        with open(bench) as f:
            data = json.load(f)
    data["curation_dag_soak"] = out
    with open(bench, "w") as f:
        json.dump(data, f, indent=1)
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
