#!/usr/bin/env python
"""Round-9 scale probes: wall-clock ratio on 10× data for the paths
this round touched, plus plan assertions (the BENCH_SCALING_R7OPS /
R8OPS pattern).

Probes:
* lang_id (script-range tier): one-scan JVM regexp counting over 10×
  documents — asserts no Python in the plan and reports the ratio.
* url_dedup: canonicalize + keep-min-id groupBy at 1× and 10× docs —
  pure Catalyst, one shuffle on the canonical key.
* CJK extraction (stopword-free mode): zh pages through
  extract_main_text at 1× and 10× page count; every page must come
  back dense (boilerplate dropped), not tag-strip fallback.
* bm25_search_many broadcast gate: the same corpus scored under a
  small query set (broadcast side) and a query set forced past the
  gate (shuffle-hash side) — both plans asserted, wall reported for
  10× queries on the shuffle-hash path.

Usage: python scripts/scale_probe_r9.py [--small sf0.01_dir]
       [--big sf0.1_dir]
Writes BENCH_SCALING_R9OPS.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed(fn):
    t0 = time.monotonic()
    out = fn()
    return out, time.monotonic() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", default="/root/testdata/sf0.01")
    ap.add_argument("--big", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from pipelinedb_spark import get_spark

    spark = get_spark("scale_probe_r9")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}

    def docs(sf_dir, mult=1):
        d = spark.read.parquet(f"{sf_dir}/documents.parquet") \
            .select("doc_id", "text")
        if mult > 1:  # replicate with distinct ids for bigger corpora
            reps = spark.range(mult).withColumnRenamed("id", "rep")
            d = (d.crossJoin(reps)
                 .select((F.col("doc_id") + F.col("rep") * 10_000_000)
                         .alias("doc_id"), "text"))
        return d

    # ---- lang_id over 10× documents ----------------------------------
    from pipelinedb_spark.operators.text import lang_id

    def run_lang(mult):
        d = docs(args.big, mult)
        res = d.select(lang_id(F.col("text")).alias("lang")) \
            .groupBy("lang").count()
        plan = res._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "ArrowEval" not in plan
        return {r["lang"] for r in res.collect()}

    run_lang(1)                 # warmup
    langs, tl_small = _timed(lambda: run_lang(1))
    _, tl_big = _timed(lambda: run_lang(10))
    out["lang_id_script_tier"] = {
        "sec_small": round(tl_small, 2), "sec_big": round(tl_big, 2),
        "ratio_10x": round(tl_big / tl_small, 2),
        "plan": "jvm-only (asserted)", "langs_seen": sorted(langs)}

    # ---- url_dedup at 10× --------------------------------------------
    from pipelinedb_spark.operators.text import url_dedup

    def run_urldedup(mult):
        d = docs(args.big, mult)
        g = (F.col("doc_id") % 9973).cast("string")
        v = F.col("doc_id") % 4
        url = (F.when(v == 0, F.concat(F.lit("http://Example"), g,
                                       F.lit(".COM/p/x/?b=2&a=1")))
               .when(v == 1, F.concat(
                   F.lit("http://example"), g,
                   F.lit(".com:80/p/x?a=1&b=2&utm_source=z#f")))
               .when(v == 2, F.concat(
                   F.lit("HTTP://example"), g,
                   F.lit(".com/p/x/?b=2&gclid=42&a=1")))
               .otherwise(F.concat(F.lit("ftp://example"), g,
                                   F.lit(".com/p/x"))))
        res = url_dedup(d.select("doc_id").withColumn("url", url))
        plan = res._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "ArrowEval" not in plan
        return res.count()

    run_urldedup(1)             # warmup
    n_s, tu_small = _timed(lambda: run_urldedup(1))
    n_b, tu_big = _timed(lambda: run_urldedup(10))
    out["url_dedup"] = {
        "kept_small": n_s, "kept_big": n_b,
        "sec_small": round(tu_small, 2), "sec_big": round(tu_big, 2),
        "ratio_10x": round(tu_big / tu_small, 2),
        "plan": "jvm-only (asserted)"}

    # ---- CJK extraction (stopword-free mode) -------------------------
    from pipelinedb_spark.operators.warc import (extract_main_text,
                                                 html_to_text_py)

    zh_nav = ('<div class="menu">' + " ".join(
        f'<a href="/{i}">栏目{i}</a>' for i in range(10)) + "</div>")
    zh_paras = "".join(
        "<p>委员会详细审查了这项提案，认为第二稿已经回应了大部分的"
        "反对意见，而且该稿件在会议召开之前就已经分发给了每一位成员，"
        "供大家提前审阅并提出修改建议，最终表决定于下周举行。</p>"
        for _ in range(8))
    zh_page = (f"<html><body>{zh_nav}<article>{zh_paras}</article>"
               f"{zh_nav}</body></html>").encode()
    assert extract_main_text(zh_page) != html_to_text_py(zh_page)

    def run_cjk(n_pages):
        from pyspark.sql import types as T
        pages = spark.createDataFrame(
            [(i, bytearray(zh_page)) for i in range(n_pages)],
            "doc_id long, payload binary")

        def kern(batches):
            import pandas as pd
            for pdf in batches:
                yield pd.DataFrame({
                    "doc_id": pdf["doc_id"],
                    "dense": [("栏目3" not in extract_main_text(bytes(p)))
                              for p in pdf["payload"]]})
        res = pages.repartition(32).mapInPandas(kern, T.StructType([
            T.StructField("doc_id", T.LongType()),
            T.StructField("dense", T.BooleanType())]))
        assert res.agg(F.min("dense")).first()[0] is True
        return n_pages

    run_cjk(2_000)              # warmup
    _, tc_small = _timed(lambda: run_cjk(2_000))
    _, tc_big = _timed(lambda: run_cjk(20_000))
    out["cjk_extraction"] = {
        "pages_small": 2000, "pages_big": 20000,
        "sec_small": round(tc_small, 2), "sec_big": round(tc_big, 2),
        "ratio_10x": round(tc_big / tc_small, 2),
        "docs_per_sec_big": round(20000 / tc_big),
        "all_pages_dense": True}

    # ---- bm25_search_many across the broadcast gate ------------------
    from pipelinedb_spark.operators.retrieval import (bm25_index,
                                                      bm25_search_many)

    idx = bm25_index(docs(args.big))

    def queries(n):
        words = ["agg", "join", "fast", "window", "scan", "hash",
                 "table", "slow", "value", "merge"]
        return spark.createDataFrame(
            [(i, f"{words[i % 10]} {words[(i // 10) % 10]}")
             for i in range(n)],
            "query_id long, query string")

    def candidate_rows(n_queries):
        # the workload's true size: Σ df over matched (query, term)
        # pairs — the synthetic 31-word vocabulary makes every term
        # maximally dense (~40% of the corpus), the worst case
        q = queries(n_queries)
        qt = (q.select("query_id",
                       F.explode(F.split(F.lower(F.col("query")), " "))
                       .alias("term")).distinct())
        return int(qt.join(idx["dfs"], "term")
                   .agg(F.sum("df")).first()[0])

    def run_bm25(n_queries, force_shuffle):
        kw = {"broadcast_max_bytes": 1} if force_shuffle else {}
        res = bm25_search_many(idx, queries(n_queries), k=5, **kw)
        plan = res._jdf.queryExecution().executedPlan().toString()
        if force_shuffle:
            assert "ShuffledHashJoin" in plan
        else:
            assert "BroadcastHashJoin" in plan
        return res.count()

    run_bm25(1_000, False)      # warmup
    _, tb_b = _timed(lambda: run_bm25(1_000, False))
    _, tb_s1 = _timed(lambda: run_bm25(1_000, True))
    _, tb_s10 = _timed(lambda: run_bm25(10_000, True))
    c1, c10 = candidate_rows(1_000), candidate_rows(10_000)
    out["bm25_search_many_gate"] = {
        "sec_1k_broadcast": round(tb_b, 2),
        "sec_1k_shufflehash": round(tb_s1, 2),
        "sec_10k_shufflehash": round(tb_s10, 2),
        "candidate_rows_1k": c1, "candidate_rows_10k": c10,
        # cost is ∝ candidate rows (one pruned postings pass + ONE
        # shuffle of the candidate set); per-row throughput at 10×
        # load is the linearity statement
        "mrows_per_sec_1k": round(c1 / tb_s1 / 1e6, 2),
        "mrows_per_sec_10k": round(c10 / tb_s10 / 1e6, 2),
        "plans": "broadcast + shuffle-hash (both asserted)"}

    print(json.dumps(out))
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_SCALING_R9OPS.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
