#!/usr/bin/env python
"""Third-decade (sf10 → sf100) scaling re-run of the TEXT path on the
round-11/12 implementation (round-11 verdict task 6): the recorded
ratio_1000x_data predates the one-fold stopword vector, the
array-argmax codegen fix, the 17-language tier set, and the r12
standalone-prefix cap — this probe re-confirms the
O(1)-in-language-count claim at the third decade on the current code.

documents-only replication (the text queries read nothing else), same
generator discipline as scripts/gen_scale.py: keys offset per
replica, every token tagged with the replica id so replica
vocabularies stay disjoint.  Note the tag also means only replica 0's
tokens hit the stopword lists — the fold's per-token membership test
(the dominant cost) still runs on EVERY token, so the scan-path
scaling this measures is the 100 TB-relevant quantity; the same held
for the r10/r11 records, keeping the series comparable.

Runs text_profile and doc_fingerprints (the documents-only bank
queries) best-of-3 through the noop sink at sf10 (×100) and sf100
(×1000); a third-decade ratio at ~10× is linear, anything well above
(modulo cache noise) is superlinear and fails the probe.

Usage: python scripts/scale_probe_text_r12.py
Appends/refreshes "text_third_decade_r12" in BENCH_SCALING.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import duckdb

SRC = "/root/testdata/sf0.1"
WORK = "/tmp/sfgen_text"
QUERIES = ["text_profile", "doc_fingerprints"]
RUNS = 3
RATIO_CAP = 13.0  # 10× is linear; headroom for cache/ambient noise


def gen_documents(src_parquet: str, factor: int, dst_dir: str) -> None:
    """Replicate ONLY the documents table ×factor with the
    gen_scale.py discipline (doc_id offset, per-replica token tag)."""
    os.makedirs(dst_dir, exist_ok=True)
    dst = f"{dst_dir}/documents.parquet"
    if os.path.exists(dst):
        return
    con = duckdb.connect()
    stride = int(con.sql(
        f"SELECT max(doc_id) FROM '{src_parquet}'").fetchone()[0]) + 1
    cols = [c[0] for c in con.sql(
        f"DESCRIBE SELECT * FROM '{src_parquet}'").fetchall()]
    parts = []
    for r in range(factor):
        sel = []
        for c in cols:
            if c == "doc_id":
                sel.append(f"doc_id + {r * stride} AS doc_id")
            elif c == "text" and r > 0:
                sel.append(f"'x{r}' || replace(text, ' ', ' x{r}') "
                           f"AS text")
            else:
                sel.append(c)
        parts.append(f"SELECT {', '.join(sel)} FROM '{src_parquet}'")
    con.sql(f"COPY ({' UNION ALL '.join(parts)}) TO '{dst}' "
            f"(FORMAT PARQUET)")
    print(f"wrote {dst} at {factor}x")


def main() -> None:
    import bench  # repo-root module: sentinel utilities

    sentinel = bench._contention_sentinel()

    # two-step replication keeps each UNION ALL bounded at 100 legs
    gen_documents(f"{SRC}/documents.parquet", 100, f"{WORK}/sf10")
    gen_documents(f"{WORK}/sf10/documents.parquet", 10,
                  f"{WORK}/sf100")

    from pipelinedb_spark import get_spark
    from pipelinedb_spark.querybank import Q

    spark = get_spark("scale_probe_text_r12")
    spark.sparkContext.setLogLevel("ERROR")

    times: dict[str, dict[str, float]] = {q: {} for q in QUERIES}
    for sf_name in ("sf10", "sf100"):
        sf_dir = f"{WORK}/{sf_name}"
        for q in QUERIES:
            runs = []
            for _ in range(RUNS):
                t0 = time.perf_counter()
                Q[q](spark, sf_dir).write.mode("overwrite") \
                    .format("noop").save()
                runs.append(time.perf_counter() - t0)
            times[q][sf_name] = round(min(runs), 3)
            print(f"{q} @ {sf_name}: {times[q][sf_name]} s "
                  f"(runs {[round(r, 2) for r in runs]})")

    ratios = {q: round(times[q]["sf100"] / times[q]["sf10"], 2)
              for q in QUERIES}
    n_docs = duckdb.sql(
        f"SELECT count(*) FROM '{WORK}/sf100/documents.parquet'"
    ).fetchone()[0]
    entry = {
        "what": "third-decade text-path scaling on the r11/r12 code "
                "(one-fold 17-language stopword vector, array-argmax "
                "codegen-safe, prefix-capped standalone lang_id): "
                "documents-only ×100 vs ×1000 replication, "
                f"best-of-{RUNS} noop-sink",
        "sf100_docs": int(n_docs),
        "sf10_sec": {q: times[q]["sf10"] for q in QUERIES},
        "sf100_sec": {q: times[q]["sf100"] for q in QUERIES},
        "third_decade_ratio": ratios,
        "linear_is_10x": True,
        "languages_in_profile": 17,
        "contention": {k: sentinel[k] for k in
                       ("spin_ratio", "bw_ratio", "loadavg_1m",
                        "steal_pct", "contended")},
    }
    out = os.path.join(ROOT, "BENCH_SCALING.json")
    data = json.load(open(out)) if os.path.exists(out) else {}
    data["text_third_decade_r12"] = entry
    with open(out, "w") as f:
        json.dump(data, f, indent=2)
    print(json.dumps(entry))
    bad = {q: r for q, r in ratios.items() if r > RATIO_CAP}
    assert not bad, f"superlinear third-decade ratios: {bad}"


if __name__ == "__main__":
    main()
