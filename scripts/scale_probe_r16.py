#!/usr/bin/env python
"""Round-16 scale probes for the two r15 size-gated kernels, at the
scale where their gates ENGAGE (r15 verdict task 5: the 200k-vector
query-matrix win and the two-phase t-digest existed only in report
prose — record them in a committed artifact, with parity/oracle
tripwires that fail the probe on any divergence).

Writes BENCH_SCALING_R16OPS.json:

* ``ann_query_matrix_kernel`` — ann_cosine_topk at sf10 (200k
  vectors, corpus estimate ~52 MB >= the 16 MB gate): kernel vs the
  crossJoin+HOF join path (gate forced off via
  $SPARK_GRAFT_ANN_MATRIX_MIN_BYTES), interleaved best-of-3 through
  the noop sink, outputs asserted ROW-IDENTICAL.
* ``tdigest_two_phase`` — quantile_family at sf1 (1M events) AND sf10
  (10M): forced two-phase partial/merge build (cap=0) vs the
  one-phase grouped-agg UDAF (cap huge), interleaved best-of-3; the
  two-phase output is oracle-checked against duckdb (same row_set
  hash compare as scripts/check_oracle.py) — p50/p90/p99 exact, rank
  bounds green.  The measured crossover (one-phase faster at the
  9 MiB sf1 estimate, two-phase 1.36x faster at the 91 MiB sf10
  estimate) motivated retuning the gate default 256 MiB -> 32 MiB;
  the probe records that the DEFAULT gate now picks two-phase at
  sf10 (MapInPandas in the executed plan) and one-phase at sf1.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def _gen(sf_dir: str, factor: int) -> str:
    if not os.path.isdir(sf_dir):
        from scripts.gen_scale import generate
        generate("/root/testdata/sf0.1", factor, sf_dir)
    return sf_dir


def main() -> None:
    import duckdb

    from pipelinedb_spark import get_spark
    from pipelinedb_spark.querybank import Q
    from scripts.check_oracle import TABLES, row_set

    sf1 = _gen("/tmp/sfgen/sf1", 10)
    sf10 = _gen("/tmp/sfgen/sf10", 100)

    spark = get_spark("scale_probe_r16")
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df) -> None:
        df.write.mode("overwrite").format("noop").save()

    def timed(fn, sf_dir: str) -> float:
        t0 = time.perf_counter()
        noop(fn(spark, sf_dir))
        return round(time.perf_counter() - t0, 3)

    out: dict = {"what": __doc__.split("\n\n")[0],
                 "loadavg_start": round(os.getloadavg()[0], 2)}

    # ---- seat 1: query-matrix kernel at sf10 ---------------------------
    fn = Q["ann_cosine_topk"]
    noop(fn(spark, sf10))                       # warm pass (kernel on)
    kern, join = [], []
    for _ in range(3):
        os.environ.pop("SPARK_GRAFT_ANN_MATRIX_MIN_BYTES", None)
        kern.append(timed(fn, sf10))
        os.environ["SPARK_GRAFT_ANN_MATRIX_MIN_BYTES"] = str(1 << 62)
        join.append(timed(fn, sf10))
    os.environ.pop("SPARK_GRAFT_ANN_MATRIX_MIN_BYTES", None)
    rows_k = sorted(tuple(r) for r in fn(spark, sf10).collect())
    os.environ["SPARK_GRAFT_ANN_MATRIX_MIN_BYTES"] = str(1 << 62)
    rows_j = sorted(tuple(r) for r in fn(spark, sf10).collect())
    os.environ.pop("SPARK_GRAFT_ANN_MATRIX_MIN_BYTES", None)
    parity = rows_k == rows_j and len(rows_k) == 50
    out["ann_query_matrix_kernel"] = {
        "what": "ann_cosine_topk at sf10 (200k vectors): int64 "
                "query-matrix matmul kernel w/ per-task top-k vs the "
                "crossJoin+HOF join (gate env-forced off), interleaved "
                "best-of-3, noop sink, one session",
        "sf": "sf10 (100x sf0.1 embeddings)",
        "kernel_sec": kern, "join_sec": join,
        "kernel_best": min(kern), "join_best": min(join),
        "speedup": round(min(join) / min(kern), 2),
        "rows_identical": parity, "rows": len(rows_k),
    }
    print("ann seat:", out["ann_query_matrix_kernel"], flush=True)

    # ---- seat 2: two-phase t-digest at sf1 and sf10 --------------------
    fn = Q["quantile_family"]
    os.environ["SPARK_GRAFT_TDIGEST_ONE_PHASE_CAP"] = "0"
    noop(fn(spark, sf1))                        # warm pass (two-phase)
    two, one, two10, one10 = [], [], [], []
    for _ in range(3):
        os.environ["SPARK_GRAFT_TDIGEST_ONE_PHASE_CAP"] = "0"
        two.append(timed(fn, sf1))
        two10.append(timed(fn, sf10))
        os.environ["SPARK_GRAFT_TDIGEST_ONE_PHASE_CAP"] = str(1 << 62)
        one.append(timed(fn, sf1))
        one10.append(timed(fn, sf10))
    # DEFAULT gate (32 MiB after the r16 retune): one-phase at sf1
    # (9 MiB estimate), two-phase at sf10 (91 MiB)
    os.environ.pop("SPARK_GRAFT_TDIGEST_ONE_PHASE_CAP", None)
    def _has_mip(sf_dir: str) -> bool:
        return "MapInPandas" in fn(spark, sf_dir)._jdf.queryExecution() \
            .optimizedPlan().toString()
    default_gate = {"sf1_two_phase": _has_mip(sf1),
                    "sf10_two_phase": _has_mip(sf10)}
    os.environ["SPARK_GRAFT_TDIGEST_ONE_PHASE_CAP"] = "0"
    sdf = fn(spark, sf1)
    scols = [c.lower() for c in sdf.columns]
    srows = [tuple(r) for r in sdf.collect()]
    os.environ.pop("SPARK_GRAFT_TDIGEST_ONE_PHASE_CAP", None)
    con = duckdb.connect()
    for tbl in TABLES:
        p = f"{sf1}/{tbl}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM "
                        f"read_parquet('{p}')")
    import __spark_entry__ as entrymod
    cur = con.execute(entrymod.oracle_sql()["quantile_family"])
    ocols = [d[0].lower() for d in cur.description]
    orows = cur.fetchall()
    oracle_ok = (len(srows) == len(orows)
                 and row_set(srows, scols) == row_set(orows, ocols))
    out["tdigest_two_phase"] = {
        "what": "quantile_family at sf1 (1M events): forced two-phase "
                "partial/merge t-digest (cap=0) vs one-phase grouped-"
                "agg UDAF (cap huge), interleaved best-of-3, noop "
                "sink; two-phase output oracle-checked vs duckdb",
        "sf": "sf1 (10x sf0.1 events) and sf10 (100x)",
        "sf1_two_phase_sec": two, "sf1_one_phase_sec": one,
        "sf1_speedup_two_over_one": round(min(one) / min(two), 2),
        "sf10_two_phase_sec": two10, "sf10_one_phase_sec": one10,
        "sf10_speedup_two_over_one": round(min(one10) / min(two10), 2),
        "default_gate_32mib_picks": default_gate,
        "two_phase_oracle_ok": oracle_ok, "rows": len(srows),
    }
    print("tdigest seat:", out["tdigest_two_phase"], flush=True)

    out["loadavg_end"] = round(os.getloadavg()[0], 2)
    path = os.path.join(ROOT, "BENCH_SCALING_R16OPS.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path)
    # tripwires: any parity/oracle divergence fails the probe
    if not parity:
        sys.exit("TRIPWIRE: query-matrix kernel rows differ from join")
    if not oracle_ok:
        sys.exit("TRIPWIRE: two-phase t-digest breaks the duckdb oracle")


if __name__ == "__main__":
    main()
