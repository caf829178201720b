"""Whole-stage-codegen compilation audit over the full query bank.

Round-11 finding: when the generated processNext() exceeds janino's
64 KB method limit, Spark logs one ERROR and silently runs the ENTIRE
stage interpreted — text_profile degraded 7× with every correctness
check still green (the failure is invisible to value-based oracles,
and count()-based timings hide it because Catalyst prunes the
expensive projections).  With ``spark.sql.codegen.fallback=false`` a
compile failure throws instead, so this audit executes every bank
query end-to-end (noop sink — full materialization, nothing pruned)
under that regime at sf0.001.  Any future expression that outgrows
codegen fails HERE, not as a silent 7× in the bench."""

from __future__ import annotations

import pytest


def test_all_bank_queries_compile_under_codegen_strict(spark, sf_dir):
    from pipelinedb_spark.querybank import Q

    prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    failed = {}
    try:
        for name, fn in sorted(Q.items()):
            try:
                fn(spark, sf_dir).write.mode("overwrite") \
                    .format("noop").save()
            except Exception as exc:  # noqa: BLE001 — report all
                msg = str(exc).splitlines()
                failed[name] = msg[0][:200] if msg else type(exc).__name__
    finally:
        spark.conf.set("spark.sql.codegen.fallback", prev)
    assert not failed, failed


def test_wide_cv_engine_paths_compile_under_codegen_strict(spark, tmp_path):
    """The engine's worker partial / combiner merge / overlay finalize
    plans at realistic CV width (10 stream columns × 6 aggregates = 61
    output columns) under spark.sql.codegen.fallback=false — the same
    silent-interpreted landmine the bank audit guards, isolated to the
    engine's generated plans (two inserts so the merge/upsert plan
    runs, then a finalize read)."""
    from pipelinedb_spark import PipelineContext

    prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    ctx = PipelineContext(spark, root=str(tmp_path / "pdb"),
                          num_buckets=8)
    try:
        ctx.create_stream(
            "wcg", "k string, " + ", ".join(f"v{i} double"
                                            for i in range(10)))
        aggs = []
        for i in range(10):
            aggs += [f"count(v{i}) AS c{i}", f"sum(v{i}) AS s{i}",
                     f"avg(v{i}) AS a{i}", f"min(v{i}) AS mn{i}",
                     f"max(v{i}) AS mx{i}", f"stddev(v{i}) AS sd{i}"]
        ctx.create_view("cv_wcg", "SELECT k, " + ", ".join(aggs) +
                        " FROM wcg GROUP BY k")
        rows = [{"k": f"g{j % 20}",
                 **{f"v{i}": float(i * j % 97) for i in range(10)}}
                for j in range(400)]
        ctx.insert("wcg", rows)
        ctx.insert("wcg", rows)  # merge/upsert plan
        out = ctx.read_view("cv_wcg")
        assert len(out.columns) == 61
        got = {r["k"]: r["c0"] for r in out.collect()}
        assert got == {f"g{j}": 40 for j in range(20)}
    finally:
        spark.conf.set("spark.sql.codegen.fallback", prev)
        ctx.close()
