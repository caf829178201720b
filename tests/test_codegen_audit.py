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
