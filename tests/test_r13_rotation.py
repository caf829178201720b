"""Round-13 bank rotation residue: `cv_engine_sliding_window` left the
driver bank (its slot now runs the TTL-reaper retention check, round-12
verdict task 5) — the end-to-end SW-engine equivalence it covered (a
1-hour sliding-window CV read immediately after ingest equals the full
batch aggregate: overlay = step re-combine + finalize) stays
oracle-checked here against duckdb, verbatim both sides.
"""

from __future__ import annotations

import tempfile

import duckdb
import pytest
from pyspark.sql import functions as F


def test_cv_engine_sliding_window_matches_duckdb(spark, sf_dir):
    from pipelinedb_spark import PipelineContext

    root = tempfile.mkdtemp(prefix="pdb_rot13_sw_")
    ctx = PipelineContext(spark, root=root, num_buckets=16,
                          track_output_streams=False)
    try:
        ctx.create_stream("ev_sw", "event_id long, event_type string, "
                                   "value double")
        ctx.create_view(
            "cv_sw_q",
            "SELECT event_type, count(*) AS cnt, "
            "sum(CAST(value AS DECIMAL(38,6))) AS sv_dec FROM ev_sw "
            "WHERE arrival_timestamp > clock_timestamp() "
            "- interval '1 hour' GROUP BY event_type")
        ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
            "event_id", "event_type", "value")
        for i in range(2):
            ctx.insert("ev_sw", ev.filter(
                F.pmod(F.col("event_id"), F.lit(2)) == i))
        got = sorted(
            (r["event_type"], r["cnt"], round(float(r["sv_dec"]), 6))
            for r in ctx.read_view("cv_sw_q").collect())
    finally:
        ctx.close()

    want = sorted(
        (t, n, round(float(s), 6))
        for t, n, s in duckdb.sql(f"""
            SELECT event_type, COUNT(*) AS cnt,
                   SUM(CAST(value AS DECIMAL(38,6))) AS sv
            FROM read_parquet('{sf_dir}/events.parquet')
            GROUP BY event_type
            """).fetchall())
    assert got == want and len(got) > 0
