"""Skewed-key merge evidence seat (r14 verdict task 4).

scripts/scale_probe_skew.py ingests equal row counts with uniform vs
zipfian keys (hot key = 40% of rows) through a list-state CV
(array_agg/set_agg/count/sum) and a SW CV, and records the seat
``skewed_key_merge_r15`` in BENCH_SCALING.json.  These tests pin the
recorded bounds — wall time within 2x of the uniform run, flat JVM
RSS across batches, exact row/state accounting — so a future change
that silently breaks skewed ingest (e.g. an O(state^2) list merge, a
hot-bucket spill) fails the suite, and a tiny live replica keeps the
semantic claim (hot group's list state is complete and exact)
runnable without the 8M-row probe.
"""
from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WALL_RATIO_BAR = 2.0
RSS_GROWTH_BAR = 1.5


def _seat():
    path = os.path.join(REPO, "BENCH_SCALING.json")
    with open(path) as f:
        seats = json.load(f)
    # newest by PARSED round number — a lexicographic sort would rank
    # r99 above r100 and silently pin a stale seat forever
    import re
    best, best_r = None, -1
    for k, v in seats.items():
        m = re.match(r"skewed_key_merge_r(\d+)$", k)
        if m and int(m.group(1)) > best_r:
            best, best_r = v, int(m.group(1))
    return best


def test_skew_seat_bounds_pinned():
    seat = _seat()
    if seat is None:
        pytest.skip("no skewed_key_merge seat recorded yet")
    assert seat["wall_ratio_zipf_vs_uniform"] <= WALL_RATIO_BAR, (
        "zipfian ingest exceeded 2x the uniform-key wall time — "
        "the hot-group list-state merge has regressed "
        f"({seat['wall_ratio_zipf_vs_uniform']}x)")
    assert seat["zipf_rss_growth"] is not None \
        and seat["zipf_rss_growth"] <= RSS_GROWTH_BAR, (
        "JVM RSS grew across zipfian batches — hot-group state is "
        "accumulating somewhere it shouldn't")
    for variant in ("uniform", "zipf"):
        assert seat[variant]["rows_exact"] is True, (
            f"{variant}: row/state accounting was not exact")
    # per-batch latency must not be super-linear in batch index: the
    # per-batch list merge is O(state) — a last/first ratio beyond
    # ~3x at 4 batches would indicate O(state^2) rewriting
    pb = seat["zipf"]["per_batch_sec"]
    assert pb[-1] <= 3.0 * pb[0] + 0.5


def test_skew_hot_group_state_exact_small(ctx):
    """Live replica of the probe's semantic claim at suite scale:
    after skewed multi-batch ingest the hot group's array_agg state
    holds EVERY one of its rows, set_agg is NDV-bounded, and the SW
    CV counted every row."""
    ctx.create_stream("sk", "k string, v double, vm long")
    ctx.create_view(
        "cv_sk",
        "SELECT k, count(*) AS n, array_agg(v) AS va, "
        "set_agg(vm) AS sm FROM sk GROUP BY k")
    ctx.create_view(
        "cv_sk_sw",
        "SELECT k, count(*) AS n FROM sk "
        "WHERE arrival_timestamp > clock_timestamp() "
        "- interval '10 minutes' GROUP BY k")
    n, hot_frac = 1000, 0.4
    for b in range(3):
        rows = []
        for i in range(n):
            k = "hot" if i < n * hot_frac else f"k{i % 7}"
            rows.append({"k": k, "v": float(b * n + i),
                         "vm": i % 13})
        ctx.insert("sk", rows)
    out = {r["k"]: r for r in
           ctx.read_view("cv_sk")
           .select("k", "n", F.size("va").alias("va_n"),
                   F.size("sm").alias("sm_n")).collect()}
    assert out["hot"]["n"] == int(n * hot_frac) * 3
    assert out["hot"]["va_n"] == out["hot"]["n"]   # complete state
    assert out["hot"]["sm_n"] <= 13                # NDV-bounded
    total_sw = sum(r["n"] for r in
                   ctx.read_view("cv_sk_sw").collect())
    assert total_sw == 3 * n
