"""Streaming-ingest throughput artifact + regression tripwire (r14
verdict task 2).

scripts/throughput_bench.py runs a fixed 4-CV ingest workload (plain
agg, SW-stepped, sketch NDV, stream-table join) and records rows/s +
the per-batch commit-latency series into THROUGHPUT_r{N}.json, with a
cal-normalized 0.7x regression bar against the prior round's
artifact.  These tests pin the tripwire arithmetic on synthetic
artifacts and make the suite itself fail on a committed artifact that
carries an unexplained flag or a failed row-accounting sanity check.
"""
from __future__ import annotations

import glob
import json
import os
import re
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))
import throughput_bench  # noqa: E402


def _latest_artifact():
    best, best_r = None, -1
    for p in glob.glob(os.path.join(REPO, "THROUGHPUT_r*.json")):
        m = re.search(r"_r(\d+)\.json$", p)
        if m and int(m.group(1)) > best_r:
            best, best_r = p, int(m.group(1))
    return best


def test_latest_throughput_artifact_green():
    """Enforcement seat: an unexplained cal-normalized throughput drop
    below the bar, or inexact row accounting, fails the suite."""
    latest = _latest_artifact()
    if latest is None:
        pytest.skip("no throughput artifact present")
    with open(latest) as f:
        art = json.load(f)
    assert art.get("sanity_rows_exact") is True, (
        f"{latest}: ingest row accounting was not exact — the "
        "throughput number measures a broken commit path")
    assert art.get("regression_flagged") == [], (
        f"{latest} flags {art.get('regression_flagged')} "
        f"(cal-normalized ratio {art.get('cal_normalized_ratio')}, "
        f"bar {art.get('regression_bar')}) — fix the ingest path or "
        "waive in throughput_bench.EXPLAINED with a reason")
    # the artifact must carry the latency series the next round's
    # reader compares against
    pb = art.get("per_batch_sec", {})
    assert len(pb.get("series", [])) == art["batches"]


def test_prev_artifact_finder_excludes_self(tmp_path, monkeypatch):
    monkeypatch.setattr(throughput_bench, "REPO", str(tmp_path))
    for rnd, rps in [(9, 50_000.0), (10, 60_000.0)]:
        (tmp_path / f"THROUGHPUT_r{rnd}.json").write_text(
            json.dumps({"workload": "4cv_ingest_v1",
                        "rows_per_sec": rps}))
    assert throughput_bench._latest_prev(
        exclude="THROUGHPUT_r10.json").endswith("_r9.json")
    assert throughput_bench._latest_prev(
        exclude=None).endswith("_r10.json")


def test_workload_version_change_disables_comparison(tmp_path):
    """A prior artifact from a DIFFERENT workload version must not be
    used as a ratio baseline (its rows/s measures different work)."""
    prev = {"workload": "4cv_ingest_v0", "rows_per_sec": 1e9,
            "cal": {"before_sec": 1.0}}
    p = tmp_path / "THROUGHPUT_r9.json"
    p.write_text(json.dumps(prev))
    # replicate the guard inline: the script only computes ratios when
    # workload versions match
    with open(p) as f:
        loaded = json.load(f)
    assert loaded["workload"] != "4cv_ingest_v1"


def test_cal_normalization_arithmetic():
    """A 2x-slower host (cal 2x prior) halving raw throughput is NOT a
    regression after normalization; the same raw drop on an equal-
    speed host IS."""
    raw_ratio = 0.5
    same_host = raw_ratio * (1.0 / 1.0)
    slow_host = raw_ratio * (2.0 / 1.0)
    assert same_host < throughput_bench.REGRESSION_BAR
    assert slow_host >= throughput_bench.REGRESSION_BAR
