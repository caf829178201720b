"""Streaming-ingest throughput artifact + regression tripwire (r14
verdict task 2).

scripts/throughput_bench.py runs a fixed 4-CV ingest workload (plain
agg, SW-stepped, sketch NDV, stream-table join) in two legs — the
reference's 10k-row batch envelope and a 100k-row bulk leg that
amortizes the per-commit scheduling floor so the worker/combiner data
path dominates — and records per-leg rows/s + the per-batch commit-
latency series into THROUGHPUT_r{N}.json, with a cal-normalized 0.7x
regression bar per leg against the prior round's artifact.  These
tests pin the tripwire arithmetic on synthetic artifacts and make the
suite itself fail on a committed artifact that carries an unexplained
flag or a failed row-accounting sanity check.
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
    assert art.get("regression_flagged") == [], (
        f"{latest} flags {art.get('regression_flagged')} — fix the "
        "ingest path or waive in throughput_bench.EXPLAINED with a "
        "reason")
    assert set(art["legs"]) == {n for n, _, _ in throughput_bench.LEGS}
    for name, leg in art["legs"].items():
        assert leg.get("sanity_rows_exact") is True, (
            f"{latest} leg {name}: ingest row accounting was not "
            "exact — the throughput number measures a broken commit "
            "path")
        # the artifact must carry the latency series the next
        # round's reader compares against
        assert len(leg["per_batch_sec"]["series"]) == leg["batches"]


def test_prev_artifact_finder_excludes_self(tmp_path, monkeypatch):
    monkeypatch.setattr(throughput_bench, "REPO", str(tmp_path))
    for rnd in (9, 10):
        (tmp_path / f"THROUGHPUT_r{rnd}.json").write_text(
            json.dumps({"workload": throughput_bench.WORKLOAD_VERSION}))
    assert throughput_bench._latest_prev(
        exclude="THROUGHPUT_r10.json").endswith("_r9.json")
    assert throughput_bench._latest_prev(
        exclude=None).endswith("_r10.json")


def _art(legs, cal_before=1.0, cal_after=None):
    cal = {"before_sec": cal_before}
    if cal_after is not None:
        cal["after_sec"] = cal_after
    return {"workload": throughput_bench.WORKLOAD_VERSION,
            "legs": legs, "cal": cal}


def test_tripwire_flags_unexplained_drop(tmp_path):
    prev = _art({"ref_10k": {"rows_per_sec": 10_000.0},
                 "bulk_100k": {"rows_per_sec": 60_000.0}})
    p = tmp_path / "THROUGHPUT_r9.json"
    p.write_text(json.dumps(prev))
    art = _art({"ref_10k": {"rows_per_sec": 9_500.0},
                "bulk_100k": {"rows_per_sec": 20_000.0}})
    throughput_bench.apply_tripwire(art, str(p))
    assert art["regression_flagged"] == ["bulk_100k"]
    assert art["legs"]["bulk_100k"]["cal_normalized_ratio"] == 0.333
    assert art["legs"]["ref_10k"]["raw_ratio"] == 0.95


def test_tripwire_cal_normalizes_slow_host(tmp_path):
    """A 2x-slower host (cal 2x prior) halving raw throughput is NOT a
    regression after normalization; the same raw drop on an equal-
    speed host IS (covered above)."""
    prev = _art({"ref_10k": {"rows_per_sec": 10_000.0},
                 "bulk_100k": {"rows_per_sec": 60_000.0}},
                cal_before=1.0)
    p = tmp_path / "THROUGHPUT_r9.json"
    p.write_text(json.dumps(prev))
    art = _art({"ref_10k": {"rows_per_sec": 5_000.0},
                "bulk_100k": {"rows_per_sec": 30_000.0}},
                cal_before=2.0)
    throughput_bench.apply_tripwire(art, str(p))
    assert art["regression_flagged"] == []
    assert art["cal_host_ratio"] == [2.0]
    assert art["legs"]["ref_10k"]["cal_normalized_ratio"] == 1.0


def test_tripwire_mid_run_degradation_uses_after_bracket(tmp_path):
    """Degradation that begins AFTER the before-cal but during the
    legs (the r14 mid-run scenario) shows only in the after-pass; the
    tripwire must clear the drop under that bracket rather than
    false-flag host noise — and still flag a drop that persists under
    BOTH brackets."""
    prev = _art({"ref_10k": {"rows_per_sec": 10_000.0}},
                cal_before=1.0, cal_after=1.0)
    p = tmp_path / "THROUGHPUT_r9.json"
    p.write_text(json.dumps(prev))
    art = _art({"ref_10k": {"rows_per_sec": 5_000.0}},
               cal_before=1.0, cal_after=2.0)   # slowed mid-run
    throughput_bench.apply_tripwire(art, str(p))
    assert art["regression_flagged"] == []
    assert art["legs"]["ref_10k"]["cal_normalized_ratio"] == 1.0
    # quiet both brackets + the same raw drop = a real regression
    art2 = _art({"ref_10k": {"rows_per_sec": 5_000.0}},
                cal_before=1.0, cal_after=1.0)
    throughput_bench.apply_tripwire(art2, str(p))
    assert art2["regression_flagged"] == ["ref_10k"]


def test_tripwire_waiver_and_version_change(tmp_path):
    prev = _art({"ref_10k": {"rows_per_sec": 10_000.0}})
    p = tmp_path / "THROUGHPUT_r9.json"
    p.write_text(json.dumps(prev))
    art = _art({"ref_10k": {"rows_per_sec": 1_000.0}})
    try:
        throughput_bench.EXPLAINED["ref_10k"] = "intentional: x"
        throughput_bench.apply_tripwire(art, str(p))
    finally:
        throughput_bench.EXPLAINED.pop("ref_10k", None)
    assert art["regression_flagged"] == []
    assert art["legs"]["ref_10k"]["regression_waived"].startswith(
        "intentional")
    # a prior artifact from a DIFFERENT workload version must not be
    # used as a ratio baseline (its rows/s measures different work)
    prev2 = dict(prev, workload="4cv_ingest_v0")
    p2 = tmp_path / "THROUGHPUT_r10.json"
    p2.write_text(json.dumps(prev2))
    art2 = _art({"ref_10k": {"rows_per_sec": 1_000.0}})
    throughput_bench.apply_tripwire(art2, str(p2))
    assert art2["regression_flagged"] == []
    assert "raw_ratio" not in art2["legs"]["ref_10k"]
