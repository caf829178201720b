"""Bench sentinel gate classification (round-11): the gate must
distinguish a STEADILY SLOWER HOST (stable calibration ratios, quiet
loadavg, zero hypervisor steal — trust the run, stamp host_ratio)
from real contention (ratio drift, steal, or load — stamp degraded).
Probes and sleeps are stubbed; this tests the decision logic only.
"""

from __future__ import annotations

import importlib.util
import os

import pytest

_BENCH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "bench.py")


@pytest.fixture()
def bench(monkeypatch):
    spec = importlib.util.spec_from_file_location("bench_mod", _BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(mod.time, "sleep", lambda _s: None)
    return mod


def _gate(bench, monkeypatch, seq, retry=False):
    # classification tests exercise a SINGLE gate pass; the deferred
    # retry window (r14 verdict task 6) is opted into by the two
    # retry tests below
    monkeypatch.setenv("SPARK_GRAFT_BENCH_GATE_RETRY_SLEEP",
                       "1" if retry else "0")
    it = iter(seq)
    monkeypatch.setattr(bench, "_contention_sentinel",
                        lambda: dict(next(it)))
    return bench._gated_sentinel()


_SLOW = {"spin_ratio": 0.78, "bw_ratio": 0.82, "loadavg_1m": 0.3,
         "steal_pct": 0.0, "contended": True}


def test_steady_slow_host_trusted_early_exit(bench, monkeypatch):
    out = _gate(bench, monkeypatch, [dict(_SLOW) for _ in range(6)])
    assert out["steady_slow_host"] and not out["degraded"]
    assert out["host_ratio"] == pytest.approx(0.78)
    assert out["gate_attempts"] == 3  # stops at 3 stable probes


def test_ratio_drift_is_contention(bench, monkeypatch):
    seq = [dict(_SLOW, spin_ratio=r)
           for r in (0.78, 0.9, 0.7, 0.85, 0.6, 0.75)]
    out = _gate(bench, monkeypatch, seq)
    assert out["degraded"] and "steady_slow_host" not in out


def test_hypervisor_steal_is_contention(bench, monkeypatch):
    seq = [dict(_SLOW, steal_pct=8.0) for _ in range(6)]
    out = _gate(bench, monkeypatch, seq)
    assert out["degraded"]


def test_high_loadavg_is_contention(bench, monkeypatch):
    seq = [dict(_SLOW, loadavg_1m=9.0) for _ in range(6)]
    out = _gate(bench, monkeypatch, seq)
    assert out["degraded"]


def test_quiet_at_baseline_passes_first_probe(bench, monkeypatch):
    seq = [{"spin_ratio": 1.0, "bw_ratio": 1.0, "loadavg_1m": 0.2,
            "steal_pct": 0.0, "contended": False}]
    out = _gate(bench, monkeypatch, seq)
    assert not out["degraded"] and out["gate_attempts"] == 1


def test_heals_to_quiet_mid_gate(bench, monkeypatch):
    """A transient spike that clears: the gate keeps probing and the
    run is trusted on the first QUIET probe, not misclassified by
    the earlier noisy ones."""
    noisy = dict(_SLOW, spin_ratio=0.5, loadavg_1m=7.0)
    quiet = {"spin_ratio": 0.97, "bw_ratio": 0.95, "loadavg_1m": 0.4,
             "steal_pct": 0.0, "contended": False}
    out = _gate(bench, monkeypatch, [noisy, noisy, quiet])
    assert not out["degraded"] and "steady_slow_host" not in out
    assert out["gate_attempts"] == 3


def test_stable_bw_collapse_is_contention(bench, monkeypatch):
    """A co-tenant steadily saturating the memory controller: spin
    clean, zero steal, zero guest loadavg, bw collapsed but STABLE —
    must still classify as contention (the bw sentinel exists
    precisely because spin can't see this)."""
    seq = [dict(_SLOW, spin_ratio=1.0, bw_ratio=0.55)
           for _ in range(6)]
    out = _gate(bench, monkeypatch, seq)
    assert out["degraded"] and "steady_slow_host" not in out


def test_advancing_throttle_counters_block_steady(bench, monkeypatch):
    """ADVICE round 11: steady cgroup CPU-quota throttling presents
    exactly the steady-slow-host signature (stable ratios, zero
    steal, quiet loadavg).  Advancing nr_throttled across the stable
    window is ACTIVE throttling, not a slower host generation —
    classify as degraded."""
    seq = [dict(_SLOW, throttle={"nr_throttled": 100 + 10 * i,
                                 "throttled_usec": 5_000 * i})
           for i in range(6)]
    out = _gate(bench, monkeypatch, seq)
    assert out["degraded"] and "steady_slow_host" not in out


def test_static_throttle_counters_allow_steady(bench, monkeypatch):
    """Non-zero but NON-advancing counters are history, not present
    throttling — a genuinely slower host with an old throttling
    episode in its counters is still trusted."""
    seq = [dict(_SLOW, throttle={"nr_throttled": 100,
                                 "throttled_usec": 5_000})
           for _ in range(6)]
    out = _gate(bench, monkeypatch, seq)
    assert out["steady_slow_host"] and not out["degraded"]


def test_host_factor_stamped_conservative(bench, monkeypatch):
    """host_factor is the larger (least-flattering) of the two
    certified ratios on a steady-slow host, and rides every
    artifact with its basis."""
    out = _gate(bench, monkeypatch, [dict(_SLOW) for _ in range(6)])
    assert out["host_factor"] == pytest.approx(0.82)  # bw > spin
    assert out["host_factor_basis"] == "steady_slow_host_3probe_avg"
    quiet = {"spin_ratio": 1.02, "bw_ratio": 0.97, "loadavg_1m": 0.2,
             "steal_pct": 0.0, "contended": False}
    out2 = _gate(bench, monkeypatch, [quiet])
    assert out2["host_factor"] == pytest.approx(1.02)
    assert out2["host_factor_basis"] == "quiet_final_probe"


def test_loadavg_spike_inside_window_blocks_steady(bench, monkeypatch):
    """Every 3-probe window contains a load spike: no window is
    steady even though each individual non-spike probe looks calm."""
    seq = [dict(_SLOW, loadavg_1m=(9.0 if i % 2 else 0.3))
           for i in range(6)]
    out = _gate(bench, monkeypatch, seq)
    assert out["degraded"] and "steady_slow_host" not in out


# ---------------------------------------------------------- _cal_block
# workload-level calibration (round-12 verdict task 1): pure artifact
# assembly — no Spark, no probes.


def test_cal_block_stable_pair(bench, tmp_path):
    p = str(tmp_path / "spin.json")
    cal = bench._cal_block(10.0, 10.5, "0.1", {"degraded": False},
                           base_path=p)
    assert cal["cal_sec"] == 10.0
    assert cal["drift_pct"] == 5.0 and cal["stable"]
    # first stable, non-degraded run captures the per-sf reference
    assert cal["ref_captured_this_run"] and cal["ref_sec"] == 10.0
    assert cal["factor"] == 1.0
    import json as _json
    with open(p) as f:
        assert _json.load(f)["cal_sec_v1_sf0.1"] == 10.0


def test_cal_block_drift_flagged_and_not_persisted(bench, tmp_path):
    p = str(tmp_path / "spin.json")
    cal = bench._cal_block(10.0, 12.0, "0.1", {"degraded": False},
                           base_path=p)
    assert cal["drift_pct"] == 20.0 and not cal["stable"]
    assert "note" in cal
    assert "ref_captured_this_run" not in cal
    assert not (tmp_path / "spin.json").exists()


def test_cal_block_degraded_box_never_becomes_reference(bench, tmp_path):
    p = str(tmp_path / "spin.json")
    cal = bench._cal_block(10.0, 10.1, "0.1", {"degraded": True},
                           base_path=p)
    assert cal["stable"] and "ref_captured_this_run" not in cal
    assert "factor" not in cal


def test_cal_block_factor_against_existing_reference(bench, tmp_path):
    import json as _json
    p = str(tmp_path / "spin.json")
    with open(p, "w") as f:
        _json.dump({"cal_sec_v1_sf0.1": 8.0}, f)
    # slower box: cal 16s vs ref 8s -> factor 0.5 shrinks times to
    # reference-box equivalents
    cal = bench._cal_block(16.0, 16.4, "0.1", {"degraded": False},
                           base_path=p)
    assert cal["factor"] == 0.5 and cal["ref_sec"] == 8.0
    assert "ref_captured_this_run" not in cal
    # reference file untouched
    with open(p) as f:
        assert _json.load(f) == {"cal_sec_v1_sf0.1": 8.0}


def test_cal_block_missing_after_is_unstable(bench, tmp_path):
    cal = bench._cal_block(10.0, None, "0.1", {"degraded": False},
                           base_path=str(tmp_path / "s.json"))
    assert not cal["stable"] and cal["cal_sec"] == 10.0


def test_cal_block_failed_calibration(bench, tmp_path):
    cal = bench._cal_block(None, None, "0.1", {},
                           base_path=str(tmp_path / "s.json"))
    assert "error" in cal


def test_degraded_gate_retries_and_heals(bench, monkeypatch):
    """r14 verdict task 6: a gate pass that would stamp degraded gets
    ONE deferred retry window; a box that quieted down in the window
    produces a trusted artifact with the first pass's readings
    preserved for the reader."""
    noisy = dict(_SLOW, spin_ratio=0.5, loadavg_1m=7.0)
    quiet = {"spin_ratio": 0.98, "bw_ratio": 0.96, "loadavg_1m": 0.3,
             "steal_pct": 0.0, "contended": False}
    drift = [dict(_SLOW, spin_ratio=r, loadavg_1m=7.0)
             for r in (0.5, 0.9, 0.6, 0.8, 0.55, 0.7)]
    out = _gate(bench, monkeypatch, drift + [quiet], retry=True)
    assert out["gate_retried"] is True
    assert not out["degraded"] and "degraded_after_retry" not in out
    assert out["first_gate"]["spin_ratio"] == 0.7
    assert out["first_gate"]["gate_attempts"] == 6
    assert out["gate_attempts"] == 1   # retry pass passed first probe
    _ = noisy


def test_degraded_gate_retry_fails_stamps_honestly(bench, monkeypatch):
    """A retry that still reads degraded keeps the honest stamp plus
    the degraded_after_retry marker the r15 protocol requires."""
    drift = [dict(_SLOW, spin_ratio=r, loadavg_1m=7.0)
             for r in (0.5, 0.9, 0.6, 0.8, 0.55, 0.7)]
    out = _gate(bench, monkeypatch, drift + drift, retry=True)
    assert out["gate_retried"] is True
    assert out["degraded"] and out["degraded_after_retry"] is True
    assert out["gate_attempts"] == 6


def test_quiet_gate_never_retries(bench, monkeypatch):
    """The retry window only arms on a would-be-degraded stamp — a
    quiet or steady-slow box must not pay the 5-minute wait."""
    quiet = {"spin_ratio": 1.0, "bw_ratio": 1.0, "loadavg_1m": 0.2,
             "steal_pct": 0.0, "contended": False}
    out = _gate(bench, monkeypatch, [quiet], retry=True)
    assert "gate_retried" not in out and not out["degraded"]
    out2 = _gate(bench, monkeypatch,
                 [dict(_SLOW) for _ in range(6)], retry=True)
    assert "gate_retried" not in out2 and out2["steady_slow_host"]
