"""Per-query time-regression tripwire (r13 verdict task 2).

The sf0.1 oracle sweep records spark_sec per bank query; round 13
found a quadratic-plan stall only because a human read those timings.
`scripts/check_oracle.py` now stamps prev_spark_sec / time_ratio
against the newest prior CORRECTNESS_SF01_r*.json at the same scale
factor and flags any unexplained >3x jump (above a 2 s absolute floor
so sub-second noise can't trip).  These tests pin the logic, and
`test_latest_sweep_artifact_has_no_unexplained_regressions` makes the
suite itself fail on a flagged artifact.
"""
from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts"))
import check_oracle  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _prev(tmp_path, queries, rnd=9, sf="sf0.1"):
    p = tmp_path / f"CORRECTNESS_SF01_r{rnd}.json"
    p.write_text(json.dumps(
        {"sf_dir": f"/root/testdata/{sf}", "queries": queries}))
    return str(p)


def test_tripwire_flags_3x_jump(tmp_path):
    _prev(tmp_path, {"qa": {"spark_sec": 2.0}})
    records = {"qa": {"spark_sec": 7.0}}
    base, regs = check_oracle.apply_time_tripwire(
        records, "/root/testdata/sf0.1", None, str(tmp_path))
    assert regs == ["qa"]
    assert records["qa"]["prev_spark_sec"] == 2.0
    assert records["qa"]["time_ratio"] == 3.5
    assert records["qa"]["time_regression"] is True


def test_tripwire_ignores_subfloor_and_new_queries(tmp_path):
    _prev(tmp_path, {"fast": {"spark_sec": 0.1}})
    # 5x jump but still under the 2 s floor → noise, not a plan bug;
    # brand-new query has no baseline → prev fields absent, no flag
    records = {"fast": {"spark_sec": 0.5},
               "brand_new": {"spark_sec": 30.0}}
    _, regs = check_oracle.apply_time_tripwire(
        records, "/root/testdata/sf0.1", None, str(tmp_path))
    assert regs == []
    assert records["fast"]["time_ratio"] == 5.0
    assert "prev_spark_sec" not in records["brand_new"]


def test_tripwire_requires_same_scale_factor(tmp_path):
    _prev(tmp_path, {"qa": {"spark_sec": 1.0}}, sf="sf0.01")
    records = {"qa": {"spark_sec": 50.0}}
    _, regs = check_oracle.apply_time_tripwire(
        records, "/root/testdata/sf0.1", None, str(tmp_path))
    assert regs == [] and "time_ratio" not in records["qa"]


def test_tripwire_waiver_records_reason(tmp_path, monkeypatch):
    _prev(tmp_path, {"qa": {"spark_sec": 2.0}})
    monkeypatch.setattr(check_oracle, "EXPLAINED_REGRESSIONS",
                        {"qa": "oracle now exact at 2x shingle width"})
    records = {"qa": {"spark_sec": 30.0}}
    _, regs = check_oracle.apply_time_tripwire(
        records, "/root/testdata/sf0.1", None, str(tmp_path))
    assert regs == []
    assert records["qa"]["time_regression_waived"].startswith("oracle")


def test_tripwire_baseline_excludes_artifact_being_written(tmp_path):
    _prev(tmp_path, {"qa": {"spark_sec": 2.0}}, rnd=9)
    cur = _prev(tmp_path, {"qa": {"spark_sec": 100.0}}, rnd=10)
    # re-running the r10 sweep must compare against r9, not itself
    records = {"qa": {"spark_sec": 2.1}}
    base, regs = check_oracle.apply_time_tripwire(
        records, "/root/testdata/sf0.1", cur, str(tmp_path))
    assert base.endswith("_r9.json")
    assert records["qa"]["prev_spark_sec"] == 2.0 and regs == []


def test_tripwire_baseline_filters_by_scale_factor(tmp_path):
    """r15: sf0.1 and sf1 sweep artifacts coexist; the baseline finder
    must pick the newest artifact AT THE REQUESTED SF, not the newest
    by round number alone (which would hit the same-sf guard and
    silently disable the tripwire)."""
    _prev(tmp_path, {"qa": {"spark_sec": 2.0}}, rnd=9, sf="sf0.1")
    p = tmp_path / "CORRECTNESS_SF1_r10.json"
    p.write_text(json.dumps({"sf_dir": "/tmp/sfgen/sf1",
                             "queries": {"qa": {"spark_sec": 40.0}}}))
    records = {"qa": {"spark_sec": 6.5}}
    base, regs = check_oracle.apply_time_tripwire(
        records, "/root/testdata/sf0.1", None, str(tmp_path))
    assert base.endswith("_SF01_r9.json")       # not the newer sf1 one
    assert regs == ["qa"]                       # 6.5/2.0 > 3x, flagged
    # and an sf1 run compares against the sf1 artifact
    records2 = {"qa": {"spark_sec": 42.0}}
    base2, regs2 = check_oracle.apply_time_tripwire(
        records2, "/anywhere/sf1", None, str(tmp_path))
    assert base2.endswith("_SF1_r10.json") and regs2 == []


def test_scale_subset_names_are_bank_queries():
    import __spark_entry__ as entrymod
    qs = entrymod.queries()
    for subset in (check_oracle.SCALE_SENSITIVE_SUBSET,
                   check_oracle.SCALE10_SUBSET):
        missing = [q for q in subset if q not in qs]
        assert not missing, f"subset names not in the bank: {missing}"


def test_latest_sweep_artifact_has_no_unexplained_regressions():
    """The enforcement seat: a committed sweep artifact carrying an
    unexplained >3x per-query jump fails the suite — checked for the
    latest artifact of EVERY scale factor present (sf0.1 and, from
    r15, sf1)."""
    import glob as _glob
    latest_by_sf = {}
    for p in _glob.glob(os.path.join(REPO, "CORRECTNESS_SF*_r*.json")):
        m = __import__("re").search(r"(CORRECTNESS_SF[^_]+)_r(\d+)\.json$",
                                    os.path.basename(p))
        if not m:
            continue
        key, rnd = m.group(1), int(m.group(2))
        if key not in latest_by_sf or rnd > latest_by_sf[key][0]:
            latest_by_sf[key] = (rnd, p)
    if not latest_by_sf:
        pytest.skip("no sweep artifact present")
    for key, (_, latest) in sorted(latest_by_sf.items()):
        with open(latest) as f:
            art = json.load(f)
        if "unexplained_time_regressions" not in art:
            continue  # pre-r14 artifact without tripwire fields
        assert art["unexplained_time_regressions"] == [], (
            f"{latest} flags {art['unexplained_time_regressions']} — "
            "fix the plan or waive it in check_oracle.EXPLAINED_"
            "REGRESSIONS with a reason")
        assert art["failures"] == [], f"{latest} carries failures"


def test_tripwire_retry_clears_ambient_noise(tmp_path):
    """A sample that would flag gets one re-measure; when the retry
    lands back at baseline (ambient noise, not a plan change), the
    best-of-2 stands, both samples stay in the record, and no flag is
    raised."""
    _prev(tmp_path, {"qa": {"spark_sec": 2.0}})
    records = {"qa": {"spark_sec": 7.0}}
    _, regs = check_oracle.apply_time_tripwire(
        records, "/root/testdata/sf0.1", None, str(tmp_path),
        retime=lambda name: 2.1)
    assert regs == []
    assert records["qa"]["spark_sec"] == 2.1
    assert records["qa"]["first_spark_sec"] == 7.0
    assert records["qa"]["retry_spark_sec"] == 2.1
    assert records["qa"]["time_ratio"] == 1.05


def test_tripwire_retry_confirms_real_regression(tmp_path):
    """A real plan regression reproduces on the retry — the flag must
    survive the re-measure (sensitivity unchanged)."""
    _prev(tmp_path, {"qa": {"spark_sec": 2.0}})
    records = {"qa": {"spark_sec": 7.0}}
    _, regs = check_oracle.apply_time_tripwire(
        records, "/root/testdata/sf0.1", None, str(tmp_path),
        retime=lambda name: 6.9)
    assert regs == ["qa"]
    assert records["qa"]["spark_sec"] == 6.9
    assert records["qa"]["time_regression"] is True


def test_tripwire_no_retime_keeps_single_sample_behavior(tmp_path):
    """Without a retime callback (unit callers, old artifacts) the
    original single-sample flagging is unchanged."""
    _prev(tmp_path, {"qa": {"spark_sec": 2.0}})
    records = {"qa": {"spark_sec": 7.0}}
    _, regs = check_oracle.apply_time_tripwire(
        records, "/root/testdata/sf0.1", None, str(tmp_path))
    assert regs == ["qa"]
    assert "retry_spark_sec" not in records["qa"]
