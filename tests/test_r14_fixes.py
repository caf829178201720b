"""Round-14 fixes (the three r13 ADVICE items).

1. (medium) Hierarchical frames are dequantized lazily at the NEXT
   SOF/EOI; the quant table is now SNAPSHOTTED at the component's
   first scan, so a DQT between frames that redefines a table id —
   legal per T.81 and normal in multi-frame pyramids — applies only
   to the frame that follows it, never retroactively.  Same pattern
   hardens the single-frame ``_finalize`` (DQT between the last scan
   and EOI).
2. (low) An EXP segment never consumed by a differential frame is now
   a syntax error (previously a stray trailing EXP on a full-size
   reference was silently accepted); consecutive EXPs likewise.
3. (low) ``bench._cal_block``: if persisting the calibration anchor
   to BENCH_SPIN.json fails, the block no longer stamps
   ref_sec/factor against the never-saved in-memory anchor — it
   records ``ref_persist_failed`` instead.
"""
from __future__ import annotations

import json
import os

import numpy as np
import pytest

from pipelinedb_spark.operators.jpeg import ZIGZAG, decode_jpeg_py
from test_r13_jpeg_hier import (_exp_expand, _fdct_quant, _img_gray,
                                _make_hier_jpeg, _recon_planes, _seg,
                                _seq_scan)


def _dqt_seg(quant: np.ndarray, tid: int = 0) -> bytes:
    return _seg(0xDB, bytes([tid]) + bytes(
        int(np.asarray(quant).reshape(64)[z]) for z in ZIGZAG))


def _sof_seg(marker: int, h: int, w: int, nc: int = 1) -> bytes:
    body = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") \
        + bytes([nc])
    for ci in range(nc):
        body += bytes([ci + 1, 0x11, 0])
    return _seg(marker, body)


# ------------------------------------------------ 1. DQT snapshots

def test_hier_dqt_between_frames_conforming_stream():
    """A conforming pyramid that redefines quant table 0 between
    frames: frame 1 encoded with Q1, then DQT(0)=Q2, then the
    differential frame encoded with Q2.  The lazily-folded frame 1
    must dequantize with Q1 (its snapshot), frame 2 with Q2 — the
    pre-fix decoder dequantized frame 1 with Q2 and silently
    corrupted the whole reconstruction."""
    img = _img_gray(20, 20, seed=13).astype(np.float64)
    q1 = np.full((8, 8), 3, dtype=np.int64)
    q2 = np.full((8, 8), 5, dtype=np.int64)
    q2[0, 0] = 2

    def down(pl):
        return pl.reshape(10, 2, 10, 2).mean((1, 3))

    small = down(img)
    out = bytearray(b"\xff\xd8")
    out += _dqt_seg(q1)
    out += _seg(0xDE, bytes([8]) + (20).to_bytes(2, "big")
                + (20).to_bytes(2, "big") + bytes([1, 1, 0x11, 0]))
    # frame 1: non-differential SOF0 at 10x10 with Q1
    out += _sof_seg(0xC0, 10, 10)
    qs1 = [_fdct_quant(small - 128.0, q1)]
    out += _seq_scan(qs1, differential=False)
    ref = np.clip(_recon_planes(qs1[0], q1, 10, 10) + 128, 0, 255)
    # redefine table id 0 BETWEEN frames — applies to frame 2 only
    out += _dqt_seg(q2)
    out += _seg(0xDF, bytes([0x11]))
    ref = _exp_expand(ref, 1, 1)
    out += _sof_seg(0xC5, 20, 20)
    qs2 = [_fdct_quant(img - ref, q2)]
    out += _seq_scan(qs2, differential=True)
    ref = np.clip(ref + _recon_planes(qs2[0], q2, 20, 20), 0, 255)
    out += b"\xff\xd9"

    got = decode_jpeg_py(bytes(out))
    assert np.array_equal(got, ref.astype(np.uint8)[..., None])


def test_hier_dqt_before_eoi_does_not_corrupt_final_frame():
    """A garbage DQT after the final frame's scan data (before EOI)
    must not change the output: the final frame folds at EOI and
    previously read the live (garbage) table."""
    img = _img_gray(16, 16, seed=4)
    p, want = _make_hier_jpeg(img, levels=2)
    assert p.endswith(b"\xff\xd9")
    garbage = np.full((8, 8), 99, dtype=np.int64)
    spliced = p[:-2] + _dqt_seg(garbage) + b"\xff\xd9"
    got = decode_jpeg_py(spliced)
    assert np.array_equal(got, want)


def test_single_frame_dqt_after_scan_does_not_corrupt():
    """Single-frame path (``_finalize`` at EOI): DQT between the scan
    and EOI must not retroactively re-quantize the decoded frame."""
    img = _img_gray(16, 16, seed=8).astype(np.float64)
    q1 = np.full((8, 8), 2, dtype=np.int64)
    out = bytearray(b"\xff\xd8")
    out += _dqt_seg(q1)
    out += _sof_seg(0xC0, 16, 16)
    qs = [_fdct_quant(img - 128.0, q1)]
    out += _seq_scan(qs, differential=False)
    clean = bytes(out) + b"\xff\xd9"
    want = decode_jpeg_py(clean)
    garbage = np.full((8, 8), 77, dtype=np.int64)
    spliced = bytes(out) + _dqt_seg(garbage) + b"\xff\xd9"
    assert np.array_equal(decode_jpeg_py(spliced), want)


def test_scan_without_declared_quant_table_still_rejected():
    """The undeclared-table error moved from finalize time to the
    component's first scan — it must still be a ValueError (→ null
    row upstream), not a KeyError."""
    img = _img_gray(16, 16, seed=8).astype(np.float64)
    q1 = np.full((8, 8), 2, dtype=np.int64)
    out = bytearray(b"\xff\xd8")
    out += _dqt_seg(q1, tid=1)          # declared under id 1 ...
    out += _sof_seg(0xC0, 16, 16)       # ... but the frame wants id 0
    out += _seq_scan([_fdct_quant(img - 128.0, q1)],
                     differential=False)
    out += b"\xff\xd9"
    with pytest.raises(ValueError, match="undeclared quant table"):
        decode_jpeg_py(bytes(out))


# ------------------------------------------------ 2. stray EXP

def test_trailing_exp_rejected():
    img = _img_gray(16, 16, seed=4)
    p, _ = _make_hier_jpeg(img, levels=2)
    spliced = p[:-2] + _seg(0xDF, bytes([0x11])) + b"\xff\xd9"
    with pytest.raises(ValueError, match="never consumed"):
        decode_jpeg_py(spliced)


def test_consecutive_exp_rejected():
    img = _img_gray(16, 16, seed=4)
    p, _ = _make_hier_jpeg(img, levels=2)
    exp = p.find(b"\xff\xdf")
    exp_end = exp + 2 + int.from_bytes(p[exp + 2:exp + 4], "big")
    spliced = p[:exp_end] + p[exp:exp_end] + p[exp_end:]
    with pytest.raises(ValueError, match="consecutive EXP"):
        decode_jpeg_py(spliced)


# ------------------------------------------------ 3. cal persist

def test_cal_block_flags_failed_anchor_persist(tmp_path):
    import bench
    sentinel = {"degraded": False}
    # base_path inside a directory that does not exist → the write
    # open() raises FileNotFoundError (an OSError); root ignores
    # permission bits so a chmod-based fixture would not fire here
    cal = bench._cal_block(1.0, 1.05, "sf0.1", sentinel,
                           base_path=str(tmp_path / "nodir"
                                         / "BENCH_SPIN.json"))
    assert cal.get("ref_persist_failed") is True
    assert "ref_sec" not in cal and "factor" not in cal
    assert "ref_captured_this_run" not in cal


def test_cal_local_normalization_corrects_mid_sweep_drift():
    """Interior cal legs (r13 verdict task 3): a run measured during
    a slow patch is corrected by THAT patch's cal reading.  Box runs
    at reference speed for reps 0-1 (legs read 2.0), then everything
    slows 2x for rep 2 (leg reads 4.0): the rep-2 run of 10 s
    cal-local-normalizes to 5 s, matching the clean reps."""
    import bench
    cal = {"ref_sec": 2.0}
    runs_by = {"qa": [(0, 5.0), (1, 5.0), (2, 10.0)]}
    legs = [2.0, 2.0, 4.0, 4.0]     # leg i brackets rep i
    out = bench._cal_local_normalized(runs_by, legs, cal, {})
    assert out == {"qa": 5.0}
    assert cal["series"] == [2.0, 2.0, 4.0, 4.0]
    assert cal["series_drift_pct"] == 100.0


def test_cal_local_normalization_skips_without_reference():
    import bench
    cal = {}                         # no frozen ref captured
    out = bench._cal_local_normalized(
        {"qa": [(0, 5.0)]}, [2.0, 2.0], cal, {})
    assert out == {}
    assert cal["series"] == [2.0, 2.0]   # series still attached


def test_cal_local_normalization_tolerates_failed_leg():
    import bench
    cal = {"ref_sec": 2.0}
    # interior leg failed (None): rep 1 falls back to the other
    # bracketing leg instead of being dropped
    out = bench._cal_local_normalized(
        {"qa": [(0, 6.0), (1, 6.0)]}, [2.0, None, 3.0], cal, {})
    assert out == {"qa": 4.0}        # rep1: 6*2/3; rep0: 6*2/2=6


def test_cal_block_normal_capture_roundtrip(tmp_path):
    import bench
    path = tmp_path / "BENCH_SPIN.json"
    cal = bench._cal_block(1.0, 1.05, "sfX", {"degraded": False},
                           base_path=str(path))
    assert cal["ref_captured_this_run"] is True
    assert cal["factor"] == 1.0 and cal["ref_sec"] == 1.0
    saved = json.loads(path.read_text())
    assert saved["cal_sec_v1_sfsfX"] == 1.0
