"""Round-13 ADVICE regressions (all jpegarith.py, all low):

1. `_find_restart` must halt on ANY non-RST marker met while searching
   — a corrupt/concatenated stream must not resync on a coincidental
   later RSTn across a scan/image boundary and decode garbage.
2. `set_from_dac` must reject DAC table classes 2..15 (T.81 B.2.4.3
   defines only Tc=0 DC and Tc=1 AC).
3. `_decode_ac_refine` applies the correction bit unconditionally,
   matching the reference arithmetic decoder flow (libjpeg jdarith.c
   decode_mcu_AC_refine) even on nonconforming history values.
"""

from __future__ import annotations

import numpy as np
import pytest

from pipelinedb_spark.operators.jpeg import ZIGZAG
from pipelinedb_spark.operators.jpegarith import (AC_STAT_BINS,
                                                  ArithConditioning,
                                                  ArithDecoder,
                                                  _decode_ac_refine,
                                                  _find_restart,
                                                  _ScanStats)
from test_r12_jpeg_arith import _QMEncoder


def test_find_restart_skips_stuffing_and_fill_bytes():
    """0xFF00 (stuffed data byte) and 0xFFFF (fill) are legal inside
    the entropy segment and must not halt the search."""
    data = b"\x12\xff\x00\x34\xff\xff\xff\xd0"
    assert _find_restart(data, 0, 0) == len(data)


def test_find_restart_halts_on_scan_boundary_markers():
    """EOI/SOS before the wanted RSTn: the search must raise instead
    of scanning past the boundary to a coincidental later RSTn."""
    with pytest.raises(ValueError, match="0xFFD9"):
        _find_restart(b"\x01\x02\xff\xd9\x00\xff\xd0", 0, 0)
    with pytest.raises(ValueError, match="0xFFDA"):
        _find_restart(b"\x01\xff\xda\x00\xff\xd1", 0, 1)
    with pytest.raises(ValueError, match="0xFFC4"):
        _find_restart(b"\xff\xc4\x00\x1f", 0, 3)


def test_find_restart_out_of_order_still_diagnosed():
    with pytest.raises(ValueError, match="out of order"):
        _find_restart(b"\x00\xff\xd3", 0, 0)


def test_find_restart_truncation_still_diagnosed():
    with pytest.raises(ValueError, match="missing restart"):
        _find_restart(b"\x00\x01\x02", 0, 0)


def test_dac_rejects_undefined_table_class():
    cond = ArithConditioning()
    with pytest.raises(ValueError, match="class"):
        cond.set_from_dac(bytes([0x20, 0x05]))
    with pytest.raises(ValueError, match="class"):
        cond.set_from_dac(bytes([0xF1, 0x05]))
    # classes 0 and 1 still parse
    cond.set_from_dac(bytes([0x00, 0x21, 0x11, 0x07]))
    assert cond.dc[0] == (1, 2)
    assert cond.ac[1] == 7


def test_ac_refine_correction_unconditional_like_libjpeg():
    """History value 3 with al=1 is nonconforming (a prior Al=2 scan
    only produces multiples of 4): the correction bit must still apply
    — blk goes 3 → 5 — exactly as libjpeg's refinement loop would,
    instead of silently diverging."""
    enc = _QMEncoder()
    st_enc = np.zeros(AC_STAT_BINS, dtype=np.uint8)
    enc.encode(st_enc, 3 * (1 - 1) + 2, 1)     # k=1 correction bit = 1
    dec = ArithDecoder(enc.flush(), 0)
    stats = _ScanStats()
    blk = np.zeros(64, dtype=np.int32)
    blk[ZIGZAG[1]] = 3
    _decode_ac_refine(dec, stats, {"ta": 0}, blk, ZIGZAG, 1, 1, 1)
    assert blk[ZIGZAG[1]] == 5
