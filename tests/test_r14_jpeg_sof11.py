"""Lossless-arithmetic JPEG (SOF11, T.81 Annex H + the Annex F/G
entropy layer) — round-13 verdict task 5, the last non-differential
T.81 mode.

The suite carries a mirror SOF11 ENCODER sharing the decoder's QM
coder (test_r12_jpeg_arith._QMEncoder) and its two-dimensional
conditioning layout (25 Da×Db contexts, Db-selected magnitude
chains), so decode(encode(img)) roundtrips pin the statistical model
end-to-end; a Huffman-vs-arithmetic cross-check decodes the SAME
pixels through SOF3 (test_r8_fixes._make_lossless_jpeg) and SOF11 and
compares sample-exact.  Third-party interop stays tool-gated like
SOF9/SOF10 (no arithmetic-capable codec ships in this container).
"""
from __future__ import annotations

import numpy as np
import pytest

from pipelinedb_spark.operators.jpeg import decode_jpeg_py
from pipelinedb_spark.operators.jpegarith import (LL_CHAIN_A, LL_CHAIN_B,
                                                  LL_CHAIN_LEN,
                                                  LL_STAT_BINS,
                                                  _ll_classify)
from pipelinedb_spark.operators.multimodal import parse_media_header
from test_r12_jpeg_arith import _QMEncoder
from test_r8_fixes import _make_lossless_jpeg

# ------------------------------------------------ mirror encoder


def _encode_ll_diff(enc, st, ca, cb, lo, hi, diff) -> int:
    """One residual through the Annex-F DC tree over the lossless
    2-D context; returns the diff's 5-way class for the history."""
    base = 4 * (5 * cb + ca)
    if diff == 0:
        enc.encode(st, base, 0)
        return 0
    enc.encode(st, base, 1)
    sign = 1 if diff < 0 else 0
    enc.encode(st, base + 1, sign)
    v = (-diff if sign else diff) - 1
    idx = base + 2 + sign
    m = 0
    if v:
        enc.encode(st, idx, 1)
        m = 1
        v2 = v
        idx = LL_CHAIN_B if cb >= 3 else LL_CHAIN_A
        while v2 >> 1:
            v2 >>= 1
            enc.encode(st, idx, 1)
            m <<= 1
            idx += 1
    enc.encode(st, idx, 0)
    idx += LL_CHAIN_LEN
    mm = m >> 1
    while mm:
        enc.encode(st, idx, 1 if (v & mm) else 0)
        mm >>= 1
    return _ll_classify(m, sign, lo, hi)


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") \
        + body


def _make_sof11(img, pred_sel=1, pt=0, precision=8, restart=0,
                dac=None):
    """SOF11 writer twin of the decoder.  ``dac`` = (L, U) DC
    conditioning bounds for table 0 (None → F.1.4.4.1.2 defaults)."""
    arr = np.asarray(img, dtype=np.int64)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nc = arr.shape
    sp = arr >> pt
    default = 1 << (precision - pt - 1)
    lo, hi = dac if dac else (0, 1)

    out = bytearray(b"\xff\xd8")
    sof = bytes([precision]) + h.to_bytes(2, "big") \
        + w.to_bytes(2, "big") + bytes([nc])
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, 0])
    out += _seg(0xCB, sof)
    if dac:
        out += _seg(0xCC, bytes([0x00, (hi << 4) | lo]))
    if restart:
        out += _seg(0xDD, restart.to_bytes(2, "big"))
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00])        # Tb = 0 conditioning
    sos += bytes([pred_sel, 0, pt])
    out += _seg(0xDA, sos)

    enc = _QMEncoder()
    st = np.zeros(LL_STAT_BINS, dtype=np.uint8)
    hist = [np.zeros((h, w), dtype=np.uint8) for _ in range(nc)]
    reset, mcu, rst = True, 0, 0
    for y in range(h):
        for x in range(w):
            if restart and mcu and mcu % restart == 0:
                out += enc.flush()
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                enc = _QMEncoder()
                st.fill(0)
                reset = True
            for ci in range(nc):
                s = sp[:, :, ci]
                cl = hist[ci]
                if reset:
                    px = default
                elif y == 0:
                    px = int(s[0, x - 1])
                elif x == 0:
                    px = int(s[y - 1, 0])
                else:
                    a, b, c = (int(s[y, x - 1]), int(s[y - 1, x]),
                               int(s[y - 1, x - 1]))
                    px = [None, a, b, c, a + b - c,
                          a + ((b - c) >> 1), b + ((a - c) >> 1),
                          (a + b) >> 1][pred_sel]
                d = (int(s[y, x]) - px) & 0xFFFF
                if d > 32768:
                    d -= 65536
                ca = int(cl[y, x - 1]) if x else 0
                cb = int(cl[y - 1, x]) if y else 0
                cl[y, x] = _encode_ll_diff(enc, st, ca, cb, lo, hi, d)
            reset = False
            mcu += 1
    out += enc.flush()
    out += b"\xff\xd9"
    return bytes(out)


def _img(h, w, seed=7, hi=256):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = 0.5 * hi + 0.2 * hi * np.sin(yy / 4) + 0.2 * hi * np.cos(
        xx / 6) + rng.randint(-hi // 8, hi // 8, (h, w))
    return np.clip(base, 0, hi - 1).astype(np.int64)


# ------------------------------------------------ roundtrips


@pytest.mark.parametrize("pred", [1, 2, 3, 4, 5, 6, 7])
def test_sof11_gray_roundtrip_all_predictors(pred):
    img = _img(17, 13, seed=pred)
    got = decode_jpeg_py(_make_sof11(img, pred_sel=pred))
    assert got.shape == (17, 13, 1)
    np.testing.assert_array_equal(got[..., 0], img.astype(np.uint8))


def test_sof11_color_roundtrip():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (14, 11, 3)).astype(np.int64)
    got = decode_jpeg_py(_make_sof11(img, pred_sel=4))
    np.testing.assert_array_equal(got, img.astype(np.uint8))


def test_sof11_point_transform():
    img = _img(12, 12, seed=9)
    got = decode_jpeg_py(_make_sof11(img, pred_sel=7, pt=2))
    np.testing.assert_array_equal(got[..., 0],
                                  ((img >> 2) << 2).astype(np.uint8))


def test_sof11_restart_intervals():
    img = _img(16, 16, seed=5)
    p = _make_sof11(img, pred_sel=5, restart=23)
    assert b"\xff\xd0" in p
    got = decode_jpeg_py(p)
    np.testing.assert_array_equal(got[..., 0], img.astype(np.uint8))


def test_sof11_16bit_precision():
    deep = _img(10, 10, seed=11, hi=65536)
    got = decode_jpeg_py(_make_sof11(deep, precision=16))
    # >8-bit precision scales to the uint8 pixel contract
    np.testing.assert_array_equal(got[..., 0],
                                  (deep >> 8).astype(np.uint8))


def test_sof11_nondefault_dac_conditioning():
    img = _img(15, 15, seed=13)
    p = _make_sof11(img, pred_sel=1, dac=(2, 5))
    assert b"\xff\xcc" in p
    got = decode_jpeg_py(p)
    np.testing.assert_array_equal(got[..., 0], img.astype(np.uint8))


def test_sof11_matches_sof3_huffman_pixels():
    """Cross-entropy check: the SAME image through the Huffman
    lossless writer (SOF3) and the arithmetic writer (SOF11) must
    decode to identical samples — two independent entropy layers over
    one prediction model."""
    img = _img(18, 14, seed=2)
    hv = decode_jpeg_py(_make_lossless_jpeg(img, pred_sel=4))
    av = decode_jpeg_py(_make_sof11(img, pred_sel=4))
    np.testing.assert_array_equal(hv, av)
    rgb = np.random.RandomState(6).randint(0, 256, (9, 9, 3))
    np.testing.assert_array_equal(
        decode_jpeg_py(_make_lossless_jpeg(rgb, pred_sel=1, pt=1)),
        decode_jpeg_py(_make_sof11(rgb, pred_sel=1, pt=1)))


# ------------------------------------------------ metadata + hostile


def test_sof11_metadata_reports_dimensions():
    img = _img(21, 17)
    meta = parse_media_header(_make_sof11(img))
    assert meta["width"] == 17 and meta["height"] == 21


def test_sof11_hostile_streams():
    img = _img(12, 12)
    p = _make_sof11(img)

    # truncated mid-scan: zero-feed termination, never a hang — the
    # decode must end in a controlled error (missing data ≠ crash)
    sos = p.find(b"\xff\xda")
    with pytest.raises(ValueError):
        decode_jpeg_py(p[:sos])
    # bad predictor selector
    bad = bytearray(p)
    j = bad.find(b"\xff\xda")
    ns = bad[j + 4]
    bad[j + 5 + 2 * ns] = 0                 # Ss=0 invalid for SOF11
    with pytest.raises(ValueError, match="predictor"):
        decode_jpeg_py(bytes(bad))
    # SOF11 opening a DHP pyramid is the Annex-J lossless
    # non-differential first frame (implemented later in r14):
    # a one-level wrap decodes to the standalone pixels
    dhp = _seg(0xDE, bytes([8]) + (12).to_bytes(2, "big")
               + (12).to_bytes(2, "big") + bytes([1, 1, 0x11, 0]))
    assert np.array_equal(decode_jpeg_py(p[:2] + dhp + p[2:]),
                          decode_jpeg_py(p))
    # arithmetic-differential frames remain gated with a clear error
    sof15 = bytearray(p)
    sof15[sof15.find(b"\xff\xcb") + 1] = 0xCF
    with pytest.raises((NotImplementedError, ValueError)):
        decode_jpeg_py(bytes(sof15))


def test_sof11_decoder_never_hangs_on_corruption():
    rng = np.random.RandomState(0)
    img = _img(10, 10)
    p = bytearray(_make_sof11(img, restart=17))
    sos = bytes(p).find(b"\xff\xda")
    for _ in range(60):
        q = bytearray(p)
        i = rng.randint(sos + 8, len(q) - 2)
        q[i] ^= 1 << rng.randint(0, 8)
        try:
            decode_jpeg_py(bytes(q))
        except (ValueError, NotImplementedError):
            pass                            # controlled error is fine
