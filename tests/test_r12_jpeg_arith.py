"""Arithmetic-coded JPEG (SOF9 sequential + SOF10 progressive) —
round-11 verdict task 8.

The suite carries a mirror QM ENCODER (T.81 Annex D encode flow +
Annex F sequential statistical model, the jcarith.c shape) sharing
the decoder's Table D.3, so decode(encode(image)) roundtrips prove
the coder registers, conditioning contexts, magnitude chains, fixed
sign bin, restart handling, and DAC limits are self-consistent
end-to-end.  Cross-implementation bit-exactness vs libjpeg is
tool-gated (test_libjpeg_parity) and self-skips in this container —
the same honest posture as the Pillow parity oracle.
"""

from __future__ import annotations

import random
import shutil
import subprocess

import numpy as np
import pytest

from pipelinedb_spark.operators.jpeg import ZIGZAG, _DCT_A, decode_jpeg_py
from pipelinedb_spark.operators.jpegarith import (AC_STAT_BINS,
                                                  DC_STAT_BINS, FIXED_BIN,
                                                  QE_TABLE, ArithDecoder)

# ------------------------------------------------- Annex D encoder


class _QMEncoder:
    """T.81 Annex D encoder (jcarith.c decision flow) with the code
    register held as an arbitrary-precision integer: carry
    propagation is native big-int addition, and FLUSH picks the value
    in [C, C+A) with the most trailing zeros, so no byte-stacking
    state is needed.  0xFF stuffing is applied at flush."""

    def __init__(self):
        self.a = 0x10000
        self.c = 0
        self.shifts = 0

    def encode(self, st: np.ndarray, i: int, bit: int) -> None:
        sv = int(st[i])
        mps = sv >> 7
        qe, nlps, nmps, sw = QE_TABLE[sv & 0x7F]
        self.a -= qe
        if bit != mps:
            if self.a >= qe:          # no conditional exchange
                self.c += self.a
                self.a = qe
            st[i] = ((mps ^ sw) << 7) | nlps
        else:
            if self.a >= 0x8000:
                return
            if self.a < qe:           # conditional exchange
                self.c += self.a
                self.a = qe
            st[i] = (mps << 7) | nmps
        while self.a < 0x8000:
            self.a <<= 1
            self.c <<= 1
            self.shifts += 1

    def flush(self) -> bytes:
        total_bits = 16 + self.shifts
        lo, hi = self.c, self.c + self.a
        x = lo
        for mbit in range(total_bits, -1, -1):
            cand = ((lo + (1 << mbit) - 1) >> mbit) << mbit
            if cand < hi:
                x = cand
                break
        pad = (-total_bits) % 8
        raw = (x << pad).to_bytes((total_bits + pad) // 8, "big")
        raw = raw.rstrip(b"\x00") or b"\x00"
        out = bytearray()
        for b in raw:
            out.append(b)
            if b == 0xFF:
                out.append(0x00)      # stuffing: 0xFF is ours, not a marker
        return bytes(out)


# ------------------------------------- Annex F sequential model


class _Stats:
    def __init__(self):
        self.dc = {i: np.zeros(DC_STAT_BINS, dtype=np.uint8)
                   for i in range(4)}
        self.ac = {i: np.zeros(AC_STAT_BINS, dtype=np.uint8)
                   for i in range(4)}
        self.fixed = np.array([FIXED_BIN], dtype=np.uint8)


def _encode_dc(enc, stats, comp, cond_dc, diff):
    tbl = comp["td"]
    st = stats.dc[tbl]
    base = comp["dc_ctx"]
    if diff == 0:
        enc.encode(st, base, 0)
        comp["dc_ctx"] = 0
        return
    enc.encode(st, base, 1)
    sign = 1 if diff < 0 else 0
    enc.encode(st, base + 1, sign)
    v = -diff if sign else diff
    idx = base + 2 + sign
    m = 0
    v -= 1
    if v:
        enc.encode(st, idx, 1)
        m = 1
        v2 = v
        idx = 20
        while v2 >> 1:
            v2 >>= 1
            enc.encode(st, idx, 1)
            m <<= 1
            idx += 1
    enc.encode(st, idx, 0)
    lo, hi = cond_dc[tbl]
    if m < ((1 << lo) >> 1):
        comp["dc_ctx"] = 0
    elif m > ((1 << hi) >> 1):
        comp["dc_ctx"] = 12 + sign * 4
    else:
        comp["dc_ctx"] = 4 + sign * 4
    idx += 14
    mm = m >> 1
    while mm:
        enc.encode(st, idx, 1 if (v & mm) else 0)
        mm >>= 1


def _encode_ac_block(enc, stats, comp, cond_ac, seq):
    tbl = comp["ta"]
    st = stats.ac[tbl]
    kx = cond_ac[tbl]
    ke = 63
    while ke > 0 and seq[ke] == 0:
        ke -= 1
    k = 1
    while k <= ke:
        base = 3 * (k - 1)
        enc.encode(st, base, 0)           # not EOB
        while seq[k] == 0:
            enc.encode(st, base + 1, 0)
            k += 1
            base = 3 * (k - 1)
        enc.encode(st, base + 1, 1)
        v = int(seq[k])
        sign = 1 if v < 0 else 0
        enc.encode(stats.fixed, 0, sign)
        if sign:
            v = -v
        idx = base + 2
        m = 0
        v -= 1
        if v:
            enc.encode(st, idx, 1)
            m = 1
            v2 = v
            if v2 >> 1:
                v2 >>= 1
                enc.encode(st, idx, 1)
                m = 2
                idx = 189 if k <= kx else 217
                while v2 >> 1:
                    v2 >>= 1
                    enc.encode(st, idx, 1)
                    m <<= 1
                    idx += 1
        enc.encode(st, idx, 0)
        idx += 14
        mm = m >> 1
        while mm:
            enc.encode(st, idx, 1 if (v & mm) else 0)
            mm >>= 1
        k += 1
    if k <= 63:
        enc.encode(st, 3 * (k - 1), 1)    # EOB


def _encode_ac_first(enc, stats, comp, cond_ac, seq, ss, se, al):
    """Progressive AC first scan (band ss..se, point transform al) —
    the sequential AC encoder over the scaled band."""
    tbl = comp["ta"]
    st = stats.ac[tbl]
    kx = cond_ac[tbl]
    scaled = [0] * 64
    for k in range(ss, se + 1):
        v = int(seq[k])
        scaled[k] = (v >> al) if v >= 0 else -((-v) >> al)
    ke = se
    while ke >= ss and scaled[ke] == 0:
        ke -= 1
    k = ss
    while k <= ke:
        base = 3 * (k - 1)
        enc.encode(st, base, 0)
        while scaled[k] == 0:
            enc.encode(st, base + 1, 0)
            k += 1
            base = 3 * (k - 1)
        enc.encode(st, base + 1, 1)
        v = scaled[k]
        sign = 1 if v < 0 else 0
        enc.encode(stats.fixed, 0, sign)
        if sign:
            v = -v
        idx = base + 2
        m = 0
        v -= 1
        if v:
            enc.encode(st, idx, 1)
            m = 1
            v2 = v
            if v2 >> 1:
                v2 >>= 1
                enc.encode(st, idx, 1)
                m = 2
                idx = 189 if k <= kx else 217
                while v2 >> 1:
                    v2 >>= 1
                    enc.encode(st, idx, 1)
                    m <<= 1
                    idx += 1
        enc.encode(st, idx, 0)
        idx += 14
        mm = m >> 1
        while mm:
            enc.encode(st, idx, 1 if (v & mm) else 0)
            mm >>= 1
        k += 1
    if k <= se:
        enc.encode(st, 3 * (k - 1), 1)    # EOB


def _encode_ac_refine(enc, stats, comp, seq, ss, se, al):
    """Progressive AC refinement: correction bits for history
    coefficients, newly-nonzero decisions with fixed-bin signs, EOB
    decisions only past the previous scan's end (jcarith shape)."""
    st = stats.ac[comp["ta"]]
    absv = [0] * 64
    sgn = [0] * 64
    for k in range(ss, se + 1):
        v = int(seq[k])
        absv[k] = (v if v >= 0 else -v) >> al
        sgn[k] = 1 if v < 0 else 0
    ke = se
    while ke >= ss and absv[ke] == 0:
        ke -= 1
    kex = ke
    while kex >= ss and (absv[kex] >> 1) == 0:
        kex -= 1
    k = ss
    while k <= ke:
        base = 3 * (k - 1)
        if k > kex:
            enc.encode(st, base, 0)       # not EOB yet
        while True:
            temp = absv[k]
            if temp > 1:                  # history: correction bit
                enc.encode(st, base + 2, temp & 1)
                break
            if temp == 1:                 # newly nonzero this scan
                enc.encode(st, base + 1, 1)
                enc.encode(stats.fixed, 0, sgn[k])
                break
            enc.encode(st, base + 1, 0)
            k += 1
            base = 3 * (k - 1)
        k += 1
    if k <= se:
        enc.encode(st, 3 * (k - 1), 1)    # EOB


# ------------------------------------------------- fixture builder


def _build_blocks(rgb, subsample, quant):
    """Shared coefficient pipeline (the _make_jpeg shape): color
    transform, optional 4:2:0, FDCT, quantize.  Returns
    (blocks, samp, h, w, mcux, mcuy)."""
    arr = np.asarray(rgb, dtype=np.float64)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if gray:
        planes = [arr - 128.0]
        samp = [(1, 1)]
    else:
        r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
        if subsample:
            def down(pl):
                eh, ew = (h + 1) // 2 * 2, (w + 1) // 2 * 2
                pad = np.pad(pl, ((0, eh - h), (0, ew - w)),
                             mode="edge")
                return pad.reshape(eh // 2, 2, ew // 2, 2).mean((1, 3))
            planes = [y - 128, down(cb) - 128, down(cr) - 128]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y - 128, cb - 128, cr - 128]
            samp = [(1, 1)] * 3

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    blocks = []
    for pl, (sh, sv) in zip(planes, samp):
        bw, bh = mcux * sh, mcuy * sv
        pad = np.zeros((bh * 8, bw * 8))
        ph, pw = pl.shape
        pad[:ph, :pw] = pl
        pad[ph:, :pw] = pl[-1:, :]
        pad[:, pw:] = pad[:, pw - 1:pw]
        blk = pad.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
        coef = np.einsum("ik,yxkl,jl->yxij", _DCT_A, blk, _DCT_A)
        blocks.append(np.round(coef / quant).astype(np.int32))
    return blocks, samp, h, w, mcux, mcuy


def _conditioning(dac):
    cond_dc = {i: (0, 1) for i in range(4)}
    cond_ac = {i: 5 for i in range(4)}
    dac_body = b""
    if dac:
        for tbl, (lo, hi) in dac.get("dc", {}).items():
            cond_dc[tbl] = (lo, hi)
            dac_body += bytes([tbl, (hi << 4) | lo])
        for tbl, kxv in dac.get("ac", {}).items():
            cond_ac[tbl] = kxv
            dac_body += bytes([0x10 | tbl, kxv])
    return cond_dc, cond_ac, dac_body


def _seg(marker, body):
    return bytes([0xFF, marker]) \
        + (len(body) + 2).to_bytes(2, "big") + body


def _headers(sof_marker, quant, h, w, samp, dac_body, restart):
    zz = ZIGZAG
    dqt = bytes([0]) + bytes(int(quant.reshape(8, 8).flat[zz[i]])
                             for i in range(64))
    sof_body = bytes([8]) + h.to_bytes(2, "big") \
        + w.to_bytes(2, "big") + bytes([len(samp)])
    for ci, (sh, sv) in enumerate(samp):
        sof_body += bytes([ci + 1, (sh << 4) | sv, 0])
    out = b"\xff\xd8" + _seg(0xDB, dqt) + _seg(sof_marker, sof_body)
    if dac_body:
        out += _seg(0xCC, dac_body)
    if restart:
        out += _seg(0xDD, restart.to_bytes(2, "big"))
    return out


def _sos(comps, cids, ss, se, ah, al):
    body = bytes([len(cids)])
    for ci in cids:
        body += bytes([ci + 1,
                       (comps[ci]["td"] << 4) | comps[ci]["ta"]])
    body += bytes([ss, se, (ah << 4) | al])
    return _seg(0xDA, body)


def _make_comps(n):
    # luma uses table 0, chroma table 1 (the libjpeg convention)
    return [{"td": 0 if ci == 0 else 1, "ta": 0 if ci == 0 else 1,
             "pred": 0, "dc_ctx": 0} for ci in range(n)]


def _make_arith_jpeg(rgb, subsample=False, quant=None, restart=0,
                     dac=None):
    """SOF9 sequential arithmetic JPEG (test oracle): the _make_jpeg
    coefficient pipeline with QM entropy coding.  ``dac`` overrides
    conditioning as {"dc": {tbl: (L, U)}, "ac": {tbl: Kx}} and emits
    the DAC marker."""
    if quant is None:
        quant = np.ones((8, 8), dtype=np.int32)
    blocks, samp, h, w, mcux, mcuy = _build_blocks(rgb, subsample,
                                                   quant)
    cond_dc, cond_ac, dac_body = _conditioning(dac)
    comps = _make_comps(len(blocks))

    def fresh():
        for cmp_ in comps:
            cmp_["pred"] = 0
            cmp_["dc_ctx"] = 0
        return _QMEncoder(), _Stats()

    zz = ZIGZAG
    enc, stats = fresh()
    chunks = []
    for m in range(mcux * mcuy):
        if restart and m and m % restart == 0:
            chunks.append(enc.flush())
            chunks.append(bytes([0xFF,
                                 0xD0 + ((m // restart - 1) % 8)]))
            enc, stats = fresh()
        my, mx = divmod(m, mcux)
        for ci, (blk, (sh, sv)) in enumerate(zip(blocks, samp)):
            for by in range(sv):
                for bx in range(sh):
                    seq = blk[my * sv + by,
                              mx * sh + bx].reshape(64)[zz]
                    diff = int(seq[0]) - comps[ci]["pred"]
                    comps[ci]["pred"] = int(seq[0])
                    _encode_dc(enc, stats, comps[ci], cond_dc, diff)
                    _encode_ac_block(enc, stats, comps[ci], cond_ac,
                                     seq)
    chunks.append(enc.flush())
    return _headers(0xC9, quant, h, w, samp, dac_body, restart) \
        + _sos(comps, list(range(len(comps))), 0, 63, 0, 0) \
        + b"".join(chunks) + b"\xff\xd9"


def _make_prog_arith_jpeg(rgb, quant=None, dac=None, dc_al=1,
                          ac_al=1, band_split=5, restart=0):
    """SOF10 progressive arithmetic JPEG (4:4:4 / gray): DC first
    (Al=dc_al) → AC band first scans split at ``band_split``
    (Al=ac_al) → full DC/AC refinement ladders down to Al=0 — every
    arithmetic progressive scan shape, optionally with restart
    intervals in EVERY scan (fresh coder + stats + preds per
    interval, RSTn numbering restarting at RST0 per scan)."""
    if quant is None:
        quant = np.ones((8, 8), dtype=np.int32)
    blocks, samp, h, w, mcux, mcuy = _build_blocks(rgb, False, quant)
    assert all(s == (1, 1) for s in samp)
    cond_dc, cond_ac, dac_body = _conditioning(dac)
    comps = _make_comps(len(blocks))
    zz = ZIGZAG
    ncomp = len(blocks)
    n_units = mcux * mcuy        # 4:4:4: blocks per component = MCUs
    seqs = [[blocks[ci][divmod(m, mcux)].reshape(64)[zz]
             for m in range(n_units)] for ci in range(ncomp)]

    def fresh():
        for cmp_ in comps:
            cmp_["pred"] = 0
            cmp_["dc_ctx"] = 0
        return _QMEncoder(), _Stats()

    def scan_entropy(emit_unit) -> bytes:
        """One scan's entropy data, chunked at ``restart`` units."""
        enc, stats = fresh()
        parts = []
        for m in range(n_units):
            if restart and m and m % restart == 0:
                parts.append(enc.flush())
                parts.append(bytes(
                    [0xFF, 0xD0 + ((m // restart - 1) % 8)]))
                enc, stats = fresh()
            emit_unit(enc, stats, m)
        parts.append(enc.flush())
        return b"".join(parts)

    out = _headers(0xCA, quant, h, w, samp, dac_body, restart)

    # scan 1: DC first, interleaved, scaled by dc_al
    def dc_first(enc, stats, m):
        for ci in range(ncomp):
            scaled = int(seqs[ci][m][0]) >> dc_al
            diff = scaled - comps[ci]["pred"]
            comps[ci]["pred"] = scaled
            _encode_dc(enc, stats, comps[ci], cond_dc, diff)

    out += _sos(comps, list(range(ncomp)), 0, 0, 0, dc_al) \
        + scan_entropy(dc_first)

    # scans 2..: AC band firsts per component
    bands = [(1, band_split), (band_split + 1, 63)]
    for ci in range(ncomp):
        for ss, se in bands:
            out += _sos(comps, [ci], ss, se, 0, ac_al) \
                + scan_entropy(
                    lambda enc, stats, m, ci=ci, ss=ss, se=se:
                    _encode_ac_first(enc, stats, comps[ci], cond_ac,
                                     seqs[ci][m], ss, se, ac_al))

    # DC refinement ladder (interleaved, fixed bin) down to Al=0
    for a in range(dc_al - 1, -1, -1):
        def dc_refine(enc, stats, m, a=a):
            for ci in range(ncomp):
                enc.encode(stats.fixed, 0,
                           (int(seqs[ci][m][0]) >> a) & 1)

        out += _sos(comps, list(range(ncomp)), 0, 0, a + 1, a) \
            + scan_entropy(dc_refine)

    # AC refinement ladder per component down to Al=0
    for a in range(ac_al - 1, -1, -1):
        for ci in range(ncomp):
            for ss, se in bands:
                out += _sos(comps, [ci], ss, se, a + 1, a) \
                    + scan_entropy(
                        lambda enc, stats, m,
                        ci=ci, ss=ss, se=se, a=a:
                        _encode_ac_refine(enc, stats, comps[ci],
                                          seqs[ci][m], ss, se, a))
    return out + b"\xff\xd9"


# ------------------------------------------------------- tests


def test_qe_table_invariants():
    assert len(QE_TABLE) == 114
    for qe, nl, nm, sw in QE_TABLE:
        assert 0 < qe < 0x8000 and 0 <= nl <= 113 and 0 <= nm <= 113
    # the fixed sign bin transitions to itself and never switches
    assert QE_TABLE[FIXED_BIN] == (0x5A1D, 113, 113, 0)
    # within each non-switch run, Qe decreases toward 0 (the
    # estimator sharpens as MPS streaks lengthen)
    for i in range(0, 13):
        assert QE_TABLE[i][0] > QE_TABLE[i + 1][0]
    # global estimator direction: every MPS transition weakly
    # SHARPENS the estimate (Qe non-increasing) and every non-switch
    # LPS transition weakly WEAKENS it — properties of the published
    # machine that a transcription slip would likely break, giving
    # independent evidence beyond encoder-mirror roundtrips
    for i, (qe, nl, nm, sw) in enumerate(QE_TABLE[:113]):
        assert QE_TABLE[nm][0] <= qe, (i, "MPS transition raises Qe")
        if not sw:
            assert QE_TABLE[nl][0] >= qe, (i, "LPS transition lowers")
    # every state is reachable from the start state
    seen, frontier = {0}, [0]
    while frontier:
        s = frontier.pop()
        for nxt in QE_TABLE[s][1:3]:
            if nxt not in seen:
                seen.add(nxt)
                frontier.append(nxt)
    assert seen >= set(range(113))


def test_raw_coder_roundtrip_random_bitstreams():
    """Fundamental coder check below the JPEG model: arbitrary bit
    sequences over mixed adaptive/fixed bins encode+decode
    losslessly, through carries, stuffing, and renormalization."""
    rng = random.Random(7)
    for _ in range(60):
        nbins = rng.randint(1, 5)
        n = rng.randint(1, 800)
        bins = [rng.randrange(nbins) for _ in range(n)]
        skew = rng.random()
        bits = [1 if rng.random() < skew else 0 for _ in range(n)]
        st_e = np.zeros(nbins, dtype=np.uint8)
        st_e[-1] = FIXED_BIN
        enc = _QMEncoder()
        for b, i in zip(bits, bins):
            enc.encode(st_e, i, b)
        data = enc.flush() + b"\xff\xd9"
        st_d = np.zeros(nbins, dtype=np.uint8)
        st_d[-1] = FIXED_BIN
        dec = ArithDecoder(data, 0)
        assert [dec.decode(st_d, i) for i in bins] == bits


def test_arith_gray_quant1_roundtrip():
    rng = np.random.RandomState(3)
    img = np.clip(rng.randint(60, 200, (4, 3)).repeat(6, 0)
                  .repeat(8, 1) + rng.randint(-6, 7, (24, 24)),
                  0, 255)
    got = decode_jpeg_py(_make_arith_jpeg(img))
    assert got.shape == (24, 24, 1)
    assert np.max(np.abs(got[..., 0].astype(int) - img)) <= 2


def test_arith_color_444_and_nonmultiple_dims():
    rng = np.random.RandomState(5)
    img = np.clip(rng.randint(0, 256, (3, 2, 3)).repeat(7, 0)
                  .repeat(9, 1) + rng.randint(-4, 5, (21, 18, 3)),
                  0, 255)
    got = decode_jpeg_py(_make_arith_jpeg(img))
    assert got.shape == img.shape
    assert np.max(np.abs(got.astype(int) - img)) <= 4


def test_arith_420_restart_and_dac_conditioning():
    """4:2:0 subsampling (constant chroma → exact), restart markers
    resetting decoder+stats, and non-default DAC conditioning (the
    L/U/Kx limits change bin SELECTION on both sides — a mismatch
    desyncs the coder immediately)."""
    rng = np.random.RandomState(11)
    base = rng.randint(40, 220, (4, 4)).repeat(8, 0).repeat(8, 1)
    img = np.stack([np.clip(base + rng.randint(-5, 6, (32, 32)),
                            0, 255)] * 3, axis=-1)
    p = _make_arith_jpeg(img, subsample=True, restart=2,
                         dac={"dc": {0: (1, 3), 1: (0, 2)},
                              "ac": {0: 9, 1: 2}})
    got = decode_jpeg_py(p)
    assert got.shape == img.shape
    assert np.max(np.abs(got.astype(int) - img)) <= 4
    # and the stream really is arithmetic + conditioned + restarted
    assert b"\xff\xc9" in p and b"\xff\xcc" in p and b"\xff\xd0" in p


def test_arith_quantized_smooth_image_plausible():
    """With a real quant table the roundtrip is lossy; a smooth
    gradient must still come back close (sanity on dequant +
    IDCT integration of the arithmetic path)."""
    x = np.linspace(60, 190, 32)
    img = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.int64)
    quant = np.full((8, 8), 4, dtype=np.int32)
    quant[0, 0] = 2
    got = decode_jpeg_py(_make_arith_jpeg(img, quant=quant))
    assert got.shape == (32, 32, 1)
    assert np.mean(np.abs(got[..., 0].astype(float) - img)) < 4.0


def test_arith_truncation_and_corruption_never_hang():
    """Bounded failure on damaged streams: truncations decode (zero
    byte feed per D.2.7) or raise ValueError; flipped bytes in the
    entropy segment must not hang or crash the process."""
    rng = np.random.RandomState(13)
    img = np.clip(rng.randint(0, 256, (16, 16)), 0, 255)
    p = _make_arith_jpeg(img)
    sos = p.find(b"\xff\xda")
    for cut in (sos + 15, len(p) - 4, len(p) - 12):
        try:
            out = decode_jpeg_py(p[:cut])
            assert out is None or out.shape == (16, 16, 1)
        except (ValueError, NotImplementedError):
            pass
    for _ in range(30):
        q = bytearray(p)
        i = rng.randint(sos + 10, len(p) - 3)
        q[i] ^= 1 << rng.randint(0, 8)
        try:
            out = decode_jpeg_py(bytes(q))
            assert out is None or out.shape == (16, 16, 1)
        except (ValueError, NotImplementedError):
            pass


def test_prog_arith_gray_roundtrip():
    """SOF10: DC first/refine + AC band first/refine scans rebuild
    the exact coefficients (quant=1 → pixels within DCT float
    noise)."""
    rng = np.random.RandomState(17)
    img = np.clip(rng.randint(50, 210, (3, 3)).repeat(8, 0)
                  .repeat(8, 1) + rng.randint(-7, 8, (24, 24)),
                  0, 255)
    p = _make_prog_arith_jpeg(img)
    assert b"\xff\xca" in p
    got = decode_jpeg_py(p)
    assert got.shape == (24, 24, 1)
    assert np.max(np.abs(got[..., 0].astype(int) - img)) <= 2


def test_prog_arith_color_dac_and_deeper_al():
    """Color 4:4:4 progressive arithmetic with non-default DAC
    conditioning and a 2-bit successive-approximation ladder on the
    DC path (dc_al=2 exercises multiple refinement semantics)."""
    rng = np.random.RandomState(19)
    img = np.clip(rng.randint(0, 256, (2, 2, 3)).repeat(8, 0)
                  .repeat(8, 1) + rng.randint(-3, 4, (16, 16, 3)),
                  0, 255)
    p = _make_prog_arith_jpeg(img, dac={"dc": {0: (1, 2), 1: (0, 3)},
                                        "ac": {0: 11, 1: 3}},
                              band_split=9)
    got = decode_jpeg_py(p)
    assert got.shape == img.shape
    assert np.max(np.abs(got.astype(int) - img)) <= 4


def test_prog_arith_restart_intervals_every_scan():
    """Restart intervals inside progressive arithmetic scans: every
    scan kind (DC first, AC first, DC refine, AC refine) restarts
    the coder + statistics + predictions per interval, with RSTn
    numbering restarting per scan — must reconstruct exactly."""
    rng = np.random.RandomState(43)
    img = np.clip(rng.randint(40, 220, (4, 3)).repeat(8, 0)
                  .repeat(8, 1) + rng.randint(-6, 7, (32, 24)),
                  0, 255)
    p = _make_prog_arith_jpeg(img, dc_al=2, ac_al=2, restart=3)
    assert p.count(b"\xff\xdd") == 1 and b"\xff\xd0" in p
    got = decode_jpeg_py(p)
    assert got.shape == (32, 24, 1)
    assert np.max(np.abs(got[..., 0].astype(int) - img)) <= 2


def test_prog_arith_partial_stream_is_viewable():
    """The progressive contract: a stream truncated after the first
    scans still decodes to a coarse image once every component has
    its DC scan (the multi-scan coverage rule)."""
    rng = np.random.RandomState(23)
    img = np.clip(rng.randint(60, 200, (16, 16)), 0, 255)
    p = _make_prog_arith_jpeg(img)
    # cut after the 2nd SOS (DC first + first AC band)
    cuts = [m.start() for m in __import__("re").finditer(
        b"\xff\xda", p)]
    coarse = decode_jpeg_py(p[:cuts[2]] + b"\xff\xd9")
    assert coarse.shape == (16, 16, 1)
    # DC-only-ish reconstruction: block means near the original's
    full = decode_jpeg_py(p)
    assert np.mean(np.abs(coarse.astype(float) - full.astype(float))) < 40


def test_arith_and_huffman_fixtures_decode_identically():
    """Cross-fixture lock (round-12 review): this file's coefficient
    pipeline deliberately mirrors test_operators._make_jpeg; with
    quant=1 the SAME image through the Huffman and arithmetic
    encoders must decode to IDENTICAL pixels — any divergence in the
    duplicated color-transform/downsample/FDCT code breaks this, so
    the two oracle suites stay pinned to one coefficient source."""
    from test_operators import _make_jpeg

    rng = np.random.RandomState(37)
    img = np.clip(rng.randint(0, 256, (3, 2, 3)).repeat(8, 0)
                  .repeat(8, 1) + rng.randint(-4, 5, (24, 16, 3)),
                  0, 255)
    assert np.array_equal(decode_jpeg_py(_make_jpeg(img)),
                          decode_jpeg_py(_make_arith_jpeg(img)))
    assert np.array_equal(
        decode_jpeg_py(_make_jpeg(img, subsample=True)),
        decode_jpeg_py(_make_arith_jpeg(img, subsample=True)))
    gray = np.clip(rng.randint(0, 256, (17, 11)), 0, 255)
    assert np.array_equal(decode_jpeg_py(_make_jpeg(gray)),
                          decode_jpeg_py(_make_arith_jpeg(gray)))


def test_malformed_dac_and_dc_scan_headers_rejected():
    """Round-12 review regressions: an odd-length DAC segment (an
    orphaned half table definition) and a progressive DC scan with
    Se>0 (which would silently skip the declared AC band) both raise
    the contract's ValueError."""
    import re
    rng = np.random.RandomState(41)
    p = _make_prog_arith_jpeg(
        np.clip(rng.randint(0, 256, (16, 16)), 0, 255),
        dac={"ac": {0: 7}})
    dac = p.find(b"\xff\xcc")
    odd = bytearray(p)
    # stretch the DAC length by one and inject a stray byte
    ln = int.from_bytes(odd[dac + 2:dac + 4], "big")
    odd[dac + 2:dac + 4] = (ln + 1).to_bytes(2, "big")
    odd.insert(dac + 2 + ln, 0x01)
    with pytest.raises(ValueError, match="DAC"):
        decode_jpeg_py(bytes(odd))

    bad_dc = bytearray(p)
    first_sos = p.find(b"\xff\xda")
    # the DC scan is interleaved over all components; Se byte sits
    # after ns pairs
    ns = bad_dc[first_sos + 4]
    bad_dc[first_sos + 5 + 2 * ns + 1] = 30   # Se=30 on a DC scan
    with pytest.raises(ValueError, match="Se=0"):
        decode_jpeg_py(bytes(bad_dc))


def test_hostile_scan_header_bounds_raise_valueerror():
    """T.81 B.2.3 bounds on progressive scan headers: a hostile Se
    (stat-array index) or Al (int32 coefficient shift) must be the
    decode contract's ValueError, not a numpy IndexError/
    OverflowError escaping from the entropy loop."""
    import re
    rng = np.random.RandomState(29)
    p = _make_prog_arith_jpeg(
        np.clip(rng.randint(0, 256, (16, 16)), 0, 255))
    cuts = [m.start() for m in re.finditer(b"\xff\xda", p)]
    bad_se = bytearray(p)
    bad_se[cuts[1] + 8] = 255            # AC band scan: Se=255
    with pytest.raises(ValueError, match="scan header"):
        decode_jpeg_py(bytes(bad_se))
    bad_al = bytearray(p)
    bad_al[cuts[2] + 9] = 0x1F           # Ah=1, Al=15
    with pytest.raises(ValueError, match="scan header"):
        decode_jpeg_py(bytes(bad_al))


def test_differential_arithmetic_requires_dhp():
    """r14 implemented SOF13-15, so the old blanket gate is gone;
    a differential frame with no hierarchical (DHP) context is now
    the same structural ValueError the Huffman SOF5-7 get."""
    img = np.zeros((8, 8), dtype=np.uint8)
    p = bytearray(_make_arith_jpeg(img))
    i = p.find(b"\xff\xc9")
    p[i + 1] = 0xCE                      # SOF14: differential prog
    with pytest.raises(ValueError, match="outside a hierarchical"):
        decode_jpeg_py(bytes(p))


def test_arith_metadata_header_parses():
    """The multimodal metadata path reads SOF9 dimensions without
    entropy decode — an arithmetic stream yields a full metadata
    row regardless."""
    from pipelinedb_spark.operators.multimodal import \
        parse_media_header

    img = np.clip(np.random.RandomState(1).randint(0, 256, (24, 17)),
                  0, 255)
    meta = parse_media_header(_make_arith_jpeg(img))
    assert meta is not None
    assert meta["width"] == 17 and meta["height"] == 24


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 2 ** 31 - 1), st.booleans(), st.booleans(),
       st.integers(0, 3), st.sampled_from([1, 2, 5]))
def test_arith_roundtrip_hypothesis(seed, color, subsample, restart,
                                    kx):
    """Property fuzz over the sequential arithmetic path: any small
    image, gray/color, 4:4:4/4:2:0, restart interval, and Kx
    conditioning must roundtrip within the DCT float-noise bound —
    the randomized complement to the directed fixtures."""
    rng = np.random.RandomState(seed % (2 ** 31))
    h = int(rng.randint(8, 28))
    w = int(rng.randint(8, 28))
    base = rng.randint(0, 256, (h, w))
    img = np.stack([np.clip(base + rng.randint(-3, 4, (h, w)),
                            0, 255)] * 3, axis=-1) if color \
        else np.clip(base, 0, 255)
    p = _make_arith_jpeg(img, subsample=subsample and color,
                         restart=restart,
                         dac={"ac": {0: kx, 1: kx}})
    got = decode_jpeg_py(p)
    want = img if color else img[..., None]
    assert got.shape == want.shape
    tol = 4 if (color and subsample) else (4 if color else 2)
    if color and subsample:
        # chroma is genuinely downsampled: bound luma instead
        gy = got.astype(float) @ np.array([0.299, 0.587, 0.114])
        wy = want.astype(float) @ np.array([0.299, 0.587, 0.114])
        assert np.max(np.abs(gy - wy)) <= 3
    else:
        assert np.max(np.abs(got.astype(int)
                             - want.astype(int))) <= tol


@settings(max_examples=10, deadline=None)
@given(st.integers(0, 2 ** 31 - 1), st.integers(1, 2),
       st.sampled_from([3, 5, 20]))
def test_prog_arith_roundtrip_hypothesis(seed, ac_al, band_split):
    """Property fuzz over the progressive arithmetic scan script:
    random images, successive-approximation depth, and band split."""
    rng = np.random.RandomState(seed % (2 ** 31))
    h = int(rng.randint(8, 25))
    w = int(rng.randint(8, 25))
    img = np.clip(rng.randint(0, 256, (h, w)), 0, 255)
    p = _make_prog_arith_jpeg(img, ac_al=ac_al,
                              band_split=band_split)
    got = decode_jpeg_py(p)
    assert got.shape == (h, w, 1)
    assert np.max(np.abs(got[..., 0].astype(int) - img)) <= 2


@pytest.mark.skipif(shutil.which("cjpeg") is None,
                    reason="needs a cjpeg binary with -arithmetic "
                           "for cross-implementation parity")
def test_libjpeg_parity(tmp_path):
    """Tool-gated cross-check of the Table D.3 transcription: decode
    a libjpeg-produced arithmetic stream and compare against
    djpeg's own output."""
    rng = np.random.RandomState(2)
    img = np.clip(rng.randint(0, 256, (32, 32)), 0, 255).astype(
        np.uint8)
    pgm = tmp_path / "in.pgm"
    with open(pgm, "wb") as f:
        f.write(b"P5\n32 32\n255\n" + img.tobytes())
    jpg = tmp_path / "out.jpg"
    subprocess.run(["cjpeg", "-arithmetic", "-quality", "95",
                    "-outfile", str(jpg), str(pgm)], check=True)
    ours = decode_jpeg_py(open(jpg, "rb").read())
    pnm = subprocess.run(["djpeg", "-pnm", str(jpg)],
                         check=True, capture_output=True).stdout
    theirs = np.frombuffer(pnm.split(b"\n", 3)[3], dtype=np.uint8) \
        .reshape(32, 32)
    assert np.array_equal(ours[..., 0], theirs)
