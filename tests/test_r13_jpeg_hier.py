"""Hierarchical JPEG (T.81 Annex J) — round-12 verdict task 4.

The suite carries a mirror HIERARCHICAL ENCODER (frame pyramid via
2x2-mean decimation, differential frames coded with the modified
Annex-F flow: DC prediction disabled, level-shift-free FDCT of the
residual) that also computes the decoder-normative expected output —
EXP expansion uses jpeg._exp_expand (the J.1.1.2 filter is normative,
so encoder and decoder MUST share it), reconstruction uses the same
clip(ref + idct_raw(deq)) arithmetic the decoder applies.  Roundtrips
therefore assert BIT-EXACT equality, not a tolerance.

Cross-implementation parity vs external tooling is unavailable in this
container (no cjpeg/djpeg/Pillow) — the same honest posture as the
arithmetic-JPEG and Pillow oracles.
"""

from __future__ import annotations

import numpy as np
import pytest

from pipelinedb_spark.operators.jpeg import (ZIGZAG, _DCT_A, _exp_expand,
                                             _idct_raw, _ycc_to_rgb,
                                             decode_jpeg_py)
from pipelinedb_spark.operators.multimodal import parse_media_header

# --------------------------------------------------------- bit writer


class _BitWriter:
    def __init__(self, out: bytearray):
        self.out = out
        self.acc = 0
        self.n = 0

    def put(self, code: int, ln: int) -> None:
        self.acc = (self.acc << ln) | code
        self.n += ln
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)


def _build_table(syms, min_len=2):
    """Canonical fixed-length Huffman table (same trick as the
    baseline test encoder: n symbols at one length L, the all-ones
    code unused)."""
    syms = sorted(syms)
    L = max(min_len, (len(syms) + 1).bit_length())
    bits = [0] * 16
    bits[L - 1] = len(syms)
    return bits, syms, {s: (i, L) for i, s in enumerate(syms)}


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") \
        + body


def _cat(v: int) -> int:
    return int(abs(v)).bit_length()


def _extra(v: int, t: int) -> int:
    return v if v >= 0 else v + (1 << t) - 1


# ------------------------------------------------ frame coefficients


def _fdct_quant(plane: np.ndarray, quant: np.ndarray) -> np.ndarray:
    """(H, W) residual/sample plane → (nby, nbx, 8, 8) quantized
    coefficients, edge-replicated to full blocks (1x1 sampling)."""
    h, w = plane.shape
    bh, bw = -(-h // 8), -(-w // 8)
    pad = np.zeros((bh * 8, bw * 8))
    pad[:h, :w] = plane
    pad[h:, :w] = pad[h - 1:h, :w]
    pad[:, w:] = pad[:, w - 1:w]
    blk = pad.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
    coef = np.einsum("ik,yxkl,jl->yxij", _DCT_A, blk, _DCT_A)
    return np.round(coef / quant).astype(np.int64)


def _recon_planes(q: np.ndarray, quant: np.ndarray, h: int,
                  w: int) -> np.ndarray:
    """Decoder-identical spatial output of quantized blocks (no level
    shift, no clip — the caller applies the frame rule)."""
    bh, bw = q.shape[:2]
    sp = _idct_raw((q * quant).reshape(bh * bw, 8, 8).astype(np.int64))
    return sp.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(
        bh * 8, bw * 8)[:h, :w]


# --------------------------------------------- sequential scan bytes


def _seq_scan(comps_q, differential: bool, restart: int = 0) -> bytes:
    """One interleaved sequential scan over full-band coefficients.
    comps_q: list of (nby, nbx, 8, 8) arrays, all the same grid
    (1x1 sampling).  Differential frames code every DC against 0."""
    zz = ZIGZAG
    events = []
    dc_syms, ac_syms = set(), set()
    preds = [0] * len(comps_q)
    nby, nbx = comps_q[0].shape[:2]
    m = 0
    for by in range(nby):
        for bx in range(nbx):
            if restart and m and m % restart == 0:
                events.append(("rst", (m // restart - 1) % 8))
                preds = [0] * len(comps_q)
            for ci, q in enumerate(comps_q):
                seq = q[by, bx].reshape(64)[zz]
                dc = int(seq[0])
                d = dc if differential else dc - preds[ci]
                preds[ci] = dc
                t = _cat(d)
                dc_syms.add(t)
                events.append(("dc", t, _extra(d, t), t))
                run = 0
                for k in range(1, 64):
                    v = int(seq[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        ac_syms.add(0xF0)
                        events.append(("ac", 0xF0, 0, 0))
                        run -= 16
                    s = _cat(v)
                    sym = (run << 4) | s
                    ac_syms.add(sym)
                    events.append(("ac", sym, _extra(v, s), s))
                    run = 0
                if run:
                    ac_syms.add(0x00)
                    events.append(("ac", 0x00, 0, 0))
            m += 1
    dbits, dsyms, dcodes = _build_table(dc_syms or {0})
    abits, asyms, acodes = _build_table(ac_syms or {0})
    out = bytearray()
    out += _seg(0xC4, bytes([0x00]) + bytes(dbits) + bytes(dsyms))
    out += _seg(0xC4, bytes([0x10]) + bytes(abits) + bytes(asyms))
    sos = bytes([len(comps_q)])
    for ci in range(len(comps_q)):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    bw_ = _BitWriter(out)
    for ev in events:
        if ev[0] == "rst":
            bw_.flush()
            out.extend(bytes([0xFF, 0xD0 + ev[1]]))
            continue
        kind, sym, extra, n = ev
        code, ln = (dcodes if kind == "dc" else acodes)[sym]
        bw_.put(code, ln)
        if n:
            bw_.put(extra, n)
    bw_.flush()
    return bytes(out)


def _prog_diff_scans(comps_q) -> bytes:
    """Progressive differential scans (SOF6): interleaved DC first at
    Al=1, per-component AC 1..63 at Al=0 with EOB runs, interleaved DC
    refinement to Al=0.  DC is coded against 0 (differential rule);
    the Al=1 first pass codes v>>1 (arithmetic shift) and the refine
    pass appends bit 0 — two's-complement OR on the decoder side."""
    zz = ZIGZAG
    nby, nbx = comps_q[0].shape[:2]
    out = bytearray()

    # ---- scan 1: DC first, Al=1, interleaved
    dc_syms, ev = set(), []
    for by in range(nby):
        for bx in range(nbx):
            for q in comps_q:
                d = int(q[by, bx, 0, 0]) >> 1
                t = _cat(d)
                dc_syms.add(t)
                ev.append((t, _extra(d, t), t))
    dbits, dsyms, dcodes = _build_table(dc_syms or {0})
    out += _seg(0xC4, bytes([0x00]) + bytes(dbits) + bytes(dsyms))
    sos = bytes([len(comps_q)])
    for ci in range(len(comps_q)):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 0, 0x01])          # Ss=Se=0, Ah=0, Al=1
    out += _seg(0xDA, sos)
    w = _BitWriter(out)
    for t, extra, n in ev:
        code, ln = dcodes[t]
        w.put(code, ln)
        if n:
            w.put(extra, n)
    w.flush()

    # ---- per-component AC 1..63 first scans, Al=0, EOB runs
    for ci, q in enumerate(comps_q):
        ac_syms, ev = set(), []
        eobrun = 0
        for by in range(nby):
            for bx in range(nbx):
                seq = q[by, bx].reshape(64)[zz]
                nz = [k for k in range(1, 64) if seq[k]]
                if not nz:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        n = eobrun.bit_length() - 1
                        ac_syms.add(n << 4)
                        ev.append((n << 4, eobrun - (1 << n), n))
                        eobrun = 0
                    continue
                if eobrun:
                    n = eobrun.bit_length() - 1
                    ac_syms.add(n << 4)
                    ev.append((n << 4, eobrun - (1 << n), n))
                    eobrun = 0
                run = 0
                for k in range(1, 64):
                    v = int(seq[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        ac_syms.add(0xF0)
                        ev.append((0xF0, 0, 0))
                        run -= 16
                    s = _cat(v)
                    ac_syms.add((run << 4) | s)
                    ev.append(((run << 4) | s, _extra(v, s), s))
                    run = 0
                if run:                  # trailing zeros → EOB run 1
                    eobrun = 1
        if eobrun:
            n = eobrun.bit_length() - 1
            ac_syms.add(n << 4)
            ev.append((n << 4, eobrun - (1 << n), n))
        abits, asyms, acodes = _build_table(ac_syms or {0})
        out += _seg(0xC4, bytes([0x10]) + bytes(abits) + bytes(asyms))
        out += _seg(0xDA, bytes([1, ci + 1, 0x00, 1, 63, 0x00]))
        w = _BitWriter(out)
        for sym, extra, n in ev:
            code, ln = acodes[sym]
            w.put(code, ln)
            if n:
                w.put(extra, n)
        w.flush()

    # ---- scan: DC refinement to Al=0 (one raw bit per block)
    out += _seg(0xDA, sos[:-1] + b"\x10")  # Ah=1, Al=0
    w = _BitWriter(out)
    for by in range(nby):
        for bx in range(nbx):
            for q in comps_q:
                w.put(int(q[by, bx, 0, 0]) & 1, 1)
    w.flush()
    return bytes(out)


# ------------------------------------------------- stream assembly


def _lossless_diff_scan(diffs) -> bytes:
    """One interleaved differential-lossless scan (SOF7 frames): each
    modulo-2^16 diff coded as a DC magnitude category + EXTEND bits
    (t=16 carries no bits, per H.2), prediction disabled (Ss=0)."""
    syms, ev = set(), []
    fh, fw = diffs[0].shape
    for y in range(fh):
        for x in range(fw):
            for d0 in diffs:
                d = int(d0[y, x])
                if d == 32768:
                    syms.add(16)
                    ev.append((16, 0, 0))
                    continue
                if d > 32768:
                    d -= 65536
                t = _cat(d)
                syms.add(t)
                ev.append((t, _extra(d, t), t))
    dbits, dsyms, dcodes = _build_table(syms or {0})
    out = bytearray()
    out += _seg(0xC4, bytes([0x00]) + bytes(dbits) + bytes(dsyms))
    sos = bytes([len(diffs)])
    for ci in range(len(diffs)):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 0, 0])             # Ss=0 (no prediction), Al=0
    out += _seg(0xDA, sos)
    w = _BitWriter(out)
    for t, extra, n in ev:
        code, ln = dcodes[t]
        w.put(code, ln)
        if n:
            w.put(extra, n)
    w.flush()
    return bytes(out)


def _make_hier_jpeg(img, levels: int = 2, quant=None,
                    progressive_diff: bool = False, restart: int = 0,
                    lossless_final: bool = False):
    """Hierarchical JPEG + the decoder-exact expected pixels.

    Pyramid: 2x2-mean decimation per level (encoder's choice); frame 1
    is a non-differential SOF0 at the smallest size; each later level
    is EXP(1,1) expansion + a differential SOF5 (or SOF6 with
    ``progressive_diff``) frame of the residual.  With
    ``lossless_final`` one more SOF7 frame at full size codes the
    exact spatial difference, making the whole pyramid lossless (the
    Annex-J headline property).  Returns
    (jpeg_bytes, expected_hwc_uint8)."""
    arr = np.asarray(img, dtype=np.float64)
    gray = arr.ndim == 2
    h0, w0 = arr.shape[:2]
    if quant is None:
        quant = np.ones((8, 8), dtype=np.int64)
    quant = np.asarray(quant, dtype=np.int64)
    if gray:
        planes = [arr]
    else:
        r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
        planes = [0.299 * r + 0.587 * g + 0.114 * b,
                  -0.168736 * r - 0.331264 * g + 0.5 * b + 128,
                  0.5 * r - 0.418688 * g - 0.081312 * b + 128]
    nc = len(planes)

    def down(pl):
        ph, pw = pl.shape
        eh, ew = -(-ph // 2) * 2, -(-pw // 2) * 2
        pad = np.pad(pl, ((0, eh - ph), (0, ew - pw)), mode="edge")
        return pad.reshape(eh // 2, 2, ew // 2, 2).mean((1, 3))

    pyr = [planes]                      # pyr[0] = full size
    for _ in range(levels - 1):
        pyr.append([down(pl) for pl in pyr[-1]])
    pyr.reverse()                       # smallest first

    out = bytearray(b"\xff\xd8")
    qbody = bytes([0]) + bytes(int(quant.reshape(64)[z])
                               for z in ZIGZAG)
    out += _seg(0xDB, qbody)
    dhp = bytes([8]) + h0.to_bytes(2, "big") + w0.to_bytes(2, "big") \
        + bytes([nc])
    for ci in range(nc):
        dhp += bytes([ci + 1, 0x11, 0])
    out += _seg(0xDE, dhp)

    # frame 1: non-differential SOF0 at the smallest level
    lv = pyr[0]
    fh, fw = lv[0].shape
    sof = bytes([8]) + fh.to_bytes(2, "big") + fw.to_bytes(2, "big") \
        + bytes([nc])
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, 0])
    out += _seg(0xC0, sof)
    qs = [_fdct_quant(pl - 128.0, quant) for pl in lv]
    out += _seq_scan(qs, differential=False)
    ref = [np.clip(_recon_planes(q, quant, fh, fw) + 128, 0, 255)
           for q in qs]

    for lv in pyr[1:]:
        fh, fw = lv[0].shape
        if restart:
            out += _seg(0xDD, restart.to_bytes(2, "big"))
        out += _seg(0xDF, bytes([0x11]))       # EXP both axes
        ref = [_exp_expand(pl, 1, 1)[:fh, :fw] for pl in ref]
        sofm = 0xC6 if progressive_diff else 0xC5
        sof = bytes([8]) + fh.to_bytes(2, "big") \
            + fw.to_bytes(2, "big") + bytes([nc])
        for ci in range(nc):
            sof += bytes([ci + 1, 0x11, 0])
        out += _seg(sofm, sof)
        qs = [_fdct_quant(src - rf, quant)
              for src, rf in zip(lv, ref)]
        if progressive_diff:
            out += _prog_diff_scans(qs)
        else:
            out += _seq_scan(qs, differential=True, restart=restart)
        ref = [np.clip(rf + _recon_planes(q, quant, fh, fw), 0, 255)
               for rf, q in zip(ref, qs)]

    if lossless_final:
        # SOF7 at full size, no EXP: exact spatial diffs mod 2^16
        fh, fw = pyr[-1][0].shape
        sof = bytes([8]) + fh.to_bytes(2, "big") \
            + fw.to_bytes(2, "big") + bytes([nc])
        for ci in range(nc):
            sof += bytes([ci + 1, 0x11, 0])
        out += _seg(0xC7, sof)
        srcs = [np.clip(np.round(pl), 0, 255).astype(np.int64)
                for pl in pyr[-1]]
        diffs = [(s - rf.astype(np.int64)) & 0xFFFF
                 for s, rf in zip(srcs, ref)]
        out += _lossless_diff_scan(diffs)
        ref = [np.clip((rf.astype(np.int64) + d) & 0xFFFF, 0, 255)
               for rf, d in zip(ref, diffs)]

    out += b"\xff\xd9"
    if gray:
        expected = ref[0].astype(np.uint8)[..., None]
    else:
        expected = _ycc_to_rgb(ref)
    return bytes(out), expected


def _img_gray(h, w, seed=7):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    return np.clip(128 + 60 * np.sin(yy / 5) + 50 * np.cos(xx / 7)
                   + rng.randint(-8, 9, (h, w)), 0, 255)


# ------------------------------------------------------------ tests


def test_hier_gray_two_level_exact():
    """Odd dimensions exercise the 2N-1 EXP crop; quant=1 keeps every
    step integer-exact, so decode == the encoder's predicted pixels
    bit for bit."""
    img = _img_gray(21, 17)
    p, want = _make_hier_jpeg(img, levels=2)
    got = decode_jpeg_py(p)
    assert got.shape == (21, 17, 1)
    assert np.array_equal(got, want)


def test_hier_color_three_level_exact():
    rng = np.random.RandomState(3)
    img = np.clip(rng.randint(0, 256, (30, 22, 3)), 0, 255)
    p, want = _make_hier_jpeg(img, levels=3)
    got = decode_jpeg_py(p)
    assert got.shape == (30, 22, 3)
    assert np.array_equal(got, want)


def test_hier_quantized_close_to_source():
    """With a real quant table the pyramid is lossy but the decoder
    must still match the encoder's own reconstruction exactly, and
    that reconstruction should be close to the source."""
    img = _img_gray(24, 24, seed=11)
    q = np.full((8, 8), 4, dtype=np.int64)
    q[0, 0] = 2
    p, want = _make_hier_jpeg(img, levels=2, quant=q)
    got = decode_jpeg_py(p)
    assert np.array_equal(got, want)
    assert np.mean(np.abs(got[..., 0].astype(float) - img)) < 6.0


def test_hier_progressive_differential_exact():
    """SOF6: DC-first Al=1 + per-component AC band scans with EOB runs
    + DC refinement — the differential coefficients rebuild exactly."""
    img = _img_gray(19, 23, seed=5)
    p, want = _make_hier_jpeg(img, levels=2, progressive_diff=True)
    assert b"\xff\xc6" in p
    got = decode_jpeg_py(p)
    assert np.array_equal(got, want)


def test_hier_restart_intervals_in_differential_frame():
    img = _img_gray(26, 26, seed=9)
    p, want = _make_hier_jpeg(img, levels=2, restart=2)
    assert b"\xff\xdd" in p
    got = decode_jpeg_py(p)
    assert np.array_equal(got, want)


def test_hier_metadata_reports_dhp_full_size():
    img = _img_gray(21, 17)
    p, _ = _make_hier_jpeg(img, levels=2)
    meta = parse_media_header(p)
    assert meta["width"] == 17 and meta["height"] == 21


def test_hier_hostile_streams():
    img = _img_gray(16, 16)
    p, _ = _make_hier_jpeg(img, levels=2)

    # truncated after frame 1: ends below DHP size
    sof5 = p.find(b"\xff\xc5")
    with pytest.raises(ValueError):
        decode_jpeg_py(p[:sof5] + b"\xff\xd9")
    # duplicate DHP
    dhp = p.find(b"\xff\xde")
    dhp_end = dhp + 2 + int.from_bytes(p[dhp + 2:dhp + 4], "big")
    with pytest.raises(ValueError, match="duplicate DHP"):
        decode_jpeg_py(p[:dhp_end] + p[dhp:])
    # differential frame with no DHP at all
    with pytest.raises(ValueError, match="outside a hierarchical"):
        decode_jpeg_py(p[:dhp] + p[dhp_end:])
    # EXP before any frame
    exp = p.find(b"\xff\xdf")
    exp_seg = p[exp:exp + 5]
    with pytest.raises(ValueError, match="EXP outside"):
        decode_jpeg_py(p[:dhp_end] + exp_seg + p[dhp_end:exp]
                       + p[exp + 5:])
    # bad EXP nibbles
    bad = bytearray(p)
    bad[exp + 4] = 0x22
    with pytest.raises(ValueError, match="bad EXP"):
        decode_jpeg_py(bytes(bad))
    # SOF5 relabeled SOF14 (r14: arithmetic differential frames
    # decode now): Huffman scan bits fed to the QM coder are hostile
    # input — the contract is a controlled outcome, either a
    # ValueError or a well-formed pixel array, never a hang or an
    # uncontrolled exception type
    bad = bytearray(p)
    bad[sof5 + 1] = 0xCE
    try:
        out = decode_jpeg_py(bytes(bad))
        assert out is None or hasattr(out, "shape")
    except ValueError:
        pass
    # second non-differential frame: honest subset
    bad = bytearray(p)
    bad[sof5 + 1] = 0xC0
    with pytest.raises((NotImplementedError, ValueError)):
        decode_jpeg_py(bytes(bad))


def test_hier_lossless_final_gray_is_bit_exact_to_source():
    """The Annex-J headline property: a lossy DCT pyramid topped with
    a differential-lossless (SOF7) frame reconstructs the SOURCE
    image exactly — not just the encoder's prediction."""
    rng = np.random.RandomState(21)
    img = rng.randint(0, 256, (23, 17))       # pure noise, odd dims
    q = np.full((8, 8), 8, dtype=np.int64)    # very lossy levels
    p, want = _make_hier_jpeg(img, levels=2, quant=q,
                              lossless_final=True)
    assert b"\xff\xc7" in p
    got = decode_jpeg_py(p)
    assert np.array_equal(got[..., 0], img)   # source, bit for bit
    assert np.array_equal(got, want)


def test_hier_lossless_final_color_exact():
    rng = np.random.RandomState(22)
    img = np.clip(rng.randint(0, 256, (16, 20, 3)), 0, 255)
    p, want = _make_hier_jpeg(img, levels=2,
                              quant=np.full((8, 8), 6, dtype=np.int64),
                              lossless_final=True)
    got = decode_jpeg_py(p)
    # exact vs the encoder's YCbCr-domain expectation (the RGB source
    # itself differs only by the color-transform roundtrip)
    assert np.array_equal(got, want)
    assert np.mean(np.abs(got.astype(float) - img)) < 2.0


def test_hier_sof7_hostile_scan_headers():
    img = _img_gray(16, 16)
    p, _ = _make_hier_jpeg(img, levels=2, lossless_final=True)
    sof7 = p.find(b"\xff\xc7")
    sos = p.find(b"\xff\xda", sof7)
    ns = p[sos + 4]
    bad = bytearray(p)
    bad[sos + 5 + 2 * ns] = 1                 # Ss=1 in a SOF7 scan
    with pytest.raises(ValueError, match="Ss=0"):
        decode_jpeg_py(bytes(bad))
    bad = bytearray(p)
    bad[sos + 7 + 2 * ns] = 2                 # point transform
    with pytest.raises(NotImplementedError):
        decode_jpeg_py(bytes(bad))


def test_hier_corruption_never_hangs():
    """Byte flips in the entropy/marker stream: bounded failure —
    decode returns an image of the right shape or raises the contract
    errors; never hangs, never escapes with a numpy error."""
    img = _img_gray(16, 16)
    p, _ = _make_hier_jpeg(img, levels=2)
    rng = np.random.RandomState(13)
    sos = p.find(b"\xff\xda")
    for _ in range(40):
        q = bytearray(p)
        i = rng.randint(sos, len(p) - 3)
        q[i] ^= 1 << rng.randint(0, 8)
        try:
            out = decode_jpeg_py(bytes(q))
            assert out is None or out.shape == (16, 16, 1)
        except (ValueError, NotImplementedError):
            pass
