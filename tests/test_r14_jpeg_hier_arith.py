"""Arithmetic-coded hierarchical JPEG (SOF13 differential sequential,
SOF14 differential progressive, SOF15 differential lossless) — the
LAST T.81 frame family, closing the codec matrix (r12 arithmetic
SOF9/SOF10, r13 hierarchical Huffman SOF5/SOF6/SOF7, r14 lossless
arithmetic SOF11 + these).

Mirror encoder: the r13 hierarchical pyramid assembly with the r12 QM
sequential/progressive scan encoders (DC coded directly in
differential frames — prediction cut exactly like the decoder's dfr
flag) and the r14 lossless-arithmetic residual coder for SOF15.  A
lossy arithmetic pyramid topped with a SOF15 frame must reconstruct
the source bit-exactly — the same Annex-J headline property the
Huffman SOF7 tests pin.
"""
from __future__ import annotations

import numpy as np
import pytest

from pipelinedb_spark.operators.jpeg import ZIGZAG, _exp_expand, \
    _ycc_to_rgb, decode_jpeg_py
from pipelinedb_spark.operators.jpegarith import LL_STAT_BINS
from pipelinedb_spark.operators.multimodal import parse_media_header
from test_r12_jpeg_arith import (_QMEncoder, _Stats, _encode_ac_block,
                                 _encode_ac_first, _encode_dc)
from test_r13_jpeg_hier import _fdct_quant, _img_gray, _recon_planes, _seg
from test_r14_jpeg_sof11 import _encode_ll_diff

_COND_DC = {i: (0, 1) for i in range(4)}
_COND_AC = {i: 5 for i in range(4)}


def _sos(nc: int, ss: int, se: int, cids=None) -> bytes:
    body = bytes([nc if cids is None else len(cids)])
    for ci in (range(nc) if cids is None else cids):
        body += bytes([ci + 1, 0x00])
    body += bytes([ss, se, 0])
    return _seg(0xDA, body)


def _arith_seq_scan(comps_q, differential: bool,
                    restart: int = 0) -> bytes:
    """Interleaved sequential arithmetic scan bytes over full-band
    coefficients (1x1 sampling); differential codes DC against 0."""
    zz = ZIGZAG

    def fresh():
        cs = [{"td": 0, "ta": 0, "pred": 0, "dc_ctx": 0}
              for _ in comps_q]
        return _QMEncoder(), _Stats(), cs

    enc, stats, comps = fresh()
    out = bytearray()
    nby, nbx = comps_q[0].shape[:2]
    m = 0
    for by in range(nby):
        for bx in range(nbx):
            if restart and m and m % restart == 0:
                out += enc.flush()
                out += bytes([0xFF, 0xD0 + ((m // restart - 1) % 8)])
                enc, stats, comps = fresh()
            for ci, q in enumerate(comps_q):
                seq = q[by, bx].reshape(64)[zz]
                dc = int(seq[0])
                d = dc if differential else dc - comps[ci]["pred"]
                comps[ci]["pred"] = dc
                _encode_dc(enc, stats, comps[ci], _COND_DC, d)
                _encode_ac_block(enc, stats, comps[ci], _COND_AC, seq)
            m += 1
    out += enc.flush()
    return bytes(out)


def _arith_prog_diff_scans(comps_q) -> bytes:
    """SOF14 scan set: one interleaved DC-only scan (DC coded
    directly — differential), then one full-band AC scan per
    component."""
    zz = ZIGZAG
    nc = len(comps_q)
    nby, nbx = comps_q[0].shape[:2]
    out = bytearray(_sos(nc, 0, 0))
    enc, stats = _QMEncoder(), _Stats()
    comps = [{"td": 0, "ta": 0, "pred": 0, "dc_ctx": 0}
             for _ in comps_q]
    for by in range(nby):
        for bx in range(nbx):
            for ci, q in enumerate(comps_q):
                _encode_dc(enc, stats, comps[ci], _COND_DC,
                           int(q[by, bx].reshape(64)[zz][0]))
    out += enc.flush()
    for ci, q in enumerate(comps_q):
        out += _sos(nc, 1, 63, cids=[ci])
        enc, stats = _QMEncoder(), _Stats()
        comp = {"td": 0, "ta": 0, "pred": 0, "dc_ctx": 0}
        for by in range(nby):
            for bx in range(nbx):
                _encode_ac_first(enc, stats, comp, _COND_AC,
                                 q[by, bx].reshape(64)[zz], 1, 63, 0)
        out += enc.flush()
    return bytes(out)


def _arith_ll_diff_scan(diffs) -> bytes:
    """SOF15 scan bytes: the spatial diffs (mod 2^16) through the
    lossless-arithmetic coder with prediction disabled (every value
    coded against 0), conditioning history per component."""
    h, w = diffs[0].shape
    enc = _QMEncoder()
    st = np.zeros(LL_STAT_BINS, dtype=np.uint8)
    hist = [np.zeros((h, w), dtype=np.uint8) for _ in diffs]
    for y in range(h):
        for x in range(w):
            for dpl, cl in zip(diffs, hist):
                d = int(dpl[y, x])
                if d > 32768:
                    d -= 65536
                ca = int(cl[y, x - 1]) if x else 0
                cb = int(cl[y - 1, x]) if y else 0
                cl[y, x] = _encode_ll_diff(enc, st, ca, cb, 0, 1, d)
    return enc.flush()


def _make_hier_arith_jpeg(img, levels: int = 2, quant=None,
                          progressive_diff: bool = False,
                          restart: int = 0,
                          lossless_final: bool = False):
    """Arithmetic-coded Annex-J pyramid + decoder-exact expected
    pixels — the twin of test_r13_jpeg_hier._make_hier_jpeg with
    QM entropy: SOF9 first frame, EXP(1,1) + SOF13 (or SOF14)
    differential frames, optional SOF15 exact top."""
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

    pyr = [planes]
    for _ in range(levels - 1):
        pyr.append([down(pl) for pl in pyr[-1]])
    pyr.reverse()

    out = bytearray(b"\xff\xd8")
    qbody = bytes([0]) + bytes(int(quant.reshape(64)[z])
                               for z in ZIGZAG)
    out += _seg(0xDB, qbody)
    dhp = bytes([8]) + h0.to_bytes(2, "big") + w0.to_bytes(2, "big") \
        + bytes([nc])
    for ci in range(nc):
        dhp += bytes([ci + 1, 0x11, 0])
    out += _seg(0xDE, dhp)

    def sof(marker, fh, fw):
        body = bytes([8]) + fh.to_bytes(2, "big") \
            + fw.to_bytes(2, "big") + bytes([nc])
        for ci in range(nc):
            body += bytes([ci + 1, 0x11, 0])
        return _seg(marker, body)

    lv = pyr[0]
    fh, fw = lv[0].shape
    out += sof(0xC9, fh, fw)             # SOF9 non-differential
    qs = [_fdct_quant(pl - 128.0, quant) for pl in lv]
    out += _sos(nc, 0, 63)
    out += _arith_seq_scan(qs, differential=False)
    ref = [np.clip(_recon_planes(q, quant, fh, fw) + 128, 0, 255)
           for q in qs]

    for lv in pyr[1:]:
        fh, fw = lv[0].shape
        if restart:
            out += _seg(0xDD, restart.to_bytes(2, "big"))
        out += _seg(0xDF, bytes([0x11]))
        ref = [_exp_expand(pl, 1, 1)[:fh, :fw] for pl in ref]
        qs = [_fdct_quant(src - rf, quant)
              for src, rf in zip(lv, ref)]
        if progressive_diff:
            out += sof(0xCE, fh, fw)     # SOF14
            out += _arith_prog_diff_scans(qs)
        else:
            out += sof(0xCD, fh, fw)     # SOF13
            out += _sos(nc, 0, 63)
            out += _arith_seq_scan(qs, differential=True,
                                   restart=restart)
        ref = [np.clip(rf + _recon_planes(q, quant, fh, fw), 0, 255)
               for rf, q in zip(ref, qs)]

    if lossless_final:
        fh, fw = pyr[-1][0].shape
        out += sof(0xCF, fh, fw)         # SOF15
        srcs = [np.clip(np.round(pl), 0, 255).astype(np.int64)
                for pl in pyr[-1]]
        diffs = [(s - rf.astype(np.int64)) & 0xFFFF
                 for s, rf in zip(srcs, ref)]
        out += _sos(nc, 0, 0)            # Ss=0: predictor disabled
        out += _arith_ll_diff_scan(diffs)
        ref = [np.clip((rf.astype(np.int64) + d) & 0xFFFF, 0, 255)
               for rf, d in zip(ref, diffs)]

    out += b"\xff\xd9"
    if gray:
        expected = ref[0].astype(np.uint8)[..., None]
    else:
        expected = _ycc_to_rgb(ref)
    return bytes(out), expected


# ------------------------------------------------------- roundtrips


def test_hier_arith_gray_two_level_exact():
    img = _img_gray(21, 17)
    p, want = _make_hier_arith_jpeg(img, levels=2)
    assert b"\xff\xc9" in p and b"\xff\xcd" in p
    got = decode_jpeg_py(p)
    assert got.shape == (21, 17, 1)
    assert np.array_equal(got, want)


def test_hier_arith_color_three_level_exact():
    rng = np.random.RandomState(3)
    img = np.clip(rng.randint(0, 256, (30, 22, 3)), 0, 255)
    p, want = _make_hier_arith_jpeg(img, levels=3)
    got = decode_jpeg_py(p)
    assert got.shape == (30, 22, 3)
    assert np.array_equal(got, want)


def test_hier_arith_progressive_differential_exact():
    img = _img_gray(19, 23, seed=5)
    p, want = _make_hier_arith_jpeg(img, levels=2,
                                    progressive_diff=True)
    assert b"\xff\xce" in p
    got = decode_jpeg_py(p)
    assert np.array_equal(got, want)


def test_hier_arith_restart_in_differential_frame():
    img = _img_gray(26, 26, seed=9)
    p, want = _make_hier_arith_jpeg(img, levels=2, restart=2)
    assert b"\xff\xdd" in p
    got = decode_jpeg_py(p)
    assert np.array_equal(got, want)


def test_hier_arith_lossless_final_gray_bit_exact():
    """The Annex-J headline, arithmetic edition: a lossy quantized
    SOF9+SOF13 pyramid topped with a SOF15 frame reconstructs the
    source exactly."""
    img = _img_gray(24, 20, seed=11)
    q = np.full((8, 8), 4, dtype=np.int64)
    q[0, 0] = 2
    p, want = _make_hier_arith_jpeg(img, levels=2, quant=q,
                                    lossless_final=True)
    assert b"\xff\xcf" in p
    got = decode_jpeg_py(p)
    assert np.array_equal(got, want)
    # the encoder codes round(img) (the fixture returns floats)
    assert np.array_equal(
        got[..., 0], np.clip(np.round(img), 0, 255).astype(np.uint8))


def test_hier_arith_lossless_final_color_exact():
    rng = np.random.RandomState(7)
    img = np.clip(rng.randint(0, 256, (14, 11, 3)), 0, 255)
    p, want = _make_hier_arith_jpeg(img, levels=2, quant=np.full(
        (8, 8), 3, dtype=np.int64), lossless_final=True)
    got = decode_jpeg_py(p)
    assert np.array_equal(got, want)


def test_hier_arith_metadata_reports_dhp_size():
    img = _img_gray(21, 17)
    p, _ = _make_hier_arith_jpeg(img, levels=2)
    meta = parse_media_header(p)
    assert meta["width"] == 17 and meta["height"] == 21


def test_hier_lossless_nondifferential_first_frame_arith():
    """Annex J allows a LOSSLESS non-differential first frame (r14 —
    previously gated): a one-level DHP wrapping a SOF11 frame decodes
    to exactly the standalone SOF11 pixels (samples ARE the
    reference)."""
    from test_r14_jpeg_sof11 import _img, _make_sof11
    img = _img(18, 15, seed=4)
    standalone = _make_sof11(img, pred_sel=4)
    want = decode_jpeg_py(standalone)
    dhp = bytes([8]) + (18).to_bytes(2, "big") + (15).to_bytes(2, "big") \
        + bytes([1, 1, 0x11, 0])
    wrapped = b"\xff\xd8" + _seg(0xDE, dhp) + standalone[2:]
    got = decode_jpeg_py(wrapped)
    assert np.array_equal(got, want)


def test_hier_lossless_first_frame_then_differential_dct():
    """Mixed pyramid: SOF3 (Huffman lossless) small first frame, EXP,
    SOF5 differential DCT residual at full size — exact with quant=1
    (the lossless base makes the whole chain integer)."""
    from test_r13_jpeg_hier import _seq_scan
    from test_r8_fixes import _make_lossless_jpeg
    img = _img_gray(20, 16, seed=6)

    def down(pl):
        return pl.reshape(10, 2, 8, 2).mean((1, 3))

    small = np.round(down(np.asarray(img, dtype=np.float64)))
    small = np.clip(small, 0, 255).astype(np.int64)
    inner = _make_lossless_jpeg(small, pred_sel=4)[2:-2]

    quant = np.ones((8, 8), dtype=np.int64)
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0]) + bytes([1] * 64))
    dhp = bytes([8]) + (20).to_bytes(2, "big") \
        + (16).to_bytes(2, "big") + bytes([1, 1, 0x11, 0])
    out += _seg(0xDE, dhp)
    out += inner                          # SOF3 first frame (10x8)
    out += _seg(0xDF, bytes([0x11]))      # EXP both axes
    ref = _exp_expand(small.astype(np.int32), 1, 1)[:20, :16]
    sofb = bytes([8]) + (20).to_bytes(2, "big") \
        + (16).to_bytes(2, "big") + bytes([1, 1, 0x11, 0])
    out += _seg(0xC5, sofb)               # SOF5 differential DCT
    qs = [_fdct_quant(np.asarray(img, dtype=np.float64) - ref, quant)]
    out += _seq_scan(qs, differential=True)
    want = np.clip(ref + _recon_planes(qs[0], quant, 20, 16), 0, 255)
    out += b"\xff\xd9"
    got = decode_jpeg_py(bytes(out))
    assert np.array_equal(got[..., 0], want.astype(np.uint8))


def test_hier_second_nondifferential_frame_restarts_pyramid():
    """Annex J allows later non-differential frames — they REPLACE
    the reference (a pyramid restart, r14): two back-to-back SOF11
    frames inside one DHP decode to the SECOND frame's pixels."""
    from test_r14_jpeg_sof11 import _img, _make_sof11
    a = _make_sof11(_img(16, 16, seed=2))
    b = _make_sof11(_img(16, 16, seed=9))
    dhp = bytes([8]) + (16).to_bytes(2, "big") + (16).to_bytes(2, "big") \
        + bytes([1, 1, 0x11, 0])
    two = b"\xff\xd8" + _seg(0xDE, dhp) + a[2:-2] + b[2:-2] \
        + b"\xff\xd9"
    got = decode_jpeg_py(two)
    assert np.array_equal(got, decode_jpeg_py(b))
    assert not np.array_equal(got, decode_jpeg_py(a))


def test_hier_exp_before_nondifferential_frame_rejected():
    from test_r14_jpeg_sof11 import _img, _make_sof11
    a = _make_sof11(_img(16, 16, seed=2))
    dhp = bytes([8]) + (32).to_bytes(2, "big") + (32).to_bytes(2, "big") \
        + bytes([1, 1, 0x11, 0])
    bad = b"\xff\xd8" + _seg(0xDE, dhp) + a[2:-2] \
        + _seg(0xDF, bytes([0x11])) + a[2:-2] + b"\xff\xd9"
    with pytest.raises(ValueError, match="followed by a differential"):
        decode_jpeg_py(bad)


def test_hier_dct_restart_after_differential_chain_exact():
    """Full restart shape: a 2-level arithmetic pyramid, then a
    non-differential SOF9 frame at the small size REPLACES the
    reference, then EXP + SOF13 builds it back up — the decode must
    equal the mirror fold of the SECOND chain."""
    imgA = _img_gray(20, 16, seed=3)
    imgB = _img_gray(20, 16, seed=12)
    pA, _ = _make_hier_arith_jpeg(imgA, levels=2)
    pB, wantB = _make_hier_arith_jpeg(imgB, levels=2)
    # splice: pyramid A in full, then pyramid B's frames (everything
    # after A's DQT+DHP headers) — one DHP, two chains
    dhp_end = pA.find(b"\xff\xc9")          # first SOF of A
    bodyB = pB[pB.find(b"\xff\xc9"):-2]     # B's frames, no EOI
    spliced = pA[:-2] + bodyB + b"\xff\xd9"
    got = decode_jpeg_py(spliced)
    assert np.array_equal(got, wantB)


def _pad_down(pl):
    ph, pw = pl.shape
    eh, ew = -(-ph // 2) * 2, -(-pw // 2) * 2
    pad = np.pad(pl, ((0, eh - ph), (0, ew - pw)), mode="edge")
    return pad.reshape(eh // 2, 2, ew // 2, 2).mean((1, 3))


def _comp_blocks(planes, samp, mcux, mcuy, quant):
    """Per-component MCU-padded quantized coefficient grids
    (the _build_blocks pipeline over ALREADY level-shifted / residual
    planes)."""
    from pipelinedb_spark.operators.jpeg import _DCT_A
    blocks = []
    for pl, (sh, sv) in zip(planes, samp):
        bw, bh = mcux * sh, mcuy * sv
        pad = np.zeros((bh * 8, bw * 8))
        ph, pw = pl.shape
        pad[:ph, :pw] = pl
        pad[ph:, :pw] = pad[ph - 1:ph, :pw]
        pad[:, pw:] = pad[:, pw - 1:pw]
        blk = pad.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
        coef = np.einsum("ik,yxkl,jl->yxij", _DCT_A, blk, _DCT_A)
        blocks.append(np.round(coef / quant).astype(np.int64))
    return blocks


def _recon_comp(blk, quant, ch, cw):
    from pipelinedb_spark.operators.jpeg import _idct_raw
    bh, bw = blk.shape[:2]
    sp = _idct_raw((blk * quant).reshape(bh * bw, 8, 8)
                   .astype(np.int64))
    return sp.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(
        bh * 8, bw * 8)[:ch, :cw]


def _arith_mcu_scan(blocks, samp, mcux, mcuy,
                    differential: bool) -> bytes:
    """Interleaved sequential arithmetic scan over subsampled MCU
    grids (the _make_arith_jpeg walk, differential-aware)."""
    zz = ZIGZAG
    enc, stats = _QMEncoder(), _Stats()
    comps = [{"td": 0, "ta": 0, "pred": 0, "dc_ctx": 0}
             for _ in blocks]
    for m in range(mcux * mcuy):
        my, mx = divmod(m, mcux)
        for ci, (blk, (sh, sv)) in enumerate(zip(blocks, samp)):
            for by in range(sv):
                for bx in range(sh):
                    seq = blk[my * sv + by,
                              mx * sh + bx].reshape(64)[zz]
                    dc = int(seq[0])
                    d = dc if differential else dc - comps[ci]["pred"]
                    comps[ci]["pred"] = dc
                    _encode_dc(enc, stats, comps[ci], _COND_DC, d)
                    _encode_ac_block(enc, stats, comps[ci], _COND_AC,
                                     seq)
    return enc.flush()


def test_hier_subsampled_420_pyramid_exact():
    """4:2:0 hierarchical pyramid (r14 — the last sampling gate):
    SOF9 first frame + EXP + SOF13 differential, luma 2x2 / chroma
    1x1 throughout; each component's reference lives at ITS extent,
    EXP expands per component, and the final chroma upsamples to the
    DHP canvas.  Decode must equal the mirror's fold bit for bit."""
    rng = np.random.RandomState(5)
    img = np.clip(rng.randint(0, 256, (26, 22, 3)), 0, 255)
    h0, w0 = 26, 22
    quant = np.ones((8, 8), dtype=np.int64)
    arr = img.astype(np.float64)
    r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
    samp = [(2, 2), (1, 1), (1, 1)]
    # per-component full-resolution sources (chroma at half res)
    srcs0 = [y, _pad_down(cb), _pad_down(cr)]
    # level-1 sources: everything halved once more
    srcs1 = [_pad_down(pl) for pl in srcs0]
    h1, w1 = -(-h0 // 2), -(-w0 // 2)

    def exts(fh, fw):
        return [(-(-fh * sv // 2), -(-fw * sh // 2))
                for sh, sv in samp]

    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0]) + bytes([1] * 64))
    dhp = bytes([8]) + h0.to_bytes(2, "big") + w0.to_bytes(2, "big") \
        + bytes([3])
    for ci, (sh, sv) in enumerate(samp):
        dhp += bytes([ci + 1, (sh << 4) | sv, 0])
    out += _seg(0xDE, dhp)

    def sof(marker, fh, fw):
        body = bytes([8]) + fh.to_bytes(2, "big") \
            + fw.to_bytes(2, "big") + bytes([3])
        for ci, (sh, sv) in enumerate(samp):
            body += bytes([ci + 1, (sh << 4) | sv, 0])
        return _seg(marker, body)

    # frame 1: SOF9 at (h1, w1)
    mcux, mcuy = -(-w1 // 16), -(-h1 // 16)
    blocks = _comp_blocks([pl - 128.0 for pl in srcs1], samp,
                          mcux, mcuy, quant)
    out += sof(0xC9, h1, w1)
    out += _sos(3, 0, 63)
    out += _arith_mcu_scan(blocks, samp, mcux, mcuy,
                           differential=False)
    ref = [np.clip(_recon_comp(bk, quant, ch, cw) + 128, 0, 255)
           for bk, (ch, cw) in zip(blocks, exts(h1, w1))]

    # EXP + frame 2: SOF13 at (h0, w0)
    out += _seg(0xDF, bytes([0x11]))
    ref = [_exp_expand(pl, 1, 1)[:ch, :cw]
           for pl, (ch, cw) in zip(ref, exts(h0, w0))]
    mcux, mcuy = -(-w0 // 16), -(-h0 // 16)
    resid = [s - rf for s, rf in zip(srcs0, ref)]
    blocks = _comp_blocks(resid, samp, mcux, mcuy, quant)
    out += sof(0xCD, h0, w0)
    out += _sos(3, 0, 63)
    out += _arith_mcu_scan(blocks, samp, mcux, mcuy,
                           differential=True)
    ref = [np.clip(rf + _recon_comp(bk, quant, ch, cw), 0, 255)
           for rf, bk, (ch, cw) in zip(ref, blocks, exts(h0, w0))]
    out += b"\xff\xd9"

    # expected: chroma upsamples 2x2 to the DHP canvas, then YCC->RGB
    up = [ref[0]] + [pl.repeat(2, axis=0).repeat(2, axis=1)[:h0, :w0]
                     for pl in ref[1:]]
    want = _ycc_to_rgb(up)
    got = decode_jpeg_py(bytes(out))
    assert got.shape == (26, 22, 3)
    assert np.array_equal(got, want)


def test_hier_sampling_change_mid_pyramid_rejected():
    """A frame that silently changes a component's sampling would be
    truncated into garbage — the per-component alignment check must
    reject it instead."""
    rng = np.random.RandomState(1)
    img = np.clip(rng.randint(0, 256, (16, 16, 3)), 0, 255)
    p, _ = _make_hier_arith_jpeg(img, levels=2)   # all-1x1 color
    q = bytearray(p)
    sof13 = bytes(q).find(b"\xff\xcd")
    # luma flips to 2x2: the chroma extents halve while their
    # references stayed full-resolution -> slack > 1
    q[sof13 + 11] = 0x22
    with pytest.raises(ValueError, match="align"):
        decode_jpeg_py(bytes(q))


def test_hier_12bit_pyramid_exact():
    """12-bit hierarchical pyramid (r14 — previously gated): SOF0
    first frame + EXP + SOF5 differential + SOF7 lossless top, all at
    precision 12 (level shift 2048, clamp 4095, Pq=1 quant table);
    the lossless top reconstructs the 12-bit source exactly and the
    output honors the >>4 uint8 contract."""
    from test_r13_jpeg_hier import (_lossless_diff_scan, _seq_scan)
    rng = np.random.RandomState(8)
    img = rng.randint(0, 4096, (20, 16)).astype(np.int64)

    def down(pl):
        return pl.reshape(10, 2, 8, 2).mean((1, 3))

    quant = np.ones((8, 8), dtype=np.int64)
    out = bytearray(b"\xff\xd8")
    qbody = bytes([0x10]) + b"".join(            # Pq=1: 16-bit entries
        int(quant.reshape(64)[z]).to_bytes(2, "big") for z in ZIGZAG)
    out += _seg(0xDB, qbody)
    dhp = bytes([12]) + (20).to_bytes(2, "big") \
        + (16).to_bytes(2, "big") + bytes([1, 1, 0x11, 0])
    out += _seg(0xDE, dhp)

    def sof(marker, fh, fw):
        return _seg(marker, bytes([12]) + fh.to_bytes(2, "big")
                    + fw.to_bytes(2, "big") + bytes([1, 1, 0x11, 0]))

    small = down(img.astype(np.float64))
    out += sof(0xC0, 10, 8)
    qs = [_fdct_quant(small - 2048.0, quant)]
    out += _seq_scan(qs, differential=False)
    ref = np.clip(_recon_planes(qs[0], quant, 10, 8) + 2048, 0, 4095)

    out += _seg(0xDF, bytes([0x11]))
    ref = _exp_expand(ref, 1, 1)[:20, :16]
    out += sof(0xC5, 20, 16)
    qs2 = [_fdct_quant(img - ref, quant)]
    out += _seq_scan(qs2, differential=True)
    ref = np.clip(ref + _recon_planes(qs2[0], quant, 20, 16), 0, 4095)

    out += sof(0xC7, 20, 16)                      # SOF7 exact top
    diffs = [(img - ref.astype(np.int64)) & 0xFFFF]
    out += _lossless_diff_scan(diffs)
    out += b"\xff\xd9"

    got = decode_jpeg_py(bytes(out))
    assert got.shape == (20, 16, 1)
    assert np.array_equal(got[..., 0], (img >> 4).astype(np.uint8))


def test_hier_precision_mismatch_gated():
    from test_r13_jpeg_hier import _seq_scan
    img = _img_gray(16, 16)
    p, _ = _make_hier_arith_jpeg(img, levels=2)
    # relabel the DHP as 12-bit: the 8-bit SOF9 frame now mismatches
    dhp = p.find(b"\xff\xde")
    q = bytearray(p)
    q[dhp + 4] = 12
    with pytest.raises(NotImplementedError, match="8-bit frame"):
        decode_jpeg_py(bytes(q))


def test_hier_arith_hostile_streams():
    img = _img_gray(16, 16)
    p, _ = _make_hier_arith_jpeg(img, levels=2)

    # truncated after frame 1: ends below DHP size
    sof13 = p.find(b"\xff\xcd")
    with pytest.raises(ValueError):
        decode_jpeg_py(p[:sof13] + b"\xff\xd9")
    # differential frame first (no non-differential frame yet)
    dhp = p.find(b"\xff\xde")
    dhp_end = dhp + 2 + int.from_bytes(p[dhp + 2:dhp + 4], "big")
    sof9 = p.find(b"\xff\xc9")
    with pytest.raises(ValueError, match="before any"):
        decode_jpeg_py(p[:sof9] + p[sof13:])
    # corruption fuzz: controlled outcomes only, never a hang
    rng = np.random.RandomState(0)
    sos = p.find(b"\xff\xda")
    for _ in range(40):
        q = bytearray(p)
        i = rng.randint(sos + 8, len(q) - 2)
        q[i] ^= 1 << rng.randint(0, 8)
        try:
            decode_jpeg_py(bytes(q))
        except (ValueError, NotImplementedError):
            pass
