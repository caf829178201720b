"""Baseline JPEG decode, dependency-free (numpy + pure Python).

JPEG was the last codec-gated format in the multimodal path: unlike
PNG (stdlib zlib) it needs a real entropy decoder and transform —
Huffman-coded DCT coefficients per 8×8 block, dequantization, inverse
DCT, chroma upsampling and YCbCr→RGB.  All of that is standard public
spec material (ITU-T T.81): marker segments (DQT/SOF0/DHT/SOS/DRI),
magnitude-category coding, zig-zag order, and the Annex-K flow.

Scope (the corpus-dominant profiles): baseline sequential DCT (SOF0,
single- or multi-scan) AND progressive DCT (SOF2: spectral selection +
successive approximation per T.81 Annex G — interleaved/non-interleaved
DC scans, per-component AC band scans with EOB runs, DC/AC refinement
scans with correction bits), 8- or 12-bit samples (12-bit scales down
to the uint8 pixel contract), Huffman coding, 1 or 3 components, any
sampling factors (4:4:4 / 4:2:2 / 4:2:0), restart intervals,
lossless sequential (SOF3, T.81 Annex H: predictors 1-7, point
transform, 2-16-bit precision, modulo-2^16 reconstruction), AND
sequential AND progressive ARITHMETIC coding (SOF9/SOF10 + DAC
conditioning, r12 — the Annex D QM-coder and Annex F/G statistical
models live in jpegarith.py), AND hierarchical coding (r13, T.81
Annex J: DHP frame pyramid, EXP reference expansion with the
normative J.1.1.2 interpolation, differential Huffman frames
SOF5/SOF6 with DC prediction disabled and level-shift-free IDCT,
differential lossless SOF7 with predictor 0 and modulo-2^16
reconstruction — a pyramid ending in SOF7 is losslessly exact;
1x1-sampled 8-bit, first frame non-differential), AND lossless
ARITHMETIC (SOF11, r14: Annex-H prediction with the two-dimensional
Da×Db conditioning of the Annex F/G entropy layer, in jpegarith.py),
AND the arithmetic DIFFERENTIAL frames (SOF13/SOF14/SOF15, r14 —
the QM scans with DC prediction cut via the dfr flag), completing
every T.81 frame type.  Pyramids may be subsampled (per-component
references at their own extents, per-component EXP, final upsample
to the DHP canvas — r14), 8- or 12-bit, opened by a DCT or LOSSLESS
non-differential frame (SOF3/SOF11 — samples become the reference),
and may contain later non-differential frames (pyramid restarts:
the reference is replaced).  The one remaining honest constraint is
a single precision and sampling geometry per pyramid — mixed frames
are rejected with clear errors, because silent truncation would
corrupt conforming-looking output; the Pillow backend
(multimodal.decode_pixels backend='pil') covers those where
installed.

The hot path is vectorized where it matters: the IDCT is one
einsum over ALL blocks of a component (separable orthonormal DCT-II
matrix), and upsampling/color transform are whole-plane numpy ops.
Only the entropy decode is sequential by nature (bit-serial Huffman).
"""

from __future__ import annotations

import numpy as np

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int32)

# orthonormal 8-point DCT-II basis: A[k, n] = c(k) cos((2n+1)kπ/16)
_DCT_A = np.array([[(np.sqrt(1 / 8) if k == 0 else 0.5)
                    * np.cos((2 * n + 1) * k * np.pi / 16)
                    for n in range(8)] for k in range(8)])


def _idct_raw(coefs: np.ndarray) -> np.ndarray:
    """(n, 8, 8) dequantized blocks → rounded spatial values with NO
    level shift and NO clipping — the differential-frame IDCT (T.81
    J.1.1: hierarchical differential frames omit the level shift; the
    sum with the reference is clamped instead)."""
    return np.round(np.einsum("ki,nkl,lj->nij", _DCT_A, coefs, _DCT_A,
                              optimize=True)).astype(np.int32)


def _exp_expand(plane: np.ndarray, eh: int, ev: int) -> np.ndarray:
    """T.81 J.1.1.2 reference-grid expansion: ×2 per flagged axis.
    Even output samples copy the input; odd samples are the rounded
    mean of the two neighbors ((a + b + 1) >> 1); the final odd sample
    replicates the edge.  This filter is NORMATIVE (decoder-side), so
    the mirror encoder in tests uses the identical arithmetic."""
    p = plane.astype(np.int32)
    if ev:
        out = np.empty((p.shape[0] * 2, p.shape[1]), np.int32)
        out[0::2] = p
        out[1:-1:2] = (p[:-1] + p[1:] + 1) >> 1
        out[-1] = p[-1]
        p = out
    if eh:
        out = np.empty((p.shape[0], p.shape[1] * 2), np.int32)
        out[:, 0::2] = p
        out[:, 1:-1:2] = (p[:, :-1] + p[:, 1:] + 1) >> 1
        out[:, -1] = p[:, -1]
        p = out
    return p


def idct_blocks(coefs: np.ndarray, precision: int = 8) -> np.ndarray:
    """(n, 8, 8) dequantized coefficient blocks → (n, 8, 8) spatial
    samples (level-shifted +2^(P−1), clipped to [0, 2^P−1]).  One
    einsum for all blocks — no per-block Python loop."""
    spatial = np.einsum("ki,nkl,lj->nij", _DCT_A, coefs, _DCT_A,
                        optimize=True)
    shift = 1 << (precision - 1)
    out = np.clip(np.round(spatial + shift), 0, (1 << precision) - 1)
    return out.astype(np.uint8 if precision == 8 else np.int32)


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with JPEG
    byte-stuffing (0xFF 0x00 → literal 0xFF) and RSTn handling."""

    __slots__ = ("data", "pos", "acc", "bits")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.bits = 0

    def _fill(self) -> None:
        d = self.data
        while self.bits <= 24:
            if self.pos >= len(d):
                self.acc = (self.acc << 8) & 0xFFFFFFFF
                self.bits += 8  # pad past EOF (trailing EOB garbage)
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                else:
                    # any real marker ends the entropy segment: pad —
                    # RSTn is consumed by align_restart(); scan-
                    # terminating markers (DHT/SOS/EOI/…) are located
                    # by re-scanning the byte stream after decode
                    self.acc = (self.acc << 8) & 0xFFFFFFFF
                    self.bits += 8
                    continue
            else:
                self.pos += 1
            self.acc = ((self.acc << 8) | b) & 0xFFFFFFFF
            self.bits += 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.bits < n:
            self._fill()
        self.bits -= n
        v = (self.acc >> self.bits) & ((1 << n) - 1)
        return v

    def align_restart(self) -> None:
        """Drop buffered bits and consume an RSTn marker."""
        self.acc = self.bits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected restart marker")


class _Huff:
    """Canonical JPEG Huffman table → (maxcode/valptr) decode per
    T.81 §F.2.2.3, plus a fast 8-bit lookup for short codes."""

    def __init__(self, bits: list[int], vals: bytes):
        if sum(bits) > len(vals):
            # hostile DHT: more codes declared than values supplied —
            # must be the contract's ValueError, not an IndexError
            # escaping from the prefix-LUT build (r13 hierarchical
            # fuzz finding; reachable from any corrupt Huffman stream)
            raise ValueError(
                f"DHT declares {sum(bits)} codes but carries "
                f"{len(vals)} values")
        self.vals = vals
        code = 0
        k = 0
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        # fast path: codes ≤ 8 bits resolved with one 8-bit peek
        self.lut = np.full(256, -1, dtype=np.int32)
        self.lut_len = np.zeros(256, dtype=np.int8)
        for ln in range(1, 17):
            n = bits[ln - 1]
            self.valptr[ln] = k
            self.mincode[ln] = code
            if n:
                if ln <= 8:
                    for i in range(n):
                        pref = (code + i) << (8 - ln)
                        self.lut[pref:pref + (1 << (8 - ln))] = vals[k + i]
                        self.lut_len[pref:pref + (1 << (8 - ln))] = ln
                code += n
                k += n
            self.maxcode[ln] = code - 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        if br.bits < 16:
            br._fill()
        peek = (br.acc >> (br.bits - 8)) & 0xFF
        ln = self.lut_len[peek]
        if ln:
            br.bits -= int(ln)
            return int(self.lut[peek])
        code = br.read(8)
        ln = 8
        while ln < 16:
            code = (code << 1) | br.read(1)
            ln += 1
            if code <= self.maxcode[ln]:
                return self.vals[self.valptr[ln] + code - self.mincode[ln]]
        raise ValueError("invalid Huffman code in scan")


def _extend(v: int, t: int) -> int:
    """Magnitude-category sign extension (T.81 F.2.2.1 EXTEND)."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def _next_marker(p: bytes, start: int) -> int:
    """Position of the first real marker (not a stuffed 0xFF00, not
    RSTn) at or after ``start`` — how scan boundaries are located."""
    j = start
    n = len(p)
    while j + 1 < n:
        if p[j] == 0xFF and p[j + 1] != 0x00 \
                and not (0xD0 <= p[j + 1] <= 0xD7):
            return j
        j += 1
    return n


def decode_jpeg_py(p: bytes):
    """Baseline, progressive, lossless (SOF3 Huffman / SOF11
    arithmetic), arithmetic DCT (SOF9/SOF10), or hierarchical
    (Annex J: DHP + EXP + differential frames, Huffman SOF5/SOF6/SOF7
    or arithmetic SOF13/SOF14/SOF15, subsampled or 1x1, 8/12-bit,
    incl. pyramid restarts) JPEG →
    (h, w, c) uint8 array (c = 1 gray, 3 RGB; >8-bit precision scales
    down).  Returns None when the payload is not a JPEG; the only
    NotImplementedError gate left is mixed precision/sampling inside
    one DHP pyramid."""
    if p[:2] != b"\xff\xd8":
        return None
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huff] = {}
    huff_ac: dict[int, _Huff] = {}
    comps: list[dict] = []
    h = w = None
    restart_interval = 0
    progressive = False
    lossless = False
    arith = False
    arith_cond = None
    precision = 8
    scan_seen = False
    mcux = mcuy = 0
    # hierarchical (T.81 Annex J) state: DHP header, per-component
    # reference reconstruction, and the EXP expansion pending for the
    # next frame
    hier: dict | None = None
    ref: dict | None = None
    differential = False
    pending_exp: tuple[int, int] | None = None
    i = 2

    def finish_hier_frame() -> None:
        """Fold the just-decoded frame into the hierarchical reference
        reconstruction (T.81 J.1.1): non-differential frames rebuild
        it (IDCT + level shift 2^(P-1)), differential frames add their
        level-shift-free IDCT output to it; both clamp to
        [0, 2^P - 1] (P = the DHP precision, 8 or 12 — r14)."""
        nonlocal ref
        mx = (1 << hier["prec"]) - 1
        missing = [c["id"] for c in comps if not c["dc_done"]]
        if missing:
            raise ValueError(
                f"JPEG scan coverage incomplete: component(s) "
                f"{missing} never received a DC scan")
        if lossless:
            if not differential:
                # lossless NON-differential first frame (SOF3/SOF11
                # opening a DHP sequence, r14): the decoded samples
                # ARE the reference (J.1.1 — no IDCT, no level shift;
                # << Pt lands in [0, 2^P - 1] on conforming streams)
                ref = {c["id"]: np.clip(c["sam"] << c["pt"],
                                        0, mx).astype(np.int32)
                       for c in comps}
                return
            # differential lossless (SOF7/SOF15): samples ARE the
            # spatial diffs; modulo-2^16 addition reconstructs
            # exactly (the clip only bites on nonconforming streams)
            for c in comps:
                ref[c["id"]] = np.clip(
                    (ref[c["id"]].astype(np.int64) + c["sam"])
                    & 0xFFFF, 0, mx).astype(np.int32)
            return
        planes = {}
        hmax_f = max(c["h"] for c in comps)
        vmax_f = max(c["v"] for c in comps)
        for c in comps:
            # per-frame quant snapshot (stashed at the component's
            # first scan): hierarchical frames are folded lazily at
            # the NEXT SOF/EOI, and a DQT between frames — legal per
            # T.81 and normal in multi-frame pyramids — must apply to
            # the frame that FOLLOWS it, not retroactively to this one
            deq = c["coef"] * c["qtbl"][None, :, :]
            sp = _idct_raw(deq)
            bh, bw = c["bh"], c["bw"]
            # crop to the COMPONENT's extent (subsampled pyramids,
            # r14): ceil(dim·sf/sfmax), not the frame dims
            ch_ = -(-(h * c["v"]) // vmax_f)
            cw_ = -(-(w * c["h"]) // hmax_f)
            planes[c["id"]] = sp.reshape(bh, bw, 8, 8).transpose(
                0, 2, 1, 3).reshape(bh * 8, bw * 8)[:ch_, :cw_]
        if differential:
            for cid, pl in planes.items():
                ref[cid] = np.clip(ref[cid] + pl, 0, mx)
        else:
            level = 1 << (hier["prec"] - 1)
            ref = {cid: np.clip(pl + level, 0, mx)
                   for cid, pl in planes.items()}
    while i + 4 <= len(p):
        if p[i] != 0xFF:
            i += 1
            continue
        marker = p[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:  # EOI
            break
        seg_len = int.from_bytes(p[i + 2:i + 4], "big")
        body = p[i + 4:i + 2 + seg_len]
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(body):
                prec, tid = body[j] >> 4, body[j] & 0x0F
                tbl = np.zeros(64, dtype=np.int32)
                if prec:   # 16-bit entries (12-bit sample precision)
                    tbl[ZIGZAG] = np.frombuffer(
                        body, ">u2", 64, j + 1).astype(np.int32)
                    j += 129
                else:
                    tbl[ZIGZAG] = np.frombuffer(body, np.uint8, 64,
                                                j + 1)
                    j += 65
                qt[tid] = tbl.reshape(8, 8)
        elif marker in (0xC0, 0xC1, 0xC2, 0xC9, 0xCA):
            # SOF0/1 baseline, SOF2 progressive, SOF9/SOF10
            # arithmetic sequential/progressive (entropy decode in
            # jpegarith.py, r12)
            if hier is not None:
                # Annex J allows later non-differential frames: they
                # REPLACE the reference (a pyramid restart) — r14,
                # closing the last structural gate.  An EXP must be
                # followed by a differential frame (J.1), and a frame
                # header without any scan is malformed.
                if pending_exp is not None:
                    raise ValueError(
                        "EXP must be followed by a differential frame")
                if scan_seen:
                    finish_hier_frame()   # fold the previous frame
                    comps = []
                    scan_seen = False
                elif comps:
                    raise ValueError(
                        "hierarchical frame with no scans")
            progressive = marker in (0xC2, 0xCA)
            arith = marker in (0xC9, 0xCA)
            differential = False
            lossless = False   # a DCT restart after a lossless frame
            if len(body) < 6:
                raise ValueError("truncated SOF header")
            if body[0] not in (8, 12):  # T.81: DCT modes are 8/12-bit
                raise NotImplementedError(f"{body[0]}-bit DCT JPEG")
            if hier is not None and body[0] != hier["prec"]:
                raise NotImplementedError(
                    f"{body[0]}-bit frame in a {hier['prec']}-bit "
                    "hierarchical JPEG")
            precision = body[0]
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            # allocation guard: coefficient arrays are sized by the
            # declared dimensions; a hostile header must raise (→
            # null row upstream) before any allocation, since an
            # executor OOM cannot be caught
            if w < 1 or h < 1 or w * h > 64 * 1024 * 1024:
                raise ValueError(f"implausible JPEG dimensions {w}x{h}")
            if hier is not None and (h > hier["h"] or w > hier["w"]):
                raise ValueError(
                    f"hierarchical frame {w}x{h} exceeds DHP size "
                    f"{hier['w']}x{hier['h']}")
            nc = body[5]
            if nc not in (1, 3):
                raise NotImplementedError(f"{nc}-component JPEG")
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                if not (1 <= hv >> 4 <= 4 and 1 <= (hv & 0x0F) <= 4):
                    raise ValueError(
                        f"invalid JPEG sampling factors 0x{hv:02x}")
                if hier is not None and cid not in hier["ids"]:
                    raise ValueError(
                        f"frame component {cid} not declared in DHP")
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq, "dc_done": False})
        elif marker in (0xC3, 0xCB):
            # SOF3: lossless sequential, Huffman (Annex H); SOF11:
            # lossless sequential, arithmetic (Annex H prediction,
            # Annex F/G entropy — decode in jpegarith.py, r14).
            # Inside a DHP sequence this is an Annex-J lossless
            # NON-differential frame (r14): first frame or a pyramid
            # restart — either way the decoded samples REPLACE the
            # reference (same rules as the DCT branch above)
            if hier is not None:
                if pending_exp is not None:
                    raise ValueError(
                        "EXP must be followed by a differential frame")
                if scan_seen:
                    finish_hier_frame()   # fold the previous frame
                    comps = []
                    scan_seen = False
                elif comps:
                    raise ValueError(
                        "hierarchical frame with no scans")
            lossless = True
            arith = marker == 0xCB
            progressive = False
            differential = False   # restart after a differential frame
            if len(body) < 6:
                raise ValueError("truncated SOF header")
            precision = body[0]
            if not 2 <= precision <= 16:
                raise ValueError(f"bad lossless precision {precision}")
            if hier is not None and precision != hier["prec"]:
                raise NotImplementedError(
                    f"{precision}-bit frame in a {hier['prec']}-bit "
                    "hierarchical JPEG")
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            if w < 1 or h < 1 or w * h > 64 * 1024 * 1024:
                raise ValueError(f"implausible JPEG dimensions {w}x{h}")
            if hier is not None and (h > hier["h"] or w > hier["w"]):
                raise ValueError(
                    f"hierarchical frame {w}x{h} exceeds DHP size "
                    f"{hier['w']}x{hier['h']}")
            nc = body[5]
            if nc not in (1, 3):
                raise NotImplementedError(f"{nc}-component JPEG")
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                if nc > 1 and hv != 0x11:
                    raise NotImplementedError(
                        "subsampled lossless JPEG (all-1x1 only)")
                if hier is not None and cid not in hier["ids"]:
                    raise ValueError(
                        f"frame component {cid} not declared in DHP")
                comps.append({"id": cid, "h": 1, "v": 1, "tq": tq,
                              "dc_done": False})
        elif marker in (0xC5, 0xC6, 0xC7, 0xCD, 0xCE, 0xCF):
            # differential frames (Annex J): sequential DCT
            # (SOF5/SOF13) / progressive DCT (SOF6/SOF14) over the
            # difference between the source and the (possibly
            # EXP-expanded) reference reconstruction, or differential
            # LOSSLESS (SOF7/SOF15: coding of the spatial difference
            # with prediction disabled and modulo-2^16 reconstruction
            # — a pyramid ending in one is losslessly exact).
            # SOF5-7 are Huffman-coded, SOF13-15 arithmetic (r14 —
            # the final T.81 frame family; entropy in jpegarith.py
            # with DC prediction cut via the dfr flag)
            if hier is None:
                raise ValueError(
                    f"JPEG SOF{marker - 0xC0}: differential frame "
                    "outside a hierarchical (DHP) sequence")
            if not scan_seen:
                raise ValueError(
                    "differential frame before any non-differential "
                    "frame")
            finish_hier_frame()      # fold the previous frame
            comps = []
            scan_seen = False
            progressive = marker in (0xC6, 0xCE)
            lossless = marker in (0xC7, 0xCF)
            arith = marker >= 0xCD
            differential = True
            if len(body) < 6:
                raise ValueError("truncated SOF header")
            if body[0] != hier["prec"]:
                raise NotImplementedError(
                    f"{body[0]}-bit frame in a {hier['prec']}-bit "
                    "hierarchical JPEG")
            precision = body[0]
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            if w < 1 or h < 1 or w * h > 64 * 1024 * 1024:
                raise ValueError(f"implausible JPEG dimensions {w}x{h}")
            if h > hier["h"] or w > hier["w"]:
                raise ValueError(
                    f"hierarchical frame {w}x{h} exceeds DHP size "
                    f"{hier['w']}x{hier['h']}")
            nc = body[5]
            if nc != len(hier["ids"]) or len(body) < 6 + 3 * nc:
                raise NotImplementedError(
                    "hierarchical frame over a component subset")
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                if not (1 <= hv >> 4 <= 4 and 1 <= (hv & 0x0F) <= 4):
                    raise ValueError(
                        f"invalid JPEG sampling factors 0x{hv:02x}")
                if lossless and hv != 0x11:
                    raise NotImplementedError(
                        "subsampled differential lossless frame")
                if cid not in ref:
                    raise ValueError(
                        f"differential frame component {cid} has no "
                        "reference")
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq, "dc_done": False, "dfr": True})
            # per-component reference alignment (r14 — subsampled
            # pyramids): each component's reference lives at ITS
            # extent ceil(dim·sf/sfmax); the full-resolution
            # component keeps the strict J.1.1.2 2p/2p-1 EXP size
            # rule, subsampled ones need the expansion to COVER
            # their extent (ceil halving makes the odd-axis rule
            # per-component ambiguous) and are cropped to it
            hmax_f = max(cc["h"] for cc in comps)
            vmax_f = max(cc["v"] for cc in comps)

            def _ext(cc):
                return (-(-(h * cc["v"]) // vmax_f),
                        -(-(w * cc["h"]) // hmax_f))
            full = next((cc for cc in comps
                         if cc["h"] == hmax_f and cc["v"] == vmax_f),
                        None)
            if full is None:
                # e.g. (2,1)+(1,2): no component is full-resolution
                # on BOTH axes, so the J.1.1.2 size rule has no
                # anchor — gate loudly (a StopIteration here would
                # escape the decoder's error contract)
                raise NotImplementedError(
                    "mixed-axis sampling in hierarchical frames")
            ph, pw = ref[full["id"]].shape
            if pending_exp is not None:
                eh_, ev_ = pending_exp
                ok_h = h in ((2 * ph, 2 * ph - 1) if ev_ else (ph,))
                ok_w = w in ((2 * pw, 2 * pw - 1) if eh_ else (pw,))
                if not (ok_h and ok_w):
                    raise ValueError(
                        f"EXP-expanded reference "
                        f"{2 * pw if eh_ else pw}x"
                        f"{2 * ph if ev_ else ph} does not cover "
                        f"frame {w}x{h}")
                ref = {cid: _exp_expand(pl, eh_, ev_)
                       for cid, pl in ref.items()}
                pending_exp = None
            elif (h, w) != (ph, pw):
                raise ValueError(
                    f"differential frame {w}x{h} mismatches "
                    f"reference {pw}x{ph} (no EXP)")
            for cc in comps:
                ch_, cw_ = _ext(cc)
                pl = ref[cc["id"]]
                # slack ≤ 1 per axis (the ceil-halving wobble of odd
                # dimensions); more means the frame tried to change a
                # component's sampling mid-pyramid, which truncation
                # would corrupt silently
                if not (0 <= pl.shape[0] - ch_ <= 1
                        and 0 <= pl.shape[1] - cw_ <= 1):
                    raise ValueError(
                        f"reference {pl.shape[1]}x{pl.shape[0]} does "
                        f"not align with component {cc['id']} extent "
                        f"{cw_}x{ch_}")
                ref[cc["id"]] = pl[:ch_, :cw_]
        elif marker == 0xDE:  # DHP: hierarchical progression (Annex J)
            if hier is not None:
                raise ValueError("duplicate DHP marker")
            if comps:
                raise ValueError("DHP after a frame header")
            if len(body) < 6:
                raise ValueError("truncated DHP header")
            if body[0] not in (8, 12):
                raise NotImplementedError(
                    f"{body[0]}-bit hierarchical JPEG")
            fh = int.from_bytes(body[1:3], "big")
            fw = int.from_bytes(body[3:5], "big")
            if fw < 1 or fh < 1 or fw * fh > 64 * 1024 * 1024:
                raise ValueError(
                    f"implausible JPEG dimensions {fw}x{fh}")
            nc = body[5]
            if nc not in (1, 3):
                raise NotImplementedError(f"{nc}-component JPEG")
            if len(body) < 6 + 3 * nc:
                raise ValueError("truncated DHP header")
            hier = {"h": fh, "w": fw, "prec": body[0],
                    "ids": [body[6 + 3 * c] for c in range(nc)]}
        elif marker == 0xDF:  # EXP: expand reference before next frame
            if hier is None or not scan_seen:
                raise ValueError(
                    "EXP outside a hierarchical frame sequence")
            if len(body) < 1:
                raise ValueError("truncated EXP segment")
            eh_, ev_ = body[0] >> 4, body[0] & 0x0F
            if eh_ > 1 or ev_ > 1 or (eh_ == 0 and ev_ == 0):
                raise ValueError(f"bad EXP expansion 0x{body[0]:02x}")
            if pending_exp is not None:
                raise ValueError(
                    "consecutive EXP segments without a differential "
                    "frame between them")
            pending_exp = (eh_, ev_)
        elif marker == 0xCC:  # DAC: arithmetic conditioning
            from pipelinedb_spark.operators.jpegarith import \
                ArithConditioning
            if arith_cond is None:
                arith_cond = ArithConditioning()
            arith_cond.set_from_dac(body)
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(body):
                cls, tid = body[j] >> 4, body[j] & 0x0F
                bits = list(body[j + 1:j + 17])
                n = sum(bits)
                tbl = _Huff(bits, bytes(body[j + 17:j + 17 + n]))
                (huff_dc if cls == 0 else huff_ac)[tid] = tbl
                j += 17 + n
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(body[0:2], "big")
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if w is None:
                raise ValueError("SOS before SOF")
            # fuzz (r9): a bogus length field can slice body short of
            # the ns-sized header it declares — every index below
            # must be inside it, and an unknown component id must be
            # a controlled error, not a StopIteration
            if len(body) < 1 or len(body) < 4 + 2 * body[0]:
                raise ValueError("truncated SOS header")
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tt = body[1 + 2 * c], body[2 + 2 * c]
                comp = next((cc for cc in comps if cc["id"] == cs),
                            None)
                if comp is None:
                    raise ValueError(
                        f"SOS references unknown component {cs}")
                comp["td"], comp["ta"] = tt >> 4, tt & 0x0F
                scan.append(comp)
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 0x0F
            if lossless:
                # Annex H reuses the scan header: Ss = predictor
                # selector, Al = point transform.  Differential
                # lossless frames (SOF7) disable prediction entirely
                # — T.81 marks them with Ss = 0.
                if differential:
                    if ss != 0:
                        raise ValueError(
                            f"differential lossless scan must have "
                            f"Ss=0, got {ss}")
                    if al != 0:
                        raise NotImplementedError(
                            "point transform in differential "
                            "lossless frames")
                elif not 1 <= ss <= 7:
                    raise ValueError(f"bad lossless predictor {ss}")
                if al >= precision:
                    raise ValueError("point transform >= precision")
                if not scan_seen:
                    for c in comps:
                        c["sam"] = np.zeros((h, w), dtype=np.int64)
                        c["pt"] = al
                    scan_seen = True
                for c in scan:
                    c["dc_done"] = True
                if arith:  # SOF11 standalone / SOF15 differential
                    from pipelinedb_spark.operators.jpegarith import (
                        ArithConditioning, decode_arith_lossless_scan)
                    if arith_cond is None:
                        arith_cond = ArithConditioning()
                    decode_arith_lossless_scan(
                        p, i + 2 + seg_len, scan, arith_cond,
                        restart_interval, ss, al, precision, w, h,
                        differential=differential)
                else:
                    _decode_lossless_scan(p, i + 2 + seg_len, scan,
                                          huff_dc, restart_interval,
                                          ss, al, precision, w, h,
                                          differential=differential)
                i = _next_marker(p, i + 2 + seg_len)
                continue
            if not progressive:
                ss, se, ah, al = 0, 63, 0, 0
            # T.81 B.2.3 bounds for DCT scans: a hostile Se/Al would
            # otherwise index past the (arithmetic) stat arrays or
            # overflow int32 on the successive-approximation shift —
            # both must be the contract's ValueError, not a numpy
            # IndexError/OverflowError
            if not (ss <= se <= 63 and ah <= 13 and al <= 13):
                raise ValueError(
                    f"bad DCT scan header Ss={ss} Se={se} "
                    f"Ah={ah} Al={al}")
            if progressive and ss == 0 and se not in (0, 63):
                # B.2.3: a progressive DC scan is exactly Ss=Se=0 —
                # accepting Ss=0 with a partial band would have the
                # arithmetic path skip the declared AC coefficients
                # and silently desync the entropy stream (round-12
                # review).  The full-band (0, 63) shape stays
                # accepted as the documented baseline-compatibility
                # tolerance (a SOF2 frame whose one scan is
                # baseline-shaped decodes as baseline).
                raise ValueError(
                    f"progressive DC scan must have Se=0 "
                    f"(or the full band 63), got {se}")
            if ss > 0 and ns != 1:
                raise ValueError("interleaved progressive AC scan")
            for c in scan:
                # snapshot the quant table at the component's first
                # scan (libjpeg latches likewise): a later DQT that
                # redefines this table id applies to scans started
                # AFTER it, never retroactively — matters for lazily
                # finalized frames (hierarchical fold at next
                # SOF/EOI, single-frame _finalize at EOI).  DQT
                # installs a fresh array per redefinition, so holding
                # the reference IS the snapshot.
                if "qtbl" not in c:
                    if c["tq"] not in qt:
                        raise ValueError(
                            f"undeclared quant table {c['tq']}")
                    c["qtbl"] = qt[c["tq"]]
            if not scan_seen:
                _init_coefs(comps, w, h)
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                mcux = -(-w // (8 * hmax))
                mcuy = -(-h // (8 * vmax))
                scan_seen = True
            if ss == 0 and ah == 0:
                for c in scan:
                    c["dc_done"] = True
            if arith:
                from pipelinedb_spark.operators.jpegarith import (
                    ArithConditioning, decode_arith_scan)
                if arith_cond is None:  # defaults: L=0, U=1, Kx=5
                    arith_cond = ArithConditioning()
                decode_arith_scan(p, i + 2 + seg_len, scan,
                                  arith_cond, restart_interval,
                                  mcux, mcuy, ZIGZAG,
                                  ss=ss, se=se, ah=ah, al=al)
            else:
                _decode_scan_into(p, i + 2 + seg_len, scan, huff_dc,
                                  huff_ac, restart_interval, ss, se,
                                  ah, al, mcux, mcuy)
            i = _next_marker(p, i + 2 + seg_len)
            continue
        i += 2 + seg_len
    if not scan_seen:
        raise ValueError("truncated JPEG: no SOS marker")
    missing = [c["id"] for c in comps if not c["dc_done"]]
    if missing:
        raise ValueError(
            f"JPEG scan coverage incomplete: component(s) {missing} "
            "never received a DC scan (truncated multi-scan stream)")
    if hier is not None:
        if pending_exp is not None:
            # an EXP never consumed by a differential frame is a
            # syntax error (T.81 J.1: EXP applies to the frame that
            # follows); the final-size check alone would accept a
            # stray trailing EXP on a full-size reference
            raise ValueError(
                "EXP expansion never consumed by a differential frame")
        finish_hier_frame()          # fold the final frame
        absent = [cid for cid in hier["ids"] if cid not in ref]
        if absent:
            raise ValueError(
                f"hierarchical stream missing component(s) {absent}")
        H, W = hier["h"], hier["w"]
        if max(pl.shape[0] for pl in ref.values()) != H or \
                max(pl.shape[1] for pl in ref.values()) != W:
            full_pl = max(ref.values(), key=lambda pl: pl.shape)
            raise ValueError(
                f"hierarchical stream ended at "
                f"{full_pl.shape[1]}x{full_pl.shape[0]}, below "
                f"DHP size {W}x{H}")
        planes = []
        for cid in hier["ids"]:
            pl = ref[cid]
            # subsampled components upsample to DHP size (nearest —
            # the same convention as the single-frame _finalize)
            ry, rx = -(-H // pl.shape[0]), -(-W // pl.shape[1])
            if ry > 1 or rx > 1:
                pl = pl.repeat(ry, axis=0).repeat(rx, axis=1)
            planes.append(pl[:H, :W])
        if hier["prec"] > 8:   # 12-bit pyramid → uint8 pixel contract
            planes = [pl >> (hier["prec"] - 8) for pl in planes]
        if len(planes) == 1:
            return planes[0].astype(np.uint8)[..., None]
        return _ycc_to_rgb(planes)
    if lossless:
        # no DCT, no color transform: T.81 defines none for lossless
        # (DNG-style writers store component data as-is); >8-bit
        # precision scales down to the uint8 pixel contract
        planes = []
        for c in comps:
            full = c["sam"] << c["pt"]
            if precision > 8:
                full = full >> (precision - 8)
            planes.append(np.clip(full, 0, 255).astype(np.uint8))
        return np.stack(planes, axis=-1)
    return _finalize(comps, w, h, precision)


def _lossless_predict(s, x, y, pred_sel):
    """T.81 H.1.2.1 predictors over the point-transformed samples:
    a = left, b = above, c = above-left.  First line falls back to
    predictor 1, first column to predictor 2 (H.1.2.2)."""
    if y == 0:
        return int(s[0, x - 1])          # first line: predictor 1
    if x == 0:
        return int(s[y - 1, 0])          # first column: predictor 2
    a = int(s[y, x - 1])
    b = int(s[y - 1, x])
    c = int(s[y - 1, x - 1])
    if pred_sel == 1:
        return a
    if pred_sel == 2:
        return b
    if pred_sel == 3:
        return c
    if pred_sel == 4:
        return a + b - c
    if pred_sel == 5:
        return a + ((b - c) >> 1)
    if pred_sel == 6:
        return b + ((a - c) >> 1)
    return (a + b) >> 1                  # predictor 7


def _decode_lossless_scan(p, pos, scan, huff_dc, restart_interval,
                          pred_sel, pt, precision, w, h,
                          differential: bool = False):
    """Lossless sequential scan (T.81 Annex H): one sample per
    component per MCU, Huffman magnitude category from the DC table +
    EXTEND difference, modulo-2^16 reconstruction in the
    point-transformed domain.  After a restart marker the prediction
    resets to the scan-start default for the next sample (the PVRG /
    libjpeg lossless convention), then neighbor prediction resumes.
    Samples are stored point-transformed; the caller applies << Pt.
    ``differential`` (SOF7 frames, Annex J): prediction is disabled —
    every coded value IS the spatial difference (predictor 0), so the
    stored samples are the modulo-2^16 diffs the caller adds to the
    reference."""
    br = _BitReader(p, pos)
    default = 1 << (precision - pt - 1)
    tabs = []
    for c in scan:
        if c["td"] not in huff_dc:
            raise ValueError(f"undeclared DC table {c['td']}")
        tabs.append(huff_dc[c["td"]])
    sams = [c["sam"] for c in scan]
    reset = True
    mcu = 0
    for y in range(h):
        for x in range(w):
            if restart_interval and mcu and mcu % restart_interval == 0:
                br.align_restart()
                reset = True
            for tab, s in zip(tabs, sams):
                t = tab.decode(br)
                if t == 16:          # H.2: no appended bits, diff=32768
                    diff = 32768
                elif t == 0:
                    diff = 0
                else:
                    diff = _extend(br.read(t), t)
                if differential:
                    px = 0           # Annex J: predictor disabled
                else:
                    px = default if reset else _lossless_predict(
                        s, x, y, pred_sel)
                s[y, x] = (px + diff) & 0xFFFF
            reset = False
            mcu += 1


def _init_coefs(comps, w, h):
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        c["bw"] = mcux * c["h"]   # blocks per row (MCU-padded)
        c["bh"] = mcuy * c["v"]
        # true component extent in blocks (non-interleaved scan order)
        cw = -(-(w * c["h"]) // hmax)
        ch = -(-(h * c["v"]) // vmax)
        c["nbx"] = -(-cw // 8)
        c["nby"] = -(-ch // 8)
        c["coef"] = np.zeros((c["bh"] * c["bw"], 8, 8), dtype=np.int32)
        c["pred"] = 0


def _decode_scan_into(p, pos, scan, huff_dc, huff_ac, ri,
                      ss, se, ah, al, mcux, mcuy):
    """Decode one entropy-coded segment into the components'
    coefficient arrays.  Handles every scan shape with one block
    decoder: baseline full-band (ss=0, se=63, ah=al=0, one or more
    scans), progressive DC first/refine (interleaved or not), and
    progressive AC band first/refine (single component, EOB runs,
    correction bits) per T.81 Annex F/G."""
    br = _BitReader(p, pos)
    eob = [0]  # EOB-run counter, shared across blocks within the scan
    for c in scan:
        c["pred"] = 0
    if len(scan) == 1:
        c = scan[0]
        nbx, nby = c["nbx"], c["nby"]
        for m in range(nbx * nby):
            if ri and m and m % ri == 0:
                br.align_restart()
                c["pred"] = 0
                eob[0] = 0
            row, col = divmod(m, nbx)
            blk = c["coef"][row * c["bw"] + col].reshape(64)
            _decode_block(br, blk, c, huff_dc, huff_ac,
                          ss, se, ah, al, eob)
    else:
        for m in range(mcux * mcuy):
            if ri and m and m % ri == 0:
                br.align_restart()
                for c in scan:
                    c["pred"] = 0
                eob[0] = 0
            my, mx = divmod(m, mcux)
            for c in scan:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        idx = ((my * c["v"] + by) * c["bw"]
                               + mx * c["h"] + bx)
                        blk = c["coef"][idx].reshape(64)
                        _decode_block(br, blk, c, huff_dc, huff_ac,
                                      ss, se, ah, al, eob)


def _decode_block(br, blk, c, huff_dc, huff_ac, ss, se, ah, al, eob):
    zz = ZIGZAG
    if ah == 0:  # first pass (baseline, or progressive first scans)
        if ss == 0:
            t = huff_dc[c["td"]].decode(br)
            diff = _extend(br.read(t), t) if t else 0
            if c.get("dfr"):
                # differential frame (Annex J): DC prediction is
                # disabled — every block's DC codes its value directly
                blk[0] = diff << al
            else:
                c["pred"] += diff
                blk[0] = c["pred"] << al
        k = max(ss, 1)
        if k > se:
            return
        if eob[0]:
            eob[0] -= 1
            return
        ac_tbl = huff_ac[c["ta"]]
        while k <= se:
            rs = ac_tbl.decode(br)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r == 15:  # ZRL: 16 zeros
                    k += 16
                    continue
                eob[0] = (1 << r) - 1  # EOBn run (baseline EOB: n=0)
                if r:
                    eob[0] += br.read(r)
                return
            k += r
            if k > 63:
                raise ValueError("AC index overflow")
            blk[zz[k]] = _extend(br.read(s), s) << al
            k += 1
    elif ss == 0:  # DC refinement: one correction bit per block
        if br.read(1):
            blk[0] |= 1 << al
    else:  # AC refinement (T.81 G.1.2.3)
        _refine_ac(br, blk, huff_ac[c["ta"]], ss, se, al, eob)


def _refine_ac(br, blk, ac_tbl, ss, se, al, eob):
    zz = ZIGZAG
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eob[0] == 0:
        while k <= se:
            rs = ac_tbl.decode(br)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r < 15:  # EOBn: finish via the correction pass
                    eob[0] = 1 << r
                    if r:
                        eob[0] += br.read(r)
                    break
                # r == 15: ZRL — skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("bad AC refinement magnitude")
                val = p1 if br.read(1) else m1
            # advance over the run: zero-history slots count toward
            # r, already-nonzero slots consume a correction bit
            while k <= se:
                cur = int(blk[zz[k]])
                if cur != 0:
                    if br.read(1) and (cur & p1) == 0:
                        blk[zz[k]] = cur + (p1 if cur > 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                blk[zz[k]] = val
            k += 1
    if eob[0] > 0:
        # inside an EOB run: only correction bits for nonzero history
        while k <= se:
            cur = int(blk[zz[k]])
            if cur != 0 and br.read(1) and (cur & p1) == 0:
                blk[zz[k]] = cur + (p1 if cur > 0 else m1)
            k += 1
        eob[0] -= 1


def _finalize(comps, w, h, precision: int = 8):
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    planes = []
    for c in comps:
        # quant table snapshotted at the component's first scan — a
        # DQT between the last scan and EOI must not change this
        # frame's dequantization (see the SOS-time snapshot)
        deq = c["coef"] * c["qtbl"][None, :, :]
        spatial = idct_blocks(deq, precision)
        if precision > 8:   # 12-bit sample precision → uint8 contract
            spatial = (spatial >> (precision - 8)).astype(np.uint8)
        bh, bw = c["bh"], c["bw"]
        plane = spatial.reshape(bh, bw, 8, 8).transpose(
            0, 2, 1, 3).reshape(bh * 8, bw * 8)
        # upsample to full resolution (nearest — baseline viewers'
        # default; error is bounded by chroma smoothness)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = plane.repeat(ry, axis=0).repeat(rx, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return planes[0][..., None]
    return _ycc_to_rgb(planes)


def _ycc_to_rgb(planes) -> np.ndarray:
    """JFIF YCbCr → RGB (shared by the single-frame finalize and the
    hierarchical output path)."""
    y, cb, cr = (np.asarray(pl, dtype=np.float64) for pl in planes)
    r = y + 1.402 * (cr - 128)
    g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
    b = y + 1.772 * (cb - 128)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)),
                   0, 255).astype(np.uint8)
