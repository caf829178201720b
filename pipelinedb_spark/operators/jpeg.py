"""Baseline JPEG decode, dependency-free (numpy + pure Python).

JPEG was the last codec-gated format in the multimodal path: unlike
PNG (stdlib zlib) it needs a real entropy decoder and transform —
Huffman-coded DCT coefficients per 8×8 block, dequantization, inverse
DCT, chroma upsampling and YCbCr→RGB.  All of that is standard public
spec material (ITU-T T.81): marker segments (DQT/SOF0/DHT/SOS/DRI),
magnitude-category coding, zig-zag order, and the Annex-K flow.

Scope (the corpus-dominant profile): baseline sequential DCT (SOF0),
8-bit samples, Huffman coding, 1 or 3 components, any sampling factors
(4:4:4 / 4:2:2 / 4:2:0), restart intervals.  Progressive (SOF2),
arithmetic coding, 12-bit, and hierarchical modes raise
NotImplementedError — production swaps in PIL for those.

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


def idct_blocks(coefs: np.ndarray) -> np.ndarray:
    """(n, 8, 8) dequantized coefficient blocks → (n, 8, 8) spatial
    samples (level-shifted +128, clipped to uint8).  One einsum for
    all blocks — no per-block Python loop."""
    spatial = np.einsum("ki,nkl,lj->nij", _DCT_A, coefs, _DCT_A,
                        optimize=True)
    return np.clip(np.round(spatial + 128), 0, 255).astype(np.uint8)


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
                elif 0xD0 <= nxt <= 0xD7 or nxt == 0xD9:
                    # restart/EOI marker: pad — caller resyncs
                    self.acc = (self.acc << 8) & 0xFFFFFFFF
                    self.bits += 8
                    continue
                else:
                    raise ValueError(f"marker 0xFF{nxt:02X} inside scan")
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


def decode_jpeg_py(p: bytes):
    """Baseline JPEG → (h, w, c) uint8 array (c = 1 gray, 3 RGB).
    Returns None when the payload is not a JPEG; raises
    NotImplementedError for progressive/arithmetic/12-bit streams."""
    if p[:2] != b"\xff\xd8":
        return None
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huff] = {}
    huff_ac: dict[int, _Huff] = {}
    comps: list[dict] = []
    h = w = None
    restart_interval = 0
    i = 2
    while i + 4 <= len(p):
        if p[i] != 0xFF:
            i += 1
            continue
        marker = p[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:  # EOI before SOS → corrupt
            raise ValueError("JPEG without scan data")
        seg_len = int.from_bytes(p[i + 2:i + 4], "big")
        body = p[i + 4:i + 2 + seg_len]
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(body):
                prec, tid = body[j] >> 4, body[j] & 0x0F
                if prec:
                    raise NotImplementedError("16-bit quant tables")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[ZIGZAG] = np.frombuffer(body, np.uint8, 64, j + 1)
                qt[tid] = tbl.reshape(8, 8)
                j += 65
        elif marker in (0xC0, 0xC1):  # SOF0/1 baseline
            if body[0] != 8:
                raise NotImplementedError("non-8-bit JPEG")
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            nc = body[5]
            if nc not in (1, 3):
                raise NotImplementedError(f"{nc}-component JPEG")
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0}: only baseline sequential "
                "decodes without codec libraries")
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
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tt = body[1 + 2 * c], body[2 + 2 * c]
                comp = next(cc for cc in comps if cc["id"] == cs)
                comp["td"], comp["ta"] = tt >> 4, tt & 0x0F
                scan.append(comp)
            i += 2 + seg_len
            return _decode_scan(p, i, w, h, scan, qt, huff_dc,
                                huff_ac, restart_interval)
        i += 2 + seg_len
    raise ValueError("truncated JPEG: no SOS marker")


def _decode_scan(p, pos, w, h, comps, qt, huff_dc, huff_ac,
                 restart_interval):
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        c["bw"] = mcux * c["h"]   # blocks per row
        c["bh"] = mcuy * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 8, 8), dtype=np.int32)
        c["pred"] = 0
    br = _BitReader(p, pos)
    n_mcu = mcux * mcuy
    zz = ZIGZAG
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            br.align_restart()
            for c in comps:
                c["pred"] = 0
        my, mx = divmod(m, mcux)
        for c in comps:
            dc_tbl, ac_tbl = huff_dc[c["td"]], huff_ac[c["ta"]]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    blk = np.zeros(64, dtype=np.int32)
                    t = dc_tbl.decode(br)
                    diff = _extend(br.read(t), t) if t else 0
                    c["pred"] += diff
                    blk[0] = c["pred"]
                    k = 1
                    while k < 64:
                        rs = ac_tbl.decode(br)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:  # ZRL: 16 zeros
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC index overflow")
                        blk[zz[k]] = _extend(br.read(s), s)
                        k += 1
                    row = my * c["v"] + by
                    col = mx * c["h"] + bx
                    c["coef"][row * c["bw"] + col] = blk.reshape(8, 8)
    planes = []
    for c in comps:
        deq = c["coef"] * qt[c["tq"]][None, :, :]
        spatial = idct_blocks(deq)
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
    y, cb, cr = (pl.astype(np.float64) for pl in planes)
    r = y + 1.402 * (cr - 128)
    g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
    b = y + 1.772 * (cb - 128)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)),
                   0, 255).astype(np.uint8)
