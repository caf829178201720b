"""Arithmetic-coded JPEG entropy decode (ITU-T T.81 Annex D QM-coder
+ Annex F/G DCT statistical models) — closes the SOF9 AND SOF10
gates in :mod:`jpeg` (round-11 verdict task 8, the stretch:
unlike MP3's underivable ISO tables, the QM conditioning table is
printed in T.81 Table D.3 and is small).

What lives here:

* :data:`QE_TABLE` — the 113-state probability-estimation machine of
  T.81 Table D.3 (Qe value, next-index-on-LPS, next-index-on-MPS,
  MPS-switch flag), plus the JPEG convention's extra state 113: a
  fixed non-adaptive ~0.5 bin that transitions to itself, used for AC
  coefficient signs.  Transcribed from the public-domain IJG
  reference rendering of the same table (jaricom.c); structural
  invariants are asserted at import and unit-tested.
* :class:`ArithDecoder` — the Annex-D decoder register machine
  (INITDEC / DECODE / renormalization with byte-stuffing and
  marker-detection byte feed).  Statistics bins are one byte each:
  ``(mps << 7) | state_index``.
* DC / AC conditioning per Annex F.2: 20 DC context bins (5 contexts
  × {zero, sign, mag+, mag−}) + a shared X2..X15 magnitude chain and
  value bins; 3 AC bins per coefficient index k (EOB, nonzero,
  magnitude-1) with low-k/high-k magnitude chains split at the Kx
  conditioning value; AC signs through the fixed bin.
* :func:`decode_arith_scan` — the sequential-DCT MCU walk (the
  arithmetic twin of ``jpeg._decode_scan_into``'s baseline path),
  with restart-interval handling: at each RSTn the decoder
  re-initializes and ALL statistics reset to zero (F.1.4.2).

Verification story: the test suite carries a mirror QM ENCODER
(T.81 Annex D encode flow) sharing this table, so
decode(encode(image)) roundtrips prove the coder, the statistical
model, restart handling, and conditioning limits are self-consistent
end-to-end.  Bit-exact interoperability with third-party encoders
(libjpeg -arithmetic) additionally requires this transcription of
Table D.3 to be exact — no JPEG tooling exists in this container to
cross-check it, so, like the Pillow-parity oracle, a tool-gated
cross-check (tests/test_r12_jpeg_arith.py::test_libjpeg_parity)
self-skips until a `cjpeg` binary is present.
"""

from __future__ import annotations

import numpy as np

# T.81 Table D.3 rows: (Qe, next_index_LPS, next_index_MPS, switch).
# Index 113 is the JPEG fixed ~equiprobable bin (self-transitions,
# never switches) used for AC signs.
QE_TABLE: tuple[tuple[int, int, int, int], ...] = (
    (0x5A1D, 1, 1, 1), (0x2586, 14, 2, 0), (0x1114, 16, 3, 0),
    (0x080B, 18, 4, 0), (0x03D8, 20, 5, 0), (0x01DA, 23, 6, 0),
    (0x00E5, 25, 7, 0), (0x006F, 28, 8, 0), (0x0036, 30, 9, 0),
    (0x001A, 33, 10, 0), (0x000D, 35, 11, 0), (0x0006, 9, 12, 0),
    (0x0003, 10, 13, 0), (0x0001, 12, 13, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 36, 16, 0), (0x2CF2, 38, 17, 0), (0x207C, 39, 18, 0),
    (0x17B9, 40, 19, 0), (0x1182, 42, 20, 0), (0x0CEF, 43, 21, 0),
    (0x09A1, 45, 22, 0), (0x072F, 46, 23, 0), (0x055C, 48, 24, 0),
    (0x0406, 49, 25, 0), (0x0303, 51, 26, 0), (0x0240, 52, 27, 0),
    (0x01B1, 54, 28, 0), (0x0144, 56, 29, 0), (0x00F5, 57, 30, 0),
    (0x00B7, 59, 31, 0), (0x008A, 60, 32, 0), (0x0068, 62, 33, 0),
    (0x004E, 63, 34, 0), (0x003B, 32, 35, 0), (0x002C, 33, 9, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 64, 38, 0), (0x3A0D, 65, 39, 0),
    (0x2EF1, 67, 40, 0), (0x261F, 68, 41, 0), (0x1F33, 69, 42, 0),
    (0x19A8, 70, 43, 0), (0x1518, 72, 44, 0), (0x1177, 73, 45, 0),
    (0x0E74, 74, 46, 0), (0x0BFB, 75, 47, 0), (0x09F8, 77, 48, 0),
    (0x0861, 78, 49, 0), (0x0706, 79, 50, 0), (0x05CD, 48, 51, 0),
    (0x04DE, 50, 52, 0), (0x040F, 50, 53, 0), (0x0363, 51, 54, 0),
    (0x02D4, 52, 55, 0), (0x025C, 53, 56, 0), (0x01F8, 54, 57, 0),
    (0x01A4, 55, 58, 0), (0x0160, 56, 59, 0), (0x0125, 57, 60, 0),
    (0x00F6, 58, 61, 0), (0x00CB, 59, 62, 0), (0x00AB, 61, 63, 0),
    (0x008F, 61, 32, 0), (0x5B12, 65, 65, 1), (0x4D04, 80, 66, 0),
    (0x412C, 81, 67, 0), (0x37D8, 82, 68, 0), (0x2FE8, 83, 69, 0),
    (0x293C, 84, 70, 0), (0x2379, 86, 71, 0), (0x1EDF, 87, 72, 0),
    (0x1AA9, 87, 73, 0), (0x174E, 72, 74, 0), (0x1424, 72, 75, 0),
    (0x119C, 74, 76, 0), (0x0F6B, 74, 77, 0), (0x0D51, 75, 78, 0),
    (0x0BB6, 77, 79, 0), (0x0A40, 77, 48, 0), (0x5832, 80, 81, 1),
    (0x4D1C, 88, 82, 0), (0x438E, 89, 83, 0), (0x3BDD, 90, 84, 0),
    (0x34EE, 91, 85, 0), (0x2EAE, 92, 86, 0), (0x299A, 93, 87, 0),
    (0x2516, 86, 71, 0), (0x5570, 88, 89, 1), (0x4CA9, 95, 90, 0),
    (0x44D9, 96, 91, 0), (0x3E22, 97, 92, 0), (0x3824, 99, 93, 0),
    (0x32B4, 99, 94, 0), (0x2E17, 93, 86, 0), (0x56A8, 95, 96, 1),
    (0x4F46, 101, 97, 0), (0x47E5, 102, 98, 0), (0x41CF, 103, 99, 0),
    (0x3C3D, 104, 100, 0), (0x375E, 99, 93, 0), (0x5231, 105, 102, 0),
    (0x4C0F, 106, 103, 0), (0x4639, 107, 104, 0), (0x415E, 103, 99, 0),
    (0x5627, 105, 106, 1), (0x50E7, 108, 107, 0), (0x4B85, 109, 103, 0),
    (0x5597, 110, 109, 0), (0x504F, 111, 107, 0), (0x5A10, 110, 111, 1),
    (0x5522, 112, 109, 0), (0x59EB, 112, 111, 1), (0x5A1D, 113, 113, 0),
)

# structural self-checks at import: a transcription slip in the state
# machine must fail loudly, not decode garbage
assert len(QE_TABLE) == 114
assert all(0 < qe < 0x8000 and 0 <= nl <= 113 and 0 <= nm <= 113
           and sw in (0, 1) for qe, nl, nm, sw in QE_TABLE)
assert QE_TABLE[113] == (0x5A1D, 113, 113, 0)     # fixed sign bin
# switch states are exactly the chain heads (MPS flips only where the
# estimator crosses p=0.5)
assert [i for i, r in enumerate(QE_TABLE) if r[3]] == \
    [0, 14, 36, 64, 80, 88, 95, 105, 110, 112]

DC_STAT_BINS = 64   # 5 contexts × 4 + chain 20..33 + value 34..47
AC_STAT_BINS = 256  # 3 × 63 + chains {189, 217} + value bins
FIXED_BIN = 113


class ArithDecoder:
    """T.81 Annex D arithmetic decoder over one entropy-coded
    segment.  Register formulation follows the spec's DECODE /
    RENORMD / BYTEIN flow: A holds the interval size (≥0x8000 after
    renormalization), C the code value with its binary point tracked
    by ``ct``; INITDEC leaves A=0x10000 with two data bytes in C.

    On a marker (any 0xFF followed by a nonzero, non-stuffing byte)
    the byte feed switches to zero bits, per D.2.7 — a truncated
    segment therefore terminates decoding deterministically instead
    of reading past the scan."""

    __slots__ = ("data", "pos", "end", "c", "a", "ct", "marker_pos")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.end = len(data)
        self.c = 0
        self.a = 0
        self.ct = -16       # forces the two INITDEC byte fetches
        self.marker_pos: int | None = None

    def _byte_in(self) -> int:
        if self.marker_pos is not None:
            return 0
        if self.pos >= self.end:
            self.marker_pos = self.end      # truncated: zero feed
            return 0
        d = self.data[self.pos]
        if d != 0xFF:
            self.pos += 1
            return d
        # 0xFF: skip fill bytes, then stuffed-zero vs marker
        p = self.pos + 1
        while p < self.end and self.data[p] == 0xFF:
            p += 1
        if p < self.end and self.data[p] == 0x00:
            self.pos = p + 1
            return 0xFF
        self.marker_pos = self.pos          # marker (or EOF) halt
        return 0

    def decode(self, st: np.ndarray, i: int) -> int:
        # renormalization + initialization (D.2.6)
        a = self.a
        while a < 0x8000:
            self.ct -= 1
            if self.ct < 0:
                self.c = (self.c << 8) | self._byte_in()
                self.ct += 8
                if self.ct < 0:
                    self.ct += 1
                    if self.ct == 0:
                        a = 0x8000          # → 0x10000 after shift
            a <<= 1
        sv = int(st[i])
        mps = sv >> 7
        qe, nlps, nmps, sw = QE_TABLE[sv & 0x7F]
        a -= qe
        t = a << self.ct         # hoisted: this is the per-bit hot path
        if self.c >= t:
            # upper (LPS-sized) subinterval, conditional exchange
            self.c -= t
            if a < qe:
                bit = mps
                st[i] = (mps << 7) | nmps
            else:
                bit = mps ^ 1
                st[i] = ((mps ^ sw) << 7) | nlps
            a = qe
        elif a < 0x8000:
            # lower subinterval needing renorm, conditional exchange
            if a < qe:
                bit = mps ^ 1
                st[i] = ((mps ^ sw) << 7) | nlps
            else:
                bit = mps
                st[i] = (mps << 7) | nmps
        else:
            bit = mps                       # fast path, no update
        self.a = a
        return bit


class ArithConditioning:
    """DAC-marker conditioning state (T.81 B.2.4.3): per-DC-table
    (L, U) difference-category bounds, per-AC-table Kx chain split.
    Defaults per F.1.4.4.1.2 / F.1.4.4.2: L=0, U=1, Kx=5."""

    def __init__(self):
        self.dc = {i: (0, 1) for i in range(4)}
        self.ac = {i: 5 for i in range(4)}

    def set_from_dac(self, body: bytes) -> None:
        if len(body) % 2:
            # an orphaned half-definition could be the very table the
            # scan references — dropping it would decode with default
            # conditioning and desync (round-12 review)
            raise ValueError("odd-length DAC segment")
        j = 0
        while j + 1 < len(body):
            cls, tid = body[j] >> 4, body[j] & 0x0F
            val = body[j + 1]
            if tid > 3:
                raise ValueError(f"bad DAC table id {tid}")
            if cls > 1:
                # T.81 B.2.4.3 defines only Tc=0 (DC) and Tc=1 (AC)
                raise ValueError(f"bad DAC table class {cls}")
            if cls == 0:
                lo, hi = val & 0x0F, val >> 4
                if not (0 <= lo <= hi <= 15):
                    raise ValueError(f"bad DC conditioning {val:#x}")
                self.dc[tid] = (lo, hi)
            else:
                if not 1 <= val <= 63:
                    raise ValueError(f"bad AC conditioning Kx={val}")
                self.ac[tid] = val
            j += 2


class _ScanStats:
    """Per-scan adaptive statistics, zeroed at scan start and at every
    restart marker (F.1.4.2)."""

    def __init__(self):
        self.dc = {i: np.zeros(DC_STAT_BINS, dtype=np.uint8)
                   for i in range(4)}
        self.ac = {i: np.zeros(AC_STAT_BINS, dtype=np.uint8)
                   for i in range(4)}
        self.fixed = np.array([FIXED_BIN], dtype=np.uint8)

    def reset(self):
        for arr in self.dc.values():
            arr.fill(0)
        for arr in self.ac.values():
            arr.fill(0)
        self.fixed[0] = FIXED_BIN


def _decode_dc(dec: ArithDecoder, stats: _ScanStats, c: dict,
               cond: ArithConditioning) -> int:
    """One DC difference (F.2.2.1), updating the component's
    conditioning context and prediction.  In a DIFFERENTIAL frame
    (``dfr``, Annex J: SOF13/SOF14) prediction is disabled — the
    decoded value IS the block's DC — while the conditioning context
    still follows the coded values exactly as in the non-differential
    flow (the statistical model is unchanged, only the prediction
    feedback is cut, mirroring the Huffman differential path)."""
    tbl = c["td"]
    st = stats.dc[tbl]
    base = c["dc_ctx"]
    if dec.decode(st, base) == 0:
        c["dc_ctx"] = 0
        return 0 if c.get("dfr") else c["pred"]
    sign = dec.decode(st, base + 1)
    idx = base + 2 + sign
    m = dec.decode(st, idx)
    if m:
        idx = 20                            # X2.. chain (Table F.4)
        while dec.decode(st, idx):
            m <<= 1
            if m == 0x8000:
                raise ValueError("arithmetic DC magnitude overflow")
            idx += 1
    lo, hi = cond.dc[tbl]
    if m < ((1 << lo) >> 1):
        c["dc_ctx"] = 0
    elif m > ((1 << hi) >> 1):
        c["dc_ctx"] = 12 + sign * 4
    else:
        c["dc_ctx"] = 4 + sign * 4
    v = m
    idx += 14                               # value bins (Figure F.24)
    mm = m >> 1
    while mm:
        if dec.decode(st, idx):
            v |= mm
        mm >>= 1
    v += 1
    if c.get("dfr"):
        return -v if sign else v
    c["pred"] += -v if sign else v
    return c["pred"]


def _decode_ac_block(dec: ArithDecoder, stats: _ScanStats, c: dict,
                     cond: ArithConditioning, blk: np.ndarray,
                     zz: np.ndarray, ss: int = 1, se: int = 63,
                     al: int = 0) -> None:
    """AC coefficients ss..se of one block (F.2.2.2, first-pass
    form): per-k EOB / nonzero decisions, fixed-bin sign, magnitude
    chains split at Kx; progressive first scans store values
    ``<< al``."""
    tbl = c["ta"]
    st = stats.ac[tbl]
    kx = cond.ac[tbl]
    k = ss
    while k <= se:
        base = 3 * (k - 1)
        if dec.decode(st, base):            # EOB
            return
        while dec.decode(st, base + 1) == 0:
            k += 1
            if k > se:
                raise ValueError("arithmetic AC index overflow")
            base = 3 * (k - 1)
        sign = dec.decode(stats.fixed, 0)
        idx = base + 2
        m = dec.decode(st, idx)
        if m:
            if dec.decode(st, idx):
                m = 2
                idx = 189 if k <= kx else 217
                while dec.decode(st, idx):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError(
                            "arithmetic AC magnitude overflow")
                    idx += 1
        v = m
        idx += 14
        mm = m >> 1
        while mm:
            if dec.decode(st, idx):
                v |= mm
            mm >>= 1
        v += 1
        blk[zz[k]] = (-v if sign else v) << al
        k += 1


def _find_restart(data: bytes, pos: int, n: int) -> int:
    """Position just past the next RSTn marker at/after ``pos``;
    raises when the expected marker is missing (corrupt stream)."""
    want = 0xD0 + (n & 7)
    i = pos
    while i + 1 < len(data):
        if data[i] == 0xFF:
            nxt = data[i + 1]
            if nxt == want:
                return i + 2
            if 0xD0 <= nxt <= 0xD7:
                raise ValueError(
                    f"restart marker out of order: expected "
                    f"RST{n & 7}, found RST{nxt - 0xD0}")
            if 0xC0 <= nxt <= 0xFE:
                # any other marker (SOI/EOI/SOS/SOF/DHT/...) means the
                # expected RSTn is missing and the search has crossed a
                # scan or image boundary — halting here prevents a
                # corrupt/concatenated stream from resyncing on a
                # coincidental later RSTn and decoding garbage
                # (round-12 review); 0xFF00 is a stuffed data byte and
                # 0xFFFF a fill byte, both legal inside the segment
                raise ValueError(
                    f"missing restart marker: expected RST{n & 7}, "
                    f"hit marker 0xFF{nxt:02X}")
        i += 1
    raise ValueError("missing restart marker in arithmetic scan")


def _decode_ac_refine(dec: ArithDecoder, stats: _ScanStats, c: dict,
                      blk: np.ndarray, zz: np.ndarray,
                      ss: int, se: int, al: int) -> None:
    """Progressive AC refinement (G.1.3.3 arithmetic form): per
    coefficient index — a correction bit for already-nonzero history
    (bin st+2), the newly-nonzero decision at st+1 with a fixed-bin
    sign, and an EOB decision only past the previous scan's end."""
    st = stats.ac[c["ta"]]
    p1 = 1 << al
    m1 = -1 << al
    kex = se
    while kex > 0 and blk[zz[kex]] == 0:
        kex -= 1
    k = ss
    while k <= se:
        base = 3 * (k - 1)
        if k > kex and dec.decode(st, base):
            return                          # EOB
        while True:
            cur = int(blk[zz[k]])
            if cur:
                # no (cur & p1) == 0 guard: the reference arithmetic
                # decoder (libjpeg jdarith.c decode_mcu_AC_refine)
                # applies the correction unconditionally — history
                # values on conforming streams are multiples of
                # 2^(al+1), so the bit can never double-apply; keeping
                # the flow identical means even nonconforming input
                # diverges from libjpeg nowhere (round-12 review)
                if dec.decode(st, base + 2):
                    blk[zz[k]] = cur + (p1 if cur > 0 else m1)
                break
            if dec.decode(st, base + 1):
                blk[zz[k]] = m1 if dec.decode(stats.fixed, 0) else p1
                break
            k += 1
            if k > se:
                raise ValueError(
                    "arithmetic AC refinement index overflow")
            base = 3 * (k - 1)
        k += 1


# Lossless-arithmetic (SOF11, T.81 Annex H) statistics layout: 25
# two-dimensional contexts (5-way classification of the neighbor
# diffs Da × Db, H.1.2.2) × 4 decision bins each (S0/SS/SP/SN, the
# Annex-F DC tree) = bins 0..99, then TWO magnitude X/M chains
# selected by Db's category (small-or-zero vs large) — 16 X bins + 16
# M bins each (headroom for 16-bit-precision diffs up to 32768).
LL_CHAIN_A = 100      # Db zero/small: X 100..115, M 116..131
LL_CHAIN_B = 132      # Db large:      X 132..147, M 148..163
LL_CHAIN_LEN = 16
LL_STAT_BINS = 164


def _ll_classify(m: int, sign: int, lo: int, hi: int) -> int:
    """5-way difference classification from the magnitude-category
    bound ``m`` (the same quantity the DC model conditions on,
    F.1.4.4.1.2): 0 zero, 1 +small, 2 −small, 3 +large, 4 −large."""
    if m < ((1 << lo) >> 1):
        return 0
    if m > ((1 << hi) >> 1):
        return 3 + sign
    return 1 + sign


def decode_arith_lossless_scan(p: bytes, pos: int, scan: list[dict],
                               cond: ArithConditioning, ri: int,
                               pred_sel: int, pt: int, precision: int,
                               w: int, h: int,
                               differential: bool = False) -> None:
    """Lossless arithmetic scan (SOF11 — T.81 Annex H prediction with
    the Annex-F DC decision tree over Annex-G-style conditioning).

    Prediction is identical to the Huffman lossless path (predictors
    1-7 via Ss, first-line/first-column fallbacks, scan-start/restart
    default 2^(P-Pt-1)); only the entropy layer differs: each
    prediction residual is decoded with the DC magnitude tree, but
    conditioned on a TWO-dimensional context — the 5-way categories
    of the residuals already decoded at the left (Da) and above (Db)
    neighbors, classified with the DC conditioning bounds (L, U) of
    the scan's Tb table (H.1.2.2-H.1.2.3).  Out-of-image neighbors
    read category 0.  The magnitude X/M chain is selected by Db's
    category (large → second chain).  Restart markers re-initialize
    the decoder, zero the statistics, and reset prediction to the
    scan-start default (F.1.4.2); the decoded-residual category
    history is a property of the decoded samples and survives.

    Self-consistency caveat (same as SOF9/SOF10, r12): no third-party
    arithmetic codec exists in this container, so conformance is
    pinned by the mirror encoder + the Huffman-vs-arithmetic
    cross-check (same pixels through SOF3 and SOF11), not by interop.

    Samples land point-transformed in each component's ``sam`` (the
    caller applies << Pt), modulo 2^16 like the Huffman path.

    ``differential`` (SOF15, Annex J): prediction is disabled — every
    coded value IS the spatial difference (predictor 0), so the
    stored samples are the modulo-2^16 diffs the caller adds to the
    hierarchical reference; the conditioning model is unchanged."""
    dec = ArithDecoder(p, pos)
    stats: dict[int, np.ndarray] = {}
    for c in scan:
        if not 0 <= c["td"] <= 3:
            # contract error, not a KeyError into the 4-table bank
            raise ValueError(
                f"bad arithmetic conditioning table {c['td']}")
        stats[c["td"]] = np.zeros(LL_STAT_BINS, dtype=np.uint8)
    # per-component category history of decoded residuals (uint8 the
    # size of the image: 5 values)
    hist = [np.zeros((h, w), dtype=np.uint8) for _ in scan]
    sams = [c["sam"] for c in scan]
    default = 1 << (precision - pt - 1)
    rst = 0
    reset = True
    mcu = 0
    for y in range(h):
        for x in range(w):
            if ri and mcu and mcu % ri == 0:
                start = (dec.marker_pos if dec.marker_pos is not None
                         else dec.pos)
                nxt = _find_restart(p, start, rst)
                rst = (rst + 1) & 7
                dec = ArithDecoder(p, nxt)
                for st in stats.values():
                    st.fill(0)
                reset = True
            for c, s, cl in zip(scan, sams, hist):
                st = stats[c["td"]]
                lo, hi = cond.dc[c["td"]]
                ca = int(cl[y, x - 1]) if x else 0
                cb = int(cl[y - 1, x]) if y else 0
                base = 4 * (5 * cb + ca)
                if dec.decode(st, base) == 0:
                    dv = 0
                    cl[y, x] = 0
                else:
                    sign = dec.decode(st, base + 1)
                    m = dec.decode(st, base + 2 + sign)
                    idx = base + 2 + sign
                    if m:
                        idx = LL_CHAIN_B if cb >= 3 else LL_CHAIN_A
                        while dec.decode(st, idx):
                            m <<= 1
                            if m == 0x10000:
                                raise ValueError(
                                    "arithmetic lossless magnitude "
                                    "overflow")
                            idx += 1
                    cl[y, x] = _ll_classify(m, sign, lo, hi)
                    v = m
                    idx += LL_CHAIN_LEN
                    mm = m >> 1
                    while mm:
                        if dec.decode(st, idx):
                            v |= mm
                        mm >>= 1
                    v += 1
                    dv = -v if sign else v
                if differential:
                    px = 0               # Annex J: predictor disabled
                else:
                    px = default if reset else _ll_predict(
                        s, x, y, pred_sel)
                s[y, x] = (px + dv) & 0xFFFF
            reset = False
            mcu += 1


def _ll_predict(s, x, y, pred_sel):
    from pipelinedb_spark.operators.jpeg import _lossless_predict
    return _lossless_predict(s, x, y, pred_sel)


def decode_arith_scan(p: bytes, pos: int, scan: list[dict],
                      cond: ArithConditioning, ri: int,
                      mcux: int, mcuy: int, zz: np.ndarray,
                      ss: int = 0, se: int = 63,
                      ah: int = 0, al: int = 0) -> None:
    """Arithmetic entropy scan — the SOF9/SOF10 twin of the Huffman
    MCU walk.  One driver covers every scan shape: sequential
    full-band (ss=0, se=63, ah=al=0), progressive DC first/refine
    (interleaved or not), progressive AC band first/refine (single
    component).  Restart intervals re-initialize the decoder AND all
    statistics (F.1.4.2); statistics are per-scan by construction."""
    stats = _ScanStats()
    for c in scan:
        c["pred"] = 0
        c["dc_ctx"] = 0
    dec = ArithDecoder(p, pos)
    rst = 0

    def restart():
        nonlocal dec, rst
        start = (dec.marker_pos if dec.marker_pos is not None
                 else dec.pos)
        nxt = _find_restart(p, start, rst)
        rst = (rst + 1) & 7
        dec = ArithDecoder(p, nxt)
        stats.reset()
        for cc in scan:
            cc["pred"] = 0
            cc["dc_ctx"] = 0

    def block(c: dict, blk: np.ndarray) -> None:
        if ah == 0:                         # first pass
            if ss == 0:
                blk[0] = _decode_dc(dec, stats, c, cond) << al
            if max(ss, 1) <= se:
                # AC band (progressive) or full sequential band; a
                # DC-only progressive scan (ss=se=0) skips AC, and
                # the SOS parse rejects ss=0 with 0<se (B.2.3), so
                # this covers every valid shape
                _decode_ac_block(dec, stats, c, cond, blk, zz,
                                 ss=max(ss, 1), se=se, al=al)
        elif ss == 0:                       # DC refinement: fixed bin
            if dec.decode(stats.fixed, 0):
                blk[0] |= 1 << al
        else:                               # AC refinement
            _decode_ac_refine(dec, stats, c, blk, zz, ss, se, al)

    if len(scan) == 1:
        c = scan[0]
        nbx, nby = c["nbx"], c["nby"]
        for m in range(nbx * nby):
            if ri and m and m % ri == 0:
                restart()
            row, col = divmod(m, nbx)
            block(c, c["coef"][row * c["bw"] + col].reshape(64))
    else:
        for m in range(mcux * mcuy):
            if ri and m and m % ri == 0:
                restart()
            my, mx = divmod(m, mcux)
            for c in scan:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        idx = ((my * c["v"] + by) * c["bw"]
                               + mx * c["h"] + bx)
                        block(c, c["coef"][idx].reshape(64))
