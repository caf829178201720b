"""Pure-Python HyperLogLog — the element-function HLL format.

The *aggregate* HLL path (``hll_agg`` / ``hll_count_distinct``) uses
Spark's native Datasketches expressions (JVM-side, fastest).  The
reference additionally exposes element-wise constructors and updaters —
``hll_empty()``, ``hll_add(hll, x)``, ``hll_print(hll)``
(``pipelinedb--1.0.0.sql:1086-1206``, ``src/hllfuncs.c``) — which need a
format updatable one element at a time from Python.  This class is that
format (magic ``PHLL``); it is deliberately separate from the
Datasketches binaries and the two do not mix (documented in
``functions/sketch_fns.py``).

Dense p-register layout, standard bias-corrected estimator
(reference ``src/hll.c`` uses p=14 ≈0.81% rse; same default here).
"""

from __future__ import annotations

import hashlib
import math

_MAGIC = b"PHLL"
DEFAULT_P = 14


def _hash64(value) -> int:
    return int.from_bytes(
        hashlib.blake2b(str(value).encode(), digest_size=8).digest(), "big")


class HyperLogLog:
    __slots__ = ("p", "m", "regs")

    def __init__(self, p: int = DEFAULT_P) -> None:
        if not 4 <= p <= 18:
            raise ValueError(f"HLL precision out of range: {p}")
        self.p = p
        self.m = 1 << p
        self.regs = bytearray(self.m)

    # -- updates -----------------------------------------------------------
    def add(self, value) -> "HyperLogLog":
        if value is None:
            return self
        h = _hash64(value)
        idx = h >> (64 - self.p)
        rest = h & ((1 << (64 - self.p)) - 1)
        rank = (64 - self.p) - rest.bit_length() + 1
        if rank > self.regs[idx]:
            self.regs[idx] = rank
        return self

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if other.p != self.p:
            raise ValueError("cannot merge HLLs of different precision")
        out = HyperLogLog(self.p)
        out.regs = bytearray(max(a, b) for a, b in zip(self.regs, other.regs))
        return out

    # -- estimate ----------------------------------------------------------
    def cardinality(self) -> int:
        m = self.m
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / sum(2.0 ** -r for r in self.regs)
        if est <= 2.5 * m:
            zeros = self.regs.count(0)
            if zeros:
                est = m * math.log(m / zeros)
        elif est > (1 << 64) / 30.0:
            est = -(1 << 64) * math.log(1 - est / (1 << 64))
        return int(round(est))

    def summary(self) -> str:
        nz = self.m - self.regs.count(0)
        return (f"HyperLogLog(p={self.p}, registers={self.m}, "
                f"nonzero={nz}, cardinality≈{self.cardinality()})")

    # -- serde -------------------------------------------------------------
    def serialize(self) -> bytes:
        return _MAGIC + bytes([self.p]) + bytes(self.regs)

    @classmethod
    def deserialize(cls, data: bytes) -> "HyperLogLog":
        data = bytes(data)
        if not data.startswith(_MAGIC):
            raise ValueError("not an element-format (PHLL) HLL; "
                             "aggregate HLL states use Datasketches")
        out = cls(data[4])
        out.regs = bytearray(data[5: 5 + out.m])
        return out

    @staticmethod
    def is_element_format(data: bytes) -> bool:
        return bytes(data[:4]) == _MAGIC
