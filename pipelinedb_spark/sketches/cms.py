"""Count-Min Sketch — mergeable frequency sketch.

Semantics follow the reference (``src/cmsketch.c``): defaults ε=0.002,
δ=0.005 (same as ``cmsketch.c:21-22``), conservative plain CMS, merge =
element-wise add.  Serialization: little-endian header (magic, depth,
width, count) + int64 counter matrix — compact enough to live in a
matrel binary column and be re-merged by ``combine()``.

Hashing: ``pandas.util.hash_array`` (SipHash-based, platform-stable)
with double hashing h1 + i·h2 to derive the per-row positions —
vectorized over whole Arrow batches, no per-row Python.
"""

from __future__ import annotations

import math
import struct

import numpy as np
import pandas as pd

_MAGIC = b"CMS1"
DEFAULT_EPS = 0.002
DEFAULT_P = 0.995  # confidence = 1 - δ


class CountMinSketch:
    __slots__ = ("depth", "width", "count", "table")

    def __init__(self, eps: float = DEFAULT_EPS, p: float = DEFAULT_P,
                 depth: int | None = None, width: int | None = None) -> None:
        self.depth = depth or max(1, math.ceil(math.log(1.0 / (1.0 - p))))
        self.width = width or max(8, math.ceil(math.e / eps))
        self.count = 0
        self.table = np.zeros((self.depth, self.width), dtype=np.int64)

    # -- updates ------------------------------------------------------------
    def _positions(self, values: np.ndarray) -> np.ndarray:
        # categorize=False: see bloom.py — NUL-suffixed strings must
        # hash distinctly
        h1 = pd.util.hash_array(values, hash_key="0123456789123450",
                                categorize=False)
        h2 = pd.util.hash_array(values, hash_key="4507894561230123",
                                categorize=False)
        rows = np.arange(self.depth, dtype=np.uint64)[:, None]
        return (h1[None, :] + rows * h2[None, :]) % np.uint64(self.width)

    def add_many(self, values: np.ndarray, weights: np.ndarray | None = None) -> None:
        if len(values) == 0:
            return
        if values.dtype != object:
            values = values.astype("object")
        pos = self._positions(values)
        w = np.ones(len(values), dtype=np.int64) if weights is None else weights
        for d in range(self.depth):
            np.add.at(self.table[d], pos[d].astype(np.int64), w)
        self.count += int(w.sum())

    def query(self, value) -> int:
        pos = self._positions(np.array([value], dtype=object))
        return int(min(self.table[d, int(pos[d, 0])] for d in range(self.depth)))

    def query_many(self, values: np.ndarray) -> np.ndarray:
        """Vectorized point queries over a whole probe batch."""
        if len(values) == 0:
            return np.zeros(0, dtype=np.int64)
        if values.dtype != object:
            values = values.astype("object")
        pos = self._positions(values).astype(np.int64)   # (depth, n)
        ests = self.table[np.arange(self.depth)[:, None], pos]
        return ests.min(axis=0)

    def total(self) -> int:
        return self.count

    # -- merge / serde -------------------------------------------------------
    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        assert (self.depth, self.width) == (other.depth, other.width), \
            "CMS dimensions must match to merge"
        out = CountMinSketch(depth=self.depth, width=self.width)
        out.table = self.table + other.table
        out.count = self.count + other.count
        return out

    def serialize(self) -> bytes:
        head = _MAGIC + struct.pack("<iiq", self.depth, self.width, self.count)
        return head + self.table.tobytes()

    @classmethod
    def deserialize(cls, data: bytes) -> "CountMinSketch":
        assert data[:4] == _MAGIC, "bad CMS payload"
        depth, width, count = struct.unpack("<iiq", data[4:20])
        out = cls(depth=depth, width=width)
        out.count = count
        out.table = np.frombuffer(data[20:], dtype=np.int64).reshape(
            depth, width).copy()
        return out
