"""Bloom filter — mergeable set-membership sketch.

Semantics follow the reference (``src/bloom.c``): defaults p=0.02,
n=16384 (``bloom.c:18-19``); union = bitwise OR, intersection = AND,
cardinality estimate = -(m/h)·ln(1 - X/m) where X = set bits.
Hashing: pandas hash_array double hashing, vectorized per Arrow batch.
"""

from __future__ import annotations

import math
import struct

import numpy as np
import pandas as pd

_MAGIC = b"BLM1"
DEFAULT_P = 0.02
DEFAULT_N = 16384


class BloomFilter:
    __slots__ = ("m", "h", "bits")

    def __init__(self, p: float = DEFAULT_P, n: int = DEFAULT_N,
                 m: int | None = None, h: int | None = None) -> None:
        if m is None:
            m = max(64, int(-n * math.log(p) / (math.log(2) ** 2)))
            m = (m + 63) & ~63  # round to word
        self.m = m
        self.h = h or max(1, int(round((m / n) * math.log(2))))
        self.bits = np.zeros(self.m // 64, dtype=np.uint64)

    def _positions(self, values: np.ndarray) -> np.ndarray:
        # categorize=False: the factorize fast path compares C strings,
        # collapsing values that differ only by trailing NULs ('' vs
        # '\x00') — per-element hashing keeps them distinct
        h1 = pd.util.hash_array(values, hash_key="1111111122222222",
                                categorize=False)
        h2 = pd.util.hash_array(values, hash_key="3333333344444444",
                                categorize=False)
        rows = np.arange(self.h, dtype=np.uint64)[:, None]
        return (h1[None, :] + rows * h2[None, :]) % np.uint64(self.m)

    def add_many(self, values: np.ndarray) -> "BloomFilter":
        if len(values) == 0:
            return self
        if values.dtype != object:
            values = values.astype("object")
        pos = self._positions(values).ravel()
        word = (pos // 64).astype(np.int64)
        bit = np.uint64(1) << (pos % np.uint64(64))
        np.bitwise_or.at(self.bits, word, bit)
        return self

    def contains(self, value) -> bool:
        pos = self._positions(np.array([value], dtype=object)).ravel()
        word = (pos // 64).astype(np.int64)
        bit = np.uint64(1) << (pos % np.uint64(64))
        return bool(np.all((self.bits[word] & bit) != 0))

    def contains_many(self, values: np.ndarray) -> np.ndarray:
        """Vectorized membership over a whole probe batch."""
        if len(values) == 0:
            return np.zeros(0, dtype=bool)
        if values.dtype != object:
            values = values.astype("object")
        pos = self._positions(values)              # (h, n)
        word = (pos // 64).astype(np.int64)
        bit = np.uint64(1) << (pos % np.uint64(64))
        return np.all((self.bits[word] & bit) != 0, axis=0)

    def cardinality(self) -> int:
        x = int(np.unpackbits(self.bits.view(np.uint8)).sum())
        if x == 0:
            return 0
        if x >= self.m:
            return self.m
        return int(round(-(self.m / self.h) * math.log(1.0 - x / self.m)))

    def union(self, other: "BloomFilter") -> "BloomFilter":
        assert (self.m, self.h) == (other.m, other.h)
        out = BloomFilter(m=self.m, h=self.h)
        out.bits = self.bits | other.bits
        return out

    def intersection(self, other: "BloomFilter") -> "BloomFilter":
        assert (self.m, self.h) == (other.m, other.h)
        out = BloomFilter(m=self.m, h=self.h)
        out.bits = self.bits & other.bits
        return out

    merge = union  # combinable-aggregate contract

    def serialize(self) -> bytes:
        return _MAGIC + struct.pack("<ii", self.m, self.h) + self.bits.tobytes()

    @classmethod
    def deserialize(cls, data: bytes) -> "BloomFilter":
        assert data[:4] == _MAGIC, "bad bloom payload"
        m, h = struct.unpack("<ii", data[4:12])
        out = cls(m=m, h=h)
        out.bits = np.frombuffer(data[12:], dtype=np.uint64).copy()
        return out
