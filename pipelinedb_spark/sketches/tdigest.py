"""t-digest — mergeable quantile/CDF sketch.

Semantics follow the reference (``src/tdigest.c``, merging-digest
variant, default compression 200 = ``tdigest.c:23``).  Centroids are
kept as parallel (mean, weight) arrays; ``compress`` is the standard
merging pass with the k1 scale function bound q(1-q); merge = concat +
compress.  Vectorized numpy end-to-end.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"TDG1"
DEFAULT_COMPRESSION = 200.0


class TDigest:
    __slots__ = ("compression", "means", "weights")

    def __init__(self, compression: float = DEFAULT_COMPRESSION,
                 means: np.ndarray | None = None,
                 weights: np.ndarray | None = None) -> None:
        self.compression = float(compression)
        self.means = means if means is not None else np.empty(0)
        self.weights = weights if weights is not None else np.empty(0)

    def add_many(self, values: np.ndarray) -> "TDigest":
        values = np.asarray(values, dtype=np.float64)
        values = values[~np.isnan(values)]
        if len(values) == 0:
            return self
        self.means = np.concatenate([self.means, values])
        self.weights = np.concatenate([self.weights, np.ones(len(values))])
        if len(self.means) > 8 * self.compression:
            self._compress()
        return self

    def merge(self, other: "TDigest") -> "TDigest":
        out = TDigest(self.compression,
                      np.concatenate([self.means, other.means]),
                      np.concatenate([self.weights, other.weights]))
        out._compress()
        return out

    def _compress(self) -> None:
        if len(self.means) == 0:
            return
        order = np.argsort(self.means, kind="stable")
        means, weights = self.means[order], self.weights[order]
        total = weights.sum()
        new_m, new_w = [], []
        cur_m, cur_w = means[0], weights[0]
        w_so_far = 0.0
        for m, w in zip(means[1:], weights[1:]):
            q = (w_so_far + cur_w / 2.0) / total
            limit = 4.0 * total * q * (1.0 - q) / self.compression
            if cur_w + w <= max(limit, 1.0):
                cur_m = (cur_m * cur_w + m * w) / (cur_w + w)
                cur_w += w
            else:
                new_m.append(cur_m)
                new_w.append(cur_w)
                w_so_far += cur_w
                cur_m, cur_w = m, w
        new_m.append(cur_m)
        new_w.append(cur_w)
        self.means = np.array(new_m)
        self.weights = np.array(new_w)

    # -- queries -------------------------------------------------------------
    def quantile(self, q: float) -> float:
        """Inverse CDF with linear interpolation between centroids."""
        self._compress()
        if len(self.means) == 0:
            return float("nan")
        if len(self.means) == 1:
            return float(self.means[0])
        total = self.weights.sum()
        target = q * total
        cum = np.cumsum(self.weights) - self.weights / 2.0
        if target <= cum[0]:
            return float(self.means[0])
        if target >= cum[-1]:
            return float(self.means[-1])
        i = np.searchsorted(cum, target) - 1
        frac = (target - cum[i]) / (cum[i + 1] - cum[i])
        # Endpoint-exact lerp: a + frac*(b-a) can overshoot b by ~1 ulp when
        # frac == 1.0 (FP tie boundary), stepping past a run of equal
        # centroids; (1-frac)*a + frac*b returns b exactly at frac == 1.
        return float((1.0 - frac) * self.means[i] + frac * self.means[i + 1])

    def quantile_many(self, qs: np.ndarray) -> np.ndarray:
        """Vectorized inverse CDF — one compress + cumsum for the whole
        probe batch; element semantics identical to ``quantile()``."""
        self._compress()
        qs = np.asarray(qs, dtype=np.float64)
        if len(self.means) == 0:
            return np.full(len(qs), np.nan)
        if len(self.means) == 1:
            return np.full(len(qs), float(self.means[0]))
        total = self.weights.sum()
        targets = qs * total
        cum = np.cumsum(self.weights) - self.weights / 2.0
        i = np.clip(np.searchsorted(cum, targets) - 1, 0, len(cum) - 2)
        # both np.where branches evaluate, so extreme/NaN inputs would
        # emit overflow/invalid RuntimeWarnings from the dead branch —
        # the selected values are exact either way
        with np.errstate(over="ignore", invalid="ignore"):
            frac = (targets - cum[i]) / (cum[i + 1] - cum[i])
            # endpoint-exact lerp, same tie-boundary guard as quantile()
            out = (1.0 - frac) * self.means[i] + frac * self.means[i + 1]
            out = np.where(targets >= cum[-1], self.means[-1], out)
            return np.where(targets <= cum[0], self.means[0], out)

    def cdf(self, x: float) -> float:
        self._compress()
        if len(self.means) == 0:
            return float("nan")
        total = self.weights.sum()
        cum = np.cumsum(self.weights) - self.weights / 2.0
        if x <= self.means[0]:
            return 0.0 if x < self.means[0] else float(cum[0] / total)
        if x >= self.means[-1]:
            return 1.0
        i = int(np.searchsorted(self.means, x)) - 1
        i = max(0, min(i, len(self.means) - 2))
        span = self.means[i + 1] - self.means[i]
        frac = (x - self.means[i]) / span if span > 0 else 0.0
        # endpoint-exact lerp (same tie-boundary guard as quantile())
        return float(((1.0 - frac) * cum[i] + frac * cum[i + 1]) / total)

    def cdf_many(self, xs: np.ndarray) -> np.ndarray:
        """Vectorized CDF; element semantics identical to ``cdf()``."""
        self._compress()
        xs = np.asarray(xs, dtype=np.float64)
        if len(self.means) == 0:
            return np.full(len(xs), np.nan)
        total = self.weights.sum()
        cum = np.cumsum(self.weights) - self.weights / 2.0
        if len(self.means) == 1:
            return np.where(xs < self.means[0], 0.0,
                            np.where(xs > self.means[0], 1.0,
                                     float(cum[0] / total)))
        i = np.clip(np.searchsorted(self.means, xs) - 1, 0,
                    len(self.means) - 2)
        # dead np.where branches on extreme/NaN inputs would emit
        # overflow/invalid RuntimeWarnings; the selected values are
        # exact either way
        with np.errstate(over="ignore", invalid="ignore"):
            span = self.means[i + 1] - self.means[i]
            safe = np.where(span > 0, span, 1.0)
            frac = np.where(span > 0, (xs - self.means[i]) / safe, 0.0)
            # endpoint-exact lerp (same tie-boundary guard as cdf())
            out = ((1.0 - frac) * cum[i] + frac * cum[i + 1]) / total
            out = np.where(xs >= self.means[-1], 1.0, out)
            # scalar cdf checks the left edge FIRST, so it wins ties
            return np.where(xs <= self.means[0],
                            np.where(xs < self.means[0], 0.0,
                                     float(cum[0] / total)), out)

    def count(self) -> float:
        return float(self.weights.sum())

    # -- serde ----------------------------------------------------------------
    def serialize(self) -> bytes:
        self._compress()
        head = _MAGIC + struct.pack("<di", self.compression, len(self.means))
        return head + self.means.tobytes() + self.weights.tobytes()

    @classmethod
    def deserialize(cls, data: bytes) -> "TDigest":
        assert data[:4] == _MAGIC, "bad t-digest payload"
        compression, n = struct.unpack("<di", data[4:16])
        body = np.frombuffer(data[16:], dtype=np.float64)
        return cls(compression, body[:n].copy(), body[n:2 * n].copy())
