"""Space-Saving top-k — mergeable heavy-hitters sketch.

Semantics follow the reference's Filtered-Space-Saving ``topk_agg``
(``src/fss.c``, ``src/topkfuncs.c``): track at most ``capacity``
counters with per-counter error bounds; merge sums counts (and errors)
for shared keys and keeps the top ``capacity`` survivors.  Exact when
the number of distinct keys ≤ capacity.
"""

from __future__ import annotations

import json

_MAGIC = "SSK1"
DEFAULT_SLACK = 4  # capacity = k * slack, mirroring FSS's extra room


class SpaceSaving:
    __slots__ = ("k", "capacity", "counts", "errors")

    def __init__(self, k: int = 10, capacity: int | None = None) -> None:
        self.k = int(k)
        self.capacity = int(capacity or k * DEFAULT_SLACK)
        self.counts: dict[str, int] = {}
        self.errors: dict[str, int] = {}

    def add_many(self, values, weights=None) -> "SpaceSaving":
        for i, v in enumerate(values):
            if v is None:
                continue
            w = 1 if weights is None else int(weights[i])
            key = str(v)
            if key in self.counts:
                self.counts[key] += w
            elif len(self.counts) < self.capacity:
                self.counts[key] = w
                self.errors[key] = 0
            else:
                # replace current minimum (classic space-saving step)
                mkey = min(self.counts, key=self.counts.get)
                mcount = self.counts.pop(mkey)
                self.errors.pop(mkey)
                self.counts[key] = mcount + w
                self.errors[key] = mcount
        return self

    def merge(self, other: "SpaceSaving") -> "SpaceSaving":
        out = SpaceSaving(max(self.k, other.k),
                          max(self.capacity, other.capacity))
        keys = set(self.counts) | set(other.counts)
        merged = {kk: self.counts.get(kk, 0) + other.counts.get(kk, 0)
                  for kk in keys}
        errs = {kk: self.errors.get(kk, 0) + other.errors.get(kk, 0)
                for kk in keys}
        top = sorted(merged, key=lambda kk: (-merged[kk], kk))[: out.capacity]
        out.counts = {kk: merged[kk] for kk in top}
        out.errors = {kk: errs[kk] for kk in top}
        return out

    def topk(self, k: int | None = None) -> list[tuple[str, int]]:
        k = k or self.k
        return sorted(self.counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]

    def increment(self, value, weight: int = 1) -> "SpaceSaving":
        return self.add_many([value], [weight])

    # -- serde ----------------------------------------------------------------
    def serialize(self) -> bytes:
        return json.dumps({
            "m": _MAGIC, "k": self.k, "cap": self.capacity,
            "c": self.counts, "e": self.errors,
        }, separators=(",", ":")).encode()

    @classmethod
    def deserialize(cls, data: bytes) -> "SpaceSaving":
        obj = json.loads(data.decode())
        assert obj.get("m") == _MAGIC, "bad space-saving payload"
        out = cls(obj["k"], obj["cap"])
        out.counts = {k: int(v) for k, v in obj["c"].items()}
        out.errors = {k: int(v) for k, v in obj["e"].items()}
        return out
