"""Scalar probe + element functions over sketch binary columns — the
`hll_cardinality` / `freq` / `topk` / `dist_quantile` / `bloom_contains`
family plus the element-wise constructors/updaters ``hll_empty`` /
``hll_add`` / ``bloom_add`` / ``topk_increment`` / ``freq_add`` /
``dist_add`` / ``tdigest_compress`` / ``cmsketch_empty``
(reference ``pipelinedb--1.0.0.sql:1086-2174``).

Each probe has a plain-Python form (driver-side use on collected bytes)
and a Spark UDF form (column expressions).  HLL *aggregate* states map
to Spark's native Datasketches exprs (no Python); the HLL *element*
family uses the library's own updatable PHLL format
(``sketches/hll.py``) — the two formats do not mix, and
``hll_cardinality(col, element_format=True)`` selects the PHLL probe.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pipelinedb_spark.sketches.bloom import BloomFilter
from pipelinedb_spark.sketches.cms import CountMinSketch
from pipelinedb_spark.sketches.hll import HyperLogLog
from pipelinedb_spark.sketches.tdigest import TDigest
from pipelinedb_spark.sketches.topk import SpaceSaving

# -- HLL: aggregate states are native Spark (Datasketches) -------------------

def hll_cardinality(col: Column, element_format: bool = False) -> Column:
    """Estimate NDV from an HLL state column.  Aggregate states
    (hll_agg / hll_sketch_agg) are Datasketches binaries → native
    expression; ``element_format=True`` probes the updatable PHLL
    format built by hll_empty()/hll_add()."""
    if element_format:
        return _hll_elem_cardinality(col)
    return F.hll_sketch_estimate(col)


def hll_union(a: Column, b: Column) -> Column:
    return F.hll_union(a, b)


# -- HLL element family (PHLL format, reference hll_empty/hll_add) ----------

def hll_empty(p: int = 14) -> Column:
    """Fresh element-format HLL as a literal column (reference
    hll_empty, pipelinedb--1.0.0.sql:1086)."""
    return F.lit(HyperLogLog(p).serialize())


@F.udf(T.BinaryType())
def _hll_add_udf(state, value):
    if value is None:
        return bytes(state) if state is not None else None
    hll = HyperLogLog() if state is None else HyperLogLog.deserialize(state)
    return hll.add(value).serialize()


def hll_add(state: Column, value: Column) -> Column:
    """hll_add(hll, x) — element-wise update (reference
    pipelinedb--1.0.0.sql:1098-1118)."""
    return _hll_add_udf(state, value)


@F.udf(T.LongType())
def _hll_elem_cardinality(state):
    return None if state is None else \
        HyperLogLog.deserialize(bytes(state)).cardinality()


@F.udf(T.BinaryType())
def _hll_merge_udf(a, b):
    if a is None:
        return bytes(b) if b is not None else None
    if b is None:
        return bytes(a)
    return (HyperLogLog.deserialize(bytes(a))
            .merge(HyperLogLog.deserialize(bytes(b))).serialize())


def hll_merge(a: Column, b: Column) -> Column:
    """Pairwise union of element-format HLLs."""
    return _hll_merge_udf(a, b)


@F.udf(T.StringType())
def hll_print(state):
    """Human-readable HLL summary (reference hll_print,
    pipelinedb--1.0.0.sql:1206)."""
    if state is None:
        return None
    data = bytes(state)
    if HyperLogLog.is_element_format(data):
        return HyperLogLog.deserialize(data).summary()
    return f"datasketches hll ({len(data)} bytes)"


# -- t-digest ----------------------------------------------------------------

def dist_quantile_py(state: bytes, q: float) -> float:
    return TDigest.deserialize(bytes(state)).quantile(q)


def dist_cdf_py(state: bytes, x: float) -> float:
    return TDigest.deserialize(bytes(state)).cdf(x)


@F.udf(T.DoubleType())
def dist_quantile(state, q):
    return None if state is None else dist_quantile_py(state, float(q))


@F.udf(T.DoubleType())
def dist_cdf(state, x):
    return None if state is None else dist_cdf_py(state, float(x))


# -- count-min ----------------------------------------------------------------

def freq_py(state: bytes, value) -> int:
    return CountMinSketch.deserialize(bytes(state)).query(str(value))


def freq_total_py(state: bytes) -> int:
    return CountMinSketch.deserialize(bytes(state)).total()


@F.udf(T.LongType())
def freq(state, value):
    return None if state is None else freq_py(state, value)


@F.udf(T.LongType())
def freq_total(state):
    return None if state is None else freq_total_py(state)


@F.udf(T.DoubleType())
def freq_norm(state, value):
    if state is None:
        return None
    sk = CountMinSketch.deserialize(bytes(state))
    tot = sk.total()
    return (sk.query(str(value)) / tot) if tot else None


# -- top-k ---------------------------------------------------------------------

def topk_py(state: bytes, k: int | None = None) -> list[tuple[str, int]]:
    return SpaceSaving.deserialize(bytes(state)).topk(k)


@F.udf(T.ArrayType(T.StringType()))
def topk_values(state, k):
    return None if state is None else [v for v, _ in topk_py(state, int(k))]


@F.udf(T.ArrayType(T.LongType()))
def topk_freqs(state, k):
    return None if state is None else [c for _, c in topk_py(state, int(k))]


@F.udf(T.ArrayType(T.StructType([T.StructField("value", T.StringType()), T.StructField("freq", T.LongType())])))
def topk(state, k):
    if state is None:
        return None
    return [{"value": v, "freq": c} for v, c in topk_py(state, int(k))]


# -- bloom ----------------------------------------------------------------------

def bloom_contains_py(state: bytes, value) -> bool:
    return BloomFilter.deserialize(bytes(state)).contains(str(value))


def bloom_cardinality_py(state: bytes) -> int:
    return BloomFilter.deserialize(bytes(state)).cardinality()


@F.udf(T.BooleanType())
def bloom_contains(state, value):
    return None if state is None else bloom_contains_py(state, value)


@F.udf(T.LongType())
def bloom_cardinality(state):
    return None if state is None else bloom_cardinality_py(state)


# -- element constructors / updaters (reference sql:1086-2174) ---------------

import numpy as np  # noqa: E402  (element updaters batch via numpy)


def bloom_empty(p: float | None = None, n: int | None = None) -> Column:
    """Fresh bloom filter literal (reference bloom_empty)."""
    kw = {}
    if p is not None:
        kw["p"] = p
    if n is not None:
        kw["n"] = n
    return F.lit(BloomFilter(**kw).serialize())


@F.udf(T.BinaryType())
def _bloom_add_udf(state, value):
    if value is None:
        return bytes(state) if state is not None else None
    bf = BloomFilter() if state is None else \
        BloomFilter.deserialize(bytes(state))
    bf.add_many(np.array([str(value)]))
    return bf.serialize()


def bloom_add(state: Column, value: Column) -> Column:
    """bloom_add(bloom, x) (reference pipelinedb--1.0.0.sql:1300s)."""
    return _bloom_add_udf(state, value)


def topk_empty(k: int = 10) -> Column:
    """Fresh space-saving sketch literal (reference topk_empty)."""
    return F.lit(SpaceSaving(k).serialize())


@F.udf(T.BinaryType())
def _topk_increment_udf(state, value, weight):
    if value is None:
        return bytes(state) if state is not None else None
    ss = SpaceSaving() if state is None else \
        SpaceSaving.deserialize(bytes(state))
    return ss.increment(str(value), int(weight)).serialize()


def topk_increment(state: Column, value: Column,
                   weight: Column | int = 1) -> Column:
    """topk_increment(topk, x [, weight]) (reference topkfuncs.c)."""
    w = F.lit(weight) if isinstance(weight, int) else weight
    return _topk_increment_udf(state, value, w)


def cmsketch_empty(eps: float | None = None, p: float | None = None) -> Column:
    """Fresh count-min sketch literal (reference cmsketch_empty,
    src/cmsketch.c:21-22 defaults)."""
    kw = {}
    if eps is not None:
        kw["eps"] = eps
    if p is not None:
        kw["p"] = p
    return F.lit(CountMinSketch(**kw).serialize())


@F.udf(T.BinaryType())
def _freq_add_udf(state, value, weight):
    if value is None:
        return bytes(state) if state is not None else None
    sk = CountMinSketch() if state is None else \
        CountMinSketch.deserialize(bytes(state))
    sk.add_many(np.array([str(value)]), np.array([int(weight)]))
    return sk.serialize()


def freq_add(state: Column, value: Column,
             weight: Column | int = 1) -> Column:
    """freq_add(cms, x [, weight]) (reference freqfuncs.c)."""
    w = F.lit(weight) if isinstance(weight, int) else weight
    return _freq_add_udf(state, value, w)


def dist_empty(compression: float = 200.0) -> Column:
    """Fresh t-digest literal (reference dist_empty)."""
    return F.lit(TDigest(compression).serialize())


@F.udf(T.BinaryType())
def _dist_add_udf(state, value, weight):
    if value is None:
        return bytes(state) if state is not None else None
    td = TDigest() if state is None else TDigest.deserialize(bytes(state))
    for _ in range(int(weight)):
        td.add_many(np.array([float(value)]))
    return td.serialize()


def dist_add(state: Column, value: Column,
             weight: Column | int = 1) -> Column:
    """dist_add(tdigest, x [, weight]) (reference distfuncs.c)."""
    w = F.lit(weight) if isinstance(weight, int) else weight
    return _dist_add_udf(state, value, w)


@F.udf(T.BinaryType())
def tdigest_compress(state):
    """Force centroid compression of a t-digest state (reference
    tdigest_compress, src/tdigest.c)."""
    if state is None:
        return None
    td = TDigest.deserialize(bytes(state))
    td._compress()
    return td.serialize()
