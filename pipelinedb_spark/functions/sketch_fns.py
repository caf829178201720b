"""Scalar probe functions over sketch binary columns — the
`hll_cardinality` / `freq` / `topk` / `dist_quantile` / `bloom_contains`
function family (reference ``pipelinedb--1.0.0.sql:1086-2174``).

Each has a plain-Python form (for driver-side use on collected bytes)
and a Spark UDF form (for column expressions).  HLL functions map to
Spark's native Datasketches exprs — no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pipelinedb_spark.sketches.bloom import BloomFilter
from pipelinedb_spark.sketches.cms import CountMinSketch
from pipelinedb_spark.sketches.tdigest import TDigest
from pipelinedb_spark.sketches.topk import SpaceSaving

# -- HLL: native Spark (Datasketches), zero Python --------------------------

def hll_cardinality(col: Column) -> Column:
    return F.hll_sketch_estimate(col)


def hll_union(a: Column, b: Column) -> Column:
    return F.hll_union(a, b)


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
