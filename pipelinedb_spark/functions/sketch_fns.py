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

All UDF forms are Arrow-batched ``pandas_udf``s: state bytes cross the
JVM↔Python boundary in Arrow record batches instead of pickled rows,
so applying an element updater or probe over a large column pays one
(de)serialization per BATCH of transfer overhead, not per row (the
per-row sketch update itself is the same work the reference's per-call
C functions do).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from pipelinedb_spark.sketches.bloom import BloomFilter
from pipelinedb_spark.sketches.cms import CountMinSketch
from pipelinedb_spark.sketches.hll import HyperLogLog
from pipelinedb_spark.sketches.tdigest import TDigest
from pipelinedb_spark.sketches.topk import SpaceSaving


def _null(v) -> bool:
    """None/NaN scalar check (Arrow nulls arrive as None for object
    series, NaN for float series)."""
    return v is None or (isinstance(v, float) and v != v)


def _state_groups(state: pd.Series):
    """(state_bytes, row-index ndarray) per distinct non-null state —
    the probe UDFs deserialize once and run the sketch's VECTORIZED
    query over each group's rows (typically one group per batch when a
    matrel sketch is joined onto events)."""
    groups: dict[bytes, list[int]] = {}
    for i, s in enumerate(state):
        if s is not None:
            groups.setdefault(bytes(s), []).append(i)
    return [(b, np.asarray(ix)) for b, ix in groups.items()]


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


@pandas_udf(T.BinaryType())
def _hll_add_udf(state: pd.Series, value: pd.Series) -> pd.Series:
    out = []
    for s, v in zip(state, value):
        if _null(v):
            out.append(bytes(s) if s is not None else None)
            continue
        hll = HyperLogLog() if s is None \
            else HyperLogLog.deserialize(bytes(s))
        out.append(hll.add(v).serialize())
    return pd.Series(out, dtype=object)


def hll_add(state: Column, value: Column) -> Column:
    """hll_add(hll, x) — element-wise update (reference
    pipelinedb--1.0.0.sql:1098-1118)."""
    return _hll_add_udf(state, value)


@pandas_udf(T.LongType())
def _hll_elem_cardinality(state: pd.Series) -> pd.Series:
    out = np.full(len(state), None, dtype=object)
    for b, ix in _state_groups(state):
        out[ix] = HyperLogLog.deserialize(b).cardinality()
    return pd.Series(out, dtype=object).astype("Int64")


@pandas_udf(T.BinaryType())
def _hll_merge_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    out = []
    for x, y in zip(a, b):
        if x is None:
            out.append(bytes(y) if y is not None else None)
        elif y is None:
            out.append(bytes(x))
        else:
            out.append(HyperLogLog.deserialize(bytes(x))
                       .merge(HyperLogLog.deserialize(bytes(y)))
                       .serialize())
    return pd.Series(out, dtype=object)


def hll_merge(a: Column, b: Column) -> Column:
    """Pairwise union of element-format HLLs."""
    return _hll_merge_udf(a, b)


@pandas_udf(T.StringType())
def hll_print(state: pd.Series) -> pd.Series:
    """Human-readable HLL summary (reference hll_print,
    pipelinedb--1.0.0.sql:1206)."""
    def one(s):
        if s is None:
            return None
        data = bytes(s)
        if HyperLogLog.is_element_format(data):
            return HyperLogLog.deserialize(data).summary()
        return f"datasketches hll ({len(data)} bytes)"
    return pd.Series([one(s) for s in state], dtype=object)


# -- t-digest ----------------------------------------------------------------

def dist_quantile_py(state: bytes, q: float) -> float:
    return TDigest.deserialize(bytes(state)).quantile(q)


def dist_cdf_py(state: bytes, x: float) -> float:
    return TDigest.deserialize(bytes(state)).cdf(x)


@pandas_udf(T.DoubleType())
def dist_quantile(state: pd.Series, q: pd.Series) -> pd.Series:
    out = np.full(len(state), None, dtype=object)
    # a null q coerces to NaN for the vectorized kernel; mask those
    # positions back to NULL (SQL strict-function semantics — the old
    # row UDF raised, silently feeding NaN through searchsorted would
    # return a garbage row instead)
    nulls = q.isna().to_numpy()
    qv = q.to_numpy(dtype="float64", na_value=float("nan"))
    for b, ix in _state_groups(state):
        res = TDigest.deserialize(b).quantile_many(qv[ix])
        out[ix] = list(res)
    out[nulls] = None
    return pd.Series(out, dtype=object)


@pandas_udf(T.DoubleType())
def dist_cdf(state: pd.Series, x: pd.Series) -> pd.Series:
    out = np.full(len(state), None, dtype=object)
    nulls = x.isna().to_numpy()  # null x → NULL result, not NaN garbage
    xv = x.to_numpy(dtype="float64", na_value=float("nan"))
    for b, ix in _state_groups(state):
        res = TDigest.deserialize(b).cdf_many(xv[ix])
        out[ix] = list(res)
    out[nulls] = None
    return pd.Series(out, dtype=object)


# -- count-min ----------------------------------------------------------------

def freq_py(state: bytes, value) -> int:
    return CountMinSketch.deserialize(bytes(state)).query(str(value))


def freq_total_py(state: bytes) -> int:
    return CountMinSketch.deserialize(bytes(state)).total()


@pandas_udf(T.LongType())
def freq(state: pd.Series, value: pd.Series) -> pd.Series:
    out = np.full(len(state), None, dtype=object)
    vals = value.to_numpy(dtype=object)
    nulls = value.isna().to_numpy()  # str(None) would probe "None"
    for b, ix in _state_groups(state):
        sk = CountMinSketch.deserialize(b)
        batch = np.array([str(v) for v in vals[ix]], dtype=object)
        out[ix] = [int(c) for c in sk.query_many(batch)]
    out[nulls] = None
    return pd.Series(out, dtype=object).astype("Int64")


@pandas_udf(T.LongType())
def freq_total(state: pd.Series) -> pd.Series:
    out = np.full(len(state), None, dtype=object)
    for b, ix in _state_groups(state):
        out[ix] = CountMinSketch.deserialize(b).total()
    return pd.Series(out, dtype=object).astype("Int64")


@pandas_udf(T.DoubleType())
def freq_norm(state: pd.Series, value: pd.Series) -> pd.Series:
    out = np.full(len(state), None, dtype=object)
    vals = value.to_numpy(dtype=object)
    nulls = value.isna().to_numpy()  # str(None) would probe "None"
    for b, ix in _state_groups(state):
        sk = CountMinSketch.deserialize(b)
        tot = sk.total()
        if not tot:
            continue  # stays None
        batch = np.array([str(v) for v in vals[ix]], dtype=object)
        out[ix] = list(sk.query_many(batch) / tot)
    out[nulls] = None
    return pd.Series(out, dtype=object)


# -- top-k ---------------------------------------------------------------------

def topk_py(state: bytes, k: int | None = None) -> list[tuple[str, int]]:
    return SpaceSaving.deserialize(bytes(state)).topk(k)


def _topk_memo():
    """Memoize the ranked (value, freq) list per (state, k) — the list
    itself, not just the deserialized sketch."""
    cache: dict[tuple[bytes, int], list] = {}

    def get(s, kk):
        key = (bytes(s), int(kk))
        r = cache.get(key)
        if r is None:
            r = cache[key] = SpaceSaving.deserialize(key[0]).topk(key[1])
        return r
    return get


@pandas_udf(T.ArrayType(T.StringType()))
def topk_values(state: pd.Series, k: pd.Series) -> pd.Series:
    get = _topk_memo()
    return pd.Series(
        [None if s is None else [v for v, _ in get(s, kk)]
         for s, kk in zip(state, k)], dtype=object)


@pandas_udf(T.ArrayType(T.LongType()))
def topk_freqs(state: pd.Series, k: pd.Series) -> pd.Series:
    get = _topk_memo()
    return pd.Series(
        [None if s is None else [c for _, c in get(s, kk)]
         for s, kk in zip(state, k)], dtype=object)


@pandas_udf(T.ArrayType(T.StructType([
    T.StructField("value", T.StringType()),
    T.StructField("freq", T.LongType())])))
def topk(state: pd.Series, k: pd.Series) -> pd.Series:
    get = _topk_memo()
    return pd.Series(
        [None if s is None
         else [{"value": v, "freq": c} for v, c in get(s, kk)]
         for s, kk in zip(state, k)], dtype=object)


# -- bloom ----------------------------------------------------------------------

def bloom_contains_py(state: bytes, value) -> bool:
    return BloomFilter.deserialize(bytes(state)).contains(str(value))


def bloom_cardinality_py(state: bytes) -> int:
    return BloomFilter.deserialize(bytes(state)).cardinality()


@pandas_udf(T.BooleanType())
def bloom_contains(state: pd.Series, value: pd.Series) -> pd.Series:
    out = np.full(len(state), None, dtype=object)
    vals = value.to_numpy(dtype=object)
    for b, ix in _state_groups(state):
        bf = BloomFilter.deserialize(b)
        batch = np.array([str(v) for v in vals[ix]], dtype=object)
        out[ix] = [bool(r) for r in bf.contains_many(batch)]
    return pd.Series(out, dtype=object)


@pandas_udf(T.LongType())
def bloom_cardinality(state: pd.Series) -> pd.Series:
    out = np.full(len(state), None, dtype=object)
    for b, ix in _state_groups(state):
        out[ix] = BloomFilter.deserialize(b).cardinality()
    return pd.Series(out, dtype=object).astype("Int64")


# -- element constructors / updaters (reference sql:1086-2174) ---------------

def bloom_empty(p: float | None = None, n: int | None = None) -> Column:
    """Fresh bloom filter literal (reference bloom_empty)."""
    kw = {}
    if p is not None:
        kw["p"] = p
    if n is not None:
        kw["n"] = n
    return F.lit(BloomFilter(**kw).serialize())


@pandas_udf(T.BinaryType())
def _bloom_add_udf(state: pd.Series, value: pd.Series) -> pd.Series:
    out = []
    for s, v in zip(state, value):
        if _null(v):
            out.append(bytes(s) if s is not None else None)
            continue
        bf = BloomFilter() if s is None \
            else BloomFilter.deserialize(bytes(s))
        bf.add_many(np.array([str(v)]))
        out.append(bf.serialize())
    return pd.Series(out, dtype=object)


def bloom_add(state: Column, value: Column) -> Column:
    """bloom_add(bloom, x) (reference pipelinedb--1.0.0.sql:1300s)."""
    return _bloom_add_udf(state, value)


def topk_empty(k: int = 10) -> Column:
    """Fresh space-saving sketch literal (reference topk_empty)."""
    return F.lit(SpaceSaving(k).serialize())


@pandas_udf(T.BinaryType())
def _topk_increment_udf(state: pd.Series, value: pd.Series,
                        weight: pd.Series) -> pd.Series:
    out = []
    for s, v, w in zip(state, value, weight):
        if _null(v):
            out.append(bytes(s) if s is not None else None)
            continue
        ss = SpaceSaving() if s is None \
            else SpaceSaving.deserialize(bytes(s))
        out.append(ss.increment(str(v), int(w)).serialize())
    return pd.Series(out, dtype=object)


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


@pandas_udf(T.BinaryType())
def _freq_add_udf(state: pd.Series, value: pd.Series,
                  weight: pd.Series) -> pd.Series:
    out = []
    for s, v, w in zip(state, value, weight):
        if _null(v):
            out.append(bytes(s) if s is not None else None)
            continue
        sk = CountMinSketch() if s is None \
            else CountMinSketch.deserialize(bytes(s))
        sk.add_many(np.array([str(v)]), np.array([int(w)]))
        out.append(sk.serialize())
    return pd.Series(out, dtype=object)


def freq_add(state: Column, value: Column,
             weight: Column | int = 1) -> Column:
    """freq_add(cms, x [, weight]) (reference freqfuncs.c)."""
    w = F.lit(weight) if isinstance(weight, int) else weight
    return _freq_add_udf(state, value, w)


def dist_empty(compression: float = 200.0) -> Column:
    """Fresh t-digest literal (reference dist_empty)."""
    return F.lit(TDigest(compression).serialize())


@pandas_udf(T.BinaryType())
def _dist_add_udf(state: pd.Series, value: pd.Series,
                  weight: pd.Series) -> pd.Series:
    out = []
    for s, v, w in zip(state, value, weight):
        if _null(v):
            out.append(bytes(s) if s is not None else None)
            continue
        td = TDigest() if s is None else TDigest.deserialize(bytes(s))
        td.add_many(np.full(int(w), float(v)))
        out.append(td.serialize())
    return pd.Series(out, dtype=object)


def dist_add(state: Column, value: Column,
             weight: Column | int = 1) -> Column:
    """dist_add(tdigest, x [, weight]) (reference distfuncs.c)."""
    w = F.lit(weight) if isinstance(weight, int) else weight
    return _dist_add_udf(state, value, w)


@pandas_udf(T.BinaryType())
def tdigest_compress(state: pd.Series) -> pd.Series:
    """Force centroid compression of a t-digest state (reference
    tdigest_compress, src/tdigest.c)."""
    def one(s):
        if s is None:
            return None
        td = TDigest.deserialize(bytes(s))
        td._compress()
        return td.serialize()
    return pd.Series([one(s) for s in state], dtype=object)
