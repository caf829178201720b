"""Wire the sketch library into the combinable-aggregate registry.

Each sketch aggregate follows the same partial/merge/finalize contract
as the built-ins (see ``aggregates.py``): the *partial* step builds a
sketch from the raw micro-batch (Arrow-batched grouped-agg pandas UDF —
PipelineDB's worker transition, ``src/worker.c``), the *merge* step
unions serialized sketches (the combiner, ``src/combiner.c:1323``), and
*finalize* probes the merged sketch.

Scale note: a grouped-agg pandas UDF ships each micro-batch group to
one Python worker — identical to the reference's per-batch transition
cost, and fine because batches are bounded; the cross-batch path (the
one that sees all data at 100 TB) only ever merges fixed-size binary
states.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, BinaryType, DoubleType

from pipelinedb_spark.aggregates import AggRegistry, AggSpec
from pipelinedb_spark.sketches.bloom import BloomFilter
from pipelinedb_spark.sketches.cms import CountMinSketch
from pipelinedb_spark.sketches.tdigest import TDigest
from pipelinedb_spark.sketches.topk import SpaceSaving


def _expr(arg: str):
    return F.expr(arg)


def _lit_number(arg: str) -> float:
    return float(arg.strip().strip("'"))


# -- grouped-agg UDAF builders (created per call so literal args bind) ------

def _tdigest_build(compression: float):
    @pandas_udf(BinaryType())
    def build(v: pd.Series) -> bytes:
        return TDigest(compression).add_many(v.dropna().to_numpy()).serialize()
    return build


@pandas_udf(BinaryType())
def _tdigest_merge(states: pd.Series) -> bytes:
    acc = TDigest()
    for s in states.dropna():
        acc = acc.merge(TDigest.deserialize(bytes(s)))
    return acc.serialize()


def tdigest_partial_states(df, key_col: str, value_col: str,
                           compression: float = 200.0,
                           one_phase_cap: int | None = None):
    """Size-gated t-digest build for one-shot (non-engine) queries.

    Above the gate: per-task partial digests out of a ``mapInPandas``
    pass over the (spread) scan, so only fixed-size digest states
    reach the ``_tdigest_merge`` shuffle — the grouped-agg UDAF form
    ships every raw value to one task per group, which at corpus
    scale is the classic few-hot-reducers shape (guide §2.3
    aggregate-before-shuffle).  The engine CV path already does
    exactly this split (worker partial → combiner ``_tdigest_merge``).

    Below the gate (Catalyst size estimate ≤ ``one_phase_cap``,
    default 32 MiB, env ``SPARK_GRAFT_TDIGEST_ONE_PHASE_CAP``): the
    one-phase grouped UDAF — measured 0.97 vs 1.62 s at sf0.1
    (0.9 MiB estimate) and 1.73 vs 2.56 s at sf1 (9 MiB), where the
    two-phase shape's extra stages cost more than the raw-value
    shuffle it avoids; at sf10 (91 MiB, 10M rows) two-phase measured
    1.36x FASTER (5.27 vs 7.16 s best-of-3 interleaved,
    BENCH_SCALING_R16OPS.json), so the r16 default sits at the
    geometric middle of the measured crossover (9 -> 91 MiB).  An
    UNKNOWN size estimate fails toward the scalable two-phase path
    (the `_plan_size_bytes` contract).
    Returns (key_col, td) with one merged digest per key; estimates
    differ between the two shapes only at merge-order precision, far
    inside every consumer's self-verification bound."""
    import os

    from pyspark.sql import types as T
    from pipelinedb_spark.operators import spread_input
    from pipelinedb_spark.operators.similarity import _plan_size_bytes

    sel = df.select(F.col(key_col), F.col(value_col))
    if one_phase_cap is None:
        one_phase_cap = int(os.environ.get(
            "SPARK_GRAFT_TDIGEST_ONE_PHASE_CAP", str(32 << 20)))
    if _plan_size_bytes(sel) <= one_phase_cap:
        return sel.groupBy(key_col).agg(
            _tdigest_build(compression)(F.col(value_col)).alias("td"))

    src = spread_input(sel)
    key_dt = src.schema[key_col].dataType

    def partials(batches):
        accs: dict = {}
        for pdf in batches:
            for k, sub in pdf.groupby(key_col, dropna=False)[value_col]:
                acc = accs.get(k)
                if acc is None:
                    acc = accs[k] = TDigest(compression)
                acc.add_many(sub.dropna().to_numpy())
        if accs:
            yield pd.DataFrame(
                {key_col: list(accs.keys()),
                 "td": [d.serialize() for d in accs.values()]})

    out_schema = T.StructType([T.StructField(key_col, key_dt),
                               T.StructField("td", T.BinaryType())])
    return (src.mapInPandas(partials, out_schema)
            .groupBy(key_col).agg(_tdigest_merge(F.col("td")).alias("td")))


def _cms_build():
    @pandas_udf(BinaryType())
    def build(v: pd.Series) -> bytes:
        sk = CountMinSketch()
        sk.add_many(v.dropna().to_numpy())
        return sk.serialize()
    return build


@pandas_udf(BinaryType())
def _cms_merge(states: pd.Series) -> bytes:
    acc = None
    for s in states.dropna():
        sk = CountMinSketch.deserialize(bytes(s))
        acc = sk if acc is None else acc.merge(sk)
    return (acc or CountMinSketch()).serialize()


def _topk_build(k: int):
    @pandas_udf(BinaryType())
    def build(v: pd.Series) -> bytes:
        return SpaceSaving(k).add_many(v.dropna().tolist()).serialize()
    return build


def _topk_build_weighted(k: int):
    """Weighted FSS build — each value contributes its weight instead
    of 1 (reference topk_agg_weightedtrans, src/topkfuncs.c:34-686;
    registration pipelinedb--1.0.0.sql:1748-1901).  NULL weights count
    as 1, matching the unweighted transition."""
    @pandas_udf(BinaryType())
    def build(v: pd.Series, w: pd.Series) -> bytes:
        mask = v.notna()
        vals = v[mask].tolist()
        wts = w[mask].fillna(1).astype("int64").tolist()
        return SpaceSaving(k).add_many(vals, wts).serialize()
    return build


@pandas_udf(BinaryType())
def _topk_merge(states: pd.Series) -> bytes:
    acc = None
    for s in states.dropna():
        sk = SpaceSaving.deserialize(bytes(s))
        acc = sk if acc is None else acc.merge(sk)
    return (acc or SpaceSaving()).serialize()


def _bloom_build():
    @pandas_udf(BinaryType())
    def build(v: pd.Series) -> bytes:
        return BloomFilter().add_many(v.dropna().to_numpy()).serialize()
    return build


def _bloom_merge(intersect: bool = False):
    @pandas_udf(BinaryType())
    def merge(states: pd.Series) -> bytes:
        acc = None
        for s in states.dropna():
            sk = BloomFilter.deserialize(bytes(s))
            acc = sk if acc is None else (
                acc.intersection(sk) if intersect else acc.union(sk))
        return (acc or BloomFilter()).serialize()
    return merge


# -- finalize UDFs (Arrow-batched, like every other sketch probe in
#    functions/sketch_fns.py — an overlay over millions of groups must
#    not pay pickled row-at-a-time transfer) ---------------------------------

def _tdigest_quantile_pdf(q: float):
    """percentile finalizer bound to a literal q at plan-build time;
    identical states within a batch deserialize once."""
    from pipelinedb_spark.functions.sketch_fns import _state_groups

    @pandas_udf(DoubleType())
    def fin(state: pd.Series) -> pd.Series:
        import numpy as np
        out = np.full(len(state), None, dtype=object)
        for b, ix in _state_groups(state):
            res = TDigest.deserialize(b).quantile_many(
                np.full(len(ix), q))
            out[ix] = list(res)
        return pd.Series(out, dtype=object)
    return fin


def _tdigest_quantiles_pdf(qs: list[float]):
    """ARRAY[] percentile form: one vectorized quantile_many per
    distinct state, emitted as a float8[] row value."""
    from pipelinedb_spark.functions.sketch_fns import _state_groups

    @pandas_udf(ArrayType(DoubleType()))
    def fin(state: pd.Series) -> pd.Series:
        import numpy as np
        arr = np.asarray(qs, dtype=np.float64)
        out = np.full(len(state), None, dtype=object)
        for b, ix in _state_groups(state):
            res = list(TDigest.deserialize(b).quantile_many(arr))
            out[ix] = [list(res) for _ in ix]
        return pd.Series(out, dtype=object)
    return fin


def _parse_pct_arg(arg: str) -> float | list[float]:
    """percentile argument: scalar literal or ARRAY[...] literal
    (reference registers scalar AND float8[] aggregate forms,
    pipelinedb--1.0.0.sql:1538,1569)."""
    s = arg.strip()
    # PG syntax ARRAY[...] (the reference's form) and Spark's array(...)
    m = re.match(r"(?i)^array\s*\[(.*)\]$", s, re.S) or \
        re.match(r"(?i)^array\s*\((.*)\)$", s, re.S)
    if m:
        return [float(x.strip().strip("'")) for x in m.group(1).split(",")]
    return _lit_number(s)


def register_all(registry: AggRegistry) -> None:
    # dist_agg(x [,compression]) — t-digest column (reference
    # distfuncs.c:25-397); state IS the value.
    def dist_partial(args):
        comp = _lit_number(args[1]) if len(args) > 1 else 200.0
        return {"td": _tdigest_build(comp)(_expr(args[0]).cast("double"))}

    registry.register(AggSpec(
        "dist_agg", dist_partial,
        lambda s: {"td": _tdigest_merge(s("td"))},
        lambda s, a: s("td"), state_is_value=True, pandas=True))

    # percentile_cont(p) WITHIN GROUP (ORDER BY x) → t-digest backed
    # (reference hllfuncs.c:780-1005); analyzer folds args to (p, x).
    # p may be a scalar literal OR an ARRAY[...] literal — the
    # reference registers both forms (sql:1538,1569); the array form
    # finalizes to float8[].
    def pc_partial(args):
        return {"td": _tdigest_build(200.0)(_expr(args[1]).cast("double"))}

    def pc_finalize(s, a):
        p = _parse_pct_arg(a[0])
        if isinstance(p, list):
            return _tdigest_quantiles_pdf(p)(s("td"))
        return _tdigest_quantile_pdf(p)(s("td"))

    registry.register(AggSpec(
        "combinable_percentile_cont", pc_partial,
        lambda s: {"td": _tdigest_merge(s("td"))},
        pc_finalize, pandas=True))

    # freq_agg(x) — count-min sketch (reference freqfuncs.c:26-409).
    registry.register(AggSpec(
        "freq_agg",
        lambda args: {"cms": _cms_build()(_expr(args[0]).cast("string"))},
        lambda s: {"cms": _cms_merge(s("cms"))},
        lambda s, a: s("cms"), state_is_value=True, pandas=True))
    registry.register(AggSpec(
        "freq_merge_agg",
        lambda args: {"cms": _cms_merge(_expr(args[0]))},
        lambda s: {"cms": _cms_merge(s("cms"))},
        lambda s, a: s("cms"), state_is_value=True, pandas=True))

    # topk_agg(x, k[, weight]) — filtered-space-saving (reference
    # topkfuncs.c; weighted transition topkfuncs.c:34-686).
    def topk_partial(args):
        k = int(_lit_number(args[1])) if len(args) > 1 else 10
        if len(args) > 2:
            return {"ss": _topk_build_weighted(k)(
                _expr(args[0]).cast("string"),
                _expr(args[2]).cast("long"))}
        return {"ss": _topk_build(k)(_expr(args[0]).cast("string"))}

    registry.register(AggSpec(
        "topk_agg", topk_partial,
        lambda s: {"ss": _topk_merge(s("ss"))},
        lambda s, a: s("ss"), state_is_value=True, pandas=True))
    registry.register(AggSpec(
        "topk_merge_agg",
        lambda args: {"ss": _topk_merge(_expr(args[0]))},
        lambda s: {"ss": _topk_merge(s("ss"))},
        lambda s, a: s("ss"), state_is_value=True, pandas=True))

    # bloom_agg(x) / bloom_union_agg / bloom_intersection_agg
    # (reference bloomfuncs.c:30-454).
    registry.register(AggSpec(
        "bloom_agg",
        lambda args: {"bf": _bloom_build()(_expr(args[0]).cast("string"))},
        lambda s: {"bf": _bloom_merge()(s("bf"))},
        lambda s, a: s("bf"), state_is_value=True, pandas=True))
    registry.register(AggSpec(
        "bloom_union_agg",
        lambda args: {"bf": _bloom_merge()(_expr(args[0]))},
        lambda s: {"bf": _bloom_merge()(s("bf"))},
        lambda s, a: s("bf"), state_is_value=True, pandas=True))
    registry.register(AggSpec(
        "bloom_intersection_agg",
        lambda args: {"bf": _bloom_merge(intersect=True)(_expr(args[0]))},
        lambda s: {"bf": _bloom_merge(intersect=True)(s("bf"))},
        lambda s, a: s("bf"), state_is_value=True, pandas=True))
