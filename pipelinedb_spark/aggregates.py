"""Combinable aggregate registry: partial / merge / finalize contract.

PipelineDB requires every continuous-query aggregate to be *combinable*:
a worker computes partial states per micro-batch, a combiner merges those
with on-disk states, and an overlay view finalizes states at read time
(reference: ``src/planner.c:59-189`` partial/combine marking,
``pipelinedb--1.0.0.sql:110-140`` combine_* registrations,
``src/analyzer.c:3370`` make_finalize_call).

Spark translation: each aggregate is a triple of Column-expression
builders —

* ``partial(args)``  : agg exprs over the raw micro-batch producing the
  state columns (runs inside Catalyst's own partial/final split, so
  map-side combine still applies);
* ``merge(s)``       : agg exprs over unioned state rows (old matrel
  state ∪ new batch partials) producing the same state columns;
* ``finalize(s,args)``: scalar expr over merged state producing the
  user-visible value.

State columns for an output column ``out`` are named ``out__<suffix>``.
Everything here is built-in JVM expressions (whole-stage codegen) except
the sketch aggregates, which use Arrow-batched pandas UDAFs over compact
binary states (see ``pipelinedb_spark/sketches``).

The same contract powers user-facing ``combine(col)`` re-rollups
(reference ``src/analyzer.c:4662`` RewriteCombineAggs): re-aggregating a
matrel's state columns under a coarser grouping is just ``merge`` again.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

STATE_SEP = "__"


def state_col(out: str, suffix: str) -> str:
    return f"{out}{STATE_SEP}{suffix}"


@dataclass(frozen=True)
class AggSpec:
    """One combinable aggregate.

    ``partial``: (args: list[sql-expr-str]) -> {suffix: Column agg expr}
    ``merge``:   (s: suffix->Column)        -> {suffix: Column agg expr}
    ``finalize``:(s: suffix->Column, args)  -> Column scalar expr
    """

    name: str
    partial: Callable[[list[str]], dict[str, Column]]
    merge: Callable[[Callable[[str], Column]], dict[str, Column]]
    finalize: Callable[[Callable[[str], Column], list[str]], Column]
    # True when the finalized value is itself the mergeable state
    # (sketch columns like hll_agg / dist_agg / freq_agg outputs).
    state_is_value: bool = False
    # True when partial/merge use grouped-agg pandas UDFs: Spark can't
    # mix those with JVM aggregates in one agg(), so the engine runs
    # them in a second grouped pass joined back on the keys.
    pandas: bool = False
    # Optional args-aware merge (s, call_args) — used when the merged
    # state must be re-bounded with a per-call argument (e.g.
    # first_values' n) so matrel state stays O(bound) per group.
    merge_with_args: Callable[
        [Callable[[str], Column], list[str]], dict[str, Column]] | None = None

    def merge_exprs(self, s: Callable[[str], Column],
                    args: list[str]) -> dict[str, Column]:
        if self.merge_with_args is not None:
            return self.merge_with_args(s, args)
        return self.merge(s)


def _e(expr: str) -> Column:
    return F.expr(expr)


# ---------------------------------------------------------------------------
# Simple algebraic aggregates
# ---------------------------------------------------------------------------

def _count_spec() -> AggSpec:
    def partial(args):
        if not args or args[0].strip() in ("*", "1"):
            return {"n": F.count(F.lit(1))}
        return {"n": F.count(_e(args[0]))}

    return AggSpec(
        "count",
        partial,
        lambda s: {"n": F.sum(s("n"))},
        lambda s, a: s("n"),
    )


def _sum_spec() -> AggSpec:
    return AggSpec(
        "sum",
        lambda args: {"s": F.sum(_e(args[0]))},
        lambda s: {"s": F.sum(s("s"))},
        lambda s, a: s("s"),
    )


def _avg_spec() -> AggSpec:
    # avg state = (sum, count) — reference keeps transition arrays
    # (pipelinedb--1.0.0.sql:142-265); Spark equivalent is explicit.
    return AggSpec(
        "avg",
        lambda args: {
            "s": F.sum(_e(args[0])),
            "n": F.count(_e(args[0])),
        },
        lambda s: {"s": F.sum(s("s")), "n": F.sum(s("n"))},
        lambda s, a: s("s") / s("n"),
    )


def _minmax_spec(name: str, fn) -> AggSpec:
    return AggSpec(
        name,
        lambda args: {"m": fn(_e(args[0]))},
        lambda s: {"m": fn(s("m"))},
        lambda s, a: s("m"),
    )


def _bool_spec(name: str, fn) -> AggSpec:
    return AggSpec(
        name,
        lambda args: {"b": fn(_e(args[0]))},
        lambda s: {"b": fn(s("b"))},
        lambda s, a: s("b"),
    )


# ---------------------------------------------------------------------------
# Moment-based: variance / stddev family.  State = (n, s1, s2); merging
# is plain summation, finalize applies the textbook formulas.  Reference
# registers combinable var/stddev transition arrays at
# pipelinedb--1.0.0.sql:458-689.
# ---------------------------------------------------------------------------

def _moment_partial(args):
    x = _e(args[0])
    xd = x.cast("double")
    return {
        "n": F.count(x),
        "s1": F.sum(xd),
        "s2": F.sum(xd * xd),
    }


_MOMENT_MERGE = lambda s: {"n": F.sum(s("n")), "s1": F.sum(s("s1")), "s2": F.sum(s("s2"))}


def _var_samp_fin(s, a):
    n, s1, s2 = s("n"), s("s1"), s("s2")
    return F.when(n > 1, (s2 - s1 * s1 / n) / (n - 1))


def _var_pop_fin(s, a):
    n, s1, s2 = s("n"), s("s1"), s("s2")
    return F.when(n > 0, (s2 - s1 * s1 / n) / n)


def _moment_spec(name, fin) -> AggSpec:
    return AggSpec(name, _moment_partial, _MOMENT_MERGE, fin)


# ---------------------------------------------------------------------------
# Two-variable statistics: corr / covar / regr_* family.  SQL-standard
# argument order is (y, x).  State = (n, sx, sxx, sy, syy, sxy) over rows
# where both args are non-null.  Reference: pipelinedb--1.0.0.sql:267-457.
# ---------------------------------------------------------------------------

def _bivar_partial(args):
    y = _e(args[0]).cast("double")
    x = _e(args[1]).cast("double")
    both = x.isNotNull() & y.isNotNull()
    xv = F.when(both, x)
    yv = F.when(both, y)
    return {
        "n": F.count(xv),
        "sx": F.sum(xv),
        "sxx": F.sum(xv * xv),
        "sy": F.sum(yv),
        "syy": F.sum(yv * yv),
        "sxy": F.sum(xv * yv),
    }


_BIVAR_MERGE = lambda s: {
    k: F.sum(s(k)) for k in ("n", "sx", "sxx", "sy", "syy", "sxy")
}


def _bivar_fin(formula):
    def fin(s, a):
        n, sx, sxx, sy, syy, sxy = (
            s("n"), s("sx"), s("sxx"), s("sy"), s("syy"), s("sxy"))
        return formula(n, sx, sxx, sy, syy, sxy)
    return fin


def _sxx(n, sx, sxx):
    return sxx - sx * sx / n


def _bivar_specs() -> list[AggSpec]:
    def spec(name, formula):
        return AggSpec(name, _bivar_partial, _BIVAR_MERGE, _bivar_fin(formula))

    return [
        spec("corr", lambda n, sx, sxx, sy, syy, sxy: F.when(
            (n > 0) & (_sxx(n, sx, sxx) > 0) & (_sxx(n, sy, syy) > 0),
            (sxy - sx * sy / n) / F.sqrt(_sxx(n, sx, sxx) * _sxx(n, sy, syy)))),
        spec("covar_pop", lambda n, sx, sxx, sy, syy, sxy: F.when(
            n > 0, (sxy - sx * sy / n) / n)),
        spec("covar_samp", lambda n, sx, sxx, sy, syy, sxy: F.when(
            n > 1, (sxy - sx * sy / n) / (n - 1))),
        spec("regr_count", lambda n, *_: n),
        spec("regr_avgx", lambda n, sx, sxx, sy, syy, sxy: F.when(n > 0, sx / n)),
        spec("regr_avgy", lambda n, sx, sxx, sy, syy, sxy: F.when(n > 0, sy / n)),
        spec("regr_sxx", lambda n, sx, sxx, sy, syy, sxy: F.when(n > 0, _sxx(n, sx, sxx))),
        spec("regr_syy", lambda n, sx, sxx, sy, syy, sxy: F.when(n > 0, _sxx(n, sy, syy))),
        spec("regr_sxy", lambda n, sx, sxx, sy, syy, sxy: F.when(n > 0, sxy - sx * sy / n)),
        spec("regr_slope", lambda n, sx, sxx, sy, syy, sxy: F.when(
            (n > 0) & (_sxx(n, sx, sxx) != 0), (sxy - sx * sy / n) / _sxx(n, sx, sxx))),
        spec("regr_intercept", lambda n, sx, sxx, sy, syy, sxy: F.when(
            (n > 0) & (_sxx(n, sx, sxx) != 0),
            (sy - sx * (sxy - sx * sy / n) / _sxx(n, sx, sxx)) / n)),
        spec("regr_r2", lambda n, sx, sxx, sy, syy, sxy: F.when(
            (n > 0) & (_sxx(n, sx, sxx) != 0) & (_sxx(n, sy, syy) != 0),
            F.pow(sxy - sx * sy / n, F.lit(2)) / (_sxx(n, sx, sxx) * _sxx(n, sy, syy))
        ).otherwise(F.when((n > 0) & (_sxx(n, sx, sxx) != 0) & (_sxx(n, sy, syy) == 0), F.lit(1.0)))),
    ]


# ---------------------------------------------------------------------------
# Collection aggregates
# ---------------------------------------------------------------------------

def _array_agg_spec() -> AggSpec:
    # reference: combinable_array_agg aggfuncs.c:62-271
    return AggSpec(
        "array_agg",
        lambda args: {"a": F.collect_list(_e(args[0]))},
        lambda s: {"a": F.flatten(F.collect_list(s("a")))},
        lambda s, a: s("a"),
    )


def _set_agg_spec() -> AggSpec:
    # reference: set_agg aggfuncs.c:377-445; finalized sorted for
    # deterministic reads (PG set_agg is unordered).
    return AggSpec(
        "set_agg",
        lambda args: {"st": F.collect_set(_e(args[0]))},
        lambda s: {"st": F.array_distinct(F.flatten(F.collect_list(s("st"))))},
        lambda s, a: F.sort_array(s("st")),
    )


def _exact_count_distinct_spec() -> AggSpec:
    # reference: exact_count_distinct sql:1040-1047 (set-backed).
    # Scale note: state grows with NDV; hll_count_distinct is the
    # 100 TB-safe variant.
    return AggSpec(
        "exact_count_distinct",
        lambda args: {"st": F.collect_set(_e(args[0]))},
        lambda s: {"st": F.array_distinct(F.flatten(F.collect_list(s("st"))))},
        lambda s, a: F.size(s("st")).cast("long"),
    )


def _parse_str_literal(lit: str) -> str:
    """'abc''d' → abc'd — SQL string literal to Python str."""
    lit = lit.strip()
    if len(lit) >= 2 and lit[0] == "'" and lit[-1] == "'":
        return lit[1:-1].replace("''", "'")
    return lit


def _string_agg_spec() -> AggSpec:
    # delimiter must be a literal (true in every reference test);
    # merge keeps the flat element list, finalize joins.  array_join
    # requires a PYTHON string delimiter (not a Column), so the SQL
    # literal is parsed driver-side.
    def partial(args):
        return {"a": F.collect_list(_e(args[0]))}

    def finalize(s, args):
        delim = _parse_str_literal(args[1]) if len(args) > 1 else ""
        return F.array_join(s("a"), delim)

    return AggSpec(
        "string_agg",
        partial,
        lambda s: {"a": F.flatten(F.collect_list(s("a")))},
        finalize,
    )


def _keyed_spec(name: str, fn) -> AggSpec:
    # keyed_min/keyed_max (reference kv.c:332-393) == min_by/max_by.
    # Mergeable state = the (key, value) pair struct; struct ordering is
    # lexicographic so min/max over the struct keeps the right pair.
    def partial(args):
        key, val = _e(args[0]), _e(args[1])
        pair = F.when(key.isNotNull(), F.struct(key.alias("k"), val.alias("v")))
        return {"p": fn(pair)}

    return AggSpec(
        name,
        partial,
        lambda s: {"p": fn(s("p"))},
        lambda s, a: s("p").getField("v"),
    )


def _first_values_spec() -> AggSpec:
    # first_values(n, col...) — bounded smallest-n prefix by sort key(s)
    # (reference firstvalues.c).  State = sorted top-n array, so memory
    # per group is O(n) regardless of input size: 100 TB-safe.
    def partial(args):
        n = int(args[0])
        cols = [_e(a) for a in args[1:]]
        st = F.struct(*[c.alias(f"c{i}") for i, c in enumerate(cols)])
        return {"fv": F.slice(F.sort_array(F.collect_list(st)), 1, n)}

    def merge_with_args(s, a):
        # re-truncate to n on every merge: matrel state stays O(n) per
        # group like the reference's bounded prefix (firstvalues.c)
        return {"fv": F.slice(
            F.sort_array(F.flatten(F.collect_list(s("fv")))), 1, int(a[0]))}

    return AggSpec(
        "first_values",
        partial,
        lambda s: {"fv": F.sort_array(F.flatten(F.collect_list(s("fv"))))},
        lambda s, a: F.slice(s("fv"), 1, int(a[0])),
        merge_with_args=merge_with_args,
    )


# ---------------------------------------------------------------------------
# HLL family — backed by Spark's native Datasketches HLL
# (hll_sketch_agg / hll_union_agg / hll_sketch_estimate, Spark 3.5+).
# Reference: hllfuncs.c:177-500, hll.c.
# ---------------------------------------------------------------------------

def _hll_partial(args):
    x = _e(args[0])
    # Datasketches agg accepts int/long/string/binary; normalize others.
    return {"h": F.hll_sketch_agg(x.cast("string"))}


def _hll_count_distinct_spec() -> AggSpec:
    return AggSpec(
        "hll_count_distinct",
        _hll_partial,
        lambda s: {"h": F.hll_union_agg(s("h"))},
        lambda s, a: F.hll_sketch_estimate(s("h")),
    )


def _hll_agg_spec() -> AggSpec:
    return AggSpec(
        "hll_agg",
        _hll_partial,
        lambda s: {"h": F.hll_union_agg(s("h"))},
        lambda s, a: s("h"),
        state_is_value=True,
    )


def _hll_union_agg_spec() -> AggSpec:
    # input column already holds sketches
    return AggSpec(
        "hll_union_agg",
        lambda args: {"h": F.hll_union_agg(_e(args[0]))},
        lambda s: {"h": F.hll_union_agg(s("h"))},
        lambda s, a: s("h"),
        state_is_value=True,
    )


# ---------------------------------------------------------------------------
# Hypothetical-set aggregates: combinable rank / percent_rank /
# cume_dist / dense_rank.  Reference rewrites the ordered-set forms to
# counter-based streaming variants (cq_hypothetical_* hllfuncs.c:1096-
# 1233): state = [n, count_less, count_leq]; dense_rank keeps an HLL of
# distinct smaller values.  Analyzer folds WITHIN GROUP args so the
# call shape is fn(v, x).
# ---------------------------------------------------------------------------

def _hs_partial(args):
    v, x = _e(args[0]), _e(args[1])
    return {
        "n": F.count(x),
        "lt": F.count(F.when(x < v, 1)),
        "leq": F.count(F.when(x <= v, 1)),
    }


_HS_MERGE = lambda s: {k: F.sum(s(k)) for k in ("n", "lt", "leq")}


def _hs_specs() -> list[AggSpec]:
    return [
        AggSpec("combinable_rank", _hs_partial, _HS_MERGE,
                lambda s, a: (s("lt") + 1).cast("long")),
        AggSpec("combinable_percent_rank", _hs_partial, _HS_MERGE,
                lambda s, a: F.when(s("n") > 0,
                                    s("lt").cast("double") / s("n"))
                .otherwise(F.lit(0.0))),
        AggSpec("combinable_cume_dist", _hs_partial, _HS_MERGE,
                lambda s, a: (s("leq") + 1).cast("double") / (s("n") + 1)),
        AggSpec("combinable_dense_rank",
                lambda args: {"h": F.hll_sketch_agg(
                    F.when(_e(args[1]) < _e(args[0]),
                           _e(args[1]).cast("string")))},
                lambda s: {"h": F.hll_union_agg(s("h"))},
                lambda s, a: (F.hll_sketch_estimate(s("h")) + 1).cast("long")),
    ]


# ---------------------------------------------------------------------------
# bucket_agg(expr, bucket_id) — assign each value to the bucket of its
# LATEST observation, expose per-bucket distinct cardinalities
# (reference aggfuncs.c:462-931, test bucket_agg.sql).  State: map
# xxhash64(value) -> (bucket_id, ts) — the reference likewise stores
# value HASHES, not values (BucketAggState keeps 32-bit hashes), so
# state row width is bounded per distinct value regardless of value
# length (a wide-row hazard at scale otherwise).  Merge keeps the
# later (ts, bucket) per hash; finalize = array of (bucket_id, count
# distinct values) sorted by bucket id.
# ---------------------------------------------------------------------------

def _latest_per_key(flat):
    """array<struct<k,nt,b>> (nt = negated timestamp) → map entries
    keeping, per key, the element with the LATEST timestamp.  Sort by
    (k asc, nt asc ≡ t desc) then keep each key's first occurrence via
    adjacent-dedup — O(n log n), vs the fold-with-filter formulation
    whose accumulator rescan made it O(n²) per group per batch.

    The adjacent-dedup must NOT reference the sorted array from inside
    a lambda (the r3-r12 formulation did `F.get(srt, i - 1)` in the
    filter predicate): Catalyst inlines the full array_sort expression
    at the reference site and re-evaluates it PER ELEMENT, turning the
    dedup O(n² log n) per group — invisible at sf0.01 (~2k rows/group,
    the driver gate's scale) and a >15-minute stall at sf0.1 (~20k
    rows/group), found by the r13 full-bank sf0.1 oracle sweep.
    Instead, zip the sorted array against its own keys shifted right
    by one (both built once per row, outside any lambda) and keep an
    element iff its key differs from its predecessor's."""
    srt = F.array_sort(flat)
    prev_keys = F.concat(
        F.array(F.lit(None).cast("long")),
        F.transform(srt, lambda e: e.getField("k")))
    # zip_with pads the shorter side with nulls: the extra trailing
    # prev-key pairs with a null element, which the isNotNull filter
    # drops along with the non-first duplicates
    deduped = F.filter(
        F.zip_with(srt, prev_keys,
                   lambda e, pk: F.when(
                       pk.isNull() | (e.getField("k") != pk), e)),
        lambda x: x.isNotNull())
    return F.map_from_entries(F.transform(
        deduped, lambda e: F.struct(
            e.getField("k").alias("key"),
            F.struct((-e.getField("nt")).alias("t"),
                     e.getField("b").alias("b")).alias("value"))))


def _bucket_agg_spec() -> AggSpec:
    def partial(args):
        val = F.xxhash64(_e(args[0]).cast("string"))
        bucket = _e(args[1]).cast("int")
        ts = _e(args[2]) if len(args) > 2 else F.col("arrival_timestamp")
        # per-value latest (ts, bucket): sortable (k, -t, b) triple
        trip = F.struct(val.alias("k"),
                        (-ts.cast("double")).alias("nt"),
                        bucket.alias("b"))
        return {"m": _latest_per_key(F.collect_list(trip))}

    def merge(s):
        # merge maps: per key keep entry with max t
        flat = F.transform(
            F.flatten(F.collect_list(F.map_entries(s("m")))),
            lambda e: F.struct(
                e.getField("key").alias("k"),
                (-e.getField("value").getField("t")).alias("nt"),
                e.getField("value").getField("b").alias("b")))
        return {"m": _latest_per_key(flat)}

    def finalize(s, a):
        entries = F.map_entries(s("m"))
        buckets = F.array_distinct(F.transform(
            entries, lambda e: e.getField("value").getField("b")))
        counts = F.transform(
            F.array_sort(buckets),
            lambda b: F.struct(
                b.alias("bucket_id"),
                F.size(F.filter(entries, lambda e:
                                e.getField("value").getField("b") == b))
                .cast("long").alias("count")))
        return counts

    return AggSpec("bucket_agg", partial, merge, finalize)


# ---------------------------------------------------------------------------
# JSON aggregates: json_agg / json_object_agg (reference json.c:1876-,
# jsonb.c:1523-; combinable via element-list states).
# ---------------------------------------------------------------------------

def _json_agg_spec(name: str = "json_agg") -> AggSpec:
    return AggSpec(
        name,
        lambda args: {"a": F.collect_list(_e(args[0]))},
        lambda s: {"a": F.flatten(F.collect_list(s("a")))},
        lambda s, a: F.to_json(s("a")),
    )


def _json_object_int_sum_spec() -> AggSpec:
    """Sum integer values per JSON key across documents (reference
    json_object_int_sum src/json.c:2728-2826).  State: sorted entry
    array of (key, sum); merge folds entries summing per key."""
    def partial(args):
        entries = F.map_entries(
            F.from_json(_e(args[0]), "map<string,bigint>"))
        return {"m": F.aggregate(
            F.flatten(F.collect_list(entries)),
            F.array().cast("array<struct<key:string,value:bigint>>"),
            _json_sum_fold)}

    def merge(s):
        return {"m": F.aggregate(
            F.flatten(F.collect_list(s("m"))),
            F.array().cast("array<struct<key:string,value:bigint>>"),
            _json_sum_fold)}

    return AggSpec(
        "json_object_int_sum",
        partial,
        merge,
        lambda s, a: F.to_json(F.map_from_entries(F.array_sort(s("m")))),
    )


def _json_sum_fold(acc, e):
    # O(k) per step (k = distinct keys so far, the fold rescans its
    # own accumulator): total O(n·k) per group.  Bounded by the JSON
    # object SCHEMA width, not row count — fine for the telemetry
    # shapes this mirrors (reference json_object_int_sum sums fixed
    # counters); checked at sf0.1 by the r13 oracle sweep.  Unlike the
    # r13 HOF findings, `acc` is the lambda's own argument (a bound
    # variable), so nothing here re-evaluates an outer expression.
    key = e.getField("key")
    val = e.getField("value")
    hit = F.filter(acc, lambda kv: kv.getField("key") == key)
    rest = F.filter(acc, lambda kv: kv.getField("key") != key)
    new_val = F.when(F.size(hit) > 0,
                     F.element_at(hit, 1).getField("value") + val
                     ).otherwise(val)
    return F.concat(rest, F.array(F.struct(key.alias("key"),
                                           new_val.alias("value"))))


def _json_object_agg_spec(name: str = "json_object_agg") -> AggSpec:
    def partial(args):
        k, v = _e(args[0]), _e(args[1])
        return {"a": F.collect_list(F.struct(k.cast("string").alias("key"),
                                             v.alias("value")))}

    return AggSpec(
        name,
        partial,
        lambda s: {"a": F.flatten(F.collect_list(s("a")))},
        lambda s, a: F.to_json(F.map_from_entries(s("a"))),
    )


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

class AggRegistry:
    def __init__(self) -> None:
        self._specs: dict[str, AggSpec] = {}
        for spec in self._builtins():
            self._specs[spec.name] = spec

    @staticmethod
    def _builtins() -> list[AggSpec]:
        specs = [
            _count_spec(),
            _sum_spec(),
            _avg_spec(),
            _minmax_spec("min", F.min),
            _minmax_spec("max", F.max),
            _bool_spec("bool_and", F.bool_and),
            _bool_spec("bool_or", F.bool_or),
            _bool_spec("bit_and", F.bit_and),
            _bool_spec("bit_or", F.bit_or),
            _moment_spec("var_samp", _var_samp_fin),
            _moment_spec("variance", _var_samp_fin),
            _moment_spec("var_pop", _var_pop_fin),
            _moment_spec("stddev_samp", lambda s, a: F.sqrt(_var_samp_fin(s, a))),
            _moment_spec("stddev", lambda s, a: F.sqrt(_var_samp_fin(s, a))),
            _moment_spec("stddev_pop", lambda s, a: F.sqrt(_var_pop_fin(s, a))),
            _array_agg_spec(),
            _set_agg_spec(),
            _exact_count_distinct_spec(),
            _string_agg_spec(),
            _keyed_spec("keyed_min", F.min),
            _keyed_spec("keyed_max", F.max),
            _first_values_spec(),
            _hll_count_distinct_spec(),
            _hll_agg_spec(),
            _hll_union_agg_spec(),
            _bucket_agg_spec(),
            _json_agg_spec(),
            _json_agg_spec("jsonb_agg"),
            _json_object_agg_spec(),
            _json_object_agg_spec("jsonb_object_agg"),
            _json_object_int_sum_spec(),
        ]
        specs.extend(_bivar_specs())
        specs.extend(_hs_specs())
        return specs

    def register(self, spec: AggSpec) -> None:
        self._specs[spec.name] = spec

    def unregister(self, name: str) -> None:
        self._specs.pop(name.lower(), None)

    def get(self, name: str) -> AggSpec | None:
        return self._specs.get(name.lower())

    def __contains__(self, name: str) -> bool:
        return name.lower() in self._specs

    def names(self) -> list[str]:
        return sorted(self._specs)


REGISTRY = AggRegistry()


def register_sketch_aggs() -> None:
    """Attach the pandas-UDAF sketch aggregates (t-digest, CMS, FSS
    top-k, bloom) to the global registry.  Lazy so importing this
    module never forces Arrow/pandas initialisation."""
    from pipelinedb_spark.sketches import register_all

    register_all(REGISTRY)
