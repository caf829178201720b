"""The continuous-query engine: streams, continuous views, transforms.

Public surface mirrors PipelineDB's DDL/DML verbs
(``CREATE FOREIGN TABLE … SERVER pipelinedb`` → ``create_stream``,
``CREATE VIEW … WITH (action=materialize)`` → ``create_view``,
``INSERT INTO stream`` → ``insert``, reading a CV → ``read_view``,
``output_of('cv')`` → ``output_of``, ``CREATE VIEW … action=transform``
→ ``create_transform``).  Reference lifecycle:
``src/pipeline_query.c:1600-1995`` (ExecCreateContViewStmt),
``src/worker.c:339-467`` (worker), ``src/combiner.c:1323-1633``
(combine/sync_combine), ``src/reaper.c`` (TTL).

Execution model: PipelineDB is a micro-batch engine (10k-row batches,
50 ms combiner commits).  Here every ``insert`` is one micro-batch that
flows worker-partial-agg → bucketed matrel MERGE → output-stream
emission, all as Spark DataFrame jobs.  ``attach_stream`` additionally
runs the same pipeline continuously from a Structured Streaming source
via ``foreachBatch`` (see ``streaming/runtime.py``).
"""

from __future__ import annotations

import logging
import os
import re
import shutil
import tempfile
import threading
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pipelinedb_spark.aggregates import (REGISTRY, AggRegistry, AggSpec,
                                         state_col)
from pipelinedb_spark.functions.time import ts_epoch
from pipelinedb_spark.analyzer import CQError, CQPlan, analyze
from pipelinedb_spark.matrel import BUCKET_COL, MatrelStore

ARRIVAL_COL = "arrival_timestamp"
STEP_COL = "_step"
GID_COL = "_gid"
SEQ_COL = "_seq"  # arrival serial for append CVs with LIMIT/OFFSET


def _py_coerce(value: Any, dtype: T.DataType) -> Any:
    """Input-representation coercion for Python-literal inserts: cast
    each value to the declared field type, with the string-parse
    fallback PipelineDB applies (reference coerce_raw_input
    src/stream_fdw.c:325-433).  None / NaN → null."""
    if value is None:
        return None
    if isinstance(value, float) and value != value:  # NaN
        return None
    try:
        if isinstance(dtype, (T.LongType, T.IntegerType, T.ShortType,
                              T.ByteType)):
            return int(value)
        if isinstance(dtype, (T.DoubleType, T.FloatType)):
            return float(value)
        if isinstance(dtype, T.StringType):
            return value if isinstance(value, str) else str(value)
        if isinstance(dtype, T.BooleanType):
            if isinstance(value, str):
                return value.strip().lower() in ("t", "true", "1", "yes", "on")
            return bool(value)
        if isinstance(dtype, T.DecimalType):
            import decimal
            return decimal.Decimal(str(value))
        if isinstance(dtype, T.TimestampType) and isinstance(value, str):
            import datetime
            return datetime.datetime.fromisoformat(value)
        # complex types (reference cont_complex_types.sql,
        # typed_streams.sql): recurse element-wise
        if isinstance(dtype, T.ArrayType):
            if isinstance(value, str):
                import json
                value = json.loads(value)
            if not isinstance(value, (list, tuple)):
                raise CQError(f"cannot coerce {value!r} to "
                              f"{dtype.simpleString()}: not a sequence")
            return [_py_coerce(v, dtype.elementType) for v in value]
        if isinstance(dtype, T.MapType):
            if isinstance(value, str):
                import json
                value = json.loads(value)
            if not isinstance(value, dict):
                raise CQError(f"cannot coerce {value!r} to "
                              f"{dtype.simpleString()}: not a mapping")
            return {_py_coerce(k, dtype.keyType):
                    _py_coerce(v, dtype.valueType)
                    for k, v in value.items()}
        if isinstance(dtype, T.StructType):
            if isinstance(value, str):
                import json
                value = json.loads(value)
            if isinstance(value, dict):
                return tuple(_py_coerce(value.get(f.name), f.dataType)
                             for f in dtype.fields)
            if isinstance(value, (list, tuple)):
                if len(value) != len(dtype.fields):
                    raise CQError(
                        f"cannot coerce {value!r} to "
                        f"{dtype.simpleString()}: field count mismatch")
                return tuple(_py_coerce(v, f.dataType)
                             for v, f in zip(value, dtype.fields))
            raise CQError(f"cannot coerce {value!r} to "
                          f"{dtype.simpleString()}")
    except CQError:
        raise
    except (ValueError, TypeError) as e:
        raise CQError(f"cannot coerce {value!r} to {dtype.simpleString()}: {e}")
    return value


def grouped_agg(df: DataFrame, key_cols: list, key_names: list[str],
                jvm_aggs: list, pd_aggs: list) -> DataFrame:
    """groupBy().agg() that tolerates a mix of JVM aggregates and
    grouped-agg pandas UDFs (Spark forbids them in one agg()): when
    both are present, run two grouped passes over the same (bounded,
    checkpointed) micro-batch and join back on the keys null-safely."""
    if not pd_aggs:
        return df.groupBy(*key_cols).agg(*jvm_aggs)
    if not jvm_aggs:
        return df.groupBy(*key_cols).agg(*pd_aggs)
    a = df.groupBy(*key_cols).agg(*jvm_aggs).alias("a")
    b = df.groupBy(*key_cols).agg(*pd_aggs).alias("b")
    if not key_names:
        joined = a.crossJoin(b)
        b_vals = b.columns
    else:
        cond = None
        for k in key_names:
            c = F.col(f"a.{k}").eqNullSafe(F.col(f"b.{k}"))
            cond = c if cond is None else (cond & c)
        joined = a.join(b, cond, "inner")
        b_vals = [c for c in b.columns if c not in key_names]
    return joined.select(*[F.col(f"a.{c}") for c in a.columns],
                         *[F.col(f"b.{c}") for c in b_vals])


@dataclass
class StreamDef:
    name: str
    schema: T.StructType
    # CVs/transforms consuming this stream, in creation order
    readers: list[str] = field(default_factory=list)
    # per-stream ingest counters (reference get_stream_stats,
    # sql:2792-2802 — input_bytes omitted: rows flow as columnar
    # DataFrames, not serialized tuples, so a byte count would be
    # fiction)
    input_rows: int = 0
    input_batches: int = 0


@dataclass
class Stats:
    input_rows: int = 0
    output_rows: int = 0
    batches: int = 0
    errors: int = 0
    exec_ms: float = 0.0


class ContView:
    """One continuous view: analyzer plan + matrel + overlay builder."""

    def __init__(self, ctx: "PipelineContext", name: str, sql: str,
                 plan: CQPlan, ttl: float | None, ttl_column: str | None,
                 max_age_fn: Callable[[], float] | None = None,
                 pk: str | None = None) -> None:
        self.ctx = ctx
        self.name = name
        self.sql = sql
        self.plan = plan
        self.ttl = ttl
        self.ttl_column = ttl_column
        self.active = True
        self.stats = Stats()
        self.matrel = MatrelStore(ctx.spark, ctx.matrel_root, name,
                                  num_buckets=ctx.num_buckets)
        self._registry = ctx.registry
        # pending micro-batches awaiting a combiner commit (the
        # reference's in-memory pre-combine between commit intervals,
        # src/combiner.c:1323-1369 + need_sync :1994)
        # (df, txn) pairs: per-batch txn tags so a commit can drop
        # individual replayed epochs and record EVERY source's high
        # version — a single-slot tag compared versions across
        # different app_ids and lost one source's accounting when
        # attachments changed mid-interval (code-review finding)
        self._pending: list[tuple[DataFrame,
                                  tuple[str, int] | None]] = []
        self._pending_lock = threading.Lock()
        # serializes matrel commits from concurrent writers (dispatch
        # thread vs background reaper/auto-compaction): the manifest
        # swap is last-writer-wins, so an unserialized merge racing a
        # compact could drop the merge's bucket updates
        self.commit_lock = threading.Lock()
        self._group_cols = list(plan.group_names)
        if plan.grouping_sets is not None:
            # grouping sets: matrel keyed by group cols + grouping_id
            # (reference keeps grouping sets on the worker and groups
            # the combiner by the hoisted columns, analyzer.c:2819-2859)
            self._group_cols = self._group_cols + [GID_COL]
        if plan.sw_column is not None:
            self._group_cols = self._group_cols + [STEP_COL]
        # append CV with LIMIT and/or OFFSET: rows carry an arrival
        # serial so the overlay can return the FIRST limit rows after
        # skipping offset, in arrival order (reference cont_limit.sql —
        # the matrel's $pk serial plays this role there)
        self._arrival_log = plan.append and (plan.limit is not None
                                             or plan.offset is not None)
        if self._arrival_log:
            self._group_cols = self._group_cols + [SEQ_COL]
        self._next_seq: int | None = None
        # user-designated matrel primary key (reference WITH (pk='col'),
        # pipeline_query.c:1735-1770, test cont_pk.sql): the designated
        # column replaces the group-hash as the matrel's row identity.
        if pk is not None:
            if not isinstance(pk, str):
                raise CQError("continuous view primary keys must be "
                              "specified with a valid column name")
            valid = set(plan.group_names) | {c.out for c in plan.aggs}
            if pk not in valid:
                raise CQError(f'primary key column "{pk}" not found')
        self.pk = pk
        # bucket identity: a pk that is a group column keys the matrel
        # buckets alone (point-lookups prune by pk hash); a pk on an
        # aggregate output cannot drive bucketing (its value changes
        # with every merge), so bucketing stays on the group hash and
        # pk uniqueness is enforced at read (finalize) time.
        self._bucket_cols = ([pk] if pk in set(plan.group_names)
                             else self._group_cols)
        # SW matrels use a TIME-LEADING bucket layout: bucket id =
        # floor(step_epoch / step), so every row of a bucket shares
        # ONE step and (a) window expiry is a manifest-level bucket
        # drop with zero read/rewrite of live data, (b) merges touch
        # only current-step buckets, (c) reads prune expired buckets
        # from the manifest before opening any file.  This is the
        # parquet analog of the reference's time-leading ls_hash_group
        # locality index (src/pipeline_query.c:771-903,
        # src/hashfuncs.c:93-137).  A store created under the older
        # hash layout keeps it (ensure_layout pins "hash"), preserving
        # replayed roots.
        self._time_bucketed = False
        if plan.sw_column is not None and self._bucket_cols == self._group_cols:
            step = float(plan.sw_step_seconds)
            if self.matrel.ensure_layout("step") == "step":
                self._time_bucketed = True
                # ROUND, not floor: STEP_COL is floor(e/step)*step
                # round-tripped through microsecond timestamps, so for
                # fractional steps (e.g. 2.1 s) the stored epoch sits
                # ±µs around k*step and floor(epoch/step) lands in
                # bucket k-1 for ~20% of steps — which would make
                # manifest-level expiry/pruning drop in-window rows.
                # epoch/step is always k ± 1e-9, never near .5, so
                # round() recovers k exactly.
                self.matrel.bucket_expr_fn = lambda: F.round(
                    ts_epoch(F.col(STEP_COL)) / F.lit(step)).cast("long")
        # matrel CHECK constraints: name -> boolean SQL expr over the
        # CV's user-visible columns (reference matrel_constraints.sql)
        self.constraints: dict[str, str] = {}

    # -- worker: micro-batch → partial states -------------------------------
    def worker(self, pre_df: DataFrame) -> DataFrame:
        plan = self.plan
        if plan.where:
            pre_df = pre_df.filter(F.expr(plan.where))
        keys = [F.expr(g).alias(n)
                for g, n in zip(plan.group_exprs, plan.group_names)]
        if self._arrival_log:
            # arrival serial: monotonically_increasing_id preserves
            # (partition, row) = ingest order with NO shuffle — a
            # row_number window here would collapse the batch to one
            # partition.  Serials are sparse, but only ORDER matters
            # (the overlay sorts by _seq); the persisted high-water
            # mark keeps later batches strictly above earlier ones.
            base = self._seq_base()
            pre_df = pre_df.withColumn(
                SEQ_COL,
                F.monotonically_increasing_id() + F.lit(base + 1))
            keys.append(F.col(SEQ_COL))
        if plan.sw_column is not None:
            step = float(plan.sw_step_seconds)
            keys.append(
                F.timestamp_seconds(
                    F.floor(ts_epoch(F.expr(plan.sw_column)) / step) * step
                ).alias(STEP_COL))
        jvm_aggs, pd_aggs = [], []
        for call in plan.aggs:
            spec = self._registry.get(call.func)
            target = pd_aggs if spec.pandas else jvm_aggs
            for suffix, col in spec.partial(call.worker_args()).items():
                target.append(col.alias(state_col(call.out, suffix)))
        if not jvm_aggs and not pd_aggs:
            # pure-DISTINCT CV: presence marker so merge has a state col
            jvm_aggs = [F.count(F.lit(1)).alias(state_col("_present", "n"))]
        if plan.grouping_sets is not None:
            if not pd_aggs and plan.sw_column is None:
                # aliased keys don't match set exprs; group on raw
                # exprs, rename leading grouping columns positionally
                raw_keys = [F.expr(g) for g in plan.group_exprs]
                sets = [[F.expr(g) for g in s] for s in plan.grouping_sets]
                out = (pre_df.groupingSets(sets, *raw_keys)
                       .agg(*jvm_aggs, F.grouping_id().alias(GID_COL)))
                renames = dict(zip(out.columns[: len(raw_keys)],
                                   plan.group_names))
                return out.withColumnsRenamed(renames)
            # pandas (sketch) aggregates can't ride Spark's native
            # grouping sets (grouped-agg UDFs don't mix into
            # groupingSets agg), and SW needs the step bucket as an
            # always-present key outside the grouping_id bit layout —
            # expand set-by-set: one grouped pass per set with absent
            # keys as typed NULLs and the same grouping_id bit layout
            # (MSB = first group expr), then union.  S extra passes
            # over the micro-batch, same shape Spark's own expansion
            # uses internally.
            nkeys = len(plan.group_exprs)
            set_names = list(plan.group_names)
            if plan.sw_column is not None:
                set_names.append(STEP_COL)
            frames = []
            for s_exprs in plan.grouping_sets:
                snorm = {re.sub(r"\s+", "", e).lower() for e in s_exprs}
                keys2, gid = [], 0
                for i, (g, name) in enumerate(zip(plan.group_exprs,
                                                  plan.group_names)):
                    present = re.sub(r"\s+", "", g).lower() in snorm
                    expr = (F.expr(g) if present
                            else F.when(F.lit(False), F.expr(g)))
                    keys2.append(expr.alias(name))
                    if not present:
                        gid |= 1 << (nkeys - 1 - i)
                if plan.sw_column is not None:
                    keys2.append(keys[-1])  # step-bucket key
                frames.append(
                    grouped_agg(pre_df, keys2, set_names,
                                list(jvm_aggs), list(pd_aggs))
                    .withColumn(GID_COL, F.lit(gid).cast("bigint")))
            out = frames[0]
            for f in frames[1:]:
                out = out.unionByName(f)
            return out
        key_names = [n for n in plan.group_names]
        if plan.sw_column is not None:
            key_names.append(STEP_COL)
        return grouped_agg(pre_df, keys, key_names, jvm_aggs, pd_aggs)

    # -- combiner: merge partials over (old ∪ delta) ------------------------
    def merge_fn(self, df: DataFrame,
                 key_cols: list[str] | None = None) -> DataFrame:
        key_names = (self._group_cols if key_cols is None
                     else key_cols) + [BUCKET_COL]
        keys = [F.col(c) for c in key_names]
        jvm_aggs, pd_aggs = [], []
        for call in self.plan.aggs:
            spec = self._registry.get(call.func)
            target = pd_aggs if spec.pandas else jvm_aggs
            s = lambda suffix, out=call.out: F.col(state_col(out, suffix))
            for suffix, col in spec.merge_exprs(s, call.args).items():
                target.append(col.alias(state_col(call.out, suffix)))
        if not jvm_aggs and not pd_aggs:
            jvm_aggs = [F.sum(F.col(state_col("_present", "n")))
                        .alias(state_col("_present", "n"))]
        return grouped_agg(df, keys, key_names, jvm_aggs, pd_aggs)

    # -- overlay: finalize states into user-visible rows ---------------------
    def finalize(self, states: DataFrame, extra_cols: list[str] | None = None,
                 recombine: bool = True) -> DataFrame:
        plan = self.plan
        df = states
        if plan.sw_column is not None and recombine:
            # re-combine in-window step buckets under the original keys
            # — STEP_COL must be excluded from the merge keys or rows
            # stay one-per-step (reference view_combines,
            # src/analyzer.c:2798-2805)
            df = self.merge_fn(
                df.withColumn(BUCKET_COL, F.lit(0)),
                key_cols=[c for c in self._group_cols if c != STEP_COL])
        fin_names: dict[str, str] = {}
        for call in plan.aggs:
            spec = self._registry.get(call.func)
            s = lambda suffix, out=call.out: F.col(state_col(out, suffix))
            df = df.withColumn(f"__fin_{call.out}", spec.finalize(s, call.args))
            fin_names[call.out] = f"__fin_{call.out}"
        # map normalized group-expr text -> matrel column
        gmap = {re.sub(r"\s+", "", g).lower(): n
                for g, n in zip(plan.group_exprs, plan.group_names)}
        out_cols = []
        for expr_text, alias in plan.select_items:
            if "{" in expr_text:
                sql_expr = expr_text
                for out, fin in fin_names.items():
                    sql_expr = sql_expr.replace("{" + out + "}", f"`{fin}`")
                out_cols.append(F.expr(sql_expr).alias(alias))
            else:
                norm = re.sub(r"\s+", "", expr_text).lower()
                src = gmap.get(norm, expr_text)
                out_cols.append(F.col(src).alias(alias))
        if extra_cols:
            out_cols = [F.col(c) for c in extra_cols] + out_cols
        if self._arrival_log and not extra_cols and SEQ_COL in df.columns:
            out_cols.append(F.col(SEQ_COL))
        if plan.append and not extra_cols:
            # no-agg CV: expand the count-compressed multiset back to
            # one row per materialized event (reference cqcreate0-2
            # matrels hold every event row; we store one row per
            # distinct projected tuple + multiplicity)
            n = F.col(state_col("_present", "n")).cast("int")
            df = df.withColumn("__rep",
                               F.explode(F.sequence(F.lit(1), n)))
        out = df.select(*out_cols)
        if (self.pk is not None and not extra_cols
                and plan.grouping_sets is None
                and plan.group_names != [self.pk]):
            # pk uniqueness when the designated pk is NOT the full group
            # identity (e.g. WITH (pk='count'), reference cont_pk.sql
            # test_pk1): conflicting rows collapse to one survivor per
            # pk value.  Deterministic: smallest remaining tuple wins.
            # (Deviation from PG: the reference surfaces whichever row
            # the constraint machinery left behind; we pick the minimum
            # — documented, deterministic, same uniqueness guarantee.)
            from pyspark.sql import Window
            others = [c for c in out.columns if c != self.pk]
            w = Window.partitionBy(self.pk).orderBy(
                *[F.asc_nulls_last(c) for c in others])
            out = (out.withColumn("__pk_rn", F.row_number().over(w))
                   .filter(F.col("__pk_rn") == 1).drop("__pk_rn"))
        if plan.distinct_on and not extra_cols:
            # DISTINCT ON: view-level dedup on the ON columns
            out = out.dropDuplicates(plan.distinct_on)
        if (plan.limit is not None or plan.offset) and not extra_cols:
            # overlay-only, like every sibling block above: internal
            # keyed frames (osrel emission, constraint evaluation) must
            # never be truncated
            if self._arrival_log and SEQ_COL in out.columns:
                # reference cont_limit.sql semantics: the view returns
                # the first `limit` rows AFTER skipping `offset`, in
                # ARRIVAL order (the matrel $pk serial there)
                out = out.orderBy(SEQ_COL)
                if plan.offset:
                    out = out.offset(plan.offset)
                if plan.limit is not None:
                    out = out.limit(plan.limit)
                out = out.drop(SEQ_COL)
            else:
                if plan.offset:
                    out = out.offset(plan.offset)
                if plan.limit is not None:
                    out = out.limit(plan.limit)
        return out

    def _seq_base(self) -> int:
        """Arrival-serial high-water mark; recovered from the matrel on
        the first batch after a restart."""
        if self._next_seq is None:
            cur = self.matrel.read()
            self._next_seq = 0 if cur is None else \
                int(cur.agg(F.max(SEQ_COL)).first()[0] or 0)
        return self._next_seq

    # -- per-batch processing -----------------------------------------------
    def accumulate(self, pre_df: DataFrame,
                   txn: tuple[str, int] | None = None) -> None:
        """Buffer a micro-batch without committing (commit-interval
        mode): the worker/combiner run once over the accumulated
        batches at the next commit or read.  A replayed epoch already
        sitting in the buffer is dropped here (same app, version ≤ a
        buffered one)."""
        with self._pending_lock:
            if txn is not None:
                for _, t in self._pending:
                    if t is not None and t[0] == txn[0] \
                            and txn[1] <= t[1]:
                        return  # replayed epoch already buffered
            self._pending.append((pre_df, txn))

    def commit_pending(self, emit_changes: bool = False) -> DataFrame | None:
        # the swap runs under its own lock: two concurrent flushes
        # (reader-triggered vs dispatch-triggered) must never both see
        # the same pending list — that was a double-merge TOCTOU
        with self._pending_lock:
            batches = self._pending
            self._pending = []
        if not batches:
            return None
        # drop epochs that already committed (post-crash replay lands
        # here when the buffer was rebuilt); record every source's
        # high version for the merge's txn tags
        keep: list[DataFrame] = []
        txns: dict[str, int] = {}
        for df, t in batches:
            if t is not None:
                done = self.matrel.txn_version(t[0])
                if done is not None and t[1] <= done:
                    continue
                txns[t[0]] = max(txns.get(t[0], -1), t[1])
            keep.append(df)
        if not keep:
            return None
        unioned = keep[0]
        for b in keep[1:]:
            unioned = unioned.unionByName(b, allowMissingColumns=True)
        return self.process_batch(unioned, emit_changes=emit_changes,
                                  txn=txns or None)

    def process_batch(self, pre_df: DataFrame,
                      emit_changes: bool = True,
                      txn: tuple[str, int] | dict | None = None
                      ) -> DataFrame | None:
        """Run worker + combiner for one micro-batch; returns the osrel
        rows (old/new/delta) or None when nothing changed / not asked.

        ``txn`` = (source app id, monotonically-increasing version),
        or a {app_id: version} dict covering a multi-source pending
        union: the tags commit atomically with the merge (matrel
        manifest swap), and a batch whose version was already
        committed is skipped BEFORE any work — replayed streaming
        epochs cannot double-merge, upgrading the foreachBatch bridge
        from at-least-once-in-a-window to effectively-once per view
        (the idempotent-writes pattern of transactional lakehouse
        stores).  The skip check re-runs under commit_lock right
        before the merge: the cheap pre-check alone was a TOCTOU —
        two threads carrying the same epoch could both pass it."""
        if isinstance(txn, tuple):
            txn = {txn[0]: txn[1]}

        def _already_committed() -> bool:
            if not txn:
                return False
            return all(
                (done := self.matrel.txn_version(a)) is not None
                and v <= done for a, v in txn.items())

        if _already_committed():
            return None  # replayed source batch — already merged
        # bucket before the checkpoint, and piggyback the affected-
        # bucket probe on the checkpoint job itself (Observation): one
        # job materializes the partial states AND yields the bucket set
        # (which doubles as the emptiness check — no take(1) job)
        from pyspark.sql import Observation
        in_obs = None
        if not self._group_cols:
            # a GLOBAL aggregate's worker emits one zero-count state
            # row even for an EMPTY batch, which would drive a full
            # merge + matrel version bump per empty insert (grouped
            # views early-return via the empty affected set below).
            # Observe the input count on the worker's own
            # materialization — no extra job — and skip the commit
            # when nothing arrived (the pre-r15 n==0 early return,
            # without the count job the fast path removed).
            in_obs = Observation()
            pre_df = pre_df.observe(in_obs, F.count(F.lit(1)).alias("n"))
        obs = Observation()
        obs_cols = [F.collect_set(F.col(BUCKET_COL)).alias("bks")]
        if self._arrival_log:
            obs_cols.append(F.max(F.col(SEQ_COL)).alias("mx_seq"))
        delta = (self.worker(pre_df)
                 .withColumn(BUCKET_COL,
                             self.matrel.bucket_expr(self._bucket_cols))
                 .observe(obs, *obs_cols)
                 .localCheckpoint(eager=True))
        affected = sorted(int(b) for b in obs.get["bks"])
        if self._arrival_log and obs.get["mx_seq"] is not None:
            self._next_seq = int(obs.get["mx_seq"])
        if not affected:
            return None
        if in_obs is not None and int(in_obs.get["n"]) == 0:
            return None  # empty batch into a global aggregate
        with self.commit_lock:
            if _already_committed():
                return None  # lost the race: another thread merged it
            old, merged = self.matrel.merge(
                delta, self._group_cols, self.merge_fn, affected=affected,
                pin_old=emit_changes or bool(self.constraints),
                constrain_fn=(self._apply_constraints if self.constraints
                              else None),
                txn=txn)
        self.stats.batches += 1
        if not emit_changes:
            return None
        return self._osrel_rows(old, merged, delta)

    def _apply_constraints(self, old: DataFrame | None,
                           merged: DataFrame) -> DataFrame:
        """Enforce matrel CHECK constraints at upsert (reference
        matrel_constraints.sql semantics: a merged row violating any
        constraint is rejected — the group keeps its previous matrel
        row, and a brand-new violating group is dropped).  Constraints
        are written over the CV's user-visible columns, so each merged
        state row is finalized (without SW recombine) for evaluation."""
        keys = self._group_cols + [BUCKET_COL]
        kcols = [f"__ck_{i}" for i in range(len(keys))]

        def keyed(df: DataFrame) -> DataFrame:
            for kc, k in zip(kcols, keys):
                df = df.withColumn(kc, F.col(k))
            return df

        fin = self.finalize(keyed(merged), extra_cols=kcols,
                            recombine=False)
        cond = None
        for expr_text in self.constraints.values():
            # SQL CHECK semantics (PG ExecConstraints): a check that
            # evaluates to NULL is SATISFIED, so coalesce each check
            # to true before combining.
            c = F.coalesce(F.expr(expr_text), F.lit(True))
            cond = c if cond is None else (cond & c)
        ok_keys = fin.filter(cond).select(*kcols)
        keep_new = merged.join(
            ok_keys,
            on=[merged[k].eqNullSafe(ok_keys[kc])
                for k, kc in zip(keys, kcols)],
            how="left_semi")
        if old is None:
            return keep_new
        bad_keys = fin.filter(~cond).select(*kcols)
        keep_old = old.join(
            bad_keys,
            on=[old[k].eqNullSafe(bad_keys[kc])
                for k, kc in zip(keys, kcols)],
            how="left_semi")
        return keep_new.unionByName(keep_old)

    def _osrel_rows(self, old: DataFrame | None, merged: DataFrame,
                    delta: DataFrame) -> DataFrame:
        """old/new(/delta) change rows (reference src/combiner.c:1578-1601;
        no-op elision compare_slots src/combiner.c:731-786).  Output
        schema matches the reference osrel: struct columns old/new/delta
        whose fields are the CV's user-visible row type."""
        keys = self._group_cols
        kcols = [f"__key_{i}" for i in range(len(keys))]

        def keyed(df: DataFrame, as_name: str) -> DataFrame:
            for kc, k in zip(kcols, keys):
                df = df.withColumn(kc, F.col(k))
            fin = self.finalize(df, extra_cols=kcols, recombine=False)
            val_cols = [c for c in fin.columns if c not in kcols]
            return fin.select(
                *[F.col(kc) for kc in kcols],
                F.struct(*[F.col(c) for c in val_cols]).alias(as_name))

        new_struct = keyed(merged, "new")
        # the delta's PARTIAL STATES ride each change row in a hidden
        # struct so downstream CVs can combine((delta).col) exactly —
        # merging states, not finalized values (reference delta
        # columns of combine-consuming CQs are bytea trans states,
        # analyzer.c:4586).  Both structs come out of ONE pass over
        # the delta (no extra join in the commit path).
        state_cols = [c for c in delta.columns
                      if c not in set(keys) | {BUCKET_COL}]
        ddf = delta.withColumn(BUCKET_COL, F.lit(0))
        for kc, k in zip(kcols, keys):
            ddf = ddf.withColumn(kc, F.col(k))
        dfin = self.finalize(ddf, extra_cols=kcols + state_cols,
                             recombine=False)
        dval_cols = [c for c in dfin.columns
                     if c not in set(kcols) | set(state_cols)]
        delta_struct = dfin.select(
            *[F.col(kc) for kc in kcols],
            F.struct(*[F.col(c) for c in dval_cols]).alias("delta"),
            F.struct(*[F.col(c) for c in state_cols]).alias("delta_states"))
        # no emptiness probe job: a non-None `old` is never empty —
        # read() returns None when no affected bucket is manifest-
        # listed, and every manifest-listed bucket holds ≥1 current
        # row (_commit drops buckets whose merged result is empty, and
        # present-tracking writes an entry only for buckets with rows)
        #
        # old/new/delta are attached with ONE union + grouped
        # aggregation instead of the former two LEFT JOINs: one
        # exchange instead of one per join side (guide §2.4), two
        # fewer AQE stage-jobs per change-emitting commit — the
        # remaining cost of the commit pipeline is its job COUNT (r15
        # attribution).  Equi-join NULL semantics are preserved
        # exactly: a key tuple containing NULL never matched across
        # the joins, so NULL-keyed rows are salted with a per-source
        # tag and never group across sources either (each source is
        # key-unique, so `first(ignorenulls)` picks the one real value
        # deterministically).  Pinned by the NULL-group-key duckdb
        # replay seat (tests/test_r16_opt.py).
        val_t = new_struct.schema["new"].dataType
        d_t = delta_struct.schema["delta"].dataType
        ds_t = delta_struct.schema["delta_states"].dataType

        def tagged(df: DataFrame, tag: str) -> DataFrame:
            cols = [F.col(kc) for kc in kcols]
            if kcols:
                nullkey = F.col(kcols[0]).isNull()
                for kc in kcols[1:]:
                    nullkey = nullkey | F.col(kc).isNull()
                cols.append(F.when(nullkey, F.lit(tag))
                            .otherwise(F.lit("")).alias("__nksrc"))
            for name, t in (("new", val_t), ("old", val_t),
                            ("delta", d_t), ("delta_states", ds_t)):
                cols.append((F.col(name) if name in df.columns
                             else F.lit(None).cast(t)).alias(name))
            return df.select(*cols)

        parts = [tagged(new_struct, "n"), tagged(delta_struct, "d")]
        if old is not None:
            parts.append(tagged(keyed(old, "old"), "o"))
        unioned = parts[0]
        for p in parts[1:]:
            unioned = unioned.unionByName(p)
        gcols = kcols + (["__nksrc"] if kcols else [])
        joined = unioned.groupBy(*gcols).agg(
            F.first("old", ignorenulls=True).alias("old"),
            F.first("new", ignorenulls=True).alias("new"),
            F.first("delta", ignorenulls=True).alias("delta"),
            F.first("delta_states", ignorenulls=True)
            .alias("delta_states"))
        # old/delta-only groups have no counterpart in the former
        # left-join-from-new shape; no-op update elision unchanged
        changed = joined.filter(
            F.col("new").isNotNull() &
            (F.col("old").isNull() |
             (~F.col("old").eqNullSafe(F.col("new")))))
        return changed.select("old", "new", "delta", "delta_states")

    # -- reads ---------------------------------------------------------------
    def sw_states(self, at: float | None = None) -> DataFrame | None:
        """In-window matrel states of a SW view.  Under the step-
        bucketed layout, expired steps are pruned at the MANIFEST
        (their files are never opened); the exact step filter then
        trims the one boundary bucket."""
        now = at if at is not None else time.time()
        cutoff = now - float(self.plan.sw_seconds)
        tol = float(self.plan.sw_step_seconds)
        if self._time_bucketed:
            live = [b for b in self.matrel.bucket_ids()
                    if b * tol >= cutoff - tol]
            states = self.matrel.read(live) if live else None
        else:
            states = self.matrel.read()
        if states is None:
            return None
        return states.filter(
            ts_epoch(F.col(STEP_COL)) >= F.lit(cutoff) - tol)

    def read(self, at: float | None = None) -> DataFrame:
        if self.plan.sw_column is not None:
            states = self.sw_states(at)
        else:
            states = self.matrel.read()
        if states is None:
            empty = self.ctx.spark.createDataFrame([], self._overlay_schema())
            return empty
        return self.finalize(states)

    def read_pinned(self, pin_name: str) -> DataFrame:
        """Finalized rows of a named matrel pin (MatrelStore.pin): the
        view exactly as it stood at pin time, reproducible forever.
        SW views evaluate their window cutoff at the pin's recorded
        ``at`` instant — the same rows on every later read, even after
        the live window has slid past them and the reaper dropped
        their step buckets (pinned dirs are GC-exempt)."""
        states = self.pinned_states(pin_name)
        if states is None:
            return self.ctx.spark.createDataFrame(
                [], self._overlay_schema())
        return self.finalize(states)

    def pinned_states(self, pin_name: str) -> DataFrame | None:
        """A pin's matrel states, SW window cutoff evaluated at the
        pin's recorded ``at`` instant (shared by :meth:`read_pinned`
        and the pinned ``combine_read``)."""
        rec = self.matrel.pins().get(pin_name)
        if rec is None:
            raise KeyError(
                f"no pin {pin_name!r} on view {self.matrel.name}")
        if self.plan.sw_column is None:
            return self.matrel.read_pinned(pin_name)
        cutoff = float(rec["at"]) - float(self.plan.sw_seconds)
        tol = float(self.plan.sw_step_seconds)
        buckets = None
        if self._time_bucketed:
            buckets = [int(b) for b in rec["buckets"]
                       if int(b) * tol >= cutoff - tol]
        states = self.matrel.read_pinned(pin_name, buckets)
        if states is None:
            return None
        return states.filter(
            ts_epoch(F.col(STEP_COL)) >= F.lit(cutoff) - tol)

    def _overlay_schema(self) -> T.StructType:
        empty = self.ctx.empty_stream_df(self.plan.stream)
        pre = self.ctx._worker_input(self.plan, self.plan.stream, empty)
        probe = self.worker(pre)
        probe = probe.withColumn(BUCKET_COL, F.lit(0))
        return self.finalize(probe, recombine=False).schema

    def _state_schema(self) -> T.StructType:
        """Schema of the matrel partial-state columns (the fields of
        the osrel's hidden delta_states struct)."""
        empty = self.ctx.empty_stream_df(self.plan.stream)
        pre = self.ctx._worker_input(self.plan, self.plan.stream, empty)
        probe = self.worker(pre)
        return T.StructType([f for f in probe.schema.fields
                             if f.name not in set(self._group_cols)])

    def key_cols(self) -> list[str]:
        """User-visible group columns of the overlay output."""
        return [name for (expr, name) in self.plan.select_items
                if "{" not in expr]

    def reap(self, now: float | None = None) -> int:
        """Delete TTL-expired rows (reference src/reaper.c:63-128).
        ``ttl_column`` names a user-visible CV column; group columns
        live in the matrel under their own name, while a
        single-state aggregate output (e.g. ``max(ts) AS mx``) maps to
        its state column."""
        if self.ttl is None:
            return 0
        col = self.ttl_column or (STEP_COL if self.plan.sw_column else None)
        if col is None:
            return 0
        cutoff = (now if now is not None else time.time()) - self.ttl
        if self._time_bucketed and col == STEP_COL:
            # step-bucketed layout: every row of bucket b has step
            # b*step, so expiry is a pure manifest-level bucket drop —
            # no read or rewrite of surviving data (reference reaper
            # DELETE becomes a partition drop)
            step = float(self.plan.sw_step_seconds)
            doomed = [b for b in self.matrel.bucket_ids()
                      if b * step < cutoff]
            with self.commit_lock:
                return self.matrel.drop_buckets(doomed)
        col = self.resolve_ttl_column(col)
        with self.commit_lock:
            return self.matrel.delete_where(ts_epoch(F.col(col)) < cutoff)

    def resolve_ttl_column(self, col: str) -> str:
        """Map a user-visible TTL column to its matrel column: group
        columns (and the SW step column) keep their name; a
        single-state aggregate output maps to its state column.
        Raises for unknown or multi-state columns so a bad
        ``ttl_column`` fails at ``set_ttl`` time, not in the reaper."""
        if col in self.plan.group_names or col == STEP_COL:
            return col
        for call in self.plan.aggs:
            if call.out == col:
                spec = self._registry.get(call.func)
                suffixes = list(spec.partial(call.args).keys())
                if len(suffixes) != 1:
                    raise CQError(
                        f"ttl_column {col!r} is a multi-state "
                        f"aggregate; TTL needs a single-state column")
                return state_col(call.out, suffixes[0])
        raise CQError(f"ttl_column {col!r} is not a column of "
                      f"continuous view {self.name}")


class Transform:
    """Stateless continuous transform (reference
    ``src/pipeline_query.c:984`` DefineContTransform,
    ``src/transform_receiver.c``)."""

    def __init__(self, ctx: "PipelineContext", name: str, sql: str,
                 stream: str, outputfunc: Callable[[DataFrame], None] | None):
        self.ctx = ctx
        self.name = name
        self.sql = sql
        self.stream = stream
        self.outputfunc = outputfunc
        self.active = True
        self.stats = Stats()

    def process_batch(self, batch: DataFrame) -> DataFrame:
        # resolve the SQL against the BATCH's session: Structured
        # Streaming's foreachBatch hands a DataFrame bound to a CLONED
        # session whose temp-view catalog is separate from the context
        # session's — registering the view there and running sql() on
        # ctx.spark would silently read the stale CREATE-time probe
        # (an empty frame), emitting 0 rows for every batch
        sess = batch.sparkSession
        batch.createOrReplaceTempView(self.stream)
        out = sess.sql(self.sql)
        if self.outputfunc is not None:
            self.outputfunc(out)
        self.stats.batches += 1
        return out


class PyTransform(Transform):
    """Continuous transform whose body is a Python
    ``DataFrame → DataFrame`` function instead of SQL — the Spark-first
    generalization of the reference's trigger-function transforms
    (``CREATE VIEW ... WITH (action=transform, outputfunc=...)``,
    src/pipeline_query.c:984): any DataFrame-API operator (the whole
    curation layer — gopher_filter, pii_redact, dedup kernels) can run
    continuously over a stream, with its output flowing to the
    transform's output stream for downstream CQs."""

    def __init__(self, ctx: "PipelineContext", name: str, stream: str,
                 fn: Callable[[DataFrame], DataFrame] | None,
                 fn_ref: str | None,
                 outputfunc: Callable[[DataFrame], None] | None):
        super().__init__(ctx, name, f"<python:{fn_ref or 'unbound'}>",
                         stream, outputfunc)
        self.fn = fn
        self.fn_ref = fn_ref
        if fn is None:
            self.active = False  # replay couldn't re-import the fn

    def process_batch(self, batch: DataFrame) -> DataFrame:
        if self.fn is None:
            raise CQError(
                f"python transform {self.name} has no bound function "
                f"(catalog replay could not import {self.fn_ref!r}); "
                f"re-bind with set_transform_fn")
        out = self.fn(batch)
        if self.outputfunc is not None:
            self.outputfunc(out)
        self.stats.batches += 1
        return out


class PreparedInsert:
    """A prepared stream-insert statement (reference
    prepared_stream_insert.sql; EXECUTE data path
    src/stream_fdw.c:477-585).  ``execute`` binds positional params to
    the prepared column list and buffers the row; buffers flush as one
    micro-batch at ``batch_size``, on ``flush()``/``close()``, or
    whenever a consuming CV is read."""

    def __init__(self, ctx: "PipelineContext", stream: str,
                 columns: list[str], batch_size: int = 256) -> None:
        self.ctx = ctx
        self.stream = stream
        self.columns = columns
        self.batch_size = max(1, batch_size)
        self._rows: list[dict] = []

    def execute(self, *params) -> None:
        if len(params) != len(self.columns):
            raise CQError(
                f"prepared insert on {self.stream} expects "
                f"{len(self.columns)} parameters "
                f"({self.columns}), got {len(params)}")
        self._rows.append(dict(zip(self.columns, params)))
        if len(self._rows) >= self.batch_size:
            self.flush()

    __call__ = execute

    def execute_many(self, param_rows: Iterable[Iterable[Any]]) -> None:
        for row in param_rows:
            self.execute(*row)

    def flush(self) -> int:
        if not self._rows:
            return 0
        rows, self._rows = self._rows, []
        return self.ctx.insert(self.stream, rows, columns=self.columns)

    def close(self) -> None:
        """DEALLOCATE: flush any pending rows and unregister."""
        self.flush()
        if self in self.ctx._prepared:
            self.ctx._prepared.remove(self)


def _from_relations(from_clause: str) -> list[str]:
    """Base relation identifiers of a FROM clause: split on top-level
    commas and JOIN keywords, take each fragment's leading identifier,
    and RECURSE into (SELECT ...) subqueries — their FROM relations
    count (``SELECT combine(x) FROM (SELECT * FROM cv) t`` must find
    cv).  Used so combine()-rewrite CV detection matches RELATIONS
    only, never column references."""
    from pipelinedb_spark.analyzer import split_clauses, split_top_level
    rels: list[str] = []
    for m in re.finditer(r"(?i)\(\s*select\b", from_clause):
        depth, i = 1, m.start() + 1
        while i < len(from_clause) and depth:
            if from_clause[i] == "(":
                depth += 1
            elif from_clause[i] == ")":
                depth -= 1
            i += 1
        sub = split_clauses(from_clause[m.start() + 1:i - 1])
        if "FROM" in sub:
            rels.extend(_from_relations(sub["FROM"]))
    for item in split_top_level(from_clause):
        frags = re.split(
            r"(?i)\b(?:natural\s+)?(?:left|right|full|inner|cross)?"
            r"\s*(?:outer\s+)?join\b", item)
        for frag in frags:
            m = re.match(r"\s*([A-Za-z_][\w.]*)", frag)
            if m:
                rels.append(m.group(1))
    return rels


def _combine_calls(text: str):
    """Yield the raw argument text of each (sw_)combine(...) call."""
    for m in re.finditer(r"(?i)\b(?:sw_)?combine\s*\(", text):
        depth, i = 1, m.end()
        while i < len(text) and depth:
            if text[i] == "(":
                depth += 1
            elif text[i] == ")":
                depth -= 1
            i += 1
        yield text[m.end():i - 1]


class PipelineContext:
    """Top-level engine handle — one per SparkSession + state directory."""

    def __init__(self, spark: SparkSession, root: str | None = None,
                 num_buckets: int = 32,
                 registry: AggRegistry = REGISTRY,
                 track_output_streams: bool = False,
                 commit_interval_batches: int = 1) -> None:
        self.spark = spark
        self.root = root or tempfile.mkdtemp(prefix="pipelinedb_spark_")
        self.matrel_root = os.path.join(self.root, "matrels")
        os.makedirs(self.matrel_root, exist_ok=True)
        self.num_buckets = num_buckets
        self.registry = registry
        self.streams: dict[str, StreamDef] = {}
        self.views: dict[str, ContView] = {}
        self.transforms: dict[str, Transform] = {}
        self.tables: dict[str, DataFrame] = {}
        # Reader-gated emission (the DEFAULT, False): old/new/delta
        # change rows are computed and written only for osrels that a
        # downstream CQ actually reads — the reference closes an osrel
        # immediately when nothing is reading it and skips emission
        # entirely (src/combiner.c:1477-1489; SW twin :1619-1622), and
        # always-on emission costs ~1.5× ingest throughput (83k→55k
        # rows/s, PLANS.md).  True opts into unconditional emission so
        # ``output_of()`` has a retained history tail even with no
        # readers attached — an extension the reference doesn't have
        # (its osrels are unread streams with no retention).  With
        # gating, a reader that attaches mid-stream sees only
        # POST-attach changes, exactly like subscribing to a stream.
        self.track_output_streams = track_output_streams
        # >1 = the reference's commit_interval: inserts accumulate and
        # the worker/combiner run once per N batches (or on read/flush),
        # amortizing per-job overhead (src/config.c:373-379).
        self.commit_interval_batches = max(1, commit_interval_batches)
        # run per-view worker+combiner phases concurrently when one
        # batch feeds several CVs (each CV owns its matrel store; the
        # reference runs one combiner process per CQ group likewise)
        self.parallel_dispatch = True
        # Output-stream rows live on DISK (bucketed parquet segments),
        # never in driver memory: each emission appends a segment dir
        # and `output_of()` reads the segments back as a DataFrame.
        # Retention is bounded (reference osrels are streams — readers
        # consume them; we keep a bounded replay tail).
        self.osrel_root = os.path.join(self.root, "osrels")
        os.makedirs(self.osrel_root, exist_ok=True)
        self.osrel_retention_segments = 256
        # once-per-osrel warning when output_of() is read on a
        # reader-gated stream that never emitted (round-6 default flip)
        self._osrel_gate_warned: set[str] = set()
        self._osrel_seq: dict[str, int] = {}
        self._osrel_schema: dict[str, T.StructType] = {}
        # Durable catalog: DDL replay log so a fresh context over the
        # same root re-attaches streams/CVs to their matrels (the
        # pipelinedb.cont_query / pipeline_stream catalogs, reference
        # pipelinedb--1.0.0.sql:16-56).
        self._catalog_path = os.path.join(self.root, "catalog.json")
        self._replaying = False
        # thread-local dispatch depth: a nested insert() from inside a
        # transform outputfunc (insert_into_stream chains) continues
        # the depth chain, so the cycle guard still fires
        self._depth_tls = threading.local()
        self._catalog: list[dict] = []
        # live PREPARE handles (prepared stream inserts)
        self._prepared: list["PreparedInsert"] = []
        from pipelinedb_spark.functions import register_sql_functions
        register_sql_functions(spark)
        self._load_catalog()

    # -- catalog ---------------------------------------------------------------
    def _load_catalog(self) -> None:
        import json
        if not os.path.exists(self._catalog_path):
            return
        with open(self._catalog_path) as f:
            records = json.load(f)
        self._replaying = True
        try:
            for rec in records:
                if rec["kind"] == "stream":
                    self.create_stream(
                        rec["name"], T.StructType.fromJson(rec["schema"]))
                elif rec["kind"] == "view":
                    try:
                        self.create_view(rec["name"], rec["sql"], **rec["opts"])
                    except CQError as e:
                        if "not combinable" not in str(e):
                            raise
                        # view uses a sketch aggregate: attach them and retry
                        from pipelinedb_spark.aggregates import \
                            register_sketch_aggs
                        register_sketch_aggs()
                        self.create_view(rec["name"], rec["sql"], **rec["opts"])
                elif rec["kind"] == "transform":
                    self.create_transform(rec["name"], rec["sql"])
                elif rec["kind"] == "py_transform":
                    fn = None
                    if rec.get("fn_ref"):
                        try:
                            import importlib
                            mod, _, qual = rec["fn_ref"].partition(":")
                            obj = importlib.import_module(mod)
                            for part in qual.split("."):
                                obj = getattr(obj, part)
                            fn = obj
                        except Exception as exc:
                            logging.getLogger(__name__).warning(
                                "replay: cannot import %s for python "
                                "transform %s (created inactive): %s",
                                rec["fn_ref"], rec["name"], exc)
                    if fn is not None:
                        self.create_python_transform(rec["name"],
                                                     rec["stream"], fn)
                    else:
                        t = PyTransform(self, rec["name"], rec["stream"],
                                        None, rec.get("fn_ref"), None)
                        self.transforms[rec["name"]] = t
                        self.streams[rec["stream"]].readers.append(
                            rec["name"])
                        self._register_osrel(rec["name"])
                elif rec["kind"] == "constraint":
                    self.add_matrel_constraint(
                        rec["view"], rec["cname"], rec["check"])
        finally:
            self._replaying = False
        self._catalog = records

    def _catalog_flush(self) -> None:
        import json
        tmp = self._catalog_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._catalog, f)
        os.replace(tmp, self._catalog_path)

    def _catalog_add(self, rec: dict) -> None:
        if self._replaying:
            return
        self._catalog.append(rec)
        self._catalog_flush()

    def _catalog_remove(self, kind: str, name: str) -> None:
        self._catalog = [r for r in self._catalog
                         if not (r["kind"] == kind and r["name"] == name)]
        self._catalog_flush()

    # -- DDL -----------------------------------------------------------------
    def create_stream(self, name: str, schema: T.StructType | str) -> StreamDef:
        if isinstance(schema, str):
            schema = T.StructType.fromDDL(schema)
        if name in self.streams:
            raise CQError(f"stream {name} already exists")
        if ARRIVAL_COL not in schema.fieldNames():
            schema = schema.add(ARRIVAL_COL, T.TimestampType())
        sd = StreamDef(name=name, schema=schema)
        self.streams[name] = sd
        self._catalog_add({"kind": "stream", "name": name,
                           "schema": schema.jsonValue()})
        return sd

    def alter_stream(self, name: str,
                     add_column: str | T.StructType | None = None
                     ) -> StreamDef:
        """``ALTER STREAM ... ADD COLUMN`` — the only column DDL the
        reference permits on streams (commands.c:360-381 rejects DROP/
        ALTER TYPE/etc.; pipeline_stream.c:63-84 re-resolves the stream
        row type).  ``add_column`` is a DDL fragment ("x int, y text")
        or a StructType.  Live semantics match the reference: existing
        CVs keep running (their plans reference only old columns), new
        inserts may populate the new columns, and the widened schema is
        persisted to the catalog so a fresh context replays it."""
        sd = self.streams.get(name)
        if sd is None:
            raise CQError(f"stream {name} does not exist")
        if name.endswith("_osrel"):
            raise CQError("cannot alter a CQ output stream")
        if add_column is None:
            raise CQError("alter_stream supports ADD COLUMN only "
                          "(reference commands.c:360-381)")
        add = (add_column if isinstance(add_column, T.StructType)
               else T.StructType.fromDDL(add_column))
        for f in add.fields:
            if f.name in sd.schema.fieldNames():
                raise CQError(
                    f"column {f.name} already exists in stream {name}")
        # keep arrival_timestamp last — insert coercion appends it
        fields = [f for f in sd.schema.fields if f.name != ARRIVAL_COL]
        fields += list(add.fields)
        if ARRIVAL_COL in sd.schema.fieldNames():
            fields.append(sd.schema[ARRIVAL_COL])
        sd.schema = T.StructType(fields)
        for rec in self._catalog:
            if rec["kind"] == "stream" and rec["name"] == name:
                rec["schema"] = sd.schema.jsonValue()
        if not self._replaying:
            self._catalog_flush()
        return sd

    def register_table(self, name: str, df: DataFrame) -> None:
        """Static dimension table usable in stream-table joins."""
        self.tables[name] = df
        df.createOrReplaceTempView(name)

    def create_view(self, name: str, sql: str, sw: str | None = None,
                    step_factor: float = 5.0, ttl: str | None = None,
                    ttl_column: str | None = None,
                    pk: str | None = None) -> ContView:
        if name in self.views or name in self.transforms:
            raise CQError(f"continuous view {name} already exists")
        sql = self._rewrite_output_of(sql)
        if not self._replaying:
            # bare year()/minute()/... are TRUNCATION in CQ SQL
            # (reference parity, sql:2590-2618).  Applied at CREATE
            # only — the catalog stores the rewritten form, so a
            # pre-rewrite catalog (whose bare names meant Spark
            # extracts against an int-keyed matrel) replays verbatim
            from pipelinedb_spark.analyzer import rewrite_datepart_truncs
            sql = rewrite_datepart_truncs(sql)
        sql = self._rewrite_delta_combines(sql)
        plan = analyze(sql, set(self.streams), self.registry,
                       sw=sw, step_factor=step_factor)
        ttl_secs = None
        if ttl is not None:
            from pipelinedb_spark.analyzer import parse_interval
            ttl_secs = parse_interval(ttl)
        elif plan.sw_seconds is not None:
            ttl_secs = plan.sw_seconds + 2 * (plan.sw_step_seconds or 0)
        cv = ContView(self, name, sql, plan, ttl_secs, ttl_column, pk=pk)
        # fail fast at CREATE: resolve the worker plan against the
        # (empty) stream schema so unknown columns / bad expressions
        # error now, not at first insert (reference builds worker
        # plans at CREATE, analyze_cont_view.sql "column doesn't
        # exist"; pipeline_query.c:1989-1992).  Skipped when the source
        # schema is still unknown (an osrel whose owner couldn't be
        # resolved eagerly) — then resolution stays lazy as before.
        if self.streams[plan.stream].schema.fields:
            try:
                cv._overlay_schema()
            except Exception as exc:
                raise CQError(f"invalid continuous query: {exc}") from exc
        self.views[name] = cv
        self.streams[plan.stream].readers.append(name)
        self._register_osrel(name)
        self._catalog_add({"kind": "view", "name": name, "sql": sql,
                           "opts": {"sw": sw, "step_factor": step_factor,
                                    "ttl": ttl, "ttl_column": ttl_column,
                                    "pk": pk}})
        return cv

    def insert_into_stream(self, *targets: str
                           ) -> Callable[[DataFrame], None]:
        """Outputfunc factory mirroring the reference's
        ``pipelinedb.insert_into_stream('s0' [, 's1' ...])``
        (sql:2700-2712, src/stream_fdw.c:589): a transform's output
        rows are forwarded POSITIONALLY into the target stream(s).
        ``create_transform`` validates the transform's output arity
        and types against every target at CREATE (cont_transform.sql
        ct_invalid cases)."""
        for t in targets:
            if t not in self.streams:
                raise CQError(f"unknown stream {t}")

        def fn(df: DataFrame) -> None:
            for t in targets:
                cols = [f.name for f in self.streams[t].schema.fields
                        if f.name != ARRIVAL_COL]
                self.insert(t, df.toDF(*cols))
        fn.__pdb_targets__ = tuple(targets)
        return fn

    def _validate_stream_targets(self, out_schema: T.StructType,
                                 targets: tuple) -> None:
        """Positional arity/type check of a transform's output against
        its insert_into_stream targets (reference errors when the
        transform output doesn't match the target stream's row type,
        cont_transform.sql:55-57)."""
        for t in targets:
            tgt = [f for f in self.streams[t].schema.fields
                   if f.name != ARRIVAL_COL]
            if len(out_schema.fields) != len(tgt):
                raise CQError(
                    f"transform output has {len(out_schema.fields)} "
                    f"columns but stream {t} expects {len(tgt)}")
            for of, tf in zip(out_schema.fields, tgt):
                ok = (of.dataType == tf.dataType
                      or (isinstance(of.dataType, T.NumericType)
                          and isinstance(tf.dataType, T.NumericType))
                      or isinstance(tf.dataType, T.StringType))
                if not ok:
                    raise CQError(
                        f"transform output column {of.name} "
                        f"({of.dataType.simpleString()}) does not match "
                        f"stream {t} column {tf.name} "
                        f"({tf.dataType.simpleString()})")

    def create_transform(self, name: str, sql: str,
                         outputfunc: Callable[[DataFrame], None] | None = None
                         ) -> Transform:
        sql = self._rewrite_output_of(sql)
        if not self._replaying:
            # bare datepart truncation, CREATE-time only (see
            # create_view) — replayed catalogs keep their stored form
            from pipelinedb_spark.analyzer import rewrite_datepart_truncs
            sql = rewrite_datepart_truncs(sql)
        clauses_stream = None
        for s in self.streams:
            if re.search(r"\b" + re.escape(s) + r"\b", sql):
                clauses_stream = s
                break
        if clauses_stream is None:
            raise CQError("transform must read from a stream")
        # Validate the SELECT resolves against the stream's schema NOW,
        # so a broken transform fails at create_transform rather than
        # surfacing later as an UNRESOLVED_COLUMN when a downstream CQ
        # is created over its (silently empty) output stream.
        from pyspark.errors import AnalysisException
        try:
            self.empty_stream_df(clauses_stream) \
                .createOrReplaceTempView(clauses_stream)
            probe_schema = self.spark.sql(sql).schema
        except AnalysisException as exc:
            raise CQError(f"invalid transform query: {exc}") from exc
        targets = getattr(outputfunc, "__pdb_targets__", None)
        if targets:
            self._validate_stream_targets(probe_schema, targets)
        t = Transform(self, name, sql, clauses_stream, outputfunc)
        self.transforms[name] = t
        self.streams[clauses_stream].readers.append(name)
        self._register_osrel(name)
        self._catalog_add({"kind": "transform", "name": name, "sql": sql})
        return t

    def create_python_transform(
            self, name: str, stream: str,
            fn: Callable[[DataFrame], DataFrame],
            outputfunc: Callable[[DataFrame], None] | None = None
    ) -> "PyTransform":
        """Continuous transform with a Python DataFrame→DataFrame body
        — runs any DataFrame-API operator (quality filters, PII
        redaction, dedup fingerprints) per micro-batch, output flowing
        to ``output_of(name)`` for downstream CQs.

        The catalog stores ``module:qualname`` when ``fn`` is an
        importable module-level function (the analog of the reference
        referencing a trigger function by name) so replay re-binds it;
        a lambda/closure still works in-session, but a fresh context
        over the same root replays the transform INACTIVE until
        ``set_transform_fn`` re-binds a function."""
        if stream not in self.streams:
            raise CQError(f"unknown stream {stream}")
        if name in self.transforms or name in self.views:
            raise CQError(f"continuous query {name} already exists")
        # fail at CREATE, not first insert: the fn must accept the
        # stream's schema and return a DataFrame
        try:
            probe = fn(self.empty_stream_df(stream))
        except Exception as exc:
            raise CQError(
                f"invalid python transform: fn failed on the stream "
                f"schema probe: {exc}") from exc
        if not isinstance(probe, DataFrame):
            raise CQError("python transform fn must return a DataFrame, "
                          f"got {type(probe).__name__}")
        fn_ref = None
        mod = getattr(fn, "__module__", None)
        qual = getattr(fn, "__qualname__", "")
        if mod and mod != "__main__" and "<locals>" not in qual:
            fn_ref = f"{mod}:{qual}"
        t = PyTransform(self, name, stream, fn, fn_ref, outputfunc)
        self.transforms[name] = t
        self.streams[stream].readers.append(name)
        self._register_osrel(name)
        self._catalog_add({"kind": "py_transform", "name": name,
                           "stream": stream, "fn_ref": fn_ref})
        return t

    def set_transform_fn(self, name: str,
                         fn: Callable[[DataFrame], DataFrame]) -> None:
        """Re-bind a python transform's function (after a replay that
        could not import it, or to hot-swap logic); re-activates."""
        t = self.transforms.get(name)
        if not isinstance(t, PyTransform):
            raise CQError(f"{name} is not a python transform")
        t.fn = fn
        t.active = True
        # a replay with an unimportable fn_ref registered the osrel
        # with an EMPTY schema; refresh it from the re-bound fn so
        # CREATE ... FROM output_of(name) validates against real
        # columns before the first batch arrives
        osrel = f"{name}_osrel"
        sd = self.streams.get(osrel)
        if sd is not None and not sd.schema.fields:
            sd.schema = fn(self.empty_stream_df(t.stream)).schema
        mod = getattr(fn, "__module__", None)
        qual = getattr(fn, "__qualname__", "")
        if mod and mod != "__main__" and "<locals>" not in qual:
            t.fn_ref = f"{mod}:{qual}"
            for rec in self._catalog:
                if rec["kind"] == "py_transform" and rec["name"] == name:
                    rec["fn_ref"] = t.fn_ref
            if not self._replaying:
                self._catalog_flush()

    def _osrel_create_schema(self, name: str) -> T.StructType:
        """Resolve a CQ's output-stream schema at CREATE time so a later
        ``CREATE ... FROM output_of('name')`` validates against real
        columns instead of an empty struct (reference materializes the
        osrel rowtype at DefineContView, src/pipeline_query.c:640-668:
        old/new/delta composite of the CV's row type).  The CQ's query
        was validated at CREATE, so failures here are unexpected —
        logged and fallen back to the lazy empty schema rather than
        silently swallowed."""
        from pyspark.errors import AnalysisException
        try:
            if name in self.views:
                cv = self.views[name]
                row = cv._overlay_schema()
                st = T.StructType([T.StructField(f.name, f.dataType, True)
                                   for f in row.fields])
                if cv.plan.sw_column is not None:
                    # SWs don't have delta streams: the ticker emits
                    # (old, new) only, and a downstream (delta).x must
                    # fail validation exactly like the reference
                    # (delta_streams.sql:4-7)
                    return T.StructType([T.StructField(c, st, True)
                                         for c in ("old", "new")])
                fields = [T.StructField(c, st, True)
                          for c in ("old", "new", "delta")]
                # non-SW change rows also carry the delta's raw
                # partial states for downstream combine((delta).x)
                fields.append(T.StructField(
                    "delta_states", cv._state_schema(), True))
                return T.StructType(fields)
            if name in self.transforms:
                tr = self.transforms[name]
                if isinstance(tr, PyTransform):
                    if tr.fn is None:
                        return T.StructType()  # unbound after replay
                    return tr.fn(self.empty_stream_df(tr.stream)).schema
                self.empty_stream_df(tr.stream) \
                    .createOrReplaceTempView(tr.stream)
                return self.spark.sql(tr.sql).schema
        except AnalysisException as exc:
            logging.getLogger(__name__).warning(
                "could not resolve output-stream schema for %s "
                "(falling back to lazy empty schema): %s", name, exc)
        return T.StructType()

    def _register_osrel(self, name: str) -> None:
        osrel = f"{name}_osrel"
        if osrel not in self.streams:
            self.streams[osrel] = StreamDef(
                name=osrel, schema=self._osrel_create_schema(name))
        base = os.path.join(self.osrel_root, osrel)
        if os.path.isdir(base):
            # fresh context over an existing root: resume the sequence
            segs = [int(e[4:]) for e in os.listdir(base)
                    if e.startswith("seg_")]
            self._osrel_seq[osrel] = (max(segs) + 1) if segs else 0

    def _rewrite_output_of(self, sql: str) -> str:
        # FROM output_of('cv') → FROM cv_osrel (reference
        # src/analyzer.c:776-828)
        return re.sub(r"(?i)output_of\s*\(\s*'([^']+)'\s*\)", r"\1_osrel", sql)

    def _register_delta_combine(self, up: str, call) -> str:
        """Derive + register the aggregate behind a rewritten
        ``combine((delta).col)``: its PARTIAL phase is the upstream
        aggregate's MERGE over the incoming delta_states fields, so
        downstream continuous aggregation is exact (weighted avg,
        distinct counts, sketch unions) — reference
        get_combine_target_aggref, src/analyzer.c:4360-4470."""
        spec = self.registry.get(call.func)
        fname = f"__dcmb_{up}_{call.out}".lower()
        # register UNCONDITIONALLY: an upstream dropped and recreated
        # with a different aggregate under the same output column must
        # rebind the derived spec (a stale spec would zip the new
        # state-field args against the old suffixes and silently
        # mis-merge)
        suffixes = list(spec.partial(call.args).keys())
        cargs = list(call.args)

        def partial(args, _sfx=suffixes, _spec=spec, _cargs=cargs):
            sub = {sfx: F.expr(a) for sfx, a in zip(_sfx, args)}
            return _spec.merge_exprs(lambda sfx: sub[sfx], _cargs)

        self.registry.register(AggSpec(
            fname, partial,
            spec.merge,
            lambda s, a, _spec=spec, _cargs=cargs: _spec.finalize(s, _cargs),
            state_is_value=spec.state_is_value,
            pandas=spec.pandas,
            merge_with_args=(
                (lambda s, a, _spec=spec, _cargs=cargs:
                 _spec.merge_with_args(s, _cargs))
                if spec.merge_with_args is not None else None)))
        return fname

    def _rewrite_delta_combines(self, sql: str) -> str:
        """CVs combining DELTA STREAMS (reference delta_streams.sql):
        ``combine((delta).col)`` over ``output_of('up')`` re-merges the
        upstream aggregate's partial states, which ride every change
        row in the hidden ``delta_states`` struct — finalized delta
        VALUES are not re-mergeable (avg of avgs is wrong), states are.
        Rewrites each call to a derived registered aggregate over the
        state fields; idempotent across catalog replay."""
        pat = re.compile(
            r"(?i)\bcombine\s*\(\s*\(?\s*(?:(\w+)\s*\.\s*)?delta\s*\)?\s*"
            r"\.\s*(\w+)\s*\)")
        has_calls = bool(pat.search(sql))
        if not has_calls and "__dcmb_" not in sql:
            return sql
        ups = [v for v in self.views
               if re.search(rf"(?i)\b{re.escape(v)}_osrel\b", sql)]
        if has_calls:
            if not ups:
                return sql  # not an output-stream query; analyze errors
            # relation-alias map: a qualified (alias.delta).col must
            # bind to the alias's OWN upstream when several osrels are
            # joined, not to whichever view happens first in catalog
            # order
            alias_of: dict[str, str] = {}
            for v in ups:
                alias_of[f"{v}_osrel".lower()] = v
                for am in re.finditer(
                        rf"(?i)\b{re.escape(v)}_osrel\s+(?:AS\s+)?"
                        rf"([A-Za-z_]\w*)", sql):
                    a = am.group(1).lower()
                    if a not in ("on", "join", "left", "right", "full",
                                 "inner", "cross", "natural", "outer",
                                 "where", "group", "order", "using",
                                 "limit", "having"):
                        alias_of[a] = v

            def repl(m: "re.Match[str]") -> str:
                qual, col = m.group(1), m.group(2)
                if qual is not None:
                    up = alias_of.get(qual.lower())
                    if up is None:
                        raise CQError(
                            f'relation "{qual}" in combine((delta).{col}) '
                            "does not match any output-stream relation "
                            "in the FROM clause")
                elif len(ups) == 1:
                    up = ups[0]
                else:
                    raise CQError(
                        f"combine((delta).{col}) is ambiguous over "
                        f"multiple output streams {sorted(ups)}; qualify "
                        "the delta with its relation alias")
                cv = self.views[up]
                if cv.plan.sw_column is not None:
                    # SWs don't have delta streams (delta_streams.sql:4,
                    # expected out: column "delta" does not exist)
                    raise CQError('column "delta" does not exist')
                call = next((c for c in cv.plan.aggs if c.out == col),
                            None)
                if call is None:
                    raise CQError(
                        "combine argument is not an aggregate column")
                fname = self._register_delta_combine(up, call)
                sfx = list(self.registry.get(call.func)
                           .partial(call.args).keys())
                q = f"{qual}." if qual else ""
                args = ", ".join(f"{q}delta_states.{state_col(col, s)}"
                                 for s in sfx)
                return f"{fname}({args})"

            sql = pat.sub(repl, sql)
        # replay of an already-rewritten catalog entry: re-register.
        # Candidate view names longest-first, but only stop on a
        # SUCCESSFUL registration — with ambiguous names (views 'a'
        # and 'a_b', token 'a_b_c' meaning view 'a' col 'b_c') the
        # longer prefix has no matching agg column and must fall
        # through to the shorter candidate
        for tok in set(re.findall(r"__dcmb_(\w+)\(", sql)):
            for v in sorted(self.views, key=len, reverse=True):
                if not tok.startswith(v.lower() + "_"):
                    continue
                colname = tok[len(v) + 1:]
                cc = next((c for c in self.views[v].plan.aggs
                           if c.out.lower() == colname), None)
                if cc is not None:
                    self._register_delta_combine(v, cc)
                    break
        return sql

    def drop_view(self, name: str, cascade: bool = False) -> None:
        """DROP VIEW [CASCADE]: dropping a CV whose output stream has
        readers requires CASCADE, which then drops the dependents too
        (reference output_streams.sql:23 — 'cannot drop view os0
        because other objects depend on it')."""
        if name in self.views:
            os_sd = self.streams.get(f"{name}_osrel")
            deps = sorted(os_sd.readers) if os_sd is not None else []
            if deps and not cascade:
                raise CQError(
                    f"cannot drop continuous view {name}: other "
                    f"continuous queries {deps} depend on its output "
                    "stream (use cascade=True)")
            for dep in deps:
                if dep in self.views:
                    self.drop_view(dep, cascade=True)
                elif dep in self.transforms:
                    self.drop_transform(dep)
        cv = self.views.pop(name, None)
        if cv:
            cv.matrel.drop()
            # derived __dcmb_* specs stay REGISTERED on purpose: the
            # registry is process-global by default, so unregistering
            # here would break an identically-named derived spec in
            # another live context.  Staleness is handled where it
            # matters — _register_delta_combine re-registers
            # unconditionally when a downstream is (re)created, so a
            # recreated upstream with a different aggregate under the
            # same column rebinds correctly.
            for sd in self.streams.values():
                if name in sd.readers:
                    sd.readers.remove(name)
            self.streams.pop(f"{name}_osrel", None)
            shutil.rmtree(os.path.join(self.osrel_root, f"{name}_osrel"),
                          ignore_errors=True)
            self._catalog_remove("view", name)
            for rec in list(self._catalog):
                if rec["kind"] == "constraint" and rec.get("view") == name:
                    self._catalog_remove("constraint", rec["name"])

    def rename_view(self, old: str, new: str) -> None:
        """``ALTER VIEW <cv> RENAME TO <new>`` (reference
        cont_alter.sql:5, src/commands.c): the CV, its matrel store,
        its output stream, and every catalog record move to the new
        name; CQs reading the CV's output stream keep working.  The
        matrel's *relation* name in the reference stays put — here the
        storage directory must follow the CV name so catalog replay
        finds it, but users address the matrel only through the CV."""
        cv = self.views.get(old)
        if cv is None:
            raise CQError(f"continuous view {old} does not exist")
        if (new in self.views or new in self.transforms
                or new in self.streams):
            raise CQError(f"name {new!r} is already in use")
        self._flush_cv(old)
        self.views.pop(old)
        cv.name = new
        self.views[new] = cv
        cv.matrel.rename(new)
        # source-stream reader registration
        for sd in self.streams.values():
            sd.readers = [new if r == old else r for r in sd.readers]
        # output stream: rekey + move segments on disk
        old_os, new_os = f"{old}_osrel", f"{new}_osrel"
        if old_os in self.streams:
            sd = self.streams.pop(old_os)
            sd.name = new_os
            self.streams[new_os] = sd
        for mapping in (self._osrel_seq, self._osrel_schema):
            if old_os in mapping:
                mapping[new_os] = mapping.pop(old_os)
        old_osdir = os.path.join(self.osrel_root, old_os)
        if os.path.isdir(old_osdir):
            os.rename(old_osdir, os.path.join(self.osrel_root, new_os))
        # downstream CQs created over output_of(old): repoint their
        # stream reference and stored SQL so catalog replay agrees
        for reader in list(self.views.values()) + list(
                self.transforms.values()):
            tgt = reader.plan.stream if hasattr(reader, "plan") \
                else reader.stream
            if tgt != old_os:
                continue
            if hasattr(reader, "plan"):
                reader.plan.stream = new_os
            else:
                reader.stream = new_os
            new_sql = re.sub(r"\b" + re.escape(old_os) + r"\b", new_os,
                             reader.sql)
            # rewritten delta-combines embed the upstream view name in
            # the derived aggregate token — carry it to the new name
            # and re-register so replay (and this session) resolve it.
            # EXACT tokens only (view name + a real aggregate column of
            # the renamed view): a blind `__dcmb_{old}_` prefix sub
            # would also corrupt a prefix-named sibling's tokens
            # (__dcmb_a_b_n while renaming view 'a')
            for call in cv.plan.aggs:
                tok_old = f"__dcmb_{old}_{call.out}".lower()
                tok_new = f"__dcmb_{new}_{call.out}".lower()
                new_sql = re.sub(rf"(?i)\b{re.escape(tok_old)}\s*\(",
                                 tok_new + "(", new_sql)
            reader.sql = new_sql
            if "__dcmb_" in new_sql:
                self._rewrite_delta_combines(new_sql)
            for rec in self._catalog:
                if rec["kind"] in ("view", "transform") \
                        and rec["name"] == reader.name:
                    rec["sql"] = new_sql
        # old-name derived delta-combine specs stay REGISTERED — live
        # downstream plans in this session were analyzed against them
        for rec in self._catalog:
            if rec["kind"] == "view" and rec["name"] == old:
                rec["name"] = new
            elif rec["kind"] == "constraint" and rec.get("view") == old:
                rec["view"] = new
                rec["name"] = f"{new}.{rec['cname']}"
        if not self._replaying:
            self._catalog_flush()

    def rename_matrel(self, name: str) -> None:
        """Direct matrel renames are rejected exactly like the
        reference (cont_alter.sql:6: 'cannot rename materialization
        table') — the matrel's identity is bound to its CV."""
        for cv_name in self.views:
            if name in (cv_name, f"{cv_name}_mrel"):
                raise CQError(
                    f'cannot rename materialization table "{cv_name}_mrel" '
                    f'for continuous view "{cv_name}"')
        raise CQError(f"materialization table {name} does not exist")

    def drop_transform(self, name: str) -> None:
        tr = self.transforms.pop(name, None)
        if tr:
            for sd in self.streams.values():
                if name in sd.readers:
                    sd.readers.remove(name)
            self.streams.pop(f"{name}_osrel", None)
            shutil.rmtree(os.path.join(self.osrel_root, f"{name}_osrel"),
                          ignore_errors=True)
            self._catalog_remove("transform", name)
            self._catalog_remove("py_transform", name)

    def drop_stream(self, name: str, cascade: bool = False) -> None:
        """DROP FOREIGN TABLE [CASCADE] (reference: dropping a stream
        requires CASCADE when continuous queries read it, and then
        drops them too — test create_cont_view.sql / cont_alter.sql
        'drop cascades to view')."""
        sd = self.streams.get(name)
        if sd is None:
            raise CQError(f"stream {name} does not exist")
        if name.endswith("_osrel"):
            raise CQError("cannot drop a CQ output stream directly")
        if sd.readers and not cascade:
            raise CQError(
                f"cannot drop stream {name}: continuous queries "
                f"{sorted(sd.readers)} depend on it (use cascade=True)")
        # dropping a reader CQ removes its osrel, whose own readers
        # must cascade too — recurse until the closure is gone
        def drop_cq(r: str) -> None:
            os_sd = self.streams.get(f"{r}_osrel")
            if os_sd is not None:
                for rr in list(os_sd.readers):
                    drop_cq(rr)
            if r in self.views:
                self.drop_view(r)
            elif r in self.transforms:
                self.drop_transform(r)

        while sd.readers:
            r = sd.readers[0]
            drop_cq(r)
            if r in sd.readers:     # stale registry entry
                sd.readers.remove(r)
        self.streams.pop(name, None)
        self._catalog_remove("stream", name)

    # -- DML -----------------------------------------------------------------
    def insert(self, stream: str, rows: Iterable[Any] | DataFrame,
               columns: list[str] | None = None,
               targets: list[str] | None = None) -> int:
        """INSERT INTO stream — one micro-batch through every consumer.
        Reference data path: src/stream_fdw.c:477-585 →
        microbatch_send_to_worker → worker → combiner.
        ``targets`` restricts which CQs consume this insert (the
        stream_targets GUC, reference src/config.c:349-355)."""
        sd = self.streams.get(stream)
        if sd is None:
            raise CQError(f"unknown stream {stream}")
        if isinstance(rows, DataFrame):
            batch = self._coerce_batch(sd, rows, columns)
            consumers = [c for r in sd.readers
                         if (targets is None or r in targets) and
                         (c := self.views.get(r) or self.transforms.get(r))
                         is not None and c.active]
            if (len(consumers) == 1 and consumers[0] in self.views.values()
                    and self.commit_interval_batches == 1):
                # single synchronous view: piggyback the row count on
                # the worker's own materialization (Observation) — no
                # count job and no separate input checkpoint
                from pyspark.sql import Observation
                obs = Observation()
                batch = batch.observe(obs, F.count(F.lit(1)).alias("n"))
                self._dispatch(stream, batch,
                               _depth=getattr(self._depth_tls, "depth", 0),
                               targets=targets,
                               n_rows=None, checkpointed=True)
                n = int(obs.get["n"])
                consumers[0].stats.input_rows += n
                sd.input_rows += n  # dispatch couldn't know the count
                return n
            # several consumers (or deferred commits): checkpoint FIRST
            # so the source plan (often a parquet scan) materializes
            # once; the count then reads checkpointed blocks
            batch = batch.localCheckpoint(eager=True)
            n = batch.count()
            if n == 0:
                return 0
        else:
            rows = list(rows)
            n = len(rows)  # known driver-side: no count job at all
            if n == 0:
                return 0
            batch = self._coerce_batch(sd, rows, columns)
            # NOTE: no .coalesce() here — a no-shuffle coalesce before
            # localCheckpoint stalls ~2-5 s in the locality-aware
            # partition grouper (measured; partitions have no preferred
            # locations).  Slice-count control happens at creation
            # instead (_coerce_batch parallelizes ceil(n/1000) slices).
            consumers = [c for r in sd.readers
                         if (targets is None or r in targets) and
                         (c := self.views.get(r) or self.transforms.get(r))
                         is not None and c.active]
            if (len(consumers) == 1 and consumers[0] in self.views.values()
                    and self.commit_interval_batches == 1):
                # single synchronous view (the same gate as the
                # DataFrame fast path above): the worker materializes
                # the batch exactly once inside its own checkpoint
                # job, and a local-collection plan recomputes for
                # free, so the eager input checkpoint was a whole
                # redundant Spark job per insert (guide §1.2)
                pass
            else:
                # several consumers (or deferred commits): materialize
                # once so every consumer reads the same arrival
                # timestamps from checkpointed blocks
                batch = batch.localCheckpoint(eager=True)
        self._dispatch(stream, batch,
                       _depth=getattr(self._depth_tls, "depth", 0),
                       targets=targets, n_rows=n,
                       checkpointed=True)
        return n

    def _coerce_batch(self, sd: StreamDef, rows, columns) -> DataFrame:
        """Name-based projection + cast onto the declared stream schema
        (reference exec_stream_project/coerce_raw_input
        src/stream_fdw.c:325-433)."""
        if isinstance(rows, DataFrame):
            src = rows
        else:
            rows = list(rows)
            if not rows:
                return self.spark.createDataFrame([], sd.schema)
            declared = [f.name for f in sd.schema.fields
                        if f.name != ARRIVAL_COL]
            if isinstance(rows[0], dict):
                cols = list(declared)
                # clients may set arrival_timestamp explicitly (the
                # reference allows it; SW tests use synthetic time) —
                # keep it when any row supplies it
                if any(ARRIVAL_COL in r for r in rows):
                    cols.append(ARRIVAL_COL)
                dict_rows = rows
            else:
                cols = columns or declared[: len(rows[0])]
                dict_rows = [dict(zip(cols, r)) for r in rows]
            fields = [sd.schema[c] for c in cols if c in sd.schema.fieldNames()]
            schema = T.StructType(fields)
            data = [tuple(_py_coerce(r.get(f.name), f.dataType)
                          for f in fields) for r in dict_rows]
            # slice count derived from the batch size, not the core
            # count: createDataFrame spreads even a 2-row list across
            # defaultParallelism slices, and every downstream job then
            # schedules that many near-empty tasks (a 32-task eager
            # checkpoint of 2 rows measured ~10× the 1-slice cost).
            # ceil(n/1000) keeps bulk inserts parallel — at the
            # driver's lower-core runs defaultParallelism caps it, so
            # the scaling measurement stays honest (guide §2.4
            # scale-adaptive partitioning)
            slices = max(1, min(self.spark.sparkContext.defaultParallelism,
                                -(-len(data) // 1000)))
            src = self.spark.createDataFrame(
                self.spark.sparkContext.parallelize(data, slices), schema)
        out_cols = []
        for f in sd.schema.fields:
            if f.name == ARRIVAL_COL:
                if f.name in src.columns:
                    # rows without an explicit arrival time fall back
                    # to the ingest clock
                    out_cols.append(
                        F.coalesce(F.col(f.name).cast(f.dataType),
                                   F.current_timestamp())
                        .alias(ARRIVAL_COL))
                else:
                    out_cols.append(F.current_timestamp().alias(ARRIVAL_COL))
            elif f.name in src.columns:
                out_cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
            else:
                out_cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        return src.select(*out_cols)

    def _dispatch(self, stream: str, batch: DataFrame,
                  _depth: int = 0, targets: list[str] | None = None,
                  n_rows: int | None = None,
                  checkpointed: bool = False,
                  txn: tuple[str, int] | None = None) -> None:
        if _depth > 16:
            raise CQError("continuous-query cycle detected")
        prev_depth = getattr(self._depth_tls, "depth", 0)
        self._depth_tls.depth = _depth + 1
        try:
            return self._dispatch_inner(stream, batch, _depth, targets,
                                        n_rows, checkpointed, txn)
        finally:
            self._depth_tls.depth = prev_depth

    def _dispatch_inner(self, stream: str, batch: DataFrame,
                        _depth: int, targets: list[str] | None,
                        n_rows: int | None,
                        checkpointed: bool,
                        txn: tuple[str, int] | None = None) -> None:
        sd = self.streams[stream]
        readers = [r for r in sd.readers
                   if targets is None or r in targets]
        if not readers:
            return
        sd.input_batches += 1
        if n_rows is not None:
            sd.input_rows += n_rows
        if not checkpointed:
            batch = batch.localCheckpoint(eager=True)
        batch.createOrReplaceTempView(stream)

        def run_view(rname: str):
            """Worker + combiner for one CV, plus the view's own osrel
            SEGMENT WRITE (round-8 task 8: the write is a whole Spark
            job, so emitting as soon as this view's merge lands
            overlaps it with sibling merges instead of waiting for the
            slowest view).  Returns (osrel, segment path) for the
            SERIAL phase, which only performs downstream DISPATCH —
            that recursively runs downstream CQ merges and must stay
            ordered and unthreaded (two osrels feeding one downstream
            CV must never interleave its matrel commits)."""
            cv = self.views[rname]
            pre = self._worker_input(cv.plan, stream, batch)
            osrel = f"{rname}_osrel"
            # SW views emit only via the ticker (tick_sw), matching
            # the reference (combiner.c:992 — SW osrel rows come
            # from the SW tick, not per-batch combines)
            want_os = (cv.plan.sw_column is None and
                       self._wants_osrel(osrel))
            if n_rows is not None:
                cv.stats.input_rows += n_rows
            t0 = time.monotonic()
            if self.commit_interval_batches > 1:
                # replay guard at ACCUMULATE time: a replayed epoch
                # whose version is already committed must not re-enter
                # the pending buffer (it would ride a later interval's
                # merge and double-count)
                if txn is not None and (
                        (done := cv.matrel.txn_version(txn[0]))
                        is not None) and txn[1] <= done:
                    os_rows = None
                else:
                    cv.accumulate(pre, txn=txn)
                    if len(cv._pending) >= self.commit_interval_batches:
                        os_rows = cv.commit_pending(emit_changes=want_os)
                    else:
                        os_rows = None
            else:
                os_rows = cv.process_batch(pre, emit_changes=want_os,
                                           txn=txn)
            cv.stats.exec_ms += (time.monotonic() - t0) * 1000.0
            seg = None
            if os_rows is not None:
                seg, _ = self._write_osrel_segment(osrel, os_rows)
            return osrel, seg

        view_names = [r for r in readers
                      if r in self.views and self.views[r].active]
        emissions: dict[str, tuple] = {}
        failures: dict[str, BaseException] = {}

        def run_view_guarded(rname: str):
            # per-view isolation: one failing view must not abort the
            # batch before siblings that already COMMITTED their
            # matrels get their osrel rows emitted (a committed-but-
            # unemitted view silently starves downstream CQs of deltas)
            try:
                emissions[rname] = run_view(rname)
            except BaseException as exc:  # re-raised after emission
                failures[rname] = exc
                self.views[rname].stats.errors += 1

        if len(view_names) > 1 and self.parallel_dispatch:
            # concurrent combiners: each CV's worker+merge touches its
            # OWN matrel store, so the per-view phase parallelizes
            # safely (the reference runs one combiner process per CQ
            # group for the same reason); Spark schedules the
            # concurrent jobs across the shared executor pool
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(
                    max_workers=min(8, len(view_names))) as pool:
                list(pool.map(run_view_guarded, view_names))
        else:
            for rname in view_names:
                run_view_guarded(rname)

        for rname in readers:  # serial phase, original reader order
            if rname in emissions:
                osrel, seg = emissions[rname]
                if seg is not None:
                    sd2 = self.streams.get(osrel)
                    if sd2 is not None and sd2.readers:
                        self._dispatch_osrel(
                            osrel, self._read_osrel_segment(osrel, seg),
                            _depth)
            elif rname in self.transforms:
                t = self.transforms[rname]
                if not t.active:
                    continue
                t0 = time.monotonic()
                out = t.process_batch(batch)
                t.stats.exec_ms += (time.monotonic() - t0) * 1000.0
                if n_rows is not None:
                    t.stats.input_rows += n_rows
                # reader-gated like CV osrels: the transform body still
                # ran (its outputfunc fired inside process_batch), but
                # the output DataFrame is lazy — skipping the segment
                # write when nothing reads the osrel costs zero jobs
                if self._wants_osrel(f"{rname}_osrel"):
                    self._emit_osrel(f"{rname}_osrel", out, _depth)

        if failures:  # surface the first failure, siblings fully emitted
            raise failures[next(n for n in view_names if n in failures)]

    def _wants_osrel(self, osrel: str) -> bool:
        """Should change rows be computed/written for this output
        stream?  True when history retention is opted in
        (``track_output_streams``) or a downstream CQ reads the osrel
        (reference src/combiner.c:1477-1489: the osrel is closed
        immediately, and emission skipped, when nothing reads it)."""
        if self.track_output_streams:
            return True
        sd = self.streams.get(osrel)
        return bool(sd and sd.readers)

    def _worker_input(self, plan: CQPlan, stream: str,
                      batch: DataFrame) -> DataFrame:
        if re.fullmatch(r"[A-Za-z_][\w.]*", plan.from_clause.strip()):
            return batch  # simple FROM stream
        # the batch's session, not ctx.spark: a foreachBatch frame is
        # bound to a cloned session with its own temp-view catalog
        # (see Transform.process_batch)
        sess = batch.sparkSession
        batch.createOrReplaceTempView(stream)
        return sess.sql(f"SELECT * FROM {plan.from_clause}")

    def _write_osrel_segment(self, osrel: str,
                             rows: DataFrame) -> tuple[str | None, int]:
        """Append change rows to the osrel's parquet segment log and
        return (segment path, rows emitted) — (None, 0) when the batch
        emitted nothing.
        The rows never pass through the driver (reference combiner
        emits osrel tuples executor-side, src/combiner.c:1578-1601);
        the row count rides the write job as an Observation.

        Thread-safe across DISTINCT osrels (each view owns its osrel:
        seq/schema/gc/stat state is per-osrel keyed), which is what
        lets parallel_dispatch emit each view's segment as soon as its
        own merge lands instead of after the slowest sibling."""
        from pyspark.sql import Observation
        obs = Observation()
        seq = self._osrel_seq.get(osrel, 0)
        seg = os.path.join(self.osrel_root, osrel, f"seg_{seq}")
        rows.observe(obs, F.count(F.lit(1)).alias("n")) \
            .write.mode("overwrite").parquet(seg)
        n = int(obs.get["n"])
        if n == 0:
            shutil.rmtree(seg, ignore_errors=True)
            return None, 0
        self._osrel_seq[osrel] = seq + 1
        self._osrel_schema[osrel] = rows.schema
        self._osrel_gc(osrel)
        src = osrel[: -len("_osrel")]
        owner = self.views.get(src) or self.transforms.get(src)
        if owner is not None:
            owner.stats.output_rows += n
        return seg, n

    def _emit_osrel(self, osrel: str, rows: DataFrame, depth: int) -> int:
        """Segment write + downstream dispatch in one step (the
        transform/ticker path; batch-parallel CV dispatch splits the
        two so dispatch stays in reader order).  Returns rows
        emitted."""
        seg, n = self._write_osrel_segment(osrel, rows)
        if seg is None:
            return 0
        sd = self.streams.get(osrel)
        if sd is not None and sd.readers:
            # downstream CQs read the just-written segment — a stable
            # snapshot, no recompute of the change-row plan
            self._dispatch_osrel(osrel,
                                 self._read_osrel_segment(osrel, seg),
                                 depth)
        return n

    def _read_osrel_segment(self, osrel: str, seg: str) -> DataFrame:
        """Read back ONE just-written segment.  The writer recorded the
        segment's exact schema (`_osrel_schema`), so passing it skips
        the reader's footer-inference pass — ~50 ms of driver time per
        downstream dispatch (guide §1.2 constant-work removal)."""
        schema = self._osrel_schema.get(osrel)
        reader = self.spark.read
        if schema is not None:
            reader = reader.schema(schema)
        return reader.parquet(seg)

    def _osrel_segments(self, osrel: str) -> list[str]:
        base = os.path.join(self.osrel_root, osrel)
        if not os.path.isdir(base):
            return []
        segs = sorted((int(e[4:]), e) for e in os.listdir(base)
                      if e.startswith("seg_"))
        return [os.path.join(base, e) for _, e in segs]

    def _osrel_gc(self, osrel: str) -> None:
        segs = self._osrel_segments(osrel)
        for path in segs[: max(0, len(segs) - self.osrel_retention_segments)]:
            shutil.rmtree(path, ignore_errors=True)

    def _dispatch_osrel(self, osrel: str, rows: DataFrame, depth: int) -> None:
        sd = self.streams[osrel]
        if not sd.schema.fields:
            sd.schema = rows.schema
        # the segment just written IS a stable snapshot (immutable until
        # retention GC, 256 segments away), so re-checkpointing it in
        # _dispatch was a whole redundant Spark job per osrel hop —
        # downstream consumers can scan the parquet directly (guide
        # §1.2 constant-work removal).  Deferred-commit mode keeps the
        # checkpoint: an accumulate()d lazy plan may outlive many more
        # segment writes, and checkpointed blocks cannot be GC'd out
        # from under it.
        self._dispatch(osrel, rows, _depth=depth + 1,
                       checkpointed=self.commit_interval_batches == 1)

    # -- reads ----------------------------------------------------------------
    def _flush_cv(self, name: str) -> None:
        cv = self.views.get(name)
        if cv is None or not cv._pending:
            return
        osrel = f"{name}_osrel"
        want_os = (cv.plan.sw_column is None and
                   self._wants_osrel(osrel))
        os_rows = cv.commit_pending(emit_changes=want_os)
        if os_rows is not None:
            self._emit_osrel(osrel, os_rows, 0)

    def read_view(self, name: str, at: float | None = None) -> DataFrame:
        cv = self.views.get(name)
        if cv is not None and self._prepared:
            self._flush_prepared(cv.plan.stream)
        self._flush_cv(name)
        return self.views[name].read(at=at)

    def pin_view(self, name: str, pin_name: str) -> dict:
        """Pin view ``name``'s current state under ``pin_name`` — a
        named, GC-exempt snapshot of the matrel's bucket map, taken
        under the view's commit lock (so it can never interleave with
        a combiner merge).  ``read_view_pinned`` replays the view
        exactly as it stood, across later merges, compactions, SW
        expiry, and truncates — reproducible inputs for a training
        run over continuously-maintained aggregates.  Returns the pin
        record ({buckets, version, at})."""
        cv = self.views[name]
        if self._prepared:
            self._flush_prepared(cv.plan.stream)
        self._flush_cv(name)
        with cv.commit_lock:
            return cv.matrel.pin(pin_name)

    def unpin_view(self, name: str, pin_name: str) -> None:
        """Drop a view pin; its version dirs become reclaimable on
        the matrel's next GC sweep unless still live or held by
        another pin."""
        cv = self.views[name]
        with cv.commit_lock:
            cv.matrel.unpin(pin_name)

    def view_pins(self, name: str) -> dict:
        """Live pin records of a view: {pin_name: {buckets, version,
        at}}."""
        return self.views[name].matrel.pins()

    def read_view_pinned(self, name: str, pin_name: str) -> DataFrame:
        """Finalized rows of a view pin (see :meth:`pin_view`)."""
        return self.views[name].read_pinned(pin_name)

    def read_matrel(self, name: str) -> DataFrame:
        self._flush_cv(name)
        df = self.views[name].matrel.read()
        if df is None:
            cv = self.views[name]
            probe = cv.worker(self.empty_stream_df(cv.plan.stream))
            return probe.withColumn(BUCKET_COL, F.lit(0)).limit(0)
        return df

    def output_of(self, name: str, with_seq: bool = False) -> DataFrame:
        """Retained tail of a CQ's output stream, read from disk —
        scale-safe for high-cardinality CVs and long-running engines.

        Row order across segments is NOT emission order (a multi-path
        parquet scan orders files for split packing, not by name);
        ``with_seq=True`` appends an ``_seq`` column carrying each
        row's emission-batch number (its segment index) so callers
        can ``orderBy("_seq")`` — e.g. to fold a ticker's old/new
        chain.  Rows within one batch share a seq; their relative
        order is immaterial (one change row per group per batch)."""
        osrel = f"{name}_osrel"
        segs = self._osrel_segments(osrel)
        if not segs:
            schema = self._osrel_schema.get(osrel)
            if schema is None:
                # nothing emitted yet (e.g. reader-gated with no
                # readers): fall back to the CREATE-time osrel schema
                sd = self.streams.get(osrel)
                schema = (sd.schema if sd is not None and sd.schema.fields
                          else T.StructType())
                if not self._wants_osrel(osrel) and \
                        osrel not in self._osrel_gate_warned:
                    # round-6 default flip (emission is reader-gated,
                    # matching src/combiner.c:1477-1489): surface the
                    # behavior change once instead of silently
                    # returning empty frames forever
                    self._osrel_gate_warned.add(osrel)
                    logging.getLogger(__name__).warning(
                        "output_of(%r): nothing has been emitted and "
                        "no downstream CQ reads this output stream — "
                        "change-row emission is reader-gated by "
                        "default; pass track_output_streams=True to "
                        "PipelineContext for a retained history tail "
                        "with no readers attached", name)
            empty = self.spark.createDataFrame([], schema)
            return (empty.withColumn("_seq", F.lit(None).cast("long"))
                    if with_seq else empty)
        # segments may span an emission-schema change (e.g. an added
        # struct column): merge instead of trusting the first file
        df = self.spark.read.option("mergeSchema", "true") \
            .parquet(*segs)
        if with_seq:
            df = df.withColumn(
                "_seq",
                # anchored to the dir that directly CONTAINS the file:
                # a bare seg_(\d+) takes the FIRST match anywhere in
                # the absolute path, so a store root like
                # /data/seg_3/pdb (or a view named seg_2_foo) would
                # stamp every row with the same wrong _seq — the same
                # sharp edge as matrel's __v extraction (round-11
                # review)
                F.regexp_extract(F.input_file_name(),
                                 r"/seg_(\d+)/[^/]*$", 1)
                .cast("long"))
        return df

    def combine_read(self, name: str, group_by: list[str] | None = None,
                     at: float | None = None,
                     pin: str | None = None) -> DataFrame:
        """Read-time re-rollup over persisted partial states — the
        ``combine(col)`` feature (reference RewriteCombineAggs
        src/analyzer.c:4662; test user_combine.sql).  ``pin`` rolls
        up a named snapshot's states instead of the live matrel (SW
        cutoff at the pin instant), so a training run's coarser
        summaries stay derivable from the exact state it consumed."""
        cv = self.views[name]
        if pin is not None:
            # no flush: a pin is immutable — flushing would run a
            # whole combiner merge whose output this read ignores
            states = cv.pinned_states(pin)
        else:
            self._flush_cv(name)
            states = (cv.sw_states(at) if cv.plan.sw_column is not None
                      else cv.matrel.read())
        if states is None:
            return cv.read(at=at).limit(0)
        group_by = group_by or []
        keys = [F.col(c) for c in group_by]
        jvm_aggs, pd_aggs = [], []
        for call in cv.plan.aggs:
            spec = cv.ctx.registry.get(call.func)
            target = pd_aggs if spec.pandas else jvm_aggs
            s = lambda suffix, out=call.out: F.col(state_col(out, suffix))
            for suffix, col in spec.merge_exprs(s, call.args).items():
                target.append(col.alias(state_col(call.out, suffix)))
        merged = (grouped_agg(states, keys, group_by, jvm_aggs, pd_aggs)
                  if (jvm_aggs or pd_aggs) else states)
        df = merged
        out_cols = list(group_by)
        for call in cv.plan.aggs:
            spec = cv.ctx.registry.get(call.func)
            s = lambda suffix, out=call.out: F.col(state_col(out, suffix))
            df = df.withColumn(call.out, spec.finalize(s, call.args))
            out_cols.append(call.out)
        return df.select(*out_cols)

    # -- ops ------------------------------------------------------------------
    def combine_table(self, name: str, states: DataFrame) -> None:
        """Bulk-merge a table of partial-state rows into a CV's matrel
        (backfill / repartition tool; reference combine_table
        src/combiner.c:2250-2351).  ``states`` must have the matrel's
        group + state columns."""
        cv = self.views[name]
        with cv.commit_lock:
            cv.matrel.merge(states, cv._bucket_cols, cv.merge_fn)

    def dump_state(self, name: str, path: str) -> int:
        """Export a CV's matrel partial states to a portable directory
        (the pg_dump path of reference test_dump_restore.py: the dump
        carries matrel rows + catalog entries, and restoring them
        reproduces CV results without replaying the stream).  Writes
        the partial-state parquet plus a DUMP.json recording the CV's
        SQL for compatibility checking at restore.  Returns the number
        of state rows dumped."""
        import json
        if name not in self.views:
            raise CQError(f"continuous view {name} does not exist")
        self._flush_cv(name)
        cv = self.views[name]
        states = cv.matrel.read()
        os.makedirs(path, exist_ok=True)
        n = 0
        if states is not None:
            from pyspark.sql import Observation
            obs = Observation()
            states.observe(obs, F.count(F.lit(1)).alias("n")) \
                .write.mode("overwrite").parquet(os.path.join(path, "states"))
            n = int(obs.get["n"])
        with open(os.path.join(path, "DUMP.json"), "w") as f:
            json.dump({"name": name, "sql": cv.sql, "rows": n}, f)
        return n

    def restore_state(self, name: str, path: str,
                      merge: bool = False) -> int:
        """Import matrel partial states written by ``dump_state`` into
        an existing CV with the same definition (reference
        test_dump_restore.py).  ``merge=False`` replaces the matrel —
        the dump/restore-into-fresh-install flow; ``merge=True``
        combines the dumped states with the live ones (partial states
        are combinable by design, the same property combine_table
        uses) — the shard-migration flow.  Bucket ids are recomputed
        for this context's bucket count, so dumps move between
        engines with different num_buckets."""
        import json
        cv = self.views.get(name)
        if cv is None:
            raise CQError(f"continuous view {name} does not exist")
        with open(os.path.join(path, "DUMP.json")) as f:
            meta = json.load(f)
        if " ".join(meta["sql"].split()) != " ".join(cv.sql.split()):
            raise CQError(
                f"dump of {meta['name']!r} does not match the definition "
                f"of {name!r}; restore into a CV created with the same SQL")
        if meta["rows"] == 0:
            if not merge:
                with cv.commit_lock:
                    cv.matrel.truncate()
            return 0
        states = self.spark.read.parquet(os.path.join(path, "states")) \
            .drop(BUCKET_COL)
        with cv.commit_lock:
            if merge:
                cv.matrel.merge(states, cv._bucket_cols, cv.merge_fn)
            else:
                cv.matrel.overwrite(states, cv._bucket_cols)
        return int(meta["rows"])

    # matrels_writable GUC analog (reference cont_matrel.sql:
    # UPDATE/DELETE/INSERT against a matrel are rejected unless
    # pipelinedb.matrels_writable is on)
    matrels_writable: bool = False

    def _writable_matrel(self, name: str) -> "ContView":
        cv = self.views.get(name)
        if cv is None:
            raise CQError(f"continuous view {name} does not exist")
        if not self.matrels_writable:
            raise CQError("cannot modify materialization table: set "
                          "ctx.matrels_writable = True "
                          "(pipelinedb.matrels_writable)")
        self._flush_cv(name)
        return cv

    def update_matrel(self, name: str, set_exprs: dict[str, str],
                      where: str | None = None) -> None:
        """``UPDATE <cv>_mrel SET col = expr [WHERE ...]`` over the
        matrel's state columns (reference cont_matrel.sql; for simple
        aggregates like count the state column IS the visible value).
        Subsequent stream inserts merge on top of the edited states."""
        cv = self._writable_matrel(name)
        states = cv.matrel.read()
        if states is None:
            return
        cond = F.expr(where) if where else F.lit(True)
        for col in set_exprs:
            if col not in states.columns:
                raise CQError(f"matrel column {col!r} does not exist "
                              f"(state columns: "
                              f"{[c for c in states.columns]})")
        # SQL UPDATE evaluates every SET right-hand side against the OLD
        # row, so build all replacements over the original columns in
        # one select (sequential withColumn would let a later expr see
        # an earlier assignment's new value).
        df = states.select(*[
            (F.when(cond, F.expr(set_exprs[c])).otherwise(F.col(c))
             if c in set_exprs else F.col(c)).alias(c)
            for c in states.columns])
        with cv.commit_lock:
            cv.matrel.overwrite(df.drop(BUCKET_COL), cv._bucket_cols)

    def delete_matrel_rows(self, name: str,
                           where: str | None = None) -> int:
        """``DELETE FROM <cv>_mrel [WHERE ...]`` (reference
        cont_matrel.sql); no WHERE empties the matrel."""
        cv = self._writable_matrel(name)
        with cv.commit_lock:
            if where is None:
                cv.matrel.truncate()
                return -1
            return cv.matrel.delete_where(F.expr(where))

    def add_matrel_constraint(self, view: str, name: str,
                              check: str) -> None:
        """``ALTER TABLE <cv>_mrel ADD CONSTRAINT ... CHECK (...)``
        (reference matrel_constraints.sql): a boolean expression over
        the CV's user-visible columns enforced at every upsert —
        violating merges are rejected and the group keeps its previous
        row (new violating groups never materialize).  Validated at
        ADD against the CV's row type; persisted for catalog replay."""
        cv = self.views.get(view)
        if cv is None:
            raise CQError(f"continuous view {view} does not exist")
        try:
            self.spark.createDataFrame([], cv._overlay_schema()) \
                .filter(F.expr(check))
        except Exception as exc:
            raise CQError(f"invalid constraint {name!r}: {exc}") from exc
        cv.constraints[name] = check
        self._catalog_add({"kind": "constraint", "name": f"{view}.{name}",
                           "view": view, "cname": name, "check": check})

    def drop_matrel_constraint(self, view: str, name: str) -> None:
        cv = self.views.get(view)
        if cv is None:
            raise CQError(f"continuous view {view} does not exist")
        cv.constraints.pop(name, None)
        self._catalog_remove("constraint", f"{view}.{name}")

    def copy_from(self, stream: str, path: str, fmt: str = "parquet",
                  options: dict[str, str] | None = None) -> int:
        """COPY stream FROM file — bulk file→stream ingestion
        (reference DoStreamCopy src/copy.c:601)."""
        reader = self.spark.read.format(fmt)
        if fmt in ("csv", "json"):
            reader = reader.option("header", "true")
        for k, v in (options or {}).items():
            reader = reader.option(k, v)
        return self.insert(stream, reader.load(path))

    def activate(self, name: str, on: bool = True) -> None:
        if name in self.views:
            self.views[name].active = on
        elif name in self.transforms:
            self.transforms[name].active = on

    def deactivate(self, name: str) -> None:
        self.activate(name, False)

    def truncate_view(self, name: str) -> None:
        cv = self.views[name]
        with cv.commit_lock:
            cv.matrel.truncate()

    def compact_view(self, name: str) -> int:
        """Rewrite a CV's matrel into one fresh packed version and drop
        all old version dirs (VACUUM FULL analog) — bounds the disk
        amplification of stale rows pinned by cold buckets.  Returns
        the number of version dirs removed."""
        cv = self.views.get(name)
        if cv is None:
            raise CQError(f"continuous view {name} does not exist")
        self._flush_cv(name)
        with cv.commit_lock:
            return cv.matrel.compact()

    def flush(self) -> None:
        """Sync barrier (reference pipeline_flush): commit every CV's
        pending batches; streaming attachments additionally call
        processAllAvailable (see streaming/runtime.py)."""
        for p in list(self._prepared):
            p.flush()
        for name in list(self.views):
            self._flush_cv(name)

    # -- prepared inserts (PREPARE / EXECUTE) ------------------------------
    def prepare_insert(self, stream: str,
                       columns: list[str] | None = None,
                       batch_size: int = 256) -> "PreparedInsert":
        """``PREPARE p AS INSERT INTO stream (cols) VALUES ($1, ...)``
        analog (reference prepared_stream_insert.sql,
        src/stream_fdw.c:477-585).  Returns a handle whose
        ``execute(*params)`` binds one row; rows buffer client-side and
        ship as one micro-batch per ``batch_size`` (the reference
        likewise microbatches prepared inserts per commit) — reads of
        any consuming CV flush pending rows first, so results are
        always consistent with every EXECUTE so far."""
        sd = self.streams.get(stream)
        if sd is None:
            raise CQError(f"unknown stream {stream}")
        valid = [f.name for f in sd.schema.fields]
        if columns is None:
            columns = valid
        for c in columns:
            if c not in valid:
                raise CQError(f"column {c!r} does not exist in stream "
                              f"{stream} (columns: {valid})")
        p = PreparedInsert(self, stream, list(columns), batch_size)
        self._prepared.append(p)
        return p

    def _flush_prepared(self, stream: str) -> None:
        for p in list(self._prepared):
            if p.stream == stream:
                p.flush()

    def reap_ttl(self, name: str, now: float | None = None) -> int:
        self._flush_cv(name)
        return self.views[name].reap(now=now)

    def tick_sw(self, name: str, now: float | None = None) -> int:
        """Sliding-window output-stream ticker: recompute instantaneous
        SW values, diff against the previous tick's rows, emit
        (old, new) change rows to the CV's output stream, and GC
        expired matrel steps (reference tick_sw_groups
        src/combiner.c:992-1134; SW osrels carry no delta column).
        Returns the number of change rows emitted."""
        self._flush_cv(name)
        cv = self.views[name]
        if cv.plan.sw_column is None:
            raise CQError(f"{name} is not a sliding-window view")
        now = now if now is not None else time.time()
        osdir = os.path.join(self.osrel_root, f"{name}_osrel")
        snap = os.path.join(osdir, "_snap")
        if not self._wants_osrel(f"{name}_osrel"):
            # reference parity (src/combiner.c:1619-1622): with no
            # output-stream readers the SW tick skips snapshot + diff
            # + emission entirely; only window expiry still runs.  A
            # reader attaching later sees post-attach ticks (its first
            # tick emits every in-window row as an old=NULL insert).
            shutil.rmtree(snap, ignore_errors=True)
            cv.reap(now=now)
            return 0
        # snapshot this tick's instantaneous SW rows to DISK (a parquet
        # snapshot swapped per tick) instead of an accumulating chain
        # of localCheckpoints: the previous tick's blocks were only
        # freed by GC, so a long-running ticker grew storage memory
        # unboundedly.  The diff against the previous snapshot is a
        # DataFrame full-outer join with no-op elision — no driver
        # collect of CV rows, so a SW CV with millions of groups ticks
        # fine (reference tick_sw_groups src/combiner.c:992-1134
        # likewise diffs in the combiner).  Bonus: tick state survives
        # an engine restart, so the first post-restart tick diffs
        # against the last emitted snapshot instead of re-emitting
        # every group as an insert.
        new_snap = os.path.join(osdir, "_snap.new")
        cv.read(at=now).write.mode("overwrite").parquet(new_snap)
        cur = self.spark.read.parquet(new_snap)
        kcols = cv.key_cols()
        kaliases = [f"__k{i}" for i in range(len(kcols))]

        def sided(df: DataFrame, side: str) -> DataFrame:
            keys = [F.col(k).alias(a) for k, a in zip(kcols, kaliases)]
            return df.select(*keys,
                             F.struct(*[F.col(c) for c in df.columns])
                             .alias(side))

        new_side = sided(cur, "new")
        prev_df = (self.spark.read.parquet(snap)
                   if os.path.isdir(snap) else None)
        if prev_df is not None:
            joined = new_side.join(sided(prev_df, "old"), on=kaliases,
                                   how="full_outer")
        else:
            joined = new_side.withColumn(
                "old", F.lit(None).cast(new_side.schema["new"].dataType))
        changes = (joined.filter(~F.col("old").eqNullSafe(F.col("new")))
                   .select("old", "new"))
        cv.reap(now=now)
        n = self._emit_osrel(f"{name}_osrel", changes, 0)
        # emission consumed both snapshots; promote the new one.  The
        # promotion is not atomic with the emission write: a crash in
        # between re-diffs against the pre-emission snapshot next tick
        # and re-emits that tick's changes — the same at-least-once
        # window as the foreachBatch epoch marker (and the reference's
        # tick cache, which is memory-only and re-emits EVERYTHING on
        # restart, combiner.c:78-96; persisting the snapshot at all is
        # strictly stronger than the reference contract).
        shutil.rmtree(snap, ignore_errors=True)
        os.rename(new_snap, snap)
        return n

    def empty_stream_df(self, stream: str) -> DataFrame:
        return self.spark.createDataFrame([], self.streams[stream].schema)

    def sql(self, query: str, at: float | None = None) -> DataFrame:
        """Ad-hoc SQL over continuous views (the ordinary read path,
        reference §3.3: any PG query may scan overlay views and — when
        ``matrels_writable``-style access is wanted — matrels).  Every
        CV's overlay is registered as ``<name>``, its matrel as
        ``<name>_mrel``, before the query runs, so joins/window
        functions/ORDER BY over CVs all work.  ``combine(col)`` queries
        over a single CV re-aggregate persisted partial states under
        the query's (coarser) grouping (reference RewriteCombineAggs
        src/analyzer.c:4662, test user_combine.sql)."""
        m_ins = re.match(r"(?i)^\s*INSERT\s+INTO\s+(\w+)\s*"
                         r"(?:\(([^)]*)\)\s*)?(\(?\s*SELECT\b.*)$",
                         query, re.S)
        if m_ins and m_ins.group(1) in self.streams:
            return self._insert_select(m_ins.group(1), m_ins.group(2),
                                       m_ins.group(3))
        m_vals = re.match(r"(?i)^\s*INSERT\s+INTO\s+(\w+)\s*"
                          r"(?:\(([^)]*)\)\s*)?VALUES\s*(.*)$",
                          query, re.S)
        if m_vals and m_vals.group(1) in self.streams:
            # INSERT INTO stream [(cols)] VALUES (expr, ...), ... with
            # arbitrary SQL expressions in the tuples (reference
            # stream_exprs.sql) — rewritten onto the SELECT insert path
            # via a Spark inline table
            stream, col_list, tuples = m_vals.groups()
            if col_list:
                cols = [c.strip() for c in col_list.split(",")]
            else:
                cols = [f.name for f in self.streams[stream].schema.fields
                        if f.name != ARRIVAL_COL]
            sel = (f"SELECT * FROM (VALUES {tuples.strip().rstrip(';')}) "
                   f"AS __v({', '.join(cols)})")
            return self._insert_select(stream, col_list, sel)
        if re.search(r"(?i)\b(?:sw_)?combine\s*\(", query):
            rewritten = self._rewrite_combine_sql(query, at)
            if rewritten is not None:
                return rewritten
        for name, cv in self.views.items():
            self._flush_cv(name)
            cv.read(at=at).createOrReplaceTempView(name)
            m = cv.matrel.read()
            if m is not None:
                m.createOrReplaceTempView(f"{name}_mrel")
        return self.spark.sql(query)

    def _insert_select(self, stream: str, col_list: str | None,
                       select_sql: str) -> DataFrame:
        """``INSERT INTO stream [(cols)] SELECT ...`` — stream inserts
        fed by a query over ordinary tables (reference
        stream_insert_subselect.sql).  Selecting from another stream
        is rejected, as in the reference (streams are not scannable
        relations)."""
        sel = select_sql.strip()
        while sel.startswith("(") and sel.endswith(")"):
            sel = sel[1:-1].strip()
        for sname in self.streams:
            if re.search(rf"(?i)\bFROM\s+{re.escape(sname)}\b", sel):
                raise CQError("can't SELECT from stream "
                              f"{sname} in a stream INSERT")
        for tname, tdf in self.tables.items():
            tdf.createOrReplaceTempView(tname)
        df = self.spark.sql(sel)
        if col_list:
            cols = [c.strip() for c in col_list.split(",")]
            if len(cols) != len(df.columns):
                raise CQError("INSERT column list arity doesn't match "
                              "the SELECT output")
            df = df.toDF(*cols)
        n = self.insert(stream, df)
        return self.spark.createDataFrame(
            [(n,)], T.StructType([T.StructField("inserted", T.LongType())]))

    def _rewrite_combine_sql(self, query: str, at: float | None
                             ) -> DataFrame | None:
        """General ``combine(col)`` rewrite (reference RewriteCombineAggs
        src/analyzer.c:4662; test user_combine.sql:24-50): the CV in the
        FROM clause is replaced by its matrel *states*, the FROM/WHERE
        (including joins against other relations) run as plain SQL over
        those states, the GROUP BY re-merges partial states under the
        query's grouping, and each ``combine(x)`` in the SELECT list is
        finalized — arbitrary expressions around combine results are
        allowed (``round(combine(x), 2)``, ``combine(x)/combine(n)``).
        Exactly one CV per query; returns None when the shape doesn't
        match (caller falls through to plain SQL)."""
        from pipelinedb_spark.analyzer import split_clauses, split_top_level
        clauses = split_clauses(query)
        from_clause = clauses.get("FROM", "").strip()
        if not from_clause or "HAVING" in clauses:
            return None
        # CV detection by FROM-clause RELATION identifiers (not a
        # substring search over the whole clause — a join column or
        # alias named like a CV must not trigger the rewrite)
        rels = {r.lower() for r in _from_relations(from_clause)}
        cv_names = [n for n in self.views if n.lower() in rels]
        sel_combines = list(_combine_calls(clauses.get("SELECT", "")))
        if len(cv_names) != 1:
            plain = {t.lower() for t in self.tables} | \
                    {f"{v.lower()}_mrel" for v in self.views}
            if sel_combines and not cv_names and rels & plain:
                # combine() over a plain table (user_combine.sql:14)
                raise CQError("relation is not a continuous view")
            return None
        cv_name, cv = cv_names[0], self.views[cv_names[0]]
        # argument validation, mirroring the reference's targeted
        # errors (user_combine.sql:8-22 / expected/user_combine.out)
        agg_outs = {call.out for call in cv.plan.aggs}
        cv_cols = {f.name for f in cv._overlay_schema().fields}
        for inner in sel_combines:
            args = [a.strip() for a in split_top_level(inner)]
            if len(args) != 1:
                raise CQError(
                    f"function combine({inner.strip()}) does not exist: "
                    "combine accepts a single aggregate column")
            arg = args[0]
            if not re.fullmatch(r"[A-Za-z_]\w*", arg):
                raise CQError(
                    "combine argument must be a single aggregate column")
            if arg not in agg_outs:
                if arg in cv_cols:
                    raise CQError(
                        "combine argument is not an aggregate column")
                raise CQError(f'column "{arg}" does not exist')
        if cv.plan.sw_column is not None:
            self._flush_cv(cv_name)
            states = cv.sw_states(at)
            if states is None:
                states = self.read_matrel(cv_name).limit(0)
        else:
            states = self.read_matrel(cv_name)
        sview = f"__{cv_name}_states"
        states.createOrReplaceTempView(sview)
        # register any plain tables referenced alongside the CV
        for tname, tdf in self.tables.items():
            tdf.createOrReplaceTempView(tname)
        from2 = re.sub(rf"(?i)\b{re.escape(cv_name)}\b", sview, from_clause)
        where = f" WHERE {clauses['WHERE']}" if "WHERE" in clauses else ""
        from pyspark.errors import AnalysisException
        try:
            base = self.spark.sql(f"SELECT * FROM {from2}{where}")
        except AnalysisException as exc:
            # a validated combine query with a bad FROM/WHERE must
            # surface ITS analysis error, not fall through to plain
            # SQL and die on the unresolvable combine() function
            logging.getLogger(__name__).warning(
                "combine rewrite: FROM/WHERE analysis failed: %s", exc)
            raise CQError(f"invalid combine query: {exc}") from exc
        # group keys: bare identifiers keep their name, expressions get
        # positional aliases; select items referencing the same text map
        # onto them
        group_exprs = (split_top_level(clauses["GROUP BY"])
                       if "GROUP BY" in clauses else [])
        key_names, keys = [], []
        gmap: dict[str, str] = {}
        for i, g in enumerate(group_exprs):
            name = g if re.fullmatch(r"[A-Za-z_]\w*", g) else f"__g{i}"
            key_names.append(name)
            keys.append(F.expr(g).alias(name))
            gmap[re.sub(r"\s+", "", g).lower()] = name
        # re-merge partial states under the query grouping
        jvm_aggs, pd_aggs = [], []
        for call in cv.plan.aggs:
            spec = self.registry.get(call.func)
            target = pd_aggs if spec.pandas else jvm_aggs
            s = lambda suffix, out=call.out: F.col(state_col(out, suffix))
            for suffix, col in spec.merge_exprs(s, call.args).items():
                target.append(col.alias(state_col(call.out, suffix)))
        if not (jvm_aggs or pd_aggs):
            return None
        try:
            merged = grouped_agg(base, keys, key_names, jvm_aggs, pd_aggs)
            # finalize every combinable column, then evaluate SELECT
            # items with combine(x) → the finalized column
            fin = {}
            df = merged
            for call in cv.plan.aggs:
                spec = self.registry.get(call.func)
                s = lambda suffix, out=call.out: F.col(state_col(out, suffix))
                fname = f"__fin_{call.out}"
                df = df.withColumn(fname, spec.finalize(s, call.args))
                fin[call.out] = fname
        except Exception as exc:
            logging.getLogger(__name__).warning(
                "combine rewrite: merge/finalize failed, falling back "
                "to plain SQL: %s", exc)
            return None
        out_cols = []
        for item in split_top_level(clauses["SELECT"]):
            item = item.strip()
            m_alias = re.match(r"(?is)^(.*?)\s+AS\s+(\w+)\s*$", item)
            expr_text, alias = ((m_alias.group(1), m_alias.group(2))
                                if m_alias else (item, None))

            def sub(m: "re.Match[str]") -> str:
                src = m.group(1)
                return f"`{fin[src]}`" if src in fin else m.group(0)

            rewritten = re.sub(
                r"(?i)\b(?:sw_)?combine\s*\(\s*([A-Za-z_]\w*)\s*\)",
                sub, expr_text)
            if rewritten == expr_text:
                # plain (non-combine) item: must be a grouping expr
                norm = re.sub(r"\s+", "", expr_text).lower()
                src = gmap.get(norm, expr_text)
                try:
                    out_cols.append(F.col(src).alias(alias or src))
                    continue
                except Exception:
                    return None
            try:
                col = F.expr(rewritten)
            except Exception:
                return None
            out_cols.append(col.alias(alias) if alias else
                            col.alias(re.sub(r"\W+", "_", expr_text)
                                      .strip("_").lower()))
        try:
            return df.select(*out_cols)
        except Exception:
            return None

    # -- introspection (pipelinedb.views / proc_stats analogs,
    #    reference miscutils.c catalogs + stats.c counters) -----------------
    def version(self) -> str:
        """pipelinedb.version() analog (reference pipeline_version,
        sql:2620-2623)."""
        from pipelinedb_spark import __version__
        return (f"pipelinedb_spark {__version__} "
                f"(PipelineDB 1.0.0-compatible surface) "
                f"on Spark {self.spark.version}")

    def set_ttl(self, name: str, ttl: str | None = None,
                ttl_column: str | None = None) -> tuple:
        """pipelinedb.set_ttl(cv, interval, column) — change or clear a
        CV's TTL at runtime (reference pipeline_set_ttl,
        sql:2636-2639).  Returns (name, ttl_seconds, ttl_column);
        persisted to the catalog for replay."""
        cv = self.views.get(name)
        if cv is None:
            raise CQError(f"continuous view {name} does not exist")
        if cv.plan.sw_column is not None:
            raise CQError("cannot set TTL on a sliding-window view "
                          "(its window defines expiration)")
        if ttl is None:
            cv.ttl, cv.ttl_column = None, None
        else:
            from pipelinedb_spark.analyzer import parse_interval
            if ttl_column is not None:
                cv.resolve_ttl_column(ttl_column)  # typo fails here,
                # not silently in the background reaper
            cv.ttl = parse_interval(ttl)
            cv.ttl_column = ttl_column
        for rec in self._catalog:
            if rec["kind"] == "view" and rec["name"] == name:
                rec["opts"]["ttl"] = ttl
                rec["opts"]["ttl_column"] = ttl_column
        if not self._replaying:
            self._catalog_flush()
        return (name, cv.ttl, cv.ttl_column)

    def ttl_expire(self, name: str) -> int:
        """pipelinedb.ttl_expire(cv) — synchronously delete this CV's
        TTL-expired rows, returning the delete count (reference
        pipeline_ttl_expire, sql:2630-2633; reaper.c:63-128)."""
        cv = self.views.get(name)
        if cv is None:
            raise CQError(f"continuous view {name} does not exist")
        self._flush_cv(name)
        return cv.reap()

    def get_worker_querydef(self, name: str) -> str:
        """Worker-plan introspection (reference
        pipeline_get_worker_querydef, sql:2661-2664): the partial-agg
        plan this CV runs per micro-batch, as Spark's formatted plan."""
        cv = self.views.get(name)
        if cv is None:
            raise CQError(f"continuous view {name} does not exist")
        probe = cv.worker(self.empty_stream_df(cv.plan.stream))
        return probe._jdf.queryExecution().explainString(
            self.spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))

    def get_combiner_querydef(self, name: str) -> str:
        """Combiner-plan introspection (reference
        pipeline_get_combiner_querydef, sql:2666-2669): the
        merge-partials plan, as Spark's formatted plan."""
        cv = self.views.get(name)
        if cv is None:
            raise CQError(f"continuous view {name} does not exist")
        probe = cv.worker(self.empty_stream_df(cv.plan.stream)) \
            .withColumn(BUCKET_COL, F.lit(0))
        merged = cv.merge_fn(probe)
        return merged._jdf.queryExecution().explainString(
            self.spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))

    def list_views(self) -> DataFrame:
        rows = []
        for name, cv in self.views.items():
            rows.append((name, "materialize", cv.sql, cv.active,
                         cv.plan.sw_seconds, cv.ttl))
        for name, tr in self.transforms.items():
            rows.append((name, "transform", tr.sql, tr.active, None, None))
        return self.spark.createDataFrame(
            rows, "name string, action string, query string, active boolean, "
                  "sw_seconds double, ttl_seconds double")

    def list_streams(self) -> DataFrame:
        rows = [(name, sd.schema.simpleString(), sd.readers)
                for name, sd in self.streams.items()]
        return self.spark.createDataFrame(
            rows, "name string, schema string, readers array<string>")

    def stats_df(self) -> DataFrame:
        """Per-CQ counters (reference pipelinedb.query_stats,
        sql:2744-2764)."""
        rows = []
        for name, cv in self.views.items():
            st = cv.stats
            rows.append((name, "view", st.input_rows, st.output_rows,
                         st.batches, st.errors, st.exec_ms))
        for name, tr in self.transforms.items():
            st = tr.stats
            rows.append((name, "transform", st.input_rows, st.output_rows,
                         st.batches, st.errors, st.exec_ms))
        return self.spark.createDataFrame(
            rows, "name string, kind string, input_rows long, "
                  "output_rows long, batches long, errors long, "
                  "exec_ms double")

    def stream_stats(self) -> DataFrame:
        """Per-stream ingest counters (reference
        pipelinedb.stream_stats, sql:2792-2802; input_bytes omitted —
        batches flow as columnar DataFrames, not serialized tuples)."""
        rows = [(name, sd.input_rows, sd.input_batches)
                for name, sd in self.streams.items()]
        return self.spark.createDataFrame(
            rows, "stream string, input_rows long, input_batches long")

    def db_stats(self) -> DataFrame:
        """Whole-context rollup by CQ kind (reference
        pipelinedb.db_stats, sql:2766-2780)."""
        return (self.stats_df().groupBy("kind")
                .agg(F.sum("input_rows").alias("input_rows"),
                     F.sum("output_rows").alias("output_rows"),
                     F.sum("batches").alias("executions"),
                     F.sum("errors").alias("errors"),
                     F.sum("exec_ms").alias("exec_ms"))
                .orderBy("kind"))

    def close(self) -> None:
        shutil.rmtree(self.root, ignore_errors=True)
