"""Output-stream (osrel) old/new/delta semantics under RANDOM insert
schedules, checked against an exact in-Python replay — the breadth
complement to the bank's fixed-schedule duckdb oracle
(`output_stream_changefeed`, r14): the bank pins one 3-batch corpus
schedule; this pins the semantics for arbitrary ones, including no-op
elision, group births, NULL aggregates, and empty batches.

Replay model (reference src/combiner.c:1578-1601, compare_slots
:731-786): after each batch, for every group TOUCHED by the batch,
one change row (old = previous finalized row or NULL, new = current
finalized row, delta = finalized aggregate of the batch's rows alone)
unless old == new (elided).  Groups untouched by a batch emit
nothing.
"""
from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F


def _agg(rows):
    """Exact (mx, mn) over (k, v) rows with NULL-skipping max/min."""
    vals = [v for v in rows if v is not None]
    return (max(vals) if vals else None, min(vals) if vals else None)


def test_changefeed_matches_replay_on_random_schedules(spark, tmp_path):
    from pipelinedb_spark import PipelineContext

    rng = random.Random(20260816)
    for trial in range(3):
        root = str(tmp_path / f"pdb_{trial}")
        ctx = PipelineContext(spark, root=root, num_buckets=4,
                              track_output_streams=True)
        try:
            ctx.create_stream("s", "k string, v long")
            ctx.create_view(
                "cv", "SELECT k, max(v) AS mx, min(v) AS mn "
                      "FROM s GROUP BY k")
            keys = ["a", "b", "c"]
            state: dict[str, tuple] = {}
            expected = []            # flattened change rows
            for _batch in range(4):
                n = rng.randint(0, 5)
                rows = [(rng.choice(keys),
                         None if rng.random() < 0.15
                         else rng.randint(0, 20))
                        for _ in range(n)]
                # duplicate re-inserts of current extremes force
                # no-op batches sometimes
                if state and rng.random() < 0.5:
                    k = rng.choice(sorted(state))
                    if state[k][0] is not None:
                        rows.append((k, state[k][0]))
                ctx.insert("s", [{"k": k, "v": v} for k, v in rows])
                by_k: dict[str, list] = {}
                for k, v in rows:
                    by_k.setdefault(k, []).append(v)
                for k, vs in by_k.items():
                    d_mx, d_mn = _agg(vs)
                    old = state.get(k)
                    if old is None:
                        new = (d_mx, d_mn)
                    else:
                        new = _agg([old[0], d_mx]), _agg([old[1],
                                                          d_mn])
                        new = (new[0][0], new[1][1])
                    if old != new:   # compare_slots elision
                        expected.append(
                            (k,
                             old[0] if old else None,
                             old[1] if old else None,
                             new[0], new[1], d_mx, d_mn))
                    state[k] = new
            def key(t):              # None-safe total order
                return tuple((x is None, x) for x in t)

            got = sorted(
                (tuple(r) for r in ctx.output_of("cv").select(
                    F.col("new.k"),
                    F.col("old.mx"), F.col("old.mn"),
                    F.col("new.mx"), F.col("new.mn"),
                    F.col("delta.mx"), F.col("delta.mn")).collect()),
                key=key)
            want = sorted(expected, key=key)
            assert got == want, (
                f"trial {trial}: engine feed diverged from replay\n"
                f"got      {got}\nexpected {want}")
        finally:
            ctx.close()
