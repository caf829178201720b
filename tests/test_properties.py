"""Property-based tests (hypothesis) for the Spark-free numeric core:
sketch merge laws and the 3-limb exact-sum decomposition.  These are
the invariants the engine's correctness rests on, checked across
randomized inputs rather than fixtures (complements the reference's
regress fixtures, SURVEY §5)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

_LIMB = 20
_MASK = (1 << _LIMB) - 1


def _limbs(q: int) -> tuple[int, int, int]:
    # mirror querybank.dsum's arithmetic-shift decomposition
    return (q >> 40, (q >> 20) & _MASK, q & _MASK)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.floats(min_value=-1e6, max_value=1e6,
                          allow_nan=False, allow_infinity=False),
                max_size=50))
def test_three_limb_sum_exact(vals):
    """sum of 3-limb decompositions reassembles to the exact integer
    sum of the quantized values, in any order (the map-side-combine
    safety property of dsum; querybank.py:63-89)."""
    import math
    qs = [math.floor(v * 1e6 + 0.5) for v in vals]
    hi = sum(_limbs(q)[0] for q in qs)
    mid = sum(_limbs(q)[1] for q in qs)
    lo = sum(_limbs(q)[2] for q in qs)
    assert hi * (1 << 40) + mid * (1 << 20) + lo == sum(qs)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=14), min_size=1,
                max_size=300),
       st.integers(min_value=1, max_value=6))
def test_space_saving_exact_within_capacity(vals, split_at):
    """FSS is exact when NDV <= capacity, and merge order doesn't
    change the answer (reference fss.c exactness contract)."""
    from collections import Counter
    from pipelinedb_spark.sketches.topk import SpaceSaving
    cut = len(vals) * split_at // 7
    s1 = SpaceSaving(5).add_many([str(v) for v in vals[:cut]])
    s2 = SpaceSaving(5).add_many([str(v) for v in vals[cut:]])
    merged = s1.merge(s2)
    truth = Counter(str(v) for v in vals)
    for k, c in merged.topk(5):
        assert truth[k] == c  # 15 distinct <= capacity 20: exact


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10**9), min_size=1,
                max_size=500))
def test_hll_updatable_roundtrip(vals):
    """hll_add / merge keep cardinality within the p=14 error bound."""
    from pipelinedb_spark.sketches.hll import HyperLogLog
    h = HyperLogLog()
    for v in vals:
        h.add(str(v))
    h2 = HyperLogLog.deserialize(h.serialize())
    exact = len(set(vals))
    assert abs(h2.cardinality() - exact) <= max(2, 0.05 * exact)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.floats(min_value=-1e4, max_value=1e4,
                          allow_nan=False, allow_infinity=False),
                min_size=20, max_size=400),
       st.floats(min_value=0.1, max_value=0.9))
def test_tdigest_quantile_rank_bound(vals, q):
    """merged t-digest quantile estimates sit within 5% rank error."""
    from pipelinedb_spark.sketches.tdigest import TDigest
    half = len(vals) // 2
    import numpy as np
    t1 = TDigest(200.0).add_many(np.array(vals[:half] or [0.0]))
    t2 = TDigest(200.0).add_many(np.array(vals[half:] or [0.0]))
    est = t1.merge(t2).quantile(q)
    # with ties the achievable rank is an interval [frac(<), frac(<=)]
    rank_lo = sum(1 for v in vals if v < est) / len(vals)
    rank_hi = sum(1 for v in vals if v <= est) / len(vals)
    tol = 0.05 + 1.0 / len(vals)
    assert rank_lo - tol <= q <= rank_hi + tol


@settings(max_examples=10, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=700), min_size=1,
                max_size=120),
       st.integers(min_value=50, max_value=400))
def test_pack_sequences_invariants(tok_counts, max_tokens):
    """pack_sequences on random token-count distributions: every doc
    assigned exactly once; per-sequence sums within the cap unless a
    lone over-long doc; positions contiguous from 0; over-long docs
    alone and flagged.  (Spark-backed but tiny inputs — one job per
    example.)"""
    from pipelinedb_spark import get_spark
    from pipelinedb_spark.operators.curation import pack_sequences

    spark = get_spark("pipelinedb_spark_tests")
    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(tok_counts)], ["doc_id", "n_tok"])
    rows = pack_sequences(df, max_tokens, "n_tok").collect()
    assert sorted(r["doc_id"] for r in rows) == list(range(len(tok_counts)))
    by_seq = {}
    for r in rows:
        by_seq.setdefault(r["seq_id"], []).append(r)
    for members in by_seq.values():
        total = sum(m["n_tok"] for m in members)
        overs = [m for m in members if m["needs_truncation"]]
        if overs:
            assert len(members) == 1 and members[0]["n_tok"] > max_tokens
        else:
            assert total <= max_tokens
        assert sorted(m["seq_pos"] for m in members) == \
            list(range(len(members)))


@settings(max_examples=200, deadline=None)
@given(st.lists(st.floats(min_value=-1e6, max_value=1e6,
                          allow_nan=False, allow_infinity=False),
                min_size=1, max_size=400),
       st.lists(st.floats(min_value=0.0, max_value=1.0), min_size=1,
                max_size=10))
def test_tdigest_vectorized_probes_match_scalar(vals, qs):
    """quantile_many/cdf_many must be BIT-identical to the scalar
    quantile()/cdf() — the Arrow probe UDFs ride the vectorized path
    and claim exact per-element parity."""
    from pipelinedb_spark.sketches.tdigest import TDigest

    td = TDigest(50.0)
    td.add_many(np.array(vals))
    got_q = td.quantile_many(np.array(qs))
    for q, g in zip(qs, got_q):
        assert g == td.quantile(q) or (np.isnan(g)
                                       and np.isnan(td.quantile(q))), q
    xs = vals[:10] + [min(vals) - 1.0, max(vals) + 1.0, vals[0]]
    got_c = td.cdf_many(np.array(xs))
    for x, g in zip(xs, got_c):
        assert g == td.cdf(x), x


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(min_size=0, max_size=12), max_size=100),
       st.lists(st.text(min_size=0, max_size=12), min_size=1,
                max_size=50))
def test_bloom_cms_vectorized_probes_match_scalar(members, probes):
    """contains_many/query_many == per-element contains()/query()."""
    from pipelinedb_spark.sketches.bloom import BloomFilter
    from pipelinedb_spark.sketches.cms import CountMinSketch

    bf = BloomFilter(n=1024)
    cms = CountMinSketch(eps=0.02)
    arr = np.array(members, dtype=object)
    bf.add_many(arr)
    cms.add_many(arr)
    parr = np.array(probes, dtype=object)
    got_b = bf.contains_many(parr)
    got_c = cms.query_many(parr)
    for p, gb, gc in zip(probes, got_b, got_c):
        assert bool(gb) == bf.contains(p), p
        assert int(gc) == cms.query(p), p
