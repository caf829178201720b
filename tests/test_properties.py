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


@settings(max_examples=40, deadline=None)
@given(st.integers(min_value=1, max_value=12),
       st.integers(min_value=1, max_value=12),
       st.sampled_from([0, 2, 4, 6]),
       st.integers(min_value=0, max_value=2**32 - 1))
def test_png_roundtrip_random(h, w, ctype, seed):
    """PNG encode→decode is pixel-exact for every color type and a
    random per-row filter choice (codecs in operators/multimodal.py,
    test-oracle encoder in test_operators.py)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_operators import _make_png

    from pipelinedb_spark.operators.multimodal import decode_png_py
    rng = np.random.RandomState(seed)
    nch = {0: None, 2: 3, 4: 2, 6: 4}[ctype]
    shape = (h, w) if nch is None else (h, w, nch)
    img = rng.randint(0, 256, shape)
    filters = rng.randint(0, 5, h).tolist()
    got = decode_png_py(_make_png(img, ctype, filters=filters))
    want = img if nch is not None else img[..., None] * np.ones(
        (1, 1, 1), dtype=int)
    assert got.shape[2] == (nch or 1)
    assert np.array_equal(got.reshape(h, w, -1),
                          np.asarray(want).reshape(h, w, -1))


@settings(max_examples=40, deadline=None)
@given(st.integers(min_value=1, max_value=24),
       st.integers(min_value=1, max_value=24),
       st.integers(min_value=1, max_value=5),
       st.integers(min_value=0, max_value=2**32 - 1))
def test_gif_roundtrip_random(h, w, ncolors_pow, seed):
    """GIF LZW encode→decode is palette-index exact across random
    images, palette sizes, and dictionary-growth boundaries."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_operators import _make_gif

    from pipelinedb_spark.operators.multimodal import decode_gif_py
    rng = np.random.RandomState(seed)
    ncolors = 2 ** ncolors_pow
    pal = rng.randint(0, 256, (ncolors, 3))
    idx = rng.randint(0, ncolors, (h, w))
    got = decode_gif_py(_make_gif(idx, pal))
    assert np.array_equal(got, pal[idx])


@settings(max_examples=20, deadline=None)
@given(st.integers(min_value=1, max_value=24),
       st.integers(min_value=1, max_value=24),
       st.integers(min_value=0, max_value=2**32 - 1),
       st.sampled_from([0, 2, 6]))
def test_png_adam7_roundtrip_matches_plain(h, w, seed, ctype):
    """Adam7-interlaced PNG decodes to exactly the same pixels as the
    non-interlaced encoding of the same image, across random shapes
    (incl. dimensions with empty interlace passes) and color types."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_operators import _make_png

    from pipelinedb_spark.operators.multimodal import decode_png_py
    rng = np.random.RandomState(seed)
    nch = {0: 1, 2: 3, 6: 4}[ctype]
    shape = (h, w) if nch == 1 else (h, w, nch)
    img = rng.randint(0, 256, shape).astype(np.uint8)
    plain = decode_png_py(_make_png(img, ctype))
    inter = decode_png_py(_make_png(img, ctype, interlace=True))
    assert np.array_equal(inter, plain)
    assert np.array_equal(plain.reshape(shape), img.reshape(shape))


@settings(max_examples=20, deadline=None)
@given(st.integers(min_value=1, max_value=20),
       st.integers(min_value=1, max_value=20),
       st.integers(min_value=0, max_value=2**32 - 1),
       st.integers(min_value=1, max_value=5))
def test_gif_interlaced_roundtrip_matches_plain(h, w, seed,
                                                ncolors_pow):
    """Interlaced GIF row scatter reconstructs the raster image
    exactly across random shapes and palette sizes."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_operators import _make_gif

    from pipelinedb_spark.operators.multimodal import decode_gif_py
    rng = np.random.RandomState(seed)
    ncolors = 2 ** ncolors_pow
    pal = rng.randint(0, 256, (ncolors, 3))
    idx = rng.randint(0, ncolors, (h, w))
    got = decode_gif_py(_make_gif(idx, pal, interlace=True))
    assert np.array_equal(got, pal[idx])


@settings(max_examples=15, deadline=None)
@given(st.integers(min_value=1, max_value=3),
       st.integers(min_value=1, max_value=3),
       st.integers(min_value=0, max_value=2**32 - 1),
       st.booleans())
def test_jpeg_roundtrip_bounded_error(bh, bw, seed, gray):
    """Baseline JPEG with unit quant tables reconstructs smooth
    images within DCT float-roundtrip error across random shapes."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_operators import _make_jpeg

    from pipelinedb_spark.operators.jpeg import decode_jpeg_py
    rng = np.random.RandomState(seed)
    shape = (bh, bw) if gray else (bh, bw, 3)
    base = rng.randint(80, 176, shape).repeat(8, 0).repeat(8, 1)
    img = np.clip(base + rng.randint(-5, 6, base.shape), 0, 255)
    got = decode_jpeg_py(_make_jpeg(img))
    flat = got[..., 0] if gray else got
    assert np.max(np.abs(flat.astype(int) - img)) <= 4


@settings(max_examples=15, deadline=None)
@given(st.integers(min_value=1, max_value=4),
       st.integers(min_value=1, max_value=4),
       st.integers(min_value=0, max_value=2**32 - 1),
       st.booleans(), st.booleans())
def test_progressive_jpeg_roundtrip_bounded_error(bh, bw, seed, gray,
                                                  quantized):
    """Progressive (SOF2) JPEG — spectral-selection + successive-
    approximation scans with EOB runs and refinement correction bits —
    reconstructs within the same bounded error as the baseline path,
    and matches the baseline decode of the same pixels exactly when
    both use the same quant table (the coefficient arrays are
    identical after all scans land)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_operators import _make_progressive_jpeg

    from pipelinedb_spark.operators.jpeg import decode_jpeg_py
    rng = np.random.RandomState(seed)
    shape = (bh, bw) if gray else (bh, bw, 3)
    base = rng.randint(70, 186, shape).repeat(8, 0).repeat(8, 1)
    img = np.clip(base + rng.randint(-5, 6, base.shape),
                  0, 255).astype(np.uint8)
    quant = (np.clip(np.arange(64).reshape(8, 8) * 2, 1, 80)
             if quantized else None)
    got = decode_jpeg_py(_make_progressive_jpeg(img, quant=quant))
    tol = 16 if quantized else 4
    flat = got[..., 0] if gray else got
    assert np.max(np.abs(flat.astype(int) - img.astype(int))) <= tol
    # same coefficients via a single full-band-per-component baseline
    # multi-scan stream → bit-identical pixels
    nc = 1 if gray else 3
    ms = _make_progressive_jpeg(
        img, script=[([ci], 0, 63, 0, 0) for ci in range(nc)],
        quant=quant, sof=0xC0)
    assert np.array_equal(decode_jpeg_py(ms), got)
