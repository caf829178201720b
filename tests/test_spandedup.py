"""Span-level exact-substring dedup vs a naive Python oracle.

The oracle works on exact token tuples (no hashing): collect every
K-token window's occurrence list, mark duplicated occurrences under
the keep policy, union windows into per-doc merged intervals.  The
Spark path must match it exactly — 64-bit window-hash collisions are
the only permitted divergence and are astronomically unlikely at test
sizes.
"""

import random

import pytest
from hypothesis import given, settings, strategies as st

from pipelinedb_spark.operators.spandedup import (
    duplicated_spans, remove_duplicated_spans, window_index)


# ------------------------------------------------------------------ oracle

def oracle_spans(docs, window, keep):
    """docs: {doc_id: text}. Returns {doc_id: [(start, end), ...]}."""
    occ = {}
    toks = {d: t.split(" ") if t else [] for d, t in docs.items()}
    for d in sorted(docs):
        ts = toks[d]
        for p in range(len(ts) - window + 1):
            occ.setdefault(tuple(ts[p:p + window]), []).append((d, p))
    marked = {d: set() for d in docs}
    for sites in occ.values():
        if len(sites) < 2:
            continue
        skip = min(sites) if keep == "first" else None
        for site in sites:
            if site == skip:
                continue
            d, p = site
            marked[d].update(range(p, p + window))
    out = {}
    for d, idxs in marked.items():
        spans, cur = [], None
        for i in sorted(idxs):
            if cur is None:
                cur = [i, i + 1]
            elif i == cur[1]:
                cur[1] = i + 1
            else:
                spans.append(tuple(cur))
                cur = [i, i + 1]
        if cur:
            spans.append(tuple(cur))
        if spans:
            out[d] = spans
    return out


def spark_spans(spark, docs, window, keep):
    df = spark.createDataFrame(list(docs.items()),
                               "doc_id string, text string")
    rows = duplicated_spans(df, window=window, keep=keep).collect()
    out = {}
    for r in rows:
        out.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"]))
    return {d: sorted(sp) for d, sp in out.items()}


# ------------------------------------------------------------------ tests

def test_window_index_positions_and_repeat_detection(spark):
    docs = {"a": "x y z x y z", "b": "q x y z r"}
    df = spark.createDataFrame(list(docs.items()),
                               "doc_id string, text string")
    rows = window_index(df, window=3).collect()
    # doc a: 4 windows, doc b: 3 windows
    assert sorted((r["doc_id"], r["pos"]) for r in rows) == [
        ("a", 0), ("a", 1), ("a", 2), ("a", 3),
        ("b", 0), ("b", 1), ("b", 2)]
    h = {(r["doc_id"], r["pos"]): r["whash"] for r in rows}
    assert h[("a", 0)] == h[("a", 3)] == h[("b", 1)]  # "x y z"
    assert h[("a", 0)] != h[("a", 1)]


def test_cross_doc_passage_keep_first(spark):
    boiler = " ".join(f"b{i}" for i in range(6))
    docs = {
        "d1": f"{boiler} unique one tail",
        "d2": f"head two {boiler}",
        "d3": f"pre {boiler} post three",
        "d4": "entirely original content here nothing shared",
    }
    got = spark_spans(spark, docs, window=4, keep="first")
    want = oracle_spans(docs, 4, "first")
    assert got == want
    # canonical doc (smallest doc_id) keeps its copy
    assert "d1" not in got
    assert set(got) == {"d2", "d3"}


def test_keep_none_marks_every_occurrence(spark):
    boiler = " ".join(f"b{i}" for i in range(5))
    docs = {"d1": f"{boiler} x", "d2": f"y {boiler}"}
    got = spark_spans(spark, docs, window=5, keep="none")
    assert got == oracle_spans(docs, 5, "none")
    assert set(got) == {"d1", "d2"}
    assert got["d1"] == [(0, 5)]
    assert got["d2"] == [(1, 6)]


def test_within_doc_repeat_and_long_run_union(spark):
    # a repeated 8-token passage: windows union back to the full span
    passage = " ".join(f"p{i}" for i in range(8))
    docs = {"solo": f"{passage} mid {passage}"}
    got = spark_spans(spark, docs, window=4, keep="first")
    want = oracle_spans(docs, 4, "first")
    assert got == want
    # second occurrence (tokens 9..17) fully marked
    assert got["solo"] == [(9, 17)]


def test_no_duplicates_no_spans_and_short_docs(spark):
    docs = {"a": "one two three", "b": "four five", "c": ""}
    assert spark_spans(spark, docs, window=4, keep="first") == {}


def test_remove_spans_keep_first(spark):
    boiler = " ".join(f"b{i}" for i in range(6))
    docs = {"d1": f"{boiler} unique one",
            "d2": f"start {boiler} end",
            "d3": "clean doc with no shared text"}
    df = spark.createDataFrame(list(docs.items()),
                               "doc_id string, text string")
    out = {r["doc_id"]: r for r in
           remove_duplicated_spans(df, window=6).collect()}
    assert out["d1"]["text"] == docs["d1"]          # canonical survives
    assert out["d1"]["removed_tokens"] == 0
    assert out["d2"]["text"] == "start end"
    assert out["d2"]["removed_tokens"] == 6
    assert out["d3"]["text"] == docs["d3"]          # untouched passthrough
    assert out["d3"]["removed_tokens"] == 0


def test_remove_spans_custom_span_table(spark):
    df = spark.createDataFrame([("d1", "a b c d e")],
                               "doc_id string, text string")
    spans = spark.createDataFrame([("d1", 1, 3)],
                                  "doc_id string, span_start long, "
                                  "span_end long")
    row = remove_duplicated_spans(df, spans=spans).collect()[0]
    assert row["text"] == "a d e"
    assert row["removed_tokens"] == 2


def test_occurrence_join_is_shuffle_hash_not_broadcast(spark):
    # tiny SF would let Spark broadcast the dup-hash table; the pin
    # must hold so the plan is the one a 100 TB corpus needs
    docs = {"a": "x y z x y z", "b": "q x y z r"}
    df = spark.createDataFrame(list(docs.items()),
                               "doc_id string, text string")
    plan = duplicated_spans(df, window=3)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "ShuffledHashJoin" in plan
    assert "BroadcastHashJoin" not in plan


@pytest.mark.parametrize("keep", ["first", "none"])
def test_randomized_corpus_matches_oracle(spark, keep):
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(12)]   # small vocab → real repeats
    docs = {f"doc{i:02d}": " ".join(rng.choice(vocab)
                                    for _ in range(rng.randint(0, 60)))
            for i in range(30)}
    assert spark_spans(spark, docs, 5, keep) == oracle_spans(docs, 5, keep)


@settings(max_examples=15, deadline=None)
@given(st.lists(st.lists(st.integers(0, 5), min_size=0, max_size=40),
                min_size=1, max_size=12),
       st.sampled_from(["first", "none"]))
def test_hypothesis_fuzz_matches_oracle(spark, doc_tokens, keep):
    docs = {f"h{i:02d}": " ".join(f"t{t}" for t in ts)
            for i, ts in enumerate(doc_tokens)}
    assert spark_spans(spark, docs, 3, keep) == oracle_spans(docs, 3, keep)


# ------------------------------------------------- persisted index

def test_span_index_probe_clean_append_cycle(spark, tmp_path):
    """The continuous-ingest flow: persist corpus windows → probe a
    batch (corpus boilerplate AND batch-internal duplicates found) →
    clean → append → the next batch's copy of the admitted passage is
    caught."""
    from pipelinedb_spark.operators.spandedup import (
        span_index_append, span_index_persist, span_index_probe)

    path = str(tmp_path / "spanidx")
    boiler = " ".join(f"b{i}" for i in range(5))
    corpus = spark.createDataFrame(
        [("c1", f"{boiler} corpus one"), ("c2", "other corpus text here")],
        "doc_id string, text string")
    span_index_persist(corpus, path, window=5)

    fresh = " ".join(f"f{i}" for i in range(5))
    batch = spark.createDataFrame(
        [("n1", f"intro {boiler} outro"),          # corpus boilerplate
         ("n2", f"{fresh} alpha"),                 # 1st batch-internal
         ("n3", f"beta {fresh}"),                  # 2nd batch-internal
         ("n4", "totally novel content only")],
        "doc_id string, text string")
    spans = span_index_probe(spark, path, batch)
    got = {(r["doc_id"], r["span_start"], r["span_end"])
           for r in spans.collect()}
    # n1: corpus match at tokens 1..6; n3: batch-internal dup at 1..6
    # (n2 is the canonical first occurrence under keep='first')
    assert got == {("n1", 1, 6), ("n3", 1, 6)}

    cleaned = remove_duplicated_spans(batch, spans=spans)
    out = {r["doc_id"]: r for r in cleaned.collect()}
    assert out["n1"]["text"] == "intro outro"
    assert out["n2"]["text"] == f"{fresh} alpha"   # canonical kept
    assert out["n3"]["text"] == "beta"
    assert out["n4"]["removed_tokens"] == 0

    # admit the cleaned batch; a later copy of `fresh` must now hit
    span_index_append(spark, path, cleaned)
    nxt = spark.createDataFrame([("x1", f"{fresh} again")],
                                "doc_id string, text string")
    got2 = {(r["doc_id"], r["span_start"], r["span_end"])
            for r in span_index_probe(spark, path, nxt).collect()}
    assert got2 == {("x1", 0, 5)}


def test_span_index_probe_keep_none_marks_canonical_too(spark, tmp_path):
    from pipelinedb_spark.operators.spandedup import (span_index_persist,
                                                      span_index_probe)
    path = str(tmp_path / "spanidx2")
    corpus = spark.createDataFrame([("c1", "unrelated corpus words")],
                                   "doc_id string, text string")
    span_index_persist(corpus, path, window=4)
    dup = " ".join(f"d{i}" for i in range(4))
    batch = spark.createDataFrame(
        [("n1", f"{dup} x"), ("n2", f"y {dup}")],
        "doc_id string, text string")
    got = {(r["doc_id"], r["span_start"], r["span_end"]) for r in
           span_index_probe(spark, path, batch, keep="none").collect()}
    assert got == {("n1", 0, 4), ("n2", 1, 5)}


def test_span_index_probe_no_hits_empty(spark, tmp_path):
    from pipelinedb_spark.operators.spandedup import (span_index_persist,
                                                      span_index_probe)
    path = str(tmp_path / "spanidx3")
    corpus = spark.createDataFrame([("c1", "a b c d e f")],
                                   "doc_id string, text string")
    span_index_persist(corpus, path, window=4)
    batch = spark.createDataFrame([("n1", "p q r s t u")],
                                  "doc_id string, text string")
    assert span_index_probe(spark, path, batch).count() == 0
