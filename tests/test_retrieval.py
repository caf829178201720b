"""BM25 retrieval duckdb-oracled: identical formula over the same
postings yields identical scores and ranking on real corpus text.
"""

import duckdb
import math

import pytest
from pyspark.sql import functions as F

from pipelinedb_spark.operators.retrieval import bm25_index, bm25_search


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")


@pytest.fixture(scope="module")
def index(docs):
    return bm25_index(docs)


def _oracle_scores(sf_dir, terms, n, avgdl, k1=1.2, b=0.75):
    con = duckdb.connect()
    tlist = ", ".join(f"'{t}'" for t in terms)
    rows = con.sql(f"""
        WITH tok AS (SELECT doc_id,
                            UNNEST(list_filter(string_split(lower(text), ' '),
                                               w -> w != '')) AS term
                     FROM '{sf_dir}/documents.parquet'),
        p AS (SELECT term, doc_id, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY 1),
        dfs AS (SELECT term, COUNT(*) AS df FROM p GROUP BY 1)
        SELECT p.doc_id,
               SUM(ln(1.0 + ({n} - dfs.df + 0.5) / (dfs.df + 0.5))
                   * p.tf * ({k1} + 1.0)
                   / (p.tf + {k1} * (1.0 - {b} + {b} * dl.dl / {avgdl})))
        FROM p JOIN dl USING (doc_id) JOIN dfs USING (term)
        WHERE p.term IN ({tlist})
        GROUP BY 1
    """).fetchall()
    return {r[0]: r[1] for r in rows}


def test_bm25_scores_match_duckdb(spark, docs, index, sf_dir):
    query = "spark table merge"
    got = {r["doc_id"]: r["score"]
           for r in bm25_search(index, query, k=10_000).collect()}
    exp = _oracle_scores(sf_dir, sorted(set(query.split())),
                         index["n_docs"], index["avgdl"])
    assert set(got) == set(exp)
    for doc_id, s in exp.items():
        assert got[doc_id] == pytest.approx(s, rel=1e-12), doc_id


def test_bm25_topk_ranks_relevant_first(spark, docs, index):
    # build a probe doc id that repeats a query term heavily
    top = bm25_search(index, "spark", k=5).collect()
    assert len(top) == 5
    scores = [r["score"] for r in top]
    assert scores == sorted(scores, reverse=True)
    # every hit actually contains the term
    ids = [r["doc_id"] for r in top]
    hits = docs.filter(F.col("doc_id").isin(ids)) \
        .filter(F.lower(F.col("text")).contains("spark")).count()
    assert hits == 5


def test_bm25_unknown_terms_empty(spark, index):
    out = bm25_search(index, "zzzzqqqq wwwwxxxx", k=5)
    assert out.count() == 0
    with pytest.raises(ValueError):
        bm25_search(index, "   ")


def test_bm25_persisted_index_pushes_term_filter(spark, docs, index,
                                                 tmp_path):
    from pipelinedb_spark.operators.retrieval import (bm25_load,
                                                      bm25_persist,
                                                      bm25_search)
    path = str(tmp_path / "bm25_idx")
    bm25_persist(index, path)
    idx2 = bm25_load(spark, path)
    q = "spark table merge"
    a = [(r["doc_id"], r["score"]) for r in
         bm25_search(index, q, k=20).collect()]
    b = [(r["doc_id"], r["score"]) for r in
         bm25_search(idx2, q, k=20).collect()]
    assert len(a) == len(b)
    for (ia, sa), (ib, sb) in zip(a, b):
        assert ia == ib and sa == pytest.approx(sb, rel=1e-12)
    # the term predicate reaches the parquet scan
    plan = bm25_search(idx2, "spark", k=5)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "PushedFilters: [" in plan and "term" in plan


def test_bm25_empty_corpus_guard(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    idx = bm25_index(empty)
    assert idx["n_docs"] == 0 and idx["avgdl"] == 0.0
    assert bm25_search(idx, "anything", k=5).count() == 0
    from pipelinedb_spark.operators.retrieval import bm25_search_many
    qs = spark.createDataFrame([(1, "anything")],
                               "query_id int, query string")
    out = bm25_search_many(idx, qs)
    assert out.count() == 0
    assert out.columns == ["query_id", "doc_id", "score", "rank"]


def test_bm25_200_term_query_matches_oracle(spark, tmp_path):
    # 200 distinct KNOWN vocabulary terms in one query exercises the
    # broadcast-joined idf table (a chained CASE would nest 200 deep);
    # synthetic corpus because sf0.001's vocabulary is tiny
    import random
    rng = random.Random(7)
    vocab = [f"w{i:03d}" for i in range(300)]
    rows = [(i, " ".join(rng.choices(vocab, k=rng.randint(20, 80))))
            for i in range(400)]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    pq = str(tmp_path / "docs200.parquet")
    corpus.write.mode("overwrite").parquet(pq)
    idx = bm25_index(corpus)
    terms = sorted(vocab)[:200]
    query = " ".join(terms)
    got = {r["doc_id"]: r["score"]
           for r in bm25_search(idx, query, k=100_000).collect()}
    con = duckdb.connect()
    tlist = ", ".join(f"'{t}'" for t in terms)
    exp = dict(con.sql(f"""
        WITH tok AS (SELECT doc_id,
                            UNNEST(list_filter(string_split(lower(text), ' '),
                                               w -> w != '')) AS term
                     FROM '{pq}/*.parquet'),
        p AS (SELECT term, doc_id, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY 1),
        dfs AS (SELECT term, COUNT(*) AS df FROM p GROUP BY 1)
        SELECT p.doc_id,
               SUM(ln(1.0 + ({idx['n_docs']} - dfs.df + 0.5) / (dfs.df + 0.5))
                   * p.tf * (1.2 + 1.0)
                   / (p.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / {idx['avgdl']})))
        FROM p JOIN dl USING (doc_id) JOIN dfs USING (term)
        WHERE p.term IN ({tlist})
        GROUP BY 1
    """).fetchall())
    assert set(got) == set(exp)
    for doc_id, s in exp.items():
        assert got[doc_id] == pytest.approx(s, rel=1e-12), doc_id


def test_bm25_search_many_matches_single(spark, index):
    from pipelinedb_spark.operators.retrieval import bm25_search_many
    queries = ["spark table merge", "stream aggregate window",
               "parquet file scan", "join filter group",
               "hash partition shuffle", "quality text token",
               "data pipeline batch", "index search score",
               "document corpus term", "zzzzqqqq wwwwxxxx"]
    qdf = spark.createDataFrame(list(enumerate(queries)),
                                "query_id int, query string")
    many = bm25_search_many(index, qdf, k=7).collect()
    by_q = {}
    for r in many:
        by_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["score"]))
    for qid, q in enumerate(queries):
        exp = [(i + 1, r["doc_id"], r["score"]) for i, r in
               enumerate(bm25_search(index, q, k=7).collect())]
        got = sorted(by_q.get(qid, []))
        assert [(rk, d) for rk, d, _ in got] == \
               [(rk, d) for rk, d, _ in exp], q
        for (_, _, sg), (_, _, se) in zip(got, exp):
            assert sg == pytest.approx(se, rel=1e-12)


def test_bm25_append_matches_full_rebuild(spark, tmp_path):
    """Incremental BM25 (round 8): appending batches into a persisted
    index yields EXACTLY the scores of an index built over the whole
    corpus at once — postings/doc_lens union disjointly, dfs
    re-aggregates, and n_docs/avgdl ride the manifest accounting.
    Appends are crash-atomic and effectively-once under txn replay."""
    from pipelinedb_spark.operators.retrieval import (bm25_append,
                                                      bm25_index,
                                                      bm25_load,
                                                      bm25_persist,
                                                      bm25_search)

    rows = [(1, "spark streaming continuous view engine"),
            (2, "postgres continuous aggregate view"),
            (3, "spark spark shuffle join"),
            (4, "tokenizer byte pair encoding spark"),
            (5, "window aggregate watermark streaming"),
            (6, "postgres index scan planner")]
    base = spark.createDataFrame(rows[:3], "doc_id long, text string")
    b1 = spark.createDataFrame(rows[3:5], "doc_id long, text string")
    b2 = spark.createDataFrame(rows[5:], "doc_id long, text string")

    inc = str(tmp_path / "inc")
    bm25_persist(bm25_index(base), inc)
    assert bm25_append(spark, inc, b1, txn=("s", 1)) == 2
    assert bm25_append(spark, inc, b1, txn=("s", 1)) == 0   # replay
    assert bm25_append(spark, inc, b2, txn=("s", 2)) == 1

    full = str(tmp_path / "full")
    bm25_persist(bm25_index(
        spark.createDataFrame(rows, "doc_id long, text string")), full)

    li, lf = bm25_load(spark, inc), bm25_load(spark, full)
    assert li["n_docs"] == lf["n_docs"] == 6
    assert abs(li["avgdl"] - lf["avgdl"]) < 1e-12
    for q in ("spark streaming", "postgres view", "encoding",
              "nonexistent term"):
        gi = [(r["doc_id"], round(r["score"], 12))
              for r in bm25_search(li, q).collect()]
        gf = [(r["doc_id"], round(r["score"], 12))
              for r in bm25_search(lf, q).collect()]
        assert gi == gf, q

    # empty batch: tag only, no extra version dir
    from pipelinedb_spark.indexstore import open_index
    ndirs = len(open_index(inc).dirs())
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert bm25_append(spark, inc, empty, txn=("s", 3)) == 0
    assert len(open_index(inc).dirs()) == ndirs
    assert open_index(inc).txn_version("s") == 3


def test_bm25_compact_preserves_scores(spark, tmp_path):
    from pipelinedb_spark.indexstore import open_index
    from pipelinedb_spark.operators.retrieval import (bm25_append,
                                                      bm25_compact,
                                                      bm25_index,
                                                      bm25_load,
                                                      bm25_persist,
                                                      bm25_search)

    docs = [(i, f"term{i % 4} shared word corpus {i}") for i in range(9)]
    path = str(tmp_path / "idx")
    bm25_persist(bm25_index(
        spark.createDataFrame(docs[:3], "doc_id long, text string")), path)
    for k in (3, 6):
        bm25_append(spark, path, spark.createDataFrame(
            docs[k:k + 3], "doc_id long, text string"))
    assert len(open_index(path).dirs()) == 3

    def scores(q):
        return [(r["doc_id"], round(r["score"], 12)) for r in
                bm25_search(bm25_load(spark, path), q).collect()]

    pre = {q: scores(q) for q in ("shared corpus", "term1", "word")}
    assert bm25_compact(spark, path) == 3
    assert len(open_index(path).dirs()) == 1
    assert {q: scores(q) for q in pre} == pre
    assert bm25_compact(spark, path) == 0
