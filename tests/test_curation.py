"""Corpus curation operators: benchmark decontamination (n-gram
overlap vs an eval set, duckdb-oracled) and deterministic hash-based
sampling (stable under repartitioning; per-stratum fractions exact).
"""

import duckdb
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_contamination_pairs_match_duckdb(spark, docs, sf_dir):
    """contamination_pairs == duckdb's exact shared-distinct-8-gram
    counts (gram hashing is collision-free at this scale, so hash-hit
    counts equal string-gram-hit counts)."""
    from pipelinedb_spark.operators.curation import contamination_pairs

    eval_set = (docs.filter(F.col("doc_id") % 50 == 0)
                .select(F.col("doc_id").alias("eval_id"), "text"))
    got = {(r["doc_id"], r["eval_id"]): r["n_hits"]
           for r in contamination_pairs(docs, eval_set, ngram=8,
                                        min_hits=3).collect()}
    assert got, "eval docs must at least hit themselves"

    exp_rows = duckdb.sql(f"""
        WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws
                   FROM '{sf_dir}/documents.parquet'),
        g AS (SELECT doc_id,
                     UNNEST(list_distinct([list_aggr(ws[i:i+7],
                                           'string_agg', chr(31))
                                           for i in range(1, len(ws) - 6)]))
                     AS gram
              FROM d WHERE len(ws) >= 8),
        e AS (SELECT doc_id AS eval_id, gram FROM g
              WHERE doc_id % 50 = 0)
        SELECT g.doc_id, e.eval_id, COUNT(*) AS n_hits
        FROM g JOIN e USING (gram)
        GROUP BY 1, 2 HAVING COUNT(*) >= 3
    """).fetchall()
    exp = {(r[0], r[1]): r[2] for r in exp_rows}
    assert got == exp


def test_decontaminate_removes_eval_dupes(spark, docs):
    from pipelinedb_spark.operators.curation import decontaminate

    eval_set = (docs.filter(F.col("doc_id") % 50 == 0)
                .select(F.col("doc_id").alias("eval_id"), "text"))
    n_eval = eval_set.count()
    clean = decontaminate(docs, eval_set, ngram=8, min_hits=3)
    kept = clean.count()
    # at minimum the eval docs themselves (exact text matches) are gone
    assert kept <= docs.count() - n_eval
    # no remaining doc shares >= 3 distinct 8-grams with the eval set
    from pipelinedb_spark.operators.curation import contamination_pairs
    assert contamination_pairs(clean, eval_set, ngram=8,
                               min_hits=3).count() == 0


def test_hash_sample_deterministic_and_calibrated(spark, docs):
    from pipelinedb_spark.operators.curation import hash_sample

    s1 = hash_sample(docs, 0.5, "doc_id", seed=7)
    ids1 = {r["doc_id"] for r in s1.select("doc_id").collect()}
    # stable under repartitioning AND re-execution (pure hash of key)
    ids2 = {r["doc_id"] for r in
            hash_sample(docs.repartition(13), 0.5, "doc_id", seed=7)
            .select("doc_id").collect()}
    assert ids1 == ids2
    n = docs.count()
    assert abs(len(ids1) / n - 0.5) < 0.05
    # different seed → different membership, same calibration
    ids3 = {r["doc_id"] for r in
            hash_sample(docs, 0.5, "doc_id", seed=8)
            .select("doc_id").collect()}
    assert ids3 != ids1
    with pytest.raises(ValueError):
        hash_sample(docs, 1.5, "doc_id")


def test_stratified_sample_fractions(spark, docs):
    from pipelinedb_spark.operators.curation import stratified_sample

    fr = {"web": 0.8, "wiki": 0.2}
    out = stratified_sample(docs, fr, "source", "doc_id",
                            default_fraction=0.0, seed=1)
    base = {r["source"]: r["n"] for r in
            docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    got = {r["source"]: r["n"] for r in
           out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # unlisted strata fully dropped
    assert set(got) <= set(fr)
    for src, f_keep in fr.items():
        if src in base:
            assert abs(got.get(src, 0) / base[src] - f_keep) < 0.1, src
