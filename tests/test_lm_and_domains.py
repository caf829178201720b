"""Bigram-LM quality scoring duckdb-oracled (same smoothing math,
same ln, string-keyed joins); URL/domain provenance with the same
pattern strings in both engines.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from pipelinedb_spark.operators.lm import (lm_filter, lm_logprob_scores,
                                           train_bigram_lm)
from pipelinedb_spark.operators.text import (URL_PATTERN, domain_profile,
                                             extract_urls, url_domain)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")


def test_bigram_lm_scores_match_duckdb(spark, docs, sf_dir):
    lm = train_bigram_lm(docs)
    got = {r["doc_id"]: (r["lm_logprob"], r["n_bigrams"])
           for r in lm_logprob_scores(docs, lm, alpha=0.4).collect()}
    v = lm["vocab_size"]
    exp_rows = duckdb.sql(f"""
        WITH d AS (SELECT doc_id,
                          list_filter(string_split(text, ' '),
                                      w -> w != '') AS ws
                   FROM '{sf_dir}/documents.parquet'),
        p0 AS (SELECT doc_id,
                      UNNEST([{{'w1': ws[i], 'w2': ws[i+1]}}
                              for i in range(1, len(ws))]) AS pr
               FROM d WHERE len(ws) >= 2),
        p AS (SELECT doc_id, pr.w1 AS w1, pr.w2 AS w2 FROM p0),
        b AS (SELECT w1, w2, COUNT(*) AS n12 FROM p GROUP BY 1, 2),
        u AS (SELECT w1, COUNT(*) AS n1
              FROM (SELECT doc_id, UNNEST(ws) AS w1 FROM d) GROUP BY 1)
        SELECT p.doc_id,
               AVG(ln((b.n12 + 0.4) / (u.n1 + 0.4 * {v}))) AS lp,
               COUNT(*) AS nb
        FROM p JOIN b USING (w1, w2) JOIN u USING (w1)
        GROUP BY 1
    """).fetchall()
    exp = {r[0]: (r[1], r[2]) for r in exp_rows}
    assert set(exp) <= set(got)
    for doc_id, (lp, nb) in exp.items():
        assert got[doc_id][1] == nb, doc_id
        assert got[doc_id][0] == pytest.approx(lp, rel=1e-12), doc_id
    # docs without bigrams score NULL with 0 evidence
    for doc_id in set(got) - set(exp):
        assert got[doc_id] == (None, 0)


def test_lm_filter_separates_gibberish(spark, docs):
    lm = train_bigram_lm(docs)
    gib = spark.createDataFrame(
        [(900001, "zxq vrk jjw qqp zzt mmv xxr ppw kkt yyv bbn ccx")],
        ["doc_id", "text"])
    both = docs.unionByName(gib)
    scores = {r["doc_id"]: r["lm_logprob"]
              for r in lm_logprob_scores(both, lm).collect()}
    corpus_mean = sum(v for k, v in scores.items()
                      if k != 900001 and v is not None) / (len(scores) - 1)
    assert scores[900001] < corpus_mean  # gibberish scores lower
    kept = {r["doc_id"] for r in
            lm_filter(both, lm, min_logprob=scores[900001] + 1e-9)
            .select("doc_id").collect()}
    assert 900001 not in kept and len(kept) > 0


def test_domain_profile_matches_duckdb(spark, docs):
    urls = spark.createDataFrame(
        [(800001, "see https://example.com/a and http://Sub.Example.org/x?q=1"),
         (800002, "only https://example.com:8080/path here"),
         (800003, "no links at all")],
        ["doc_id", "text"])
    df = docs.unionByName(urls)
    got = {r["domain"]: r["n_mentions"]
           for r in domain_profile(df).collect()}
    con = duckdb.connect()
    con.register("d", df.toPandas())
    exp = {r[0]: r[1] for r in con.sql("""
        SELECT lower(regexp_extract(u, 'https?://([^/\\s:?#]+)', 1)) AS dom,
               COUNT(*)
        FROM (SELECT UNNEST(regexp_extract_all(text, ?)) AS u FROM d)
        WHERE dom != '' GROUP BY 1
    """, params=[URL_PATTERN]).fetchall()}
    assert got == exp
    assert got.get("example.com") == 2  # ':' excluded → port stripped
    # direct helpers
    one = urls.filter(F.col("doc_id") == 800001).select(
        extract_urls(F.col("text")).alias("us"),
    ).first()
    assert len(one["us"]) == 2
    d = urls.select(url_domain(F.lit("https://Sub.Example.org/x")).alias("d")) \
        .first()["d"]
    assert d == "sub.example.org"
