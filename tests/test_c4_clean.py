"""C4-style cleaning: line filter and document gate against a python
reference; corpus-wide repeated-paragraph removal against a duckdb
frequency oracle with injected boilerplate on real corpus text.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from pipelinedb_spark.operators.quality import (c4_clean_lines,
                                                c4_doc_filter,
                                                drop_repeated_paragraphs)

BOILER = "Cookie notice: accept all cookies."


def _ref_c4_line(text, min_words=5, terminal=True, ban=("javascript",)):
    out = []
    for l in text.split("\n"):
        ws = [w for w in l.split(" ") if w]
        if len(ws) < min_words:
            continue
        if terminal and not l.rstrip().endswith((".", "!", "?", '"')):
            continue
        if any(b in l.lower() for b in ban):
            continue
        out.append(l)
    return "\n".join(out)


def test_c4_clean_lines_matches_python(spark):
    rows = [
        (1, "This line has plenty of words and ends well.\n"
            "short line.\n"
            "This javascript line would otherwise have enough words here.\n"
            "No terminal punctuation on this long enough line\n"
            'A quoted ending works for this line too she said."'),
        (2, ""),
        (3, "one two three four five."),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r["text"]
           for r in c4_clean_lines(df).collect()}
    for i, t in rows:
        assert got[i] == _ref_c4_line(t), i


def test_c4_doc_filter_gates(spark):
    rows = [
        (1, "Line one stays fine.\nLine two stays fine.\nLine three."),
        (2, "only\ntwo"),                      # < 3 non-empty lines
        (3, "Has lorem ipsum filler.\nb\nc"),  # banned phrase
        (4, "code { body }\nb\nc"),            # curly brace
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    kept = {r["doc_id"] for r in c4_doc_filter(df).collect()}
    assert kept == {1}


@pytest.fixture(scope="module")
def boiler_docs(spark, sf_dir):
    """Real corpus docs with a boilerplate line injected into every
    3rd doc (the cross-document repetition target) and a doc-unique
    second line added to every doc (must survive)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    return docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.lit(BOILER + "\n"), "text",
                        F.lit("\n"), F.lit(BOILER)))
        .otherwise(F.col("text")))


def test_drop_repeated_paragraphs_matches_duckdb(spark, boiler_docs):
    got = {r["doc_id"]: r["text"]
           for r in drop_repeated_paragraphs(boiler_docs,
                                             max_occurrences=2).collect()}
    pdf = boiler_docs.toPandas()
    con = duckdb.connect()
    con.register("d", pdf)
    exp_rows = con.sql("""
        WITH l AS (SELECT doc_id, unnest(string_split(text, chr(10)))
                          AS line,
                          generate_subscripts(string_split(text, chr(10)), 1)
                          AS pos
                   FROM d),
        c AS (SELECT line, COUNT(*) AS cnt FROM l GROUP BY 1)
        SELECT doc_id,
               string_agg(line, chr(10) ORDER BY pos) AS clean
        FROM l JOIN c USING (line)
        WHERE cnt <= 2 OR line = ''
        GROUP BY doc_id
    """).fetchall()
    exp = {r[0]: r[1] for r in exp_rows}
    all_ids = set(pdf["doc_id"])
    for doc_id in all_ids:
        assert got[doc_id] == exp.get(doc_id, ""), doc_id
    # the boilerplate actually got removed somewhere
    injected = [i for i in all_ids if i % 3 == 0]
    assert injected and all(BOILER not in got[i] for i in injected)
    # untouched docs come back byte-identical
    orig = dict(zip(pdf["doc_id"], pdf["text"]))
    for i in all_ids:
        if i % 3 != 0:
            assert got[i] == orig[i]
