"""PII scan/redact: counts duckdb-oracled with the SAME pattern
strings (patterns live in the Java-regex ∩ RE2 subset by design);
redaction leaves no residual matches and preserves clean text.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from pipelinedb_spark.operators.pii import (PII_PATTERNS, pii_filter,
                                            pii_profile, pii_redact)

PII_SNIPPETS = [
    "contact alice.smith+spam@example-corp.io today",
    "server at 10.42.255.7 rebooted",
    "ssn 123-45-6789 on file",
    "card 4111 1111-1111 1111 declined",
    "call +1 (415) 555-0143 now",
    "mail bob@x.co or 192.168.0.1",
]


@pytest.fixture(scope="module")
def pii_docs(spark, sf_dir):
    """Real corpus text with PII snippets appended to a known subset
    (the synthetic corpus contains no organic PII)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # injected docs are doc_id % 3 == 0, so index snippets by
    # doc_id // 3 to cycle through every kind (doc_id % 6 would only
    # ever hit snippets 0 and 3 on multiples of 3)
    snip = F.element_at(
        F.array(*[F.lit(s) for s in PII_SNIPPETS]),
        ((F.col("doc_id") / 3).cast("int") % len(PII_SNIPPETS) + 1)
        .cast("int"))
    return (docs
            .withColumn("text", F.when(F.col("doc_id") % 3 == 0,
                                       F.concat("text", F.lit(" "), snip))
                        .otherwise(F.col("text")))
            .select("doc_id", "text"))


def test_counts_match_duckdb(spark, pii_docs):
    got = {r["doc_id"]: r for r in pii_profile(pii_docs).collect()}
    pdf = pii_docs.toPandas()
    con = duckdb.connect()
    con.register("d", pdf)
    for kind, pat in PII_PATTERNS.items():
        exp = {r[0]: r[1] for r in con.sql(
            "SELECT doc_id, len(regexp_extract_all(text, ?)) FROM d",
            params=[pat]).fetchall()}
        for doc_id, n in exp.items():
            assert got[doc_id][f"n_{kind}"] == n, (kind, doc_id)
    # the injected subset actually hits
    assert sum(r["n_pii"] for r in got.values()) >= pii_docs.count() // 4


def test_redaction_is_complete_and_minimal(spark, pii_docs):
    red = pii_redact(pii_docs, out_col="clean")
    # no residual matches of any pattern in the redacted text
    residue = red
    for kind, pat in PII_PATTERNS.items():
        residue = residue.filter(
            F.regexp_count("clean", F.lit(pat)) > 0)
    assert residue.count() == 0
    # docs with no PII pass through byte-identical
    changed = red.filter(F.col("text") != F.col("clean"))
    with_pii = pii_profile(pii_docs).filter(F.col("n_pii") > 0)
    assert changed.count() == with_pii.count()
    # typed placeholders present
    one = red.filter((F.col("doc_id") % 3 == 0)
                     & ((F.col("doc_id") / 3).cast("int")
                        % len(PII_SNIPPETS) == 2)).first()
    assert "<ssn>" in one["clean"]


def test_pii_filter_drops_exactly_the_hit_docs(spark, pii_docs):
    kept = pii_filter(pii_docs).select("doc_id")
    hits = pii_profile(pii_docs).filter(F.col("n_pii") > 0) \
        .select("doc_id")
    assert kept.intersect(hits).count() == 0
    assert kept.count() + hits.count() == pii_docs.count()


def test_single_scan_no_shuffle(spark, pii_docs):
    plan = pii_profile(pii_docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
