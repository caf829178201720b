"""Gopher/MassiveText-style repetition & quality filters: n-gram
char-fraction metrics duckdb-oracled on the documents table; line
metrics pinned on constructed multi-line docs; rule filter behavior.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from pipelinedb_spark.operators import quality as Q


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _oracle_ngram_fracs(sf_dir: str, n: int) -> dict:
    """Exact relational mirror of the _run_stats fold: per-doc
    (top_chars/total, dup_chars/total) over token n-grams, tie on
    max count broken toward the larger char product."""
    rows = duckdb.sql(f"""
        WITH d AS (SELECT doc_id,
                          list_filter(string_split(text, ' '),
                                      w -> w != '') AS ws
                   FROM '{sf_dir}/documents.parquet'),
        g AS (SELECT doc_id,
                     UNNEST([list_aggr(ws[i:i+{n - 1}], 'string_agg',
                                       chr(31))
                             for i in range(1, len(ws) - {n - 2})])
                     AS gram
              FROM d WHERE len(ws) >= {n}),
        c AS (SELECT doc_id, gram, COUNT(*) AS cnt,
                     length(gram) - {n - 1} AS glen
              FROM g GROUP BY 1, 2),
        a AS (SELECT doc_id, MAX(cnt) AS top_cnt,
                     SUM(cnt * glen) AS total_chars,
                     SUM(CASE WHEN cnt > 1 THEN cnt * glen
                              ELSE 0 END) AS dup_chars
              FROM c GROUP BY 1),
        t AS (SELECT c.doc_id, MAX(c.cnt * c.glen) AS top_chars
              FROM c JOIN a USING (doc_id)
              WHERE c.cnt = a.top_cnt GROUP BY 1)
        SELECT a.doc_id,
               top_chars / total_chars AS top_frac,
               dup_chars / total_chars AS dup_frac
        FROM a JOIN t USING (doc_id)
    """).fetchall()
    return {r[0]: (r[1], r[2]) for r in rows}


@pytest.mark.parametrize("n", [2, 3])
def test_ngram_char_fractions_match_duckdb(spark, docs, sf_dir, n):
    got = {r["doc_id"]: (r["top"], r["dup"]) for r in docs.select(
        "doc_id",
        Q.top_ngram_char_fraction(F.col("text"), n).alias("top"),
        Q.duplicate_ngram_char_fraction(F.col("text"), n).alias("dup"),
    ).collect()}
    exp = _oracle_ngram_fracs(sf_dir, n)
    assert set(exp) <= set(got)
    for doc_id, (t, d) in exp.items():
        gt, gd = got[doc_id]
        assert gt == pytest.approx(t, abs=1e-12), doc_id
        assert gd == pytest.approx(d, abs=1e-12), doc_id
    # docs too short for the gram size score 0 (no spurious
    # sequence(0,-1) grams)
    for doc_id in set(got) - set(exp):
        assert got[doc_id] == (0.0, 0.0)


def test_duplicate_word_fraction_matches_duckdb(spark, docs, sf_dir):
    got = {r["doc_id"]: r["f"] for r in docs.select(
        "doc_id",
        Q.duplicate_word_fraction(F.col("text")).alias("f")).collect()}
    exp = {r[0]: r[1] for r in duckdb.sql(f"""
        SELECT doc_id,
               1.0 - len(list_distinct(ws)) / len(ws) AS f
        FROM (SELECT doc_id,
                     list_filter(string_split(text, ' '),
                                 w -> w != '') AS ws
              FROM '{sf_dir}/documents.parquet')
        WHERE len(ws) > 0
    """).fetchall()}
    for doc_id, f in exp.items():
        assert got[doc_id] == pytest.approx(f, abs=1e-12), doc_id


def test_line_metrics_on_constructed_docs(spark):
    rows = [
        # 4 lines, 'aa' repeated twice (4 dup chars of 10 total),
        # dup_line_frac = 1 - 3/4
        (1, "aa\nbb\naa\ncccc"),
        (2, "unique\nlines\nonly"),
        (3, "x\nx\nx\nx"),          # all dup: frac 3/4, chars 4/4
        (4, "single line no newline"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in df.select(
        "doc_id",
        Q.duplicate_line_fraction(F.col("text")).alias("lf"),
        Q.duplicate_line_char_fraction(F.col("text")).alias("cf"),
    ).collect()}
    assert got[1]["lf"] == pytest.approx(1 - 3 / 4)
    assert got[1]["cf"] == pytest.approx(4 / 10)
    assert got[2]["lf"] == 0.0 and got[2]["cf"] == 0.0
    assert got[3]["lf"] == pytest.approx(3 / 4)
    assert got[3]["cf"] == pytest.approx(1.0)
    assert got[4]["lf"] == 0.0 and got[4]["cf"] == 0.0


def test_repetition_profile_one_scan_schema(spark, docs):
    # filter, not limit: a global limit inserts its own
    # SinglePartition exchange and would mask the no-shuffle check
    prof = Q.repetition_profile(docs.filter(F.col("doc_id") < 50))
    cols = set(prof.columns)
    assert {"dup_word_frac", "dup_line_frac", "dup_line_char_frac",
            "top_2gram_char_frac", "dup_5gram_char_frac",
            "word_count", "mean_word_len"} <= cols
    assert "text" not in cols  # text pruned from the output
    rows = prof.collect()
    assert len(rows) == 50
    fracs = cols - {"doc_id", "lang", "source", "n_chars",
                    "word_count", "mean_word_len"}
    for r in rows:
        for c in fracs:
            assert 0.0 <= r[c] <= 1.0, (r["doc_id"], c, r[c])
        assert r["word_count"] > 0 and r["mean_word_len"] > 0
    # single scan, no DATA-DEPENDENT shuffle: the only allowed
    # exchange is spread_input's guarded round-robin repartition
    # (input spread for the Arrow kernel when the scan has fewer
    # splits than cores — r15 optimization); any hash/range exchange
    # would mean a grouping/join shuffle crept into the profile
    plan = prof._jdf.queryExecution().executedPlan().toString()
    import re
    exchanges = re.findall(r"Exchange (\w+)", plan)
    assert all(e == "RoundRobinPartitioning" for e in exchanges), plan


def test_kernel_profile_equals_column_fold(spark, docs):
    """The Arrow kernel and the Catalyst-HOF fold are alternative
    implementations of the SAME metric definitions — values must
    agree to fp precision on real corpus text plus edge docs."""
    extra = spark.createDataFrame(
        [(90001, "aa\nbb\naa\ncccc", "x", "x", 0),
         (90002, "", "x", "x", 0),
         (90003, "  double  spaced  words  here  ", "x", "x", 0),
         (90004, "spam ham " * 40, "x", "x", 0)],
        "doc_id long, text string, lang string, source string, n_chars long")
    df = docs.unionByName(extra)
    a = {r["doc_id"]: r.asDict() for r in
         Q.repetition_profile(df, use_kernel=True).collect()}
    b = {r["doc_id"]: r.asDict() for r in
         Q.repetition_profile(df, use_kernel=False).collect()}
    assert set(a) == set(b)
    for doc_id in a:
        for k, va in a[doc_id].items():
            vb = b[doc_id][k]
            if isinstance(va, float):
                assert va == pytest.approx(vb, abs=1e-12), (doc_id, k)
            else:
                assert va == vb, (doc_id, k)


def test_gopher_filter_rejects_repetitive_docs(spark):
    good = " ".join(f"w{i}x" for i in range(80))         # varied, len-3 words
    loopy = "spam ham " * 60                              # one 2-gram dominates
    short = "too few words here"
    df = spark.createDataFrame(
        [(1, good), (2, loopy.strip()), (3, short)], ["doc_id", "text"])
    kept = {r["doc_id"] for r in Q.gopher_filter(df).select("doc_id").collect()}
    assert kept == {1}
    flags = {r["doc_id"]: r for r in Q.quality_flags(df).collect()}
    assert flags[1]["passes_quality"]
    assert not flags[2]["ok_top_2gram_char_frac"]
    assert not flags[3]["ok_word_count"]


def test_null_and_empty_text_score_zero(spark):
    df = spark.createDataFrame([(1, ""), (2, None), (3, "   ")],
                               ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in df.select(
        "doc_id",
        Q.duplicate_word_fraction(F.col("text")).alias("w"),
        Q.top_ngram_char_fraction(F.col("text"), 2).alias("t"),
        Q.duplicate_ngram_char_fraction(F.col("text"), 5).alias("d"),
    ).collect()}
    assert rows[1]["w"] == 0.0 and rows[1]["t"] == 0.0 and rows[1]["d"] == 0.0
    assert rows[3]["w"] == 0.0 and rows[3]["t"] == 0.0
    # NULL text propagates NULL (SQL semantics), never crashes
    assert rows[2]["w"] is None or rows[2]["w"] == 0.0


# ---------------------------------------------------------------------------
# Property tests: the Column-expression fold vs a pure-python reference
# on adversarial random text (ties, empties, newlines, repeated runs).
# ---------------------------------------------------------------------------

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st


def _ref_ngram_fracs(text: str, n: int) -> tuple:
    ws = [w for w in text.split(" ") if w]
    grams = ["\x1f".join(ws[i:i + n]) for i in range(len(ws) - n + 1)]
    if not grams:
        return 0.0, 0.0
    c = Counter(grams)
    glen = lambda g: len(g) - (n - 1)
    total = sum(cnt * glen(g) for g, cnt in c.items())
    top_cnt = max(c.values())
    top_chars = max(cnt * glen(g) for g, cnt in c.items()
                    if cnt == top_cnt)
    dup = sum(cnt * glen(g) for g, cnt in c.items() if cnt > 1)
    return top_chars / total, dup / total


def _ref_dup_line_char(text: str) -> float:
    lines = [l for l in text.split("\n") if l != ""]
    if not lines:
        return 0.0
    c = Counter(lines)
    total = sum(cnt * len(l) for l, cnt in c.items())
    dup = sum(cnt * len(l) for l, cnt in c.items() if cnt > 1)
    return dup / total if total else 0.0


# tiny alphabet maximizes collisions/ties; spaces and newlines stress
# the tokenizer edges
_DOC = st.text(alphabet="ab \n", min_size=0, max_size=40)


@settings(max_examples=12, deadline=None)
@given(st.lists(_DOC, min_size=1, max_size=10),
       st.integers(min_value=2, max_value=4))
def test_property_ngram_fracs_equal_python(spark, texts, n):
    df = spark.createDataFrame(list(enumerate(texts)), ["i", "t"])
    got = {r["i"]: (r["top"], r["dup"]) for r in df.select(
        "i", Q.top_ngram_char_fraction(F.col("t"), n).alias("top"),
        Q.duplicate_ngram_char_fraction(F.col("t"), n).alias("dup"),
    ).collect()}
    for i, t in enumerate(texts):
        et, ed = _ref_ngram_fracs(t, n)
        assert got[i][0] == pytest.approx(et, abs=1e-12), (t, n)
        assert got[i][1] == pytest.approx(ed, abs=1e-12), (t, n)


@settings(max_examples=10, deadline=None)
@given(st.lists(_DOC, min_size=1, max_size=10))
def test_property_dup_line_char_equals_python(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), ["i", "t"])
    got = {r["i"]: r["f"] for r in df.select(
        "i", Q.duplicate_line_char_fraction(F.col("t")).alias("f"),
    ).collect()}
    for i, t in enumerate(texts):
        assert got[i] == pytest.approx(_ref_dup_line_char(t),
                                       abs=1e-12), repr(t)
