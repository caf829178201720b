"""Python (DataFrame→DataFrame) continuous transforms: the curation
operators running inside the engine — stream docs in, a transform
chain cleans them (quality gate + PII redaction), a CV over the
transform's output stream aggregates continuously; results equal the
same operators applied in one batch.  Catalog replay re-binds the
function by module:qualname; unimportable bodies replay inactive and
re-bind via set_transform_fn.
"""

import pytest
from pyspark.sql import functions as F

from pipelinedb_spark import CQError


def clean_docs(df):
    """Module-level so replay can re-import it by name."""
    from pipelinedb_spark.operators.pii import pii_redact
    from pipelinedb_spark.operators.quality import GOPHER_RULES, gopher_filter

    rules = {k: GOPHER_RULES[k]
             for k in ("top_2gram_char_frac", "dup_5gram_char_frac")}
    return pii_redact(gopher_filter(df, rules=rules))


DOCS = [
    {"doc_id": 1, "lang": "en",
     "text": "the quick brown fox jumps over a lazy dog near a river bank"},
    {"doc_id": 2, "lang": "en",
     "text": "spam ham " * 40},                 # repetitive: filtered out
    # long enough that the 17-char email token does not push the
    # top-2-gram char fraction over the 0.20 gate by itself
    {"doc_id": 3, "lang": "de",
     "text": "please mail me at alice@example.com for all of the details "
             "today thanks and have a good day"},
    {"doc_id": 4, "lang": "de",
     "text": "ganz normale worte ohne jede wiederholung hier drin stehen"},
]


def test_python_transform_curation_chain(ctx):
    ctx.create_stream("docs_in", "doc_id long, lang string, text string")
    ctx.create_python_transform("cleaner", "docs_in", clean_docs)
    ctx.create_view("cv_clean_stats",
                    "SELECT lang, count(*) AS n_docs "
                    "FROM output_of('cleaner') GROUP BY lang")
    ctx.insert("docs_in", DOCS[:2])
    ctx.insert("docs_in", DOCS[2:])
    got = {r["lang"]: r["n_docs"]
           for r in ctx.read_view("cv_clean_stats").collect()}
    assert got == {"en": 1, "de": 2}  # doc 2 filtered by the 2-gram rule
    # PII redaction happened inside the engine: the transform's output
    # stream carries the redacted text
    out = {r["doc_id"]: r["text"] for r in ctx.output_of("cleaner").collect()}
    assert "<email>" in out[3] and "alice@example.com" not in out[3]
    assert 2 not in out


def test_python_transform_validates_at_create(ctx):
    ctx.create_stream("pv_s", "k string, v long")
    with pytest.raises(CQError, match="probe"):
        ctx.create_python_transform(
            "bad", "pv_s", lambda df: df.select("no_such_column"))
    with pytest.raises(CQError, match="DataFrame"):
        ctx.create_python_transform("bad2", "pv_s", lambda df: 42)
    with pytest.raises(CQError):
        ctx.create_python_transform("t", "nope", lambda df: df)


def test_python_transform_replay_rebinds_importable_fn(spark, tmp_path):
    from pipelinedb_spark import PipelineContext

    root = str(tmp_path / "pdb_py")
    ctx = PipelineContext(spark, root=root, num_buckets=8)
    ctx.create_stream("docs_in", "doc_id long, lang string, text string")
    ctx.create_python_transform("cleaner", "docs_in", clean_docs)
    ctx.create_view("cv_s", "SELECT lang, count(*) AS n "
                            "FROM output_of('cleaner') GROUP BY lang")
    ctx.insert("docs_in", DOCS)

    ctx2 = PipelineContext(spark, root=root, num_buckets=8)
    t = ctx2.transforms["cleaner"]
    assert t.active and t.fn is not None  # re-imported by module:qualname
    ctx2.insert("docs_in", DOCS)
    got = {r["lang"]: r["n"] for r in ctx2.read_view("cv_s").collect()}
    assert got == {"en": 2, "de": 4}
    ctx2.close()


def test_python_transform_lambda_replays_inactive(spark, tmp_path):
    from pipelinedb_spark import PipelineContext

    root = str(tmp_path / "pdb_lam")
    ctx = PipelineContext(spark, root=root, num_buckets=8,
                          track_output_streams=True)
    ctx.create_stream("s1", "k string, v long")
    ctx.create_python_transform("up", "s1",
                                lambda df: df.withColumn("v", F.col("v") + 1))
    ctx.insert("s1", [{"k": "a", "v": 1}])
    assert ctx.output_of("up").collect()[0]["v"] == 2

    ctx2 = PipelineContext(spark, root=root, num_buckets=8,
                           track_output_streams=True)
    t = ctx2.transforms["up"]
    assert not t.active and t.fn is None  # lambda not importable
    # inactive transform is skipped, not crashed
    ctx2.insert("s1", [{"k": "b", "v": 5}])
    # re-bind with an importable-or-not fn re-activates processing
    ctx2.set_transform_fn("up", lambda df: df.withColumn("v",
                                                         F.col("v") + 1))
    ctx2.insert("s1", [{"k": "c", "v": 7}])
    vs = sorted(r["v"] for r in ctx2.output_of("up").collect())
    assert 8 in vs
    ctx2.close()


def test_continuous_exact_dedup_cv(ctx, spark):
    """Exact dedup expressed AS a continuous query: a CV grouping on
    the content fingerprint maintains (canonical id, copy count)
    incrementally across micro-batches, equal to the batch
    exact_duplicates operator over all inserted rows."""
    from pipelinedb_spark.operators.dedup import exact_duplicates

    ctx.create_stream("dd_s", "doc_id long, text string")
    # same fingerprint the batch operator uses (md5 of raw text)
    ctx.create_view("cv_dedup",
                    "SELECT md5(text) AS fp, "
                    "min(doc_id) AS canonical_id, "
                    "count(*) AS copies FROM dd_s GROUP BY md5(text)")
    rows = [
        {"doc_id": 1, "text": "alpha beta gamma"},
        {"doc_id": 2, "text": "unique one"},
        {"doc_id": 3, "text": "alpha beta gamma"},   # dup of 1
        {"doc_id": 4, "text": "unique two"},
        {"doc_id": 5, "text": "alpha beta gamma"},   # dup of 1
    ]
    ctx.insert("dd_s", rows[:2])
    ctx.insert("dd_s", rows[2:4])
    ctx.insert("dd_s", rows[4:])
    got = {r["fp"]: (r["canonical_id"], r["copies"])
           for r in ctx.read_view("cv_dedup").collect()}
    batch = spark.createDataFrame(rows)
    exp = {r["fp"]: (r["canonical_id"], r["n_docs"])
           for r in exact_duplicates(batch).collect()}
    assert got == exp
    # the duplicate cluster is visible incrementally
    fp_dup = [fp for fp, (c, n) in got.items() if n == 3]
    assert len(fp_dup) == 1 and got[fp_dup[0]][0] == 1


def test_model_scored_admission_transform(ctx, spark):
    """Streaming composition of the round-7 selection models: a
    python transform scores each micro-batch with a PRE-TRAINED
    classifier and a frozen DSIR model (both in closure — no
    recompute per batch), drops low-quality docs, and a CV maintains
    per-source admission counts incrementally."""
    from pyspark.sql import functions as F

    from pipelinedb_spark.operators.classifier import train_text_classifier
    from pipelinedb_spark.operators.dsir import dsir_fit

    sports = ["the team won the match", "score a goal in the match",
              "coach benched the squad", "a replay of the final goal"]
    code = ["def foo returns int", "import numpy module",
            "class defines lambda", "dict and list syntax"]
    pos = spark.createDataFrame([(t,) for t in sports], "text string")
    neg = spark.createDataFrame([(t,) for t in code], "text string")
    clf = train_text_classifier(pos, neg, buckets=512)
    dsir = dsir_fit(neg.union(pos), pos, buckets=512)

    ctx.create_stream("docs_m", "doc_id long, text string, source string")

    def admit(df):
        scored = clf.scores(df, out_col="clf")
        from pipelinedb_spark.operators.dsir import dsir_weights
        scored = dsir_weights(scored, model=dsir)
        return scored.filter(F.col("clf") >= 0.5) \
            .select("doc_id", "source", "clf", "dsir_logw")

    ctx.create_python_transform("model_admit", "docs_m", admit)
    ctx.create_view("cv_model_admission",
                    "SELECT source, count(*) AS admitted "
                    "FROM output_of('model_admit') GROUP BY source")

    ctx.insert("docs_m", [
        {"doc_id": 1, "text": "goal score replay team match",
         "source": "crawl"},
        {"doc_id": 2, "text": "import def class lambda", "source": "crawl"},
    ])
    ctx.insert("docs_m", [
        {"doc_id": 3, "text": "coach team won the match",
         "source": "forum"},
    ])
    got = {r["source"]: r["admitted"]
           for r in ctx.read_view("cv_model_admission").collect()}
    assert got == {"crawl": 1, "forum": 1}   # the code-y doc dropped
