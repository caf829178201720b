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


def test_plan_and_sample_mixture(spark, docs):
    """Mixture fractions hit the token budget proportionally; sampled
    token mass per stratum lands near target; membership
    deterministic."""
    from pipelinedb_spark.operators.curation import (plan_mixture,
                                                     sample_mixture)
    from pipelinedb_spark.operators.text import token_count

    d = docs.withColumn("n_tok", token_count(F.col("text")))
    totals = {r["source"]: r["t"] for r in
              d.groupBy("source").agg(F.sum("n_tok").alias("t")).collect()}
    weights = {"src0": 2.0, "src1": 1.0}
    budget = int((totals["src0"] + totals["src1"]) * 0.5)
    fracs = plan_mixture(d, weights, "n_tok", budget_tokens=budget)
    assert set(fracs) == {"src0", "src1"}
    # fraction math: frac = min(1, budget*w/Σw / total)
    for s, w in weights.items():
        target = budget * w / 3.0
        exp = min(1.0, target / totals[s])
        assert fracs[s] == pytest.approx(exp)

    got = sample_mixture(d, weights, "n_tok", "doc_id",
                         budget_tokens=budget)
    # only the weighted strata survive
    assert got.select("source").distinct().count() <= 2
    # deterministic
    a = {r["doc_id"] for r in got.select("doc_id").collect()}
    b = {r["doc_id"] for r in sample_mixture(
        d, weights, "n_tok", "doc_id", budget_tokens=budget)
        .select("doc_id").collect()}
    assert a == b
    # realized token mass tracks the target — per-stratum loosely
    # (only ~25 docs/source at sf0.001, Bernoulli noise ~2/sqrt(n))
    kept_tot = 0
    for s, w in weights.items():
        kept = (got.filter(F.col("source") == s)
                .agg(F.sum("n_tok")).collect()[0][0]) or 0
        kept_tot += kept
        target = min(totals[s], budget * w / 3.0)
        assert abs(kept - target) / max(target, 1) < 0.8, (s, kept, target)
    # pooled across strata the noise tightens
    assert abs(kept_tot - budget) / budget < 0.4, (kept_tot, budget)


def test_pack_sequences_constraints_and_determinism(spark, docs):
    from pipelinedb_spark.operators.curation import pack_sequences
    from pipelinedb_spark.operators.text import token_count

    d = docs.withColumn("n_tok", token_count(F.col("text")))
    packed = pack_sequences(d, max_tokens=200, token_col="n_tok")
    rows = packed.collect()
    assert len(rows) == docs.count()          # every doc assigned
    by_seq = {}
    for r in rows:
        by_seq.setdefault(r["seq_id"], []).append(r)
    for seq_id, members in by_seq.items():
        toks = sum(m["n_tok"] for m in members)
        if len(members) == 1 and members[0]["needs_truncation"]:
            assert members[0]["n_tok"] > 200
        else:
            assert toks <= 200, (seq_id, toks)
        # positions are 0..k-1
        assert sorted(m["seq_pos"] for m in members) == \
            list(range(len(members)))
    # packing is reasonably tight: average fill ≥ 50% of max
    fills = [sum(m["n_tok"] for m in ms) for ms in by_seq.values()]
    assert sum(fills) / (len(fills) * 200) >= 0.5
    # deterministic across runs and input partitioning
    again = pack_sequences(d.repartition(13), max_tokens=200,
                           token_col="n_tok").collect()
    assert {(r["doc_id"], r["seq_id"], r["seq_pos"]) for r in rows} == \
        {(r["doc_id"], r["seq_id"], r["seq_pos"]) for r in again}


def test_chunk_documents_shapes_and_reconstruction(spark):
    from pipelinedb_spark.operators.curation import chunk_documents

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10)), "a"),
         (2, "one two three", "b"),
         (3, "", "c"), (4, None, "c"), (5, "   ", "c")],
        "doc_id long, text string, source string")
    out = chunk_documents(docs, chunk_tokens=4, overlap=0)
    rows = sorted([(r["doc_id"], r["chunk_id"], r["text"], r["n_tokens"])
                   for r in out.collect()])
    # doc 1: 10 tokens -> chunks of 4/4/2; doc 2: one short chunk;
    # empty/null/whitespace docs vanish
    assert rows == [
        (1, 0, "t0 t1 t2 t3", 4), (1, 1, "t4 t5 t6 t7", 4),
        (1, 2, "t8 t9", 2), (2, 0, "one two three", 3)]
    # non-text columns ride along
    assert set(out.columns) == {"doc_id", "source", "chunk_id",
                                "text", "n_tokens"}

    # overlap: consecutive chunks share exactly `overlap` tokens and
    # concatenating stride-prefixes reconstructs the doc
    toks = [f"w{i}" for i in range(11)]
    d2 = spark.createDataFrame([(9, " ".join(toks))],
                               "doc_id long, text string")
    got = {r["chunk_id"]: r["text"].split(" ") for r in
           chunk_documents(d2, chunk_tokens=5, overlap=2).collect()}
    stride = 3
    assert got[0] == toks[0:5] and got[1] == toks[3:8]
    for i in range(1, len(got)):
        assert got[i - 1][-2:] == got[i][:2]        # shared overlap
    recon = got[0] + [t for i in sorted(got)[1:] for t in got[i][2:]]
    assert recon == toks
    # every chunk fits the budget; ids are dense from 0
    assert all(len(v) <= 5 for v in got.values())
    assert sorted(got) == list(range(len(got)))


def test_chunk_documents_validations_and_plan(spark):
    import pytest

    from pipelinedb_spark.operators.curation import chunk_documents

    docs = spark.createDataFrame([(1, "a b c")],
                                 "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=4, overlap=4)
    # no shuffle, no Python: one codegen stage over the scan
    plan = chunk_documents(docs, 4)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan and "ArrowEval" not in plan
