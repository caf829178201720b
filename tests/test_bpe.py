"""Byte-level BPE tokenizer: trainer oracle (naive recount-per-merge
reference), encode/decode roundtrips, JVM/Python pretokenizer parity,
and an end-to-end Spark encode checked word-by-word driver-side."""

import json
from collections import Counter

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pipelinedb_spark.operators.bpe import (
    BPETokenizer, _pretokenize_py, _train_from_counts, bpe_train,
    bpe_word_counts,
)


# ------------------------------------------------------------------
# naive reference trainer: recount ALL pairs from scratch per merge

def _naive_train(counts, vocab_size):
    words = [[n, list(w.encode("utf-8"))] for w, n in counts
             if len(w.encode("utf-8")) >= 2]
    merges = []
    next_id = 256
    while next_id < vocab_size:
        pc = Counter()
        for n, syms in words:
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += n
        if not pc:
            break
        best = min(pc, key=lambda p: (-pc[p], p))
        merges.append(best)
        for rec in words:
            n, syms = rec
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == best[0]
                        and syms[i + 1] == best[1]):
                    out.append(next_id)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            rec[1] = out
        next_id += 1
    return merges


CORPORA = [
    # classic overlap pathologies + realistic mix
    [("aaaa", 10), ("aaa", 5), ("ab", 3)],
    [("the", 50), ("then", 20), ("them", 20), ("theme", 5),
     (" the", 80), ("cat", 7), ("hat", 7)],
    [("abab", 4), ("baba", 4), ("aabb", 4)],
    [("x", 100), ("yy", 1)],          # 1-byte words carry no pairs
    [("héllo", 9), ("hëllo", 9), ("hello", 9)],   # multi-byte UTF-8
]


@pytest.mark.parametrize("corpus", CORPORA)
def test_incremental_trainer_matches_naive(corpus):
    for vs in (258, 264, 300):
        assert _train_from_counts(corpus, vs) == _naive_train(corpus, vs)


@given(st.lists(
    st.tuples(st.text(min_size=1, max_size=6), st.integers(1, 50)),
    min_size=1, max_size=12))
@settings(max_examples=60, deadline=None)
def test_incremental_trainer_matches_naive_fuzz(corpus):
    assert (_train_from_counts(corpus, 280)
            == _naive_train(corpus, 280))


def test_trainer_determinism_and_bounds():
    m1 = _train_from_counts(CORPORA[1], 300)
    m2 = _train_from_counts(list(CORPORA[1]), 300)
    assert m1 == m2
    assert len(m1) <= 300 - 256
    with pytest.raises(ValueError):
        _train_from_counts(CORPORA[1], 100)


# ------------------------------------------------------------------
# encode / decode

def test_encode_word_applies_merge_ranks():
    # merges: (t,h) -> 256, (256,e) -> 257
    tok = BPETokenizer([(ord("t"), ord("h")), (256, ord("e"))])
    assert tok.encode_word("the") == [257]
    assert tok.encode_word("then") == [257, ord("n")]
    assert tok.encode_word("tha") == [256, ord("a")]
    assert tok.encode_word("x") == [ord("x")]
    assert tok.decode([257, ord("n")]) == "then"


@given(st.text(max_size=40))
@settings(max_examples=120, deadline=None)
def test_encode_decode_roundtrip(text):
    corpus = [("hello world", 5), ("héllo", 3), ("123 456", 2)]
    tok = BPETokenizer(_train_from_counts(corpus, 300))
    ids = [i for w in _pretokenize_py(text) for i in tok.encode_word(w)]
    assert tok.decode(ids) == text
    assert all(0 <= i < tok.vocab_size for i in ids)


def test_pretokenize_py_shapes():
    assert _pretokenize_py("it's a test") == ["it", "'s", " a", " test"]
    assert _pretokenize_py("we'll we're") == ["we", "'ll", " we", "'re"]
    assert _pretokenize_py("a  b") == ["a", "  ", "b"]
    assert _pretokenize_py(" 's") == [" '", "s"]      # lead kills the
    assert _pretokenize_py("!!'s") == ["!!'", "s"]    # contraction alt
    assert _pretokenize_py("x9y") == ["x", "9", "y"]
    assert _pretokenize_py("") == []


@given(st.text(alphabet=st.sampled_from(
    "abz AZ09.,!?'\"-\n\théé日"), max_size=30))
@settings(max_examples=100, deadline=None)
def test_pretokenize_py_lossless(text):
    assert "".join(_pretokenize_py(text)) == text


# ------------------------------------------------------------------
# Spark-side: pretokenizer parity, distributed training, Arrow encode

@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_jvm_python_pretokenizer_parity(spark):
    from pipelinedb_spark.operators.text import bpe_ish_tokens
    import pyspark.sql.functions as F
    samples = ["it's a test, isn't it?", "we'll go!!'s odd",
               "x9y  double  space", "héllo wörld 123", "", "  ",
               "tabs\tand\nnewlines", "punct...run?!", " 's", "'q"]
    df = spark.createDataFrame([(s,) for s in samples], "t string")
    got = df.select(bpe_ish_tokens(F.col("t")).alias("p")).collect()
    for s, row in zip(samples, got):
        assert row["p"] == _pretokenize_py(s), repr(s)


def test_bpe_train_and_encode_end_to_end(spark, docs, tmp_path):
    import pyspark.sql.functions as F
    from pipelinedb_spark.operators.text import bpe_ish_tokens

    tok = bpe_train(docs, "text", vocab_size=384, max_words=5000)
    assert 0 < len(tok.merges) <= 128

    sample = docs.limit(30)
    enc = tok.encode(sample, "text", "ids").select("doc_id", "ids")
    pre = sample.select("doc_id",
                        bpe_ish_tokens(F.col("text")).alias("words"))
    ids_by_doc = {r["doc_id"]: r["ids"] for r in enc.collect()}
    for r in pre.collect():
        expect = [i for w in r["words"] for i in tok.encode_word(w)]
        assert ids_by_doc[r["doc_id"]] == expect
        # decode reproduces the original text exactly
    # token_count agrees with encode lengths
    cnt = tok.token_count(sample, "text", "n").select("doc_id", "n")
    for r in cnt.collect():
        assert r["n"] == len(ids_by_doc[r["doc_id"]])


def test_bpe_compression_and_word_counts(spark, docs):
    import pyspark.sql.functions as F
    tok = bpe_train(docs, "text", vocab_size=512, max_words=5000)
    sample = docs.limit(50)
    agg = (tok.token_count(sample, "text", "n")
              .agg(F.sum("n").alias("toks"),
                   F.sum(F.length("text")).alias("chars")).collect()[0])
    # a trained vocab must beat byte-per-token on its own corpus
    assert agg["toks"] < agg["chars"]

    wc = bpe_word_counts(docs.limit(20), "text")
    row = wc.orderBy(F.col("n").desc()).first()
    assert row["n"] >= 1 and isinstance(row["word"], str)


def test_bpe_save_load_null_and_empty(spark, tmp_path):
    df = spark.createDataFrame(
        [("a", "aaa bbb aaa"), ("b", None), ("c", "")],
        "doc_id string, text string")
    tok = bpe_train(df.where("text IS NOT NULL"), "text", vocab_size=300)
    p = str(tmp_path / "tok.json")
    tok.save(p)
    tok2 = BPETokenizer.load(p)
    assert tok2.merges == tok.merges
    with open(p) as f:
        assert json.load(f)["format"] == "pipelinedb_spark_bpe_v1"
    # null/empty text must yield empty ids + zero count, not errors
    out = {r["doc_id"]: (r["ids"], r["n"])
           for r in tok2.token_count(
               tok2.encode(df, "text", "ids"), "text", "n").collect()}
    assert out["b"] == ([], 0) and out["c"] == ([], 0)
    assert len(out["a"][0]) == out["a"][1] > 0
    with pytest.raises(ValueError):
        bad = str(tmp_path / "bad.json")
        with open(bad, "w") as f:
            json.dump({"format": "nope"}, f)
        BPETokenizer.load(bad)
