"""Byte-level BPE tokenizer: distributed training + Arrow-batched
encoding for LLM training-data pipelines.

Architecture (the standard one — SentencePiece / GPT-2 style trainers
work from word counts, not raw corpora):

* **Corpus-scale work is distributed and JVM-side.**  Pre-tokenization
  uses the same GPT-2-style pattern as `text.bpe_ish_tokens`
  (`regexp_extract_all`, whole-stage codegen), and word counting is a
  plain explode → groupBy → count.  At 100 TB this is one scan plus
  one shuffle keyed on the word — the only part that sees every byte.
* **The merge loop runs on the driver over the word-count table.**
  That table scales with the *vocabulary* (bounded further by
  ``max_words``: the most frequent N words carry virtually all pair
  mass), not the corpus — tens of MB for a 1M-word vocabulary — so
  collecting it is the right call, not a driver-side-loop smell.
* **Encoding is an Arrow-batched kernel** over the JVM-side pretoken
  arrays with a per-batch word cache (corpus word frequency is Zipfian;
  the hit rate is enormous), merge ranks broadcast via closure.

Symbols are integer token ids, never byte strings: id 0-255 = the raw
byte, id 256+r = the r-th merge.  Keying merges by (left_id, right_id)
makes two merge paths that happen to spell the same bytes distinct
tokens — byte-string-keyed vocabularies are ambiguous there.

Reference parity note: the reference engine (PipelineDB) has no
tokenizer; this extends the engine's training-data surface alongside
text.py's regex token counters (SURVEY.md LLM-pipeline section).
"""

from __future__ import annotations

import json
import os
from collections import Counter

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .text import BPE_ISH_PATTERN, bpe_ish_tokens

__all__ = [
    "BPETokenizer", "bpe_word_counts", "bpe_train",
]


# --------------------------------------------------------------------
# distributed word counting (the only corpus-scale step)

def bpe_word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Pre-tokenize JVM-side and count distinct pretokens.

    One scan + one shuffle on the word; column-pruned to ``text_col``.
    Output: (word string, n long), the exact input a BPE trainer needs.
    """
    return (df.select(F.explode(bpe_ish_tokens(F.col(text_col)))
                      .alias("word"))
              .groupBy("word").agg(F.count("*").alias("n")))


def bpe_train(df: DataFrame, text_col: str = "text",
              vocab_size: int = 1024,
              max_words: int = 1_000_000) -> "BPETokenizer":
    """Train byte-level BPE on a corpus DataFrame.

    Word counting is distributed; the merge loop runs driver-side on
    the collected (word, count) table, truncated to the ``max_words``
    most frequent words (deterministic tie-break on the word itself so
    retraining on the same corpus yields the same tokenizer).
    """
    wc = bpe_word_counts(df, text_col)
    # top-N by count with a total order: Spark's takeOrdered-style
    # limit is deterministic under the (n DESC, word ASC) sort key
    rows = (wc.orderBy(F.col("n").desc(), F.col("word").asc())
              .limit(max_words).collect())
    counts = [(r["word"], r["n"]) for r in rows]
    merges = _train_from_counts(counts, vocab_size)
    return BPETokenizer(merges)


# --------------------------------------------------------------------
# driver-side merge loop (vocabulary-scale, incremental pair counts)

def _word_pairs(syms: list) -> Counter:
    c = Counter()
    for i in range(len(syms) - 1):
        c[(syms[i], syms[i + 1])] += 1
    return c


def _train_from_counts(counts, vocab_size: int):
    """BPE merge loop over (word, count) pairs.

    Incremental maintenance: each merge re-scans only the words that
    contain the merged pair (tracked in an inverted index), subtracting
    their old adjacent-pair contributions and adding the new ones.
    Tie-break is (count DESC, pair ASC) — a total order, so training is
    deterministic; this is OUR spec (GPT-2 used insertion order, which
    is not reproducible from counts alone).

    Returns the merge table: list of (left_id, right_id); the r-th
    entry defines token id 256 + r.
    """
    if vocab_size < 256:
        raise ValueError("vocab_size must be >= 256 (byte alphabet)")
    words = []           # [count, [sym ids]]
    for w, n in counts:
        b = w.encode("utf-8")
        if len(b) >= 2:
            words.append([n, list(b)])
    pair_counts: Counter = Counter()
    pair_words: dict = {}      # pair -> set of word indices
    for wi, (n, syms) in enumerate(words):
        for p, k in _word_pairs(syms).items():
            pair_counts[p] += k * n
            pair_words.setdefault(p, set()).add(wi)

    merges = []
    next_id = 256
    while next_id < vocab_size and pair_counts:
        # min over (-count, pair): highest count, then smallest pair
        best = min(pair_counts, key=lambda p: (-pair_counts[p], p))
        if pair_counts[best] <= 0:
            break
        merges.append(best)
        new_id = next_id
        next_id += 1
        affected = pair_words.pop(best, set())
        for wi in affected:
            n, syms = words[wi]
            # retract this word's contributions entirely, rewrite the
            # word, then re-add — O(len(word)) and immune to the
            # classic overlapping-pair bookkeeping bugs (e.g. "aaa")
            for p, k in _word_pairs(syms).items():
                pair_counts[p] -= k * n
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                s = pair_words.get(p)
                if s is not None:
                    s.discard(wi)
                    if not s:
                        del pair_words[p]
            out = []
            i = 0
            while i < len(syms):
                if (i + 1 < len(syms)
                        and syms[i] == best[0] and syms[i + 1] == best[1]):
                    out.append(new_id)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[wi][1] = out
            for p, k in _word_pairs(out).items():
                pair_counts[p] += k * n
                pair_words.setdefault(p, set()).add(wi)
    return merges


# --------------------------------------------------------------------
# tokenizer object: ranks, encode/decode, Spark kernels, persistence

class BPETokenizer:
    """Byte-level BPE: ids 0-255 are raw bytes, 256+r is merge r."""

    def __init__(self, merges):
        self.merges = [tuple(m) for m in merges]
        self.ranks = {p: i for i, p in enumerate(self.merges)}
        # id -> bytes expansion table, built bottom-up (merge r can
        # only reference ids < 256 + r)
        byte_of = [bytes([i]) for i in range(256)]
        for (a, b) in self.merges:
            byte_of.append(byte_of[a] + byte_of[b])
        self._bytes_of = byte_of

    @property
    def vocab_size(self) -> int:
        return 256 + len(self.merges)

    # -- single-word paths (driver/test-side and kernel inner loop) --

    def encode_word(self, word: str) -> list:
        syms = list(word.encode("utf-8"))
        ranks = self.ranks
        while len(syms) > 1:
            best_rank = None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank = r
            if best_rank is None:
                break
            a, b = self.merges[best_rank]
            new_id = 256 + best_rank
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(new_id)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    def encode_text(self, text: str) -> list:
        """Driver-side whole-string encode (test oracle / small jobs).
        Uses the Python `regex` module only if available; otherwise the
        caller should go through the Spark path, whose pre-tokenization
        is JVM-side.  Falls back to whitespace-preserving split that
        matches the JVM pattern for ASCII inputs."""
        out = []
        for w in _pretokenize_py(text):
            out.extend(self.encode_word(w))
        return out

    def decode(self, ids) -> str:
        bo = self._bytes_of
        return b"".join(bo[i] for i in ids).decode("utf-8",
                                                   errors="replace")

    # -- Spark kernels ------------------------------------------------

    def encode(self, df: DataFrame, text_col: str = "text",
               out_col: str = "token_ids") -> DataFrame:
        """Append ``out_col: array<int>`` of BPE token ids.

        Pre-tokenization happens JVM-side (same codegen expression as
        training), so Python only BPE-merges individual words — with a
        per-batch cache over distinct words (Zipfian corpus → the
        cache absorbs almost every lookup)."""
        kernel = _encode_kernel(self.merges, counts_only=False)
        pre = F.coalesce(bpe_ish_tokens(F.col(text_col)),
                         F.array().cast("array<string>"))
        return df.withColumn(out_col, kernel(pre))

    def token_count(self, df: DataFrame, text_col: str = "text",
                    out_col: str = "bpe_tokens") -> DataFrame:
        """Append ``out_col: long`` — exact BPE token count (the unit
        token budgets and `pack_sequences` should use)."""
        kernel = _encode_kernel(self.merges, counts_only=True)
        pre = F.coalesce(bpe_ish_tokens(F.col(text_col)),
                         F.array().cast("array<string>"))
        from . import spread_input
        return spread_input(df).withColumn(out_col, kernel(pre))

    # -- persistence --------------------------------------------------

    def save(self, path: str) -> None:
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"format": "pipelinedb_spark_bpe_v1",
                       "pattern": BPE_ISH_PATTERN,
                       "merges": [list(m) for m in self.merges]}, f)
        os.replace(tmp, path)

    @classmethod
    def load(cls, path: str) -> "BPETokenizer":
        with open(path) as f:
            d = json.load(f)
        if d.get("format") != "pipelinedb_spark_bpe_v1":
            raise ValueError(f"not a BPE tokenizer file: {path}")
        return cls(d["merges"])


def _pretokenize_py(text: str) -> list:
    """Driver-side mirror of BPE_ISH_PATTERN for tests/small jobs.
    Exact for the pattern's structure (contractions, letter runs,
    digit runs, punct runs, whitespace runs) using Python's unicode
    str.isalpha/isdigit in place of \\p{L}/\\p{N}."""
    out = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        # contraction alternative — only at token start on a bare '
        # (after a leading space the regex's punct-run alternative
        # wins instead, so the check must NOT apply post-lead)
        if c == "'":
            matched = False
            for suf in ("s", "t", "re", "ve", "m", "ll", "d"):
                if text.startswith(suf, i + 1):
                    out.append(text[i:i + 1 + len(suf)])
                    i += 1 + len(suf)
                    matched = True
                    break
            if matched:
                continue
            # fall through: ' opens an ordinary punct run
        start = i
        if c == " " and i + 1 < n and not text[i + 1].isspace():
            # optional leading space of the letter/digit/punct runs
            i += 1
            c = text[i]
        if c.isalpha():
            j = i
            while j < n and text[j].isalpha():
                j += 1
        elif c.isdigit():
            j = i
            while j < n and text[j].isdigit():
                j += 1
        elif c.isspace():
            j = i
            while j < n and text[j].isspace():
                j += 1
        else:
            # punct run: anything non-space/letter/digit, apostrophes
            # included (the regex class [^\s\p{L}\p{N}] keeps them)
            j = i
            while j < n and not (text[j].isspace() or text[j].isalpha()
                                 or text[j].isdigit()):
                j += 1
        out.append(text[start:j])
        i = j
    return out


def _encode_kernel(merges, counts_only: bool):
    """Arrow-batched pandas UDF over pretoken arrays.  The merge table
    travels in the closure (a vocab-size list of int pairs — small);
    each batch keeps a word→ids cache."""
    tok = BPETokenizer(merges)

    if counts_only:
        @F.pandas_udf(T.LongType())
        def k(pre: pd.Series) -> pd.Series:
            cache: dict = {}
            out = []
            for words in pre:
                n = 0
                for w in words:
                    ids = cache.get(w)
                    if ids is None:
                        ids = tok.encode_word(w)
                        cache[w] = ids
                    n += len(ids)
                out.append(n)
            return pd.Series(out, dtype="int64")
        return k

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def k(pre: pd.Series) -> pd.Series:
        cache: dict = {}
        out = []
        for words in pre:
            ids: list = []
            for w in words:
                got = cache.get(w)
                if got is None:
                    got = tok.encode_word(w)
                    cache[w] = got
                ids.extend(got)
            out.append(ids)
        return pd.Series(out)
    return k
