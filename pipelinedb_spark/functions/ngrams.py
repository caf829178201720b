"""Shared token n-gram construction over array columns.

One implementation of the r13 linear-time shape serves every text
operator (quality grams, dedup shingles, decontamination gram hashes,
LM bigram pairs): n-1 chained zips over shifted slices, all built
ONCE per row.  The pre-r13 per-operator formulations indexed the
token array from inside a transform lambda (``F.get(ws, i + k)``) —
Catalyst inlines and re-evaluates the referenced expression per
element, O(len²) per document (55 s to build plain bigram pairs for
ONE 20k-token doc) — and the bug had to be fixed in four places
because the construction was duplicated (round-13 review).  Gram
strings are bit-identical to the index formulation: chained concat_ws
associates (a⊕b⊕c == (a⊕b)⊕c), and a zero slice length covers docs
shorter than n tokens (empty gram set, no partial grams).

tests/test_hof_lambda_audit.py statically guards the whole package
against the quadratic shape returning.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def chained_ngrams(ws: Column, n: int, sep: str) -> Column:
    """Array of the n-token grams of ``ws`` joined with ``sep``,
    in order, one per window position (length max(0, size-(n-1)))."""
    if n == 1:
        return ws
    m = F.greatest(F.size(ws) - (n - 1), F.lit(0))
    acc = F.slice(ws, 1, m)
    for k in range(1, n):
        acc = F.zip_with(acc, F.slice(ws, k + 1, m),
                         lambda a, b: F.concat_ws(sep, a, b))
    return acc


def shifted_pairs(ws: Column) -> Column:
    """array<struct<w1,w2>> of adjacent element pairs (the bigram
    shape), via the same shifted-slice zip."""
    m = F.greatest(F.size(ws) - 1, F.lit(0))
    return F.zip_with(F.slice(ws, 1, m), F.slice(ws, 2, m),
                      lambda a, b: F.struct(a.alias("w1"),
                                            b.alias("w2")))
