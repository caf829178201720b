"""PII detection / redaction for LLM training-data pipelines.

Pattern-based scanning (email, IPv4, SSN, credit-card, phone) as pure
Column regexp expressions — one scan, no shuffle, no Python in the
hot path, so the plan is unchanged at 100 TB and parallelizes
per-partition.  Patterns deliberately stay inside the common subset
of Java regex (Spark) and RE2 (duckdb oracle): no lookaround, no
backreferences, so the SAME pattern string drives both engines and
the oracle can mirror the operator verbatim.

This is heuristic PII hygiene for corpus curation (the standard
pre-training redaction pass), not a compliance scanner: overlapping
matches are counted by every pattern they match, and redaction order
is fixed (most-specific first) so composite strings redact
deterministically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered: most-specific first — redaction applies top-down, so an
# SSN is tagged <ssn> rather than being half-eaten by the looser
# phone pattern.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    "credit_card": r"\b(?:[0-9]{4}[ -]){3}[0-9]{4}\b",
    "phone": r"(?:\+[0-9]{1,2}[ -]?)?\(?[0-9]{3}\)?[ -][0-9]{3}[ -][0-9]{4}\b",
}


def pii_count(text: Column, kind: str) -> Column:
    return F.regexp_count(text, F.lit(PII_PATTERNS[kind]))


def pii_profile(df: DataFrame, text_col: str = "text",
                kinds: tuple = tuple(PII_PATTERNS)) -> DataFrame:
    """Append ``n_<kind>`` match counts per document plus ``n_pii``
    (their sum) — one scan."""
    out = df
    total = F.lit(0)
    for kind in kinds:
        out = out.withColumn(f"n_{kind}",
                             pii_count(F.col(text_col), kind))
        total = total + F.col(f"n_{kind}")
    return out.withColumn("n_pii", total)


def pii_redact(df: DataFrame, text_col: str = "text",
               kinds: tuple = tuple(PII_PATTERNS),
               token_fmt: str = "<{kind}>",
               out_col: str | None = None) -> DataFrame:
    """Replace every match with a typed placeholder (default
    ``<email>``, ``<ipv4>`` …), applying patterns in PII_PATTERNS
    order.  Writes ``out_col`` (default: in place)."""
    col = F.col(text_col)
    for kind in kinds:
        col = F.regexp_replace(col, PII_PATTERNS[kind],
                               token_fmt.format(kind=kind))
    return df.withColumn(out_col or text_col, col)


def pii_filter(df: DataFrame, text_col: str = "text",
               max_pii: int = 0,
               kinds: tuple = tuple(PII_PATTERNS)) -> DataFrame:
    """Drop documents with more than ``max_pii`` total matches (the
    drop-don't-redact curation policy) — a pure filter, no new
    columns materialize."""
    total = F.lit(0)
    for kind in kinds:
        total = total + pii_count(F.col(text_col), kind)
    return df.filter(total <= F.lit(max_pii))
