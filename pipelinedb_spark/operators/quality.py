"""Repetition / quality filters for LLM training-data pipelines —
the Gopher/MassiveText-style document filters (duplicate-line and
duplicate-n-gram fractions, top-n-gram character fraction, word-count
and word-length gates) as pure Column expressions.

Scale stance (100 TB corpus): every metric here is computed inside
ONE scan of the document table with no shuffle and no Python — the
per-document n-gram statistics fold over a sorted gram array with
``F.aggregate`` (O(G log G) per doc, JVM-side), so the same plan runs
unchanged at any corpus size and parallelizes per-partition.

Metric definitions (documented precisely so the duckdb oracle can
mirror them verbatim):

* ``duplicate_word_fraction``   — 1 − distinct(words)/count(words).
* ``duplicate_line_fraction``   — 1 − distinct(lines)/count(lines)
  (lines split on newline; single-line docs score 0).
* ``duplicate_line_char_fraction`` — characters inside lines whose
  text occurs more than once ÷ total line characters (every
  occurrence counts, matching the MassiveText definition).
* ``top_ngram_char_fraction(n)`` — characters covered by the single
  most frequent token n-gram (count × gram length) ÷ total gram
  characters; ties on count break toward the larger char product.
* ``duplicate_ngram_char_fraction(n)`` — characters covered by all
  n-grams occurring more than once (all occurrences) ÷ total gram
  characters.

The reference engine has no corpus-quality surface; these extend the
repo's beyond-reference LLM-pipeline layer (SURVEY §2 'beyond').
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SEP = "\x1f"  # cannot appear inside whitespace tokens


def _words(text: Column) -> Column:
    """Non-empty whitespace tokens (double spaces yield no empties)."""
    return F.filter(F.split(text, " "), lambda w: w != "")


def _token_ngrams(ws: Column, n: int) -> Column:
    """Token n-grams joined with an out-of-alphabet separator.

    Gram *length* counts token characters only (the separator is
    bookkeeping, not content), so char fractions are over real text.
    """
    if n == 1:
        return ws
    m = F.size(ws) - (n - 1)
    # sequence(0, -1) yields a DESCENDING [0, -1] in Spark, not an
    # empty array — docs shorter than n tokens must short-circuit.
    idx = F.when(m > 0, F.sequence(F.lit(0), m - 1)) \
        .otherwise(F.array().cast("array<int>"))
    return F.transform(
        idx, lambda i: F.concat_ws(_SEP, *[F.get(ws, i + k)
                                           for k in range(n)]))


def _gram_len(g: Column, n: int) -> Column:
    """Character length of a gram minus its n-1 separators."""
    return F.length(g) - F.lit(n - 1)


def _run_stats(grams: Column, n: int) -> Column:
    """Fold a sorted gram array into
    struct(top_cnt, top_chars, dup_chars, total_chars).

    Equal grams are adjacent after ``array_sort``, so one linear pass
    with run-length state replaces a per-gram frequency lookup — no
    map state, no O(G²) filter-per-distinct.
    """
    srt = F.array_sort(grams)
    zero = F.lit(0).cast("long")
    init = F.struct(
        F.lit("").alias("prev"), zero.alias("run"),
        zero.alias("top_cnt"), zero.alias("top_chars"),
        zero.alias("dup_chars"), zero.alias("total_chars"))

    def close_run(acc):
        """Stats after folding the run held in (acc.prev, acc.run)."""
        rchars = acc["run"] * _gram_len(acc["prev"], n)
        new_top = acc["run"] > acc["top_cnt"]
        tie = acc["run"] == acc["top_cnt"]
        return (
            F.when(new_top, acc["run"]).otherwise(acc["top_cnt"]),
            F.when(new_top, rchars)
             .when(tie, F.greatest(acc["top_chars"], rchars))
             .otherwise(acc["top_chars"]),
            acc["dup_chars"] + F.when(acc["run"] > 1, rchars)
                                .otherwise(F.lit(0).cast("long")),
        )

    def merge(acc, g):
        same = acc["prev"] == g
        top_cnt, top_chars, dup_chars = close_run(acc)
        return F.struct(
            g.alias("prev"),
            F.when(same, acc["run"] + 1).otherwise(F.lit(1).cast("long"))
             .alias("run"),
            F.when(same, acc["top_cnt"]).otherwise(top_cnt)
             .alias("top_cnt"),
            F.when(same, acc["top_chars"]).otherwise(top_chars)
             .alias("top_chars"),
            F.when(same, acc["dup_chars"]).otherwise(dup_chars)
             .alias("dup_chars"),
            (acc["total_chars"] + _gram_len(g, n)).alias("total_chars"))

    def finish(acc):
        top_cnt, top_chars, dup_chars = close_run(acc)
        return F.struct(top_cnt.alias("top_cnt"),
                        top_chars.alias("top_chars"),
                        dup_chars.alias("dup_chars"),
                        acc["total_chars"].alias("total_chars"))

    return F.aggregate(srt, init, merge, finish)


def top_ngram_char_fraction(text: Column, n: int) -> Column:
    ws = _words(text)
    st = _run_stats(_token_ngrams(ws, n), n)
    return F.when(st["total_chars"] > 0,
                  st["top_chars"] / st["total_chars"]).otherwise(F.lit(0.0))


def duplicate_ngram_char_fraction(text: Column, n: int) -> Column:
    ws = _words(text)
    st = _run_stats(_token_ngrams(ws, n), n)
    return F.when(st["total_chars"] > 0,
                  st["dup_chars"] / st["total_chars"]).otherwise(F.lit(0.0))


def duplicate_word_fraction(text: Column) -> Column:
    ws = _words(text)
    return F.when(F.size(ws) > 0,
                  1.0 - F.size(F.array_distinct(ws)) / F.size(ws)
                  ).otherwise(F.lit(0.0))


def duplicate_line_fraction(text: Column) -> Column:
    lines = F.filter(F.split(text, "\n"), lambda l: l != "")
    return F.when(F.size(lines) > 0,
                  1.0 - F.size(F.array_distinct(lines)) / F.size(lines)
                  ).otherwise(F.lit(0.0))


def duplicate_line_char_fraction(text: Column) -> Column:
    lines = F.filter(F.split(text, "\n"), lambda l: l != "")
    st = F.aggregate(
        F.array_sort(lines),
        F.struct(F.lit("").alias("prev"),
                 F.lit(0).cast("long").alias("run"),
                 F.lit(0).cast("long").alias("dup_chars"),
                 F.lit(0).cast("long").alias("total_chars")),
        lambda acc, l: F.struct(
            l.alias("prev"),
            F.when(acc["prev"] == l, acc["run"] + 1)
             .otherwise(F.lit(1).cast("long")).alias("run"),
            (acc["dup_chars"] + F.when(
                (acc["prev"] != l) & (acc["run"] > 1),
                acc["run"] * F.length(acc["prev"]))
                .otherwise(F.lit(0).cast("long"))).alias("dup_chars"),
            (acc["total_chars"] + F.length(l)).alias("total_chars")),
        lambda acc: F.struct(
            (acc["dup_chars"] + F.when(
                acc["run"] > 1, acc["run"] * F.length(acc["prev"]))
                .otherwise(F.lit(0).cast("long"))).alias("dup_chars"),
            acc["total_chars"].alias("total_chars")))
    return F.when(st["total_chars"] > 0,
                  st["dup_chars"] / st["total_chars"]).otherwise(F.lit(0.0))


def repetition_profile(df: DataFrame, text_col: str = "text",
                       top_ns: tuple = (2, 3, 4),
                       dup_ns: tuple = (5, 6, 10)) -> DataFrame:
    """One-scan per-document repetition metrics.

    The word array is materialized once in an intermediate projection
    (same reason as text.analyze_documents: inlining makes Catalyst
    re-split the text per derived metric); each n-gram statistic then
    folds its own sorted gram array.
    """
    out = df.withColumn("_ws", _words(F.col(text_col)))
    ws = F.col("_ws")
    cols = [
        duplicate_word_fraction(F.col(text_col))
        .alias("dup_word_frac"),
        duplicate_line_fraction(F.col(text_col))
        .alias("dup_line_frac"),
        duplicate_line_char_fraction(F.col(text_col))
        .alias("dup_line_char_frac"),
    ]
    for n in top_ns:
        st = _run_stats(_token_ngrams(ws, n), n)
        cols.append(
            F.when(st["total_chars"] > 0,
                   st["top_chars"] / st["total_chars"])
            .otherwise(F.lit(0.0)).alias(f"top_{n}gram_char_frac"))
    for n in dup_ns:
        st = _run_stats(_token_ngrams(ws, n), n)
        cols.append(
            F.when(st["total_chars"] > 0,
                   st["dup_chars"] / st["total_chars"])
            .otherwise(F.lit(0.0)).alias(f"dup_{n}gram_char_frac"))
    keep = [c for c in df.columns if c != text_col]
    return out.select(*keep, *cols)


# Gopher rule thresholds (public report values); each rule is a named
# predicate so the filter reports WHICH rule rejected a document.
GOPHER_RULES = {
    "word_count": lambda t: (F.size(_words(t)) >= 50)
                            & (F.size(_words(t)) <= 100_000),
    "mean_word_length": lambda t: (
        (F.aggregate(_words(t), F.lit(0).cast("long"),
                     lambda a, w: a + F.length(w))
         / F.greatest(F.size(_words(t)), F.lit(1))).between(3.0, 10.0)),
    "dup_line_frac": lambda t: duplicate_line_fraction(t) <= 0.30,
    "dup_line_char_frac": lambda t: duplicate_line_char_fraction(t) <= 0.20,
    "top_2gram_char_frac": lambda t: top_ngram_char_fraction(t, 2) <= 0.20,
    "top_3gram_char_frac": lambda t: top_ngram_char_fraction(t, 3) <= 0.18,
    "top_4gram_char_frac": lambda t: top_ngram_char_fraction(t, 4) <= 0.16,
    "dup_5gram_char_frac": lambda t: duplicate_ngram_char_fraction(t, 5) <= 0.15,
    "dup_6gram_char_frac": lambda t: duplicate_ngram_char_fraction(t, 6) <= 0.14,
    "dup_10gram_char_frac": lambda t: duplicate_ngram_char_fraction(t, 10) <= 0.10,
}


def quality_flags(df: DataFrame, text_col: str = "text",
                  rules: dict | None = None) -> DataFrame:
    """Append one boolean column per rule plus ``passes_quality``
    (AND of all rules) — still one scan, no shuffle."""
    rules = GOPHER_RULES if rules is None else rules
    t = F.col(text_col)
    out = df
    all_ok = F.lit(True)
    for name, rule in rules.items():
        ok = F.coalesce(rule(t), F.lit(False))
        out = out.withColumn(f"ok_{name}", ok)
        all_ok = all_ok & F.col(f"ok_{name}")
    return out.withColumn("passes_quality", all_ok)


def gopher_filter(df: DataFrame, text_col: str = "text",
                  rules: dict | None = None) -> DataFrame:
    """Keep only documents passing every rule (the production path:
    the per-rule flags never materialize)."""
    rules = GOPHER_RULES if rules is None else rules
    t = F.col(text_col)
    cond = F.lit(True)
    for rule in rules.values():
        cond = cond & F.coalesce(rule(t), F.lit(False))
    return df.filter(cond)


# ---------------------------------------------------------------------------
# C4-style cleaning (public C4/T5 corpus rules): line-level filtering
# inside one scan, plus corpus-wide repeated-paragraph removal.
# ---------------------------------------------------------------------------

def c4_clean_lines(df: DataFrame, text_col: str = "text",
                   min_words: int = 5,
                   require_terminal: bool = True,
                   ban_words: tuple = ("javascript",),
                   out_col: str | None = None) -> DataFrame:
    """C4 line filter: keep only lines with ≥ ``min_words`` words,
    ending in terminal punctuation (. ! ? or closing quote), and not
    containing any banned word (case-insensitive); rejoin survivors
    with newlines.  Pure Column HOFs — one scan, no shuffle."""
    def keep(l: Column) -> Column:
        ok = F.size(F.filter(F.split(l, " "),
                             lambda w: w != "")) >= min_words
        if require_terminal:
            ok = ok & l.rlike(r'[.!?"]\s*$')
        low = F.lower(l)
        for w in ban_words:
            ok = ok & ~low.contains(w.lower())
        return ok

    lines = F.filter(F.split(F.col(text_col), "\n"), keep)
    return df.withColumn(out_col or text_col, F.concat_ws("\n", lines))


def c4_doc_filter(df: DataFrame, text_col: str = "text",
                  min_lines: int = 3,
                  ban_phrases: tuple = ("lorem ipsum", "{")) -> DataFrame:
    """C4 document gate: ≥ ``min_lines`` surviving non-empty lines and
    none of the banned phrases anywhere (the curly-brace rule drops
    leftover code)."""
    nonempty = F.size(F.filter(F.split(F.col(text_col), "\n"),
                               lambda l: l != ""))
    cond = nonempty >= min_lines
    low = F.lower(F.col(text_col))
    for p in ban_phrases:
        cond = cond & ~low.contains(p.lower())
    return df.filter(cond)


def drop_repeated_paragraphs(df: DataFrame, text_col: str = "text",
                             id_col: str = "doc_id",
                             max_occurrences: int = 2) -> DataFrame:
    """Corpus-wide boilerplate removal: delete every paragraph (line)
    whose exact text occurs more than ``max_occurrences`` times across
    the WHOLE corpus (the MassiveText cross-document repetition rule —
    headers, footers, cookie banners).

    Scale shape: paragraphs explode to (doc, pos, hash64); the
    frequency count groups on the 8-byte hash (one shuffle); the
    count join is hash-keyed on both corpus-scaled sides, so it is
    pinned shuffle-hash (a broadcast of corpus-wide distinct
    paragraphs would be wrong at any real scale); reconstruction
    groups back by doc id (one shuffle) and reassembles surviving
    lines in original order via array_sort on (pos, line) structs.
    """
    lines = (df.select(F.col(id_col),
                       F.posexplode(F.split(F.col(text_col), "\n"))
                       .alias("__pos", "__line"))
             .withColumn("__h", F.xxhash64("__line")))
    counts = (lines.groupBy("__h")
              .agg(F.count("*").alias("__cnt"))
              .filter(F.col("__cnt") > max_occurrences))
    # empty lines are structure, not boilerplate — never drop them
    kept = (lines.join(counts.hint("shuffle_hash"), "__h", "left_anti")
            .unionByName(lines.filter(F.col("__line") == "")
                         .join(counts.hint("shuffle_hash"), "__h",
                               "left_semi")))
    rebuilt = (kept.groupBy(id_col)
               .agg(F.concat_ws(
                   "\n",
                   F.transform(
                       F.array_sort(F.collect_list(
                           F.struct("__pos", "__line"))),
                       lambda s: s["__line"])).alias("__clean")))
    return (df.join(rebuilt, id_col, "left")
            .withColumn(text_col, F.coalesce("__clean", F.lit("")))
            .drop("__clean"))
