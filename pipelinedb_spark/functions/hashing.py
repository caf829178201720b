"""Group hashing: hash_group / ls_hash_group (reference
``src/hashfuncs.c:93-173``).

``hash_group(cols...)`` is the expression the reference indexes matrels
on for combiner point lookups; our matrel store derives its bucket ids
the same way (``matrel.py bucket_expr`` uses xxhash64).
``ls_hash_group`` is the locality-sensitive variant that leads with the
time column's high bits so sliding-window steps of one group cluster
together — here that corresponds to partitioning matrels by
(bucket, step)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash_group(*cols: Column) -> Column:
    return F.xxhash64(*cols)


def ls_hash_group(time_col: Column, *cols: Column) -> Column:
    """Locality-sensitive group hash: time-derived high 24 bits,
    group-hash low 40 bits (mirrors the bit split idea of
    hashfuncs.c:137-173)."""
    tbits = (time_col.cast("double") / F.lit(3600.0)).cast("long") \
        .bitwiseAND(F.lit((1 << 24) - 1))
    gbits = F.xxhash64(*cols).bitwiseAND(F.lit((1 << 40) - 1))
    return F.shiftleft(tbits, 40).bitwiseOR(gbits)
