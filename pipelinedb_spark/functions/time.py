"""Time functions: date_round and datepart helpers (reference
``src/miscutils.c:305-332`` timestamptz_round, ``:562-618`` year/month/
day/hour/minute/second; SQL registration pipelinedb--1.0.0.sql:2590).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from pipelinedb_spark.analyzer import parse_interval


def ts_epoch(ts: Column) -> Column:
    """Epoch seconds as DOUBLE for any timestamp-like column.

    Parquet timestamps read as TIMESTAMP_NTZ, and Spark refuses
    NTZ -> DOUBLE directly; the session is pinned UTC so NTZ == UTC and
    an intermediate TIMESTAMP cast is exact.  Numeric inputs round-trip
    unchanged (seconds -> timestamp -> seconds)."""
    return ts.cast("timestamp").cast("double")


def date_round(ts: Column, interval: str) -> Column:
    """Round a timestamp down to the nearest multiple of ``interval``
    ('5 minutes', '1 hour', ...).  The sliding-window step bucketing
    primitive."""
    secs = parse_interval(interval)
    return F.timestamp_seconds(
        F.floor(ts_epoch(ts) / secs) * F.lit(secs))


def year(ts: Column) -> Column:
    return F.date_trunc("year", ts)


def month(ts: Column) -> Column:
    return F.date_trunc("month", ts)


def day(ts: Column) -> Column:
    return F.date_trunc("day", ts)


def hour(ts: Column) -> Column:
    return F.date_trunc("hour", ts)


def minute(ts: Column) -> Column:
    return F.date_trunc("minute", ts)


def second(ts: Column) -> Column:
    return F.date_trunc("second", ts)
