"""Scalar function surface mirroring PipelineDB's SQL functions."""

from __future__ import annotations

import weakref

from pyspark.sql import SparkSession

# SQL-body temporary functions so continuous-query SQL can call the
# PipelineDB names directly (reference pipelinedb--1.0.0.sql:2590-2618;
# impl src/miscutils.c:305-332, src/hashfuncs.c:93-173).  All pure SQL
# bodies — they inline into Catalyst plans, no UDF overhead.
_SQL_FUNCTIONS = [
    ("date_round",
     "(ts TIMESTAMP, step_s DOUBLE) RETURNS TIMESTAMP RETURN "
     "timestamp_seconds(floor(cast(ts AS DOUBLE) / step_s) * step_s)"),
    ("year_trunc",
     "(ts TIMESTAMP) RETURNS TIMESTAMP RETURN date_trunc('year', ts)"),
    ("month_trunc",
     "(ts TIMESTAMP) RETURNS TIMESTAMP RETURN date_trunc('month', ts)"),
    ("day_trunc",
     "(ts TIMESTAMP) RETURNS TIMESTAMP RETURN date_trunc('day', ts)"),
    ("hour_trunc",
     "(ts TIMESTAMP) RETURNS TIMESTAMP RETURN date_trunc('hour', ts)"),
    ("minute_trunc",
     "(ts TIMESTAMP) RETURNS TIMESTAMP RETURN date_trunc('minute', ts)"),
    ("second_trunc",
     "(ts TIMESTAMP) RETURNS TIMESTAMP RETURN date_trunc('second', ts)"),
    ("hash_group",
     "(x STRING) RETURNS BIGINT RETURN xxhash64(x)"),
    ("hash_group2",
     "(x STRING, y STRING) RETURNS BIGINT RETURN xxhash64(x, y)"),
    ("hash_group3",
     "(x STRING, y STRING, z STRING) RETURNS BIGINT RETURN xxhash64(x, y, z)"),
    ("ls_hash_group",
     "(ts TIMESTAMP, x STRING) RETURNS BIGINT RETURN "
     "shiftleft(cast(cast(ts AS DOUBLE) / 3600 AS BIGINT) & 16777215, 40) "
     "| (xxhash64(x) & 1099511627775)"),
    # bucket_agg accessors over the finalized (bucket_id, count) array
    # (reference pipelinedb--1.0.0.sql:2371-2396 bucket_ids /
    # bucket_cardinalities / bucket_cardinality over the bytea state)
    ("bucket_ids",
     "(b ARRAY<STRUCT<bucket_id: INT, count: BIGINT>>) "
     "RETURNS ARRAY<INT> RETURN transform(b, e -> e.bucket_id)"),
    ("bucket_cardinalities",
     "(b ARRAY<STRUCT<bucket_id: INT, count: BIGINT>>) "
     "RETURNS ARRAY<BIGINT> RETURN transform(b, e -> e.count)"),
    ("bucket_cardinality",
     "(b ARRAY<STRUCT<bucket_id: INT, count: BIGINT>>, id INT) "
     "RETURNS BIGINT RETURN "
     "coalesce(get(filter(b, e -> e.bucket_id = id), 0).count, 0L)"),
]


# sessions already carrying the registrations (weak: a stopped session
# must not be kept alive by the guard).  Registration is session-scoped
# and idempotent, but each CREATE FUNCTION / udf.register is a py4j
# round-trip — ~0.3 s for the full surface — and every PipelineContext
# used to pay it (guide §1.2: remove per-task constant work).  Keyed on
# the session object itself, so a cloned session (foreachBatch) with
# its own temp-function catalog still registers on first use.
_REGISTERED_SESSIONS: "weakref.WeakSet[SparkSession]" = weakref.WeakSet()


def register_sql_functions(spark: SparkSession,
                           force: bool = False) -> None:
    if not force and spark in _REGISTERED_SESSIONS:
        return
    for name, body in _SQL_FUNCTIONS:
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{body}")
    # sketch probe functions by name, so CQ SQL can compose them with
    # the sketch aggregates (reference: topk(), freq(), dist_quantile()
    # etc. as ordinary SQL functions over sketch columns)
    from pipelinedb_spark.functions import sketch_fns as sf

    for name, udf in [
        ("dist_quantile", sf.dist_quantile), ("dist_cdf", sf.dist_cdf),
        ("freq", sf.freq), ("freq_total", sf.freq_total),
        ("freq_norm", sf.freq_norm), ("topk_values", sf.topk_values),
        ("topk_freqs", sf.topk_freqs), ("topk", sf.topk),
        ("bloom_contains", sf.bloom_contains),
        ("bloom_cardinality", sf.bloom_cardinality),
    ]:
        spark.udf.register(name, udf)
    # hll_cardinality == native hll_sketch_estimate
    spark.sql("CREATE OR REPLACE TEMPORARY FUNCTION hll_cardinality"
              "(s BINARY) RETURNS BIGINT RETURN hll_sketch_estimate(s)")
    _REGISTERED_SESSIONS.add(spark)
