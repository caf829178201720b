"""Round-12 bank rotation residue: `events_hourly_top_type` left the
driver bank (its slot now runs the combine()/sw_combine() re-rollup,
round-11 verdict tasks 3+7) — the window-function-over-CV-read pattern
it covered (reference allows OVER only on CV reads,
analyzer.c:1216-1220) stays oracle-checked here against duckdb.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from pipelinedb_spark.functions.time import ts_epoch


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts",
                           F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def test_events_hourly_top_type_matches_duckdb(spark, events, sf_dir):
    """Per-hour leading event type: ROW_NUMBER over an hourly rollup
    (the rotated-out bank query, verbatim both sides)."""
    hour = F.floor(ts_epoch(F.col("ts")) / 3600).cast("bigint")
    hourly = (events.groupBy(hour.alias("hour_s"),
                             F.col("event_type"))
              .agg(F.count("*").alias("cnt")))
    w = Window.partitionBy("hour_s").orderBy(F.desc("cnt"),
                                             F.asc("event_type"))
    got = sorted(tuple(r) for r in
                 hourly.withColumn("rk", F.row_number().over(w))
                 .filter(F.col("rk") == 1).drop("rk").collect())

    want = sorted(tuple(r) for r in duckdb.sql(f"""
        WITH hourly AS (
          SELECT CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP)) / 3600)
                      AS BIGINT) AS hour_s,
                 event_type, COUNT(*) AS cnt
          FROM read_parquet('{sf_dir}/events.parquet') GROUP BY 1, 2
        ), ranked AS (
          SELECT hour_s, event_type, cnt,
                 ROW_NUMBER() OVER (PARTITION BY hour_s
                                    ORDER BY cnt DESC,
                                             event_type ASC) AS rk
          FROM hourly
        )
        SELECT hour_s, event_type, cnt FROM ranked WHERE rk = 1
        """).fetchall())
    assert got == want and len(got) > 0
