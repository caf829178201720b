"""Round-15 bank rotation residue: `decimal_avg_sum` left the driver
bank (its slot now runs `delta_stream_combine` — r14 verdict task 3,
the downstream `combine((delta).col)` oracle seat).  The semantics it
covered stay oracle-checked here against duckdb, verbatim both sides,
like the r12-r14 rotations did:

* decimal_avg_sum — the numeric/decimal aggregation path (reference
  sum/avg numeric variants pipelinedb--1.0.0.sql:142-265): a
  DECIMAL(38,6) sum rendered as its fixed-scale string so duckdb's
  DECIMAL128 and Spark's Decimal(38,6) hash identically, plus the
  derived average.  Decimal-sum coverage in the bank continues via
  q1_pricing_summary (3-limb exact sums), cv_engine_rollup and the
  new delta_stream_combine (decimal states through the engine).
"""
from __future__ import annotations

import duckdb
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _duck(sf_dir: str, sql: str, tables: list[str]):
    con = duckdb.connect()
    for tb in tables:
        con.execute(f"CREATE VIEW {tb} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{tb}.parquet')")
    return con.sql(sql).fetchall()


def test_decimal_avg_sum_matches_duckdb(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    sdec = F.sum(F.col("l_quantity").cast(T.DecimalType(38, 6)))
    got = sorted(
        (row["l_linestatus"], row["sum_qty_dec"],
         round(float(row["avg_qty"]), 9), row["n"])
        for row in li.groupBy("l_linestatus").agg(
            sdec.cast(T.DecimalType(38, 6)).cast("string")
            .alias("sum_qty_dec"),
            (sdec.cast("double") / F.count("l_quantity"))
            .alias("avg_qty"),
            F.count("*").alias("n")).collect())
    want = sorted(
        (ls, sq, round(float(aq), 9), n)
        for ls, sq, aq, n in _duck(sf_dir, """
SELECT l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS VARCHAR)
         AS sum_qty_dec,
       CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
         / COUNT(l_quantity) AS avg_qty,
       COUNT(*) AS n
FROM lineitem GROUP BY l_linestatus
""", ["lineitem"]))
    assert got == want and len(got) > 0
