"""Round-14 bank rotation residue: `q5_local_supplier_volume` and
`minmax_temporal_string` left the driver bank (their slots now run the
output-stream change-feed and the combinable JSON-aggregate family —
r13 verdict tasks 1 and 4).  The semantics they covered stay
oracle-checked here against duckdb, verbatim both sides, like the r12
and r13 rotations did:

* q5 — 6-way join with a co-nationality predicate and broadcast-dim /
  shuffle-fact join strategy (TPC-H Q5 shape); join+agg coverage in
  the bank continues via q1/q3/stream_table_join_enrich.
* minmax_temporal_string — min/max over timestamp and string types
  plus a true DayTimeInterval SUM (the interval member of the
  reference's polymorphic sum family, pipelinedb--1.0.0.sql:142-265);
  min/max family coverage in the bank continues via
  events_agg_families.
"""
from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from pipelinedb_spark.querybank import dsum, sql_dsum


def _duck(sf_dir: str, sql: str, tables: list[str]):
    con = duckdb.connect()
    for tb in tables:
        con.execute(f"CREATE VIEW {tb} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{tb}.parquet')")
    return con.sql(sql).fetchall()


def test_q5_local_supplier_volume_matches_duckdb(spark, sf_dir):
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    s = F.broadcast(spark.read.parquet(f"{sf_dir}/supplier.parquet"))
    n = F.broadcast(spark.read.parquet(f"{sf_dir}/nation.parquet"))
    r = F.broadcast(spark.read.parquet(f"{sf_dir}/region.parquet")
                    .filter(F.col("r_name") == "ASIA"))
    got = sorted(
        (row["nation"], round(float(row["revenue"]), 6), row["n_lines"])
        for row in (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .join(s, (li.l_suppkey == s.s_suppkey) &
                  (c.c_nationkey == s.s_nationkey))
            .join(n, s.s_nationkey == n.n_nationkey)
            .join(r, n.n_regionkey == r.r_regionkey)
            .groupBy(F.col("n_name").alias("nation"))
            .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                 .alias("revenue"),
                 F.count("*").alias("n_lines"))).collect())
    want = sorted(
        (nm, round(float(rev), 6), nl)
        for nm, rev, nl in _duck(sf_dir, f"""
SELECT n.n_name AS nation,
       {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
       COUNT(*) AS n_lines
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
               AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
""", ["customer", "orders", "lineitem", "supplier", "nation",
      "region"]))
    assert got == want and len(got) > 0


def test_minmax_temporal_string_matches_duckdb(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    base = F.expr("TIMESTAMP_NTZ '1992-01-01 00:00:00'")
    got = sorted(
        (row["o_orderpriority"], str(row["first_order"]),
         str(row["last_order"]), row["lo_status"], row["hi_status"],
         row["n"], row["sum_age_s"])
        for row in o.groupBy("o_orderpriority").agg(
            F.min("o_orderdate").alias("first_order"),
            F.max("o_orderdate").alias("last_order"),
            F.min("o_orderstatus").alias("lo_status"),
            F.max("o_orderstatus").alias("hi_status"),
            F.count("*").alias("n"),
            F.sum(F.col("o_orderdate").cast("timestamp_ntz") - base)
            .cast("bigint").alias("sum_age_s")).collect())
    want = sorted(
        (p, str(fo), str(lo_), ls, hs, n, sa)
        for p, fo, lo_, ls, hs, n, sa in _duck(sf_dir, """
SELECT o_orderpriority,
       MIN(o_orderdate) AS first_order,
       MAX(o_orderdate) AS last_order,
       MIN(o_orderstatus) AS lo_status,
       MAX(o_orderstatus) AS hi_status,
       COUNT(*) AS n,
       CAST(SUM(epoch(CAST(o_orderdate AS TIMESTAMP))
                - epoch(TIMESTAMP '1992-01-01')) AS BIGINT) AS sum_age_s
FROM orders GROUP BY o_orderpriority
""", ["orders"]))
    assert got == want and len(got) > 0
