"""Focused seats for the r15 optimization round's internals changes:

* ``spread_input`` — the guarded round-robin repartition that feeds
  Arrow kernels: must fire only when the source has fewer partitions
  than the cluster parallelism (a no-op at real scale), and must be
  row-preserving.
* matrel read-side schema cache — populated by the first inferred
  read, reused after commits, DROPPED when a commit writes different
  names/types (schema evolution via overwrite).
* ``register_sql_functions`` session guard — second registration on
  the same session is skipped, and a second PipelineContext on the
  session still resolves every engine SQL function.
* ``merge(pin_old=True)`` read-back — the returned ``merged`` frame
  is the committed rows (not the merge plan) and stays correct when
  consumed after the commit, which is what the osrel write relies on.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pipelinedb_spark import PipelineContext
from pipelinedb_spark.matrel import MatrelStore


@pytest.fixture(scope="module")
def spark():
    from pipelinedb_spark import get_spark
    s = get_spark("test_r15_opt")
    s.sparkContext.setLogLevel("ERROR")
    return s


def test_spread_input_fires_only_below_parallelism(spark):
    from pipelinedb_spark.operators import spread_input

    P = spark.sparkContext.defaultParallelism
    few = spark.range(1000).coalesce(1)
    spread = spread_input(few)
    assert spread.rdd.getNumPartitions() == P
    # row-preserving
    assert spread.count() == 1000
    assert sorted(r["id"] for r in spread.collect()) == list(range(1000))

    many = spark.range(1000).repartition(P + 4)
    assert spread_input(many) is many  # guard: no extra exchange


def test_matrel_schema_cache_roundtrip_and_invalidation(spark, tmp_path):
    store = MatrelStore(spark, str(tmp_path), "m1", num_buckets=4)

    def batch(rows, schema):
        df = spark.createDataFrame(rows, schema)
        return df.withColumn("__bucket",
                             F.pmod(F.xxhash64("k"), F.lit(4)).cast("int"))

    def merge_fn(df):
        return df.groupBy("k", "__bucket").agg(F.sum("n").alias("n")) \
            .select("k", "n", "__bucket")

    store.merge(batch([("a", 1), ("b", 2)], "k string, n long"),
                ["k"], merge_fn)
    # first read infers and caches
    r1 = store.read()
    assert store._schema_cache is not None
    cached = [(f.name, f.dataType) for f in store._schema_cache.fields]
    assert ("k", T.StringType()) in cached
    # second merge reads through the cache and stays correct
    store.merge(batch([("a", 10)], "k string, n long"), ["k"], merge_fn)
    got = {r["k"]: r["n"] for r in store.read().collect()}
    assert got == {"a": 11, "b": 2}

    # schema evolution via overwrite drops the cache; next read
    # re-infers the new schema
    new_states = spark.createDataFrame(
        [("a", 5.0)], "k string, x double")
    store.overwrite(new_states, ["k"])
    assert store._schema_cache is None
    cols = set(store.read().columns)
    assert "x" in cols and "n" not in cols


def test_register_sql_functions_session_guard(spark, tmp_path):
    from pipelinedb_spark.functions import (_REGISTERED_SESSIONS,
                                            register_sql_functions)

    register_sql_functions(spark)
    assert spark in _REGISTERED_SESSIONS
    # a second context on the same session must still resolve every
    # engine SQL function (the guard skips re-registration, not the
    # functions)
    ctx = PipelineContext(spark, root=str(tmp_path / "ctx"),
                          num_buckets=4)
    try:
        out = spark.sql(
            "SELECT date_round(TIMESTAMP '2026-01-01 00:07:00', 300.0) "
            "AS t, hash_group('x') AS h").first()
        assert out["t"].minute == 5 and out["h"] is not None
    finally:
        ctx.close()


def test_merge_pin_old_returns_committed_rows(spark, tmp_path):
    store = MatrelStore(spark, str(tmp_path), "m2", num_buckets=4)

    def batch(rows):
        df = spark.createDataFrame(rows, "k string, n long")
        return df.withColumn("__bucket",
                             F.pmod(F.xxhash64("k"), F.lit(4)).cast("int"))

    def merge_fn(df):
        return df.groupBy("k", "__bucket").agg(F.sum("n").alias("n")) \
            .select("k", "n", "__bucket")

    old0, merged0 = store.merge(batch([("a", 1)]), ["k"], merge_fn,
                                pin_old=True)
    assert old0 is None
    assert {(r["k"], r["n"]) for r in merged0.collect()} == {("a", 1)}

    old1, merged1 = store.merge(batch([("a", 2), ("b", 7)]), ["k"],
                                merge_fn, pin_old=True)
    # old is the pre-merge snapshot, merged the committed result;
    # both must stay consumable AFTER the commit (the osrel write
    # runs exactly this way)
    assert {(r["k"], r["n"]) for r in old1.collect()} == {("a", 1)}
    assert {(r["k"], r["n"]) for r in merged1.collect()} == \
        {("a", 3), ("b", 7)}
