"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — one entry per implemented operator from SURVEY.md §2
(see pipelinedb_spark/querybank.py for the catalog).
``oracle_sql()`` — matching duckdb oracles.  Approximate/sketch ops use
self-verifying oracles: the Spark query emits exact anchors plus
within-accuracy-bound booleans computed against its own exact
computation; the duckdb side computes the same anchors exactly and
asserts the bounds TRUE (tolerances also pytest-checked in tests/).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pipelinedb_spark import tune_existing
    from pipelinedb_spark.querybank import Q

    tune_existing(spark)
    return Q["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pipelinedb_spark import tune_existing
    from pipelinedb_spark.querybank import Q

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            # the driver's session may not share our defaults; force the
            # runtime-settable ones the oracles depend on (UTC session
            # timezone, Arrow) before building the plan
            tune_existing(spark)
            return fn(spark, sf_dir)
        return run

    return {name: wrap(fn) for name, fn in Q.items()}


def oracle_sql() -> dict[str, str]:
    from pipelinedb_spark.querybank import ORACLE

    return dict(ORACLE)
