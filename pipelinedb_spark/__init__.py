"""pipelinedb_spark — a PySpark-native continuous-query engine with the
capabilities of PipelineDB (reference: pipelinedb/pipelinedb @
/root/reference), built Spark-first on DataFrames, Spark SQL and
Structured Streaming.

Quick start::

    from pipelinedb_spark import PipelineContext, get_spark

    spark = get_spark()
    ctx = PipelineContext(spark)
    ctx.create_stream("s", "k string, v long")
    ctx.create_view("v0", "SELECT k, count(*) AS cnt, avg(v) AS a FROM s GROUP BY k")
    ctx.insert("s", [{"k": "x", "v": 1}, {"k": "y", "v": 2}])
    ctx.read_view("v0").show()
"""

from pipelinedb_spark.aggregates import REGISTRY, AggSpec, register_sketch_aggs
from pipelinedb_spark.analyzer import CQError, analyze
from pipelinedb_spark.engine import PipelineContext
from pipelinedb_spark.session import get_spark, tune_existing

__all__ = [
    "PipelineContext",
    "get_spark",
    "tune_existing",
    "REGISTRY",
    "AggSpec",
    "register_sketch_aggs",
    "analyze",
    "CQError",
]

__version__ = "0.1.0"
