"""Large-scale training-data pipeline operators (beyond-reference
surface): deduplication, similarity search, text analysis, multimodal
column plumbing.  All operators are DataFrame→DataFrame and built from
JVM-side expressions wherever possible; Python appears only in
Arrow-batched pandas UDFs."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_input(df: DataFrame) -> DataFrame:
    """Give a narrow-source DataFrame enough partitions to keep every
    core busy through a heavy per-row kernel (Arrow mapInPandas /
    pandas_udf or a wide regex projection).

    Parquet scan parallelism follows ROW-GROUP layout, not CPU count:
    a table written as one row group is read by ONE task, and a
    zero-shuffle kernel inherits that single partition — the whole
    stage runs on one core (the r13 script_lang_id_mixed finding,
    generalized; guide §2.5 "input skew: repartition immediately
    after the read").  The round-robin repartition only fires when
    the source has FEWER partitions than the cluster's parallelism,
    so at real scale (thousands of row groups) it is a no-op and no
    extra shuffle of the payload ever happens; locally it moves a
    few MB once and unlocks every core for the kernel."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
