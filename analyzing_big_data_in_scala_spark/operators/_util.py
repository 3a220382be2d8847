"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ONLY when the input has fewer partitions than the
    cluster has cores — e.g. a small parquet file read as one row group.

    Used by compute-bound operators (tokenize/shingle/hash/vector math)
    where map-side CPU dominates: a single-partition input would serialize
    the whole operator. At real scale inputs carry plenty of partitions and
    this is a no-op, so the extra shuffle never appears in big plans.
    """
    if min_partitions is None:
        min_partitions = df.sparkSession.sparkContext.defaultParallelism
    # inputFiles() is a cheap FileIndex lookup; df.rdd.getNumPartitions()
    # would force a full plan->RDD conversion (~1s per call). Many input
    # files => the scan is already parallel => leave the plan untouched.
    try:
        if len(df.inputFiles()) >= min_partitions:
            return df
    except Exception:
        pass
    return df.repartition(min_partitions)
