"""Small shared utilities."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def parquet_complete(path: str) -> bool:
    """True iff ``path`` holds a COMPLETED Spark parquet write.

    Gates session-cached fixture reuse on the ``_SUCCESS`` marker the
    committer drops at job completion, not on ``os.path.isdir``: Spark
    creates the directory before any file lands, so an interrupted
    first write leaves a partial dir that a bare isdir check would
    silently treat as the complete dataset on every later run.
    """
    return os.path.isfile(os.path.join(path, "_SUCCESS"))


def spread(df: DataFrame, min_factor: int = 1) -> DataFrame:
    """Ensure CPU-bound narrow stages get full parallelism.

    Parquet plans one task per ~128 MB split, so a small file yields a
    single task and serializes expensive per-row compute (signatures,
    vector math).  If the scan has fewer partitions than the cluster
    has cores, round-robin repartition to the default parallelism;
    otherwise return the input unchanged — at 100 TB the input splits
    already saturate the cluster and an extra shuffle would be pure
    waste.
    """
    target = df.sparkSession.sparkContext.defaultParallelism * min_factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
