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


#: attribute name for a caller-supplied scan-partition estimate (set by
#: ``sources.parquet.load_table`` from one memoized ~ms Hadoop
#: content-summary call).  ``df.rdd.getNumPartitions()`` — the fallback
#: probe — costs ~0.15 s of DRIVER time per call (full plan -> RDD
#: conversion through py4j), paid once per spread() per query build;
#: the hint removes that flat cost wherever the input is a harness
#: table scan (narrow ops over it keep the same scan partitioning —
#: use :func:`carry_scan_hint` to propagate it past filters).
SCAN_HINT_ATTR = "_spark_graft_scan_splits"


def carry_scan_hint(child: DataFrame, parent: DataFrame) -> DataFrame:
    """Propagate a parent's scan-partition hint onto a DataFrame
    derived from it by NARROW ops only (filter/select/withColumn —
    anything that cannot change the scan split count)."""
    hint = getattr(parent, SCAN_HINT_ATTR, None)
    if hint is not None:
        setattr(child, SCAN_HINT_ATTR, hint)
    return child


def spread(df: DataFrame, min_factor: int = 1) -> DataFrame:
    """Ensure CPU-bound narrow stages get full parallelism.

    Parquet plans one task per ~128 MB split, so a small file yields a
    single task and serializes expensive per-row compute (signatures,
    vector math).  If the scan has fewer partitions than the cluster
    has cores, round-robin repartition to the default parallelism;
    otherwise return the input unchanged — at 100 TB the input splits
    already saturate the cluster and an extra shuffle would be pure
    waste.

    The partition probe prefers the ``SCAN_HINT_ATTR`` estimate when
    the caller attached one (guide §1/§5: the RDD-conversion probe is
    driver-side, single-threaded plan work — a flat ~0.15 s per call
    that dominates sub-second queries at harness scale and is pure
    waste at any scale); without a hint the exact
    ``df.rdd.getNumPartitions()`` probe runs as before.
    """
    target = df.sparkSession.sparkContext.defaultParallelism * min_factor
    hint = getattr(df, SCAN_HINT_ATTR, None)
    n = int(hint) if hint is not None else df.rdd.getNumPartitions()
    if n < target:
        return df.repartition(target)
    return df
