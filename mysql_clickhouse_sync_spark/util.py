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


def union_scan_hint(child: DataFrame, *parents: DataFrame) -> DataFrame:
    """Scan-partition hint for a ``unionByName`` of narrow slices: the
    union's partition count is the SUM of its children's, not either
    child's (r14 ADVICE: carrying one parent's hint across a union
    underestimates ~2x, and spread() may then add a repartition the
    data does not need).  The hint is attached only when EVERY parent
    carries one — a missing side falls back to the exact probe."""
    hints = [getattr(p, SCAN_HINT_ATTR, None) for p in parents]
    if all(h is not None for h in hints):
        setattr(child, SCAN_HINT_ATTR, sum(int(h) for h in hints))
    return child


#: attribute name for an EXACT caller-known row count (set by
#: ``sources.parquet.load_table`` from the parquet footers — the same
#: number count(*) over the unfiltered scan returns).  NEVER propagate
#: through filters; unlike the split-count hint this feeds exact
#: decisions (quantizer sizing k = N // bucket), so only the unfiltered
#: scan may carry it.
ROWS_HINT_ATTR = "_spark_graft_exact_rows"


def exact_rows_or_count(df: DataFrame) -> int:
    """The DataFrame's exact row count: the footer-derived hint when
    the caller is an unfiltered harness-table scan (zero Spark jobs),
    else one count() job — the ``known_total`` pattern
    (operators/rank.py) extended to every count-then-shape site
    (r14 verdict item 6)."""
    hint = getattr(df, ROWS_HINT_ATTR, None)
    if hint is not None:
        return int(hint)
    return df.count()


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
