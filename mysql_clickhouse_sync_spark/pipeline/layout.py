"""Physical table layout: partitioned + clustered parquet writes.

The reference's only layout lever is the MergeTree ``ORDER BY`` sort
key (``/root/reference/src/schema_converter.py:77,119``).  At 100 TB a
Spark table needs two levers:

* **partition columns** (hive-style directories): coarse pruning —
  a date-partitioned events table turns a one-day query into a
  one-directory scan (Catalyst partition pruning, zero data touched
  outside it);
* **sort columns** (``sortWithinPartitions`` before write): fine
  pruning — parquet min/max row-group stats skip pages inside each
  partition, the same role as the MergeTree primary index.

Keep partition cardinality bounded (a date, a tenant bucket — never a
raw id): each partition value is a directory and a metastore entry,
and tiny-file explosion is the classic failure mode.  ``repartition``
on the partition columns before writing gives one file per partition
per shuffle slot instead of one per input task.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] = (),
    mode: str = "overwrite",
) -> None:
    """Write a hash-bucketed catalog table (``bucketBy`` requires
    ``saveAsTable``).  Two tables bucketed on the same keys with the
    same bucket count join WITHOUT an exchange — the shuffle was paid
    once at write time, then amortized over every subsequent join.
    The bucketing metadata lives in the catalog, so Catalyst proves
    co-partitioning statically (verified in tests/test_layout.py).

    This is the Spark analogue of the reference's MergeTree ORDER BY
    clustering taken one step further: layout chosen for the JOIN
    pattern, not just the scan pattern.
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def write_clustered(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str] = (),
    sort_cols: Sequence[str] = (),
    mode: str = "overwrite",
) -> None:
    """Write parquet with directory partitioning + in-file clustering."""
    out = df
    if partition_cols:
        out = out.repartition(*partition_cols)
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    writer = out.write.mode(mode)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)
