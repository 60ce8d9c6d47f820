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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


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


_Z_BITS = 16  # per-dimension resolution: 65536 bins


def morton_code(
    cols: Sequence[tuple[Column, float, float]], bits: int = _Z_BITS
) -> Column:
    """Z-order (Morton) key: interleave the bits of each dimension's
    ``width_bucket`` bin so rows close in EVERY dimension get close
    keys.  ``cols`` is ``(column, lo, hi)`` per dimension — bounds come
    from one cheap global min/max agg (or table stats) driver-side.

    Pure JVM bit arithmetic (shiftleft/and/or under whole-stage
    codegen): no UDF, no shuffle of its own.  A single-column sort key
    clusters only its leading dimension (the MergeTree ORDER BY
    limitation, ``/root/reference/src/schema_converter.py:77``); the
    morton key gives every interleaved dimension narrow per-file
    min/max envelopes, so parquet row-group stats prune selective
    predicates on ANY of them.
    """
    if not cols:
        raise ValueError("morton_code needs at least one dimension")
    binned = [
        # width_bucket -> [1, 2^bits]; clamp + shift to [0, 2^bits - 1]
        (
            F.least(
                F.greatest(
                    F.width_bucket(
                        c.cast("double"), F.lit(lo), F.lit(hi), F.lit(2**bits)
                    ),
                    F.lit(1),
                ),
                F.lit(2**bits),
            )
            - F.lit(1)
        ).cast("long")
        for c, lo, hi in cols
    ]
    ndim = len(cols)
    z = F.lit(0).cast("long")
    for d, b in enumerate(binned):
        for i in range(bits):
            bit = F.shiftright(b, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * ndim + d))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: Sequence[str],
    mode: str = "overwrite",
    n_files: int | None = None,
) -> None:
    """Write parquet globally range-clustered on the Morton key of
    ``zorder_cols`` (the OPTIMIZE ... ZORDER BY maintenance operation,
    as a plain write).  ``repartitionByRange`` samples the key, so
    files tile disjoint z-ranges; each file's min/max envelope is then
    narrow in every z-dimension and selective filters on any of them
    skip most files/row groups (verified quantitatively in
    tests/test_layout.py).
    """
    bounds = df.agg(
        *[
            f
            for c in zorder_cols
            for f in (
                F.min(F.col(c).cast("double")).alias(f"_lo_{c}"),
                F.max(F.col(c).cast("double")).alias(f"_hi_{c}"),
            )
        ]
    ).first()
    z = morton_code(
        [
            (F.col(c), bounds[f"_lo_{c}"], bounds[f"_hi_{c}"])
            for c in zorder_cols
        ]
    )
    out = df.withColumn("_z", z)
    if n_files is None:
        n_files = int(
            out.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
    out = out.repartitionByRange(n_files, "_z")
    (
        out.sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )
