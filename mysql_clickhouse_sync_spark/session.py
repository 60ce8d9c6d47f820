"""SparkSession factory with scale-oriented defaults.

Tuned for the test harness (local[N], 128 GiB) but every setting is the
one you'd also want on a 1000-executor cluster reading 100 TB:

* AQE on (runtime coalescing, skew-join splitting, dynamic join
  strategy switch) so plans self-correct at scale.
* Arrow on for any pandas-UDF path (vectorized Python boundary).
* Broadcast threshold large enough that TPC-H-style dims always
  broadcast instead of shuffling the fact table.
* ``spark.sql.files.maxPartitionBytes`` left at 128 MB default: at
  100 TB that yields ~800k input splits, which Spark schedules fine;
  shuffle partitions are governed by AQE coalescing from an upper
  bound.
* Runtime bloom-filter join pruning
  (``spark.sql.optimizer.runtime.bloomFilter.enabled``, on by
  default) left at default thresholds (10 MB creation side / 10 GB
  application-side scan): exactly the regime of a selective dim
  filter against a 100 TB fact — the fact scan drops non-matching
  keys BEFORE the shuffle.  Triggering is asserted in
  tests/test_plans.py::test_runtime_bloom_filter_prunes_fact_scan
  (with the application threshold scaled to harness data size).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "mysql-clickhouse-sync-spark",
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults."""
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
