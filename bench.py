"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mysql_clickhouse_sync_spark.plans.registry import all_queries
from mysql_clickhouse_sync_spark.session import get_spark

HEADLINE = (
    "cdc_live_orders",        # the reference's semantic core end-to-end
    "cdc_live_agg",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "segment_order_stats",
    "customer_top_orders",
    "events_sessionization",
    "events_daily_type_stats",
    "docs_exact_dedup",
    "docs_top_jaccard_pairs",
    "docs_minhash_candidates",
    "emb_cosine_topk",
)


def throughput_metrics(spark, sf_dir: str) -> dict[str, float]:
    """Directly comparable to BASELINE.md: the reference estimates
    ~50k-200k rows/sec snapshot copy and ~1k-5k events/sec CDC apply
    (insert-per-event).  Ours: declarative scan->sort->write for the
    snapshot path; stamp + microbatch append for the CDC path."""
    import shutil
    import tempfile

    from mysql_clickhouse_sync_spark.operators.cdc import stamp_changelog
    from mysql_clickhouse_sync_spark.sources.changelog import (
        derive_orders_changelog,
    )
    from mysql_clickhouse_sync_spark.sources.parquet import load_table

    tmp = tempfile.mkdtemp(prefix="bench_tp_")
    try:
        li = load_table(spark, sf_dir, "lineitem")
        n_rows = li.count()
        t0 = time.time()
        li.sortWithinPartitions("l_orderkey", "l_linenumber").write.mode(
            "overwrite"
        ).parquet(os.path.join(tmp, "lineitem"))
        snap_s = time.time() - t0

        orders = load_table(spark, sf_dir, "orders")
        changes = stamp_changelog(
            derive_orders_changelog(orders), op_col="op", seq_col="seq"
        )
        n_events = changes.count()
        t0 = time.time()
        changes.write.mode("overwrite").parquet(os.path.join(tmp, "cdc"))
        cdc_s = time.time() - t0
        return {
            "snapshot_rows_per_sec": round(n_rows / snap_s),
            "cdc_events_per_sec": round(n_events / cdc_s),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()

    # Warm the JVM / codegen once with a trivial action.
    registry["top_orders"].fn(spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        q = registry[name]
        t0 = time.time()
        n = q.fn(spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    tp = throughput_metrics(spark, sf_dir)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                **tp,
            }
        )
    )


if __name__ == "__main__":
    main()
