"""Reproduce the canary warm-up curve behind bench.py's r13
normalization re-anchor (`_CANARY_HEADLINE_REF_SEC`).

Runs the bench warmup (same as bench.py: one query collect, a no-op
mapInPandas to start the Python worker fleet, one full-scan count per
harness table), then times N consecutive executions of the canary
query.  On a quiet host the curve declines from ~1.6 s to a plateau
of ~1.05-1.10 s and STAYS there — the 0.64-0.80 s level every
session's END probe reads is unreachable by repeating the canary;
only minutes of cumulative diverse query work (JVM-wide JIT /
shuffle / codegen infrastructure warm-up) gets there.  That is why
the published `norm` anchors the headline loop at its own session
position's clean-host level (~1.0) rather than the late-session
0.70: the early-session elevation is the JVM, not the host.

Usage: python tools/canary_curve.py [sf_dir] [n_runs]
Prints one line per run plus a summary JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from mysql_clickhouse_sync_spark.plans.registry import all_queries
from mysql_clickhouse_sync_spark.session import get_spark
from mysql_clickhouse_sync_spark.sources.parquet import load_table

_CANARY = "sql_region_revenue"
_TABLES = ("lineitem", "orders", "customer", "part", "supplier",
           "events", "documents", "embeddings")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 18
    spark = get_spark("canary_curve")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    # identical warmup to bench.py's session prologue
    registry["top_orders"].fn(spark, sf_dir).collect()
    spark.range(0, 1024, 1, 32).mapInPandas(
        lambda it: it, "id long"
    ).count()
    for t in _TABLES:
        load_table(spark, sf_dir, t).count()
    q = registry[_CANARY]
    times = []
    for i in range(n_runs):
        t0 = time.time()
        q.fn(spark, sf_dir).count()
        times.append(round(time.time() - t0, 3))
        print(f"# run {i}: {times[-1]}s", file=sys.stderr)
    tail = times[-5:]
    print(json.dumps({
        "metric": "canary_curve",
        "query": _CANARY,
        "sf_dir": sf_dir,
        "runs": times,
        "first": times[0],
        "plateau_last5_mean": round(sum(tail) / len(tail), 3),
    }))


if __name__ == "__main__":
    main()
