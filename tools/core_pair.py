"""8-vs-32-core scaling pair at one SF (r14 verdict item 4: at sf1.0
the scan-heavy rows should finally show a low-core/high-core ratio
materially above 1 — the parallelism evidence sf0.1 cannot produce).

Usage: SPARK_GRAFT_CPUS=8|32 python tools/core_pair.py <sf_dir>
Prints one JSON line {query: best_sec} (best-of-2, same noop-free
count() methodology as tools/scaling.py).
"""
from __future__ import annotations

import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

from mysql_clickhouse_sync_spark.plans.registry import all_queries
from mysql_clickhouse_sync_spark.session import get_spark

# scan/compute-heavy subset: rows whose sf1.0 cost is data mass, not
# fixed overhead (media codec rows are the designated CPU canaries)
PAIR_SWEEP = (
    "q1_pricing_summary",
    "q18_large_volume_customers",
    "cdc_scd2_history",
    "docs_top_jaccard_pairs_capped",
    "docs_minhash_candidates_raw",
    "emb_cosine_topk_vectorized",
    "emb_semantic_dedup",
    "media_decode_jpeg",
    "media_decode_png",
    "media_video_mjpeg_raw",
    "media_video_rle_delta",
    "media_audio_adpcm",
    "events_sessionization",
)


def main() -> None:
    sf_dir = sys.argv[1]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repeats = int(os.environ.get("SPARK_GRAFT_SCALING_REPEATS", "2"))
    spark = get_spark(f"core-pair-{cpus}")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    registry["top_orders"].fn(spark, sf_dir).collect()
    spark.range(0, 1024, 1, cpus).mapInPandas(
        lambda it: it, "id long"
    ).count()
    out: dict[str, float] = {}
    for name in PAIR_SWEEP:
        q = registry[name]
        best = float("inf")
        for _ in range(repeats):
            t0 = time.time()
            q.fn(spark, sf_dir).count()
            best = min(best, time.time() - t0)
        out[name] = round(best, 3)
        print(f"# {name}: {out[name]}s", file=sys.stderr)
    print(json.dumps({"cpus": cpus, "sf_dir": sf_dir, "best": out},
                     separators=(",", ":")))


if __name__ == "__main__":
    main()
