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
    "q10_returned_items",
    "q18_large_volume_customers",
    "q2_min_cost_supplier",
    "customer_order_momentum",
    "segment_order_stats",
    "customer_top_orders",
    "sql_region_revenue",
    "events_sessionization",
    "events_daily_type_stats",
    "events_last_purchase_asof",
    "events_theta_user_overlap",
    "events_funnel",
    "events_props_profile",
    "events_daily_anomaly_zscore",
    "customer_rfm_segments",
    "lineitem_grouping_sets",
    "orders_in_promo_windows",
    "docs_exact_dedup",
    "docs_top_jaccard_pairs_capped",
    "docs_minhash_candidates",
    "docs_subword_tokens",
    "emb_cosine_topk",
    "emb_cosine_topk_vectorized",
    "emb_ivf_topk",
    "media_decode_features",
)

# Comparability ledger (round-3 advice: annotate the headline total
# wherever round totals are compared, instead of silently changing the
# mix).  The HEADLINE tuple keeps the same names across rounds; when a
# named query's SEMANTICS change, the change and its expected cost
# impact are recorded here and emitted in the JSON output.
HEADLINE_SEMANTICS_CHANGES = {
    "round_3": (
        "docs_top_jaccard_pairs -> docs_top_jaccard_pairs_capped "
        "(scale-guarded variant, ~2s faster) — the r3 headline total "
        "is therefore NOT mix-identical to r2; see PERFORMANCE.md"
    ),
    "round_4": (
        "docs_minhash_candidates / emb_ivf_topk / "
        "emb_cosine_topk_vectorized (and extended emb_quantized_topk, "
        "emb_pq_topk) now run in-query self-check contracts so the "
        "driver can hash-verify them: minhash adds an exact "
        "capped-Jaccard twin (~+6s), IVF doubles nprobe 4->8 to meet "
        "the recall>=0.8 contract and adds a vectorized exact twin "
        "(~+2s), vectorized top-k adds fold re-scoring of winners "
        "(~+0.1s).  The added seconds buy hash-verified correctness, "
        "not engine slowdown; like-for-like totals are derivable from "
        "the per-query timings"
    ),
}

# Queries whose r3 timings moved >20% with no in-path code change
# (suspected host jitter): measure best-of-3 instead of best-of-2.
_EXTRA_REPEATS = {"emb_ivf_topk": 3, "emb_cosine_topk": 3}

# Post-round-2 additions, timed separately so the headline total
# stays comparable across rounds (r3: corpus family + PQ + semantic
# dedup; r4: incremental band-index dedup + resize stage).
EXTENDED = (
    "docs_dedup_incremental",
    "media_resized_images",
    "corpus_pii_scrub",
    "corpus_doc_chunks",
    "corpus_lm_quality",
    "corpus_contamination",
    "corpus_pack_assignments",
    "corpus_pack_incremental",
    "corpus_curation_v2",
    "emb_semantic_dedup",
    "emb_pq_topk",
    "emb_quantized_topk",
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

    # Warm the JVM / codegen once with a trivial action, and the
    # Python worker fleet (reused across queries) with a no-op
    # mapInPandas so Arrow-UDF timings measure the operator, not
    # interpreter startup.
    registry["top_orders"].fn(spark, sf_dir).collect()
    spark.range(0, 1024, 1, 32).mapInPandas(
        lambda it: it, "id long"
    ).count()

    # Best-of-2 per query: the container host is shared, and single
    # runs show up to 5x transient jitter; the min reflects the actual
    # plan cost.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        q = registry[name]
        best, n = float("inf"), 0
        for _ in range(_EXTRA_REPEATS.get(name, 2)):
            t0 = time.time()
            n = q.fn(spark, sf_dir).count()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    ext: dict[str, float] = {}
    for name in EXTENDED:
        q = registry[name]
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            q.fn(spark, sf_dir).count()
            best = min(best, time.time() - t0)
        ext[name] = round(best, 3)
        print(f"# {name}: {ext[name]}s (extended)", file=sys.stderr)
    tp = throughput_metrics(spark, sf_dir)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "extended_queries": ext,
                "extended_total": round(sum(ext.values()), 3),
                "headline_semantics_changes": HEADLINE_SEMANTICS_CHANGES,
                **tp,
            }
        )
    )


if __name__ == "__main__":
    main()
