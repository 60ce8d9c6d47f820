"""Physical-plan audit: one compact table over the headline queries.

For every bench HEADLINE query (plus the CDC sentinels), summarizes
the executed plan's scale-relevant shape:

* ``scans``      — parquet scans (table re-reads are plan waste);
* ``exchanges``  — shuffles (the unit of cluster cost);
* ``bhj / smj``  — broadcast-hash vs sort-merge joins (a dim join
  planning SMJ is a regression);
* ``sorts``      — full sorts outside TakeOrdered;
* ``topk``       — TakeOrderedAndProject present (global top-k
  without a global sort);
* ``wscg``       — WholeStageCodegen span count (JVM-compiled
  pipeline stages; Python/HOF boundaries break them);
* ``pushed``     — the scan carries PushedFilters/partition pruning.

Writes ``PLANS.md`` and prints one compact JSON line so regressions
in plan shape are diffable round-over-round, not just re-derivable
by hand from .explain() output.

Usage: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import re
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

from mysql_clickhouse_sync_spark.plans.registry import all_queries
from mysql_clickhouse_sync_spark.session import get_spark


def summarize(plan: str) -> dict:
    return {
        "scans": plan.count("Scan parquet"),
        "exchanges": len(re.findall(r"Exchange (?:hash|range|Single)", plan)),
        "single_part": plan.count("Exchange SinglePartition"),
        "bhj": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "sorts": len(re.findall(r"\bSort \[", plan)),
        "topk": int("TakeOrderedAndProject" in plan),
        # WholeStageCodegen spans render as `*(n) Op` in the executed
        # tree string; distinct span ids = compiled pipeline count.
        "wscg": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "pushed": int(
            bool(re.search(r"PushedFilters: \[[^\]]", plan))
        ),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()

    import bench

    names = list(bench.HEADLINE) + [
        n for n in (
            "cdc_compacted_state",
            "cdc_scd2_history",
            # r7 stored-index incremental lifecycle rows: the plans a
            # daily-batch user runs against a persisted index
            "emb_topk_vs_index",
            "emb_dedup_incremental",
            # r8 append-lifecycle rows (write half) + the recorded
            # daily-ingest grow stage
            "emb_index_append_search",
            "emb_pq_vs_index",
            "emb_dedup_append_chain",
            "emb_dedup_incremental_raw",
            "media_decode_png",
            "media_decode_gif",
            "media_decode_jpeg_prog",
            "media_audio_stats",
            "media_video_frames",
            "media_video_mjpeg",
            "emb_index_drift_stats",
            # r9 stored-index maintenance rows + the new codec and
            # decode-only/day-2 twins
            "emb_index_rebuild_swap",
            "emb_index_compacted_search",
            "media_audio_ulaw",
            "media_audio_adpcm",
            "media_video_rle_delta",
            "orders_csv_ingest_quarantine",
            "orders_ingest_health",
            "media_video_mjpeg_raw",
            "emb_dedup_append_chain_raw",
            # r10: the DLQ re-drive, PQ lifecycle parity, stereo
            # ADPCM, and the maintenance-only compaction twin
            "orders_ingest_redrive",
            "emb_pq_rebuild_swap",
            "media_audio_adpcm_stereo",
            "media_audio_alaw",
            "events_skew_salted_stats",
            "emb_index_compacted_search_raw",
            # r11: second-generation re-drive + PQ codes compaction
            # (streaming drains stay excluded as ever — their cost is
            # checkpoint machinery, not plan shape)
            "orders_ingest_redrive_gen2",
            "emb_pq_compacted_search",
            "emb_index_rebuild_swap_raw",
            "emb_pq_rebuild_swap_raw",
            # r12: semantic-store compaction (append-delta write-back
            # + bin-pack over BOTH planner branches + day-2 dedup)
            "emb_semantic_compacted_dedup",
        )
        if n not in bench.HEADLINE
    ]
    rows = {}
    for name in names:
        df = registry[name].fn(spark, sf_dir)
        # Execute THE QUERY'S OWN QueryExecution first (collect, not
        # count — count wraps a new plan and leaves this one an
        # isFinalPlan=false AQE skeleton): the audit must read the
        # runtime-finalized plan, with AQE-chosen join strategies and
        # codegen span markers.  Bounded: sf0.001 result sets.
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        # The finalized AdaptiveSparkPlan prints the final plan AND an
        # "== Initial Plan ==" appendix; summarize the final part only
        # or every count double-counts.
        plan = plan.split("== Initial Plan ==")[0]
        rows[name] = summarize(plan)
        print(f"# {name}: {rows[name]}", file=sys.stderr)

    cols = ("scans", "exchanges", "single_part", "bhj", "smj",
            "sorts", "topk", "wscg", "pushed")
    lines = [
        "# PLANS — physical-plan shapes of the headline queries",
        "",
        "Generated by `python tools/plan_audit.py` (executed plans at "
        f"`{sf_dir}`, AQE final).  Columns: parquet scans / shuffle "
        "exchanges / SinglePartition exchanges (scale-killers — must "
        "be 0 everywhere) / broadcast-hash joins / sort-merge joins / "
        "sorts / TakeOrderedAndProject / distinct WholeStageCodegen "
        "spans / scan carries pushed filters.",
        "",
        "| query | " + " | ".join(cols) + " |",
        "|---|" + "---|" * len(cols),
    ]
    for name in names:
        r = rows[name]
        lines.append(
            f"| {name} | " + " | ".join(str(r[c]) for c in cols) + " |"
        )
    total_sp = sum(r["single_part"] for r in rows.values())
    lines += [
        "",
        f"SinglePartition exchanges across the whole headline set: "
        f"**{total_sp}**.  A SinglePartition over UNBOUNDED input is "
        "the canonical 100 TB scale-killer (the RFM/rank family was "
        "rebuilt in round 3 specifically to eliminate those); the "
        "ones remaining here sit over BOUNDED relations only — "
        "1-row final aggregates and sketch bottom-k stages whose "
        "input the HLL prefilter caps at ~8k rows regardless of "
        "corpus size (operators/sketch.py::theta_build), plus the "
        "ANN recall-audit's corpus-mean aggregate over the "
        "contract-bounded (<= 65k-row) query set "
        "(plans/similarity_queries.py::_ann_recall_audit), and the "
        "drift monitor's window total over <= k cell-count rows "
        "(operators/similarity.py::ivf_cell_stats — bounded by "
        "MAX_CENTROIDS by contract).",
        "",
        "`customer_rfm_segments` shows all zeros because its plan "
        "reads the localCheckpoint'd rank relation; its pre-"
        "checkpoint shape (range partition + zero SinglePartition) "
        "is pinned separately in tests/test_plans.py.  "
        "`emb_dedup_incremental` and `emb_dedup_append_chain` "
        "similarly show 0 scans: their assignment/pair inputs are "
        "localCheckpoint-pinned (the multi-consumer rule "
        "emb_semantic_dedup follows); the pre-checkpoint stages are "
        "the audited semantic-dedup shapes.  "
        "`emb_semantic_compacted_dedup` returns the checkpoint-"
        "pinned post-compaction dedup (the before/after row-equality "
        "audit forces both sides eager), so its row too reads an "
        "in-memory scan; the store-side plans it executes are the "
        "same audited shapes — parquet scans of the partitioned "
        "assignments dir (cell-pruned at the scan) + the "
        "emb_dedup_append_chain pair/components stages.",
        "",
        "Join skew (q18 shape, planted-hot-key tests in "
        "tests/test_skew.py): at harness scale every q18 dim join is "
        "a BHJ, so skew never arises; on a cluster where the customer "
        "dim outgrows broadcast, AQE skew-split handles the plain "
        "shuffle join, but a rollup GROUPED BY THE JOIN KEY consumes "
        "the join's distribution in-stage and is NOT split by default "
        "(pinned by test) — ship either "
        "spark.sql.adaptive.forceOptimizeSkewedJoin=true (pays one "
        "extra aggregate shuffle) or operators/skew.py::salted_join; "
        "both are verified to produce the identical relation.",
    ]
    with open(os.path.join(_ROOT, "PLANS.md"), "w") as fh:
        fh.write("\n".join(lines) + "\n")

    print(
        json.dumps(
            {
                "metric": "plan_audit",
                "queries": len(rows),
                "single_partition_exchanges": total_sp,
                "smj_total": sum(r["smj"] for r in rows.values()),
                "scan_max": max(r["scans"] for r in rows.values()),
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
