"""Registry-wide invariants: every query analyzes against the harness
tables, column names are sane for the driver's sorted-by-name compare,
and every oracle has a matching query (the `__spark_entry__` contract).
"""

from __future__ import annotations

import pytest

from mysql_clickhouse_sync_spark.plans.registry import all_queries

from conftest import SF_DIR


def test_oracle_keys_subset_of_queries():
    qs = all_queries()
    oracles = {n for n, q in qs.items() if q.oracle is not None}
    assert oracles <= set(qs)


def test_every_query_has_description():
    for name, q in all_queries().items():
        assert q.description, f"{name} missing description"


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_query_analyzes_with_unique_columns(spark, name):
    """Analysis (schema resolution) catches unresolved columns, bad
    casts, and ambiguous self-join references without running a job.
    Duplicate output names would break the driver's column-sorted
    value-hash compare, so they are a hard error here."""
    df = all_queries()[name].fn(spark, SF_DIR)
    cols = df.columns
    assert cols, f"{name} produced no columns"
    assert len(cols) == len(set(cols)), f"{name} duplicate columns: {cols}"


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_no_decimal_output_columns(spark, name):
    """Decimal outputs hash-mismatch in the driver's compare when a
    value has a trailing zero at its scale (``Decimal('77782.00')``
    str-renders differently from the float ``77782.0``).  Policy:
    aggregate exactly in DECIMAL, but render every final column as
    DOUBLE/BIGINT — never DecimalType — on both the Spark and the
    oracle side.  This lint makes the round-1 failure unrepresentable."""
    from pyspark.sql.types import DecimalType

    schema = all_queries()[name].fn(spark, SF_DIR).schema
    bad = [f.name for f in schema.fields if isinstance(f.dataType, DecimalType)]
    assert not bad, (
        f"{name} outputs DecimalType columns {bad}; cast the final "
        f"projection to double (keep DECIMAL only inside the aggregation)"
    )


@pytest.mark.parametrize(
    "name",
    ["q6_forecast_revenue", "q13_order_count_distribution",
     "cheapest_supplier_per_part", "events_sliding_windows"],
)
def test_new_queries_return_rows(spark, name):
    assert all_queries()[name].fn(spark, SF_DIR).count() > 0


def test_driver_window_is_first_50_and_covers_llm_surface():
    """The external driver grades exactly the first 50 registry
    entries; the curated DRIVER_WINDOW must stay size 50, lead the
    iteration order, and contain the whole LLM-pipeline surface plus
    the CDC sentinels (round-2 verdict item 1)."""
    from mysql_clickhouse_sync_spark.plans.registry import DRIVER_WINDOW

    qs = all_queries()
    names = list(qs)
    assert len(DRIVER_WINDOW) == 50
    assert names[:50] == list(DRIVER_WINDOW)
    window = set(DRIVER_WINDOW)
    required = {
        "cdc_live_orders",
        # r12: cdc_streaming_live (green r5-r11) cedes its slot to the
        # initial-sync crash row, which runs the IDENTICAL
        # construction (run_initial_sync_then_stream + drain + live
        # view vs the same oracle) plus two injected crashes — the
        # no-crash path executes inside it as attempt 3
        "cdc_initial_sync_crash_recovery",
        # r13 recency refresh completes (r12 verdict item 1): the last
        # five r3-green rows rotate in, evicting same-family rows with
        # the freshest/deepest green history — docs_top_words +
        # order_priority_overlap_all (the r12 recency slots, purpose
        # served), docs_curation_pipeline (r4-r12, deepest run; its
        # quality gate stays graded inside corpus_curation_v2),
        # docs_top_jaccard_pairs_capped (stays a bench HEADLINE row),
        # docs_domain_mixture (sampling keeps docs_weighted_sample);
        # ledger: PARITY.md "Round 13 deltas"
        "docs_subword_tokens",
        "docs_lang_source_profile",
        "docs_tfidf_top_terms",
        "docs_weighted_sample",
        "doc_sources_except_all",
        # round-5 rotation: SCD-2 history, repetition filter, domain
        # mixture, quantile sketch enter the round they were added
        # (cdc_scd2_history entered r5, rotated out r10 for
        # cdc_mux_schema_drop — stays hash-checked every round)
        # (docs_repetition_stats entered r5, rotated out r12 for the
        # docs_top_words recency refresh — stays hash-checked)
        # r12 recency refresh (r11 verdict item 5): the longest-out
        # rows rotated back IN for a round — docs_top_words +
        # sql_region_revenue (out since r4), events_funnel (r6),
        # q1_pricing_summary (late r6), order_priority_overlap_all
        # (set-ops family, out since r4); r13 keeps the three whose
        # family slot wasn't reclaimed by this round's refresh
        "sql_region_revenue",
        "events_funnel",
        "q1_pricing_summary",
        # r12 enter-on-add: semantic-store compaction parity (the
        # third stored-index family; full recursive-CTE hash oracle)
        "emb_semantic_compacted_dedup",
        # round-4 rotation: the corpus-prep family is driver-graded
        "corpus_pii_scrub",
        "corpus_contamination",
        "corpus_pack_incremental", "corpus_curation_v2",
        "docs_leakage_safe_splits",
        # round-6 rotation: the real-codec decode path and append-mode
        # watermarked streaming enter on add; 6 of the 12
        # never-driver-graded oracled queries rotate in (r5 verdict
        # item 3 — the other 6 follow in round 7)
        "events_streaming_append",
        "events_streaming_dedup",
        "cdc_reconciliation",
        # (lineitem_cube_stats entered r6, rotated out r12 for the
        # q1_pricing_summary recency refresh — cube/Expand shape
        # stays hash-checked every round)
        "customer_order_gaps",
        # late-r6: the final 6 never-driver-graded oracled queries
        # land a round early — after this round only the 3
        # machine-checked *_raw variants lack a driver-graded round
        "events_value_percentiles",
        "orders_in_promo_windows",
        # round-7 rotation: the persisted incremental embedding index
        # rows enter on add (the embedding twins of the minhash
        # daily-batch path), plus the stream-stream interval join
        # graded across two checkpointed drains (events_type_pivot,
        # green r6, cedes its slot and stays gate-checked)
        # (emb_dedup_incremental entered r7, rotated out r11 for
        # emb_pq_compacted_search — its dedup-vs-stored-index core is
        # graded more strongly by emb_dedup_append_chain)
        # and the second real codec path (stdlib-zlib PNG);
        # orders_value_histogram (green r6) cedes its slot
        # (media_decode_png entered r7, rotated out r10 for
        # media_audio_alaw — stays bench-timed + hash-checked)
        # r10: G.711 A-law — the second companding law completed
        "media_audio_alaw",
        # r10: STEREO IMA ADPCM (two independent state machines under
        # the IMA interleave, one recursive-CTE oracle replaying both
        # + the mean downmix); media_audio_stats (green r7-r9) cedes
        # its slot — the WAV container walk stays driver-graded inside
        # all three compressed-audio rows, the PCM sample branch +
        # downmix stay unit-pinned in tests/test_codecs.py
        "media_audio_adpcm_stereo",
        # and the third: real AVI container demux composed with
        # per-frame pixel decode; events_hourly_gapfill (green r6)
        # cedes its slot (media_video_frames itself rotated out in r9
        # — both its seams stay graded, see the r9 block below)
        # and the third real image codec (baseline JPEG — the
        # lossy-transform class, graded via the bit-exact q100
        # per-block-constant mosaic contract); media_decode_real
        # (green r6) cedes its slot: the BMP pixel-decode path stays
        # driver-graded inside media_video_frames and hash-checked
        # off-window
        "media_decode_jpeg",
        # and the left-outer stream-stream interval join (eviction-
        # driven NULL-match emission, sentinel-flushed to an exact
        # batch LEFT-join oracle); customer_rfm_segments (green
        # r1-r6, the window's longest-green row) cedes its slot and
        # stays hash-checked by check_oracle/ci_gate every round
        "events_streaming_interval_join_outer",
        # round-8 rotation (enter-on-add; ledger: PARITY.md "Round 8
        # deltas"): the stored-index APPEND lifecycle rows (IVF, PQ,
        # semantic — r7 verdict items 1+3), streaming session windows
        # (item 6) and the multi-table mux dispatch loop (item 7);
        # ceded slots: emb_cosine_topk, emb_ivf_topk, emb_pq_topk,
        # events_streaming_hourly, cdc_compacted_state (all
        # longest-green, all hash-checked off-window every round)
        "emb_index_append_search", "emb_pq_vs_index",
        "emb_dedup_append_chain", "events_streaming_sessions",
        "cdc_multi_table_mux",
        # and the fourth real image codec / compression class
        # (palette-indexed LZW); events_retention_cohorts (green
        # r1-r7) cedes its slot and stays hash-checked every round
        "media_decode_gif",
        # r10: PQ lifecycle parity — pq_code_stats drift monitor +
        # rebuild-and-swap + post-rebuild recall-audited ADC search;
        # emb_index_drift_stats (green r8-r9) cedes its slot — the
        # ivf_cell_stats monitor stays driver-graded as the trigger
        # inside emb_index_rebuild_swap
        "emb_pq_rebuild_swap",
        # and motion-JPEG (container seam x lossy-transform codec);
        # docs_bpe_first_merges (green r5-r7) cedes its slot
        "media_video_mjpeg",
        # and mid-stream additive schema evolution on the mux runtime
        # (the beyond-reference C10 path hash-proved end-to-end);
        # events_value_quantiles (green r5-r7) cedes its slot — the
        # sketch family keeps events_value_percentiles graded
        "cdc_mux_schema_evolution",
        # and the stream-static enrichment join (the remaining
        # ungraded Structured Streaming join shape);
        # corpus_doc_chunks (green r4-r7) cedes its slot
        "events_streaming_enriched",
        # and progressive (SOF2) JPEG — the r6/r7 top documented
        # codec gap closed; corpus_lm_quality (green r4-r7) cedes
        # its slot (the quality gate stays driver-graded inside
        # corpus_curation_v2 + docs_curation_pipeline)
        "media_decode_jpeg_prog",
        # round-9 rotation (enter-on-add; ledger: PARITY.md "Round 9
        # deltas"): the stored-index MAINTENANCE rows — rebuild-and-
        # swap (drift trigger -> retrain -> atomic rename-before-
        # delete swap -> equality to fresh build) and compaction
        # (append waves -> bin-pack -> search equality), plus the
        # first non-PCM audio codec (G.711 mu-law).  Ceded slots:
        # emb_topk_vs_index (read half graded more strongly by the
        # compacted/append rows), corpus_pack_assignments
        # (pack_documents stays graded inside corpus_pack_incremental),
        # q2_min_cost_supplier (green r1-r8, longest-green)
        # (media_audio_ulaw entered r9, rotated out r12 for the
        # set-ops recency slot — G.711 stays driver-graded via
        # media_audio_alaw, the same registry WAV walk)
        "emb_index_rebuild_swap", "emb_index_compacted_search",
        # r9: the full-outer interval join completes the stream-stream
        # family (the inner row cedes its slot — its match set is
        # graded identically inside the full row via the one shared
        # implementation) and crash-restart recovery lands on the mux
        # runtime (docs_top_jaccard_pairs cedes its slot — the same
        # Jaccard operator stays graded via the capped twin)
        "events_streaming_interval_join_full", "cdc_mux_restart_recovery",
        # r9: interframe video (Microsoft RLE8 delta frames — the
        # demuxer carries pixel state across frames); the
        # media_video_frames slot cedes — its raw-DIB demux walk stays
        # graded inside media_video_mjpeg and its registry BMP decode
        # inside media_video_rle_delta's sampled-frame path
        "media_video_rle_delta",
        # r9: the first STATEFUL audio decode (IMA ADPCM — recursive-
        # CTE-replayed state machine); docs_minhash_candidates cedes
        # its slot (banding stays graded inside docs_dedup_incremental,
        # the production stage stays a bench headline via the raw twin)
        "media_audio_adpcm",
        # r10: the DLQ re-drive composed ON the streaming runtime
        # (the DLQ sink feeds a second checkpointed stream running
        # redrive_quarantine per microbatch);
        # orders_streaming_ingest_quarantine (green r9) cedes its
        # slot — the identical split-on-runtime path runs inside BOTH
        # remaining streaming ingest rows via the shared scenario
        # builder, and the row stays hash-checked every round
        "orders_streaming_ingest_redrive",
        # r10: the DLQ RE-DRIVE (r9 verdict item 1 — quarantine under
        # the strict rule, re-parse ONLY the stored raw lines under
        # the parser fix, merge, hash-match the uncorrupted feed);
        # orders_csv_ingest_quarantine (green r9) cedes its slot —
        # the identical split operator stays driver-graded inside
        # this row AND the streaming quarantine row
        # (orders_ingest_redrive entered r10, rotated out r11 for
        # orders_ingest_redrive_gen2 — its gen-0 split + gen-1 fix
        # path executes as stages 1-2 of the gen2 row)
        "orders_ingest_redrive_gen2",
        # r10: the health monitor ON the streaming runtime
        # (observe()-ledgered per-microbatch counts summed across
        # drains); orders_ingest_health (green r9) cedes its slot —
        # the same quarantine_stats/health_shares semantics graded
        # more strongly here, batch monitor hash-checked every round
        # (orders_streaming_ingest_health entered r10, rotated out
        # r11 for the crash-replay row, whose replay_exact guard
        # verifies the same ledger machinery)
        # r11: ingest crash-replay with idempotent sinks — the r10
        # verdict's top structural gap closed and graded (injected
        # mid-fan-out kill + supervised restart, replayed batch must
        # overwrite, not double-append)
        "orders_streaming_ingest_crash_replay",
        # r10: column DROP + RENAME evolution on the mux runtime
        # (projection-compatible drop, rename as drop+add, PK drops
        # refused); cdc_scd2_history (green r5-r9, the CDC family's
        # longest-green row) cedes its slot and stays hash-checked
        # every round
        "cdc_mux_schema_drop",
        # r11: PQ codes-dir compaction (the last stored-index
        # maintenance asymmetry; the gen2 re-drive entry is pinned
        # above where it replaced orders_ingest_redrive)
        "emb_pq_compacted_search",
    }
    assert required <= window, sorted(required - window)
    # every docs_/emb_/media_/sql_ query is in the graded window,
    # except rows rotated out with at least one driver-green round on
    # record (full ledger: PARITY.md "Driver-window rotation ledger")
    rotated_out = {
        # (docs_top_jaccard_pairs and docs_char_bigram_profile, rotated
        # out in earlier rounds, re-entered the window late in r6)
        # (docs_top_words and sql_region_revenue, rotated out in r4,
        # re-entered the window in the r12 recency refresh)
        "docs_subword_tokens",       # r4: green r3; slot to corpus family
        "docs_weighted_sample",      # r4: green r3; slot to corpus family
        "doc_sources_except_all",    # r4: green r3; slot to corpus family
        "docs_lang_source_profile",  # r4: green r3; slot to new r4 queries
        "docs_tfidf_top_terms",      # r4: green r3; slot to new r4 queries
        "docs_token_stats",          # r5: green r1-r4; slot to r5 queries
        "docs_quality_score",        # r5: green r1-r4; slot to r5 queries
        "emb_label_near_pairs",      # r5: green r2-r4; slot to r5 queries
        "media_exact_dedup",         # r5: green r2-r4; slot to r5 queries
        # mid-r5 swap: BPE first-merge candidates enter on add;
        # language-ID rotates out (green r1-r4, and its gate is still
        # driver-graded inside docs_curation_pipeline + corpus_curation_v2)
        "docs_language_id",
        # r5 bench-only raw production variants: the contract-bearing
        # twins (docs_minhash_candidates, docs_dedup_incremental) are
        # driver-graded and exercise the identical operators; these
        # exist so the bench headline times engine work, not the
        # in-query exact-Jaccard audits (round-4 verdict item 3)
        "docs_minhash_candidates_raw",
        "docs_dedup_incremental_raw",
        "emb_ivf_topk_raw",
        # r8 bench-only raw variant: the daily-ingest grow stage of
        # emb_dedup_incremental against a session-persisted stored
        # index; prefix equality machine-checked in
        # tests/test_similarity.py
        "emb_dedup_incremental_raw",
        # r9 bench-only raw variants: the decode-only cost of
        # media_video_mjpeg (pre-materialized fixtures; relation
        # equality machine-checked in tests/test_multimodal.py) and
        # the day-2 ingest cost of emb_dedup_append_chain against a
        # session-persisted grown chain (prefix equality
        # machine-checked in tests/test_similarity.py)
        "media_video_mjpeg_raw",
        "emb_dedup_append_chain_raw",
        # r10 bench-only raw variant: the maintenance-only cost of
        # emb_index_compacted_search (plan + execute compaction + one
        # pruned search against a session-persisted degraded dir;
        # search equality machine-checked in tests/test_similarity.py)
        "emb_index_compacted_search_raw",
        # r6: longest-green rows ceding slots to media_decode_real,
        # events_streaming_append and the 6 never-driver-graded
        # analytics rows (ledger: PARITY.md).  All stay hash-checked
        # by check_oracle/ci_gate every round; simhash recall floor
        # stays pinned in tests/test_simhash_recall.py; connected
        # components stay driver-graded inside emb_semantic_dedup.
        "docs_fingerprints",
        "docs_simhash_pairs",
        "docs_dup_clusters",
        "emb_near_dup_keeper",
        "emb_quantized_topk",
        # late-r6: slots ceded to the final never-driver-graded six;
        # all three stay hash-checked every round by check_oracle/
        # ci_gate (lsh/vectorized keep their in-query contracts there)
        "emb_lsh_pairs",
        "emb_cosine_topk_vectorized",
        "media_frame_sample",
        # late-r6: slot ceded to cdc_streaming_upsert; decode path now
        # more strongly graded by media_decode_real
        "media_decode_features",
        # r7: slot ceded to media_audio_stats (second modality); the
        # resize path stays bench-timed + hash-checked every round
        "media_resized_images",
        # r7 (quiet-window, enter-on-add only): slot ceded to the
        # incremental embedding-index rows (emb_topk_vs_index,
        # emb_dedup_incremental); green r5-r6, cross-doc chunk spans
        # stay hash-checked by check_oracle/ci_gate every round
        "docs_duplicate_chunks",
        # r7: slot ceded to media_decode_jpeg (third real image codec,
        # lossy-transform class); green r6, and the BMP pixel-decode
        # path it graded stays driver-graded inside media_video_frames
        # (every sampled AVI frame decodes through the same BMP
        # registry codec) + hash-checked off-window every round
        "media_decode_real",
        # r8: slots ceded to the stored-index append-lifecycle rows.
        # emb_cosine_topk (green r1-r7) stays the exact twin inside
        # every recall audit + a bench headline; emb_ivf_topk /
        # emb_pq_topk (green r2/r4-r7) have their search cores graded
        # MORE strongly by the vs-index+append rows; all three stay
        # hash-checked by check_oracle/ci_gate every round
        "emb_cosine_topk",
        "emb_ivf_topk",
        "emb_pq_topk",
        # r8: slot ceded to emb_index_drift_stats; the exact-dedup
        # keeper stays driver-graded inside docs_curation_pipeline's
        # dedup stage and hash-checked off-window every round
        "docs_exact_dedup",
        # r8: slot ceded to media_video_mjpeg; tokenizer-support shape
        # stays hash-checked off-window every round
        "docs_bpe_first_merges",
        # r9: slot ceded to the stored-index maintenance rows; the
        # read-half search it graded is graded MORE strongly by
        # emb_index_compacted_search + emb_index_append_search (the
        # same stored-index search, against REAL partitioned parquet)
        # and stays hash-checked by check_oracle/ci_gate every round
        "emb_topk_vs_index",
        # r9: slot ceded to cdc_mux_restart_recovery; the SAME n-gram
        # Jaccard operator stays graded via the capped twin
        # (docs_top_jaccard_pairs_capped) and the uncapped row stays
        # hash-checked by check_oracle/ci_gate every round
        "docs_top_jaccard_pairs",
        # r9: slot ceded to media_video_rle_delta (interframe RLE8);
        # the raw-DIB demux walk + cadence stay graded inside
        # media_video_mjpeg and the registry BMP per-frame decode
        # inside media_video_rle_delta itself; hash-checked every round
        "media_video_frames",
        # r9: slot ceded to media_audio_adpcm; MinHash+LSH banding
        # stays driver-graded inside docs_dedup_incremental (the same
        # band-index operators, daily-batch shaped), the production
        # stage stays a bench headline via docs_minhash_candidates_raw,
        # and the row stays hash-checked every round
        "docs_minhash_candidates",
        # r9: slot ceded to orders_streaming_ingest_quarantine; the
        # character-distribution profile stays hash-checked by
        # check_oracle/ci_gate every round
        "docs_char_bigram_profile",
        # r10: slot ceded to events_skew_salted_stats (both skew
        # mitigations driven on the graded surface); the sampling
        # family keeps docs_domain_mixture driver-graded (the same
        # operators/sampling.py surface) and the stratified row stays
        # hash-checked by check_oracle/ci_gate every round
        "docs_stratified_sample",
        # r10: slot ceded to emb_pq_rebuild_swap; the ivf_cell_stats
        # drift monitor stays DRIVER-GRADED as the rebuild trigger
        # inside emb_index_rebuild_swap (same monitor over the same
        # stored-then-appended shape) and the standalone row stays
        # hash-checked by check_oracle/ci_gate every round
        "emb_index_drift_stats",
        # r10: slot ceded to media_audio_adpcm_stereo; the WAV
        # container walk stays DRIVER-GRADED inside media_audio_ulaw
        # + both ADPCM rows (all share decode_wav), the PCM sample
        # branch + multi-channel mean downmix stay unit-pinned in
        # tests/test_codecs.py, and the row stays hash-checked by
        # check_oracle/ci_gate every round
        "media_audio_stats",
        # r10: slot ceded to media_audio_alaw (G.711 completed); the
        # filter+DEFLATE class stays bench-timed + hash-checked every
        # round, and the image-codec family keeps JPEG, progressive
        # JPEG, GIF, and the in-video BMP path graded
        "media_decode_png",
        # r11 bench-only raw variants: the maintenance-only cost of
        # the two rebuild-swap rows (one retrain instead of the
        # graded rows' train + equality-audit train; equality to the
        # graded relations machine-checked in tests/test_similarity.py)
        "emb_index_rebuild_swap_raw",
        "emb_pq_rebuild_swap_raw",
        # r11: slot ceded to emb_pq_compacted_search (PQ codes-dir
        # compaction, the last stored-index maintenance asymmetry);
        # the dedup-batch-vs-stored-index core stays DRIVER-GRADED
        # inside emb_dedup_append_chain (build -> append -> dedup
        # against the grown persisted chain) and the row stays
        # hash-checked by check_oracle/ci_gate every round
        "emb_dedup_incremental",
        # r12: slot ceded to emb_semantic_compacted_dedup (enter-on-
        # add); the from-scratch two-level assignment + pair kernel +
        # connected components run IDENTICALLY inside the chain and
        # compaction rows (same operators under a stored quantizer),
        # and the row stays hash-checked every round
        "emb_semantic_dedup",
        # r12 recency refresh evictions (r11 verdict item 5; ledger:
        # PARITY.md "Round 12 deltas") — each was its family's
        # FRESHEST-evidence row, evicted so the family's longest-out
        # row could re-enter; all stay hash-checked every round:
        # G.711 stays driver-graded via media_audio_alaw
        "media_audio_ulaw",
        # Gopher repetition filter, green r5-r11; stays bench-timed
        "docs_repetition_stats",
        # live-view SQL registration, green r1-r11; the sql_ surface
        # keeps sql_region_revenue driver-graded
        "sql_live_segment_stats",
        # r13 recency-refresh evictions (r12 verdict item 1; ledger:
        # PARITY.md "Round 13 deltas") — the last five r3-green rows
        # re-enter, evicting same-family rows with the freshest or
        # deepest green history; all stay hash-checked every round:
        # the r12 recency slot, refresh purpose served (green r12)
        "docs_top_words",
        # green r4-r12 continuously, the window's deepest evidence
        # run; the quality gate stays graded inside corpus_curation_v2
        "docs_curation_pipeline",
        # green r9-r12; stays a bench HEADLINE row timed every round
        "docs_top_jaccard_pairs_capped",
        # green r5-r12; sampling keeps docs_weighted_sample graded
        "docs_domain_mixture",
    }
    surface = {
        n for n in qs
        if n.startswith(("docs_", "emb_", "media_", "sql_", "doc_"))
        and n not in rotated_out
    }
    assert surface <= window, sorted(surface - window)
