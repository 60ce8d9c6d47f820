"""Raw-feed ingestion queries: the dead-letter quarantine surface.

The reference's source (MySQL) enforces types server-side; a raw
text feed does not — these rows grade the parse/validate/quarantine
split (``sources/ingest.py``) end to end against a closed-form
corruption rule DuckDB replays exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .registry import register


@register(
    "orders_csv_ingest_quarantine",
    oracle="""
    SELECT o_orderpriority AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
               AS sum_price
    FROM orders WHERE o_orderkey % 13 NOT IN (3, 7)
    GROUP BY o_orderpriority
    UNION ALL
    SELECT 'quarantine:malformed', CAST(count(*) AS BIGINT),
           CAST(NULL AS DOUBLE)
    FROM orders WHERE o_orderkey % 13 = 3
    UNION ALL
    SELECT 'quarantine:invalid_price', CAST(count(*) AS BIGINT),
           CAST(NULL AS DOUBLE)
    FROM orders WHERE o_orderkey % 13 = 7
    """,
    description="DEAD-LETTER CSV INGESTION, end to end: orders rows "
    "are serialized to raw CSV lines with a closed-form corruption "
    "rule — every o_orderkey % 13 = 3 line carries an unparseable "
    "price ('xx': PERMISSIVE from_csv nulls the field and fills the "
    "corrupt-record column) and every % 13 = 7 line carries a "
    "NEGATIVE price (parses fine, fails the semantic validator) — "
    "then parse_csv_with_quarantine splits the feed: valid rows "
    "aggregate per priority (exact DECIMAL sums; the double -> "
    "string -> double CSV round trip is exact because Spark renders "
    "shortest-roundtrip representations), quarantined rows count "
    "under their deterministic reason with the RAW line preserved.  "
    "The oracle replays the corruption rule directly against orders, "
    "so a parse split that loses, double-counts, or mis-reasons one "
    "line hash-mismatches.  The operator contract (first-failing "
    "reason, null-never-passes validation, whole-line quarantine) is "
    "unit-pinned in tests/test_ingest.py",
)
def orders_csv_ingest_quarantine(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    valid, quarantine = _split_corrupted_feed(spark, sf_dir)
    good = valid.groupBy(F.col("prio").alias("bucket")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("price").cast("decimal(18,4)"))
        .cast("double")
        .alias("sum_price"),
    )
    dead = quarantine.groupBy(
        F.concat(F.lit("quarantine:"), F.col("reason")).alias("bucket")
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.lit(None).cast("double").alias("sum_price"),
    )
    return good.unionByName(dead)


def _split_corrupted_feed(spark: SparkSession, sf_dir: str):
    """Shared scenario of the ingestion graded rows: orders serialized
    to CSV under the closed-form corruption rule (% 13 = 3 unparseable
    price, % 13 = 7 negative price), split by the production operator.
    ONE copy so the batch row, the health-monitor row and the
    streaming twin cannot drift."""
    from ..sources.ingest import parse_csv_with_quarantine

    orders = load_table(spark, sf_dir, "orders")
    key = F.col("o_orderkey")
    price_txt = F.when(
        key % 13 == 3, F.lit("xx")
    ).when(
        key % 13 == 7, (-F.col("o_totalprice")).cast("string")
    ).otherwise(F.col("o_totalprice").cast("string"))
    lines = orders.select(
        F.concat_ws(
            ",", key.cast("string"), price_txt, F.col("o_orderpriority")
        ).alias("line")
    )
    return parse_csv_with_quarantine(
        lines,
        "line",
        "k LONG, price DOUBLE, prio STRING",
        validators={"invalid_price": F.col("price") >= 0},
    )


@register(
    "orders_ingest_redrive",
    oracle="""
    SELECT o_orderpriority AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
               AS sum_price
    FROM orders WHERE o_orderkey % 13 <> 7
    GROUP BY o_orderpriority
    UNION ALL
    SELECT 'still_dead:invalid_price', CAST(count(*) AS BIGINT),
           CAST(NULL AS DOUBLE)
    FROM orders WHERE o_orderkey % 13 = 7
    """,
    description="DEAD-LETTER RE-DRIVE, end to end — the second half "
    "of the DLQ contract ('never lose a byte' matters because the "
    "bytes can be RECOVERED once the rule catches up): a producer "
    "starts emitting currency-prefixed prices ('USD 12.34') on every "
    "o_orderkey % 13 = 3 line, which the strict schema quarantines as "
    "malformed (plus the % 13 = 7 negative-price lines under the "
    "semantic validator).  The quarantine is WRITTEN to a parquet DLQ "
    "sink and read back — the re-drive consumes the stored raw lines, "
    "not an in-memory copy — then redrive_quarantine applies the "
    "parser fix (strip the prefix) and re-parses ONLY the rejects: "
    "the prefixed lines recover byte-exactly (the merged per-priority "
    "DECIMAL sums equal the UNCORRUPTED feed, so one lost or "
    "mis-recovered price hash-mismatches), while the negative-price "
    "lines fail the unchanged validator again and stay dead under the "
    "same reason — proving re-drive is composable (rejects of this "
    "pass are the next pass's input) and conservation holds end to "
    "end: every byte kept, every recoverable byte recovered.  "
    "Reference analogue: the delete-position-file full resync "
    "(/root/reference/src/cdc_replicator.py:65-79), except only the "
    "rejects replay, not the whole feed",
)
def orders_ingest_redrive(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from ..sources.ingest import (
        parse_csv_with_quarantine,
        redrive_quarantine,
    )

    orders = load_table(spark, sf_dir, "orders")
    key = F.col("o_orderkey")
    # Recoverable corruption: a currency prefix the strict DOUBLE
    # field rejects; the % 13 = 7 negative prices stay genuinely bad.
    price_txt = F.when(
        key % 13 == 3,
        F.concat(F.lit("USD "), F.col("o_totalprice").cast("string")),
    ).when(
        key % 13 == 7, (-F.col("o_totalprice")).cast("string")
    ).otherwise(F.col("o_totalprice").cast("string"))
    lines = orders.select(
        F.concat_ws(
            ",", key.cast("string"), price_txt, F.col("o_orderpriority")
        ).alias("line")
    )
    valid, quarantine = parse_csv_with_quarantine(
        lines,
        "line",
        "k LONG, price DOUBLE, prio STRING",
        validators={"invalid_price": F.col("price") >= 0},
    )
    # The re-drive consumes the DLQ SINK, not the in-flight relation:
    # write the quarantine to real storage and read it back, so the
    # graded path proves the stored raw line round-trips byte-exactly.
    dlq = os.path.join(
        tempfile.gettempdir(),
        f"orders_ingest_redrive_{spark.sparkContext.applicationId}_"
        + os.path.basename(sf_dir.rstrip("/")),
    )
    quarantine.write.mode("overwrite").parquet(dlq)
    recovered, still_dead = redrive_quarantine(
        spark.read.parquet(dlq),
        "k LONG, price DOUBLE, prio STRING",
        validators={"invalid_price": F.col("price") >= 0},
        fix=F.regexp_replace(F.col("raw"), "USD ", ""),
    )
    merged = valid.unionByName(recovered)
    good = merged.groupBy(F.col("prio").alias("bucket")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("price").cast("decimal(18,4)"))
        .cast("double")
        .alias("sum_price"),
    )
    dead = still_dead.groupBy(
        F.concat(F.lit("still_dead:"), F.col("reason")).alias("bucket")
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.lit(None).cast("double").alias("sum_price"),
    )
    return good.unionByName(dead)


@register(
    "orders_ingest_health",
    oracle="""
    WITH c AS (
        SELECT count(*) FILTER (WHERE o_orderkey % 13 = 3) AS n_mal,
               count(*) FILTER (WHERE o_orderkey % 13 = 7) AS n_bad,
               count(*) AS total
        FROM orders
    )
    SELECT 'malformed' AS reason, CAST(n_mal AS BIGINT) AS n,
           n_mal / CAST(total AS DOUBLE) AS share FROM c
    UNION ALL
    SELECT 'invalid_price', CAST(n_bad AS BIGINT),
           n_bad / CAST(total AS DOUBLE) FROM c
    UNION ALL
    SELECT '_ingested', CAST(total - n_mal - n_bad AS BIGINT),
           (total - n_mal - n_bad) / CAST(total AS DOUBLE) FROM c
    """,
    description="THE INGESTION HEALTH MONITOR, driver-graded (the "
    "same upgrade ivf_cell_stats got for the ANN lifecycle): "
    "quarantine_stats over the corrupted-feed split — per-reason "
    "reject counts plus each reason's share of the TOTAL feed "
    "(including the _ingested row, shares summing to 1.0) — is the "
    "relation an alerting rule filters, and the oracle replays the "
    "closed-form corruption rule directly, so a monitor that "
    "under-counts a reason (masking the producer-changed-its-format "
    "failure mode) goes red.  Shares are single double divisions of "
    "exact counts (order-insensitive)",
)
def orders_ingest_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.ingest import quarantine_stats

    valid, quarantine = _split_corrupted_feed(spark, sf_dir)
    return quarantine_stats(valid, quarantine)


@register(
    "orders_streaming_ingest_quarantine",
    oracle="""
    SELECT o_orderpriority AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
               AS sum_price
    FROM orders WHERE o_orderkey % 13 NOT IN (3, 7)
    GROUP BY o_orderpriority
    UNION ALL
    SELECT 'quarantine:malformed', CAST(count(*) AS BIGINT),
           CAST(NULL AS DOUBLE)
    FROM orders WHERE o_orderkey % 13 = 3
    UNION ALL
    SELECT 'quarantine:invalid_price', CAST(count(*) AS BIGINT),
           CAST(NULL AS DOUBLE)
    FROM orders WHERE o_orderkey % 13 = 7
    """,
    description="DEAD-LETTER INGESTION ON THE STREAMING RUNTIME: the "
    "same corrupted CSV feed as orders_csv_ingest_quarantine, but "
    "arriving as a file STREAM drained across TWO checkpointed "
    "availableNow passes (split by o_orderkey parity), with the "
    "parse/validate/quarantine split running INSIDE foreachBatch and "
    "fanning out to TWO append sinks per microbatch — the valid "
    "table and the dead-letter table, the shape every production "
    "ingest loop runs (Kafka -> DLQ).  The graded output aggregates "
    "BOTH sinks after the second drain and hash-matches the same "
    "single-pass oracle as the batch row: a split that loses a line "
    "between sinks, double-applies a batch, or mis-reasons a reject "
    "under restart goes red.  Untimed drain row (correctness "
    "surface), disclosed in tests/test_bench_contract.py",
)
def orders_streaming_ingest_quarantine(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    sink_v, sink_q, _health = _run_streaming_ingest(
        spark, sf_dir, "orders_streaming_ingest"
    )
    good = (
        spark.read.parquet(sink_v)
        .groupBy(F.col("prio").alias("bucket"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col("price").cast("decimal(18,4)"))
            .cast("double")
            .alias("sum_price"),
        )
    )
    dead = (
        spark.read.parquet(sink_q)
        .groupBy(
            F.concat(F.lit("quarantine:"), F.col("reason")).alias(
                "bucket"
            )
        )
        .agg(
            F.count("*").cast("long").alias("n"),
            F.lit(None).cast("double").alias("sum_price"),
        )
    )
    return good.unionByName(dead).localCheckpoint()


def _run_streaming_ingest(
    spark: SparkSession,
    sf_dir: str,
    tag: str,
    recoverable_malformed: bool = False,
) -> tuple[str, str, str]:
    """The shared streaming-ingest scenario: the corrupted orders CSV
    feed arrives as a file stream drained across TWO checkpointed
    availableNow passes (split by o_orderkey parity); foreachBatch
    runs the production split and fans out to the valid and
    dead-letter append sinks, AND appends per-microbatch ``(reason,
    n)`` health counts to a ledger sink — the valid-side count comes
    from an ``Observation`` attached to the valid WRITE itself, so
    the monitor adds zero extra scans over the feed (the quarantine
    side it aggregates is the tiny branch).  Returns ``(valid_sink,
    dlq_sink, health_ledger)`` paths; ONE copy so the quarantine row
    and the health row cannot drift."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import Observation

    from ..sources.ingest import parse_csv_with_quarantine

    orders = load_table(spark, sf_dir, "orders")
    key = F.col("o_orderkey")
    # recoverable_malformed: the % 13 = 3 lines carry a currency
    # prefix a parser FIX can strip (the re-drive scenario) instead
    # of the unrecoverable 'xx' of the plain split rows
    bad_price = (
        F.concat(F.lit("USD "), F.col("o_totalprice").cast("string"))
        if recoverable_malformed
        else F.lit("xx")
    )
    price_txt = F.when(
        key % 13 == 3, bad_price
    ).when(
        key % 13 == 7, (-F.col("o_totalprice")).cast("string")
    ).otherwise(F.col("o_totalprice").cast("string"))
    raw = orders.select(
        key.alias("k"),
        F.concat_ws(
            ",", key.cast("string"), price_txt, F.col("o_orderpriority")
        ).alias("line"),
    )
    base = os.path.join(
        tempfile.gettempdir(),
        f"{tag}_{spark.sparkContext.applicationId}_"
        + os.path.basename(sf_dir.rstrip("/")),
    )
    src, ckpt, sink_v, sink_q, health = (
        os.path.join(base, d)
        for d in ("src", "ckpt", "valid", "dead", "health")
    )
    # fresh checkpoint + sinks per call (the _two_drain_dirs rule):
    # the checkpoint carries the seen-files log BETWEEN the drains,
    # but reuse across invocations would double the append sinks
    shutil.rmtree(ckpt, ignore_errors=True)
    shutil.rmtree(sink_v, ignore_errors=True)
    shutil.rmtree(sink_q, ignore_errors=True)
    shutil.rmtree(health, ignore_errors=True)
    raw.filter(key % 2 == 0).select("line").repartition(4).write.mode(
        "overwrite"
    ).parquet(src)

    def apply(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df = batch_df.cache()
        try:
            valid, quar = parse_csv_with_quarantine(
                batch_df,
                "line",
                "k LONG, price DOUBLE, prio STRING",
                validators={"invalid_price": F.col("price") >= 0},
            )
            obs = Observation()
            valid.observe(
                obs, F.count(F.lit(1)).alias("n")
            ).write.mode("append").parquet(sink_v)
            quar.write.mode("append").parquet(sink_q)
            # per-microbatch health counts: the valid count is the
            # write's own observed metric (no second scan); counts
            # are additive across microbatches and drains, so the
            # ledger sums to the whole-feed truth at read time
            n_valid = int(obs.get["n"])
            quar.groupBy("reason").agg(
                F.count("*").cast("long").alias("n")
            ).unionByName(
                spark.createDataFrame(
                    [("_ingested", n_valid)], "reason string, n long"
                )
            ).write.mode("append").parquet(health)
        finally:
            batch_df.unpersist()

    def drain() -> None:
        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .parquet(src)
        )
        q = (
            stream.writeStream.foreachBatch(apply)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    raw.filter(key % 2 == 1).select("line").repartition(4).write.mode(
        "append"
    ).parquet(src)
    drain()
    return sink_v, sink_q, health


@register(
    "orders_streaming_ingest_health",
    oracle="""
    WITH c AS (
        SELECT count(*) FILTER (WHERE o_orderkey % 13 = 3) AS n_mal,
               count(*) FILTER (WHERE o_orderkey % 13 = 7) AS n_bad,
               count(*) AS total
        FROM orders
    )
    SELECT 'malformed' AS reason, CAST(n_mal AS BIGINT) AS n,
           n_mal / CAST(total AS DOUBLE) AS share FROM c
    UNION ALL
    SELECT 'invalid_price', CAST(n_bad AS BIGINT),
           n_bad / CAST(total AS DOUBLE) FROM c
    UNION ALL
    SELECT '_ingested', CAST(total - n_mal - n_bad AS BIGINT),
           (total - n_mal - n_bad) / CAST(total AS DOUBLE) FROM c
    """,
    description="INGESTION HEALTH ON THE STREAMING RUNTIME: each "
    "foreachBatch microbatch of the two-drain dead-letter split "
    "appends its per-reason reject counts to a health LEDGER, with "
    "the valid-side count taken from an Observation attached to the "
    "valid write itself (the monitor costs zero extra scans over the "
    "feed — the r9 nit about quarantine_stats' second count job, "
    "fixed at the integration seam).  The graded output sums the "
    "ledger across all microbatches of BOTH drains and computes "
    "whole-feed shares via health_shares; the oracle replays the "
    "closed-form corruption rule over the single-pass feed — so a "
    "microbatch whose observed count drifts from what it wrote, a "
    "drain that double-ledgers under replay, or a share computed "
    "over the wrong total goes red.  Counts are additive across "
    "drains, shares are not — exactly why the ledger stores counts.  "
    "Untimed drain row (correctness surface), disclosed in "
    "tests/test_bench_contract.py",
)
def orders_streaming_ingest_health(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..sources.ingest import health_shares

    _sink_v, _sink_q, health = _run_streaming_ingest(
        spark, sf_dir, "orders_streaming_health"
    )
    ledger = (
        spark.read.parquet(health)
        .groupBy("reason")
        .agg(F.sum("n").alias("n"))
    )
    return health_shares(ledger).localCheckpoint()


@register(
    "orders_streaming_ingest_redrive",
    oracle="""
    SELECT o_orderpriority AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
               AS sum_price
    FROM orders WHERE o_orderkey % 13 <> 7
    GROUP BY o_orderpriority
    UNION ALL
    SELECT 'still_dead:invalid_price', CAST(count(*) AS BIGINT),
           CAST(NULL AS DOUBLE)
    FROM orders WHERE o_orderkey % 13 = 7
    """,
    description="DEAD-LETTER RE-DRIVE ON THE STREAMING RUNTIME — the "
    "full production loop composed end to end: the corrupted CSV "
    "feed (currency-prefixed % 13 = 3 prices, negative % 13 = 7 "
    "prices) streams through the two-drain checkpointed split into "
    "valid + DLQ sinks, then the DLQ SINK ITSELF becomes the source "
    "of a SECOND checkpointed stream whose foreachBatch runs "
    "redrive_quarantine under the parser fix (strip the prefix) and "
    "fans out to a recovered sink and a second-generation dead "
    "letter — re-drive as a stream over the dead-letter table, "
    "exactly how a production pipeline drains a DLQ after a rule "
    "deploy (and composable: the second DLQ is the next re-drive's "
    "source).  Graded output aggregates (valid UNION recovered) per "
    "priority plus the still-dead reason counts and hash-matches the "
    "same uncorrupted-feed oracle as the batch re-drive row: a "
    "recovery that loses a line between streams, double-applies a "
    "microbatch, or revives a genuinely-bad line goes red.  Untimed "
    "drain row (correctness surface), disclosed in "
    "tests/test_bench_contract.py",
)
def orders_streaming_ingest_redrive(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import os
    import shutil

    from ..sources.ingest import redrive_quarantine

    sink_v, sink_q, _health = _run_streaming_ingest(
        spark,
        sf_dir,
        "orders_streaming_redrive",
        recoverable_malformed=True,
    )
    base = os.path.dirname(sink_q)
    ckpt_r, sink_rec, sink_dead2 = (
        os.path.join(base, d)
        for d in ("ckpt_redrive", "recovered", "dead_gen2")
    )
    shutil.rmtree(ckpt_r, ignore_errors=True)
    shutil.rmtree(sink_rec, ignore_errors=True)
    shutil.rmtree(sink_dead2, ignore_errors=True)

    def redrive(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df = batch_df.cache()
        try:
            recovered, still_dead = redrive_quarantine(
                batch_df,
                "k LONG, price DOUBLE, prio STRING",
                validators={"invalid_price": F.col("price") >= 0},
                fix=F.regexp_replace(F.col("raw"), "USD ", ""),
            )
            recovered.write.mode("append").parquet(sink_rec)
            still_dead.write.mode("append").parquet(sink_dead2)
        finally:
            batch_df.unpersist()

    dlq_stream = (
        spark.readStream.schema(spark.read.parquet(sink_q).schema)
        .parquet(sink_q)
    )
    q = (
        dlq_stream.writeStream.foreachBatch(redrive)
        .option("checkpointLocation", ckpt_r)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    merged = spark.read.parquet(sink_v).unionByName(
        spark.read.parquet(sink_rec)
    )
    good = merged.groupBy(F.col("prio").alias("bucket")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("price").cast("decimal(18,4)"))
        .cast("double")
        .alias("sum_price"),
    )
    dead = (
        spark.read.parquet(sink_dead2)
        .groupBy(
            F.concat(F.lit("still_dead:"), F.col("reason")).alias(
                "bucket"
            )
        )
        .agg(
            F.count("*").cast("long").alias("n"),
            F.lit(None).cast("double").alias("sum_price"),
        )
    )
    return good.unionByName(dead).localCheckpoint()
