"""Deterministic weighted sampling: reproducibility and the
weight-proportional inclusion property."""

from __future__ import annotations

from pyspark.sql import functions as F

from mysql_clickhouse_sync_spark.operators.sampling import (
    id_uniform,
    weighted_sample,
)


def test_id_uniform_in_unit_interval_and_spread(spark):
    u = spark.range(0, 10_000).select(
        id_uniform(F.col("id")).alias("u")
    )
    stats = u.agg(
        F.min("u"), F.max("u"), F.avg("u"), F.countDistinct("u")
    ).first()
    assert 0.0 < stats[0] and stats[1] <= 1.0
    assert 0.45 < stats[2] < 0.55  # roughly uniform
    assert stats[3] > 9_900  # essentially no collisions


def test_weighted_sample_is_deterministic_and_weight_biased(spark):
    # weights: ids 0..999 get weight 1, ids 1000..1099 get weight 50
    df = spark.range(0, 1100).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") >= 1000, F.lit(50.0))
        .otherwise(F.lit(1.0))
        .alias("w"),
    )
    s1 = {r["doc_id"] for r in weighted_sample(df, "w", 100).collect()}
    s2 = {r["doc_id"] for r in weighted_sample(df, "w", 100).collect()}
    assert s1 == s2 and len(s1) == 100  # reproducible, exact k
    heavy = sum(1 for i in s1 if i >= 1000)
    # 100 heavy rows carry 50x the weight of 1000 light rows
    # (5000 vs 1000 total): heavy rows must dominate the sample.
    assert heavy > 50, f"only {heavy} heavy rows sampled"


def test_leakage_safe_splits_keep_clusters_together(spark):
    """Every member of a near-dup cluster must land in the SAME
    split; fractions roughly honored over many singleton clusters."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from mysql_clickhouse_sync_spark.operators.sampling import (
        leakage_safe_splits,
    )

    docs = spark.createDataFrame(
        [Row(doc_id=i) for i in range(300)], "doc_id long"
    )
    # clusters: {0,1,2}, {10,11}, rest singletons
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], "id_a long, id_b long"
    )
    out = leakage_safe_splits(docs, pairs).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert len(out) == 300
    assert {by_id[i]["split"] for i in (0, 1, 2)} == {by_id[0]["split"]}
    assert by_id[10]["split"] == by_id[11]["split"]
    assert all(by_id[i]["cluster_id"] == 0 for i in (0, 1, 2))
    from collections import Counter

    frac = Counter(r["split"] for r in out)
    assert frac["train"] > frac["val"] and frac["train"] > frac["test"]
    # deterministic across runs
    again = {r["doc_id"]: r["split"]
             for r in leakage_safe_splits(docs, pairs).collect()}
    assert again == {r["doc_id"]: r["split"] for r in out}


def test_leakage_safe_splits_validates_fractions(spark):
    import pytest
    from pyspark.sql import Row

    from mysql_clickhouse_sync_spark.operators.sampling import (
        leakage_safe_splits,
    )

    docs = spark.createDataFrame([Row(doc_id=1)], "doc_id long")
    pairs = docs.limit(0).selectExpr("doc_id as id_a", "doc_id as id_b")
    with pytest.raises(ValueError):
        leakage_safe_splits(docs, pairs, fractions=(0.9, 0.2))


def test_domain_mixture_budget_and_caps(spark):
    from mysql_clickhouse_sync_spark.operators.sampling import domain_mixture

    # big: 1000 docs x 100 tokens; small: 20 docs x 50 tokens.
    df = spark.range(0, 1020).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 1000, F.lit("big"))
        .otherwise(F.lit("small"))
        .alias("source"),
        F.when(F.col("id") < 1000, F.lit(100))
        .otherwise(F.lit(50))
        .cast("long")
        .alias("n_tokens"),
    )
    out = {
        r["source"]: r
        for r in domain_mixture(
            df, "source", "n_tokens", budget_frac=0.4, id_col="doc_id"
        ).collect()
    }
    total = 1000 * 100 + 20 * 50  # 101_000
    target_per_domain = total * 0.4 / 2  # 20_200
    # small domain (1_000 tokens) is under its share -> rate caps at 1.0
    assert out["small"]["rate"] == 1.0
    assert out["small"]["n_selected"] == 20
    assert out["small"]["selected_tokens"] == 1000
    # big domain is downsampled toward its 20_200-token share
    assert abs(out["big"]["rate"] - target_per_domain / 100_000) < 1e-12
    got = out["big"]["selected_tokens"]
    assert 0.7 * target_per_domain < got < 1.3 * target_per_domain, got
    # deterministic: second run selects the identical sample
    out2 = {
        r["source"]: r
        for r in domain_mixture(
            df, "source", "n_tokens", budget_frac=0.4, id_col="doc_id"
        ).collect()
    }
    assert out2["big"]["n_selected"] == out["big"]["n_selected"]


def test_domain_mixture_rejects_bad_budget(spark):
    import pytest

    from mysql_clickhouse_sync_spark.operators.sampling import domain_mixture

    df = spark.range(1).select(
        F.col("id").alias("doc_id"),
        F.lit("s").alias("source"),
        F.lit(1).alias("n_tokens"),
    )
    with pytest.raises(ValueError):
        domain_mixture(df, "source", "n_tokens", budget_frac=0.0)
