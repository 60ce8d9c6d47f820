"""Deterministic sampling operators for training-data curation.

Sampling in a distributed pipeline must be REPRODUCIBLE: ``rand()``
changes under task retry and partition re-planning, so every operator
here derives its randomness arithmetically from the row's id (a
Knuth multiplicative hash) — re-runs, retries, and the DuckDB oracle
all select identical rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Knuth's multiplicative constant (2^32 / phi); the modulus keeps the
# arithmetic exact in 64-bit integers for any realistic id.
_KNUTH = 2654435761
_MOD = 4294967296  # 2^32


def id_uniform(id_col: Column) -> Column:
    """Deterministic pseudo-uniform u in (0, 1] from an integer id —
    pure integer arithmetic, bit-identical in any engine."""
    return (
        ((id_col.cast("long") * F.lit(_KNUTH)) % F.lit(_MOD) + F.lit(1))
        / F.lit(float(_MOD + 1))
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis):
    rank every row by ``ln(u) / w`` (log form of ``u^(1/w)``) and keep
    the global top-k — inclusion probability proportional to weight.

    One pass, no shuffle beyond the top-k (``TakeOrderedAndProject``
    at the harness's k; at cluster scale the same key feeds a
    per-partition local top-k + merge).  Deterministic u from
    :func:`id_uniform`, so the sample is stable under retries and
    reproducible by the oracle.
    """
    key = F.log(id_uniform(F.col(id_col))) / F.col(weight_col).cast(
        "double"
    )
    return (
        df.withColumn("_es_key", key)
        .orderBy(F.col("_es_key").desc(), F.col(id_col))
        .limit(k)
        .drop("_es_key")
    )


def domain_mixture(
    df: DataFrame,
    domain_col: str,
    token_col: str,
    budget_frac: float,
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-budget mixture sampling across domains (the static-weights
    half of DoReMi / The-Pile-style corpus mixing): give every domain an
    EQUAL share of a global token budget, cap each domain's sampling
    rate at 1.0 (a small domain cannot be upsampled without
    replacement), and select documents by deterministic id-hash so the
    realized sample is reproducible under retries and by the oracle.

    ``budget_frac`` is the target total as a fraction of the corpus's
    token mass, so the operator is scale-free (the same query text is
    correct at sf0.001 and at 100 TB).

    Plan (100 TB): one map-side-combined per-domain aggregate (tiny
    result: one row per domain), a single-row total aggregate
    cross-joined onto it (both broadcast), then the rate table
    broadcast-joined back to the corpus scan for the conditional
    selection sums.  The corpus is scanned twice but never shuffled on
    a text-bearing key; no SinglePartition window anywhere.

    Output per domain: ``n_docs``, ``domain_tokens``, ``rate``,
    ``n_selected``, ``selected_tokens``.
    """
    if not 0 < budget_frac <= 1:
        raise ValueError("budget_frac must be in (0, 1]")
    per_domain = df.groupBy(domain_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col(token_col).cast("long")).alias("domain_tokens"),
    )
    totals = per_domain.agg(
        F.sum("domain_tokens").alias("_total_tokens"),
        F.count("*").alias("_n_domains"),
    )
    rates = per_domain.crossJoin(F.broadcast(totals)).withColumn(
        "rate",
        F.least(
            F.lit(1.0),
            (
                F.col("_total_tokens").cast("double")
                * F.lit(budget_frac)
                / F.col("_n_domains")
            )
            / F.col("domain_tokens").cast("double"),
        ),
    )
    picked = (
        df.join(
            F.broadcast(rates.select(domain_col, "rate")), on=domain_col
        )
        .withColumn("_u", id_uniform(F.col(id_col)))
        .groupBy(domain_col)
        .agg(
            F.sum(F.when(F.col("_u") < F.col("rate"), 1).otherwise(0))
            .cast("long")
            .alias("n_selected"),
            F.sum(
                F.when(
                    F.col("_u") < F.col("rate"),
                    F.col(token_col).cast("long"),
                ).otherwise(F.lit(0).cast("long"))
            ).alias("selected_tokens"),
        )
    )
    return rates.select(
        domain_col, "n_docs", "domain_tokens", "rate"
    ).join(picked, on=domain_col)


def leakage_safe_splits(
    df: DataFrame,
    pairs: DataFrame,
    fractions: tuple[float, float] = (0.9, 0.05),
    id_col: str = "doc_id",
) -> DataFrame:
    """Train/val/test assignment that cannot leak near-duplicates
    across splits: the split is a deterministic hash of the
    DUPLICATE-CLUSTER id, so every member of a near-dup cluster lands
    in the same split (splitting per document would put a paraphrase
    of a training doc into the eval set — the classic contamination
    bug benchmark decontamination then has to catch).

    ``pairs`` is any candidate near-dup pair relation (exact Jaccard,
    MinHash-LSH, SimHash...); ``fractions`` is (train, val) with test
    taking the remainder.  Output: ``(id, cluster_id, split)``.
    Deterministic end-to-end — the split hash is the same Knuth
    arithmetic as :func:`id_uniform`, reproducible by the oracle.
    """
    from .graph import dedup_clusters

    f_train, f_val = fractions
    if not 0 < f_train + f_val < 1:
        raise ValueError("train+val fractions must be in (0, 1)")
    clusters = dedup_clusters(df, pairs, id_col=id_col)
    u = id_uniform(F.col("cluster_id"))
    split = (
        F.when(u <= F.lit(f_train), F.lit("train"))
        .when(u <= F.lit(f_train + f_val), F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return clusters.select(id_col, "cluster_id", split.alias("split"))
