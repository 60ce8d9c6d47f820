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
