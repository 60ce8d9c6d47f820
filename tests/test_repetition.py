"""Gopher-style repetition stats: HOF run-length machinery vs a plain
Python recount, plus the filter-flag thresholds."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import Row

from mysql_clickhouse_sync_spark.operators.text import with_repetition_stats


def _py_stats(text: str, n: int) -> tuple[int, int, int]:
    toks = text.split()
    grams = [
        " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
    ]
    c = Counter(grams)
    top = max(c.values(), default=0)
    dup = sum(v for v in c.values() if v >= 2)
    return len(grams), top, dup


def test_repetition_stats_match_python_recount(spark):
    texts = [
        "spam ham " * 40,  # one bigram dominates
        "a b c d e f g h i j",  # all distinct
        " ".join(f"w{i % 7}" for i in range(100)),  # cyclic repeats
        "x",  # shorter than any n-gram
        "alpha beta alpha beta gamma alpha beta",
    ]
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    got = {
        r["doc_id"]: r
        for r in with_repetition_stats(df).collect()
    }
    for i, t in enumerate(texts):
        n_bi, top_bi, _ = _py_stats(t, 2)
        n_5, _, dup_5 = _py_stats(t, 5)
        r = got[i]
        assert r["n_bigrams"] == n_bi, (i, r)
        assert r["top_bigram_count"] == top_bi, (i, r)
        assert r["n_5grams"] == n_5, (i, r)
        assert r["dup_5gram_count"] == dup_5, (i, r)


def test_repetition_flag_thresholds(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=0, text="spam ham " * 40),
            Row(doc_id=1, text=" ".join(f"t{i}" for i in range(50))),
            Row(doc_id=2, text="x"),  # degenerate: no n-grams -> ok
        ]
    )
    got = {r["doc_id"]: r for r in with_repetition_stats(df).collect()}
    assert not got[0]["repetition_ok"]
    assert got[0]["top_bigram_frac"] > 0.4
    assert got[1]["repetition_ok"]
    assert got[1]["dup_5gram_frac"] == 0.0
    assert got[2]["repetition_ok"]
    assert got[2]["n_bigrams"] == 0 and got[2]["top_bigram_frac"] == 0.0


def test_repetition_stats_property_random_corpora(spark):
    """Hypothesis-style randomized cross-check without per-example
    Spark jobs (one job for many random docs): n-gram run-length
    machinery vs an independent Python Counter recount over corpora
    drawn from tiny alphabets (maximal collision pressure)."""
    import random

    rng = random.Random(0xC0FFEE)
    texts = []
    for _ in range(200):
        vocab = [f"w{i}" for i in range(rng.randint(1, 6))]
        n = rng.randint(0, 40)
        texts.append(" ".join(rng.choice(vocab) for _ in range(n)))
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t if t else "x") for i, t in enumerate(texts)]
    )
    got = {r["doc_id"]: r for r in with_repetition_stats(df).collect()}
    for i, t in enumerate(texts):
        t = t if t else "x"
        n_bi, top_bi, dup_bi = _py_stats(t, 2)
        n_5, top_5, dup_5 = _py_stats(t, 5)
        r = got[i]
        assert (r["n_bigrams"], r["top_bigram_count"]) == (n_bi, top_bi), i
        assert (r["n_5grams"], r["dup_5gram_count"]) == (n_5, dup_5), i
