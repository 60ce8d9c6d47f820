"""Corpus-preparation operators (operators/corpus.py) on constructed
inputs with known ground truth."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mysql_clickhouse_sync_spark.operators.corpus import (
    chunk_documents,
    contamination_check,
    pii_counts,
    scrub_pii,
    token_chunks,
    unigram_logprob_scores,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )


def test_pii_scrub_masks_everything(spark):
    text = (
        "write to alice.smith+spam@corp-mail.example.co or call "
        "+44 20 79460000; server at 10.0.255.7 stays"
    )
    out = spark.range(1).select(
        scrub_pii(F.lit(text)).alias("s"),
        *[c.alias(n) for n, c in pii_counts(F.lit(text)).items()],
    ).collect()[0]
    assert out["s"] == (
        "write to [EMAIL] or call [PHONE]; server at [IP] stays"
    )
    assert (out["n_email"], out["n_ipv4"], out["n_phone"]) == (1, 1, 1)


def test_pii_scrub_leaves_clean_text_alone(spark):
    text = "plain words 1.5 ratio v2.0 nothing to mask +1 alone"
    got = spark.range(1).select(scrub_pii(F.lit(text)).alias("s"))
    assert got.collect()[0]["s"] == text


def test_token_chunks_boundaries(spark):
    # 130 tokens, max_len=64, stride=56 -> starts 1, 57, 113
    words = " ".join(f"w{i}" for i in range(130))
    df = _docs(spark, [words])
    out = chunk_documents(df, max_len=64, stride=56).collect()
    assert [r["chunk_idx"] for r in out] == [0, 1, 2]
    assert [r["n_chunk_tokens"] for r in out] == [64, 64, 18]
    # overlap: chunk 1 starts at token 56 (0-based), i.e. w56
    chunks = chunk_documents(df, max_len=64, stride=56)
    assert chunks.count() == 3


def test_token_chunks_validates_stride():
    with pytest.raises(ValueError):
        token_chunks(F.lit(["a"]), max_len=8, stride=9)


def test_short_doc_single_chunk(spark):
    out = chunk_documents(_docs(spark, ["just three words"])).collect()
    assert len(out) == 1
    assert out[0]["n_chunk_tokens"] == 3


def test_unigram_logprob_orders_quality(spark):
    # doc 0 repeats the corpus-dominant token; doc 1 is all rare
    # tokens -> doc 0 must score higher (less surprising)
    df = _docs(
        spark,
        ["the the the the the", "zq xv jk wp mn"],
    )
    rows = {
        r["doc_id"]: r["avg_logprob"]
        for r in unigram_logprob_scores(df).collect()
    }
    assert rows[0] > rows[1]
    # all-same-token doc: p = 5/10 -> ln(0.5)
    assert rows[0] == pytest.approx(-0.693147, abs=1e-5)


def test_contamination_flags_overlap(spark):
    bench = _docs(spark, ["alpha beta gamma delta epsilon"])
    corpus = spark.createDataFrame(
        [
            Row(doc_id=10, text="alpha beta gamma delta epsilon zeta"),
            Row(doc_id=11, text="totally different words entirely here"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in contamination_check(corpus, bench, shingle_n=3).collect()
    }
    assert rows[10]["is_contaminated"]
    assert rows[10]["n_contaminated"] == 3  # 3 shared 3-grams
    assert not rows[11]["is_contaminated"]
    assert rows[11]["n_contaminated"] == 0


def test_pack_assignments_concat_and_cut(spark):
    """Docs of 100 tokens each, budget 256, one stream: starts are
    0/100/200/300 -> packs 0,0,0,1 with offsets 0,100,200,44."""
    from mysql_clickhouse_sync_spark.operators.corpus import pack_documents

    text = " ".join(["w"] * 100)
    df = spark.createDataFrame(
        [Row(doc_id=i * 4, text=text) for i in range(4)],  # same stream
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in pack_documents(df, budget=256, n_streams=4).collect()
    }
    assert [rows[i * 4]["pack_id"] for i in range(4)] == [0, 0, 0, 1]
    assert [rows[i * 4]["pack_offset"] for i in range(4)] == [0, 100, 200, 44]
    assert all(r["stream_id"] == 0 for r in rows.values())


def test_pack_streams_are_partition_local(spark):
    """The packing plan must not contain a SinglePartition exchange —
    streams are salted, windows are partition-local."""
    from mysql_clickhouse_sync_spark.operators.corpus import pack_documents

    df = spark.createDataFrame(
        [Row(doc_id=i, text="a b c") for i in range(20)],
        "doc_id long, text string",
    )
    out = pack_documents(df, budget=8, n_streams=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan


def test_incremental_packing_resumes_mid_pack(spark):
    """A stream left mid-pack by the prior run must resume at its
    consumed-token offset, and incremental == full recompute on an
    append-only corpus."""
    from mysql_clickhouse_sync_spark.operators.corpus import (
        pack_documents,
        pack_documents_incremental,
    )

    text = " ".join(["w"] * 100)
    docs = spark.createDataFrame(
        [Row(doc_id=i * 4, text=text) for i in range(6)],  # one stream
        "doc_id long, text string",
    )
    old = docs.filter(F.col("doc_id") < 12)   # 3 docs, 300 tokens
    new = docs.filter(F.col("doc_id") >= 12)
    prior = pack_documents(old, budget=256, n_streams=4)
    inc = pack_documents_incremental(new, prior, budget=256, n_streams=4)
    full = pack_documents(docs, budget=256, n_streams=4).filter(
        F.col("doc_id") >= 12
    )
    assert sorted(map(tuple, inc.collect())) == sorted(
        map(tuple, full.collect())
    )
    # first new doc starts at token 300 -> pack 1, offset 44
    first = {r["doc_id"]: r for r in inc.collect()}[12]
    assert (first["pack_id"], first["pack_offset"]) == (1, 44)


def test_pack_invariants_property(spark):
    """Property sweep over random corpora: offsets stay within the
    budget, pack ids are monotone within a stream in id order, and
    consecutive docs in a stream are contiguous in token space."""
    import random

    from mysql_clickhouse_sync_spark.operators.corpus import pack_documents

    rng = random.Random(11)
    for trial in range(3):
        budget = rng.choice([64, 128, 256])
        docs = spark.createDataFrame(
            [
                Row(
                    doc_id=i,
                    text=" ".join(["w"] * rng.randrange(1, 120)),
                )
                for i in range(rng.randrange(10, 60))
            ],
            "doc_id long, text string",
        )
        out = pack_documents(docs, budget=budget, n_streams=3).collect()
        assert all(0 <= r["pack_offset"] < budget for r in out)
        streams = {}
        for r in sorted(out, key=lambda r: r["doc_id"]):
            streams.setdefault(r["stream_id"], []).append(r)
        for rows in streams.values():
            start = 0
            for r in rows:
                assert r["pack_id"] == start // budget, (trial, r)
                assert r["pack_offset"] == start % budget, (trial, r)
                start += r["n_tokens"]


def test_duplicate_chunk_stats_flags_cross_doc_spans(spark):
    from pyspark.sql import Row

    from mysql_clickhouse_sync_spark.operators.corpus import (
        duplicate_chunk_stats,
    )

    shared = " ".join(f"s{i}" for i in range(64))
    uniq_a = " ".join(f"a{i}" for i in range(64))
    uniq_b = " ".join(f"b{i}" for i in range(64))
    df = spark.createDataFrame(
        [
            Row(doc_id=0, text=shared),            # fully shared with 1
            Row(doc_id=1, text=shared),
            Row(doc_id=2, text=uniq_a),            # unique
            Row(doc_id=3, text=uniq_b + " " + shared),  # partially shared
        ]
    )
    # stride=64: non-overlapping chunks make the expectation exact
    got = {
        r["doc_id"]: r
        for r in duplicate_chunk_stats(
            df, max_len=64, stride=64
        ).collect()
    }
    assert got[0]["substring_dup"] and got[0]["shared_chunk_frac"] == 1.0
    assert got[1]["substring_dup"]
    assert not got[2]["substring_dup"]
    assert got[2]["n_shared_chunks"] == 0
    # doc 3: chunk 1 = uniq_b (unique), chunk 2 = shared -> frac 0.5
    assert got[3]["n_chunks"] == 2 and got[3]["n_shared_chunks"] == 1
    assert got[3]["substring_dup"]  # 0.5 >= 0.5 threshold
    assert got[3]["shared_tokens"] == 64
