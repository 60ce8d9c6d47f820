"""Dedup + text operator tests on constructed corpora where ground
truth is known (the harness documents are all-distinct, so true dups
are synthesized here)."""

from __future__ import annotations

from pyspark.sql import Row

from mysql_clickhouse_sync_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_candidates,
    minhash_signatures,
    minhash_signatures_vectorized,
    shingle_pairs_jaccard,
    simhash_near_pairs,
)
from mysql_clickhouse_sync_spark.operators.text import (
    with_fingerprint,
    with_language_id,
    with_quality_score,
    with_token_stats,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )


BASE = "the quick brown fox jumps over the lazy dog near the river bank today"


def test_exact_dedup_normalizes_case_and_space(spark):
    df = _docs(spark, [BASE, BASE.upper(), "  " + BASE + "  ", "other text here"])
    out = exact_dedup(df).collect()
    groups = {r["doc_id"]: r["n_dups"] for r in out}
    assert groups == {0: 3, 3: 1}  # min-id keeper, deterministic


def test_shingle_jaccard_identical_and_disjoint(spark):
    df = _docs(spark, [BASE, BASE, "completely different words entirely now"])
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in shingle_pairs_jaccard(df).collect()}
    assert pairs[(0, 1)] == 1.0
    assert (0, 2) not in pairs  # no shared shingles


def test_minhash_lsh_finds_near_duplicates(spark):
    near = BASE.replace("today", "tonight")
    df = _docs(spark, [BASE, near, "unrelated corpus of totally distinct tokens"])
    cands = {(r["id_a"], r["id_b"])
             for r in minhash_lsh_candidates(df).collect()}
    assert (0, 1) in cands
    assert (0, 2) not in cands


def test_minhash_vectorized_matches_fold_exactly(spark):
    # Same permutation arithmetic, two execution strategies — signatures
    # must be bit-identical, including the empty/short-doc sentinel.
    df = _docs(
        spark,
        [
            BASE,
            BASE.replace("today", "tonight"),
            "unrelated corpus of totally distinct tokens",
            "",  # no shingles -> all-m sentinel signature
            "one two",  # fewer words than shingle_n
            BASE * 40,  # long doc exercises the chunked numpy path
        ],
    )
    for num_perm in (8, 32):
        fold = {r["_id"]: r["_sig"]
                for r in minhash_signatures(df, num_perm=num_perm).collect()}
        vec = {r["_id"]: r["_sig"]
               for r in minhash_signatures_vectorized(
                   df, num_perm=num_perm).collect()}
        assert fold == vec


def test_simhash_near_pairs(spark):
    near = BASE + " extra"
    df = _docs(spark, [BASE, near,
                       "zq wv xk jj qq pp zz mm nn oo aa bb cc dd ee ff"])
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in simhash_near_pairs(df, max_hamming=10).collect()}
    assert (0, 1) in pairs
    assert (0, 2) not in pairs


def test_token_stats(spark):
    df = _docs(spark, ["one two  three", "single"])
    rows = {r["doc_id"]: r for r in with_token_stats(df).collect()}
    assert rows[0]["n_tokens"] == 3
    assert rows[0]["n_distinct_tokens"] == 3
    assert rows[1]["n_tokens"] == 1
    assert rows[0]["avg_token_len"] == 11 / 3


def test_quality_score_components(spark):
    df = _docs(spark, ["abc abc abc abc", "a1 b2 c3 d4"])
    rows = {r["doc_id"]: r for r in with_quality_score(df).collect()}
    assert rows[0]["distinct_ratio"] == 0.25
    assert rows[0]["digit_ratio"] == 0.0
    assert rows[1]["digit_ratio"] == 0.5
    assert rows[0]["quality_score"] == int(
        (0.25 * 0.5 + 1.0 * 0.4 + 1.0 * 0.1) * 10000
    )


def test_language_id_votes(spark):
    df = _docs(
        spark,
        [
            "the cat sat on the mat and it is happy",
            "el perro corre por la calle y los gatos",
            "le chien et le chat sont dans les jardins du parc",
            "der hund und die katze sind mit den kindern im park",
        ],
    )
    rows = {r["doc_id"]: r["lang_pred"] for r in with_language_id(df).collect()}
    assert rows == {0: "en", 1: "es", 2: "fr", 3: "de"}


def test_fingerprint_order_sensitive(spark):
    df = _docs(spark, ["alpha beta gamma", "gamma beta alpha", "alpha beta gamma"])
    fps = [r["fingerprint"]
           for r in with_fingerprint(df).orderBy("doc_id").collect()]
    assert fps[0] == fps[2]
    assert fps[0] != fps[1]


def test_minhash_lsh_vectorized_same_candidates(spark):
    near = BASE.replace("today", "tonight")
    df = _docs(spark, [BASE, near, "unrelated corpus of totally distinct tokens",
                       BASE + " and then some more words follow here"])
    plain = sorted(map(tuple, minhash_lsh_candidates(df).collect()))
    vec = sorted(map(tuple,
                     minhash_lsh_candidates(df, vectorized=True).collect()))
    assert plain == vec


def test_bucket_pairs_max_bucket_drops_hot_keys(spark):
    """A near-universal bucket key (stop shingle) is dropped whole by
    the frequency cap; pairs from small buckets are untouched — the
    guard against quadratic blowup and task OOM at corpus scale."""
    from pyspark.sql import functions as F

    from mysql_clickhouse_sync_spark.operators.dedup import bucket_pairs

    rows = (
        [(i, 100) for i in range(50)]       # hot bucket: 50 members
        + [(100, 1), (101, 1), (200, 2), (201, 2), (202, 2)]
    )
    df = spark.createDataFrame(rows, "id long, bucket long")
    capped = bucket_pairs(
        df, ["bucket"], F.col("id"), max_bucket=10
    ).collect()
    got = {(r["a"], r["b"]) for r in capped}
    assert got == {(100, 101), (200, 201), (200, 202), (201, 202)}
    # uncapped keeps the hot bucket's 50*49/2 pairs
    full = bucket_pairs(df, ["bucket"], F.col("id")).count()
    assert full == 50 * 49 // 2 + 4


def test_registered_near_dup_queries_cap_hot_buckets(spark, tmp_path):
    """The REGISTERED scale-path queries must pass max_bucket through:
    a degenerate corpus (80 identical docs -> every shingle bucket and
    every LSH band bucket holds all 80) yields ZERO candidate pairs
    from the capped queries, where the uncapped exact twin would emit
    80*79/2 pairs per bucket."""
    from mysql_clickhouse_sync_spark.plans.registry import all_queries

    df = spark.createDataFrame(
        [
            Row(
                doc_id=i,
                text=BASE,
                lang="en",
                source="web",
                n_chars=len(BASE),
            )
            for i in range(80)
        ],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    qs = all_queries()
    assert (
        qs["docs_top_jaccard_pairs_capped"].fn(spark, str(tmp_path)).count()
        == 0
    )
    assert qs["docs_minhash_candidates"].fn(spark, str(tmp_path)).count() == 0
    # sanity: the exact twin on the same corpus does expand
    assert qs["docs_top_jaccard_pairs"].fn(spark, str(tmp_path)).count() == 20


def test_incremental_candidates_match_batch_lsh_cross_pairs(spark):
    """The incremental index join must surface exactly the cross-split
    subset of what one-shot LSH over the union finds (same seeds ->
    same signatures -> same band collisions), and the stored index
    must be reusable: building it in one 'run' (separate DataFrame)
    and joining a new batch later yields identical candidates."""
    from pyspark.sql import functions as F

    from mysql_clickhouse_sync_spark.operators.dedup import (
        minhash_band_index,
        minhash_lsh_candidates,
        minhash_lsh_candidates_vs_index,
    )
    from mysql_clickhouse_sync_spark.sources.parquet import load_table

    from conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    old = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    full = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_candidates(docs).collect()
    }
    cross_expected = {
        (a, b) for a, b in full if (a + b) % 2 == 1
    }
    inc = {
        (min(r.new_id, r.old_id), max(r.new_id, r.old_id))
        for r in minhash_lsh_candidates_vs_index(
            new, minhash_band_index(old)
        ).collect()
    }
    assert inc == cross_expected
    assert inc, "no cross-split candidates on harness data"


def test_incremental_index_bucket_cap_drops_hot_bands(spark):
    """A degenerate index band bucket (> max_bucket historical docs)
    is dropped whole instead of fanning every colliding new doc out
    by the bucket size."""
    from pyspark.sql import Row

    from mysql_clickhouse_sync_spark.operators.dedup import (
        minhash_band_index,
        minhash_lsh_candidates_vs_index,
    )

    # 9 identical history docs + 1 identical new doc: every band
    # bucket holds 9 index rows.
    old = spark.createDataFrame(
        [Row(doc_id=i, text="alpha beta gamma delta epsilon zeta")
         for i in range(9)]
    )
    new = spark.createDataFrame(
        [Row(doc_id=101, text="alpha beta gamma delta epsilon zeta")]
    )
    idx = minhash_band_index(old)
    uncapped = minhash_lsh_candidates_vs_index(new, idx)
    assert uncapped.count() == 9
    capped = minhash_lsh_candidates_vs_index(new, idx, max_bucket=4)
    assert capped.count() == 0


def test_band_index_parquet_round_trip(spark, tmp_path):
    """The band index is documented as the write-once persistable
    artifact of incremental dedup (operators/dedup.py:
    minhash_band_index).  Prove it: write the index to parquet, RELOAD
    it in a fresh DataFrame (fresh lineage, schema from disk), join a
    batch against the reloaded relation, and assert candidates
    identical to the in-plan path — i.e. nothing about the candidates
    depends on in-memory lineage, only on the stored (_id, _band, _bh)
    rows.  This is the seam a daily-ingest deployment actually uses:
    band history once, store ~128 B/doc, join each day's batch against
    the stored relation."""
    from pyspark.sql import functions as F

    from mysql_clickhouse_sync_spark.operators.dedup import (
        minhash_band_index,
        minhash_lsh_candidates_vs_index,
    )
    from mysql_clickhouse_sync_spark.sources.parquet import load_table

    from conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    old = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)

    idx_path = str(tmp_path / "band_index.parquet")
    in_plan_idx = minhash_band_index(old)
    in_plan_idx.write.parquet(idx_path)
    reloaded_idx = spark.read.parquet(idx_path)
    assert dict(reloaded_idx.dtypes) == dict(in_plan_idx.dtypes)

    key = lambda rows: {  # noqa: E731
        (r.new_id, r.old_id, r.n_bands_match) for r in rows
    }
    from_disk = key(
        minhash_lsh_candidates_vs_index(new, reloaded_idx).collect()
    )
    from_plan = key(
        minhash_lsh_candidates_vs_index(new, in_plan_idx).collect()
    )
    assert from_disk == from_plan
    assert from_disk, "no cross-split candidates on harness data"


def test_bpe_pair_counts_matches_python_reference(spark):
    """bpe_pair_counts == a trivial pure-Python recount on a corpus
    covering the edge cases: multi-space runs, 1-char tokens (emit
    nothing), unicode (multi-byte chars count as ONE character in both
    substr semantics), repeated pairs within one token, and repeated
    tokens across docs."""
    import re
    from collections import Counter

    from mysql_clickhouse_sync_spark.operators.text import bpe_pair_counts

    texts = [
        "low lower lowest",
        "a bb  ccc   low",
        "héllo héllo naïve",
        "aaaa",
        " x ",
        "日本語 テスト",
    ]
    expected: Counter[str] = Counter()
    for txt in texts:
        for tok in re.split(r"\s+", txt.strip().lower()):
            for i in range(len(tok) - 1):
                expected[tok[i:i + 2]] += 1

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = {
        r["pair"]: r["n_occurrences"]
        for r in bpe_pair_counts(df).collect()
    }
    assert got == dict(expected)


def test_raw_variants_equal_twin_preaudit_stage(spark):
    """Machine-check of the "raw == contract twin minus audit" claim
    (round-5 verdict item 2 — previously asserted in PARITY.md, never
    executed): the REGISTERED bench-timed *_raw entries must produce
    exactly the candidate set their hash-graded audit twins verify.
    Both now share one stage function, so this pins the registry
    wiring against drift (a param change on either side goes red)."""
    from mysql_clickhouse_sync_spark.plans.registry import all_queries
    from mysql_clickhouse_sync_spark.plans.text_queries import (
        _incremental_candidate_stage,
        _minhash_candidate_stage,
    )
    from mysql_clickhouse_sync_spark.sources.parquet import load_table

    sf01 = "/root/testdata/sf0.01"
    reg = all_queries()
    docs = load_table(spark, sf01, "documents")

    raw = sorted(
        map(tuple, reg["docs_minhash_candidates_raw"].fn(spark, sf01).collect())
    )
    stage = sorted(map(tuple, _minhash_candidate_stage(docs).collect()))
    assert raw == stage and len(raw) > 0

    raw_inc = sorted(
        map(tuple, reg["docs_dedup_incremental_raw"].fn(spark, sf01).collect())
    )
    stage_inc = sorted(
        map(tuple, _incremental_candidate_stage(docs).collect())
    )
    assert raw_inc == stage_inc and len(raw_inc) > 0
