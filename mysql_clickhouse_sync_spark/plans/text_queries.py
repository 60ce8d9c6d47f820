"""Text-analysis + deduplication queries over ``documents``.

The LLM-training-data operator family (BASELINE.json north star):
exact dedup, n-gram Jaccard near-dup, MinHash-LSH and SimHash
candidates (rows-only checks — hash functions are engine-specific),
token stats, quality scoring, language ID, fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    exact_dedup,
    minhash_lsh_candidates,
    shingle_pairs_jaccard,
    simhash_near_pairs,
)
from ..operators.text import (
    STOPWORDS,
    with_fingerprint,
    with_language_id,
    with_quality_score,
    with_repetition_stats,
    with_token_stats,
)
from ..sources.parquet import load_table
from .registry import register

# DuckDB equivalents of the Spark tokenization/shingling used by the
# operators (operators/text.py, operators/dedup.py).
_SQL_TOKS = r"string_split_regex(trim(text), '\s+')"
_SQL_NOSPACE = r"regexp_replace(trim(text), '\s+', '', 'g')"
_SQL_SHINGLES = (
    f"list_distinct(list_transform("
    f"range(1, greatest(len({_SQL_TOKS}) - 2, 1) + 1),"
    f" i -> array_to_string(({_SQL_TOKS})[i:i+2], ' ')))"
)


@register(
    "docs_exact_dedup",
    oracle="""
    SELECT CAST(min(doc_id) AS BIGINT) AS doc_id,
           CAST(count(*) AS BIGINT) AS n_dups,
           CAST(length(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
                AS BIGINT) AS n_chars_norm
    FROM documents
    GROUP BY regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')
    """,
    description="Exact dedup groups with deterministic min-id keeper "
    "(hash-groupBy; scale path hashes content, not text)",
)
def docs_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup(load_table(spark, sf_dir, "documents"))


@register(
    "docs_token_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(len({_SQL_TOKS}) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct({_SQL_TOKS})) AS BIGINT) AS n_distinct_tokens,
           CAST(length({_SQL_NOSPACE}) AS DOUBLE) / len({_SQL_TOKS}) AS avg_token_len
    FROM documents
    """,
    description="Whitespace+regex token counting (narrow map, JVM-side)",
)
def docs_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return with_token_stats(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "n_tokens", "n_distinct_tokens", "avg_token_len"
    )


@register(
    "docs_quality_score",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               CAST(len(list_distinct({_SQL_TOKS})) AS DOUBLE)
                   / len({_SQL_TOKS}) AS distinct_ratio,
               CAST(length(regexp_replace({_SQL_NOSPACE}, '[^a-zA-Z]', '', 'g'))
                   AS DOUBLE) / length({_SQL_NOSPACE}) AS alpha_ratio,
               CAST(length(regexp_replace({_SQL_NOSPACE}, '[^0-9]', '', 'g'))
                   AS DOUBLE) / length({_SQL_NOSPACE}) AS digit_ratio
        FROM documents
    )
    SELECT doc_id, distinct_ratio, alpha_ratio, digit_ratio,
           CAST(floor((distinct_ratio * 0.5 + alpha_ratio * 0.4
                 + (1.0 - digit_ratio) * 0.1) * 10000) AS BIGINT)
               AS quality_score
    FROM t
    """,
    description="Heuristic quality scoring (length/diversity/charset "
    "ratios composited)",
)
def docs_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return with_quality_score(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "distinct_ratio", "alpha_ratio", "digit_ratio",
        "quality_score",
    )


@register(
    "docs_repetition_stats",
    oracle=f"""
    WITH base AS (
        SELECT doc_id, {_SQL_TOKS} AS t, len({_SQL_TOKS}) AS n
        FROM documents
    ), bi AS (
        SELECT doc_id,
               unnest(list_transform(
                   range(1, greatest(n - 1, 0) + 1),
                   i -> array_to_string(t[i:i+1], ' '))) AS g
        FROM base
    ), bic AS (
        SELECT doc_id, g, count(*) AS c FROM bi GROUP BY doc_id, g
    ), bis AS (
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
               CAST(max(c) AS BIGINT) AS top_bigram_count
        FROM bic GROUP BY doc_id
    ), fv AS (
        SELECT doc_id,
               unnest(list_transform(
                   range(1, greatest(n - 4, 0) + 1),
                   i -> array_to_string(t[i:i+4], ' '))) AS g
        FROM base
    ), fvc AS (
        SELECT doc_id, g, count(*) AS c FROM fv GROUP BY doc_id, g
    ), fvs AS (
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_5grams,
               CAST(sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT)
                   AS dup_5gram_count
        FROM fvc GROUP BY doc_id
    ), j AS (
        SELECT base.doc_id,
               coalesce(n_bigrams, 0) AS n_bigrams,
               coalesce(top_bigram_count, 0) AS top_bigram_count,
               coalesce(n_5grams, 0) AS n_5grams,
               coalesce(dup_5gram_count, 0) AS dup_5gram_count
        FROM base
        LEFT JOIN bis USING (doc_id) LEFT JOIN fvs USING (doc_id)
    )
    SELECT doc_id, n_bigrams, top_bigram_count,
           CASE WHEN n_bigrams > 0
                THEN CAST(top_bigram_count AS DOUBLE) / n_bigrams
                ELSE 0.0 END AS top_bigram_frac,
           n_5grams, dup_5gram_count,
           CASE WHEN n_5grams > 0
                THEN CAST(dup_5gram_count AS DOUBLE) / n_5grams
                ELSE 0.0 END AS dup_5gram_frac,
           (CASE WHEN n_bigrams > 0
                 THEN CAST(top_bigram_count AS DOUBLE) / n_bigrams
                 ELSE 0.0 END) <= 0.2
           AND (CASE WHEN n_5grams > 0
                     THEN CAST(dup_5gram_count AS DOUBLE) / n_5grams
                     ELSE 0.0 END) <= 0.3 AS repetition_ok
    FROM j
    """,
    description="Gopher-style intra-doc repetition filter: top-bigram "
    "mass fraction + duplicate-5-gram mass fraction + keep/drop flag.  "
    "Engine path is narrow per-row HOF compute (array_sort + one "
    "aggregate scan, NO explode/shuffle — the oracle's explode+groupBy "
    "formulation would shuffle the corpus's full n-gram mass at 100 TB)",
)
def docs_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return with_repetition_stats(
        load_table(spark, sf_dir, "documents")
    ).select(
        "doc_id",
        "n_bigrams",
        "top_bigram_count",
        "top_bigram_frac",
        "n_5grams",
        "dup_5gram_count",
        "dup_5gram_frac",
        "repetition_ok",
    )


def _sql_lang_hits(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return (
        f"len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),"
        f" t -> list_contains([{words}], t)))"
    )


@register(
    "docs_language_id",
    oracle=f"""
    WITH hits AS (
        SELECT doc_id, lang,
               {_sql_lang_hits('en')} AS h_en,
               {_sql_lang_hits('es')} AS h_es,
               {_sql_lang_hits('fr')} AS h_fr,
               {_sql_lang_hits('de')} AS h_de,
               len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                   t -> regexp_full_match(t, '[a-z]+'))) AS latin
        FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN latin = 0 THEN 'zh'
                WHEN h_en = greatest(h_en, h_es, h_fr, h_de) THEN 'en'
                WHEN h_es = greatest(h_en, h_es, h_fr, h_de) THEN 'es'
                WHEN h_fr = greatest(h_en, h_es, h_fr, h_de) THEN 'fr'
                WHEN h_de = greatest(h_en, h_es, h_fr, h_de) THEN 'de'
           END AS lang_pred
    FROM hits
    """,
    description="Stopword-voting language ID (n-gram heuristic family; "
    "higher-order functions, no UDF)",
)
def docs_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return with_language_id(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "lang", "lang_pred"
    )


@register(
    "docs_top_jaccard_pairs",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id AS _id, {_SQL_SHINGLES} AS _sh,
               len({_SQL_SHINGLES}) AS _n
        FROM documents
    ), ex AS (
        SELECT _id, _n, unnest(_sh) AS _shingle FROM sh
    ), pairs AS (
        SELECT a._id AS id_a, b._id AS id_b, a._n AS n_a, b._n AS n_b,
               CAST(count(*) AS BIGINT) AS n_common
        FROM ex a JOIN ex b ON a._shingle = b._shingle AND a._id < b._id
        GROUP BY a._id, b._id, a._n, b._n
    )
    SELECT id_a, id_b, n_common,
           CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           CAST(n_common AS DOUBLE) / (n_a + n_b - n_common) AS jaccard
    FROM pairs
    ORDER BY jaccard DESC, id_a, id_b
    LIMIT 20
    """,
    description="Exact word-3-gram Jaccard near-dup: top-20 most "
    "similar doc pairs (shingle co-occurrence join).  EXACT oracle "
    "twin: no bucket cap, so a near-universal shingle expands fully — "
    "the registered scale path is docs_top_jaccard_pairs_capped",
)
def docs_top_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = shingle_pairs_jaccard(load_table(spark, sf_dir, "documents"))
    return pairs.orderBy(
        F.col("jaccard").desc(), F.col("id_a"), F.col("id_b")
    ).limit(20).select("id_a", "id_b", "n_common", "n_a", "n_b", "jaccard")


# Hot-shingle cap for the registered near-dup scale paths.  A shingle
# (or LSH band bucket) shared by more than this many docs emits
# >2k pairs from ONE task and carries ~zero similarity signal
# precisely because it is near-universal — standard stop-shingle /
# frequency-cap practice in web-scale dedup.  Capped buckets are
# dropped WHOLE (operators/dedup.py::bucket_pairs), keeping worst-case
# per-task output bounded at 100 TB.
_MAX_BUCKET = 64


@register(
    "docs_top_jaccard_pairs_capped",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id AS _id, {_SQL_SHINGLES} AS _sh,
               len({_SQL_SHINGLES}) AS _n
        FROM documents
    ), ex AS (
        SELECT _id, _n, unnest(_sh) AS _shingle FROM sh
    ), kept AS (
        SELECT * FROM ex WHERE _shingle IN (
            SELECT _shingle FROM ex GROUP BY _shingle
            HAVING count(*) <= {_MAX_BUCKET}
        )
    ), pairs AS (
        SELECT a._id AS id_a, b._id AS id_b, a._n AS n_a, b._n AS n_b,
               CAST(count(*) AS BIGINT) AS n_common
        FROM kept a JOIN kept b ON a._shingle = b._shingle AND a._id < b._id
        GROUP BY a._id, b._id, a._n, b._n
    )
    SELECT id_a, id_b, n_common,
           CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           CAST(n_common AS DOUBLE) / (n_a + n_b - n_common) AS jaccard
    FROM pairs
    ORDER BY jaccard DESC, id_a, id_b
    LIMIT 20
    """,
    description="Word-3-gram Jaccard near-dup with the hot-shingle "
    "cap wired in (buckets > 64 docs dropped whole): the 100 TB scale "
    "path — worst-case pair expansion per task is bounded by "
    "max_bucket^2/2 regardless of corpus degeneracy.  Oracle applies "
    "the identical cap by shingle frequency",
)
def docs_top_jaccard_pairs_capped(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    pairs = shingle_pairs_jaccard(
        load_table(spark, sf_dir, "documents"), max_bucket=_MAX_BUCKET
    )
    return pairs.orderBy(
        F.col("jaccard").desc(), F.col("id_a"), F.col("id_b")
    ).limit(20).select("id_a", "id_b", "n_common", "n_a", "n_b", "jaccard")


# Planted-twin id offset for self-check contracts (same convention as
# plans/similarity_queries.py): far above any harness doc_id.
_TWIN_OFFSET = 10_000_000


@register(
    "docs_minhash_candidates",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id AS _id, {_SQL_SHINGLES} AS _sh,
               len({_SQL_SHINGLES}) AS _n
        FROM documents
    ), ex AS (
        SELECT _id, _n, unnest(_sh) AS _shingle FROM sh
    ), kept AS (
        SELECT * FROM ex WHERE _shingle IN (
            SELECT _shingle FROM ex GROUP BY _shingle
            HAVING count(*) <= {_MAX_BUCKET}
        )
    ), pairs AS (
        SELECT a._id AS id_a, b._id AS id_b, a._n AS n_a, b._n AS n_b,
               CAST(count(*) AS BIGINT) AS n_common
        FROM kept a JOIN kept b ON a._shingle = b._shingle AND a._id < b._id
        GROUP BY a._id, b._id, a._n, b._n
    )
    SELECT id_a, id_b,
           CAST(n_common AS DOUBLE) / (n_a + n_b - n_common) AS jaccard,
           TRUE AS lsh_caught
    FROM pairs
    WHERE CAST(n_common AS DOUBLE) / (n_a + n_b - n_common) >= 0.8
    """,
    description="MinHash(32)+LSH(8 bands) near-dup candidates with the "
    "containment contract as the oracle (the HLL bound-contract "
    "pattern): the output rows are the EXACT capped-Jaccard pairs "
    ">= 0.8 (SQL-recomputable, so id/jaccard values hash-check), and "
    "lsh_caught asserts each one appears in the LSH candidate set.  "
    "At 8 bands x 4 rows the analytic catch probability for j >= 0.8 "
    "is >= 98.5% per pair and the planted harness near-dups sit at "
    "j >= 0.9 where it is >= 99.98%; the realized catch on the "
    "harness corpus is 100% and deterministic (fixed permutation "
    "seeds).  A broken signature/banding path -> lsh_caught=false -> "
    "driver red.  Degenerate-band guard stays wired in (buckets > 64 "
    "docs dropped whole)",
)
def docs_minhash_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    exact = shingle_pairs_jaccard(docs, max_bucket=_MAX_BUCKET).filter(
        F.col("jaccard") >= 0.8
    )
    cand = _minhash_candidate_stage(docs).select(
        "id_a", "id_b", F.lit(True).alias("_hit")
    )
    return exact.join(cand, ["id_a", "id_b"], "left").select(
        "id_a",
        "id_b",
        "jaccard",
        F.coalesce("_hit", F.lit(False)).alias("lsh_caught"),
    )


@register(
    "docs_minhash_candidates_raw",
    oracle=None,
    description="PRODUCTION path of docs_minhash_candidates with the "
    "in-query exact-Jaccard audit stripped: MinHash(32) signatures -> "
    "8-band LSH -> capped bucket pair expansion, nothing else.  "
    "Bench-only by design (registered past the driver window, "
    "rows-only locally): the audit twin computes an exact all-pairs "
    "shingle join that exists to hash-verify THIS code path — "
    "docs_minhash_candidates calls the identical "
    "minhash_lsh_candidates(max_bucket) operator, so its driver-green "
    "hash covers this variant's correctness while this entry times "
    "what a user actually runs (round-4 verdict: the headline should "
    "measure engine work, not oracle-support mass)",
)
def docs_minhash_candidates_raw(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return _minhash_candidate_stage(docs)


def _minhash_candidate_stage(docs: DataFrame) -> DataFrame:
    """The PRODUCTION LSH candidate stage, shared VERBATIM by the
    hash-graded audit twin (docs_minhash_candidates joins against it)
    and the bench-timed raw variant (docs_minhash_candidates_raw
    returns it as-is) — so "raw == twin minus audit" holds by
    construction, and tests/test_dedup_text.py machine-checks the
    registry wiring by collecting both.

    ``vectorized=True`` (r14): the numpy signature kernel is
    BIT-IDENTICAL to the interpreted fold (pinned in
    tests/test_dedup_text.py::test_minhash_vectorized_matches_fold_
    exactly, so the graded twin's hash cannot move) and measured
    1.8 s -> 0.7 s on the signature pass at sf0.1 (guide §4.2: hand
    whole Arrow batches to numpy instead of per-element interpreted
    expression trees); at 100 TB signatures dominate this operator,
    which is exactly the regime the kernel exists for."""
    return minhash_lsh_candidates(
        docs, max_bucket=_MAX_BUCKET, vectorized=True
    )


@register(
    "docs_dedup_incremental",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id AS _id, {_SQL_SHINGLES} AS _sh,
               len({_SQL_SHINGLES}) AS _n
        FROM documents
    ), ex AS (
        SELECT _id, _n, unnest(_sh) AS _shingle FROM sh
    ), kept AS (
        SELECT * FROM ex WHERE _shingle IN (
            SELECT _shingle FROM ex GROUP BY _shingle
            HAVING count(*) <= {_MAX_BUCKET}
        )
    ), pairs AS (
        SELECT a._id AS id_a, b._id AS id_b, a._n AS n_a, b._n AS n_b,
               CAST(count(*) AS BIGINT) AS n_common
        FROM kept a JOIN kept b ON a._shingle = b._shingle AND a._id < b._id
        GROUP BY a._id, b._id, a._n, b._n
    ), near AS (
        SELECT id_a, id_b,
               CAST(n_common AS DOUBLE) / (n_a + n_b - n_common) AS jaccard
        FROM pairs
        WHERE CAST(n_common AS DOUBLE) / (n_a + n_b - n_common) >= 0.8
          AND (id_a + id_b) % 2 = 1
    )
    SELECT CASE WHEN id_a % 2 = 1 THEN id_a ELSE id_b END AS new_id,
           CASE WHEN id_a % 2 = 1 THEN id_b ELSE id_a END AS old_id,
           jaccard, TRUE AS lsh_caught
    FROM near
    """,
    description="INCREMENTAL near-dup dedup: odd-id docs play the "
    "daily ingest batch, even-id docs the historical corpus whose "
    "band index (minhash_band_index — the persistable ~128 B/doc "
    "artifact) was built in a prior run; candidates come from "
    "equi-joining the batch's banded signatures against the index, so "
    "work tracks |batch|, never |history| — the only affordable "
    "dedup shape at 100 TB daily ingest.  Self-check contract as the "
    "oracle (same pattern as docs_minhash_candidates): output rows "
    "are the EXACT capped-Jaccard cross-parity pairs >= 0.8 and "
    "lsh_caught asserts the index join surfaced each one "
    "(deterministic — identical permutation seeds across runs is "
    "precisely what makes signatures comparable run-over-run)",
)
def docs_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    cand = _incremental_candidate_stage(docs).select(
        "new_id", "old_id", F.lit(True).alias("_hit")
    )
    exact = shingle_pairs_jaccard(docs, max_bucket=_MAX_BUCKET).filter(
        (F.col("jaccard") >= 0.8)
        & ((F.col("id_a") + F.col("id_b")) % 2 == 1)
    )
    directed = exact.select(
        F.when(F.col("id_a") % 2 == 1, F.col("id_a"))
        .otherwise(F.col("id_b"))
        .alias("new_id"),
        F.when(F.col("id_a") % 2 == 1, F.col("id_b"))
        .otherwise(F.col("id_a"))
        .alias("old_id"),
        "jaccard",
    )
    return directed.join(cand, ["new_id", "old_id"], "left").select(
        "new_id",
        "old_id",
        "jaccard",
        F.coalesce("_hit", F.lit(False)).alias("lsh_caught"),
    )


@register(
    "docs_dedup_incremental_raw",
    oracle=None,
    description="PRODUCTION path of docs_dedup_incremental with the "
    "exact-Jaccard audit twin stripped: band the odd-id ingest batch, "
    "equi-join it against the even-id corpus band index "
    "(minhash_band_index) on (_band, _bh) — work tracks |batch|, "
    "never |history|.  Bench-only (past the driver window, rows-only "
    "locally): docs_dedup_incremental drives the identical "
    "minhash_band_index + minhash_lsh_candidates_vs_index operators "
    "under a driver-green hash contract; this entry times the daily "
    "ingest join a user actually pays for (round-4 verdict: split "
    "audit mass out of the headline)",
)
def docs_dedup_incremental_raw(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return _incremental_candidate_stage(
        load_table(spark, sf_dir, "documents")
    )


def _incremental_candidate_stage(docs: DataFrame) -> DataFrame:
    """The PRODUCTION incremental-dedup candidate stage (odd-id batch
    banded + equi-joined against the even-id corpus band index),
    shared VERBATIM by the hash-graded audit twin
    (docs_dedup_incremental) and the bench-timed raw variant — same
    by-construction + machine-checked contract as
    :func:`_minhash_candidate_stage`."""
    from ..operators.dedup import (
        minhash_band_index,
        minhash_lsh_candidates_vs_index,
    )
    from ..util import carry_scan_hint

    old = carry_scan_hint(docs.filter(F.col("doc_id") % 2 == 0), docs)
    new = carry_scan_hint(docs.filter(F.col("doc_id") % 2 == 1), docs)
    # vectorized=True on BOTH banding passes (r14): bit-identical
    # signatures (tests pin fold == numpy exactly), measured -0.3 s
    # at sf0.1; the index side of a real deployment is banded once at
    # build time with the same kernel, so signatures stay comparable.
    return minhash_lsh_candidates_vs_index(
        new,
        minhash_band_index(old, vectorized=True),
        max_bucket=_MAX_BUCKET,
        vectorized=True,
    )


@register(
    "docs_simhash_pairs",
    oracle="""
    SELECT doc_id, TRUE AS twin_caught, TRUE AS recall_ok
    FROM documents WHERE doc_id % 25 = 0
    """,
    description="SimHash-64 near-dup pairs (Hamming <= 3 via pigeonhole "
    "band blocking) with a two-part self-check contract as the "
    "oracle.  (1) Planted-twin completeness: every 25th doc is "
    "re-inserted under id+10M with IDENTICAL text -> identical "
    "signature -> Hamming 0, and the pigeonhole blocking GUARANTEES "
    "any pair within the distance shares a band, so twin_caught must "
    "be true deterministically.  (2) Corpus recall floor: recall_ok "
    "asserts simhash recovers >= half of the exact capped-Jaccard "
    "pairs >= 0.9.  Measured (deterministic, pinned exactly in "
    "tests/test_simhash_recall.py): 0.778 at sf0.001 (21/27), 0.600 "
    "at sf0.01 (15/25 — the low point, small-sample noise), 0.755 at "
    "sf0.1 (188/249) — recall does NOT degrade with corpus size.  "
    "SimHash's token-multiset signature legitimately misses some "
    "high-Jaccard edits, which is why MinHash is the primary text "
    "near-dup path and SimHash the cheap 8-byte screen",
)
def docs_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    planted = docs.filter(F.col("doc_id") % 25 == 0)
    twins = planted.select(
        (F.col("doc_id") + F.lit(_TWIN_OFFSET)).alias("doc_id"), "text"
    )
    aug = docs.select("doc_id", "text").unionByName(twins)
    found = simhash_near_pairs(aug)
    twin_hits = found.filter(
        F.col("id_b") == F.col("id_a") + F.lit(_TWIN_OFFSET)
    ).select(F.col("id_a").alias("doc_id"), F.lit(True).alias("_hit"))
    exact = shingle_pairs_jaccard(docs, max_bucket=_MAX_BUCKET).filter(
        F.col("jaccard") >= 0.9
    )
    recall = exact.join(
        found.select("id_a", "id_b", F.lit(1).alias("_c")),
        ["id_a", "id_b"],
        "left",
    ).agg(
        (
            F.lit(2) * F.sum(F.coalesce("_c", F.lit(0))) >= F.count("*")
        ).alias("recall_ok")
    )
    return (
        planted.select("doc_id")
        .join(twin_hits, "doc_id", "left")
        .crossJoin(F.broadcast(recall))
        .select(
            "doc_id",
            F.coalesce("_hit", F.lit(False)).alias("twin_caught"),
            "recall_ok",
        )
    )


@register(
    "docs_fingerprints",
    oracle=f"""
    SELECT doc_id,
           CAST(len({_SQL_TOKS}) AS BIGINT) AS n_tokens,
           TRUE AS fp_groups_match, TRUE AS twin_fp_match
    FROM documents
    """,
    description="Order-sensitive rolling-hash document fingerprint "
    "(aggregate fold, JVM-side) with the injectivity+consistency "
    "contract as the oracle: fingerprint-equality must coincide with "
    "exact-text-group equality.  fp_groups_match asserts each doc's "
    "FINGERPRINT-group size equals its exact-TEXT-group size — "
    "injectivity across distinct texts (a 31-bit-modulus polynomial "
    "collision or a degenerate fold inflates the fp group -> red) "
    "AND consistency within duplicates, at ANY corpus scale (the "
    "earlier all-distinct assertion broke on sf0.1, whose corpus "
    "plants 8 duplicate texts); twin_fp_match re-inserts every 25th "
    "doc under id+10M with identical text and asserts the twin's "
    "fingerprint equals the original's",
)
def docs_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import tokens_col

    docs = load_table(spark, sf_dir, "documents")
    twins = docs.filter(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + F.lit(_TWIN_OFFSET)).alias("doc_id"), "text"
    )
    fp = with_fingerprint(
        docs.select("doc_id", "text").unionByName(twins)
    )
    orig = fp.filter(F.col("doc_id") < _TWIN_OFFSET).select(
        "doc_id",
        F.size(tokens_col(F.col("text"))).cast("long").alias("n_tokens"),
        "fingerprint",
    )
    twin_fp = fp.filter(F.col("doc_id") >= _TWIN_OFFSET).select(
        (F.col("doc_id") - F.lit(_TWIN_OFFSET)).alias("doc_id"),
        F.col("fingerprint").alias("_tfp"),
    )
    from pyspark.sql import Window

    counts = orig.groupBy("fingerprint").agg(F.count("*").alias("_nf"))
    # text-group size as ONE window pass: a groupBy(text) + join-back
    # would shuffle every full document body twice; the window shuffles
    # it once and yields the same per-doc count.
    doc_text_n = docs.select(
        "doc_id",
        F.count("*").over(Window.partitionBy("text")).alias("_nt"),
    )
    return (
        orig.join(counts, "fingerprint")
        .join(doc_text_n, "doc_id")
        .join(twin_fp, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("_nf") == F.col("_nt")).alias("fp_groups_match"),
            # Planted docs (doc_id % 25 == 0) MUST find their twin: a
            # missing twin fingerprint there means the stage dropped
            # the row, so it fails the check instead of a blanket
            # NULL->TRUE coalesce hiding 'twin lost' as 'no twin'.
            F.when(
                F.col("doc_id") % 25 == 0,
                F.coalesce(
                    F.col("_tfp") == F.col("fingerprint"),
                    F.lit(False),
                ),
            )
            .otherwise(F.lit(True))
            .alias("twin_fp_match"),
        )
    )


@register(
    "docs_lang_source_profile",
    oracle="""
    SELECT lang, source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM documents GROUP BY lang, source
    """,
    description="Corpus composition profile (lang x source matrix)",
)
def docs_lang_source_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.max("n_chars").cast("long").alias("max_chars"),
        )
    )


_SQL_BPE_PAT = (
    r"''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"
)


@register(
    "docs_subword_tokens",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               regexp_extract_all(text, '{_SQL_BPE_PAT}') AS pre,
               length(text) AS n_chars_t
        FROM documents
    )
    SELECT doc_id,
           CAST(len(pre) AS BIGINT) AS n_pretokens,
           CAST(len(list_filter(pre, x -> regexp_matches(x, '\\S')))
                AS BIGINT) AS n_subwords,
           CAST(n_chars_t AS DOUBLE)
               / greatest(len(list_filter(pre, x -> regexp_matches(x, '\\S'))), 1)
               AS chars_per_subword
    FROM t
    """,
    description="BPE-ish subword pre-tokenization (GPT-2-style regex, "
    "lookahead-free so the identical pattern runs in both engines)",
)
def docs_subword_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import with_subword_stats

    return with_subword_stats(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "n_pretokens", "n_subwords", "chars_per_subword"
    )


@register(
    "docs_bpe_first_merges",
    oracle=r"""
    WITH tok AS (
        SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS t
        FROM documents
    ), pr AS (
        SELECT substr(t, CAST(i AS INT), 2) AS pair
        FROM tok, unnest(range(1, len(t))) AS u(i)
        WHERE len(t) >= 2
    )
    SELECT pair, CAST(count(*) AS BIGINT) AS n_occurrences
    FROM pr GROUP BY pair
    ORDER BY n_occurrences DESC, pair
    LIMIT 20
    """,
    description="BPE tokenizer-training support: the top-20 merge "
    "candidates of the FIRST BPE iteration — corpus-wide adjacent "
    "character-pair occurrence counts within tokens (Sennrich et al. "
    "subword units; at iteration zero every symbol is a character).  "
    "Scale shape: the groupBy key space is the char-bigram vocabulary "
    "(thousands of keys at any corpus size), so map-side combine "
    "collapses the shuffle to the canonical word-count pattern; "
    "deterministic (count DESC, pair) tie-break on the top-k",
)
def docs_bpe_first_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import bpe_pair_counts

    return (
        bpe_pair_counts(load_table(spark, sf_dir, "documents"))
        .orderBy(F.col("n_occurrences").desc(), "pair")
        .limit(20)
        .select("pair", F.col("n_occurrences").cast("long").alias("n_occurrences"))
    )


@register(
    "docs_top_words",
    oracle=f"""
    SELECT word, CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM (
        SELECT doc_id,
               unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word
        FROM documents
    )
    GROUP BY word
    ORDER BY n_occurrences DESC, word
    LIMIT 25
    """,
    description="Corpus vocabulary head: explode tokens -> count + "
    "doc frequency -> deterministic top-25 (the classic lateral-view "
    "word count, with map-side partial aggregation)",
)
def docs_top_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import tokens_col

    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(tokens_col(F.lower(F.col("text")))).alias("word")
    )
    return (
        words.groupBy("word")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.col("n_occurrences").desc(), F.col("word"))
        .limit(25)
    )


@register(
    "docs_char_bigram_profile",
    oracle="""
    SELECT lang, bigram, CAST(count(*) AS BIGINT) AS n
    FROM (
        SELECT lang,
               unnest(list_transform(
                   range(1, length(text)),
                   i -> substr(text, CAST(i AS INT), 2)
               )) AS bigram
        FROM documents
    )
    WHERE bigram NOT LIKE '% %' AND length(bigram) = 2
    GROUP BY lang, bigram
    ORDER BY n DESC, lang, bigram
    LIMIT 50
    """,
    description="Character-bigram frequency profile per language (the "
    "n-gram features language-ID models train on): sequence+transform "
    "explode, top-50 with full tie-break",
)
def docs_char_bigram_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # substring with a dynamic start index needs the SQL form
    bigrams = F.expr(
        "transform(sequence(1, length(text) - 1), i -> substr(text, i, 2))"
    )
    return (
        docs.select("lang", F.explode(bigrams).alias("bigram"))
        .filter(
            (~F.col("bigram").contains(" ")) & (F.length("bigram") == 2)
        )
        .groupBy("lang", "bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("lang"), F.col("bigram"))
        .limit(50)
    )


@register(
    "docs_dup_clusters",
    oracle=f"""
    WITH RECURSIVE sh AS (
        SELECT doc_id AS _id, {_SQL_SHINGLES} AS _sh,
               len({_SQL_SHINGLES}) AS _n
        FROM documents
    ), ex AS (
        SELECT _id, _n, unnest(_sh) AS _shingle FROM sh
    ), pairs AS (
        SELECT a._id AS id_a, b._id AS id_b, a._n AS n_a, b._n AS n_b,
               count(*) AS n_common
        FROM ex a JOIN ex b ON a._shingle = b._shingle AND a._id < b._id
        GROUP BY a._id, b._id, a._n, b._n
    ), edges AS (
        SELECT id_a AS a, id_b AS b FROM pairs
        WHERE CAST(n_common AS DOUBLE) / (n_a + n_b - n_common) >= 0.5
    ), sym AS (
        SELECT a, b FROM edges UNION SELECT b, a FROM edges
        UNION SELECT a, a FROM edges UNION SELECT b, b FROM edges
    ), reach(id, r) AS (
        SELECT a, b FROM sym
        UNION
        SELECT reach.id, sym.b FROM reach JOIN sym ON reach.r = sym.a
    ), comp AS (
        SELECT id, min(r) AS cluster_id FROM reach GROUP BY id
    )
    SELECT d.doc_id,
           CAST(COALESCE(c.cluster_id, d.doc_id) AS BIGINT) AS cluster_id,
           COALESCE(c.cluster_id, d.doc_id) = d.doc_id AS is_keeper
    FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
    """,
    description="Near-dup CLUSTERS: exact-Jaccard >= 0.5 pairs -> "
    "distributed connected components (min-label propagation, "
    "localCheckpoint per round) -> full-corpus cluster + keeper "
    "assignment; oracle recomputes components with a recursive CTE",
)
def docs_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import dedup_clusters

    docs = load_table(spark, sf_dir, "documents")
    pairs = shingle_pairs_jaccard(docs).filter(F.col("jaccard") >= 0.5)
    # One row per pair by construction (the pair-count groupBy):
    # min-propagation needs no symmetrize-dedup shuffle.
    return dedup_clusters(docs, pairs, unique_pairs=True)


@register(
    "docs_tfidf_top_terms",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, source, unnest({_SQL_TOKS}) AS term
        FROM (SELECT doc_id, source, lower(text) AS text FROM documents)
    ), df AS (
        SELECT term, count(DISTINCT doc_id) AS n_docs_with
        FROM toks GROUP BY term
    ), tf AS (
        SELECT source, term, count(*) AS n_term
        FROM toks GROUP BY source, term
    ), scored AS (
        SELECT tf.source, tf.term,
               CAST(tf.n_term AS BIGINT) AS n_term,
               round(tf.n_term * ln(
                   (SELECT count(*) FROM documents)
                   / CAST(df.n_docs_with AS DOUBLE)
               ), 6) AS tfidf
        FROM tf JOIN df ON tf.term = df.term
    ), ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY source ORDER BY tfidf DESC, term
        ) AS rnk
        FROM scored
    )
    SELECT source, term, n_term, tfidf, CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= 5
    """,
    description="TF-IDF top-5 distinguishing terms per source: "
    "corpus-level document frequency broadcast-joined onto per-source "
    "term counts; score rounded to 6 decimals because ln() is not "
    "bit-portable across libm implementations (1-ulp flap)",
)
def docs_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    toks = docs.select(
        "doc_id",
        "source",
        F.explode(
            F.split(F.trim(F.lower(F.col("text"))), r"\s+")
        ).alias("term"),
    )
    df_counts = toks.groupBy("term").agg(
        F.countDistinct("doc_id").alias("n_docs_with")
    )
    tf = toks.groupBy("source", "term").agg(F.count("*").alias("n_term"))
    scored = tf.join(F.broadcast(df_counts), "term").select(
        "source",
        "term",
        F.col("n_term").cast("long").alias("n_term"),
        F.round(
            F.col("n_term")
            * F.log(
                F.lit(float(n_docs)) / F.col("n_docs_with").cast("double")
            ),
            6,
        ).alias("tfidf"),
    )
    w = Window.partitionBy("source").orderBy(
        F.col("tfidf").desc(), F.col("term")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select(
            "source", "term", "n_term", "tfidf",
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


_SQL_QUALITY = f"""
               CAST(floor((
                   (CAST(len(list_distinct({_SQL_TOKS})) AS DOUBLE)
                        / len({_SQL_TOKS})) * 0.5
                 + (CAST(length(regexp_replace({_SQL_NOSPACE},
                        '[^a-zA-Z]', '', 'g')) AS DOUBLE)
                        / length({_SQL_NOSPACE})) * 0.4
                 + (1.0 - CAST(length(regexp_replace({_SQL_NOSPACE},
                        '[^0-9]', '', 'g')) AS DOUBLE)
                        / length({_SQL_NOSPACE})) * 0.1
               ) * 10000) AS BIGINT)
"""


@register(
    "docs_curation_pipeline",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, source, n_chars, lang, text,
               {_SQL_QUALITY} AS quality_score,
               {_sql_lang_hits('en')} AS h_en,
               {_sql_lang_hits('es')} AS h_es,
               {_sql_lang_hits('fr')} AS h_fr,
               {_sql_lang_hits('de')} AS h_de,
               len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                   t -> regexp_full_match(t, '[a-z]+'))) AS latin
        FROM documents
    ), lang_ok AS (
        SELECT *,
               CASE WHEN latin = 0 THEN 'zh'
                    WHEN h_en = greatest(h_en, h_es, h_fr, h_de) THEN 'en'
                    WHEN h_es = greatest(h_en, h_es, h_fr, h_de) THEN 'es'
                    WHEN h_fr = greatest(h_en, h_es, h_fr, h_de) THEN 'fr'
                    WHEN h_de = greatest(h_en, h_es, h_fr, h_de) THEN 'de'
               END AS lang_pred
        FROM scored
    ), filtered AS (
        SELECT * FROM lang_ok
        WHERE quality_score >= 6800 AND lang_pred = lang
    ), keepers AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (
                PARTITION BY regexp_replace(lower(trim(text)),
                                            '\\s+', ' ', 'g')
                ORDER BY doc_id
            ) AS _rn
            FROM filtered
        ) WHERE _rn = 1
    )
    SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
           quality_score
    FROM keepers
    ORDER BY ln(((doc_id * 2654435761) % 4294967296 + 1)
                / 4294967297.0) / n_chars DESC, doc_id
    LIMIT 50
    """,
    description="End-to-end corpus curation: quality gate -> language "
    "consistency gate -> exact-dedup keeper -> weighted sample "
    "(Efraimidis-Spirakis by n_chars).  The composition a training-"
    "data pipeline actually runs, as ONE declarative plan Catalyst "
    "optimizes whole; every stage is an already-oracle-checked "
    "operator, and the full chain is oracle-checked here",
)
def docs_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.dedup import normalize_text
    from ..operators.sampling import weighted_sample

    docs = load_table(spark, sf_dir, "documents")
    scored = with_language_id(with_quality_score(docs))
    filtered = scored.filter(
        (F.col("quality_score") >= 6800)
        & (F.col("lang_pred") == F.col("lang"))
    )
    # Project to the 5 surviving columns BEFORE the dedup window: the
    # shuffle then carries one normalized text per row instead of the
    # raw text plus every scoring helper column.
    slim = filtered.select(
        "doc_id",
        "source",
        "n_chars",
        "quality_score",
        normalize_text(F.col("text")).alias("_norm"),
    )
    w = Window.partitionBy("_norm").orderBy("doc_id")
    keepers = (
        slim.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("doc_id", "source", "n_chars", "quality_score")
    )
    return weighted_sample(keepers, "n_chars", k=50)


@register(
    "docs_leakage_safe_splits",
    oracle=f"""
    WITH RECURSIVE sh AS (
        SELECT doc_id AS _id, {_SQL_SHINGLES} AS _sh,
               len({_SQL_SHINGLES}) AS _n
        FROM documents
    ), ex AS (
        SELECT _id, _n, unnest(_sh) AS _shingle FROM sh
    ), pairs AS (
        SELECT a._id AS id_a, b._id AS id_b, a._n AS n_a, b._n AS n_b,
               count(*) AS n_common
        FROM ex a JOIN ex b ON a._shingle = b._shingle AND a._id < b._id
        GROUP BY a._id, b._id, a._n, b._n
    ), edges AS (
        SELECT id_a AS a, id_b AS b FROM pairs
        WHERE CAST(n_common AS DOUBLE) / (n_a + n_b - n_common) >= 0.5
    ), sym AS (
        SELECT a, b FROM edges UNION SELECT b, a FROM edges
        UNION SELECT a, a FROM edges UNION SELECT b, b FROM edges
    ), reach(id, r) AS (
        SELECT a, b FROM sym
        UNION
        SELECT reach.id, sym.b FROM reach JOIN sym ON reach.r = sym.a
    ), comp AS (
        SELECT id, min(r) AS cluster_id FROM reach GROUP BY id
    ), labeled AS (
        SELECT d.doc_id,
               CAST(COALESCE(c.cluster_id, d.doc_id) AS BIGINT)
                   AS cluster_id
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
    )
    SELECT doc_id, cluster_id,
           CASE WHEN ((cluster_id * 2654435761) % 4294967296 + 1)
                     / 4294967297.0 <= 0.9 THEN 'train'
                WHEN ((cluster_id * 2654435761) % 4294967296 + 1)
                     / 4294967297.0 <= 0.95 THEN 'val'
                ELSE 'test'
           END AS split
    FROM labeled
    """,
    description="Leakage-safe train/val/test assignment: the split is "
    "a deterministic hash of the near-dup CLUSTER id (exact-Jaccard "
    ">= 0.5 components), so paraphrases can never straddle train and "
    "eval — the upstream fix for the contamination the "
    "decontamination check catches downstream.  90/5/5 split",
)
def docs_leakage_safe_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import leakage_safe_splits

    docs = load_table(spark, sf_dir, "documents")
    pairs = shingle_pairs_jaccard(docs).filter(F.col("jaccard") >= 0.5)
    return leakage_safe_splits(docs, pairs)
