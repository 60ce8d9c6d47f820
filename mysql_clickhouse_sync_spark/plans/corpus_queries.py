"""Corpus-preparation queries: PII scrub, chunking, LM scoring,
decontamination (operators/corpus.py) over ``documents``.

Registered AFTER the curated DRIVER_WINDOW (added later in round 3);
each has a full DuckDB oracle and is covered by tools/check_oracle.py
— rotate into the graded window next round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.corpus import (
    PII_PATTERNS,
    chunk_documents,
    contamination_check,
    pii_counts,
    scrub_pii,
    unigram_logprob_scores,
)
from ..operators.sampling import domain_mixture
from ..operators.text import with_token_stats
from ..sources.parquet import load_table
from .registry import register

_SQL_LTOKS = r"string_split_regex(trim(lower(text)), '\s+')"
_SQL_LSHINGLES = (
    f"list_distinct(list_transform("
    f"range(1, greatest(len({_SQL_LTOKS}) - 2, 1) + 1),"
    f" i -> array_to_string(({_SQL_LTOKS})[i:i+2], ' ')))"
)

# The harness corpus is synthetic word-salad with no PII, so the PII
# query appends a deterministic contact line per doc (same expression
# in both engines) — the scrub then has real work whose masked output
# must hash-match.
_CONTACT_SPARK = (
    "concat(text, ' contact user', doc_id, '@mail.example.org or +1 555 ',"
    " lpad(cast(doc_id as string), 7, '0'), ' at 10.2.', doc_id % 256,"
    " '.', (doc_id * 7) % 256)"
)
_CONTACT_SQL = (
    "concat(text, ' contact user', CAST(doc_id AS VARCHAR),"
    " '@mail.example.org or +1 555 ',"
    " lpad(CAST(doc_id AS VARCHAR), 7, '0'), ' at 10.2.',"
    " CAST(doc_id % 256 AS VARCHAR), '.',"
    " CAST((doc_id * 7) % 256 AS VARCHAR))"
)

_P_EMAIL, _P_IPV4, _P_PHONE = (p for _, p, _ in PII_PATTERNS)


@register(
    "corpus_pii_scrub",
    oracle=f"""
    WITH aug AS (
        SELECT doc_id, {_CONTACT_SQL} AS t FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{_P_EMAIL}')) AS BIGINT)
               AS n_email,
           CAST(len(regexp_extract_all(t, '{_P_IPV4}')) AS BIGINT)
               AS n_ipv4,
           CAST(len(regexp_extract_all(t, '{_P_PHONE}')) AS BIGINT)
               AS n_phone,
           md5(regexp_replace(regexp_replace(regexp_replace(t,
               '{_P_EMAIL}', '[EMAIL]', 'g'),
               '{_P_IPV4}', '[IP]', 'g'),
               '{_P_PHONE}', '[PHONE]', 'g')) AS scrubbed_hash
    FROM aug
    """,
    description="PII scrubbing: mask emails / IPv4 / phone numbers "
    "with portable regexes (Java-regex ∩ RE2 subset, mirrored "
    "verbatim in the oracle) and count matches per kind.  Narrow "
    "per-row map, no shuffle; the masked text is compared by md5 so "
    "the whole byte-level scrub is oracle-verified",
)
def corpus_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_CONTACT_SPARK).alias("t")
    )
    counts = pii_counts(F.col("t"))
    return docs.select(
        "doc_id",
        counts["n_email"].alias("n_email"),
        counts["n_ipv4"].alias("n_ipv4"),
        counts["n_phone"].alias("n_phone"),
        F.md5(scrub_pii(F.col("t"))).alias("scrubbed_hash"),
    )


@register(
    "corpus_doc_chunks",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, {_SQL_LTOKS} AS toks FROM documents
    )
    SELECT doc_id,
           CAST(i AS INT) AS chunk_idx,
           CAST(len(toks[(i * 56 + 1):(i * 56 + 64)]) AS BIGINT)
               AS n_chunk_tokens,
           md5(array_to_string(toks[(i * 56 + 1):(i * 56 + 64)], ' '))
               AS chunk_hash
    FROM t, unnest(range(0,
        CAST(floor((greatest(len(toks), 1) - 1) / 56) AS BIGINT) + 1))
        AS u(i)
    """,
    description="Sequence chunking for training batches: sliding "
    "64-token windows with stride 56 (8-token overlap) per document, "
    "chunk payload carried as a portable md5 so chunk-level dedup "
    "needs no text shuffle.  Pure per-row HOF expansion — zero "
    "shuffle; at 100 TB this is a map stage",
)
def corpus_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunk_documents(
        load_table(spark, sf_dir, "documents"), max_len=64, stride=56
    )


@register(
    "corpus_lm_quality",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest({_SQL_LTOKS}) AS term FROM documents
    ), vocab AS (
        SELECT term, count(*) AS cnt FROM toks GROUP BY term
    ), scored AS (
        SELECT doc_id, count(*) AS n_tokens,
               SUM(CAST(round(ln(CAST(cnt AS DOUBLE)) * 1e6) AS BIGINT))
                   AS lp
        FROM toks JOIN vocab USING (term)
        GROUP BY doc_id
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           round(CAST(lp AS DOUBLE) / 1e6 / n_tokens
                 - ln((SELECT CAST(count(*) AS DOUBLE) FROM toks)),
                 6) AS avg_logprob
    FROM scored
    """,
    description="Unigram LM quality score: mean log-probability per "
    "doc under the corpus's own unigram model (the cheap statistical "
    "gate before a real perplexity filter).  ln() fixed-pointed to "
    "micro-nats pre-sum so the aggregate is exact-integer and "
    "order-insensitive; one term-keyed join, map-side combinable",
)
def corpus_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return unigram_logprob_scores(load_table(spark, sf_dir, "documents"))


@register(
    "corpus_contamination",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id, unnest({_SQL_LSHINGLES}) AS s FROM documents
    ), bench AS (
        SELECT DISTINCT s FROM sh WHERE doc_id % 20 = 0
    ), corp AS (
        SELECT * FROM sh WHERE doc_id % 20 <> 0
    ), hits AS (
        SELECT doc_id, count(*) AS n_cont FROM corp
        WHERE s IN (SELECT s FROM bench) GROUP BY doc_id
    ), tot AS (
        SELECT doc_id, count(*) AS n_shingles FROM corp GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(t.n_shingles AS BIGINT) AS n_shingles,
           CAST(COALESCE(h.n_cont, 0) AS BIGINT) AS n_contaminated,
           COALESCE(h.n_cont, 0) / CAST(t.n_shingles AS DOUBLE)
               AS contamination_ratio,
           COALESCE(h.n_cont, 0) / CAST(t.n_shingles AS DOUBLE) >= 0.1
               AS is_contaminated
    FROM tot t LEFT JOIN hits h USING (doc_id)
    """,
    description="Train/test decontamination: word-3-gram overlap of "
    "every training doc against the held-out benchmark slice "
    "(doc_id % 20 = 0 stands in for an eval set; production uses "
    "13-grams).  Benchmark shingle-hash set is broadcast; corpus "
    "shingles explode ONCE and semi-join it — shuffle carries 8-byte "
    "hashes keyed per doc",
)
def corpus_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    corpus = docs.filter(F.col("doc_id") % 20 != 0)
    return contamination_check(corpus, bench, shingle_n=3)


@register(
    "corpus_pack_assignments",
    oracle=f"""
    WITH base AS (
        SELECT doc_id, source, lang,
               CAST(doc_id % 4 AS INT) AS stream_id,
               CAST(len({_SQL_LTOKS}) AS BIGINT) AS n_tokens
        FROM documents
    ), cum AS (
        SELECT *,
               SUM(n_tokens) OVER (
                   PARTITION BY source, lang, stream_id ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) - n_tokens AS start
        FROM base
    )
    SELECT doc_id, source, lang, stream_id, n_tokens,
           CAST(floor(start / 256) AS BIGINT) AS pack_id,
           CAST(start % 256 AS BIGINT) AS pack_offset
    FROM cum
    """,
    description="Training-sequence packing assignment: concatenate "
    "each (source, lang, id%4) stream in id order and cut every 256 "
    "tokens — pack id + offset per doc as pure metadata, no text "
    "movement.  Streams are salted so no partition-local window ever "
    "funnels the corpus through one task (the distributed form of "
    "GPT-style pack-and-cut)",
)
def corpus_pack_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.corpus import pack_documents

    return pack_documents(
        load_table(spark, sf_dir, "documents"),
        budget=256,
        stream_cols=("source", "lang"),
        n_streams=4,
    )


def _curation_v2_oracle() -> str:
    """Oracle assembled from the same fragments the stage queries use
    (text_queries' quality/language SQL), so every gate stays
    bit-consistent with its standalone twin."""
    from .text_queries import _SQL_QUALITY, _sql_lang_hits

    return f"""
    WITH scored AS (
        SELECT doc_id, source, lang, text,
               {_SQL_QUALITY} AS quality_score,
               {_sql_lang_hits('en')} AS h_en,
               {_sql_lang_hits('es')} AS h_es,
               {_sql_lang_hits('fr')} AS h_fr,
               {_sql_lang_hits('de')} AS h_de,
               len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                   t -> regexp_full_match(t, '[a-z]+'))) AS latin
        FROM documents
        WHERE doc_id % 20 <> 0
    ), lang_ok AS (
        SELECT *,
               CASE WHEN latin = 0 THEN 'zh'
                    WHEN h_en = greatest(h_en, h_es, h_fr, h_de) THEN 'en'
                    WHEN h_es = greatest(h_en, h_es, h_fr, h_de) THEN 'es'
                    WHEN h_fr = greatest(h_en, h_es, h_fr, h_de) THEN 'fr'
                    WHEN h_de = greatest(h_en, h_es, h_fr, h_de) THEN 'de'
               END AS lang_pred
        FROM scored
    ), gated AS (
        SELECT * FROM lang_ok
        WHERE quality_score >= 6800 AND lang_pred = lang
    ), keepers AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (
                PARTITION BY regexp_replace(lower(trim(text)),
                                            '\\s+', ' ', 'g')
                ORDER BY doc_id
            ) AS _rn FROM gated
        ) WHERE _rn = 1
    ), sh AS (
        SELECT doc_id, unnest({_SQL_LSHINGLES}) AS s FROM documents
    ), bench AS (
        SELECT DISTINCT s FROM sh WHERE doc_id % 20 = 0
    ), contam AS (
        SELECT k.doc_id,
               count(*) AS n_sh,
               count(*) FILTER (sh.s IN (SELECT s FROM bench)) AS n_hit
        FROM keepers k JOIN sh ON sh.doc_id = k.doc_id
        GROUP BY k.doc_id
    ), clean AS (
        SELECT k.* FROM keepers k JOIN contam c ON c.doc_id = k.doc_id
        WHERE c.n_hit / CAST(c.n_sh AS DOUBLE) < 0.1
    ), base AS (
        SELECT doc_id, source, lang,
               CAST(doc_id % 4 AS INT) AS stream_id,
               CAST(len({_SQL_LTOKS}) AS BIGINT) AS n_tokens
        FROM clean
    ), cum AS (
        SELECT *,
               SUM(n_tokens) OVER (
                   PARTITION BY source, lang, stream_id ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) - n_tokens AS start
        FROM base
    )
    SELECT doc_id, source, lang, stream_id, n_tokens,
           CAST(floor(start / 256) AS BIGINT) AS pack_id,
           CAST(start % 256 AS BIGINT) AS pack_offset
    FROM cum
    """


@register(
    "corpus_curation_v2",
    oracle=_curation_v2_oracle(),
    description="The full corpus pipeline as ONE declarative plan "
    "Catalyst optimizes whole: quality gate -> language-consistency "
    "gate -> exact-dedup keeper -> benchmark decontamination "
    "(< 10% 3-gram overlap vs the held-out doc_id%20 slice) -> "
    "training-pack assignment (salted streams, budget 256).  Every "
    "stage is an already-oracle-checked operator; the composition is "
    "oracle-checked end-to-end here.  This is the job a training-data "
    "team runs nightly at 100 TB: scan-heavy map gates, one dedup "
    "window, one broadcast semi-join, partition-local pack windows",
)
def corpus_curation_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.corpus import contamination_check, pack_documents
    from ..operators.dedup import normalize_text
    from ..operators.text import with_language_id, with_quality_score

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    corpus = docs.filter(F.col("doc_id") % 20 != 0)
    scored = with_language_id(with_quality_score(corpus))
    gated = scored.filter(
        (F.col("quality_score") >= 6800)
        & (F.col("lang_pred") == F.col("lang"))
    ).select("doc_id", "source", "lang", "text",
             normalize_text(F.col("text")).alias("_norm"))
    w = Window.partitionBy("_norm").orderBy("doc_id")
    keepers = (
        gated.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("doc_id", "source", "lang", "text")
    )
    contam = contamination_check(keepers, bench, shingle_n=3)
    clean = keepers.join(
        contam.filter(~F.col("is_contaminated")).select("doc_id"),
        "doc_id",
    )
    return pack_documents(
        clean, budget=256, stream_cols=("source", "lang"), n_streams=4
    )


@register(
    "corpus_pack_incremental",
    oracle=f"""
    WITH base AS (
        SELECT doc_id, source, lang,
               CAST(doc_id % 4 AS INT) AS stream_id,
               CAST(len({_SQL_LTOKS}) AS BIGINT) AS n_tokens
        FROM documents
    ), cum AS (
        SELECT *,
               SUM(n_tokens) OVER (
                   PARTITION BY source, lang, stream_id ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) - n_tokens AS start
        FROM base
    )
    SELECT doc_id, source, lang, stream_id, n_tokens,
           CAST(floor(start / 256) AS BIGINT) AS pack_id,
           CAST(start % 256 AS BIGINT) AS pack_offset
    FROM cum
    WHERE doc_id >= 250
    """,
    description="Incremental pack assignment: docs >= 250 arrive as "
    "tonight's batch and resume packing from the prior run's "
    "per-stream consumed-token tails (an aggregation of the prior "
    "output — the documents are never re-tokenized).  The oracle is "
    "the FULL recompute restricted to the new batch: on an "
    "append-only corpus the incremental result must be identical, "
    "and the hash compare proves it",
)
def corpus_pack_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.corpus import pack_documents, pack_documents_incremental

    docs = load_table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") < 250)
    new = docs.filter(F.col("doc_id") >= 250)
    prior = pack_documents(
        old, budget=256, stream_cols=("source", "lang"), n_streams=4
    )
    return pack_documents_incremental(
        new, prior, budget=256, stream_cols=("source", "lang"), n_streams=4
    )


@register(
    "docs_domain_mixture",
    oracle=r"""
    WITH d AS (
        SELECT doc_id, source,
               CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
                   AS n_tokens
        FROM documents
    ), per AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS domain_tokens
        FROM d GROUP BY source
    ), tot AS (
        SELECT CAST(sum(domain_tokens) AS BIGINT) AS total_tokens,
               CAST(count(*) AS BIGINT) AS n_domains
        FROM per
    ), rates AS (
        SELECT source, n_docs, domain_tokens,
               least(1.0, (CAST(total_tokens AS DOUBLE) * 0.4 / n_domains)
                          / CAST(domain_tokens AS DOUBLE)) AS rate
        FROM per, tot
    ), sel AS (
        SELECT d.source,
               CAST(sum(CASE WHEN ((doc_id * 2654435761) % 4294967296 + 1)
                                  / 4294967297.0 < rate
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_selected,
               CAST(sum(CASE WHEN ((doc_id * 2654435761) % 4294967296 + 1)
                                  / 4294967297.0 < rate
                             THEN n_tokens ELSE 0 END) AS BIGINT)
                   AS selected_tokens
        FROM d JOIN rates USING (source) GROUP BY d.source
    )
    SELECT rates.source, n_docs, domain_tokens, rate, n_selected,
           selected_tokens
    FROM rates JOIN sel USING (source)
    """,
    description="Domain-mixture sampling under a global token budget "
    "(DoReMi/Pile-style static mixing, budget = 40% of corpus token "
    "mass, equal share per source domain, rate capped at 1.0): "
    "deterministic id-hash selection, so the realized mixture is "
    "retry-stable and oracle-reproducible.  Plan: tiny per-domain "
    "aggregate + broadcast rate join back to the scan — the corpus is "
    "never shuffled on a text-bearing key",
)
def docs_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = with_token_stats(
        load_table(spark, sf_dir, "documents")
    ).select("doc_id", "source", "n_tokens")
    return domain_mixture(
        docs, domain_col="source", token_col="n_tokens", budget_frac=0.4
    )


@register(
    "docs_duplicate_chunks",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, {_SQL_LTOKS} AS toks FROM documents
    ), ch AS (
        SELECT doc_id,
               CAST(len(toks[(i * 56 + 1):(i * 56 + 64)]) AS BIGINT)
                   AS n_chunk_tokens,
               md5(array_to_string(toks[(i * 56 + 1):(i * 56 + 64)], ' '))
                   AS chunk_hash
        FROM t, unnest(range(0,
            CAST(floor((greatest(len(toks), 1) - 1) / 56) AS BIGINT) + 1))
            AS u(i)
    ), carriers AS (
        SELECT chunk_hash, count(DISTINCT doc_id) AS docs
        FROM ch GROUP BY chunk_hash
    ), agg AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_chunks,
               CAST(sum(CASE WHEN docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_shared_chunks,
               CAST(sum(CASE WHEN docs >= 2 THEN n_chunk_tokens
                             ELSE 0 END) AS BIGINT) AS shared_tokens
        FROM ch JOIN carriers USING (chunk_hash)
        GROUP BY doc_id
    )
    SELECT doc_id, n_chunks, n_shared_chunks, shared_tokens,
           CAST(n_shared_chunks AS DOUBLE) / n_chunks
               AS shared_chunk_frac,
           CAST(n_shared_chunks AS DOUBLE) / n_chunks >= 0.5
               AS substring_dup
    FROM agg
    """,
    description="Cross-document repeated-span detection (chunk-level "
    "exact-substring dedup, RefinedWeb-style): a chunk shared by >= 2 "
    "distinct docs counts toward its carriers' shared mass; docs with "
    ">= 50% shared chunks are flagged as substring duplicates "
    "(templates/mirrors that doc-level exact dedup misses).  Only "
    "hash keys shuffle; the carrier count is a map-combinable groupBy "
    "+ uniform-key join, deliberately NOT a window (a hot boilerplate "
    "chunk would serialize a window into one task at 100 TB)",
)
def docs_duplicate_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.corpus import duplicate_chunk_stats

    return duplicate_chunk_stats(load_table(spark, sf_dir, "documents"))
