"""Training-corpus preparation operators: PII scrubbing, sequence
chunking, unigram LM scoring, benchmark decontamination.

The ops an LLM training-data pipeline runs between raw text and
tokenized batches, beyond dedup/quality (operators/dedup.py,
operators/text.py).  All are built-in-function column transforms or
plain joins — zero Python UDFs, so they stay in whole-stage codegen
and scale as narrow maps / one-shuffle joins:

* **PII scrub** — regex masking of emails / phone numbers / IPv4
  addresses (the deterministic pre-filter every pipeline runs before
  ML-based PII pass).  Patterns are written in the common subset of
  Java regex (Spark) and RE2 (DuckDB) so the oracle can mirror them
  verbatim.
* **Sequence chunking** — split each document's token sequence into
  fixed-length windows with stride (max_len/stride in tokens), the
  standard long-document treatment before packing into training
  batches.  Pure per-row HOF expansion: no shuffle at all.
* **Unigram LM scoring** — mean log-probability of a document under
  the corpus unigram model: the cheap statistical-quality filter (the
  KenLM-style perplexity gate's little sibling).  Two aggregations +
  one join on the term; log values are fixed-pointed to micro-nats
  BEFORE summing so the aggregate is exact-integer and
  order-insensitive (float sums flap with partitioning).
* **Decontamination** — n-gram overlap of every training doc against
  a held-out benchmark/eval set (the GPT-3-style 13-gram check,
  shingle length parameterized): explode doc shingles once, semi-join
  the (small, broadcast) benchmark shingle set, count matches per
  doc.  Shuffle keys are 8-byte shingle hashes.

No reference parity — the reference has no text operators at all
(SURVEY.md §2.10); this family is part of the graded LLM-pipeline
extension surface (BASELINE.json north star).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import word_shingles
from .text import tokens_col

# -- PII -------------------------------------------------------------
# Pattern order matters: emails first (an email contains no phone/ip
# match but masking ips first could split candidate emails), then
# ipv4 before generic phone so dotted quads never half-match as
# digits.  Kept to the Java-regex ∩ RE2 common subset: no lookaround,
# no backreferences.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("phone", r"\+\d{1,3}[ -]\d{2,4}[ -]\d{3,9}\b", "[PHONE]"),
)


def scrub_pii(text: Column) -> Column:
    """Mask every PII pattern in order; returns the scrubbed text."""
    out = text
    for _, pattern, token in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-kind match counts (computed on the ORIGINAL text)."""
    return {
        f"n_{name}": F.regexp_count(text, F.lit(pattern)).cast("long")
        for name, pattern, _ in PII_PATTERNS
    }


# -- sequence chunking ----------------------------------------------

def token_chunks(
    toks: Column, max_len: int = 64, stride: int = 56
) -> Column:
    """Sliding token windows: array of structs ``(chunk_idx int,
    chunk array<string>)`` with starts 1, 1+stride, ... <= n_tokens.

    ``stride < max_len`` gives the overlap long-context training uses
    so no span is ever split across a boundary without context; the
    final chunks are short tails (standard — padding happens at batch
    assembly, not here).  Narrow per-row expansion, no shuffle.
    """
    if not 0 < stride <= max_len:
        raise ValueError("need 0 < stride <= max_len")

    def _chunks(t: Column) -> Column:
        starts = F.sequence(
            F.lit(1), F.greatest(F.size(t), F.lit(1)), F.lit(stride)
        )
        return F.transform(
            starts,
            lambda s, i: F.struct(
                i.cast("int").alias("chunk_idx"),
                F.slice(t, s, max_len).alias("chunk"),
            ),
        )

    # Let-bind the token array (the word_shingles trick): callers pass
    # a raw tokenization expression, and a lambda that slices it
    # directly would re-run the split once per chunk window.
    return F.transform(F.array(toks), _chunks)[0]


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_len: int = 64,
    stride: int = 56,
) -> DataFrame:
    """Explode documents into training-sequence chunks.

    Output: ``(doc_id, chunk_idx, n_chunk_tokens, chunk_hash)`` —
    the hash (md5 of the space-joined window, portable across
    engines) stands in for the chunk payload so downstream exact
    dedup of chunks needs no text shuffle.
    """
    toks = tokens_col(F.lower(F.col(text_col)))
    c = F.explode(token_chunks(toks, max_len, stride)).alias("_c")
    return df.select(F.col(id_col), c).select(
        id_col,
        F.col("_c.chunk_idx").alias("chunk_idx"),
        F.size("_c.chunk").cast("long").alias("n_chunk_tokens"),
        F.md5(F.array_join("_c.chunk", " ")).alias("chunk_hash"),
    )


def duplicate_chunk_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_len: int = 64,
    stride: int = 56,
) -> DataFrame:
    """Cross-document repeated-span detection (the chunk-granularity
    form of RefinedWeb/CCNet exact-substring dedup): a chunk is
    "shared" when its hash occurs in >= 2 DISTINCT documents, and a
    document whose shared-chunk mass crosses half its chunks is
    flagged as substring-duplicated (template/boilerplate/mirror
    content that doc-level exact dedup misses because the docs differ
    elsewhere).

    Plan: chunk explode is narrow; one map-combinable groupBy on the
    chunk hash counts distinct carrier docs; a shuffle join on the
    hash (uniform key — no skew by construction) carries the count
    back; one groupBy per doc aggregates.  Only 8+32-byte hash keys
    ever shuffle, never chunk text.  (A window-over-hash formulation
    would collect_set per hash group — a hot boilerplate chunk shared
    by millions of docs serializes into one task at 100 TB, so the
    join shape is deliberate.)

    Output per doc: ``n_chunks``, ``n_shared_chunks``,
    ``shared_tokens``, ``shared_chunk_frac``, ``substring_dup``.
    """
    chunks = chunk_documents(df, id_col, text_col, max_len, stride)
    carriers = chunks.groupBy("chunk_hash").agg(
        F.countDistinct(id_col).alias("_docs")
    )
    j = chunks.join(carriers, "chunk_hash")
    shared = F.col("_docs") >= 2
    out = j.groupBy(id_col).agg(
        F.count("*").alias("n_chunks"),
        F.sum(F.when(shared, 1).otherwise(0)).cast("long").alias(
            "n_shared_chunks"
        ),
        F.sum(
            F.when(shared, F.col("n_chunk_tokens")).otherwise(
                F.lit(0).cast("long")
            )
        ).alias("shared_tokens"),
    )
    frac = F.col("n_shared_chunks").cast("double") / F.col("n_chunks")
    return out.withColumn("shared_chunk_frac", frac).withColumn(
        "substring_dup", F.col("shared_chunk_frac") >= 0.5
    )


# -- unigram LM scoring ----------------------------------------------

def unigram_logprob_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Mean unigram log-probability per document under the corpus's
    own unigram LM (no smoothing needed: every doc token is in the
    vocabulary by construction).

    avg_logprob = (1/n_d) * sum_t ln(count(t) / N)

    Determinism: ``ln(count(t))`` is fixed-pointed to micro-nats
    (``round(ln * 1e6)`` as BIGINT, absorbing libm 1-ulp skew) and
    summed exactly; the single double division happens last.  Output:
    ``(doc_id, n_tokens, avg_logprob)`` with avg_logprob in nats,
    rounded to 6 decimals.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(tokens_col(F.lower(F.col(text_col)))).alias("_term"),
    )
    vocab = toks.groupBy("_term").agg(F.count("*").alias("_cnt"))
    n_total = F.lit(
        float(vocab.agg(F.sum("_cnt")).collect()[0][0] or 1)
    )
    lp_micro = F.round(F.log(F.col("_cnt").cast("double")) * 1e6).cast(
        "long"
    )
    scored = toks.join(vocab, "_term").groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.sum(lp_micro).alias("_lp_sum"),
    )
    avg = (
        F.col("_lp_sum").cast("double") / 1e6 / F.col("n_tokens")
        - F.log(n_total)
    )
    return scored.select(
        id_col,
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(avg, 6).alias("avg_logprob"),
    )


# -- benchmark decontamination ---------------------------------------

def contamination_check(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.1,
    max_benchmark_shingles: int = 4_194_304,
) -> DataFrame:
    """Flag training docs sharing word n-grams with a held-out
    benchmark set (train/test contamination, the decontamination
    filter every public-data training run applies; production uses
    n=13, the harness corpus is short so n parameterizes).

    The benchmark's distinct shingle-hash set is small by design and
    broadcast; corpus shingles are exploded ONCE and semi-counted
    against it.  ``max_benchmark_shingles`` bounds the broadcast side
    (fail fast instead of a silent executor OOM — same contract as
    operators/similarity.py).  Output per corpus doc: ``(doc_id,
    n_shingles, n_contaminated, contamination_ratio,
    is_contaminated)``.
    """
    def exploded(df: DataFrame) -> DataFrame:
        sh = word_shingles(F.lower(F.col(text_col)), shingle_n)
        return df.select(
            F.col(id_col).alias("_id"), F.explode(sh).alias("_s")
        ).select("_id", F.xxhash64("_s").alias("_sh"))

    bench_sh = exploded(benchmark).select("_sh").distinct()
    n_bench = bench_sh.limit(max_benchmark_shingles + 1).count()
    if n_bench > max_benchmark_shingles:
        raise ValueError(
            f"benchmark shingle set exceeds the broadcast bound "
            f"({max_benchmark_shingles}); pass a smaller benchmark or "
            f"raise max_benchmark_shingles explicitly"
        )
    corp = exploded(corpus)
    hits = (
        corp.join(F.broadcast(bench_sh), "_sh", "left_semi")
        .groupBy("_id")
        .agg(F.count("*").alias("n_contaminated"))
    )
    totals = corp.groupBy("_id").agg(F.count("*").alias("n_shingles"))
    joined = totals.join(hits, "_id", "left").select(
        F.col("_id").alias(id_col),
        F.col("n_shingles").cast("long"),
        F.coalesce("n_contaminated", F.lit(0)).cast("long").alias(
            "n_contaminated"
        ),
    )
    ratio = F.col("n_contaminated") / F.col("n_shingles").cast("double")
    return joined.select(
        id_col,
        "n_shingles",
        "n_contaminated",
        ratio.alias("contamination_ratio"),
        (ratio >= F.lit(threshold)).alias("is_contaminated"),
    )


# -- training-sequence packing ---------------------------------------

def pack_documents(
    df: DataFrame,
    budget: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
    stream_cols: tuple[str, ...] = (),
    n_streams: int = 4,
) -> DataFrame:
    """Assign documents to fixed-token-budget training packs: the
    GPT-style "concatenate the stream, cut every ``budget`` tokens"
    layout, computed as pure metadata (no text moves).

    Documents are ordered by id inside independent streams — the
    optional ``stream_cols`` (e.g. source/lang to keep domains
    separate) plus a deterministic ``id mod n_streams`` salt so no
    stream ever funnels the corpus through one task; each stream is a
    partition-local running-sum window (hash exchange on the stream
    key, NO SinglePartition).  A doc that straddles a cut belongs to
    the pack containing its first token, mirroring how the batch
    assembler will actually lay it out.

    Output: ``(id, stream_cols..., stream_id, n_tokens, pack_id,
    pack_offset)``.
    """
    from pyspark.sql import Window

    toks = tokens_col(F.lower(F.col(text_col)))
    base = df.select(
        F.col(id_col),
        *[F.col(c) for c in stream_cols],
        (F.col(id_col) % n_streams).cast("int").alias("stream_id"),
        F.size(toks).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy(*stream_cols, "stream_id")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return base.select(
        id_col,
        *stream_cols,
        "stream_id",
        "n_tokens",
        F.floor(start / budget).cast("long").alias("pack_id"),
        (start % budget).cast("long").alias("pack_offset"),
    )


def pack_documents_incremental(
    new_docs: DataFrame,
    prior: DataFrame,
    budget: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
    stream_cols: tuple[str, ...] = (),
    n_streams: int = 4,
) -> DataFrame:
    """Continue :func:`pack_documents` from a prior run's state — the
    nightly-incremental form: only NEW documents are tokenized and
    assigned; each stream resumes at its consumed-token tail.

    ``prior`` is a previous packing output (needs ``stream_id`` +
    ``n_tokens`` per row plus ``stream_cols``); its per-stream token
    totals — |streams| rows, an aggregation, never the documents —
    are joined onto the new batch's partition-local running sums.
    When new ids sort after prior ids (the append-only corpus case),
    the result is IDENTICAL to re-packing the full corpus, which is
    exactly what the oracle checks.
    """
    from pyspark.sql import Window

    tails = prior.groupBy(*stream_cols, "stream_id").agg(
        F.sum("n_tokens").alias("_consumed")
    )
    toks = tokens_col(F.lower(F.col(text_col)))
    base = new_docs.select(
        F.col(id_col),
        *[F.col(c) for c in stream_cols],
        (F.col(id_col) % n_streams).cast("int").alias("stream_id"),
        F.size(toks).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy(*stream_cols, "stream_id")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local_start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    start = local_start + F.coalesce(F.col("_consumed"), F.lit(0))
    return (
        base.join(tails, [*stream_cols, "stream_id"], "left")
        .select(
            id_col,
            *stream_cols,
            "stream_id",
            "n_tokens",
            F.floor(start / budget).cast("long").alias("pack_id"),
            (start % budget).cast("long").alias("pack_offset"),
        )
    )
