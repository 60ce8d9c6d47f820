"""Text-analysis operators for LLM training-data pipelines.

All hot-path logic is built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage codegen) — no Python UDFs.  At 100 TB these are pure
narrow map operators: no shuffle until the caller aggregates.

Determinism: token counts / ratios are integer counts and single
double divisions, so the DuckDB oracles match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic.  Deliberately small + public common words.
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "por", "con", "los"),
    "fr": ("le", "la", "de", "et", "un", "les", "des", "en", "du", "que"),
    "de": ("der", "die", "und", "das", "von", "zu", "den", "mit", "ein", "im"),
}


def tokens_col(text: Column) -> Column:
    """Whitespace tokenization (regex split on runs of whitespace)."""
    return F.split(F.trim(text), r"\s+")


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append n_tokens / n_distinct_tokens / avg token length."""
    toks = tokens_col(F.col(text_col))
    return (
        df.withColumn("n_tokens", F.size(toks).cast("long"))
        .withColumn(
            "n_distinct_tokens", F.size(F.array_distinct(toks)).cast("long")
        )
        .withColumn(
            "avg_token_len",
            (F.length(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", ""))
             .cast("double") / F.size(toks)),
        )
    )


def _word_ngrams(toks: Column, n: int) -> Column:
    """All word n-grams (NOT distinct — repetition is the signal).

    Indexed ``transform`` over a 1..len-n+1 sequence; empty array when
    the doc is shorter than n tokens (``sequence`` would count DOWN for
    an empty range, so the guard is explicit).
    """
    count = F.size(toks) - F.lit(n - 1)
    return F.when(
        count >= 1,
        F.transform(
            F.sequence(F.lit(1), count),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + F.lit(j)) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _run_stats(sorted_arr: Column) -> Column:
    """One ``aggregate`` pass over a SORTED n-gram array returning
    ``struct(best, dup)``:

    * ``best`` — longest run of equal values = multiplicity of the most
      frequent n-gram;
    * ``dup``  — total elements in runs of length >= 2 = every
      occurrence of any value that occurs more than once (Gopher's
      duplicate-n-gram mass at token granularity).

    CRITICAL perf shape: the array is the HOF's *traversed* argument,
    so it is evaluated ONCE per row; the lambda touches only the
    accumulator and the current element.  (Indexing a non-materialized
    array with ``element_at`` inside a lambda re-evaluates the whole
    array expression per element — lambdas defeat subexpression reuse —
    which turns the scan O(n^2): measured 500x slower on this exact
    operator.)  Sentinel '' cannot collide: n-grams of non-empty tokens
    are never empty.
    """
    init = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
        F.lit(0).alias("dup"),
    )

    def merge(acc: Column, x: Column) -> Column:
        same = x == acc.prev
        run2 = F.when(same, acc.run + F.lit(1)).otherwise(F.lit(1))
        closed = F.when(acc.run >= 2, acc.run).otherwise(F.lit(0))
        return F.struct(
            x.alias("prev"),
            run2.alias("run"),
            F.greatest(acc.best, run2).alias("best"),
            F.when(same, acc.dup).otherwise(acc.dup + closed).alias("dup"),
        )

    def finish(acc: Column) -> Column:
        closed = F.when(acc.run >= 2, acc.run).otherwise(F.lit(0))
        return F.struct(
            acc.best.alias("best"), (acc.dup + closed).alias("dup")
        )

    return F.aggregate(sorted_arr, init, merge, finish)


def with_repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    top_bigram_max_frac: float = 0.2,
    dup_5gram_max_frac: float = 0.3,
) -> DataFrame:
    """Gopher-style intra-document repetition filters (Rae et al. 2021,
    "Scaling Language Models", Table A1) at word-n-gram granularity:

    * ``top_bigram_frac``  — fraction of all word bigrams taken by the
      single most frequent bigram (catches "free online casino free
      online casino ..." boilerplate);
    * ``dup_5gram_frac``   — fraction of word 5-grams whose value occurs
      more than once in the doc (all occurrences counted);
    * ``repetition_ok``    — both under their thresholds (Gopher uses
      0.18/0.20 for top-2-gram and ~0.30 for dup-5-gram mass).

    100 TB design: pure narrow per-row HOF compute — ``array_sort`` +
    one ``aggregate`` scan per n-gram size, nothing leaves the row, no
    explode/shuffle; cost is O(len·log len) per document regardless of
    corpus size.  The explode+groupBy formulation (what the DuckDB
    oracle runs) would shuffle the full n-gram mass of the corpus.
    Every intermediate array is materialized as a column so each is
    computed once per row (see ``_run_stats`` on why inlining them
    into lambdas is O(n^2)).
    """
    d = (
        df.withColumn("_toks", tokens_col(F.col(text_col)))
        .withColumn("_bi", F.array_sort(_word_ngrams(F.col("_toks"), 2)))
        .withColumn("_five", F.array_sort(_word_ngrams(F.col("_toks"), 5)))
        .withColumn("_bs", _run_stats(F.col("_bi")))
        .withColumn("_fs", _run_stats(F.col("_five")))
    )
    d = (
        d.withColumn("n_bigrams", F.size(F.col("_bi")).cast("long"))
        .withColumn("top_bigram_count", F.col("_bs.best").cast("long"))
        .withColumn("n_5grams", F.size(F.col("_five")).cast("long"))
        .withColumn("dup_5gram_count", F.col("_fs.dup").cast("long"))
        .drop("_toks", "_bi", "_five", "_bs", "_fs")
    )
    top_frac = F.when(
        F.col("n_bigrams") > 0,
        F.col("top_bigram_count").cast("double") / F.col("n_bigrams"),
    ).otherwise(F.lit(0.0))
    dup_frac = F.when(
        F.col("n_5grams") > 0,
        F.col("dup_5gram_count").cast("double") / F.col("n_5grams"),
    ).otherwise(F.lit(0.0))
    return (
        d.withColumn("top_bigram_frac", top_frac)
        .withColumn("dup_5gram_frac", dup_frac)
        .withColumn(
            "repetition_ok",
            (F.col("top_bigram_frac") <= F.lit(top_bigram_max_frac))
            & (F.col("dup_5gram_frac") <= F.lit(dup_5gram_max_frac)),
        )
    )


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality components + a composite score.

    Components (all exact-integer-ratio doubles):
    * ``distinct_ratio``  — vocabulary diversity (near-0 = degenerate
      repetition, a classic low-quality signal);
    * ``alpha_ratio``     — alphabetic chars / all chars;
    * ``digit_ratio``     — digits / all chars;
    * ``mean_tok``        — mean token length (2..12 is "wordlike").
    """
    d = with_token_stats(df, text_col)
    stripped = F.regexp_replace(F.col(text_col), r"\s+", "")
    n_chars_nosp = F.length(stripped).cast("double")
    d = (
        d.withColumn(
            "distinct_ratio",
            F.col("n_distinct_tokens").cast("double") / F.col("n_tokens"),
        )
        .withColumn(
            "alpha_ratio",
            F.length(F.regexp_replace(stripped, r"[^a-zA-Z]", ""))
            .cast("double") / n_chars_nosp,
        )
        .withColumn(
            "digit_ratio",
            F.length(F.regexp_replace(stripped, r"[^0-9]", ""))
            .cast("double") / n_chars_nosp,
        )
    )
    # Composite: floor to 4 dp so engines can't disagree on display
    # rounding (floor of a positive double is exact).
    score = (
        F.col("distinct_ratio") * 0.5
        + F.col("alpha_ratio") * 0.4
        + (F.lit(1.0) - F.col("digit_ratio")) * 0.1
    )
    return d.withColumn(
        "quality_score", F.floor(score * 10000).cast("long")
    )


def with_language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-voting language ID (n-gram heuristic family).

    Scores each language by stopword hits over the token array using
    higher-order functions (no UDF); picks the argmax with a fixed
    language order as tie-break; falls back to 'zh' when the text has
    no ASCII-wordlike tokens at all (CJK text tokenizes into non-Latin
    glyph runs).
    """
    toks = tokens_col(F.lower(F.col(text_col)))
    langs = list(STOPWORDS)

    def _scores(t: Column) -> Column:
        # All per-language hit counts in ONE struct over the
        # let-bound token array (the word_shingles trick): each
        # per-language `filter` traverses the already-evaluated `t`,
        # so the lowercase+split runs once per row instead of once
        # per language column (len(STOPWORDS)+1 times).
        fields = [
            F.size(
                F.filter(
                    t,
                    lambda x: F.array_contains(
                        F.array(*[F.lit(w) for w in STOPWORDS[lang]]), x
                    ),
                )
            ).alias(f"h_{lang}")
            for lang in langs
        ]
        fields.append(
            F.size(F.filter(t, lambda x: x.rlike("^[a-z]+$"))).alias(
                "latin"
            )
        )
        return F.struct(*fields)

    d = df.withColumn("_ls", F.transform(F.array(toks), _scores)[0])
    best = F.greatest(*[F.col(f"_ls.h_{lang}") for lang in langs])
    pick = F.when(F.col("_ls.latin") == 0, F.lit("zh"))
    for lang in langs:  # insertion order = fixed tie-break
        pick = pick.when(F.col(f"_ls.h_{lang}") == best, F.lit(lang))
    d = d.withColumn("lang_pred", pick)
    return d.drop("_ls")


def bpe_pair_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-wide adjacent character-pair counts — the statistic the
    FIRST iteration of BPE tokenizer training maximizes over (Sennrich
    et al., "Neural Machine Translation of Rare Words with Subword
    Units": merge the most frequent symbol pair; at iteration zero
    every symbol is a character, so the candidates are exactly these
    adjacent-char bigrams within tokens, weighted by occurrence).

    Output: ``(pair, n_occurrences)`` — rank/limit is the caller's.

    100 TB shape: explode(tokens) -> explode(char pairs) is a narrow
    per-row fan-out; the groupBy key space is the CHARACTER-BIGRAM
    vocabulary (a few thousand keys regardless of corpus size), so
    map-side partial aggregation collapses the shuffle to
    ~|vocab| x map-partitions rows — the canonical word-count shape.
    Every stage is built-in expressions (split / substr / sequence),
    no Python.
    """
    tok = F.explode(tokens_col(F.lower(F.col(text_col)))).alias("_tok")
    toks = df.select(tok)
    t = F.col("_tok")
    pairs = F.when(
        F.length(t) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.length(t) - 1),
            lambda i: t.substr(i, F.lit(2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        toks.select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count("*").alias("n_occurrences"))
    )


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Polynomial rolling-hash document fingerprint over tokens.

    fp = fold(tokens, 0, (acc, t) -> (acc * 1000003 + h31(t)) mod M31)
    with M31 = 2^31 - 1 and h31 = xxhash64 reduced mod M31.  The
    modular form keeps every intermediate below 2^52, so it is exact
    under ANSI arithmetic (no 64-bit wraparound needed).  The hash is
    order-sensitive (unlike a bag-of-words hash) and computed entirely
    JVM-side via ``aggregate``.
    """
    m31 = F.lit((1 << 31) - 1).cast("long")
    toks = tokens_col(F.col(text_col))
    fp = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: F.pmod(
            acc * F.lit(1000003).cast("long") + F.pmod(F.xxhash64(t), m31),
            m31,
        ),
    )
    return df.withColumn("fingerprint", fp)


# GPT-2-style pre-tokenizer pattern, restricted to the lookahead-free
# subset so the IDENTICAL pattern runs under Java regex (Spark) and
# RE2 (DuckDB oracle): contractions, space-prefixed letter runs,
# digit runs, punctuation runs, residual whitespace.
BPE_PRETOKEN_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)"
    r"| ?\p{L}+"
    r"| ?\p{N}+"
    r"| ?[^\s\p{L}\p{N}]+"
    r"|\s+"
)


def subword_tokens_col(text: Column) -> Column:
    """BPE-ish subword pre-tokens (the unit a byte-pair tokenizer
    would merge from) — ``regexp_extract_all`` on the shared pattern,
    JVM-side."""
    return F.regexp_extract_all(text, F.lit(BPE_PRETOKEN_PATTERN), 0)


def with_subword_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc subword counts: total pre-tokens, non-whitespace
    pre-tokens (≈ what a tokenizer would emit), and the
    chars-per-token compression ratio every data pipeline tracks."""
    toks = subword_tokens_col(F.col(text_col))
    non_ws = F.filter(toks, lambda t: t.rlike(r"\S"))
    return df.withColumns(
        {
            "n_pretokens": F.size(toks).cast("long"),
            "n_subwords": F.size(non_ws).cast("long"),
            "chars_per_subword": (
                F.length(text_col).cast("double")
                / F.greatest(F.size(non_ws), F.lit(1))
            ),
        }
    )
