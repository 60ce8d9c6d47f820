"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Designed for the 100 TB training-data case:

* **exact_dedup** — one hash shuffle on the normalized text hash; the
  canonical-keeper rule (min id) makes output deterministic.
* **shingle/Jaccard** — shingling is a narrow map; the candidate join
  is shuffle-on-shingle, which self-limits because only co-occurring
  shingles meet.  For all-pairs exactness we dedup shingles per doc
  first so |pairs| is bounded by true co-occurrence.
* **MinHash+LSH** — signature build is one aggregation (no explosion:
  ``aggregate`` over the shingle array per row); banding turns the
  quadratic pair search into an equi-join on (band, band_hash) — the
  standard sub-quadratic near-dup path at scale.
* **SimHash** — 64-bit signature via per-bit vote counts; Hamming-k
  candidate pairs through band blocking (pigeonhole over 4 bands).

Everything is built-in functions — zero Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..util import spread
from .text import tokens_col

# 2^31 - 1 (Mersenne prime) for permutation hashing: 31-bit operands
# keep a_i * h + b_i under 2^62, exact under ANSI long arithmetic.
_MERSENNE31 = (1 << 31) - 1


def normalize_text(text: Column) -> Column:
    """Lowercase + whitespace-collapse normalization for exact dedup."""
    return F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")


def exact_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup groups: per normalized text, keep min id + count.

    Output: (doc_id = keeper, n_dups, n_chars_norm).  groupBy on the
    64+128-bit content hash, not the text itself, so shuffle rows stay
    small at scale; the min-id keeper rule is deterministic (unlike
    ``dropDuplicates`` which keeps an arbitrary row).
    """
    norm = normalize_text(F.col(text_col))
    return (
        df.select(
            F.col(id_col),
            F.xxhash64(norm).alias("_h64"),
            F.md5(norm).alias("_h128"),
            F.length(norm).alias("_len"),
        )
        .groupBy("_h64", "_h128")
        .agg(
            F.min(id_col).alias(id_col),
            F.count("*").alias("n_dups"),
            F.first("_len").alias("n_chars_norm"),
        )
        .select(id_col, "n_dups", F.col("n_chars_norm").cast("long"))
    )


def bucket_pairs(
    df: DataFrame,
    bucket_cols: list[str],
    payload: Column,
    max_bucket: int | None = None,
) -> DataFrame:
    """Unordered member pairs within each bucket, without a self-join.

    ``groupBy(bucket).collect_list(payload)`` then in-bucket pair
    expansion via indexed ``transform`` + ``slice``.  One shuffle total,
    and the (possibly expensive) payload expression is evaluated ONCE
    per row — a bucket self-join evaluates it once per side because
    lambda-bearing plans don't canonicalize, so Spark cannot reuse the
    exchange (measured: 2x signature cost on every LSH join here).

    Output: (a, b) struct columns with a < b in ``array_sort`` order
    (payload's first field should be the id for a deterministic order).
    Skew note: a bucket of k members emits k*(k-1)/2 rows from one
    task — same distribution a shuffle join would produce, since equal
    keys land in one partition either way.  ``max_bucket`` is the
    100 TB guard for exactly that: a near-universal key (a stop
    shingle shared by 100k documents, a degenerate LSH band) would
    collect a 100k-element array in one task and emit 5e9 pairs —
    and such keys carry ~zero similarity signal precisely BECAUSE
    they are near-universal.  Capped buckets are dropped whole
    (standard stop-shingle / frequency-cap practice in web-scale
    dedup); None (default) keeps exact semantics for the oracle
    paths.
    """
    buckets = df.groupBy(*bucket_cols).agg(
        F.array_sort(F.collect_list(payload)).alias("_members")
    )
    if max_bucket is not None:
        buckets = buckets.filter(F.size("_members") <= max_bucket)
    pair = F.explode(
        F.flatten(
            F.transform(
                F.col("_members"),
                lambda x, i: F.transform(
                    F.slice(
                        F.col("_members"),
                        i + F.lit(2),
                        F.greatest(
                            F.size(F.col("_members")) - i - F.lit(1), F.lit(0)
                        ),
                    ),
                    lambda y: F.struct(x.alias("a"), y.alias("b")),
                ),
            )
        )
    )
    return buckets.select(pair.alias("_p")).select("_p.a", "_p.b")


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column.

    ``transform(sequence(1, len-n+1), i -> join(slice(tokens,i,n)))``
    then ``array_distinct`` — all JVM-side higher-order functions.
    Texts shorter than n tokens contribute their full token join.
    """
    toks = tokens_col(text)

    def _sh(t: Column) -> Column:
        ln = F.size(t)
        return F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.greatest(ln - (n - 1), F.lit(1))),
                lambda i: F.array_join(F.slice(t, i, n), " "),
            )
        )

    # Bind the token array as a lambda VARIABLE (1-element-array
    # transform = the expression-language `let`): HOF lambdas are
    # interpreted, so a raw `toks` reference inside the per-shingle
    # lambda would re-run the regex split once per shingle (~50x per
    # doc; measured 2x end-to-end on the Jaccard pair scan).  A lambda
    # variable is evaluated exactly once per row no matter how many
    # shingles read it — and unlike a pre-projected column it cannot
    # be inlined back by CollapseProject.
    return F.transform(F.array(toks), _sh)[0]


def shingle_pairs_jaccard(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    max_bucket: int | None = None,
) -> DataFrame:
    """Exact pairwise Jaccard over docs sharing >= 1 shingle.

    Output: (id_a, id_b, n_common, n_a, n_b, jaccard) with id_a < id_b.
    Pairs come from per-shingle buckets (``bucket_pairs``): one shuffle
    keyed on the 64-bit shingle hash (8-byte keys, not strings), cost
    tracks true co-occurrence mass, not |docs|^2, and the shingling
    expression is evaluated once per doc.
    """
    base = spread(df).select(
        F.col(id_col).alias("_id"),
        word_shingles(F.col(text_col), n).alias("_sh"),
    ).withColumn("_n", F.size("_sh"))
    exploded = base.select(
        "_id", "_n", F.explode("_sh").alias("_shingle")
    ).select("_id", "_n", F.xxhash64("_shingle").alias("_shash"))
    pairs = (
        bucket_pairs(
            exploded,
            ["_shash"],
            F.struct(F.col("_id"), F.col("_n")),
            max_bucket=max_bucket,
        )
        .groupBy(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._n").alias("n_a"),
            F.col("b._n").alias("n_b"),
        )
        .agg(F.count("*").alias("n_common"))
    )
    return pairs.select(
        "id_a",
        "id_b",
        F.col("n_common").cast("long").alias("n_common"),
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        (
            F.col("n_common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
        ).alias("jaccard"),
    )


def _minhash_coeffs(num_perm: int) -> tuple[list[int], list[int]]:
    """Deterministic 31-bit permutation coefficients (a_i odd-ish in
    [1, m), b_i in [0, m)) from a fixed-seed PRNG — computed driver-side
    once so the Spark expression is a pure literal array."""
    import random

    rng = random.Random(0x5EED_CAFE)
    a = [rng.randrange(1, _MERSENNE31) for _ in range(num_perm)]
    b = [rng.randrange(0, _MERSENNE31) for _ in range(num_perm)]
    return a, b


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 32,
    shingle_n: int = 3,
) -> DataFrame:
    """Per-doc MinHash signature as ``array<long>`` of length num_perm.

    Single pass: shingles are hashed once, then ONE ``aggregate`` fold
    maintains all num_perm running minima simultaneously (zip_with over
    a literal coefficient array).  O(|shingles| * num_perm) arithmetic
    per row, each shingle hashed exactly once, zero shuffle.  (A naive
    per-permutation ``array_min(transform(...))`` re-evaluates the
    whole shingling expression num_perm times — 30x slower, measured.)

    (a_i * (h mod m) + b_i) mod m with m = 2^31-1 keeps every
    intermediate < 2^62: exact under ANSI long arithmetic.
    """
    a_co, b_co = _minhash_coeffs(num_perm)
    m = F.lit(_MERSENNE31).cast("long")
    A = F.array(*[F.lit(a).cast("long") for a in a_co])
    B = F.array(*[F.lit(b).cast("long") for b in b_co])
    sh = word_shingles(F.col(text_col), shingle_n)
    hashes = F.transform(sh, lambda s: F.pmod(F.xxhash64(s), m))

    def fold(acc, h):
        return F.zip_with(
            acc,
            F.sequence(F.lit(0), F.lit(num_perm - 1)),
            lambda cur, i: F.least(
                cur,
                F.pmod(
                    F.element_at(A, i + 1) * h + F.element_at(B, i + 1), m
                ),
            ),
        )

    sig = F.aggregate(
        hashes,
        F.array_repeat(F.lit(_MERSENNE31).cast("long"), num_perm),
        fold,
    )
    return df.select(F.col(id_col).alias("_id"), sig.alias("_sig"))


def minhash_signatures_vectorized(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 32,
    shingle_n: int = 3,
) -> DataFrame:
    """Arrow/numpy twin of :func:`minhash_signatures` — bit-identical
    output, different execution strategy.

    Shingling and xxhash stay JVM-side (same expressions as the fold
    path); the O(|shingles| x num_perm) permutation arithmetic moves to
    one numpy broadcast per Arrow batch:
    ``min over axis of (A[:,None] * H[None,:] + B[:,None]) mod m``
    with ``minimum.reduceat`` folding variable-length docs in a single
    C pass.  Every operand stays < 2^62, exact in int64 — so this
    matches the interpreted fold exactly (asserted in tests), while the
    per-shingle cost is a few ns instead of an interpreted expression
    tree.  The scale path when signatures dominate (long docs or
    num_perm >= 64); the fold keeps zero Python-worker dependency.
    """
    from pyspark.sql.types import ArrayType, LongType, StructField, StructType

    a_co, b_co = _minhash_coeffs(num_perm)
    m = F.lit(_MERSENNE31).cast("long")
    sh = word_shingles(F.col(text_col), shingle_n)
    hashed = df.select(
        F.col(id_col).alias("_id"),
        F.transform(sh, lambda s: F.pmod(F.xxhash64(s), m)).alias("_hashes"),
    )
    out_schema = StructType(
        [
            StructField("_id", hashed.schema["_id"].dataType, False),
            StructField("_sig", ArrayType(LongType(), False), False),
        ]
    )
    # chunk rows so the (num_perm x total_hashes) broadcast matrix
    # stays ~16 MB regardless of Arrow batch size
    chunk_elems = 2_000_000

    def run(batches):
        import numpy as np
        import pandas as pd

        A = np.asarray(a_co, dtype=np.int64)[:, None]
        B = np.asarray(b_co, dtype=np.int64)[:, None]
        mm = np.int64(_MERSENNE31)
        for pdf in batches:
            ids, sigs = [], []
            lens = pdf["_hashes"].map(len).to_numpy()
            start = 0
            while start < len(pdf):
                end = start
                total = 0
                while end < len(pdf) and (total == 0 or total + lens[end] <= chunk_elems):
                    total += lens[end]
                    end += 1
                rows = pdf.iloc[start:end]
                h = np.concatenate(
                    [np.asarray(x, dtype=np.int64) for x in rows["_hashes"]]
                    or [np.empty(0, dtype=np.int64)]
                )
                perms = (A * h[None, :] + B) % mm
                offsets = np.zeros(len(rows), dtype=np.int64)
                np.cumsum(lens[start:end][:-1], out=offsets[1:])
                for rid, n, off in zip(rows["_id"], lens[start:end], offsets):
                    if n == 0:
                        sigs.append([int(mm)] * num_perm)
                    else:
                        sigs.append(
                            perms[:, off : off + n].min(axis=1).tolist()
                        )
                    ids.append(rid)
                start = end
            yield pd.DataFrame({"_id": ids, "_sig": sigs})

    return hashed.mapInPandas(run, out_schema)


def minhash_band_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    vectorized: bool = False,
) -> DataFrame:
    """Banded MinHash signature relation ``(_id, _band, _bh)`` — the
    persistable LSH INDEX of a corpus.

    This is the write-once artifact incremental dedup needs at 100 TB:
    band a corpus once, store ~bands x 16 bytes per doc (not the
    text), and every future batch joins its own banded signatures
    against the stored relation instead of re-shingling history
    (:func:`minhash_lsh_candidates_vs_index`).  The same relation,
    pair-expanded in place, yields the batch self-dedup
    (:func:`minhash_lsh_candidates`) — one banding code path, two
    consumption patterns.

    ``vectorized=True`` swaps in the numpy signature kernel
    (:func:`minhash_signatures_vectorized` — bit-identical, so the
    candidate set cannot change); pick it when signatures dominate
    (long docs or num_perm >= 64).
    """
    rows_per_band = num_perm // bands
    sig_fn = (
        minhash_signatures_vectorized if vectorized else minhash_signatures
    )
    sigs = sig_fn(spread(df), id_col, text_col, num_perm, shingle_n)
    return sigs.select(
        "_id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            *[
                                F.element_at("_sig", b * rows_per_band + r + 1)
                                for r in range(rows_per_band)
                            ],
                        )
                    )
                    for b in range(bands)
                ]
            )
        ).alias("_band", "_bh"),
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    vectorized: bool = False,
    max_bucket: int | None = None,
) -> DataFrame:
    """LSH candidate pairs: docs agreeing on >= 1 full band.

    bands x rows_per_band = num_perm.  Explode to (band_idx, band_hash)
    (:func:`minhash_band_index`) and expand pairs inside each band
    bucket (``bucket_pairs``) — the shuffle key is the band hash, so
    bucket sizes follow collision probability, not corpus size, and
    signatures are computed once.  Output: (id_a, id_b, n_bands_match).
    """
    banded = minhash_band_index(
        df, id_col, text_col, num_perm, bands, shingle_n, vectorized
    )
    return (
        bucket_pairs(
            banded, ["_band", "_bh"], F.col("_id"), max_bucket=max_bucket
        )
        .groupBy(F.col("a").alias("id_a"), F.col("b").alias("id_b"))
        .agg(F.count("*").alias("n_bands_match"))
    )


def minhash_lsh_candidates_vs_index(
    new_df: DataFrame,
    index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    vectorized: bool = False,
    max_bucket: int | None = None,
) -> DataFrame:
    """Incremental near-dup candidates: NEW batch vs a stored corpus
    band index — the daily-ingest path at 100 TB, where re-banding
    history every run is unaffordable.

    The new batch is banded once (same expressions as the index was
    built with — identical permutation seeds, so signatures are
    comparable across runs) and equi-joined against the index on
    ``(_band, _bh)``; work tracks |batch| x collision probability,
    never |history|.  ``max_bucket`` drops degenerate INDEX buckets
    whole (a band value shared by >max_bucket historical docs carries
    ~zero similarity signal and would fan every colliding new doc out
    by the bucket size — the same hot-key guard ``bucket_pairs``
    applies to self-dedup).  Output: ``(new_id, old_id,
    n_bands_match)``.
    """
    new_banded = minhash_band_index(
        new_df, id_col, text_col, num_perm, bands, shingle_n, vectorized
    ).select(
        F.col("_id").alias("new_id"), "_band", "_bh"
    )
    idx = index.select(F.col("_id").alias("old_id"), "_band", "_bh")
    if max_bucket is not None:
        keep = (
            idx.groupBy("_band", "_bh")
            .agg(F.count("*").alias("_n"))
            .filter(F.col("_n") <= max_bucket)
            .select("_band", "_bh")
        )
        idx = idx.join(keep, ["_band", "_bh"])
    return (
        new_banded.join(idx, ["_band", "_bh"])
        .groupBy("new_id", "old_id")
        .agg(F.count("*").alias("n_bands_match"))
    )


def simhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 64,
) -> DataFrame:
    """64-bit SimHash per doc: bit j of the signature is the sign of
    the per-bit vote sum over token hashes.

    Single pass: tokens are hashed once and rendered to their 64-char
    two's-complement binary string (``bin``); ONE ``aggregate`` fold
    maintains all 64 vote counters via ``zip_with`` (bit j read with a
    column-index ``substr`` — shift counts can't be Columns in Spark).
    Narrow map per row: no explode, no shuffle.
    """
    toks = tokens_col(F.col(text_col))
    bin_hashes = F.transform(toks, lambda t: F.lpad(F.bin(F.xxhash64(t)), 64, "0"))

    def fold(acc, bh):
        return F.zip_with(
            acc,
            F.sequence(F.lit(0), F.lit(bits - 1)),
            lambda cur, j: cur
            + F.when(bh.substr(F.lit(64) - j, F.lit(1)) == "1", F.lit(1))
            .otherwise(F.lit(-1))
            .cast("long"),
        )

    votes = F.aggregate(
        bin_hashes, F.array_repeat(F.lit(0).cast("long"), bits), fold
    )
    powers = F.array(
        *[
            F.lit((1 << j) if j < 63 else -(1 << 63)).cast("long")
            for j in range(bits)
        ]
    )
    sig = F.aggregate(
        F.zip_with(
            votes, powers, lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("long"))
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseOR(x),
    )
    return df.select(F.col(id_col).alias("_id"), sig.alias("_simhash"))


def simhash_near_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with Hamming distance <= max_hamming.

    Blocking: split the 64-bit signature into ``max_hamming + 1``
    bands; by pigeonhole any pair within the distance agrees on at
    least one full band, so candidates come from per-(band_idx,
    band_value) buckets (``bucket_pairs`` — signatures computed once)
    and only candidates pay the popcount.
    """
    n_bands = max_hamming + 1
    width = 64 // n_bands
    sigs = simhash_signatures(spread(df), id_col, text_col)
    banded = sigs.select(
        "_id",
        "_simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned("_simhash", i * width).bitwiseAND(
                        F.lit((1 << width) - 1).cast("long")
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("_band", "_bv"),
    )
    xor = F.col("a._simhash").bitwiseXOR(F.col("b._simhash"))
    return (
        bucket_pairs(
            banded, ["_band", "_bv"], F.struct(F.col("_id"), F.col("_simhash"))
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.bit_count(xor).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
