"""Deduplication family for large-scale document corpora.

All variants are pure built-in-expression plans (zero Python UDFs) so the
whole family stays in whole-stage codegen and scales by shuffle math:

- exact_dedup:        1 shuffle on the fingerprint (hash groupBy).
- minhash_lsh_pairs:  shuffle on (band_idx, band_hash) — the LSH trick
                      turns the quadratic all-pairs problem into an
                      equi-join; pairs are verified with exact Jaccard.
- simhash_signatures: bit-signature per doc; near-dup candidates share a
                      16-bit band (classic simhash index blocking).
- ngram_jaccard_pairs: exact Jaccard within cheap blocking keys — the
                      oracle-checkable ground truth for the sketches.
- embedding_neardup:  cosine-threshold pairs via similarity.py.

Tuning at 100 TB: num_perm/bands trade recall vs shuffle volume; the band
join's value distribution is long-tailed (common shingle sets), so the
candidate join benefits from AQE skew splitting, which is on by default in
session.build_session.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MERSENNE_31 = (1 << 31) - 1  # 2147483647, prime


def normalize_text(col: Column | str) -> Column:
    """Canonical text form shared by every dedup variant: lowercase,
    punctuation stripped, whitespace collapsed."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.lower(c)
    c = F.regexp_replace(c, r"[^a-z0-9\s]", " ")
    c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return c


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup on normalized-text fingerprint: keeps the lowest id per
    group, reports group size. One hash shuffle on the 32-hex md5 — at
    100 TB prefer grouping on the fingerprint, never the text itself."""
    fp = F.md5(normalize_text(text_col)).alias("fingerprint")
    return (
        df.select(fp, F.col(id_col))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_copies"),
        )
    )


def word_shingles(col: Column | str, n: int = 1) -> Column:
    """Distinct word n-gram shingles of the normalized text."""
    words = F.split(normalize_text(col), " ")
    if n == 1:
        return F.array_distinct(words)
    idx = F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)))
    )


def _hash31(arr: Column) -> Column:
    """Per-shingle 31-bit hashes (xxhash64 folded into [0, 2^31)):
    keeps a*h+b inside signed-64 range under ANSI overflow checking."""
    return F.transform(arr, lambda s: F.pmod(F.xxhash64(s), F.lit(1 << 31)))


def minhash_signature(
    col: Column | str, num_perm: int = 64, shingle_n: int = 1, seed: int = 7
) -> Column:
    """num_perm-element MinHash signature via affine permutations
    h_i(x) = (a_i*x + b_i) mod p over the Mersenne prime p=2^31-1."""
    hashes = _hash31(word_shingles(col, shingle_n))
    import random

    rng = random.Random(seed)
    perms = [(rng.randrange(1, MERSENNE_31), rng.randrange(0, MERSENNE_31)) for _ in range(num_perm)]
    def perm_min(a: int, b: int) -> Column:
        return F.array_min(
            F.transform(hashes, lambda h: F.pmod(h * F.lit(a) + F.lit(b), F.lit(MERSENNE_31)))
        )

    return F.array(*[perm_min(a, b) for (a, b) in perms])


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 1,
    threshold: float = 0.7,
    seed: int = 7,
) -> DataFrame:
    """Near-duplicate pairs: MinHash -> banded LSH blocking -> exact
    word-shingle Jaccard verification >= threshold.

    Plan shape: sig compute (map-only) -> explode bands (x bands rows) ->
    shuffle on (band, band_hash) -> self-join within buckets -> dedup pairs
    -> join back for exact verify. No cartesian anywhere.
    """
    if num_perm % bands:
        raise ValueError("num_perm must be divisible by bands")
    rows_per_band = num_perm // bands

    base = df.select(
        F.col(id_col).alias("id"),
        word_shingles(text_col, shingle_n).alias("shingles"),
        minhash_signature(text_col, num_perm, shingle_n, seed).alias("sig"),
    )
    banded = base.select(
        "id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.concat_ws(",", *[F.element_at("sig", b * rows_per_band + r + 1).cast("string") for r in range(rows_per_band)])
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "band_hash"),
    )
    cands = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.band_hash") == F.col("b.band_hash"),
                F.col("a.id") < F.col("b.id"),
            ],
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    sh = base.select("id", "shingles")
    verified = (
        cands.join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("shingles", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("shingles", "sh_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return verified


def simhash_bits(col: Column | str, bits: int = 64, shingle_n: int = 1) -> Column:
    """SimHash as a bit STRING (e.g. '1011…', length=bits).

    String representation sidesteps signed-64 overflow under ANSI mode and
    makes band extraction a substring. Per-bit tally: fold the shingle
    array with F.aggregate, adding +-1 per bit of each shingle's xxhash64.
    """
    shingles = word_shingles(col, shingle_n)
    zero = F.array_repeat(F.lit(0), bits)

    def bit_signs(s: Column) -> Column:
        # exact integer bit extraction: shiftright + AND (no float math)
        h = F.xxhash64(s)
        return F.array(
            *[
                F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(
                    F.lit(-1)
                )
                for i in range(bits)
            ]
        )

    acc = F.aggregate(
        shingles,
        zero,
        lambda a, s: F.zip_with(a, bit_signs(s), lambda x, y: x + y),
    )
    return F.concat_ws(
        "", F.transform(acc, lambda v: F.when(v > 0, F.lit("1")).otherwise(F.lit("0")))
    )


def simhash_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
    band_bits: int = 16,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash: block on any shared band (bits/band_bits
    bands), verify Hamming distance <= max_hamming."""
    n_bands = bits // band_bits
    base = df.select(F.col(id_col).alias("id"), simhash_bits(text_col, bits).alias("sh"))
    banded = base.select(
        "id",
        "sh",
        F.posexplode(
            F.array(*[F.substring("sh", b * band_bits + 1, band_bits) for b in range(n_bands)])
        ).alias("band", "band_val"),
    )
    pairs = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.band_val") == F.col("b.band_val"),
                F.col("a.id") < F.col("b.id"),
            ],
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .distinct()
    )
    ham = F.size(
        F.filter(
            F.zip_with(F.split("sh_a", ""), F.split("sh_b", ""), lambda x, y: x != y),
            lambda z: z,
        )
    )
    return (
        pairs.withColumn("hamming", ham)
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_cols: list[str] | None = None,
    shingle_n: int = 1,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact word-shingle Jaccard for pairs sharing a blocking key —
    the oracle-checkable ground-truth dedup (and recall yardstick for the
    MinHash/SimHash sketches). Blocking keeps the self-join linear-ish;
    with block_cols=None it is a full cross-pairing (testing only)."""
    base = df.select(
        F.col(id_col).alias("id"),
        *(block_cols or []),
        word_shingles(text_col, shingle_n).alias("sh"),
    )
    on = [F.col("a.id") < F.col("b.id")] + [
        F.col(f"a.{c}") == F.col(f"b.{c}") for c in (block_cols or [])
    ]
    pairs = (
        base.alias("a")
        .join(base.alias("b"), on=on)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(
                F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
                / F.size(F.array_union(F.col("a.sh"), F.col("b.sh"))),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return pairs
