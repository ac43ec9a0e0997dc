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

#: md5-mode hash width: 12 hex chars = 48 bits, fits signed int64 in both
#: engines (DuckDB twin: ('0x' || substr(md5(x), 1, 12))::BIGINT — the
#: md5-hex->bigint technique proven cross-engine in operators/pack.py).
MD5_HEX_CHARS = 12
MD5_BITS = 4 * MD5_HEX_CHARS


def hash64(col: Column, hash_fn: str = "xxhash64") -> Column:
    """Deterministic 64-bit-domain hash of a string column.

    hash_fn="xxhash64": the JVM fast path (production default — cheapest
    per-shingle hash Spark has, but engine-specific, so sketches built on
    it get only a rows-only driver check).
    hash_fn="md5": the portable mode — first 12 hex chars of md5 as a
    48-bit bigint. Exists verbatim in DuckDB, which makes every sketch
    built on it (MinHash permutations, SimHash bit tallies, winnowing
    minima) statically SQL-expressible and therefore hash-checkable by
    the driver's oracle gate. ~2x the hash cost of xxhash64; identical
    plan shape.
    """
    if hash_fn == "xxhash64":
        return F.xxhash64(col)
    if hash_fn == "md5":
        return F.conv(F.substring(F.md5(col), 1, MD5_HEX_CHARS), 16, 10).cast("bigint")
    raise ValueError(f"unknown hash_fn {hash_fn!r} (expected 'xxhash64' or 'md5')")


def normalize_text(col: Column | str) -> Column:
    """Canonical text form shared by every dedup variant: lowercase,
    punctuation stripped, whitespace collapsed."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.lower(c)
    c = F.regexp_replace(c, r"[^a-z0-9\s]", " ")
    c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return c


def raw_words(col: Column | str) -> Column:
    """The word array of the normalized text MINUS the zero-word fixup:
    one regex SPLIT on non-alphanumeric runs instead of the two
    regexp_replace passes + trim + split of ``split(normalize_text(c),
    " ")`` (round 11, guide §1.2 per-task work: measured 3.6x cheaper on
    the sf0.1 documents table, word arrays bit-identical on every corpus
    and edge case). Differs from the canonical law ONLY on zero-word
    inputs (empty/punctuation-only text), where the canonical form is
    ``[""]`` and this is ``[]`` — callers must apply :func:`fixup_words`
    (ideally in a SEPARATE staged projection, so the split is not
    re-evaluated by the when-branches) or go through
    :func:`normalized_words`."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_remove(F.split(F.lower(c), "[^a-z0-9]+"), "")


def fixup_words(words: Column) -> Column:
    """Restore the canonical zero-word face over :func:`raw_words`
    output: a non-null text with no [a-z0-9] runs tokenizes to ``[""]``
    under ``split(normalize_text(c), " ")`` (split of the empty string),
    and a NULL text stays NULL (size(NULL) = -1 skips the when). Apply
    to an already-materialized column reference."""
    return F.when(F.size(words) == 0, F.array(F.lit(""))).otherwise(words)


def normalized_words(col: Column | str) -> Column:
    """Column-level fast tokenize, value-identical to
    ``split(normalize_text(c), " ")`` for every input (NULL -> NULL,
    zero-word -> [""]). The when-fixup references the split twice, so on
    hot frame paths prefer staging raw_words into its own projection and
    applying fixup_words in the next one (see shingle_frame)."""
    return fixup_words(raw_words(col))


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


def word_grams(col: Column | str, n: int = 1) -> Column:
    """ALL word n-grams of the normalized text, in order, repeats kept
    (repetition/quality signals need the multiset; dedup wants the set —
    see word_shingles).

    PERF NOTE: any outer expression referenced inside a higher-order-
    function lambda is re-evaluated PER ELEMENT (lambda variables block
    common-subexpression elimination), so `transform(idx, i ->
    ...element_at(words, i)...)` re-runs split(normalize(text)) for every
    gram — quadratic with a regex constant. This implementation references
    the words array only at top level: a zip_with chain over shifted
    copies, one slice per offset, CSE-eliminated codegen. Measured ~20x
    faster on ~500-word docs.
    """
    return grams_from_words(normalized_words(col), n)


def grams_from_words(words: Column, n: int = 1) -> Column:
    """word_grams over an ALREADY-SPLIT word array — use when the caller
    has materialized the words column once (staged projections), so the
    normalize+split chain is not re-derived per feature."""
    if n == 1:
        return words
    size = F.size(words)
    grams = words
    for k in range(1, n):
        shifted = F.slice(words, k + 1, F.greatest(size - k, F.lit(0)))
        # zip_with pads the shorter side with null; concat_ws skips nulls,
        # producing short tail grams that the final slice cuts off
        grams = F.zip_with(grams, shifted, lambda g, w: F.concat_ws(" ", g, w))
    full = F.slice(grams, 1, F.greatest(size - n + 1, F.lit(0)))
    return F.when(size >= n, full).otherwise(F.array().cast("array<string>"))


def word_shingles(col: Column | str, n: int = 1) -> Column:
    """Distinct word n-gram shingles of the normalized text (the set form
    every dedup/decontamination variant keys on).

    Column form for one-off use; pipelines should go through
    shingle_frame, which stages norm/words so the regex chain and split
    run once per row instead of once per reference (lambda-CSE trap —
    measured ~3x on the shingle stage of every sketch)."""
    return F.array_distinct(word_grams(col, n))


def shingle_frame(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 1,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, *extra_cols, shingles) with the derivation STAGED:
    raw-split -> zero-word fixup -> grams in separate projections, so
    each expensive step is computed once per row (CollapseProject keeps
    the stages because the aliases are non-cheap and multiply
    referenced). Round 11: the regex-normalize + space-split pair is
    replaced by the single-split raw_words/fixup_words law (word arrays
    bit-identical; measured 3.6x cheaper on the sf0.1 corpus)."""
    s1 = df.select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in extra_cols],
        raw_words(text_col).alias("__w0"),
    )
    s2 = s1.select(
        "id", *extra_cols, fixup_words(F.col("__w0")).alias("__words")
    )
    return s2.select(
        "id",
        *extra_cols,
        F.array_distinct(grams_from_words(F.col("__words"), n)).alias("shingles"),
    )



def _jaccard(sh_a: Column, sh_b: Column) -> Column:
    """Exact Jaccard over two shingle-set arrays, rounded to 6 dp.
    0.0 when both sets are empty (docs shorter than the shingle width
    have no n-grams; 'no evidence' must not read as 'identical', and the
    raw 0/0 is an ANSI arithmetic error, not a NaN)."""
    u = F.size(F.array_union(sh_a, sh_b))
    return F.when(
        u > 0, F.round(F.size(F.array_intersect(sh_a, sh_b)) / u, 6)
    ).otherwise(F.lit(0.0))


def _verify_jaccard_pairs(
    cands: DataFrame,
    shingles: DataFrame,
    threshold: float,
    shingle_col: str = "shingles",
) -> DataFrame:
    """The exact-Jaccard verify stage every banded/blocked candidate
    generator shares (minhash LSH, incremental LSH, prefix-filtered
    jaccard): join (id_a, id_b) candidate pairs back to the per-doc
    shingle sets and keep pairs with round-to-6 Jaccard >= threshold.

    Both shingle legs are hinted SHUFFLE-HASH as the build side: at gate
    scale the candidate and shingle frames are small and the executed
    join is cheap either way, but at production scale the shingle frame
    outgrows the broadcast threshold and the default becomes sort-merge —
    which runs the candidate side (pair-count rows, each dragging a full
    shingle ARRAY after the first join) through an external sort
    (measured round 8: 300k docs / 70M candidates filled 78 GB of sorter
    spill; the hash join shuffles the same rows compressed, unsorted, and
    builds only |docs|-row hash maps per partition). One helper so the
    scale-safe shape cannot drift between the three call sites (round-8
    review: the hint had been applied to the prefix path only)."""
    sh_a = shingles.select(
        F.col("id").alias("id_a"), F.col(shingle_col).alias("sh_a")
    ).hint("shuffle_hash")
    sh_b = shingles.select(
        F.col("id").alias("id_b"), F.col(shingle_col).alias("sh_b")
    ).hint("shuffle_hash")
    return (
        cands.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .withColumn("jaccard", _jaccard(F.col("sh_a"), F.col("sh_b")))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _check_verify_mode(verify: str, threshold: float) -> None:
    """Entry guard shared by the banded verify call sites: the counts
    verify is only output-preserving at threshold > 0 (fail at plan
    construction, not mid-job)."""
    if verify not in ("arrays", "counts"):
        raise ValueError(f"verify={verify!r}: expected 'arrays' or 'counts'")
    if verify == "counts" and not threshold > 0:
        raise ValueError(
            "verify='counts' requires threshold > 0: zero-overlap pairs "
            "drop out of the token join, which only preserves the output "
            "when such pairs cannot qualify"
        )


#: incremental_minhash_pairs verify='auto' crossover: counts iff the
#: stored index holds at least this many docs per batch doc. Calibrated
#: by the round-11 lshincr11 sweep (SCALING.md): at a fixed 5k batch the
#: arrays verify stays ahead on wall through index/batch ratio 20
#: (3.0 vs 3.7 s at 100k) and counts is ahead at ratio 100 on BOTH wall
#: (4.5 vs 4.8 s) and shuffle (0.13 vs 0.22 GB — and the arrays side's
#: shuffle is linear in index size, so past this point the gap only
#: widens; counts' shuffle already matches arrays' by ratio 20). 50
#: splits the measured wall-crossover bracket [20, 100] and keeps a
#: 12x margin above the one point where arrays wins BIG (the round-10
#: bench regression: 3.84x normalized at a 4k-doc index with a
#: near-dup-DENSE 1k batch, ratio 4) — the margin absorbs the
#: candidate-density term the rule cannot see (counts cost tracks
#: candidate pairs, not batch rows; a denser batch moves the true
#: crossover up). Production daily-ingest ratios grow without bound, so
#: any threshold in the bracket converges on counts where it must.
AUTO_INCR_VERIFY_RATIO = 50


def _auto_incremental_verify(
    threshold: float, index_rows: int, batch_rows: int
) -> str:
    """The cost-based verify decision for incremental_minhash_pairs
    (round 11, VERDICT r10 #2), factored pure so both measured regimes
    pin it in tests. Inputs are the two cheap observables: stored-index
    row count vs ingest-batch row count.

    - threshold <= 0: "arrays" unconditionally (the counts verify drops
      zero-overlap pairs, so it is not output-preserving at t=0);
    - index >= AUTO_INCR_VERIFY_RATIO x batch: "counts" — the arrays
      verify ships the ENTIRE stored shingle table per batch (cost
      linear in index size; lshincr10: not runnable per-batch at a
      production index), while counts ships only the collision set;
    - otherwise "arrays" — at small index/dense batch the counts path's
      pairs x |A| token rows dominate (the round-10 3.84x bench
      regression that reverted the first counts default)."""
    if not threshold > 0:
        return "arrays"
    return (
        "counts"
        if index_rows >= AUTO_INCR_VERIFY_RATIO * max(batch_rows, 1)
        else "arrays"
    )


def _verify_jaccard_pairs_counts(
    cands: DataFrame,
    shingles: DataFrame,
    threshold: float,
    shingle_col: str = "shingles",
) -> DataFrame:
    """Co-occurrence-count VERIFY for banded/blocked candidate pairs
    (round 10, VERDICT r9 #4) — the LSH twin of _jaccard_pairs_counts:
    output-identical to _verify_jaccard_pairs, but no shingle ARRAY ever
    shuffles.

    The CANDIDATE PAIRS join the exploded token table: once on id_a
    (attaching A's tokens), once on (id_b, token) (keeping exactly the
    intersection rows), then a map-side-combined count per pair.
    Jaccard derives exactly from the intersection count via
    |A∪B| = |A| + |B| - |A∩B| — the same int-ratio double the array
    path divides, so round-to-6 values are bit-identical and the pair
    set EQUALS the array verify's (pinned by the LSH verify-equivalence
    test). Aggregation state is bounded by |candidates|; both token
    legs are SEMI-RESTRICTED to the candidate ids.

    WHEN IT PAYS, measured (SCALING.md round 10): the candidate-id
    restriction is the whole value. On a full-corpus dedup (candidates
    touch ~every doc) the arrays verify WINS — it ships one array row
    per pair where this path ships |A| token rows per pair, and the
    lshcounts10 probe measured arrays ahead on every leg (1.5 vs
    2.6 GB shuffle at 25-word docs; 5.4 vs 9.7 GB at 200-word docs) —
    so "arrays" stays the full-corpus default. On an INCREMENTAL verify
    against a persisted index the picture inverts: the arrays verify
    shuffles the ENTIRE stored shingle table through both join legs,
    while this path ships only the docs the batch collided with
    (lshincr10 probe) — counts is the daily-ingest shape.

    Shape note (round-10 measurement): the exact referee's SUBSUMING
    shape — self-join the candidate-id-restricted token table on the
    token, aggregate, THEN intersect with the candidates — was tried
    first and OOMed the lsh10 500k probe: its aggregation state is
    every CO-OCCURRING pair of candidate ids (sum df(token)^2 groups,
    ~1.5e9 on that corpus — docs sharing any common vocab word), which
    the candidate restriction then discards. A verify must restrict to
    candidate pairs BEFORE aggregating; the referee gets away with the
    subsuming shape only because there candidates ARE all co-occurring
    pairs. Both sides' token legs are semi-restricted to the candidate
    ids, so an incremental run never ships the historical index's
    tokens in full.

    Requires threshold > 0: a candidate pair with zero token overlap
    never survives the intersection join, which only preserves the
    output when such pairs cannot qualify."""
    if not threshold > 0:
        raise ValueError(
            "verify='counts' requires threshold > 0: zero-overlap pairs "
            "drop out of the token join, which only preserves the output "
            "when such pairs cannot qualify"
        )
    # read three times (two id restrictions + the pair join):
    # materialize the candidate pipeline once — same lifecycle stance as
    # the callers' shingle checkpoint (lazy, freed on GC)
    cands = cands.localCheckpoint(eager=False)

    def _side_toks(side: str) -> DataFrame:
        ids = cands.select(F.col(side).alias("id")).distinct()
        # explode_OUTER + null filter: see search.build_postings — the
        # non-outer explode clones the shingle derivation into a
        # size()>0 filter pushed below the exchange on a raw plan
        return (
            shingles.join(ids, "id", "left_semi")
            .select(
                F.col("id").alias(side),
                F.size(F.col(shingle_col)).alias("__sz" + side[-1]),
                F.explode_outer(shingle_col).alias("tok"),
            )
            .where(F.col("tok").isNotNull())
        )

    # SHUFFLE-HASH hints, same stance as _verify_jaccard_pairs: the
    # candidate table must never be broadcast (estimated bytes pass the
    # threshold at probe scale while the real JVM build OOMs the driver
    # — measured on the lshcounts10 500k leg; at 100 TB candidates are
    # corpus-sized by definition). Build sides: cands for the first
    # join, the b-leg tokens for the second.
    inter = (
        cands.hint("shuffle_hash")
        .join(_side_toks("id_a"), "id_a")
        .join(_side_toks("id_b").hint("shuffle_hash"), ["id_b", "tok"])
        .groupBy("id_a", "id_b", "__sza", "__szb")
        .agg(F.count("*").alias("__inter"))
    )
    return (
        inter.withColumn(
            "jaccard",
            F.round(
                F.col("__inter")
                / (F.col("__sza") + F.col("__szb") - F.col("__inter")),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _jaccard_pairs_counts(
    base: DataFrame, block_cols: list[str], threshold: float, t_eff: float
) -> DataFrame:
    """Co-occurrence-count path (round 9, VERDICT r8 #3): exact Jaccard
    WITHOUT ever shuffling a shingle array — and without a separate
    candidate stage at all.

    The array verify (_verify_jaccard_pairs) drags two full shingle sets
    through the pair-keyed joins — in the sparse-output regime (huge
    candidate sets, tiny true-pair yield) the prefix10 probe measured a
    65 GB single-box shuffle that was almost entirely array payload.
    Here the exploded token table self-joins on (token, *blocks): the
    only wide shuffle ships the token table itself (~16-byte rows), the
    join output feeds a hash-agg whose MAP-SIDE partial combine collapses
    co-occurring rows to one row per pair before the pair shuffle, and
    Jaccard derives exactly from the intersection count via
    |A∪B| = |A| + |B| - |A∩B|:

        jaccard = inter / (sz_a + sz_b - inter)

    — the same int-ratio double the array verify divides (set sizes are
    identical), so round-to-6 values are bit-identical and the emitted
    pair set EQUALS the array path's (pinned by the prune/verify
    equivalence property test). This subsumes candidate generation:
    every pair with jaccard >= threshold > 0 shares >= 1 token, so it
    appears in the self-join; pairs with zero overlap (which only
    qualify at t=0) never do — hence the threshold > 0 entry guard. The
    exactness-preserving LENGTH predicate is always fused into the join
    (valid whenever t > 0). Scale boundary, stated: per-token join
    fan-out is df(token)^2 — hot tokens are the dense-corpus boundary,
    same as the block join's; AQE skew-join splits the survivors, and
    near-dup-dense corpora belong to minhash regardless.
    """
    sized = base.select(
        "id", *block_cols, F.col("sh"), F.size("sh").alias("__sz")
    ).localCheckpoint(eager=False)
    toks = sized.select("id", *block_cols, "__sz", F.explode("sh").alias("tok"))
    sa, sb = F.col("a.__sz").cast("double"), F.col("b.__sz").cast("double")
    on = [
        F.col("a.tok") == F.col("b.tok"),
        F.col("a.id") < F.col("b.id"),
        F.least(sa, sb) >= F.lit(t_eff) * F.greatest(sa, sb),
        *[F.col(f"a.{c}") == F.col(f"b.{c}") for c in block_cols],
    ]
    co = (
        toks.alias("a")
        .join(toks.alias("b"), on=on)
        # __sza/__szb are functionally dependent on the pair — carrying
        # them as grouping keys costs 16 bytes/row in the (partially
        # combined) pair shuffle and saves two post-agg size joins
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.__sz").alias("__sza"),
            F.col("b.__sz").alias("__szb"),
        )
        .agg(F.count("*").alias("__inter"))
    )
    return (
        co.withColumn(
            "jaccard",
            F.round(
                F.col("__inter")
                / (F.col("__sza") + F.col("__szb") - F.col("__inter")),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _hash31(arr: Column, hash_fn: str = "xxhash64") -> Column:
    """Per-shingle 31-bit hashes (hash64 folded into [0, 2^31)):
    keeps a*h+b inside signed-64 range under ANSI overflow checking.
    ``h & (2^31-1)`` == ``pmod(h, 2^31)`` for every signed-64 h
    (two's-complement low bits ARE the non-negative residue for a
    power-of-two modulus) and skips pmod's division + sign fix-up
    (round 11, measured with the affine-% rewrite below: 24% off the
    signature stage, values bit-identical)."""
    return F.transform(
        arr, lambda s: hash64(s, hash_fn).bitwiseAND(F.lit((1 << 31) - 1))
    )


def _permutations(num_perm: int, seed: int) -> list[tuple[int, int]]:
    import random

    rng = random.Random(seed)
    return [
        (rng.randrange(1, MERSENNE_31), rng.randrange(0, MERSENNE_31))
        for _ in range(num_perm)
    ]


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    shingle_n: int = 1,
    seed: int = 7,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id, m_0..m_{num_perm-1}) MinHash signatures via affine permutations
    h_i(x) = (a_i*x + b_i) mod p over the Mersenne prime p = 2^31-1.

    Physical shape (the one that scales): explode to one row per (doc,
    distinct shingle hash) so each shingle is hashed ONCE, then num_perm
    min() aggregations — hash-agg with map-side partial combine, so the
    shuffle carries ~|docs| rows, not |shingles|. (A column-level variant
    building array(array_min(transform(...)) x 64) re-evaluates the whole
    shingle pipeline per permutation because CollapseProject re-inlines
    it — measured ~40x slower at 64 perms. A PROPERLY staged map-only
    variant — hashed-shingle array materialized behind a double-reference
    barrier, one transform over a (a,b)-pair literal — is value-identical
    and shuffle-free but still measured 1.4x slower at sf0.1: 64
    intermediate arrays per row allocate more than the post-combine
    shuffle costs. Revisit only if a profile shows this shuffle
    dominating at production scale.)

    Docs with zero shingles (empty text) drop out — they cannot near-dup.
    """
    return signatures_from_shingles(
        shingle_frame(df, text_col, id_col, shingle_n), num_perm, seed, hash_fn
    )


def signatures_from_shingles(
    sh: DataFrame,
    num_perm: int = 64,
    seed: int = 7,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """minhash_signatures over an ALREADY-DERIVED (id, shingles) frame —
    the sharing seam (round 11, guide §1.2: remove duplicated passes):
    minhash_lsh_pairs / incremental_minhash_pairs need the shingle frame
    TWICE, once hashed into signatures and once as the exact-Jaccard
    verify side. Deriving signatures from the verify side's checkpointed
    shingle frame makes the normalize->split->distinct corpus pass run
    ONCE instead of twice; values are identical by construction (same
    shingles in, same hash/permutation math)."""
    exploded = sh.select(
        "id", F.explode(_hash31(F.col("shingles"), hash_fn)).alias("h")
    )
    # one F.expr per permutation instead of composed F calls: identical
    # plan (h is BIGINT so the L-suffixed literals keep the same 64-bit
    # ANSI arithmetic), ~4x fewer py4j round-trips building the 64 aggs.
    # plain % instead of pmod: h >= 0 (31-bit) and a,b > 0, so the
    # dividend is non-negative and % == pmod, minus pmod's negative-
    # residue fix-up per evaluation (round 11, value-identical)
    aggs = [
        F.expr(f"min((h * {a}L + {b}L) % {MERSENNE_31}L)").alias(f"m_{k}")
        for k, (a, b) in enumerate(_permutations(num_perm, seed))
    ]
    return exploded.groupBy("id").agg(*aggs)


def banded_keys(
    sig: DataFrame, num_perm: int, bands: int, hash_fn: str = "xxhash64"
) -> DataFrame:
    """(id, band, band_hash) from a signature frame: split the num_perm
    minima into `bands` rows-per-band groups and key each band. In md5
    mode the key is the raw comma-joined minima string (portable to the
    DuckDB twin); the xxhash64 fast path compresses it to 8 bytes to
    shrink the band-join shuffle. This banded frame IS the persistable
    LSH index — store it bucketed by (band, band_hash) and incremental
    batches join it co-located (see incremental_minhash_pairs)."""
    rows_per_band = num_perm // bands
    band_keys = [
        F.expr(
            "concat_ws(','," + ",".join(
                f"CAST(m_{b * rows_per_band + r} AS STRING)"
                for r in range(rows_per_band)
            ) + ")"
        )
        for b in range(bands)
    ]
    band_hashes = band_keys if hash_fn == "md5" else [F.xxhash64(k) for k in band_keys]
    return sig.select(
        "id", F.posexplode(F.array(*band_hashes)).alias("band", "band_hash")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 1,
    threshold: float = 0.7,
    seed: int = 7,
    hash_fn: str = "xxhash64",
    verify: str = "arrays",
) -> DataFrame:
    """Near-duplicate pairs: MinHash -> banded LSH blocking -> exact
    word-shingle Jaccard verification >= threshold.

    Plan shape: explode+agg signatures -> band hashes (map-only) ->
    self-equi-join on (band, band_hash) -> distinct candidate pairs ->
    join back to cached shingle arrays for exact verify. No cartesian
    anywhere; the only wide shuffles are keyed by band hash (AQE splits
    hot buckets) and by id for the verify join.

    In md5 mode the band key is the raw comma-joined minima string (an
    equality key needs no re-hash, and the string is portable to the
    DuckDB twin); the xxhash64 fast path compresses it to 8 bytes to
    shrink the band-join shuffle.

    verify (round 10, VERDICT r9 #4) picks the exact-Jaccard verify
    physical plan, output-identical by construction: "arrays" (default)
    joins the candidates back to the shingle ARRAYS — MEASURED the right
    full-corpus shape (lshcounts10 probe: ahead on shuffle and wall at
    every doc length); "counts" derives jaccard from co-occurrence
    counts over the candidate-id-RESTRICTED token table
    (_verify_jaccard_pairs_counts; requires threshold > 0 — at t=0
    zero-overlap candidates belong in the output and only the array
    verify can see them) — the INCREMENTAL shape: against a persisted
    index it ships only the collided docs' tokens instead of the whole
    stored shingle table (lshincr10 probe).
    """
    if num_perm % bands:
        raise ValueError("num_perm must be divisible by bands")
    _check_verify_mode(verify, threshold)

    # ONE shingle pass (round 11): the checkpointed verify-side shingle
    # frame also feeds the signature sketch, so the corpus-wide
    # normalize->split->distinct chain runs once instead of twice
    # (before: the signature pipeline re-derived it from the raw scan —
    # plans/r11/dedup_minhash_lsh_before.txt operators (1)-(9) vs the
    # checkpoint job). Signature values are unchanged: same shingles in,
    # same hash/permutation math.
    #
    # localCheckpoint, not cache(): the frame is read by the sketch and
    # by both sides of the verify join; a CacheManager cache is never
    # releasable from inside this lazy function (the consuming action is
    # the caller's), and repeated invocation on the same plan spams
    # "Asked to cache already cached data". Lazy local checkpoint
    # materializes once at the first action, every consumer reads the
    # blocks, and the ContextCleaner frees them on GC (VERDICT r6 #1).
    # Trade, stated: lineage is truncated, so losing an executor mid-job
    # fails the JOB (rerun) instead of recomputing the lost blocks — the
    # same job-level-retry stance as cluster.py's iterative checkpoints;
    # a deployment that must survive executor loss inside one dedup job
    # should persist the index with build_minhash_index (parquet) and
    # join against that.
    sh = shingle_frame(df, text_col, id_col, shingle_n).localCheckpoint(eager=False)
    sig = signatures_from_shingles(sh, num_perm, seed, hash_fn)
    banded = banded_keys(sig, num_perm, bands, hash_fn)
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
    if verify == "counts":
        return _verify_jaccard_pairs_counts(cands, sh, threshold)
    return _verify_jaccard_pairs(cands, sh, threshold)


def build_minhash_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 1,
    seed: int = 7,
    hash_fn: str = "xxhash64",
) -> tuple[DataFrame, DataFrame]:
    """The persistable near-dup index of a corpus: (bands, shingles).

    bands:    (id, band, band_hash) — the LSH blocking table;
    shingles: (id, shingles)        — the verify-side shingle sets.

    At 100 TB both are written ONCE (bands bucketed by (band, band_hash),
    shingles bucketed by id — sinks/bucketed.py), and every subsequent
    ingest batch joins them co-located via incremental_minhash_pairs —
    the historical corpus is never re-sketched."""
    if num_perm % bands:
        raise ValueError("num_perm must be divisible by bands")
    sig = minhash_signatures(df, text_col, id_col, num_perm, shingle_n, seed, hash_fn)
    return (
        banded_keys(sig, num_perm, bands, hash_fn),
        shingle_frame(df, text_col, id_col, shingle_n),
    )


def incremental_minhash_pairs(
    new_docs: DataFrame,
    index_bands: DataFrame,
    index_shingles: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 1,
    threshold: float = 0.7,
    seed: int = 7,
    hash_fn: str = "xxhash64",
    within_batch: bool = True,
    verify: str = "auto",
    index_rows: int | None = None,
    batch_rows: int | None = None,
) -> DataFrame:
    """Near-dup pairs of a NEW ingest batch against a PERSISTED index
    (build_minhash_index) — the shape a 100 TB pipeline actually runs
    daily: sketch only the increment, join the stored band table
    (co-located when bucketed), verify against stored shingles. The
    historical corpus contributes no compute beyond the index reads.

    Returns (id_a, id_b, jaccard) with id_a < id_b, covering new-x-old
    pairs plus (with within_batch=True) new-x-new pairs. With the same
    parameters/seed, the output is EXACTLY the full-corpus
    minhash_lsh_pairs restricted to pairs touching the new batch
    (asserted in tests/test_dedup.py and by the driver oracle's 'incr'
    leg) — incrementality changes cost, not semantics. Assumes new ids
    are not already in the index (re-ingest dedup is exact_dedup's job).

    verify: same physical-plan contract as minhash_lsh_pairs, with a
    MEASURED two-sided tradeoff here (round 10, both directions caught
    by instruments the same round): "counts" pays when the stored index
    dwarfs the batch's collision set — the array verify shuffles the
    ENTIRE stored shingle table through both join legs while counts'
    candidate-id semi-restriction ships only collided docs (lshincr10
    probe: 0.22 -> 0.13 GB at a 500k-index/5k-batch point, gap linear
    in index size) — but LOSES when candidates are dense relative to
    the index (the calibration-normalized bench comparison flagged a
    counts default at the sf0.1 point — 4k-doc index, 1k-doc near-dup-
    dense batch — as a 3.5x wall regression: counts ships |A| token
    rows per candidate pair, and with ~30x more pairs than batch docs
    that dominates the small index's arrays).

    verify="auto" (the default since round 11, VERDICT r10 #2) decides
    from the two cheap observables — stored-index rows vs batch rows
    (_auto_incremental_verify; counts iff index >=
    AUTO_INCR_VERIFY_RATIO x batch, calibrated by the lshincr11 sweep) —
    so the daily-ingest deployment whose index has outgrown its batches
    gets the counts plan without opting in, while the small-index/dense-
    batch regime keeps arrays. Pass index_rows/batch_rows to skip the
    two count jobs the decision otherwise runs (one metadata-cheap count
    on a parquet-backed index; a persisted-index meta row count, the ANN
    family's pattern, is the production source for the hint). Explicit
    "arrays"/"counts" remain for deployments that have measured their
    own regime.
    """
    if num_perm % bands:
        raise ValueError("num_perm must be divisible by bands")
    if verify == "auto":
        if not threshold > 0:
            verify = "arrays"
        else:
            if index_rows is None:
                index_rows = index_shingles.count()
            if batch_rows is None:
                batch_rows = new_docs.count()
            verify = _auto_incremental_verify(threshold, index_rows, batch_rows)
    _check_verify_mode(verify, threshold)
    # ONE batch shingle pass (round 11, same seam as minhash_lsh_pairs):
    # the batch's shingle frame feeds both the signature sketch and the
    # verify union below; checkpointing it runs the batch's
    # normalize->split->distinct once. Values unchanged.
    new_sh = shingle_frame(
        new_docs, text_col, id_col, shingle_n
    ).localCheckpoint(eager=False)
    new_sig = signatures_from_shingles(new_sh, num_perm, seed, hash_fn)
    new_banded = banded_keys(new_sig, num_perm, bands, hash_fn)
    cross = (
        new_banded.alias("a")
        .join(
            index_bands.alias("b"),
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.band_hash") == F.col("b.band_hash"),
                F.col("a.id") != F.col("b.id"),
            ],
        )
        .select(
            F.least(F.col("a.id"), F.col("b.id")).alias("id_a"),
            F.greatest(F.col("a.id"), F.col("b.id")).alias("id_b"),
        )
    )
    cands = cross
    if within_batch:
        within = (
            new_banded.alias("a")
            .join(
                new_banded.alias("b"),
                on=[
                    F.col("a.band") == F.col("b.band"),
                    F.col("a.band_hash") == F.col("b.band_hash"),
                    F.col("a.id") < F.col("b.id"),
                ],
            )
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        )
        cands = cands.unionByName(within)
    cands = cands.distinct()
    all_sh = index_shingles.unionByName(new_sh)
    if verify == "counts":
        return _verify_jaccard_pairs_counts(cands, all_sh, threshold)
    return _verify_jaccard_pairs(cands, all_sh, threshold)


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


def simhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
    shingle_n: int = 1,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id, sh) SimHash signatures via the scalable explode+agg plan:
    one row per (doc, shingle hash), then `bits` sign-sum aggregations
    (map-side combinable) and a final bit-string assembly. Identical
    output to the fold-based simhash_bits, minus its per-row expression
    blowup. Zero-shingle docs drop out.

    md5 mode yields only MD5_BITS (48) usable hash bits, so callers must
    keep bits <= 48 there (the default 64 is the xxhash64 fast path)."""
    if hash_fn == "md5" and bits > MD5_BITS:
        raise ValueError(f"md5 mode supplies {MD5_BITS} hash bits; got bits={bits}")
    exploded = shingle_frame(df, text_col, id_col, shingle_n).select(
        "id",
        F.explode(
            F.transform(F.col("shingles"), lambda s: hash64(s, hash_fn))
        ).alias("h"),
    )
    sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b_{i}")
        for i in range(bits)
    ]
    tallies = exploded.groupBy("id").agg(*sums)
    sh = F.concat(
        *[F.when(F.col(f"b_{i}") > 0, F.lit("1")).otherwise(F.lit("0")) for i in range(bits)]
    )
    return tallies.select("id", sh.alias("sh"))


def simhash_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
    band_bits: int = 16,
    max_hamming: int = 3,
    shingle_n: int = 1,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Near-dup pairs by SimHash: block on any shared band (bits/band_bits
    bands), verify Hamming distance <= max_hamming."""
    n_bands = bits // band_bits
    base = simhash_signatures(df, text_col, id_col, bits, shingle_n, hash_fn)
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


#: slack absorbing _jaccard's round-to-6: round(i/u, 6) moves the value by
#: at most 5e-7, so a pair the UNPRUNED filter keeps (round(J,6) >= t) has
#: true J >= t - 5e-7 > t - JACCARD_PRUNE_SLACK — prune conditions derived
#: from t - JACCARD_PRUNE_SLACK can therefore never drop such a pair, and
#: the extra 5e-7 headroom also swallows the <=1e-10 double-arithmetic
#: error of evaluating the bound itself.
JACCARD_PRUNE_SLACK = 1e-6


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_cols: list[str] | None = None,
    shingle_n: int = 1,
    threshold: float = 0.0,
    prune: str | None = None,
    verify: str = "auto",
) -> DataFrame:
    """Exact word-shingle Jaccard for pairs sharing a blocking key —
    the oracle-checkable ground-truth dedup (and recall yardstick for the
    MinHash/SimHash sketches). With block_cols=None it is a full
    cross-pairing (testing only).

    SCALE BOUNDARY, now with exactness-preserving prunes (round 8,
    VERDICT r7 #1). The unpruned form verifies every in-block pair —
    quadratic within each block by semantics (sf0.1 4.9 s -> sf1 151 s on
    ~4 source blocks, r~31 per 10x, SCALING.md round 7). Two opt-in
    candidate prunes keep the output EXACTLY equal while skipping pairs
    that provably cannot reach the threshold (both require
    ``threshold > 0``; both keep the same full-set verify stage, so a
    kept pair's jaccard value is bit-identical):

    - ``prune="length"``: Jaccard(A,B) <= min(|A|,|B|)/max(|A|,|B|), so
      pairs whose sizes differ by more than the threshold ratio are
      dropped INSIDE the block join (an extra non-equi predicate — no new
      shuffle, evaluated before the array intersect/union).
    - ``prune="prefix"``: PPJoin-style prefix filtering (Xiao et al.,
      WWW'08 — technique only, original implementation). Tokens are
      globally ordered by (corpus frequency, token); if J(A,B) >= t then
      |A∩B| >= ceil(t|A|) and the SMALLEST common token must sit in the
      first |A| - ceil(t|A|) + 1 tokens of A (else A holds >= that many
      tokens below it, none common, capping the overlap at ceil(t|A|)-1)
      — symmetrically for B. Candidates come from an equi-join on
      exploded PREFIX tokens (+ block keys), which by construction keys
      on each doc's RAREST tokens — small join groups, no quadratic
      block. Costs one token-count agg + one token join + one per-doc
      sort; wins exactly where the quadratic block hurts (large blocks
      with varied vocabulary). The length predicate is fused in too.

    Both prunes back the threshold off by JACCARD_PRUNE_SLACK so the
    round-to-6 in ``_jaccard`` can never disagree with the real-valued
    bound the prune reasons about (pruned == unpruned, asserted by tests
    and a hypothesis property referee).

    Near-dup-DENSE corpora (every pair a real near-dup) keep the honest
    boundary: prunes cannot drop pairs that genuinely qualify, so the
    verify stage still touches every qualifying pair — run minhash for
    production there (measured LINEAR, lsh10 probe); this referee prunes
    well on varied-length corpora (SCALING.md round-8 table measures
    both).

    ``verify`` (round 9, VERDICT r8 #3) picks the exact physical plan,
    output-identical by construction:

    - ``"arrays"``: candidate pairs join back to the shingle ARRAYS and
      intersect/union per pair.
    - ``"counts"``: the exploded token table SELF-JOINS on (token,
      *blocks) and a map-side-combined hash-agg counts shared tokens per
      pair; jaccard derives exactly as inter/(sza+szb-inter). No shingle
      array ever shuffles (the prefix10 probe's 65 GB array shuffle
      becomes ~16-byte token rows), and candidate generation is
      SUBSUMED — every qualifying pair shares a token — so ``prune`` is
      ignored (the length predicate is always fused into the join).
      Requires ``threshold > 0`` (zero-overlap pairs never enter the
      self-join). Boundary: per-token fan-out is df(token)^2 — hot
      tokens are the dense-corpus wall, same as the block join's.
    - ``"auto"`` (default since round 10, VERDICT r9 #5): counts iff it
      is output-preserving (threshold > 0), else arrays. The planned
      stats-based crossover rule turned out to have an EMPTY crossover:
      structurally, the counts join enumerates one row per shared token
      per in-block pair (sum over pairs of |A∩B|) while the array verify
      ships |A|+|B| >= |A∩B| array elements for the SAME pairs — counts
      never moves more data — and the same-session measurements on both
      regime corpora confirm it wins the constant factors too
      (near-dup-dense 50k: 60.1 s arrays -> 30.9 s counts; varied 30k:
      33.8 s prefix-pruned arrays -> 6.3 s counts; SCALING.md round 10).
      The only regime arrays can see that counts cannot is t=0, where
      zero-overlap pairs belong in the output — exactly the guard.
      Explicit modes are kept for the equivalence property grid and for
      corpora a caller knows to be hot-token-bound on BOTH paths (those
      belong to minhash regardless)."""
    if prune not in (None, "length", "prefix"):
        raise ValueError(f"prune={prune!r}: expected None, 'length' or 'prefix'")
    if verify not in ("arrays", "counts", "auto"):
        raise ValueError(
            f"verify={verify!r}: expected 'arrays', 'counts' or 'auto'"
        )
    if verify == "auto":
        verify = "counts" if threshold > 0 else "arrays"
    if prune is not None and not threshold > 0:
        raise ValueError(
            "prune requires threshold > 0: at t=0 every pair (even with "
            "zero overlap) belongs in the output, so nothing can be pruned"
        )
    if verify == "counts" and not threshold > 0:
        raise ValueError(
            "verify='counts' requires threshold > 0: zero-overlap pairs "
            "drop out of the token join, which only preserves the output "
            "when such pairs cannot qualify"
        )
    if threshold > 1:
        # Jaccard is bounded by 1; beyond it the unpruned path returns
        # empty but the prefix prune's p_len = |A| - ceil(t*|A|) + 1 goes
        # negative and F.slice throws mid-job — fail loud at entry instead
        raise ValueError(f"threshold={threshold}: Jaccard similarity is <= 1")
    base = shingle_frame(
        df, text_col, id_col, shingle_n, extra_cols=tuple(block_cols or [])
    ).withColumnRenamed("shingles", "sh")
    t_eff = threshold - JACCARD_PRUNE_SLACK
    if verify == "counts":
        # the token self-join SUBSUMES candidate generation (every
        # qualifying pair shares a token), so prune modes are a no-op
        # here — the length predicate is always fused, and a prefix stage
        # would only add work ahead of the same self-join
        return _jaccard_pairs_counts(base, block_cols or [], threshold, t_eff)
    if prune == "prefix":
        return _jaccard_pairs_prefix(base, block_cols or [], threshold, t_eff)
    on = [F.col("a.id") < F.col("b.id")] + [
        F.col(f"a.{c}") == F.col(f"b.{c}") for c in (block_cols or [])
    ]
    if prune == "length":
        base = base.withColumn("__sz", F.size("sh"))
        sa, sb = F.col("a.__sz").cast("double"), F.col("b.__sz").cast("double")
        on.append(F.least(sa, sb) >= F.lit(t_eff) * F.greatest(sa, sb))
    pairs = (
        base.alias("a")
        .join(base.alias("b"), on=on)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            _jaccard(F.col("a.sh"), F.col("b.sh")).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return pairs


def _jaccard_pairs_prefix(
    base: DataFrame, block_cols: list[str], threshold: float, t_eff: float
) -> DataFrame:
    """Prefix-filtered candidate generation + exact verify (see
    ngram_jaccard_pairs). ``base`` = (id, *block_cols, sh).

    Plan shape: one token-count hash agg (map-side combine), one
    token-keyed join attaching counts to (doc, token) rows, one per-doc
    hash agg sorting each doc's tokens by global (count, token) order and
    slicing the prefix, one equi-join on exploded prefix tokens, then the
    same verify-join-by-id as minhash_lsh_pairs. No global rank window:
    the total order is carried VALUE-wise as the sortable (count, token)
    struct, so nothing single-tasks at any scale."""
    # read by the candidate pipeline AND both verify joins; localCheckpoint
    # (not cache) for the same lifecycle reasons as minhash_lsh_pairs'
    # shingle frame — materialized once at the first action, blocks freed
    # on GC, no CacheManager state from a lazy registry-style function
    sh = base.localCheckpoint(eager=False)
    sized = sh.withColumn("__sz", F.size("sh"))
    toks = sized.select(
        "id", *block_cols, "__sz", F.explode("sh").alias("tok")
    )
    counts = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    # prefix length p = sz - ceil(t_eff*sz) + 1; the -1e-9 keeps a
    # double-rounding-UP of an exactly-integer product from shortening
    # the prefix by one (an under-shoot only lengthens it — safe)
    p_len = (
        F.col("__sz")
        - F.ceil(F.lit(t_eff) * F.col("__sz").cast("double") - F.lit(1e-9))
        + 1
    ).cast("int")
    prefixes = (
        toks.join(counts, "tok")
        .groupBy("id", *block_cols)
        .agg(
            F.slice(
                F.array_sort(F.collect_list(F.struct("cnt", "tok"))),
                F.lit(1),
                F.max(p_len),
            ).alias("__prefix"),
            F.max("__sz").alias("__sz"),
        )
        .select(
            "id", *block_cols, "__sz",
            F.explode("__prefix.tok").alias("tok"),
        )
    )
    sa, sb = F.col("a.__sz").cast("double"), F.col("b.__sz").cast("double")
    cands = (
        prefixes.alias("a")
        .join(
            prefixes.alias("b"),
            on=[
                F.col("a.tok") == F.col("b.tok"),
                F.col("a.id") < F.col("b.id"),
                # the length predicate prunes inside this join too
                F.least(sa, sb) >= F.lit(t_eff) * F.greatest(sa, sb),
                *[F.col(f"a.{c}") == F.col(f"b.{c}") for c in block_cols],
            ],
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    return _verify_jaccard_pairs(cands, sh, threshold, shingle_col="sh")
