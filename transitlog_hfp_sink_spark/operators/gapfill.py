"""TimescaleDB ``time_bucket_gapfill`` / ``locf`` / ``interpolate`` parity.

The reference's sink is a TimescaleDB hypertable (run/init.sql:21-24), and
``time_bucket_gapfill`` is the standard Timescale idiom for charting a
rollup with no missing buckets: densify the time axis per series, carry
the last observation forward (``locf``) or linearly interpolate between
the surrounding observed buckets (``interpolate``).

Spark-first decomposition: the bucketing + aggregation stage is ordinary
``groupBy(time_bucket, series).agg(...)`` (the caller owns it, exactly as
TimescaleDB composes gapfill AROUND an aggregate query), and this module
adds only the densify+fill stage. Round-7 shape — fills are resolved on
the OBSERVED rows, before densification, so the dense grid is never
windowed at all:

1. fill state:   per series ordered by bucket, window expressions over
                 the observed rows compute, for every observation, the
                 enclosing fill context each emitted row will need:
                 ``lag(bucket)`` (the gap being closed), the last
                 non-null value/time strictly BEFORE this row (running
                 ASC frame), and the first non-null value/time AT/AFTER
                 it (reversed DESC running frame — Spark evaluates
                 (currentRow, unboundedFollowing) frames quadratically;
                 the reversed prefix is the linear running form).
2. slice split:  each observed row covers the buckets in
                 ``(lag(bucket), bucket]``; rows covering more than
                 ``max_slice_buckets`` split into bounded slice rows
                 (``explode(sequence(0, (n-1) div M))``), then ONE
                 repartition by (series, bucket, slice) spreads the
                 slices of a pathological gap across tasks.
3. gap explode:  each slice row map-only ``explode(sequence(...))``s its
                 ≤ M buckets; fills are pure per-row arithmetic over the
                 carried state (gap rows take the carried prev/next pair,
                 the observed bucket takes its own value).

Why this beats windowing the dense grid (the round-5/6 shape): the only
exchanges are (a) the window shuffle of the OBSERVED rows and (b) the
slice repartition — also of observed-row-count order — while the result
rows (potentially 1000× the observations) are produced map-only and never
sorted. And the round-6 skew caveat is gone: a single row closing an
enormous gap (two observations a year apart at 1 s buckets = ~31M
buckets) previously concentrated its whole output in one task and one
``sequence()`` array; it now fans out as ~480 slice rows hashed across
the cluster, each emitting ≤ 65536 buckets (also comfortably inside
Spark's sequence-length cap, which a multi-year 1 s gap would otherwise
overflow).

Edge semantics match TimescaleDB: ``locf`` is NULL before the first
observed bucket of a series, ``interpolate`` is NULL outside the first/
last observed buckets (no extrapolation), and plain (unfilled) columns
are NULL in gap rows. ``zero`` fill is the common charting convenience
(coalesce to 0 — what count aggregates want).

Cross-engine note: the interpolation arithmetic is exactly mirrored by
the DuckDB twins (all-double operands, ``pv + (nv - pv) * (t - pt) /
(nt - pt)`` evaluation order), so the raw doubles are bit-identical;
``round_interpolated`` stays None in twinned queries because round()
itself diverges at repr-tie boundaries (Spark rounds the shortest decimal
repr via BigDecimal.valueOf; DuckDB rounds the binary value).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: fill policies: column -> one of these
FILL_POLICIES = ("null", "zero", "locf", "interpolate")

#: buckets emitted per exploded slice; bounds both the per-task result
#: concentration of a pathological gap and the sequence() array size
DEFAULT_SLICE_BUCKETS = 65536


def gapfill_buckets(
    bucketed: DataFrame,
    bucket_col: str,
    width_s: int,
    series_cols: Sequence[str],
    fill: dict[str, str],
    round_interpolated: int | None = None,
    max_slice_buckets: int = DEFAULT_SLICE_BUCKETS,
) -> DataFrame:
    """Densify ``bucketed`` (one row per observed (series, bucket)) onto
    the full per-series bucket grid and fill value columns per policy.

    ``bucketed``'s ``bucket_col`` must already be bucket-aligned (the
    output of ``date_trunc``/``time_bucket`` + groupBy). ``fill`` maps
    each value column to 'null' | 'zero' | 'locf' | 'interpolate';
    columns not mentioned are dropped. ``round_interpolated`` optionally
    rounds interpolated columns (both the observed and filled values) to
    N decimals — leave it None for cross-engine twins (module docstring).
    ``max_slice_buckets`` caps the buckets one task materializes for a
    single gap; the default spreads a 31M-bucket gap over ~480 tasks.
    """
    for c, policy in fill.items():
        if policy not in FILL_POLICIES:
            raise ValueError(f"fill[{c!r}] = {policy!r}: must be one of {FILL_POLICIES}")
    if max_slice_buckets < 1:
        raise ValueError("max_slice_buckets must be >= 1")
    series_cols = list(series_cols)
    b = F.col(bucket_col)
    dtypes = dict(bucketed.dtypes)
    w = int(width_s)
    m = int(max_slice_buckets)
    itv = f"interval {w} seconds"

    # -- 1. fill state on the OBSERVED rows (the only windowed stage) ----
    # NULL series keys stay real window partitions, so they densify like
    # any other series (round-5 review fix, test_gapfill_null_series_*).
    w_asc = Window.partitionBy(*series_cols).orderBy(b.asc())
    # last non-null strictly BEFORE this observation == the fill context
    # of every gap row this observation emits (no observations lie inside
    # the gap), and of the observation itself when its value is NULL
    w_prev = w_asc.rowsBetween(Window.unboundedPreceding, -1)
    # first non-null AT/AFTER, via the reversed running frame (linear;
    # (currentRow, unboundedFollowing) re-aggregates per row — O(rows^2))
    w_next = (
        Window.partitionBy(*series_cols)
        .orderBy(b.desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t_obs = F.unix_micros(b)

    carry = [F.lag(b).over(w_asc).alias("__prev")]
    for c, policy in fill.items():
        v = F.col(c)
        if policy in ("locf", "interpolate"):
            carry.append(F.last(v, ignorenulls=True).over(w_prev).alias(f"__pv_{c}"))
        if policy == "interpolate":
            carry += [
                F.last(F.when(v.isNotNull(), t_obs), ignorenulls=True)
                .over(w_prev)
                .alias(f"__pt_{c}"),
                F.last(v, ignorenulls=True).over(w_next).alias(f"__nv_{c}"),
                F.last(F.when(v.isNotNull(), t_obs), ignorenulls=True)
                .over(w_next)
                .alias(f"__nt_{c}"),
            ]
    staged = bucketed.select(
        *series_cols, bucket_col, *[F.col(c) for c in fill], *carry
    )

    # -- 2. bounded slices + spread ---------------------------------------
    # each observed row covers __n buckets: (lag(bucket), bucket], i.e.
    # bucket - (__n-1-i)*width for i in [0, __n); the series' first row
    # covers just itself
    n_raw = F.when(F.col("__prev").isNull(), F.lit(1).cast("long")).otherwise(
        F.expr(f"(unix_seconds(`{bucket_col}`) - unix_seconds(`__prev`)) div {w}")
    )
    # fail-loud input-contract guard (round 8, VERDICT r7 #2 / ADVICE r7):
    # a duplicate (series, bucket) row — the input must be the groupBy
    # output, one row per observed bucket — makes lag(bucket) == bucket,
    # so __n = 0 and the slice arithmetic below would surface as an opaque
    # "illegal sequence boundaries" error. A NULL bucket is the same class
    # of violation (time_bucket of a NULL timestamp escaped the caller's
    # aggregation) and must not slip past via lag's null-propagation —
    # NULLs sort first, so duplicate NULL buckets would each see
    # lag(bucket)=NULL and take the first-row branch, silently emitting
    # duplicate output rows. assert_true is fused into the __n expression
    # (returns NULL on pass, throws the named message on violation) so the
    # check costs no extra pass; same fusion pattern as
    # sampling.weighted_take's weight guard.
    guard = F.assert_true(
        b.isNotNull() & (n_raw >= 1),
        F.concat(
            F.lit(
                "gapfill_buckets: input contract violated — NULL bucket, "
                f"duplicate (series, {bucket_col}) row, or sub-width bucket "
                f"spacing (buckets must be {w}s-aligned) at {bucket_col}="
            ),
            F.coalesce(b.cast("string"), F.lit("NULL")),
        ),
    )
    sliced = (
        staged.withColumn("__n", F.coalesce(guard.cast("long"), F.lit(0)) + n_raw)
        .withColumn("__obs", b)
        .withColumn("__slice", F.explode(F.expr(f"sequence(0L, (`__n` - 1) div {m})")))
        .drop("__prev")
    )
    # one shuffle of slice rows (observed-row-count order, NOT result-row
    # order) so a giant gap's slices land on different tasks. The
    # partition count is pinned: AQE coalesces by shuffle BYTES, and slice
    # rows are tiny pre-explode — letting it coalesce would re-concentrate
    # the whole gap on one task, the exact failure this stage prevents.
    conf_val = bucketed.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    try:
        n_shuffle = int(conf_val)
    except ValueError:  # e.g. "auto" on AQE-auto deployments
        n_shuffle = bucketed.sparkSession.sparkContext.defaultParallelism
    sliced = sliced.repartition(
        n_shuffle, *series_cols, F.col("__obs"), F.col("__slice")
    )

    # -- 3. map-only densify + per-row fills ------------------------------
    # slice s emits bucket indices [s*m, min((s+1)*m, n) - 1]
    g = sliced.withColumn(
        bucket_col,
        F.explode(
            F.expr(
                f"sequence(`__obs` - {itv} * (`__n` - 1 - `__slice` * {m}), "
                f"`__obs` - {itv} * (`__n` - least((`__slice` + 1) * {m}, `__n`)), "
                f"{itv})"
            )
        ),
    )

    is_obs = b == F.col("__obs")
    t = F.unix_micros(b)
    out_cols = [*series_cols, bucket_col]
    for c, policy in fill.items():
        v = F.col(c)
        obs_v = F.when(is_obs, v)  # NULL on gap rows (v is the EMITTER's value)
        if policy == "null":
            filled = obs_v
        elif policy == "zero":
            filled = F.coalesce(obs_v, F.lit(0).cast(dtypes[c]))
        elif policy == "locf":
            filled = F.coalesce(obs_v, F.col(f"__pv_{c}"))
        else:  # interpolate — linear between the surrounding observations
            pv = F.col(f"__pv_{c}").cast("double")
            pt = F.col(f"__pt_{c}").cast("double")
            nv = F.col(f"__nv_{c}").cast("double")
            nt = F.col(f"__nt_{c}").cast("double")
            # exact arithmetic mirrored by the DuckDB twin: all-double
            # operands, pv + (nv - pv) * frac evaluation order
            filled = F.when(is_obs & v.isNotNull(), v.cast("double")).otherwise(
                pv + (nv - pv) * (t.cast("double") - pt) / (nt - pt)
            )
            if round_interpolated is not None:
                filled = F.round(filled, round_interpolated)
        out_cols.append(filled.alias(c))
    return g.select(*out_cols)
