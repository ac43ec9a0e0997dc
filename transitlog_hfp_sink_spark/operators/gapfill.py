"""TimescaleDB ``time_bucket_gapfill`` / ``locf`` / ``interpolate`` parity.

The reference's sink is a TimescaleDB hypertable (run/init.sql:21-24), and
``time_bucket_gapfill`` is the standard Timescale idiom for charting a
rollup with no missing buckets: densify the time axis per series, carry
the last observation forward (``locf``) or linearly interpolate between
the surrounding observed buckets (``interpolate``).

Spark-first decomposition: the bucketing + aggregation stage is ordinary
``groupBy(time_bucket, series).agg(...)`` (the caller owns it, exactly as
TimescaleDB composes gapfill AROUND an aggregate query), and this module
adds only the densify+fill stage:

1. per-series span:    one partial-agg ``min/max(bucket)`` (map-side
                       combine, tiny output — one row per series);
2. dense spine:        ``explode(sequence(mn, mx, interval))`` — map-only
                       row generation, O(series x buckets) rows total,
                       which is the size of the RESULT (gapfill cannot
                       emit less);
3. left join:          spine ⟕ bucketed on (series, bucket) — both sides
                       hash-partition on the same key; AQE broadcasts the
                       bucketed side when small;
4. fills:              pure window expressions over ONE exchange
                       (partitionBy series, orderBy bucket):
                       ``last(ignorenulls)`` looking back for locf and
                       the prev/next-observation pair for interpolate.

Everything is JVM-side expressions — no UDF, no collect. At 100 TB the
per-series state is two window passes over already-dense series; series
count is the parallelism axis (route/vehicle/event_type — high
cardinality, no giant key).

Edge semantics match TimescaleDB: ``locf`` is NULL before the first
observed bucket of a series, ``interpolate`` is NULL outside the first/
last observed buckets (no extrapolation), and plain (unfilled) columns
are NULL in gap rows. ``zero`` fill is the common charting convenience
(coalesce to 0 — what count aggregates want).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: fill policies: column -> one of these
FILL_POLICIES = ("null", "zero", "locf", "interpolate")


def gapfill_buckets(
    bucketed: DataFrame,
    bucket_col: str,
    width_s: int,
    series_cols: Sequence[str],
    fill: dict[str, str],
    round_interpolated: int | None = None,
) -> DataFrame:
    """Densify ``bucketed`` (one row per observed (series, bucket)) onto
    the full per-series bucket grid and fill value columns per policy.

    ``bucketed``'s ``bucket_col`` must already be bucket-aligned (the
    output of ``date_trunc``/``time_bucket`` + groupBy). ``fill`` maps
    each value column to 'null' | 'zero' | 'locf' | 'interpolate';
    columns not mentioned are dropped. ``round_interpolated`` optionally
    rounds interpolated columns (both the observed and filled values) to
    N decimals so a cross-engine twin hashes bit-identically.
    """
    for c, policy in fill.items():
        if policy not in FILL_POLICIES:
            raise ValueError(f"fill[{c!r}] = {policy!r}: must be one of {FILL_POLICIES}")
    series_cols = list(series_cols)
    b = F.col(bucket_col)

    # two consumers read `bucketed` (the spine's min/max agg and the join
    # probe) and Catalyst does not share the subtree across the differing
    # partitionings — persist so the caller's aggregation runs ONCE. The
    # cache is bounded by the RESULT size (series x observed buckets),
    # never the raw input, so this is safe at any input scale.
    bucketed = bucketed.persist()

    spine = (
        bucketed.groupBy(*series_cols)
        .agg(F.min(b).alias("__mn"), F.max(b).alias("__mx"))
        .select(
            *series_cols,
            F.explode(
                F.expr(f"sequence(__mn, __mx, interval {int(width_s)} seconds)")
            ).alias(bucket_col),
        )
    )
    # NULL-SAFE series equality: groupBy keeps a NULL series as a real
    # group, but a plain equi-join would never rejoin its observed rows —
    # the NULL series would come back all-gaps (zero-filled counts over
    # real data). Buckets themselves are non-null (min/max/sequence).
    right = bucketed.select(
        *[F.col(c).alias(f"__r_{c}") for c in series_cols + [bucket_col]],
        *[F.col(c) for c in fill],
    )
    cond = F.col(bucket_col) == F.col(f"__r_{bucket_col}")
    for c in series_cols:
        cond = cond & F.col(c).eqNullSafe(F.col(f"__r_{c}"))
    g = spine.join(right, on=cond, how="left").drop(
        *[f"__r_{c}" for c in series_cols + [bucket_col]]
    )

    w_prev = (
        Window.partitionBy(*series_cols)
        .orderBy(b.asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy(*series_cols)
        .orderBy(b.asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    t = F.unix_micros(b)

    out_cols = [*series_cols, bucket_col]
    for c, policy in fill.items():
        v = F.col(c)
        if policy == "null":
            filled = v
        elif policy == "zero":
            filled = F.coalesce(v, F.lit(0).cast(dict(bucketed.dtypes)[c]))
        elif policy == "locf":
            filled = F.last(v, ignorenulls=True).over(w_prev)
        else:  # interpolate — linear between the surrounding observations
            pv = F.last(v, ignorenulls=True).over(w_prev)
            pt = F.last(F.when(v.isNotNull(), t), ignorenulls=True).over(w_prev)
            nv = F.first(v, ignorenulls=True).over(w_next)
            nt = F.first(F.when(v.isNotNull(), t), ignorenulls=True).over(w_next)
            # exact arithmetic mirrored by the DuckDB twin: all-double
            # operands, pv + (nv - pv) * frac evaluation order
            filled = F.when(v.isNotNull(), v.cast("double")).otherwise(
                pv.cast("double")
                + (nv.cast("double") - pv.cast("double"))
                * (t.cast("double") - pt.cast("double"))
                / (nt.cast("double") - pt.cast("double"))
            )
            if round_interpolated is not None:
                filled = F.round(filled, round_interpolated)
        out_cols.append(filled.alias(c))
    return g.select(*out_cols)
