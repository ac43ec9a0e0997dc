"""Geohash encoding as pure Catalyst expressions + a DuckDB SQL twin.

SURVEY §2.5 Q4 maps the reference's lat/long btree workload
(run/init.sql:83-84) to pushed double-range predicates, with geohash
bucketing as the optional spatial-clustering column — this module
provides that column. Standard geohash: lat/lon quantized to
interleaved bits (lon first), 5 bits per base32 character.

Both the Spark expression and the SQL twin are generated from the SAME
Python loop over bit positions, so the engines agree bit-for-bit (the
same IEEE double scaling feeds identical integer bit math — the
technique proven by plans/zorder.py's Morton-key oracle).

Scale: map-only projection (codegen); use as partitionBy/bucketing
column so spatial scans prune like the time dimension does.

Precision note: this uses the SCALING formulation (quantize once, then
bit-split) rather than per-bit interval bisection. The two agree for
any coordinate at real-world granularity (hypothesis-fuzzed at 1e-7
degrees ~ 1 cm in tests/test_geo.py), but can differ for pathological
inputs within ~1e-13 deg of a cell boundary, where adding 90/180
absorbs the sub-epsilon offset. Spark and the SQL twin share the exact
same formula, so the engines NEVER disagree with each other.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _bit_plan(precision: int) -> tuple[int, int, int, list[tuple[str, int]]]:
    """(bits, nlon, nlat, sources): sources[j] = ('lon'|'lat', msb-index)
    for interleaved output bit j (lon leads, per the geohash spec)."""
    bits = 5 * precision
    nlon = (bits + 1) // 2
    nlat = bits // 2
    sources = []
    for j in range(bits):
        if j % 2 == 0:
            sources.append(("lon", j // 2))
        else:
            sources.append(("lat", j // 2))
    return bits, nlon, nlat, sources


def geohash_encode(lat: Column | str, lon: Column | str, precision: int = 6) -> Column:
    """Base32 geohash of (lat, lon) at the given precision (chars)."""
    la = F.col(lat) if isinstance(lat, str) else lat
    lo = F.col(lon) if isinstance(lon, str) else lon
    bits, nlon, nlat, sources = _bit_plan(precision)
    ix = F.least(
        F.lit((1 << nlon) - 1),
        F.floor((lo + 180.0) / 360.0 * float(1 << nlon)),
    ).cast("bigint")
    iy = F.least(
        F.lit((1 << nlat) - 1),
        F.floor((la + 90.0) / 180.0 * float(1 << nlat)),
    ).cast("bigint")
    v = F.lit(0).cast("bigint")
    for which, msb in sources:
        src, n = (ix, nlon) if which == "lon" else (iy, nlat)
        bit = F.shiftright(src, n - 1 - msb).bitwiseAND(F.lit(1))
        v = v * 2 + bit
    arr = F.array(*[F.lit(c) for c in BASE32])
    chars = [
        F.element_at(
            arr,
            (
                F.shiftright(v, 5 * (precision - 1 - k)).bitwiseAND(F.lit(31)) + 1
            ).cast("int"),
        )
        for k in range(precision)
    ]
    return F.concat(*chars)


def geohash_sql_parts(
    lat_expr: str, lon_expr: str, precision: int = 6
) -> dict[str, str]:
    """The DuckDB-SQL twin of geohash_encode as staged CTE pieces,
    generated from the same bit plan. Compose as:

        s1 AS (SELECT *, {ix} AS __ix, {iy} AS __iy FROM ...),
        s2 AS (SELECT *, {v} AS __v FROM s1),
        ... SELECT {chars} AS geohash FROM s2
    """
    bits, nlon, nlat, sources = _bit_plan(precision)
    ix = (
        f"least({(1 << nlon) - 1}, CAST(floor(({lon_expr} + 180.0) / 360.0 * "
        f"{float(1 << nlon)}) AS BIGINT))"
    )
    iy = (
        f"least({(1 << nlat) - 1}, CAST(floor(({lat_expr} + 90.0) / 180.0 * "
        f"{float(1 << nlat)}) AS BIGINT))"
    )
    terms = []
    for j, (which, msb) in enumerate(sources):
        src, n = ("__ix", nlon) if which == "lon" else ("__iy", nlat)
        shift = bits - 1 - j
        terms.append(f"((({src} >> {n - 1 - msb}) & 1) << {shift})")
    v = "(" + " | ".join(terms) + ")"
    chars = []
    for k in range(precision):
        idx = f"(((__v >> {5 * (precision - 1 - k)}) & 31) + 1)"
        chars.append(f"array_extract(string_split('{'|'.join(BASE32)}', '|'), {idx})")
    return {"ix": ix, "iy": iy, "v": v, "chars": "(" + " || ".join(chars) + ")"}
