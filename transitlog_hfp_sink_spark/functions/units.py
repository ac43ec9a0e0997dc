"""Integer-units aggregation of already-rounded DECIMAL score columns.

The log-score family (LM/NB negative log-likelihoods, BM25 partial
scores, trajectory step lengths) sums per-row doubles that are first
cast to decimal(20,s) — the cross-engine idiom that makes the sums
order-independent and bit-identical vs the DuckDB oracles. Round 11
measured the decimal accumulators themselves as ~13% of those
aggregation stages (decimal(20,10) sum 0.538 s vs bigint units 0.468 s
on a 1M-row scoring shape): a decimal(20,s) sum carries a 16-byte
unscaled value plus overflow bookkeeping through the partial/final
aggregate and the exchange between them, where an 8-byte bigint does
the same exact arithmetic.

Law (VERDICT r11 #8 — the VALUE-IDENTICAL compact-units variant, NOT
the floor law: floor(x*10^s + 0.5) is only tie-safe for data-bounded
decimals like 2-dp money, and a raw -log(p) double can sit on a
.5*10^-s boundary):

1. per row, AFTER the decimal(20,s) HALF_UP cast (unchanged — that cast
   IS the rounding law), extract exact integer units:
   ``(dec * 10^s).cast(bigint)``. The product is integral by
   construction, so any decimal rescaling on the multiply cannot change
   its value, and the bigint cast is exact (ANSI mode fails loud on
   overflow; per-row units stay far below 2^63 at every site — bounds
   documented per call site).
2. SUM the bigint units — exact integer arithmetic, overflow again
   ANSI-loud (the summing groups are per-document / per-vehicle /
   per-(query,doc); magnitudes are documented at each site).
3. convert ONCE per output group: bigint -> decimal(38-max(6,s+2), 0),
   divided by 10^s as decimal(s+1, 0). Spark's division typing gives
   scale max(6, s+2) >= s with total precision <= 38 — NO precision
   loss, so the quotient is the exact decimal sum — then the same
   single correctly-rounded double cast the decimal formulation
   performs. (The naive decimal(38,0)/10^s form overflows precision 38
   and Spark silently rounds the quotient to 6 decimals — measured as a
   real value divergence at scale 10.)

Ordering note: a window ordered by the decimal sum may order by the
bigint units instead — the units are the sums scaled by the constant
10^s, so the order is identical.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec_units(dec: Column, scale: int) -> Column:
    """Exact integer units (bigint) of an already-rounded decimal(p,s)
    value. The multiply by 10^s as decimal(s+1,0) keeps the product
    within precision 38 for p <= 36-s, so no rescaling happens at all;
    the cast is exact because the product is integral."""
    return (dec * F.lit(10 ** scale).cast(f"decimal({scale + 1},0)")).cast(
        "bigint"
    )


def units_double(units_sum: Column, scale: int) -> Column:
    """The exact decimal value of a bigint units sum, as the same
    correctly-rounded double the decimal formulation's final cast
    produces. See the module docstring for the precision proof."""
    int_digits = 38 - max(6, scale + 2)
    exact = units_sum.cast(f"decimal({int_digits},0)") / F.lit(
        10 ** scale
    ).cast(f"decimal({scale + 1},0)")
    return exact.cast("double")
