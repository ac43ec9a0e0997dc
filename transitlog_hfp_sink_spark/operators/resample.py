"""Per-key time-series resampling — grouped-map applyInPandas.

The trajectory workload the vehicles table exists for (SURVEY §2.5 Q2):
regularize each vehicle's irregular GPS samples onto a fixed grid with
linear interpolation. Genuinely awkward as pure SQL (per-key irregular ->
regular grid interpolation), so this is the canonical applyInPandas
use-case: one Arrow batch per key group, pandas doing the resample,
the engine distributing by key hash.

Scale: groups are single vehicles (bounded size); the shuffle is one
hash partition by key — the same cost envelope as any per-vehicle window.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

RESAMPLED_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("grid_ts", T.TimestampType(), False),
        T.StructField("lat", T.DoubleType(), True),
        T.StructField("long", T.DoubleType(), True),
        T.StructField("n_source_points", T.IntegerType(), False),
    ]
)


def resample_trajectories(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    lat_col: str = "lat",
    lon_col: str = "long",
    freq: str = "60s",
) -> DataFrame:
    """Resample each key's (ts, lat, long) track onto a fixed grid with
    time-weighted linear interpolation; grid spans each key's own
    [min(ts), max(ts)] rounded inward to the grid."""

    def resample(pdf: pd.DataFrame) -> pd.DataFrame:
        key = pdf[key_col].iloc[0]
        s = (
            pdf[[ts_col, lat_col, lon_col]]
            .dropna()
            .sort_values(ts_col)
            .drop_duplicates(subset=[ts_col])
            .set_index(ts_col)
        )
        if len(s) < 2:
            return pd.DataFrame(columns=[f.name for f in RESAMPLED_SCHEMA.fields])
        grid = pd.date_range(s.index.min().ceil(freq), s.index.max().floor(freq), freq=freq)
        if len(grid) == 0:
            return pd.DataFrame(columns=[f.name for f in RESAMPLED_SCHEMA.fields])
        combined = s.reindex(s.index.union(grid)).interpolate(method="time")
        out = combined.loc[grid]
        return pd.DataFrame(
            {
                "key": key,
                "grid_ts": grid,
                "lat": out[lat_col].to_numpy(),
                "long": out[lon_col].to_numpy(),
                "n_source_points": len(s),
            }
        )

    return (
        df.select(key_col, ts_col, lat_col, lon_col)
        .groupBy(key_col)
        .applyInPandas(resample, schema=RESAMPLED_SCHEMA)
    )
