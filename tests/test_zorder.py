"""Z-order clustering: files must be tight in BOTH dimensions (vs a
single-column sort, which is tight in one and spans the other)."""

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from transitlog_hfp_sink_spark.plans.zorder import write_zordered, zorder_key


def _file_spans(path, col):
    """Sum over parquet files of (max-min) of col — total stat width;
    smaller = better pruning for predicates on col."""
    total = 0.0
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.read_metadata(f)
        lo = min(
            md.row_group(i).column(
                [md.schema.column(j).name for j in range(md.num_columns)].index(col)
            ).statistics.min
            for i in range(md.num_row_groups)
        )
        hi = max(
            md.row_group(i).column(
                [md.schema.column(j).name for j in range(md.num_columns)].index(col)
            ).statistics.max
            for i in range(md.num_row_groups)
        )
        total += float(hi - lo)
    return total


def test_zorder_key_interleaves(spark):
    # 0b101 and 0b011 -> morton = a bits at even positions, b at odd
    row = spark.range(1).select(
        zorder_key(F.lit(0b101), F.lit(0b011), bits=3).alias("z")
    ).first()
    #  a=101, b=011 -> z bit layout (b2 a2 b1 a1 b0 a0) = 0 1 1 0 1 1 = 0b011011
    assert row["z"] == 0b011011


def test_zorder_tightens_both_dimensions(spark, tmp_path):
    # two independent uniform dims — the adversarial case for 1-D sorting
    df = spark.range(0, 40_000).select(
        (F.xxhash64("id") % 1000).alias("x"),
        (F.xxhash64(F.col("id") + 1) % 1000).alias("y"),
        F.col("id").alias("payload"),
    ).where((F.col("x") >= 0) & (F.col("y") >= 0))

    plain = str(tmp_path / "plain")
    df.repartitionByRange(8, "x").sortWithinPartitions("x").write.parquet(plain)
    zpath = str(tmp_path / "z")
    write_zordered(df, zpath, "x", "y", n_files=8)

    # x-sorted layout: x tight, y spans ~full range per file
    plain_y = _file_spans(plain, "y")
    z_y = _file_spans(zpath, "y")
    z_x = _file_spans(zpath, "x")
    full = 8 * 1000.0
    assert z_y < plain_y * 0.7, (z_y, plain_y)  # y got materially tighter
    assert z_x < full * 0.8  # x still far from unsorted-worst-case
    # correctness: same rows back
    assert spark.read.parquet(zpath).count() == df.count()
