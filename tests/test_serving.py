"""operators/serving.py — the shared persisted-index serving contract.

The three index kinds (BM25 postings, IVF, IVF-PQ) exercise these
helpers end-to-end in their own tests; this file pins the helpers'
contracts directly so a change here fails fast and close to the cause.
"""

import pytest
from pyspark.sql import functions as F

from transitlog_hfp_sink_spark.operators.serving import (
    fs_read_json,
    fs_write_json,
    list_partition_keys,
    pruned_partition_read,
)


def test_fs_json_roundtrip_plain_and_scheme_qualified(spark, tmp_path):
    """Meta IO via the Hadoop FS API must round-trip nested JSON on both
    a bare POSIX path and a scheme-qualified URI (the object-store
    seam VERDICT r9 #1 named: builtin open() treated 'file://…' as a
    literal name)."""
    meta = {
        "n_lists": 8,
        "vec_col": "embedding",
        "centroids": [[1.5, -2.25], [0.0, 3.125]],
        "codebooks": [[[0.5], [1.5]], [[-0.25], [2.0]]],
        "lists": [0, 1, 5],
    }
    for path in (str(tmp_path / "meta_a.json"), f"file://{tmp_path}/meta_b.json"):
        fs_write_json(spark, path, meta)
        assert fs_read_json(spark, path) == meta
    # overwrite semantics: a second write replaces, not appends
    fs_write_json(spark, str(tmp_path / "meta_a.json"), {"v": 2})
    assert fs_read_json(spark, str(tmp_path / "meta_a.json")) == {"v": 2}


@pytest.fixture()
def layout(spark, tmp_path):
    root = str(tmp_path / "data")
    (
        spark.range(100)
        .select(
            F.col("id"),
            F.pmod(F.col("id"), F.lit(4)).cast("int").alias("pk"),
        )
        .where(F.col("pk") != 2)  # key 2 intentionally absent
        .write.partitionBy("pk")
        .parquet(root)
    )
    return root


def test_list_partition_keys_one_listing(spark, layout):
    assert list_partition_keys(spark, layout, "pk") == [0, 1, 3]


def test_pruned_partition_read_contract(spark, layout):
    """Manifest intersect + direct paths; None on empty intersection;
    manifest=None falls back to one root listing — the uniform fallback
    all three index kinds now share."""
    manifest = [0, 1, 3]
    df = pruned_partition_read(spark, layout, "pk", [1, 2], manifest)
    assert sorted(r["pk"] for r in df.select("pk").distinct().collect()) == [1]
    assert df.count() == 25
    # probed keys entirely outside the manifest: no storage touched
    assert pruned_partition_read(spark, layout, "pk", [2, 7], manifest) is None
    assert pruned_partition_read(spark, layout, "pk", [], manifest) is None
    # pre-manifest fallback: one listing reconstructs the manifest
    df2 = pruned_partition_read(spark, layout, "pk", [0, 2, 3], None)
    assert sorted(
        r["pk"] for r in df2.select("pk").distinct().collect()
    ) == [0, 3]
    # the pruned plan names only matched pk=K directories (the Location
    # line is length-truncated by spark.sql.maxMetadataStringLength, so
    # assert the named set is nonempty and a subset — the same idiom as
    # the ivf/ivfpq probed-path tests)
    import re

    from transitlog_hfp_sink_spark.plans.inspect import explain_str

    named = {int(m) for m in re.findall(r"pk=(\d+)", explain_str(df2, "formatted"))}
    assert named and named <= {0, 3}, named
