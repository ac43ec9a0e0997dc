"""JSONL training-export sink: determinism, shard layout, roundtrip."""

import glob
import os

from pyspark.sql import functions as F

from transitlog_hfp_sink_spark.operators.pack import shard_of
from transitlog_hfp_sink_spark.sinks.export import (
    read_jsonl_shards,
    write_jsonl_shards,
)
from transitlog_hfp_sink_spark.sources.files import read_table


def test_export_roundtrip_and_layout(spark, sf_dir, tmp_path):
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    out = str(tmp_path / "shards")
    write_jsonl_shards(docs, out, n_shards=8)
    # Hive layout: __shard=K dirs, exactly one part file per dir
    dirs = sorted(glob.glob(f"{out}/__shard=*"))
    assert dirs, "no shard directories written"
    for d in dirs:
        parts = [p for p in os.listdir(d) if p.startswith("part-")]
        assert len(parts) == 1, d
    back = read_jsonl_shards(spark, out)
    # roundtrip: same rows, and every row sits in its content-keyed shard
    assert back.count() == docs.count()
    want = {r["doc_id"]: r for r in docs.withColumn(
        "__shard", shard_of("doc_id", 8, "export")).collect()}
    for r in back.collect():
        assert r["__shard"] == want[r["doc_id"]]["__shard"]
        assert r["lang"] == want[r["doc_id"]]["lang"]


def test_export_is_byte_deterministic(spark, sf_dir, tmp_path):
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "source")
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    # different input partitioning must not change shard bytes
    write_jsonl_shards(docs, a, n_shards=4)
    write_jsonl_shards(docs.repartition(13), b, n_shards=4)

    def shard_bytes(root):
        out = {}
        for d in sorted(glob.glob(f"{root}/__shard=*")):
            (part,) = [p for p in os.listdir(d) if p.startswith("part-")]
            with open(os.path.join(d, part), "rb") as f:
                out[os.path.basename(d)] = f.read()
        return out

    assert shard_bytes(a) == shard_bytes(b)
