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


def test_export_packed_bpe_sequences(spark, tmp_path):
    """End-to-end training export: tokenize (BPE) -> pack by subword
    widths -> sharded JSONL. The shard layout is content-keyed and the
    packed metadata rides along losslessly."""
    from pyspark.sql import functions as F

    from transitlog_hfp_sink_spark.operators.bpe import bpe_tokens_expr, bpe_train
    from transitlog_hfp_sink_spark.operators.pack import pack_chunks
    from transitlog_hfp_sink_spark.sinks.export import write_jsonl_shards

    texts = [(i, f"the quick brown fox {i} jumps over the lazy dog") for i in range(30)]
    df = spark.createDataFrame(texts, "doc_id bigint, text string")
    merges = bpe_train([t for _, t in texts], num_merges=16)
    toks = bpe_tokens_expr(F.col("text"), merges)
    packed = pack_chunks(df, budget=64, n_shards=4, token_count=F.size(toks)).join(
        df, "doc_id"
    )
    out = str(tmp_path / "export")
    write_jsonl_shards(packed, out, n_shards=4)
    back = spark.read.json(out + "/__shard=*")
    assert back.count() == 30
    got = {r["doc_id"]: r["n_tokens"] for r in back.collect()}
    want = {r["doc_id"]: r["n_tokens"] for r in packed.collect()}
    assert got == want
