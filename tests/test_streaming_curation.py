"""Streaming parity of the curation surface: the text-analysis /
quality-gate / BPE operators are map-only projections, so the SAME
column expressions must run unchanged inside a Structured Streaming
micro-batch pipeline and produce exactly the batch pipeline's rows.

This is the streaming shape of a 100 TB ingest-time curation: new
document files land in a directory, each micro-batch scores + gates +
tokenizes them, and the union over batches equals the one-shot batch
run (no cross-row state is involved, so exactly-once-per-file of the
file source gives set equality)."""

from __future__ import annotations

from pyspark.sql import functions as F

DOCS = [
    (i, t, "en")
    for i, t in enumerate(
        [
            "the quick brown fox jumps over the lazy dog " * 8,
            "short",
            "function f() { return 1; }  " + "filler words here " * 20,
            "- bullet one\n- bullet two\n- bullet three",
            "a solid paragraph of reasonable prose that continues for a while "
            * 6,
            "",
            "the the the the the the the the the the " * 10,
        ]
    )
]


def _curate(df):
    """The shared curation projection: signals + gates + BPE count."""
    from transitlog_hfp_sink_spark.operators.bpe import bpe_tokens_expr
    from transitlog_hfp_sink_spark.operators.textanalysis import analyze_documents
    from transitlog_hfp_sink_spark.queries.ml import BPE_MERGES_V1

    scored = analyze_documents(df, "text", "doc_id", extra_cols=("lang",))
    toks = F.size(bpe_tokens_expr(F.col("text"), BPE_MERGES_V1))
    return (
        scored.join(df.select("doc_id", "text"), "doc_id")
        .withColumn("n_bpe", toks)
        .where(F.col("c4_keep") & (F.col("dup_trigram_frac") <= 0.5))
        .select("doc_id", "quality", "lang_pred", "n_bpe")
    )


def test_streaming_curation_matches_batch(spark, tmp_path):
    src = str(tmp_path / "incoming")
    out = str(tmp_path / "curated")
    ckpt = str(tmp_path / "ckpt")

    df = spark.createDataFrame(DOCS, "doc_id bigint, text string, lang string")
    # two file drops -> at least two micro-batches worth of input
    df.where(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(src + "/drop1")
    df.where(F.col("doc_id") % 2 == 1).coalesce(1).write.parquet(src + "/drop2")

    stream = (
        spark.readStream.schema("doc_id bigint, text string, lang string")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )

    q = (
        _curate(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        r["doc_id"]: (r["quality"], r["lang_pred"], r["n_bpe"])
        for r in spark.read.parquet(out).collect()
    }
    want = {
        r["doc_id"]: (r["quality"], r["lang_pred"], r["n_bpe"])
        for r in _curate(df).collect()
    }
    assert got == want
    assert want, "gates must keep at least one document"
    # the gates actually fired: brace doc and empty doc are out
    kept = set(got)
    assert 2 not in kept  # '{' -> c4_keep false
    assert 5 not in kept  # empty -> under min words
    assert 6 not in kept  # looping text -> dup_trigram gate
