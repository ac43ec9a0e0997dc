"""Token-sequence packing: layout invariants and chunk math."""

import pytest
from pyspark.sql import functions as F

from transitlog_hfp_sink_spark.operators.pack import (
    pack_chunks,
    shard_manifest,
    shard_of,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, " ".join(["tok"] * (1 + i % 7))) for i in range(200)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_within_shard_layout_is_contiguous(docs):
    packed = pack_chunks(docs, budget=10, n_shards=4).collect()
    by_shard = {}
    for r in packed:
        by_shard.setdefault(r["shard"], []).append(r)
    assert set(by_shard) == {0, 1, 2, 3}
    for rows in by_shard.values():
        rows.sort(key=lambda r: r["start_pos"])
        pos = 0
        for r in rows:
            assert r["start_pos"] == pos  # head-to-tail, no gaps/overlaps
            pos += r["n_tokens"]


def test_chunk_interval_math(docs):
    budget = 10
    for r in pack_chunks(docs, budget=budget, n_shards=4).collect():
        assert r["first_seq"] == r["start_pos"] // budget
        end = r["start_pos"] + r["n_tokens"] - 1
        assert r["last_seq"] == max(end, r["start_pos"]) // budget
        assert r["offset_in_seq"] == r["start_pos"] % budget
        # straddles a cut exactly when the interval crosses a multiple
        straddles = r["last_seq"] > r["first_seq"]
        crosses = (r["start_pos"] // budget) != (end // budget)
        assert straddles == crosses


def test_deterministic_across_runs_and_partitionings(docs):
    a = {r["doc_id"]: tuple(r) for r in pack_chunks(docs, 10, n_shards=4).collect()}
    b = {
        r["doc_id"]: tuple(r)
        for r in pack_chunks(docs.repartition(13), 10, n_shards=4).collect()
    }
    assert a == b


def test_salt_changes_permutation_not_totals(docs):
    a = pack_chunks(docs, 10, n_shards=4, salt="pack")
    b = pack_chunks(docs, 10, n_shards=4, salt="other")
    tot_a = a.agg(F.sum("n_tokens")).first()[0]
    tot_b = b.agg(F.sum("n_tokens")).first()[0]
    assert tot_a == tot_b
    order_a = [r["doc_id"] for r in sorted(a.collect(), key=lambda r: (r["shard"], r["start_pos"]))]
    order_b = [r["doc_id"] for r in sorted(b.collect(), key=lambda r: (r["shard"], r["start_pos"]))]
    assert order_a != order_b  # reshuffled


def test_manifest_counts_and_ceil(docs):
    packed = pack_chunks(docs, budget=10, n_shards=4)
    man = {r["shard"]: r for r in shard_manifest(packed, budget=10).collect()}
    per_shard = {
        r["shard"]: r
        for r in packed.groupBy("shard")
        .agg(F.count("*").alias("n"), F.sum("n_tokens").alias("t"))
        .collect()
    }
    for shard, r in man.items():
        assert r["n_docs"] == per_shard[shard]["n"]
        assert r["n_tokens"] == per_shard[shard]["t"]
        assert r["n_sequences"] == -(-per_shard[shard]["t"] // 10)  # ceil


def test_shard_of_is_stable_and_in_range(spark):
    df = spark.range(1000).select(shard_of(F.col("id"), 16, "s").alias("sh"))
    stats = df.agg(F.min("sh"), F.max("sh"), F.count_distinct("sh")).first()
    assert stats[0] >= 0 and stats[1] <= 15 and stats[2] == 16


def test_window_partitioned_by_shard_not_global(docs):
    # the plan must sort/window within shards (parallel), never a single
    # global ordering
    df = pack_chunks(docs, 10, n_shards=4)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "partitionBy=[shard" in plan.replace(" ", "").replace("#", "#") or (
        "hashpartitioning(shard" in plan
    )


def test_fuzz_layout_invariants_over_budgets_and_shards(spark):
    """Property: for random budgets/shard counts, the packed layout is
    always contiguous per shard and the chunk math self-consistent."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    rows = [(i, " ".join(["w"] * (1 + (i * 7) % 23))) for i in range(120)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    configs = []

    @settings(max_examples=12, deadline=None)
    @given(st.integers(min_value=1, max_value=200), st.integers(min_value=1, max_value=9))
    def collect(budget, n_shards):
        configs.append((budget, n_shards))

    collect()
    for budget, n_shards in set(configs):
        packed = pack_chunks(docs, budget=budget, n_shards=n_shards).collect()
        assert len(packed) == 120
        by_shard = {}
        for r in packed:
            assert 0 <= r["shard"] < n_shards
            assert r["first_seq"] == r["start_pos"] // budget
            end = max(r["start_pos"] + r["n_tokens"] - 1, r["start_pos"])
            assert r["last_seq"] == end // budget
            assert r["offset_in_seq"] == r["start_pos"] % budget
            by_shard.setdefault(r["shard"], []).append(r)
        for rows_ in by_shard.values():
            rows_.sort(key=lambda r: r["start_pos"])
            pos = 0
            for r in rows_:
                assert r["start_pos"] == pos, (budget, n_shards)
                pos += r["n_tokens"]


def test_pack_with_custom_token_count(spark):
    """token_count override: packing by real subword widths (BPE) keeps
    the layout laws (contiguity within shard, width = n_tokens) while
    the widths differ from the whitespace count."""
    from pyspark.sql import functions as F

    from transitlog_hfp_sink_spark.operators.bpe import bpe_tokens_expr, bpe_train
    from transitlog_hfp_sink_spark.operators.pack import pack_chunks

    texts = [(i, f"the quick brown fox number {i} jumps the fence") for i in range(40)]
    df = spark.createDataFrame(texts, "doc_id bigint, text string")
    merges = bpe_train([t for _, t in texts], num_merges=16)
    toks = bpe_tokens_expr(F.col("text"), merges)

    packed = pack_chunks(df, budget=32, n_shards=4, token_count=F.size(toks)).collect()
    ws = {r["doc_id"]: r for r in pack_chunks(df, budget=32, n_shards=4).collect()}
    got = {r["doc_id"]: r for r in packed}
    assert set(got) == set(ws)
    # subword widths differ from whitespace widths on this corpus
    assert any(got[i]["n_tokens"] != ws[i]["n_tokens"] for i in got)
    # layout law: docs within a shard tile the stream head-to-tail
    by_shard: dict[int, list] = {}
    for r in packed:
        by_shard.setdefault(r["shard"], []).append(r)
    for rows in by_shard.values():
        rows.sort(key=lambda r: r["start_pos"])
        pos = 0
        for r in rows:
            assert r["start_pos"] == pos
            assert r["offset_in_seq"] == pos % 32
            pos += r["n_tokens"]
