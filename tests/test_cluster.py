"""Connected-components clustering (operators/cluster.py): known graphs,
a long chain (forces multiple star rounds), fuzz vs a Python union-find,
and the singleton-preserving assign_clusters convenience."""

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from transitlog_hfp_sink_spark.operators.cluster import (
    assign_clusters,
    connected_components,
)


def _py_components(edges):
    """Reference: union-find, component label = min member."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    for a, b in edges:
        union(a, b)
    roots = {}
    for n in list(parent):
        roots.setdefault(find(n), []).append(n)
    out = {}
    for members in roots.values():
        lbl = min(members)
        for n in members:
            out[n] = lbl
    return out


def _spark_components(spark, edges):
    df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    return {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }


def test_two_components(spark):
    got = _spark_components(spark, [(1, 2), (2, 3), (5, 6)])
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5}


def test_chain_collapses_to_min(spark):
    """A 12-node path has diameter 11 — exercises multiple rounds."""
    got = _spark_components(spark, [(i, i + 1) for i in range(11)])
    assert got == {i: 0 for i in range(12)}


def test_convergence_stats_observable(spark):
    """The stats out-param reports rounds and the per-round edge counts
    (a 100 TB dedup run watches these instead of a silent loop)."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "id_a long, id_b long"
    )
    stats: dict = {}
    out = connected_components(pairs, stats=stats)
    assert out.count() == 12
    assert stats["rounds"] >= 2  # diameter-11 path needs several rounds
    assert stats["initial_edges"] == 11
    assert stats["final_edges"] == 11  # star fixpoint: one edge per non-root
    assert len(stats["edge_counts"]) == stats["rounds"] + 1
    # empty graph: zero rounds, zeros throughout
    empty: dict = {}
    connected_components(
        spark.createDataFrame([], "id_a long, id_b long"), stats=empty
    ).count()
    assert empty == {
        "rounds": 0, "initial_edges": 0, "final_edges": 0, "edge_counts": [0],
    }


def test_duplicate_and_reversed_edges(spark):
    got = _spark_components(spark, [(2, 1), (1, 2), (2, 1), (3, 3), (3, 4)])
    # (3,3) self-loop is dropped but 3 survives via (3,4)
    assert got == {1: 1, 2: 1, 3: 3, 4: 3}


def test_empty_edges(spark):
    df = spark.createDataFrame([], "id_a bigint, id_b bigint")
    assert connected_components(df).count() == 0


def test_fuzz_vs_union_find(spark):
    rng = random.Random(42)
    for trial in range(3):
        n = 80
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randrange(20, 120))
        ]
        edges = [(a, b) for a, b in edges if a != b]
        assert _spark_components(spark, edges) == _py_components(edges), edges


def test_assign_clusters_keeps_singletons(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(6)], "doc_id bigint, text string"
    )
    pairs = spark.createDataFrame([(0, 1), (1, 2), (4, 5)], "id_a bigint, id_b bigint")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in assign_clusters(docs, pairs).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 4}
    # canonical pick: one keeper per cluster
    kept = (
        assign_clusters(docs, pairs)
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("cluster_id").orderBy("doc_id")),
        )
        .where(F.col("rn") == 1)
    )
    assert sorted(r["doc_id"] for r in kept.collect()) == [0, 3, 4]
