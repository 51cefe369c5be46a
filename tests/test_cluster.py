"""Connected components / near-dup clustering vs a pure-Python
union-find oracle, plus convergence and invariance properties."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from compress_otel_collector_spark.operators.cluster import (
    cluster_summary,
    connected_components,
    drop_near_duplicates,
)


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min member id
    comp = {}
    for x in parent:
        comp[x] = find(x)
    return comp


def _spark_components(spark, edges):
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "a_id long, b_id long")
    got = connected_components(df)
    return {r["node"]: r["comp"] for r in got.collect()}


@pytest.mark.parametrize("seed,n_nodes,n_edges", [
    (1, 60, 40), (2, 200, 150), (3, 200, 400), (4, 50, 5),
])
def test_components_match_union_find(spark, seed, n_nodes, n_edges):
    rng = np.random.default_rng(seed)
    edges = {(int(a), int(b)) for a, b in
             zip(rng.integers(0, n_nodes, n_edges),
                 rng.integers(0, n_nodes, n_edges)) if a != b}
    assert _spark_components(spark, edges) == _union_find(edges)


def test_components_chain_converges(spark):
    """A path graph exercises multi-round convergence (diameter = n-1;
    pointer jumping must close it well inside max_iter)."""
    edges = [(i, i + 1) for i in range(40)]
    comp = _spark_components(spark, edges)
    assert comp == {i: 0 for i in range(41)}


def test_components_empty_edges(spark):
    df = spark.createDataFrame([], "a_id long, b_id long")
    assert connected_components(df).count() == 0


def test_components_partitioning_invariant(spark):
    rng = np.random.default_rng(9)
    edges = [(int(a), int(b)) for a, b in
             zip(rng.integers(0, 100, 120), rng.integers(0, 100, 120))
             if a != b]
    df = spark.createDataFrame(edges, "a_id long, b_id long")
    one = {(r["node"], r["comp"])
           for r in connected_components(df.coalesce(1)).collect()}
    many = {(r["node"], r["comp"])
            for r in connected_components(df.repartition(13)).collect()}
    assert one == many


def test_drop_near_duplicates_keeps_reps_and_singletons(spark):
    docs = spark.range(0, 20).select(F.col("id").alias("doc_id"))
    # clusters {0,1,2} (transitive via 0-1, 1-2) and {10, 11}
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], "a_id long, b_id long")
    kept = sorted(r["doc_id"]
                  for r in drop_near_duplicates(docs, pairs).collect())
    expect = sorted(set(range(20)) - {1, 2, 11})
    assert kept == expect


def test_cluster_summary_shape(spark):
    pairs = spark.createDataFrame(
        [(3, 1), (1, 2), (10, 11)], "a_id long, b_id long")
    rows = {r["rep_id"]: (r["cluster_size"], r["members"])
            for r in cluster_summary(pairs).collect()}
    assert rows == {1: (3, "1,2,3"), 10: (2, "10,11")}


def test_cluster_summary_numeric_member_order(spark):
    """members must sort numerically (2 < 10), not lexicographically —
    the DuckDB twin orders by the numeric node."""
    pairs = spark.createDataFrame(
        [(2, 10), (2, 9)], "a_id long, b_id long")
    rows = cluster_summary(pairs).collect()
    assert rows[0]["members"] == "2,9,10"


def test_clusters_compose_with_embedding_pairs(spark, sf_dir):
    """connected_components composes with the OTHER pair producer
    (embedding LSH) unchanged — same (a_id, b_id) contract — and every
    pair's endpoints land in one component."""
    from compress_otel_collector_spark.operators.similarity import (
        embedding_dup_pairs_lsh,
    )
    from compress_otel_collector_spark.sources.tables import load_table

    pairs = embedding_dup_pairs_lsh(
        load_table(spark, sf_dir, "embeddings"), threshold=0.9)
    comp = {r["node"]: r["comp"]
            for r in connected_components(pairs).collect()}
    for r in pairs.collect():
        assert comp[r["a_id"]] == comp[r["b_id"]]
