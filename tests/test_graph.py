"""Graph-operator tests (degrees, connected components, dedup
clustering, PageRank)."""

from __future__ import annotations

import pyspark.sql.functions as F

from graph_etl_spark import operators as ops


def test_degrees(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c")], ["src", "dst"]
    )
    d = {r["id"]: r.asDict() for r in ops.degrees(e).collect()}
    assert d["a"]["out_degree"] == 2 and d["a"]["in_degree"] == 0
    assert d["c"]["in_degree"] == 2 and d["c"]["degree"] == 2
    assert d["b"]["degree"] == 2


def test_connected_components_two_islands(spark):
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (12, 11)], ["src", "dst"]
    )
    cc = {r["id"]: r["component"] for r in ops.connected_components(e).collect()}
    assert cc[1] == cc[2] == cc[3] == 1
    assert cc[10] == cc[11] == cc[12] == 10


def test_connected_components_chain_convergence(spark):
    # a long chain needs multiple label-propagation rounds
    n = 12
    e = spark.createDataFrame([(i, i + 1) for i in range(n)], ["src", "dst"])
    cc = {r["id"]: r["component"] for r in ops.connected_components(e).collect()}
    assert set(cc.values()) == {0}
    assert len(cc) == n + 1


def test_dedup_clusters_with_singletons(spark):
    pairs = spark.createDataFrame([(1, 2), (2, 5)], ["id_a", "id_b"])
    all_ids = spark.createDataFrame([(i,) for i in [1, 2, 5, 7, 9]], ["doc_id"])
    out = {r["doc_id"]: r["cluster_id"] for r in ops.dedup_clusters(pairs, all_ids).collect()}
    assert out == {1: 1, 2: 1, 5: 1, 7: 7, 9: 9}


def test_pagerank_sums_to_one(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")], ["src", "dst"]
    )
    ranks = ops.pagerank(e, max_iter=10).collect()
    total = sum(r["pagerank"] for r in ranks)
    assert abs(total - 1.0) < 1e-3
    by_id = {r["id"]: r["pagerank"] for r in ranks}
    assert by_id["c"] > by_id["b"]  # c has two in-links


def test_triangle_count_known_graph(spark):
    """K4 minus one edge has exactly 2 triangles; vertex counts:
    the shared-edge endpoints sit in both, the others in one."""
    from graph_etl_spark.operators import triangle_count

    # vertices 1-4; edges of K4 except (3,4): triangles (1,2,3), (1,2,4)
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)], "src long, dst long"
    )
    out = {r["id"]: r["n_triangles"] for r in triangle_count(edges).collect()}
    assert out == {1: 2, 2: 2, 3: 1, 4: 1}


def test_triangle_count_undirected_and_self_loops(spark):
    """Direction, duplicates, and self-loops must not change counts."""
    from graph_etl_spark.operators import triangle_count

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (2, 3)], "src long, dst long"
    )
    out = {r["id"]: r["n_triangles"] for r in triangle_count(edges).collect()}
    assert out == {1: 1, 2: 1, 3: 1}
