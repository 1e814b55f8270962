"""Unit tests for operators/graph.py (weighted PageRank)."""

from __future__ import annotations

import pytest

from isilon_hadoop_tools_spark.operators.graph import pagerank


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long, w double")


def test_pagerank_symmetric_two_cycle_is_uniform(spark):
    # A <-> B with equal weights: the uniform vector is stationary
    pr = {
        r.v: r.pagerank
        for r in pagerank(
            _edges(spark, [(1, 2, 5.0), (2, 1, 5.0)]), "src", "dst", "w"
        ).collect()
    }
    assert pr == {1: 0.5, 2: 0.5}


def test_pagerank_weight_skew_shifts_rank(spark):
    # 1 sends 90% of its weight to 2, 10% to 3; 2 and 3 return to 1.
    ranks = {
        r.v: r.pagerank
        for r in pagerank(
            _edges(
                spark,
                [(1, 2, 9.0), (1, 3, 1.0), (2, 1, 1.0), (3, 1, 1.0)],
            ),
            "src", "dst", "w",
        ).collect()
    }
    assert ranks[2] > ranks[3]  # heavier in-edge -> higher rank
    assert ranks[1] == max(ranks.values())  # both cycles return to 1
    # teleport keeps total mass at 1 on a closed graph
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-6)


def test_pagerank_drops_edges_into_dangling_nodes(spark):
    # node 9 has no out-edges: the 1->9 edge must be dropped, leaving
    # the 1<->2 cycle; 9 is not a vertex of the closed subgraph
    out = pagerank(
        _edges(spark, [(1, 2, 1.0), (2, 1, 1.0), (1, 9, 100.0)]),
        "src", "dst", "w",
    ).collect()
    assert sorted(r.v for r in out) == [1, 2]


def test_pagerank_iterations_converge(spark):
    # a directed 3-cycle converges to uniform regardless of weights
    e = _edges(spark, [(1, 2, 7.0), (2, 3, 3.0), (3, 1, 1.0)])
    r20 = {
        r.v: r.pagerank
        for r in pagerank(e, "src", "dst", "w", iterations=20).collect()
    }
    for v in (1, 2, 3):
        assert r20[v] == pytest.approx(1 / 3, abs=1e-4)


def test_triangle_counts_known_graph(spark):
    from isilon_hadoop_tools_spark.operators.graph import triangle_counts

    # K4 on {1,2,3,4}: 4 triangles, each vertex in C(3,2)=3 of them;
    # vertex 9 hangs off vertex 1 and joins none. Duplicate and
    # reversed edges must not double-count.
    edges = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
        (2, 1),  # reversed duplicate
        (1, 9),
    ]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    out = {r.v: r.n_triangles for r in triangle_counts(df).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}
