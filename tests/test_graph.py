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


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_pagerank_shuffle_mode_matches_broadcast(spark):
    # broadcast_threshold=0 forces the shuffle-join path; per-iteration
    # rounding makes the two modes bit-identical
    e = _edges(
        spark, [(1, 2, 9.0), (1, 3, 1.0), (2, 1, 1.0), (3, 1, 1.0), (3, 9, 2.0)]
    )
    bc = {r.v: r.pagerank for r in pagerank(e, "src", "dst", "w").collect()}
    sh = {
        r.v: r.pagerank
        for r in pagerank(
            e, "src", "dst", "w", broadcast_threshold=0
        ).collect()
    }
    assert bc == sh


def test_pagerank_step_broadcast_plan(spark):
    # dimension-sized graph: the rank join must be a broadcast join
    from pyspark.sql import functions as F

    from isilon_hadoop_tools_spark.operators.graph import _pagerank_step

    verts = spark.createDataFrame([(i,) for i in range(5)], "v long")
    norm = spark.createDataFrame(
        [(i, (i + 1) % 5, 1.0) for i in range(5)], "_s long, _d long, _p double"
    )
    ranks = verts.select("v", F.lit(0.2).alias("r"))
    step = _pagerank_step(
        norm, ranks, verts, verts.limit(0), 5, 0, 0.03, 0.85, 10, True
    )
    assert "BroadcastHashJoin" in _plan(step)


def test_pagerank_step_shuffle_plan_on_million_vertex_graph(spark):
    # corpus-sized vertex set (2M): the rank vector must NOT be
    # broadcast — the static plan is a shuffle equi-join (SortMergeJoin
    # / ShuffledHashJoin); AQE may still re-plan small cases at runtime
    from pyspark.sql import functions as F

    from isilon_hadoop_tools_spark.operators.graph import _pagerank_step

    n_v = 2_000_000
    verts = spark.range(n_v).select(F.col("id").alias("v"))
    norm = spark.range(n_v).select(
        F.col("id").alias("_s"),
        ((F.col("id") + 1) % n_v).alias("_d"),
        F.lit(1.0).alias("_p"),
    )
    ranks = verts.select("v", F.lit(1.0 / n_v).alias("r"))
    step = _pagerank_step(
        norm, ranks, verts, verts.limit(0), n_v, 0,
        0.15 / n_v, 0.85, 10, False,
    )
    plan = _plan(step)
    assert "BroadcastHashJoin" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_pagerank_shuffle_mode_million_vertex_executes(spark):
    # end-to-end shuffle mode on a 1M-vertex ring: one iteration runs
    # and conserves total mass without any vertex-sized broadcast
    from pyspark.sql import functions as F

    n_v = 1_000_000
    e = spark.range(n_v).select(
        F.col("id").alias("src"),
        ((F.col("id") + 1) % n_v).alias("dst"),
        F.lit(1.0).alias("w"),
    )
    out = pagerank(
        e, "src", "dst", "w", iterations=1, broadcast_threshold=100
    )
    total = out.agg(F.sum("pagerank")).collect()[0][0]
    assert total == pytest.approx(1.0, abs=1e-3)


def test_oriented_wedges_star_graph_is_empty(spark):
    # hub-killer audit: a star (hub 0, 200 leaves) has C(200,2)=19900
    # wedges under id-orientation but ZERO under degree-orientation —
    # every edge points leaf->hub, so no vertex has out-degree >= 2
    from isilon_hadoop_tools_spark.operators.graph import (
        oriented_wedges,
        triangle_counts,
    )

    edges = [(0, i) for i in range(1, 201)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    assert oriented_wedges(df).count() == 0
    assert triangle_counts(df).count() == 0


def test_oriented_wedges_bounded_on_hub_with_triangles(spark):
    # hub 0 touches 100 leaves plus a triangle {0,1,2}; candidate
    # wedges stay O(m), not O(d_hub^2)
    from isilon_hadoop_tools_spark.operators.graph import (
        oriented_wedges,
        triangle_counts,
    )

    edges = [(0, i) for i in range(1, 101)] + [(1, 2)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    # exactly one wedge (1<-?->2 through the orientation) closes the
    # single triangle; nothing quadratic in the hub degree
    assert oriented_wedges(df).count() <= 101
    out = {r.v: r.n_triangles for r in triangle_counts(df).collect()}
    assert out == {0: 1, 1: 1, 2: 1}


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


def test_kcore_triangle_with_pendant(spark):
    from isilon_hadoop_tools_spark.operators.graph import kcore

    # triangle {1,2,3} + pendant 3-9: the 2-core is the triangle
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 9)], "id_a long, id_b long"
    )
    out = {r.v: r.core_degree for r in kcore(df, k=2).collect()}
    assert out == {1: 2, 2: 2, 3: 2}


def test_kcore_chain_peels_to_empty(spark):
    from isilon_hadoop_tools_spark.operators.graph import kcore

    # a 10-chain has no 2-core; peeling strips one leaf layer per
    # round (5 rounds needed — exercises multiple iterations)
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "id_a long, id_b long"
    )
    assert kcore(df, k=2, rounds=10).count() == 0


def test_kcore_auto_peels_deeper_than_fixed_budget(spark):
    from isilon_hadoop_tools_spark.operators.graph import kcore

    # a 21-vertex chain peels one leaf layer per round: its true
    # 2-core is EMPTY, but the default 6-round budget provably stops
    # early (20 - 2*6 = 8 edges survive). rounds="auto" must peel to
    # the fixed point.
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(20)], "id_a long, id_b long"
    )
    assert kcore(df, k=2, rounds=6).count() > 0  # budgeted supergraph
    assert kcore(df, k=2, rounds="auto").count() == 0  # true 2-core


def test_kcore_auto_raises_when_cap_exhausted(spark):
    import pytest

    from isilon_hadoop_tools_spark.operators.graph import kcore

    df = spark.createDataFrame(
        [(i, i + 1) for i in range(20)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="fixed point"):
        kcore(df, k=2, rounds="auto", max_rounds=3)


def test_kcore_rejects_bad_rounds(spark):
    import pytest

    from isilon_hadoop_tools_spark.operators.graph import kcore

    df = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    with pytest.raises(ValueError, match="rounds"):
        kcore(df, k=2, rounds="fast")


def test_kcore_k3_keeps_k4_drops_triangle(spark):
    from isilon_hadoop_tools_spark.operators.graph import kcore

    # K4 on {1..4} plus a triangle {10,11,12} bridged in: 3-core = K4
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
             (10, 11), (10, 12), (11, 12), (4, 10)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    out = {r.v: r.core_degree for r in kcore(df, k=3).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}


def test_kcore_auto_fixed_point_exactly_at_cap(spark):
    from isilon_hadoop_tools_spark.operators.graph import kcore

    # 3-vertex pendant chain feeding a triangle: peeling removes one
    # chain vertex per round and reaches the NON-empty fixed point
    # (the triangle) exactly on round 3 — max_rounds=3 must accept it
    # (the confirming no-change round runs beyond the cap)
    edges = [(10, 11), (11, 12), (12, 1), (1, 2), (2, 3), (3, 1)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    out = {
        r.v: r.core_degree
        for r in kcore(df, k=2, rounds="auto", max_rounds=3).collect()
    }
    assert out == {1: 2, 2: 2, 3: 2}


def test_kcore_rejects_bool_rounds(spark):
    import pytest

    from isilon_hadoop_tools_spark.operators.graph import kcore

    df = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    with pytest.raises(ValueError, match="rounds"):
        kcore(df, k=2, rounds=True)


def test_lpa_two_cliques_with_bridge(spark):
    """Two 3-cliques joined by one bridge edge: LPA assigns each
    clique its min-id label; the bridge does not merge them (each
    endpoint has 2 same-clique votes + self vs 1 cross vote)."""
    from isilon_hadoop_tools_spark.operators.graph import label_propagation

    edges = [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["v"]: r["community"]
        for r in label_propagation(df, rounds=4).collect()
    }
    # round 1 pulls v4 to the bridge label 3; round 2 its clique
    # majority (5, 6 voting 4) wins it back — the cliques stay apart
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 4}


def test_lpa_self_vote_prevents_pair_oscillation(spark):
    """A single edge (a, b): pure synchronous LPA swaps labels every
    round (period-2 oscillation); the self-vote makes the tie resolve
    to min(label) on BOTH endpoints immediately and stay fixed."""
    from isilon_hadoop_tools_spark.operators.graph import label_propagation

    df = spark.createDataFrame([(7, 9)], "id_a long, id_b long")
    for rounds in (1, 2, 3):
        got = {
            r["v"]: r["community"]
            for r in label_propagation(df, rounds=rounds).collect()
        }
        assert got == {7: 7, 9: 7}


def test_lpa_star_converges_to_hub_min(spark):
    """Star graph: leaves adopt the hub's label round 1 (neighbor
    vote 1 + self 1, tie -> min) when hub id is the minimum; the hub
    keeps its own (self + any leaf tie -> min = hub)."""
    from isilon_hadoop_tools_spark.operators.graph import label_propagation

    df = spark.createDataFrame(
        [(1, x) for x in range(2, 8)], "id_a long, id_b long"
    )
    got = {
        r["v"]: r["community"]
        for r in label_propagation(df, rounds=2).collect()
    }
    assert got == {v: 1 for v in range(1, 8)}


def test_neighbor_jaccard_matches_bruteforce_and_hub_cap(spark):
    """Exact neighborhood Jaccard on a hand graph vs brute force;
    with max_degree the hub's wedges vanish but every emitted pair
    keeps its EXACT full-graph Jaccard."""
    from isilon_hadoop_tools_spark.operators.graph import (
        neighbor_jaccard_pairs,
    )

    # hub 0 touches 1..4; chain 1-2, 3-4; plus 5-6 isolated pair
    edges = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (3, 4), (5, 6)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {}
    nodes = sorted(adj)
    for i, u in enumerate(nodes):
        for v in nodes[i + 1:]:
            common = len(adj[u] & adj[v])
            if common:
                want[(u, v)] = (
                    common,
                    round(common / len(adj[u] | adj[v]), 6),
                )
    got = {
        (r["id_a"], r["id_b"]): (r["n_common"], r["jaccard"])
        for r in neighbor_jaccard_pairs(df).collect()
    }
    assert got == want
    assert (5, 6) not in got  # no common neighbor, correctly absent
    # cap at 3: wedges through hub 0 (degree 4) are excluded; the
    # surviving pairs came through low-degree neighbors and keep
    # exact full-graph values
    capped = {
        (r["id_a"], r["id_b"]): (r["n_common"], r["jaccard"])
        for r in neighbor_jaccard_pairs(df, max_degree=3).collect()
    }
    assert set(capped) < set(got)
    assert all(capped[k] == want[k] for k in capped)
    # (1,2) share hub 0 AND each other... common neighbors of 1 and
    # 2 = {0}; hub-only witness, so the capped run loses it
    assert (1, 2) in got and (1, 2) not in capped
