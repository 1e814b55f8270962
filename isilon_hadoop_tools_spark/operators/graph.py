"""Iterative graph algorithms over edge DataFrames (SURVEY §2.12).

The reference has no graph surface; this is the brief's "iterative
algorithms" extension beyond k-means (`operators/similarity.py`):
weighted PageRank as repeated sparse matrix-vector products expressed
as join + aggregate — the canonical Pregel-style iteration mapped
onto DataFrames.

Scale shape: the EDGE table is the fact (billions of rows at 100 TB);
the rank vector is vertex-sized and broadcast every iteration, so
each iteration is one broadcast join + one aggregation over edges —
no shuffle of the edge table after the initial normalization, and no
driver-side state beyond the vertex count (a single scalar).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str,
    dst: str,
    weight: str,
    iterations: int = 5,
    damping: float = 0.85,
    round_digits: int = 10,
    broadcast_threshold: int = 5_000_000,
) -> DataFrame:
    """Weighted PageRank over ``(src, dst, weight)`` edges.

    Vertex set = nodes with at least one outgoing edge; edges into
    nodes outside that set are dropped. A vertex can still end up
    dangling after that closure (every out-edge pointed outside), so
    each iteration redistributes the dangling mass uniformly — the
    standard formulation that conserves total rank mass at exactly 1
    on any input graph (property-tested). Each iteration computes

        r[v] = (1 - d)/N + d * (sum_{(u,v)} r[u] * w(u,v)/out_w(u)
                                + dangling_mass/N)

    with the rank vector ROUNDED to ``round_digits`` places per
    iteration: rounding is the cross-engine determinism contract
    (float summation order differs between engines; the per-iteration
    round stops last-ULP drift from compounding), same scheme as the
    integer-quantized k-means (`similarity.py` `kmeans_iterate`).

    Per iteration: ONE join (vertex-sized rank vector onto the edge
    fact) + ONE aggregation with map-side partials. The lineage is
    truncated with ``localCheckpoint`` so the plan does not grow
    exponentially with iterations.

    Join-strategy switch (the 100 TB story): when the vertex count is
    at most ``broadcast_threshold`` the rank vector is broadcast —
    zero edge-table movement per iteration, the right plan for
    dimension-sized graphs. Above the threshold (web/record-linkage
    graphs whose vertex set is corpus-sized: a multi-GB broadcast per
    iteration would OOM every executor) the normalized edge table is
    hash-partitioned on ``_s`` ONCE before checkpointing and each
    iteration runs a plain shuffle equi-join: only the vertex-sized
    rank table moves, the edge fact stays put. Both modes are
    plan-asserted (`tests/test_plan_quality.py`).
    """
    # Materialize the aggregated edge table ONCE (it is the
    # iteration-invariant and every downstream consumer — vertex set,
    # out-weights, normalization, 5 iterations — would otherwise
    # re-trigger the upstream build): bounded by vertex², stored on
    # executor-local disk, never the driver.
    e = edges.select(
        F.col(src).alias("_s"), F.col(dst).alias("_d"),
        F.col(weight).cast("double").alias("_w"),
    ).localCheckpoint()
    verts = e.select(F.col("_s").alias("v")).distinct()
    n = verts.count()  # vertex count: the single driver-side scalar
    use_broadcast = n <= broadcast_threshold
    # closed subgraph: drop edges whose dst has no out-edges
    e = e.join(verts.withColumnRenamed("v", "_d"), "_d", "left_semi")
    out_w = e.groupBy("_s").agg(F.sum("_w").alias("_ow"))
    norm = e.join(
        F.broadcast(out_w) if use_broadcast else out_w, "_s"
    ).select("_s", "_d", (F.col("_w") / F.col("_ow")).alias("_p"))
    if not use_broadcast:
        # pre-partition the edge fact on the join key so every
        # iteration's shuffle join moves ONLY the rank vector
        # (localCheckpoint preserves the physical partitioning)
        norm = norm.repartition("_s")
    norm = norm.localCheckpoint(eager=False)
    out_srcs = norm.select(F.col("_s").alias("v")).distinct()
    # a vertex is dangling when every out-edge fell to the closure;
    # if none exist (the common dense case) the per-iteration dangling
    # aggregate is a constant 0 — skip its 1-row job entirely
    n_dangling = verts.join(out_srcs, "v", "left_anti").count()
    ranks = verts.select("v", F.lit(1.0 / n).alias("r"))
    teleport = (1.0 - damping) / n
    for _ in range(iterations):
        ranks = _pagerank_step(
            norm, ranks, verts, out_srcs, n, n_dangling,
            teleport, damping, round_digits, use_broadcast,
        ).localCheckpoint(eager=False)
    return ranks.select(F.col("v"), F.col("r").alias("pagerank"))


def _pagerank_step(
    norm: DataFrame,
    ranks: DataFrame,
    verts: DataFrame,
    out_srcs: DataFrame,
    n: int,
    n_dangling: int,
    teleport: float,
    damping: float,
    round_digits: int,
    use_broadcast: bool,
) -> DataFrame:
    """One PageRank iteration as an (un-checkpointed) DataFrame — the
    per-iteration join plan, factored out so the broadcast/shuffle
    strategy switch is directly plan-assertable (the checkpoint in the
    driver loop hides it from the final plan)."""
    rank_side = F.broadcast(ranks) if use_broadcast else ranks
    acc = (
        norm.join(rank_side, norm["_s"] == ranks["v"])
        .select("_d", (F.col("r") * F.col("_p")).alias("_c"))
        .groupBy("_d")
        .agg(F.sum("_c").alias("_acc"))
    )
    if n_dangling:
        # mass sitting on dangling vertices: redistributed
        # uniformly — a 1-row aggregate, broadcast
        dangling = ranks.join(out_srcs, "v", "left_anti").agg(
            F.coalesce(F.sum("r"), F.lit(0.0)).alias("_dm")
        )
        dm_term = F.col("_dm") / n
    else:
        dangling = None
        dm_term = F.lit(0.0)
    merged = verts.join(acc, verts["v"] == acc["_d"], "left")
    if dangling is not None:
        merged = merged.crossJoin(F.broadcast(dangling))
    return merged.select(
        "v",
        F.round(
            F.lit(teleport)
            + F.lit(damping)
            * (F.coalesce(F.col("_acc"), F.lit(0.0)) + dm_term),
            round_digits,
        ).alias("r"),
    )


def oriented_wedges(
    pairs: DataFrame, a_col: str = "id_a", b_col: str = "id_b"
) -> DataFrame:
    """Degree-oriented wedge candidates for triangle counting — the
    node-iterator++ orientation (Schank/Wagner; Suri/Vassilvitskii's
    MapReduce formulation).

    Each undirected edge is oriented toward its higher endpoint in the
    total order ``(degree, id)``. A vertex's out-degree in the
    oriented graph is at most O(sqrt(m)), so the wedge self-join does
    O(m^1.5) total work regardless of hubs — with naive id-ordering a
    single hub of degree d contributes O(d²) wedges (on a star graph
    this returns ZERO wedges where id-ordering returns C(d, 2); see
    `tests/test_graph.py` hub-graph audit).

    Output: ``x``, ``y``, ``z`` — wedges y←x→z with
    rank(x) < rank(y) < rank(z); closing each with oriented edge
    (y, z) yields every triangle exactly once.
    """
    e = _canonical_edges(pairs, a_col, b_col)
    return _oriented_wedges_from_edges(e)


def _canonical_edges(pairs: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Canonical undirected edge table (min-id ``src``, max-id
    ``dst``), self-loops dropped, deduped."""
    return (
        pairs.select(
            F.least(F.col(a_col), F.col(b_col)).alias("src"),
            F.greatest(F.col(a_col), F.col(b_col)).alias("dst"),
        )
        .filter(F.col("src") < F.col("dst"))
        .distinct()
    )


def _oriented_wedges_from_edges(e: DataFrame) -> DataFrame:
    """Wedge enumeration over a pre-canonicalized edge table — lets
    ``triangle_counts`` canonicalize (and checkpoint) ONCE and close
    wedges against the same table instead of re-scanning + re-deduping
    the raw pair input per consumer."""
    deg = (
        e.select(F.col("src").alias("v"))
        .unionByName(e.select(F.col("dst").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # orient each edge toward its higher-(degree, id) endpoint
    ed = (
        e.join(deg.select(F.col("v").alias("src"), F.col("deg").alias("_ds")), "src")
        .join(deg.select(F.col("v").alias("dst"), F.col("deg").alias("_dd")), "dst")
        .select(
            F.when(
                (F.col("_ds") < F.col("_dd"))
                | ((F.col("_ds") == F.col("_dd")) & (F.col("src") < F.col("dst"))),
                F.struct(
                    F.col("src").alias("lo"), F.col("dst").alias("hi"),
                    F.col("_ds").alias("lo_deg"), F.col("_dd").alias("hi_deg"),
                ),
            )
            .otherwise(
                F.struct(
                    F.col("dst").alias("lo"), F.col("src").alias("hi"),
                    F.col("_dd").alias("lo_deg"), F.col("_ds").alias("hi_deg"),
                )
            )
            .alias("o")
        )
        .select("o.lo", "o.hi", "o.hi_deg")
    )
    xy = ed.select(
        F.col("lo").alias("x"), F.col("hi").alias("y"),
        F.col("hi_deg").alias("_dy"),
    )
    xz = ed.select(
        F.col("lo").alias("x"), F.col("hi").alias("z"),
        F.col("hi_deg").alias("_dz"),
    )
    return (
        xy.join(xz, "x")
        .filter(
            (F.col("_dy") < F.col("_dz"))
            | ((F.col("_dy") == F.col("_dz")) & (F.col("y") < F.col("z")))
        )
        .select("x", "y", "z")
    )


def triangle_counts(
    pairs: DataFrame, a_col: str = "id_a", b_col: str = "id_b"
) -> DataFrame:
    """Per-vertex triangle counts over an undirected pair list — the
    classic distributed-graph benchmark and the local-clustering
    signal (community density, link-spam detection).

    Degree-oriented node-iterator++ (see :func:`oriented_wedges`):
    edges are oriented toward their higher-(degree, id) endpoint,
    bounding the wedge join's fan-out by the oriented out-degree
    O(sqrt(m)) — total work O(m^1.5) even on hub-heavy graphs, where
    the naive id-ordering is O(sum deg²). Each triangle is enumerated
    exactly once as a wedge y←x→z (rank x < y < z) closed by the
    oriented edge (y, z). Per-vertex counts explode each triangle to
    its three corners and aggregate — identical output to the
    id-oriented formulation, so existing oracles are unchanged.

    Output: ``v``, ``n_triangles`` (vertices in >= 1 triangle).
    """
    # canonicalize once; the lazy localCheckpoint keeps the deduped
    # edge table from being rebuilt by each of its two consumers
    # (the wedge builder and the closing join)
    e = _canonical_edges(pairs, a_col, b_col).localCheckpoint(eager=False)
    wedges = _oriented_wedges_from_edges(e)
    # close the wedge with the undirected edge {y, z}; the wedge
    # filter already fixed rank(y) < rank(z) but the canonical edge
    # table is keyed (min-id, max-id), so match either id order
    closing = e.select(
        F.least("src", "dst").alias("_cy"), F.greatest("src", "dst").alias("_cz")
    )
    tri = wedges.join(
        closing,
        (F.least("y", "z") == F.col("_cy"))
        & (F.greatest("y", "z") == F.col("_cz")),
    )
    corners = tri.select(
        F.explode(F.array("x", "y", "z")).alias("v")
    )
    return corners.groupBy("v").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )


def kcore(
    pairs: DataFrame,
    k: int = 2,
    a_col: str = "id_a",
    b_col: str = "id_b",
    rounds: int | str = 6,
    max_rounds: int = 64,
) -> DataFrame:
    """k-core decomposition by peeling: repeatedly drop vertices of
    degree < ``k`` (and their edges) — the dense-substructure filter
    (community kernels, link-spam nuclei, the "everything here is
    heavily cross-linked" signal over a near-dup/linkage graph).

    - ``rounds=N`` (int): EXACTLY ``N`` peels semantically, with an
      early exit when the edge count stops changing (filtering only
      removes edges, so an unchanged count IS the fixed point and
      further rounds are no-ops — the early exit never changes the
      result). When the peel converges within the budget the output
      is the exact k-core; deep chain-peeling graphs need ``rounds``
      ~ their peel depth, and an exhausted budget returns the
      budgeted (super)graph by DESIGN — this is the SQL-oracle form.
    - ``rounds="auto"``: peel to the fixed point (the true k-core)
      under the ``max_rounds`` hard cap, and raise ``RuntimeError``
      if the cap is exhausted before convergence instead of silently
      returning a supergraph — mirrors ``connected_components``'s
      ``auto`` design. Chains peel one layer per round, so linkage
      graphs with long tendrils need this form.

    Per round: one degree aggregation + two semi-joins, lineage
    truncated per round; convergence state is one driver-side scalar.
    Output: ``v``, ``core_degree`` for surviving vertices.
    """
    if rounds == "auto":
        # +1: a peel that reaches its (non-empty) fixed point exactly
        # on round max_rounds still needs one confirming no-change
        # round — without the extra iteration a correct result would
        # be rejected as unconverged
        budget = max_rounds + 1
    elif isinstance(rounds, int) and not isinstance(rounds, bool):
        budget = rounds
    else:
        raise ValueError(f"rounds must be an int or 'auto', got {rounds!r}")
    e = (
        pairs.select(
            F.least(F.col(a_col), F.col(b_col)).alias("src"),
            F.greatest(F.col(a_col), F.col(b_col)).alias("dst"),
        )
        .filter(F.col("src") < F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_edges = e.count()
    converged = False
    for _ in range(budget):
        both = e.select(F.col("src").alias("v")).unionByName(
            e.select(F.col("dst").alias("v"))
        )
        keep = (
            both.groupBy("v")
            .agg(F.count(F.lit(1)).alias("_deg"))
            .filter(F.col("_deg") >= k)
            .select("v")
        )
        e = (
            e.join(keep.withColumnRenamed("v", "src"), "src", "left_semi")
            .join(keep.withColumnRenamed("v", "dst"), "dst", "left_semi")
            .localCheckpoint(eager=True)
        )
        n_now = e.count()
        if n_now == n_edges:
            converged = True
            break
        n_edges = n_now
    if n_edges == 0:
        converged = True  # empty edge set is trivially the fixed point
    if rounds == "auto" and not converged:
        raise RuntimeError(
            f"kcore(rounds='auto') did not reach the peel fixed point in "
            f"max_rounds={max_rounds} rounds ({n_edges} edges still "
            f"changing); raise max_rounds"
        )
    both = e.select(F.col("src").alias("v")).unionByName(
        e.select(F.col("dst").alias("v"))
    )
    return both.groupBy("v").agg(F.count(F.lit(1)).alias("core_degree"))


def label_propagation(
    pairs: DataFrame,
    rounds: int = 4,
    a_col: str = "id_a",
    b_col: str = "id_b",
) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et
    al. 2007) with a deterministic vote: each round every vertex
    adopts the most frequent label among its neighbors PLUS itself
    (the self-vote damps the 2-coloring oscillation of pure
    synchronous LPA on bipartite-ish structures), ties broken to the
    LOWEST label — so the unrolled rounds are engine-independent and
    SQL-expressible, unlike the randomized-order original.

    Complements the graph family: connected components (L8) answer
    "reachable at all?", k-core (G3) "densely embedded?", LPA answers
    "which dense region claims this vertex?" — the near-dup /
    linkage-graph community readout.

    Per round: ONE join of the vertex-sized label table onto the
    (undirected) edge fact + one (vertex, label) count + one
    struct-max argmax — all map-side-partial aggs keyed by vertex;
    lineage truncated per round, edges checkpointed once. ``rounds``
    is fixed (not run-to-convergence): synchronous LPA need not
    converge, and a bounded unroll is the oracle-checkable contract —
    labels after round R depend only on the R-hop neighborhood.

    Output: ``v``, ``community`` (the round-``rounds`` label).
    """
    e = (
        pairs.select(
            F.least(F.col(a_col), F.col(b_col)).alias("src"),
            F.greatest(F.col(a_col), F.col(b_col)).alias("dst"),
        )
        .filter(F.col("src") < F.col("dst"))
        .distinct()
    )
    und = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)
    labels = (
        und.select(F.col("src").alias("v"))
        .distinct()
        .select("v", F.col("v").alias("community"))
        .localCheckpoint(eager=True)
    )
    for _ in range(rounds):
        nbr_votes = und.join(
            labels.withColumnRenamed("v", "dst"), "dst"
        ).select(F.col("src").alias("v"), "community")
        votes = nbr_votes.unionByName(labels)
        best = (
            votes.groupBy("v", "community")
            .agg(F.count(F.lit(1)).alias("_n"))
            .groupBy("v")
            .agg(
                F.max(
                    F.struct(
                        F.col("_n").alias("n"),
                        (-F.col("community")).alias("neg"),
                    )
                ).alias("_b")
            )
            .select("v", (-F.col("_b.neg")).alias("community"))
        )
        labels = best.localCheckpoint(eager=True)
    return labels


def neighbor_jaccard_pairs(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    min_jaccard: float = 0.0,
    max_degree: int | None = None,
) -> DataFrame:
    """Structural node similarity: Jaccard overlap of NEIGHBORHOODS
    — ``|N(u) ∩ N(v)| / |N(u) ∪ N(v)|`` for every node pair sharing
    at least one neighbor (G5; the link-prediction / role-equivalence
    primitive: two customers whose near-dup graphs touch the same
    records, two pages cited by the same pages).

    Candidate generation is the wedge join (two adjacency rows
    through a shared neighbor — a pair with NO common neighbor has
    Jaccard 0 and is correctly absent), then the Jaccard is computed
    EXACTLY from full degrees: common counts come from the wedge
    aggregation, union sizes from ``deg(u) + deg(v) − common``. No
    neighbor-set materialization per pair, no cross product.

    Scale: wedge fan-out is Σ_w deg(w)² — dominated by hub neighbors
    (every pair of a hub's neighbors forms a candidate). At 100 TB
    pass ``max_degree`` to exclude wedges THROUGH nodes above the
    cap: emitted pairs keep exact Jaccard values (degrees and common
    counts still use the full graph), but pairs whose ONLY common
    neighbors are capped hubs are missed — the same documented
    recall-for-scale trade as ``ngram_jaccard_pairs``'s ``max_df``
    (a hub's neighborhood is near-everyone, so pairs it alone
    witnesses have near-zero Jaccard anyway). Default ``None`` is
    exact.

    Output: ``id_a``, ``id_b`` (a < b), ``n_common``, ``jaccard``
    (6 dp), pairs with ``jaccard >= min_jaccard``.
    """
    e = _canonical_edges(pairs, a_col, b_col).localCheckpoint(eager=False)
    adj = e.select(
        F.col("src").alias("w"), F.col("dst").alias("v")
    ).unionByName(e.select(F.col("dst").alias("w"), F.col("src").alias("v")))
    deg = adj.groupBy("v").agg(F.count(F.lit(1)).alias("deg"))
    hubs = adj
    if max_degree is not None:
        wdeg = deg.select(F.col("v").alias("w"), F.col("deg").alias("_wd"))
        hubs = adj.join(wdeg, "w").filter(
            F.col("_wd") <= max_degree
        ).select("w", "v")
    wa = hubs.select("w", F.col("v").alias("id_a"))
    wb = hubs.select("w", F.col("v").alias("id_b"))
    common = (
        wa.join(wb, "w")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    da = deg.select(F.col("v").alias("id_a"), F.col("deg").alias("_da"))
    db = deg.select(F.col("v").alias("id_b"), F.col("deg").alias("_db"))
    return (
        common.join(da, "id_a")
        .join(db, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common")
            / (F.col("_da") + F.col("_db") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= min_jaccard)
        .select(
            "id_a", "id_b", "n_common", F.round("jaccard", 6).alias("jaccard")
        )
    )
