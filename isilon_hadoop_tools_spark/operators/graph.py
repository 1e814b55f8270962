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

    Per iteration: ONE broadcast join (vertex-sized rank vector onto
    the edge fact) + ONE aggregation with map-side partials. The
    lineage is truncated with ``localCheckpoint`` so the plan does not
    grow exponentially with iterations.
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
    # closed subgraph: drop edges whose dst has no out-edges
    e = e.join(verts.withColumnRenamed("v", "_d"), "_d", "left_semi")
    out_w = e.groupBy("_s").agg(F.sum("_w").alias("_ow"))
    norm = (
        e.join(F.broadcast(out_w), "_s")
        .select("_s", "_d", (F.col("_w") / F.col("_ow")).alias("_p"))
        .localCheckpoint(eager=False)
    )
    n = verts.count()  # vertex count: the single driver-side scalar
    out_srcs = norm.select(F.col("_s").alias("v")).distinct()
    # a vertex is dangling when every out-edge fell to the closure;
    # if none exist (the common dense case) the per-iteration dangling
    # aggregate is a constant 0 — skip its 1-row job entirely
    n_dangling = verts.join(out_srcs, "v", "left_anti").count()
    ranks = verts.select("v", F.lit(1.0 / n).alias("r"))
    teleport = (1.0 - damping) / n
    for _ in range(iterations):
        acc = (
            norm.join(F.broadcast(ranks), norm["_s"] == ranks["v"])
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
        ranks = merged.select(
            "v",
            F.round(
                F.lit(teleport)
                + F.lit(damping)
                * (F.coalesce(F.col("_acc"), F.lit(0.0)) + dm_term),
                round_digits,
            ).alias("r"),
        ).localCheckpoint(eager=False)
    return ranks.select(F.col("v"), F.col("r").alias("pagerank"))


def triangle_counts(
    pairs: DataFrame, a_col: str = "id_a", b_col: str = "id_b"
) -> DataFrame:
    """Per-vertex triangle counts over an undirected pair list — the
    classic distributed-graph benchmark and the local-clustering
    signal (community density, link-spam detection).

    Edges are canonicalized to ``src < dst`` and deduped, so each
    triangle x < y < z is enumerated EXACTLY once as the ordered path
    e(x,y) + e(y,z) closed by e(x,z) — two equi-joins whose fan-out is
    bounded by per-vertex degree (never a cross product), the standard
    node-iterator++ shape. Per-vertex counts explode each triangle to
    its three corners and aggregate.

    Output: ``v``, ``n_triangles`` (vertices in >= 1 triangle).
    """
    e = (
        pairs.select(
            F.least(F.col(a_col), F.col(b_col)).alias("src"),
            F.greatest(F.col(a_col), F.col(b_col)).alias("dst"),
        )
        .filter(F.col("src") < F.col("dst"))
        .distinct()
    )
    xy = e.select(F.col("src").alias("x"), F.col("dst").alias("y"))
    yz = e.select(F.col("src").alias("y"), F.col("dst").alias("z"))
    xz = e.select(F.col("src").alias("x"), F.col("dst").alias("z"))
    tri = xy.join(yz, "y").join(xz, ["x", "z"])
    corners = tri.select(
        F.explode(F.array("x", "y", "z")).alias("v")
    )
    return corners.groupBy("v").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
