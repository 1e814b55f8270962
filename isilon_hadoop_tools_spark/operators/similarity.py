"""Similarity search over embedding columns (LLM-pipeline surface).

Brute-force cosine top-k is the exact baseline; LSH-bucketed
(random-hyperplane) ANN is the scale path. Vector math is pure
``F.zip_with`` / ``F.aggregate`` higher-order functions — JVM-side,
no Python in the hot loop.

Scale notes (100 TB): brute force is a broadcast nested loop —
queries are broadcast-sized, so the corpus streams through one pass
with no shuffle; per-partition top-k then a driver-side final merge of
``k × num_queries`` rows via ``TakeOrderedAndProject``. The LSH
variant hashes both sides into ``2^planes`` buckets and equi-joins on
the bucket key, turning the cross product into a partitioned join.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from isilon_hadoop_tools_spark.sources.local import local_df


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a, b):
    """Cosine similarity of two array<double> columns."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_pandas():
    """Arrow-vectorized scalar ``pandas_udf`` twin of :func:`cosine`
    (SURVEY §2.10). The JVM higher-order-function form above is the
    default; this is the escape hatch for numerics the built-ins
    can't express (numpy inside, whole batches per call, ~10-100x
    over row-at-a-time Python UDFs). Tested equal to the JVM form in
    ``tests/test_stateful.py``."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
        av = np.stack(a.to_numpy())
        bv = np.stack(b.to_numpy())
        dots = (av * bv).sum(axis=1)
        norms = np.linalg.norm(av, axis=1) * np.linalg.norm(bv, axis=1)
        return pd.Series(dots / norms)

    return _cos


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k: for each query row, the k nearest corpus
    rows (self-matches on equal ids excluded).

    Output: ``query_id``, ``neighbor_id``, ``cos_sim`` (rounded to 6
    for cross-engine stability), ``rank``.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("q_vec"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("c_vec"),
    )
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _plane_component(p: int, j: int, seed: int) -> float:
    """Deterministic pseudo-random plane component in [-1, 1): the
    md5-derived 32-bit hash of ``"p:j:seed"`` (same formula as
    ``functions.hashing.stable_hash32``) scaled to the unit range."""
    h = int(hashlib.md5(f"{p}:{j}:{seed}".encode()).hexdigest()[:8], 16)
    return h / 2147483648.0 - 1.0


def hyperplane_bucket(vec_col, planes: int, dim: int, seed: int = 7) -> Column:
    """Random-hyperplane LSH bucket id (0 .. 2^planes-1) for an
    array<double> column.

    The planes are data-independent constants, so they are computed
    once in Python and embedded as array literals — zero per-row
    hashing (the naive form re-derives planes*dim md5 values per row).
    Each plane is rendered as ONE ``F.expr("array(...)")`` literal:
    element-wise ``F.lit`` assembly costs planes*dim driver->JVM
    round-trips (seconds of pure plan-construction latency at
    dim=64 x 8 tables), the single parsed string costs one.
    bit p = (dot(vec, plane_p) >= 0).
    """
    bucket = F.lit(0).cast("long")
    for p in range(planes):
        comp = F.expr(
            "array("
            + ",".join(f"{_plane_component(p, j, seed)!r}D" for j in range(dim))
            + ")"
        )
        bit = (_dot(vec_col, comp) >= 0).cast("long")
        bucket = bucket + bit * F.lit(2**p)
    return bucket


def bucket_ids_pandas(planes: int, dim: int, seeds: list[int]):
    """Arrow-vectorized multi-table bucket assignment.

    Same bits as :func:`hyperplane_bucket` (bit p = dot(vec, plane_p)
    >= 0, identical plane constants), computed as ONE numpy matmul per
    Arrow batch — ``(n, dim) @ (dim, tables*planes)`` — instead of
    ``tables * planes`` interpreted higher-order-function dots per
    row (HOF expressions fall out of whole-stage codegen; the matmul
    form measures ~10x faster at dim=64 x 8 tables). Bucket ids feed
    only candidate generation, never the output, so the float-sum
    order difference vs the JVM form is harmless (it could flip a
    bucket bit only for a dot within fp-epsilon of zero).

    Returns a scalar pandas_udf: array<double> -> array<long> of
    ``len(seeds)`` bucket ids. Raises on dimension mismatch instead
    of silently NULL-bucketing (the ADVICE-flagged failure mode).
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    mat = np.empty((dim, len(seeds) * planes))
    for t, seed in enumerate(seeds):
        for p in range(planes):
            for j in range(dim):
                mat[j, t * planes + p] = _plane_component(p, j, seed)
    weights = 2 ** np.arange(planes, dtype=np.int64)
    n_tables = len(seeds)

    @pandas_udf("array<long>")
    def _buckets(v: pd.Series) -> pd.Series:
        av = np.stack(v.to_numpy())
        if av.shape[1] != dim:
            raise ValueError(f"embedding dim {av.shape[1]} != expected {dim}")
        bits = (av @ mat) >= 0
        ids = bits.reshape(len(av), n_tables, planes).astype(np.int64) @ weights
        return pd.Series(list(ids))

    return _buckets


TARGET_BUCKET_OCCUPANCY = 16


def auto_planes(n_rows: int, target: int = TARGET_BUCKET_OCCUPANCY) -> int:
    """Plane count sized so expected bucket occupancy ~= ``target``:
    ``ceil(log2(n / target))`` clamped to [2, 16]. Fixed plane counts
    are a scale bug — 16 buckets over a 100 TB corpus means ~1/16 of
    the corpus self-joins per bucket; occupancy, not bucket count, is
    what must stay constant as n grows (candidate work ~ tables *
    2^planes * occupancy^2)."""
    import math

    return max(2, min(16, math.ceil(math.log2(max(n_rows, 1) / target))))


def cosine_near_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
    planes: int | None = None,
    tables: int = 8,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: multi-table LSH
    candidate generation (self-join on (table, bucket)) + exact cosine
    verification.

    Output: ``id_a``, ``id_b``, ``cos_sim`` (id_a < id_b, cos >=
    threshold). The self-join never materializes the n^2 pair space —
    only co-bucketed rows meet — and sign-hash buckets are
    scale-invariant, so exact duplicates (and near-exact, with
    multi-table union probability) always co-bucket. Recall for
    borderline pairs follows 1-(1-p^planes)^tables; raise ``tables``
    for higher-recall sweeps. ``planes=None`` (default) sizes the
    bucket count from the corpus so occupancy — and with it the
    per-bucket candidate volume — stays constant as the corpus grows
    (see :func:`auto_planes`).
    """
    if dim is None or planes is None:
        # ONE probe job for both corpus size and dim (separate count()
        # + first() scans cost two passes — at 100 TB that's two reads
        # of the fact table before any real work)
        probe = df.agg(
            F.count(F.lit(1)).alias("n"), F.first(F.size(vec_col)).alias("d")
        ).first()
        if probe is None or probe["d"] is None:
            raise ValueError("cannot infer embedding dim from an empty corpus")
        if dim is None:
            dim = probe["d"]
        if planes is None:
            planes = auto_planes(probe["n"])
    vec = F.col(vec_col).cast("array<double>")
    bucketer = bucket_ids_pandas(
        planes, dim, [7 + 1000 * t for t in range(tables)]
    )
    # candidate generation is id-only: carrying the vectors through
    # the bucket self-join shuffles ~dim*8 bytes per *candidate* row
    # (64x the key payload) and was the measured bottleneck; instead
    # the distinct pair set re-joins the per-id vector+norm table.
    # lazy localCheckpoint: the hash table is consumed by BOTH sides of
    # the bucket self-join, whose per-side isnotnull pushdowns defeat
    # ReusedExchange — without materialization the Arrow bucketer runs
    # once per consumer (8 ArrowEvalPython nodes in the measured plan).
    # The table is id+2 ints per (row, table) — bounded, cheap to hold.
    # NOTE: width-pinning this checkpoint (repartition on the band key
    # before it, the r16 widen pattern) was tried and REVERTED: paired
    # A/B 2.2 → 3.6 s — the added exchange plus 32-task downstream
    # stages cost more than the 2-task join stages they replaced on
    # this operator's small per-stage work.
    hashed = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(bucketer(vec)).alias("table_id", "bucket"),
    ).localCheckpoint(eager=False)
    a = hashed.select("table_id", "bucket", F.col("id").alias("id_a"))
    b = hashed.select("table_id", "bucket", F.col("id").alias("id_b"))
    candidates = (
        a.join(b, ["table_id", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # norms precomputed once per id: the verify pass then evaluates
    # ONE higher-order dot per pair instead of dot + 2 norms (3x), and
    # dot/(na*nb) is the exact same floating-point expression the
    # brute-force oracle computes.
    vecs = df.select(F.col(id_col).alias("id"), vec.alias("v")).withColumn(
        "n", _norm(F.col("v"))
    )
    va = vecs.select(
        F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("n").alias("na")
    )
    vb = vecs.select(
        F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("n").alias("nb")
    )
    return (
        candidates.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def ivf_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF-style ANN: partition the corpus into ``n_lists`` inverted
    lists by nearest centroid, probe the ``n_probe`` closest lists per
    query, exact-rank within the probed lists.

    Centroids here are the ``n_lists`` lowest-id corpus vectors — a
    deterministic stand-in for a k-means pass (at 100 TB you train
    centroids once with :func:`kmeans_iterate` — or on a sample — and
    broadcast them; the assignment / probe / rank dataflow below is
    identical). Assignment is one scan
    with broadcast centroids; the probe join's key is the list id, so
    each query only meets ~n_probe/n_lists of the corpus.

    Output: ``query_id``, ``neighbor_id``, ``cos_sim``, ``rank``.
    """
    cents = [
        (int(r[id_col]), [float(x) for x in r[vec_col]])
        for r in corpus.select(id_col, vec_col).orderBy(id_col).limit(n_lists).collect()
    ]
    cent_rows = [(i, vec) for i, (_, vec) in enumerate(cents)]
    cent_lit = F.array(
        *[
            F.struct(
                F.lit(i).alias("list_id"),
                F.expr("array(" + ",".join(f"{x!r}D" for x in v) + ")").alias(
                    "c"
                ),
            )
            for i, v in cent_rows
        ]
    )

    def assign(df: DataFrame, out_id: str, vec_out: str, probe: int) -> DataFrame:
        """Per-row list assignment against the literal centroid array
        — a stateless projection on BOTH sides (the kmeans_assign
        shape): score all centroids, array_sort, keep the first
        ``probe`` and explode. Zero shuffle, zero join — the earlier
        form ran the query side through a broadcast join plus a
        ranking window (an exchange + sort just to pick each row's
        top-4 of 16 centroids).

        Centroid sim is rounded to 9 decimals BEFORE ranking so probe
        ranks are reproducible across engines (raw fp accumulation
        order could flip a rank for two near-equal centroid sims),
        with list_id as the deterministic tie-break — array_sort on
        (nsim, list_id) structs orders exactly like the oracle's
        ``ORDER BY sim DESC, list_id``. The row's vector rides along:
        the exact-rank cosine is computed inside the probe join's
        pipeline, so candidate rows shuffle as scalars and neither
        input is ever re-joined for its vectors.
        """
        vec = F.col(vec_col).cast("array<double>")
        ranked = F.array_sort(
            F.transform(
                cent_lit,
                lambda cent: F.struct(
                    (-F.round(cosine(vec, cent["c"]), 9)).alias("nsim"),
                    cent["list_id"].alias("list_id"),
                ),
            )
        )
        return df.select(
            F.col(id_col).alias(out_id),
            vec.alias(vec_out),
            F.explode(F.slice(ranked, 1, probe)["list_id"]).alias("list_id"),
        )

    c = assign(corpus, "neighbor_id", "_c_vec", probe=1)
    q = assign(queries, "query_id", "q_vec", probe=n_probe)
    # (query_id, neighbor_id) candidates are unique by construction —
    # a corpus row lives in exactly one list and a query probes
    # n_probe distinct lists — so no distinct pass is needed; the
    # cosine is computed map-side against the broadcast query rows
    # and only scalar candidate rows reach the ranking shuffle.
    scored = (
        c.join(F.broadcast(q), "list_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("_c_vec")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    planes: int = 4,
    tables: int = 8,
    dim: int | None = None,
    probes: int = 0,
) -> DataFrame:
    """Approximate top-k via **multi-table** random-hyperplane LSH,
    optionally **multi-probe** (Lv et al., VLDB'07): with
    ``probes = p > 0`` each QUERY additionally probes the ``p``
    buckets at Hamming distance 1 (one plane bit flipped) in every
    table. A near neighbor that lands one bit away — the most likely
    miss mode, since each bit flips with the small probability that
    one hyperplane separates the pair — is then still found. The
    scale trade: probing multiplies only the query-side hash rows
    (queries x tables x (p+1) — the tiny side of the broadcast
    join), while matching recall by adding TABLES would multiply the
    corpus-side index itself; at 100 TB the corpus index is the cost
    that matters, so multi-probe buys the same recall for a
    fraction of the index footprint.

    ``tables`` independent hash tables of ``planes`` hyperplanes each;
    a corpus row is a candidate for a query if they share a bucket in
    ANY table, then exact cosine ranks the deduplicated candidates.
    Recall ~= 1 - (1 - p^planes)^tables for per-plane agreement
    probability p = 1 - theta/pi — a single table at realistic
    dimensionality recalls barely above random, which is why the
    multi-table union is not optional (recall floor asserted in
    ``tests/test_similarity.py``).

    Scale shape: the corpus is hashed once into ``tables`` entries per
    row (explode), the join key (table_id, bucket) is uniform-ish, and
    candidate dedup + scoring happen before the per-query top-k
    window. Tune ``planes`` up with corpus size (bucket occupancy
    ~ n / 2^planes per table).

    ``dim`` defaults to the corpus embedding length (one-row probe).
    A vector of any other length would silently produce a NULL bucket
    and vanish from the join, so mismatches raise instead.
    """
    if dim is None:
        probe = corpus.select(F.size(vec_col).alias("d")).first()
        if probe is None:
            raise ValueError("cannot infer embedding dim from an empty corpus")
        dim = probe["d"]

    bucketer = bucket_ids_pandas(
        planes, dim, [7 + 1000 * t for t in range(tables)]
    )

    def _hashed(df: DataFrame, out_id: str) -> DataFrame:
        vec = F.col(vec_col).cast("array<double>")
        # id-only hash-table rows: the vectors re-join after candidate
        # dedup, so the bucket join shuffles 16-byte keys, not arrays.
        # bucket_ids_pandas raises on a dim mismatch rather than
        # silently NULL-bucketing the row out of the join.
        return df.select(
            F.col(id_col).alias(out_id),
            F.posexplode(bucketer(vec)).alias("table_id", "bucket"),
        )

    if probes > planes:
        raise ValueError(f"probes={probes} exceeds planes={planes}")
    q = _hashed(queries, "query_id")
    if probes:
        # original bucket first, then each 1-bit-flipped neighbor
        q = q.select(
            "query_id",
            "table_id",
            F.explode(
                F.array(
                    F.col("bucket"),
                    *[
                        F.col("bucket").bitwiseXOR(F.lit(1 << p))
                        for p in range(probes)
                    ],
                )
            ).alias("bucket"),
        )
    c = _hashed(corpus, "neighbor_id")
    candidates = (
        c.join(F.broadcast(q), ["table_id", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    vec = F.col(vec_col).cast("array<double>")
    q_vecs = queries.select(
        F.col(id_col).alias("query_id"), vec.alias("q_vec")
    )
    c_vecs = corpus.select(
        F.col(id_col).alias("neighbor_id"), vec.alias("c_vec")
    )
    scored = (
        candidates.join(F.broadcast(q_vecs), "query_id")
        .join(c_vecs, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def quantize_embeddings(
    df: DataFrame, vec_col: str, id_col: str, bits: int = 8
) -> DataFrame:
    """Symmetric per-vector int quantization for embedding storage.

    ``scale = round(max(|x|) / (2^(bits-1) - 1), 6)`` (rounded so the
    scalar survives a float32 parquet round-trip bit-identically),
    ``q[i] = round(x[i] / scale)`` — the standard storage layout that
    cuts a float32 embedding column 4x at 100 TB. Output: id,
    ``scale``, ``qvec``. Zero vectors keep scale 0 and quantize to
    all-zero (guarded division).

    Stateless per-row projection — no shuffle; the array math runs as
    higher-order functions, acceptable here because this is a
    write-amortized storage pass, not a hot join path.
    """
    qmax = (1 << (bits - 1)) - 1
    x = F.col(vec_col)
    scale = F.round(
        F.array_max(F.transform(x, lambda v: F.abs(v.cast("double")))) / qmax, 6
    )
    qvec = F.when(scale == 0, F.transform(x, lambda v: F.lit(0))).otherwise(
        F.transform(
            x, lambda v: F.round(v.cast("double") / scale).cast("int")
        )
    )
    return df.select(
        F.col(id_col), scale.alias("scale"), qvec.alias("qvec")
    )


def kmeans_assign(
    vecs: DataFrame,
    cents: list[tuple[int, list[int]]],
    literal_threshold: int = 48,
) -> DataFrame:
    """Nearest-centroid assignment over quantized vectors.

    ``vecs`` carries (vid, qv: array<bigint>); the centroid table is a
    *literal array of structs* baked into the plan (k x dim ints — a
    few KB), so assignment is a stateless per-row argmin: compute each
    centroid's exact integer squared-euclidean distance with
    ``transform``/``zip_with`` and take ``array_min`` over
    (dist, list_id) structs — struct ordering compares dist first,
    then list_id, which is exactly the deterministic tie-break.

    Zero shuffles. An earlier form joined every vector against all k
    centroids and ranked with a window partitioned by vid — an n x k
    row exchange per call; at 100 TB x iterations that exchange
    dominates Lloyd's loop, and this projection form removes it.

    Above ``literal_threshold`` centroids (default 48: the measured
    crossover sits between k=8 and k=64, where the join form already
    runs 2.3x faster) the literal array stops being a constant and
    starts being a PLAN (k·dim Literal nodes — analysis/codegen cost
    grows with k, the corpus-scaled-k SemDeDup case): assignment
    switches to a broadcast centroid TABLE crossed against the vectors
    with the same (dist, list_id) struct-min as a partial-aggregable
    groupBy — n·k candidate rows combine map-side to one row per
    vector before any exchange, identical output (equality-tested
    across the switch in `tests/test_similarity.py`).
    """
    if not cents:
        # fail loudly here, not at SQL-parse time: with zero centroids
        # the rendered sequence(1, 0) yields a DESCENDING [1, 0] and
        # element_at errors deep inside the parsed expression — a
        # much harder trace than this guard (ADVICE r16).
        raise ValueError("kmeans_assign: empty centroid list")
    if len(cents) > literal_threshold:
        return _kmeans_assign_join(vecs, cents)
    # TWO literal nodes total (one array<array<bigint>> of centroids,
    # one array<int> of list ids) instead of k x dim F.lit().cast()
    # Column objects: the per-literal form paid k·dim py4j roundtrips
    # at plan build plus a k·dim-node tree through analysis and
    # codegen EVERY Lloyd iteration — measured 2.22 s -> 0.65 s per
    # assignment pass at k=8, dim=64, bit-identical output (the
    # (dist, list_id) struct-min tie-break is unchanged). The whole
    # argmin is ONE F.expr SQL string (the simhash/bootstrap fix):
    # the Column/lambda form still paid ~0.5 s of py4j per Lloyd
    # iteration rebuilding the same tree around fresh centroid
    # values; the SQL text parses JVM-side in one call and the
    # centroid ints render inline as the same two array literals.
    carr_sql = ",".join(
        "array(" + ",".join(str(int(v)) for v in c) + ")" for _, c in cents
    )
    ids_sql = ",".join(str(int(lid)) for lid, _ in cents)
    best = F.expr(
        f"array_min(transform(sequence(1, {len(cents)}), i -> named_struct("
        "'dist', aggregate(zip_with(qv, element_at(CAST(array("
        f"{carr_sql}) AS ARRAY<ARRAY<BIGINT>>), i),"
        " (a, b) -> (a - b) * (a - b)), CAST(0 AS BIGINT),"
        " (acc, x) -> acc + x),"
        f" 'list_id', element_at(CAST(array({ids_sql}) AS ARRAY<INT>), i))))"
    )
    return vecs.withColumn("_b", best).select(
        "vid",
        "qv",
        F.col("_b.list_id").alias("list_id"),
        F.col("_b.dist").alias("dist"),
    )


def _kmeans_assign_join(
    vecs: DataFrame, cents: list[tuple[int, list[int]]]
) -> DataFrame:
    """Large-k assignment: broadcast centroid table × vectors, exact
    integer distance per candidate, struct-min argmin per vector with
    map-side partial aggregation. Same (vid, qv, list_id, dist)
    contract and (dist, list_id) tie-break as the literal form."""
    spark = vecs.sparkSession
    cdf = spark.createDataFrame(
        [(int(lid), [int(v) for v in c]) for lid, c in cents],
        "list_id int, c array<bigint>",
    )
    dist = F.aggregate(
        F.zip_with(F.col("qv"), F.col("c"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = vecs.crossJoin(F.broadcast(cdf)).select(
        "vid",
        "qv",
        F.struct(dist.alias("dist"), F.col("list_id").alias("list_id")).alias("_s"),
    )
    return (
        scored.groupBy("vid")
        .agg(F.min("_s").alias("_b"), F.first("qv").alias("qv"))
        .select(
            "vid",
            "qv",
            F.col("_b.list_id").alias("list_id"),
            F.col("_b.dist").alias("dist"),
        )
    )


def kmeans_iterate(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 8,
    iters: int = 3,
    scale: int = 1000,
) -> DataFrame:
    """Lloyd's k-means over embeddings, cross-engine deterministic.

    Float drift makes naive distributed k-means unreproducible: both
    the distance sums and the centroid means depend on accumulation
    order. This runs in integer-quantized space — ``qv = round(x *
    scale)`` — where squared distances are exact bigint sums (any
    order) and each mean is one double division of exact sums, so
    every engine computes bit-identical centroids every iteration.

    Init: the ``k`` lowest-id vectors. Per iteration: broadcast the
    (tiny) centroid table, assign by exact integer argmin, recompute
    centroids as round(sum/count) per component; clusters that lose
    all members keep their previous centroid. Output: the final
    assignment ``(vec_id, list_id, dist)``.

    Scale: the classic 100 TB layout — centroids live on the driver
    (k x dim values) and broadcast each round; the corpus is scanned
    once per iteration with map-side partial sums, never collected.
    The quantized corpus is persisted across iterations.
    """
    vecs = quantize_vectors(df, vec_col, id_col, scale).persist()
    try:
        cents = kmeans_train(vecs, k, iters)
        return kmeans_assign(vecs, cents).select(
            F.col("vid").alias("vec_id"), "list_id", "dist"
        )
    finally:
        vecs.unpersist()


def quantize_vectors(
    df: DataFrame, vec_col: str, id_col: str, scale: int = 1000
) -> DataFrame:
    """(vid, qv) integer-quantized vector table — the shared input of
    kmeans_train/kmeans_assign."""
    qv = F.transform(
        F.col(vec_col), lambda x: F.round(x.cast("double") * scale).cast("long")
    )
    return df.select(F.col(id_col).alias("vid"), qv.alias("qv"))


def kmeans_train(
    vecs: DataFrame, k: int, iters: int
) -> list[tuple[int, list[int]]]:
    """Lloyd centroid training over a quantized (vid, qv) table;
    returns the final codebook as driver-held ints (k x dim — a few
    KB, the only driver state). Init: the k lowest-id vectors. See
    ``kmeans_iterate`` for the determinism contract."""
    init = vecs.orderBy("vid").limit(k).collect()
    cents = [(i, list(r["qv"])) for i, r in enumerate(init)]
    dim = len(cents[0][1])
    # One wide agg: dim sum columns + count, map-side partials
    # shuffle only k x (dim+1) partial rows per input partition
    # (an earlier form posexploded every component — n x dim
    # rows — before aggregating). The round(sum/count) mean is
    # computed Spark-side so it stays bit-identical to the
    # oracle's round(sum::DOUBLE / count). The Column list is
    # iteration-INVARIANT (only the centroid literals change), so
    # build it once — and via ONE F.expr per column (the simhash /
    # bootstrap SQL-string fix): the Column-API form cost ~7 py4j
    # round-trips per component, measured 1.1 s of pure driver
    # time at dim=64 for this list alone; the parsed trees are the
    # same expressions, so plans and values are unchanged.
    agg_cols = [
        F.expr(
            f"CAST(round(CAST(sum(qv[{p}]) AS DOUBLE) / count(1))"
            " AS BIGINT)"
        ).alias(f"c{p}")
        for p in range(dim)
    ]
    for _ in range(iters):
        assign = kmeans_assign(vecs, cents)
        upd = assign.groupBy("list_id").agg(
            F.count(F.lit(1)).alias("n"), *agg_cols
        )
        bylist = {
            r["list_id"]: [r[f"c{p}"] for p in range(dim)]
            for r in upd.collect()
        }
        cents = [(lid, bylist.get(lid, c)) for lid, c in cents]
    return cents


def l2_normalize(df: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    """L2-normalize an embedding column (unit vectors — the standard
    pre-pass that turns cosine ANN into dot-product ANN and makes
    int8 quantization scale-uniform).

    Output is the gate-comparable exploded form ``(id, pos, nval)``
    with ``nval = round(x / ||v||, 6)``; zero vectors normalize to
    all-zero (guarded division). Stateless per-row projection — no
    shuffle, scan-bound at any scale.
    """
    # project the norm into its own column FIRST: a norm expression
    # referenced inside the per-element transform lambda is inlined
    # and re-evaluated per element — O(dim^2) array-aggregate work per
    # row (measured 2.6x on the kindred semantic_dedup unit pre-pass)
    vec = F.col(vec_col).cast("array<double>")
    nd = df.select(F.col(id_col), vec.alias("_v")).select(
        F.col(id_col), "_v", _norm(F.col("_v")).alias("_n")
    )
    nvec = F.when(
        F.col("_n") == 0, F.transform("_v", lambda x: F.lit(0.0))
    ).otherwise(F.transform("_v", lambda x: F.round(x / F.col("_n"), 6)))
    return nd.select(
        F.col(id_col), F.posexplode(nvec).alias("pos", "nval")
    )


def ann_recall(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    planes: int = 4,
    tables: int = 8,
) -> DataFrame:
    """Recall@k of the LSH ANN path against the exact brute-force
    ground truth — the eval every approximate index needs before it
    replaces an exact scan in production.

    Output per query: ``query_id``, ``n_hits`` (ground-truth top-k
    rows the ANN also returned), ``recall`` (= n_hits / k, rounded).
    Both sides are the engine's own operators, so the join is k-row
    per query — evaluation cost is dominated by the two searches, and
    on a cluster both searches share the corpus scan.
    """
    truth = brute_force_topk(corpus, queries, vec_col, id_col, k=k)
    approx = lsh_ann_topk(
        corpus, queries, vec_col, id_col, k=k, planes=planes, tables=tables
    ).select("query_id", "neighbor_id", F.lit(1).alias("_hit"))
    return (
        truth.join(approx, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(F.count("_hit").alias("n_hits"))
        .select(
            "query_id",
            "n_hits",
            F.round(F.col("n_hits") / k, 6).alias("recall"),
        )
    )


def semantic_pair_planes(
    max_heavy: int, target: int = TARGET_BUCKET_OCCUPANCY
) -> int:
    """Occupancy-sized plane count for the within-cluster LSH bound:
    ``ceil(log2(max_heavy / target))`` clamped to [2, 24]. Same
    discipline as :func:`auto_planes` but with the clamp raised to 24
    bits — the budget path exists precisely for mega-clusters, so the
    bucket count must keep scaling past 2^16 (24 bits holds expected
    occupancy ~= ``target`` up to ~268M-row clusters; the bucket id
    stays a long either way)."""
    import math

    return max(2, min(24, math.ceil(math.log2(max(max_heavy, 1) / target))))


def _heavy_candidates(
    hsrc: DataFrame, dim: int, planes: int, tables: int
) -> DataFrame:
    """Sign-LSH candidate pairs WITHIN clusters for the heavy-cluster
    rows ``hsrc`` (id, list_id, v): bucket every row into ``tables``
    independent sign-hash tables (Arrow matmul, one pass), self-join
    on (list_id, table_id, bucket), distinct. Candidate volume per
    table ~= cluster_size * occupancy (linear in cluster size at the
    occupancy-sized plane count), never cluster_size² — the mechanism
    that bounds a mega-cluster (r12 VERDICT #1)."""
    bucketer = bucket_ids_pandas(
        planes, dim, [7 + 1000 * t for t in range(tables)]
    )
    hashed = hsrc.select(
        "list_id",
        "id",
        F.posexplode(bucketer(F.col("v").cast("array<double>"))).alias(
            "table_id", "bucket"
        ),
    ).localCheckpoint(eager=False)
    ca = hashed.select(
        "list_id", "table_id", "bucket", F.col("id").alias("id_a")
    )
    cb = hashed.select(
        "list_id", "table_id", "bucket", F.col("id").alias("id_b")
    )
    return (
        ca.join(cb, ["list_id", "table_id", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def _within_cluster_pairs(
    clustered: DataFrame,
    threshold: float,
    max_cluster_rows: int,
    tables: int,
) -> DataFrame:
    """Cosine >= ``threshold`` pairs within clusters of a
    ``(id, list_id, v, n)`` table, with the mega-cluster bound:
    clusters up to ``max_cluster_rows`` rows use the exact all-pairs
    self-join (the SemDeDup n²/k trade, fine when the budget holds);
    clusters ABOVE the budget route through :func:`_heavy_candidates`
    sign-LSH banding, so one boilerplate-heavy cluster holding 30% of
    the corpus costs ~linear candidate volume instead of a 0.09·n²
    single-key pair blowup. The heavy set is <= k cluster ids — the
    size probe is parameter-bounded driver state, like every other
    driver-held table in the engine."""
    sizes = clustered.groupBy("list_id").agg(
        F.count(F.lit(1)).alias("_n")
    ).collect()
    heavy = {
        r["list_id"]: r["_n"] for r in sizes if r["_n"] > max_cluster_rows
    }
    cos = F.round(
        _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6
    )
    light_src = (
        clustered.filter(~F.col("list_id").isin(*heavy))
        if heavy
        else clustered
    )
    a = light_src.select(
        "list_id",
        F.col("id").alias("id_a"),
        F.col("v").alias("va"),
        F.col("n").alias("na"),
    )
    b = light_src.select(
        "list_id",
        F.col("id").alias("id_b"),
        F.col("v").alias("vb"),
        F.col("n").alias("nb"),
    )
    light_pairs = (
        a.join(b, "list_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b")
    )
    if not heavy:
        return light_pairs
    hsrc = clustered.filter(F.col("list_id").isin(*heavy))
    dim = clustered.select(F.size("v").alias("d")).first()["d"]
    planes = semantic_pair_planes(max(heavy.values()))
    cand = _heavy_candidates(hsrc, dim, planes, tables)
    va = clustered.select(
        F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("n").alias("na")
    )
    vb = clustered.select(
        F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("n").alias("nb")
    )
    heavy_pairs = (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b")
    )
    return light_pairs.unionByName(heavy_pairs)


def semantic_dedup(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 3,
    threshold: float = 0.9,
    max_cluster_rows: int = 4096,
    tables: int = 8,
) -> DataFrame:
    """SemDeDup-style semantic deduplication: cluster embeddings with
    k-means, find cosine near-dup pairs *within clusters only*, and
    keep the min-id representative of each connected near-dup group.

    Output: ``vec_id``, ``list_id``, ``keep_id`` (a row is a semantic
    duplicate iff ``keep_id != vec_id``).

    Scale shape (the published SemDeDup recipe): clustering caps the
    pair search at cluster size — the within-cluster self-join is the
    deliberate n²/k trade that replaces a corpus-wide pair search.
    That trade alone has no defense against a MEGA-cluster (a
    boilerplate-heavy crawl collapsing 30% of vectors into one
    k-means cell turns the single ``list_id`` key into a 0.09·n² pair
    explosion — the r12 VERDICT scale-killer), so the pair stage is
    budgeted: clusters above ``max_cluster_rows`` rows generate
    candidates through within-cluster sign-LSH banding
    (occupancy-sized plane count, see :func:`semantic_pair_planes`;
    multi-table union for recall — a cos 0.9 pair survives one of 8
    tables with ~99% probability at the sf-test plane counts, and
    EXACT direction duplicates co-bucket always) instead of the
    direct self-join. Light clusters keep the exact pair search, so
    the budget only ever trades recall on the pathological tail.
    Composes existing operators — kmeans_iterate →
    budgeted within-cluster cosine pairs → connected_components —
    with no new shuffle shapes.
    """
    from isilon_hadoop_tools_spark.operators.dedup import connected_components

    # cluster on the unit sphere (the SemDeDup recipe): cosine
    # duplicates are direction-equal but not euclidean-close, so
    # k-means must see L2-normalized vectors or scale-different
    # duplicates land in different clusters and never meet
    # norm as its own projected column, NOT inlined in the transform
    # lambda (inlining re-evaluates the norm aggregate per element —
    # O(dim^2) per row; measured 0.72 s -> 0.28 s on the sf0.1 pass).
    # Both projections are F.expr SQL strings: the Column/lambda form
    # cost ~1.0 s of py4j per build (profiled on the sf0.1 pass) for
    # the same parsed trees. 0.0D keeps the SQL literals DOUBLE.
    raw = F.col(vec_col).cast("array<double>")
    nd = df.select(F.col(id_col), raw.alias("_r")).select(
        F.col(id_col),
        "_r",
        F.expr("sqrt(aggregate(_r, 0.0D, (acc, v) -> acc + v * v))").alias(
            "_n"
        ),
    )
    unit = nd.select(
        F.col(id_col),
        F.expr(
            "CASE WHEN _n = 0.0D THEN _r"
            " ELSE transform(_r, x -> x / _n) END"
        ).alias(vec_col),
    )
    # assign is consumed by THREE downstream branches (the pair join,
    # the component node list, and the final label join) and pairs is
    # re-joined every connected-components iteration — without lineage
    # truncation each consumer re-runs the k-means scan and the n²/k
    # cosine join per CC round. Both are bounded intermediates (n id
    # rows / near-dup id pairs), so checkpoint them once.
    assign = (
        kmeans_iterate(unit, vec_col, id_col, k=k, iters=iters)
        .select(F.col("vec_id").alias("id"), "list_id")
        .localCheckpoint(eager=False)
    )
    vec = F.col(vec_col).cast("array<double>")
    vecs = df.select(F.col(id_col).alias("id"), vec.alias("v")).withColumn(
        "n", _norm(F.col("v"))
    )
    clustered = assign.join(vecs, "id").localCheckpoint(eager=False)
    pairs = _within_cluster_pairs(
        clustered, threshold, max_cluster_rows, tables
    ).localCheckpoint(eager=False)
    keep = connected_components(assign.select("id"), pairs)
    return (
        assign.join(keep, "id")
        .select(F.col("id").alias("vec_id"), "list_id", "keep_id")
    )


def pq_encode(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    m: int = 4,
    k: int = 8,
    iters: int = 2,
    scale: int = 1000,
) -> DataFrame:
    """Product quantization: split each vector into ``m`` contiguous
    subvectors and learn an independent k-means codebook per subspace
    (`kmeans_iterate` — integer-quantized, so codebooks and code
    assignments are bit-identical cross-engine). A vector compresses
    to ``m`` small codes: with m=4, k=8 that is 4 x 3 bits per
    64-float embedding — the memory layout behind billion-vector ANN
    (IVF-PQ), two steps past the engine's scalar int8 quantization
    (L27) and flat IVF (L12).

    Output: one ``(vec_id, subspace, code)`` row per subvector (the
    gate-comparable exploded form).

    The m subspace codebooks are INDEPENDENT but train FUSED: every
    vector explodes once into m ``(vid, subspace, qv)`` subvector
    rows, and each Lloyd round is ONE broadcast-join assignment +
    ONE centroid-update aggregation over ``(subspace, code)`` — m×
    fewer sequential job barriers than per-subspace loops (the
    earlier form ran m separate trainings, each iters × (agg job +
    driver collect) back to back; on the bench that was job-count-,
    not data-bound). Centroid state on the driver is m·k subvectors;
    results are bit-identical to the sequential form (exact integer
    distances, (dist, list_id) tie-break, round(sum/count) update).
    """
    dim = len(
        df.select(F.col(vec_col)).first()[0]
    )
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub_dim = dim // m
    vecs = _pq_subvectors(df, vec_col, id_col, m, sub_dim, scale).persist()
    try:
        books = _pq_train(vecs, k, iters, sub_dim)
        return _pq_assign(vecs, books).select(
            F.col("vid").alias("vec_id"),
            "subspace",
            F.col("list_id").alias("code"),
        )
    finally:
        vecs.unpersist()


def _pq_subvectors(
    df: DataFrame, vec_col: str, id_col: str, m: int, sub_dim: int, scale: int
) -> DataFrame:
    """One ``(vid, subspace, qv)`` row per (vector, subspace):
    quantize the full vector once (same ``round(x * scale)`` contract
    as :func:`quantize_vectors` — slicing commutes with per-component
    quantization) and inline-explode the m contiguous slices."""
    qv_full = F.transform(
        F.col(vec_col), lambda x: F.round(x.cast("double") * scale).cast("long")
    )
    subs = F.array(
        *[
            F.struct(
                F.lit(j).cast("int").alias("subspace"),
                F.slice(F.col("_qv"), j * sub_dim + 1, sub_dim).alias("qv"),
            )
            for j in range(m)
        ]
    )
    return df.select(F.col(id_col).alias("vid"), qv_full.alias("_qv")).select(
        "vid", F.inline(subs)
    )


def _pq_train(
    vecs: DataFrame, k: int, iters: int, sub_dim: int
) -> dict[tuple[int, int], list[int]]:
    """Fused Lloyd training over all subspaces at once. ``vecs`` is
    the persisted (vid, subspace, qv) table; returns the codebooks as
    {(subspace, list_id): centroid ints}. Init: per subspace, the k
    lowest-vid subvectors (list_id = vid rank − 1 — identical to the
    sequential per-slice ``orderBy(vid).limit(k)`` init). Per
    iteration: one broadcast-join assignment + one wide aggregation
    over (subspace, list_id); one driver collect of m·k rows. Empty
    clusters keep their previous centroid."""
    w = Window.partitionBy("subspace").orderBy("vid")
    init_rows = (
        vecs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .collect()
    )
    books = {
        (int(r["subspace"]), int(r["_rn"]) - 1): [int(v) for v in r["qv"]]
        for r in init_rows
    }
    # iteration-invariant agg Columns built once, via one F.expr per
    # column (same py4j-volume trade as kmeans_train — only the
    # codebook changes per round)
    agg_cols = [
        F.expr(
            f"CAST(round(CAST(sum(qv[{p}]) AS DOUBLE) / count(1))"
            " AS BIGINT)"
        ).alias(f"c{p}")
        for p in range(sub_dim)
    ]
    for _ in range(iters):
        assign = _pq_assign(vecs, books)
        upd = assign.groupBy("subspace", "list_id").agg(
            F.count(F.lit(1)).alias("n"), *agg_cols
        )
        got = {
            (int(r["subspace"]), int(r["list_id"])): [
                int(r[f"c{p}"]) for p in range(sub_dim)
            ]
            for r in upd.collect()
        }
        books = {key: got.get(key, c) for key, c in books.items()}
    return books


def _pq_assign(
    vecs: DataFrame, books: dict[tuple[int, int], list[int]]
) -> DataFrame:
    """All-subspace nearest-centroid assignment in one job: broadcast
    the m·k codebook rows, equi-join on ``subspace`` (k candidates per
    subvector row), exact integer distance, struct-min argmin with the
    (dist, list_id) tie-break and map-side partial aggregation — the
    multi-subspace twin of ``_kmeans_assign_join``."""
    spark = vecs.sparkSession
    cdf = spark.createDataFrame(
        [
            (s, lid, [int(v) for v in c])
            for (s, lid), c in sorted(books.items())
        ],
        "subspace int, list_id int, c array<bigint>",
    )
    dist = F.aggregate(
        F.zip_with(F.col("qv"), F.col("c"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = vecs.join(F.broadcast(cdf), "subspace").select(
        "subspace",
        "vid",
        "qv",
        F.struct(dist.alias("dist"), F.col("list_id").alias("list_id")).alias("_s"),
    )
    return (
        scored.groupBy("subspace", "vid")
        .agg(F.min("_s").alias("_b"), F.first("qv").alias("qv"))
        .select(
            "subspace",
            "vid",
            "qv",
            F.col("_b.list_id").alias("list_id"),
            F.col("_b.dist").alias("dist"),
        )
    )


def pq_adc_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    n_queries: int = 5,
    topk: int = 10,
    m: int = 4,
    k: int = 8,
    iters: int = 2,
    scale: int = 1000,
) -> DataFrame:
    """PQ search via asymmetric distance computation (ADC): the
    billion-vector ANN read path. The corpus lives ONLY as per-
    subspace codes; each query precomputes a tiny lookup table of
    exact integer distances to every codebook centroid, and a
    vector's approximate distance is the sum of m table entries — no
    vector arithmetic per corpus row at query time.

    Queries are the first ``n_queries`` ids (broadcast-sized by
    definition). LUT build is driver-side on k x m x n_queries ints
    (a few hundred values); the per-row work is a broadcast join on
    (subspace, code) + a (query, vector)-keyed integer sum, both
    map-side-partial friendly. All distances are exact bigints over
    the quantized space, so ranks are bit-identical cross-engine.

    Output: ``query_id``, ``neighbor_id``, ``adist``, ``rank``
    (rank over (adist, neighbor_id) — total order).
    """
    dim = len(df.select(F.col(vec_col)).first()[0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub_dim = dim // m
    vecs = _pq_subvectors(df, vec_col, id_col, m, sub_dim, scale).persist()
    try:
        books = _pq_train(vecs, k, iters, sub_dim)
        all_codes = _pq_assign(vecs, books).select(
            F.col("vid").alias("neighbor_id"),
            "subspace",
            F.col("list_id").alias("code"),
        )
        # LUT: one collect of the query subvectors (n_queries x m
        # rows), exact integer distances to every codebook entry
        # computed driver-side — k x m x n_queries ints
        qrows = vecs.filter(F.col("vid") < n_queries).collect()
        lut_rows = [
            (
                int(q["vid"]),
                s,
                lid,
                sum((int(a) - int(b)) ** 2 for a, b in zip(q["qv"], c)),
            )
            for q in qrows
            for (s, lid), c in books.items()
            if s == int(q["subspace"])
        ]
        return _pq_adc_rank(df.sparkSession, all_codes, lut_rows, topk)
    finally:
        vecs.unpersist()


def _pq_adc_rank(spark, all_codes, lut_rows, topk: int) -> DataFrame:
    lut = spark.createDataFrame(
        lut_rows, "query_id long, subspace int, code int, pdist long"
    )
    scored = (
        all_codes.join(F.broadcast(lut), ["subspace", "code"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("pdist").alias("adist"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adist"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("query_id", "neighbor_id", "adist", "rank")
    )


def label_centroid_probe(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    scale: int = 1000,
) -> DataFrame:
    """Nearest-centroid linear probe over a labeled embedding table —
    the standard embedding-quality diagnostic (how linearly separable
    are the classes in this representation?), run entirely in the
    same integer-quantized space as ``kmeans_iterate`` so every
    prediction is bit-identical cross-engine.

    One pass builds per-label centroids (exact bigint component sums,
    one ``round(sum/count)`` double division each — the
    ``kmeans_train`` contract); the class count is tiny, so the
    centroid table collects to the driver and classification is the
    shuffle-free :func:`kmeans_assign` literal-argmin projection
    (ties broken by lowest label). Output: the confusion table
    ``label, pred_label, n`` — per-class accuracy and the global
    probe score derive from it with one aggregation.

    Scale: centroid build is one map-side-partial wide aggregation
    (C x (dim+1) partial rows per partition); classification scans
    the corpus once with zero shuffles; output is <= C² rows.
    """
    labeled = df.select(
        F.col(id_col).alias("vid"), F.col(label_col).alias("label")
    )
    vecs = quantize_vectors(df, vec_col, id_col, scale).localCheckpoint(
        eager=False
    )
    first = df.select(vec_col).first()
    if first is None:
        return df.sparkSession.createDataFrame(
            [], "label INT, pred_label INT, n LONG"
        )
    dim = len(first[0])
    upd = (
        vecs.join(labeled, "vid")
        .groupBy("label")
        .agg(
            *[
                F.round(
                    F.sum(F.col("qv")[p]).cast("double") / F.count(F.lit(1))
                )
                .cast("long")
                .alias(f"c{p}")
                for p in range(dim)
            ]
        )
    )
    cents = sorted(
        (int(r["label"]), [r[f"c{p}"] for p in range(dim)])
        for r in upd.collect()
    )
    assign = kmeans_assign(vecs, cents)
    return (
        assign.join(labeled, "vid")
        .groupBy(
            F.col("label").cast("int").alias("label"),
            F.col("list_id").cast("int").alias("pred_label"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def label_separation_stats(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    scale: int = 1000,
) -> DataFrame:
    """Class cohesion/separation report — the silhouette-lite
    companion of :func:`label_centroid_probe` that stays LINEAR in
    the corpus: per label, the mean squared quantized distance of
    members to their own centroid (cohesion) and the squared
    distance from the centroid to its nearest OTHER centroid
    (separation, computed driver-side over the C x C centroid table).
    A representation separates its classes when cohesion is well
    under separation.

    Output: ``label``, ``n``, ``mean_intra_sq`` (round 6),
    ``nearest_other_label``, ``inter_sq``. Everything is exact
    bigint arithmetic except the one rounded mean division, so the
    report is bit-identical cross-engine. One corpus scan with a
    broadcast centroid join; no pairwise member distances anywhere.
    """
    labeled = df.select(
        F.col(id_col).alias("vid"), F.col(label_col).alias("label")
    )
    vecs = quantize_vectors(df, vec_col, id_col, scale).localCheckpoint(
        eager=False
    )
    first = df.select(vec_col).first()
    if first is None:
        return df.sparkSession.createDataFrame(
            [],
            "label INT, n LONG, mean_intra_sq DOUBLE, "
            "nearest_other_label INT, inter_sq LONG",
        )
    dim = len(first[0])
    upd = (
        vecs.join(labeled, "vid")
        .groupBy("label")
        .agg(
            *[
                F.round(
                    F.sum(F.col("qv")[p]).cast("double") / F.count(F.lit(1))
                )
                .cast("long")
                .alias(f"c{p}")
                for p in range(dim)
            ]
        )
    )
    cents = sorted(
        (int(r["label"]), [r[f"c{p}"] for p in range(dim)])
        for r in upd.collect()
    )
    # separation: exact integer centroid-to-centroid distances over
    # the tiny driver-held table; ties to the lowest other label
    near = {}
    for lab, c in cents:
        best = None
        for lab2, c2 in cents:
            if lab2 == lab:
                continue
            d = sum((a - b) * (a - b) for a, b in zip(c, c2))
            if best is None or d < best[1]:
                best = (lab2, d)
        near[lab] = best  # None when only one class exists
    spark = df.sparkSession
    cent_df = F.broadcast(
        spark.createDataFrame(
            [(lab, c) for lab, c in cents], "label INT, c ARRAY<BIGINT>"
        )
    )
    dist = F.aggregate(
        F.zip_with(F.col("qv"), F.col("c"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    intra = (
        vecs.join(labeled, "vid")
        .join(cent_df, "label")
        .groupBy(F.col("label").cast("int").alias("label"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(dist).cast("double") / F.count(F.lit(1)), 6
            ).alias("mean_intra_sq"),
        )
    )
    near_df = F.broadcast(
        spark.createDataFrame(
            [
                (
                    lab,
                    near[lab][0] if near[lab] else None,
                    near[lab][1] if near[lab] else None,
                )
                for lab, _ in cents
            ],
            "label INT, nearest_other_label INT, inter_sq LONG",
        )
    )
    return intra.join(near_df, "label")


def knn_label_probe(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    k: int = 5,
    n_queries: int = 50,
    scale: int = 1000,
) -> DataFrame:
    """Leave-one-out k-NN label probe — the non-parametric companion
    of :func:`label_centroid_probe` (k-NN accuracy is the standard
    second axis of embedding-quality evals: it sees local structure
    the linear probe cannot). Evaluated over the ``n_queries``
    lowest-id vectors against the FULL corpus, so cost is
    O(n_queries · n) with a broadcast query table — never the n²
    all-pairs eval.

    Fully deterministic: exact integer squared distances in the
    quantized space, neighbor ties to the lowest id, majority vote
    with ties to the lowest label. Output per true label:
    ``label, n_eval, n_correct, accuracy`` (round 6).
    """
    labeled = df.select(
        F.col(id_col).alias("vid"), F.col(label_col).alias("label")
    )
    vecs = quantize_vectors(df, vec_col, id_col, scale).localCheckpoint(
        eager=False
    )
    q = (
        vecs.orderBy("vid")
        .limit(n_queries)
        .join(labeled, "vid")
        .select(
            F.col("vid").alias("query_id"),
            F.col("qv").alias("q_qv"),
            F.col("label").alias("true_label"),
        )
    )
    dist = F.aggregate(
        F.zip_with(F.col("qv"), F.col("q_qv"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = (
        vecs.join(F.broadcast(q))
        .filter(F.col("vid") != F.col("query_id"))
        .select(
            "query_id",
            "true_label",
            F.col("vid").alias("nid"),
            dist.alias("dist"),
        )
    )
    w = Window.partitionBy("query_id").orderBy("dist", "nid")
    top = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .join(labeled.select(F.col("vid").alias("nid"), F.col("label").alias("n_label")), "nid")
    )
    votes = top.groupBy("query_id", "true_label", "n_label").agg(
        F.count(F.lit(1)).alias("c")
    )
    wv = Window.partitionBy("query_id").orderBy(
        F.col("c").desc(), F.col("n_label").asc()
    )
    pred = (
        votes.withColumn("rn", F.row_number().over(wv))
        .filter(F.col("rn") == 1)
        .select("query_id", "true_label", F.col("n_label").alias("pred_label"))
    )
    return (
        pred.groupBy(F.col("true_label").cast("int").alias("label"))
        .agg(
            F.count(F.lit(1)).alias("n_eval"),
            F.sum(
                F.when(F.col("pred_label") == F.col("true_label"), 1).otherwise(0)
            ).cast("long").alias("n_correct"),
        )
        .select(
            "label",
            "n_eval",
            "n_correct",
            F.round(F.col("n_correct") / F.col("n_eval"), 6).alias("accuracy"),
        )
    )


def _round_div(p: int, q: int) -> int:
    """Exact half-away-from-zero integer division (q > 0) — the pure-
    integer twin of round(p/q) that both engines reproduce bit-for-bit
    without touching floats."""
    return (2 * p + q) // (2 * q) if p >= 0 else -((-2 * p + q) // (2 * q))


def power_iteration_top_pc(
    vecs: DataFrame, dim: int = 64, iters: int = 6, scale: int = 1000
) -> DataFrame:
    """Top principal direction of the (uncentered) second-moment
    matrix ``S = Xq'Xq`` by power iteration — the dimensionality-
    reduction primitive (top PCA axis, embedding-drift tracking,
    spectral initialization) over a quantized ``(vid, qv)`` vector
    table, matrix-free: ``S`` (dim x dim) is NEVER materialized.

    Deterministic to the bit on any engine because every round is
    EXACT integer arithmetic: ``w = Xq'(Xq v)`` via one scan (per-row
    long dot product + one wide dim-column sum aggregation with
    map-side partials), then L-infinity normalization
    ``v <- round(scale * w / max|w|)`` using half-away integer
    division — no float sum, sqrt, or division anywhere (an L2 norm
    would need a float sqrt whose last bit could differ across
    engines; any norm works for power iteration, so the integer-exact
    one wins). The final sign is canonicalized so the first nonzero
    loading is positive.

    Output: ``(dim, loading)`` — ``iters``-round loadings at
    ``scale`` (v ~ unit under L-inf). Driver state per round is one
    dim-long integer vector (the ``kmeans_train`` contract); each
    round is ONE job over the fact table, so the 100 TB cost is
    ``iters`` scans of an (id, vector) projection.
    """
    import math

    v = [scale // math.isqrt(dim)] * dim
    frozen = vecs.localCheckpoint(eager=False)
    # iteration-invariant agg Columns built once (the per-iteration
    # vector enters through the projected "score" column, so only the
    # vlit literal changes per round — same py4j-volume trade as
    # kmeans_train)
    agg_cols = [
        F.sum(F.col("qv")[p] * F.col("score")).alias(f"w{p}")
        for p in range(dim)
    ]
    for _ in range(iters):
        # one array literal, not dim F.lit Columns (same py4j/analysis
        # trade as kmeans_assign's nested-literal centroid table)
        vlit = F.lit([int(c) for c in v]).cast("array<bigint>")
        score = F.aggregate(
            F.zip_with(F.col("qv"), vlit, lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        row = (
            frozen.select(F.col("qv"), score.alias("score"))
            .agg(*agg_cols)
            .collect()[0]
        )
        w = [int(row[f"w{p}"] or 0) for p in range(dim)]
        m = max(abs(x) for x in w)
        if m == 0:  # all-zero input: zero vector is the sentinel
            v = [0] * dim
            break
        v = [_round_div(scale * x, m) for x in w]
    for x in v:
        if x != 0:
            if x < 0:
                v = [-y for y in v]
            break
    spark = vecs.sparkSession
    return spark.createDataFrame(
        [(i, int(c)) for i, c in enumerate(v)], "dim INT, loading LONG"
    )


def ivf_pq_topk(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_queries: int = 5,
    topk: int = 10,
    n_lists: int = 4,
    n_probe: int = 2,
    coarse_iters: int = 2,
    m: int = 4,
    k: int = 8,
    pq_iters: int = 2,
    scale: int = 1000,
    rerank_k: int | None = None,
) -> DataFrame:
    """IVF-PQ: the production billion-vector ANN index (FAISS's
    ``IndexIVFPQ``), composing the engine's coarse quantizer (L12/L28)
    with residual product quantization (L43) and ADC search (L44) into
    the real read path: a query touches only ``n_probe / n_lists`` of
    the corpus, and the touched rows are m small codes each — never a
    stored vector.

    Build (all in the integer-quantized space, so every stage is
    bit-identical cross-engine):

    1. coarse codebook: ``kmeans_train`` over the full quantized
       vectors (``n_lists`` centroids, driver-held);
    2. coarse assignment: one broadcast argmin scan — each vector's
       inverted list;
    3. RESIDUAL encoding: ``r = qv - coarse_centroid`` (exact bigint
       — this is what separates IVF-PQ from flat PQ: residuals have
       ~1/n_lists the variance, so the same k buys finer cells);
    4. per-subspace PQ codebooks over the residual slices via the
       fused ``_pq_train`` (one broadcast join + one agg per Lloyd
       round for all m subspaces).

    Search: each query ranks the coarse centroids driver-side and
    probes its ``n_probe`` nearest lists; per (query, probed list)
    the query residual yields an m x k integer LUT (n_queries x
    n_probe x m x k rows — a few hundred ints, broadcast). ADC is
    then ONE broadcast equi-join of the code table against the LUT on
    (coarse list, subspace, code) — corpus rows in unprobed lists
    drop out of the join — plus one (query, neighbor)-keyed bigint
    sum with map-side partials and a per-query top-k window over
    (adist, neighbor_id). No vector arithmetic per corpus row at
    query time; 100 TB state is codes + one bigint list id per
    vector (~m bytes/vector at k<=256).

    With ``rerank_k`` set, the FAISS refine step runs after ADC: the
    ADC ranking keeps the top ``rerank_k`` CANDIDATES per query (so
    pick ``rerank_k`` ≈ 4·topk), those candidate ids equi-join back
    to the stored quantized vectors — a join whose left side is
    ``n_queries · rerank_k`` rows, never the corpus — and the final
    top-k is by EXACT integer squared L2 distance. This trades one
    bounded join + ``rerank_k`` exact distance evaluations per query
    for the PQ approximation error on the final ranking — the
    standard production accuracy knob (ADC recall is bounded by code
    granularity; refine recovers it at the same probe cost). Output
    then ranks on ``edist`` instead of ``adist``.

    Output: ``query_id``, ``neighbor_id``, ``adist``, ``rank`` — or
    ``query_id``, ``neighbor_id``, ``edist``, ``rank`` when
    reranking.
    """
    dim = len(df.select(F.col(vec_col)).first()[0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub_dim = dim // m
    spark = df.sparkSession
    vecs = quantize_vectors(df, vec_col, id_col, scale).persist()
    try:
        coarse = kmeans_train(vecs, n_lists, coarse_iters)
        cdf = spark.createDataFrame(
            [(int(lid), [int(v) for v in c]) for lid, c in coarse],
            "clist int, c array<bigint>",
        )
        # residual table: (vid, clist, rv) — one broadcast join; rv
        # stays exact bigint so the PQ stage below shares kmeans'
        # cross-engine determinism contract
        cassign = kmeans_assign(vecs, coarse).withColumnRenamed(
            "list_id", "clist"
        )
        # res feeds BOTH the PQ subvector explode and the clist lookup
        # below: without materialization the coarse assignment scan
        # recomputes per consumer (the ReusedExchange defeat the
        # verify notes warn about)
        res = (
            cassign.join(F.broadcast(cdf), "clist")
            .select(
                "vid",
                "clist",
                F.zip_with("qv", "c", lambda a, b: a - b).alias("rv"),
            )
            .localCheckpoint(eager=False)
        )
        subs = F.array(
            *[
                F.struct(
                    F.lit(j).cast("int").alias("subspace"),
                    F.slice(F.col("rv"), j * sub_dim + 1, sub_dim).alias("qv"),
                )
                for j in range(m)
            ]
        )
        rvecs = res.select("vid", F.inline(subs)).persist()
        clists = res.select("vid", "clist")
        try:
            books = _pq_train(rvecs, k, pq_iters, sub_dim)
            codes = _pq_assign(rvecs, books).select(
                "vid", "subspace", F.col("list_id").alias("code")
            )
            # ---- query side: probe + LUT, all driver-side on
            # n_queries quantized vectors + the tiny codebooks ----
            qrows = sorted(
                (int(r["vid"]), [int(x) for x in r["qv"]])
                for r in vecs.filter(F.col("vid") < n_queries).collect()
            )
            lut_rows = []
            for qid, qv in qrows:
                ranked = sorted(
                    (
                        sum((a - b) ** 2 for a, b in zip(qv, c)),
                        lid,
                        c,
                    )
                    for lid, c in coarse
                )
                for _, clist, cc in ranked[:n_probe]:
                    rq = [a - b for a, b in zip(qv, cc)]
                    for (s, code), pc in books.items():
                        sl = rq[s * sub_dim : (s + 1) * sub_dim]
                        pdist = sum(
                            (a - b) ** 2 for a, b in zip(sl, pc)
                        )
                        lut_rows.append((qid, clist, s, code, pdist))
            lut = spark.createDataFrame(
                lut_rows,
                "query_id long, clist int, subspace int, code int,"
                " pdist long",
            )
            scored = (
                codes.join(clists, "vid")
                .join(F.broadcast(lut), ["clist", "subspace", "code"])
                .groupBy("query_id", F.col("vid").alias("neighbor_id"))
                .agg(F.sum("pdist").alias("adist"))
            )
            w = Window.partitionBy("query_id").orderBy(
                F.asc("adist"), F.asc("neighbor_id")
            )
            if rerank_k is None:
                out = (
                    scored.withColumn("rank", F.row_number().over(w))
                    .filter(F.col("rank") <= topk)
                    .select("query_id", "neighbor_id", "adist", "rank")
                )
            else:
                # refine: ADC keeps rerank_k candidates; exact integer
                # L2 against the stored quantized vectors decides the
                # final top-k. The join's left side is n_queries x
                # rerank_k rows — corpus-sized state is touched only
                # via the id equi-join (at 100 TB: a point-lookup-
                # shaped join against the vector store, not a scan).
                cands = (
                    scored.withColumn("arank", F.row_number().over(w))
                    .filter(F.col("arank") <= rerank_k)
                    .select("query_id", "neighbor_id")
                )
                qdf = spark.createDataFrame(
                    qrows, "query_id long, qqv array<bigint>"
                )
                exact = (
                    cands.join(
                        vecs.withColumnRenamed("vid", "neighbor_id"),
                        "neighbor_id",
                    )
                    .join(F.broadcast(qdf), "query_id")
                    .select(
                        "query_id",
                        "neighbor_id",
                        F.aggregate(
                            F.zip_with(
                                "qv", "qqv", lambda a, b: (a - b) * (a - b)
                            ),
                            F.lit(0).cast("long"),
                            lambda acc, x: acc + x,
                        ).alias("edist"),
                    )
                )
                we = Window.partitionBy("query_id").orderBy(
                    F.asc("edist"), F.asc("neighbor_id")
                )
                out = (
                    exact.withColumn("rank", F.row_number().over(we))
                    .filter(F.col("rank") <= topk)
                    .select("query_id", "neighbor_id", "edist", "rank")
                )
            out = out.localCheckpoint(eager=True)
            return out
        finally:
            rvecs.unpersist()
    finally:
        vecs.unpersist()


def _rademacher_sign(j: int, i: int) -> int:
    """±1 sign for projection row ``j``, input dim ``i`` — md5 parity,
    so any engine regenerates the exact matrix (the LSH-plane /
    affine-params recipe)."""
    import hashlib

    h = int(hashlib.md5(f"rp:{j}:{i}".encode()).hexdigest()[:8], 16)
    return 1 if h % 2 == 0 else -1


def random_project(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    out_dim: int = 16,
    in_dim: int = 64,
    scale: int = 1000,
) -> DataFrame:
    """Johnson-Lindenstrauss random projection with a Rademacher (±1)
    matrix (Achlioptas 2003: database-friendly random projections) —
    the dimensionality cut applied BEFORE ANN/clustering at 100 TB
    (1536-d embeddings → 256-d at 6x less memory/bandwidth, distances
    preserved within 1±ε w.h.p.).

    The sign matrix is md5-derived (deterministic, regenerable on any
    engine) and the input is integer-quantized, so every projected
    component is an EXACT bigint sum — the projection is
    bit-reproducible, unlike a gaussian-matrix projection whose float
    accumulation drifts. Unnormalized (true JL divides by
    ``sqrt(out_dim)``): every downstream distance comparison is
    scale-invariant, and keeping integers beats keeping the constant.

    A stateless per-row projection — zero shuffles; ``out_dim``
    zip_with dot products inside whole-stage codegen.

    Output: ``vec_id``, ``dim``, ``val`` (exploded scalar rows).
    """
    qv = F.transform(
        F.col(vec_col), lambda x: F.round(x.cast("double") * scale).cast("long")
    )
    outs = F.array(
        *[
            F.struct(
                F.lit(j).alias("dim"),
                F.aggregate(
                    F.zip_with(
                        F.col("_qv"),
                        F.array(
                            *[
                                F.lit(_rademacher_sign(j, i)).cast("long")
                                for i in range(in_dim)
                            ]
                        ),
                        lambda a, b: a * b,
                    ),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x,
                ).alias("val"),
            )
            for j in range(out_dim)
        ]
    )
    return (
        df.select(F.col(id_col).alias("vec_id"), qv.alias("_qv"))
        .select("vec_id", F.inline(outs))
    )


def jl_distortion_eval(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    n_queries: int = 10,
    out_dim: int = 16,
    in_dim: int = 64,
    scale: int = 1000,
) -> DataFrame:
    """Distance-preservation readout for :func:`random_project`: all
    pairs among the ``n_queries`` lowest-id vectors, exact squared
    distance in the original quantized space vs the projected space,
    and the normalized ratio ``d_out² / (out_dim · d_in²)`` whose
    expectation is exactly 1 for a Rademacher projection — the
    acceptance gate before swapping full vectors for projections in
    an ANN/clustering pipeline. Pair work is n_queries², never
    corpus-quadratic; the projection side reuses the corpus operator
    and Catalyst pushes the id filter into the scan.

    Output: ``id_a``, ``id_b``, ``d_in2``, ``d_out2``,
    ``norm_ratio`` (6 dp).
    """
    sub = df.filter(F.col(id_col) < n_queries)
    # both distance tables share one shape: component rows equi-joined
    # on the position key, filtered to ordered pairs, summed — a hash
    # join either way (no theta/nested-loop pair join)
    comp = quantize_vectors(sub, vec_col, id_col, scale).select(
        "vid", F.posexplode("qv").alias("i", "q")
    )
    din = (
        comp.select(F.col("vid").alias("id_a"), "i", F.col("q").alias("qa"))
        .join(
            comp.select(
                F.col("vid").alias("id_b"), "i", F.col("q").alias("qb")
            ),
            "i",
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.sum(
                (F.col("qa") - F.col("qb")) * (F.col("qa") - F.col("qb"))
            ).alias("d_in2")
        )
    )
    proj = random_project(sub, vec_col, id_col, out_dim, in_dim, scale)
    dout = (
        proj.select(F.col("vec_id").alias("id_a"), "dim", F.col("val").alias("va"))
        .join(
            proj.select(
                F.col("vec_id").alias("id_b"), "dim", F.col("val").alias("vb")
            ),
            "dim",
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.sum(
                (F.col("va") - F.col("vb")) * (F.col("va") - F.col("vb"))
            ).alias("d_out2")
        )
    )
    return din.join(dout, ["id_a", "id_b"]).select(
        "id_a",
        "id_b",
        "d_in2",
        "d_out2",
        F.round(
            F.col("d_out2").cast("double")
            / (F.lit(out_dim) * F.col("d_in2")),
            6,
        ).alias("norm_ratio"),
    )


def hard_negative_topk(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    k: int = 3,
    n_queries: int = 5,
    scale: int = 1000,
) -> DataFrame:
    """Hard-negative mining for contrastive training (the
    triplet/InfoNCE data-prep step: the most useful negatives are the
    nearest vectors with a DIFFERENT label — random negatives are too
    easy and teach nothing): for each of the ``n_queries`` lowest-id
    query vectors, the ``k`` nearest corpus vectors whose label
    differs from the query's.

    Shape: the label filter composes INTO the broadcast-query scan —
    one corpus pass scoring only (query, candidate) pairs that
    survive ``label != true_label``, then the per-query top-k window
    (``TakeOrderedAndProject``-style cut). Cost O(n_queries · n),
    never all-pairs; exact integer squared distances in the quantized
    space with (dist, id) ties — bit-identical cross-engine.

    Output: ``query_id``, ``query_label``, ``neighbor_id``,
    ``neighbor_label``, ``dist``, ``rank``.
    """
    labeled = df.select(
        F.col(id_col).alias("vid"), F.col(label_col).alias("label")
    )
    vecs = quantize_vectors(df, vec_col, id_col, scale).localCheckpoint(
        eager=False
    )
    # id-threshold query selection (vid < n_queries) for consistency
    # with ivf_pq_topk and the registered oracle's `vec_id < N`
    # predicate — an orderBy().limit() lowest-n cut only agrees when
    # ids are contiguous from 0 and silently diverges on gapped or
    # non-zero-based fixtures.
    q = (
        vecs.filter(F.col("vid") < n_queries)
        .join(labeled, "vid")
        .select(
            F.col("vid").alias("query_id"),
            F.col("qv").alias("q_qv"),
            F.col("label").alias("query_label"),
        )
    )
    dist = F.aggregate(
        F.zip_with(F.col("qv"), F.col("q_qv"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = (
        vecs.join(labeled, "vid")
        .join(F.broadcast(q))
        .filter(F.col("label") != F.col("query_label"))
        .select(
            "query_id",
            "query_label",
            F.col("vid").alias("neighbor_id"),
            F.col("label").alias("neighbor_label"),
            dist.alias("dist"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("dist"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "query_label",
            "neighbor_id",
            "neighbor_label",
            "dist",
            "rank",
        )
    )


def pair_alignment(
    pairs: DataFrame,
    img_col: str,
    txt_col: str,
    id_col: str,
    threshold: float = 0.28,
    negatives: DataFrame | None = None,
    neg_vec_col: str = "embedding",
) -> DataFrame:
    """CLIP-score style image-text ALIGNMENT filter (r12 VERDICT #5 —
    the LAION curation stage): per pair, the cosine between the image
    embedding and its caption embedding, kept when it clears the
    threshold (LAION-400M used 0.28 on CLIP ViT-B/32 scores).

    With ``negatives`` (a BOUNDED sampled caption table — at 100 TB a
    ~1e-2.. 1e-4 sample, broadcast), each pair also gets the in-batch
    contrastive readout used to calibrate the threshold: ``n_harder``
    = how many negative captions score strictly higher with this
    image than its own caption (on the shared 6-dp rounding, so the
    count is engine-exact), ``top1`` = the pair wins its retrieval
    round. Scale shape: ONE scan over the pair table; the negative
    sweep is a broadcast nested loop over K sampled rows with a
    map-side-combinable id-keyed count — no corpus self-join, no
    shuffle beyond the K-fanout aggregation.

    Output: ``id``, ``align_score`` (6 dp), ``keep``, and with
    negatives ``n_harder``, ``top1``.
    """
    img = F.col(img_col).cast("array<double>")
    txt = F.col(txt_col).cast("array<double>")
    score = F.round(_dot(img, txt) / (_norm(img) * _norm(txt)), 6)
    scored = pairs.select(
        F.col(id_col).alias("id"),
        img.alias("_img"),
        score.alias("align_score"),
    ).withColumn("keep", F.col("align_score") >= threshold)
    if negatives is None:
        return scored.select("id", "align_score", "keep")
    neg = negatives.select(
        F.col(neg_vec_col).cast("array<double>").alias("_neg")
    )
    nscore = F.round(
        _dot(F.col("_img"), F.col("_neg"))
        / (_norm(F.col("_img")) * _norm(F.col("_neg"))),
        6,
    )
    harder = (
        scored.join(F.broadcast(neg))
        .select(
            "id", (nscore > F.col("align_score")).cast("long").alias("_h")
        )
        .groupBy("id")
        .agg(F.sum("_h").alias("n_harder"))
    )
    return (
        scored.join(harder, "id", "left")
        .select(
            "id",
            "align_score",
            "keep",
            F.coalesce("n_harder", F.lit(0)).alias("n_harder"),
        )
        .withColumn("top1", F.col("n_harder") == 0)
    )


def matryoshka_recall(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dims: tuple[int, ...] = (8, 16, 32, 64),
    k: int = 10,
) -> DataFrame:
    """Matryoshka (MRL) truncation evaluation: recall@k of exact
    cosine search over PREFIX-truncated embeddings vs the full-dim
    ground truth, per truncation dim — the readout behind "can we
    serve the first 16 components and re-rank?" storage/latency
    trades (Kusupati et al., 2022). Each dim is one broadcast-query
    exact scan (the ``brute_force_topk`` shape); at 100 TB this runs
    on an eval SAMPLE, never the full corpus — the operator exists to
    calibrate, the IVF/PQ paths exist to serve.

    Output: ``dim``, ``query_id``, ``n_hits``, ``recall`` (6 dp).
    """
    vec = F.col(vec_col).cast("array<double>")
    truth = brute_force_topk(corpus, queries, vec_col, id_col, k=k).select(
        "query_id", "neighbor_id"
    ).localCheckpoint(eager=False)
    parts = []
    for d in dims:
        c_d = corpus.select(F.col(id_col), F.slice(vec, 1, d).alias("_v"))
        q_d = queries.select(F.col(id_col), F.slice(vec, 1, d).alias("_v"))
        approx = brute_force_topk(c_d, q_d, "_v", id_col, k=k).select(
            "query_id", "neighbor_id", F.lit(1).alias("_hit")
        )
        parts.append(
            truth.join(approx, ["query_id", "neighbor_id"], "left")
            .groupBy("query_id")
            .agg(F.count("_hit").alias("n_hits"))
            .select(
                F.lit(d).alias("dim"),
                "query_id",
                "n_hits",
                F.round(F.col("n_hits") / k, 6).alias("recall"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _sign_words(vec_col, dim: int) -> tuple[Column, Column]:
    """Pack an array<double>'s sign bits into two 32-bit halves
    (lo = components 1..32, hi = 33..64, MSB-first fold ``acc·2 +
    bit`` — two words instead of one keeps every weight ≤ 2³¹, so
    ANSI-mode long arithmetic can never overflow). Exact integers:
    no float ever enters the packed representation."""
    if dim != 64:
        raise ValueError(f"sign words are fixed at dim=64; got {dim}")

    def word(start: int) -> Column:
        return F.aggregate(
            F.slice(vec_col, start, 32),
            F.lit(0).cast("long"),
            lambda acc, x: acc * 2 + (x >= 0).cast("long"),
        )

    return word(1), word(33)


def binary_hamming_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    rerank: int = 40,
    dim: int = 64,
) -> DataFrame:
    """Binary-quantization ANN — the 1-bit-per-dimension compression
    every 2024-era vector store ships (RaBitQ / "binary quantization"
    in Milvus, Qdrant, pgvector): corpus vectors collapse to their
    SIGN BITS (64 dims → two 32-bit words, a 32× footprint cut), the
    candidate scan ranks by Hamming distance — ``bit_count(xor)``,
    pure integer ALU work instead of 64-float dot products — and the
    top ``rerank`` candidates per query are re-scored with exact
    cosine for the final top-k. For unit-ish vectors the sign pattern
    preserves angular neighborhoods (the same guarantee sign-LSH
    rests on), so a small rerank budget recovers near-exact recall.

    Shape: the corpus-side word packing is scan-fused column algebra;
    queries broadcast (the brute-force asymmetry) so the Hamming scan
    streams map-side — per row it compares TWO LONGS, the actual
    reason binary quantization wins at 100 TB; only the
    ``rerank``-sized candidate set ever touches float vectors again.

    The candidate cut is RADIUS-BOUNDED, not a full-pair window
    (ADVICE r13): pass 1 aggregates the Hamming HISTOGRAM per query —
    map-side combinable into at most ``dim+1`` buckets per query, so
    the shuffle is |Q|·(dim+1) tiny rows — and derives each query's
    smallest radius R whose cumulative count reaches ``rerank``;
    pass 2 re-streams the same map-side scan, keeps only ``hamming ≤
    R`` BEFORE any exchange, and ranks the survivors (~rerank + ties
    at R per query) with the row_number window. The result is
    bit-identical to ranking the full pair set — the radius is exact,
    not approximate — but the windowed shuffle no longer carries
    |corpus|×|queries| rows. The packing scan runs twice; scans are
    the cheap leg, the shuffle was the bottleneck.

    Output: ``query_id``, ``neighbor_id``, ``cos_sim`` (6 dp),
    ``rank`` — the shared ANN result shape, so ``ann_recall`` plugs
    in unchanged.
    """
    v = F.col("_v")
    lo, hi = _sign_words(v, dim)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    ).select("neighbor_id", lo.alias("c_lo"), hi.alias("c_hi"))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    ).select("query_id", lo.alias("q_lo"), hi.alias("q_hi"))
    ham = (
        F.bit_count(F.col("q_lo").bitwiseXOR(F.col("c_lo")))
        + F.bit_count(F.col("q_hi").bitwiseXOR(F.col("c_hi")))
    )
    pairs = (
        c.join(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", ham.alias("hamming"))
    )
    # pass 1: per-query Hamming histogram (≤ dim+1 buckets, map-side
    # partials) → exact radius R = max bucket whose PRECEDING
    # cumulative is < rerank, i.e. the smallest R covering the top
    # rerank; the per-query window spans ≤ dim+1 rows
    w_cum = Window.partitionBy("query_id").orderBy("hamming")
    radius = (
        pairs.groupBy("query_id", "hamming")
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn("_cum", F.sum("_n").over(w_cum))
        .filter(F.col("_cum") - F.col("_n") < rerank)
        .groupBy("query_id")
        .agg(F.max("hamming").alias("_radius"))
    )
    # pass 2: map-side radius filter BEFORE the exchange, then the
    # exact rank over the ~rerank(+ties-at-R) survivors per query
    w_ham = Window.partitionBy("query_id").orderBy(
        F.col("hamming"), F.col("neighbor_id")
    )
    cand = (
        pairs.join(F.broadcast(radius), "query_id")
        .filter(F.col("hamming") <= F.col("_radius"))
        .withColumn("_hrk", F.row_number().over(w_ham))
        .filter(F.col("_hrk") <= rerank)
        .select("query_id", "neighbor_id")
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("q_vec"),
    )
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("c_vec"),
    )
    scored = (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias(
                "cos_sim"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
