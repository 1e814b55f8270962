"""Deterministic sketches for 100 TB-scale approximate analytics.

Spark's built-in ``approx_count_distinct`` is a HyperLogLog++ whose
registers depend on Spark's internal hash — unverifiable against any
other engine. This module rebuilds HLL on the engine's cross-engine
``stable_hash32`` primitive, so every register value — and therefore
the final estimate — is bit-identical in Spark and DuckDB, and the
sketch can be oracle-checked like any exact query.

Scale shape: the register table is ``m`` rows (``2^precision``) built
by one partial-aggregated ``groupBy(bucket).max(rho)`` — the classic
mergeable-sketch dataflow: shards build registers independently,
merge = elementwise max, estimate = one fold over m rows. At 100 TB
the corpus streams through one scan; only ``m`` values ever move.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from isilon_hadoop_tools_spark.functions.hashing import fingerprint64, stable_hash32


def _alpha(m: int) -> float:
    # Flajolet et al. bias-correction constants
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_registers(df: DataFrame, col: Column | str, b: int = 8) -> DataFrame:
    """HLL register table over a column: ``(bucket, rho)`` rows.

    The 32-bit ``stable_hash32`` value splits into ``bucket = h mod m``
    (``m = 2^b``) and the remaining ``w = h div m`` (32-b bits);
    ``rho = (32-b) - floor(log2(w))`` is the 1-based position of w's
    leftmost set bit (``32-b+1`` for w = 0). ``log2`` of an integer
    < 2^53 is exact in IEEE double, so the registers are deterministic
    on any engine. Only non-empty buckets appear (merge semantics:
    absent register == 0).
    """
    m = 1 << b
    h = stable_hash32(F.col(col).cast("string") if isinstance(col, str) else col)
    w = F.floor(h / m)
    rho = F.when(w == 0, F.lit(32 - b + 1)).otherwise(
        (32 - b) - F.floor(F.log2(w))
    )
    return (
        df.select(F.pmod(h, F.lit(m)).alias("bucket"), rho.alias("_rho"))
        .groupBy("bucket")
        .agg(F.max("_rho").cast("long").alias("rho"))
    )


def hll_distinct_estimate(
    df: DataFrame, col: Column | str, b: int = 8
) -> DataFrame:
    """HyperLogLog distinct-count estimate, cross-engine exact.

    One row: ``m``, ``est_distinct`` (rounded to 4), using the
    standard raw estimator ``alpha·m²/Σ2^-M`` with the small-range
    linear-counting correction ``m·ln(m/V₀)`` when E ≤ 2.5·m and empty
    registers exist. Empty registers contribute ``2^0`` to the
    denominator via ``(m - count(nonempty))``.
    """
    regs = hll_registers(df, col, b)
    return hll_estimate_from_registers(regs, b)


def hll_merge(register_tables: list[DataFrame]) -> DataFrame:
    """Merge HLL register tables (elementwise max) — the property
    that makes the sketch usable at 100 TB: shards/days/partitions
    build registers independently and the union merges losslessly
    (max is associative/commutative/idempotent), so the merged
    estimate equals the single-pass estimate over the union of the
    inputs."""
    out = register_tables[0]
    for t in register_tables[1:]:
        out = out.unionByName(t)
    return out.groupBy("bucket").agg(F.max("rho").alias("rho"))


def hll_estimate_from_registers(regs: DataFrame, b: int = 8) -> DataFrame:
    """Estimate from a ``(bucket, rho)`` register table (see
    ``hll_distinct_estimate`` for the formula)."""
    m = 1 << b
    agg = regs.agg(
        F.count(F.lit(1)).alias("v_filled"),
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("s_filled"),
    )
    denom = F.col("s_filled") + (m - F.col("v_filled"))
    raw = F.lit(_alpha(m) * m * m) / denom
    v_empty = F.lit(m) - F.col("v_filled")
    est = F.when(
        (raw <= 2.5 * m) & (v_empty > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v_empty),
    ).otherwise(raw)
    return agg.select(
        F.lit(m).alias("m"), F.round(est, 4).alias("est_distinct")
    )


def kmv_sample(
    df: DataFrame, key: Column | str, k: int = 512
) -> DataFrame:
    """Deterministic bottom-k uniform sample: the ``k`` rows whose
    ``stable_hash32(key)`` is smallest (ties broken by the key) — the
    KMV construction. The hash order is a fixed uniform permutation of
    the rows, so this is a true uniform sample that is (a) the same on
    any engine, (b) MERGEABLE (bottom-k of a union == bottom-k of the
    per-shard bottom-k's), and (c) distributed as per-partition heaps
    + a k-row driver merge (TakeOrderedAndProject), never a full sort.

    This is the engine's verifiable stand-in for KLL/t-digest:
    quantiles of the sample approximate population quantiles with
    O(1/sqrt(k)) error, and unlike those sketches every byte of it is
    oracle-checkable.

    Determinism: rows first tie on ``(hash, key)``; with duplicate
    keys the remaining tie is broken by a fingerprint of the full row
    (json-serialized struct of all columns), so which duplicate rows
    survive the ``limit(k)`` cut is engine- and partition-independent.
    Rows identical in every column are interchangeable, so the sample
    *content* is deterministic even then.
    """
    kc = F.col(key) if isinstance(key, str) else key
    h = stable_hash32(kc.cast("string"))
    row_fp = fingerprint64(F.to_json(F.struct(*[F.col(c) for c in df.columns])))
    return (
        df.withColumn("_h", h)
        .withColumn("_rfp", row_fp)
        .orderBy("_h", kc, "_rfp")
        .limit(k)
        .drop("_h", "_rfp")
    )


def cms_table(
    df: DataFrame, col: Column | str, d: int = 4, w: int = 256, seed_base: int = 101
) -> DataFrame:
    """Count-min sketch table: ``(row_id, bucket, cnt)`` rows for ``d``
    seeded hash rows of width ``w``.

    Counts are integers and the seeded hashes are the cross-engine md5
    family, so the whole sketch is *exactly* reproducible on any
    engine — no fp drift at all. One partial-aggregated shuffle of
    d·w keys max; merge across shards = elementwise sum.
    """
    c = F.col(col).cast("string") if isinstance(col, str) else col.cast("string")
    entries = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("row_id"),
                    F.pmod(stable_hash32(c, seed_base + i), F.lit(w)).alias(
                        "bucket"
                    ),
                )
                for i in range(d)
            ]
        )
    )
    return (
        df.select(entries.alias("e"))
        .select("e.row_id", "e.bucket")
        .groupBy("row_id", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(sketches: list[DataFrame]) -> DataFrame:
    """Merge CMS tables (elementwise sum) — like the HLL register
    merge, this is what lets shards sketch independently at 100 TB:
    counts add exactly, so the merged sketch is IDENTICAL (not just
    approximately equal) to the sketch of the unioned input."""
    out = sketches[0]
    for t in sketches[1:]:
        out = out.unionByName(t)
    return (
        out.groupBy("row_id", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    col: Column | str,
    d: int = 4,
    w: int = 256,
    seed_base: int = 101,
) -> DataFrame:
    """Point-query the CMS: ``est_n = min over rows of cnt[h_i(key)]``
    (the classic overestimate-only bound). ``keys`` rows keep their
    other columns; the sketch side is d·w rows and broadcasts."""
    c = F.col(col).cast("string") if isinstance(col, str) else col.cast("string")
    probes = keys.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row_id"),
                        F.pmod(stable_hash32(c, seed_base + i), F.lit(w)).alias(
                            "bucket"
                        ),
                    )
                    for i in range(d)
                ]
            )
        ).alias("_p"),
    ).select("*", "_p.row_id", "_p.bucket").drop("_p")
    key_cols = [n for n in keys.columns]
    return (
        probes.join(F.broadcast(sketch), ["row_id", "bucket"])
        .groupBy(*key_cols)
        .agg(F.min("cnt").alias("est_n"))
    )


def approx_distinct_certificate(
    df: DataFrame, key: Column | str, col: Column | str, rsd: float = 0.05
) -> DataFrame:
    """Self-certifying gate for Spark's engine-internal HLL++
    (``approx_count_distinct``): computes the estimate AND the exact
    distinct count per group in one aggregation and states whether the
    estimate landed within 4·rsd·n + 1 of truth (HLL++ standard error
    is rsd·n; 4 sigma + 1 makes the certificate deterministic-stable).
    The oracle asserts TRUE per group — the same contract-not-value
    pattern as ``grouped_quantiles_approx``: DuckDB has no HLL++ twin
    to value-match, but the error bound IS the operator's contract.

    The deterministic md5-register HLL (`hll_registers`) remains the
    cross-engine-exact sketch; this certifies the built-in one a
    Spark-only deployment would reach for first.
    """
    kc = F.col(key) if isinstance(key, str) else key
    cc = F.col(col) if isinstance(col, str) else col
    agg = df.groupBy(kc).agg(
        F.approx_count_distinct(cc, rsd).alias("_a"),
        F.count_distinct(cc).alias("n_exact"),
    )
    tol = F.lit(4.0 * rsd) * F.col("n_exact") + F.lit(1.0)
    return agg.select(
        key if isinstance(key, str) else kc,
        "n_exact",
        (F.abs(F.col("_a") - F.col("n_exact")) <= tol).alias("within_bound"),
    )


def _mg_compress(counts: dict, k: int) -> dict:
    """One Misra-Gries batch decrement: if more than ``k - 1`` counters
    survive, subtract the k-th largest value from all and drop the
    non-positive ones.  Each unit of decrement removes >= k units of
    total mass, so the per-item undercount after any sequence of
    compressions is < n/k — the classic MG guarantee, applied per
    Arrow batch instead of per row so the hot loop stays in numpy.
    """
    if len(counts) < k:
        return counts
    import numpy as np

    vals = np.fromiter(counts.values(), dtype=np.int64, count=len(counts))
    # k-th largest value: everything strictly above it survives
    cut = np.partition(vals, len(vals) - k)[len(vals) - k]
    return {item: c - cut for item, c in counts.items() if c > cut}


def mg_heavy_hitters(
    df: DataFrame, col: Column | str, k: int = 32
) -> DataFrame:
    """Exact heavy hitters (count > n/k) through a bounded-state
    Misra-Gries candidate pass — the deterministic heavy-hitter shape
    for a 100 TB stream where a full ``groupBy(term)`` shuffle of the
    long tail is the cost being avoided.

    Stage 1 streams each partition through a Misra-Gries summary of at
    most ``k - 1`` counters (Arrow batches fold in via ``value_counts``
    — C speed — with the decrement vectorized in :func:`_mg_compress`).
    Any item with partition count > n_p/k survives its partition's
    summary, and an item with global count > n/k must exceed n_p/k in
    at least one partition (pigeonhole), so the union of per-partition
    survivors is a guaranteed superset of the true heavy hitters —
    at most ``(k-1) * num_partitions`` rows ever leave the executors.

    Stage 2 broadcast-semi-joins the candidates back and recounts them
    exactly, filtering ``cnt * k > n``: the output is therefore
    *exactly* the true heavy-hitter set with exact counts (MG's
    undercounts never surface), which is what makes this oracle-
    checkable as a plain GROUP BY / HAVING.

    Output: ``item``, ``cnt``, ordered semantics-free.
    """
    c = F.col(col) if isinstance(col, str) else col
    items = df.select(c.cast("string").alias("item")).filter(
        F.col("item").isNotNull()
    )

    def gen(batches):
        import pandas as pd

        counts: dict = {}
        for pdf in batches:
            for item, n in pdf["item"].value_counts().items():
                counts[item] = counts.get(item, 0) + int(n)
            counts = _mg_compress(counts, k)
        yield pd.DataFrame({"item": list(counts.keys())})

    candidates = items.mapInPandas(gen, "item string").distinct()
    total = items.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        items.join(F.broadcast(candidates), "item")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * k > F.col("n_total"))
        .select("item", "cnt")
    )


def cms_join_size_estimate(
    df_a: DataFrame,
    col_a: Column | str,
    df_b: DataFrame,
    col_b: Column | str,
    d: int = 4,
    w: int = 256,
    seed_base: int = 101,
) -> DataFrame:
    """Equi-join cardinality estimation from two count-min sketches
    (the AGMS/CMS inner-product estimator, Cormode & Muthukrishnan
    2005): ``est = min over rows d of sum_w a[d][w] * b[d][w]``. The
    estimate NEVER under-counts — every true join pair lands in the
    same bucket of every row, so each row's inner product >= the
    exact size, and the certificate below is a hard guarantee (not
    probabilistic); hash collisions only add (expected extra
    ``(n_a * n_b - exact) / w`` per row, the min over d rows tames
    the tail).

    This is the pre-flight a join planner runs at 100 TB: both
    sketches are d·w integers built in one scan each (mergeable
    across shards — `cms_merge`), so "how big is this join" costs two
    sketch scans instead of executing the join. The exact size is
    also computed (one keyed count-agg per side + a vocabulary-sized
    equi-join of the two count tables — never the row-level join) to
    report the realized error and certify the overestimate
    invariant.

    Output (one row): ``n_a``, ``n_b``, ``exact_pairs``,
    ``est_pairs``, ``overestimate_ok``.
    """
    ca = F.col(col_a).cast("string") if isinstance(col_a, str) else col_a
    cb = F.col(col_b).cast("string") if isinstance(col_b, str) else col_b

    def keyed(df: DataFrame, c) -> DataFrame:
        # ONE fact scan per side: the keyed count table feeds the
        # sketch (bucket count = sum of key counts), the total row
        # count, AND the exact join size — without this the fact is
        # scanned three times (sketch + total + exact)
        return (
            df.select(c.cast("string").alias("k"))
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("kn"))
            .localCheckpoint(eager=False)
        )

    def sketch_of(kt: DataFrame) -> DataFrame:
        entries = F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row_id"),
                        F.pmod(
                            stable_hash32(F.col("k"), seed_base + i),
                            F.lit(w),
                        ).alias("bucket"),
                    )
                    for i in range(d)
                ]
            )
        )
        return (
            kt.select(entries.alias("e"), "kn")
            .select("e.row_id", "e.bucket", "kn")
            .groupBy("row_id", "bucket")
            .agg(F.sum("kn").cast("long").alias("cnt"))
        )

    ka = keyed(df_a, ca)
    kb = keyed(df_b, cb)
    # a hash row with NO shared buckets has inner product 0 — the true
    # minimum — but an inner join simply omits it, so min-over-present
    # rows would overstate (or go NULL when no row shares anything);
    # detect the omission by row count and floor the estimate at 0
    est = (
        sketch_of(ka)
        .withColumnRenamed("cnt", "cnt_a")
        .join(
            sketch_of(kb).withColumnRenamed("cnt", "cnt_b"),
            ["row_id", "bucket"],
        )
        .groupBy("row_id")
        .agg(F.sum(F.col("cnt_a") * F.col("cnt_b")).alias("ip"))
        .agg(
            F.min("ip").alias("_mn"), F.count(F.lit(1)).alias("_nr")
        )
        .select(
            F.when(F.col("_nr") < d, F.lit(0))
            .otherwise(F.col("_mn"))
            .alias("est_pairs")
        )
    )
    exact = ka.withColumnRenamed("kn", "na").join(
        kb.withColumnRenamed("kn", "nb"), "k"
    ).agg(
        F.coalesce(F.sum(F.col("na") * F.col("nb")), F.lit(0)).alias(
            "exact_pairs"
        )
    )
    counts = ka.agg(
        F.coalesce(F.sum("kn"), F.lit(0)).alias("n_a")
    ).crossJoin(kb.agg(F.coalesce(F.sum("kn"), F.lit(0)).alias("n_b")))
    return (
        counts.crossJoin(exact)
        .crossJoin(est)
        .select(
            "n_a",
            "n_b",
            "exact_pairs",
            "est_pairs",
            (F.col("est_pairs") >= F.col("exact_pairs")).alias(
                "overestimate_ok"
            ),
        )
    )


def hll_intersection_estimate(
    df: DataFrame,
    key,
    in_a,
    in_b,
    b: int = 8,
    include_exact: bool = False,
) -> DataFrame:
    """Set-overlap estimation from HLL sketches via
    inclusion-exclusion: ``|A ∩ B| ≈ est(A) + est(B) − est(A ∪ B)``,
    where the union sketch is the REGISTER MAX-MERGE (exact union
    semantics — the property that makes HLL set algebra work; there
    is no intersection-merge, which is why the estimate subtracts).
    The standard audience/cohort-overlap readout when the key sets
    are too large to materialize — at 100 TB each side is m registers.

    The estimate is clamped at 0 (inclusion-exclusion on sketches can
    go slightly negative for tiny overlaps).

    ``include_exact=False`` (the default, the SCALE path): output is
    sketch-only — the whole point of HLL overlap at 100 TB is that
    the distinct key sets are never materialized. Pass
    ``include_exact=True`` as a DIAGNOSTIC to also materialize both
    distinct key sets and their semi-join intersection so the
    realized error is reported alongside — audience-sized work, for
    evaluation runs only.

    ``in_a`` / ``in_b`` are boolean Column predicates selecting each
    set's rows. Output (one row): ``est_a``, ``est_b``,
    ``est_union``, ``est_inter`` — plus ``exact_a``, ``exact_b``,
    ``exact_inter`` when ``include_exact``.
    """
    kc = F.col(key) if isinstance(key, str) else key
    regs_a = hll_registers(df.filter(in_a).select(kc.alias("k")), "k", b)
    regs_b = hll_registers(df.filter(in_b).select(kc.alias("k")), "k", b)
    regs_u = hll_merge([regs_a, regs_b])

    def est_as(regs: DataFrame, name: str) -> DataFrame:
        return hll_estimate_from_registers(regs, b).select(
            F.col("est_distinct").alias(name)
        )

    out = (
        est_as(regs_a, "est_a")
        .crossJoin(est_as(regs_b, "est_b"))
        .crossJoin(est_as(regs_u, "est_union"))
    )
    exact_cols = []
    if include_exact:
        ka = df.filter(in_a).select(kc.alias("k")).distinct()
        kb = df.filter(in_b).select(kc.alias("k")).distinct()
        exact = (
            ka.agg(F.count(F.lit(1)).alias("exact_a"))
            .crossJoin(kb.agg(F.count(F.lit(1)).alias("exact_b")))
            .crossJoin(
                ka.join(kb, "k", "left_semi").agg(
                    F.count(F.lit(1)).alias("exact_inter")
                )
            )
        )
        out = out.crossJoin(exact)
        exact_cols = ["exact_a", "exact_b", "exact_inter"]
    return out.select(
        "est_a",
        "est_b",
        "est_union",
        F.round(
            F.greatest(
                F.col("est_a") + F.col("est_b") - F.col("est_union"),
                F.lit(0.0),
            ),
            4,
        ).alias("est_inter"),
        *exact_cols,
    )
