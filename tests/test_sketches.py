"""HLL sketch tests: estimate accuracy, determinism, merge law."""

from __future__ import annotations

from pyspark.sql import functions as F

from isilon_hadoop_tools_spark.operators.sketches import (
    hll_distinct_estimate,
    hll_registers,
)


def test_hll_estimate_within_tolerance(spark):
    # 5000 distinct values at b=8 (m=256): standard error ~1.04/sqrt(m)
    # ~ 6.5%; assert a loose 3-sigma band
    df = spark.range(5000).select(F.col("id").alias("v"))
    est = hll_distinct_estimate(df, "v", b=8).collect()[0]["est_distinct"]
    assert 0.8 * 5000 <= est <= 1.2 * 5000


def test_hll_duplicates_do_not_move_estimate(spark):
    df = spark.range(2000).select(F.col("id").alias("v"))
    dup = df.unionAll(df).unionAll(df)
    a = hll_distinct_estimate(df, "v", b=8).collect()[0]["est_distinct"]
    b = hll_distinct_estimate(dup, "v", b=8).collect()[0]["est_distinct"]
    assert a == b


def test_hll_register_merge_is_elementwise_max(spark):
    # sketch(A ∪ B) == elementwise-max(sketch(A), sketch(B)) — the
    # property that makes shard-local register builds mergeable
    a = spark.range(0, 1500).select(F.col("id").alias("v"))
    b = spark.range(1000, 2500).select(F.col("id").alias("v"))
    merged = {
        (r["bucket"], r["rho"])
        for r in hll_registers(a.unionAll(b), "v", b=8).collect()
    }
    ra = hll_registers(a, "v", b=8)
    rb = hll_registers(b, "v", b=8)
    combined = {
        (r["bucket"], r["rho"])
        for r in ra.unionAll(rb)
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
        .collect()
    }
    assert merged == combined


def test_cms_overestimates_only_and_is_tight_for_heavy_keys(spark):
    from isilon_hadoop_tools_spark.operators.sketches import (
        cms_estimate,
        cms_table,
    )

    # one heavy key (500x) over light background noise
    heavy = spark.range(500).select(F.lit("heavy").alias("v"))
    light = spark.range(300).select(F.concat(F.lit("u"), F.col("id")).alias("v"))
    df = heavy.unionAll(light)
    sketch = cms_table(df, "v", d=4, w=256)
    keys = df.groupBy("v").agg(F.count(F.lit(1)).alias("exact_n"))
    est = {r["v"]: r for r in cms_estimate(sketch, keys, "v", d=4, w=256).collect()}
    for v, r in est.items():
        assert r["est_n"] >= r["exact_n"]  # CMS never underestimates
    assert est["heavy"]["est_n"] <= 500 + 300  # min over rows keeps it tight


def test_bloom_decontaminate_equals_exact(spark):
    from isilon_hadoop_tools_spark.operators.corpus import (
        decontaminate,
        decontaminate_bloom,
    )
    from pyspark.sql import functions as SF

    rows = [
        (0, "shared phrase here plus eval only words"),
        (3, "shared phrase here inside a training doc"),
        (7, "completely unrelated training text with nothing shared"),
        (10, "another eval document shared phrase here too"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    is_eval = SF.col("id") % 5 == 0
    exact = decontaminate(docs, "text", "doc_id", is_eval, 3)
    bloom = decontaminate_bloom(docs, "text", "doc_id", is_eval, 3)
    assert exact.exceptAll(bloom).count() == 0
    assert bloom.exceptAll(exact).count() == 0
    assert exact.count() > 0


def test_hll_merge_of_shards_equals_single_pass(spark):
    from isilon_hadoop_tools_spark.operators.sketches import (
        hll_distinct_estimate,
        hll_estimate_from_registers,
        hll_merge,
        hll_registers,
    )

    df = spark.range(0, 3000).selectExpr("CAST(id % 700 AS STRING) AS u")
    shards = [
        df.filter((F.col("u").cast("long") % 3) == i) for i in range(3)
    ]
    merged = hll_merge([hll_registers(s, "u") for s in shards])
    est_merged = hll_estimate_from_registers(merged).collect()[0]
    est_direct = hll_distinct_estimate(df, "u").collect()[0]
    assert est_merged.est_distinct == est_direct.est_distinct


def test_kmv_sample_deterministic_and_mergeable(spark):
    from isilon_hadoop_tools_spark.operators.sketches import kmv_sample

    df = spark.range(0, 2000).selectExpr("id", "CAST(id AS DOUBLE) AS v")
    a = sorted(r.id for r in kmv_sample(df, "id", 64).collect())
    b = sorted(r.id for r in kmv_sample(df.repartition(13), "id", 64).collect())
    assert a == b  # partitioning-independent
    # mergeable: bottom-k of shard bottom-k's == global bottom-k
    shards = [df.filter((F.col("id") % 3) == i) for i in range(3)]
    shard_samples = [kmv_sample(s, "id", 64) for s in shards]
    u = shard_samples[0]
    for s in shard_samples[1:]:
        u = u.unionByName(s)
    merged = sorted(r.id for r in kmv_sample(u, "id", 64).collect())
    assert merged == a


def test_cms_merge_of_shards_identical_to_single_pass(spark):
    from isilon_hadoop_tools_spark.operators.sketches import (
        cms_merge,
        cms_table,
    )

    df = spark.range(0, 5000).selectExpr("CAST(id % 300 AS STRING) AS u")
    direct = {
        (r.row_id, r.bucket): r.cnt for r in cms_table(df, "u").collect()
    }
    shards = [df.filter((F.col("u").cast("long") % 4) == i) for i in range(4)]
    merged = {
        (r.row_id, r.bucket): r.cnt
        for r in cms_merge([cms_table(s, "u") for s in shards]).collect()
    }
    assert merged == direct  # exact, not approximate


def test_approx_distinct_certificate_holds(spark):
    from isilon_hadoop_tools_spark.operators.sketches import (
        approx_distinct_certificate,
    )

    rows = [("a", i % 137) for i in range(2000)] + [("b", i) for i in range(50)]
    df = spark.createDataFrame(rows, "k string, u long")
    out = {r.k: r for r in approx_distinct_certificate(df, "k", "u").collect()}
    assert out["a"].n_exact == 137 and out["a"].within_bound
    assert out["b"].n_exact == 50 and out["b"].within_bound


def test_mg_heavy_hitters_exact_on_planted_skew(spark):
    # 3 heavy items among a 500-item tail, spread over 8 partitions;
    # k=20 → threshold n/20. The MG pass must surface exactly the
    # true heavy-hitter set with exact counts.
    from isilon_hadoop_tools_spark.operators.sketches import mg_heavy_hitters

    heavy = [("alpha",)] * 400 + [("beta",)] * 300 + [("gamma",)] * 200
    tail = [(f"t{i}",) for i in range(500)]
    df = spark.createDataFrame(heavy + tail, ["item"]).repartition(8)
    got = {
        (r["item"], r["cnt"]) for r in mg_heavy_hitters(df, "item", k=20).collect()
    }
    n = len(heavy) + len(tail)  # 1400, threshold 70
    truth = {("alpha", 400), ("beta", 300), ("gamma", 200)}
    assert all(c * 20 > n for _, c in truth)
    assert got == truth


def test_mg_compress_bounds_state_and_preserves_heavy(spark):
    from isilon_hadoop_tools_spark.operators.sketches import _mg_compress

    counts = {f"t{i}": 1 for i in range(1000)}
    counts["heavy"] = 500
    out = _mg_compress(dict(counts), k=10)
    assert len(out) < 10
    # heavy item's undercount is bounded by the decrement applied
    assert out["heavy"] == 500 - 1


def test_cms_join_size_hard_overestimate_and_exact_on_skew(spark):
    """Planted skew: key 1 appears 50x30 across the sides, so exact =
    1500 + singles; the CMS estimate must never under-count, and with
    few distinct keys (no collisions expected at w=256) it lands
    exactly on the true size."""
    from isilon_hadoop_tools_spark.operators.sketches import (
        cms_join_size_estimate,
    )

    a = spark.createDataFrame(
        [(1,)] * 50 + [(2,)] * 3 + [(7,)], "k long"
    )
    b = spark.createDataFrame(
        [(1,)] * 30 + [(2,)] * 2 + [(9,)] * 4, "k long"
    )
    r = cms_join_size_estimate(a, "k", b, "k").collect()[0]
    exact = 50 * 30 + 3 * 2
    assert (r["n_a"], r["n_b"]) == (54, 36)
    assert r["exact_pairs"] == exact
    assert r["overestimate_ok"]
    assert r["est_pairs"] >= exact
    # 3 distinct keys per side in 256 buckets: no collisions, so the
    # inner product is exact in every row
    assert r["est_pairs"] == exact


def test_cms_join_size_disjoint_keys(spark):
    """Disjoint key sets: exact 0; the estimate stays a (possibly
    zero) overestimate and the certificate holds."""
    from isilon_hadoop_tools_spark.operators.sketches import (
        cms_join_size_estimate,
    )

    a = spark.createDataFrame([(i,) for i in range(10)], "k long")
    b = spark.createDataFrame([(i,) for i in range(100, 110)], "k long")
    r = cms_join_size_estimate(a, "k", b, "k").collect()[0]
    assert r["exact_pairs"] == 0
    assert r["overestimate_ok"]


def test_hll_overlap_identical_and_disjoint_sets(spark):
    """A == B: est_inter == est_a (union adds nothing) and exact
    matches; disjoint sets: exact_inter 0 and the clamped estimate
    stays small (within HLL error of 0)."""
    from pyspark.sql import functions as F

    from isilon_hadoop_tools_spark.operators.sketches import (
        hll_intersection_estimate,
    )

    df = spark.createDataFrame(
        [(i, "a" if i < 200 else "b") for i in range(400)],
        "uid long, tag string",
    )
    # the default is sketch-only: no exact columns materialized
    assert hll_intersection_estimate(
        df, "uid", F.col("tag") == "a", F.col("tag") == "a"
    ).columns == ["est_a", "est_b", "est_union", "est_inter"]
    same = hll_intersection_estimate(
        df, "uid", F.col("tag") == "a", F.col("tag") == "a",
        include_exact=True,
    ).collect()[0]
    assert same["exact_a"] == same["exact_b"] == same["exact_inter"] == 200
    assert same["est_union"] == same["est_a"]
    assert abs(same["est_inter"] - same["est_a"]) < 1e-9
    dis = hll_intersection_estimate(
        df, "uid", F.col("tag") == "a", F.col("tag") == "b",
        include_exact=True,
    ).collect()[0]
    assert dis["exact_inter"] == 0
    assert dis["est_inter"] <= 0.15 * 400  # within sketch error of 0
