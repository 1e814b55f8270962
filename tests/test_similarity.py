"""Similarity-search tests, including the LSH ANN recall floor vs the
exact brute-force baseline (promised by ``suite.ann_lsh_bucketed``).

Runs on the driver's sf0.001 embeddings (500 x 64-dim vectors)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from isilon_hadoop_tools_spark.operators import similarity
from isilon_hadoop_tools_spark.sources import tpch

from conftest import SMOKE_SF_DIR

K = 10
N_QUERIES = 10


@pytest.fixture(scope="module")
def embeddings(spark):
    return tpch.load_table(spark, "embeddings", SMOKE_SF_DIR)


def _topk_sets(rows):
    out = {}
    for r in rows:
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def test_brute_force_exact_shape(spark, embeddings):
    queries = embeddings.filter(F.col("vec_id") < N_QUERIES)
    rows = similarity.brute_force_topk(embeddings, queries, k=K).collect()
    got = _topk_sets(rows)
    assert set(got) == set(range(N_QUERIES))
    assert all(len(v) == K for v in got.values())
    # ranks are 1..K with descending cos_sim
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["cos_sim"]))
    for ranks in by_q.values():
        ranks.sort()
        assert [rk for rk, _ in ranks] == list(range(1, K + 1))
        sims = [s for _, s in ranks]
        assert sims == sorted(sims, reverse=True)


def test_lsh_recall_beats_random(spark, embeddings):
    """LSH top-k must recall a meaningful fraction of the true top-k —
    far above the ~bucket_fraction a random bucketing would get."""
    queries = embeddings.filter(F.col("vec_id") < N_QUERIES)
    exact = _topk_sets(similarity.brute_force_topk(embeddings, queries, k=K).collect())
    approx = _topk_sets(
        similarity.lsh_ann_topk(embeddings, queries, k=K, planes=4).collect()
    )
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    recall = hits / (len(exact) * K)
    # 4 planes -> 16 buckets/table; random assignment would recall
    # ~1/16 per table. The 8-table union measures ~0.67 here; require
    # a floor far above random with headroom for hash jitter.
    assert recall >= 0.5, f"LSH recall {recall:.2f} below floor"


def test_lsh_cos_sims_match_brute_force_for_shared_pairs(spark, embeddings):
    queries = embeddings.filter(F.col("vec_id") < N_QUERIES)
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cos_sim"]
        for r in similarity.brute_force_topk(embeddings, queries, k=K).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"]): r["cos_sim"]
        for r in similarity.lsh_ann_topk(embeddings, queries, k=K, planes=4).collect()
    }
    shared = set(exact) & set(approx)
    assert shared, "no overlap between LSH and brute force at all"
    for pair in shared:
        assert abs(exact[pair] - approx[pair]) < 1e-9


def test_ivf_recall_beats_lsh_floor(spark, embeddings):
    queries = embeddings.filter(F.col("vec_id") < N_QUERIES)
    exact = _topk_sets(similarity.brute_force_topk(embeddings, queries, k=K).collect())
    approx = _topk_sets(
        similarity.ivf_ann_topk(
            embeddings, queries, k=K, n_lists=16, n_probe=4
        ).collect()
    )
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    recall = hits / (len(exact) * K)
    # measures ~0.92 here; generous floor for centroid jitter
    assert recall >= 0.7, f"IVF recall {recall:.2f} below floor"


def test_binary_hamming_recall_and_word_packing(spark, embeddings):
    """Sign-bit Hamming candidates + exact rerank must recall most of
    the true top-k (sign patterns preserve angular neighborhoods);
    cos_sims for shared pairs are bit-identical to brute force (the
    rerank IS exact cosine); and the packed words are the hand
    computation on a tiny vector."""
    queries = embeddings.filter(F.col("vec_id") < N_QUERIES)
    exact = _topk_sets(
        similarity.brute_force_topk(embeddings, queries, k=K).collect()
    )
    def recall(rerank):
        approx = _topk_sets(
            similarity.binary_hamming_topk(
                embeddings, queries, k=K, rerank=rerank
            ).collect()
        )
        hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
        return hits / (len(exact) * K)

    r100 = recall(100)
    # measures ~0.81 here at rerank=100; generous floor
    assert r100 >= 0.6, f"binary recall {r100:.2f} below floor"
    # recall is monotone in the rerank budget (measures 0.52 at 40)
    assert r100 > recall(40)
    # word packing hand-check: alternating signs -> 0b1010... per half
    vec = [1.0 if j % 2 == 0 else -1.0 for j in range(64)]
    df = spark.createDataFrame([(0, vec)], "vec_id LONG, embedding ARRAY<DOUBLE>")
    lo, hi = similarity._sign_words(F.col("embedding"), 64)
    r = df.select(lo.alias("lo"), hi.alias("hi")).collect()[0]
    want = int("10" * 16, 2)
    assert r["lo"] == want and r["hi"] == want
    import pytest as _pytest

    with _pytest.raises(ValueError):
        similarity._sign_words(F.col("embedding"), 32)


def test_binary_hamming_radius_cut_equals_full_window(spark):
    """ADVICE r13: the candidate cut is now radius-bounded (per-query
    Hamming histogram -> exact radius -> map-side filter) instead of
    a full |corpus|x|queries| window shuffle. The radius is EXACT, so
    the result must equal the brute-force (hamming, id) top-rerank —
    including at a tie-heavy boundary where many corpus vectors share
    the radius bucket."""
    import random

    rng = random.Random(5)
    # 8 tight clusters of near-identical sign patterns => huge Hamming
    # ties exactly at the radius
    base = [[rng.choice([-1.0, 1.0]) for _ in range(64)] for _ in range(8)]
    rows = []
    for i in range(240):
        v = list(base[i % 8])
        j = rng.randrange(64)
        v[j] += 0.5 * rng.random() * (1 if v[j] < 0 else -1)
        rows.append((i, [x + 0.01 * rng.random() for x in v]))
    emb = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    queries = emb.filter(F.col("vec_id") < 3)
    got = similarity.binary_hamming_topk(
        emb, queries, k=5, rerank=20
    ).collect()
    # reference: exact top-rerank by (hamming, neighbor_id), then
    # exact cosine top-k — recomputed in pure python
    data = {r["vec_id"]: r["embedding"] for r in emb.collect()}

    def words(v):
        bits = [1 if x > 0 else 0 for x in v]
        return bits

    def hamm(a, b):
        return sum(x != y for x, y in zip(words(a), words(b)))

    import math

    for qid in (0, 1, 2):
        cands = sorted(
            ((hamm(data[qid], v), i) for i, v in data.items() if i != qid)
        )[:20]
        def cos(a, b):
            d = sum(x * y for x, y in zip(a, b))
            return d / (
                math.sqrt(sum(x * x for x in a))
                * math.sqrt(sum(x * x for x in b))
            )
        want = sorted(
            ((round(cos(data[qid], data[i]), 6), -i) for _, i in cands),
            reverse=True,
        )[:5]
        want_ids = [-x[1] for x in want]
        got_ids = [
            r["neighbor_id"]
            for r in sorted(
                (r for r in got if r["query_id"] == qid),
                key=lambda r: r["rank"],
            )
        ]
        assert got_ids == want_ids, f"query {qid}: {got_ids} != {want_ids}"


def test_cosine_near_dup_pairs_finds_scaled_duplicates(spark):
    rows = [
        (i, [float((i * 7 + j) % 13) - 6.0 for j in range(8)]) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    doubled = df.unionByName(
        df.select(
            (F.col("vec_id") + 100).alias("vec_id"),
            F.transform("embedding", lambda x: x * 2.0).alias("embedding"),
        )
    )
    out = {
        (r["id_a"], r["id_b"])
        for r in similarity.cosine_near_dup_pairs(doubled, threshold=0.999).collect()
    }
    # scaling never changes cosine, and sign-hash buckets are
    # scale-invariant -> every (i, i+100) pair must be found
    assert {(i, i + 100) for i in range(20)} <= out


def test_lsh_raises_on_ragged_dims(spark):
    corpus = spark.createDataFrame(
        [(1, [1.0] * 8), (2, [1.0] * 7)], "vec_id LONG, embedding ARRAY<DOUBLE>"
    )
    queries = spark.createDataFrame(
        [(9, [1.0] * 8)], "vec_id LONG, embedding ARRAY<DOUBLE>"
    )
    with pytest.raises(Exception, match="dim"):
        similarity.lsh_ann_topk(corpus, queries, k=2).collect()


def test_quantize_embeddings_roundtrip_error_bounded(spark):
    from isilon_hadoop_tools_spark.operators.similarity import quantize_embeddings

    df = spark.createDataFrame(
        [(1, [1.0, -2.54, 0.5]), (2, [0.0, 0.0, 0.0]), (3, [127.0])],
        "id BIGINT, v ARRAY<FLOAT>",
    )
    out = {r["id"]: r.asDict() for r in quantize_embeddings(df, "v", "id").collect()}
    # zero vector: scale 0, all-zero qvec (no NaN from 0/0)
    assert out[2]["scale"] == 0.0 and out[2]["qvec"] == [0, 0, 0]
    # max |x| maps to ±127 exactly
    assert out[3]["qvec"] == [127]
    assert out[1]["qvec"][1] == -127
    # dequantized values stay within half a quantization step
    for rid in (1, 3):
        scale = out[rid]["scale"]
        orig = {1: [1.0, -2.54, 0.5], 3: [127.0]}[rid]
        for o, q in zip(orig, out[rid]["qvec"]):
            assert abs(o - q * scale) <= scale / 2 + 1e-9


def test_kmeans_converges_to_obvious_clusters(spark):
    from isilon_hadoop_tools_spark.operators.similarity import kmeans_iterate

    # two tight blobs far apart; init takes the two lowest-id vectors
    # (one from each blob), so Lloyd must separate them perfectly
    rows = [(i, [10.0 + (i % 3) * 0.1, 10.0]) for i in range(0, 6)] + [
        (i, [-10.0 - (i % 3) * 0.1, -10.0]) for i in range(10, 16)
    ]
    df = spark.createDataFrame(
        [(i, [float(a), float(b)]) for i, (a, b) in rows],
        "id BIGINT, v ARRAY<FLOAT>",
    )
    out = kmeans_iterate(df, "v", "id", k=2, iters=2).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r["list_id"], set()).add(r["vec_id"])
    assert sorted(len(v) for v in by_cluster.values()) == [6, 6]
    # blob membership is exact: ids < 10 together, ids >= 10 together
    blobs = sorted(by_cluster.values(), key=min)
    assert blobs[0] == set(range(0, 6))
    assert blobs[1] == set(range(10, 16))


def test_kmeans_assign_join_path_matches_literal(spark):
    # the large-k broadcast-join assignment must be row-identical to
    # the literal-baked form, including (dist, list_id) tie-breaks
    import random

    from isilon_hadoop_tools_spark.operators.similarity import kmeans_assign

    rng = random.Random(11)
    vecs = spark.createDataFrame(
        [(i, [rng.randrange(-50, 50) for _ in range(8)]) for i in range(60)],
        "vid BIGINT, qv ARRAY<BIGINT>",
    )
    cents = [(j, [rng.randrange(-50, 50) for _ in range(8)]) for j in range(5)]
    # duplicate centroid forces a distance tie -> lowest list_id wins
    cents.append((5, list(cents[0][1])))
    lit = {
        r["vid"]: (r["list_id"], r["dist"])
        for r in kmeans_assign(vecs, cents).collect()
    }
    joined = {
        r["vid"]: (r["list_id"], r["dist"])
        for r in kmeans_assign(vecs, cents, literal_threshold=0).collect()
    }
    assert lit == joined


def test_kmeans_empty_cluster_keeps_centroid(spark):
    from isilon_hadoop_tools_spark.operators.similarity import kmeans_iterate

    # k=3 over 2 distinct points: one centroid never wins a vector
    # (init = two coincident + one distinct) and must survive with its
    # previous coordinates rather than divide by zero
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [0.0, 0.0]), (3, [5.0, 5.0])],
        "id BIGINT, v ARRAY<FLOAT>",
    )
    out = kmeans_iterate(df, "v", "id", k=3, iters=2).collect()
    assert len(out) == 3  # every vector assigned, no crash


def test_l2_normalize_unit_norm_and_zero_guard(spark):
    import math

    rows = [(0, [3.0, 4.0]), (1, [0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = similarity.l2_normalize(df, "embedding", "vec_id").collect()
    by_vec = {}
    for r in out:
        by_vec.setdefault(r["vec_id"], {})[r["pos"]] = r["nval"]
    assert by_vec[0] == {0: 0.6, 1: 0.8}
    assert math.isclose(sum(v * v for v in by_vec[0].values()), 1.0, rel_tol=1e-9)
    assert by_vec[1] == {0: 0.0, 1: 0.0}


def test_ann_recall_bounds_and_exact_duplicate_hit(spark):
    emb = tpch.load_table(spark, "embeddings", SMOKE_SF_DIR)
    out = similarity.ann_recall(
        emb, emb.filter(F.col("vec_id") < 3), k=5, planes=4
    ).collect()
    assert len(out) == 3
    for r in out:
        assert 0 <= r["n_hits"] <= 5
        assert abs(r["recall"] - r["n_hits"] / 5) < 1e-9
    # multi-table LSH at this scale should recall most of the truth
    assert sum(r["n_hits"] for r in out) >= 10


def test_semantic_dedup_groups_scaled_copies(spark):
    # scaled copies are cosine-identical: they must co-cluster and
    # collapse to one representative; distant vectors keep themselves
    import random

    rng = random.Random(11)
    rows = []
    for i in range(40):
        base = [rng.uniform(-1, 1) for _ in range(16)]
        rows.append((i, base))
        rows.append((1000 + i, [x * 1.25 for x in base]))  # exact semantic dup
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in similarity.semantic_dedup(
        df, k=4, iters=2, threshold=0.95).collect()}
    assert len(out) == 80
    dup_count = 0
    for i in range(40):
        a, b = out[i], out[1000 + i]
        assert a["keep_id"] == b["keep_id"]  # pair collapses to one keeper
        dup_count += int(b["keep_id"] != b["vec_id"])
    assert dup_count == 40  # every scaled copy is flagged a duplicate


def test_pq_codes_shape_and_identical_vectors_share_codes(spark):
    from isilon_hadoop_tools_spark.operators.similarity import pq_encode

    base = [[float(i + j) for j in range(8)] for i in range(12)]
    rows = [(i, v) for i, v in enumerate(base)]
    rows.append((99, base[0]))  # exact copy of vec 0
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = pq_encode(df, "embedding", "vec_id", m=2, k=2, iters=2).collect()
    # one code per (vector, subspace)
    assert len(out) == 13 * 2
    codes = {(r.vec_id, r.subspace): r.code for r in out}
    for s in (0, 1):
        assert codes[(99, s)] == codes[(0, s)]  # identical vecs, same codes


def test_pq_adc_self_is_nearest(spark):
    from isilon_hadoop_tools_spark.operators.similarity import pq_adc_topk

    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(30)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = pq_adc_topk(
        df, "embedding", "vec_id", n_queries=3, topk=5, m=2, k=4, iters=2
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 1, 2}
    for q, rows_q in by_q.items():
        rows_q.sort(key=lambda r: r.rank)
        assert len(rows_q) == 5
        # a query's own codes reconstruct to distance <= anyone else's
        assert rows_q[0].adist <= rows_q[-1].adist
        assert any(r.neighbor_id == q for r in rows_q) or rows_q[0].adist >= 0


def test_label_centroid_probe_separable_and_mislabeled(spark):
    from isilon_hadoop_tools_spark.operators.similarity import (
        label_centroid_probe,
    )

    # two well-separated clusters; id 5 carries cluster-1 coordinates
    # but label 0 — the probe must classify it as 1 (an off-diagonal
    # confusion cell), everything else on the diagonal
    rows = [
        (1, [0.0, 0.0, 0.1], 0),
        (2, [0.1, 0.0, 0.0], 0),
        (3, [5.0, 5.0, 5.0], 1),
        (4, [5.1, 5.0, 4.9], 1),
        (5, [5.0, 5.1, 5.0], 0),  # mislabeled
    ]
    df = spark.createDataFrame(
        rows, "vec_id LONG, embedding ARRAY<FLOAT>, label INT"
    )
    out = {
        (r["label"], r["pred_label"]): r["n"]
        for r in label_centroid_probe(df).collect()
    }
    # centroid of label 0 is dragged toward cluster 1 by the
    # mislabeled point, but ids 1-2 stay closest to it
    assert out[(0, 0)] == 2
    assert out[(0, 1)] == 1  # the mislabeled point crosses over
    assert out[(1, 1)] == 2
    assert (1, 0) not in out


def test_label_centroid_probe_empty_input(spark):
    from isilon_hadoop_tools_spark.operators.similarity import (
        label_centroid_probe,
    )

    df = spark.createDataFrame(
        [], "vec_id LONG, embedding ARRAY<FLOAT>, label INT"
    )
    assert label_centroid_probe(df).count() == 0


def test_label_separation_stats_planted_clusters(spark):
    from isilon_hadoop_tools_spark.operators.similarity import (
        label_separation_stats,
    )

    # tight cluster at origin (label 0), tight cluster at (5,5,5)
    # (label 1), and a looser third at (0,0,20) (label 2)
    rows = [
        (1, [0.0, 0.0, 0.0], 0),
        (2, [0.0, 0.0, 0.002], 0),
        (3, [5.0, 5.0, 5.0], 1),
        (4, [5.0, 5.0, 5.002], 1),
        (5, [0.0, 0.0, 19.0], 2),
        (6, [0.0, 0.0, 21.0], 2),
    ]
    df = spark.createDataFrame(
        rows, "vec_id LONG, embedding ARRAY<FLOAT>, label INT"
    )
    out = {r["label"]: r for r in label_separation_stats(df).collect()}
    assert set(out) == {0, 1, 2}
    for lab in (0, 1, 2):
        assert out[lab]["n"] == 2
        # cohesion far under separation in this fixture
        assert out[lab]["mean_intra_sq"] < out[lab]["inter_sq"]
    # label 2's centroid (0,0,20k): d² to 1's (5k,5k,5k) is
    # 2·25e6 + 14999² ≈ 2.75e8, vs 19999² ≈ 4.0e8 to 0's origin
    assert out[2]["nearest_other_label"] == 1
    # quantized scale=1000: members at z +/- 1000 of the centroid
    assert out[2]["mean_intra_sq"] == 1000.0 * 1000.0


def test_label_separation_single_class_has_null_separation(spark):
    from isilon_hadoop_tools_spark.operators.similarity import (
        label_separation_stats,
    )

    df = spark.createDataFrame(
        [(1, [1.0, 2.0], 7), (2, [1.0, 2.0], 7)],
        "vec_id LONG, embedding ARRAY<FLOAT>, label INT",
    )
    r = label_separation_stats(df).collect()[0]
    assert r["label"] == 7 and r["n"] == 2
    assert r["nearest_other_label"] is None and r["inter_sq"] is None


def test_knn_label_probe_majority_and_ties(spark):
    from isilon_hadoop_tools_spark.operators.similarity import (
        knn_label_probe,
    )

    # query id 1 (label 0) sits between: 3 near neighbors labeled 0,
    # 2 labeled 1 -> majority 0, correct. query id 2 (label 1) has
    # its k=5 split 2/2 between labels 0 and 1 plus one far label 0
    # -> tie at 2 within the top... construct simpler: exact counts.
    rows = [
        (1, [0.0, 0.0], 0),
        (2, [10.0, 0.0], 1),
        # cluster around id 1
        (3, [0.1, 0.0], 0),
        (4, [0.0, 0.1], 0),
        (5, [0.1, 0.1], 0),
        (6, [0.2, 0.0], 1),
        (7, [0.0, 0.2], 1),
        # cluster around id 2
        (8, [10.1, 0.0], 1),
        (9, [10.0, 0.1], 1),
        (10, [10.1, 0.1], 0),
        (11, [10.2, 0.0], 0),
        (12, [9.9, 0.0], 1),
    ]
    df = spark.createDataFrame(
        rows, "vec_id LONG, embedding ARRAY<FLOAT>, label INT"
    )
    out = {
        r["label"]: r
        for r in knn_label_probe(df, k=5, n_queries=2).collect()
    }
    # query 1: neighbors 3,4,5 (label 0) + 6,7 (label 1) -> pred 0
    assert out[0]["n_eval"] == 1 and out[0]["n_correct"] == 1
    assert out[0]["accuracy"] == 1.0
    # query 2: neighbors 8,9,12 (label 1) + 10,11 (label 0) -> pred 1
    assert out[1]["n_eval"] == 1 and out[1]["n_correct"] == 1


def test_power_iteration_recovers_dominant_direction(spark):
    import math

    import numpy as np

    from isilon_hadoop_tools_spark.operators.similarity import (
        power_iteration_top_pc,
        quantize_vectors,
    )

    # planted dominant direction u with small deterministic noise
    rng = np.random.RandomState(7)
    d = 8
    u = np.ones(d) / math.sqrt(d)
    x = np.outer(rng.randn(100) * 5.0, u) + rng.randn(100, d) * 0.1
    rows = [(i, [float(v) for v in x[i]]) for i in range(100)]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")
    out = power_iteration_top_pc(
        quantize_vectors(df, "embedding", "vec_id"), dim=d, iters=8
    ).collect()
    v = np.zeros(d)
    for r in out:
        v[r["dim"]] = r["loading"]
    v = v / np.linalg.norm(v)
    # numpy ground truth: top right-singular vector of the raw matrix
    truth = np.linalg.svd(x, full_matrices=False)[2][0]
    assert abs(float(np.dot(v, truth))) > 0.999
    # canonical sign: first nonzero loading positive
    nz = [r["loading"] for r in sorted(out, key=lambda r: r["dim"]) if r["loading"]]
    assert nz[0] > 0


def test_power_iteration_partitioning_invariant(spark):
    from isilon_hadoop_tools_spark.operators.similarity import (
        power_iteration_top_pc,
        quantize_vectors,
    )

    rows = [(i, [float((i * 7 + j * 3) % 11 - 5) / 10.0 for j in range(4)])
            for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")
    a = power_iteration_top_pc(
        quantize_vectors(df, "embedding", "vec_id"), dim=4, iters=5
    ).collect()
    b = power_iteration_top_pc(
        quantize_vectors(df.repartition(13), "embedding", "vec_id"),
        dim=4, iters=5,
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_multiprobe_recall_dominates_single_probe_same_tables(spark, embeddings):
    """With equal index size (tables=4), Hamming-1 probing must
    strictly widen the candidate set — recall can only go up — and
    should roughly buy back the recall of the 8-table single-probe
    index at half the corpus-side footprint."""
    queries = embeddings.filter(F.col("vec_id") < N_QUERIES)
    exact = _topk_sets(
        similarity.brute_force_topk(embeddings, queries, k=K).collect()
    )

    def recall(rows):
        got = _topk_sets(rows)
        hits = sum(len(exact[q] & got.get(q, set())) for q in exact)
        return hits / (len(exact) * K)

    single = recall(
        similarity.lsh_ann_topk(
            embeddings, queries, k=K, planes=4, tables=4
        ).collect()
    )
    multi = recall(
        similarity.lsh_ann_topk(
            embeddings, queries, k=K, planes=4, tables=4, probes=4
        ).collect()
    )
    assert multi >= single
    assert multi >= 0.5  # the 8-table baseline's floor, at half the index


def test_multiprobe_rejects_probes_beyond_planes(spark, embeddings):
    import pytest as _pytest

    queries = embeddings.filter(F.col("vec_id") < 1)
    with _pytest.raises(ValueError, match="probes"):
        similarity.lsh_ann_topk(
            embeddings, queries, k=1, planes=4, probes=5
        ).collect()


def test_ivf_pq_rank_contract_and_probe_pruning(spark, embeddings):
    """IVF-PQ over the real embeddings: ranks are dense 1..n per
    query, ordered by (adist, neighbor_id), and probing 2 of 4 lists
    prunes — each query's candidate pool is a strict subset of the
    corpus (checked via topk=corpus-size returning fewer rows than
    the corpus for at least one query)."""
    n = embeddings.count()
    out = similarity.ivf_pq_topk(
        embeddings, "embedding", "vec_id",
        n_queries=4, topk=n, n_lists=4, n_probe=2,
        coarse_iters=1, m=4, k=4, pq_iters=1,
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1, 2, 3}
    pruned = 0
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        # own list is always probe #1 (same argmin + tie-break as the
        # assignment), so the query itself is always a candidate
        assert any(r["neighbor_id"] == qid for r in rows)
        assert all(r["adist"] >= 0 for r in rows)
        for a, b in zip(rows, rows[1:]):
            assert (a["adist"], a["neighbor_id"]) < (
                b["adist"], b["neighbor_id"])
        if len(rows) < n:
            pruned += 1
    assert pruned >= 1  # unprobed lists really drop out of the join


def test_ivf_pq_single_list_is_flat_pq_with_self_min(spark):
    """With n_lists == n_probe == 1, IVF-PQ degenerates to flat PQ
    over one shared residual: every corpus row is a candidate and
    each query's own adist is the global minimum (its codes are the
    per-subspace argmin of its own LUT)."""
    rows = [
        (i, [float((i * 7 + j * 3) % 11 - 5) for j in range(8)])
        for i in range(24)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.ivf_pq_topk(
        df, "embedding", "vec_id", n_queries=2, topk=24,
        n_lists=1, n_probe=1, coarse_iters=1, m=2, k=4, pq_iters=1,
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], {})[r["neighbor_id"]] = r["adist"]
    assert set(by_q) == {0, 1}
    for qid, cand in by_q.items():
        # single probed list => the whole corpus is ranked
        assert len(cand) == 24
        assert cand[qid] == min(cand.values())


def test_random_project_exact_hand_vector(spark):
    """One-hot input e_i projects to exactly the i-th sign column
    (times scale); a two-hot input is the sign sum — the projection
    is a pure integer matrix multiply."""
    from isilon_hadoop_tools_spark.operators.similarity import (
        _rademacher_sign,
        random_project,
    )

    dim = 8
    rows = [
        (0, [1.0 if i == 3 else 0.0 for i in range(dim)]),
        (1, [1.0 if i in (2, 5) else 0.0 for i in range(dim)]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r["vec_id"], r["dim"]): r["val"]
        for r in random_project(
            df, "embedding", "vec_id", out_dim=4, in_dim=dim
        ).collect()
    }
    for j in range(4):
        assert got[(0, j)] == 1000 * _rademacher_sign(j, 3)
        assert got[(1, j)] == 1000 * (
            _rademacher_sign(j, 2) + _rademacher_sign(j, 5)
        )


def test_jl_distortion_mean_ratio_near_one(spark, embeddings):
    """Across the 45 query pairs the normalized ratio averages near
    its expectation 1 (Rademacher JL), and every ratio is positive."""
    from isilon_hadoop_tools_spark.operators.similarity import (
        jl_distortion_eval,
    )

    rows = jl_distortion_eval(
        embeddings, "embedding", "vec_id", n_queries=10
    ).collect()
    assert len(rows) == 45
    ratios = [r["norm_ratio"] for r in rows]
    assert all(r > 0 for r in ratios)
    mean = sum(ratios) / len(ratios)
    assert 0.6 < mean < 1.6  # 16 output dims: sd/sqrt(45) ~ 0.05-ish


def test_ivf_pq_rerank_recall_dominates_adc(spark, embeddings):
    """The FAISS refine step: with ADC keeping 4x-topk candidates and
    the final ranking by EXACT integer L2, recall@10 vs the true
    (quantized-space) L2 top-10 must dominate plain ADC recall@10 at
    identical index parameters, every reported edist must equal the
    true integer distance, and ranks stay dense/ordered."""
    qvs = {
        r["vid"]: list(r["qv"])
        for r in similarity.quantize_vectors(
            embeddings, "embedding", "vec_id"
        ).collect()
    }
    nq = 5

    def exact_topk(qid, k=K):
        dists = sorted(
            (sum((a - b) ** 2 for a, b in zip(qvs[qid], v)), vid)
            for vid, v in qvs.items()
        )
        return {vid for _, vid in dists[:k]}

    truth = {q: exact_topk(q) for q in range(nq)}
    params = dict(
        n_queries=nq, topk=K, n_lists=4, n_probe=2,
        coarse_iters=2, m=4, k=8, pq_iters=2,
    )
    adc = similarity.ivf_pq_topk(
        embeddings, "embedding", "vec_id", **params
    ).collect()
    rer = similarity.ivf_pq_topk(
        embeddings, "embedding", "vec_id", rerank_k=4 * K, **params
    ).collect()

    def recall(rows):
        got = _topk_sets(rows)
        return sum(len(truth[q] & got.get(q, set())) for q in truth) / (
            nq * K
        )

    assert recall(rer) >= recall(adc)
    by_q = {}
    for r in rer:
        by_q.setdefault(r["query_id"], []).append(r)
        # reported edist IS the true integer distance
        assert r["edist"] == sum(
            (a - b) ** 2
            for a, b in zip(qvs[r["query_id"]], qvs[r["neighbor_id"]])
        )
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        for a, b in zip(rows, rows[1:]):
            assert (a["edist"], a["neighbor_id"]) < (
                b["edist"], b["neighbor_id"])


def test_hard_negative_topk_label_exclusion_and_hardness(spark):
    """Planted geometry: query 0 (label 0) sits next to same-label
    twins and one near different-label vector — the miner must skip
    every label-0 vector (even at distance 0) and return
    different-label rows in exact distance order."""
    rows = [
        (0, [0.0, 0.0], 0),
        (1, [0.0, 0.0], 0),    # identical but same label: excluded
        (2, [0.001, 0.0], 1),  # nearest hard negative
        (3, [0.002, 0.0], 2),  # second
        (4, [1.0, 1.0], 1),    # far negative
        (5, [0.003, 0.0], 0),  # near but same label: excluded
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = similarity.hard_negative_topk(
        df, "embedding", "vec_id", "label", k=2, n_queries=1
    ).collect()
    assert [(r["neighbor_id"], r["rank"]) for r in out] == [(2, 1), (3, 2)]
    assert all(r["neighbor_label"] != r["query_label"] for r in out)
    assert out[0]["dist"] == 1  # (0.001*1000)^2
    assert out[1]["dist"] == 4

def test_hard_negative_topk_gapped_ids_match_oracle_selection(spark):
    """Query selection is an id THRESHOLD (vid < n_queries), matching
    the registered oracle's `vec_id < N` predicate — on a gapped,
    non-zero-based id fixture an orderBy().limit() lowest-n cut would
    pick ids {7, 9} instead and silently diverge from the oracle."""
    rows = [
        (1, [0.0, 0.0], 0),     # the ONLY id < 2 → the only query
        (7, [0.001, 0.0], 1),   # lowest ids, but NOT queries
        (9, [0.002, 0.0], 2),
        (12, [0.01, 0.0], 1),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = similarity.hard_negative_topk(
        df, "embedding", "vec_id", "label", k=3, n_queries=2
    ).collect()
    assert {r["query_id"] for r in out} == {1}
    assert [(r["neighbor_id"], r["rank"]) for r in out] == [
        (7, 1), (9, 2), (12, 3)
    ]


def test_semantic_dedup_mega_cluster_pair_stage_is_bounded(spark):
    # r12 VERDICT #1: one k-means cell holding 30% of the corpus must
    # NOT cost a within-cluster all-pairs join. Plant the mega cluster
    # directly at the pair stage (list_id pre-assigned) and assert the
    # LSH candidate volume is a fraction of the direct C(n,2) blowup.
    import random

    rng = random.Random(7)
    n_mega, dim = 300, 16
    rows = []
    for i in range(n_mega):
        v = [rng.uniform(-1, 1) for _ in range(dim)]
        rows.append((i, 0, v))  # the mega cluster
    for i in range(700):
        v = [rng.uniform(-1, 1) for _ in range(dim)]
        rows.append((10000 + i, 1 + i % 7, v))  # 7 light clusters
    df = spark.createDataFrame(
        rows, "id long, list_id int, v array<double>"
    ).withColumn("n", F.sqrt(F.aggregate(
        "v", F.lit(0.0), lambda acc, x: acc + x * x)))

    planes = similarity.semantic_pair_planes(n_mega)
    assert planes == 5  # ceil(log2(300/16))
    hsrc = df.filter(F.col("list_id") == 0)
    cand = similarity._heavy_candidates(hsrc, dim, planes, tables=8)
    n_cand = cand.count()
    direct = n_mega * (n_mega - 1) // 2
    # random vectors: per-table collision ~ 2^-planes, union over 8
    # tables; anything at half the direct volume means no bound at all
    assert n_cand < 0.5 * direct, (n_cand, direct)

    # the budgeted pair stage must still find planted near-dups inside
    # the mega cluster: exact-direction copies co-bucket in EVERY table
    planted = spark.createDataFrame(
        [(90000, 0, rows[0][2]), (90001, 0, [x * 1.5 for x in rows[0][2]])],
        "id long, list_id int, v array<double>",
    ).withColumn("n", F.sqrt(F.aggregate(
        "v", F.lit(0.0), lambda acc, x: acc + x * x)))
    clustered = df.unionByName(planted)
    pairs = similarity._within_cluster_pairs(
        clustered, threshold=0.95, max_cluster_rows=150, tables=8
    ).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 90000) in found
    assert (0, 90001) in found
    assert (90000, 90001) in found


def test_semantic_dedup_budget_keeps_scaled_copy_semantics(spark):
    # end-to-end with a budget small enough that every cluster goes
    # through the LSH path: scaled copies still collapse onto base ids
    import random

    rng = random.Random(11)
    rows = []
    for i in range(40):
        base = [rng.uniform(-1, 1) for _ in range(16)]
        rows.append((i, base))
        rows.append((1000 + i, [x * 1.25 for x in base]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in similarity.semantic_dedup(
        df, k=4, iters=2, threshold=0.95, max_cluster_rows=5,
    ).collect()}
    assert len(out) == 80
    for i in range(40):
        assert out[i]["keep_id"] == out[1000 + i]["keep_id"]


def test_pair_alignment_threshold_and_negatives(spark):
    # hand-built pairs: an exactly-aligned pair (cos 1), an orthogonal
    # pair (cos 0), and a negative bank containing one caption that
    # beats the orthogonal pair's own caption
    rows = [
        (1, [1.0, 0.0, 0.0], [1.0, 0.0, 0.0]),   # aligned
        (2, [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]),   # orthogonal
        (3, [0.6, 0.8, 0.0], [0.6, 0.8, 0.0]),   # aligned
    ]
    pairs = spark.createDataFrame(
        rows, "id long, img array<double>, txt array<double>"
    )
    negs = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0]), (101, [0.0, 0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    out = {
        r["id"]: r
        for r in similarity.pair_alignment(
            pairs, "img", "txt", "id", threshold=0.28, negatives=negs
        ).collect()
    }
    assert out[1]["align_score"] == 1.0 and out[1]["keep"]
    assert out[2]["align_score"] == 0.0 and not out[2]["keep"]
    assert out[3]["align_score"] == 1.0 and out[3]["keep"]
    # pair 2's image scores 1.0 against negative 100 (> 0.0): 1 harder
    assert out[2]["n_harder"] == 1 and not out[2]["top1"]
    # aligned pairs at cos 1.0 cannot be beaten strictly
    assert out[1]["n_harder"] == 0 and out[1]["top1"]
    assert out[3]["n_harder"] == 0 and out[3]["top1"]
    # without negatives: 3-column shape
    slim = similarity.pair_alignment(pairs, "img", "txt", "id").columns
    assert slim == ["id", "align_score", "keep"]


def test_matryoshka_recall_full_dim_is_perfect(spark):
    from conftest import SMOKE_SF_DIR
    from isilon_hadoop_tools_spark.sources import tpch

    emb = tpch.load_table(spark, "embeddings", SMOKE_SF_DIR)
    out = similarity.matryoshka_recall(
        emb, emb.filter(F.col("vec_id") < 3), dims=(4, 64), k=5
    ).collect()
    by_dim = {}
    for r in out:
        by_dim.setdefault(r["dim"], []).append(r)
    # full-dim truncation IS the ground truth: recall exactly 1.0
    assert all(r["recall"] == 1.0 for r in by_dim[64])
    # tiny prefix can only do worse or equal
    assert all(r["recall"] <= 1.0 for r in by_dim[4])
    assert len(by_dim[4]) == 3 and len(by_dim[64]) == 3
