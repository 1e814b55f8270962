"""Dedup operator invariants: exact dedup grouping, MinHash signature
properties, and the LSH candidate-generation guarantee (high-Jaccard
pairs land in the candidate set)."""

from __future__ import annotations

from pyspark.sql import functions as F

from isilon_hadoop_tools_spark.operators import dedup

DOCS_SCHEMA = "doc_id LONG, text STRING"


def _docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (1, base),
        (2, base),  # exact duplicate of 1
        (3, base + " extra"),  # near-duplicate of 1
        (4, "completely different text about spark engines and shuffles"),
        (5, "another unrelated document mentioning parquet files only"),
    ]
    return spark.createDataFrame(rows, DOCS_SCHEMA)


def test_exact_dedup_groups_identical_texts(spark):
    out = dedup.exact_dedup(_docs(spark), "text", "doc_id").collect()
    by_keep = {r["keep_id"]: r["n_dups"] for r in out}
    assert by_keep[1] == 2  # docs 1 and 2 collapse, min id kept
    assert len(out) == 4  # 5 docs, one pair merged


def test_minhash_identical_docs_identical_signatures(spark):
    sigs = dedup.minhash_signatures(
        _docs(spark), "text", "doc_id", num_hashes=8
    ).collect()
    by_doc = {}
    for r in sigs:
        by_doc.setdefault(r["id"], {})[r["seed"]] = r["minhash"]
    assert by_doc[1] == by_doc[2]
    assert len(by_doc[1]) == 8
    # near-dup shares most minhashes; unrelated docs share few
    agree_13 = sum(1 for s in range(8) if by_doc[1][s] == by_doc[3][s])
    agree_14 = sum(1 for s in range(8) if by_doc[1][s] == by_doc[4][s])
    assert agree_13 > agree_14


def test_lsh_candidates_contain_high_jaccard_pairs(spark):
    docs = _docs(spark)
    true_pairs = {
        (r["id_a"], r["id_b"])
        for r in dedup.ngram_jaccard_pairs(
            docs, "text", "doc_id", k=3, threshold=0.8, max_df=None
        ).collect()
    }
    assert (1, 2) in true_pairs  # sanity: exact dup is a 1.0-jaccard pair
    candidates = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_lsh_pairs(
            docs, "text", "doc_id", num_hashes=16, bands=8
        ).collect()
    }
    # banding theorem: >= 0.8 jaccard pairs collide in >= 1 of 8
    # 2-row bands with overwhelming probability on these fixtures
    assert true_pairs <= candidates


def test_lsh_pairs_band_counts_bounded(spark):
    out = dedup.minhash_lsh_pairs(
        _docs(spark), "text", "doc_id", num_hashes=16, bands=8
    ).collect()
    assert all(1 <= r["n_bands"] <= 8 for r in out)


def test_lsh_pairs_match_per_id_band_agreement(spark):
    # the signature-collapse rewrite must reproduce the per-member-id
    # contract exactly: recompute band agreements brute-force from the
    # collected signatures and compare
    docs = _docs(spark)
    num_hashes, bands, rpb = 16, 8, 2
    sigs = {}
    for r in dedup.minhash_signatures(
        docs, "text", "doc_id", num_hashes=num_hashes
    ).collect():
        sigs.setdefault(r["id"], {})[r["seed"]] = r["minhash"]
    want = {}
    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            n = sum(
                1
                for band in range(bands)
                if all(
                    sigs[a][band * rpb + j] == sigs[b][band * rpb + j]
                    for j in range(rpb)
                )
            )
            if n:
                want[(a, b)] = n
    got = {
        (r["id_a"], r["id_b"]): r["n_bands"]
        for r in dedup.minhash_lsh_pairs(
            docs, "text", "doc_id", num_hashes=num_hashes, bands=bands
        ).collect()
    }
    assert got == want


def test_minhash_lsh_planted_identical_shingle_sets_stay_distinct_quadratic(spark):
    # 2000 byte-DIFFERENT docs (trailing-whitespace variants) with
    # IDENTICAL shingle sets — exact_dedup cannot collapse these, so
    # the former per-id band join would bucket all 2000 in every band.
    # The scale (non-expanded) form must stay O(distinct²): the band
    # join runs over one representative per distinct signature.
    base = "alpha beta gamma delta epsilon zeta eta theta"
    n_dups = 2000
    rows = [(i, base + " " * (i + 1)) for i in range(n_dups)]
    rows += [
        (100_000 + j, f"unique document number {j} about topic{j} entirely")
        for j in range(20)
    ]
    df = spark.createDataFrame(rows, DOCS_SCHEMA)
    out = dedup.minhash_lsh_pairs(
        df, "text", "doc_id", num_hashes=8, bands=4, expand_duplicates=False
    ).collect()
    # <= 21 distinct signatures -> at most C(21,2) cross rows + intra rows
    assert len(out) <= 21 * 20 // 2 + 21
    intra = [r for r in out if r.id_a == r.id_b]
    hot = [r for r in intra if r.n_a == n_dups]
    assert len(hot) == 1
    assert hot[0].id_a == 0  # min-id representative of the planted group
    assert hot[0].n_bands == 4  # identical signatures agree on every band


def test_minhash_lsh_expanded_planted_group_complete(spark):
    # expanded mode on a 60-copy identical-shingle-set group: all
    # C(60,2) pairs present exactly once, each agreeing on every band
    base = "one two three four five six seven eight nine ten"
    n = 60
    rows = [(i, base + " " * (i + 1)) for i in range(n)]
    df = spark.createDataFrame(rows, DOCS_SCHEMA)
    out = dedup.minhash_lsh_pairs(df, "text", "doc_id", num_hashes=8, bands=4)
    rows_out = out.collect()
    assert len(rows_out) == n * (n - 1) // 2
    assert all(r["n_bands"] == 4 for r in rows_out)
    assert len({(r["id_a"], r["id_b"]) for r in rows_out}) == len(rows_out)


def test_cc_star_already_converged_single_round(spark):
    # a star-shaped edge set is its own fixed point: the initial
    # signature is seeded before the loop, so max_iter=1 must
    # recognize convergence instead of raising
    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 9)], "id LONG")
    pairs = spark.createDataFrame([(1, 2), (1, 3)], "id_a LONG, id_b LONG")
    out = {
        r["id"]: r["keep_id"]
        for r in dedup.connected_components(
            nodes, pairs, algorithm="star", max_iter=1
        ).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 9: 9}


def test_simhash_near_dups_close_in_hamming(spark):
    out = {r["id"]: r["simhash"] for r in dedup.simhash(_docs(spark), "text", "doc_id").collect()}
    assert out[1] == out[2]

    def hamming(a, b):
        return bin(a ^ b).count("1")

    assert hamming(out[1], out[3]) < hamming(out[1], out[4])


def test_simhash_near_pairs_complete_and_bounded(spark):
    out = dedup.simhash_near_pairs(_docs(spark), "text", "doc_id", max_hamming=3)
    rows = {(r["id_a"], r["id_b"]): r["hamming"] for r in out.collect()}
    assert rows[(1, 2)] == 0  # identical docs -> identical fingerprints
    assert all(h <= 3 for h in rows.values())


def test_simhash_near_pairs_rejects_bad_bands(spark):
    import pytest

    with pytest.raises(ValueError):
        dedup.simhash_near_pairs(_docs(spark), "text", "doc_id", max_hamming=4, bands=4)


def test_connected_components_chain_and_singletons(spark):
    # chain 1-2-3 plus pair 10-11 plus singleton 99: min-id propagation
    # must cross the chain even though 1 and 3 share no edge
    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 10, 11, 99)], "id LONG")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a LONG, id_b LONG"
    )
    out = {
        r["id"]: r["keep_id"]
        for r in dedup.connected_components(nodes, pairs).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 99: 99}


def _cc_dict(spark, n_ids, pair_rows, **kw):
    nodes = spark.createDataFrame([(i,) for i in n_ids], "id LONG")
    pairs = spark.createDataFrame(pair_rows, "id_a LONG, id_b LONG")
    return {
        r["id"]: r["keep_id"]
        for r in dedup.connected_components(nodes, pairs, **kw).collect()
    }


def test_connected_components_star_matches_min_label_on_chain(spark):
    # 200-node chain: diameter 199 — the star iteration must converge
    # in O(log^2) rounds (max_iter=15 would be nowhere near enough for
    # min-label) and agree with the min-label result exactly
    ids = list(range(200))
    chain = [(i, i + 1) for i in range(199)]
    star = _cc_dict(spark, ids, chain, algorithm="star", max_iter=15)
    assert star == {i: 0 for i in range(200)}


def test_connected_components_star_matches_min_label_random(spark):
    # deterministic pseudo-random multi-component graphs: both
    # algorithms must produce identical labelings
    import random

    rng = random.Random(7)
    ids = list(range(60))
    pair_rows = [
        (rng.randrange(60), rng.randrange(60)) for _ in range(45)
    ]
    pair_rows = [(a, b) for a, b in pair_rows if a != b]
    ml = _cc_dict(spark, ids, pair_rows, algorithm="min_label")
    star = _cc_dict(spark, ids, pair_rows, algorithm="star")
    assert star == ml


def test_connected_components_auto_switches_on_deep_graph(spark):
    # auto with a tiny label budget on a 64-chain: min-label alone
    # cannot converge in 2 rounds, so the star fallback must finish
    # the job (and keep the partially-propagated labels correct)
    ids = list(range(64))
    chain = [(i, i + 1) for i in range(63)]
    out = _cc_dict(
        spark, ids, chain, algorithm="auto", label_budget=2, max_iter=20
    )
    assert out == {i: 0 for i in range(64)}


def test_connected_components_min_label_raises_unconverged(spark):
    import pytest

    # explicit min_label on a deep chain with a too-small budget must
    # raise — never silently fall back to star or return partial
    # labels as if they were components
    nodes = spark.createDataFrame([(i,) for i in range(12)], "id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="min_label"):
        dedup.connected_components(
            nodes, pairs, algorithm="min_label", max_iter=2
        )
    # the same budget under auto finishes via the star path
    out = dedup.connected_components(
        nodes, pairs, algorithm="auto", label_budget=2
    ).collect()
    assert all(r.keep_id == 0 for r in out)


def test_connected_components_star_empty_and_singletons(spark):
    out = _cc_dict(spark, [5, 7], [], algorithm="star")
    assert out == {5: 5, 7: 7}


def test_star_path_matches_min_label_on_suite_dedup_input(spark):
    # the dedup_keep_one pipeline's real near-dup graph (smoke-scale
    # documents -> Jaccard pairs): the star path must reproduce the
    # oracle-checked min-label labeling exactly
    from conftest import SMOKE_SF_DIR

    from isilon_hadoop_tools_spark.sources.tpch import load_table

    docs = load_table(spark, "documents", SMOKE_SF_DIR)
    nodes = docs.select(F.col("doc_id").alias("id"))
    pairs = dedup.ngram_jaccard_pairs(
        docs, "text", "doc_id", k=3, threshold=0.2, max_df=50
    ).localCheckpoint()
    ml = {
        r["id"]: r["keep_id"]
        for r in dedup.connected_components(
            nodes, pairs, algorithm="min_label"
        ).collect()
    }
    star = {
        r["id"]: r["keep_id"]
        for r in dedup.connected_components(
            nodes, pairs, algorithm="star"
        ).collect()
    }
    assert star == ml


def test_ngram_jaccard_max_df_drops_hot_shingles(spark):
    # every doc shares the same 3 leading tokens -> that shingle is hot
    rows = [(i, f"common lead phrase unique{i} tail{i} words{i}") for i in range(5)]
    docs = spark.createDataFrame(rows, DOCS_SCHEMA)
    uncapped = dedup.ngram_jaccard_pairs(
        docs, "text", "doc_id", k=3, threshold=0.01, max_df=None
    ).count()
    capped = dedup.ngram_jaccard_pairs(
        docs, "text", "doc_id", k=3, threshold=0.01, max_df=4
    ).count()
    assert uncapped > 0
    assert capped == 0  # the only shared shingle was dropped by the cap


def test_winnow_guarantee_shared_substring_shares_fingerprint(spark):
    # winnowing guarantee: a shared substring of length >= k+window-1
    # (= 11 here) forces at least one shared selected fingerprint
    shared = "identical quoted passage kept verbatim across documents"
    rows = [
        (1, "intro text before. " + shared + " and a unique tail one."),
        (2, "other lead-in words: " + shared + " then different ending."),
        (3, "nothing in common with the others at all, fully disjoint!"),
    ]
    docs = spark.createDataFrame(rows, DOCS_SCHEMA)
    fps = dedup.winnow_fingerprints(docs, "text", "doc_id", k=8, window=4)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r["id"], set()).add(r["fp"])
    assert by_doc[1] & by_doc[2], "shared passage must share a fingerprint"
    # disjoint doc shares (almost) nothing: strictly fewer overlaps
    assert len(by_doc[1] & by_doc[3]) < len(by_doc[1] & by_doc[2])


def test_winnow_short_docs_yield_no_fingerprints(spark):
    # len < k+window-1 = 11 -> no full window -> no rows (and no error)
    docs = spark.createDataFrame([(1, "tiny text!"), (2, "ok")], DOCS_SCHEMA)
    assert dedup.winnow_fingerprints(docs, "text", "doc_id", k=8, window=4).count() == 0


def test_winnow_fingerprints_deterministic_and_distinct(spark):
    docs = spark.createDataFrame(
        [(7, "a reasonably long document body for fingerprinting checks")],
        DOCS_SCHEMA,
    )
    a = sorted(r["fp"] for r in dedup.winnow_fingerprints(docs, "text", "doc_id").collect())
    b = sorted(r["fp"] for r in dedup.winnow_fingerprints(docs, "text", "doc_id").collect())
    assert a == b and len(a) == len(set(a)) and len(a) > 0


def test_winnow_arrow_and_hof_impls_identical(spark):
    # the Arrow (mapInPandas) fast path and the pure-JVM HOF path must
    # produce byte-identical fingerprints (same md5-derived hash, same
    # window minima, same distinct) — also covers unicode text, where
    # Python slicing must match Spark's character-based substring
    rows = [
        (1, "the quick brown fox jumps over the lazy dog repeatedly"),
        (2, "naïve café déjà-vu — unicode résumé text with accents àè"),
        (3, "short"),
        (4, "aaaaaaaaaaaaaaaaaaaaaaaa"),
    ]
    docs = spark.createDataFrame(rows, DOCS_SCHEMA)
    arrow = dedup.winnow_fingerprints(docs, "text", "doc_id", impl="arrow")
    hof = dedup.winnow_fingerprints(docs, "text", "doc_id", impl="hof")
    assert arrow.exceptAll(hof).count() == 0
    assert hof.exceptAll(arrow).count() == 0
    assert arrow.count() > 0


def test_lsh_recall_eval_identical_docs_full_recall(spark):
    # three identical docs + one unrelated: every truth pair shares
    # all minhashes, so LSH surfaces all of them -> recall 1.0
    rows = [(i, "alpha beta gamma delta epsilon zeta") for i in range(3)]
    rows.append((9, "one two three four five six seven"))
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = dedup.lsh_recall_eval(
        df, "text", "doc_id", k=3, threshold=0.5, max_df=None
    ).collect()[0]
    assert out["n_true"] == 3 and out["n_hit"] == 3
    assert out["recall"] == 1.0


def test_lsh_recall_eval_empty_truth(spark):
    df = spark.createDataFrame(
        [(1, "aa bb cc dd"), (2, "ee ff gg hh")], "doc_id LONG, text STRING"
    )
    out = dedup.lsh_recall_eval(df, "text", "doc_id", threshold=0.9).collect()[0]
    assert out["n_true"] == 0 and out["recall"] == 1.0


def test_hamming_band_pairs_generic_hash_column(spark):
    # generic band join over a precomputed hash column: 0b0001 vs
    # 0b0011 differ by 1 bit -> pair; 0xFF0 is far from both
    df = spark.createDataFrame(
        [(1, 0b0001), (2, 0b0011), (3, 0xFF0)], "id LONG, h LONG"
    )
    out = dedup.hamming_band_pairs(
        df, "h", "id", bits=12, max_hamming=2, bands=4
    ).collect()
    assert [(r.id_a, r.id_b, r.hamming) for r in out] == [(1, 2, 1)]


def test_hamming_band_pairs_rejects_incomplete_params(spark):
    import pytest

    df = spark.createDataFrame([(1, 0)], "id LONG, h LONG")
    with pytest.raises(ValueError):
        dedup.hamming_band_pairs(df, "h", "id", bits=12, max_hamming=4, bands=4)


def test_hamming_band_pairs_expansion_matches_bruteforce(spark):
    # duplicates + near hashes + far hashes: the rep-collapsed band
    # join re-expanded to member ids must equal the brute-force answer
    rows = [
        (1, 0b0001),
        (2, 0b0001),  # dup of 1
        (7, 0b0001),  # second dup, non-adjacent id
        (3, 0b0011),  # hamming 1 from the dup group
        (4, 0b0111),  # hamming 1 from 3, 2 from the group
        (5, 0xFF0),   # far
        (6, 0xFF0),   # dup of 5, far from everything else
    ]
    df = spark.createDataFrame(rows, "id LONG, h LONG")
    out = {
        (r.id_a, r.id_b): r.hamming
        for r in dedup.hamming_band_pairs(
            df, "h", "id", bits=12, max_hamming=2, bands=4
        ).collect()
    }
    want = {}
    for i, (ia, ha) in enumerate(rows):
        for ib, hb in rows[i + 1:]:
            d = bin(ha ^ hb).count("1")
            if d <= 2:
                want[(min(ia, ib), max(ia, ib))] = d
    assert out == want
    assert out[(1, 2)] == 0 and out[(1, 7)] == 0 and out[(2, 7)] == 0
    assert out[(5, 6)] == 0 and (1, 3) in out


def test_hamming_band_pairs_planted_dup_stays_distinct_quadratic(spark):
    # one hash duplicated 10k x plus 50 distinct hashes: the scale
    # (non-expanded) form must stay O(distinct^2) — the band join runs
    # over 51 representative rows, never the 10k members
    n_dups, hot = 10_000, 0b1010_1010
    rows = [(i, hot) for i in range(n_dups)]
    rows += [(100_000 + j, 0x10000 + (j << 5)) for j in range(50)]
    df = spark.createDataFrame(rows, "id LONG, h LONG")
    out = dedup.hamming_band_pairs(
        df, "h", "id", bits=32, max_hamming=3, bands=4, expand_duplicates=False
    ).collect()
    # 51 distinct hashes -> at most C(51,2) cross rows + 1 intra row
    assert len(out) <= 51 * 50 // 2 + 1
    intra = [r for r in out if r.id_a == r.id_b]
    assert len(intra) == 1
    assert intra[0].id_a == 0  # min-id representative of the hot group
    assert intra[0].hamming == 0
    assert intra[0].n_a == n_dups and intra[0].n_b == n_dups


def test_hamming_band_pairs_expanded_dup_group_complete(spark):
    # expanded mode on a 200-copy group + 1 near hash: all C(200,2)
    # intra pairs plus 200 cross pairs, each exactly once
    n = 200
    rows = [(i, 0b0001) for i in range(n)] + [(999, 0b0011)]
    df = spark.createDataFrame(rows, "id LONG, h LONG")
    out = dedup.hamming_band_pairs(df, "h", "id", bits=12, max_hamming=2, bands=4)
    agg = out.groupBy("hamming").count().collect()
    by_h = {r["hamming"]: r["count"] for r in agg}
    assert by_h[0] == n * (n - 1) // 2
    assert by_h[1] == n
    # no pair appears twice
    assert out.count() == out.select("id_a", "id_b").distinct().count()


def test_width_pinned_groups_keeps_explicit_partition_count(spark):
    # r16 fan-out-width contract: the checkpointed group table every
    # band fan-out stage inherits its parallelism from must hold the
    # explicit REPARTITION_BY_NUM count after materialization instead
    # of AQE-coalescing to 1 partition on its tiny shuffle bytes
    # (profiled pre-fix: a 1-task 19 MB-shuffle-write band fan-out in
    # the unified 4-modality query). Also pins result parity with a
    # plain groupBy.
    from isilon_hadoop_tools_spark.session import shuffle_partition_count

    df = spark.createDataFrame(
        [(i, i % 7) for i in range(100)], "id LONG, _hash LONG"
    )
    grouped = dedup._width_pinned_groups(
        df, ["_hash"], F.min("id").alias("rep")
    )
    rows = {(r["_hash"], r["rep"]) for r in grouped.collect()}
    assert rows == {(h, h) for h in range(7)}
    npart = max(2, shuffle_partition_count(spark))
    assert grouped.rdd.getNumPartitions() == npart


def test_hamming_recall_eval_union_catches_band_miss(spark):
    # incomplete regime (max_hamming == bands): ids 1-2 differ in both
    # 4-bit slices of the primary hash (banding misses them) but share
    # the secondary hash — recall_first 0, recall_union 1
    rows = [(1, 0b00000001, 7), (2, 0b00010000, 7), (3, 0b11100111, 99)]
    df = spark.createDataFrame(rows, "id LONG, ha LONG, hb LONG")
    out = dedup.hamming_recall_eval(
        df, "id", ["ha", "hb"], bits=8, max_hamming=2, bands=2
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_true"] == 1  # only (1,2) is within hamming 2
    assert r["n_hit_first"] == 0 and r["recall_first"] == 0.0
    assert r["n_hit_union"] == 1 and r["recall_union"] == 1.0


def test_hamming_recall_eval_empty_truth_is_perfect(spark):
    rows = [(1, 0b00000000, 1), (2, 0b11111111, 2)]
    df = spark.createDataFrame(rows, "id LONG, ha LONG, hb LONG")
    r = dedup.hamming_recall_eval(
        df, "id", ["ha"], bits=8, max_hamming=4, bands=4
    ).collect()[0]
    assert r["n_true"] == 0 and r["recall_first"] == 1.0


def test_hamming_recall_eval_budget_raise(spark):
    # VERDICT r16 item 5: the quadratic truth pass + broadcast b-side
    # ride the eval-on-a-sample contract; past max_eval_rows the eval
    # must raise loudly instead of silently building an n^2 join.
    import pytest

    rows = [(i, i, i) for i in range(5)]
    df = spark.createDataFrame(rows, "id LONG, ha LONG, hb LONG")
    with pytest.raises(ValueError, match="eval budget"):
        dedup.hamming_recall_eval(
            df, "id", ["ha"], bits=8, max_hamming=2, bands=2,
            max_eval_rows=4,
        )
    # at the budget boundary it still runs
    r = dedup.hamming_recall_eval(
        df, "id", ["ha"], bits=8, max_hamming=2, bands=2,
        max_eval_rows=5,
    ).collect()
    assert len(r) == 1


def test_recall_eval_inputs_distinct_pairs(spark):
    # ADVICE r16: lsh_recall_eval's single-aggregation flag-join is
    # exact only while both pair tables are distinct on (id_a, id_b).
    # Pin the invariant on the producing operators with a fixture that
    # would expose duplicates (multiple shared shingles AND multiple
    # agreeing bands per pair).
    docs = _docs(spark)
    cand = dedup.minhash_lsh_pairs(
        docs, "text", "doc_id", num_hashes=8, bands=4
    ).collect()
    pairs = [(r.id_a, r.id_b) for r in cand]
    assert len(pairs) == len(set(pairs)), pairs
    truth = dedup.ngram_jaccard_pairs(
        docs, "text", "doc_id", k=3, threshold=0.2, max_df=None
    ).collect()
    tpairs = [(r.id_a, r.id_b) for r in truth]
    assert len(tpairs) == len(set(tpairs)), tpairs


def test_prefix_filter_matches_uncapped_brute_force(spark):
    docs = _docs(spark)
    for t in (0.1, 0.5):
        exact = {
            (r.id_a, r.id_b, r.jaccard)
            for r in dedup.ngram_jaccard_pairs(
                docs, "text", "doc_id", k=3, threshold=t, max_df=None
            ).collect()
        }
        pf = {
            (r.id_a, r.id_b, r.jaccard)
            for r in dedup.prefix_filter_jaccard_pairs(
                docs, "text", "doc_id", k=3, threshold=t
            ).collect()
        }
        assert pf == exact
        assert pf  # fixture has planted dups at both thresholds


def test_prefix_filter_keeps_hot_shingle_pairs_max_df_drops(spark):
    # 12 docs all sharing one stopword shingle; two of them are
    # near-identical. A df-cap of 10 drops the hot shingle (changing
    # the reported jaccard); prefix filtering must stay exact.
    hot = "of the and"
    rows = [(i, f"{hot} filler{i} alpha{i} beta{i} gamma{i}") for i in range(10)]
    rows += [
        (100, hot + " shared body common tail words here"),
        (101, hot + " shared body common tail words here too"),
    ]
    docs = spark.createDataFrame(rows, DOCS_SCHEMA)
    out = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.prefix_filter_jaccard_pairs(
            docs, "text", "doc_id", k=3, threshold=0.5
        ).collect()
    }
    assert (100, 101) in out
    # exact jaccard INCLUDING the hot shingle: |A|=7, |B|=8, inter=7
    assert abs(out[(100, 101)] - 7 / 8) < 1e-6
    capped = dedup.ngram_jaccard_pairs(
        docs, "text", "doc_id", k=3, threshold=0.5, max_df=10
    ).collect()
    capped_j = {(r.id_a, r.id_b): r.jaccard for r in capped}
    assert capped_j[(100, 101)] != out[(100, 101)]  # cap distorts, prefix doesn't


def test_minhash_jaccard_eval_exact_dup_and_error_bounds(spark):
    """A planted exact duplicate estimates Ĵ = 1 with exact J = 1 and
    zero error; all estimates are k/H fractions; |Ĵ - J| <= 1."""
    from isilon_hadoop_tools_spark.operators import dedup as D

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = [
        (1, base),
        (2, base),  # exact dup of 1
        (3, base + " extra tail words here"),  # near dup
        (4, "completely different content about spark shuffles and joins"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {
        (r["id_a"], r["id_b"]): r
        for r in D.minhash_jaccard_eval(
            df, "text", "doc_id", num_hashes=8, bands=4
        ).collect()
    }
    assert (1, 2) in rows
    r12 = rows[(1, 2)]
    assert r12["n_agree"] == 8
    assert r12["est_jaccard"] == 1.0
    assert r12["exact_jaccard"] == 1.0
    assert r12["abs_err"] == 0.0
    for r in rows.values():
        assert 0 <= r["n_agree"] <= 8
        assert abs(r["est_jaccard"] - r["n_agree"] / 8) < 1e-9
        assert 0.0 <= r["exact_jaccard"] <= 1.0
        assert r["abs_err"] <= 1.0


def test_tagged_hamming_band_pairs_modality_isolation_and_params(spark):
    """One tagged band join, three modalities: identical hash VALUES
    in different modalities must never pair (modality is in the
    bucket key), each modality applies its OWN max_hamming, and the
    per-modality answers equal an in-test brute force."""
    rows = [
        # modality 'a' (12 bits, max_h=2, bands=4)
        ("a", 1, 0b0001), ("a", 2, 0b0001), ("a", 3, 0b0011),
        ("a", 4, 0b0111), ("a", 5, 0xFF0),
        # modality 'b' (8 bits, max_h=1, bands=4): same VALUES as some
        # of a's hashes — must not pair across
        ("b", 1, 0b0001), ("b", 6, 0b0011), ("b", 7, 0b0111),
        # modality 'c': a lone row — no pairs at all
        ("c", 9, 0b0001),
    ]
    df = spark.createDataFrame(rows, "modality STRING, id LONG, fhash LONG")
    params = {"a": (12, 2, 4), "b": (8, 1, 4), "c": (8, 1, 4)}
    got = {
        (r.modality, r.id_a, r.id_b): r.hamming
        for r in dedup.tagged_hamming_band_pairs(df, params).collect()
    }
    want = {}
    for i, (ma, ia, ha) in enumerate(rows):
        for mb, ib, hb in rows[i + 1:]:
            if ma != mb:
                continue
            d = bin(ha ^ hb).count("1")
            if d <= params[ma][1]:
                want[(ma, min(ia, ib), max(ia, ib))] = d
    assert got == want
    # modality isolation: (a,1)/(b,1) share id AND hash, never pair
    assert all(m != "c" for m, _, _ in got)
    # per-modality thresholds really differ: hamming-2 pair survives
    # in 'a' but the same-distance pair is cut in 'b'
    assert got[("a", 1, 4)] == 2 or ("a", 3, 4) in got
    assert ("b", 1, 7) not in got and ("b", 1, 6) in got


def test_tagged_hamming_band_pairs_rejects_incomplete_modality(spark):
    import pytest as _pytest

    df = spark.createDataFrame(
        [("a", 1, 1)], "modality STRING, id LONG, fhash LONG"
    )
    with _pytest.raises(ValueError, match="'a'"):
        dedup.tagged_hamming_band_pairs(df, {"a": (8, 4, 4)})


def test_tagged_band_slice_unknown_modality_raises(spark):
    """A modality tag absent from params must FAIL the job, not
    silently drop the rows from banding (a typo'd fingerprint_fn
    would otherwise lose an entire modality invisibly)."""
    import pytest

    params = {"text": (16, 2, 4), "image": (16, 2, 4)}
    df = spark.createDataFrame(
        [("text", 1, 0xABCD), ("audio", 2, 0xABCD)],
        "modality string, id long, fhash long",
    )
    with pytest.raises(Exception) as exc:
        dedup.tagged_hamming_band_pairs(df, params).collect()
    assert "unknown modality tag: audio" in str(exc.value)
    # NULL tags are accepted EXPLICITLY by the guard (assert_true
    # throws on NULL input, so the guard tests `known OR tag IS NULL`)
    # and yield a NULL band array, which posexplode/band joins then
    # drop — in BOTH the batch path here and the streaming posting
    # build, which has no join to infer an IS NOT NULL filter from
    df_null = spark.createDataFrame(
        [("text", 1, 0xABCD), (None, 2, 0xABCD)],
        "modality string, id long, fhash long",
    )
    assert dedup.tagged_hamming_band_pairs(df_null, params).collect() == []
    # clean input still works end-to-end
    ok = spark.createDataFrame(
        [("text", 1, 0xABCD), ("text", 2, 0xABCD)],
        "modality string, id long, fhash long",
    )
    got = dedup.tagged_hamming_band_pairs(ok, params).collect()
    assert [(r["id_a"], r["id_b"], r["hamming"]) for r in got] == [(1, 2, 0)]


def test_lsh_plan_s_curve_properties(spark):
    """The planner's table must behave like the published S-curve:
    p monotone in s per factorization, p(t50) ~ 0.5, and more bands
    (fewer rows) => LOWER 50% threshold."""
    rows = dedup.lsh_plan(spark, n_hashes=16, grid_steps=20).collect()
    by_fact: dict = {}
    for r in rows:
        by_fact.setdefault((r["bands"], r["rows_per_band"]), []).append(r)
    assert set(by_fact) == {(1, 16), (2, 8), (4, 4), (8, 2), (16, 1)}
    t50s = {}
    for (b, rr), pts in by_fact.items():
        pts.sort(key=lambda r: r["s"])
        ps = [p["p_candidate"] for p in pts]
        assert ps == sorted(ps), (b, rr)  # monotone in s
        t50s[b] = pts[0]["t50"]
        # p at the grid point nearest t50 is near 0.5
        nearest = min(pts, key=lambda p: abs(p["s"] - pts[0]["t50"]))
        assert abs(nearest["p_candidate"] - 0.5) < 0.25, (b, rr, nearest)
    bs = sorted(t50s)
    assert all(t50s[a] > t50s[b] for a, b in zip(bs, bs[1:]))
