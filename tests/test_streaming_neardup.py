"""Streaming SimHash band-index maintenance: incremental pair
detection across micro-batches must equal the batch answer, survive
restarts (checkpointed or not), and treat replays as no-ops."""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

from isilon_hadoop_tools_spark.operators import dedup
from isilon_hadoop_tools_spark.plans.state import ParquetState
from isilon_hadoop_tools_spark.streaming.neardup import (
    PAIRS_SCHEMA,
    simhash_index_apply_batch,
    simhash_stream_into_state,
)

DOCS_SCHEMA = "doc_id LONG, text STRING"

BASE = "the quick brown fox jumps over the lazy dog again and again today"
# three micro-batches: an exact-dup pair split ACROSS batches (1, 4),
# a near-dup in the same batch as its twin (2), unrelated docs, and a
# second cross-batch exact dup of doc 1 in the last batch (6)
BATCHES = [
    [(1, BASE), (2, BASE + " extra")],
    [(3, "completely different text about spark engines and shuffles"), (4, BASE)],
    [(5, "another unrelated document mentioning parquet files only"), (6, BASE)],
]


def _write_doc_batch(dirpath: str, name: str, rows) -> None:
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        ),
        os.path.join(dirpath, name),
    )
    time.sleep(0.05)  # stable mod-time (= micro-batch) order


def _all_docs(spark):
    rows = [r for b in BATCHES for r in b]
    return spark.createDataFrame(rows, DOCS_SCHEMA)


def _batch_truth(spark):
    return {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_near_pairs(
            _all_docs(spark), "text", "doc_id", max_hamming=3
        ).collect()
    }


def _pairs(state: ParquetState):
    return {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in state.read("near_pairs", PAIRS_SCHEMA).collect()
    }


def _drain(spark, in_dir: str, state: ParquetState, ckpt: str | None = None):
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    simhash_stream_into_state(
        stream, state, text_col="text", id_col="doc_id", checkpoint=ckpt
    )


def test_apply_batch_incremental_equals_batch(spark, tmp_path):
    # fold the batches in one by one as plain DataFrames: after each
    # fold the pair state equals the batch answer over the prefix
    state = ParquetState(spark, str(tmp_path / "state"))
    seen = []
    for rows in BATCHES:
        seen.extend(rows)
        simhash_index_apply_batch(
            spark.createDataFrame(rows, DOCS_SCHEMA), state
        )
        want = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in dedup.simhash_near_pairs(
                spark.createDataFrame(seen, DOCS_SCHEMA),
                "text",
                "doc_id",
                max_hamming=3,
            ).collect()
        }
        assert _pairs(state) == want
    # cross-batch exact dups must be present with hamming 0
    got = _pairs(state)
    assert got[(1, 4)] == 0 and got[(1, 6)] == 0 and got[(4, 6)] == 0


def test_apply_batch_replay_is_noop(spark, tmp_path):
    state = ParquetState(spark, str(tmp_path / "state"))
    for rows in BATCHES:
        simhash_index_apply_batch(
            spark.createDataFrame(rows, DOCS_SCHEMA), state
        )
    before = _pairs(state)
    # replay every batch (simulates an uncheckpointed second drain or
    # a crash-recovery re-delivery): state must not change
    for rows in BATCHES:
        simhash_index_apply_batch(
            spark.createDataFrame(rows, DOCS_SCHEMA), state
        )
    assert _pairs(state) == before == _batch_truth(spark)


def test_stream_drain_equals_batch_and_restarts(spark, tmp_path):
    # staged reveal across three checkpointed restarts, then an idle
    # restart, then a full uncheckpointed replay: every stage of the
    # recovery story converges to the batch answer
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    ckpt = str(tmp_path / "ckpt")
    state = ParquetState(spark, str(tmp_path / "state"))
    for stage, rows in enumerate(BATCHES):
        _write_doc_batch(in_dir, f"b{stage}.parquet", rows)
        _drain(spark, in_dir, state, ckpt)
    truth = _batch_truth(spark)
    assert _pairs(state) == truth
    # idle restart: no new files, no state change
    _drain(spark, in_dir, state, ckpt)
    assert _pairs(state) == truth
    # uncheckpointed replay over ALL files: anti-join makes it a no-op
    _drain(spark, in_dir, state, ckpt=None)
    assert _pairs(state) == truth


# ---- MinHash-LSH streaming maintenance (the L4 twin) ----


def _lsh_pairs(state: ParquetState):
    from isilon_hadoop_tools_spark.streaming.neardup import SIG_PAIRS_SCHEMA

    return {
        (r["id_a"], r["id_b"]): r["n_bands"]
        for r in state.read("lsh_pairs", SIG_PAIRS_SCHEMA).collect()
    }


def _lsh_batch_truth(spark, rows):
    return {
        (r["id_a"], r["id_b"]): r["n_bands"]
        for r in dedup.minhash_lsh_pairs(
            spark.createDataFrame(rows, DOCS_SCHEMA),
            "text",
            "doc_id",
            num_hashes=8,
            bands=4,
        ).collect()
    }


def test_minhash_apply_batch_incremental_equals_batch(spark, tmp_path):
    from isilon_hadoop_tools_spark.streaming.neardup import (
        minhash_index_apply_batch,
    )

    state = ParquetState(spark, str(tmp_path / "state"))
    seen = []
    for rows in BATCHES:
        seen.extend(rows)
        minhash_index_apply_batch(
            spark.createDataFrame(rows, DOCS_SCHEMA),
            state,
            num_hashes=8,
            bands=4,
        )
        assert _lsh_pairs(state) == _lsh_batch_truth(spark, seen)
    # cross-batch exact dups agree on every band
    got = _lsh_pairs(state)
    assert got[(1, 4)] == 4 and got[(1, 6)] == 4 and got[(4, 6)] == 4


def test_minhash_apply_batch_replay_is_noop(spark, tmp_path):
    from isilon_hadoop_tools_spark.streaming.neardup import (
        minhash_index_apply_batch,
    )

    state = ParquetState(spark, str(tmp_path / "state"))
    for _ in range(2):  # second sweep replays every batch
        for rows in BATCHES:
            minhash_index_apply_batch(
                spark.createDataFrame(rows, DOCS_SCHEMA),
                state,
                num_hashes=8,
                bands=4,
            )
    all_rows = [r for b in BATCHES for r in b]
    assert _lsh_pairs(state) == _lsh_batch_truth(spark, all_rows)


def test_minhash_stream_drain_equals_batch_and_restarts(spark, tmp_path):
    from isilon_hadoop_tools_spark.streaming.neardup import (
        minhash_stream_into_state,
    )

    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    ckpt = str(tmp_path / "ckpt")
    state = ParquetState(spark, str(tmp_path / "state"))

    def drain(ck):
        stream = (
            spark.readStream.schema(DOCS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        minhash_stream_into_state(
            stream, state, num_hashes=8, bands=4, checkpoint=ck
        )

    for stage, rows in enumerate(BATCHES):
        _write_doc_batch(in_dir, f"b{stage}.parquet", rows)
        drain(ckpt)
    truth = _lsh_batch_truth(spark, [r for b in BATCHES for r in b])
    assert _lsh_pairs(state) == truth
    drain(ckpt)  # idle restart
    assert _lsh_pairs(state) == truth
    drain(None)  # uncheckpointed full replay
    assert _lsh_pairs(state) == truth


# ---- partial-append crash windows (the O(delta) index writes) ----


def test_simhash_partial_posting_append_does_not_corrupt(spark, tmp_path):
    # simulate a crash mid-postings-append: bands 1..3 of doc 1's
    # fingerprint landed but band 0 did not — the replay re-adds ALL
    # bands (anti-join keys on band 0), leaving duplicate posting
    # rows for bands 1..3, and the pair state must still equal the
    # batch answer (candidates dedup before the hamming filter)
    from pyspark.sql import functions as F

    from isilon_hadoop_tools_spark.operators.dedup import (
        band_slice_array,
        simhash,
    )
    from isilon_hadoop_tools_spark.streaming.neardup import POSTINGS_SCHEMA

    state = ParquetState(spark, str(tmp_path / "state"))
    first = spark.createDataFrame(BATCHES[0], DOCS_SCHEMA)
    partial = (
        simhash(first, "text", "doc_id", 32)
        .select(
            F.posexplode(band_slice_array(F.col("simhash"), 32, 4)).alias(
                "band_idx", "band_val"
            ),
            F.col("simhash").alias("fp"),
        )
        .filter(F.col("band_idx") > 0)
        .select(F.col("band_idx").cast("int"), "band_val", "fp")
    )
    state.append("band_postings", partial)
    for rows in BATCHES:
        simhash_index_apply_batch(
            spark.createDataFrame(rows, DOCS_SCHEMA), state
        )
    assert _pairs(state) == _batch_truth(spark)
    # the re-add left duplicates for bands 1..3; distinct rows match
    # a clean run's posting set
    posts = state.read("band_postings", POSTINGS_SCHEMA)
    assert posts.distinct().count() < posts.count()


def test_minhash_partial_posting_append_does_not_inflate_bands(
    spark, tmp_path
):
    from pyspark.sql import functions as F

    from isilon_hadoop_tools_spark.operators.dedup import minhash_sig_keys
    from isilon_hadoop_tools_spark.streaming.neardup import (
        minhash_index_apply_batch,
    )

    state = ParquetState(spark, str(tmp_path / "state"))
    first = spark.createDataFrame(BATCHES[0], DOCS_SCHEMA)
    partial = (
        minhash_sig_keys(first, "text", "doc_id", 8, 4)
        .select(
            F.posexplode(F.split("sig_key", r"\|")).alias("band", "band_key"),
            "sig_key",
        )
        .filter(F.col("band") > 0)
        .select(F.col("band").cast("int"), "band_key", "sig_key")
    )
    state.append("sig_postings", partial)
    for rows in BATCHES:
        minhash_index_apply_batch(
            spark.createDataFrame(rows, DOCS_SCHEMA),
            state,
            num_hashes=8,
            bands=4,
        )
    # duplicate posting rows exist, but n_bands counts stay exact
    all_rows = [r for b in BATCHES for r in b]
    assert _lsh_pairs(state) == _lsh_batch_truth(spark, all_rows)


# ---------------------------------------------------------------------
# streaming IVF index maintenance (2.9 x L12)
# ---------------------------------------------------------------------


def _write_vec_batch(dirpath: str, name: str, rows) -> None:
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([r[0] for r in rows], pa.int64()),
                "embedding": pa.array(
                    [r[1] for r in rows], pa.list_(pa.float32())
                ),
            }
        ),
        os.path.join(dirpath, name),
    )
    time.sleep(0.05)


def test_ivf_stream_matches_batch_assignment_and_replay_noop(
    spark, tmp_path
):
    from isilon_hadoop_tools_spark.operators.similarity import (
        kmeans_assign,
        kmeans_train,
        quantize_vectors,
    )
    from isilon_hadoop_tools_spark.plans.state import ParquetState
    from isilon_hadoop_tools_spark.streaming.neardup import (
        IVF_POSTINGS_SCHEMA,
        ivf_stream_into_state,
    )

    in_dir = str(tmp_path / "in")
    (tmp_path / "in").mkdir()
    batches = [
        [(i, [float(10 + i % 3), 10.0]) for i in range(0, 4)],
        [(i, [float(-10 - i % 3), -10.0]) for i in range(10, 14)],
        [(20, [10.5, 10.0]), (21, [-10.5, -10.0])],
    ]
    for bi, rows in enumerate(batches):
        _write_vec_batch(in_dir, f"b{bi}.parquet", rows)
    all_rows = [r for b in batches for r in b]
    batch_df = spark.createDataFrame(
        all_rows, "vec_id long, embedding array<float>"
    )
    vecs = quantize_vectors(batch_df, "embedding", "vec_id")
    cents = kmeans_train(vecs, k=2, iters=2)
    truth = {
        r["vid"]: (r["list_id"], r["dist"])
        for r in kmeans_assign(vecs, cents).collect()
    }
    state = ParquetState(spark, str(tmp_path / "state"))
    for _ in range(2):  # second drain must be a replay no-op
        stream = (
            spark.readStream.schema("vec_id LONG, embedding ARRAY<FLOAT>")
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        ivf_stream_into_state(stream, state, cents)
    got = {
        r["vid"]: (r["list_id"], r["dist"])
        for r in state.read("ivf_postings", IVF_POSTINGS_SCHEMA).collect()
    }
    assert got == truth
    # one posting row per vector — the replay added nothing
    assert state.read("ivf_postings", IVF_POSTINGS_SCHEMA).count() == len(
        all_rows
    )


def test_ivf_stream_checkpointed_restart_ingests_only_new(spark, tmp_path):
    """Checkpointed restart: the second drain sees only the files
    that arrived after the first; final postings equal the batch
    assignment over everything."""
    from isilon_hadoop_tools_spark.operators.similarity import (
        kmeans_assign,
        kmeans_train,
        quantize_vectors,
    )
    from isilon_hadoop_tools_spark.plans.state import ParquetState
    from isilon_hadoop_tools_spark.streaming.neardup import (
        IVF_POSTINGS_SCHEMA,
        ivf_stream_into_state,
    )

    in_dir = str(tmp_path / "in")
    (tmp_path / "in").mkdir()
    ckpt = str(tmp_path / "ckpt")
    b0 = [(i, [float(10 + i % 2), 10.0]) for i in range(4)]
    b1 = [(i, [float(-10 - i % 2), -10.0]) for i in range(10, 14)]
    all_rows = b0 + b1
    batch_df = spark.createDataFrame(
        all_rows, "vec_id long, embedding array<float>"
    )
    cents = kmeans_train(
        quantize_vectors(batch_df, "embedding", "vec_id"), k=2, iters=1
    )
    state = ParquetState(spark, str(tmp_path / "state"))

    def drain():
        stream = (
            spark.readStream.schema("vec_id LONG, embedding ARRAY<FLOAT>")
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        ivf_stream_into_state(stream, state, cents, checkpoint=ckpt)

    _write_vec_batch(in_dir, "b0.parquet", b0)
    drain()
    _write_vec_batch(in_dir, "b1.parquet", b1)
    drain()
    truth = {
        r["vid"]: (r["list_id"], r["dist"])
        for r in kmeans_assign(
            quantize_vectors(batch_df, "embedding", "vec_id"), cents
        ).collect()
    }
    got = {
        r["vid"]: (r["list_id"], r["dist"])
        for r in state.read("ivf_postings", IVF_POSTINGS_SCHEMA).collect()
    }
    assert got == truth


def test_tagged_index_stream_modality_isolation_and_replay(spark, tmp_path):
    """The unified tagged index: text and image fingerprints of the
    SAME ids maintained in one postings/members/pairs table set —
    cross-batch pairs detected per modality, identical hash VALUES
    across modalities never pair, replays are no-ops, and the final
    state equals the batch tagged_hamming_band_pairs answer."""
    from isilon_hadoop_tools_spark.streaming.neardup import (
        TAGGED_PAIRS_SCHEMA,
        tagged_index_apply_batch,
    )

    params = {"t": (12, 2, 4), "i": (12, 1, 4)}
    # ids 1/4 exact text dups across batches; 2 near 1 (hamming 1);
    # image side: SAME hash values under modality 'i' with its own
    # tighter threshold; id 9 exists only in 'i'
    batches = [
        [("t", 1, 0b0001), ("t", 2, 0b0011), ("i", 1, 0b0001)],
        [("t", 3, 0xF00), ("t", 4, 0b0001), ("i", 9, 0b0011)],
        [("t", 6, 0b0001), ("i", 4, 0b0001)],
    ]
    state = ParquetState(spark, str(tmp_path / "state"))
    for _ in range(2):  # second pass replays every batch: no-ops
        for rows in batches:
            tagged_index_apply_batch(
                spark.createDataFrame(
                    rows, "modality STRING, id LONG, fhash LONG"
                ),
                state,
                params,
            )
    got = {
        (r["modality"], r["id_a"], r["id_b"]): r["hamming"]
        for r in state.read("tnear_pairs", TAGGED_PAIRS_SCHEMA).collect()
    }
    all_rows = [r for b in batches for r in b]
    want = {
        (r["modality"], r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.tagged_hamming_band_pairs(
            spark.createDataFrame(
                all_rows, "modality STRING, id LONG, fhash LONG"
            ),
            params,
        ).collect()
    }
    assert got == want
    # cross-batch text dups found; the same values under 'i' pair
    # independently; hamming-2 pair survives in 't' (max_h=2) but
    # would not in 'i' (max_h=1)
    assert got[("t", 1, 4)] == 0 and got[("t", 1, 6)] == 0
    assert got[("i", 1, 4)] == 0
    assert ("t", 2, 3) not in got
    assert ("i", 1, 9) in got  # hamming 1 <= 1
    # members grew once per distinct (modality, id) — replay added 0
    assert state.read(
        "tfp_members", "modality STRING, id LONG, fp LONG"
    ).count() == len(all_rows)


def test_tagged_index_stream_null_tag_dropped_not_fatal(spark, tmp_path):
    """A NULL modality tag in a streaming batch must be DROPPED, not
    fail the batch: Spark's assert_true throws on NULL input, and the
    streaming posting build (posexplode after a left_anti join, which
    keeps NULL keys) has no band join to infer an IS NOT NULL filter
    from — so the guard must accept NULL tags explicitly. Non-null
    UNKNOWN tags must still fail loudly."""
    import pytest
    from isilon_hadoop_tools_spark.streaming.neardup import (
        TAGGED_PAIRS_SCHEMA,
        tagged_index_apply_batch,
    )

    params = {"t": (12, 2, 4)}
    state = ParquetState(spark, str(tmp_path / "state"))
    tagged_index_apply_batch(
        spark.createDataFrame(
            [("t", 1, 0b0001), (None, 2, 0b0001), ("t", 3, 0b0001)],
            "modality STRING, id LONG, fhash LONG",
        ),
        state,
        params,
    )
    got = {
        (r["modality"], r["id_a"], r["id_b"]): r["hamming"]
        for r in state.read("tnear_pairs", TAGGED_PAIRS_SCHEMA).collect()
    }
    # the NULL-tag row vanished; the two tagged rows still paired
    assert got == {("t", 1, 3): 0}
    assert state.read(
        "tfp_members", "modality STRING, id LONG, fp LONG"
    ).count() == 2
    # a typo'd (non-null, unknown) tag still fails the batch
    with pytest.raises(Exception, match="unknown modality tag: x"):
        tagged_index_apply_batch(
            spark.createDataFrame(
                [("x", 9, 0b0001)], "modality STRING, id LONG, fhash LONG"
            ),
            state,
            params,
        )


# ---- streaming exact-substring (suffix) dedup index (L29d twin) ----

# min_len=4 scenario exercising every maintenance path:
# - doc 6 has a WITHIN-doc repeat from batch 1 (span exists early,
#   doc never touched again -> its stored span must survive swaps)
# - doc 1's spans GROW twice: batch 2 brings a 6-token partner
#   (prefix dup), batch 3 an exact 12-token copy (doc 4)
# - doc 2 has NO partner until batch 3 (doc 5) -> no span, then span
# - docs 3 is never duplicated -> never any span
_SFX_A10 = "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"
_SFX_BATCHES = [
    [(1, _SFX_A10 + " z1 z2"), (2, "m1 m2 m3 m4 m5 f1 f2"),
     (6, "r1 r2 r3 r4 x r1 r2 r3 r4")],
    [(3, "q1 q2 q3 q4 q5 q6 q7"), (7, "a1 a2 a3 a4 a5 a6 k1 k2")],
    [(4, _SFX_A10 + " z1 z2"), (5, "m1 m2 m3 m4 m5 n1")],
]


def _sfx_batch_answer(spark, rows):
    from isilon_hadoop_tools_spark.operators.corpus import suffix_dup_spans

    df = spark.createDataFrame(rows, DOCS_SCHEMA)
    return {
        (r["id"], r["start_tok"], r["end_tok"]):
            (r["span_len"], r["max_dup_len"], r["n_positions"])
        for r in suffix_dup_spans(
            df, "text", "doc_id", min_len=4
        ).collect()
    }


def _sfx_state_spans(state):
    from isilon_hadoop_tools_spark.streaming.neardup import SFX_SPANS_SCHEMA

    return {
        (r["id"], r["start_tok"], r["end_tok"]):
            (r["span_len"], r["max_dup_len"], r["n_positions"])
        for r in state.read("sfx_spans", SFX_SPANS_SCHEMA).collect()
    }


def test_suffix_index_incremental_equals_batch_at_every_prefix(
    spark, tmp_path
):
    """After every micro-batch, the spans state must equal the batch
    suffix_dup_spans answer over the prefix corpus — including spans
    of OLD docs growing when a longer partner arrives later, and
    untouched docs' spans carrying over unchanged."""
    from isilon_hadoop_tools_spark.streaming.neardup import (
        suffix_index_apply_batch,
    )

    state = ParquetState(spark, str(tmp_path / "state"))
    seen = []
    for rows in _SFX_BATCHES:
        seen += rows
        suffix_index_apply_batch(
            spark.createDataFrame(rows, DOCS_SCHEMA), state, min_len=4
        )
        assert _sfx_state_spans(state) == _sfx_batch_answer(spark, seen)
    # scenario sanity: doc 1's span really grew across batches and
    # doc 6's within-doc span survived untouched
    final = _sfx_state_spans(state)
    assert (1, 0, 12) in final  # full 12-token dup with doc 4
    # doc 6's within-doc repeat (two 4-token islands) from batch 1
    assert (6, 0, 4) in final and (6, 5, 9) in final


def test_suffix_index_replay_is_noop(spark, tmp_path):
    from isilon_hadoop_tools_spark.streaming.neardup import (
        suffix_index_apply_batch,
    )

    state = ParquetState(spark, str(tmp_path / "state"))
    for _ in range(2):
        for rows in _SFX_BATCHES:
            suffix_index_apply_batch(
                spark.createDataFrame(rows, DOCS_SCHEMA), state, min_len=4
            )
    all_rows = [r for b in _SFX_BATCHES for r in b]
    assert _sfx_state_spans(state) == _sfx_batch_answer(spark, all_rows)
    # members grew once per doc
    assert state.read("sfx_members", "id LONG").count() == len(all_rows)
    # gram postings hold each (id, pos) occurrence exactly once
    g = state.read("sfx_grams", "id LONG, pos LONG, gh LONG")
    assert g.count() == g.distinct().count()


def test_suffix_index_partial_append_crash_replays_clean(spark, tmp_path):
    """Crash simulation: batch 2 dies AFTER half its gram postings
    (and one of its doc rows) were appended but BEFORE the members
    append committed. The replay must not double-count the
    partially-persisted rows (a double-counted single occurrence
    would fabricate a duplicate) and must converge to the clean
    two-batch state."""
    from pyspark.sql import functions as F

    from isilon_hadoop_tools_spark.operators.corpus import _suffix_grams
    from isilon_hadoop_tools_spark.streaming.neardup import (
        suffix_index_apply_batch,
    )

    state = ParquetState(spark, str(tmp_path / "state"))
    suffix_index_apply_batch(
        spark.createDataFrame(_SFX_BATCHES[0], DOCS_SCHEMA),
        state,
        min_len=4,
    )
    # simulate the crashed attempt's partial writes
    b2 = spark.createDataFrame(_SFX_BATCHES[1], DOCS_SCHEMA).select(
        F.col("doc_id").alias("id"), "text"
    )
    _, g2 = _suffix_grams(b2, "text", "id", 4)
    state.append("sfx_grams", g2.filter(F.col("pos") % 2 == 0))
    state.append("sfx_docs", b2.filter(F.col("id") == 7))
    # replay the full batch through the normal path
    suffix_index_apply_batch(
        spark.createDataFrame(_SFX_BATCHES[1], DOCS_SCHEMA),
        state,
        min_len=4,
    )
    seen = _SFX_BATCHES[0] + _SFX_BATCHES[1]
    assert _sfx_state_spans(state) == _sfx_batch_answer(spark, seen)
    g = state.read("sfx_grams", "id LONG, pos LONG, gh LONG")
    assert g.count() == g.distinct().count()
    d = state.read("sfx_docs", "id LONG, text STRING")
    assert d.count() == d.select("id").distinct().count()


def test_suffix_stream_drain_twice_equals_batch(spark, tmp_path):
    """End-to-end through readStream/foreachBatch: three file batches
    drained twice without a checkpoint equal the batch answer."""
    from isilon_hadoop_tools_spark.streaming.neardup import (
        suffix_stream_into_state,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    for i, rows in enumerate(_SFX_BATCHES):
        _write_doc_batch(src, f"b{i}.parquet", rows)
        os.utime(
            os.path.join(src, f"b{i}.parquet"),
            (1_700_000_000 + i, 1_700_000_000 + i),
        )
    state = ParquetState(spark, str(tmp_path / "state"))
    schema = spark.read.parquet(os.path.join(src, "b0.parquet")).schema
    for _ in range(2):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(src, "b*.parquet"))
        )
        suffix_stream_into_state(stream, state, min_len=4)
    all_rows = [r for b in _SFX_BATCHES for r in b]
    assert _sfx_state_spans(state) == _sfx_batch_answer(spark, all_rows)


# ---- streaming per-domain frequency-cap maintenance (L64 twin) ----

_DC_BATCHES = [
    # domain a.example.com via hosts hA*, domain b.org via hB
    [(10, "http://hA1.example.com/x"), (11, "http://hA2.example.com/y"),
     (30, "http://hB.b.org/z")],
    [(12, "http://hA3.example.com/x")],            # fills a's cap (3)
    [(5, "http://hA4.example.com/q"),              # DISPLACES id 12
     (31, "http://hB2.b.org/w")],
]


def _dc_state(state):
    from isilon_hadoop_tools_spark.streaming.neardup import DC_KEPT_SCHEMA

    return {
        r["id"]: (r["domain"], r["kept"])
        for r in state.read("dc_kept", DC_KEPT_SCHEMA).collect()
    }


def _dc_batch_answer(spark, rows, cap):
    from isilon_hadoop_tools_spark.operators.urls import domain_caps

    df = spark.createDataFrame(rows, "doc_id LONG, url STRING")
    return {
        r["id"]: (r["domain"], r["kept"])
        for r in domain_caps(df, "url", "doc_id", cap).collect()
    }


def test_domain_caps_stream_displacement_and_prefix_equivalence(
    spark, tmp_path
):
    """After every micro-batch the decision snapshot equals the batch
    cap over the prefix — including a LATER-arriving lower id
    displacing a previously-kept doc (the deterministic-by-id
    semantics that make replays and backfills converge)."""
    from isilon_hadoop_tools_spark.streaming.neardup import (
        domain_caps_apply_batch,
    )

    state = ParquetState(spark, str(tmp_path / "state"))
    seen = []
    for rows in _DC_BATCHES:
        seen += rows
        domain_caps_apply_batch(
            spark.createDataFrame(rows, "doc_id LONG, url STRING"),
            state,
            cap=3,
        )
        assert _dc_state(state) == _dc_batch_answer(spark, seen, 3)
    final = _dc_state(state)
    assert final[12] == ("example.com", False)  # displaced by id 5
    assert final[5] == ("example.com", True)
    assert final[30] == ("b.org", True) and final[31] == ("b.org", True)


def test_domain_caps_stream_replay_is_noop(spark, tmp_path):
    from isilon_hadoop_tools_spark.streaming.neardup import (
        domain_caps_apply_batch,
    )

    state = ParquetState(spark, str(tmp_path / "state"))
    for _ in range(2):
        for rows in _DC_BATCHES:
            domain_caps_apply_batch(
                spark.createDataFrame(rows, "doc_id LONG, url STRING"),
                state,
                cap=3,
            )
    all_rows = [r for b in _DC_BATCHES for r in b]
    assert _dc_state(state) == _dc_batch_answer(spark, all_rows, 3)
    assert state.read("dc_members", "id LONG").count() == len(all_rows)
    d = state.read("dc_docs", "id LONG, domain STRING")
    assert d.count() == d.select("id").distinct().count()


def test_url_keep_one_stream_displacement_and_replay(spark, tmp_path):
    """Keep-one maintenance: the canonical-group representative is
    displaced by a later-arriving lower id, n_dups grows with the
    group, replays are no-ops, and every prefix equals the batch
    answer."""
    from isilon_hadoop_tools_spark.operators.urls import url_keep_one
    from isilon_hadoop_tools_spark.streaming.neardup import (
        UK_KEPT_SCHEMA,
        url_keep_one_apply_batch,
    )

    batches = [
        [(10, "http://Example.com/a?utm_source=x"), (20, "http://b.org/z")],
        [(12, "http://example.com/a")],       # same canon as 10
        [(4, "http://EXAMPLE.com/a#frag")],   # displaces 10
    ]
    state = ParquetState(spark, str(tmp_path / "state"))
    seen = []
    for _ in range(2):  # second sweep replays everything: no-ops
        for rows in batches:
            if rows[0] not in seen:
                seen += rows
            url_keep_one_apply_batch(
                spark.createDataFrame(rows, "doc_id LONG, url STRING"),
                state,
            )
            want = {
                r["id"]: (r["canon_url"], r["n_dups"], r["kept"])
                for r in url_keep_one(
                    spark.createDataFrame(seen, "doc_id LONG, url STRING"),
                    "url",
                    "doc_id",
                ).collect()
            }
            got = {
                r["id"]: (r["canon_url"], r["n_dups"], r["kept"])
                for r in state.read("uk_kept", UK_KEPT_SCHEMA).collect()
            }
            assert got == want
    assert got[4] == ("http://example.com/a", 3, True)
    assert got[10] == ("http://example.com/a", 3, False)
    assert got[20][2] is True


def test_domain_caps_partial_append_crash_replays_clean(spark, tmp_path):
    """Crash simulation (r12 VERDICT #7): the batch-2 attempt dies
    AFTER the dc_kept swap and AFTER half its dc_docs rows were
    appended, BEFORE the dc_members commit. Replay must not count the
    partially-appended docs twice into their domain and must converge
    to the clean prefix answer."""
    from pyspark.sql import functions as F

    from isilon_hadoop_tools_spark.operators.urls import (
        domain_caps,
        host_expr,
        registrable_domain_expr,
    )
    from isilon_hadoop_tools_spark.streaming.neardup import (
        domain_caps_apply_batch,
    )

    state = ParquetState(spark, str(tmp_path / "state"))
    for rows in _DC_BATCHES[:2]:
        domain_caps_apply_batch(
            spark.createDataFrame(rows, "doc_id LONG, url STRING"),
            state,
            cap=3,
        )
    # simulate the crashed attempt of batch 2 (ids 5 and 31): kept
    # already swapped to the post-batch snapshot, ONE of the two doc
    # rows already appended, members NOT committed
    seen_all = [r for b in _DC_BATCHES for r in b]
    crashed_kept = domain_caps(
        spark.createDataFrame(seen_all, "doc_id LONG, url STRING"),
        "url",
        "doc_id",
        3,
    ).select("id", "domain", "kept")
    state.write("dc_kept", crashed_kept)
    b2 = spark.createDataFrame(
        _DC_BATCHES[2], "doc_id LONG, url STRING"
    ).select(
        F.col("doc_id").alias("id"),
        registrable_domain_expr(host_expr("url")).alias("domain"),
    )
    state.append("dc_docs", b2.filter(F.col("id") == 5))
    # replay the full batch through the normal path
    domain_caps_apply_batch(
        spark.createDataFrame(_DC_BATCHES[2], "doc_id LONG, url STRING"),
        state,
        cap=3,
    )
    assert _dc_state(state) == _dc_batch_answer(spark, seen_all, 3)
    d = state.read("dc_docs", "id LONG, domain STRING")
    assert d.count() == d.select("id").distinct().count()
    assert state.read("dc_members", "id LONG").count() == len(seen_all)
    # the displacement survived the crash-replay cycle
    final = _dc_state(state)
    assert final[5] == ("example.com", True)
    assert final[12] == ("example.com", False)


def test_url_keep_one_partial_append_crash_replays_clean(spark, tmp_path):
    """Same crash matrix for the keep-one maintainer: kill between the
    uk_kept swap and the uk_docs/uk_members appends (one of two doc
    rows persisted). Replay must keep n_dups exact (a double-counted
    doc would inflate its group) and converge to the batch answer."""
    from pyspark.sql import functions as F

    from isilon_hadoop_tools_spark.operators.urls import (
        canonical_url_expr,
        url_keep_one,
    )
    from isilon_hadoop_tools_spark.streaming.neardup import (
        UK_KEPT_SCHEMA,
        url_keep_one_apply_batch,
    )

    batches = [
        [(10, "http://Example.com/a?utm_source=x"), (20, "http://b.org/z")],
        [(12, "http://example.com/a")],
        [(4, "http://EXAMPLE.com/a#frag"), (21, "http://b.org/z?gclid=1")],
    ]
    state = ParquetState(spark, str(tmp_path / "state"))
    for rows in batches[:2]:
        url_keep_one_apply_batch(
            spark.createDataFrame(rows, "doc_id LONG, url STRING"), state
        )
    seen_all = [r for b in batches for r in b]
    crashed_kept = url_keep_one(
        spark.createDataFrame(seen_all, "doc_id LONG, url STRING"),
        "url",
        "doc_id",
    ).select("id", "canon_url", "n_dups", "kept")
    state.write("uk_kept", crashed_kept)
    b2 = spark.createDataFrame(
        batches[2], "doc_id LONG, url STRING"
    ).select(
        F.col("doc_id").alias("id"),
        canonical_url_expr("url").alias("canon_url"),
    )
    state.append("uk_docs", b2.filter(F.col("id") == 4))
    url_keep_one_apply_batch(
        spark.createDataFrame(batches[2], "doc_id LONG, url STRING"), state
    )
    want = {
        r["id"]: (r["canon_url"], r["n_dups"], r["kept"])
        for r in url_keep_one(
            spark.createDataFrame(seen_all, "doc_id LONG, url STRING"),
            "url",
            "doc_id",
        ).collect()
    }
    got = {
        r["id"]: (r["canon_url"], r["n_dups"], r["kept"])
        for r in state.read("uk_kept", UK_KEPT_SCHEMA).collect()
    }
    assert got == want
    d = state.read("uk_docs", "id LONG, canon_url STRING")
    assert d.count() == d.select("id").distinct().count()
    assert state.read("uk_members", "id LONG").count() == len(seen_all)
    # displacement + exact group size survived
    assert got[4] == ("http://example.com/a", 3, True)
    assert got[10] == ("http://example.com/a", 3, False)
    assert got[21] == ("http://b.org/z", 2, False)


# ---- streaming CCNet paragraph-dedup maintenance (L67 twin) ----

_PP_BATCHES = [
    [(10, "alpha\nbody-A\ntail-10"), (20, "beta\nbody-B\ntail-20")],
    [(12, "alpha\nbody-C\ntail-12")],          # 'alpha' stays owned by 10
    [(5, "alpha\nbody-B\ntail-5")],            # DISPLACES 10's alpha AND 20's body-B
]


def _pp_state(state):
    from isilon_hadoop_tools_spark.streaming.neardup import PP_KEPT_SCHEMA

    return {
        r["id"]: (r["n_paras"], r["n_kept"], r["text_clean"])
        for r in state.read("pp_kept", PP_KEPT_SCHEMA).collect()
    }


def _pp_batch_answer(spark, rows):
    from isilon_hadoop_tools_spark.operators.corpus import paragraph_dedup

    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    return {
        r["id"]: (r["n_paras"], r["n_kept"], r["text_clean"])
        for r in paragraph_dedup(df, "text", "doc_id").collect()
    }


def test_paragraph_stream_displacement_and_prefix_equivalence(
    spark, tmp_path
):
    from isilon_hadoop_tools_spark.streaming.neardup import (
        paragraph_index_apply_batch,
    )

    state = ParquetState(spark, str(tmp_path / "state"))
    seen = []
    for rows in _PP_BATCHES:
        seen += rows
        paragraph_index_apply_batch(
            spark.createDataFrame(rows, "doc_id LONG, text STRING"), state
        )
        assert _pp_state(state) == _pp_batch_answer(spark, seen)
    final = _pp_state(state)
    # doc 5 (lowest id) now owns 'alpha' and 'body-B'
    assert final[5] == (3, 3, "alpha\nbody-B\ntail-5")
    # doc 10 lost 'alpha' on displacement
    assert final[10] == (3, 2, "body-A\ntail-10")
    # doc 20 lost 'body-B'
    assert final[20] == (3, 2, "beta\ntail-20")
    assert final[12] == (3, 2, "body-C\ntail-12")


def test_paragraph_stream_replay_and_partial_append_crash(spark, tmp_path):
    from pyspark.sql import functions as F

    from isilon_hadoop_tools_spark.streaming.neardup import (
        paragraph_index_apply_batch,
    )

    state = ParquetState(spark, str(tmp_path / "state"))
    for rows in _PP_BATCHES[:2]:
        paragraph_index_apply_batch(
            spark.createDataFrame(rows, "doc_id LONG, text STRING"), state
        )
    # crashed attempt of batch 2 (doc 5): kept + first already swapped,
    # ONE of its three paragraph postings appended, members NOT
    # committed — replay must not double-count and must converge
    seen_all = [r for b in _PP_BATCHES for r in b]
    crashed = _pp_batch_answer(spark, seen_all)
    state.write(
        "pp_kept",
        spark.createDataFrame(
            [(i, n, k, t) for i, (n, k, t) in crashed.items()],
            "id LONG, n_paras LONG, n_kept LONG, text_clean STRING",
        ),
    )
    # pp_first swaps BEFORE the paras append in the write order, so the
    # crashed snapshot must carry the post-batch ownership too
    first = {}
    for did, text in seen_all:
        for pos, para in enumerate(text.split("\n")):
            if para not in first or (did, pos) < first[para]:
                first[para] = (did, pos)
    state.write(
        "pp_first",
        spark.createDataFrame(
            [(p, f[0], f[1]) for p, f in first.items()],
            "para STRING, fid LONG, fpos INT",
        ),
    )
    state.append(
        "pp_paras",
        spark.createDataFrame(
            [(5, 0, "alpha")], "id LONG, pos INT, para STRING"
        ),
    )
    # replay the full batch, then a full second sweep (pure replays)
    for rows in [_PP_BATCHES[2]] + _PP_BATCHES:
        paragraph_index_apply_batch(
            spark.createDataFrame(rows, "doc_id LONG, text STRING"), state
        )
    assert _pp_state(state) == crashed
    p = state.read("pp_paras", "id LONG, pos INT, para STRING")
    assert p.count() == p.distinct().count() == 3 * len(seen_all)
    assert state.read("pp_members", "id LONG").count() == len(seen_all)


_CP_BATCHES = [
    [("p1", 1, 100), ("p2", 1, 500)],
    [("p1", 2, 300)],                     # resorts p1: 300 > 100
    [("p1", 3, 50), ("p2", 2, 10)],
]
_CP_SCHEMA = "partition STRING, file LONG, size_bytes LONG"


def _cp_batch_answer(spark, rows, target):
    from isilon_hadoop_tools_spark.operators.skew import compaction_plan

    return {
        (r["partition"], r["file"]): (
            r["size_bytes"], r["cum_bytes"], r["bin_seq"],
            r["n_files_before"], r["n_files_after"],
        )
        for r in compaction_plan(
            spark.createDataFrame(rows, _CP_SCHEMA),
            "partition", "file", "size_bytes", target,
        ).collect()
    }


def _cp_state(state):
    from isilon_hadoop_tools_spark.streaming.neardup import CP_PLAN_SCHEMA

    return {
        (r["partition"], r["file"]): (
            r["size_bytes"], r["cum_bytes"], r["bin_seq"],
            r["n_files_before"], r["n_files_after"],
        )
        for r in state.read("cp_plan", CP_PLAN_SCHEMA).collect()
    }


def test_compaction_stream_displacement_prefix_and_replay(spark, tmp_path):
    """Compaction maintenance: after every micro-batch the plan
    snapshot equals the batch planner over the prefix; a
    later-arriving larger file RESORTS its partition and displaces
    the earlier file's bin; a full replay sweep is a no-op."""
    from isilon_hadoop_tools_spark.streaming.neardup import (
        compaction_apply_batch,
    )

    state = ParquetState(spark, str(tmp_path / "state"))
    seen = []
    for sweep in range(2):
        for rows in _CP_BATCHES:
            if sweep == 0:
                seen += rows
            compaction_apply_batch(
                spark.createDataFrame(rows, _CP_SCHEMA), state, 256
            )
            if sweep == 0:
                assert _cp_state(state) == _cp_batch_answer(
                    spark, seen, 256
                )
    all_rows = [r for b in _CP_BATCHES for r in b]
    final = _cp_state(state)
    assert final == _cp_batch_answer(spark, all_rows, 256)
    # displacement: p1 file 1 was bin 1 alone; file 2 (300 B) sorts
    # first and pushes it to start offset 300 -> bin 2
    assert final[("p1", 2)][2] == 1
    assert final[("p1", 1)][2] == 2
    members = state.read("cp_members", "partition STRING, file LONG")
    assert members.count() == len(all_rows)


def test_compaction_partial_append_crash_replays_clean(spark, tmp_path):
    """Crash simulation (the suffix/domain-caps matrix): the batch-3
    attempt dies AFTER the cp_plan swap and AFTER one of its two
    cp_files rows appended, BEFORE the cp_members commit. Replay must
    not double-count the partially-appended file into its partition
    and must converge to the clean full answer."""
    from pyspark.sql import functions as F

    from isilon_hadoop_tools_spark.streaming.neardup import (
        CP_FILES_SCHEMA,
        compaction_apply_batch,
    )

    state = ParquetState(spark, str(tmp_path / "state"))
    for rows in _CP_BATCHES[:2]:
        compaction_apply_batch(
            spark.createDataFrame(rows, _CP_SCHEMA), state, 256
        )
    all_rows = [r for b in _CP_BATCHES for r in b]
    # crashed attempt: plan already swapped to the post-batch answer,
    # ONE of the two file rows appended, members NOT committed
    from isilon_hadoop_tools_spark.operators.skew import compaction_plan

    state.write(
        "cp_plan",
        compaction_plan(
            spark.createDataFrame(all_rows, _CP_SCHEMA),
            "partition", "file", "size_bytes", 256,
        ),
    )
    state.append(
        "cp_files",
        spark.createDataFrame(_CP_BATCHES[2], _CP_SCHEMA).filter(
            F.col("file") == 3
        ),
    )
    # replay batch 3 through the normal path
    compaction_apply_batch(
        spark.createDataFrame(_CP_BATCHES[2], _CP_SCHEMA), state, 256
    )
    assert _cp_state(state) == _cp_batch_answer(spark, all_rows, 256)
    f = state.read("cp_files", CP_FILES_SCHEMA)
    assert f.count() == f.select("partition", "file").distinct().count()
    assert f.count() == len(all_rows)
    members = state.read("cp_members", "partition STRING, file LONG")
    assert members.count() == len(all_rows)


def test_bloom_index_stream_converges_and_stays_bounded(spark, tmp_path):
    """SC11s: set-bit union is idempotent — a double drain converges
    to the batch-built bitmap; the state is bounded by m_bits rows
    regardless of key volume; the maintained bitmap prefilters a
    probe to the exact semi-join result."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from isilon_hadoop_tools_spark.operators.skew import (
        bloom_build_bits,
        bloom_probe_cond,
    )
    from isilon_hadoop_tools_spark.plans.state import ParquetState
    from isilon_hadoop_tools_spark.streaming.neardup import (
        BLOOM_BITS_SCHEMA,
        bloom_stream_into_state,
    )

    d = str(tmp_path / "keys")
    os.makedirs(d)
    for b in range(3):
        pq.write_table(
            pa.table({"k": pa.array(
                [b * 100 + i * 7 for i in range(40)], pa.int64()
            )}),
            os.path.join(d, f"b{b}.parquet"),
        )
    state = ParquetState(spark, str(tmp_path / "state"))
    for _ in range(2):  # replay without checkpoint: must converge
        stream = (
            spark.readStream.schema("k long")
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
        )
        bloom_stream_into_state(stream, state, "k", m_bits=256)
    got = {r["bit"] for r in
           state.read("bloom_bits", BLOOM_BITS_SCHEMA).collect()}
    want = bloom_build_bits(
        spark.read.parquet(d).select(F.col("k").alias("_k")),
        "_k", m_bits=256,
    )
    assert got == want
    assert len(got) <= 256

    big = spark.range(1000).select(F.col("id").alias("pk"))
    keys = spark.read.parquet(d).select(
        F.col("k").cast("string").alias("_k")
    ).distinct()
    reduced = big.filter(
        bloom_probe_cond("pk", got, m_bits=256)
    ).join(big.select(F.col("pk").cast("string").alias("_k"))
           .join(keys, "_k", "left_semi"),
           F.col("pk").cast("string") == F.col("_k"), "left_semi")
    exact = big.join(
        keys, F.col("pk").cast("string") == F.col("_k"), "left_semi"
    )
    assert sorted(r["pk"] for r in reduced.collect()) == sorted(
        r["pk"] for r in exact.collect()
    )
