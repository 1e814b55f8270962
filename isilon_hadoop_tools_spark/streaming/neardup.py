"""Streaming SimHash near-dup maintenance (§2.9 x L6).

The production shape for continuously-crawled corpora: each
micro-batch of new documents is fingerprinted, matched against a
persisted band index, and the newly-created near-dup pairs are
appended — without ever re-running the corpus-wide band self-join.

State (``ParquetState`` tables; Delta/Iceberg MERGE on a real
deployment):

- ``fp_members`` (id, fp): one row per seen document.
- ``band_postings`` (band_idx, band_val, fp): the band index over
  DISTINCT fingerprints only — the same representative collapse as
  the batch ``hamming_band_pairs``, so a boilerplate document
  duplicated 10^6 times holds ONE posting per band and batch joins
  stay O(batch x distinct-per-bucket).
- ``near_pairs`` (id_a, id_b, hamming): the accumulated answer.

Per batch (all bounded joins, no corpus self-join):

1. anti-join the batch's fingerprints against ``fp_members`` — only
   genuinely NEW ids proceed (a replayed batch is a no-op, which is
   what makes the whole operator idempotent without a checkpoint);
2. band the batch's distinct fingerprints and equi-join them against
   the upserted postings — pigeonhole-complete candidates (every
   pair within ``max_hamming < bands`` agrees on >= 1 slice);
3. expand qualifying fingerprint pairs to (new id, any member) pairs
   and merge them into ``near_pairs``.

Write order is crash-safe: pairs, then postings, then members — a
batch is "committed" only once ``fp_members`` lands, so a crash
between writes replays the batch and the anti-join/merge steps
re-converge to the same state.

Batch-equivalence contract (the oracle): after draining any prefix of
the stream, ``near_pairs`` equals the batch
``simhash_near_pairs`` over the same prefix — every qualifying pair
(x, y) is detected when the later of x, y arrives, because by then
the earlier one's fingerprint is in the postings index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from isilon_hadoop_tools_spark.operators.dedup import band_slice_array, simhash
from isilon_hadoop_tools_spark.plans.state import ParquetState

MEMBERS_SCHEMA = "id LONG, fp LONG"
POSTINGS_SCHEMA = "band_idx INT, band_val LONG, fp LONG"
PAIRS_SCHEMA = "id_a LONG, id_b LONG, hamming INT"


def simhash_index_apply_batch(
    batch: DataFrame,
    state: ParquetState,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    max_hamming: int = 3,
    bands: int = 4,
) -> None:
    """Fold one micro-batch of documents into the band index and
    append the newly-detected near-dup pairs (see module docstring)."""
    if max_hamming >= bands:
        raise ValueError("completeness requires max_hamming < bands")
    delta = simhash(batch, text_col, id_col, bits).select(
        "id", F.col("simhash").alias("fp")
    )
    members = state.read("fp_members", MEMBERS_SCHEMA)
    # eager localCheckpoint: batch-sized, consumed by the candidate
    # expansion AND the members merge — must not recompute the
    # fingerprint aggregation per consumer
    new_members = delta.join(
        members.select("id"), "id", "left_anti"
    ).localCheckpoint(eager=True)
    if not new_members.take(1):
        return  # replayed or empty batch: nothing to fold in
    postings = state.read("band_postings", POSTINGS_SCHEMA)
    delta_fps = new_members.select("fp").distinct().localCheckpoint(eager=True)
    new_fps = delta_fps.join(
        postings.filter(F.col("band_idx") == 0).select("fp"), "fp", "left_anti"
    )
    new_postings = new_fps.select(
        F.posexplode(band_slice_array(F.col("fp"), bits, bands)).alias(
            "band_idx", "band_val"
        ),
        "fp",
    ).select(F.col("band_idx").cast("int"), "band_val", "fp")
    all_postings = postings.unionByName(new_postings).localCheckpoint(eager=True)
    # pigeonhole candidates: batch's distinct fps x the full index,
    # keyed on (band slice index, slice value) — includes the
    # fp==fp case (identical fingerprints agree on every band)
    delta_banded = delta_fps.select(
        F.col("fp").alias("fp_d"),
        F.posexplode(band_slice_array(F.col("fp"), bits, bands)).alias(
            "band_idx", "band_val"
        ),
    )
    cand = (
        delta_banded.join(all_postings, ["band_idx", "band_val"])
        .select("fp_d", F.col("fp").alias("fp_o"))
        .distinct()
        .withColumn(
            "hamming",
            F.bit_count(F.col("fp_d").bitwiseXOR(F.col("fp_o"))).cast("int"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
    merged_members = members.unionByName(new_members)
    pairs = (
        cand.join(
            new_members.select(F.col("fp").alias("fp_d"), F.col("id").alias("_ida")),
            "fp_d",
        )
        .join(
            merged_members.select(
                F.col("fp").alias("fp_o"), F.col("id").alias("_idb")
            ),
            "fp_o",
        )
        .select(
            F.least("_ida", "_idb").alias("id_a"),
            F.greatest("_ida", "_idb").alias("id_b"),
            "hamming",
        )
        # drops self-pairs AND collapses the double emission of
        # both-new pairs (x from the batch side, y from the index
        # side and vice versa)
        .filter(F.col("id_a") < F.col("id_b"))
        .distinct()
    )
    current = state.read("near_pairs", PAIRS_SCHEMA)
    state.write(
        "near_pairs",
        current.unionByName(pairs)
        .groupBy("id_a", "id_b")
        .agg(F.min("hamming").cast("int").alias("hamming")),
    )
    state.write("band_postings", all_postings)
    state.write("fp_members", merged_members)


def simhash_stream_into_state(
    docs: DataFrame,
    state: ParquetState,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    max_hamming: int = 3,
    bands: int = 4,
    checkpoint: str | None = None,
) -> None:
    """Drain a document stream through
    :func:`simhash_index_apply_batch` via ``foreachBatch`` with
    ``trigger(availableNow)`` — the streaming twin of the batch
    ``simhash_near_pairs``, replay-proof with or without a
    checkpoint (the members anti-join makes every batch idempotent)."""

    def apply_batch(batch: DataFrame, _batch_id: int) -> None:
        simhash_index_apply_batch(
            batch,
            state,
            text_col=text_col,
            id_col=id_col,
            bits=bits,
            max_hamming=max_hamming,
            bands=bands,
        )

    writer = docs.writeStream.foreachBatch(apply_batch).trigger(availableNow=True)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    q = writer.start()
    q.awaitTermination()
