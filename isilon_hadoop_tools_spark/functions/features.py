"""OneFS feature-flag bitmap decode (reference ``onefs.py:68-215``,
``feature_is_supported`` at ``onefs.py:1010-1035``).

The reference models upgrade feature flags as ``(gen, bit)`` pairs
checked against the cluster's committed-features bitmap: per
generation, a list of entries each holding up to 64 bit offsets, with
``bit == entry_index * 64 + offset`` meaning supported
(``onefs.py:1029-1035``); a generation with no entries falls back to
``gen <= default_gen`` (``onefs.py:1027-1028``).

The engine re-expresses the decode relationally: a ``gen_bits`` table
``(gen, entry_idx, offsets array<int>)`` joined against a probe table
of features, the per-entry bit test as an ``exists`` higher-order
predicate, and the no-entries fallback as an aggregate-guarded
``coalesce`` — one pass, no driver loop, any number of features at
once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Generation ids from the reference's feature map (onefs.py:78-93).
GEN: dict[str, int] = {
    "INIT": 0x0000000,
    "JAWS": 0x7010100,
    "MOBY": 0x7020000,
    "ORCA": 0x7020100,
    "RIP0": 0x7030000,
    "RIP1": 0x7030100,
    "RIPT": 0x8000000,
    "HAPI": 0x8000100,
    "FRTR": 0x8010000,
    "NJMA": 0x8010100,
    "KANA": 0x8010200,
    "NDUU": 0x8010300,
    "PIPE": 0x8020000,
    "ERA1": 0x9000100,
}


def supported_features(
    gen_bits: DataFrame,
    probes: DataFrame,
    default_gen: int,
) -> DataFrame:
    """Decode feature support for every probe row.

    ``gen_bits``: ``(gen long, entry_idx int, offsets array<int>)`` —
    the committed-features bitmap. ``probes``: ``(feature string,
    feature_gen long, feature_bit int)``. Output: ``(feature,
    supported boolean)`` with the reference's exact semantics:
    supported iff any entry of the feature's gen contains
    ``feature_bit - entry_idx*64`` among its offsets; a gen absent
    from the bitmap falls back to ``feature_gen <= default_gen``.
    """
    hit = F.exists(
        F.col("offsets"),
        lambda o: F.col("feature_bit") == F.col("entry_idx") * 64 + o,
    )
    joined = (
        probes.join(gen_bits, probes["feature_gen"] == gen_bits["gen"], "left")
        .groupBy("feature", "feature_gen", "feature_bit")
        .agg(
            F.count("gen").alias("_n_entries"),
            F.max(hit).alias("_hit"),
        )
    )
    return joined.select(
        "feature",
        F.when(F.col("_n_entries") == 0, F.col("feature_gen") <= default_gen)
        .otherwise(F.coalesce(F.col("_hit"), F.lit(False)))
        .alias("supported"),
    )
