"""Bench harness: timed runs of the headline queries at sf0.1.

Runs each headline query from the oracle-checked suite against
``$SPARK_GRAFT_SF_DIR`` (default ``/root/testdata/sf0.1``) on
``local[$SPARK_GRAFT_CPUS]`` and prints exactly ONE JSON line::

    {"metric": "suite_wall_sec", "value": N, "unit": "sec",
     "queries": {"q1_pricing_summary": sec, ...},
     "reps": {"q1_pricing_summary": [sec, sec, sec], ...}, "sf": 0.1}

Each query is forced end-to-end with a ``noop`` write (full plan
execution, no driver-side collect cost). Before timing, every query
runs once against the sf0.001 smoke data: that compiles the plan and
generates its codegen classes, so the timed sf0.1 run measures
steady-state execution (what a resident cluster job sees), not
one-time JIT/compile overhead.

Each query is timed ``$SPARK_GRAFT_BENCH_REPS`` times (default 3) and
``queries`` reports the MIN; ``reps`` keeps every observation. On a
shared sandbox, single-rep walls swing with machine noise far more
than the effects being measured (observed up to 1.6x on identical
code/data); min-of-N is the standard noise floor estimator for
round-over-round regression detection.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from isilon_hadoop_tools_spark import suite  # noqa: E402
from isilon_hadoop_tools_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARMUP_SF_DIR = os.environ.get("SPARK_GRAFT_WARMUP_SF_DIR", "/root/testdata/sf0.001")
BENCH_REPS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))

# Headline set: one per major subsystem (scan+agg, joins, windows,
# events, text, dedup family, similarity).
HEADLINE = (
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "q8_market_share",
    "q18_large_volume_customers",
    "q21_waiting_suppliers",
    "top3_orders_per_customer",
    "customer_order_gaps",
    "events_hourly_rollup",
    "events_dedup_first",
    "events_asof_latest_order",
    "events_salted_type_counts",
    "doc_token_stats",
    "doc_winnow_fingerprints",
    "doc_repetition_stats",
    "doc_tfidf_topk",
    "doc_pack_chunks",
    "dedup_exact_docs",
    "dedup_ngram_jaccard",
    "dedup_minhash_signatures",
    "simhash_docs",
    "dedup_embedding_cosine",
    "ann_brute_force_cosine",
    "ann_ivf_probed",
    # round-6 additions: analytics / lakehouse / graph / audio families
    "events_sessions_batch",
    "events_cdc_apply",
    "events_multigrain_rollup",
    "customer_blocked_editdist",
    "lineitem_part_pairs",
    "nation_trade_pagerank",
    "multimodal_wav_features",
    # round-7 additions: close the r6 bench blind spots (PQ-ADC
    # search, entity resolution, SemDeDup, skew report, HLL merge)
    "ann_pq_adc",
    "customer_entity_resolution",
    "semantic_dedup_keep",
    "events_skew_report",
    "events_hll_merge_daily",
    # round-7 new operator families
    "customer_link_kcore",
    "dedup_lsh_recall",
    "multimodal_bmp_features",
    "events_type_mad_outliers",
    # round-9 additions: regression tripwires for the band-join,
    # sweep-line, wedge, and span-merge paths (r7 ask 8 / r8 ask 2)
    "multimodal_image_near_dups",
    "events_active_interval_union",
    "customer_link_triangles",
    "doc_dup_span_merged",
    # round-9 new operator families: compressed-image decode + hash +
    # band join end-to-end, the signature-collapsed LSH scale form,
    # and the RefinedWeb span cut. (The streaming index queries and
    # the brute-force recall evals are deliberately NOT benched: the
    # former measure state-store setup, the latter are O(n²) ground
    # truth by design — neither is a throughput path.)
    "multimodal_png_near_dups",
    "simhash_rep_pairs",
    "doc_dup_span_cut",
    # round-9 session additions: the IVF-PQ combined read path, LPA
    # label-join rounds, the BPE vocab-round loop, the 40-column
    # conditional-sum bootstrap agg, and GIF decode + mixed-container
    # band join. (events_cms_stream measures state-store setup and
    # the Good-Turing spectrum is a cheap scan — not benched.)
    "ann_ivf_pq",
    "customer_link_communities",
    "corpus_bpe_merges",
    "events_value_bootstrap_ci",
    "multimodal_mixed_near_dups",
    # the audio/video fingerprint chains (decode + integer filterbank
    # or temporal mosaic + band join), the Theil-Sen pair table, and
    # the BPE apply join — the remaining round-9 throughput paths
    "multimodal_audio_near_dups",
    "multimodal_video_near_dups",
    "events_theil_sen_trend",
    "corpus_bpe_tokenize",
    # round-10 additions: the prefix-filtered exact-Jaccard join (a
    # scale flagship, unbenched until now), the IVF-PQ + exact-rerank
    # read path, unigram-LM tokenizer EM training, and the unified
    # four-modality near-dup band join
    "doc_prefix_jaccard_pairs",
    "ann_ivf_pq_rerank",
    "corpus_unigram_lm",
    "multimodal_unified_near_dups",
    # round-10 second wave: the other two tokenizer-trio paths, the
    # governance/trend/attribution gates, hard-negative mining, and
    # the wedge-join node similarity — regression tripwires for the
    # new operator families. (events_psi_stream and
    # multimodal_unified_index_stream measure state-store setup, not
    # throughput — unbenched like the other streaming indexes.)
    "corpus_wordpiece_merges",
    "corpus_unigram_tokenize",
    "customer_l_diversity",
    "events_cusum_changepoint",
    "events_psi_drift",
    "events_last_touch_attribution",
    "customer_link_neighbor_jaccard",
    "embedding_hard_negatives",
)


def _sf_from_dir(sf_dir: str) -> float:
    name = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return -1.0


def run_query(fn, spark, sf_dir: str) -> float:
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> int:
    spark = get_session("bench")
    registry = suite.queries()
    names = [n for n in HEADLINE if n in registry]

    # Warmup: run every query once at the smoke scale so plan compile
    # + whole-stage-codegen class generation happen before the clock.
    for name in names:
        run_query(registry[name], spark, WARMUP_SF_DIR)

    # Python-worker pool warmup: the smoke-scale runs spawn only a few
    # pandas_udf workers (few partitions), so the first sf0.1-sized
    # Arrow stage would otherwise pay 32 process forks + numpy/pandas
    # imports inside the timed window. A resident cluster job has a
    # warm worker pool (spark.python.worker.reuse), so fork cost is
    # one-time, not steady-state.
    import pandas as _pd

    def _noop(batches):
        import numpy  # noqa: F401 — pre-import heavy deps in the worker

        for b in batches:
            yield _pd.DataFrame({"x": b["id"]})

    spark.range(0, 1024, 1, 64).mapInPandas(_noop, "x long").write.format(
        "noop"
    ).mode("overwrite").save()

    # Min-of-N: rep r of every query runs before rep r+1 of any query,
    # so a transient machine-load spike hits at most one rep per query
    # instead of all reps of the unlucky queries.
    reps: dict[str, list[float]] = {name: [] for name in names}
    for _ in range(BENCH_REPS):
        for name in names:
            reps[name].append(round(run_query(registry[name], spark, SF_DIR), 3))

    timings = {name: min(times) for name, times in reps.items()}

    result = {
        "metric": "suite_wall_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "reps": reps,
        "sf": _sf_from_dir(SF_DIR),
    }
    print(json.dumps(result), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
