"""Scaling probe: time queries at sf0.01 vs sf0.1 (10x rows) and
report the wall-clock ratio — the per-operator linearity check behind
SURVEY §7.5's scale claims.

A ratio at or below ~10 means at-or-below-linear scaling (most
operators sit FAR below 10 locally because small-SF runs are
dominated by fixed job overhead — the interesting signal is any
operator whose ratio approaches or exceeds the data ratio, which
flags superlinear work like pair blowups). Two reps per scale, min
taken, warmup at sf0.001 first.

Usage::

    python tools/scale_probe.py [query ...]   # default: round-6 set
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from isilon_hadoop_tools_spark import suite  # noqa: E402
from isilon_hadoop_tools_spark.session import get_session  # noqa: E402

DEFAULT = (
    "events_sessions_batch",
    "events_value_quantiles",
    "orders_profile",
    "events_cdc_apply",
    "customer_blocked_editdist",
    "lineitem_part_pairs",
    "events_type_outliers",
    "events_incremental_rollup",
    "events_daily_gapfill",
    "events_type_pivot",
    "customer_priority_scd2",
    "events_multigrain_rollup",
    "nation_trade_pagerank",
    "multimodal_wav_features",
    "orders_expectations",
    "orders_table_checksum",
    "customer_spend_deciles",
    "lineitem_quantity_band_join",
    "events_week_from_day_rollup",
)


def timed(fn, spark, sf_dir: str, reps: int = 2) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    names = sys.argv[1:] or list(DEFAULT)
    spark = get_session("scale_probe")
    bad = 0
    for name in names:
        fn = suite.REGISTRY[name].spark
        fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
        t_small = timed(fn, spark, "/root/testdata/sf0.01")
        t_big = timed(fn, spark, "/root/testdata/sf0.1")
        ratio = t_big / t_small if t_small > 0 else float("inf")
        flag = "  <== SUPERLINEAR" if ratio > 10.0 else ""
        if flag:
            bad = 1
        print(f"{name}: sf0.01={t_small:.2f}s sf0.1={t_big:.2f}s ratio={ratio:.1f}x{flag}")
    return bad


if __name__ == "__main__":
    raise SystemExit(main())
