"""Unit tests for operators/analytics.py (EA2-EA8): batch
sessionization, exact grouped quantiles, table profiling, CDC apply,
blocked edit-distance linkage, basket pairs, z-score outliers."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from isilon_hadoop_tools_spark.operators.analytics import (
    basket_pairs,
    blocked_edit_distance_pairs,
    cdc_apply,
    grouped_quantiles,
    profile_table,
    sessionize,
    zscore_outliers,
)

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _m(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )


def test_sessionize_splits_on_gap(spark):
    ev = _events(
        spark,
        [
            (1, _m(0), 7, 1.0),
            (2, _m(30), 7, 2.0),  # same session (30m < 2h gap)
            (3, _m(30 + 121), 7, 4.0),  # new session (121m > 120m)
            (4, _m(0), 8, 8.0),  # other user: own session
        ],
    )
    out = sessionize(ev, gap_minutes=120).orderBy("user_id", "session_seq")
    rows = out.collect()
    assert [(r.user_id, r.session_seq, r.n_events) for r in rows] == [
        (7, 0, 2),
        (7, 1, 1),
        (8, 0, 1),
    ]
    first = rows[0]
    assert first.session_value == 3.0
    assert first.duration_sec == 30 * 60


def test_sessionize_single_shuffle(spark):
    ev = _events(spark, [(1, _m(0), 7, 1.0)])
    plan = sessionize(ev)._jdf.queryExecution().executedPlan().toString()
    # window partitioning satisfies the groupBy distribution: exactly
    # one Exchange in the whole plan
    assert plan.count("Exchange") == 1, plan


def test_grouped_quantiles_exact(spark):
    df = spark.createDataFrame(
        [("a", float(v)) for v in range(1, 101)], "k string, v double"
    )
    out = {
        (r.prob): r.quantile
        for r in grouped_quantiles(df, "k", "v", [0.5, 0.9]).collect()
    }
    assert out == {0.5: 50.5, 0.9: 90.1}


def test_grouped_quantiles_approx_bound_holds(spark):
    from isilon_hadoop_tools_spark.operators.analytics import (
        grouped_quantiles_approx,
    )

    # skewed group (exponential-ish spacing) + uniform group: the
    # GK rank-error certificate must come back TRUE for every prob
    rows = [("skew", float(2**i % 9973)) for i in range(2000)]
    rows += [("uni", float(v)) for v in range(500)]
    df = spark.createDataFrame(rows, "k string, v double")
    out = grouped_quantiles_approx(
        df, "k", "v", [0.1, 0.5, 0.99], accuracy=100
    ).collect()
    assert len(out) == 6
    assert all(r.rank_err_ok for r in out)
    ns = {r.k: r.n for r in out}
    assert ns == {"skew": 2000, "uni": 500}


def test_grouped_quantiles_approx_tracks_exact_on_uniform(spark):
    from isilon_hadoop_tools_spark.operators.analytics import (
        grouped_quantiles_approx,
    )

    # high accuracy on a small group: certificate trivially TRUE and
    # group sizes correct even with duplicate values
    df = spark.createDataFrame(
        [("a", float(v % 10)) for v in range(100)], "k string, v double"
    )
    out = grouped_quantiles_approx(df, "k", "v", [0.5], accuracy=10000).collect()
    assert len(out) == 1 and out[0].rank_err_ok


def test_grouped_quantiles_approx_null_values_counted_nonnull(spark):
    from isilon_hadoop_tools_spark.operators.analytics import (
        grouped_quantiles_approx,
    )

    # n is the NON-NULL count (the rank measurement ignores NULLs) —
    # a group with NULL values must not inflate n or the tolerance
    rows = [("a", float(v)) for v in range(1, 51)] + [("a", None)] * 5
    df = spark.createDataFrame(rows, "k string, v double")
    out = grouped_quantiles_approx(df, "k", "v", [0.5], accuracy=1000).collect()
    assert len(out) == 1
    assert out[0].n == 50
    assert out[0].rank_err_ok


def test_equidepth_histogram_empty_input_returns_empty(spark):
    from isilon_hadoop_tools_spark.operators.analytics import (
        equidepth_histogram,
    )

    empty = spark.createDataFrame([], "v double")
    out = equidepth_histogram(empty, "v", 4)
    assert out.count() == 0
    assert out.columns == ["bucket", "n", "lo", "hi"]
    # all-NULL input hits the same NULL-edges path
    nulls = spark.createDataFrame([(None,), (None,)], "v double")
    assert equidepth_histogram(nulls, "v", 4).count() == 0


def test_profile_table_counts(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, None), (2, "y")], "a int, b string"
    )
    out = {r.column_name: r for r in profile_table(df, ["a", "b"]).collect()}
    assert out["a"].n_rows == 3 and out["a"].n_nulls == 0
    assert out["a"].n_distinct == 2
    assert out["a"].min_num == 1.0 and out["a"].max_num == 2.0
    assert out["b"].n_nulls == 1 and out["b"].n_distinct == 2
    assert out["b"].min_num is None and out["b"].max_num is None


def test_cdc_apply_last_op_wins_and_tombstone_drops(spark):
    log = spark.createDataFrame(
        [
            # key 1: insert then update — update's value wins
            (1, _m(0), 1, "I", 10.0),
            (2, _m(5), 1, "U", 11.0),
            # key 2: updated then deleted — absent from result
            (3, _m(0), 2, "U", 20.0),
            (4, _m(5), 2, "D", 0.0),
            # key 3: ts tie broken by event_id (higher id wins)
            (5, _m(0), 3, "U", 30.0),
            (6, _m(0), 3, "U", 31.0),
        ],
        "event_id long, ts timestamp, user_id long, op string, value double",
    )
    out = {
        r.user_id: r.value
        for r in cdc_apply(
            log, "user_id", "ts", "event_id", "op", "D", ["value"]
        ).collect()
    }
    assert out == {1: 11.0, 3: 31.0}


def test_blocked_editdist_cap_and_threshold(spark):
    df = spark.createDataFrame(
        [
            (1, "abcd"), (2, "abce"),  # block 'ab': distance-1 pair
            (3, "cdxx"), (7, "cdzz"),  # block 'cd': distance 2 -> excluded
            (4, "zz01"), (5, "zz02"), (6, "zz03"),  # block 'zz': capped out
        ],
        "id long, name string",
    )
    out = blocked_edit_distance_pairs(
        df, "id", "name", "substring(name, 1, 2)", max_dist=1, max_block=2
    ).collect()
    assert [(r.id_a, r.id_b, r.edit_dist) for r in out] == [(1, 2, 1)]


def test_basket_pairs_dedups_and_orders(spark):
    li = spark.createDataFrame(
        [
            (1, 10), (1, 20), (1, 20),  # duplicate item: pair counts once
            (2, 10), (2, 20),
            (2, 30),
        ],
        "l_orderkey long, l_partkey long",
    )
    out = basket_pairs(li, top_n=10).collect()
    assert (out[0].item_a, out[0].item_b, out[0].n_baskets) == (10, 20, 2)
    # remaining single-basket pairs tie-broken by (item_a, item_b)
    assert [(r.item_a, r.item_b) for r in out[1:]] == [(10, 30), (20, 30)]


def test_zscore_outliers_flags_extremes(spark):
    rows = [(i, _m(i), "a", 10.0) for i in range(20)]
    rows.append((99, _m(99), "a", 1000.0))  # the lone extreme value
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    out = zscore_outliers(ev, threshold=2.5).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n == 21 and r.n_outliers == 1


def test_zscore_uses_broadcast_join(spark):
    ev = spark.createDataFrame(
        [(1, _m(0), "a", 1.0), (2, _m(1), "a", 2.0)],
        "event_id long, ts timestamp, event_type string, value double",
    )
    plan = (
        zscore_outliers(ev)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, plan


def test_incremental_rollup_merges_to_full_recompute(spark):
    from isilon_hadoop_tools_spark.operators.analytics import (
        incremental_rollup,
    )

    rows = [
        (i, T0 + dt.timedelta(days=i % 4, minutes=i), "a", float(i))
        for i in range(12)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    # cutoff mid-span: merged partials must equal the flat rollup
    merged = incremental_rollup(ev, cutoff="2024-01-03 00:00:00")
    flat = (
        ev.groupBy(
            F.date_trunc("day", "ts").alias("day"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, flat.collect())
    )


def test_gapfill_daily_zero_fills_gaps(spark):
    from isilon_hadoop_tools_spark.operators.analytics import gapfill_daily

    ev = spark.createDataFrame(
        [
            (1, T0, 7, 1.0),
            (2, T0 + dt.timedelta(days=3), 7, 1.0),  # days 1-2 are gaps
        ],
        "event_id long, ts timestamp, user_id long, value double",
    )
    out = gapfill_daily(ev).orderBy("day").collect()
    assert [r.n_events for r in out] == [1, 0, 0, 1]
    assert len(out) == 4


def test_scd2_history_runs_and_versions(spark):
    from isilon_hadoop_tools_spark.operators.analytics import scd2_history

    df = spark.createDataFrame(
        [
            (7, "LOW", T0, 1),
            (7, "LOW", T0 + dt.timedelta(days=1), 2),   # same run
            (7, "HIGH", T0 + dt.timedelta(days=2), 3),  # change
            (7, "LOW", T0 + dt.timedelta(days=3), 4),   # change back
        ],
        "k long, prio string, ts timestamp, ok long",
    )
    out = scd2_history(df, "k", "prio", "ts", "ok").orderBy("version").collect()
    assert [(r.prio, r.version) for r in out] == [
        ("LOW", 1), ("HIGH", 2), ("LOW", 3)
    ]
    assert out[0].valid_to == out[1].valid_from
    assert out[2].valid_to is None


def test_scd2_point_in_time_join_picks_effective_version(spark):
    from isilon_hadoop_tools_spark.operators.analytics import (
        scd2_point_in_time_join,
    )

    day = dt.timedelta(days=1)
    dim = spark.createDataFrame(
        [
            (7, "LOW", T0, T0 + 2 * day, 1),
            (7, "HIGH", T0 + 2 * day, None, 2),
        ],
        "k long, prio string, valid_from timestamp, "
        "valid_to timestamp, version long",
    )
    facts = spark.createDataFrame(
        [
            (100, 7, T0 - day),       # before first version -> NULLs
            (101, 7, T0),             # inclusive lower bound -> LOW
            (102, 7, T0 + 2 * day),   # exclusive upper bound -> HIGH
            (103, 7, T0 + 9 * day),   # open-ended current -> HIGH
            (104, 8, T0),             # no history at all -> NULLs
        ],
        "fid long, k long, ts timestamp",
    )
    out = {
        r.fid: r
        for r in scd2_point_in_time_join(facts, dim, "k", "ts").collect()
    }
    assert len(out) == 5  # disjoint versions: no fact row duplicated
    assert (out[100].prio, out[100].version) == (None, None)
    assert (out[101].prio, out[101].version) == ("LOW", 1)
    assert (out[102].prio, out[102].version) == ("HIGH", 2)
    assert (out[103].prio, out[103].version) == ("HIGH", 2)
    assert (out[104].prio, out[104].version) == (None, None)


def test_pivot_counts_static_schema_and_zero_fill(spark):
    from isilon_hadoop_tools_spark.operators.analytics import pivot_counts

    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "b"), (2, "b")], "k long, t string"
    )
    out = {r.k: r for r in pivot_counts(df, "k", "t", ["a", "b", "c"]).collect()}
    assert (out[1].a, out[1].b, out[1].c) == (2, 1, 0)
    assert (out[2].a, out[2].b, out[2].c) == (0, 1, 0)


def test_expectations_counts_each_rule_kind(spark):
    from isilon_hadoop_tools_spark.operators.analytics import expectations

    df = spark.createDataFrame(
        [
            (1, "O", 10.0),
            (1, "F", -5.0),   # duplicate key; negative price
            (None, "X", 20.0),  # null key; bad status
        ],
        "k long, status string, price double",
    )
    out = {
        r.rule_name: (r.n_violations, r.passed)
        for r in expectations(
            df,
            [
                ("k_not_null", "not_null", "k"),
                ("k_unique", "unique", "k"),
                ("status_ok", "accepted_values", "status", ["O", "F"]),
                ("price_ok", "range", "price", 0, 100),
            ],
        ).collect()
    }
    assert out == {
        "k_not_null": (1, False),
        "k_unique": (1, False),   # two non-null rows, one distinct value
        "status_ok": (1, False),
        "price_ok": (1, False),
    }


def test_expectations_single_scan(spark):
    from isilon_hadoop_tools_spark.operators.analytics import expectations

    df = spark.range(10).selectExpr("id AS k")
    plan = (
        expectations(df, [("a", "not_null", "k"), ("b", "unique", "k")])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan ExistingRDD") + plan.count("Range") <= 1


def test_table_checksum_order_and_partition_independent(spark):
    from isilon_hadoop_tools_spark.operators.analytics import table_checksum

    rows = [(i, f"s{i % 3}") for i in range(50)]
    a = spark.createDataFrame(rows, "k long, s string").repartition(7)
    b = spark.createDataFrame(list(reversed(rows)), "k long, s string").coalesce(1)
    ca = table_checksum(a, ["k", "s"]).collect()[0]
    cb = table_checksum(b, ["k", "s"]).collect()[0]
    assert (ca.checksum, ca.n_rows) == (cb.checksum, cb.n_rows)
    # a single changed row changes the digest
    mutated = spark.createDataFrame(
        rows[:-1] + [(49, "CHANGED")], "k long, s string"
    )
    cm = table_checksum(mutated, ["k", "s"]).collect()[0]
    assert cm.checksum != ca.checksum and cm.n_rows == ca.n_rows


def test_mad_outliers_flags_extreme_robustly(spark):
    from isilon_hadoop_tools_spark.operators.analytics import mad_outliers

    # 20 values near 10 plus one at 1000: median/MAD flags exactly the
    # extreme (a mean/stddev z-score at 2.5 would be dragged by it)
    rows = [("a", 10.0 + (i % 5) * 0.1) for i in range(20)] + [("a", 1000.0)]
    rows += [("const", 7.0)] * 5  # constant group: MAD=0 -> 0 outliers
    df = spark.createDataFrame(rows, "k string, v double")
    out = {r.k: r for r in mad_outliers(df, "k", "v").collect()}
    assert out["a"].n_outliers == 1 and out["a"].n == 21
    assert out["const"].n_outliers == 0 and out["const"].mad_value == 0.0


def test_time_weighted_avg_holds_until_next(spark):
    from isilon_hadoop_tools_spark.operators.analytics import (
        time_weighted_avg,
    )

    # value 10 held 30s, value 20 held 10s, last reading weightless:
    # twa = (10*30 + 20*10) / 40 = 12.5
    ev = _events(
        spark,
        [
            (1, T0, 7, 10.0),
            (2, T0 + dt.timedelta(seconds=30), 7, 20.0),
            (3, T0 + dt.timedelta(seconds=40), 7, 999.0),
            (4, T0, 8, 5.0),  # single reading: null twa
        ],
    )
    out = {r.user_id: r for r in time_weighted_avg(ev).collect()}
    assert out[7].n_intervals == 2 and out[7].total_sec == 40
    assert out[7].twa == 12.5
    assert out[8].n_intervals == 0 and out[8].twa is None


def test_interval_union_merges_overlaps(spark):
    from isilon_hadoop_tools_spark.operators.analytics import (
        interval_union_length,
    )

    rows = [
        # key 1: [0,10] + [5,20] overlap -> one island len 20;
        # [30,40] separate -> union 30, 2 islands
        (1, 0, 10), (1, 5, 20), (1, 30, 40),
        # key 2: touching intervals [0,10] + [10,15] merge
        (2, 0, 10), (2, 10, 15),
    ]
    df = spark.createDataFrame(rows, "k long, s long, e long")
    out = {r.k: r for r in interval_union_length(df, "k", "s", "e").collect()}
    assert (out[1].n_intervals, out[1].n_islands, out[1].union_len) == (3, 2, 30)
    assert (out[2].n_intervals, out[2].n_islands, out[2].union_len) == (2, 1, 15)


def test_interval_union_single_exchange(spark):
    from isilon_hadoop_tools_spark.operators.analytics import (
        interval_union_length,
    )

    df = spark.createDataFrame([(1, 0, 10)], "k long, s long, e long")
    plan = (
        interval_union_length(df, "k", "s", "e")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan


def test_mad_outliers_broadcasts_stats(spark):
    from isilon_hadoop_tools_spark.operators.analytics import mad_outliers

    ev = spark.createDataFrame(
        [(1, _m(0), "a", 1.0), (2, _m(1), "a", 2.0)],
        "event_id long, ts timestamp, event_type string, value double",
    )
    plan = mad_outliers(ev)._jdf.queryExecution().executedPlan().toString()
    # both stat joins (median back onto the fact, then med+mad) must
    # be explicit broadcasts — never a shuffle of the fact per pass
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_time_weighted_avg_single_exchange(spark):
    from isilon_hadoop_tools_spark.operators.analytics import (
        time_weighted_avg,
    )

    ev = _events(spark, [(1, _m(0), 7, 1.0), (2, _m(1), 7, 2.0)])
    plan = (
        time_weighted_avg(ev)._jdf.queryExecution().executedPlan().toString()
    )
    # the lead window's key partitioning satisfies the groupBy
    assert plan.count("Exchange") == 1, plan


def test_equidepth_histogram_balanced_buckets(spark):
    from isilon_hadoop_tools_spark.operators.analytics import (
        equidepth_histogram,
    )

    # heavy-tailed data: 900 small values + 100 huge ones — equi-depth
    # buckets stay ~equal-sized where equi-width would collapse
    rows = [(float(i % 90),) for i in range(900)]
    rows += [(float(100000 + i),) for i in range(100)]
    df = spark.createDataFrame(rows, "v double")
    out = equidepth_histogram(df, "v", 10).collect()
    assert len(out) == 10
    sizes = sorted(r.n for r in out)
    assert sizes[0] >= 50 and sizes[-1] <= 200  # no collapsed/hot bucket
    # buckets are ordered, non-overlapping ranges
    by_b = sorted(out, key=lambda r: r.bucket)
    for a, b in zip(by_b, by_b[1:]):
        assert a.hi <= b.lo


def test_ols_trend_recovers_planted_slope(spark):
    from isilon_hadoop_tools_spark.operators.analytics import ols_trend

    # perfect line: value = 2*day + 5 -> slope 2/day, r2 = 1
    rows = [
        (i, T0 + dt.timedelta(days=i), "a", 2.0 * i + 5.0) for i in range(10)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    r = ols_trend(ev).collect()[0]
    assert r.n == 10 and r.r2 == 1.0
    assert abs(r.slope_per_day - 2.0) < 1e-6


def test_corr_matrix_perfect_and_anti_correlation(spark):
    from isilon_hadoop_tools_spark.operators.analytics import corr_matrix

    df = spark.createDataFrame(
        [(float(i), 2.0 * i, -3.0 * i) for i in range(20)],
        "a double, b double, c double",
    )
    out = {(r.col_a, r.col_b): r.corr for r in corr_matrix(df, ["a", "b", "c"]).collect()}
    assert out[("a", "b")] == 1.0
    assert out[("a", "c")] == -1.0
    assert out[("b", "c")] == -1.0


def test_interval_overlap_join_brute_force_equivalence(spark):
    from itertools import combinations

    from isilon_hadoop_tools_spark.operators.analytics import (
        interval_overlap_join,
    )

    # mixed shapes: nested, touching (no overlap), disjoint, long
    # outlier spanning many buckets, zero-length (dropped), and a
    # second key
    rows = [
        (1, 10, 0, 10),
        (1, 11, 5, 15),     # overlaps 10
        (1, 12, 10, 20),    # touches 10 (no), overlaps 11
        (1, 13, 2, 4),      # nested in 10
        (1, 14, 30, 31),    # disjoint
        (1, 15, 0, 100),    # long outlier: overlaps 10-13 and 14
        (1, 16, 50, 50),    # zero-length: dropped
        (2, 20, 0, 10),
        (2, 21, 9, 12),
    ]
    df = spark.createDataFrame(rows, "k LONG, id LONG, s LONG, e LONG")
    for width in (None, 1, 3, 1000):
        got = {
            (r["k"], r["id_a"], r["id_b"]): r["overlap"]
            for r in interval_overlap_join(
                df, "k", "id", "s", "e", bucket_width=width
            ).collect()
        }
        want = {}
        by_k = {}
        for k, i, s, e in rows:
            if e > s:
                by_k.setdefault(k, []).append((i, s, e))
        for k, items in by_k.items():
            for (i1, s1, e1), (i2, s2, e2) in combinations(items, 2):
                if s1 < e2 and s2 < e1:
                    a, b = min(i1, i2), max(i1, i2)
                    want[(k, a, b)] = min(e1, e2) - max(s1, s2)
        assert got == want, f"width={width}"
    # sanity on the fixture itself: touching pair absent, nesting in
    assert (1, 10, 12) not in got and (1, 10, 13) in got


def test_locf_fill_carries_forward_never_backward(spark):
    from isilon_hadoop_tools_spark.operators.analytics import locf_fill

    day = dt.timedelta(days=1)
    df = spark.createDataFrame(
        [
            (1, 7, T0, None),            # before first obs -> stays NULL
            (2, 7, T0 + day, 10.0),      # observation
            (3, 7, T0 + 2 * day, None),  # -> 10.0
            (4, 7, T0 + 3 * day, 20.0),  # new observation
            (5, 7, T0 + 4 * day, None),  # -> 20.0
            (6, 8, T0 + 5 * day, None),  # other key: no bleed -> NULL
        ],
        "eid long, k long, ts timestamp, obs double",
    )
    out = {
        r.eid: r.filled
        for r in locf_fill(df, "k", "ts", F.col("obs"), "eid").collect()
    }
    assert out == {1: None, 2: 10.0, 3: 10.0, 4: 20.0, 5: 20.0, 6: None}


def test_ab_lift_zscore_detects_planted_effect(spark):
    from isilon_hadoop_tools_spark.functions.hashing import stable_hash32
    from isilon_hadoop_tools_spark.operators.analytics import ab_lift_zscore

    # plant a +10 effect on arm B by computing each unit's arm with
    # the operator's own hash, then check the readout recovers it
    units = spark.range(200).select(F.col("id").alias("u"))
    arm_a = stable_hash32(F.col("u").cast("string")) % 2 == 0
    df = units.select(
        "u",
        F.lit("m").alias("g"),
        F.when(arm_a, F.lit(5.0)).otherwise(F.lit(15.0)).alias("v"),
    )
    # tiny per-unit jitter so variances are nonzero (deterministic)
    df = df.withColumn("v", F.col("v") + (F.col("u") % 7) * 0.01)
    r = ab_lift_zscore(df, "u", "g", "v").collect()[0]
    assert r.n_a + r.n_b == 200 and min(r.n_a, r.n_b) > 50
    assert abs(r.lift - 10.0) < 0.05
    assert r.z > 50  # overwhelming significance for a planted effect


def test_ab_lift_assignment_is_rerun_stable(spark):
    from isilon_hadoop_tools_spark.operators.analytics import ab_lift_zscore

    df = spark.range(100).select(
        F.col("id").alias("u"), F.lit("g").alias("g"),
        (F.col("id") % 5).cast("double").alias("v"),
    )
    a = ab_lift_zscore(df, "u", "g", "v").collect()[0]
    b = ab_lift_zscore(df.repartition(7), "u", "g", "v").collect()[0]
    assert a == b  # partitioning/order cannot move units between arms


def test_median_of_means_resists_outlier(spark):
    from isilon_hadoop_tools_spark.operators.analytics import median_of_means

    rows = [(i, "a", 10.0) for i in range(90)]
    rows.append((90, "a", 1_000_000.0))  # one catastrophic outlier
    df = spark.createDataFrame(rows, "id LONG, g STRING, v DOUBLE")
    r = median_of_means(df, "g", "v", "id", buckets=9).collect()[0]
    assert r.n == 91 and r.n_buckets == 9
    assert r.mean > 10000  # plain mean is ruined
    assert abs(r.mom_mean - 10.0) < 1.0  # MoM is not


def test_median_of_means_even_bucket_count_lower_median(spark):
    from isilon_hadoop_tools_spark.operators.analytics import median_of_means

    # ids chosen so only SOME hash buckets are hit (tiny group) —
    # the lower-median rule must still return exactly one row
    df = spark.createDataFrame(
        [(i, "g", float(i)) for i in range(6)], "id LONG, g STRING, v DOUBLE"
    )
    out = median_of_means(df, "g", "v", "id", buckets=9).collect()
    assert len(out) == 1
    assert out[0].n == 6


def test_poisson_thresholds_match_cdf(spark):
    """Thresholds are floor(P(X<=k) * 2^32) for Poisson(1), strictly
    increasing, and the implied weight probabilities sum to ~1."""
    import math

    from isilon_hadoop_tools_spark.operators.analytics import (
        poisson_thresholds,
    )

    ts = poisson_thresholds()
    assert ts == sorted(ts) and len(set(ts)) == len(ts)
    e = math.exp(-1.0)
    acc, term = e, e
    for k, t in enumerate(ts):
        assert t == int(acc * 2**32)
        term /= k + 1
        acc += term
    # tail mass lumped into w = max_w is tiny
    assert (2**32 - ts[-1]) / 2**32 < 1e-3


def test_poisson_bootstrap_ci_brackets_mean_and_is_deterministic(spark):
    """On a well-behaved sample the CI brackets the point mean; two
    runs (and a repartitioned run) give identical intervals — the
    draws are content-addressed, not rand()."""
    from isilon_hadoop_tools_spark.operators.analytics import (
        poisson_bootstrap_ci,
    )

    rows = [(i, "g", float((i * 37) % 100)) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, grp string, v double")
    a = poisson_bootstrap_ci(df, "grp", "v", "id").collect()[0]
    b = poisson_bootstrap_ci(
        df.repartition(7), "grp", "v", "id"
    ).collect()[0]
    assert a["n"] == 400 and a["n_replicates"] == 20
    assert a["ci_lo"] <= a["mean"] <= a["ci_hi"]
    assert a["ci_lo"] < a["ci_hi"]
    assert (a["ci_lo"], a["ci_hi"], a["mean"]) == (
        b["ci_lo"], b["ci_hi"], b["mean"])


def test_k_anonymity_planted_small_groups(spark):
    """90 rows in k>=5 classes plus one 2-row class and one
    singleton: the audit reports min 1, 2 groups / 3 rows below
    k=5, and k_anonymous false; coarsening the quasi set makes it
    pass."""
    from pyspark.sql import functions as F

    from isilon_hadoop_tools_spark.operators.analytics import (
        k_anonymity_report,
    )

    rows = [(i, i % 3, "x") for i in range(90)]
    rows += [(90, 7, "y"), (91, 7, "y"), (92, 9, "z")]
    df = spark.createDataFrame(rows, "id long, qa long, qb string")
    r = k_anonymity_report(df, ["qa", "qb"], k=5).collect()[0]
    assert r["n_rows"] == 93
    assert r["n_groups"] == 5
    assert r["min_group_size"] == 1
    assert r["groups_below_k"] == 2
    assert r["rows_below_k"] == 3
    assert not r["k_anonymous"]
    # coarser quasi set (drop qb, band qa mod 3 merges the outliers
    # into the big classes) => all classes >= 5
    r2 = k_anonymity_report(
        df, [(F.col("qa") % 3).alias("qa_band")], k=5
    ).collect()[0]
    assert r2["min_group_size"] >= 5
    assert r2["k_anonymous"]


def test_l_diversity_homogeneity_attack_caught(spark):
    """The case k-anonymity waves through and l-diversity must catch:
    a 50-row class (k-anonymous at any reasonable k) whose rows ALL
    share one sensitive value is 1-diverse; a small 3-row class with
    3 distinct values passes l=3."""
    from isilon_hadoop_tools_spark.operators.analytics import (
        k_anonymity_report,
        l_diversity_report,
    )

    rows = [(i, 1, "flu") for i in range(50)]  # big, homogeneous
    rows += [(100, 2, "flu"), (101, 2, "cold"), (102, 2, "ok")]
    df = spark.createDataFrame(rows, "id long, qa long, s string")
    k = k_anonymity_report(df, ["qa"], k=3).collect()[0]
    assert k["k_anonymous"]  # both classes have >= 3 rows
    r = l_diversity_report(df, ["qa"], "s", l=3).collect()[0]
    assert r["n_rows"] == 53
    assert r["n_groups"] == 2
    assert r["min_l"] == 1  # the homogeneous class
    assert r["groups_below_l"] == 1
    assert r["rows_below_l"] == 50
    assert r["frac_rows_below_l"] == round(50 / 53, 6)
    assert not r["l_diverse"]
    # l=1 always passes on non-empty classes
    assert l_diversity_report(df, ["qa"], "s", l=1).collect()[0][
        "l_diverse"
    ]


def test_trimmed_mean_removes_planted_outliers(spark):
    """99 well-behaved values + one huge outlier per group: the plain
    mean is dragged, the 5% trimmed mean stays at the clean center
    and drops exactly the tail rows."""
    from isilon_hadoop_tools_spark.operators.analytics import trimmed_mean

    rows = [(i, "g", float(100 + i % 11)) for i in range(99)]
    rows.append((99, "g", 1_000_000.0))
    df = spark.createDataFrame(rows, "id long, grp string, v double")
    r = trimmed_mean(df, "grp", "v", "id", trim=0.05).collect()[0]
    assert r["n"] == 100
    assert r["n_kept"] < 100
    assert r["mean"] > 10000  # outlier dominates the plain mean
    assert 100 <= r["trimmed_mean"] <= 111  # clean center survives


def test_ordered_funnel_enforces_sequence(spark):
    """User 1 does view->click->purchase in order (full chain); user
    2 purchases BEFORE viewing (chain stops after view); user 3 only
    clicks (never starts). The horizon/co-occurrence funnel would
    count user 2's purchase; the ordered funnel must not."""
    from isilon_hadoop_tools_spark.operators.analytics import ordered_funnel

    rows = [
        (1, "view", _m(0)), (1, "click", _m(5)), (1, "purchase", _m(9)),
        (2, "purchase", _m(0)), (2, "view", _m(5)),
        (3, "click", _m(1)),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    r = ordered_funnel(
        df, "user_id", "event_type", "ts", ["view", "click", "purchase"]
    ).collect()[0]
    assert r["n_users"] == 3
    assert r["n_step1"] == 2  # users 1 and 2 viewed
    assert r["n_step2"] == 1  # only user 1 clicked after viewing
    assert r["n_step3"] == 1  # only user 1 purchased after clicking
    assert r["rate_step3"] == round(1 / 3, 6)


def test_ordered_funnel_greedy_earliest_is_maximal(spark):
    """view at t0 and t10, click only at t5: greedy anchors on the
    EARLIEST view so the t5 click still converts (anchoring on the
    last view would miss it)."""
    from isilon_hadoop_tools_spark.operators.analytics import ordered_funnel

    rows = [(1, "view", _m(0)), (1, "view", _m(10)), (1, "click", _m(5))]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    r = ordered_funnel(
        df, "user_id", "event_type", "ts", ["view", "click"]
    ).collect()[0]
    assert (r["n_step1"], r["n_step2"]) == (1, 1)


def test_theil_sen_ignores_anomalous_day(spark):
    """Daily counts 10, 12, 14, 16, 18 (+2/day) with day 3 spiked to
    200: OLS would be dragged, the pairwise-median slope stays 2."""
    from isilon_hadoop_tools_spark.operators.analytics import (
        theil_sen_trend,
    )

    rows = []
    counts = [10, 12, 200, 16, 18]
    eid = 0
    for day, c in enumerate(counts):
        for _ in range(c):
            rows.append((eid, "a", _m(day * 24 * 60)))
            eid += 1
    df = spark.createDataFrame(rows, "id long, event_type string, ts timestamp")
    r = theil_sen_trend(df, "event_type", "ts").collect()[0]
    assert r["n_days"] == 5
    assert r["n_pairs"] == 10
    assert r["ts_slope"] == 2.0


def test_theil_sen_single_day_group_reported_not_dropped(spark):
    """A group active on exactly one day has zero slope pairs: it
    must still appear — (n_days=1, n_pairs=0, NULL slope) — so group
    lists diff cleanly against ols_trend."""
    from isilon_hadoop_tools_spark.operators.analytics import (
        theil_sen_trend,
    )

    rows = [(0, "multi", _m(0)), (1, "multi", _m(24 * 60))]
    rows += [(2, "single", _m(10)), (3, "single", _m(20))]
    df = spark.createDataFrame(
        rows, "id long, event_type string, ts timestamp"
    )
    got = {r["event_type"]: r for r in theil_sen_trend(
        df, "event_type", "ts"
    ).collect()}
    assert set(got) == {"multi", "single"}
    s = got["single"]
    assert (s["n_days"], s["n_pairs"], s["ts_slope"]) == (1, 0, None)
    m = got["multi"]
    assert (m["n_days"], m["n_pairs"], m["ts_slope"]) == (2, 1, 0.0)


def test_cusum_finds_planted_level_shift(spark):
    """Daily counts 10x7 then 30x7: the cumulative deviation |T|
    peaks at the last pre-shift day, direction 'up'; reversing the
    shift flips the direction; a flat series reports direction
    'none' at the earliest-day tie."""
    from isilon_hadoop_tools_spark.operators.analytics import (
        cusum_changepoint,
    )

    rows = []
    eid = 0
    for day in range(14):
        for _ in range(10 if day < 7 else 30):
            rows.append((eid, "up", _m(day * 24 * 60)))
            eid += 1
        for _ in range(30 if day < 7 else 10):
            rows.append((eid, "down", _m(day * 24 * 60)))
            eid += 1
        rows.append((eid, "flat", _m(day * 24 * 60)))
        eid += 1
    df = spark.createDataFrame(
        rows, "id long, event_type string, ts timestamp"
    )
    got = {r["event_type"]: r for r in cusum_changepoint(
        df, "event_type", "ts"
    ).collect()}
    up = got["up"]
    assert up["n_days"] == 14
    assert up["cp_day"].day == 7  # days 1..14; shift after day 7
    assert up["direction"] == "up"
    # |S| at the peak: 7 days each 10 below the mean of 20 => 70
    assert up["cusum_abs"] == 70.0
    down = got["down"]
    assert down["cp_day"].day == 7 and down["direction"] == "down"
    assert down["cusum_abs"] == 70.0
    flat = got["flat"]
    assert flat["direction"] == "none"
    assert flat["cusum_abs"] == 0.0
    assert flat["cp_day"].day == 1  # earliest-day tie-break


def test_psi_drift_planted_shift_and_identity(spark):
    """Identical cohorts give PSI ~= 0 (exactly 0 when counts are
    equal: p == q per band); a planted mass shift produces a large
    positive PSI; silent bands still appear via the spine with
    smoothed shares."""
    from isilon_hadoop_tools_spark.operators.analytics import psi_drift

    rows = [(float(v % 100), "base") for v in range(1000)]
    rows += [(float(v % 100), "cur") for v in range(1000)]
    df = spark.createDataFrame(rows, "value double, cohort string")
    same = psi_drift(
        df, "value",
        in_base=F.col("cohort") == "base",
        in_cur=F.col("cohort") == "cur",
        breaks=[25, 50, 75],
    ).collect()
    assert len(same) == 4
    assert all(r["psi_term"] == 0.0 and r["psi_total"] == 0.0 for r in same)
    # shift: current cohort concentrated in the top band
    rows2 = [(float(v % 100), "base") for v in range(1000)]
    rows2 += [(90.0, "cur")] * 1000
    df2 = spark.createDataFrame(rows2, "value double, cohort string")
    out = psi_drift(
        df2, "value",
        in_base=F.col("cohort") == "base",
        in_cur=F.col("cohort") == "cur",
        breaks=[25, 50, 75],
    ).collect()
    assert len(out) == 4
    total = out[0]["psi_total"]
    assert all(r["psi_total"] == total for r in out)
    assert total > 0.25  # the conventional "shifted" gate
    by_band = {r["band"]: r for r in out}
    # bands 0-2 lost all current mass but keep smoothed nonzero share
    for b in range(3):
        assert by_band[b]["n_cur"] == 0
        assert by_band[b]["p_cur"] > 0.0
    # shares are the add-one rationals
    assert by_band[3]["p_cur"] == round(1001 / 1004, 6)


def test_js_divergence_identity_bound_and_symmetry(spark):
    """Identical cohorts give JS exactly 0 per band; a total mass
    shift approaches but never exceeds the ln 2 bound; swapping the
    cohorts leaves every term unchanged (JS is symmetric, unlike
    PSI's directional log-ratio terms which merely cancel in pairs)."""
    import math

    from pyspark.sql import functions as F

    from isilon_hadoop_tools_spark.operators.analytics import (
        js_divergence_drift,
    )

    rows = [(float(v % 100), "base") for v in range(1000)]
    rows += [(float(v % 100), "cur") for v in range(1000)]
    df = spark.createDataFrame(rows, "value double, cohort string")
    same = js_divergence_drift(
        df, "value",
        in_base=F.col("cohort") == "base",
        in_cur=F.col("cohort") == "cur",
        breaks=[25, 50, 75],
    ).collect()
    assert len(same) == 4
    assert all(r["js_term"] == 0.0 and r["js_total"] == 0.0 for r in same)
    # disjoint supports: JS saturates toward (but below) ln 2
    rows2 = [(10.0, "base")] * 1000 + [(90.0, "cur")] * 1000
    df2 = spark.createDataFrame(rows2, "value double, cohort string")
    kw = dict(
        in_base=F.col("cohort") == "base",
        in_cur=F.col("cohort") == "cur",
        breaks=[25, 50, 75],
    )
    out = js_divergence_drift(df2, "value", **kw).collect()
    total = out[0]["js_total"]
    assert 0.6 < total < math.log(2)
    # symmetry: swap the cohort predicates, terms are identical
    swapped = js_divergence_drift(
        df2, "value",
        in_base=F.col("cohort") == "cur",
        in_cur=F.col("cohort") == "base",
        breaks=[25, 50, 75],
    ).collect()
    a = {r["band"]: r["js_term"] for r in out}
    b = {r["band"]: r["js_term"] for r in swapped}
    assert a == b


def test_dp_laplace_counts_pipeline_and_hand_check(spark):
    """The Laplace pipeline hand-verified for one group key (md5 →
    uniform → inverse CDF, b = 1/ε), plus the release invariants:
    released = clamp(floor(noisy+½), 0) ≥ 0, scale shrinks as ε
    grows, ε ≤ 0 rejected."""
    import hashlib
    import math

    from pyspark.sql import functions as F

    from isilon_hadoop_tools_spark.operators.analytics import (
        dp_laplace_counts,
    )

    rows = [(f"g{i % 50}", i) for i in range(500)]
    df = spark.createDataFrame(rows, "grp string, x long")
    out = {r["grp"]: r for r in dp_laplace_counts(
        df, ["grp"], epsilon=1.0, seed=7
    ).collect()}
    assert len(out) == 50
    # hand-replicate the noise for one key
    h = int(hashlib.md5(b"7:g3").hexdigest()[:8], 16)
    u = (h + 0.5) / 4294967296.0
    want = round((-1.0 * math.copysign(1.0, u - 0.5))
                 * math.log(1.0 - 2.0 * abs(u - 0.5)), 6)
    assert out["g3"]["noise"] == pytest.approx(want, abs=1e-9)
    assert out["g3"]["n_true"] == 10
    for r in out.values():
        assert r["released"] >= 0
        assert r["released"] == max(
            math.floor(round(r["n_true"] + r["noise"], 6) + 0.5), 0
        )
    # higher epsilon -> strictly smaller |noise| for the same key
    tight = {r["grp"]: r for r in dp_laplace_counts(
        df, ["grp"], epsilon=10.0, seed=7
    ).collect()}
    assert abs(tight["g3"]["noise"]) < abs(out["g3"]["noise"])
    with pytest.raises(ValueError):
        dp_laplace_counts(df, ["grp"], epsilon=0.0)


def test_dp_laplace_counts_null_key_raises(spark):
    """ADVICE guard: a NULL key component used to merge with the
    empty string under concat_ws, so two distinct groups silently
    drew IDENTICAL noise. Now the plan raises at execution."""
    from isilon_hadoop_tools_spark.operators.analytics import (
        dp_laplace_counts,
    )

    df = spark.createDataFrame(
        [("a", 1), (None, 2), ("b", 3)], "grp string, x long"
    )
    with pytest.raises(Exception, match="NULL in key column"):
        dp_laplace_counts(df, ["grp"]).collect()
    # non-null frames are unaffected
    ok = dp_laplace_counts(df.filter("grp IS NOT NULL"), ["grp"]).collect()
    assert len(ok) == 2


def test_ad_drift_overflow_raises_not_understates(spark):
    """ADVICE guard: beyond the documented N bound the DECIMAL(38,0)
    term product overflows to NULL and F.sum would silently SKIP it,
    understating the statistic. Inflated per-row weights push the
    totals past the bound; the gate must now raise, not return a
    too-small number."""
    from pyspark.sql import functions as F

    from isilon_hadoop_tools_spark.operators.analytics import ad_drift

    df = spark.createDataFrame(
        [(float(v),) for v in range(1, 9)], "v double"
    )
    big = F.lit(10_000_000_000_000).cast("long")  # 1e13 rows' worth
    # ANSI mode (the Spark 4 default) raises NUMERIC_VALUE_OUT_OF_RANGE
    # at the multiply; non-ANSI reaches the operator's own NULL-count
    # guard ("decimal overflow"). Either way: loud, never understated.
    with pytest.raises(
        Exception,
        match="decimal overflow|NUMERIC_VALUE_OUT_OF_RANGE|"
        "cannot be represented",
    ):
        # disjoint cohorts so the ECDF gap d is ~1e27 and d² blows
        # past DECIMAL(38,0)
        ad_drift(
            df,
            "v",
            in_base=big * (F.col("v") <= 4).cast("long"),
            in_cur=big * (F.col("v") > 4).cast("long"),
        ).collect()


def test_ad_drift_hand_computed_identity_and_tails(spark):
    """base=[1,2] vs cur=[2,3]: pooled values 1,2 (3 excluded, B=N),
    d=2 at both, A² = ¼·(4/3 + 8/3) = exactly 1.0 through the
    scaled-integer path; identical cohorts give exactly 0; and a
    TAIL-ONLY shift moves AD proportionally more than CvM (the
    1/(B(N−B)) edge weighting)."""
    from isilon_hadoop_tools_spark.operators.analytics import (
        ad_drift,
        cvm_drift,
    )

    def run(base_vals, cur_vals, op=None):
        rows = [(float(v), "b") for v in base_vals]
        rows += [(float(v), "c") for v in cur_vals]
        df = spark.createDataFrame(rows, "value double, cohort string")
        return (op or ad_drift)(
            df, "value",
            in_base=F.col("cohort") == "b",
            in_cur=F.col("cohort") == "c",
        ).collect()[0]

    r = run([1, 2], [2, 3])
    assert r["n_base"] == 2 and r["n_cur"] == 2
    assert r["ad_stat"] == 1.0
    same = run(list(range(100)) * 2, list(range(100)) * 2)
    assert same["ad_stat"] == 0.0
    # tail-only drift: one extreme value appended to the current side
    base = list(range(100))
    cur = list(range(99)) + [100000]
    ad_ratio = run(base, cur)["ad_stat"]
    cvm = run(base, cur, op=cvm_drift)["cvm_stat"]
    # both see the drift; AD weights the tail point more than CvM's
    # uniform integration (sanity: statistics positive, AD larger
    # relative to its identical-cohort scale)
    assert ad_ratio > 0 and cvm > 0
    assert ad_ratio > cvm


def test_fellegi_sunter_em_planted_duplicates(spark):
    """Planted linkage: 30 entities each duplicated with all three
    fields agreeing, embedded among non-matching pairs that agree
    only by chance. EM must drive the all-agree pattern's posterior
    near 1 and the all-disagree pattern's near 0, with the match
    weight monotone in agreement count."""
    from pyspark.sql import functions as F

    from isilon_hadoop_tools_spark.operators.analytics import (
        fellegi_sunter_em,
    )

    import random

    rng = random.Random(11)
    rows = []
    for e in range(60):
        # twin records: same block, all fields agree; fields drawn
        # independently of the block (modular-arithmetic fixtures
        # correlate fields with blocks and EM happily converges to
        # THAT split instead -- the classic identifiability trap)
        f1, f2, f3 = (
            f"s{rng.randrange(6)}", rng.randrange(8),
            f"t{rng.randrange(9)}",
        )
        for twin in (0, 1):
            rows.append((e * 100 + twin, e % 3, f1, f2, f3))
    for i in range(200):
        rows.append((
            10_000 + i, rng.randrange(3), f"s{rng.randrange(6)}",
            rng.randrange(8), f"t{rng.randrange(9)}",
        ))
    df = spark.createDataFrame(
        rows, "rid long, blk int, f1 string, f2 long, f3 string"
    )
    out = {(r["g1"], r["g2"], r["g3"]): r for r in fellegi_sunter_em(
        df, "rid", "blk",
        [("f1", F.col("f1")), ("f2", F.col("f2")), ("f3", F.col("f3"))],
        iters=6,
    ).collect()}
    # ~60 true-match pairs vs ~16 chance all-agree pairs among ~7000:
    # the ideal posterior for the all-agree pattern is ~0.79
    assert out[(1, 1, 1)]["match_w"] > 0.6
    assert out[(0, 0, 0)]["match_w"] < 0.01
    # monotone in each agreement bit
    for a, b in [((1, 1, 1), (0, 1, 1)), ((1, 1, 0), (1, 0, 0)),
                 ((0, 1, 1), (0, 0, 1))]:
        if a in out and b in out:
            assert out[a]["match_w"] >= out[b]["match_w"]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        fellegi_sunter_em(df, "rid", "blk", [], iters=3)


def test_fellegi_sunter_em_hot_block_bounded(spark):
    """Planted hot block: one blocking key holds 30% of all rows.
    With a max_block_rows budget the candidate stage must stay
    bounded (total pairs <= the analytic even-split budget from
    linkage_block_audit, far below exact C(n,2)), and a budget
    larger than every block must reproduce the unbounded result
    bit-for-bit (s=1 salt is exact)."""
    import random

    from pyspark.sql import functions as F

    from isilon_hadoop_tools_spark.operators.analytics import (
        fellegi_sunter_em,
        linkage_block_audit,
    )

    rng = random.Random(7)
    rows = []
    # hot block 0: 300 rows; 20 cold blocks of 35 rows each
    for i in range(300):
        rows.append((i, 0, f"s{rng.randrange(4)}", rng.randrange(5)))
    for b in range(1, 21):
        for i in range(35):
            rows.append((
                10_000 + b * 100 + i, b,
                f"s{rng.randrange(4)}", rng.randrange(5),
            ))
    df = spark.createDataFrame(rows, "rid long, blk int, f1 string, f2 long")
    comps = [("f1", F.col("f1")), ("f2", F.col("f2"))]

    audit = {r["block"]: r for r in
             linkage_block_audit(df, "blk", max_block_rows=50).collect()}
    assert audit[0]["n_rows"] == 300
    assert audit[0]["pairs_exact"] == 300 * 299 // 2
    assert audit[0]["n_sub"] == 6
    assert audit[0]["pairs_budget"] == 6 * (50 * 49 // 2)
    assert audit[1]["n_sub"] == 1
    assert audit[1]["pairs_budget"] == audit[1]["pairs_exact"] == 35 * 34 // 2
    assert abs(sum(r["pair_share"] for r in audit.values()) - 1.0) < 1e-3

    import pytest as _pytest

    # default is fail-loudly: a hot block over the budget RAISES
    # (naming the block) instead of silently subsampling
    with _pytest.raises(Exception) as ei:
        fellegi_sunter_em(
            df, "rid", "blk", comps, iters=2, max_block_rows=50
        ).collect()
    assert "max_block_rows" in str(ei.value)

    capped = fellegi_sunter_em(
        df, "rid", "blk", comps, iters=2, max_block_rows=50,
        over_budget="subsample",
    ).collect()
    budget_total = sum(r["pairs_budget"] for r in audit.values())
    exact_total = sum(r["pairs_exact"] for r in audit.values())
    got = sum(r["n_pairs"] for r in capped)
    # the hash split is not perfectly even, so allow slack above the
    # even-split floor, but it must sit far below the quadratic total
    assert got <= budget_total * 1.5
    assert got < exact_total * 0.5

    wide = fellegi_sunter_em(
        df, "rid", "blk", comps, iters=2, max_block_rows=10_000
    ).collect()
    uncapped = fellegi_sunter_em(
        df, "rid", "blk", comps, iters=2, max_block_rows=100_000
    ).collect()
    key = lambda r: (r["g1"], r["g2"])
    assert sorted(map(tuple, wide)) == sorted(map(tuple, uncapped))
    assert sum(r["n_pairs"] for r in wide) == exact_total

    import pytest as _pytest

    with _pytest.raises(ValueError):
        fellegi_sunter_em(df, "rid", "blk", comps, max_block_rows=1)
    with _pytest.raises(ValueError):
        linkage_block_audit(df, "blk", max_block_rows=0)


def test_fellegi_sunter_em_degenerate_bit_no_nulls(spark):
    """ADVICE guard: a CONSTANT comparison bit used to be able to
    drive an M-step denominator to 0, which non-ANSI Spark silently
    turns into NULL params and NULL match weights. With the clamps
    every output must be a finite non-null probability."""
    from pyspark.sql import functions as F

    from isilon_hadoop_tools_spark.operators.analytics import (
        fellegi_sunter_em,
    )

    # g1 always agrees (constant field); g2 never agrees (unique)
    rows = [(i, 0, "same", i) for i in range(40)]
    df = spark.createDataFrame(rows, "rid long, blk int, f1 string, f2 long")
    out = fellegi_sunter_em(
        df, "rid", "blk",
        [("f1", F.col("f1")), ("f2", F.col("f2"))],
        iters=8,
    ).collect()
    assert out, "patterns expected"
    for r in out:
        assert r["match_w"] is not None
        assert 0.0 <= r["match_w"] <= 1.0


def test_last_touch_attribution_window_and_tiebreak(spark):
    """Hand-built journey: purchase credits the most recent touch
    inside the lookback; an expired touch goes 'direct'; a touch at
    the SAME timestamp with a lower event_id still counts; values
    accumulate per channel."""
    from isilon_hadoop_tools_spark.operators.analytics import (
        last_touch_attribution,
    )

    rows = [
        # user 1: view then click then purchase -> click wins
        (1, _m(0), 1, "view", 0.0),
        (2, _m(10), 1, "click", 0.0),
        (3, _m(20), 1, "purchase", 100.0),
        # user 2: touch 25h before purchase -> outside 24h -> direct
        (4, _m(0), 2, "view", 0.0),
        (5, _m(25 * 60), 2, "purchase", 50.0),
        # user 3: same-ts touch with LOWER id counts (row order)
        (6, _m(0), 3, "view", 0.0),
        (7, _m(0), 3, "purchase", 25.0),
        # user 4: no touches at all -> direct
        (8, _m(0), 4, "purchase", 10.0),
        # user 1 second purchase, 23h59m after the click: inclusive
        (9, _m(10 + 24 * 60), 1, "purchase", 5.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
        " event_type string, value double"
    )
    # reorder columns to the operator's (user, ts, tiebreak, ...) args
    got = {
        r["channel"]: (r["n_conversions"], r["attributed_value"], r["share"])
        for r in last_touch_attribution(
            df, "user_id", "ts", "event_id", "event_type", "value",
            touch_types=["view", "click"],
            conversion_type="purchase", lookback_hours=24,
        ).collect()
    }
    assert got["click"] == (2, 105.0, round(2 / 5, 6))
    assert got["view"] == (1, 25.0, round(1 / 5, 6))
    assert got["direct"] == (2, 60.0, round(2 / 5, 6))


def test_t_closeness_skewness_attack_caught(spark):
    """The case k-anonymity AND l-diversity wave through: a 60-row
    class with 3 distinct sensitive values but a 58/1/1 split leaks
    near-certainty while the global mix is uniform — its TV distance
    must flag it; a class mirroring the global mix scores ~0."""
    from isilon_hadoop_tools_spark.operators.analytics import (
        k_anonymity_report,
        l_diversity_report,
        t_closeness_report,
    )

    rows = []
    rid = 0
    # classes 1 and 3: uniform thirds (anchoring the global mix);
    # class 2: same size as 1, same 3 distinct values, 58/1/1 split
    specs = [
        (1, (("flu", 20), ("cold", 20), ("ok", 20))),
        (3, (("flu", 40), ("cold", 40), ("ok", 40))),
        (2, (("flu", 58), ("cold", 1), ("ok", 1))),
    ]
    for qa, dist in specs:
        for s, n in dist:
            for _ in range(n):
                rows.append((rid, qa, s))
                rid += 1
    df = spark.createDataFrame(rows, "id long, qa long, s string")
    assert k_anonymity_report(df, ["qa"], k=5).collect()[0]["k_anonymous"]
    assert l_diversity_report(df, ["qa"], "s", l=3).collect()[0][
        "l_diverse"
    ]
    r = t_closeness_report(df, ["qa"], "s", t=0.3).collect()[0]
    assert r["n_rows"] == 240 and r["n_groups"] == 3
    # class 2's exact TV distance: global = (118, 61, 61)/240
    g = {"flu": 118 / 240, "cold": 61 / 240, "ok": 61 / 240}
    c2 = {"flu": 58 / 60, "cold": 1 / 60, "ok": 1 / 60}
    t2 = 0.5 * sum(abs(c2[s] - g[s]) for s in g)
    assert r["max_t"] == round(t2, 6)
    assert r["groups_above_t"] == 1  # the uniform classes pass
    assert r["rows_above_t"] == 60
    assert r["frac_rows_above_t"] == 0.25
    assert not r["t_close"]
    # loose threshold passes
    assert t_closeness_report(df, ["qa"], "s", t=0.9).collect()[0][
        "t_close"
    ]


def test_linear_attribution_fair_share_and_conservation(spark):
    """The same hand journey as the last-touch test: credit splits
    equally across qualifying touches, expired touches drop out,
    no-touch purchases go direct — and total credit/value is
    CONSERVED (sums to the conversion totals exactly)."""
    from isilon_hadoop_tools_spark.operators.analytics import (
        linear_attribution,
    )

    rows = [
        (1, _m(0), 1, "view", 0.0),
        (2, _m(10), 1, "click", 0.0),
        (3, _m(20), 1, "purchase", 100.0),  # view+click share 50/50
        (4, _m(0), 2, "view", 0.0),
        (5, _m(25 * 60), 2, "purchase", 50.0),  # expired -> direct
        (6, _m(0), 3, "view", 0.0),
        (7, _m(0), 3, "purchase", 25.0),  # same-ts lower-id view counts
        (8, _m(0), 4, "purchase", 10.0),  # no touches -> direct
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
        " event_type string, value double"
    )
    got = {
        r["channel"]: (r["credit"], r["attributed_value"])
        for r in linear_attribution(
            df, "user_id", "ts", "event_id", "event_type", "value",
            touch_types=["view", "click"],
            conversion_type="purchase", lookback_hours=24,
        ).collect()
    }
    assert got["view"] == (1.5, 75.0)     # 0.5 of conv 3 + 1.0 of conv 7
    assert got["click"] == (0.5, 50.0)    # 0.5 of conv 3
    assert got["direct"] == (2.0, 60.0)   # convs 5 and 8
    assert sum(c for c, _ in got.values()) == 4.0  # 4 conversions
    assert sum(v for _, v in got.values()) == 185.0


def test_time_decay_attribution_recency_ordering_and_conservation(spark):
    """Two touches 12h apart before one purchase: with a 6h half-life
    the recent touch gets 4x the older one's credit (2^2), shares
    normalize to 1, expired/no-touch conversions go direct — and the
    exact closed-form weights match."""
    from isilon_hadoop_tools_spark.operators.analytics import (
        time_decay_attribution,
    )

    rows = [
        (1, _m(0), 1, "view", 0.0),            # 12h before purchase
        (2, _m(6 * 60), 1, "click", 0.0),      # 6h before purchase
        (3, _m(12 * 60), 1, "purchase", 90.0),
        (4, _m(0), 2, "purchase", 10.0),       # no touches -> direct
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
        " event_type string, value double"
    )
    got = {
        r["channel"]: (r["credit"], r["attributed_value"])
        for r in time_decay_attribution(
            df, "user_id", "ts", "event_id", "event_type", "value",
            touch_types=["view", "click"],
            conversion_type="purchase",
            lookback_hours=24, half_life_hours=6,
        ).collect()
    }
    # weights: view 2^-2 = 0.25, click 2^-1 = 0.5 -> shares 1/3, 2/3
    assert got["view"] == (round(1 / 3, 6), round(30.0, 4))
    assert got["click"] == (round(2 / 3, 6), round(60.0, 4))
    assert got["direct"] == (1.0, 10.0)
    assert round(sum(c for c, _ in got.values()), 6) == 2.0
    assert round(sum(v for _, v in got.values()), 4) == 100.0


def test_psi_drift_rejects_bad_breaks(spark):
    """Unsorted or duplicated breaks would silently mis-band values
    via the first-match WHEN chain; the shared band_index_expr
    validates instead — and the streaming band counter shares the
    same helper so the two halves of the gate can't drift."""
    import pytest as _pytest

    from isilon_hadoop_tools_spark.operators.analytics import psi_drift
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1.0, 1), (2.0, 0)], "v double, g int")
    for bad in ([3.0, 1.0], [1.0, 1.0, 2.0], []):
        with _pytest.raises(ValueError, match="strictly ascending"):
            psi_drift(df, "v", F.col("g") == 1, F.col("g") == 0, bad)


def test_ks_drift_identity_zero_and_planted_shift(spark):
    """Identity: the same cohort on both sides gives KS = 0 exactly.
    Planted shift: base uniform on {1..10}, current uniform on
    {6..15} → ECDFs diverge maximally at value 5 (F_base=0.5,
    F_cur=0.0) with KS = 0.5, attained at the SMALLEST such value
    (integer tie-break)."""
    from pyspark.sql import functions as F

    from isilon_hadoop_tools_spark.operators.analytics import ks_drift

    base = [(float(v), 1) for v in range(1, 11)]
    cur = [(float(v), 0) for v in range(6, 16)]
    df = spark.createDataFrame(base + cur, "v double, is_base int")
    ident = ks_drift(
        df, "v", F.lit(True), F.lit(True)
    ).head()
    assert ident["ks_stat"] == 0.0
    assert ident["n_base"] == ident["n_cur"] == 20

    shifted = ks_drift(
        df, "v", F.col("is_base") == 1, F.col("is_base") == 0
    ).head()
    assert shifted["n_base"] == 10 and shifted["n_cur"] == 10
    assert shifted["ks_stat"] == 0.5
    assert shifted["at_value"] == 5.0


def test_ks_drift_ties_and_null_values(spark):
    """NULL values are excluded from both ECDFs; the argmax tie
    (several values reach the same |difference|) resolves to the
    smallest value so both engines pick the same row."""
    from pyspark.sql import functions as F

    from isilon_hadoop_tools_spark.operators.analytics import ks_drift

    rows = [(1.0, 1), (2.0, 1), (3.0, 0), (4.0, 0), (None, 1), (None, 0)]
    df = spark.createDataFrame(rows, "v double, is_base int")
    out = ks_drift(
        df, "v", F.col("is_base") == 1, F.col("is_base") == 0
    ).head()
    # base {1,2}, cur {3,4}: |F_b - F_c| = 1.0 at v=2 (and stays 1.0
    # until 3); jump-point evaluation picks v=2
    assert out["n_base"] == 2 and out["n_cur"] == 2
    assert out["ks_stat"] == 1.0
    assert out["at_value"] == 2.0


def test_mann_whitney_hand_example_and_identity(spark):
    """Hand-checkable rank-sum: base {1,2,3} vs cur {2,3,4} over the
    midranks of [1, 2, 2, 3, 3, 4] gives R_base = 8, 2U = 4,
    AUC = 2/9; identical cohorts give AUC exactly 0.5 (the no-effect
    fixed point); a fully-shifted cohort gives AUC 0 (base always
    smaller)."""
    from pyspark.sql import functions as F

    from isilon_hadoop_tools_spark.operators.analytics import (
        mann_whitney_u,
    )

    rows = [(1.0, 1), (2.0, 1), (3.0, 1), (2.0, 0), (3.0, 0), (4.0, 0)]
    df = spark.createDataFrame(rows, "v double, b int")
    r = mann_whitney_u(
        df, "v", F.col("b") == 1, F.col("b") == 0
    ).head()
    assert (r["n_base"], r["n_cur"], r["u2_base"]) == (3, 3, 4)
    assert r["auc"] == 0.222222
    ident = mann_whitney_u(df, "v", F.lit(True), F.lit(True)).head()
    assert ident["auc"] == 0.5
    shifted = spark.createDataFrame(
        [(float(v), 1) for v in (1, 2, 3)]
        + [(float(v), 0) for v in (10, 11, 12)],
        "v double, b int",
    )
    s = mann_whitney_u(
        shifted, "v", F.col("b") == 1, F.col("b") == 0
    ).head()
    assert s["u2_base"] == 0 and s["auc"] == 0.0


def test_chi_square_drift_hand_computed(spark):
    """2x2-band hand check: O = [[5,2],[5,6]], totals 10/8, N=18 ->
    E = [[3.8889,3.1111],[6.1111,4.8889]], chi2 = 1.2346*(1/3.8889 +
    1/3.1111 + 1/6.1111 + 1/4.8889) = 1.168831, dof 1; and a
    one-cohort-empty degenerate gives chi2 0 with dof 0."""
    from pyspark.sql import functions as F

    from isilon_hadoop_tools_spark.operators.analytics import (
        chi_square_drift,
    )

    rows = [(float(v), "base") for v in [1, 2, 3, 4, 5, 11, 12, 13, 14, 15]]
    rows += [(float(v), "cur") for v in [6, 7, 16, 17, 18, 19, 20, 21]]
    df = spark.createDataFrame(rows, "value double, cohort string")
    out = chi_square_drift(
        df, "value", F.col("cohort") == "base", F.col("cohort") == "cur",
        breaks=[10],
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_base"], r["n_cur"], r["n_bands_used"], r["dof"]) == (
        10, 8, 2, 1,
    )
    assert abs(r["chi2"] - 1.168831) < 1e-6

    empty_cur = chi_square_drift(
        df, "value", F.col("cohort").isin("base", "cur"),
        F.lit(False), breaks=[10],
    ).collect()[0]
    assert empty_cur["dof"] == 0 and empty_cur["chi2"] == 0.0


def test_wilcoxon_signed_rank_hand_computed(spark):
    """diffs [1,-1,2,2,-3] (+ a dropped zero): |d| midranks 1.5/1.5,
    3.5/3.5, 5 -> W+ = 1.5 + 3.5 + 3.5 = 8.5 -> 2W+ = 17; T = 15 ->
    rank-biserial = (8.5 - 6.5)/15 = 0.133333."""
    from isilon_hadoop_tools_spark.operators.analytics import (
        wilcoxon_signed_rank,
    )

    df = spark.createDataFrame(
        [(1,), (-1,), (2,), (2,), (-3,), (0,)], "d long"
    )
    out = wilcoxon_signed_rank(df, "d").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_pairs"], r["w2_plus"]) == (5, 17)
    assert abs(r["rank_biserial"] - 0.133333) < 1e-6
    # all-zero input: zero rows, not a crash
    z = spark.createDataFrame([(0,), (0,)], "d long")
    assert wilcoxon_signed_rank(z, "d").collect() == []


def test_cvm_drift_hand_computed(spark):
    """base = [1,2], cur = [2,3]: pooled values (1,2,3) with D_k =
    cb*tc - cc*tb = (2, 2, 0), n_k = (1, 2, 1) -> num = 4 + 8 + 0 =
    12; T = 12 / (N^2 * tb * tc) = 12/(16*4) = 0.1875. And identical
    cohorts -> T = 0."""
    from pyspark.sql import functions as F

    from isilon_hadoop_tools_spark.operators.analytics import cvm_drift

    df = spark.createDataFrame(
        [(1.0, "b"), (2.0, "b"), (2.0, "c"), (3.0, "c")],
        "value double, cohort string",
    )
    out = cvm_drift(
        df, "value", F.col("cohort") == "b", F.col("cohort") == "c"
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_base"], r["n_cur"]) == (2, 2)
    assert abs(r["cvm_stat"] - 0.1875) < 1e-9

    same = spark.createDataFrame(
        [(v, c) for v in (1.0, 2.0, 5.0) for c in ("b", "c")],
        "value double, cohort string",
    )
    z = cvm_drift(
        same, "value", F.col("cohort") == "b", F.col("cohort") == "c"
    ).collect()[0]
    assert z["cvm_stat"] == 0.0


def test_shuffle_partition_count_tolerates_auto(spark):
    # ADVICE r12: platforms with AQE auto-sizing set
    # spark.sql.shuffle.partitions to the string 'auto'; the two-phase
    # range operators must fall back instead of raising ValueError.
    from isilon_hadoop_tools_spark.session import shuffle_partition_count

    # OSS Spark rejects setting the conf to 'auto' live, so model the
    # Databricks-style session with a stub exposing the same surface.
    class _Conf:
        def get(self, key, default=None):
            return "auto"

    class _SC:
        defaultParallelism = 8

    class _Fake:
        conf = _Conf()
        sparkContext = _SC()

    assert shuffle_partition_count(_Fake()) == 8
    # sane int confs still pass through verbatim
    assert shuffle_partition_count(spark) == int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )


def test_kaplan_meier_hand_computed_textbook(spark):
    """Classic 6-subject example: events at 1,2,4,6; censored at 3,5.
    S(1)=5/6, S(2)=2/3, S(4)=4/9 (the censor at 3 shrank the risk
    set WITHOUT an event — the estimator's whole point), S(6)=0."""
    from isilon_hadoop_tools_spark.operators.analytics import kaplan_meier

    rows = [(1, True), (2, True), (3, False), (4, True), (5, False),
            (6, True)]
    df = spark.createDataFrame(rows, "t long, obs boolean")
    out = {r["duration"]: r for r in kaplan_meier(df, "t", "obs").collect()}
    assert sorted(out) == [1, 2, 4, 6]  # censored times emit no row
    assert (out[1]["n_risk"], out[1]["n_events"]) == (6, 1)
    assert out[1]["survival"] == pytest.approx(5 / 6, abs=1e-6)
    assert out[2]["survival"] == pytest.approx(2 / 3, abs=1e-6)
    assert (out[4]["n_risk"], out[4]["survival"]) == (
        3, pytest.approx(4 / 9, abs=1e-6))
    # last subject converts: risk set empties -> survival exactly 0
    assert (out[6]["n_risk"], out[6]["survival"]) == (1, 0.0)
    # Nelson-Aalen cumulative hazard alongside: H = sum d/n
    assert out[1]["cum_hazard"] == pytest.approx(1 / 6, abs=1e-6)
    assert out[2]["cum_hazard"] == pytest.approx(1 / 6 + 1 / 5, abs=1e-6)
    assert out[6]["cum_hazard"] == pytest.approx(
        1 / 6 + 1 / 5 + 1 / 3 + 1.0, abs=1e-6)
    # ties + censored-at-event-time: both counted at risk AT t, the
    # censored one leaves after
    rows2 = [(2, True), (2, True), (2, False), (5, True)]
    df2 = spark.createDataFrame(rows2, "t long, obs boolean")
    out2 = {r["duration"]: r
            for r in kaplan_meier(df2, "t", "obs").collect()}
    assert (out2[2]["n_risk"], out2[2]["n_events"],
            out2[2]["n_censored"]) == (4, 2, 1)
    assert out2[2]["survival"] == pytest.approx(0.5, abs=1e-6)
    assert out2[5]["survival"] == 0.0


def test_fellegi_sunter_multirule_union_recall(spark):
    """Multi-rule blocking: pairs co-blocked by EITHER rule appear
    exactly once (pair-key dedup), so the union's pattern counts
    equal the brute-force distinct-pair counts over rule1 OR rule2."""
    import itertools

    from pyspark.sql import functions as F

    from isilon_hadoop_tools_spark.operators.analytics import (
        fellegi_sunter_em,
    )

    rows = [
        (i, i % 3, i % 4, f"s{i % 2}", i % 5) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "rid long, b1 int, b2 int, f1 string, f2 long")
    comps = [("f1", F.col("f1")), ("f2", F.col("f2"))]
    out = fellegi_sunter_em(
        df, "rid", [F.col("b1"), F.col("b2")], comps, iters=2
    ).collect()
    # brute-force reference pattern counts
    want: dict = {}
    for (ia, b1a, b2a, f1a, f2a), (ib, b1b, b2b, f1b, f2b) in (
        itertools.combinations(rows, 2)
    ):
        if b1a == b1b or b2a == b2b:
            g = (int(f1a == f1b), int(f2a == f2b))
            want[g] = want.get(g, 0) + 1
    got = {(r["g1"], r["g2"]): r["n_pairs"] for r in out}
    assert got == want
    # single-rule call still accepts the scalar form
    single = fellegi_sunter_em(df, "rid", "b1", comps, iters=2).collect()
    assert sum(r["n_pairs"] for r in single) == sum(
        1 for (a, b) in itertools.combinations(rows, 2) if a[1] == b[1]
    )
    import pytest as _pytest

    with _pytest.raises(ValueError):
        fellegi_sunter_em(df, "rid", [], comps)


def test_logrank_hand_computed(spark):
    """4 subjects, A converts at 1,2; B at 3,4 (all observed):
    t=1: E=1/2, V=1/4; t=2: E=1/3, V=2/9; t=3: E=V=0; t=4 skipped
    (pooled risk set of one). O=2, E=5/6, V=17/36,
    chi = (7/6)^2 / (17/36) = 49/17."""
    from pyspark.sql import functions as F

    from isilon_hadoop_tools_spark.operators.analytics import logrank_test

    rows = [(1, True, True), (2, True, True),
            (3, True, False), (4, True, False)]
    df = spark.createDataFrame(rows, "t long, obs boolean, a boolean")
    r = logrank_test(df, "t", "obs", F.col("a")).collect()[0]
    assert (r["n_a"], r["n_b"], r["observed_a"]) == (2, 2, 2)
    assert r["expected_a"] == pytest.approx(5 / 6, abs=1e-6)
    assert r["variance"] == pytest.approx(17 / 36, abs=1e-6)
    assert r["chi_sq"] == pytest.approx(49 / 17, abs=1e-4)
    # censoring shrinks the risk set without an event: censor one B
    # subject at t=1 (ties: event counted with the censor at risk)
    rows2 = rows + [(1, False, False)]
    df2 = spark.createDataFrame(rows2, "t long, obs boolean, a boolean")
    r2 = logrank_test(df2, "t", "obs", F.col("a")).collect()[0]
    # t=1: n=5, n1=2 -> E=0.4 (was 0.5); later times unchanged
    assert r2["expected_a"] == pytest.approx(0.4 + 1 / 3, abs=1e-6)


def test_incremental_join_delta_equals_full_join(spark):
    """EA34 algebraic identity: V_old UNION dV == (A_old+dA) JOIN
    (B_old+dB) -- the correctness contract of delta-join maintenance,
    checked on a fixture with keys in every old/delta combination."""
    from isilon_hadoop_tools_spark.operators.analytics import (
        incremental_join_delta,
    )

    a = spark.createDataFrame(
        [(k, f"a{k}{i}") for k in range(6) for i in range(2)],
        "k long, av string",
    )
    b = spark.createDataFrame(
        [(k, f"b{k}{i}") for k in range(2, 8) for i in range(3)],
        "k long, bv string",
    )
    a_old, a_delta = a.filter("k % 2 = 0"), a.filter("k % 2 = 1")
    b_old, b_delta = b.filter("k % 3 = 0"), b.filter("k % 3 <> 0")
    v_old = a_old.join(b_old, "k")
    dv = incremental_join_delta(a_old, a_delta, b_old, b_delta, "k")
    maintained = sorted(
        map(tuple, v_old.unionByName(dv).collect())
    )
    full = sorted(map(tuple, a.join(b, "k").collect()))
    assert maintained == full and len(full) > 0


def test_cuped_readout_reduces_variance_keeps_means(spark):
    """EA35: a covariate correlated with the metric must shrink
    per-arm variance; the pooled adjustment must leave the pooled
    mean intact (and per-arm means when arms share the covariate
    distribution)."""
    import random

    from isilon_hadoop_tools_spark.operators.analytics import (
        cuped_readout,
    )

    rng = random.Random(11)
    rows = []
    for u in range(400):
        x = rng.gauss(50.0, 10.0)
        eps = rng.gauss(0.0, 2.0)
        arm = u % 2
        y = 0.8 * x + eps + (1.5 if arm == 1 else 0.0)
        rows.append((u, round(x, 6), round(y, 6)))
    df = spark.createDataFrame(rows, "u long, x double, y double")
    out = {
        r["arm"]: r
        for r in cuped_readout(
            df, "u", "y", "x", (F.col("u") % 2).cast("int")
        ).collect()
    }
    assert set(out) == {0, 1}
    for arm in (0, 1):
        assert out[arm]["var_reduction"] > 0.9  # X explains most of Y
        # adjustment is mean-preserving up to covariate imbalance
        assert abs(out[arm]["mean_y_adj"] - out[arm]["mean_y"]) < 1.0
    # the true +1.5 lift survives adjustment (and gets cleaner)
    lift_adj = out[1]["mean_y_adj"] - out[0]["mean_y_adj"]
    assert 1.0 < lift_adj < 2.0


def test_sprt_decision_hand_computed_crossings(spark):
    """EA36 on a hand-computable fixture: p0=0.2 vs p1=0.8 gives
    symmetric increments ln(4) = 1.3863; with alpha=beta=0.05 the
    bounds are +-ln(19) = 2.9444, so three successes in a row cross
    UP at exactly n=3 (2*1.3863 < 2.9444 < 3*1.3863), three failures
    cross DOWN at n=3, and a short balanced stream never decides."""
    import datetime as dt

    from isilon_hadoop_tools_spark.operators.analytics import (
        sprt_decision,
    )

    t0 = dt.datetime(2024, 1, 1)

    def stream(bits):
        return spark.createDataFrame(
            [
                (t0 + dt.timedelta(seconds=i), i, b)
                for i, b in enumerate(bits)
            ],
            "ts timestamp, event_id long, hit boolean",
        )

    kw = dict(p0=0.2, p1=0.8, alpha=0.05, beta=0.05)
    up = sprt_decision(
        stream([True] * 10), "ts", "event_id", F.col("hit"), **kw
    ).collect()[0]
    assert (up["decision"], up["n_obs"]) == ("accept_h1", 3)
    assert abs(up["llr"] - 3 * 1.386294) < 1e-5
    dn = sprt_decision(
        stream([False] * 10), "ts", "event_id", F.col("hit"), **kw
    ).collect()[0]
    assert (dn["decision"], dn["n_obs"]) == ("accept_h0", 3)
    mid = sprt_decision(
        stream([True, False, True, False]), "ts", "event_id",
        F.col("hit"), **kw
    ).collect()[0]
    assert (mid["decision"], mid["n_obs"]) == ("continue", 4)
    # the decision is FIRST-crossing: successes after an early
    # crossing cannot change it
    late = sprt_decision(
        stream([True] * 3 + [False] * 7), "ts", "event_id",
        F.col("hit"), **kw
    ).collect()[0]
    assert (late["decision"], late["n_obs"]) == ("accept_h1", 3)


def test_dp_laplace_mean_clamps_budget_and_bounds(spark):
    """EA31b: contributions clamp into [lo, hi] before the sum, NULL
    values are no contribution, the released mean stays inside the
    clamp range, and NULL keys fail loudly."""
    import pytest

    from isilon_hadoop_tools_spark.operators.analytics import (
        dp_laplace_mean,
    )

    df = spark.createDataFrame(
        [("g", 10.0), ("g", 100.0), ("g", -5.0), ("g", None)],
        "k string, v double",
    )
    row = dp_laplace_mean(
        df, ["k"], "v", lo=0.0, hi=50.0, epsilon=1.0, seed=7
    ).collect()[0]
    assert row["sum_true"] == 60.0  # 10 + 50 (clamped) + 0 (clamped)
    assert row["n_true"] == 3  # NULL value excluded
    assert 0.0 <= row["released_mean"] <= 50.0
    # deterministic: same seed, same release
    again = dp_laplace_mean(
        df, ["k"], "v", lo=0.0, hi=50.0, epsilon=1.0, seed=7
    ).collect()[0]
    assert again == row
    # distinct seeds drive the sum and count draws
    assert row["noisy_sum"] - row["sum_true"] != pytest.approx(
        (row["noisy_count"] - row["n_true"]) * 50.0
    )
    bad = spark.createDataFrame(
        [(None, 1.0), ("g", 2.0)], "k string, v double"
    )
    with pytest.raises(Exception) as ei:
        dp_laplace_mean(bad, ["k"], "v", 0.0, 50.0).collect()
    assert "NULL in key column" in str(ei.value)
    with pytest.raises(ValueError):
        dp_laplace_mean(df, ["k"], "v", 5.0, 5.0)
    with pytest.raises(ValueError):
        dp_laplace_mean(df, ["k"], "v", 0.0, 50.0, epsilon=0.0)


def test_weekday_seasonality_perfect_weekly_pattern(spark):
    """EA37: a perfectly periodic series (Friday runs 15/day, every
    other day 10/day, 8 full weeks) must read strength 1, slope 0,
    peak Friday (dow 4), trough Monday (earliest tie at 10)."""
    import datetime as dt

    from isilon_hadoop_tools_spark.operators.analytics import (
        weekday_seasonality,
    )

    start = dt.date(2024, 1, 1)  # a Monday
    rows = []
    eid = 0
    for day in range(56):
        d = start + dt.timedelta(days=day)
        n = 15 if d.weekday() == 4 else 10
        for i in range(n):
            rows.append(
                ("x", dt.datetime(d.year, d.month, d.day, 12, 0, i), eid)
            )
            eid += 1
    df = spark.createDataFrame(rows, "g string, ts timestamp, eid long")
    out = weekday_seasonality(df, "g", "ts").collect()[0]
    assert out["n_days"] == 56
    assert out["seasonal_strength"] == 1.0  # residual variance is 0
    assert out["trend_slope"] == 0.0
    assert out["peak_dow"] == 4  # Friday
    assert out["trough_dow"] == 0  # Monday (earliest of the 10s)


def test_seasonal_anomalies_flags_only_the_planted_spike(spark):
    """EA37b: with a weekly rhythm plus ONE spiked Wednesday, only
    the spike flags (its weekday mean absorbs part of it, the rest is
    > z residual sigmas); a perfectly periodic series flags nothing
    (zero residual variance -> nullif guard)."""
    import datetime as dt

    from isilon_hadoop_tools_spark.operators.analytics import (
        seasonal_anomalies,
    )

    start = dt.date(2024, 1, 1)  # Monday
    rows = []
    eid = 0
    spike_day = start + dt.timedelta(days=23)  # a Wednesday
    for day in range(56):
        d = start + dt.timedelta(days=day)
        n = 30 if d == spike_day else 10
        for i in range(n):
            rows.append(("x", dt.datetime(d.year, d.month, d.day, 8, 0, i), eid))
            eid += 1
    df = spark.createDataFrame(rows, "g string, ts timestamp, eid long")
    out = seasonal_anomalies(df, "g", "ts", z=3.0).collect()
    assert len(out) == 1
    assert out[0]["day"] == spike_day
    assert out[0]["n"] == 30
    assert abs(out[0]["expected"] - 12.5) < 1e-9  # (7*10 + 30)/8
    assert out[0]["z_score"] > 3.0

    flat = spark.createDataFrame(
        [("x", dt.datetime(2024, 1, 1 + d % 27, 8, 0, i), d * 100 + i)
         for d in range(27) for i in range(10)],
        "g string, ts timestamp, eid long",
    )
    assert seasonal_anomalies(flat, "g", "ts", z=3.0).count() == 0


def test_seasonal_naive_backtest_perfect_and_trending(spark):
    """EA38: a perfectly weekly series backtests to MAE = sMAPE = 0;
    a +7/week trend has MAE exactly 7; the window only evaluates days
    with a 7-day-earlier reference inside the horizon."""
    import datetime as dt

    from isilon_hadoop_tools_spark.operators.analytics import (
        seasonal_naive_backtest,
    )

    start = dt.date(2024, 1, 1)
    rows = []
    eid = 0
    for day in range(28):
        d = start + dt.timedelta(days=day)
        periodic = 10 + (d.weekday() % 3)
        trending = 10 + day  # +7 per week
        for i in range(periodic):
            rows.append(("p", dt.datetime(d.year, d.month, d.day, 8, 0, i), eid))
            eid += 1
        for i in range(trending):
            rows.append(("t", dt.datetime(d.year, d.month, d.day, 9, 0, i), eid))
            eid += 1
    df = spark.createDataFrame(rows, "g string, ts timestamp, eid long")
    out = {r["g"]: r for r in
           seasonal_naive_backtest(df, "g", "ts", horizon_days=28).collect()}
    assert out["p"]["n_eval"] == 21  # 28 days, first 7 lack a reference
    assert out["p"]["mae"] == 0.0 and out["p"]["smape"] == 0.0
    assert out["t"]["mae"] == 7.0
    assert out["t"]["smape"] > 0.0


def test_rfm_segmentation_thresholds_and_segments(spark):
    """EA39: scores come from exact quintile thresholds (not ntile),
    recency is inverted, and the segment grid assigns the planted
    archetypes correctly."""
    import datetime as dt

    from isilon_hadoop_tools_spark.operators.analytics import (
        rfm_segmentation,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # 20 users with increasing activity: user u has u+1 events of
    # value 10*(u+1), most recent at day u (user 19 = most recent,
    # most frequent, highest value -> champion; user 0 = hibernating)
    eid = 0
    for u in range(20):
        for i in range(u + 1):
            rows.append(
                (u, t0 + dt.timedelta(days=u, minutes=i), 10.0 * (u + 1), eid)
            )
            eid += 1
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double, eid long")
    out = {r["user_id"]: r for r in
           rfm_segmentation(df, "user_id", "ts", "value").collect()}
    assert len(out) == 20
    top = out[19]
    assert (top["r_score"], top["f_score"], top["m_score"]) == (5, 5, 5)
    assert top["segment"] == "champions"
    assert top["recency_days"] == 0 and top["frequency"] == 20
    low = out[0]
    assert low["r_score"] == 1 and low["segment"] == "hibernating"
    assert low["recency_days"] == 19
    # monotone: scores never decrease with u
    for u in range(1, 20):
        assert out[u]["f_score"] >= out[u - 1]["f_score"]
        assert out[u]["m_score"] >= out[u - 1]["m_score"]


def test_basket_rules_support_confidence_lift(spark):
    """EA7b hand-computed: 4 baskets, A in all, B in 2 (always with
    A), C alone once. Rule B->A: conf 1, lift 1; A->B: conf 0.5,
    lift 1. Directions differ; min_pair_count filters."""
    from isilon_hadoop_tools_spark.operators.analytics import basket_rules

    df = spark.createDataFrame(
        [
            (1, "A"), (1, "B"),
            (2, "A"), (2, "B"),
            (3, "A"),
            (4, "A"), (4, "C"),
        ],
        "b long, i string",
    )
    rules = {(r["antecedent"], r["consequent"]): r
             for r in basket_rules(df, "b", "i", min_pair_count=2).collect()}
    # (A,C) seen once: filtered out by min_pair_count=2
    assert set(rules) == {("A", "B"), ("B", "A")}
    ba = rules[("B", "A")]
    assert ba["n_ab"] == 2
    assert ba["support"] == 0.5
    assert ba["confidence"] == 1.0  # every B basket has A
    assert ba["lift"] == 1.0  # A is in every basket: no information
    ab = rules[("A", "B")]
    assert ab["confidence"] == 0.5


def test_range_partition_audit_balanced_and_skewed(spark):
    """SC12: a uniform key audits near ratio 1 over 8 buckets; a
    90%-constant key collapses boundaries and the audit surfaces the
    pile-up as a big skew ratio."""
    from isilon_hadoop_tools_spark.operators.analytics import (
        range_partition_audit,
    )

    uni = spark.range(8000).select((F.col("id") % 1000).alias("k"))
    rows = range_partition_audit(uni, "k", 8).collect()
    assert sum(r["n_rows"] for r in rows) == 8000
    assert all(abs(r["skew_ratio"] - 1.0) < 0.1 for r in rows)

    skew = spark.range(1000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id")).alias("k")
    )
    srows = range_partition_audit(skew, "k", 8).collect()
    assert sum(r["n_rows"] for r in srows) == 1000
    assert max(r["skew_ratio"] for r in srows) > 3.0
    assert max(r["n_rows"] for r in srows) >= 900  # the pile-up bucket


def test_huber_mean_downweights_outliers(spark):
    """EA26c: a single huge outlier drags the mean far but moves the
    Huber estimate only slightly off the clean center; a degenerate
    (constant) group keeps its median."""
    from isilon_hadoop_tools_spark.operators.analytics import huber_mean

    rows = [("g", float(v)) for v in
            [10, 11, 9, 10, 12, 8, 10, 11, 9, 10_000]]
    rows += [("const", 5.0)] * 6
    df = spark.createDataFrame(rows, "k string, value double")
    out = {r["k"]: r for r in
           huber_mean(df, "k", "value", c=1.345, iters=3).collect()}
    g = out["g"]
    assert g["mean"] > 1000  # dragged by the outlier
    assert 9.0 < g["huber_mean"] < 12.5  # robust center holds
    assert abs(out["const"]["huber_mean"] - 5.0) < 1e-9  # MAD=0 path
    assert out["const"]["n"] == 6


def test_benford_conforming_vs_uniform(spark):
    """EA40: a geometric (scale-spanning) sample conforms (small
    chi-square, digit-1 share near .301); values with a single
    leading digit concentrate mass and blow the statistic up;
    non-positive values are excluded."""
    import math

    from isilon_hadoop_tools_spark.operators.analytics import benford_test

    geo = spark.range(2000).select(
        F.pow(F.lit(10.0), (F.col("id") % 1000) / F.lit(1000.0) * 3).alias("v")
    )
    rows = benford_test(geo, "v").collect()
    assert sum(r["n_obs"] for r in rows) == 2000
    d1 = next(r for r in rows if r["digit"] == 1)
    assert abs(d1["observed_p"] - math.log10(2)) < 0.02
    assert rows[0]["chi_square"] < 20.0

    bad = spark.range(500).select(
        (F.lit(7.0) + (F.col("id") % 10) / F.lit(100.0)).alias("v")
    )
    brows = benford_test(bad, "v").collect()
    # all 9 digits are in the readout; the 8 unobserved ones each
    # contribute (0 − E·n)²/(E·n) = E·n, so the statistic reflects
    # the full degeneracy instead of understating it
    assert len(brows) == 9
    assert {r["digit"] for r in brows} == set(range(1, 10))
    assert all(r["n_obs"] == 0 for r in brows if r["digit"] != 7)
    n7 = next(r for r in brows if r["digit"] == 7)
    assert n7["n_obs"] == 500 and n7["observed_p"] == 1.0
    # exact expectation: sum over d!=7 of E_d*n + (n − E_7*n)²/(E_7*n)
    e7 = math.log10(1 + 1 / 7)
    want = (1 - e7) * 500 + (500 - e7 * 500) ** 2 / (e7 * 500)
    assert abs(brows[0]["chi_square"] - want) < 1e-3
    withneg = spark.createDataFrame(
        [(1.5,), (-3.0,), (0.0,)], "v double"
    )
    assert sum(r["n_obs"] for r in benford_test(withneg, "v").collect()) == 1


def test_cohort_ltv_hand_computed(spark):
    """EA41 on a 2-cohort fixture: cohort sizes from ALL activity,
    revenue accumulates per cohort-age week, ltv = cum/size."""
    import datetime as dt

    from isilon_hadoop_tools_spark.operators.analytics import cohort_ltv

    t0 = dt.datetime(2024, 1, 1)  # Monday: week truncation anchor
    wk = dt.timedelta(days=7)
    rows = [
        # cohort A (week 0): users 1, 2 (user 2 never buys)
        (1, t0, "view", 0.0, 1),
        (2, t0 + dt.timedelta(days=2), "view", 0.0, 2),
        (1, t0 + dt.timedelta(days=3), "purchase", 10.0, 3),
        (1, t0 + wk, "purchase", 30.0, 4),
        # cohort B (week 1): user 3
        (3, t0 + wk, "view", 0.0, 5),
        (3, t0 + 2 * wk, "purchase", 8.0, 6),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string,"
        " value double, eid long"
    )
    out = {(str(r["cohort_week"]), r["age_week"]): r for r in cohort_ltv(
        df, "user_id", "ts", "value",
        F.col("event_type") == "purchase",
    ).collect()}
    a0 = out[("2024-01-01", 0)]
    assert a0["n_users"] == 2 and a0["week_value"] == 10.0
    assert a0["ltv"] == 5.0
    a1 = out[("2024-01-01", 1)]
    assert a1["cum_value"] == 40.0 and a1["ltv"] == 20.0
    b1 = out[("2024-01-08", 1)]
    assert b1["n_users"] == 1 and b1["ltv"] == 8.0
    assert len(out) == 3  # no zero-revenue filler rows


def test_mann_kendall_directions_and_ties(spark):
    """EA23d: a strictly increasing daily series reads S = C(n,2) and
    'increasing'; strictly decreasing mirrors it; a constant series
    has S = 0, all-tie variance 0, trend 'none'."""
    import datetime as dt

    from isilon_hadoop_tools_spark.operators.analytics import (
        mann_kendall_trend,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for day in range(12):
        d = t0 + dt.timedelta(days=day)
        for g, n in (("up", 5 + day), ("down", 30 - day), ("flat", 7)):
            for i in range(n):
                rows.append((g, d + dt.timedelta(seconds=i), eid))
                eid += 1
    df = spark.createDataFrame(rows, "g string, ts timestamp, eid long")
    out = {r["g"]: r for r in mann_kendall_trend(df, "g", "ts").collect()}
    assert out["up"]["s_stat"] == 66  # C(12,2): every pair increases
    assert out["up"]["trend"] == "increasing"
    assert out["down"]["s_stat"] == -66
    assert out["down"]["trend"] == "decreasing"
    assert out["flat"]["s_stat"] == 0
    assert out["flat"]["var_s"] == 0.0  # one 12-deep tie group
    assert out["flat"]["z"] == 0.0 and out["flat"]["trend"] == "none"


def test_gini_concentration_extremes(spark):
    """EA42: an equal-split group reads 0; one-unit-owns-everything
    approaches (n-1)/n; negative values fail loudly; an all-zero
    group reads NULL."""
    import pytest

    from isilon_hadoop_tools_spark.operators.analytics import (
        gini_concentration,
    )

    rows = [("even", u, 10.0) for u in range(10)]
    rows += [("one", 0, 100.0)] + [("one", u, 0.0) for u in range(1, 10)]
    rows += [("zero", u, 0.0) for u in range(4)]
    df = spark.createDataFrame(rows, "g string, u long, v double")
    out = {r["g"]: r for r in
           gini_concentration(df, "g", "u", "v").collect()}
    assert out["even"]["gini"] == 0.0
    assert abs(out["one"]["gini"] - 0.9) < 1e-9  # (n-1)/n at n=10
    assert out["zero"]["gini"] is None
    bad = spark.createDataFrame([("g", 1, -5.0)], "g string, u long, v double")
    with pytest.raises(Exception) as ei:
        gini_concentration(bad, "g", "u", "v").collect()
    assert "negative" in str(ei.value)


def test_basket_rules_hot_basket_mechanism(spark):
    """EA7b's quadratic-per-basket fan-out is bounded by a MECHANISM:
    an oversized basket fails loudly by default (naming the basket)
    and is droppable as noise on explicit opt-in — same discipline as
    the FS-EM hot-block budget."""
    import pytest

    from isilon_hadoop_tools_spark.operators.analytics import basket_rules

    rows = [(1, "A"), (1, "B"), (2, "A"), (2, "B")]
    rows += [(9, f"i{j}") for j in range(30)]  # the mega-basket
    df = spark.createDataFrame(rows, "b long, i string")
    with pytest.raises(Exception) as ei:
        basket_rules(df, "b", "i", min_pair_count=1,
                     max_basket_items=10).collect()
    assert "basket 9" in str(ei.value)
    dropped = basket_rules(
        df, "b", "i", min_pair_count=1,
        max_basket_items=10, oversized="drop",
    ).collect()
    got = {(r["antecedent"], r["consequent"]) for r in dropped}
    assert got == {("A", "B"), ("B", "A")}  # mega-basket pairs gone
    # support denominator excludes the dropped basket
    assert all(r["support"] == 1.0 for r in dropped)
    with pytest.raises(ValueError):
        basket_rules(df, "b", "i", oversized="sample")


def test_conversion_ztest_hand_computed(spark):
    """EA25b on a hand fixture: 100 units per arm, 20% vs 35%
    conversion -> z ~ 2.37 (significant); equal rates -> z = 0, not
    significant, with a sane MDE at n=100/arm."""
    import math

    from isilon_hadoop_tools_spark.operators.analytics import (
        conversion_ztest,
    )

    rows = []
    for u in range(200):
        arm = u % 2
        converted = (u // 2) < (35 if arm == 1 else 20)
        rows.append((u, arm, "purchase" if converted else "view"))
        rows.append((u, arm, "view"))  # extra activity row per unit
    df = spark.createDataFrame(rows, "u long, arm int, et string")
    out = conversion_ztest(
        df, "u", F.col("arm"), F.col("et") == "purchase"
    ).collect()[0]
    assert (out["n_0"], out["n_1"]) == (100, 100)
    assert (out["conv_0"], out["conv_1"]) == (20, 35)
    assert out["rate_0"] == 0.2 and out["rate_1"] == 0.35
    p = 55 / 200
    z = 0.15 / math.sqrt(p * (1 - p) * (2 / 100))
    assert abs(out["z"] - round(z, 6)) < 1e-9
    assert out["significant"]
    mde = (1.959964 + 0.841621) * math.sqrt(2 * p * (1 - p) / 100)
    assert abs(out["mde_abs"] - round(mde, 6)) < 1e-9

    allconv = spark.createDataFrame(
        [(u, u % 2, "purchase") for u in range(40)],
        "u long, arm int, et string",
    )
    eq = conversion_ztest(
        allconv, "u", F.col("arm"), F.col("et") == "purchase"
    ).collect()[0]
    assert eq["rate_0"] == eq["rate_1"] == 1.0
    # pooled p = 1 -> zero variance -> z NULL -> not significant
    assert eq["z"] is None and eq["significant"] is None
