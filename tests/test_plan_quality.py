"""Physical-plan audits: assert the plans stay the plans we want at
scale — filters pushed into the parquet scan, columns pruned,
dimension tables broadcast, top-k as TakeOrderedAndProject, no
accidental cartesian products. A regression here is a perf bug even
while results stay correct."""

from __future__ import annotations

import pytest

from isilon_hadoop_tools_spark import suite

from conftest import SMOKE_SF_DIR


def _plan(spark, name: str) -> str:
    df = suite.queries()[name](spark, SMOKE_SF_DIR)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_q1_pushes_filter_and_prunes_columns(spark):
    plan = _plan(spark, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    # projection pruning: only the 7 needed columns reach the scan
    schema_line = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_comment" not in schema_line
    assert "l_orderkey" not in schema_line
    # map-side partial agg + final agg around one exchange
    # ("Exchange (N)" counts tree nodes, not the detail section)
    assert plan.count("HashAggregate (") >= 2
    assert plan.count("Exchange (") == 1


def test_q3_broadcasts_dims_and_takeordered(spark):
    plan = _plan(spark, "q3_top_revenue_orders")
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_q5_star_join_broadcasts_all_dims(spark):
    plan = _plan(spark, "q5_local_supplier_volume")
    assert plan.count("BroadcastHashJoin") >= 4  # customer/supplier/nation/region
    assert "CartesianProduct" not in plan


def test_exact_dedup_partial_aggregation(spark):
    plan = _plan(spark, "dedup_exact_docs")
    # map-side partial agg before the exchange: two HashAggregates
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_ngram_jaccard_no_cartesian(spark):
    plan = _plan(spark, "dedup_ngram_jaccard")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_topk_per_group_single_shuffle(spark):
    plan = _plan(spark, "top3_orders_per_customer")
    # one exchange on the group key feeds the ranking window
    assert plan.count("Exchange hashpartitioning") <= 1
    assert "WindowGroupLimit" in plan  # rank filter pushed below sort


def test_brute_force_ann_broadcasts_queries_not_corpus(spark):
    plan = _plan(spark, "ann_brute_force_cosine")
    assert "BroadcastNestedLoopJoin" in plan  # tiny query side broadcast
    # the corpus must NOT be globally sorted or reshuffled for scoring
    assert "CartesianProduct" not in plan
