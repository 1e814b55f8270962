"""Desired-vs-actual reconciliation (SURVEY J8) and the reference's
rerun invariant: a second run over applied state produces an empty
delta (reference README "work with what it finds", rerun semantics)."""

from __future__ import annotations

from isilon_hadoop_tools_spark.operators.reconcile import (
    ACTION_CREATE,
    ACTION_NOOP,
    ACTION_ORPHAN,
    ACTION_UPDATE,
    idempotency_delta,
    reconcile,
)

SCHEMA = "user_name STRING, primary_group STRING"


def _desired(spark):
    return spark.createDataFrame(
        [("hive", "hive"), ("hdfs", "hadoop"), ("yarn", "hadoop")], SCHEMA
    )


def _actual(spark):
    # hive drifted, hdfs matches, yarn missing, stray extra
    return spark.createDataFrame(
        [("hive", "wrong"), ("hdfs", "hadoop"), ("stray", "stray")], SCHEMA
    )


def test_reconcile_classifies_all_four_actions(spark):
    out = {
        r["user_name"]: r["action"]
        for r in reconcile(_desired(spark), _actual(spark), "user_name").collect()
    }
    assert out == {
        "hive": ACTION_UPDATE,
        "hdfs": ACTION_NOOP,
        "yarn": ACTION_CREATE,
        "stray": ACTION_ORPHAN,
    }


def test_reconcile_carries_desired_and_actual_values(spark):
    rows = {
        r["user_name"]: r
        for r in reconcile(_desired(spark), _actual(spark), "user_name").collect()
    }
    assert rows["hive"]["desired_primary_group"] == "hive"
    assert rows["hive"]["actual_primary_group"] == "wrong"
    assert rows["yarn"]["actual_primary_group"] is None
    assert rows["stray"]["desired_primary_group"] is None


def test_rerun_after_apply_is_empty_delta(spark):
    desired = _desired(spark)
    # applying create+update yields actual == desired (orphans are
    # tolerated — the reference never deletes strays on create runs)
    applied = desired.unionByName(
        spark.createDataFrame([("stray", "stray")], SCHEMA)
    )
    assert idempotency_delta(desired, applied, "user_name").count() == 0


def test_initial_delta_is_create_and_update_only(spark):
    delta = idempotency_delta(_desired(spark), _actual(spark), "user_name")
    actions = {r["action"] for r in delta.collect()}
    assert actions == {ACTION_CREATE, ACTION_UPDATE}
