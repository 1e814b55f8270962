"""Integrity guards (SURVEY A3/J6) and the reference's cross-catalog
invariant: every directory owner/group exists in the identity catalog
(reference ``tests/test_directories.py:6-14``)."""

from __future__ import annotations

import pytest

from isilon_hadoop_tools_spark.operators.guards import (
    CardinalityError,
    IntegrityError,
    assert_referential_integrity,
    assert_unique,
    dangling_references,
    duplicate_keys,
)
from isilon_hadoop_tools_spark.sources import catalogs


def test_assert_unique_passes_on_unique(spark):
    df = spark.createDataFrame([("a", 1), ("b", 2)], "k STRING, v INT")
    assert_unique(df, "k")  # no raise


def test_assert_unique_raises_on_duplicate(spark):
    df = spark.createDataFrame([("a", 1), ("a", 2)], "k STRING, v INT")
    with pytest.raises(CardinalityError):
        assert_unique(df, "k")


def test_duplicate_keys_multi_column(spark):
    df = spark.createDataFrame(
        [("a", 1, "x"), ("a", 1, "y"), ("a", 2, "z")], "k1 STRING, k2 INT, v STRING"
    )
    dupes = duplicate_keys(df, ["k1", "k2"]).collect()
    assert len(dupes) == 1
    assert (dupes[0]["k1"], dupes[0]["k2"], dupes[0]["n"]) == ("a", 1, 2)


def test_referential_integrity_raises_on_dangling(spark):
    child = spark.createDataFrame([("u1",), ("ghost",)], "owner STRING")
    parent = spark.createDataFrame([("u1",), ("u2",)], "user_name STRING")
    bad = dangling_references(child, "owner", parent, "user_name").collect()
    assert [r["owner"] for r in bad] == ["ghost"]
    with pytest.raises(IntegrityError):
        assert_referential_integrity(child, "owner", parent, "user_name")


@pytest.mark.parametrize("dist", ["cdh", "cdp", "hdp"])
def test_cross_catalog_invariant(spark, dist):
    """Every directory owner is a user and every directory group is a
    group, per dist — the reference's most relational test."""
    dirs = catalogs.directories_df(spark, dist)
    users = catalogs.users_df(spark, dist)
    groups = catalogs.groups_df(spark, dist)
    assert_referential_integrity(dirs, "owner", users, "user_name")
    assert_referential_integrity(
        dirs.withColumnRenamed("group", "group_name"), "group_name", groups, "group_name"
    )
