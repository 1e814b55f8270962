"""Contiguous ID allocation (SURVEY W1) — the engine's parallel
re-expression of the reference's serial counter probe
(``identities.py:75-89,126-149``)."""

from __future__ import annotations

from isilon_hadoop_tools_spark.operators.allocate_ids import (
    allocate_ids,
    allocate_ids_scalable,
)


def test_allocate_contiguous_no_taken(spark):
    names = spark.createDataFrame([("b",), ("a",), ("c",)], "name STRING")
    out = {
        r["name"]: r["uid"]
        for r in allocate_ids(names, "name", start=1025, out_col="uid").collect()
    }
    # k-th name in sorted order gets the k-th ID
    assert out == {"a": 1025, "b": 1026, "c": 1027}


def test_allocate_skips_taken_ids(spark):
    names = spark.createDataFrame([(n,) for n in "abcde"], "name STRING")
    taken = spark.createDataFrame([(1025,), (1027,), (1028,)], "id INT")
    out = {
        r["name"]: r["uid"]
        for r in allocate_ids(names, "name", taken, start=1025, out_col="uid").collect()
    }
    # free IDs in order: 1026, 1029, 1030, 1031, 1032
    assert out == {"a": 1026, "b": 1029, "c": 1030, "d": 1031, "e": 1032}


def test_allocate_dedups_names(spark):
    names = spark.createDataFrame([("a",), ("a",), ("b",)], "name STRING")
    rows = allocate_ids(names, "name", start=1).collect()
    assert len(rows) == 2
    assert {r["id"] for r in rows} == {1, 2}


def test_allocate_scalable_dense_and_ordered(spark):
    n = 500
    names = spark.createDataFrame(
        [(f"user{i:04d}",) for i in range(n)], "name STRING"
    )
    rows = allocate_ids_scalable(names, "name", start=1025, out_col="uid").collect()
    assert len(rows) == n
    by_name = {r["name"]: r["uid"] for r in rows}
    # dense: exactly [start, start+n)
    assert sorted(by_name.values()) == list(range(1025, 1025 + n))
    # order-aligned: sorted names get ascending IDs
    ordered = [by_name[k] for k in sorted(by_name)]
    assert ordered == list(range(1025, 1025 + n))


def test_allocate_scalable_matches_simple(spark):
    names = spark.createDataFrame(
        [(f"n{i:03d}",) for i in range(50)], "name STRING"
    )
    simple = {
        r["name"]: r["id"] for r in allocate_ids(names, "name", start=7).collect()
    }
    scalable = {
        r["name"]: r["id"]
        for r in allocate_ids_scalable(names, "name", start=7).collect()
    }
    assert simple == scalable
