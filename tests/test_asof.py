"""As-of join unit tests: latest-at-or-before semantics, tie handling
(a quote exactly at the probe ts matches), inner vs left, multi-key
isolation."""

from __future__ import annotations

from isilon_hadoop_tools_spark.operators.asof import asof_join

L = "k STRING, t LONG, probe STRING"
R = "k STRING, qt LONG, quote STRING"


def _run(spark, left_rows, right_rows, how="inner"):
    left = spark.createDataFrame(left_rows, L)
    right = spark.createDataFrame(right_rows, R)
    out = asof_join(left, right, "k", "k", "t", "qt", ["quote", "qt"], how=how)
    return {(r["k"], r["t"]): (r["quote"], r["qt"]) for r in out.collect()}


def test_latest_at_or_before(spark):
    got = _run(
        spark,
        [("a", 10, "p1"), ("a", 25, "p2")],
        [("a", 5, "q5"), ("a", 20, "q20"), ("a", 30, "q30")],
    )
    assert got == {("a", 10): ("q5", 5), ("a", 25): ("q20", 20)}


def test_tie_quote_at_probe_ts_matches(spark):
    got = _run(spark, [("a", 20, "p")], [("a", 20, "q20"), ("a", 10, "q10")])
    assert got == {("a", 20): ("q20", 20)}


def test_inner_drops_unmatched_left_left_keeps(spark):
    left = [("a", 1, "early"), ("b", 50, "other-key")]
    right = [("a", 10, "q")]
    assert _run(spark, left, right, how="inner") == {}
    got = _run(spark, left, right, how="left")
    assert got == {("a", 1): (None, None), ("b", 50): (None, None)}


def test_keys_do_not_leak(spark):
    got = _run(
        spark,
        [("a", 100, "pa"), ("b", 100, "pb")],
        [("a", 10, "qa"), ("b", 90, "qb")],
    )
    assert got == {("a", 100): ("qa", 10), ("b", 100): ("qb", 90)}
