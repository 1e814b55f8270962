"""Oracle-contract checks: every oracle must be valid DuckDB SQL whose
column names exactly match its Spark twin's schema.

The driver's value-hash compares sort columns BY NAME, so an alias
mismatch (``sum(l_quantity)`` vs ``sum_qty``) hash-fails even with
identical values — this test catches that class (and any SQL syntax
rot) in seconds, without running the data compare.

GATE BUDGET (VERDICT r16 item 2): the DuckDB half (parse + DESCRIBE
every oracle, the HUGEINT/DECIMAL bans) is seconds and always runs
over the WHOLE registry. The Spark half (building every query's
DataFrame for the schema compare) is the expensive part — ~5 min of
plan builds, the same cost class as the full plan audit — so the
default run builds only a stable md5 quarter of the registry;
``SPARK_GRAFT_FULL_AUDIT=1`` restores the full schema compare (the
builder's close-out gate). The real value compare for every query is
the oracle gate (``tools/check.py``) and the driver's correctness
window — this test is the fast alias/type tripwire, not the value
check.
"""

from __future__ import annotations

import hashlib
import os

import duckdb
import pytest

from isilon_hadoop_tools_spark import suite
from isilon_hadoop_tools_spark.sources.tpch import TABLES

SMOKE_SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SMOKE_SF_DIR), reason="driver testdata not present"
)


def _duck_category(duck_type: str) -> str:
    t = duck_type.upper()
    if t == "HUGEINT":
        return "hugeint"
    if t in (
        "BIGINT", "INTEGER", "SMALLINT", "TINYINT",
        "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT",
    ):
        return "int"
    if t in ("DOUBLE", "FLOAT", "REAL"):
        return "float"
    if t.startswith("DECIMAL"):
        return "decimal"
    return "other"


def _spark_category(spark_type: str) -> str:
    if spark_type in ("bigint", "int", "smallint", "tinyint", "long"):
        return "int"
    if spark_type in ("double", "float"):
        return "float"
    if spark_type.startswith("decimal"):
        return "decimal"
    return "other"


def test_every_oracle_parses_and_matches_spark_columns(spark, monkeypatch):
    # plan-only schema probes: do NOT populate the suite table cache —
    # a .cache() here registers plans in Spark's CacheManager, which
    # then silently rewrites later tests' scans to InMemoryTableScan
    # (it broke the pushdown plan audits)
    from isilon_hadoop_tools_spark.suite import _shared

    monkeypatch.setattr(_shared, "CACHE_TABLES", False)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SMOKE_SF_DIR}/{t}.parquet')"
        )
    mismatches = []
    for name, spec in suite.REGISTRY.items():
        if spec.oracle is None:
            continue
        try:
            desc = con.execute(
                f"DESCRIBE SELECT * FROM ({spec.oracle}) LIMIT 0"
            ).fetchall()
            oracle_types = {row[0]: row[1] for row in desc}
            oracle_cols = sorted(oracle_types)
        except Exception as exc:  # noqa: BLE001
            mismatches.append(f"{name}: oracle SQL error: {exc}")
            continue
        # DuckDB types bare sum(<int>) as HUGEINT, which the driver's
        # canonicalizer hashes differently than Spark's BIGINT even
        # when values are identical — this exact class caused 4 red
        # driver rows across rounds (r3 ×3, r5 ×1). Ban it outright:
        # every integer aggregate in an oracle needs a ::BIGINT cast.
        for col, duck_type in oracle_types.items():
            if _duck_category(duck_type) == "hugeint":
                mismatches.append(
                    f"{name}.{col}: oracle is HUGEINT — add a ::BIGINT "
                    "cast (driver hashes it differently than Spark)"
                )
            # DECIMAL is the same trap class: DuckDB widens decimal
            # aggregates to its own precision/scale and stringifies
            # them with trailing zeros ("4.50"), while Spark sides are
            # double ("4.5") or a differently-scaled decimal — the
            # driver canonicalizer hash-fails on the string form even
            # with equal values. No oracle produces DECIMAL today; ban
            # it so none starts: cast to ::DOUBLE + round (float
            # gates) or ::BIGINT (integer gates).
            elif _duck_category(duck_type) == "decimal":
                mismatches.append(
                    f"{name}.{col}: oracle is {duck_type} — cast to "
                    "::DOUBLE with an explicit round (or ::BIGINT); "
                    "decimal stringification diverges across engines"
                )
        # streaming queries execute on schema probe; compare by the
        # batch plan only where cheap (skip the 6 streaming twins —
        # their schemas equal the hash-checked batch twins)
        if name.endswith("_stream") or name in (
            "events_sessionized",
            "events_stream_stream_join",
            "events_foreach_batch_state",
        ):
            continue
        if (
            os.environ.get("SPARK_GRAFT_FULL_AUDIT") != "1"
            and int(hashlib.md5(name.encode()).hexdigest(), 16) % 4 != 0
        ):
            continue  # fast gate: Spark schema build on the md5 quarter
        spark_fields = spec.spark(spark, SMOKE_SF_DIR).schema.fields
        spark_cols = sorted(f.name for f in spark_fields)
        if spark_cols != oracle_cols:
            mismatches.append(
                f"{name}: spark={spark_cols} oracle={oracle_cols}"
            )
            continue
        # numeric-category agreement: an int-typed oracle column vs a
        # float-typed Spark column (or any decimal skew) stringifies
        # differently in the driver canonicalizer ("4" vs "4.0") and
        # hash-fails despite equal values — catch it plan-only here.
        numeric = {"int", "float", "decimal", "hugeint"}
        for f in spark_fields:
            dc = _duck_category(oracle_types[f.name])
            sc = _spark_category(f.dataType.simpleString())
            if {dc, sc} <= numeric and dc != sc:
                mismatches.append(
                    f"{name}.{f.name}: numeric category mismatch "
                    f"oracle={oracle_types[f.name]} "
                    f"spark={f.dataType.simpleString()}"
                )
    assert not mismatches, "\n".join(mismatches)
