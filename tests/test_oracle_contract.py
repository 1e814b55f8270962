"""Oracle-contract checks: every oracle must be valid DuckDB SQL whose
column names exactly match its Spark twin's schema.

The driver's value-hash compares sort columns BY NAME, so an alias
mismatch (``sum(l_quantity)`` vs ``sum_qty``) hash-fails even with
identical values — this test catches that class (and any SQL syntax
rot) in seconds, without running the data compare.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from isilon_hadoop_tools_spark import suite
from isilon_hadoop_tools_spark.sources.tpch import TABLES

SMOKE_SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SMOKE_SF_DIR), reason="driver testdata not present"
)


def test_every_oracle_parses_and_matches_spark_columns(spark, monkeypatch):
    # plan-only schema probes: do NOT populate the suite table cache —
    # a .cache() here registers plans in Spark's CacheManager, which
    # then silently rewrites later tests' scans to InMemoryTableScan
    # (it broke the pushdown plan audits)
    monkeypatch.setattr(suite, "CACHE_TABLES", False)
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
            res = con.execute(f"SELECT * FROM ({spec.oracle}) LIMIT 0")
            oracle_cols = sorted(d[0] for d in res.description)
        except Exception as exc:  # noqa: BLE001
            mismatches.append(f"{name}: oracle SQL error: {exc}")
            continue
        # streaming queries execute on schema probe; compare by the
        # batch plan only where cheap (skip the 6 streaming twins —
        # their schemas equal the hash-checked batch twins)
        if name.endswith("_stream") or name in (
            "events_sessionized",
            "events_stream_stream_join",
            "events_foreach_batch_state",
        ):
            continue
        spark_cols = sorted(spec.spark(spark, SMOKE_SF_DIR).columns)
        if spark_cols != oracle_cols:
            mismatches.append(
                f"{name}: spark={spark_cols} oracle={oracle_cols}"
            )
    assert not mismatches, "\n".join(mismatches)
