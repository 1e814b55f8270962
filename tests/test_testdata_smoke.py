"""Real-testdata smoke tests.

Every other test file builds synthetic frames, which is why r4's
testdata schema drift (``events.ts`` int64-nanos → ``timestamp[us]``)
passed 165 green tests while 12 suite queries were red at the driver
gate. These tests read the actual driver-generated parquet at
``/root/testdata/sf0.001`` so a schema change fails CI first.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import types as T

from isilon_hadoop_tools_spark import suite
from isilon_hadoop_tools_spark.sources import tpch

SMOKE_SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SMOKE_SF_DIR), reason="driver testdata not present"
)


def test_all_tables_load(spark):
    for name in tpch.TABLES:
        df = tpch.load_table(spark, name, SMOKE_SF_DIR)
        assert df.limit(1).count() == 1, name


def test_events_ts_normalized_to_session_tz_timestamp(spark):
    ev = tpch.load_table(spark, "events", SMOKE_SF_DIR)
    assert isinstance(ev.schema["ts"].dataType, T.TimestampType)
    # at least one non-null, plausible-epoch timestamp
    row = ev.select("ts").dropna().first()
    assert row is not None and row["ts"].year >= 1990


def test_events_hourly_rollup_runs_on_testdata(spark):
    df = suite.REGISTRY["events_hourly_rollup"].spark(spark, SMOKE_SF_DIR)
    assert df.count() > 0
    assert set(df.columns) == {"hour", "event_type", "n_events", "sum_value"}


def test_q1_runs_on_testdata(spark):
    df = suite.REGISTRY["q1_pricing_summary"].spark(spark, SMOKE_SF_DIR)
    rows = df.collect()
    assert len(rows) > 0
    assert rows[0]["count_order"] > 0


def test_streaming_read_schema_matches_batch(spark):
    from isilon_hadoop_tools_spark.streaming.events import read_events_stream

    stream = read_events_stream(spark, SMOKE_SF_DIR)
    batch = tpch.load_table(spark, "events", SMOKE_SF_DIR)
    assert stream.schema == batch.schema
