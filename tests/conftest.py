"""Shared pytest fixtures: one small local SparkSession per test run.

Mirrors the reference's test strategy (SURVEY §5): unit tests over
small inline fixtures plus cross-catalog invariants; the driver's
DuckDB oracle gate covers end-to-end query correctness separately.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from isilon_hadoop_tools_spark.session import get_session  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_session("pytest", cpus=4, shuffle_partitions=4)
    yield s
    s.stop()
