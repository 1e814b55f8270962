"""The write side: actions DataFrames, idempotent sinks, and the
staged topological executor (SURVEY S9-S14, W2, §7.4-2/3).

The reference's whole purpose is applying desired state in a fixed
stage order with per-row conflict tolerance (groups -> users ->
memberships -> proxies, ``identities.py:284-309``; parents-before-
children directories, ``directories.py:62-86``). Catalyst does not
order side effects, so stage order is the one piece of control flow
the engine drives from plain Python; everything *within* a stage is a
declarative DataFrame plan applied by an idempotent merge sink.
"""

from isilon_hadoop_tools_spark.plans.state import ParquetState
from isilon_hadoop_tools_spark.plans.executor import Stage, run_stages

__all__ = ["ParquetState", "Stage", "run_stages"]
