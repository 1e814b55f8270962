"""Staged topological executor (SURVEY W2, §4 custom #1).

Catalyst orders nothing across side-effecting writes, so the engine
sequences its stages in plain Python — the direct analog of the
reference's fixed iteration order (``identities.py:284-309``:
groups, then users, then memberships, then proxies;
``directories.py:62-86``: parents before children). Each stage
builds a full next-generation DataFrame for one state table and
commits it through the swap sink before the next stage runs, so later
stages always read their prerequisites' committed output.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame

from isilon_hadoop_tools_spark.plans.state import ParquetState


@dataclass
class Stage:
    """One topological step: ``build(state)`` returns the next
    generation of ``table``."""

    name: str
    table: str
    build: Callable[[ParquetState], DataFrame]


def run_stages(
    state: ParquetState,
    stages: list[Stage],
    target_partitions: int | None = 1,
) -> list[tuple[str, int]]:
    """Run stages in order; returns ``[(stage_name, rows_after)]``.

    ``target_partitions=1`` (default) coalesces each stage's output
    before the write: these state tables are dimension catalogs
    (reference workload <= ~60 rows/table), and a 32-partition plan
    would otherwise commit 32 near-empty files per stage. Pass
    ``None`` for fact-sized states.

    Dry-run (reference S14, ``log_identities``): call each
    ``stage.build(state)`` yourself and display the DataFrames —
    the builders are side-effect-free; only this function writes.
    """
    report = []
    for stage in stages:
        next_gen = stage.build(state)
        if target_partitions is not None:
            next_gen = next_gen.coalesce(target_partitions)
        n = state.write(stage.table, next_gen)
        report.append((stage.name, n))
    return report
