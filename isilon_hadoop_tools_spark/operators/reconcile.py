"""Desired-vs-actual reconciliation (SURVEY J8, §7.4-3).

The reference's core semantic: write desired state, tolerate
already-exists, adopt what it finds (``identities.py:137-148,251-262``,
``directories.py:67-71``, README "work with what it finds"). The
engine expresses it declaratively: a full-outer join of the desired
and actual catalogs classified into an **actions DataFrame** —
``create`` / ``update`` / ``noop`` / ``orphan`` — which a sink then
applies (or a dry-run displays, reference S14).

This is shuffle-efficient at 100 TB: one full-outer sort-merge join
on the key (AQE picks broadcast when one side is dimension-sized),
and the classification is a codegen'd CASE expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ACTION_CREATE = "create"
ACTION_UPDATE = "update"
ACTION_NOOP = "noop"
ACTION_ORPHAN = "orphan"  # actual row with no desired twin


def reconcile(
    desired: DataFrame,
    actual: DataFrame,
    key: list[str] | str,
    compare: list[str] | None = None,
) -> DataFrame:
    """Full-outer diff → actions DataFrame.

    Output: key columns, ``action`` STRING, and ``desired_*`` /
    ``actual_*`` copies of the compared columns.  ``compare`` defaults
    to every shared non-key column.
    """
    keys = [key] if isinstance(key, str) else list(key)
    if compare is None:
        shared = set(desired.columns) & set(actual.columns)
        compare = sorted(shared - set(keys))

    d = desired.select(
        *keys,
        F.lit(True).alias("_d_present"),
        *[F.col(c).alias(f"desired_{c}") for c in compare],
    )
    a = actual.select(
        *keys,
        F.lit(True).alias("_a_present"),
        *[F.col(c).alias(f"actual_{c}") for c in compare],
    )
    joined = d.join(a, keys, "full_outer")

    differs = F.lit(False)
    for c in compare:
        differs = differs | ~(
            F.col(f"desired_{c}").eqNullSafe(F.col(f"actual_{c}"))
        )

    action = (
        F.when(F.col("_a_present").isNull(), F.lit(ACTION_CREATE))
        .when(F.col("_d_present").isNull(), F.lit(ACTION_ORPHAN))
        .when(differs, F.lit(ACTION_UPDATE))
        .otherwise(F.lit(ACTION_NOOP))
    )
    out_cols = (
        keys
        + [action.alias("action")]
        + [f"desired_{c}" for c in compare]
        + [f"actual_{c}" for c in compare]
    )
    return joined.select(*out_cols)


def idempotency_delta(desired: DataFrame, actual: DataFrame, key: list[str] | str) -> DataFrame:
    """Rows still needing work after a run — empty iff the run was
    idempotent-complete (the reference's rerun invariant,
    README.md:163-166)."""
    out = reconcile(desired, actual, key)
    return out.filter(F.col("action").isin(ACTION_CREATE, ACTION_UPDATE))
