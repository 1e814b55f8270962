"""Idempotent row-sink algebra (SURVEY S9/S10/S12).

Each sink is a pure DataFrame -> DataFrame transition on a state
table; applying it through :class:`~.state.ParquetState` gives the
reference's write-and-tolerate-conflict behavior declaratively:

- ``merge_create``  : INSERT ... ON CONFLICT DO NOTHING — existing
  rows win, the engine *adopts what it finds* (reference
  ``identities.py:251-262``: ``user_already_exists`` -> adopt the
  existing UID instead of failing).
- ``apply_update``  : per-key column overwrite (chmod/chown/settings
  updates, reference ``onefs.py:813-849,1279-1318``).
- ``apply_delete``  : key anti-join (delete sinks,
  ``onefs.py:958-1008``).

All three are one join each, broadcastable when the delta is
dimension-sized, and safe to re-run: f(f(state)) == f(state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _keys(key: list[str] | str) -> list[str]:
    return [key] if isinstance(key, str) else list(key)


def merge_create(state: DataFrame, delta: DataFrame, key: list[str] | str) -> DataFrame:
    """state ∪ (delta rows whose key is absent) — conflict rows keep
    the state's version (ID adoption semantics)."""
    keys = _keys(key)
    fresh = delta.join(state.select(*keys).distinct(), keys, "left_anti")
    return state.unionByName(fresh.select(*state.columns))


def apply_update(
    state: DataFrame, updates: DataFrame, key: list[str] | str, cols: list[str]
) -> DataFrame:
    """Overwrite ``cols`` from ``updates`` where the key matches;
    unmatched state rows pass through untouched."""
    keys = _keys(key)
    upd = updates.select(*keys, *[F.col(c).alias(f"_new_{c}") for c in cols])
    joined = state.join(upd, keys, "left_outer")
    out_cols = []
    for c in state.columns:
        if c in cols:
            out_cols.append(F.coalesce(F.col(f"_new_{c}"), F.col(c)).alias(c))
        else:
            out_cols.append(F.col(c))
    return joined.select(*out_cols)


def apply_delete(state: DataFrame, doomed: DataFrame, key: list[str] | str) -> DataFrame:
    """Drop state rows whose key appears in ``doomed``."""
    keys = _keys(key)
    return state.join(doomed.select(*keys).distinct(), keys, "left_anti")
