"""Literal map construction with O(1) plan/py4j cost.

``F.create_map(*[F.lit(k), F.lit(v), ...])`` builds 2·N Column objects
through py4j and a 2·N-node expression tree — measured at ~3-4 ms per
roundtrip on a loaded driver, that is real wall time for every
driver-computed lookup table (GD weight maps, the two-phase
row-number partition offsets), and it recurs PER ITERATION in training
loops. ``map_from_arrays`` of two array literals is semantically the
same map (same ``try_element_at`` lookup behavior) built in two py4j
calls and two Literal nodes, independent of N.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def lit_map(
    keys: list, vals: list, key_type: str, val_type: str
) -> Column:
    """A map literal ``{keys[i]: vals[i]}`` as ONE map_from_arrays of
    two array literals. ``key_type`` / ``val_type`` are Spark SQL type
    names (e.g. ``"bigint"``, ``"string"``); keys must be distinct."""
    return F.map_from_arrays(
        F.lit(list(keys)).cast(f"array<{key_type}>"),
        F.lit(list(vals)).cast(f"array<{val_type}>"),
    )


def lit_long_map(mapping: dict, sort: bool = True) -> Column:
    """``lit_map`` for the common int→int driver table (GD weights,
    partition offsets), bigint-typed on both sides."""
    items = sorted(mapping.items()) if sort else list(mapping.items())
    return lit_map(
        [int(k) for k, _ in items],
        [int(v) for _, v in items],
        "bigint",
        "bigint",
    )
