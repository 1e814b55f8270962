"""As-of join (SURVEY J9's "broader join algebra").

Spark has no ASOF JOIN; the naive theta-join
``l.ts >= r.ts`` + per-key max is a near-cross-product on hot keys.
This operator uses the scalable union+window form:

1. union left probes and right quotes into one keyed stream,
2. one window per key ordered by (ts, side) carries the latest right
   row forward with ``last(ignorenulls)``,
3. keep the left rows.

Cost: ONE shuffle on the key + a per-key sort — the same partitioning
an aggregation would pay, independent of how many right rows precede
each probe. Right-side rows must be unique per (key, ts): pre-dedup
with a deterministic tiebreak, or pass ``tiebreak`` columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    how: str = "inner",
) -> DataFrame:
    """For each left row, attach ``right_cols`` from the right row with
    the greatest ``right_ts`` <= ``left_ts`` on the same key.

    ``how='inner'`` drops unmatched left rows; ``'left'`` keeps them
    with nulls. Output columns: all of ``left`` + ``right_cols``.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how={how!r}")
    l_tagged = left.select(
        F.col(left_key).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),  # right rows sort first on ts ties (<=)
        *[F.col(c) for c in left.columns],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_cols],
    )
    r_tagged = right.select(
        F.col(right_key).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = l_tagged.unionByName(r_tagged).select(
        "_side",
        *left.columns,
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(c)
            for c in right_cols
        ],
    )
    out = carried.filter(F.col("_side") == 1).drop("_side")
    if how == "inner":
        matched: Column = F.lit(False)
        for c in right_cols:
            matched = matched | F.col(c).isNotNull()
        out = out.filter(matched)
    return out
