"""Sorts / limits / top-k (SURVEY §2.6).

Global top-k is ``orderBy + limit`` (Spark plans
``TakeOrderedAndProject`` — per-partition heaps, no global sort).
Per-group top-k is ``row_number`` over a partitioned window — one
shuffle on the group key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk(df: DataFrame, order: list[Column], k: int) -> DataFrame:
    return df.orderBy(*order).limit(k)


def topk_per_group(
    df: DataFrame,
    group: list[str] | str,
    order: list[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    groups = [group] if isinstance(group, str) else list(group)
    w = Window.partitionBy(*groups).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
