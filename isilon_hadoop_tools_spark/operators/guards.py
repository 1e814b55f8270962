"""Integrity guards (SURVEY A3, J6, P7).

The reference asserts cardinality-1 on every name lookup
(``onefs.py:1079-1081,1230-1232,1274-1276,1338-1340``, raising
``MalformedAPIError``/``MissingNameError``) and its tests assert
referential integrity between the directory and identity catalogs
(``tests/test_directories.py:6-14``). The engine expresses both as
cheap aggregate checks that return offending rows (empty == pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from isilon_hadoop_tools_spark import IsilonHadoopToolsSparkError


class CardinalityError(IsilonHadoopToolsSparkError):
    """A key that must be unique resolved to multiple rows."""


class IntegrityError(IsilonHadoopToolsSparkError):
    """A foreign-key reference resolved to no row."""


def duplicate_keys(df: DataFrame, key: list[str] | str) -> DataFrame:
    """Rows per key with count > 1 (must be empty; reference's
    duplicate local+LDAP detection)."""
    keys = [key] if isinstance(key, str) else list(key)
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n")).filter(F.col("n") > 1)


def assert_unique(df: DataFrame, key: list[str] | str) -> None:
    dupes = duplicate_keys(df, key).limit(1).collect()
    if dupes:
        raise CardinalityError(f"duplicate key rows: {dupes}")


def dangling_references(
    child: DataFrame, child_col: str, parent: DataFrame, parent_col: str
) -> DataFrame:
    """Child rows whose FK has no parent (left-anti; must be empty)."""
    return child.join(
        parent.select(F.col(parent_col).alias(child_col)).distinct(),
        child_col,
        "left_anti",
    )


def assert_referential_integrity(
    child: DataFrame, child_col: str, parent: DataFrame, parent_col: str
) -> None:
    bad = dangling_references(child, child_col, parent, parent_col).limit(1).collect()
    if bad:
        raise IntegrityError(f"dangling references: {bad}")


def assert_referential_integrity_many(
    checks: list[tuple[DataFrame, str, DataFrame, str]],
) -> None:
    """Batch form: union all dangling-reference probes into ONE Spark
    job (each ``assert_*`` collect costs a full job-scheduling round
    trip, which dominates on dimension-sized inputs)."""
    probes = None
    for child, child_col, parent, parent_col in checks:
        p = dangling_references(child, child_col, parent, parent_col).select(
            F.lit(child_col).alias("fk"),
            F.col(child_col).cast("string").alias("value"),
        )
        probes = p if probes is None else probes.unionByName(p)
    if probes is None:
        return
    bad = probes.limit(1).collect()
    if bad:
        raise IntegrityError(f"dangling references: {bad}")
