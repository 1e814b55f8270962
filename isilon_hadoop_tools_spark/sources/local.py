"""Driver-literal DataFrames as JVM ``LocalRelation``s.

``spark.createDataFrame(rows, schema)`` over Python tuples plans as a
``Scan ExistingRDD``: every job touching it round-trips through
pickled partitions and Python workers — ~0.5 s of pure overhead per
job in local mode, and a non-prunable, non-foldable leaf at scale.
Seed catalogs are *literals* (reference ``identities.py:350-538``,
``directories.py:115-240``), so the engine renders them as SQL
``VALUES``, which Catalyst keeps as a ``LocalTableScan``: no Python
workers, broadcastable for free, and constant-foldable.
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def _sql_literal(v: object) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, str):
        return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, (bytes, bytearray)):
        return "X'" + bytes(v).hex() + "'"
    if isinstance(v, (list, tuple)):
        return "ARRAY(" + ", ".join(_sql_literal(x) for x in v) + ")"
    raise TypeError(f"unsupported literal type for local_df: {type(v)!r}")


def _struct(schema: T.StructType | str) -> T.StructType:
    if isinstance(schema, T.StructType):
        return schema
    parsed = T._parse_datatype_string(schema)
    if not isinstance(parsed, T.StructType):  # pragma: no cover
        raise TypeError(f"schema must describe a struct: {schema!r}")
    return parsed


def local_df(
    spark: SparkSession,
    rows: Iterable[Sequence[object]],
    schema: T.StructType | str,
) -> DataFrame:
    """``createDataFrame`` twin that plans as a ``LocalTableScan``.

    Rows are rendered as ``VALUES`` tuples and cast column-by-column to
    the declared types, so the result schema matches
    ``createDataFrame``'s exactly (e.g. INT stays INT, not BIGINT).
    """
    struct = _struct(schema)
    casts = ", ".join(
        f"CAST(_c{i} AS {f.dataType.simpleString()}) AS `{f.name}`"
        for i, f in enumerate(struct.fields)
    )
    names = ", ".join(f"_c{i}" for i in range(len(struct.fields)))
    tuples = [
        "(" + ", ".join(_sql_literal(v) for v in row) + ")" for row in rows
    ]
    if not tuples:
        nulls = ", ".join(
            f"CAST(NULL AS {f.dataType.simpleString()}) AS `{f.name}`"
            for f in struct.fields
        )
        return spark.sql(f"SELECT {nulls} WHERE FALSE")
    return spark.sql(
        f"SELECT {casts} FROM VALUES {', '.join(tuples)} AS _t({names})"
    )
