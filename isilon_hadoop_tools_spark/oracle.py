"""Helpers to render the engine's seed catalogs as ANSI-SQL VALUES
clauses, so the DuckDB oracle can check catalog-derived queries from
the *same single source of truth* (``sources/catalogs.py``).
"""

from __future__ import annotations

from collections.abc import Iterable


def sql_literal(value: object) -> str:
    if value is None:
        return "NULL"
    if isinstance(value, bool):
        return "TRUE" if value else "FALSE"
    if isinstance(value, (int, float)):
        return repr(value)
    return "'" + str(value).replace("'", "''") + "'"


def values_cte(name: str, columns: list[str], rows: Iterable[tuple]) -> str:
    """Render ``name(col, ...) AS (VALUES (...), ...)`` for a WITH clause."""
    body = ",\n    ".join(
        "(" + ", ".join(sql_literal(v) for v in row) + ")" for row in rows
    )
    cols = ", ".join(columns)
    return f"{name}({cols}) AS (VALUES\n    {body}\n)"
