"""Octal file-mode helpers (SURVEY F5/F7, hard part §7.4-4).

The reference round-trips sticky-bit modes (``0o1777``) between int
and octal-string forms: format ``f"{mode:o}"`` at ``onefs.py:822,1177``
and parse ``int(acl.mode, base=8)`` at ``onefs.py:1219``. The engine
keeps modes as integers and converts at the edges with ``conv`` —
pure JVM expressions, decimal-parse corruption impossible.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_octal(col: Column | str) -> Column:
    """Integer mode → octal string (``0o1777`` → ``'1777'``)."""
    return F.conv(F.col(col).cast("string") if isinstance(col, str) else col.cast("string"), 10, 8)


def from_octal(col: Column | str) -> Column:
    """Octal string → integer mode (``'1777'`` → ``0o1777`` == 1023)."""
    return F.conv(F.col(col) if isinstance(col, str) else col, 8, 10).cast("int")
