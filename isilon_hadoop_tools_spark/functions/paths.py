"""POSIX path expressions (SURVEY F4).

Reference: ``posixpath.join`` at ``onefs.py:695-699`` /
``directories.py:63`` and ``/``-stripping at ``directories.py:48-51``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def posix_join(root: Column | str, rel: Column | str) -> Column:
    """``posixpath.join(root, rel.lstrip('/'))`` with ``//`` collapse —
    absolute ``rel`` is re-rooted under ``root`` (the reference joins
    zone-relative paths this way, ``directories.py:63``). Trailing
    slashes are stripped (joining ``rel='/'`` yields ``root`` itself),
    except for the bare-root result ``'/'``."""
    joined = F.concat_ws("/", F.rtrim(F.regexp_replace(_c(root), "/+$", "")),
                         F.regexp_replace(_c(rel), "^/+", ""))
    collapsed = F.regexp_replace(joined, "/+", "/")
    return F.when(collapsed == "/", F.lit("/")).otherwise(
        F.regexp_replace(collapsed, "/$", "")
    )
