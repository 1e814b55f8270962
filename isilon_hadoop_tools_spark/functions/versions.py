"""OneFS release-version gates (reference ``onefs.py:50-64``).

The reference keys runtime behavior off 64-bit version ints
(``self._revision < ONEFS_RELEASES["8.0.1.0"]`` picks the
auth-cache-flush API shape at ``onefs.py:1038-1058``; feature flags
need ``>= 8.2.0.0``). Cluster revisions arrive as hex strings; the
engine compares them as LongType after a base-16 ``conv`` — the same
expression family the octal helpers use.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# onefs.py:51-64, verbatim values
ONEFS_RELEASES: dict[str, int] = {
    "7.2.0.0": 0x70200500000000A,
    "8.0.0.0": 0x800005000000025,
    "8.0.0.4": 0x800005000400035,
    "8.0.1.0": 0x800015000000007,
    "8.0.1.1": 0x800015000100070,
    "8.1.0.0": 0x80100500000000B,
    "8.1.1.0": 0x8010150000000D4,
    "8.1.2.0": 0x801025000000010,
    "8.1.3.0": 0x80103500000000D,
    "8.2.0.0": 0x80200500000000B,
    "8.2.1.0": 0x802015000000004,
    "8.2.2.0": 0x802025000000007,
    "8.2.3.0": 0x802035000000000,
}


def revision_long(rev_col: Column | str) -> Column:
    """Hex revision string → comparable LongType (strips an optional
    0x prefix; case-insensitive)."""
    c = F.col(rev_col) if isinstance(rev_col, str) else rev_col
    hexstr = F.regexp_replace(F.lower(c.cast("string")), "^0x", "")
    return F.conv(hexstr, 16, 10).cast("long")


def revision_at_least(rev_col: Column | str, release: str) -> Column:
    """``revision >= ONEFS_RELEASES[release]`` — the gate the
    reference's version-dependent API branches use."""
    return revision_long(rev_col) >= F.lit(ONEFS_RELEASES[release])
