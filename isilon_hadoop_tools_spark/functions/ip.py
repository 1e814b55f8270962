"""IPv4 <-> uint32 helpers and range expansion (SURVEY F7/F11).

The reference converts dotted-quad to uint32 with ``socket.inet_aton``
+ ``struct.unpack`` and enumerates every address in each network
pool's ``[low, high]`` ranges (``onefs.py:1182-1197``). The engine
does the same arithmetic as JVM expressions and expands ranges with
``explode(sequence(lo, hi))`` — distributed, no driver loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def ip_to_long(col: Column | str) -> Column:
    """Dotted-quad string → uint32 as LongType (big-endian, like
    ``struct.unpack("!I", socket.inet_aton(ip))``)."""
    parts = F.split(_c(col), r"\.")
    return (
        parts.getItem(0).cast("long") * F.lit(16777216)
        + parts.getItem(1).cast("long") * F.lit(65536)
        + parts.getItem(2).cast("long") * F.lit(256)
        + parts.getItem(3).cast("long")
    )


def long_to_ip(col: Column | str) -> Column:
    """uint32 LongType → dotted-quad string (``socket.inet_ntoa``)."""
    c = _c(col)
    return F.concat_ws(
        ".",
        (c / 16777216).cast("long") % 256,
        (c / 65536).cast("long") % 256,
        (c / 256).cast("long") % 256,
        c % 256,
    )


def expand_ip_ranges(
    df: DataFrame,
    lo_col: str,
    hi_col: str,
    out: str = "addr",
    keep: list[str] | None = None,
) -> DataFrame:
    """One row per address in ``[lo, hi]`` (inclusive), deduplicated —
    the engine's ``node_addresses`` (``onefs.py:1182-1197``).
    ``keep`` columns ride along (dedup is then per kept-key).

    ``sequence()`` materializes per-row arrays; for WAN-sized ranges
    at 100 TB scale, pre-split ranges into /24 chunks first so no
    single row explodes into millions of elements.
    """
    keep = keep or []
    return (
        df.select(
            *keep,
            F.explode(F.sequence(ip_to_long(lo_col), ip_to_long(hi_col))).alias(
                "_addr_long"
            ),
        )
        .select(*keep, long_to_ip("_addr_long").alias(out))
        .distinct()
    )
