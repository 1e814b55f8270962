"""Cross-engine stable hashes for dedup / fingerprint operators.

Spark's ``hash()``/``xxhash64()`` are murmur3/xxhash and have no DuckDB
twin, so oracle-checked operators use an md5-derived 32-bit hash that
both engines compute identically:

  Spark : ``conv(substring(md5(s), 1, 8), 16, 10)::long``
  DuckDB: ``('0x' || substr(md5(s), 1, 8))::BIGINT``

Seeded variants prefix the payload with ``<seed>:`` so MinHash gets a
family of independent hash functions from one primitive. md5 is ~2-3×
slower than murmur3 but still JVM-side and vectorizable; at 100 TB the
scan dominates, and non-oracle paths can swap in ``xxhash64``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def stable_hash32(col: Column | str, seed: int | None = None) -> Column:
    """md5-derived 32-bit unsigned hash as LongType; optional seed."""
    payload = _c(col)
    if seed is not None:
        payload = F.concat(F.lit(f"{seed}:"), payload)
    return F.conv(F.substring(F.md5(payload), 1, 8), 16, 10).cast("long")


def stable_hash32_sql(expr: str, seed: int | None = None) -> str:
    """The DuckDB-side twin of :func:`stable_hash32` (for oracles)."""
    payload = expr if seed is None else f"'{seed}:' || {expr}"
    return f"(('0x' || substr(md5({payload}), 1, 8))::BIGINT)"


def fingerprint64(col: Column | str) -> Column:
    """64-bit document fingerprint: md5-prefix (exact, cross-engine).

    DuckDB twin: ``('0x' || substr(md5(s), 1, 15))::BIGINT`` — 60 bits
    so both engines stay comfortably inside signed-64 range.
    """
    return F.conv(F.substring(F.md5(_c(col)), 1, 15), 16, 10).cast("long")


FINGERPRINT64_SQL = "(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


MERSENNE31 = (1 << 31) - 1


def affine_params(i: int) -> tuple[int, int]:
    """Deterministic (a, b) for the i-th universal-hash family member
    ``h_i(x) = (a·h(x) + b) mod 2^31-1`` — derived from md5 like the
    LSH plane constants, so any engine regenerates them exactly.
    ``a`` is non-zero mod the Mersenne prime."""
    import hashlib

    a = (
        int(hashlib.md5(f"mh_a:{i}".encode()).hexdigest()[:8], 16)
        % (MERSENNE31 - 1)
    ) + 1
    b = int(hashlib.md5(f"mh_b:{i}".encode()).hexdigest()[:8], 16) % MERSENNE31
    return a, b
