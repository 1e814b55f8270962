"""Atomic snapshot-manifest commits for the batch rewrite family.

The maintenance writers (``compaction_execute``,
``layout_write_footer_stats``) used to land bare ``mode("overwrite")``
parquet directories: a reader concurrent with the rewrite saw a
half-written table, and there was no old state to roll back to. This
module gives them the mini-Delta/Iceberg commit discipline the
engine's STREAMING maintainers already have (marker-row commits +
crash matrices), generalizing the reference's rerun-converges sink
contract (`/root/reference/src/isilon_hadoop_tools/identities.py:124-160`
— tolerate-exists, idempotent replay) to whole-table rewrites:

- data files land in a fresh VERSIONED directory
  (``<table>/data/v<NNNNN>/``) that no reader points at yet;
- a manifest (``<table>/_manifests/<NNNNN>.json``) records the exact
  file list, row count, and an order-independent checksum;
- the commit is ONE atomic pointer swap (write-temp + ``os.replace``
  of ``<table>/_LATEST``) — POSIX rename atomicity, the same primitive
  Delta's ``_delta_log`` commit relies on per log file.

Crash matrix (every window leaves a readable table):

====================================  =================================
crash window                          observable state
====================================  =================================
during the data write                 torn ``data/v<N>`` dir exists but
                                      NO manifest points at it — readers
                                      still resolve the old pointer;
                                      replay overwrites the dir
after manifest, before pointer swap   manifest is orphaned-but-valid;
                                      readers still see the old version;
                                      replay allocates the NEXT version
                                      and swaps the pointer — converges
during either rename                  ``os.replace`` is atomic: readers
                                      see the old or the new file, never
                                      a partial one
====================================  =================================

Readers (:func:`snapshot_read`) load the MANIFEST's exact file list
(``basePath``-anchored so partition columns survive), so stray or torn
files in the data directory are invisible by construction, and any
previous version stays readable until its files are vacuumed — which
is what makes ``version=N-1`` time travel free.

Single-writer assumption, stated loudly: ``os.replace`` arbitrates
nothing between two concurrent writers (Delta uses the object store's
put-if-absent for that); this layer targets the single-maintenance-job
pattern of the reference tool.
"""

from __future__ import annotations

import json
import os
import pathlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFESTS = "_manifests"
_POINTER = "_LATEST"


def _table(table_dir: str | os.PathLike) -> pathlib.Path:
    return pathlib.Path(table_dir)


def _atomic_write_text(path: pathlib.Path, text: str) -> None:
    tmp = path.with_name(path.name + ".tmp")
    tmp.write_text(text)
    os.replace(tmp, path)


def latest_version(table_dir: str | os.PathLike) -> int | None:
    """The committed version the pointer names, or None for an empty
    table. Reads ONE small file — never lists the data directory."""
    p = _table(table_dir) / _POINTER
    try:
        return int(p.read_text().strip())
    except FileNotFoundError:
        return None


def _manifest_path(table_dir: str | os.PathLike, version: int) -> pathlib.Path:
    return _table(table_dir) / _MANIFESTS / f"{version:05d}.json"


def read_manifest(table_dir: str | os.PathLike, version: int) -> dict:
    return json.loads(_manifest_path(table_dir, version).read_text())


def _next_version(table_dir: str | os.PathLike) -> int:
    """1 + the highest manifest on disk (NOT the pointer): an orphaned
    manifest from a crash-before-pointer-swap must never be reused for
    different content, so replay allocates past it."""
    mdir = _table(table_dir) / _MANIFESTS
    if not mdir.is_dir():
        return 1
    vs = [
        int(f.stem)
        for f in mdir.glob("*.json")
        if f.stem.isdigit()
    ]
    return max(vs, default=0) + 1


def snapshot_write(
    df: DataFrame,
    table_dir: str | os.PathLike,
    partition_by: list[str] | None = None,
    stats_cols: list[str] | None = None,
) -> int:
    """Write ``df`` as the table's next snapshot and atomically commit
    it. Returns the committed version number.

    The data write is a normal distributed parquet job into the fresh
    versioned directory; everything after it is bounded driver-side
    METADATA work (one file listing of that directory, two small-file
    renames) — nothing scales with row count.

    ``stats_cols``: record per-file min/max for these columns in the
    manifest (read from the real parquet FOOTERS with pyarrow — the
    Iceberg manifest-stats idea), enabling :func:`snapshot_scan` to
    prune files at PLANNING time without opening them. The footer
    walk is driver-side metadata work bounded by the file count."""
    table = _table(table_dir)
    version = _next_version(table)
    data_rel = f"data/v{version:05d}"
    data_dir = table / data_rel
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(str(data_dir))
    files = sorted(
        str(p.relative_to(data_dir))
        for p in data_dir.rglob("part-*.parquet")
    )
    spark = df.sparkSession
    if files:
        back = _read_files(spark, data_dir, files)
        from isilon_hadoop_tools_spark.functions.hashing import fingerprint64

        chk = back.select(
            fingerprint64(
                F.concat_ws(
                    "|", *[F.col(c).cast("string") for c in back.columns]
                )
            ).alias("_fp")
        ).agg(F.bit_xor("_fp").alias("c"), F.count(F.lit(1)).alias("n"))
        crow = chk.collect()[0]
        n_rows = int(crow["n"])
        checksum = int(crow["c"]) if crow["c"] is not None else 0
        schema = back.schema.json()
    else:  # empty table: keep the schema so time travel still reads
        n_rows, checksum, schema = 0, 0, df.schema.json()
    manifest = {
        "version": version,
        "data_dir": data_rel,
        "files": files,
        "n_files": len(files),
        "n_rows": n_rows,
        "checksum": checksum,
        "partition_by": partition_by or [],
        "schema": schema,
    }
    if stats_cols:
        manifest["file_stats"] = _footer_stats(data_dir, files, stats_cols)
    (table / _MANIFESTS).mkdir(parents=True, exist_ok=True)
    _atomic_write_text(
        _manifest_path(table, version), json.dumps(manifest, indent=1)
    )
    _atomic_write_text(table / _POINTER, str(version))
    return version


def _read_files(
    spark: SparkSession, data_dir: pathlib.Path, files: list[str]
) -> DataFrame:
    paths = [str(data_dir / f) for f in files]
    return spark.read.option("basePath", str(data_dir)).parquet(*paths)


def _footer_stats(
    data_dir: pathlib.Path, files: list[str], cols: list[str]
) -> dict:
    """Per-file [min, max] for ``cols`` out of the parquet footers —
    real statistics any engine agrees on, not recomputed from data."""
    import pyarrow.parquet as pq

    out: dict[str, dict[str, list]] = {}
    for rel in files:
        md = pq.ParquetFile(str(data_dir / rel)).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        stats: dict[str, list] = {}
        for col in cols:
            if col not in names:
                continue  # partition column: not in the data footer
            mns, mxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(names[col]).statistics
                if st is None or not st.has_min_max:
                    mns, mxs = [], []
                    break
                mns.append(st.min)
                mxs.append(st.max)
            if mns:
                stats[col] = [min(mns), max(mxs)]
        out[rel] = stats
    return out


def snapshot_prune(
    table_dir: str | os.PathLike,
    col: str,
    lo,
    hi,
    version: int | None = None,
) -> tuple[list[str], int]:
    """Manifest-stats file pruning (the Iceberg planning-time prune):
    the files of a committed snapshot whose footer ``[min, max]`` for
    ``col`` intersects ``[lo, hi]``, plus the total file count. Pure
    driver-side manifest work — no file is opened. Files without
    recorded stats for ``col`` are conservatively kept."""
    table = _table(table_dir)
    if version is None:
        version = latest_version(table)
        if version is None:
            raise FileNotFoundError(f"no committed snapshot in {table}")
    m = read_manifest(table, version)
    stats = m.get("file_stats", {})
    kept = []
    for rel in m["files"]:
        s = stats.get(rel, {}).get(col)
        if s is None or (s[1] >= lo and s[0] <= hi):
            kept.append(rel)
    return kept, len(m["files"])


def snapshot_scan(
    spark: SparkSession,
    table_dir: str | os.PathLike,
    col: str,
    lo,
    hi,
    version: int | None = None,
) -> DataFrame:
    """Range scan THROUGH the manifest stats: only files whose footer
    range intersects ``[lo, hi]`` are handed to the reader (planning-
    time pruning — the skipped files are never opened), and the exact
    residual filter is applied on top, so the result equals a full
    scan + filter at a fraction of the I/O when the layout clusters
    ``col`` (write with :func:`snapshot_write` ``stats_cols`` after a
    range repartition — the SC8 zone-map discipline, now carried by
    the table format instead of a side report)."""
    table = _table(table_dir)
    if version is None:
        version = latest_version(table)
        if version is None:
            raise FileNotFoundError(f"no committed snapshot in {table}")
    kept, _total = snapshot_prune(table, col, lo, hi, version)
    m = read_manifest(table, version)
    if not kept:
        return snapshot_read(spark, table, version).filter(F.lit(False))
    df = _read_files(spark, table / m["data_dir"], kept)
    return df.filter(F.col(col).between(lo, hi))


def snapshot_vacuum(
    table_dir: str | os.PathLike,
    keep_last: int = 2,
) -> dict:
    """Reclaim data files referenced ONLY by expired snapshots — the
    Delta VACUUM / Iceberg expire-snapshots maintenance step that
    bounds the time-travel window. Keeps the newest ``keep_last``
    committed versions (pointer version and below) plus any orphaned
    manifests ABOVE the pointer (a concurrent writer's crash window
    is not ours to collect); a data file is deleted only when NO kept
    manifest references it, so readers pinned to a kept version are
    never torn. Expired manifests are removed after their files, so a
    crash mid-vacuum leaves manifests whose ``readable`` flag in
    :func:`snapshot_history` reports the damage honestly and a rerun
    converges. Pure driver-side metadata work.

    Returns ``{"files_deleted": n, "versions_expired": [...]}``.
    """
    if keep_last < 1:
        raise ValueError(f"keep_last must be >= 1; got {keep_last}")
    table = _table(table_dir)
    latest = latest_version(table)
    if latest is None:
        return {"files_deleted": 0, "versions_expired": []}
    mdir = table / _MANIFESTS
    versions = sorted(
        int(f.stem) for f in mdir.glob("*.json") if f.stem.isdigit()
    )
    committed = [v for v in versions if v <= latest]
    expired = committed[:-keep_last] if len(committed) > keep_last else []
    kept = [v for v in versions if v not in expired]
    live: set[pathlib.Path] = set()
    for v in kept:
        m = read_manifest(table, v)
        live.update((table / m["data_dir"] / f).resolve() for f in m["files"])
    deleted = 0
    for v in expired:
        m = read_manifest(table, v)
        data_dir = table / m["data_dir"]
        for rel in m["files"]:
            p = (data_dir / rel).resolve()
            if p not in live and p.is_file():
                p.unlink()
                deleted += 1
    for v in expired:  # manifests last: a mid-vacuum crash stays visible
        _manifest_path(table, v).unlink(missing_ok=True)
    return {"files_deleted": deleted, "versions_expired": expired}


def snapshot_diff(
    spark: SparkSession,
    table_dir: str | os.PathLike,
    v_from: int,
    v_to: int,
) -> DataFrame:
    """Multiset CDC diff between two committed snapshots: rows only
    in ``v_to`` tagged ``'added'``, rows only in ``v_from`` tagged
    ``'removed'`` (bag semantics via ``exceptAll`` — a row present
    twice-then-once yields one ``removed``). One shuffle per side on
    the full row; this IS the honest cost of exporting a CDC stream
    from snapshots that don't carry row lineage."""
    a = snapshot_read(spark, table_dir, v_from)
    b = snapshot_read(spark, table_dir, v_to)
    added = b.exceptAll(a).withColumn("change", F.lit("added"))
    removed = a.exceptAll(b).withColumn("change", F.lit("removed"))
    return added.unionByName(removed)


def snapshot_read(
    spark: SparkSession,
    table_dir: str | os.PathLike,
    version: int | None = None,
) -> DataFrame:
    """Read a committed snapshot — the pointer's version by default,
    or an explicit older ``version`` (time travel). Only the
    manifest's exact file list is scanned, so a concurrent rewrite's
    in-flight files are invisible."""
    table = _table(table_dir)
    if version is None:
        version = latest_version(table)
        if version is None:
            raise FileNotFoundError(f"no committed snapshot in {table}")
    m = read_manifest(table, version)
    if not m["files"]:
        from pyspark.sql.types import StructType

        return spark.createDataFrame(
            [], StructType.fromJson(json.loads(m["schema"]))
        )
    return _read_files(spark, table / m["data_dir"], m["files"])


def snapshot_history(
    spark: SparkSession, table_dir: str | os.PathLike
) -> DataFrame:
    """One row per manifest on disk: version, file/row counts,
    checksum, whether the pointer names it (``is_latest``), and
    whether every data file it lists is still present (``readable``
    — False after a vacuum, or for an orphan whose replay overwrote
    the versioned directory). Driver-side metadata work bounded by
    manifest and file counts."""
    table = _table(table_dir)
    latest = latest_version(table)
    mdir = table / _MANIFESTS
    rows = []
    for f in sorted(mdir.glob("*.json")) if mdir.is_dir() else []:
        if not f.stem.isdigit():
            continue
        m = json.loads(f.read_text())
        v = int(m["version"])
        data_dir = table / m["data_dir"]
        rows.append(
            (
                v,
                int(m["n_files"]),
                int(m["n_rows"]),
                int(m["checksum"]),
                bool(latest is not None and v == latest),
                all((data_dir / rel).is_file() for rel in m["files"]),
            )
        )
    return spark.createDataFrame(
        rows,
        "version LONG, n_files LONG, n_rows LONG, checksum LONG,"
        " is_latest BOOLEAN, readable BOOLEAN",
    )
