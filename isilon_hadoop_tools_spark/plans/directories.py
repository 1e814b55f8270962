"""The directory write pipeline: parents-first mkdir/chmod/chown
(reference ``directories.py:41-86``).

The reference walks an ordered list and issues three calls per row —
mkdir (tolerating already-exists), chmod, chown
(``directories.py:62-86``). The engine stages rows by path depth:
one stage per depth level, each a single merge+update write, so every
parent is committed before any child (the W2 ordering made explicit),
and the mkdir/chmod/chown triple collapses into "insert if absent,
then overwrite owner/group/mode" — chmod+chown run even when the
mkdir was a conflict, exactly like the reference loop.

The zone-relative root comes from settings reads (S7,
``directories.py:47-59``): root = posix_join(zone_path, hdfs_root);
a root of ``/ifs`` itself is refused (``HDFSRootDirectoryError``,
``directories.py:52-57``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from isilon_hadoop_tools_spark import IsilonHadoopToolsSparkError
from isilon_hadoop_tools_spark.functions.paths import posix_join
from isilon_hadoop_tools_spark.operators.guards import assert_referential_integrity
from isilon_hadoop_tools_spark.plans.executor import Stage, run_stages
from isilon_hadoop_tools_spark.plans.sinks import apply_update, merge_create
from isilon_hadoop_tools_spark.plans.state import ParquetState

DIRECTORIES_STATE = "path STRING, owner STRING, group STRING, mode INT"


class HDFSRootDirectoryError(IsilonHadoopToolsSparkError):
    """Refuse to treat the zone root itself as the HDFS root
    (reference ``directories.py:52-57``)."""


def resolve_hdfs_root(zone_path: str, hdfs_root_dir: str) -> str:
    root = "/" + "/".join(
        p for p in (zone_path.strip("/"), hdfs_root_dir.strip("/")) if p
    )
    if root.rstrip("/") in ("", "/ifs"):
        raise HDFSRootDirectoryError(
            f"HDFS root {root!r} must not be the OneFS root"
        )
    return root


def desired_directories(
    spark: SparkSession,
    dist: str,
    hdfs_root: str,
    suffix: str | None = None,
) -> DataFrame:
    """The directory catalog resolved to absolute paths with the
    identity suffix applied to owner/group (``directories.py:109-112``)
    and a ``depth`` column for stage grouping."""
    from isilon_hadoop_tools_spark.sources import catalogs

    dirs = catalogs.directories_df(spark, dist)
    if suffix:
        dirs = dirs.withColumn("owner", F.concat("owner", F.lit(suffix))).withColumn(
            "group", F.concat("group", F.lit(suffix))
        )
    return dirs.select(
        posix_join(F.lit(hdfs_root), F.col("path")).alias("path"),
        "owner",
        "group",
        "mode",
    ).withColumn("depth", F.size(F.split(F.regexp_replace("path", "/+$", ""), "/")))


def directory_stages(
    spark: SparkSession,
    dist: str,
    zone_path: str = "/ifs/zone1",
    hdfs_root_dir: str = "hadoop",
    suffix: str | None = None,
) -> list[Stage]:
    """One stage per depth level, shallowest first."""
    root = resolve_hdfs_root(zone_path, hdfs_root_dir)
    desired = desired_directories(spark, dist, root, suffix)
    depths = sorted(
        r["depth"] for r in desired.select("depth").distinct().collect()
    )

    def stage_for(depth: int):
        def build(state: ParquetState) -> DataFrame:
            level = desired.filter(F.col("depth") == depth).drop("depth")
            actual = state.read("directories", DIRECTORIES_STATE)
            # parents-first invariant: every non-root row at this depth
            # must have its parent directory already committed
            parents = (
                level.filter(F.col("path") != root)
                .select(F.regexp_extract("path", r"^(.*)/[^/]+$", 1).alias("parent"))
                .filter(F.col("parent") != "")
            )
            assert_referential_integrity(
                parents, "parent", actual.select(F.col("path").alias("parent")), "parent"
            )
            created = merge_create(actual, level, "path")  # mkdir -p semantics
            return apply_update(created, level, "path", ["owner", "group", "mode"])

        return build

    return [
        Stage(f"mkdir/chmod/chown depth {d}", "directories", stage_for(d))
        for d in depths
    ]


def apply_directories(
    spark: SparkSession,
    state: ParquetState,
    dist: str,
    zone_path: str = "/ifs/zone1",
    hdfs_root_dir: str = "hadoop",
    suffix: str | None = None,
) -> list[tuple[str, int]]:
    return run_stages(
        state, directory_stages(spark, dist, zone_path, hdfs_root_dir, suffix)
    )
