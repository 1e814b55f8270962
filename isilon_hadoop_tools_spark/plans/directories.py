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


# ---------------------------------------------------------------------
# S8: permissions read + postcondition drift check
# ---------------------------------------------------------------------

# what a filesystem-metadata scan returns: mode as an octal STRING,
# exactly the ACL shape the reference's permissions read parses with
# int(acl.mode, 8) (onefs.py:1209-1221)
PERMISSIONS_ACTUAL_SCHEMA = (
    "path STRING, owner STRING, group STRING, mode_octal STRING"
)

DRIFT_MKDIR = "mkdir"
DRIFT_CHMOD = "chmod"
DRIFT_CHOWN = "chown"
DRIFT_CHMOD_CHOWN = "chmod+chown"
DRIFT_OK = "ok"
DRIFT_FOREIGN = "foreign"


def read_permissions(actual: DataFrame) -> DataFrame:
    """Permissions read (S8): project owner/group/mode per path,
    parsing the octal mode string at the edge (the reference's
    ``permissions(path)`` reads the ACL and parses ``int(acl.mode, 8)``,
    ``onefs.py:1209-1221``)."""
    from isilon_hadoop_tools_spark.functions.octal import from_octal

    return actual.select(
        "path", "owner", "group", from_octal("mode_octal").alias("mode")
    )


def permissions_drift(desired: DataFrame, actual: DataFrame) -> DataFrame:
    """Postcondition check for the directory triple: classify each path
    into the exact repair call it needs.

    The reference runs mkdir → chmod → chown per row and can then read
    permissions back (``directories.py:62-86``, ``onefs.py:1209-1221``);
    the engine expresses the check as one full-outer diff: ``mkdir``
    (path absent — the whole triple runs), ``chmod`` / ``chown`` /
    ``chmod+chown`` (metadata drift), ``ok``, and ``foreign`` (present
    on the cluster but not in the catalog — reported, never deleted).

    Scale shape: the desired catalog is dimension-sized, the actual
    side is the 100 TB filesystem-metadata scan — AQE broadcasts the
    desired side, so the scan streams with no shuffle.
    """
    d = desired.select(
        "path",
        F.lit(True).alias("_d"),
        F.col("owner").alias("desired_owner"),
        F.col("group").alias("desired_group"),
        F.col("mode").alias("desired_mode"),
    )
    a = actual.select(
        "path",
        F.lit(True).alias("_a"),
        F.col("owner").alias("actual_owner"),
        F.col("group").alias("actual_group"),
        F.col("mode").alias("actual_mode"),
    )
    joined = d.join(a, "path", "full_outer")
    needs_chmod = ~F.col("desired_mode").eqNullSafe(F.col("actual_mode"))
    needs_chown = ~F.col("desired_owner").eqNullSafe(
        F.col("actual_owner")
    ) | ~F.col("desired_group").eqNullSafe(F.col("actual_group"))
    action = (
        F.when(F.col("_a").isNull(), F.lit(DRIFT_MKDIR))
        .when(F.col("_d").isNull(), F.lit(DRIFT_FOREIGN))
        .when(needs_chmod & needs_chown, F.lit(DRIFT_CHMOD_CHOWN))
        .when(needs_chmod, F.lit(DRIFT_CHMOD))
        .when(needs_chown, F.lit(DRIFT_CHOWN))
        .otherwise(F.lit(DRIFT_OK))
    )
    return joined.select(
        "path",
        action.alias("action"),
        "desired_owner",
        "desired_group",
        "desired_mode",
        "actual_owner",
        "actual_group",
        "actual_mode",
    )
