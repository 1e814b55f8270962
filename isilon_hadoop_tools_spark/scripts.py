"""Reference-shaped entry points (``isilon_create_users`` /
``isilon_create_directories``, reference ``_scripts.py:78-167``): one
call runs the full pipeline with the console scripts' exact argument
semantics, so a reference user can switch by swapping the REST client
for a SparkSession + state directory.

Mirrored semantics:
- ``--dist {cdh,cdp,hdp}`` -> ``dist``
- ``--append-cluster-name`` -> ``append_cluster_name`` with the
  leading ``-`` auto-prepended when missing (``_scripts.py:106-109``)
- ``--start-uid`` / ``--start-gid`` defaults 1025
  (``identities.py:56-57``)
- ``--dry`` -> ``dry=True`` returns the per-stage actions DataFrames
  without writing (reference S14 ``log_identities``)
- the ``<name>.sh`` side-output script -> ``script_path``
  (``identities.py:224-229``; naming left to the caller because
  ``int(time.time())`` in a filename is driver-side policy, not
  pipeline semantics)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from isilon_hadoop_tools_spark.plans.identities import (
    GROUPS_STATE,
    MEMBERSHIPS_STATE,
    USERS_STATE,
    identity_stages,
    script_lines,
    write_script,
)
from isilon_hadoop_tools_spark.plans.directories import directory_stages
from isilon_hadoop_tools_spark.plans.executor import run_stages
from isilon_hadoop_tools_spark.plans.state import OverlayState, ParquetState


def _dry_run(state: ParquetState, stages) -> list[tuple[str, DataFrame]]:
    """Run the staged pipeline against a copy-on-write overlay: stages
    compose through their pending outputs (exactly like a real run)
    while the base state stays untouched. Returns each stage's
    would-be state as a DataFrame."""
    import tempfile

    overlay = OverlayState(state, tempfile.mkdtemp(prefix="iht_dryrun_"))
    run_stages(overlay, stages)
    return [(s.name, overlay.read(s.table)) for s in stages]


def _normalize_suffix(append_cluster_name: str | None) -> str | None:
    if append_cluster_name is None:
        return None
    if not append_cluster_name.startswith("-"):
        return "-" + append_cluster_name
    return append_cluster_name


def create_users(
    spark: SparkSession,
    state: ParquetState,
    dist: str,
    zone: str = "zone1",
    append_cluster_name: str | None = None,
    start_uid: int = 1025,
    start_gid: int = 1025,
    dry: bool = False,
    script_path: str | None = None,
) -> list[tuple[str, int]] | list[tuple[str, DataFrame]]:
    """The ``isilon_create_users`` pipeline: groups -> users ->
    memberships -> proxy users, idempotent and ID-adopting. ``dry``
    returns ``[(stage_name, would_be_state_df)]`` from a copy-on-write
    overlay with the base state untouched; otherwise stages are
    committed to ``state`` and, if ``script_path`` is given, the
    groupadd/useradd/usermod replay script is written."""
    suffix = _normalize_suffix(append_cluster_name)
    stages = identity_stages(spark, dist, zone, suffix, start_uid, start_gid)
    if dry:
        return _dry_run(state, stages)
    report = run_stages(state, stages)
    if script_path is not None:
        lines = script_lines(
            state.read("groups", GROUPS_STATE),
            state.read("users", USERS_STATE),
            state.read("memberships", MEMBERSHIPS_STATE),
        )
        write_script(lines, script_path)
    return report


def create_directories(
    spark: SparkSession,
    state: ParquetState,
    dist: str,
    zone_path: str = "/ifs/zone1",
    hdfs_root_dir: str = "hadoop",
    append_cluster_name: str | None = None,
    dry: bool = False,
) -> list[tuple[str, int]] | list[tuple[str, DataFrame]]:
    """The ``isilon_create_directories`` pipeline: depth-staged
    mkdir/chmod/chown with the zone-relative HDFS root resolution and
    the ``/ifs`` root guard. Same ``dry`` contract as
    :func:`create_users`."""
    suffix = _normalize_suffix(append_cluster_name)
    stages = directory_stages(spark, dist, zone_path, hdfs_root_dir, suffix)
    if dry:
        return _dry_run(state, stages)
    return run_stages(state, stages)
