"""The identity write pipeline: staged, idempotent, ID-adopting
(reference ``identities.py:162-309``).

Stage order is the reference's creation order — groups, users,
memberships, proxy users (``iterate_identities``,
``identities.py:284-309``) — because each stage's sink consumes IDs
or keys committed by the previous one. Re-running the pipeline over
its own output is a no-op: creates merge with adopt-on-conflict
(``identities.py:251-262``), and allocation only ranks rows that are
genuinely new, skipping IDs the state already holds
(``identities.py:137-148``).

The shell-script side output (S13, ``identities.py:224-229,279-280``)
is reproduced as a deterministic lines DataFrame: ``groupadd --gid``,
``useradd --uid --gid``, ``usermod -a -G`` in stage order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from isilon_hadoop_tools_spark.operators.allocate_ids import allocate_ids
from isilon_hadoop_tools_spark.operators.guards import (
    assert_referential_integrity,
    assert_referential_integrity_many,
)
from isilon_hadoop_tools_spark.plans.executor import Stage, run_stages
from isilon_hadoop_tools_spark.plans.sinks import merge_create
from isilon_hadoop_tools_spark.plans.state import ParquetState
from isilon_hadoop_tools_spark.sources import catalogs

GROUPS_STATE = "group_name STRING, gid INT"
USERS_STATE = "user_name STRING, uid INT, primary_group STRING"
MEMBERSHIPS_STATE = "user_name STRING, group_name STRING"
PROXIES_STATE = "proxy_name STRING, member_name STRING, member_type STRING"

SCRIPT_HEADER = ("#!/usr/bin/env sh", "set -o errexit", "set -o xtrace")


def _suffixed(df: DataFrame, cols: list[str], suffix: str | None) -> DataFrame:
    """The identity-suffix transform (``identities.py:323-347``):
    append ``suffix`` to every name column."""
    if not suffix:
        return df
    out = df
    for c in cols:
        out = out.withColumn(c, F.concat(F.col(c), F.lit(suffix)))
    return out


def identity_stages(
    spark: SparkSession,
    dist: str,
    zone: str = "zone1",
    suffix: str | None = None,
    start_uid: int = 1025,
    start_gid: int = 1025,
) -> list[Stage]:
    """The four topological stages of the identity pipeline."""

    def groups_stage(state: ParquetState) -> DataFrame:
        desired = _suffixed(
            catalogs.groups_df(spark, dist, zone), ["group_name"], suffix
        )
        actual = state.read("groups", GROUPS_STATE)
        fresh = desired.join(actual.select("group_name"), "group_name", "left_anti")
        allocated = allocate_ids(
            fresh,
            "group_name",
            taken=actual.select(F.col("gid").alias("id")),
            start=start_gid,
            out_col="gid",
        )
        return actual.unionByName(allocated.select("group_name", "gid"))

    def users_stage(state: ParquetState) -> DataFrame:
        desired = _suffixed(
            catalogs.users_df(spark, dist, zone),
            ["user_name", "primary_group"],
            suffix,
        )
        groups = state.read("groups", GROUPS_STATE)
        # J1-style lookup precondition: every primary group must
        # already exist (the groups stage ran first)
        assert_referential_integrity(desired, "primary_group", groups, "group_name")
        actual = state.read("users", USERS_STATE)
        fresh = desired.join(actual.select("user_name"), "user_name", "left_anti")
        allocated = allocate_ids(
            fresh.select("user_name"),
            "user_name",
            taken=actual.select(F.col("uid").alias("id")),
            start=start_uid,
            out_col="uid",
        )
        fresh_full = fresh.join(allocated, "user_name")
        return actual.unionByName(
            fresh_full.select("user_name", "uid", "primary_group")
        )

    def memberships_stage(state: ParquetState) -> DataFrame:
        desired = _suffixed(
            catalogs.memberships_df(spark, dist),
            ["user_name", "group_name"],
            suffix,
        )
        users = state.read("users", USERS_STATE)
        groups = state.read("groups", GROUPS_STATE)
        assert_referential_integrity_many(
            [
                (desired, "user_name", users, "user_name"),
                (desired, "group_name", groups, "group_name"),
            ]
        )
        actual = state.read("memberships", MEMBERSHIPS_STATE)
        return merge_create(actual, desired, ["user_name", "group_name"])

    def proxies_stage(state: ParquetState) -> DataFrame:
        desired = _suffixed(
            catalogs.proxy_users_df(spark, dist),
            ["proxy_name", "member_name"],
            suffix,
        )
        actual = state.read("proxy_users", PROXIES_STATE)
        return merge_create(
            actual, desired, ["proxy_name", "member_name", "member_type"]
        )

    return [
        Stage("create groups", "groups", groups_stage),
        Stage("create users", "users", users_stage),
        Stage("add users to groups", "memberships", memberships_stage),
        Stage("create proxy users", "proxy_users", proxies_stage),
    ]


def apply_identities(
    spark: SparkSession,
    state: ParquetState,
    dist: str,
    zone: str = "zone1",
    suffix: str | None = None,
    start_uid: int = 1025,
    start_gid: int = 1025,
) -> list[tuple[str, int]]:
    """Run the staged identity pipeline against ``state``."""
    return run_stages(
        state, identity_stages(spark, dist, zone, suffix, start_uid, start_gid)
    )


def script_lines(
    groups: DataFrame, users: DataFrame, memberships: DataFrame
) -> DataFrame:
    """The replay script as a DataFrame of ``(stage, sort_key, line)``.

    Stage 1: ``groupadd --gid <gid> <group>`` per group;
    stage 2: ``useradd --uid <uid> --gid <gid> <user>`` (gid resolved
    through the user's primary group — the composed J4 join,
    ``identities.py:272-280``);
    stage 3: ``usermod -a -G <group> <user>`` per membership.
    Render order = (stage, sort_key), after the SCRIPT_HEADER lines.
    """
    g = groups.select(
        F.lit(1).alias("stage"),
        F.col("group_name").alias("sort_key"),
        F.format_string("groupadd --gid %d %s", "gid", "group_name").alias("line"),
    )
    u = users.join(
        F.broadcast(groups.withColumnRenamed("group_name", "primary_group")),
        "primary_group",
    ).select(
        F.lit(2).alias("stage"),
        F.col("user_name").alias("sort_key"),
        F.format_string(
            "useradd --uid %d --gid %d %s", "uid", "gid", "user_name"
        ).alias("line"),
    )
    m = memberships.select(
        F.lit(3).alias("stage"),
        F.concat_ws(":", "user_name", "group_name").alias("sort_key"),
        F.format_string("usermod -a -G %s %s", "group_name", "user_name").alias(
            "line"
        ),
    )
    return g.unionByName(u).unionByName(m)


def write_script(lines: DataFrame, path: str) -> None:
    """Materialize the side-output script file (header + ordered
    lines). Dimension-sized output -> single ordered text file."""
    ordered = [
        r["line"]
        for r in lines.orderBy("stage", "sort_key").select("line").collect()
    ]
    with open(path, "w", encoding="utf-8") as fh:
        for ln in SCRIPT_HEADER:
            fh.write(ln + "\n")
        for ln in ordered:
            fh.write(ln + "\n")
