"""Write-side tests: idempotent sinks, staged execution, ID adoption,
parents-first guard, root refusal, and the script side output
(reference ``identities.py:162-309``, ``directories.py:41-86``)."""

from __future__ import annotations

import os

import pytest

from isilon_hadoop_tools_spark.operators.guards import IntegrityError
from isilon_hadoop_tools_spark.plans import directories as pdir
from isilon_hadoop_tools_spark.plans import identities as pid
from isilon_hadoop_tools_spark.plans.sinks import (
    apply_delete,
    apply_update,
    merge_create,
)
from isilon_hadoop_tools_spark.plans.state import ParquetState


@pytest.fixture()
def state(spark, tmp_path):
    return ParquetState(spark, str(tmp_path / "state"))


def test_merge_create_adopts_existing_rows(spark):
    actual = spark.createDataFrame([("hdfs", 9999)], "name STRING, uid INT")
    delta = spark.createDataFrame(
        [("hdfs", 1025), ("hive", 1026)], "name STRING, uid INT"
    )
    out = {r["name"]: r["uid"] for r in merge_create(actual, delta, "name").collect()}
    assert out == {"hdfs": 9999, "hive": 1026}  # existing row wins


def test_apply_update_overwrites_matched_only(spark):
    state_df = spark.createDataFrame(
        [("/a", "u1", 755), ("/b", "u2", 700)], "path STRING, owner STRING, mode INT"
    )
    upd = spark.createDataFrame([("/a", "u9", 777)], "path STRING, owner STRING, mode INT")
    out = {
        r["path"]: (r["owner"], r["mode"])
        for r in apply_update(state_df, upd, "path", ["owner", "mode"]).collect()
    }
    assert out == {"/a": ("u9", 777), "/b": ("u2", 700)}


def test_apply_delete(spark):
    state_df = spark.createDataFrame([("a",), ("b",)], "k STRING")
    doomed = spark.createDataFrame([("b",), ("zz",)], "k STRING")
    assert [r["k"] for r in apply_delete(state_df, doomed, "k").collect()] == ["a"]


def test_state_read_missing_is_empty(spark, state):
    df = state.read("nothing", "k STRING, v INT")
    assert df.count() == 0
    assert df.columns == ["k", "v"]


def test_state_write_swaps_generations(spark, state):
    state.write("t", spark.createDataFrame([("a",)], "k STRING"))
    # next generation derived from reading the current one
    gen2 = state.read("t", "k STRING").unionByName(
        spark.createDataFrame([("b",)], "k STRING")
    )
    assert state.write("t", gen2) == 2
    assert {r["k"] for r in state.read("t", "k STRING").collect()} == {"a", "b"}


def test_identity_pipeline_idempotent(spark, state):
    r1 = pid.apply_identities(spark, state, "cdh")
    r2 = pid.apply_identities(spark, state, "cdh")
    assert r1 == r2  # same row counts after every stage on rerun
    users = state.read("users", pid.USERS_STATE)
    uids = [r["uid"] for r in users.collect()]
    assert len(uids) == len(set(uids))  # no duplicate IDs


def test_identity_pipeline_suffix(spark, state):
    pid.apply_identities(spark, state, "cdh", suffix="-c1")
    users = {r["user_name"] for r in state.read("users", pid.USERS_STATE).collect()}
    assert users and all(u.endswith("-c1") for u in users)
    groups = {r["group_name"] for r in state.read("groups", pid.GROUPS_STATE).collect()}
    assert groups and all(g.endswith("-c1") for g in groups)


def test_directory_pipeline_parent_guard(spark, state):
    # committing a deep level before its parents must fail loudly
    stages = pdir.directory_stages(spark, "cdh")
    deepest = stages[-1]
    with pytest.raises(IntegrityError):
        deepest.build(state)


def test_hdfs_root_refusal():
    with pytest.raises(pdir.HDFSRootDirectoryError):
        pdir.resolve_hdfs_root("/ifs", "")
    assert pdir.resolve_hdfs_root("/ifs/z", "hadoop") == "/ifs/z/hadoop"


def test_directory_pipeline_chmod_on_existing(spark, state):
    pdir.apply_directories(spark, state, "cdh")
    # drift one row's mode, then re-apply: chmod runs even though the
    # mkdir conflicts (reference directories.py:67-73)
    drifted = apply_update(
        state.read("directories", pdir.DIRECTORIES_STATE),
        spark.createDataFrame(
            [("/ifs/zone1/hadoop/tmp", 0o700)], "path STRING, mode INT"
        ),
        "path",
        ["mode"],
    )
    state.write("directories", drifted)
    pdir.apply_directories(spark, state, "cdh")
    row = (
        state.read("directories", pdir.DIRECTORIES_STATE)
        .filter("path = '/ifs/zone1/hadoop/tmp'")
        .first()
    )
    assert row["mode"] == 0o1777


def test_write_script_file(spark, state, tmp_path):
    pid.apply_identities(spark, state, "cdh")
    lines = pid.script_lines(
        state.read("groups", pid.GROUPS_STATE),
        state.read("users", pid.USERS_STATE),
        state.read("memberships", pid.MEMBERSHIPS_STATE),
    )
    path = str(tmp_path / "replay.sh")
    pid.write_script(lines, path)
    content = open(path).read().splitlines()
    assert content[:3] == list(pid.SCRIPT_HEADER)
    body = content[3:]
    assert any(ln.startswith("groupadd --gid ") for ln in body)
    assert any(ln.startswith("useradd --uid ") for ln in body)
    assert any(ln.startswith("usermod -a -G ") for ln in body)
    # stage order: all groupadds before all useradds before usermods
    kinds = [ln.split()[0] for ln in body]
    assert kinds == sorted(kinds, key=["groupadd", "useradd", "usermod"].index)


def test_permissions_drift_classification(spark):
    desired = spark.createDataFrame(
        [
            ("/r", "hdfs", "hadoop", 0o755),
            ("/r/new", "hive", "hive", 0o777),
            ("/r/mode", "hdfs", "hadoop", 0o700),
            ("/r/owner", "hue", "hue", 0o755),
            ("/r/both", "spark", "spark", 0o750),
        ],
        "path STRING, owner STRING, group STRING, mode INT",
    )
    actual = pdir.read_permissions(
        spark.createDataFrame(
            [
                ("/r", "hdfs", "hadoop", "755"),
                ("/r/mode", "hdfs", "hadoop", "755"),
                ("/r/owner", "hue-old", "hue", "755"),
                ("/r/both", "spark", "hadoop", "777"),
                ("/r/stray", "nobody", "nobody", "700"),
            ],
            pdir.PERMISSIONS_ACTUAL_SCHEMA,
        )
    )
    out = {
        r["path"]: r["action"]
        for r in pdir.permissions_drift(desired, actual).collect()
    }
    assert out == {
        "/r": "ok",
        "/r/new": "mkdir",
        "/r/mode": "chmod",
        "/r/owner": "chown",
        "/r/both": "chmod+chown",
        "/r/stray": "foreign",
    }


def test_read_permissions_parses_sticky_bit_octal(spark):
    actual = pdir.read_permissions(
        spark.createDataFrame(
            [("/t", "hdfs", "supergroup", "1777")],
            pdir.PERMISSIONS_ACTUAL_SCHEMA,
        )
    )
    assert actual.head()["mode"] == 0o1777


def test_create_users_entrypoint_end_to_end(spark, state, tmp_path):
    from isilon_hadoop_tools_spark.scripts import create_users

    sh = str(tmp_path / "replay.sh")
    # suffix without the leading '-' is normalized (reference
    # _scripts.py:106-109)
    report = create_users(
        spark, state, "cdh", append_cluster_name="c1", script_path=sh
    )
    assert [name for name, _ in report] == [
        "create groups",
        "create users",
        "add users to groups",
        "create proxy users",
    ]
    groups = state.read("groups", "group_name STRING, gid INT")
    assert groups.filter(~groups.group_name.endswith("-c1")).count() == 0
    with open(sh, encoding="utf-8") as fh:
        body = fh.read()
    assert "groupadd --gid" in body and "useradd --uid" in body
    # rerun is a no-op: same row counts, same state
    again = create_users(
        spark, state, "cdh", append_cluster_name="-c1", script_path=None
    )
    assert [n for _, n in again] == [n for _, n in report]


def test_create_users_dry_returns_unwritten_actions(spark, state):
    from isilon_hadoop_tools_spark.scripts import create_users

    out = create_users(spark, state, "cdp", dry=True)
    assert len(out) == 4
    assert out[0][1].count() > 0  # actions materialize...
    assert state.read("groups", "group_name STRING, gid INT").count() == 0
    # ...but nothing was committed


def test_create_directories_entrypoint(spark, state):
    from isilon_hadoop_tools_spark.scripts import create_directories

    report = create_directories(spark, state, "cdh", zone_path="/ifs/z1")
    assert sum(n for _, n in report) > 0
    paths = state.read(
        "directories", "path STRING, owner STRING, group STRING, mode INT"
    )
    assert paths.filter(~paths.path.startswith("/ifs/z1/")).count() == 0


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """S15 robustness: files written before a column existed merge
    with later files (mergeSchema) — old rows surface NULL for the
    new column, no rewrite of historical data."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path / "evolve")
    os.makedirs(d, exist_ok=True)
    pq.write_table(
        pa.table({"id": pa.array([1, 2], pa.int64()),
                  "v": pa.array([10.0, 20.0], pa.float64())}),
        f"{d}/part1.parquet",
    )
    pq.write_table(
        pa.table({"id": pa.array([3], pa.int64()),
                  "v": pa.array([30.0], pa.float64()),
                  "extra": pa.array(["x"], pa.string())}),
        f"{d}/part2.parquet",
    )
    df = spark.read.option("mergeSchema", "true").parquet(d)
    assert set(df.columns) == {"id", "v", "extra"}
    rows = {r.id: r.extra for r in df.collect()}
    assert rows == {1: None, 2: None, 3: "x"}


def test_json_corrupt_records_quarantined_not_fatal(spark, tmp_path):
    """P3/§2.11 at the source layer: PERMISSIVE JSON reads park
    malformed lines in the corrupt-record column instead of failing
    the scan — the quarantine-and-continue contract of a 100 TB
    ingest where one bad line must not kill the job."""
    import os

    d = str(tmp_path / "json")
    os.makedirs(d)
    with open(f"{d}/data.json", "w") as f:
        f.write('{"id": 1, "v": 10}\n')
        f.write('{"id": 2, "v": NOT_JSON}\n')
        f.write('{"id": 3, "v": 30}\n')
    df = (
        spark.read.schema("id LONG, v LONG, _bad STRING")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .json(d)
    )
    rows = df.collect()
    good = {r.id: r.v for r in rows if r._bad is None}
    bad = [r._bad for r in rows if r._bad is not None]
    assert good == {1: 10, 3: 30}
    assert len(bad) == 1 and "NOT_JSON" in bad[0]
