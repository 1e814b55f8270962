"""Crash matrix for the snapshot-manifest commit layer (operators/
snapshots.py) and its consumers in the rewrite family: every crash
window must leave a readable table pointing at the OLD snapshot, and
replay must converge — the reference's rerun-converges sink contract
(`/root/reference/src/isilon_hadoop_tools/identities.py:124-160`)
generalized to whole-table rewrites."""

from __future__ import annotations

import pathlib

import pytest
from pyspark.sql import functions as F

from isilon_hadoop_tools_spark.operators.snapshots import (
    latest_version,
    read_manifest,
    snapshot_history,
    snapshot_read,
    snapshot_write,
)


def _df(spark, n, tag):
    return spark.range(n).select(
        F.col("id").alias("k"), F.lit(tag).alias("tag")
    )


def _rows(df):
    return sorted((r["k"], r["tag"]) for r in df.collect())


def test_snapshot_write_read_history_time_travel(spark, tmp_path):
    t = str(tmp_path / "tbl")
    v1 = snapshot_write(_df(spark, 5, "a"), t)
    v2 = snapshot_write(_df(spark, 8, "b"), t)
    assert (v1, v2) == (1, 2)
    assert latest_version(t) == 2
    # default read = pointer; explicit version = time travel
    assert _rows(snapshot_read(spark, t)) == _rows(_df(spark, 8, "b"))
    assert _rows(snapshot_read(spark, t, 1)) == _rows(_df(spark, 5, "a"))
    hist = {r["version"]: r for r in snapshot_history(spark, t).collect()}
    assert set(hist) == {1, 2}
    assert hist[2]["is_latest"] and not hist[1]["is_latest"]
    assert hist[1]["readable"] and hist[2]["readable"]
    assert hist[1]["n_rows"] == 5 and hist[2]["n_rows"] == 8
    # the manifest records the exact file list
    m = read_manifest(t, 2)
    assert m["n_files"] == len(m["files"]) > 0


def test_crash_between_data_write_and_manifest(spark, tmp_path):
    """Torn data directory with NO manifest: invisible to readers,
    overwritten by replay."""
    t = str(tmp_path / "tbl")
    snapshot_write(_df(spark, 5, "a"), t)
    torn = pathlib.Path(t) / "data" / "v00002"
    torn.mkdir(parents=True)
    (torn / "part-00000-torn.parquet").write_bytes(b"not parquet at all")
    # reader: still the old snapshot — the torn dir has no manifest
    assert latest_version(t) == 1
    assert _rows(snapshot_read(spark, t)) == _rows(_df(spark, 5, "a"))
    # replay: allocates version 2 again, overwrite wipes the torn file
    v = snapshot_write(_df(spark, 8, "b"), t)
    assert v == 2
    assert _rows(snapshot_read(spark, t)) == _rows(_df(spark, 8, "b"))
    assert not (torn / "part-00000-torn.parquet").exists()


def test_crash_between_manifest_and_pointer_swap(spark, tmp_path):
    """Orphaned manifest (written, pointer never swapped): readers
    stay on the old version; replay allocates PAST the orphan, never
    reusing its number for different content."""
    t = str(tmp_path / "tbl")
    snapshot_write(_df(spark, 5, "a"), t)
    snapshot_write(_df(spark, 8, "b"), t)
    # rewind the pointer to simulate the crash window
    (pathlib.Path(t) / "_LATEST").write_text("1")
    assert latest_version(t) == 1
    assert _rows(snapshot_read(spark, t)) == _rows(_df(spark, 5, "a"))
    v = snapshot_write(_df(spark, 3, "c"), t)
    assert v == 3  # past the orphan
    assert latest_version(t) == 3
    assert _rows(snapshot_read(spark, t)) == _rows(_df(spark, 3, "c"))
    # the orphan's snapshot remains addressable time travel
    assert _rows(snapshot_read(spark, t, 2)) == _rows(_df(spark, 8, "b"))


def test_concurrent_reader_pinned_to_old_snapshot(spark, tmp_path):
    """A reader that resolved the manifest BEFORE a rewrite keeps
    reading the old files afterward — the new version's files land in
    a different directory, so nothing is torn out from under it."""
    t = str(tmp_path / "tbl")
    snapshot_write(_df(spark, 5, "a"), t)
    pinned = snapshot_read(spark, t)  # lazy plan over v1's file list
    snapshot_write(_df(spark, 8, "b"), t)
    assert _rows(pinned) == _rows(_df(spark, 5, "a"))


def test_empty_snapshot_keeps_schema(spark, tmp_path):
    t = str(tmp_path / "tbl")
    v = snapshot_write(_df(spark, 5, "a").filter(F.lit(False)), t)
    back = snapshot_read(spark, t, v)
    assert back.count() == 0
    assert back.columns == ["k", "tag"]


def test_missing_table_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        snapshot_read(spark, str(tmp_path / "nope"))


def test_compaction_execute_crash_replay_converges(spark, tmp_path):
    """VERDICT r13 #8: kill between the data write and the verify
    used to leave a torn directory with no marker. Through the
    snapshot layer: the torn rewrite is invisible (reader resolves
    the last committed version), and rerunning the executor converges
    and self-certifies."""
    from isilon_hadoop_tools_spark.operators.skew import (
        compaction_execute,
        compaction_plan,
    )

    df = spark.range(400).select(
        (F.col("id") % 4).cast("string").alias("p"),
        (F.col("id") % 20).alias("f"),
        F.col("id").alias("payload"),
    )
    files = df.groupBy(
        F.col("p").alias("partition"), F.col("f").alias("file")
    ).agg((F.count(F.lit(1)) * 100).alias("size_bytes"))
    plan = compaction_plan(files, "partition", "file", "size_bytes", 500)
    out = str(tmp_path / "compact")

    r1 = compaction_execute(
        df, plan, F.col("p"), F.col("f"), out, ["payload"]
    ).collect()[0]
    assert r1["checksums_match"] and r1["layout_matches_plan"]
    assert latest_version(out) == 1

    # simulate a crash mid-rewrite: torn versioned dir, no manifest
    torn = pathlib.Path(out) / "data" / "v00002"
    torn.mkdir(parents=True)
    (torn / "part-00000-torn.parquet").write_bytes(b"\x00garbage")
    committed = snapshot_read(spark, out)  # reader: old snapshot only
    assert committed.count() == 400

    r2 = compaction_execute(
        df, plan, F.col("p"), F.col("f"), out, ["payload"]
    ).collect()[0]
    assert r2["checksums_match"] and r2["layout_matches_plan"]
    assert r2["checksum_after"] == r1["checksum_after"]
    assert latest_version(out) == 2
    # and version 1 is still readable time travel
    assert snapshot_read(spark, out, 1).count() == 400


def test_snapshot_prune_and_scan_exact(spark, tmp_path):
    """Manifest-stats pruning: a range-clustered layout records per-
    file footer min/max; a range scan opens only intersecting files
    and equals the full filter; a range falling in a between-file gap
    prunes everything; files without stats are conservatively kept."""
    from isilon_hadoop_tools_spark.operators.snapshots import (
        read_manifest,
        snapshot_prune,
        snapshot_read,
        snapshot_scan,
        snapshot_write,
    )

    t = str(tmp_path / "tbl")
    # three clusters with gaps: [0..99], [500..599], [900..999]
    df = spark.range(300).select(
        (
            F.when(F.col("id") < 100, F.col("id"))
            .when(F.col("id") < 200, F.col("id") + 400)
            .otherwise(F.col("id") + 700)
        ).alias("k"),
        (F.col("id") % 3).cast("int").alias("bucket"),
    )
    zoned = df.withColumn("_zone", (F.col("k") / 400).cast("int"))
    v = snapshot_write(
        zoned.repartition(F.col("_zone")),
        t,
        partition_by=["_zone"],
        stats_cols=["k"],
    )
    m = read_manifest(t, v)
    assert m["n_files"] == 3 and all(
        "k" in s for s in m["file_stats"].values()
    )
    kept, total = snapshot_prune(t, "k", 510, 560, v)
    assert total == 3 and len(kept) == 1
    got = sorted(
        r["k"] for r in snapshot_scan(spark, t, "k", 510, 560, v).collect()
    )
    want = sorted(
        r["k"]
        for r in snapshot_read(spark, t, v)
        .filter(F.col("k").between(510, 560))
        .collect()
    )
    assert got == want and len(got) == 51
    # the gap between clusters prunes every file
    kept, _ = snapshot_prune(t, "k", 150, 350, v)
    assert kept == []
    assert snapshot_scan(spark, t, "k", 150, 350, v).count() == 0
    # a column with no recorded stats keeps everything (conservative)
    kept, _ = snapshot_prune(t, "bucket", 0, 0, v)
    assert len(kept) == 3


def test_snapshot_diff_multiset_semantics(spark, tmp_path):
    from isilon_hadoop_tools_spark.operators.snapshots import (
        snapshot_diff,
        snapshot_write,
    )

    t = str(tmp_path / "tbl")
    v1 = spark.createDataFrame(
        [(1, "a"), (2, "b"), (2, "b"), (3, "c")], "k long, s string"
    )
    v2 = spark.createDataFrame(
        [(2, "b"), (3, "c"), (4, "d")], "k long, s string"
    )
    snapshot_write(v1, t)
    snapshot_write(v2, t)
    out = sorted(
        (r["k"], r["s"], r["change"])
        for r in snapshot_diff(spark, t, 1, 2).collect()
    )
    # (2,b) present twice then once -> ONE removed (bag semantics)
    assert out == [
        (1, "a", "removed"),
        (2, "b", "removed"),
        (4, "d", "added"),
    ]
    # reverse direction swaps the tags
    rev = sorted(
        (r["k"], r["change"])
        for r in snapshot_diff(spark, t, 2, 1).collect()
    )
    assert rev == [(1, "added"), (2, "added"), (4, "removed")]


def test_snapshot_vacuum_expires_and_preserves(spark, tmp_path):
    """Vacuum keeps the last N committed versions' files intact,
    deletes only files referenced solely by expired versions, removes
    expired manifests after their files, and a rerun converges."""
    from isilon_hadoop_tools_spark.operators.snapshots import (
        snapshot_history,
        snapshot_vacuum,
    )

    t = str(tmp_path / "tbl")
    for n, tag in ((5, "a"), (8, "b"), (3, "c")):
        snapshot_write(_df(spark, n, tag), t)
    r = snapshot_vacuum(t, keep_last=2)
    assert r["versions_expired"] == [1]
    assert r["files_deleted"] > 0
    hist = {h["version"]: h for h in snapshot_history(spark, t).collect()}
    assert sorted(hist) == [2, 3]
    assert hist[2]["readable"] and hist[3]["readable"]
    assert _rows(snapshot_read(spark, t, 2)) == _rows(_df(spark, 8, "b"))
    assert _rows(snapshot_read(spark, t)) == _rows(_df(spark, 3, "c"))
    # rerun: nothing left to collect
    r2 = snapshot_vacuum(t, keep_last=2)
    assert r2 == {"files_deleted": 0, "versions_expired": []}
    # orphaned manifest above the pointer is never collected
    (pathlib.Path(t) / "_LATEST").write_text("2")
    r3 = snapshot_vacuum(t, keep_last=1)
    assert r3["versions_expired"] == []  # only v2 committed now, kept
    import pytest as _pytest

    with _pytest.raises(ValueError):
        snapshot_vacuum(t, keep_last=0)


def test_streaming_cdc_snapshots_versions_and_crash_replay(
    spark, tmp_path
):
    """SC10s: each micro-batch commits one snapshot version; a torn
    directory planted between drains (the crash window) is invisible
    and the replayed drain converges to the batch CDC answer; earlier
    versions remain time-travel readable per-batch state."""
    import datetime as dt
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from isilon_hadoop_tools_spark.operators.snapshots import (
        latest_version,
        snapshot_read,
    )
    from isilon_hadoop_tools_spark.streaming.events import (
        cdc_stream_into_snapshots,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    m = dt.timedelta(minutes=1)
    d = str(tmp_path / "stream")
    os.makedirs(d)

    def batch(name, rows):
        pq.write_table(
            pa.table(
                {
                    "user_id": pa.array([r[0] for r in rows], pa.int64()),
                    "ts": pa.array(
                        [r[1] for r in rows], pa.timestamp("us")
                    ),
                    "event_id": pa.array(
                        [r[2] for r in rows], pa.int64()
                    ),
                    "event_type": pa.array(
                        [r[3] for r in rows], pa.string()
                    ),
                    "value": pa.array(
                        [float(r[4]) for r in rows], pa.float64()
                    ),
                }
            ),
            os.path.join(d, name),
        )
        import time as _time

        _time.sleep(0.05)

    batch("b1.parquet", [(1, t0, 10, "view", 1.0), (2, t0 + m, 11, "view", 2.0)])
    batch("b2.parquet", [(1, t0 + 2 * m, 12, "purchase", 5.0)])

    def stream():
        schema = (
            "user_id LONG, ts TIMESTAMP, event_id LONG,"
            " event_type STRING, value DOUBLE"
        )
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
        )

    from isilon_hadoop_tools_spark.operators.snapshots import (
        delta_chain,
        read_manifest,
    )
    from isilon_hadoop_tools_spark.streaming.events import (
        cdc_state_from_snapshots,
    )

    table = str(tmp_path / "cdc_snap")
    cdc_stream_into_snapshots(stream(), table)
    assert latest_version(table) == 2  # one commit per micro-batch
    # merge-on-read: each commit is a DELTA holding only its batch's
    # per-key latest rows (O(batch) written, not O(state))
    assert read_manifest(table, 1)["kind"] == "delta"
    assert read_manifest(table, 2)["kind"] == "delta"
    assert read_manifest(table, 2)["base_version"] == 1
    assert delta_chain(table) == [1, 2]
    # per-batch time travel: after batch 1, user 1 was still a 'view'
    v1 = {r["user_id"]: r["event_type"]
          for r in cdc_state_from_snapshots(spark, table, 1).collect()}
    assert v1 == {1: "view", 2: "view"}
    final = {r["user_id"]: r["event_type"]
             for r in cdc_state_from_snapshots(spark, table).collect()}
    assert final == {1: "purchase", 2: "view"}
    # a raw read of the LATEST delta is just the batch — the reader
    # contract is cdc_state_from_snapshots, which merges the chain
    assert {r["user_id"] for r in snapshot_read(spark, table).collect()} \
        == {1}

    # crash window: torn versioned dir with no manifest, then REPLAY
    # the whole stream (no checkpoint) — max_by merge is idempotent
    torn = pathlib.Path(table) / "data" / "v00003"
    torn.mkdir(parents=True)
    (torn / "part-00000-torn.parquet").write_bytes(b"torn")
    assert latest_version(table) == 2  # reader: still the committed one
    cdc_stream_into_snapshots(stream(), table)
    assert latest_version(table) == 4  # two more commits, past the torn dir
    replay = {r["user_id"]: (r["event_type"], r["value"])
              for r in cdc_state_from_snapshots(spark, table).collect()}
    assert replay == {1: ("purchase", 5.0), 2: ("view", 2.0)}


def test_streaming_cdc_snapshots_compaction_and_vacuum(spark, tmp_path):
    """Merge-on-read write amplification stays bounded (ADVICE r14):
    every compact_every-th commit folds the delta chain into a FULL
    compaction snapshot (chain length never exceeds the budget), the
    reconstructed state equals the per-key latest at every step, and
    vacuum_keep expires versions behind the compaction while the
    vacuum closure keeps every kept version's chain readable."""
    import datetime as dt
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from isilon_hadoop_tools_spark.operators.snapshots import (
        delta_chain,
        latest_version,
        read_manifest,
        snapshot_history,
    )
    from isilon_hadoop_tools_spark.streaming.events import (
        cdc_state_from_snapshots,
        cdc_stream_into_snapshots,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    m = dt.timedelta(minutes=1)
    d = str(tmp_path / "stream")
    os.makedirs(d)
    for i in range(6):  # 6 micro-batches, one row each, same user set
        pq.write_table(
            pa.table(
                {
                    "user_id": pa.array([i % 2], pa.int64()),
                    "ts": pa.array([t0 + i * m], pa.timestamp("us")),
                    "event_id": pa.array([100 + i], pa.int64()),
                    "event_type": pa.array(
                        ["purchase" if i == 5 else "view"], pa.string()
                    ),
                    "value": pa.array([float(i)], pa.float64()),
                }
            ),
            os.path.join(d, f"b{i}.parquet"),
        )

    schema = (
        "user_id LONG, ts TIMESTAMP, event_id LONG,"
        " event_type STRING, value DOUBLE"
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    table = str(tmp_path / "cdc_mor")
    cdc_stream_into_snapshots(
        stream, table, compact_every=3, vacuum_keep=1
    )
    # commits: v1 d, v2 d, v3 d (chain hits the budget), v4 FULL
    # (compaction + vacuum), v5 d, v6 d
    assert latest_version(table) == 6
    assert read_manifest(table, 4)["kind"] == "full"  # compaction
    assert read_manifest(table, 4)["base_version"] is None
    assert read_manifest(table, 6)["kind"] == "delta"
    # the live chain is bounded by the budget and rooted at the
    # compaction snapshot
    assert delta_chain(table) == [4, 5, 6]
    # state correct after compaction + vacuum
    state = {r["user_id"]: (r["event_type"], r["value"])
             for r in cdc_state_from_snapshots(spark, table).collect()}
    assert state == {0: ("view", 4.0), 1: ("purchase", 5.0)}
    # vacuum at the compaction expired the pre-compaction deltas
    # (their manifests are gone) and every SURVIVING version is still
    # chain-readable — the vacuum closure never tears a kept chain
    hist = {r["version"]: r for r in snapshot_history(spark, table).collect()}
    assert set(hist) == {4, 5, 6}
    for v in hist:
        assert hist[v]["readable"], f"version {v} torn by vacuum"
        chain = delta_chain(table, v)
        assert read_manifest(table, chain[0])["kind"] == "full"
    # intermediate time travel within the live chain still works
    v5 = {r["user_id"]: r["value"]
          for r in cdc_state_from_snapshots(spark, table, 5).collect()}
    assert v5 == {0: 4.0, 1: 3.0}


def test_snapshot_merge_upsert_delete_and_time_travel(spark, tmp_path):
    """MERGE INTO through an atomic snapshot commit (SC10f): update
    matched, insert unmatched, delete on a source-side condition --
    and the pre-merge version stays time-travel readable."""
    import pytest

    from isilon_hadoop_tools_spark.operators.snapshots import (
        snapshot_merge,
        snapshot_read,
        snapshot_write,
    )

    table = str(tmp_path / "merge_tbl")
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, s string, v double",
    )
    assert snapshot_write(target, table) == 1

    source = spark.createDataFrame(
        [(2, "B", 22.0), (3, "D", 0.0), (4, "d", 40.0)],
        "k long, s string, v double",
    )
    v = snapshot_merge(
        spark, table, source, ["k"],
        delete_when=lambda t, s: s("s") == "D",
    )
    assert v == 2
    got = {r["k"]: (r["s"], r["v"])
           for r in snapshot_read(spark, table).collect()}
    # 1 kept, 2 updated, 3 deleted, 4 inserted
    assert got == {1: ("a", 10.0), 2: ("B", 22.0), 4: ("d", 40.0)}
    # pre-merge version intact (time travel)
    old = {r["k"] for r in snapshot_read(spark, table, 1).collect()}
    assert old == {1, 2, 3}

    # when_matched="keep" = insert-if-absent
    src2 = spark.createDataFrame(
        [(1, "X", 0.0), (5, "e", 50.0)], "k long, s string, v double"
    )
    snapshot_merge(spark, table, src2, ["k"], when_matched="keep")
    got = {r["k"]: r["s"] for r in snapshot_read(spark, table).collect()}
    assert got == {1: "a", 2: "B", 4: "d", 5: "e"}

    # duplicate source keys are rejected loudly (ANSI MERGE error)
    dup = spark.createDataFrame(
        [(1, "p", 1.0), (1, "q", 2.0)], "k long, s string, v double"
    )
    with pytest.raises(Exception) as ei:
        snapshot_merge(spark, table, dup, ["k"])
    assert "duplicate keys" in str(ei.value)


def test_snapshot_read_evolved_add_column_chain(spark, tmp_path):
    """Schema evolution over a merge-on-read chain (SC10e): a delta
    written with an ADDED column unions with its base; the reader
    fills the column a version predates with NULL (Iceberg
    add-column semantics). Drop-column reads raise loudly."""
    import pytest

    from isilon_hadoop_tools_spark.operators.snapshots import (
        snapshot_read_evolved,
        snapshot_write,
    )

    table = str(tmp_path / "evolve_tbl")
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "k long, s string")
    snapshot_write(v1, table)  # full, schema (k, s)
    v2 = spark.createDataFrame(
        [(3, "c", 9.5)], "k long, s string, score double"
    )
    snapshot_write(v2, table, kind="delta", base_version=1)

    got = {r["k"]: (r["s"], r["score"])
           for r in snapshot_read_evolved(spark, table).collect()}
    assert got == {1: ("a", None), 2: ("b", None), 3: ("c", 9.5)}
    # reading AT the old version needs no evolution and stays exact
    got1 = {r["k"] for r in snapshot_read_evolved(spark, table, 1).collect()}
    assert got1 == {1, 2}

    # DROP evolution (r16 field-ID layer): the newest schema no
    # longer carries s/score — their field IDs vanish, so the reader
    # simply stops selecting them; the new column back-fills NULL
    v3 = spark.createDataFrame([(4, 1.0)], "k long, gone double")
    snapshot_write(v3, table, kind="delta", base_version=2)
    got3 = {r["k"]: r["gone"]
            for r in snapshot_read_evolved(spark, table).collect()}
    assert got3 == {1: None, 2: None, 3: None, 4: 1.0}
    assert snapshot_read_evolved(spark, table).columns == ["k", "gone"]


def test_snapshot_read_evolved_rename_and_retype_by_field_id(
    spark, tmp_path
):
    """SC10e field-ID evolution (Iceberg v2 semantics): a RENAME is
    the same field ID under a new name — time travel reads both
    sides correctly with no data rewrite; lossless WIDENINGS cast;
    an incompatible retype raises loudly; explicit field_ids are
    validated."""
    import pytest

    from isilon_hadoop_tools_spark.operators.snapshots import (
        read_manifest,
        snapshot_read_evolved,
        snapshot_write,
    )

    table = str(tmp_path / "rename_tbl")
    v1 = spark.createDataFrame(
        [(1, 10), (2, 20)], "k long, value int"
    )
    snapshot_write(v1, table)  # auto ids: k=1, value=2
    assert read_manifest(table, 1)["field_ids"] == {"k": 1, "value": 2}
    # rename value->amount (same id 2) AND widen int->long
    v2 = spark.createDataFrame([(3, 30)], "k long, amount long")
    snapshot_write(
        v2, table, kind="delta", base_version=1,
        field_ids={"k": 1, "amount": 2},
    )
    out = snapshot_read_evolved(spark, table)
    assert out.columns == ["k", "amount"]
    assert dict(out.dtypes)["amount"] == "bigint"
    got = {r["k"]: r["amount"] for r in out.collect()}
    assert got == {1: 10, 2: 20, 3: 30}  # v1 rows surface renamed+cast
    # time travel BEFORE the rename keeps the old name
    old = snapshot_read_evolved(spark, table, 1)
    assert old.columns == ["k", "value"]
    assert {r["value"] for r in old.collect()} == {10, 20}
    # incompatible retype (long -> string): loud error
    v3 = spark.createDataFrame([(4, "oops")], "k long, amount string")
    snapshot_write(
        v3, table, kind="delta", base_version=2,
        field_ids={"k": 1, "amount": 2},
    )
    with pytest.raises(ValueError, match="widening"):
        snapshot_read_evolved(spark, table).collect()
    # explicit field_ids validation: missing column / duplicate id
    with pytest.raises(ValueError, match="lacks ids"):
        snapshot_write(v2, table, kind="delta", base_version=2,
                       field_ids={"k": 1})
    with pytest.raises(ValueError, match="unique"):
        snapshot_write(v2, table, kind="delta", base_version=2,
                       field_ids={"k": 1, "amount": 1})


def test_wap_stage_audit_publish(spark, tmp_path):
    """SC10g write-audit-publish: a staged version is invisible until
    snapshot_publish swaps the pointer; publishing backwards or a
    version with no manifest raises; an abandoned stage stays an
    orphaned manifest that replay allocates past."""
    import pytest

    from isilon_hadoop_tools_spark.operators.snapshots import (
        latest_version,
        snapshot_publish,
        snapshot_read,
        snapshot_write,
    )

    t = str(tmp_path / "wap")
    snapshot_write(_df(spark, 5, "a"), t)  # v1 committed
    v2 = snapshot_write(_df(spark, 8, "bad"), t, publish=False)
    assert v2 == 2
    assert latest_version(t) == 1  # staged: invisible
    # audit reads the staged version explicitly
    assert snapshot_read(spark, t, v2).count() == 8
    # abandon v2 (audit failed); stage and publish v3
    v3 = snapshot_write(_df(spark, 3, "good"), t, publish=False)
    assert latest_version(t) == 1
    snapshot_publish(t, v3)
    assert latest_version(t) == 3
    assert _rows(snapshot_read(spark, t)) == _rows(_df(spark, 3, "good"))
    # the abandoned stage is still addressable (until vacuumed) ...
    assert snapshot_read(spark, t, 2).count() == 8
    # ... but cannot be published behind the pointer
    with pytest.raises(ValueError):
        snapshot_publish(t, 2)
    with pytest.raises(FileNotFoundError):
        snapshot_publish(t, 99)


import pytest as _pytest


@_pytest.mark.parametrize("backend", ["flock", "rename"])
def test_concurrent_writers_never_collide(spark, tmp_path, backend):
    """r15 multi-writer upgrade, r16 backend matrix: 8 threads
    blind-append concurrently on BOTH commit backends (POSIX flock
    and the HDFS-compatible rename/mkdir protocol); every writer gets
    a DISTINCT version (put-if-absent reservation), the pointer ends
    at the maximum (monotonic swap), and every committed version
    reads back intact."""
    import threading

    from isilon_hadoop_tools_spark.operators.snapshots import (
        latest_version,
        read_manifest,
        set_commit_backend,
        snapshot_read,
        snapshot_write,
    )

    t = str(tmp_path / f"concurrent_{backend}")
    got: list[int] = []
    errs: list[Exception] = []

    def writer(tag: int) -> None:
        try:
            got.append(
                snapshot_write(_df(spark, 10 + tag, f"w{tag}"), t)
            )
        except Exception as e:  # pragma: no cover - fail loudly below
            errs.append(e)

    set_commit_backend(backend)
    try:
        threads = [
            threading.Thread(target=writer, args=(i,)) for i in range(8)
        ]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
    finally:
        set_commit_backend("flock")
    assert not errs, errs
    assert sorted(got) == list(range(1, 9))  # distinct versions
    assert latest_version(t) == 8
    for v in got:
        m = read_manifest(t, v)
        assert snapshot_read(spark, t, v).count() == m["n_rows"]
    # no reservation markers left behind
    import pathlib as _pl

    assert not list((_pl.Path(t) / "_manifests").glob("*.reserved"))


def test_rename_backend_merge_cas_and_cross_backend_read(spark, tmp_path):
    """The rename backend runs the same CAS protocol: concurrent
    MERGEs converge without lost updates, and a table committed under
    the rename backend (max-of-_pointers tip) is readable under the
    default flock backend — the choice is per-deployment, not baked
    into the data."""
    import threading

    from isilon_hadoop_tools_spark.operators.snapshots import (
        latest_version,
        set_commit_backend,
        snapshot_merge,
        snapshot_read,
        snapshot_write,
    )

    t = str(tmp_path / "rename_cas")
    set_commit_backend("rename")
    try:
        snapshot_write(
            spark.createDataFrame([(k, 0) for k in range(4)],
                                  "k long, v long"), t
        )
        errs: list[Exception] = []

        def merger(tag: int) -> None:
            try:
                src = spark.createDataFrame(
                    [(tag, 100 + tag)], "k long, v long"
                )
                snapshot_merge(spark, t, src, ["k"])
            except Exception as e:  # pragma: no cover
                errs.append(e)

        threads = [
            threading.Thread(target=merger, args=(i,)) for i in range(4)
        ]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        assert not errs, errs
        got = {r["k"]: r["v"] for r in snapshot_read(spark, t).collect()}
        assert got == {0: 100, 1: 101, 2: 102, 3: 103}  # no lost update
    finally:
        set_commit_backend("flock")
    # cross-backend read: flock backend resolves the _pointers tip
    # (1 base + 4 merge commits; losing CAS attempts release their
    # version numbers, so the tip is at least 5 but may skip numbers)
    assert latest_version(t) >= 5
    assert snapshot_read(spark, t).count() == 4


def test_merge_cas_detects_concurrent_commit(spark, tmp_path):
    """A MERGE that read version N must NOT commit over a table that
    advanced to N+1 (lost update): the CAS raises, and the public
    snapshot_merge retries against the new tip and converges."""
    import pytest

    from isilon_hadoop_tools_spark.operators.snapshots import (
        ConcurrentSnapshotError,
        _merge_once,
        latest_version,
        snapshot_merge,
        snapshot_read,
        snapshot_write,
    )

    t = str(tmp_path / "cas")
    snapshot_write(
        spark.createDataFrame([(1, 10.0)], "k long, v double"), t
    )
    src = spark.createDataFrame([(1, 11.0), (2, 20.0)], "k long, v double")
    # simulate: merge pinned to version 1, but the table advances
    snapshot_write(
        spark.createDataFrame([(3, 30.0)], "k long, v double"), t
    )
    with pytest.raises(ConcurrentSnapshotError):
        _merge_once(
            spark, t, src, ["k"], "update", True, None, base=1
        )
    # the public API retries against the tip and converges
    snapshot_merge(spark, t, src, ["k"])
    got = {r["k"]: r["v"] for r in snapshot_read(spark, t).collect()}
    assert got == {1: 11.0, 2: 20.0, 3: 30.0}
    # the losing CAS attempt RELEASES its reserved number (r16: no
    # parked version per retry), so the retry commits as version 3
    assert latest_version(t) == 3


def test_snapshot_changes_append_fast_path_and_rewrite_diff(spark, tmp_path):
    """SC10h: deltas stream out as 'added' straight from their files;
    a full rewrite in the history diffs against the RECONSTRUCTED
    chain state at the previous version — rows the rewrite dropped
    surface as 'removed', base-chain rows it kept are NOT re-emitted
    as spurious 'added'; an empty window returns an empty frame."""
    from isilon_hadoop_tools_spark.operators.snapshots import (
        snapshot_changes,
        snapshot_write,
    )

    t = str(tmp_path / "feed")
    v1 = snapshot_write(_df(spark, 3, "a"), t, kind="delta")
    v2 = snapshot_write(
        _df(spark, 2, "b"), t, kind="delta", base_version=v1
    )
    # full rewrite: drops one 'a' row (k=2), keeps the rest, adds a 'c'
    rewritten = (
        _df(spark, 3, "a").filter(F.col("k") < 2)
        .unionByName(_df(spark, 2, "b"))
        .unionByName(_df(spark, 1, "c"))
    )
    snapshot_write(rewritten, t, kind="full")

    # consumer at v1: v2's append arrives from its files, v3 as a diff
    ch = snapshot_changes(spark, t, since_version=1).collect()
    by_ver = {}
    for r in ch:
        by_ver.setdefault(r["_commit_version"], []).append(
            (r["k"], r["tag"], r["change"])
        )
    assert sorted(by_ver[2]) == [(0, "b", "added"), (1, "b", "added")]
    # the rewrite's delta vs state-at-v2 (= v1 ∪ v2, the chain): the
    # dropped k=2 'a' row IS removed, the new 'c' row IS added, and
    # nothing else — base rows the rewrite kept don't re-appear
    assert sorted(by_ver[3]) == [(0, "c", "added"), (2, "a", "removed")]
    empty = snapshot_changes(spark, t, since_version=3)
    assert empty.count() == 0
    assert "change" in empty.columns and "_commit_version" in empty.columns


def test_snapshot_changes_skips_unpublished_wap_stage(spark, tmp_path):
    """An abandoned write-audit-publish STAGE (publish=False, never
    promoted) is not committed history: once a later good commit
    advances the pointer past it, the bad batch's rows must NOT leak
    into the changes feed — no reader ever saw them. A promoted stage
    enters the feed normally."""
    from isilon_hadoop_tools_spark.operators.snapshots import (
        snapshot_changes,
        snapshot_publish,
        snapshot_write,
    )

    t = str(tmp_path / "wapfeed")
    v1 = snapshot_write(_df(spark, 2, "a"), t, kind="delta")
    # bad batch staged, audit fails, stage abandoned
    v_bad = snapshot_write(
        _df(spark, 5, "BAD"), t, kind="delta", base_version=v1,
        publish=False,
    )
    # good batch commits past the abandoned stage
    v_good = snapshot_write(
        _df(spark, 2, "b"), t, kind="delta", base_version=v1
    )
    assert v1 < v_bad < v_good
    ch = snapshot_changes(spark, t, since_version=v1).collect()
    tags = {(r["tag"], r["change"]) for r in ch}
    assert tags == {("b", "added")}
    assert {r["_commit_version"] for r in ch} == {v_good}
    # a stage that IS promoted becomes history and enters the feed
    v_staged = snapshot_write(
        _df(spark, 1, "c"), t, kind="delta", base_version=v_good,
        publish=False,
    )
    snapshot_publish(t, v_staged)
    ch2 = snapshot_changes(spark, t, since_version=v_good).collect()
    assert {(r["tag"], r["change"]) for r in ch2} == {("c", "added")}


def test_snapshot_changes_rewrite_over_delete_chain_needs_keys(
    spark, tmp_path
):
    """A full rewrite whose pre-history carries equality deletes must
    reconstruct the pre-state with merge-on-read semantics: without
    key_cols the feed refuses loudly; with key_cols the diff is taken
    against the MoR state (deleted rows are not 'removed' again)."""
    import pytest

    from isilon_hadoop_tools_spark.operators.snapshots import (
        snapshot_changes,
        snapshot_write,
    )

    t = str(tmp_path / "morfeed")
    v1 = snapshot_write(_df(spark, 4, "a"), t)
    v2 = snapshot_write(
        spark.createDataFrame([(3,)], "k long"),
        t, kind="delete", base_version=v1,
    )
    # compaction rewrite: the MoR state minus k=0, i.e. {1, 2} 'a'
    snapshot_write(
        _df(spark, 4, "a").filter(F.col("k").isin(1, 2)), t, kind="full"
    )
    with pytest.raises(ValueError, match="key_cols"):
        snapshot_changes(spark, t, since_version=v2).collect()
    ch = snapshot_changes(spark, t, since_version=v2, key_cols=["k"])
    got = sorted((r["k"], r["change"]) for r in ch.collect())
    # pre-state at v2 was {0,1,2} (k=3 deleted); rewrite kept {1,2}
    assert got == [(0, "removed")]


def test_snapshot_write_releases_reservation_on_early_failure(
    spark, tmp_path
):
    """A pre-manifest failure (bad base_version, CAS conflict, meta
    clash) must unlink the version reservation instead of parking the
    number until the GC TTL — each snapshot_merge retry would
    otherwise leak one."""
    import pathlib as _pl

    import pytest

    from isilon_hadoop_tools_spark.operators.snapshots import (
        ConcurrentSnapshotError,
        snapshot_write,
    )

    t = str(tmp_path / "resleak")
    snapshot_write(_df(spark, 2, "a"), t)
    mdir = _pl.Path(t) / "_manifests"

    def reservations():
        return sorted(p.name for p in mdir.glob("*.reserved"))

    with pytest.raises(FileNotFoundError):
        snapshot_write(_df(spark, 1, "b"), t, kind="delta",
                       base_version=99)
    assert reservations() == []
    with pytest.raises(ConcurrentSnapshotError):
        snapshot_write(_df(spark, 1, "b"), t, expect_latest=42)
    assert reservations() == []
    with pytest.raises(ValueError, match="meta shadows"):
        snapshot_write(_df(spark, 1, "b"), t, meta={"version": 9})
    assert reservations() == []


def test_snapshot_read_mor_delete_broadcast_budget(spark, tmp_path):
    """The MoR reader's delete-side broadcast is budgeted by the
    manifests' recorded n_rows: past max_delete_rows it raises loudly
    naming the versions ('compact first'), and over_budget='shuffle'
    falls back to an un-hinted join with identical results."""
    import pytest

    from isilon_hadoop_tools_spark.operators.snapshots import (
        snapshot_read_mor,
        snapshot_write,
    )

    t = str(tmp_path / "morbudget")
    v1 = snapshot_write(_df(spark, 6, "a"), t)
    snapshot_write(
        spark.createDataFrame([(1,), (4,)], "k long"),
        t, kind="delete", base_version=v1,
    )
    want = {0, 2, 3, 5}
    ok = snapshot_read_mor(spark, t, ["k"])
    assert {r["k"] for r in ok.collect()} == want
    with pytest.raises(ValueError, match="compact"):
        snapshot_read_mor(spark, t, ["k"], max_delete_rows=1)
    fb = snapshot_read_mor(
        spark, t, ["k"], max_delete_rows=1, over_budget="shuffle"
    )
    assert {r["k"] for r in fb.collect()} == want
    # the fallback plan carries no forced broadcast hint on the
    # delete aggregate (AQE may still choose one from real sizes)
    assert "ResolvedHint" not in fb._jdf.queryExecution().logical().toString()
    with pytest.raises(ValueError, match="over_budget"):
        snapshot_read_mor(spark, t, ["k"], over_budget="bogus")


def test_append_stream_exactly_once_and_time_travel(spark, tmp_path):
    """SC10i: per-batch delta commits with the batch id in the
    manifest; a full no-checkpoint re-drain commits NOTHING (append
    has no merge algebra — exactly-once comes from the commit layer);
    per-batch time travel via the chain read."""
    import datetime as dt
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from isilon_hadoop_tools_spark.operators.snapshots import (
        latest_version,
        read_manifest,
        snapshot_read_chain,
    )
    from isilon_hadoop_tools_spark.streaming.events import (
        append_stream_into_snapshots,
    )

    t0 = dt.datetime(2024, 1, 1)
    d = str(tmp_path / "stream")
    os.makedirs(d)
    for b in range(3):
        path = os.path.join(d, f"b{b}.parquet")
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(
                        [b * 10 + i for i in range(4)], pa.int64()
                    ),
                    "ts": pa.array(
                        [t0 + dt.timedelta(seconds=b * 10 + i)
                         for i in range(4)],
                        pa.timestamp("us"),
                    ),
                }
            ),
            path,
        )
        os.utime(path, (1_700_000_000 + b, 1_700_000_000 + b))

    def stream():
        return (
            spark.readStream.schema("event_id long, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
        )

    table = str(tmp_path / "append_tbl")
    append_stream_into_snapshots(stream(), table)
    assert latest_version(table) == 3
    assert read_manifest(table, 2)["kind"] == "delta"
    assert read_manifest(table, 2)["batch_id"] == 1
    got = sorted(
        r["event_id"] for r in snapshot_read_chain(spark, table).collect()
    )
    assert got == sorted(b * 10 + i for b in range(3) for i in range(4))
    # time travel: the table as of batch 2
    v2 = sorted(
        r["event_id"]
        for r in snapshot_read_chain(spark, table, 2).collect()
    )
    assert v2 == sorted(b * 10 + i for b in range(2) for i in range(4))

    # full re-drain without checkpoint: batch ids replay and are
    # skipped — no new versions, identical content
    append_stream_into_snapshots(stream(), table)
    assert latest_version(table) == 3
    again = sorted(
        r["event_id"] for r in snapshot_read_chain(spark, table).collect()
    )
    assert again == got


def test_append_stream_heals_orphaned_commit(spark, tmp_path):
    """A crash between an append commit's manifest write and its
    pointer swap leaves the batch durable but unpublished; on the
    next drain the writer PUBLISHES the orphan before extending the
    chain, so its rows are never silently dropped — and the replayed
    batch ids at or below the orphan's watermark commit nothing."""
    import datetime as dt
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from isilon_hadoop_tools_spark.operators.snapshots import (
        latest_version,
        snapshot_read_chain,
        snapshot_write,
    )
    from isilon_hadoop_tools_spark.streaming.events import (
        append_stream_into_snapshots,
    )

    t0 = dt.datetime(2024, 1, 1)
    d = str(tmp_path / "heal_src")
    os.makedirs(d)
    for b in range(3):
        path = os.path.join(d, f"b{b}.parquet")
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(
                        [b * 10 + i for i in range(2)], pa.int64()
                    ),
                    "ts": pa.array(
                        [t0 + dt.timedelta(seconds=b * 10 + i)
                         for i in range(2)],
                        pa.timestamp("us"),
                    ),
                }
            ),
            path,
        )
        os.utime(path, (1_700_000_000 + b, 1_700_000_000 + b))

    table = str(tmp_path / "heal_tbl")
    # simulate the crash window: batch 0 fully committed, batch 1's
    # manifest durable but the pointer swap lost (publish=False is
    # the same on-disk state)
    mk = "event_id long, ts timestamp"
    snapshot_write(
        spark.createDataFrame(
            [(0, t0), (1, t0 + dt.timedelta(seconds=1))], mk
        ),
        table, kind="delta",
        meta={"batch_id": 0, "batch_watermark": 0},
    )
    snapshot_write(
        spark.createDataFrame(
            [(10, t0 + dt.timedelta(seconds=10)),
             (11, t0 + dt.timedelta(seconds=11))], mk
        ),
        table, kind="delta", base_version=1, publish=False,
        meta={"batch_id": 1, "batch_watermark": 1},
    )
    assert latest_version(table) == 1  # orphan not visible yet

    def stream():
        return (
            spark.readStream.schema(mk)
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
        )

    append_stream_into_snapshots(stream(), table)
    # batches 0 and 1 replayed -> skipped; the orphan was published
    # first, so batch 2 extends IT and no rows are lost
    assert latest_version(table) == 3
    got = sorted(
        r["event_id"]
        for r in snapshot_read_chain(spark, table).collect()
    )
    assert got == [0, 1, 10, 11, 20, 21]


def test_cdc_delete_stream_matches_batch_mor_answer(spark, tmp_path):
    """SC10i × SC10j: the delete-aware CDC stream commits per-batch
    winners as delta + equality-delete siblings; a full no-checkpoint
    re-drain commits nothing (batch watermark), and the final state
    HASH-MATCHES the batch answer built with direct snapshot_write
    calls + snapshot_read_mor — including a key retracted in batch 2
    and re-appended in batch 3 (sequence-number semantics)."""
    import datetime as dt
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from isilon_hadoop_tools_spark.operators.snapshots import (
        latest_version,
        read_manifest,
        snapshot_write,
    )
    from isilon_hadoop_tools_spark.streaming.events import (
        cdc_delete_stream_into_snapshots,
        cdc_state_from_mor_snapshots,
    )

    t0 = dt.datetime(2024, 1, 1)
    src = str(tmp_path / "cdc_src")
    os.makedirs(src)
    # batch files (one per trigger): user 1 upserted; user 2 upserted
    # then deleted; user 3 deleted then re-appended; user 4 deleted
    batches = [
        [(1, 0, "view", 1.0), (2, 1, "view", 2.0), (3, 2, "view", 3.0)],
        [(2, 10, "delete", 0.0), (3, 11, "delete", 0.0),
         (1, 12, "view", 1.5)],
        [(3, 20, "view", 3.5), (4, 21, "delete", 0.0)],
    ]
    for b, rows in enumerate(batches):
        path = os.path.join(src, f"b{b}.parquet")
        pq.write_table(
            pa.table(
                {
                    "user_id": pa.array([r[0] for r in rows], pa.int64()),
                    "ts": pa.array(
                        [t0 + dt.timedelta(seconds=r[1]) for r in rows],
                        pa.timestamp("us"),
                    ),
                    "event_id": pa.array(
                        [r[1] for r in rows], pa.int64()
                    ),
                    "event_type": pa.array(
                        [r[2] for r in rows], pa.string()
                    ),
                    "value": pa.array([r[3] for r in rows], pa.float64()),
                }
            ),
            path,
        )
        os.utime(path, (1_700_000_000 + b, 1_700_000_000 + b))

    schema = (
        "user_id long, ts timestamp, event_id long,"
        " event_type string, value double"
    )

    def stream():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    table = str(tmp_path / "cdc_del_tbl")
    is_del = F.col("event_type") == "delete"
    cdc_delete_stream_into_snapshots(stream(), table, delete_when=is_del)
    v_after = latest_version(table)
    assert v_after == 6  # 3 batches x (delta + delete sibling)
    assert read_manifest(table, 6)["batch_watermark"] == 2

    got = {
        r["user_id"]: (r["event_type"], r["value"])
        for r in cdc_state_from_mor_snapshots(spark, table).collect()
    }
    # 1: latest upsert wins; 2,4: retracted; 3: re-appended after del
    assert got == {1: ("view", 1.5), 3: ("view", 3.5)}

    # full re-drain without checkpoint: watermark skips every batch
    cdc_delete_stream_into_snapshots(stream(), table, delete_when=is_del)
    assert latest_version(table) == v_after
    assert {
        r["user_id"]: (r["event_type"], r["value"])
        for r in cdc_state_from_mor_snapshots(spark, table).collect()
    } == got

    # batch-built twin: the same splits through direct snapshot_write
    # + the MoR reader must hash-match the stream-built state
    batch_table = str(tmp_path / "cdc_del_batch")
    all_rows = spark.createDataFrame(
        [
            (r[0], t0 + dt.timedelta(seconds=r[1]), r[1], r[2], r[3])
            for rows in batches
            for r in rows
        ],
        schema,
    )
    for b in range(3):
        lo, hi = b * 10, b * 10 + 9
        part = all_rows.filter(F.col("event_id").between(lo, hi))
        base = latest_version(batch_table)
        v = snapshot_write(
            part.filter(~is_del), batch_table, kind="delta",
            base_version=base,
        )
        snapshot_write(
            part.filter(is_del).select("user_id"), batch_table,
            kind="delete", base_version=v,
        )
    want = {
        r["user_id"]: (r["event_type"], r["value"])
        for r in cdc_state_from_mor_snapshots(
            spark, batch_table
        ).collect()
    }
    assert want == got


def test_equality_deletes_sequence_semantics(spark, tmp_path):
    """SC10j: deletes apply by commit order (re-append after delete
    survives; delete after append removes); the changes feed emits
    delete keys as 'removed' straight from the files; the evolved
    reader refuses delete chains; vacuum closure keeps delete
    manifests a kept version needs."""
    import pytest

    from isilon_hadoop_tools_spark.operators.snapshots import (
        delta_chain,
        snapshot_changes,
        snapshot_read_evolved,
        snapshot_read_mor,
        snapshot_vacuum,
        snapshot_write,
    )

    t = str(tmp_path / "rowdel")
    base = spark.createDataFrame(
        [(k, f"r{k}") for k in range(8)], "k long, payload string"
    )
    v1 = snapshot_write(base, t)
    v2 = snapshot_write(
        spark.createDataFrame([(2,), (3,), (5,)], "k long"),
        t, kind="delete", base_version=v1,
    )
    v3 = snapshot_write(
        spark.createDataFrame([(3, "r3-fixed")], "k long, payload string"),
        t, kind="delta", base_version=v2,
    )
    v4 = snapshot_write(
        spark.createDataFrame([(7,)], "k long"),
        t, kind="delete", base_version=v3,
    )
    assert delta_chain(t) == [1, 2, 3, 4]
    got = {r["k"]: r["payload"]
           for r in snapshot_read_mor(spark, t, ["k"]).collect()}
    # 2, 5 deleted; 3 deleted then re-appended fixed; 7 deleted last
    assert got == {0: "r0", 1: "r1", 3: "r3-fixed", 4: "r4", 6: "r6"}
    # time travel: state as of v2 (before the re-append)
    v2state = {r["k"] for r in
               snapshot_read_mor(spark, t, ["k"], version=2).collect()}
    assert v2state == {0, 1, 4, 6, 7}

    ch = snapshot_changes(spark, t, since_version=1).collect()
    removed = {(r["k"], r["_commit_version"]) for r in ch
               if r["change"] == "removed"}
    assert removed == {(2, 2), (3, 2), (5, 2), (7, 4)}
    added = {(r["k"], r["_commit_version"]) for r in ch
             if r["change"] == "added"}
    assert added == {(3, 3)}

    with pytest.raises(ValueError):
        snapshot_read_evolved(spark, t)
    with pytest.raises(ValueError):
        snapshot_read_mor(spark, t, ["missing_col"])

    # vacuum keeps the whole chain (v1 is the base of kept deltas)
    res = snapshot_vacuum(t, keep_last=1)
    assert res["versions_expired"] == []
    assert {r["k"] for r in
            snapshot_read_mor(spark, t, ["k"]).collect()} == set(got)


def test_snapshot_gc_collects_only_stale_debris(spark, tmp_path):
    """Crashed-writer GC: stale reservations + their torn dirs and
    old unreferenced legacy dirs are collected; fresh reservations
    (in-flight writers) and manifest-referenced dirs are untouched;
    committed data stays readable."""
    import os
    import pathlib as _pl

    from isilon_hadoop_tools_spark.operators.snapshots import (
        snapshot_gc,
        snapshot_read,
        snapshot_write,
    )

    t = str(tmp_path / "gc")
    snapshot_write(_df(spark, 5, "a"), t)
    root = _pl.Path(t)
    old = 1_600_000_000
    # stale reservation + its torn dir (writer died mid-commit)
    stale = root / "_manifests" / "00007.reserved"
    stale.touch()
    os.utime(stale, (old, old))
    torn7 = root / "data" / "v00007"
    torn7.mkdir(parents=True)
    (torn7 / "part-x.parquet").write_bytes(b"torn")
    # fresh reservation (writer in flight): must survive
    fresh = root / "_manifests" / "00008.reserved"
    fresh.touch()
    torn8 = root / "data" / "v00008"
    torn8.mkdir(parents=True)
    # legacy torn dir, old, never reserved: collected
    legacy = root / "data" / "v00005"
    legacy.mkdir(parents=True)
    os.utime(legacy, (old, old))

    res = snapshot_gc(t, stale_after_sec=3600)
    assert res == {"reservations_removed": 1, "torn_dirs_removed": 2}
    assert not stale.exists() and not torn7.exists()
    assert fresh.exists() and torn8.exists()  # in-flight protected
    assert not legacy.exists()
    assert snapshot_read(spark, t).count() == 5  # committed untouched
    # idempotent
    assert snapshot_gc(t, stale_after_sec=3600) == {
        "reservations_removed": 0, "torn_dirs_removed": 0,
    }
