"""Arg-parity and behavior tests for the console entry points
(reference ``_scripts.py:20-167`` + ``cli.py:32-96``)."""

from __future__ import annotations

import logging

import pytest

from isilon_hadoop_tools_spark import IsilonHadoopToolsSparkError, cli


def test_create_users_cli_arg_parity():
    """Every argument the reference's isilon_create_users accepts must
    parse here with the same defaults (``_scripts.py:54-77``,
    ``cli.py:61-98,150-175``)."""
    parser = cli.isilon_create_users_cli()
    args = parser.parse_args(
        [
            "state_root",
            "--zone",
            "z9",
            "--dist",
            "cdh",
            "--append-cluster-name",
            "mycluster",
            "--start-uid",
            "2000",
            "--start-gid",
            "3000",
            "--user-password",
            "pw",
            "--no-verify",
            "--onefs-user",
            "admin",
            "--onefs-password",
            "secret",
            "--dry",
            "-q",
            "--log-level",
            "debug",
        ]
    )
    assert args.state_dir == "state_root"
    assert args.zone == "z9"
    assert args.dist == "cdh"
    assert args.append_cluster_name == "mycluster"
    assert args.start_uid == 2000
    assert args.start_gid == 3000
    assert args.user_password == "pw"
    assert args.no_verify is True
    assert args.dry is True
    assert args.quiet is True
    assert args.log_level == "debug"


def test_cli_defaults_match_reference():
    args = cli.isilon_create_users_cli().parse_args(["--dist", "hdp"])
    assert args.start_uid == 1025  # identities.py:56-57
    assert args.start_gid == 1025
    assert args.zone == "zone1"
    assert args.onefs_user == "root"  # cli.py:85-90
    assert args.log_level == "info"
    assert args.dry is False


def test_dist_is_required_and_choice_checked():
    with pytest.raises(SystemExit):
        cli.isilon_create_users_cli().parse_args([])
    with pytest.raises(SystemExit):
        cli.isilon_create_users_cli().parse_args(["--dist", "mapr"])


def test_script_name_matches_reference_shape():
    args = cli.isilon_create_users_cli().parse_args(
        ["--dist", "cdp", "--zone", "zoneX", "--append-cluster-name", "c1"]
    )
    name = cli._script_name(args)
    # <epoch>-<zone>-<dist><suffix>.sh with the '-' auto-prepended
    stem = name[: -len(".sh")]
    epoch, zone, rest = stem.split("-", 2)
    assert epoch.isdigit()
    assert zone == "zoneX"
    assert rest == "cdp-c1"


def test_catches_logs_and_returns_1(caplog):
    @cli.catches(IsilonHadoopToolsSparkError)
    def boom():
        raise IsilonHadoopToolsSparkError("nope")

    with caplog.at_level(logging.ERROR):
        assert boom() == 1
    assert any("nope" in r.message for r in caplog.records)


def test_catches_passes_through_other_exceptions():
    @cli.catches(IsilonHadoopToolsSparkError)
    def boom():
        raise ValueError("different")

    with pytest.raises(ValueError):
        boom()


def test_main_dispatch_unknown_command_exits_2(capsys):
    assert cli.main(["frobnicate"]) == 2
    assert "usage" in capsys.readouterr().err


def test_create_users_dry_run_end_to_end(spark, tmp_path, monkeypatch):
    # full pipeline through the console entry point: parse -> stages ->
    # dry-run counts, exit 0, nothing written
    monkeypatch.chdir(tmp_path)
    rc = cli.isilon_create_users(
        [str(tmp_path / "state"), "--dist", "cdh", "--dry", "-q"]
    )
    assert rc == 0
    # dry run commits nothing: no parquet state, no side-output script
    assert not list((tmp_path / "state").rglob("*.parquet"))
    assert not list(tmp_path.glob("*.sh"))


def test_create_directories_real_run_commits_state(spark, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rc = cli.isilon_create_directories(
        [str(tmp_path / "state"), "--dist", "cdh", "-q"]
    )
    assert rc == 0
    assert (tmp_path / "state").exists()  # stages committed
