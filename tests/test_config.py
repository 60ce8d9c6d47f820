"""Env-config + Docker-secrets layer (O6 parity).

Mirrors the reference's config coverage
(``/root/reference/tests/test_replicator.py:195-227`` and the secrets
behavior in ``/root/reference/src/config.py:33-42``): tables-csv
parsing, batch-size from env, ``*_PASSWORD_FILE`` overrides, and the
CLI-wins precedence of main.py's env twins.

Pure driver-side code — no SparkSession needed.
"""

from __future__ import annotations

import pytest

from mysql_clickhouse_sync_spark.config import (
    ClickHouseConfig,
    MySQLConfig,
    ReplicationConfig,
    Settings,
    get_settings,
    read_secret_file,
)


@pytest.fixture(autouse=True)
def _clean_env(monkeypatch):
    for var in (
        "MYSQL_HOST", "MYSQL_PORT", "MYSQL_USER", "MYSQL_PASSWORD",
        "MYSQL_PASSWORD_FILE", "MYSQL_DATABASE",
        "CLICKHOUSE_HOST", "CLICKHOUSE_PORT", "CLICKHOUSE_USER",
        "CLICKHOUSE_PASSWORD", "CLICKHOUSE_PASSWORD_FILE",
        "CLICKHOUSE_DATABASE",
        "REPLICATION_MODE", "REPLICATION_BATCH_SIZE", "REPLICATION_TABLES",
        "REPLICATION_DROP_EXISTING", "REPLICATION_PARALLEL_TABLES",
        "REPLICATION_POSITION_FILE", "REPLICATION_SOURCE_DIR",
        "REPLICATION_TARGET_DIR", "REPLICATION_TABLE", "REPLICATION_PKS",
    ):
        monkeypatch.delenv(var, raising=False)


def test_defaults_match_reference():
    s = Settings.from_env()
    assert s.mysql.port == 3306
    assert s.clickhouse.port == 8123
    assert s.clickhouse.user == "default"
    assert s.replication.mode == "snapshot"
    assert s.replication.batch_size == 50_000
    assert s.replication.parallel_tables == 1
    assert s.replication.position_file == "/data/binlog_position.json"


def test_env_values_read(monkeypatch):
    monkeypatch.setenv("MYSQL_HOST", "db.internal")
    monkeypatch.setenv("MYSQL_PORT", "3307")
    monkeypatch.setenv("MYSQL_USER", "repl")
    monkeypatch.setenv("MYSQL_PASSWORD", "plain")
    monkeypatch.setenv("MYSQL_DATABASE", "shop")
    monkeypatch.setenv("REPLICATION_BATCH_SIZE", "5000")
    monkeypatch.setenv("REPLICATION_MODE", "cdc")
    s = get_settings()
    assert s.mysql.host == "db.internal"
    assert s.mysql.port == 3307
    assert s.mysql.password == "plain"
    assert s.mysql.jdbc_url() == "jdbc:mysql://db.internal:3307/shop"
    assert s.replication.batch_size == 5000
    assert s.replication.mode == "cdc"


def test_tables_list_parsing(monkeypatch):
    # mirrors reference test_tables_list_parsing
    monkeypatch.setenv("REPLICATION_TABLES", "users, orders , products")
    r = ReplicationConfig.from_env()
    assert r.get_tables_list() == ["users", "orders", "products"]


def test_empty_tables_list():
    assert ReplicationConfig().get_tables_list() == []
    assert ReplicationConfig().get_pks_list() == []


def test_bool_env_parsing(monkeypatch):
    monkeypatch.setenv("REPLICATION_DROP_EXISTING", "true")
    assert ReplicationConfig.from_env().drop_existing is True
    monkeypatch.setenv("REPLICATION_DROP_EXISTING", "0")
    assert ReplicationConfig.from_env().drop_existing is False


def test_password_file_overrides_env(tmp_path, monkeypatch):
    # mirrors reference load_secrets: file wins over plain env var
    secret = tmp_path / "mysql_pw"
    secret.write_text("s3cret\n")
    monkeypatch.setenv("MYSQL_PASSWORD", "plain")
    monkeypatch.setenv("MYSQL_PASSWORD_FILE", str(secret))
    assert MySQLConfig.from_env().password == "s3cret"


def test_empty_or_missing_secret_file_keeps_plain(tmp_path, monkeypatch):
    # reference keeps the env value when the secret is empty/missing
    monkeypatch.setenv("CLICKHOUSE_PASSWORD", "plain")
    monkeypatch.setenv(
        "CLICKHOUSE_PASSWORD_FILE", str(tmp_path / "does_not_exist")
    )
    assert ClickHouseConfig.from_env().password == "plain"
    empty = tmp_path / "empty"
    empty.write_text("")
    monkeypatch.setenv("CLICKHOUSE_PASSWORD_FILE", str(empty))
    assert ClickHouseConfig.from_env().password == "plain"


def test_read_secret_file_missing_returns_empty(tmp_path):
    assert read_secret_file(str(tmp_path / "nope")) == ""


def test_main_flags_default_from_env(monkeypatch, tmp_path):
    from mysql_clickhouse_sync_spark.main import _build_parser

    monkeypatch.setenv("REPLICATION_MODE", "snapshot")
    monkeypatch.setenv("REPLICATION_SOURCE_DIR", "/src")
    monkeypatch.setenv("REPLICATION_TARGET_DIR", "/tgt")
    monkeypatch.setenv("REPLICATION_TABLES", "a,b")
    monkeypatch.setenv("REPLICATION_PARALLEL_TABLES", "4")
    monkeypatch.setenv("REPLICATION_DROP_EXISTING", "yes")
    args = _build_parser().parse_args([])  # zero CLI flags
    assert args.mode == "snapshot"
    assert args.source_dir == "/src"
    assert args.target_dir == "/tgt"
    assert args.tables == "a,b"
    assert args.parallel_tables == 4
    assert args.drop_existing is True


def test_cli_flags_win_over_env(monkeypatch):
    from mysql_clickhouse_sync_spark.main import _build_parser

    monkeypatch.setenv("REPLICATION_MODE", "snapshot")
    monkeypatch.setenv("REPLICATION_TARGET_DIR", "/tgt")
    monkeypatch.setenv("REPLICATION_TABLES", "a,b")
    args = _build_parser().parse_args(
        ["--mode", "cdc", "--tables", "x", "--target-dir", "/other"]
    )
    assert args.mode == "cdc"
    assert args.tables == "x"
    assert args.target_dir == "/other"


def test_mode_still_required_without_env():
    from mysql_clickhouse_sync_spark.main import _build_parser

    with pytest.raises(SystemExit):
        _build_parser().parse_args(["--target-dir", "/tgt"])
