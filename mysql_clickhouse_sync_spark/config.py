"""Environment-variable configuration + Docker-secrets loading.

O6 parity with the reference's pydantic settings layer
(``/root/reference/src/config.py:9-93``): every deployment of the
reference is configured through env vars — ``MYSQL_*``,
``CLICKHOUSE_*``, ``REPLICATION_*`` — with ``*_PASSWORD_FILE``
Docker-secret overrides (``config.py:33-42,56-65``).  This module
reproduces that surface with stdlib dataclasses (no pydantic in the
harness image) and extends it with an env twin for every
``main.py`` CLI flag, so the engine can run fully env-configured in a
container exactly like the reference (CLI args still win — they are
explicit operator intent).

Precedence per value: explicit CLI flag > ``*_PASSWORD_FILE`` secret
(passwords only) > env var > default.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from pathlib import Path

_TRUE = {"1", "true", "yes", "on"}


def read_secret_file(file_path: str) -> str:
    """Read a Docker secret file; missing file -> empty string
    (parity: ``/root/reference/src/config.py:9-14``)."""
    path = Path(file_path)
    if path.exists():
        return path.read_text().strip()
    return ""


def _env_bool(name: str, default: bool = False) -> bool:
    raw = os.environ.get(name)
    if raw is None:
        return default
    return raw.strip().lower() in _TRUE


def _env_int(name: str, default: int) -> int:
    raw = os.environ.get(name)
    return int(raw) if raw not in (None, "") else default


def _password_with_secret(var: str) -> str:
    """``<VAR>_FILE`` (Docker secret) overrides ``<VAR>`` when the file
    exists and is non-empty (parity: ``config.py:33-42,56-65`` — the
    reference also keeps the plain env value when the secret file is
    empty)."""
    plain = os.environ.get(var, "")
    secret_file = os.environ.get(f"{var}_FILE")
    if secret_file:
        secret = read_secret_file(secret_file)
        if secret:
            return secret
    return plain


@dataclass
class MySQLConfig:
    """Source-database connection (``MYSQL_*`` env family)."""

    host: str = ""
    port: int = 3306
    user: str = ""
    password: str = ""
    database: str = ""

    @classmethod
    def from_env(cls) -> "MySQLConfig":
        return cls(
            host=os.environ.get("MYSQL_HOST", ""),
            port=_env_int("MYSQL_PORT", 3306),
            user=os.environ.get("MYSQL_USER", ""),
            password=_password_with_secret("MYSQL_PASSWORD"),
            database=os.environ.get("MYSQL_DATABASE", ""),
        )

    def jdbc_url(self) -> str:
        return f"jdbc:mysql://{self.host}:{self.port}/{self.database}"


@dataclass
class ClickHouseConfig:
    """Target-database connection (``CLICKHOUSE_*`` env family)."""

    host: str = ""
    port: int = 8123
    user: str = "default"
    password: str = ""
    database: str = ""

    @classmethod
    def from_env(cls) -> "ClickHouseConfig":
        return cls(
            host=os.environ.get("CLICKHOUSE_HOST", ""),
            port=_env_int("CLICKHOUSE_PORT", 8123),
            user=os.environ.get("CLICKHOUSE_USER", "default"),
            password=_password_with_secret("CLICKHOUSE_PASSWORD"),
            database=os.environ.get("CLICKHOUSE_DATABASE", ""),
        )

    def jdbc_url(self) -> str:
        return f"jdbc:clickhouse://{self.host}:{self.port}/{self.database}"


@dataclass
class ReplicationConfig:
    """Replication behavior (``REPLICATION_*`` env family; parity with
    ``/root/reference/src/config.py:69-93`` plus env twins for the
    engine's extra CLI modes)."""

    mode: str = "snapshot"              # snapshot | cdc | compact | zorder
    batch_size: int = 50_000
    tables: str = ""
    drop_existing: bool = False
    parallel_tables: int = 1
    position_file: str = "/data/binlog_position.json"
    # engine extensions (env twin of every main.py flag)
    source_dir: str = ""
    target_dir: str = ""
    changelog_dir: str = ""
    table: str = ""
    pks: str = ""
    follow: bool = False
    full: bool = False
    drop_tombstones: bool = False
    target_file_mb: int = 128
    zorder_cols: str = ""

    @classmethod
    def from_env(cls) -> "ReplicationConfig":
        return cls(
            mode=os.environ.get("REPLICATION_MODE", "snapshot"),
            batch_size=_env_int("REPLICATION_BATCH_SIZE", 50_000),
            tables=os.environ.get("REPLICATION_TABLES", ""),
            drop_existing=_env_bool("REPLICATION_DROP_EXISTING"),
            parallel_tables=_env_int("REPLICATION_PARALLEL_TABLES", 1),
            position_file=os.environ.get(
                "REPLICATION_POSITION_FILE", "/data/binlog_position.json"
            ),
            source_dir=os.environ.get("REPLICATION_SOURCE_DIR", ""),
            target_dir=os.environ.get("REPLICATION_TARGET_DIR", ""),
            changelog_dir=os.environ.get("REPLICATION_CHANGELOG_DIR", ""),
            table=os.environ.get("REPLICATION_TABLE", ""),
            pks=os.environ.get("REPLICATION_PKS", ""),
            follow=_env_bool("REPLICATION_FOLLOW"),
            full=_env_bool("REPLICATION_FULL"),
            drop_tombstones=_env_bool("REPLICATION_DROP_TOMBSTONES"),
            target_file_mb=_env_int("REPLICATION_TARGET_FILE_MB", 128),
            zorder_cols=os.environ.get("REPLICATION_ZORDER_COLS", ""),
        )

    def get_tables_list(self) -> list[str]:
        """Whitespace-trimmed csv split (parity:
        ``/root/reference/src/config.py:89-93``)."""
        if not self.tables:
            return []
        return [t.strip() for t in self.tables.split(",") if t.strip()]

    def get_pks_list(self) -> list[str]:
        if not self.pks:
            return []
        return [k.strip() for k in self.pks.split(",") if k.strip()]


@dataclass
class KafkaConfig:
    """Kafka changelog transport (``KAFKA_*`` env family) — the
    production twin of the reference's direct binlog connection
    (``/root/reference/src/cdc_replicator.py:99-145``).  The
    reference's connection knobs map onto Spark's Kafka source:
    ``server_id``/consumer identity -> ``group_id_prefix``; resume
    from ``(file, position)`` -> the stream checkpoint's stored Kafka
    offsets (``starting_offsets`` applies to the FIRST start only,
    exactly like the reference starting from the current binlog tail
    when no position file exists); ``only_tables`` -> topic selection
    plus the table filter in the multi-table reader."""

    bootstrap_servers: str = ""
    topic: str = ""
    starting_offsets: str = "earliest"  # first start only; then checkpoint
    group_id_prefix: str = "mysql-clickhouse-sync"
    fail_on_data_loss: bool = False
    max_offsets_per_trigger: int = 0    # 0 = unbounded microbatches

    @classmethod
    def from_env(cls) -> "KafkaConfig":
        return cls(
            bootstrap_servers=os.environ.get("KAFKA_BOOTSTRAP_SERVERS", ""),
            topic=os.environ.get("KAFKA_TOPIC", ""),
            starting_offsets=os.environ.get(
                "KAFKA_STARTING_OFFSETS", "earliest"
            ),
            group_id_prefix=os.environ.get(
                "KAFKA_GROUP_ID_PREFIX", "mysql-clickhouse-sync"
            ),
            fail_on_data_loss=_env_bool("KAFKA_FAIL_ON_DATA_LOSS"),
            max_offsets_per_trigger=_env_int(
                "KAFKA_MAX_OFFSETS_PER_TRIGGER", 0
            ),
        )


@dataclass
class Settings:
    mysql: MySQLConfig = field(default_factory=MySQLConfig)
    clickhouse: ClickHouseConfig = field(default_factory=ClickHouseConfig)
    replication: ReplicationConfig = field(default_factory=ReplicationConfig)
    kafka: KafkaConfig = field(default_factory=KafkaConfig)

    @classmethod
    def from_env(cls) -> "Settings":
        return cls(
            mysql=MySQLConfig.from_env(),
            clickhouse=ClickHouseConfig.from_env(),
            replication=ReplicationConfig.from_env(),
            kafka=KafkaConfig.from_env(),
        )


def get_settings() -> Settings:
    """Parity: ``/root/reference/src/config.py:96-97``."""
    return Settings.from_env()
