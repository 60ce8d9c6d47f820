"""CLI mode dispatch (O1): snapshot and CDC modes end-to-end through
main(), including exit codes and table discovery."""

from __future__ import annotations

import json
import os

from conftest import SF_DIR
from mysql_clickhouse_sync_spark.main import main


def test_snapshot_mode_discovers_and_verifies(spark, tmp_path):
    target = str(tmp_path / "out")
    rc = main(
        [
            "--mode", "snapshot",
            "--source-dir", SF_DIR,
            "--target-dir", target,
            "--tables", "region,nation",
            "--parallel-tables", "2",
        ],
        spark=spark,
    )
    assert rc == 0
    assert spark.read.parquet(os.path.join(target, "region")).count() == 5
    assert spark.read.parquet(os.path.join(target, "nation")).count() == 25


def test_snapshot_mode_reports_failure(spark, tmp_path):
    rc = main(
        [
            "--mode", "snapshot",
            "--source-dir", SF_DIR,
            "--target-dir", str(tmp_path / "out2"),
            "--tables", "region,no_such_table",
        ],
        spark=spark,
    )
    assert rc == 1  # per-table isolation: region ok, missing table fails


def test_cdc_mode_bootstrap_and_drain(spark, tmp_path):
    changelog = tmp_path / "changelog"
    changelog.mkdir()
    rows = [
        {"op": "D", "seq": 1, "r_regionkey": 0, "r_name": "AFRICA"},
        {"op": "U", "seq": 2, "r_regionkey": 1, "r_name": "AMERICA-v2"},
    ]
    with open(changelog / "f1.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    rc = main(
        [
            "--mode", "cdc",
            "--source-dir", SF_DIR,
            "--target-dir", str(tmp_path / "cdc_out"),
            "--changelog-dir", str(changelog),
            "--table", "region",
            "--pks", "r_regionkey",
        ],
        spark=spark,
    )
    assert rc == 0
    live = spark.read.option("mergeSchema", "true").parquet(
        str(tmp_path / "cdc_out" / "region_cdc")
    )
    from mysql_clickhouse_sync_spark.operators.cdc import live_view

    state = {r.r_regionkey: r.r_name
             for r in live_view(live, ["r_regionkey"]).collect()}
    assert 0 not in state                      # deleted
    assert state[1] == "AMERICA-v2"            # updated
    assert len(state) == 4                     # 5 regions - 1 delete


def test_compact_mode_bin_packs(spark, tmp_path):
    from mysql_clickhouse_sync_spark.main import main
    from mysql_clickhouse_sync_spark.pipeline.compact import list_data_files

    target = str(tmp_path / "frag")
    spark.range(5000).repartition(16).write.parquet(target)
    assert len(list_data_files(target)) == 16
    rc = main(
        ["--mode", "compact", "--target-dir", target, "--target-file-mb", "64"],
        spark=spark,
    )
    assert rc == 0
    assert len(list_data_files(target)) == 1
    assert spark.read.parquet(target).count() == 5000


def test_compact_mode_full_optimize(spark, tmp_path):
    from pyspark.sql import functions as F

    from mysql_clickhouse_sync_spark.main import main
    from mysql_clickhouse_sync_spark.operators.cdc import stamp_changelog

    target = str(tmp_path / "cdc_opt")
    base = spark.range(100).select(F.col("id").alias("k"))
    for v, op in ((1, "I"), (2, "U")):
        stamp_changelog(
            base.withColumn("op", F.lit(op)).withColumn("_v", F.lit(v)),
            version_col="_v",
        ).drop("_v").repartition(4).write.mode("append").parquet(target)
    assert spark.read.parquet(target).count() == 200
    rc = main(
        ["--mode", "compact", "--full", "--pks", "k", "--target-dir", target],
        spark=spark,
    )
    assert rc == 0
    assert spark.read.parquet(target).count() == 100  # one version per key


def test_snapshot_mode_requires_source_dir(spark):
    from mysql_clickhouse_sync_spark.main import main

    assert main(["--mode", "snapshot", "--target-dir", "/tmp/x"],
                spark=spark) == 2


def test_zorder_mode_rewrites_in_place(spark, tmp_path):
    """zorder CLI mode: directory rewritten clustered, same rows,
    tmp/backup dirs cleaned up."""
    import glob

    from pyspark.sql import functions as F

    from conftest import SF_DIR
    from mysql_clickhouse_sync_spark.main import main
    from mysql_clickhouse_sync_spark.sources.parquet import load_table

    target = str(tmp_path / "ev_table")
    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "value"
    )
    ev.write.parquet(target)

    rc = main(
        [
            "--mode", "zorder",
            "--target-dir", target,
            "--zorder-cols", "user_id,value",
        ],
        spark=spark,
    )
    assert rc == 0
    back = spark.read.parquet(target)
    assert back.count() == ev.count()
    assert back.exceptAll(ev).count() == 0
    assert not glob.glob(target + "__*"), "tmp/backup dirs left behind"
    # a selective user_id filter now prunes whole files via stats
    assert back.filter(F.col("user_id") == 1).count() == ev.filter(
        F.col("user_id") == 1
    ).count()


def test_curate_mode_writes_pack_assignments(spark, tmp_path):
    from mysql_clickhouse_sync_spark.main import main

    rc = main(
        [
            "--mode", "curate",
            "--source-dir", "/root/testdata/sf0.001",
            "--target-dir", str(tmp_path),
        ],
        spark=spark,
    )
    assert rc == 0
    out = spark.read.parquet(str(tmp_path / "curated_packs"))
    assert out.count() > 0
    assert set(out.columns) == {
        "doc_id", "source", "lang", "stream_id", "n_tokens",
        "pack_id", "pack_offset",
    }


def test_invalid_replication_mode_rejected(monkeypatch, capsys):
    """argparse doesn't validate defaults against choices, so an
    invalid REPLICATION_MODE must be rejected explicitly instead of
    falling through dispatch (round-3 advice)."""
    import pytest

    from mysql_clickhouse_sync_spark.main import _build_parser

    monkeypatch.setenv("REPLICATION_MODE", "bogus")
    with pytest.raises(SystemExit):
        _build_parser().parse_args(["--target-dir", "/tmp/x"])
    assert "invalid REPLICATION_MODE" in capsys.readouterr().err


def test_explicit_cli_mode_beats_stale_env_mode(monkeypatch):
    """A stale invalid REPLICATION_MODE in the shell must NOT break an
    invocation that passes a valid --mode explicitly — the env value
    is only validated when it would actually be used as the default
    (round-4 advice: 'explicit CLI flag > env var', both directions)."""
    from mysql_clickhouse_sync_spark.main import _build_parser

    monkeypatch.setenv("REPLICATION_MODE", "bogus")
    args = _build_parser().parse_args(
        ["--mode", "snapshot", "--target-dir", "/tmp/x"]
    )
    assert args.mode == "snapshot"


def test_empty_replication_mode_treated_as_unset(monkeypatch, capsys):
    import pytest

    from mysql_clickhouse_sync_spark.main import _build_parser

    monkeypatch.setenv("REPLICATION_MODE", "")
    with pytest.raises(SystemExit):  # --mode becomes required again
        _build_parser().parse_args(["--target-dir", "/tmp/x"])
    assert "--mode" in capsys.readouterr().err


def test_env_enabled_boolean_can_be_disabled_from_cli(monkeypatch):
    """'explicit CLI flag > env var' must hold in BOTH directions:
    --no-follow turns off an env-enabled REPLICATION_FOLLOW
    (round-3 advice; BooleanOptionalAction)."""
    from mysql_clickhouse_sync_spark.main import _build_parser

    monkeypatch.setenv("REPLICATION_FOLLOW", "true")
    monkeypatch.setenv("REPLICATION_DROP_EXISTING", "1")
    args = _build_parser().parse_args(
        ["--mode", "snapshot", "--target-dir", "/tmp/x",
         "--no-follow", "--no-drop-existing"]
    )
    assert args.follow is False
    assert args.drop_existing is False
    # and env defaults still win when the CLI is silent
    args2 = _build_parser().parse_args(
        ["--mode", "snapshot", "--target-dir", "/tmp/x"]
    )
    assert args2.follow is True
    assert args2.drop_existing is True
