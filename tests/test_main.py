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
