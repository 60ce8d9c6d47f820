"""Snapshot pipeline tests mirroring the reference's replicator tests
(/root/reference/tests/test_replicator.py, SURVEY.md §5): full-flow
success, schema cast, sequential & parallel runs, per-table error
isolation, exit codes."""

from __future__ import annotations

import functools

from pyspark.sql.types import DecimalType

from mysql_clickhouse_sync_spark.pipeline import SnapshotReplicator
from mysql_clickhouse_sync_spark.schema import ColumnSpec, TableSpec
from mysql_clickhouse_sync_spark.sources.parquet import load_table

SF_DIR = "/root/testdata/sf0.001"


def _reader(spark, table):
    if table == "boom":
        raise RuntimeError("source unavailable")
    return load_table(spark, SF_DIR, table)


def _mk(spark, tmp_path, **kw):
    return SnapshotReplicator(
        spark,
        functools.partial(_reader, spark),
        str(tmp_path),
        drop_existing=True,
        **kw,
    )


def test_full_flow_copy_and_verify(spark, tmp_path):
    rep = _mk(spark, tmp_path)
    results = rep.run(["region", "nation"])
    assert all(r.success for r in results.values())
    assert results["region"].source_count == 5
    assert results["region"].target_count == 5
    assert SnapshotReplicator.exit_code(results) == 0


def test_parallel_run_matches_sequential(spark, tmp_path):
    # parity: sequential & parallel equivalence
    # (/root/reference/tests/test_replicator.py:127-141,180-192)
    seq = _mk(spark, tmp_path / "a").run(["region", "nation", "supplier"])
    par = _mk(spark, tmp_path / "b").run(
        ["region", "nation", "supplier"], parallel_tables=3
    )
    assert {t: r.success for t, r in seq.items()} == {
        t: r.success for t, r in par.items()
    }


def test_per_table_error_isolation(spark, tmp_path):
    # parity: one failing table doesn't stop the others, exit code 1
    # (/root/reference/tests/test_replicator.py:152-178)
    results = _mk(spark, tmp_path).run(["region", "boom", "nation"])
    assert results["region"].success
    assert results["nation"].success
    assert not results["boom"].success
    assert "source unavailable" in results["boom"].error
    assert SnapshotReplicator.exit_code(results) == 1


def test_schema_cast_applied(spark, tmp_path):
    spec = TableSpec(
        "region",
        (
            ColumnSpec("r_regionkey", "decimal", is_nullable=False,
                       column_key="PRI", numeric_precision=10,
                       numeric_scale=0),
            ColumnSpec("r_name", "varchar", is_nullable=False),
        ),
        primary_keys=("r_regionkey",),
    )
    rep = _mk(spark, tmp_path, specs={"region": spec})
    results = rep.run(["region"])
    assert results["region"].success
    out = spark.read.parquet(str(tmp_path / "region"))
    assert out.schema["r_regionkey"].dataType == DecimalType(10, 0)
    assert results["region"].details["diff"]["success"]


def test_errorifexists_without_drop(spark, tmp_path):
    rep = SnapshotReplicator(
        spark,
        functools.partial(_reader, spark),
        str(tmp_path),
        drop_existing=False,
    )
    assert rep.run(["region"])["region"].success
    rerun = rep.run(["region"])["region"]
    assert not rerun.success  # target exists, no drop requested
