"""Mode-dispatch entry point (parity: O1,
``/root/reference/src/main.py:74-93`` — env-selected snapshot vs CDC).

Snapshot mode replicates parquet tables from a source directory into a
target directory with verification and per-table error isolation;
CDC mode bootstraps a snapshot + streams a JSON changelog directory
into the versioned table (availableNow by default — drain and stop;
``--follow`` keeps the stream running like the reference's blocking
binlog loop).

Exit code 1 if any table failed (parity:
``/root/reference/src/main.py:38-44``).
"""

from __future__ import annotations

import argparse
import os
import sys

from pyspark.sql import SparkSession


def _build_parser() -> argparse.ArgumentParser:
    """Every flag has an env twin (``REPLICATION_*``,
    ``mysql_clickhouse_sync_spark.config`` — O6 parity with the
    reference's env-only configuration); explicit CLI flags win."""
    from .config import ReplicationConfig

    env = ReplicationConfig.from_env()
    modes = ("snapshot", "cdc", "compact", "zorder", "curate")
    env_mode = (os.environ.get("REPLICATION_MODE") or "").strip()

    class _Parser(argparse.ArgumentParser):
        """argparse does NOT validate defaults against `choices`, so
        an invalid REPLICATION_MODE would silently fall through
        dispatch.  Validate post-parse, and ONLY when the env value
        would actually be used as the mode: an explicit valid
        ``--mode`` on the CLI must win over a stale env var in the
        shell ('explicit CLI flag > env var' precedence, both
        directions — round-4 advice)."""

        def parse_args(self, args=None, namespace=None):  # type: ignore[override]
            ns = super().parse_args(args, namespace)
            if getattr(ns, "mode", None) not in modes:
                self.error(
                    f"invalid REPLICATION_MODE {ns.mode!r} "
                    f"(choose from {', '.join(modes)})"
                )
            return ns

    ap = _Parser(prog="spark-sync-engine")
    ap.add_argument("--mode",
                    choices=modes,
                    default=env_mode or None,
                    required=not env_mode)
    ap.add_argument("--source-dir", default=env.source_dir or None,
                    help="directory of <table>.parquet source files "
                    "(snapshot/cdc modes) [env: REPLICATION_SOURCE_DIR]")
    ap.add_argument("--target-dir", default=env.target_dir or None,
                    required=not env.target_dir,
                    help="[env: REPLICATION_TARGET_DIR]")
    ap.add_argument("--tables", default=env.tables,
                    help="csv list; empty = discover *.parquet in source "
                    "(parity: REPLICATION_TABLES, P6)")
    ap.add_argument("--parallel-tables", type=int,
                    default=env.parallel_tables,
                    help="[env: REPLICATION_PARALLEL_TABLES]")
    # Booleans use BooleanOptionalAction (--flag / --no-flag) so an
    # env-enabled default can still be overridden OFF from the CLI —
    # the documented "explicit CLI flag > env var" precedence in both
    # directions (round-3 advice).
    ap.add_argument("--drop-existing",
                    action=argparse.BooleanOptionalAction,
                    default=env.drop_existing,
                    help="[env: REPLICATION_DROP_EXISTING]")
    # CDC-only:
    ap.add_argument("--changelog-dir", default=env.changelog_dir or None,
                    help="JSON changelog directory (op, seq, cols...) "
                    "[env: REPLICATION_CHANGELOG_DIR]")
    ap.add_argument("--table", default=env.table or None,
                    help="CDC table name (single-table stream) "
                    "[env: REPLICATION_TABLE]")
    ap.add_argument("--pks", default=env.pks,
                    help="csv primary keys for CDC [env: REPLICATION_PKS]")
    ap.add_argument("--follow", action=argparse.BooleanOptionalAction,
                    default=env.follow,
                    help="keep streaming (processingTime) instead of "
                    "drain-and-stop [env: REPLICATION_FOLLOW]")
    # compact-only:
    ap.add_argument("--full", action=argparse.BooleanOptionalAction,
                    default=env.full,
                    help="compact mode: full CDC OPTIMIZE (collapse row "
                    "versions via dedup-latest) instead of policy-gated "
                    "small-file bin-packing; needs --pks "
                    "[env: REPLICATION_FULL]")
    ap.add_argument("--drop-tombstones",
                    action=argparse.BooleanOptionalAction,
                    default=env.drop_tombstones,
                    help="with --full: physically drop deleted rows "
                    "(ClickHouse OPTIMIZE ... CLEANUP) "
                    "[env: REPLICATION_DROP_TOMBSTONES]")
    ap.add_argument("--target-file-mb", type=int,
                    default=env.target_file_mb,
                    help="compact mode: output file size target "
                    "[env: REPLICATION_TARGET_FILE_MB]")
    # zorder-only:
    ap.add_argument("--zorder-cols", default=env.zorder_cols,
                    help="zorder mode: csv columns to interleave "
                    "[env: REPLICATION_ZORDER_COLS]")
    return ap


def _discover_tables(source_dir: str) -> list[str]:
    return sorted(
        f[: -len(".parquet")]
        for f in os.listdir(source_dir)
        if f.endswith(".parquet")
    )


def run_snapshot(spark: SparkSession, args) -> int:
    from .pipeline.snapshot import SnapshotReplicator

    tables = (
        [t.strip() for t in args.tables.split(",") if t.strip()]
        or _discover_tables(args.source_dir)
    )
    rep = SnapshotReplicator(
        spark,
        reader=lambda t: spark.read.parquet(
            os.path.join(args.source_dir, f"{t}.parquet")
        ),
        target_dir=args.target_dir,
        drop_existing=args.drop_existing,
    )
    results = rep.run(tables, parallel_tables=args.parallel_tables)
    for r in results.values():
        status = "ok" if r.success else f"FAILED ({r.error})"
        print(f"{r.table}: {status} "
              f"[{r.source_count} -> {r.target_count}]", file=sys.stderr)
    return SnapshotReplicator.exit_code(results)


def run_cdc(spark: SparkSession, args) -> int:
    from .streaming.cdc_pipeline import (
        CDCStreamPipeline,
        run_initial_sync_then_stream,
        run_stream_with_restart,
    )

    if not (args.changelog_dir and args.table and args.pks):
        print("cdc mode needs --changelog-dir, --table, --pks",
              file=sys.stderr)
        return 2
    snapshot_path = os.path.join(args.source_dir, f"{args.table}.parquet")
    snapshot = spark.read.parquet(snapshot_path)
    # Changelog schema = snapshot cols + (op, seq), mirroring the
    # reference's cached decode schema (C10).
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    changelog_schema = StructType(
        [StructField("op", StringType(), False),
         StructField("seq", LongType(), False)]
        + list(snapshot.schema.fields)
    )
    pipeline = CDCStreamPipeline(
        spark,
        args.table,
        [k.strip() for k in args.pks.split(",") if k.strip()],
        changelog_schema,
        args.target_dir,
    )
    if args.follow:
        run_initial_sync_then_stream(pipeline, snapshot, args.changelog_dir)
        # blocking loop with capped-backoff restart, like the
        # reference's reconnect (C8)
        run_stream_with_restart(
            pipeline, args.changelog_dir, available_now=False
        )
    else:
        run_initial_sync_then_stream(pipeline, snapshot, args.changelog_dir)
    print(f"{args.table}: live rows = {pipeline.live().count()}",
          file=sys.stderr)
    return 0


def run_compact(spark: SparkSession, args) -> int:
    """Maintenance mode: the job a ClickHouse deployment gets for free
    from background merges — run on a timer against the CDC target."""
    from .pipeline.compact import (
        CompactionPolicy,
        compact_cdc_table,
        execute_compaction,
        plan_table_compaction,
    )

    target = args.target_dir
    if args.table:
        target = os.path.join(target, f"{args.table}_cdc")
    if args.full:
        pks = [k.strip() for k in args.pks.split(",") if k.strip()]
        if not pks:
            print("--full compaction needs --pks", file=sys.stderr)
            return 2
        n = compact_cdc_table(
            spark, target, pks,
            keep_tombstones=not args.drop_tombstones,
        )
        print(f"optimize: {target} -> {n} rows", file=sys.stderr)
        return 0
    policy = CompactionPolicy(
        target_bytes=args.target_file_mb * 1024 * 1024
    )
    plan = plan_table_compaction(target, policy, only_triggered=True)
    result = execute_compaction(spark, plan)
    print(
        f"compact: {target}: {result.files_removed} files -> "
        f"{result.files_written} ({result.bins_compacted} bins, "
        f"{len(result.errors)} errors)",
        file=sys.stderr,
    )
    return 1 if result.errors else 0


def run_zorder(spark: SparkSession, args) -> int:
    """Maintenance mode: rewrite a parquet table range-clustered on
    the Morton key of --zorder-cols (OPTIMIZE ... ZORDER BY as a
    standalone job).  Row-count-verified before the directory swap."""
    import shutil

    from .pipeline.layout import write_zordered

    cols = [c.strip() for c in args.zorder_cols.split(",") if c.strip()]
    if not cols:
        print("zorder mode needs --zorder-cols", file=sys.stderr)
        return 2
    target = args.target_dir
    if args.table:
        target = os.path.join(target, f"{args.table}_cdc")
    df = spark.read.parquet(target)
    n_before = df.count()
    tmp = target.rstrip("/") + "__zorder_tmp"
    write_zordered(df, tmp, cols)
    n_after = spark.read.parquet(tmp).count()
    if n_after != n_before:
        print(f"zorder: row count changed ({n_before} -> {n_after}); "
              f"aborting swap", file=sys.stderr)
        shutil.rmtree(tmp, ignore_errors=True)
        return 1
    backup = target.rstrip("/") + "__pre_zorder"
    os.rename(target, backup)
    os.rename(tmp, target)
    shutil.rmtree(backup)
    print(f"zorder: {target} rewritten on {cols} ({n_after} rows)",
          file=sys.stderr)
    return 0


def run_curate(spark: SparkSession, args) -> int:
    """Batch corpus curation: quality -> language -> dedup ->
    decontaminate -> pack assignments over ``documents.parquet`` in
    --source-dir, written to --target-dir/curated_packs.  The same
    oracle-checked plan as the ``corpus_curation_v2`` registry query,
    exposed as a runnable job."""
    from .plans.registry import get_query

    out_dir = os.path.join(args.target_dir, "curated_packs")
    df = get_query("corpus_curation_v2").fn(spark, args.source_dir)
    df.write.mode("overwrite").parquet(out_dir)
    n = spark.read.parquet(out_dir).count()
    print(f"curate: {n} documents packed -> {out_dir}", file=sys.stderr)
    return 0


def main(argv: list[str] | None = None, spark: SparkSession | None = None) -> int:
    args = _build_parser().parse_args(argv)
    if args.mode in ("snapshot", "cdc", "curate") and not args.source_dir:
        print(f"{args.mode} mode needs --source-dir", file=sys.stderr)
        return 2
    if spark is None:
        from .session import get_spark

        spark = get_spark("spark-sync-engine")
    if args.mode == "snapshot":
        return run_snapshot(spark, args)
    if args.mode == "compact":
        return run_compact(spark, args)
    if args.mode == "zorder":
        return run_zorder(spark, args)
    if args.mode == "curate":
        return run_curate(spark, args)
    return run_cdc(spark, args)


if __name__ == "__main__":
    sys.exit(main())
