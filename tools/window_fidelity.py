"""Driver-fidelity gate: replay the external driver's exact check.

The driver grades the FIRST 50 registry entries (DRIVER_WINDOW) on a
VANILLA SparkSession — default confs, 200 shuffle partitions, none of
``session.get_spark()``'s tuning.  ``tools/check_oracle.py`` runs on
the tuned session, so order-sensitivity bugs that only appear at
different partition counts would slip past it; this tool closes that
gap by running the window queries + DuckDB hash compare on the same
session shape the driver builds.

Usage: python tools/window_fidelity.py [sf_dir] [n_queries]
Exit 0 iff every oracle-checked window query hash-matches.
"""

from __future__ import annotations

import itertools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb

from check_oracle import value_hash
from mysql_clickhouse_sync_spark.plans.registry import all_queries
from mysql_clickhouse_sync_spark.sources.parquet import TABLES


def main() -> int:
    from pyspark.sql import SparkSession

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    spark = SparkSession.builder.master("local[4]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    failures = []
    qs = all_queries()
    for name in itertools.islice(qs, n_queries):
        q = qs[name]
        try:
            df = q.fn(spark, sf_dir)
            rows = df.collect()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: {exc}")
            continue
        if q.oracle is None:
            print(f"ok?  {name}: rows={len(rows)} (rows-only)")
            continue
        orc = con.execute(q.oracle)
        onames = [d[0] for d in orc.description]
        orows = orc.fetchall()
        ok = (
            len(rows) == len(orows)
            and sorted(df.columns) == sorted(onames)
            and value_hash([tuple(r) for r in rows], df.columns)
            == value_hash(orows, onames)
        )
        if not ok:
            failures.append(name)
        print(f"{'PASS' if ok else 'FAIL'} {name}: "
              f"rows={len(rows)}/{len(orows)}")
    print(f"\n{'ALL PASS' if not failures else f'FAILURES: {failures}'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
