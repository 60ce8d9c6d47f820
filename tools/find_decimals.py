"""One-off audit: list every registered query whose Spark output schema
or DuckDB oracle output schema contains a DECIMAL column.

The driver's value hasher canonicalizes Decimal values with a trailing
zero at scale differently on the two sides (VERDICT.md round 1), so the
repo's rule is: no final output column may be DECIMAL on either side —
compute exactly in DECIMAL, render as DOUBLE.

Usage: python tools/find_decimals.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from mysql_clickhouse_sync_spark.plans.registry import all_queries
from mysql_clickhouse_sync_spark.session import get_spark
from mysql_clickhouse_sync_spark.sources.parquet import TABLES


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("decimal-audit")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    hits = 0
    errs = 0
    for name, q in sorted(all_queries().items()):
        spark_dec = []
        oracle_dec = []
        try:
            df = q.fn(spark, sf_dir)
            spark_dec = [c for c, t in df.dtypes if t.startswith("decimal")]
        except Exception as e:  # noqa: BLE001
            errs += 1
            print(f"ERR  {name}: spark {e}")
        if q.oracle is not None:
            try:
                desc = con.execute(f"DESCRIBE {q.oracle}").fetchall()
                oracle_dec = [r[0] for r in desc if "DECIMAL" in r[1].upper()]
            except Exception as e:  # noqa: BLE001
                errs += 1
                print(f"ERR  {name}: duckdb {e}")
        if spark_dec or oracle_dec:
            hits += 1
            print(f"DEC  {name}: spark={spark_dec} oracle={oracle_dec}")
    print(f"\n{hits} queries with decimal outputs, {errs} errors")
    # non-zero exit on any finding or failure so the audit can gate CI
    return 1 if (hits or errs) else 0


if __name__ == "__main__":
    raise SystemExit(main())
