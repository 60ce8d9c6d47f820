"""Local mini-driver: run every registered query on Spark AND its
DuckDB oracle, compare row count + sorted-value hash — the same gate
the real driver applies (see __spark_entry__.py docstring).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from mysql_clickhouse_sync_spark.plans.registry import all_queries
from mysql_clickhouse_sync_spark.session import get_spark
from mysql_clickhouse_sync_spark.sources.parquet import TABLES


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def value_hash(rows, colnames) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "|".join(_canon(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    failures = 0
    for name, q in sorted(all_queries().items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = q.fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        spark_s = time.time() - t0
        if q.oracle is None:
            print(f"ok?  {name}: rows={len(srows)} (rows-only, "
                  f"{spark_s:.1f}s)")
            if len(srows) == 0:
                print(f"      WARNING: empty result")
            continue
        try:
            res = con.execute(q.oracle)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if not problems:
            sh = value_hash(srows, scols)
            oh = value_hash(orows, ocols)
            if sh != oh:
                problems.append(f"hash spark={sh} oracle={oh}")
                # show first differing row for debugging
                so = sorted(
                    "|".join(_canon(r[i]) for i in sorted(range(len(scols)), key=lambda i: scols[i]))
                    for r in srows
                )
                oo = sorted(
                    "|".join(_canon(r[i]) for i in sorted(range(len(ocols)), key=lambda i: ocols[i]))
                    for r in orows
                )
                for a, b in zip(so, oo):
                    if a != b:
                        problems.append(f"  spark : {a}")
                        problems.append(f"  oracle: {b}")
                        break
        if problems:
            failures += 1
            print(f"FAIL {name}: " + "; ".join(problems[:3]))
            for p in problems[3:]:
                print(p)
        else:
            print(f"PASS {name}: rows={len(srows)} ({spark_s:.1f}s)")
    print(f"\n{'ALL PASS' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
