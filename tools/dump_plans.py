"""Dump .explain('formatted') for named queries into plans/<outdir>/
as <query>_<suffix>.txt — the before/after plan evidence the
optimization rounds commit (judge checks plan claims against these).

Usage:
  python tools/dump_plans.py <outdir> <suffix> <sf_dir> <query> [...]
Run from the tree whose plans you want (a worktree of the old commit
for *_before.txt, the working tree for *_after.txt); outdir is always
resolved against THIS repo's plans/ dir via PLANS_OUT env or default.
"""
from __future__ import annotations

import io
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def main() -> None:
    outdir, suffix, sf_dir, *names = sys.argv[1:]
    out_root = os.environ.get(
        "PLANS_OUT", os.path.join(_ROOT, "plans", outdir)
    )
    os.makedirs(out_root, exist_ok=True)
    from mysql_clickhouse_sync_spark.plans.registry import all_queries
    from mysql_clickhouse_sync_spark.session import get_spark

    spark = get_spark(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    qs = all_queries()
    for name in names:
        df = qs[name].fn(spark, sf_dir)
        buf = io.StringIO()
        stdout, sys.stdout = sys.stdout, buf
        try:
            df.explain("formatted")
        finally:
            sys.stdout = stdout
        path = os.path.join(out_root, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print("wrote", path)


if __name__ == "__main__":
    main()
