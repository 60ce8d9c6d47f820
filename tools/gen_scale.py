"""Deterministic 10x upsampler for the harness tables — sf1.0 scaling
evidence ONLY (r14 verdict item 4: the SF sweep must span one more
decade so the scan-heavy rows leave the fixed-overhead regime).

NOT driver data: the driver's sf dirs are read-only and stay the
correctness/bench source of truth.  This tool tiles each sf0.1 table
10x with a fixed key stride so referential integrity holds exactly
(o_custkey -> c_custkey, l_orderkey -> o_orderkey, l_partkey/
l_suppkey, all offset consistently; region/nation are fixed dimension
tables and pass through).  Embeddings get a tiny deterministic
per-copy perturbation (seeded N(0, 0.02) on copies 1..9) so the
upsampled corpus does not consist of identical-vector cliques, which
would distort pair-generation scaling; every other column is copied
verbatim, so value distributions are preserved per copy.

Usage: python tools/gen_scale.py [src_dir] [dst_dir] [copies]
Defaults: /root/testdata/sf0.1 -> /root/testdata_gen/sf1.0, 10.
"""
from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

STRIDE = 10_000_000

#: int64 key columns to offset per copy, per table (referential
#: integrity: the same stride applies to a key and every foreign
#: reference to it)
KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
PASSTHROUGH = ("region", "nation")


def upsample(src: str, dst: str, copies: int) -> None:
    os.makedirs(dst, exist_ok=True)
    for name in PASSTHROUGH:
        tbl = pq.read_table(os.path.join(src, f"{name}.parquet"))
        pq.write_table(tbl, os.path.join(dst, f"{name}.parquet"))
        print(name, tbl.num_rows, "(passthrough)")
    for name, keys in KEY_COLS.items():
        tbl = pq.read_table(os.path.join(src, f"{name}.parquet"))
        parts = []
        for i in range(copies):
            t = tbl
            for k in keys:
                col = t.column(k)
                t = t.set_column(
                    t.schema.get_field_index(k), k,
                    pa.compute.add(col, i * STRIDE),
                )
            if name == "embeddings" and i > 0:
                emb = t.column("embedding").combine_chunks()
                flat = emb.values.to_numpy(zero_copy_only=False)
                rng = np.random.RandomState(42_000 + i)
                flat = (
                    flat + rng.normal(0.0, 0.02, size=flat.shape)
                ).astype(np.float32)
                new = pa.ListArray.from_arrays(
                    emb.offsets, pa.array(flat, type=pa.float32())
                )
                t = t.set_column(
                    t.schema.get_field_index("embedding"),
                    t.schema.field("embedding"), new,
                )
            parts.append(t)
        out = pa.concat_tables(parts)
        pq.write_table(
            out, os.path.join(dst, f"{name}.parquet"),
            row_group_size=1_000_000,
        )
        print(name, out.num_rows)


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata_gen/sf1.0"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    upsample(src, dst, copies)
