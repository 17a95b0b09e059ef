"""Scale testdata up for out-of-gate benching: replicate an sf dir K times
with shifted keys so join/group cardinalities grow realistically (every
replica keeps the same per-key fan-outs; dimension tables stay fixed).

The driver's gate runs bench.py at sf0.1; this makes an sf~1 dir under
/tmp so shuffle-heavy plans can be measured at 10x without touching
/root/testdata. Usage::

    python tools/gen_scale.py [src_dir] [dst_dir] [k]
    SPARK_GRAFT_SF_DIR=/tmp/sf1 python bench.py
"""

from __future__ import annotations

import os
import sys

import duckdb

#: per-table key columns to shift by replica * stride (foreign keys shift
#: together so joins keep matching); dimension tables are copied once
SHIFT = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_suppkey", "l_partkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["region", "nation"]
STRIDE = 1_000_000_000


def scale(src: str, dst: str, k: int) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in DIMS:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO "
            f"'{dst}/{t}.parquet' (FORMAT PARQUET, COMPRESSION ZSTD)")
    for t, keys in SHIFT.items():
        src_file = f"{src}/{t}.parquet"
        if not os.path.exists(src_file):
            continue
        cols = [d[0] for d in
                con.execute(f"DESCRIBE SELECT * FROM '{src_file}'").fetchall()]
        selects = []
        for r in range(k):
            proj = ", ".join(
                f"({c} + {r * STRIDE}) AS {c}" if c in keys else c
                for c in cols)
            selects.append(f"SELECT {proj} FROM '{src_file}'")
        con.execute(
            f"COPY ({' UNION ALL '.join(selects)}) TO '{dst}/{t}.parquet' "
            f"(FORMAT PARQUET, COMPRESSION ZSTD)")
        n = con.execute(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows", file=sys.stderr)


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    scale(src, dst, k)
