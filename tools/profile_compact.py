"""Profile one Arrow compaction task (no Spark): where does the time go?

Generates the bench_compaction_large shape (11 interleaved sorted runs,
string key / long sort key / string payload), then times the phases of a
single merge task: parquet decode, merge bookkeeping, sort, write, sketch.

Usage: python tools/profile_compact.py [n_rows] [batch_rows]
"""
from __future__ import annotations

import os
import sys
import tempfile
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sleeper_spark import sketches as sk
from sleeper_spark.sorted_scan import _merge_leaf, _process_chunk


def gen(tmp, n_rows, n_files=11):
    per_file = n_rows // n_files
    paths = []
    for i in range(n_files):
        ints = pa.array(range(i, per_file * n_files, n_files), type=pa.int64())
        keys = pc.utf8_lpad(pc.cast(ints, pa.string()), 19, "0")
        t = pa.table({
            "key": keys,
            "ts": ints,
            "payload": pc.binary_join_element_wise(
                pa.array(["v"] * per_file), pc.cast(ints, pa.string()), "-"),
        })
        p = os.path.join(tmp, f"in-{i}.parquet")
        pq.write_table(t, p, compression="zstd", row_group_size=262144)
        sk.write_sidecar(p, sk.sketch_from_arrow_columns(
            {"key": t.column("key")}, t.num_rows, 1024))
        paths.append(p)
    return paths, per_file * n_files


def profile_task(paths, out_path, batch_rows, prune=None):
    desc = {
        "files": paths,
        "key_names": ["key", "ts"],
        "column_order": ["key", "ts", "payload"],
        "leaf_ranges": [],
        "query_regions": [],
        "filters": [],
        "aggs": [],
        "now_millis": 0,
        "batch_rows": batch_rows,
        "prune_range": prune,
    }
    ph = {"merge": 0.0, "process": 0.0, "write": 0.0, "sketch_buf": 0.0}
    writer = None
    n_out = 0
    d0 = sk.SortedColumnSketch(1024)
    ts_chunks = []
    t_all = time.perf_counter()
    gen_it = _merge_leaf(desc)
    while True:
        t0 = time.perf_counter()
        try:
            chunk = next(gen_it)
        except StopIteration:
            ph["merge"] += time.perf_counter() - t0
            break
        ph["merge"] += time.perf_counter() - t0
        t0 = time.perf_counter()
        out = _process_chunk(chunk, desc)
        ph["process"] += time.perf_counter() - t0
        if not out.num_rows:
            continue
        t0 = time.perf_counter()
        if writer is None:
            writer = pq.ParquetWriter(out_path, out.schema,
                                      compression="zstd",
                                      data_page_size=131072)
        writer.write_table(out)
        ph["write"] += time.perf_counter() - t0
        n_out += out.num_rows
        t0 = time.perf_counter()
        d0.update(out.column("key"))
        ts_chunks.append(out.column("ts").combine_chunks())
        ph["sketch_buf"] += time.perf_counter() - t0
    t0 = time.perf_counter()
    if writer:
        writer.close()
    ph["close"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    sketch = sk.sketch_from_arrow_columns(
        {"ts": pa.chunked_array(ts_chunks)} if ts_chunks else {}, n_out, 1024)
    sketch["fields"]["key"] = d0.field_dict()
    sk.write_sidecar(out_path, sketch)
    ph["sketch"] = time.perf_counter() - t0
    ph["TOTAL"] = time.perf_counter() - t_all
    return n_out, ph


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    batch_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 131072
    tmp = tempfile.mkdtemp(prefix="prof_compact_")
    t0 = time.perf_counter()
    paths, total = gen(tmp, n_rows)
    print(f"gen: {total} rows in {time.perf_counter()-t0:.1f}s")
    out_path = os.path.join(tmp, "out.parquet")
    n_out, ph = profile_task(paths, out_path, batch_rows)
    print(f"rows out: {n_out}, batch_rows={batch_rows}")
    for k, v in ph.items():
        print(f"  {k:10s} {v:7.2f}s")
    print(f"throughput: {n_out/ph['TOTAL']:,.0f} rows/s (single task)")
    import shutil
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
