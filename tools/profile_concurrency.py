"""Concurrency scaling test for the Arrow compaction task.

Runs N identical single-task merges in N processes, with and without
limiting Arrow's internal thread pools, to measure the oversubscription
collapse (each Spark python worker defaults to pa.cpu_count()=32 threads,
so 32 workers -> ~1024 threads).

Usage: python tools/profile_concurrency.py [rows_per_task] [nprocs...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def worker(args):
    paths, out_path, batch_rows, limit_threads = args
    import pyarrow as pa
    if limit_threads:
        pa.set_cpu_count(1)
        pa.set_io_thread_count(2)
    from tools.profile_compact import profile_task
    t0 = time.time()
    profile_task(paths, out_path, batch_rows)
    return time.time() - t0


def main():
    import multiprocessing as mp
    import tempfile

    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_500_000
    nprocs = [int(a) for a in sys.argv[2:]] or [16]
    from tools.profile_compact import gen
    tmp = tempfile.mkdtemp(prefix="prof_conc_")
    paths, total = gen(tmp, rows)
    for limit in (True, False):
        for nproc in nprocs:
            args = [(paths, os.path.join(tmp, f"o-{limit}-{i}.parquet"),
                     131072, limit) for i in range(nproc)]
            t0 = time.time()
            with mp.get_context("spawn").Pool(nproc) as pool:
                times = pool.map(worker, args)
            wall = time.time() - t0
            print(f"limit_threads={limit} nproc={nproc}: wall {wall:.1f}s, "
                  f"per-task avg {sum(times)/len(times):.1f}s, "
                  f"agg {total*nproc/wall:,.0f} rows/s", flush=True)
    import shutil
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
