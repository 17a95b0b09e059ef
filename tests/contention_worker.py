"""Multi-process writer for the state-store contention test.

Run as a subprocess (its own OS process, its own StateStore handle) by
``tests/test_core.py::TestMultiProcessContention``: loops ingest-style
ADD_FILES commits interleaved with compaction-style
ASSIGN_JOB_IDS + REPLACE_FILE_REFERENCES against ONE shared store
directory, racing the sibling workers. Mirrors the reference's
single-committer-equivalent guarantees achieved through optimistic
commits (docs/design.md:169-199): each commit takes the next sequence
number via an atomic ``os.link``; losers reload and re-validate.

No Spark: the contention under test is the TRANSACTION PROTOCOL, and the
data files only need to be real enough for GC/merge (pyarrow suffices —
the Spark engines sit above exactly these store calls).
"""

from __future__ import annotations

import json
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import types as T  # noqa: E402

from sleeper_spark.schema import Field, Schema  # noqa: E402
from sleeper_spark.statestore import (  # noqa: E402
    FileReference,
    StateStore,
    StateStoreException,
)


def schema() -> Schema:
    return Schema(row_key_fields=(Field("k", T.LongType()),),
                  value_fields=(Field("v", T.LongType()),))


def write_file(data_dir: str, name: str, lo: int, n: int) -> str:
    path = os.path.join(data_dir, name)
    ks = list(range(lo, lo + n))
    pq.write_table(
        pa.table({"k": pa.array(ks, pa.int64()),
                  "v": pa.array(ks, pa.int64())}), path)
    return path


def merge_files(data_dir: str, name: str, inputs: list[str]) -> tuple[str, int]:
    tables = [pq.read_table(fn) for fn in inputs]
    merged = pa.concat_tables(tables).sort_by("k")
    path = os.path.join(data_dir, name)
    pq.write_table(merged, path)
    return path, merged.num_rows


def delete_rows(data_dir: str, name: str, src: str,
                drop: int) -> tuple[str | None, int, int]:
    """Physical delete rewrite (deletes.py analog at protocol level):
    drop the first ``drop`` rows; None path when nothing survives."""
    t = pq.read_table(src)
    n_del = min(drop, t.num_rows)
    kept = t.slice(n_del)
    if kept.num_rows == 0:
        return None, 0, n_del
    path = os.path.join(data_dir, name)
    pq.write_table(kept, path)
    return path, kept.num_rows, n_del


def main(store_path: str, data_dir: str, worker: int, rounds: int,
         key_base: int | None = None) -> None:
    st = StateStore(store_path, schema())
    if key_base is None:
        key_base = worker * rounds * 100
    ingests = compactions = deletes = rows_deleted = lost_races = 0
    merges = rows_replaced = rows_merged_in = 0
    for i in range(rounds):
        # ingest: keys unique per (worker, round) so row accounting is exact
        fn = write_file(data_dir, f"w{worker}-i{i}.parquet",
                        key_base + i * 100, 100)
        assert st.add_files(
            [FileReference(fn, "root", 100,
                           only_contains_data_for_this_partition=True)],
            job_id=f"w{worker}-ingest-{i}")
        ingests += 1
        if i % 3 == 2:
            # compaction attempt over whatever is currently unassigned —
            # BOTH workers target the same partition, so job-assignment
            # races are the norm, not the exception
            st.reload()
            refs = [r for r in st.references_for_partition("root")
                    if r.job_id is None][:4]
            if len(refs) < 2:
                continue
            job = f"w{worker}-compact-{i}"
            try:
                st.assign_job_ids(job, refs)
            except StateStoreException:
                lost_races += 1      # sibling locked one of them first
                continue
            inputs = [r.filename for r in refs]
            out, n = merge_files(data_dir, f"w{worker}-c{i}.parquet", inputs)
            st.replace_file_references(
                "root", inputs,
                FileReference(out, "root", n,
                              only_contains_data_for_this_partition=True))
            compactions += 1
        if i % 5 == 4:
            # delete attempt: claim one unassigned file under a delete-*
            # job (the same protocol delete_where uses) and rewrite it
            # without its first rows; a fully-emptied file swaps to NO
            # output (allow_empty_outputs)
            st.reload()
            refs = [r for r in st.references_for_partition("root")
                    if r.job_id is None][:1]
            if not refs:
                continue
            job = f"w{worker}-delete-{i}"
            try:
                st.assign_job_ids(job, refs)
            except StateStoreException:
                lost_races += 1
                continue
            out, n_keep, n_del = delete_rows(
                data_dir, f"w{worker}-d{i}.parquet", refs[0].filename, 5)
            outs = [] if out is None else [FileReference(
                out, "root", n_keep,
                only_contains_data_for_this_partition=True)]
            st.replace_file_references_batch(
                [("root", [refs[0].filename], outs)],
                allow_empty_outputs=True)
            deletes += 1
            rows_deleted += n_del
        if i % 7 == 6:
            # MERGE attempt (merge.py analog at protocol level): claim
            # one unassigned file under a merge-* job, drop its first
            # rows (the "replaced key groups") AND add a fresh file of
            # brand-new unique keys — both halves in ONE MERGE_FILES
            # commit, raced and SIGKILL-able like everything else here
            st.reload()
            refs = [r for r in st.references_for_partition("root")
                    if r.job_id is None][:1]
            if not refs:
                continue
            job = f"merge-w{worker}-{i}"
            try:
                st.assign_job_ids(job, refs)
            except StateStoreException:
                lost_races += 1
                continue
            out, n_keep, n_rep = delete_rows(
                data_dir, f"w{worker}-mk{i}.parquet",
                refs[0].filename, 3)
            add_fn = write_file(
                data_dir, f"w{worker}-ma{i}.parquet",
                50_000_000 + key_base + i * 100, 7)
            outs = [] if out is None else [FileReference(
                out, "root", n_keep,
                only_contains_data_for_this_partition=True)]
            st.merge_files(
                [("root", [refs[0].filename], outs)],
                [FileReference(add_fn, "root", 7,
                               only_contains_data_for_this_partition=True)],
                job)
            merges += 1
            rows_replaced += n_rep
            rows_merged_in += 7
    print(json.dumps({"worker": worker, "ingests": ingests,
                      "compactions": compactions, "deletes": deletes,
                      "rows_deleted": rows_deleted,
                      "merges": merges, "rows_replaced": rows_replaced,
                      "rows_merged_in": rows_merged_in,
                      "lost_races": lost_races}))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4]),
         int(sys.argv[5]) if len(sys.argv) > 5 else None)
