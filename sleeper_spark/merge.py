"""Atomic MERGE (full-row upsert by row key): ``SleeperTable.merge_upsert``.

The warehouse MERGE INTO shape — "replace the target's rows for these
keys with the source's rows, insert the keys the target doesn't have"
— as ONE transaction. The reference upserts only through its
aggregation algebra (sum/min/max/map_* collapse at compaction); this
engine also has last-writer-wins via ``max_by`` (the LSM-native answer:
zero write amplification, collapse deferred to compaction — prefer it
for high-rate streams). ``merge_upsert`` is the copy-on-write answer
for when the table must hold exactly one physical version: CDC batch
application, dimension-table maintenance, GDPR-style rectification.

Why a new transaction type: composing ``delete_where`` + ``ingest``
leaves a window where the old rows are gone and the new ones are not
yet visible (and a crash inside it loses data). ``MERGE_FILES``
(statestore.py) applies the REPLACE component (matched key groups
dropped from candidate files, old rows tombstoned) and the ADD
component (the source batch as ordinary sorted per-leaf files) as one
state change — a reader sees wholly-before or wholly-after, never
between; a crash anywhere before the commit leaves the old version
fully readable (the written files are unreferenced bytes).

Semantics: matching is by the table's ROW KEY fields; a matched key's
ENTIRE group (all sort-key rows) is replaced by the source's rows for
that key — well-defined on duplicate-keyed and sort-keyed tables where
a per-row UPDATE would not be. Aggregation-configured tables are
allowed (key-group replacement is the same key-region semantics as
key-region deletes; the source rows simply become the group's new
physical rows and collapse like any ingest).

Plan shape (driver metadata only, like delete_where): the source's
distinct row keys (bounded by ``cap`` — MERGE is for CDC-sized
batches; a bulk restatement should ingest + last-writer-wins compact
instead) descend the partition tree to the leaves they hit; candidate
(file, partition) references come from those leaves' lookup paths and
are Bloom-pruned with the key set; candidates are claimed under a
``merge-*`` job id (the same ASSIGN_JOB_IDS contention protocol as
compaction/delete/update, so nothing ever rewrites a reference twice).
Rewrites preserve file sort order and rebuild sidecars; the insert
files come from the standard ingest writer (``write_sorted_files``),
commit-free.

Incremental consumers: the commit carries tombstones (old rows of
replaced key groups — the deletion feed) and its addFiles flow through
``added_rows_between``; MaterializedView applies a merge seq as
delete-old + ingest-new. Append-only replication (``replication.sync``)
REFUSES a window holding a MERGE commit (shipping the insert half
while the replaced rows survive would duplicate key versions);
``replication.sync_cdc`` converges through it by replaying the commit
as a replica-side merge of its insert rows (replication.py module
doc).
"""

from __future__ import annotations

import os
import uuid
from typing import TYPE_CHECKING

from sleeper_spark.deletes import _DRIVER_SIDE_BYTES, _mask_ranges
from sleeper_spark.query import file_may_contain_keys
from sleeper_spark.statestore import FileReference, StateStoreException

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame

    from sleeper_spark.table import SleeperTable


def _keys_mask(tbl, key_names: list[str], keys: list[tuple]):
    """numpy bool mask: rows whose full row-key tuple is in ``keys``.
    Vectorized via pandas (Multi)Index.isin — C-speed set membership,
    never a Python loop over rows."""
    import pandas as pd

    def norm(s):
        # arrow->pandas yields bytes (never bytearray) for binary and
        # native dtypes for numerics — the lambda normalization only
        # matters for object columns, so numeric key columns skip the
        # per-value Python call entirely
        if s.dtype != object:
            return s
        return s.map(lambda v: bytes(v) if isinstance(v, bytearray)
                     else v)

    cols = [norm(tbl.column(k).to_pandas()) for k in key_names]
    if len(cols) == 1:
        return cols[0].isin({k[0] for k in keys}).to_numpy()
    return pd.MultiIndex.from_arrays(cols).isin(keys)


def _rewrite_merge_one(desc: dict) -> tuple:
    """Executor task: rewrite ONE (file, partition) reference without
    the matched key groups. Returns (partition_id, in_path,
    kept_path|None, n_keep, n_dropped, tomb_path|None)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sleeper_spark import bloom as bl
    from sleeper_spark import sketches

    tbl = pq.read_table(desc["in_path"])
    own = _mask_ranges(tbl, desc["partition_ranges"])
    match = own & _keys_mask(tbl, desc["key_names_row"], desc["keys"])
    keep = own & ~match
    n_keep, n_drop = int(keep.sum()), int(match.sum())
    tomb_path = None
    if n_drop:
        tomb_path = desc["tomb_path"]
        pq.write_table(tbl.filter(pa.array(match)), tomb_path,
                       compression=desc["compression"],
                       data_page_size=desc["page_bytes"])
    if n_keep == 0:
        return (desc["partition_id"], desc["in_path"], None, 0,
                n_drop, tomb_path)
    out = tbl.filter(pa.array(keep))
    pq.write_table(out, desc["out_path"],
                   compression=desc["compression"],
                   data_page_size=desc["page_bytes"])
    keys = desc["key_names"]
    sk = sketches.sketch_from_arrow_columns(
        {k: out.column(k) for k in keys}, n_keep, desc["sketch_k"])
    try:
        b = bl.build_bloom(keys[0], out.column(keys[0]), n_keep)
        if b is not None:
            sk["bloom"] = b
    except TypeError:
        pass
    sketches.write_sidecar(desc["out_path"], sk)
    return (desc["partition_id"], desc["in_path"], desc["out_path"],
            n_keep, n_drop, tomb_path)


def merge_upsert(table: "SleeperTable", source_df: "DataFrame",
                 cap: int = 100_000, job_id: str | None = None) -> dict:
    from sleeper_spark.ingest import write_sorted_files

    schema = table.schema
    src_cols = set(source_df.columns)
    need = [f.name for f in schema.all_fields()]
    missing = [c for c in need if c not in src_cols]
    if missing:
        raise ValueError(
            f"merge source is missing table column(s) {missing}")
    source_df = source_df.select(*need)
    key_names = [f.name for f in schema.row_key_fields]

    store = table.store
    store.check_writable()
    store.refresh_if_stale(0)
    tree = store.tree
    assert tree is not None, "table not initialised"

    if job_id is not None and not job_id.startswith("merge-"):
        # the claim-barrier and commit classification key off the
        # prefix; an unprefixed claim would look like a compaction's
        raise ValueError(
            f"merge job ids must start with 'merge-', got {job_id!r}")
    # caller-supplied job ids make the WHOLE merge idempotent (the
    # streaming micro-batch replay contract, same as ingest): a
    # re-delivered batch whose commit already landed is skipped before
    # any work, and one that crashed mid-flight re-claims its own
    # candidates and recommits under the same id
    # Every exit returns the SAME key set so callers aggregating merge
    # stats never branch on shape. files_untouched uniformly means
    # "references present at call time that THIS call did not rewrite
    # or remove" — for a replayed or empty merge that is all of them
    # (the original run's result already reported its own candidates).
    def _noop_result(job: str | None, replayed: bool) -> dict:
        return {"rows_inserted": 0, "rows_replaced": 0,
                "files_rewritten": 0, "files_removed": 0,
                "files_untouched":
                sum(1 for _ in store.all_references()),
                "tombstone_files": 0, "job_id": job,
                "replayed": replayed}

    if job_id is not None and job_id in store.ingest_jobs_seen:
        return _noop_result(job_id, replayed=True)

    head = (source_df.select(*key_names).distinct()
            .limit(cap + 1).collect())
    if not head:
        return _noop_result(job_id, replayed=False)
    if len(head) > cap:
        raise ValueError(
            f"merge source has more than {cap} distinct row keys — "
            "MERGE is the CDC-batch tool; bulk restatements should "
            "ingest and collapse with last-writer-wins aggregation "
            "(max_by) instead")
    for row in head:
        for k in key_names:
            if row[k] is None:
                raise ValueError(
                    "null row key in merge source — key fields are "
                    "non-nullable; filter or quarantine first")

    def norm(v):
        return bytes(v) if isinstance(v, bytearray) else v

    keys = [tuple(norm(row[k]) for k in key_names) for row in head]
    leaf_ids = {tree.leaf_for_row(dict(zip(key_names, kk))).id
                for kk in keys}
    by_ref: dict[tuple[str, str], FileReference] = {}
    for lid in leaf_ids:
        for ref in store.files_for_leaf_query(lid):
            by_ref[(ref.filename, ref.partition_id)] = ref
    pts = [kk[0] for kk in keys]
    candidates = [r for r in by_ref.values()
                  if file_may_contain_keys(r.filename, pts)]
    n_total_refs = sum(1 for _ in store.all_references())
    if job_id is None:
        job_id = f"merge-{uuid.uuid4().hex[:12]}"
    for ref in candidates:
        if ref.job_id is not None and ref.job_id != job_id:
            raise StateStoreException(
                f"{ref.filename} (partition {ref.partition_id}) is "
                f"claimed by job {ref.job_id}; finish or abandon it "
                "before merging")
    # refs already carrying OUR job id are a crashed attempt's claims:
    # re-claim only the rest and carry on (the retry owns them)
    to_claim = [r for r in candidates if r.job_id != job_id]
    if to_claim:
        store.assign_job_ids(job_id, to_claim)

    out_dir = os.path.join(table.data_dir, job_id)
    # a crashed attempt under the SAME (caller-supplied) job id left
    # uncommitted bytes here — the ingest_jobs_seen pre-check above
    # proves nothing references them, so the retry starts clean
    import shutil
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    # insert files FIRST (commit-free): on any failure below they are
    # unreferenced bytes, not a state change
    add_refs = write_sorted_files(
        source_df, tree, store, os.path.join(out_dir, "inserts"),
        table.props)
    rows_inserted = sum(r.number_of_rows for r in add_refs)

    descs = []
    for i, ref in enumerate(candidates):
        descs.append({
            "in_path": ref.filename,
            "out_path": os.path.join(out_dir, f"kept-{i:05d}.parquet"),
            "tomb_path": os.path.join(out_dir,
                                      f"tombstone-{i:05d}.parquet"),
            "partition_id": ref.partition_id,
            "partition_ranges": list(
                tree[ref.partition_id].region.ranges),
            "keys": keys,
            "key_names_row": key_names,
            "compression": table.props.compression,
            "page_bytes": table.props.page_bytes,
            "key_names": list(schema.key_names),
            "sketch_k": table.props.sketch_size,
        })
    if descs:
        total = sum(os.path.getsize(d["in_path"]) for d in descs)
        if total < _DRIVER_SIDE_BYTES:
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(
                    max_workers=min(16, len(descs))) as ex:
                results = list(ex.map(_rewrite_merge_one, descs))
        else:
            sc = table.spark.sparkContext
            slices = min(len(descs), 4 * sc.defaultParallelism)
            results = sc.parallelize(descs, slices) \
                .map(_rewrite_merge_one).collect()
    else:
        results = []

    replacements = []
    tombstones: list[str] = []
    rows_replaced = files_rewritten = files_removed = 0
    for pid, in_path, out_path, n_keep, n_drop, tomb_path in results:
        rows_replaced += n_drop
        if tomb_path is not None:
            tombstones.append(tomb_path)
        if out_path is None:
            files_removed += 1
            replacements.append((pid, [in_path], []))
        else:
            files_rewritten += 1
            replacements.append((pid, [in_path], [FileReference(
                filename=out_path, partition_id=pid,
                number_of_rows=n_keep,
                only_contains_data_for_this_partition=True)]))
    store.merge_files(replacements, add_refs, job_id,
                      tombstones=sorted(tombstones))
    return {"rows_inserted": rows_inserted,
            "rows_replaced": rows_replaced,
            "files_rewritten": files_rewritten,
            "files_removed": files_removed,
            "files_untouched": n_total_refs - len(candidates),
            "tombstone_files": len(tombstones),
            "job_id": job_id,
            "replayed": False}
