"""Copy-on-write row deletion: ``SleeperTable.delete_where``.

The reference has no row delete — data leaves a table only via ageOff
filters (docs/usage/data-processing.md). A training-data pipeline needs
targeted removal (takedowns, contaminated documents, PII incidents), so
this extends the engine the way Delta/Iceberg do copy-on-write DELETE:

1. PLAN (driver, metadata only): of every live (file, partition)
   reference, keep only those that MAY hold a matching row — partition
   region overlap for key regions, sidecar footer min/max for value
   ranges (query.py:_file_may_match), and the first-row-key Bloom
   filter when every region is an exact point (bloom.py). At 10^5
   files a key-targeted delete rewrites a handful of files, not the
   table.
2. CLAIM: assign the candidate references to a ``delete-*`` job id via
   the ASSIGN_JOB_IDS transaction — the same claim compaction takes, so
   a concurrent compactor and a delete can never rewrite the same
   reference (the second claimant's commit fails and retries its plan).
3. REWRITE (executors): each candidate (file, partition) reference is
   rewritten 1:1 — keep rows inside the partition's region (a file
   split across child partitions holds rows of several references;
   each rewrite keeps only its own) that do NOT match the predicate.
   Filtering preserves the file's sort order, so every engine invariant
   (sorted leaves, merge-without-resort, sketch validity) survives.
   Sidecars (quantile sketch + min/max + bloom) are rebuilt in the same
   task.
4. COMMIT: ONE ``REPLACE_FILE_REFERENCES`` transaction swaps all
   rewritten references; fully-deleted references are simply removed
   (empty output allowed for deletes only). Old files enter the GC
   queue; time travel (``as_of``) still serves pre-delete states from
   the log; the change feed does not emit deletes (``added_rows_between``
   is append-only by contract — documented there).

Semantics: the predicate is (OR of key ``regions``) AND (AND of
``value_ranges``), matching the query model. Value-range deletes are
rejected on aggregation-configured tables — pre-collapse physical rows
are not what the user sees, so "delete where value matches" would be
ill-defined (key-region deletes remove whole key groups and stay
well-defined).
"""

from __future__ import annotations

import os
import uuid
from typing import TYPE_CHECKING

from sleeper_spark.query import (
    _file_may_match,
    bloom_points,
    file_may_contain_keys,
)
from sleeper_spark.ranges import Range, Region
from sleeper_spark.statestore import FileReference, StateStoreException

if TYPE_CHECKING:  # pragma: no cover
    from sleeper_spark.table import SleeperTable


def _mask_ranges(tbl, ranges) -> "object":
    """Conjunctive Range list -> numpy bool mask over an arrow table.
    Null comparisons count as non-matching (fill_null False)."""
    import numpy as np
    import pyarrow.compute as pc

    m = np.ones(tbl.num_rows, dtype=bool)
    for r in ranges:
        col = tbl.column(r.field)
        if r.min is not None:
            op = pc.greater_equal if r.min_inclusive else pc.greater
            m &= pc.fill_null(op(col, r.min), False).to_numpy(
                zero_copy_only=False)
        if r.max is not None:
            op = pc.less_equal if r.max_inclusive else pc.less
            m &= pc.fill_null(op(col, r.max), False).to_numpy(
                zero_copy_only=False)
    return m


def _match_mask(tbl, regions, value_ranges):
    """(OR regions) AND (AND value_ranges) as a numpy bool mask."""
    import numpy as np

    if regions:
        m = np.zeros(tbl.num_rows, dtype=bool)
        for reg in regions:
            m |= _mask_ranges(tbl, reg.ranges)
    else:
        m = np.ones(tbl.num_rows, dtype=bool)
    if value_ranges:
        m &= _mask_ranges(tbl, value_ranges)
    return m


def _rewrite_one(desc: dict) -> tuple:
    """Executor task: rewrite ONE (file, partition) reference without
    the matching rows. Returns (partition_id, in_path, out_path|None,
    rows_kept, rows_deleted, tomb_path|None).

    The DELETED rows (own & match — region-filtered per reference, so
    a file split across child partitions never tombstones a row twice)
    land as a tombstone parquet beside the rewrite: the observable
    record incremental consumers (materialized views, secondary
    indexes) apply instead of rebuilding from a snapshot."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sleeper_spark import bloom as bl
    from sleeper_spark import sketches

    tbl = pq.read_table(desc["in_path"])
    own = _mask_ranges(tbl, desc["partition_ranges"])
    match = _match_mask(tbl, desc["regions"], desc["value_ranges"])
    keep = own & ~match
    n_keep = int(keep.sum())
    n_del = int(own.sum()) - n_keep
    tomb_path = None
    if n_del:
        tomb_path = desc["tomb_path"]
        pq.write_table(tbl.filter(pa.array(own & match)), tomb_path,
                       compression=desc["compression"],
                       data_page_size=desc["page_bytes"])
    if n_keep == 0:
        return (desc["partition_id"], desc["in_path"], None, 0, n_del,
                tomb_path)
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
            n_keep, n_del, tomb_path)


#: same driver-threads-vs-executors threshold as sidecar building
_DRIVER_SIDE_BYTES = 256 * 1024 * 1024


def delete_where(table: "SleeperTable",
                 regions: list[Region] | None = None,
                 value_ranges: list[Range] | None = None) -> dict:
    if not regions and not value_ranges:
        raise ValueError(
            "delete_where requires regions and/or value_ranges; a "
            "whole-table delete must be explicit (clear_files)")
    if value_ranges and table.props.aggregations:
        raise ValueError(
            "value_ranges deletes are not allowed on an "
            "aggregation-configured table: physical pre-collapse rows "
            "are not the user-visible values, so the predicate would "
            "be ill-defined; delete by key regions instead")
    store = table.store
    store.check_writable()  # upfront, same error surface as ingest/merge
    store.refresh_if_stale(0)
    tree = store.tree
    assert tree is not None, "table not initialised"

    pts = (bloom_points(_QueryShim(regions), table.schema.row_key_names[0])
           if regions else None)
    candidates: list[FileReference] = []
    untouched = 0
    for ref in store.all_references():
        may = True
        if regions:
            preg = tree[ref.partition_id].region
            may = any(preg.overlaps(reg) for reg in regions)
            if may:
                # file-level: footer min/max on the key columns, then
                # bloom for all-point predicates
                may = any(_file_may_match(ref.filename, reg.ranges)
                          for reg in regions)
            if may and pts is not None:
                may = file_may_contain_keys(ref.filename, pts)
        if may and value_ranges:
            may = _file_may_match(ref.filename, value_ranges)
        if may:
            if ref.job_id is not None:
                raise StateStoreException(
                    f"{ref.filename} (partition {ref.partition_id}) is "
                    f"claimed by job {ref.job_id}; finish or abandon the "
                    "compaction before deleting from it")
            candidates.append(ref)
        else:
            untouched += 1
    if not candidates:
        return {"rows_deleted": 0, "files_rewritten": 0,
                "files_removed": 0, "files_untouched": untouched,
                "job_id": None}

    job_id = f"delete-{uuid.uuid4().hex[:12]}"
    store.assign_job_ids(job_id, candidates)

    out_dir = os.path.join(table.data_dir, job_id)
    os.makedirs(out_dir, exist_ok=True)
    descs = []
    for i, ref in enumerate(candidates):
        descs.append({
            "in_path": ref.filename,
            "out_path": os.path.join(out_dir, f"part-{i:05d}.parquet"),
            "tomb_path": os.path.join(out_dir,
                                      f"tombstone-{i:05d}.parquet"),
            "partition_id": ref.partition_id,
            "partition_ranges": list(tree[ref.partition_id].region.ranges),
            "regions": list(regions or []),
            "value_ranges": list(value_ranges or []),
            "compression": table.props.compression,
            "page_bytes": table.props.page_bytes,
            "key_names": list(table.schema.key_names),
            "sketch_k": table.props.sketch_size,
        })
    total = sum(os.path.getsize(d["in_path"]) for d in descs)
    if total < _DRIVER_SIDE_BYTES:
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=min(16, len(descs))) as ex:
            results = list(ex.map(_rewrite_one, descs))
    else:
        sc = table.spark.sparkContext
        slices = min(len(descs), 4 * sc.defaultParallelism)
        results = sc.parallelize(descs, slices).map(_rewrite_one).collect()

    replacements = []
    tombstones = []
    rows_deleted = files_rewritten = files_removed = 0
    now = None
    for pid, in_path, out_path, n_keep, n_del, tomb_path in results:
        rows_deleted += n_del
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
    store.replace_file_references_batch(
        replacements, allow_empty_outputs=True,
        job_id=job_id, tombstones=sorted(tombstones))
    return {"rows_deleted": rows_deleted,
            "files_rewritten": files_rewritten,
            "files_removed": files_removed,
            "files_untouched": untouched,
            "tombstone_files": len(tombstones),
            "job_id": job_id}


class _QueryShim:
    """Minimal duck-typed Query for bloom_points (regions only)."""

    def __init__(self, regions):
        self.regions = regions


def _rewrite_exact_one(desc: dict) -> tuple:
    """Executor task: rewrite ONE (file, partition) reference without
    the rows that EXACTLY match (null-safe, all columns) a bounded
    tombstone row set. Same return contract as :func:`_rewrite_one`.

    Matching is two-phase so the python-level exact comparison never
    touches the bulk of the file: a vectorized ``is_in`` prefilter on
    the first row-key column narrows to rows sharing a key with some
    tombstone (≈ the tombstone count for point deletes), then only
    those survivors are compared tuple-wise against the set. Both
    sides are cast to the tombstone table's Arrow schema first, so
    type-representation drift (e.g. timestamp unit) cannot cause a
    silent non-match. Float NaN normalizes to a sentinel on BOTH
    sides so NaN matches NaN — tombstones are the literal removed
    rows (delete_exact_rows ``match_nan`` contract)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from sleeper_spark import bloom as bl
    from sleeper_spark import sketches

    tomb = pa.ipc.open_stream(desc["rows_ipc"]).read_all()
    tbl = pq.read_table(desc["in_path"])
    own = _mask_ranges(tbl, desc["partition_ranges"])
    k0 = desc["key_names"][0]
    pre = pc.fill_null(pc.is_in(
        tbl.column(k0),
        value_set=tomb.column(k0).combine_chunks().unique()), False)
    cand_idx = np.nonzero(own & pre.to_numpy(zero_copy_only=False))[0]
    match = np.zeros(tbl.num_rows, dtype=bool)
    if len(cand_idx):
        taken = tbl.take(pa.array(cand_idx))
        # schema evolution: a pre-evolution file lacks later-added
        # value columns physically — they read as NULL table-wide, so
        # compare them as null columns instead of crashing mid-claim
        # (the update_where rewrite handles the same case)
        cols = []
        for name in tomb.column_names:
            if name in taken.column_names:
                cols.append(taken.column(name))
            else:
                cols.append(pa.nulls(taken.num_rows,
                                     tomb.schema.field(name).type))
        sub = pa.table(dict(zip(tomb.column_names, cols))) \
            .cast(tomb.schema)

        # tombstones are the LITERAL removed rows, so float NaN must
        # match NaN (delete_exact_rows match_nan contract): normalize
        # every NaN to one sentinel before the tuple compare — two
        # to_pylist() NaN objects are neither identical nor equal, so
        # raw tuples would silently never match
        import math as _math
        _NAN = ("__nan__",)  # unique, hashable, never a cell value

        def _nanorm(row):
            return tuple(
                _NAN if isinstance(v, float) and _math.isnan(v) else v
                for v in row)

        tomb_set = {_nanorm(r) for r in
                    zip(*(c.to_pylist() for c in tomb.columns))} \
            if tomb.num_rows else set()
        rows = zip(*(c.to_pylist() for c in sub.columns))
        hits = [i for i, row in zip(cand_idx, rows)
                if _nanorm(row) in tomb_set]
        match[hits] = True
    keep = own & ~match
    n_keep = int(keep.sum())
    n_del = int(own.sum()) - n_keep
    tomb_path = None
    if n_del:
        tomb_path = desc["tomb_path"]
        pq.write_table(tbl.filter(pa.array(own & match)), tomb_path,
                       compression=desc["compression"],
                       data_page_size=desc["page_bytes"])
    else:
        # nothing matched in this reference: signal a no-op so the
        # driver releases the claim instead of committing a pointless
        # 1:1 rewrite
        return (desc["partition_id"], desc["in_path"], desc["in_path"],
                n_keep, 0, None)
    if n_keep == 0:
        return (desc["partition_id"], desc["in_path"], None, 0, n_del,
                tomb_path)
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
            n_keep, n_del, tomb_path)


def delete_exact_rows(table: "SleeperTable", rows: "object",
                      cap: int = 1_000_000,
                      match_nan: bool = False) -> dict:
    """Copy-on-write deletion of an EXPLICIT row set: every table row
    that exactly equals (null-safe, all columns) some row of ``rows``
    (a Spark DataFrame in the table's schema) is removed — ALL copies
    of a matched row, mirroring predicate-delete multiplicity. This is
    the primitive CDC replication uses to apply a source
    ``delete_where``'s tombstones on a converged replica
    (replication.sync_cdc), where the original predicate is not
    recoverable from the log but the removed rows are.

    Not allowed on aggregation-configured tables: physical
    pre-collapse rows are not the user-visible values, so exact-row
    matching against a differently-compacted table is ill-defined —
    the CDC path applies key-exact ``delete_where`` there instead
    (source deletes on aggregation tables are key-region only, so
    whole key groups are the unit either way).

    ``cap`` bounds the driver-side row set (this is the point-delete
    tool; a mass delete should re-seed/rebuild instead). Rows whose
    float columns hold NaN are refused (NaN never equals itself, so
    under IEEE equality they could never match) UNLESS
    ``match_nan=True``, which matches NaN-as-equal — the CDC
    replication contract (replication.sync_cdc), where tombstones are
    the LITERAL removed rows and a source row holding NaN must still
    be removable from the replica. Plan/claim/rewrite/commit shape is
    delete_where's; references where nothing matched release their
    claim instead of rewriting 1:1."""
    import math

    import pyarrow as pa

    store = table.store
    store.check_writable()
    store.refresh_if_stale(0)
    tree = store.tree
    assert tree is not None, "table not initialised"
    if table.props.aggregations:
        raise ValueError(
            "delete_exact_rows is not allowed on an "
            "aggregation-configured table: physical pre-collapse rows "
            "are not the user-visible values; delete by key regions "
            "instead")

    need = [f.name for f in table.schema.all_fields()]
    missing = [c for c in need if c not in set(rows.columns)]
    if missing:
        raise ValueError(
            f"rows frame is missing table column(s) {missing}")
    tomb = rows.select(*need).limit(cap + 1).toArrow()
    if tomb.num_rows > cap:
        raise ValueError(
            f"more than {cap} rows to delete — a mass delete; re-seed "
            "or rebuild the table instead of point-deleting")
    # dedupe (multiplicity lives in the TABLE, not the request) and
    # refuse unmatchable NaN rows loudly rather than silently skipping
    tomb = tomb.group_by(tomb.column_names).aggregate([])
    if not match_nan:
        for col in tomb.columns:
            if pa.types.is_floating(col.type):
                vals = col.to_pylist()
                if any(v is not None and math.isnan(v) for v in vals):
                    raise ValueError(
                        "rows contain float NaN, which never equals "
                        "itself and can never match — filter those "
                        "rows or delete them by key regions, or pass "
                        "match_nan=True to match NaN-as-equal (the "
                        "CDC tombstone contract)")
    if tomb.num_rows == 0:
        return {"rows_deleted": 0, "files_rewritten": 0,
                "files_removed": 0,
                "files_untouched": sum(1 for _ in
                                       store.all_references()),
                "tombstone_files": 0, "job_id": None}

    key_names = [f.name for f in table.schema.row_key_fields]

    def norm(v):
        return bytes(v) if isinstance(v, bytearray) else v

    key_tuples = {tuple(norm(v) for v in kk) for kk in zip(
        *(tomb.column(k).to_pylist() for k in key_names))}
    for kk in key_tuples:
        if any(v is None for v in kk):
            raise ValueError("null row key in rows to delete — key "
                             "fields are non-nullable")
    leaf_ids = {tree.leaf_for_row(dict(zip(key_names, kk))).id
                for kk in key_tuples}
    pts = sorted({kk[0] for kk in key_tuples})
    by_ref: dict[tuple[str, str], FileReference] = {}
    for lid in leaf_ids:
        for ref in store.files_for_leaf_query(lid):
            by_ref[(ref.filename, ref.partition_id)] = ref
    n_total = sum(1 for _ in store.all_references())
    candidates = [r for r in by_ref.values()
                  if file_may_contain_keys(r.filename, pts)]
    if not candidates:
        return {"rows_deleted": 0, "files_rewritten": 0,
                "files_removed": 0, "files_untouched": n_total,
                "tombstone_files": 0, "job_id": None}
    for ref in candidates:
        if ref.job_id is not None:
            raise StateStoreException(
                f"{ref.filename} (partition {ref.partition_id}) is "
                f"claimed by job {ref.job_id}; finish or abandon it "
                "before deleting from it")

    job_id = f"delete-{uuid.uuid4().hex[:12]}"
    store.assign_job_ids(job_id, candidates)
    out_dir = os.path.join(table.data_dir, job_id)
    os.makedirs(out_dir, exist_ok=True)
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, tomb.schema) as w:
        w.write_table(tomb)
    rows_ipc = sink.getvalue().to_pybytes()
    descs = []
    for i, ref in enumerate(candidates):
        descs.append({
            "in_path": ref.filename,
            "out_path": os.path.join(out_dir, f"part-{i:05d}.parquet"),
            "tomb_path": os.path.join(out_dir,
                                      f"tombstone-{i:05d}.parquet"),
            "partition_id": ref.partition_id,
            "partition_ranges": list(
                tree[ref.partition_id].region.ranges),
            "rows_ipc": rows_ipc,
            "compression": table.props.compression,
            "page_bytes": table.props.page_bytes,
            "key_names": list(table.schema.key_names),
            "sketch_k": table.props.sketch_size,
        })
    total = sum(os.path.getsize(d["in_path"]) for d in descs)
    if total < _DRIVER_SIDE_BYTES:
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=min(16, len(descs))) as ex:
            results = list(ex.map(_rewrite_exact_one, descs))
    else:
        sc = table.spark.sparkContext
        slices = min(len(descs), 4 * sc.defaultParallelism)
        results = sc.parallelize(descs, slices) \
            .map(_rewrite_exact_one).collect()

    replacements = []
    tombstones = []
    rows_deleted = files_rewritten = files_removed = untouched_noop = 0
    for pid, in_path, out_path, n_keep, n_del, tomb_path in results:
        if n_del == 0:
            untouched_noop += 1  # claim released below, file untouched
            continue
        rows_deleted += n_del
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
    if replacements:
        store.replace_file_references_batch(
            replacements, allow_empty_outputs=True,
            job_id=job_id, tombstones=sorted(tombstones))
    if untouched_noop:
        # release the claims on references where nothing matched —
        # AFTER the replace commit so a crash in between leaves only
        # recoverable claims (unassign_job_ids is the documented
        # recovery), never a lost delete
        store.unassign_job_ids(job_id)
    return {"rows_deleted": rows_deleted,
            "files_rewritten": files_rewritten,
            "files_removed": files_removed,
            "files_untouched": n_total - files_rewritten - files_removed,
            "tombstone_files": len(tombstones),
            "job_id": job_id if replacements else None}
