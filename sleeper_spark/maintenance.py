"""LSM maintenance: partition splitting (O5), file-reference pre-splitting
(O4), garbage collection (O6).

These keep a table queryable at constant cost under continuous ingest —
the reference's core value proposition (docs/design.md:85-133,274-343).
All are metadata transactions plus (for splitting) one bounded Spark scan
of a single partition's files.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import SparkSession

from sleeper_spark.properties import TableProperties
from sleeper_spark.sketches import (
    all_sidecars_present,
    find_split_point,
    find_split_point_from_sketches,
    sidecar_path,
)
from sleeper_spark.statestore import StateStore


def split_partitions_if_needed(
    spark: SparkSession, store: StateStore, props: TableProperties
) -> list[str]:
    """Split every leaf whose row count exceeds the threshold at its median
    (O5: SplitPartition.java; FindPartitionSplitPoint.java:45-94).
    Returns ids of partitions that were split. Data files do NOT move —
    queries keep working because ancestors' files are always included
    (QueryPlanner.java:222-237); compaction pulls rows down later.
    """
    tree = store.tree
    assert tree is not None
    split: list[str] = []
    for leaf in list(tree.leaves()):
        refs = store.references_for_partition(leaf.id)
        total = sum(r.number_of_rows for r in refs)
        if total < props.partition_split_threshold or not refs:
            continue
        files = [r.filename for r in refs]
        if all_sidecars_present(files):
            # union the files' sketch sidecars — no data read at split
            # time (FindPartitionSplitPoint.java:45-94)
            found = find_split_point_from_sketches(
                store.schema, files, leaf.region)
        else:
            # files predating sidecars: bounded scan of this partition
            found = find_split_point(
                spark, store.schema, files, leaf.region)
        if found is None:
            continue
        dim, point = found
        left, right = tree.split(leaf.id, dim, point)
        store.split_partition(tree[leaf.id], left, right)
        # a commit retry may have reloaded the store (rebuilding the
        # tree object); keep following iterations validating against
        # the live one
        tree = store.tree
        split.append(leaf.id)
    return split


def split_file_references(store: StateStore) -> int:
    """Push file references in non-leaf partitions one level down the tree
    (O4: SplitFileReferencesTransaction; docs/design.md:293-299). Metadata
    only — no data movement. Returns number of refs moved."""
    tree = store.tree
    assert tree is not None
    moves = []
    for p in tree.all_partitions():
        if p.is_leaf:
            continue
        for ref in store.references_for_partition(p.id):
            if ref.job_id is not None:
                continue  # owned by a compaction in flight
            moves.append({
                "filename": ref.filename,
                "fromPartition": p.id,
                "toPartitions": list(p.child_ids),
            })
    if moves:
        store.split_file_references(moves)
    return len(moves)


def collect_garbage(store: StateStore, props: TableProperties,
                    now: float | None = None) -> list[str]:
    """Delete files with zero references, dereferenced longer ago than the
    delay that protects in-flight queries (O6: docs/design.md:331-343)."""
    # a read-only time-travel view must never delete live files: the
    # physical removal would happen BEFORE its commit raised
    store.check_writable()
    now = now if now is not None else time.time()
    candidates = store.gc_candidates(props.gc_delay_seconds, now=now)
    deleted = []
    for fn in candidates:
        for path in (fn, sidecar_path(fn)):
            try:
                os.remove(path)
            except FileNotFoundError:
                pass
        deleted.append(fn)
    if deleted:
        store.delete_files(deleted)
    return deleted


def verify_integrity(store: StateStore, schema,
                     data_dir: str | None = None) -> dict:
    """fsck for a table: cross-check the state store's claims against
    the physical files, using METADATA ONLY (manifest, Parquet footers,
    sidecar JSON — zero data reads at any table size).

    Checks, each feeding ``errors`` (state-vs-reality contradictions a
    query could return wrong/failed results from) or ``warnings``
    (recoverable hygiene findings):

    - every referenced file exists on disk                      [error]
    - footer row count == summed manifest reference counts for
      the file (skipped when any reference is count_approximate
      — split references estimate halves)                       [error]
    - the first row key's row-group stats are sorted and
      non-overlapping ascending — the file-is-sorted invariant
      every merge reader relies on, at row-group granularity    [error]
    - a leaf-bound file's dim-0 footer min/max lie inside its
      partition's range                                         [error]
    - sidecar JSON present and parseable for live files (they
      are built lazily, so absence is hygiene, corruption is
      real)                                        [warning / error]
    - gc-queued files still exist (missing = someone deleted
      outside GC)                                              [warning]
    - *.parquet on disk that is neither referenced nor
      gc-queued (crashed-writer leak; GC cannot see it)        [warning]
    - partition tree: every non-leaf's children exist, share the
      parent as parent_id, and their dim-split ranges abut at
      the split point                                           [error]

    Returns ``{"ok", "errors", "warnings", "files_checked",
    "orphans"}``. Reference analog: the status-report tooling
    (docs/usage/status.md); the checks mirror our own invariants.
    """
    import json as _json

    import pyarrow.parquet as pq

    from sleeper_spark.sketches import load_sidecar

    errors: list[str] = []
    warnings: list[str] = []
    key0 = schema.row_key_fields[0].name

    live = store.files  # {filename: {partition_id: FileReference}}
    for fn, by_part in sorted(live.items()):
        if not os.path.exists(fn):
            errors.append(f"missing data file: {fn}")
            continue
        refs = list(by_part.values())
        try:
            md = pq.ParquetFile(fn).metadata
        except Exception as exc:  # unreadable footer = corrupt file
            errors.append(f"unreadable parquet footer: {fn} ({exc})")
            continue
        if not any(r.count_approximate for r in refs):
            claimed = sum(r.number_of_rows for r in refs)
            if claimed != md.num_rows:
                errors.append(
                    f"row-count drift: {fn} footer={md.num_rows} "
                    f"manifest={claimed}")
        # sort invariant at row-group granularity on the first row key
        idx = {md.schema.column(i).name: i
               for i in range(len(md.schema))}
        if key0 in idx:
            bounds = []
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(idx[key0]).statistics
                if st is None or not st.has_min_max:
                    bounds = None
                    break
                bounds.append((st.min, st.max))
            if bounds:
                for (lo, hi) in bounds:
                    if lo > hi:
                        errors.append(
                            f"inverted row-group stats in {fn}")
                for (_, hi), (lo2, _) in zip(bounds, bounds[1:]):
                    if lo2 < hi:
                        errors.append(
                            f"unsorted file (overlapping row groups "
                            f"on {key0}): {fn}")
                        break
                # leaf containment: dim-0 bounds inside the partition
                for r in refs:
                    if not r.only_contains_data_for_this_partition:
                        continue
                    region = store.tree[r.partition_id].region
                    rng = next((x for x in region.ranges
                                if x.field == key0), None)
                    if rng is None:
                        continue
                    c = rng.canonicalise()
                    fmin = min(b[0] for b in bounds)
                    fmax = max(b[1] for b in bounds)
                    if ((c.min is not None and fmin < c.min)
                            or (c.max is not None and fmax >= c.max)):
                        errors.append(
                            f"file outside its leaf partition range: "
                            f"{fn} [{fmin}, {fmax}] vs partition "
                            f"{r.partition_id}")
        sp = sidecar_path(fn)
        if os.path.exists(sp):
            try:
                load_sidecar(fn)
            except (_json.JSONDecodeError, OSError) as exc:
                errors.append(f"corrupt sidecar: {sp} ({exc})")
        else:
            warnings.append(f"no sidecar yet (lazy, hygiene only): {fn}")

    for fn in sorted(store.gc_queue):
        if not os.path.exists(fn):
            warnings.append(
                f"gc-queued file already gone (deleted outside GC): {fn}")

    orphans: list[str] = []
    if data_dir and os.path.isdir(data_dir):
        known = set(live) | set(store.gc_queue)
        for root, _dirs, names in os.walk(data_dir):
            for n in names:
                if n.endswith(".parquet"):
                    p = os.path.join(root, n)
                    if p not in known:
                        orphans.append(p)
                        warnings.append(
                            f"orphan parquet (crashed writer? GC cannot "
                            f"see it): {p}")

    tree = store.tree
    for p in tree.all_partitions():
        if p.is_leaf:
            continue
        kids = [tree[c] for c in p.child_ids if c in tree]
        if len(kids) != len(p.child_ids):
            errors.append(f"partition {p.id} references missing children")
            continue
        for k in kids:
            if k.parent_id != p.id:
                errors.append(
                    f"partition {k.id} parent_id {k.parent_id!r} != {p.id}")
        if len(kids) == 2 and p.dimension >= 0:
            fname = schema.row_key_fields[p.dimension].name
            lo = next(x for x in kids[0].region.ranges if x.field == fname)
            hi = next(x for x in kids[1].region.ranges if x.field == fname)
            if lo.canonicalise().max != hi.canonicalise().min:
                errors.append(
                    f"children of {p.id} do not abut on {fname}: "
                    f"{lo.max!r} vs {hi.min!r}")

    return {"ok": not errors, "errors": errors, "warnings": warnings,
            "files_checked": len(live), "orphans": orphans}


def suggest_split_points(df, key_col: str, n_partitions: int,
                         method: str = "exact") -> list:
    """Split-point advisor for table onboarding: the N-1 key values
    that divide ``df`` into ``n_partitions`` near-equal leaves —
    what ``SleeperTable.create(split_points=...)`` wants so the very
    first bulk import lands pre-balanced instead of hammering one
    root leaf and splitting its way out. Reference analog:
    EstimateSplitPoints.java (clients/.../table/partition/
    EstimateSplitPoints.java:43-70, the estimateSplitPoints.sh
    utility behind docs/usage/tables.md:80-104 "Pre-split
    partitions") — it quantile-sketches a bounded row sample; this
    advisor computes the same ranks distributed over the full frame
    (exact) or via the mergeable sketch tier. Returns a deduplicated,
    sorted list (duplicate quantiles collapse on skewed keys — the
    resulting table simply has fewer, honest leaves; the reference
    dedupes identically, EstimateSplitPoints.java:71-73).

    ``method="exact"``: percentile_disc order statistics from the
    distributed cumulative histogram (stats.exact_quantiles) — one
    aggregation job, any orderable key type (strings included), cost
    O(distinct keys). ``method="sketch"``: the mergeable
    sketch-quantile tier (stats.sketch_quantiles) for near-unique
    DOUBLE keys where the exact histogram would be the column itself
    — rank-bounded estimates, summaries never leave the executors.
    """
    from sleeper_spark.functions import stats

    if n_partitions < 2:
        raise ValueError(
            f"n_partitions must be >= 2, got {n_partitions} (one "
            "partition needs no split points)")
    qs = [i / n_partitions for i in range(1, n_partitions)]
    if method == "exact":
        pts = stats.exact_quantiles(df.select(key_col), key_col, qs)
    elif method == "sketch":
        pts, _n = stats.sketch_quantiles(df, key_col, qs)
    else:
        raise ValueError(f"method must be 'exact' or 'sketch', "
                         f"got {method!r}")
    out, seen = [], set()
    for p in pts:
        if p is not None and p not in seen:
            seen.add(p)
            out.append(p)
    return out


#: default orphan min-age: 24 h, NOT the table's GC delay. The GC
#: delay bounds consumer lag on already-committed files; it says
#: nothing about how long a write job's staging phase may run, and
#: ingest/compaction/merge/delete/update all stage uncommitted parquet
#: under data_dir before their commit — reclaiming those mid-write
#: corrupts the later commit. 24 h is the Delta-vacuum-style retention
#: floor: far above any sane single write job, still tight enough to
#: reclaim genuine crash leaks daily.
ORPHAN_MIN_AGE_DEFAULT = 86_400.0


def vacuum_orphans(store: StateStore, props: TableProperties,
                   data_dir: str,
                   min_age_seconds: float | None = None) -> dict:
    """Reclaim crashed-writer leaks: delete data-dir parquet (and its
    sidecars) that is neither live-referenced nor GC-queued — the
    bytes a writer that died between its data write and its commit
    left behind, which the GC (O6) structurally cannot see because
    they never entered any transaction. fsck (verify_integrity) only
    REPORTS these; this is the reclaim step.

    Safety rails, because "unreferenced right now" is not "garbage":
    an IN-FLIGHT writer's files are unreferenced until its commit —
    only files older (mtime) than ``min_age_seconds`` (default:
    :data:`ORPHAN_MIN_AGE_DEFAULT`, 24 h, or the table's GC delay if
    that is larger) are touched, so set it above your longest
    conceivable write job. Files staged under a directory named by a
    CURRENTLY-CLAIMED job id (a compaction/delete/update/merge whose
    claim is live in the state store) are skipped outright regardless
    of age — that job is provably still in flight. The state is
    refreshed to head immediately before the scan, shrinking the
    stale-view window to scan time. Time travel is unaffected:
    historical files live in the GC queue, which is part of the known
    set. Returns ``{"deleted", "kept_young", "bytes_reclaimed"}`` with
    the deleted paths for the audit log."""
    import time as _time

    store.refresh_if_stale(0)
    if min_age_seconds is None:
        min_age_seconds = max(props.gc_delay_seconds,
                              ORPHAN_MIN_AGE_DEFAULT)
    known = {r.filename for r in store.all_references()} \
        | set(store.gc_queue)
    claimed_dirs = {
        os.path.join(data_dir, r.job_id)
        for r in store.all_references() if r.job_id is not None}
    now = _time.time()
    deleted, kept_young = [], []
    bytes_reclaimed = 0
    for root, _dirs, names in os.walk(data_dir):
        if any(root == d or root.startswith(d + os.sep)
               for d in claimed_dirs):
            continue  # a live job's staging dir — in flight, not leaked
        for n in sorted(names):
            if not n.endswith(".parquet"):
                continue
            p = os.path.join(root, n)
            if p in known:
                continue
            try:
                st = os.stat(p)
            except OSError:
                continue  # raced with its own writer/cleaner
            if now - st.st_mtime < min_age_seconds:
                kept_young.append(p)
                continue
            try:
                os.remove(p)
            except OSError:
                continue
            bytes_reclaimed += st.st_size
            deleted.append(p)
            sp = sidecar_path(p)  # module-level import (GC uses it too)
            if os.path.exists(sp):
                try:
                    bytes_reclaimed += os.path.getsize(sp)
                    os.remove(sp)
                except OSError:
                    pass
    return {"deleted": deleted, "kept_young": kept_young,
            "bytes_reclaimed": bytes_reclaimed}
