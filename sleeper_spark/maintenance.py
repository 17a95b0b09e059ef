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
