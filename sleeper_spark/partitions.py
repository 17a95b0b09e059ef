"""Partition tree: binary range-partitioning of the row-key space.

Reference semantics (docs/design.md:85-110; core/partition/Partition.java,
PartitionTree.java, PartitionsFromSplitPoints.java:44):
- Partitions form a binary tree grown by splitting, root covering the whole
  key space. Each partition has a Region (one Range per row-key dimension,
  closed-left/open-right, null = unbounded).
- A split divides one leaf on a single ``dimension`` (row-key index) at a
  split point: left gets [min, split), right gets [split, max).
- Initial trees can be built from a list of split points on dimension 0.

Spark mapping: the tree lives driver-side in the state store; ingest
assigns each row to a leaf (a range lookup compiled to a CASE expression),
queries prune leaves by region overlap and hand Spark an explicit file
list. This replaces the reference's DynamoDB/S3 partition metadata with
plain Python + the transaction log.
"""

from __future__ import annotations

import bisect
import uuid
from dataclasses import dataclass, replace
from typing import Any, Iterable

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

from sleeper_spark.ranges import Range, Region
from sleeper_spark.schema import Schema


@dataclass(frozen=True)
class Partition:
    """One node of the partition tree (Partition.java:38-43)."""

    id: str
    region: Region
    parent_id: str | None = None
    child_ids: tuple[str, ...] = ()
    dimension: int = -1  # split dimension if not leaf

    @property
    def is_leaf(self) -> bool:
        return not self.child_ids

    def to_json(self) -> dict[str, Any]:
        return {
            "id": self.id,
            "region": self.region.to_json(),
            "parentId": self.parent_id,
            "childIds": list(self.child_ids),
            "dimension": self.dimension,
        }

    @staticmethod
    def from_json(d: dict[str, Any], schema: Schema | None = None) -> "Partition":
        return Partition(
            d["id"],
            Region.from_json(d["region"], schema),
            d.get("parentId"),
            tuple(d.get("childIds", [])),
            d.get("dimension", -1),
        )


class PartitionTree:
    """In-memory partition tree (PartitionTree.java)."""

    def __init__(self, schema: Schema, partitions: Iterable[Partition]):
        self.schema = schema
        self._by_id: dict[str, Partition] = {p.id: p for p in partitions}
        roots = [p for p in self._by_id.values() if p.parent_id is None]
        if len(roots) != 1:
            raise ValueError(f"partition tree must have exactly one root, got {len(roots)}")
        self.root_id = roots[0].id

    # --- construction ----------------------------------------------------
    @staticmethod
    def initial(schema: Schema, split_points: list[Any] | None = None) -> "PartitionTree":
        """Root-only tree, or a tree pre-split on dimension 0 at the given
        sorted split points (PartitionsFromSplitPoints.java:44)."""
        dim0 = schema.row_key_fields[0].name
        if split_points is not None:
            uniq = sorted(set(split_points))
            if len(uniq) != len(split_points):
                # catch it here with a clear message — a duplicate point
                # otherwise surfaces as an obscure 'not strictly inside'
                # error deep in the recursive build
                raise ValueError(
                    f"duplicate split points: {sorted(split_points)}")
            split_points = uniq
        full = Region(
            tuple(Range(f.name, None, None) for f in schema.row_key_fields)
        )
        root = Partition("root", full)
        tree = PartitionTree(schema, [root])

        # split middle-first so the tree is balanced: a sorted insertion
        # order would build a depth-n right chain, making per-row descent
        # and tree walks O(n) instead of O(log n)
        def build(points: list[Any]) -> None:
            if not points:
                return
            mid = len(points) // 2
            sp = points[mid]
            leaf = tree.leaf_for_value(dim0, sp)
            tree.split(leaf.id, 0, sp)
            build(points[:mid])
            build(points[mid + 1:])

        build(sorted(split_points or []))
        return tree

    def split(self, partition_id: str, dimension: int, split_point: Any) -> tuple[Partition, Partition]:
        """Split a leaf at ``split_point`` on ``dimension``; mutates the tree
        and returns (left, right). Mirrors SplitPartitionTransaction."""
        p = self._by_id[partition_id]
        if not p.is_leaf:
            raise ValueError(f"partition {partition_id} is not a leaf")
        field = self.schema.row_key_fields[dimension].name
        rng = p.region.range_for(field)
        assert rng is not None
        if not rng.contains(split_point) or (rng.min is not None and split_point <= rng.min):
            raise ValueError(
                f"split point {split_point!r} not strictly inside {field} range "
                f"[{rng.min!r}, {rng.max!r})"
            )
        left_rng = Range(field, rng.min, split_point)
        right_rng = Range(field, split_point, rng.max)
        # short unique child ids (the reference uses UUIDs,
        # PartitionFactory.java): appending L/R per generation would grow
        # ids — and the partitionBy directory names built from them —
        # linearly with tree depth, breaking the 255-byte path component
        # limit around depth 250
        left = Partition(
            f"p-{uuid.uuid4().hex[:12]}",
            Region(tuple(left_rng if r.field == field else r for r in p.region.ranges)),
            parent_id=p.id,
        )
        right = Partition(
            f"p-{uuid.uuid4().hex[:12]}",
            Region(tuple(right_rng if r.field == field else r for r in p.region.ranges)),
            parent_id=p.id,
        )
        self._by_id[p.id] = replace(p, child_ids=(left.id, right.id), dimension=dimension)
        self._by_id[left.id] = left
        self._by_id[right.id] = right
        return left, right

    def apply_split(self, parent: Partition, left: Partition, right: Partition) -> None:
        """Apply an externally-constructed split (replaying a transaction)."""
        self._by_id[parent.id] = parent
        self._by_id[left.id] = left
        self._by_id[right.id] = right

    def put(self, partition: Partition) -> None:
        """Insert or replace one partition (EXTEND_PARTITION_TREE replay)."""
        self._by_id[partition.id] = partition

    # --- lookups ---------------------------------------------------------
    def __getitem__(self, pid: str) -> Partition:
        return self._by_id[pid]

    def __contains__(self, pid: str) -> bool:
        return pid in self._by_id

    def all_partitions(self) -> list[Partition]:
        return list(self._by_id.values())

    def leaves(self) -> list[Partition]:
        return [p for p in self._by_id.values() if p.is_leaf]

    def ancestors(self, pid: str) -> list[Partition]:
        """Ancestors from parent to root (PartitionTree.java:getAllAncestors)."""
        out = []
        cur = self._by_id[pid]
        while cur.parent_id is not None:
            cur = self._by_id[cur.parent_id]
            out.append(cur)
        return out

    def leaf_for_row(self, row: dict[str, Any]) -> Partition:
        """Descend the tree to the leaf containing a row's key."""
        cur = self._by_id[self.root_id]
        while not cur.is_leaf:
            nxt = None
            for cid in cur.child_ids:
                child = self._by_id[cid]
                if child.region.contains_point(row):
                    nxt = child
                    break
            assert nxt is not None, f"no child of {cur.id} contains {row}"
            cur = nxt
        return cur

    def leaf_for_value(self, field: str, value: Any) -> Partition:
        return self.leaf_for_row({f.name: value if f.name == field else _min_of(f.dtype)
                                  for f in self.schema.row_key_fields})

    def leaves_overlapping(self, regions: list[Region]) -> list[Partition]:
        """Partition pruning: leaves whose region overlaps any query region
        (QueryPlanner.java:206-220)."""
        return [
            p for p in self.leaves()
            if any(reg.overlaps(p.region) for reg in regions)
        ]

    # --- Spark-side partition assignment ---------------------------------

    #: above this leaf count the CASE chain would blow the 64KB codegen
    #: method limit and cost O(n_leaves) comparisons per row; switch to
    #: the O(log n) vectorized search
    CASE_CHAIN_MAX_LEAVES = 128

    def leaf_id_column(self) -> Column:
        """Expression computing the leaf-partition id for each row.

        Two strategies (mirroring the reference's bulk-import partition
        assignment, BulkImportJobDataframeDriver.java:55-93, which binary
        -searches a broadcast split-point list in its partitioner):

        - <= CASE_CHAIN_MAX_LEAVES leaves: nested CASE over leaf regions —
          pure JVM Column expression, folded into one codegen'd chain.
        - larger trees: an Arrow-batched vectorized search. The WHEN
          chain at 10^4-10^5 leaves breaks whole-stage codegen (64KB
          method limit -> interpreted mode) and is O(n_leaves) per row.
          The vectorized form is ``np.searchsorted`` over the broadcast
          sorted dimension-0 bounds (O(log n) per row, the common case:
          every split on dimension 0), or a stack-based vectorized tree
          descent for multi-dimension trees. One Arrow pass per ingest
          batch; at >128 leaves that beats an interpreted 10^4-branch
          CASE by orders of magnitude.
        """
        leaves = self.leaves()
        if len(leaves) <= self.CASE_CHAIN_MAX_LEAVES:
            expr: Column | None = None
            # WHEN region-contains THEN id, most leaves first; last is otherwise.
            for p in leaves[:-1]:
                cond = _region_contains_col(p.region)
                expr = F.when(cond, F.lit(p.id)) if expr is None else expr.when(cond, F.lit(p.id))
            if expr is None:
                return F.lit(leaves[0].id)
            return expr.otherwise(F.lit(leaves[-1].id))
        return self._leaf_id_search_column()

    def _leaf_id_search_column(self) -> Column:
        from pyspark.sql.functions import pandas_udf

        key_fields = [f.name for f in self.schema.row_key_fields]
        dims_used = {p.dimension for p in self.all_partitions() if not p.is_leaf}

        if dims_used <= {0}:
            # common case: binary search on the sorted dim-0 lower bounds
            dim0 = key_fields[0]
            ordered = sorted_leaves_dim0(self)
            ids = [p.id for p in ordered]
            # bounds[i] = lower bound of leaf i+1; leaf i covers
            # [bounds[i-1], bounds[i])
            bounds = [p.region.range_for(dim0).min for p in ordered[1:]]

            @pandas_udf("string")
            def assign0(col: pd.Series) -> pd.Series:
                arr = col.to_numpy()
                b = np.asarray(bounds, dtype=arr.dtype if arr.dtype.kind in "iu"
                               else object)
                idx = np.searchsorted(b, arr, side="right")
                return pd.Series(np.asarray(ids, dtype=object)[idx])

            return assign0(F.col(dim0))

        # multi-dimension trees: vectorized descent — each tree level
        # partitions the remaining row indices with one mask
        nodes = {}
        for p in self.all_partitions():
            if p.is_leaf:
                continue
            left_id, right_id = p.child_ids
            fld = key_fields[p.dimension]
            split = self._by_id[right_id].region.range_for(fld).min
            nodes[p.id] = (p.dimension, split, left_id, right_id)
        root_id = self.root_id

        @pandas_udf("string")
        def assign(*cols: pd.Series) -> pd.Series:
            n = len(cols[0])
            out = np.empty(n, dtype=object)
            arrays = [c.to_numpy() for c in cols]
            stack = [(np.arange(n), root_id)]
            while stack:
                idx, pid = stack.pop()
                node = nodes.get(pid)
                if node is None:
                    out[idx] = pid
                    continue
                dim, split, left_id, right_id = node
                mask = arrays[dim][idx] < split
                stack.append((idx[mask], left_id))
                stack.append((idx[~mask], right_id))
            return pd.Series(out)

        return assign(*[F.col(k) for k in key_fields])

    def to_json(self) -> list[dict[str, Any]]:
        return [p.to_json() for p in self._by_id.values()]

    @staticmethod
    def from_json(d: list[dict[str, Any]], schema: Schema) -> "PartitionTree":
        return PartitionTree(schema, [Partition.from_json(p, schema) for p in d])


def _region_contains_col(region: Region) -> Column:
    out = F.lit(True)
    for r in region.ranges:
        if r.min is not None:
            out = out & (F.col(r.field) >= F.lit(r.min))
        if r.max is not None:
            out = out & (F.col(r.field) < F.lit(r.max))
    return out


def _min_of(dtype: Any) -> Any:
    """A minimal probe value per key type (used for point construction)."""
    from pyspark.sql import types as T

    if isinstance(dtype, (T.IntegerType, T.LongType)):
        return -(2 ** 62)
    if isinstance(dtype, T.StringType):
        return ""
    if isinstance(dtype, T.BinaryType):
        return b""
    raise TypeError(f"unsupported key type {dtype}")


def sorted_leaves_dim0(tree: PartitionTree) -> list[Partition]:
    """Leaves sorted by their dimension-0 lower bound (None first) — the
    order in which concatenated sorted leaf outputs form a globally sorted
    result (ConcatenatingIterator semantics, §2.4 J6)."""
    dim0 = tree.schema.row_key_fields[0].name

    def keyfn(p: Partition):
        r = p.region.range_for(dim0)
        return (0,) if r is None or r.min is None else (1, r.min)

    return sorted(tree.leaves(), key=keyfn)
