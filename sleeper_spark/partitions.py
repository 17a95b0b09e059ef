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
from dataclasses import dataclass, replace
from typing import Any, Iterable

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
        full = Region(
            tuple(Range(f.name, None, None) for f in schema.row_key_fields)
        )
        root = Partition("root", full)
        tree = PartitionTree(schema, [root])
        for sp in sorted(split_points or []):
            leaf = tree.leaf_for_value(dim0, sp)
            tree.split(leaf.id, 0, sp)
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
        left = Partition(
            f"{partition_id}L",
            Region(tuple(left_rng if r.field == field else r for r in p.region.ranges)),
            parent_id=p.id,
        )
        right = Partition(
            f"{partition_id}R",
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
    def leaf_id_column(self) -> Column:
        """Expression computing the leaf-partition id for each row.

        Built as nested CASE over the sorted leaf boundaries of dimension 0
        plus point-in-region checks for deeper dimensions; for the common
        case (splits only on dimension 0) this is a pure JVM-side chain of
        comparisons over the sorted leaf list, which Catalyst folds into a
        single codegen'd expression. Mirrors the reference's bulk-import
        partition assignment (BulkImportJobDataframeDriver.java:55-93) but
        stays a Column expression instead of a JVM UDF.
        """
        leaves = self.leaves()
        expr: Column | None = None
        # Build WHEN region-contains THEN id, most leaves first; last is otherwise.
        for p in leaves[:-1]:
            cond = _region_contains_col(p.region)
            expr = F.when(cond, F.lit(p.id)) if expr is None else expr.when(cond, F.lit(p.id))
        if expr is None:
            return F.lit(leaves[0].id)
        return expr.otherwise(F.lit(leaves[-1].id))

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
