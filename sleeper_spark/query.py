"""Query path: driver-side planning (partition pruning + file collection)
and a single declarative Spark scan.

Mirrors the reference lifecycle (SURVEY §3.1; QueryPlanner.java:160-237;
LeafPartitionQueryExecutor.java:73-131) re-shaped for Spark:

1. Prune: leaves whose region overlaps any query region.
2. Collect files: each pruned leaf's files plus its ancestors' files (a
   row may still live in an ancestor-partition file before compaction).
3. Scan ONCE over the distinct file set with the predicate
   ``(OR query regions) AND (OR selected leaf regions)``.

Step 3 is the Spark-shaped dedup guard. The reference reads each leaf
separately, ANDing that leaf's region so a row in a shared ancestor file
is returned by exactly one leaf (RangeQueryUtils.java:49-56). Reading each
distinct physical file exactly once and ORing the selected leaf regions is
equivalent — leaf regions are disjoint, so every matching row passes for
exactly the one leaf that owns it — and it collapses N per-leaf scans into
one Catalyst scan node: one pass over the data, full predicate pushdown to
Parquet row groups/pages, no union of hundreds of subplans at 100 TB.

Query-time vs table-time processing split follows
LeafPartitionQueryExecutor.java:80-99: table iterators (filters +
aggregation) are ALWAYS applied; an extra query-time config may add more.
The SQL stage (Q1, rust/query_sql/src/lib.rs:28-55) registers results as
``query_results`` and accepts a SELECT-only statement.
"""

from __future__ import annotations

import uuid
from dataclasses import dataclass, field
from functools import lru_cache
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sleeper_spark.iterators import (
    apply_custom_iterators,
    parse_aggregations,
    parse_filters,
)
from sleeper_spark.partitions import Partition
from sleeper_spark.processing import apply_processing
from sleeper_spark.ranges import Region, regions_to_column
from sleeper_spark.schema import Schema
from sleeper_spark.statestore import FileReference, StateStore


@dataclass
class Query:
    """Top-level query IR (Query.java:30-46, QueryJson.java:38-54)."""

    regions: list[Region]
    requested_value_fields: list[str] | None = None  # None = all value fields
    query_time_filters: str = ""       # extra ageOff(...) applied at query only
    query_time_iterators: str = ""     # extra custom iterator chain (U1 query-level)
    sql: str | None = None             # post-query SQL stage (Q1)
    #: conjunctive range predicates on VALUE columns, evaluated against
    #: the STORED values (before any custom iterator transforms — if an
    #: iterator rewrites a filtered column, post-filter the returned
    #: frame instead). Declared at PLAN time they additionally prune
    #: whole FILES via sidecar-held footer min/max stats (Iceberg-style
    #: file skipping) before any footer is opened, and Catalyst still
    #: pushes the same predicate to the row groups of surviving files.
    #: Identical semantics on all three read paths (query /
    #: sorted_rows / sorted_scan); rejected on aggregation-configured
    #: tables (pre-collapse skipping would corrupt aggregates).
    value_ranges: list = field(default_factory=list)
    query_id: str = field(default_factory=lambda: uuid.uuid4().hex[:12])

    def to_json(self) -> dict[str, Any]:
        return {
            "queryId": self.query_id,
            "regions": [r.to_json() for r in self.regions],
            "requestedValueFields": self.requested_value_fields,
            "queryTimeFilters": self.query_time_filters,
            "queryTimeIterators": self.query_time_iterators,
            "sql": self.sql,
            "valueRanges": [r.to_json() for r in self.value_ranges],
        }

    @staticmethod
    def from_json(d: dict[str, Any], schema: Schema | None = None) -> "Query":
        from sleeper_spark.ranges import Range
        return Query(
            regions=[Region.from_json(r, schema) for r in d["regions"]],
            requested_value_fields=d.get("requestedValueFields"),
            query_time_filters=d.get("queryTimeFilters", ""),
            query_time_iterators=d.get("queryTimeIterators", ""),
            sql=d.get("sql"),
            value_ranges=[Range.from_json(r, schema)
                          for r in d.get("valueRanges", [])],
            query_id=d.get("queryId", uuid.uuid4().hex[:12]),
        )


@dataclass(frozen=True)
class LeafPartitionQuery:
    """Per-leaf sub-query IR (LeafPartitionQuery in QueryJson.java:38-54)."""

    leaf: Partition
    files: tuple[FileReference, ...]


class QueryPlanner:
    """Prune partitions and collect files (QueryPlanner.java:160-237)."""

    def __init__(self, store: StateStore):
        self.store = store

    def split_into_leaf_queries(self, query: Query) -> list[LeafPartitionQuery]:
        tree = self.store.tree
        assert tree is not None, "table not initialised"
        out = []
        for leaf in tree.leaves_overlapping(query.regions):
            files = tuple(self.store.files_for_leaf_query(leaf.id))
            if files:
                out.append(LeafPartitionQuery(leaf, files))
        return out


def _minmax_for(filename: str) -> tuple | None:
    """The file's sidecar-held per-column (min, max) bounds, memoised on
    the sidecar's (mtime_ns, size) so a rewritten sidecar (stats
    backfill on pre-upgrade files, manual repair) is re-read
    automatically — a filename-only cache would serve stale bounds and
    could wrongly SKIP files. The stat is ~1 microsecond; the JSON
    parse it avoids is the expensive part at 10^5 planned files."""
    import os as _os

    from sleeper_spark import sketches

    try:
        st = _os.stat(sketches.sidecar_path(filename))
        key = (filename, st.st_mtime_ns, st.st_size)
    except OSError:
        return None  # no sidecar -> unknown -> keep the file
    return _minmax_read(key)


@lru_cache(maxsize=65536)
def _minmax_read(key: tuple) -> tuple | None:
    from sleeper_spark import sketches

    side = sketches.load_sidecar(key[0])
    if not side:
        return None
    mm = side.get("minmax")
    if not mm:
        return None
    return tuple((c, _freeze(v[0]), _freeze(v[1])) for c, v in mm.items())


def _freeze(v):
    return tuple(sorted(v.items())) if isinstance(v, dict) else v


def _thaw(v):
    return dict(v) if isinstance(v, tuple) else v


def _file_may_match(filename: str, value_ranges) -> bool:
    """True unless the file's sidecar-held footer min/max for some
    filtered column PROVABLY misses its range. Conservative by
    construction: no sidecar, no 'minmax' key (pre-upgrade sidecars),
    or no entry for the column all mean "keep the file"."""
    from sleeper_spark import sketches

    frozen = _minmax_for(filename)
    if not frozen:
        return True
    mm = {c: [_thaw(lo), _thaw(hi)] for c, lo, hi in frozen}
    for r in value_ranges:
        ent = mm.get(r.field)
        if not ent:
            continue
        lo, hi = sketches._dec(ent[0]), sketches._dec(ent[1])
        if lo is None or hi is None:
            continue
        # closed file interval [lo, hi] vs the query range — explicit
        # endpoint logic (no canonicalise: doubles have no successor)
        if r.min is not None and (
                hi < r.min or (hi == r.min and not r.min_inclusive)):
            return False
        if r.max is not None and (
                lo > r.max or (lo == r.max and not r.max_inclusive)):
            return False
    return True


def _bloom_for(filename: str):
    """The file's sidecar-held first-row-key Bloom filter as
    ``(meta_dict, decoded_bits)``, memoised on the sidecar's
    (mtime_ns, size) like ``_minmax_for`` — a rewritten sidecar (stats
    backfill) is re-read automatically."""
    import os as _os

    from sleeper_spark import sketches

    try:
        st = _os.stat(sketches.sidecar_path(filename))
        key = (filename, st.st_mtime_ns, st.st_size)
    except OSError:
        return None  # no sidecar -> unknown -> keep the file
    return _bloom_read(key)


# decoded bitmaps are MBs each (vs the minmax cache's tuples), so this
# cache is deliberately small: 1024 entries ~ 1 GB worst-case on the
# driver; eviction just re-reads a sidecar JSON
@lru_cache(maxsize=1024)
def _bloom_read(key: tuple):
    from sleeper_spark import bloom as bl
    from sleeper_spark import sketches

    side = sketches.load_sidecar(key[0])
    meta = (side or {}).get("bloom")
    if not meta:
        return None
    return meta, bl.decode_bits(meta)


def bloom_points(query: "Query", bloom_field: str):
    """Probe values for Bloom file skipping: one per region if EVERY
    region pins ``bloom_field`` to a single point (min==max, both
    inclusive — the shape ``Region.exact`` builds); else ``None``
    (a range region could match keys the probes don't cover, so
    skipping would be unsound for the OR of regions)."""
    pts = []
    for region in query.regions:
        r = region.range_for(bloom_field)
        if (r is None or r.min is None
                or r.min != r.max
                or not (r.min_inclusive and r.max_inclusive)):
            return None
        pts.append(r.min)
    return pts


def file_may_contain_keys(filename: str, points) -> bool:
    """True unless the file's Bloom filter proves ALL probe points
    absent. No false negatives (bloom.py module doc), so skipping is
    exact; a missing bloom keeps the file. Safe on aggregation tables:
    a skipped file contains no row of any probed key group, so no
    contributing row is lost."""
    from sleeper_spark import bloom as bl

    got = _bloom_for(filename)
    if not got:
        return True
    meta, bits = got
    return any(bl.may_contain(bits, meta, p) for p in points)


def reject_value_ranges_on_aggregation(value_ranges, has_aggregations) -> None:
    """The ONE guard shared by all three read paths: pre-collapse
    file/row skipping on VALUE bounds would aggregate a subset of each
    group's rows — silently wrong sums."""
    if value_ranges and has_aggregations:
        raise ValueError(
            "value_ranges cannot be used on an aggregation-configured "
            "table (pre-collapse file skipping would corrupt "
            "aggregates); filter the returned DataFrame instead")


def apply_value_ranges_df(df: DataFrame, value_ranges) -> DataFrame:
    """The value-range row predicate as DataFrame filters — shared by
    QueryExecutor.execute and distributed_sorted_scan so the semantics
    cannot drift. Built directly (not via Range.to_column) so inclusive
    bounds on DOUBLE columns work — canonicalise has no float
    successor. Row-wise filters preserve sorted order."""
    for r in value_ranges:
        c = F.col(r.field)
        if r.min is not None:
            df = df.where(c >= r.min if r.min_inclusive else c > r.min)
        if r.max is not None:
            df = df.where(c <= r.max if r.max_inclusive else c < r.max)
    return df


def compile_value_ranges(value_ranges):
    """Row-dict predicate with EXACTLY the SQL comparison semantics the
    DataFrame paths get from apply_value_ranges_df: a NULL value fails
    any actual bound, but an UNBOUNDED range (both ends None) adds no
    predicate at all and keeps NULL rows — the three read paths must
    agree."""
    vr = [(r.field, r.min, r.min_inclusive, r.max, r.max_inclusive)
          for r in value_ranges
          if r.min is not None or r.max is not None]

    def matches(row) -> bool:
        for fld, mn, mni, mx, mxi in vr:
            v = row.get(fld)
            if v is None:  # NULL never satisfies a real bound
                return False
            if mn is not None and (v < mn or (v == mn and not mni)):
                return False
            if mx is not None and (v > mx or (v == mx and not mxi)):
                return False
        return True

    return matches


class QueryExecutor:
    """Build the (single) Spark plan for a query."""

    def __init__(self, spark: SparkSession, store: StateStore, schema: Schema,
                 table_filters: str = "", table_aggregations: str = "",
                 table_iterators: str = ""):
        self.spark = spark
        self.store = store
        self.schema = schema
        self.table_filters = table_filters
        self.table_aggregations = table_aggregations
        self.table_iterators = table_iterators

    def plan_files(self, query: Query) -> list[str]:
        """The distinct physical files the scan will read: leaf/ancestor
        pruning by key regions, then Iceberg-style file skipping on
        ``query.value_ranges`` via each file's sidecar-held footer
        min/max — a file is dropped only when its recorded bounds for a
        filtered column PROVABLY miss the range; no sidecar / no stats
        for that column keeps the file (absence = unknown)."""
        leaf_queries = QueryPlanner(self.store).split_into_leaf_queries(query)
        return self._files_of(leaf_queries, query)

    def _files_of(self, leaf_queries, query: Query) -> list[str]:
        files = sorted({f.filename for lq in leaf_queries for f in lq.files})
        if query.value_ranges:
            files = [f for f in files
                     if _file_may_match(f, query.value_ranges)]
        # exact-point queries additionally consult each file's
        # first-row-key Bloom filter (bloom.py): an LSM point lookup
        # should open the files that can contain the key, not every
        # file of the leaf partition
        pts = bloom_points(query, self.schema.row_key_names[0])
        if pts is not None:
            files = [f for f in files if file_may_contain_keys(f, pts)]
        return files

    def explain_scan(self, query: Query) -> dict:
        """Scan audit: how many physical files each pruning tier
        eliminated for this query, BEFORE reading any data. At 100 TB
        this is the observability a user needs to see whether their
        layout (key sort, Z-order, blooms, sidecar stats) is actually
        paying: a range query that scans every file isn't wrong, it's
        unpruned — and nothing in the result reveals that.

        Tiers, applied in plan order (monotonically non-increasing):
        partition-region pruning (QueryPlanner), sidecar footer
        min/max value skipping, first-row-key Bloom (point queries).
        ``rows_upper_bound`` sums the surviving references' recorded
        row counts — the worst-case rows the scan can touch.
        Metadata-only: no Spark job runs."""
        leaf_queries = QueryPlanner(self.store).split_into_leaf_queries(
            query)
        files_total = {r.filename for r in self.store.all_references()}
        after_part = sorted({f.filename for lq in leaf_queries
                             for f in lq.files})
        after_vr = after_part
        if query.value_ranges:
            after_vr = [f for f in after_part
                        if _file_may_match(f, query.value_ranges)]
        after_bloom = after_vr
        pts = bloom_points(query, self.schema.row_key_names[0])
        if pts is not None:
            after_bloom = [f for f in after_vr
                           if file_may_contain_keys(f, pts)]
        surviving = set(after_bloom)
        rows_ub = sum(r.number_of_rows for r in
                      self.store.all_references()
                      if r.filename in surviving)
        return {
            "files_total": len(files_total),
            "leaf_partitions_hit": len(leaf_queries),
            "files_after_partition_pruning": len(after_part),
            "files_after_value_skipping": len(after_vr),
            "files_after_bloom": len(after_bloom),
            "pruned_by_partition": len(files_total) - len(after_part),
            "pruned_by_value_stats": len(after_part) - len(after_vr),
            "pruned_by_bloom": len(after_vr) - len(after_bloom),
            "files_scanned": after_bloom,
            "rows_upper_bound": rows_ub,
        }

    def execute(self, query: Query, now_millis: int) -> DataFrame:
        reject_value_ranges_on_aggregation(
            query.value_ranges, self.table_aggregations)
        leaf_queries = QueryPlanner(self.store).split_into_leaf_queries(query)
        files = self._files_of(leaf_queries, query)
        if not files:
            # an EMPTY source still flows through the same
            # post-processing below: an early return here would hand
            # back the full table schema, skipping the
            # requested_value_fields projection and the SQL stage — an
            # aggregate like "SELECT count(*) AS n" must yield its own
            # (0-row or 1-row) schema, not the table's
            df = self.spark.createDataFrame([], self.schema.to_struct_type())
        else:
            # one scan over the distinct physical files (module docstring)
            df = self.spark.read.schema(
                self.schema.to_struct_type()).parquet(*files)

            # predicate: (OR regions) AND (OR selected leaf regions) —
            # both push to Parquet row groups via Catalyst
            pred = regions_to_column(query.regions)
            leaf_guard = regions_to_column(
                [lq.leaf.region for lq in leaf_queries])
            df = df.where(pred & leaf_guard)
        # pushes to the row groups of the files that survived the
        # file-level skip
        df = apply_value_ranges_df(df, query.value_ranges)

        # table-time processing always applies (compaction-config iterators)
        df = apply_processing(
            df,
            self.schema,
            parse_filters(self.table_filters),
            parse_aggregations(self.table_aggregations),
            now_millis,
        )
        # custom iterator chains: table-level, then query-level
        # (IteratorFactory.java:79-91 — filters -> aggregation -> custom)
        df = apply_custom_iterators(df, self.table_iterators, self.schema)

        # query-time extra filters + iterators
        qf = parse_filters(query.query_time_filters)
        if qf:
            df = apply_processing(df, self.schema, qf, [], now_millis)
        df = apply_custom_iterators(df, query.query_time_iterators, self.schema)

        # projection: keys always returned; value fields as requested
        # (LeafPartitionQueryExecutor.java:105-131)
        if query.requested_value_fields is not None:
            cols = self.schema.key_names + [
                v for v in self.schema.value_names if v in set(query.requested_value_fields)
            ]
            df = df.select(*cols)

        if query.sql:
            df = run_sql_stage(self.spark, df, query.sql,
                               sort_cols=self.schema.key_names)
        return df


def _merge_scalar(op: str, a, b):
    if op == "sum":
        # null-tolerant like Spark's sum: null input contributes nothing
        if a is None:
            return b
        if b is None:
            return a
        return a + b
    if op == "min":
        return b if (a is None or (b is not None and b < a)) else a
    if op == "max":
        return b if (a is None or (b is not None and b > a)) else a
    if op in ("map_sum", "map_min", "map_max"):
        out = dict(a or {})
        for k, v in (b or {}).items():
            if k in out:
                if op == "map_sum":
                    out[k] = out[k] + v
                elif op == "map_min":
                    out[k] = min(out[k], v)
                else:
                    out[k] = max(out[k], v)
            else:
                out[k] = v
        return out
    raise ValueError(op)


def _null_safe_key(values):
    """Sort-key tuple matching Spark's NULLS FIRST default: None sorts
    below every value and never reaches a Python ``<`` comparison."""
    return tuple((v is not None, v if v is not None else 0) for v in values)


def sorted_row_iterator(store: StateStore, schema: Schema,
                        query: Query, batch_size: int = 8192,
                        filters=None, aggs=None, row_iterators=None,
                        now_millis: int = 0):
    """Eager-validation wrapper around the merge generator: argument
    errors (value_ranges on an aggregation table) must raise AT THE
    CALL SITE, exactly like query()/sorted_scan() — a generator would
    defer them to first iteration, far from the caller. See
    :func:`_sorted_row_iterator_gen` for the merge itself."""
    reject_value_ranges_on_aggregation(query.value_ranges, aggs)
    return _sorted_row_iterator_gen(store, schema, query, batch_size,
                                    filters, aggs, row_iterators,
                                    now_millis)


def _sorted_row_iterator_gen(store: StateStore, schema: Schema,
                             query: Query, batch_size: int = 8192,
                             filters=None, aggs=None, row_iterators=None,
                             now_millis: int = 0):
    """J1 k-way sorted merge: stream query results in total table order
    (row keys..., sort keys...) WITHOUT a global Spark sort.

    The reference's read path returns a sorted iterator by heap-merging
    each leaf's sorted files and concatenating leaves (MergingIterator
    .java:37-114 + ConcatenatingIterator.java:28-85 — leaf key ranges are
    disjoint, so leaf-order concat of sorted runs is globally sorted).
    This is the same shape driver-side: leaves in key order, per-leaf
    ``heapq.merge`` over pyarrow batch readers, O(merge-width) memory.

    Use when a consumer needs ordered streaming (export to a
    sorted-input system, head-k in key order). For distributed consumers
    prefer ``output.bulk_export`` (per-leaf sorted files, one Spark job);
    this iterator is single-reader by design, like the reference's.
    """
    import heapq

    import pyarrow.parquet as pq_mod

    vr = bool(query.value_ranges)
    in_value_ranges = compile_value_ranges(query.value_ranges)

    tree = store.tree
    assert tree is not None
    key_names = schema.key_names
    col_names = [f.name for f in schema.all_fields()]

    def file_rows(filename, leaf):
        pf = pq_mod.ParquetFile(filename)
        # schema evolution: a file written before add_value_column lacks
        # the new column(s) — read what it has, yield None for the rest
        have = set(pf.schema_arrow.names)
        cols_here = [c for c in col_names if c in have]
        for batch in pf.iter_batches(batch_size=batch_size,
                                     columns=cols_here):
            cols = [batch.column(i) for i in range(batch.num_columns)]
            pydict = {n: c.to_pylist() for n, c in zip(batch.schema.names, cols)}
            for i in range(batch.num_rows):
                row = {n: pydict[n][i] if n in have else None
                       for n in col_names}
                yield row

    # canonicalise every region ONCE: Range.contains canonicalises per
    # call (constructing throwaway Range objects), which on a 10M-row
    # sorted export is hundreds of millions of allocations on the
    # single-reader driver path
    def canon(region):
        return [(rr.field, rr.min, rr.max)
                for r in region.ranges for rr in (r.canonicalise(),)]

    def in_ranges(row, ranges):
        for fld, mn, mx in ranges:
            v = row[fld]
            if mn is not None and (v is None or v < mn):
                return False
            if mx is not None and v is not None and v >= mx:
                return False
        return True

    q_regions = [canon(reg) for reg in query.regions]

    def row_matches(row):
        return any(in_ranges(row, rs) for rs in q_regions)

    agg_ops = {a.column: a for a in (aggs or [])}
    row_key = lambda row: _null_safe_key(row[k] for k in key_names)  # noqa: E731

    # exact-point queries consult per-file Blooms here too — the sorted
    # iterator is the reference's point-read shape, exactly where
    # skipping whole runs matters most
    pts = bloom_points(query, schema.row_key_names[0])

    def leaf_stream(leaf, leaf_ranges):
        refs = store.files_for_leaf_query(leaf.id)
        if not refs:
            return
        fns = sorted({r.filename for r in refs})
        if vr:  # sidecar-stats file skipping, same rule as execute()
            fns = [fn for fn in fns
                   if _file_may_match(fn, query.value_ranges)]
        if pts is not None:
            fns = [fn for fn in fns if file_may_contain_keys(fn, pts)]
        runs = [file_rows(fn, leaf) for fn in fns]
        for row in heapq.merge(*runs, key=row_key):
            # leaf region is the dedup guard for shared ancestor files
            if not in_ranges(row, leaf_ranges):
                continue
            if not row_matches(row):
                continue
            if vr and not in_value_ranges(row):
                continue
            ok = True
            for f in (filters or []):
                v = row.get(f.column)
                if v is None or now_millis - v >= f.max_age_millis:
                    ok = False
                    break
            if ok:
                yield row

    def stream():
        leaves = [lf for lf in tree.leaves_overlapping(query.regions)]
        # key order: unbounded-below (min=None) sorts first per dimension
        leaves.sort(key=lambda lf: [
            (0,) if r.min is None else (1, r.min) for r in lf.region.ranges])
        dim0 = key_names[0]
        # concatenating disjoint-dim-0 leaves preserves total order, but
        # a tree split on a later dimension has leaves whose dim-0
        # ranges OVERLAP — those must heap-merge together or the stream
        # interleaves out of order. Group consecutive leaves into
        # overlap components on dim 0 (component = leaves whose dim-0
        # ranges touch the running max), merge within, concat across.
        components: list[list] = []
        cur_hi: tuple | None = None  # (bounded?, value); None = empty
        for leaf in leaves:
            ranges = canon(leaf.region)
            lo = next((mn for f, mn, mx in ranges if f == dim0), None)
            hi = next((mx for f, mn, mx in ranges if f == dim0), None)
            # new component iff the previous one is bounded above and
            # this leaf starts at or past that bound (ranges are
            # [min, max), so lo == prev hi means disjoint-adjacent)
            if not components or (cur_hi is not None and cur_hi[0]
                                  and lo is not None and lo >= cur_hi[1]):
                components.append([(leaf, ranges)])
                cur_hi = (hi is not None, hi)
            else:
                components[-1].append((leaf, ranges))
                if cur_hi is not None and cur_hi[0]:
                    cur_hi = (hi is not None,
                              hi if hi is None or hi > cur_hi[1]
                              else cur_hi[1])
        for comp in components:
            if len(comp) == 1:
                yield from leaf_stream(*comp[0])
            else:
                yield from heapq.merge(
                    *(leaf_stream(lf, rs) for lf, rs in comp), key=row_key)

    # query-time processing — the same post-aggregation pipeline order as
    # QueryExecutor.execute (table customs -> query-time filters ->
    # query-time customs -> projection); the iterator path previously
    # ignored these Query fields, leaking rows every other read path drops
    from sleeper_spark.iterators import (
        parse_filters as _pf,
        parse_row_iterators as _pri,
    )

    qt_filters = _pf(query.query_time_filters)
    qt_iters = _pri(query.query_time_iterators, schema)
    proj_cols = None
    if query.requested_value_fields is not None:
        wanted = set(query.requested_value_fields)
        proj_cols = list(key_names) + [
            f.name for f in schema.value_fields if f.name in wanted]

    def apply_row_iterators(row):
        # custom chain runs AFTER filters + aggregation, matching the
        # reference's filters -> aggregation -> custom composition
        # (IteratorFactory.java:79-91) and the Spark read path
        for fn in (row_iterators or []):
            row = fn(row)
            if row is None:
                return None
        return row

    def emit(rows):
        for row in rows:
            row = apply_row_iterators(row)
            if row is None:
                continue
            ok = True
            for f in qt_filters:
                v = row.get(f.column)
                if v is None or now_millis - v >= f.max_age_millis:
                    ok = False
                    break
            if not ok:
                continue
            for fn in qt_iters:
                row = fn(row)
                if row is None:
                    break
            if row is None:
                continue
            if proj_cols is not None:
                row = {n: row[n] for n in proj_cols}
            yield row

    if not agg_ops:
        yield from emit(stream())
        return

    # A4 streaming group-adjacent aggregation (AggregatorIteratorImpl
    # .java:64-93): input is key-sorted, so equal-key rows are adjacent —
    # O(1) state, emit on key change
    def aggregated():
        # max_by/min_by keep (order, value) PAIR state separate from the
        # accumulator: the order column may itself be aggregated in the
        # same group, so acc's copy cannot serve as the comparison basis
        current_key, acc, by_state = None, None, {}
        by_aggs = [(col, a) for col, a in agg_ops.items()
                   if a.op in ("max_by", "min_by")]

        def finish(acc):
            for col, _ in by_aggs:
                acc[col] = by_state[col][1]
            return acc

        for row in stream():
            k = tuple(row[n] for n in key_names)
            if k != current_key:
                if acc is not None:
                    yield finish(acc)
                current_key, acc = k, dict(row)
                by_state = {col: (row[a.order_col], row[col])
                            for col, a in by_aggs}
            else:
                for col, a in agg_ops.items():
                    if a.op in ("max_by", "min_by"):
                        cand = (row[a.order_col], row[col])
                        cur = by_state[col]
                        if (cand > cur) == (a.op == "max_by") \
                                and cand != cur:
                            by_state[col] = cand
                    else:
                        acc[col] = _merge_scalar(a.op, acc[col], row[col])
        if acc is not None:
            yield finish(acc)

    yield from emit(aggregated())


#: parsed-plan node names that make a statement a command, not a query.
#: Statement classes (InsertIntoStatement & co.) don't all extend Command,
#: so the walk checks names as well as the Command trait.
_COMMAND_NODE_NAMES = frozenset({
    "InsertIntoStatement", "InsertIntoDir", "MergeIntoTable",
    "DeleteFromTable", "UpdateTable", "TruncateTable", "LoadData",
    "CreateTable", "CreateTableAsSelect", "ReplaceTable",
    "ReplaceTableAsSelect", "CreateView", "CreateTempView",
    "CreateNamespace", "CreateFunction", "DropTable", "DropView",
    "DropNamespace", "DropFunction", "AlterTable", "AlterViewAs",
    "AlterViewSchemaBinding", "SetCommand", "ResetCommand", "SetCatalog",
    "SetNamespace", "SetTableProperties", "SetViewProperties",
    "CacheTable", "UncacheTable", "RefreshTable", "RefreshFunction",
    "AnalyzeTable", "AnalyzeTables", "AnalyzeColumn", "RepairTable",
    "ExplainCommand", "Call",
})


def _walk_logical_plan(jplan):
    """Yield every node of a JVM LogicalPlan (children only — commands
    cannot hide inside expression subqueries)."""
    stack = [jplan]
    while stack:
        node = stack.pop()
        yield node
        it = node.children().iterator()
        while it.hasNext():
            stack.append(it.next())


def assert_query_only(spark: SparkSession, sql: str) -> None:
    """Reject any statement whose PARSED plan contains a command node.

    String sniffing is bypassable (``WITH t AS (SELECT 1) INSERT INTO x
    SELECT * FROM t`` starts with WITH); parsing is not — every DML/DDL
    form surfaces as a statement/command node somewhere in the tree, and
    the walk inspects actual node classes so SQL literals can't
    false-positive. Mirrors the reference's SELECT-only SQL stage
    (rust/query_sql/src/lib.rs:28-55)."""
    parser = spark._jsparkSession.sessionState().sqlParser()
    try:
        jplan = parser.parsePlan(sql)
    except Exception as e:  # ParseException and friends
        raise ValueError(f"SQL stage could not parse statement: {e}") from None
    jvm = spark._jvm
    command_cls = jvm.java.lang.Class.forName(
        "org.apache.spark.sql.catalyst.plans.logical.Command")
    for node in _walk_logical_plan(jplan):
        name = node.getClass().getSimpleName()
        if name in _COMMAND_NODE_NAMES or command_cls.isInstance(node):
            raise ValueError(
                f"SQL stage accepts queries only; rejected {name} node")


def run_sql_stage(spark: SparkSession, results: DataFrame, sql: str,
                  sort_cols: list[str] | None = None) -> DataFrame:
    """SELECT-only SQL over query results registered as ``query_results``
    (Q1: rust/query_sql/src/lib.rs:28-55 — DDL/DML rejected via the
    parsed plan, see :func:`assert_query_only`).

    ``sort_cols`` re-injects the table sort order after user SQL, like
    the reference's sql_sort_fix (rust/query_sql/src/sql_sort_fix.rs):
    the result is re-sorted by the longest prefix of (row keys + sort
    keys) still present in the output, so SQL-stage results keep the
    table's ordering guarantee whenever that is meaningful.
    """
    assert_query_only(spark, sql)
    results.createOrReplaceTempView("query_results")
    out = spark.sql(sql)
    if sort_cols:
        prefix = []
        for c in sort_cols:
            if c not in out.columns:
                break
            prefix.append(c)
        if prefix:
            out = out.orderBy(*prefix)
    return out
