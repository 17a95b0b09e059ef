"""S2: distributed sorted scan — merge-without-resort, zero shuffle.

The reference's read path returns each leaf's rows by k-way-merging its
sorted files (MergingIterator.java:37-114) and concatenates leaves in key
order (ConcatenatingIterator.java:28-85). The Spark-native distributed
form here:

- ONE task per pruned leaf (``mapInPandas`` over a source DataFrame with
  exactly one leaf descriptor per input partition — no exchange anywhere
  in the plan).
- Inside a task, a *vectorized* k-way merge over the leaf's sorted runs:
  pull one Arrow batch per file, cut every buffer at the minimum of the
  buffers' max keys (a lexicographic prefix count per buffer), sort the
  bounded chunk, emit. Memory is O(n_files x batch_size) rows — never the
  whole leaf. Equal keys can never straddle a chunk boundary (every row
  <= bound is taken from every file), so group-adjacent aggregation per
  chunk is exact.
- Output partitions are ordered by leaf lower bound, rows sorted within
  each partition, so concatenating partitions in index order is the total
  table order — the property Spark's ``orderBy`` buys with a full
  range-partition shuffle.

Compared with the declarative path (scan + re-sort), this trades
Catalyst-side codegen for an Arrow-batched Python pipe but removes BOTH
the range-sampling pass and the whole-table exchange; at 100 TB the
exchange is the dominant cost and this plan has none.

Processing parity: leaf-region dedup guard + query regions + ageOff
filters + scalar continual aggregation are applied inside the task with
Arrow kernels (same semantics as the Arrow compaction engine,
compact.rs:118-140). Leaf regions partition the row-key space, so
per-leaf aggregation is complete — no cross-partition combine needed.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sleeper_spark.partitions import sorted_leaves_dim0
from sleeper_spark.query import Query
from sleeper_spark.ranges import Range, Region
from sleeper_spark.schema import Schema

_BATCH_ROWS = 65536


def _prefix_count(cols: list, bound: tuple, include_equal: bool) -> int:
    """#rows (a sorted prefix) lexicographically <= bound (or < bound
    when ``include_equal`` is False) — Arrow kernels, so string/binary
    comparisons stay in C++ (a numpy object-array compare would run
    Python per element)."""
    lt = None
    eq = None
    for arr, b in zip(cols, bound):
        s = pa.scalar(b, arr.type)
        clt = pc.less(arr, s)
        ceq = pc.equal(arr, s)
        lt = clt if lt is None else pc.or_(lt, pc.and_(eq, clt))
        eq = ceq if eq is None else pc.and_(eq, ceq)
    mask = pc.or_(lt, eq) if include_equal else lt
    return int(pc.sum(pc.cast(mask, pa.int8())).as_py() or 0)


def _leq_prefix_count(cols: list, bound: tuple) -> int:
    return _prefix_count(cols, bound, True)


def _filter_chunk(t: pa.Table, leaf_ranges, query_regions, filters,
                  now_millis: int) -> pa.Table:
    def range_mask(fld, mn, mx):
        arr = t.column(fld)
        m = None
        if mn is not None:
            m = pc.greater_equal(arr, pa.scalar(mn, arr.type))
        if mx is not None:
            c = pc.less(arr, pa.scalar(mx, arr.type))
            m = c if m is None else pc.and_(m, c)
        return m

    mask = None
    for fld, mn, mx in leaf_ranges:
        m = range_mask(fld, mn, mx)
        if m is not None:
            mask = m if mask is None else pc.and_(mask, m)
    qmask = None
    for region in query_regions:
        rmask = None
        for fld, mn, mx in region:
            m = range_mask(fld, mn, mx)
            if m is not None:
                rmask = m if rmask is None else pc.and_(rmask, m)
        if rmask is None:
            rmask = pa.array(np.ones(t.num_rows, dtype=bool))
        qmask = rmask if qmask is None else pc.or_(qmask, rmask)
    if qmask is not None:
        mask = qmask if mask is None else pc.and_(mask, qmask)
    if mask is not None:
        t = t.filter(mask)
    for col, max_age in filters:
        arr = t.column(col)
        keep = pc.and_(
            pc.is_valid(arr),
            pc.less(pc.subtract(pa.scalar(now_millis, pa.int64()),
                                pc.cast(arr, pa.int64())),
                    pa.scalar(max_age, pa.int64())))
        t = t.filter(keep)
    return t


def _count_below(col: pa.Array, bound) -> int:
    return int(pc.sum(pc.cast(pc.less(col, pa.scalar(bound, col.type)),
                              pa.int64())).as_py() or 0)


def _declared_arrow_schema(schema) -> "pa.Schema":
    """The table schema as Arrow, for padding schema-evolved files
    (files written before an add_value_column) with NULL columns of
    the declared type at merge time."""
    from pyspark.sql.pandas.types import to_arrow_schema

    return to_arrow_schema(schema.to_struct_type())


def _merge_leaf(desc: dict) -> Iterator[pa.Table]:
    """Vectorized k-way merge of one leaf's sorted runs, bounded memory.

    Fast path: one remaining run streams through untouched (no compare,
    no re-sort) — after a compaction most leaves are a single file.

    ``prune_range`` = (dim0_key, lo, hi): subrange merges (a) skip
    row groups whose stats fall outside [lo, hi), and (b) trim each
    batch to the exact range BEFORE it enters the merge — the runs are
    sorted, so the trim is a head/tail slice, and a batch whose tail
    passes ``hi`` ends its file's read early. Without the trim every
    boundary row group's rows would flow through merge+sort just to be
    filtered afterwards, costing more than the parallelism buys.
    """
    key_names = desc["key_names"]
    col_order = desc["column_order"]
    prune = desc.get("prune_range")
    # schema evolution: a file written before add_value_column lacks the
    # new column(s); read what it has and pad NULLs of the declared type
    # (desc["arrow_schema"], the table's current schema) per batch —
    # schema-on-read, the same semantics Spark's explicit read schema
    # gives the DataFrame path
    declared: pa.Schema | None = desc.get("arrow_schema")
    readers = []
    absent: list[list[str]] = []
    for fn in desc["files"]:
        pf = pq.ParquetFile(fn)
        have = set(pf.schema_arrow.names)
        miss = [c for c in col_order if c not in have]
        if miss and declared is None:
            raise ValueError(
                f"{fn} lacks column(s) {miss} and no declared schema was "
                "provided to pad them — schema-evolved tables need "
                "desc['arrow_schema']")
        kwargs = {}
        if prune is not None:
            from sleeper_spark.sketches import row_groups_overlapping

            rgs = row_groups_overlapping(pf, prune[0], prune[1], prune[2])
            if rgs is not None:
                if not rgs:
                    readers.append(None)
                    absent.append(miss)
                    continue
                kwargs["row_groups"] = rgs
        it = pf.iter_batches(batch_size=desc.get("batch_rows", _BATCH_ROWS),
                             columns=[c for c in col_order if c in have],
                             **kwargs)
        readers.append(it)
        absent.append(miss)
    # buffer per file: (table, key arrays) — key arrays cached with the
    # buffer so they are converted once per batch, not once per round
    buffers: list[tuple[pa.Table, list[pa.Array]] | None] = [None] * len(readers)
    # canonical batch schema: a leaf's files may come from different
    # writers (J4 DataFrame ingest emits nullable fields, J5 RDD ingest
    # non-null ones) and concat_tables refuses mixed nullability — relax
    # every batch to the first file's types with nullable fields (a
    # metadata-only cast when only nullability differs)
    canon: list[pa.Schema | None] = [None]
    # per-file carry: a buffer must always END at a group boundary of
    # its run. A raw batch boundary may split an equal-key group (a
    # user-supplied file is not guaranteed internally collapsed), and
    # both cut rules — the multi-run min-of-max bound and the single-run
    # stream-through — treat a buffer's last key as the run's last
    # occurrence of that key. So refill withholds each batch's trailing
    # equal-key group and prepends it to the file's next batch.
    #
    # ONLY when aggregating: group boundaries exist for group-adjacent
    # aggregation. Without aggs, a split group merely spreads equal keys
    # over consecutive chunks (still globally key-sorted — equal keys
    # have no defined order), and withholding would buffer an entire
    # run in memory whenever one key value dominates a file.
    need_group_boundaries = bool(desc.get("aggs"))
    carries: list[pa.Table | None] = [None] * len(readers)

    def refill(i) -> None:
        if buffers[i] is not None:
            return
        while True:
            it = readers[i]
            if it is None:
                if carries[i] is not None:  # final group of the run
                    t = carries[i]
                    carries[i] = None
                    buffers[i] = (t, [t.column(k).combine_chunks()
                                      for k in key_names])
                return
            try:
                batch = next(it)
            except StopIteration:
                readers[i] = None
                continue  # loop back to flush the carry, if any
            t = pa.Table.from_batches([batch])
            for c in absent[i]:
                fld = declared.field(c)
                t = t.append_column(pa.field(fld.name, fld.type, True),
                                    pa.nulls(t.num_rows, fld.type))
            t = t.select(col_order)
            if canon[0] is None:
                canon[0] = pa.schema(
                    [pa.field(fld.name, fld.type) for fld in t.schema])
            if t.schema != canon[0]:
                t = t.cast(canon[0])
            if prune is not None:
                key, lo, hi = prune
                col = t.column(key).combine_chunks()
                start = _count_below(col, lo) if lo is not None else 0
                end = _count_below(col, hi) if hi is not None else t.num_rows
                if end < t.num_rows:
                    readers[i] = None  # sorted run: rest is past hi
                if end <= start:
                    continue  # nothing in range; flush carry via the loop
                if start > 0 or end < t.num_rows:
                    t = t.slice(start, end - start)
            if carries[i] is not None:
                t = pa.concat_tables([carries[i], t])
                carries[i] = None
            cols = [t.column(k).combine_chunks() for k in key_names]
            if readers[i] is not None and need_group_boundaries:
                # run continues: withhold the trailing equal-key group
                last = tuple(c[len(c) - 1].as_py() for c in cols)
                cnt_lt = _prefix_count(cols, last, False)
                if cnt_lt == 0:
                    carries[i] = t  # whole batch one group: keep growing
                    continue
                if cnt_lt < t.num_rows:
                    carries[i] = t.slice(cnt_lt)
                    t = t.slice(0, cnt_lt)
                    cols = [c.slice(0, cnt_lt) for c in cols]
            buffers[i] = (t, cols)
            return

    sort_spec = [(k, "ascending") for k in key_names]
    while True:
        for i in range(len(readers)):
            refill(i)
        active = [i for i in range(len(readers)) if buffers[i] is not None]
        if not active:
            return
        if len(active) == 1 and all(r is None for j, r in enumerate(readers)
                                    if j != active[0]):
            # single surviving run: stream it through as-is (refill
            # guarantees the buffer ends at a group boundary of its run,
            # so the chunk cannot split an equal-key group)
            i = active[0]
            t, _ = buffers[i]
            buffers[i] = None
            yield t
            continue
        # bound = min over buffers of that buffer's LAST key (its max) —
        # every row <= bound across all buffers is mergeable now
        bound = min(tuple(arr[len(arr) - 1].as_py() for arr in cols)
                    for _, cols in (buffers[i] for i in active))
        parts = []
        for i in active:
            t, cols = buffers[i]
            cnt = _leq_prefix_count(cols, bound)
            if cnt:
                parts.append(t.slice(0, cnt))
            if cnt < t.num_rows:
                buffers[i] = (t.slice(cnt), [c.slice(cnt) for c in cols])
            else:
                buffers[i] = None
        chunk = pa.concat_tables(parts) if len(parts) > 1 else parts[0]
        chunk = chunk.sort_by(sort_spec)
        yield chunk


def _sorted_group_starts(chunk: pa.Table, key_names: list[str]) -> np.ndarray:
    """First-row index of each equal-key group in a chunk that is SORTED
    on ``key_names`` — one vectorized neighbour-compare per key column,
    no hashing. Null-safe: a null key equals a null key."""
    n = chunk.num_rows
    neq = None
    for k in key_names:
        col = chunk.column(k).combine_chunks()
        a, b = col.slice(1), col.slice(0, n - 1)
        d = pc.fill_null(pc.not_equal(a, b), False)
        d = pc.or_(d, pc.xor(pc.is_null(a), pc.is_null(b)))
        neq = d if neq is None else pc.or_(neq, d)
    bnd = np.empty(n, dtype=bool)
    bnd[0] = True
    if n > 1:
        bnd[1:] = neq.to_numpy(zero_copy_only=False)
    return np.flatnonzero(bnd)


from sleeper_spark.processing import _MAP_SCALAR_OP as _MAP_OPS  # one op table, both engines


def _map_sum_dense(ekeys, eitems, egid: np.ndarray, n_groups: int,
                   item_t) -> pa.Array | None:
    """Integer map_sum without hashing or sorting: dictionary-encode the
    map keys once, address a dense (group × key-rank) accumulator with
    ``np.bincount``, and read the occupied slots back in (group, key)
    order — which IS the canonical sorted-key map layout, for free.

    Exact int64 arithmetic despite bincount's float64 weights: each
    value is split into hi/lo 32-bit halves summed separately; a
    partial sum stays under 2^53 (exactly representable) while every
    slot has < 2^21 entries, which is checked, as is the dense-array
    blow-up bound. Returns None when any precondition fails and the
    hash-agg path (below) must run instead. Replaces the 2M-entry hash
    group-by + sort that dominated the map-algebra compaction profile
    (~0.7s/1M rows -> ~0.1s/1M rows)."""
    n_entries = len(ekeys)
    if n_entries == 0 or eitems.null_count:
        return None
    enc = ekeys.dictionary_encode()
    dict_arr = enc.dictionary
    d = len(dict_arr)
    # dense-accumulator bound: degenerate key spread makes the hash path
    # cheaper (and keeps memory O(n_entries))
    if n_groups * d > max(4 * n_entries, 1 << 22):
        return None
    sort_idx = pc.array_sort_indices(dict_arr)
    rank_of = np.empty(d, dtype=np.int64)
    rank_of[sort_idx.to_numpy()] = np.arange(d, dtype=np.int64)
    rcodes = rank_of[enc.indices.to_numpy()]
    comp = egid * d + rcodes
    size = n_groups * d
    counts = np.bincount(comp, minlength=size)
    if counts.max() >= (1 << 21):
        return None  # per-slot float64 partial sums could round
    v64 = eitems.to_numpy().astype(np.int64, copy=False)
    lo = (v64 & 0xFFFFFFFF).astype(np.float64)
    hi = (v64 >> 32).astype(np.float64)
    slo = np.bincount(comp, weights=lo, minlength=size)
    shi = np.bincount(comp, weights=hi, minlength=size)
    occ = np.flatnonzero(counts)
    slo_i = slo[occ].astype(np.int64)
    shi_i = shi[occ].astype(np.int64)
    # recompose mod 2^64: two's-complement wraparound == int64 semantics
    sums = ((shi_i + (slo_i >> 32)) << np.int64(32)) | (slo_i & 0xFFFFFFFF)
    lengths = np.bincount(occ // d, minlength=n_groups)
    moff = np.concatenate(([0], np.cumsum(lengths))).astype(np.int32)
    keys_out = dict_arr.take(sort_idx).take(pa.array(occ % d))
    return pa.MapArray.from_arrays(
        pa.array(moff, type=pa.int32()), keys_out,
        pc.cast(pa.array(sums), item_t))


def _agg_map_column(col, gid_per_row: np.ndarray, n_groups: int,
                    op: str) -> pa.Array:
    """Point-wise map merge per group (A3), vectorized: flatten entries
    with their group id, one hash-agg on (group, map key), rebuild maps
    with keys sorted ascending (matching the Spark engine's
    array_sort(entries) in processing.py:_merge_maps_exploded and the
    reference's map merge, AggregationOp.java:144-215 /
    rust/aggregator_udfs/src/map_aggregate.rs:28-40). Integer map_sum
    takes the dense bincount path above when its preconditions hold."""
    m = col.combine_chunks()
    off = m.offsets.to_numpy()          # may be shifted on a sliced array
    base, total = int(off[0]), int(off[-1])
    ekeys = m.keys.slice(base, total - base)
    eitems = m.items.slice(base, total - base)
    egid = np.repeat(gid_per_row, np.diff(off))
    if op == "sum" and pa.types.is_integer(m.type.item_type):
        fast = _map_sum_dense(ekeys, eitems, egid, n_groups,
                              m.type.item_type)
        if fast is not None:
            return fast
    et = pa.table({"__g": egid, "__k": ekeys, "__v": eitems})
    item_t = m.type.item_type
    concat_items = op == "sum" and (
        pa.types.is_string(item_t) or pa.types.is_large_string(item_t)
        or pa.types.is_binary(item_t) or pa.types.is_large_binary(item_t))
    if concat_items:
        # string/binary map values SUM by concatenation, same per-type
        # rule as scalar columns (AggregationOp.java:25-47) and the
        # Spark engine's _merge_maps_exploded dispatch
        at = (et.group_by(["__g", "__k"])
              .aggregate([("__v", "list")])
              .sort_by([("__g", "ascending"), ("__k", "ascending")]))
        sep = pa.scalar(
            "" if pa.types.is_string(item_t)
            or pa.types.is_large_string(item_t) else b"", type=item_t)
        lst = at.column("__v_list").combine_chunks()
        # null values concat as empty, matching the Spark engine's
        # collect_list-drops-nulls behavior
        lst = pa.ListArray.from_arrays(
            lst.offsets, pc.fill_null(lst.values, sep))
        agg_vals = pc.binary_join(lst, sep)
    else:
        at = (et.group_by(["__g", "__k"])
              .aggregate([("__v", op)])
              .sort_by([("__g", "ascending"), ("__k", "ascending")]))
        agg_vals = at.column(f"__v_{op}").combine_chunks()
    counts = np.bincount(at.column("__g").to_numpy(), minlength=n_groups)
    moff = np.concatenate(([0], np.cumsum(counts))).astype(np.int32)
    items = pc.cast(agg_vals, m.type.item_type)
    return pa.MapArray.from_arrays(
        pa.array(moff, type=pa.int32()),
        at.column("__k").combine_chunks(), items)


def _aggregate_chunk_sorted(chunk: pa.Table, desc: dict) -> pa.Table:
    """Collapse equal-(row key + sort key) rows of a key-sorted chunk —
    the Arrow-engine realisation of the FULL aggregation algebra (A1-A5:
    numeric sum, min/max on any orderable, string/binary concat-sum,
    map_sum/map_min/map_max), group-adjacent like the reference's
    streaming aggregator (AggregatorIteratorImpl.java:64-93).

    Sorted input means group ids come from one neighbour-compare pass
    (no hash of the key columns) and the output is ALREADY in key order —
    no re-sort. Concat-sum is zero-copy: the group's values are a
    contiguous run, so a ListArray over the group offsets + binary_join
    does the whole column in C++."""
    keys = desc["key_names"]
    has_maps = any(op in _MAP_OPS for _, op in desc["aggs"])
    n = chunk.num_rows
    starts = _sorted_group_starts(chunk, keys)
    ng = len(starts)
    if ng == n and not has_maps:
        # no duplicates — and no map columns, which must be rebuilt with
        # sorted keys even when untouched so both engines emit one
        # canonical map form (the Spark engine array_sorts every map)
        return chunk
    bounds = np.append(starts, n)
    take_idx = pa.array(starts, type=pa.int64())
    out_cols: dict = {k: chunk.column(k).take(take_idx) for k in keys}

    scalars: list[tuple[str, str]] = []
    concats: list[str] = []
    maps: list[tuple[str, str]] = []
    for c, op in desc["aggs"]:
        typ = chunk.schema.field(c).type
        if op in _MAP_OPS:
            maps.append((c, _MAP_OPS[op]))
        elif op == "sum" and (pa.types.is_string(typ)
                              or pa.types.is_large_string(typ)
                              or pa.types.is_binary(typ)
                              or pa.types.is_large_binary(typ)):
            concats.append(c)
        else:
            scalars.append((c, op))

    gid_per_row = None
    if scalars or maps:
        gid_per_row = np.repeat(np.arange(ng, dtype=np.int64),
                                np.diff(bounds))
    if scalars:
        gt = pa.table({"__g": gid_per_row,
                       **{c: chunk.column(c) for c, _ in scalars}})
        at = (gt.group_by("__g")
              .aggregate([(c, op) for c, op in scalars])
              .sort_by("__g"))
        for c, op in scalars:
            out_cols[c] = at.column(f"{c}_{op}")
    for c in concats:
        col = chunk.column(c).combine_chunks()
        is_str = pa.types.is_string(col.type) \
            or pa.types.is_large_string(col.type)
        sep = pa.scalar("" if is_str else b"", type=col.type)
        # null values are SKIPPED by the Spark engine (collect_list drops
        # them; an all-null group concats to empty) — binary_join would
        # instead emit null for any group containing a null, so fill
        # first to keep the engines bit-identical
        col = pc.fill_null(col, sep)
        lst = pa.ListArray.from_arrays(
            pa.array(bounds.astype(np.int32), type=pa.int32()), col)
        out_cols[c] = pc.binary_join(lst, sep)
    for c, op in maps:
        out_cols[c] = _agg_map_column(chunk.column(c), gid_per_row, ng, op)

    orig = pa.schema([chunk.schema.field(name)
                      for name in desc["column_order"]])
    t = pa.table(
        {name: out_cols[name] for name in desc["column_order"]})
    return t.cast(orig)  # cast-back keeps input types, per A5


def _process_chunk(chunk: pa.Table, desc: dict) -> pa.Table:
    chunk = _filter_chunk(chunk, desc["leaf_ranges"], desc["query_regions"],
                          desc["filters"], desc["now_millis"])
    if desc["aggs"] and chunk.num_rows:
        chunk = _aggregate_chunk_sorted(chunk, desc)
    return chunk


def distributed_sorted_scan(table, query: Query | None = None,
                            now_millis: int | None = None,
                            batch_rows: int = _BATCH_ROWS,
                            leaf_id_col: str | None = None) -> DataFrame:
    """Build the zero-shuffle sorted scan plan for a table (S2/J1/J6).

    Requires the table's processing config to be Arrow-expressible
    (full aggregation algebra + ageOff; same gate as the Arrow
    compaction engine — only custom iterators are excluded, and those
    are applied afterwards as order-preserving DataFrame transforms,
    row-wise by the U1 contract).
    """
    import time as _time

    from sleeper_spark import compaction as compaction_mod
    from sleeper_spark.iterators import (
        apply_custom_iterators,
        parse_aggregations,
        parse_filters,
    )

    # algebra-only gate: custom iterators are fine here (applied below
    # as order-preserving DataFrame transforms) — gating on the stricter
    # compaction-engine check used to force the full-shuffle fallback
    # for any iterators+aggregations table
    if not compaction_mod.arrow_algebra_supported(
            table.schema, table.props.aggregations) \
            and parse_aggregations(table.props.aggregations):
        raise ValueError(
            "distributed_sorted_scan needs an Arrow-expressible processing "
            "config (sum/min/max, concat-sum, map_* + ageOff); use query() "
            "or sorted_rows() for array-valued aggregations")
    spark = table.spark
    schema: Schema = table.schema
    tree = table.store.tree
    assert tree is not None
    now_millis = now_millis if now_millis is not None else int(_time.time() * 1000)
    if query is None:
        query = Query([Region(tuple(
            Range(f.name, None, None) for f in schema.row_key_fields))])
    from sleeper_spark.query import (
        _file_may_match,
        apply_value_ranges_df,
        reject_value_ranges_on_aggregation,
    )

    reject_value_ranges_on_aggregation(
        query.value_ranges, parse_aggregations(table.props.aggregations))

    leaves = [lf for lf in sorted_leaves_dim0(tree)
              if any(reg.overlaps(lf.region) for reg in query.regions)]
    descs = []
    for leaf in leaves:
        refs = table.store.files_for_leaf_query(leaf.id)
        if not refs:
            continue
        files = sorted({r.filename for r in refs})
        if query.value_ranges:
            files = [f for f in files
                     if _file_may_match(f, query.value_ranges)]
            if not files:
                continue
        descs.append({
            "leaf_id": leaf.id,
            "files": files,
            "leaf_ranges": [(r.field, r.min, r.max) for r in
                            (rr.canonicalise() for rr in leaf.region.ranges)],
            "query_regions": [
                [(r.field, r.min, r.max) for r in
                 (rr.canonicalise() for rr in region.ranges)]
                for region in query.regions],
            "filters": [(f.column, f.max_age_millis)
                        for f in parse_filters(table.props.filters)],
            "aggs": [(a.column, a.op)
                     for a in parse_aggregations(table.props.aggregations)],
            "key_names": list(schema.key_names),
            "column_order": [f.name for f in schema.all_fields()],
            "arrow_schema": _declared_arrow_schema(schema),
            "now_millis": now_millis,
            "batch_rows": batch_rows,
        })
    struct = schema.to_struct_type()
    if leaf_id_col is not None:
        # leaf tag for shuffle-free partitioned export (S6): each task
        # holds exactly one leaf, so partitionBy(leaf_id_col) writes one
        # sorted file per leaf with no exchange
        struct = T.StructType(
            list(struct.fields)
            + [T.StructField(leaf_id_col, T.StringType(), False)])
    if not descs:
        # an EMPTY source still flows through the custom-iterator chain
        # (same reason QueryExecutor.execute routes its empty source
        # through post-processing: a schema-changing iterator must give
        # the empty result the same schema as a non-empty one)
        return apply_custom_iterators(
            spark.createDataFrame([], struct), table.props.iterators, schema)

    # exactly one leaf per input partition: parallelize(n items, n slices)
    # puts item i in partition i, and mapInPandas preserves partitioning —
    # the plan has NO exchange, so partition order remains leaf order.
    # The descriptors travel in the function closure (pickled), so binary
    # key bounds need no JSON encoding.
    src = spark.createDataFrame(
        spark.sparkContext.parallelize(
            [(i,) for i in range(len(descs))], len(descs)),
        "task int")

    def run(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in iterator:
            for task in pdf["task"]:
                desc = descs[int(task)]
                for chunk in _merge_leaf(desc):
                    out = _process_chunk(chunk, desc)
                    if out.num_rows:
                        # maps_as_pydicts: Spark's pandas->Row conversion
                        # needs dicts for MapType, not (k, v) tuple lists
                        res = out.to_pandas(maps_as_pydicts="strict")
                        if leaf_id_col is not None:
                            res[leaf_id_col] = desc["leaf_id"]
                        yield res

    df = src.mapInPandas(run, struct)
    # STORED-value semantics, before custom iterators rewrite anything —
    # identical to QueryExecutor.execute's ordering; row-wise filters
    # preserve the sorted order
    df = apply_value_ranges_df(df, query.value_ranges)
    return apply_custom_iterators(df, table.props.iterators, schema)
