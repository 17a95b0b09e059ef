"""DataFrame application of table processing: ageOff filters + continual
key-collapsing aggregation.

Sleeper applies these "iterators" on EVERY read path — compaction and
query — so users only ever observe filtered, collapsed data
(docs/usage/data-processing.md:33-67). Ops must be commutative/associative
(data-processing.md:88-93), which is exactly Spark's partial+final
aggregation contract, so a plain ``groupBy(keys).agg(...)`` is the
idiomatic physical realisation (the reference's own DataFusion engine does
the same: datafusion.rs:271-295). The Java engine's single-pass
group-adjacent aggregator (AggregatorIteratorImpl.java:64-93) is an
optimization for presorted input, not different semantics.

Scale notes (100 TB):
- Aggregation is a hash-agg with map-side partial combine — one shuffle on
  the group keys, no driver-side state.
- map_* aggregation avoids collect_list-style per-group buffering: it
  explodes map entries, aggregates per (keys..., map_key) — still fully
  partial-aggregatable — then reassembles with map_from_entries. Two
  shuffles but each is a plain hash-agg that scales linearly; skewed group
  keys are handled by AQE.
- sum() on numeric keeps the input type (sum(int)->int), mirroring the
  reference's cast-back (nonnull.rs:160-210, datafusion.rs:293-295).
- sum() on string/binary is concatenation (AggregationOp.java:25-47).
  Concatenation order follows the table sort order; within identical
  (row key + sort key) tuples the reference's order is file-merge order,
  which is itself unspecified across compaction histories — we document
  concat as order-unstable across equal-key duplicates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sleeper_spark.iterators import AgeOffFilter, Aggregation
from sleeper_spark.schema import Schema


def age_off_condition(f: AgeOffFilter, now_millis: int) -> Column:
    """Keep rows with non-null timestamp newer than the age limit
    (AgeOffFilter.java:82-85: drop when null or now - value >= maxAge)."""
    col = F.col(f.column)
    return col.isNotNull() & (F.lit(now_millis) - col < F.lit(f.max_age_millis))


def apply_filters(df: DataFrame, filters: list[AgeOffFilter], now_millis: int) -> DataFrame:
    """``now`` is fixed once per job for determinism (P3, SURVEY §2.2)."""
    for f in filters:
        df = df.where(age_off_condition(f, now_millis))
    return df


def _scalar_agg(col_name: str, op: str, dtype: T.DataType) -> Column:
    c = F.col(col_name)
    if op == "sum":
        if isinstance(dtype, (T.IntegerType, T.LongType)):
            # cast-back keeps the input type, per A5 (nonnull.rs:160-210)
            return F.sum(c).cast(dtype).alias(col_name)
        if isinstance(dtype, T.StringType):
            return F.array_join(F.collect_list(c), "").alias(col_name)
        if isinstance(dtype, T.BinaryType):
            return F.aggregate(
                F.collect_list(c),
                F.lit(b""),
                lambda acc, x: F.concat(acc, x),
            ).alias(col_name)
        return F.sum(c).alias(col_name)
    if op == "min":
        return F.min(c).alias(col_name)  # Spark binary min is unsigned-lex — matches
    if op == "max":
        return F.max(c).alias(col_name)
    raise ValueError(f"unknown scalar op {op}")


def _map_merge_expr(col_name: str, op: str) -> Column:
    """Merge a collected array of maps point-wise with ``op``.

    Uses higher-order functions only (JVM-side, no Python): fold the array
    with ``F.aggregate``; each step unions keys via ``map_zip_with`` where
    missing keys surface as null and ``coalesce`` keeps the present value.
    Mirrors handleMap (AggregationOp.java:144-215) / the Rust map_aggregate
    UDAF (rust/aggregator_udfs/src/map_aggregate.rs:28-40).
    """
    if op == "map_sum":
        combine = lambda k, v1, v2: F.coalesce(v1 + v2, v1, v2)  # noqa: E731
    elif op == "map_min":
        combine = lambda k, v1, v2: F.coalesce(F.least(v1, v2), v1, v2)  # noqa: E731
    elif op == "map_max":
        combine = lambda k, v1, v2: F.coalesce(F.greatest(v1, v2), v1, v2)  # noqa: E731
    else:
        raise ValueError(f"unknown map op {op}")
    maps = F.collect_list(F.col(col_name))
    # fold tail onto head (groups are never empty; aggregated value columns
    # are non-nullable, so collect_list drops nothing)
    return F.aggregate(
        F.slice(maps, F.lit(2), F.greatest(F.size(maps) - 1, F.lit(0))),
        F.element_at(maps, 1),
        lambda acc, m: F.map_zip_with(acc, m, combine),
    ).alias(col_name)


def apply_aggregations(
    df: DataFrame,
    schema: Schema,
    aggs: list[Aggregation],
    extra_group_cols: list[str] | None = None,
) -> DataFrame:
    """Collapse rows equal on (row keys + sort keys) via the configured ops
    (A1-A5, SURVEY §2.5). Output column order = schema order.

    ``extra_group_cols`` lets batched compaction group by a job tag too —
    key spaces of distinct jobs are disjoint, so this never changes results,
    it only keeps each job's rows addressable for the partitioned write.
    """
    if not aggs:
        return df
    by_col = {a.column: a.op for a in aggs}
    exprs: list[Column] = []
    for f in schema.value_fields:
        op = by_col.get(f.name)
        if op is None:
            continue
        if op.startswith("map_"):
            exprs.append(_map_merge_expr(f.name, op))
        else:
            exprs.append(_scalar_agg(f.name, op, f.dtype))
    group = (extra_group_cols or []) + schema.key_names
    out = df.groupBy(*group).agg(*exprs)
    keep = (extra_group_cols or []) + schema.key_names + [
        f.name for f in schema.value_fields if f.name in by_col
    ]
    return out.select(*keep)


def apply_processing(
    df: DataFrame,
    schema: Schema,
    filters: list[AgeOffFilter],
    aggs: list[Aggregation],
    now_millis: int,
    extra_group_cols: list[str] | None = None,
) -> DataFrame:
    """Filters then aggregation, the reference's iterator chain order
    (IteratorFactory.java:79-91: filters -> aggregation -> custom)."""
    df = apply_filters(df, filters, now_millis)
    return apply_aggregations(df, schema, aggs, extra_group_cols)
