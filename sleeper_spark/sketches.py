"""Quantile sketches for partition splitting.

The reference attaches a DataSketches quantiles sketch per row-key field to
every data file (Sketches.java:45-62) and unions them to find a median
split point (FindPartitionSplitPoint.java:45-94). Spark's
``approxQuantile`` (Greenwald-Khanna) over the partition's files is the
idiomatic equivalent: one distributed pass, driver gets one number back.
For string/binary keys — which approxQuantile does not support — we take
an exact distributed median via ``percentile-by-row-number``: sort-free
``F.ntile`` would need a window over the full partition, so instead we
count rows and pick the middle element with a range-partitioned sort
limited to one column. At 100 TB a per-partition split scan touches only
that partition's files (~1e9 rows by default threshold), not the table.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sleeper_spark.ranges import Region
from sleeper_spark.schema import Schema


def find_split_point(
    spark: SparkSession,
    schema: Schema,
    files: list[str],
    region: Region,
    relative_error: float = 0.001,
) -> tuple[int, Any] | None:
    """Median split point for a partition, trying row-key dimensions in
    order (FindPartitionSplitPoint.java:52-57): usable iff
    min < median < max within the partition region.

    Returns (dimension, split_point) or None if no dimension splits.
    """
    df = (
        spark.read.schema(schema.to_struct_type())
        .parquet(*files)
        .where(region.to_column())
    )
    for dim, fld in enumerate(schema.row_key_fields):
        point = _median(df, fld.name, fld.dtype, relative_error)
        if point is None:
            continue
        bounds = df.select(
            F.min(fld.name).alias("mn"), F.max(fld.name).alias("mx")
        ).collect()[0]
        if bounds.mn is not None and bounds.mn < point and point <= bounds.mx:
            return dim, point
    return None


def _median(df: DataFrame, col: str, dtype: T.DataType, rel_err: float) -> Any:
    if isinstance(dtype, (T.IntegerType, T.LongType)):
        q = df.approxQuantile(col, [0.5], rel_err)
        if not q:
            return None
        val = int(q[0])
        return val
    # string/binary: exact middle element via a single orderBy + offset read.
    n = df.count()
    if n < 2:
        return None
    mid = df.select(col).orderBy(col).offset(n // 2).limit(1).collect()
    return mid[0][0] if mid else None
