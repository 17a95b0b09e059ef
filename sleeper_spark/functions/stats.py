"""Exact order statistics at scale: distributed cumulative histograms,
exact quantiles, and winsorization (outlier clipping at exact
percentiles) — the robust-stats step a data pipeline runs before
length/price/score features feed a filter or a model.

Everything here is EXACT (rank arithmetic over a value histogram), not
approximate: ``approxQuantile`` answers drift with sampling, which makes
them un-oracle-able and unstable across runs; these are deterministic
functions of the data, so a SQL engine reproduces them bit-for-bit.

Scale shape: the only shuffle is a hash aggregation to DISTINCT VALUES
(cost ∝ distinct values, not rows — map-side partial counts do the heavy
lifting), and the cumulative sum over the sorted histogram is a
DISTRIBUTED prefix sum: range-partition the values, per-partition
cumsum, plus a driver-computed per-partition offset (P scalars). No
single-partition global window anywhere, so a 100 TB column with
billions of distinct values still spreads across the cluster. For
continuous doubles, quantize first (e.g. cents) to bound the histogram;
the quantile of the quantized column brackets the true one by the
quantization step.

No reference analog (the reference has no numeric analytics beyond
aggregation); this generalises the quantile-sketch sidecar machinery
(sketches.py) to exact, ad-hoc columns.
"""

from __future__ import annotations

import math
from typing import Any

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def cumulative_histogram(df: DataFrame, col: str,
                         n_parts: int | None = None) -> DataFrame:
    return _cumhist(df, col, n_parts)[0]


def _cumhist(df: DataFrame, col: str,
             n_parts: int | None = None) -> tuple[DataFrame, int]:
    """``(value, cnt, cum)`` per distinct value of ``col``, where
    ``cum`` is the number of rows with value <= this value (NULLs are
    excluded — order statistics are undefined over NULL).

    The prefix sum is distributed: values are range-partitioned, each
    partition cumsums locally, and the cross-partition offsets are a
    P-row driver computation. ``cum`` is a pure function of the data —
    partition boundaries (which Spark samples nondeterministically)
    cancel out of offset + local-cumsum.

    Also returns ``n`` (the non-NULL row total), already known on the
    driver from the partition totals — callers must not pay another
    aggregation job to re-learn it.
    """
    if col in ("cnt", "cum", "__part"):
        # names that must coexist with `col` inside the plan (the
        # final 'value' alias is applied after, so col='value' is fine)
        raise ValueError(
            f"column name {col!r} collides with the histogram's "
            "internal cnt/cum/__part columns — alias it first")
    sess = df.sparkSession
    if n_parts is None:
        n_parts = sess.sparkContext.defaultParallelism
    hist = (df.where(F.col(col).isNotNull())
            .groupBy(col).agg(F.count(F.lit(1)).alias("cnt")))
    ranged = hist.repartitionByRange(n_parts, F.col(col)).withColumn(
        "__part", F.spark_partition_id())
    # cache: the per-partition totals pass and the cumsum pass must see
    # the SAME partitioning (re-execution could re-sample range bounds)
    ranged = ranged.localCheckpoint(eager=False)
    totals = {r["__part"]: r["t"] for r in
              ranged.groupBy("__part").agg(F.sum("cnt").alias("t"))
              .collect()}  # P scalars on the driver
    if not totals:  # empty/all-NULL input: F.create_map() of zero
        # entries types as map<void,void> and fails analysis below
        return (ranged.select(F.col(col).alias("value"), "cnt",
                              F.lit(None).cast("long").alias("cum")), 0)
    offsets, acc = {}, 0
    for p in sorted(totals):
        offsets[p] = acc
        acc += totals[p]
    off_map = F.create_map(
        *[F.lit(x) for kv in sorted(offsets.items()) for x in kv])
    w = Window.partitionBy("__part").orderBy(col)
    return (ranged
            .withColumn("cum", F.sum("cnt").over(w) + off_map[F.col("__part")])
            .select(F.col(col).alias("value"), "cnt", "cum"), acc)


def exact_quantiles(df: DataFrame, col: str,
                    qs: list[float]) -> list[Any]:
    """The exact q-th order statistics of ``col``: for each q, the
    smallest value whose cumulative count reaches ``ceil(q * n)``
    (percentile_disc semantics — an actual data value, never an
    interpolation). One aggregation job answers every q at once;
    driver transfer is len(qs) scalars."""
    ch, n = _cumhist(df, col)
    if not n:
        return [None for _ in qs]
    aggs = []
    for i, q in enumerate(qs):
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile {q} outside [0, 1]")
        rank = max(1, math.ceil(q * n))
        aggs.append(F.min(F.when(F.col("cum") >= rank,
                                 F.col("value"))).alias(f"q{i}"))
    row = ch.agg(*aggs).first()
    return [row[f"q{i}"] for i in range(len(qs))]


def grouped_quantiles(df: DataFrame, group_cols: list[str], col: str,
                      qs: dict[str, float]) -> DataFrame:
    """Exact per-group order statistics in one shuffle-bounded pass:
    ``qs`` maps output column name -> q, e.g. ``{"p50": 0.5, "p95":
    0.95}``. Per-(group, value) histogram, per-group window cumsum
    (PARTITIONED by group, so the prefix sum distributes across the
    cluster — only a single group with a huge distinct-value set would
    concentrate; quantize such columns first), then every q answered
    from one final hash aggregation. Same percentile_disc semantics as
    :func:`exact_quantiles` (smallest value whose cumulative count
    reaches ceil(q*n) within its group); output also carries ``n`` —
    the group's non-NULL row count."""
    for name, q in qs.items():
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile {q} outside [0, 1]")
        if name in (*group_cols, col, "n", "cnt", "cum", "__n"):
            raise ValueError(
                f"output name {name!r} collides with a group/input "
                "column or the reserved n/cnt/cum names")
    hist = (df.where(F.col(col).isNotNull())
            .groupBy(*group_cols, col)
            .agg(F.count(F.lit(1)).alias("cnt")))
    w = Window.partitionBy(*group_cols).orderBy(col)
    wg = Window.partitionBy(*group_cols)
    h = (hist.withColumn("cum", F.sum("cnt").over(w))
         .withColumn("__n", F.sum("cnt").over(wg)))
    aggs = [
        F.min(F.when(
            F.col("cum") >= F.greatest(
                F.lit(1).cast("long"),
                F.ceil(F.lit(q) * F.col("__n"))),
            F.col(col))).alias(name)
        for name, q in qs.items()
    ]
    return h.groupBy(*group_cols).agg(
        *aggs, F.max("__n").alias("n"))


def equidepth_buckets(df: DataFrame, col: str, n_buckets: int = 8,
                      out_col: str = "bucket") -> DataFrame:
    """Quantile (equi-depth) binning — the KBinsDiscretizer shape a
    feature pipeline runs before a model: bucket i collects rows
    between the i/B and (i+1)/B order statistics, so buckets hold
    ~equal row counts regardless of the distribution. The B-1 fences
    are exact order statistics (driver scalars from ONE aggregation
    job); the assignment is a codegen'd count-of-fences-<=-x over a
    literal array — no join, no second shuffle, NULLs bucket NULL.

    Ties share a bucket (assignment is a pure function of the value),
    so heavily-skewed columns may leave some buckets empty — the
    deterministic trade; jitter the column first if strict balance
    matters more than reproducibility."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    fences = exact_quantiles(
        df, col, [i / n_buckets for i in range(1, n_buckets)])
    if fences[0] is None:  # empty/all-NULL input
        return df.withColumn(out_col, F.lit(None).cast("int"))
    arr = F.lit(fences)
    bucket = F.size(F.filter(arr, lambda f: F.col(col) >= f)).cast("int")
    return df.withColumn(
        out_col,
        F.when(F.col(col).isNull(), F.lit(None).cast("int"))
        .otherwise(bucket))


def grouped_winsorize(df: DataFrame, group_cols: list[str], col: str,
                      lower: float = 0.01, upper: float = 0.99,
                      out_col: str | None = None) -> DataFrame:
    """Per-group winsorization — clip ``col`` to each GROUP's own
    exact [p_lower, p_upper] order statistics (a web corpus clips
    document lengths per domain, not globally: one long-form domain
    must not set the fences for all). Thresholds come from one
    :func:`grouped_quantiles` pass (one row per group — broadcast-
    joinable at any corpus scale); the clip is a codegen'd
    least/greatest after the join. NULLs pass through; rows whose
    group never produced thresholds (all-NULL group) pass through
    unclipped."""
    th = grouped_quantiles(df, group_cols, col,
                           {"__lo": lower, "__hi": upper})
    joined = df.join(
        F.broadcast(th.select(*group_cols, "__lo", "__hi")),
        group_cols, "left")
    out = out_col or col
    clip = F.least(F.greatest(F.col(col), F.col("__lo")), F.col("__hi"))
    return joined.withColumn(
        out,
        F.when(F.col(col).isNull() | F.col("__lo").isNull(),
               F.col(col)).otherwise(clip)
    ).drop("__lo", "__hi")


def grouped_mad_outliers(df: DataFrame, group_cols: list[str], col: str,
                         k: float = 3.0,
                         out_col: str = "is_outlier") -> DataFrame:
    """Per-group MAD outlier fences: flag rows where
    ``|x - median_g| > k * MAD_g`` with BOTH statistics computed per
    group — a metric whose scale varies by segment (latency per
    endpoint, price per category) needs per-group fences or the widest
    group swallows everyone else's outliers. Two
    :func:`grouped_quantiles` passes (each one row per group,
    broadcast-joined back); the flag is a codegen'd comparison. NULL
    values — and rows of an all-NULL group, which has no fences —
    flag NULL (unknown, not outlier)."""
    med = grouped_quantiles(df, group_cols, col, {"__med": 0.5}) \
        .select(*group_cols, "__med")
    j1 = df.join(F.broadcast(med), group_cols, "left")
    dev = j1.select(*group_cols,
                    F.abs(F.col(col) - F.col("__med")).alias("__dev"))
    mad = grouped_quantiles(dev, group_cols, "__dev", {"__mad": 0.5}) \
        .select(*group_cols, "__mad")
    return (j1.join(F.broadcast(mad), group_cols, "left")
            .withColumn(
                out_col,
                F.when(F.col(col).isNull() | F.col("__med").isNull(),
                       F.lit(None).cast("boolean"))
                .otherwise(F.abs(F.col(col) - F.col("__med"))
                           > F.lit(k) * F.col("__mad")))
            .drop("__med", "__mad"))


def median_abs_deviation(df: DataFrame, col: str) -> tuple[Any, Any]:
    """``(median, MAD)`` of ``col``, both EXACT order statistics: MAD
    is the median of ``|x - median|`` — the robust spread measure that,
    unlike stddev, one corrupt 1e308 row cannot drag to infinity. Two
    quantile passes over value histograms; both results are actual data
    values (or exact absolute differences of them), so a SQL engine
    reproduces them bit-for-bit."""
    med = exact_quantiles(df, col, [0.5])[0]
    if med is None:
        return None, None
    dev = df.select(F.abs(F.col(col) - F.lit(med)).alias("__dev"))
    mad = exact_quantiles(dev, "__dev", [0.5])[0]
    return med, mad


def mad_outliers(df: DataFrame, col: str, k: float = 3.0,
                 out_col: str = "is_outlier") -> DataFrame:
    """Flag rows where ``|x - median| > k * MAD`` — the robust outlier
    rule (a MAD-based z-score) a pipeline uses to quarantine corrupt
    numeric features before they poison aggregates. The two thresholds
    are driver scalars; the flag is one codegen'd comparison over the
    scan. NULLs flag NULL (unknown, not outlier)."""
    med, mad = median_abs_deviation(df, col)
    if med is None:
        return df.withColumn(out_col, F.lit(None).cast("boolean"))
    return df.withColumn(
        out_col, F.abs(F.col(col) - F.lit(med)) > F.lit(k * mad))


def winsorize(df: DataFrame, col: str, lower: float = 0.01,
              upper: float = 0.99, out_col: str | None = None) -> DataFrame:
    """Clip ``col`` to its exact [p_lower, p_upper] order statistics —
    the standard tail-taming transform before means/sums over heavy-
    tailed features (document lengths, prices, scores). The thresholds
    are two driver scalars; the clip itself is a codegen'd
    least/greatest over the scan — no second shuffle, no UDF. NULLs
    pass through unclipped (they carry no magnitude to clip)."""
    lo, hi = exact_quantiles(df, col, [lower, upper])
    out = out_col or col
    if lo is None:  # empty (or all-NULL) input: nothing to clip
        return df.withColumn(out, F.col(col))
    # explicit NULL pass-through: Spark's greatest/least SKIP nulls
    # (greatest(NULL, lo) = lo), which would silently conjure a value
    # for a NULL row instead of keeping it NULL
    clip = F.least(F.greatest(F.col(col), F.lit(lo)), F.lit(hi))
    return df.withColumn(
        out, F.when(F.col(col).isNull(), F.lit(None)).otherwise(clip))
