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

from sleeper_spark.sketches import _spaced_ranks


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
    # materialise the histogram BEFORE the range exchange: the range
    # bounds sampling executes its child, so an unmaterialised
    # histogram pays the scan + hash aggregation twice (guide §1.2)
    hist = (df.where(F.col(col).isNotNull())
            .groupBy(col).agg(F.count(F.lit(1)).alias("cnt"))
            .localCheckpoint())
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
    interpolation). Driver transfer is P + len(qs) scalars.

    Same histogram + range-partitioned prefix-sum design as
    :func:`_cumhist`, with two structural trims over calling it
    directly (guide §1.2 — don't compute things you throw away):

    - the histogram is materialised BEFORE ``repartitionByRange``:
      the range exchange's bounds sampling executes its child, so an
      unmaterialised histogram pays the scan + hash aggregation twice
      (once sampled, once shuffled);
    - the per-partition totals collected for the offsets already tell
      the driver WHICH range partition answers each rank, so the final
      window + min-filter job reads only those <= len(qs) partitions
      instead of windowing the whole histogram. Values in earlier
      partitions can never reach the rank (cum <= offset < rank) and
      later partitions only hold larger values, so the answer per q is
      unchanged.
    """
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile {q} outside [0, 1]")
    if col in ("cnt", "cum", "__part"):
        raise ValueError(
            f"column name {col!r} collides with the histogram's "
            "internal cnt/cum/__part columns — alias it first")
    sess = df.sparkSession
    n_parts = sess.sparkContext.defaultParallelism
    hist = (df.where(F.col(col).isNotNull())
            .groupBy(col).agg(F.count(F.lit(1)).alias("cnt"))
            .localCheckpoint())
    ranged = hist.repartitionByRange(n_parts, F.col(col)).withColumn(
        "__part", F.spark_partition_id())
    ranged = ranged.localCheckpoint(eager=False)
    totals = {r["__part"]: r["t"] for r in
              ranged.groupBy("__part").agg(F.sum("cnt").alias("t"))
              .collect()}  # P scalars on the driver
    if not totals:
        return [None for _ in qs]
    offsets, acc = {}, 0
    for p in sorted(totals):
        offsets[p] = acc
        acc += totals[p]
    n = acc
    ranks = [max(1, math.ceil(q * n)) for q in qs]
    # the partition whose [offset, offset+total] interval contains the
    # rank answers it; the final job touches only those partitions
    targets = set()
    for rank in ranks:
        for p in sorted(totals):
            if offsets[p] < rank <= offsets[p] + totals[p]:
                targets.add(p)
                break
    off_map = F.create_map(
        *[F.lit(x) for p in sorted(targets) for x in (p, offsets[p])])
    w = Window.partitionBy("__part").orderBy(col)
    ch = (ranged.where(F.col("__part").isin(list(targets)))
          .withColumn("cum", F.sum("cnt").over(w)
                      + off_map[F.col("__part")]))
    aggs = [F.min(F.when(F.col("cum") >= rank, F.col(col)))
            .alias(f"q{i}") for i, rank in enumerate(ranks)]
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


def _threshold_join(df: DataFrame, th: DataFrame, group_cols: list[str],
                    pin_broadcast: bool) -> DataFrame:
    """Left-join a one-row-per-group threshold table back onto the
    rows. The join strategy is ADAPTIVE by default: no broadcast hint,
    so AQE converts the shuffle join to a broadcast join at runtime
    when the built side proves small (the common categorical-group
    case) but falls back to a plain shuffle join when the group key is
    high-cardinality (per-user / per-document fences over 1e9 groups
    would OOM a forced broadcast). ``pin_broadcast=True`` restores the
    compile-time hint for callers who KNOW the group count is small
    and want the exchange elided from the initial plan."""
    if pin_broadcast:
        th = F.broadcast(th)
    return df.join(th, group_cols, "left")


def grouped_equidepth_buckets(df: DataFrame, group_cols: list[str],
                              col: str, n_buckets: int = 8,
                              out_col: str = "bucket",
                              pin_broadcast: bool = False) -> DataFrame:
    """Per-group quantile binning: bucket i collects rows between the
    GROUP's own i/B and (i+1)/B exact order statistics — feature
    binning per domain, the grouped twin of :func:`equidepth_buckets`
    (a price feature binned globally puts every luxury-category row in
    the top bucket; per-category fences restore resolution). All B-1
    fences for every group come from ONE :func:`grouped_quantiles`
    pass, collapse to a per-group ARRAY column (one row per group),
    join back adaptively (:func:`_threshold_join`), and assignment is
    a codegen'd count-of-fences-<=-x over the array — no per-bucket
    shuffles, no UDF. NULL values — and rows of an all-NULL group,
    which has no fences — bucket NULL. Ties share a bucket, same as
    the global variant."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    qs = {f"__f{i}": i / n_buckets for i in range(1, n_buckets)}
    th = grouped_quantiles(df, group_cols, col, qs)
    fences = th.select(
        *group_cols,
        F.array(*[F.col(f"__f{i}") for i in range(1, n_buckets)])
        .alias("__fences"))
    joined = _threshold_join(df, fences, group_cols, pin_broadcast)
    bucket = F.size(F.filter(F.col("__fences"),
                             lambda f: F.col(col) >= f)).cast("int")
    return joined.withColumn(
        out_col,
        F.when(F.col(col).isNull() | F.col("__fences").isNull(),
               F.lit(None).cast("int")).otherwise(bucket)
    ).drop("__fences")


def grouped_winsorize(df: DataFrame, group_cols: list[str], col: str,
                      lower: float = 0.01, upper: float = 0.99,
                      out_col: str | None = None,
                      pin_broadcast: bool = False) -> DataFrame:
    """Per-group winsorization — clip ``col`` to each GROUP's own
    exact [p_lower, p_upper] order statistics (a web corpus clips
    document lengths per domain, not globally: one long-form domain
    must not set the fences for all). Thresholds come from one
    :func:`grouped_quantiles` pass (one row per group); the join back
    is adaptive (see :func:`_threshold_join`), and the clip is a
    codegen'd least/greatest after it. NULLs pass through; rows whose
    group never produced thresholds (all-NULL group) pass through
    unclipped."""
    th = grouped_quantiles(df, group_cols, col,
                           {"__lo": lower, "__hi": upper})
    joined = _threshold_join(
        df, th.select(*group_cols, "__lo", "__hi"),
        group_cols, pin_broadcast)
    out = out_col or col
    clip = F.least(F.greatest(F.col(col), F.col("__lo")), F.col("__hi"))
    return joined.withColumn(
        out,
        F.when(F.col(col).isNull() | F.col("__lo").isNull(),
               F.col(col)).otherwise(clip)
    ).drop("__lo", "__hi")


def grouped_mad_outliers(df: DataFrame, group_cols: list[str], col: str,
                         k: float = 3.0,
                         out_col: str = "is_outlier",
                         pin_broadcast: bool = False) -> DataFrame:
    """Per-group MAD outlier fences: flag rows where
    ``|x - median_g| > k * MAD_g`` with BOTH statistics computed per
    group — a metric whose scale varies by segment (latency per
    endpoint, price per category) needs per-group fences or the widest
    group swallows everyone else's outliers. Two
    :func:`grouped_quantiles` passes (each one row per group, joined
    back adaptively — see :func:`_threshold_join`); the flag is a
    codegen'd comparison. NULL values — and rows of an all-NULL group,
    which has no fences — flag NULL (unknown, not outlier)."""
    med = grouped_quantiles(df, group_cols, col, {"__med": 0.5}) \
        .select(*group_cols, "__med")
    j1 = _threshold_join(df, med, group_cols, pin_broadcast)
    dev = j1.select(*group_cols,
                    F.abs(F.col(col) - F.col("__med")).alias("__dev"))
    mad = grouped_quantiles(dev, group_cols, "__dev", {"__mad": 0.5}) \
        .select(*group_cols, "__mad")
    return (_threshold_join(j1, mad, group_cols, pin_broadcast)
            .withColumn(
                out_col,
                F.when(F.col(col).isNull() | F.col("__med").isNull(),
                       F.lit(None).cast("boolean"))
                .otherwise(F.abs(F.col(col) - F.col("__med"))
                           > F.lit(k) * F.col("__mad")))
            .drop("__med", "__mad"))


# ---------------------------------------------------------------------------
# mergeable quantile-sketch tier: raw continuous doubles, O(sketch) not
# O(distinct)
# ---------------------------------------------------------------------------

def _np_rank_est(vals, ranks, rows: int, xs):
    """Vectorized estimate of #rows with value < x under one equi-depth
    summary (numpy port of sketches._FieldSketch._raw_rank: the stored
    (rank, value) pairs bracket x; take the known lower bound + 1)."""
    import numpy as np

    j = np.searchsorted(vals, xs, side="left")
    jm = np.clip(j - 1, 0, len(ranks) - 1)
    jc = np.clip(j, 0, len(ranks) - 1)
    inner = np.minimum(ranks[jm] + 1, ranks[jc])
    return np.where(j == 0, 0, np.where(j == len(vals), rows, inner))


def _summaries_to_arrays(rows_iter):
    """Group collected (pid, rank, value, rows) records into per-pid
    numpy summaries [(ranks, sorted values, rows), ...]."""
    import numpy as np

    by_pid: dict[int, list] = {}
    for pid, rank, value, rows in rows_iter:
        by_pid.setdefault(pid, []).append((rank, value, rows))
    out = []
    for pid in sorted(by_pid):
        recs = sorted(by_pid[pid])
        out.append((np.array([r[0] for r in recs], dtype=np.int64),
                    np.array([r[1] for r in recs], dtype=np.float64),
                    int(recs[0][2])))
    return out


def _rank_union_pick(parts, targets):
    """For each target rank, the candidate value (union of all stored
    summary values) whose summed rank estimate is nearest — ties to the
    smaller value (deterministic). Returns (picked values, their
    estimated ranks)."""
    import numpy as np

    cands = np.unique(np.concatenate([p[1] for p in parts]))
    cr = np.zeros(len(cands), dtype=np.int64)
    for ranks, vals, rows in parts:
        cr += _np_rank_est(vals, ranks, rows, cands)
    t = np.asarray(targets, dtype=np.int64)
    j = np.clip(np.searchsorted(cr, t, side="left"), 0, len(cands) - 1)
    jm = np.clip(j - 1, 0, len(cands) - 1)
    pick = np.where(np.abs(cr[jm] - t) <= np.abs(cr[j] - t), jm, j)
    return cands[pick], cr[pick]


def sketch_quantiles(df: DataFrame, col: str, qs: list[float],
                     k: int = 2048, merge_groups: int | None = 64
                     ) -> tuple[list[float | None], int]:
    """Quantile ESTIMATES over a raw continuous double column in one
    pass, O(sketch) not O(distinct) — the tier :func:`exact_quantiles`
    defers to when values are near-unique (its histogram would be the
    column; module doc says "quantize first", this is the no-quantize
    alternative). Returns ``(values, n)``.

    Shape (the mergeable-sketch tree, reference analog: the per-file
    DataSketches sidecars unioned driver-side,
    java/common/sketches/src/main/java/sleeper/sketches/Sketches.java:45-62):

    - level 0 — ``mapInArrow`` per partition: sort the partition's
      values (numpy, no Python-object rows), keep <= k+1 evenly spaced
      (rank, value) samples + the row count. Output is P*(k+1) tiny
      rows; the full column never leaves the executors.
    - level 1 (``merge_groups`` is not None) — ``applyInPandas`` over
      ``pid % merge_groups``: rank-union each group's summaries into
      ONE <= k+1-entry summary. Caps what the driver collects at
      ``merge_groups * (k+1)`` rows however many partitions the scan
      has — the 100 TB knob (at P=10^5, level 0 alone would hand the
      driver 10^8 rows).
    - final — driver rank-union over the collected summaries, answer
      every q as the candidate value with summed rank estimate nearest
      ``ceil(q*n)`` (percentile_disc-flavored: always an actual data
      value).

    Error: each level's sampling contributes <= n/k rank error and the
    candidate spacing another <= n/k, so the returned value's TRUE rank
    is within ``~4n/k`` of ``ceil(q*n)`` (<= 2n/k with
    ``merge_groups=None``). Use :data:`sketch_rank_budget` for the
    documented bound.

    Determinism: the result is a pure function of (data, partitioning,
    k, merge_groups) — no RNG anywhere. A stable file layout (a parquet
    scan with fixed maxPartitionBytes, no preceding shuffle) therefore
    reproduces bit-for-bit across runs; after a repartition() the
    estimate may legally move within the rank budget, which is why the
    registry oracle checks the budget, not the value. NaNs are rejected
    loudly (they have no rank); NULLs are excluded like every order
    statistic here."""
    import numpy as np
    import pyarrow as pa

    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile {q} outside [0, 1]")
    src = (df.where(F.col(col).isNotNull())
           .select(F.col(col).cast("double").alias("v"),
                   F.spark_partition_id().alias("pid")))
    out_schema = "pid long, rank long, value double, rows long"

    def summarize(batches):
        chunks, pid = [], None
        for b in batches:
            if b.num_rows:
                chunks.append(b.column(0).to_numpy(zero_copy_only=False))
                pid = b.column(1)[0].as_py()
        if not chunks:
            return
        v = np.concatenate(chunks)
        if np.isnan(v).any():
            raise ValueError(
                f"sketch_quantiles: NaN in column {col!r} — NaN has no "
                "rank; filter or impute first")
        v.sort()
        n = len(v)
        ranks = np.array(_spaced_ranks(n, k), dtype=np.int64)
        yield pa.RecordBatch.from_arrays(
            [pa.array(np.full(len(ranks), pid), type=pa.int64()),
             pa.array(ranks), pa.array(v[ranks]),
             pa.array(np.full(len(ranks), n), type=pa.int64())],
            names=["pid", "rank", "value", "rows"])

    summaries = src.mapInArrow(summarize, out_schema)

    if merge_groups is not None:
        def merge_group(pdf):
            import pandas as pd
            parts = _summaries_to_arrays(
                zip(pdf["pid"], pdf["rank"], pdf["value"], pdf["rows"]))
            total = sum(p[2] for p in parts)
            targets = np.array(_spaced_ranks(total, k), dtype=np.int64)
            vals, _ = _rank_union_pick(parts, targets)
            gid = int(pdf["gid"].iloc[0])
            return pd.DataFrame({"pid": gid, "rank": targets,
                                 "value": vals, "rows": total})

        summaries = (summaries
                     .withColumn("gid", F.col("pid") % merge_groups)
                     .groupBy("gid")
                     .applyInPandas(merge_group, out_schema))

    parts = _summaries_to_arrays(
        (r["pid"], r["rank"], r["value"], r["rows"])
        for r in summaries.collect())
    if not parts:
        return [None for _ in qs], 0
    n = sum(p[2] for p in parts)
    # the union ranks count rows STRICTLY below a candidate, i.e. the
    # candidate's 0-based position — the percentile_disc target
    # ceil(q*n) is a 1-based cum rank, so aim one below it
    targets = [max(1, math.ceil(q * n)) - 1 for q in qs]
    vals, _ = _rank_union_pick(parts, targets)
    return [float(v) for v in vals], n


def sketch_rank_budget(n: int, k: int = 2048,
                       merge_groups: int | None = 64) -> int:
    """The documented worst-case |true_rank - ceil(q*n)| for
    :func:`sketch_quantiles` output (see its error paragraph), plus a
    small constant for endpoint rounding. Integer arithmetic (never
    float ceil) so a SQL oracle reproduces it exactly at any n."""
    levels = 4 if merge_groups is not None else 2
    return -(-(levels * n) // k) + 8


def grouped_sketch_quantiles(df: DataFrame, group_cols: list[str],
                             col: str, qs: dict[str, float],
                             k: int = 2048, merge_groups: int | None = 64
                             ) -> DataFrame:
    """PER-GROUP quantile estimates over a raw continuous double
    column — the grouped twin of :func:`sketch_quantiles`, for the
    case :func:`grouped_quantiles`'s exact histograms degenerate on
    (near-unique values make the per-(group, value) histogram the
    column itself). ``qs`` maps output column name -> q. Returns one
    row per group: group cols, one double per requested q, and ``n``
    (the group's non-NULL count). Same rank-error budget per group as
    the global sketch: the true rank of each returned value is within
    ``sketch_rank_budget(n_group, k, merge_groups)`` of
    ``ceil(q * n_group)``.

    Shape (the same three-level mergeable tree, keyed by group):

    - level 0 — ``mapInArrow`` per partition: numpy-sort each group's
      values WITHIN the partition, emit <= k+1 evenly spaced
      (rank, value) samples + the count per (group, partition). Raw
      rows never leave their executor; the summary stream is
      ``groups-touched-per-partition * (k+1)`` tiny rows.
    - level 1 (``merge_groups`` is not None) — ``applyInPandas`` over
      ``(group, pid % merge_groups)``: rank-union each cell's
      summaries into one. Caps any single downstream task's input at
      ``merge_groups * (k+1)`` rows per group at ANY partition count —
      at P=10^5 a hot group would otherwise feed 2*10^8 summary rows
      into its final task.
    - level 2 — ``applyInPandas`` per group: union the group's
      summaries and answer every q (percentile_disc-flavored: an
      actual data value). One output row per group; nothing is
      collected on the driver.

    Determinism matches the global sketch: a pure function of (data,
    partitioning, k, merge_groups) — no RNG; the registry oracle
    checks the rank budget, not the value. NaNs raise; NULL values are
    excluded; NULL group keys group together (SQL GROUP BY
    semantics)."""
    import numpy as np
    import pyarrow as pa

    reserved = ("pid", "rank", "value", "rows", "gid", "n")
    for g in group_cols:
        if g in reserved:
            raise ValueError(
                f"group column {g!r} collides with a reserved summary "
                f"name {reserved} — alias it before sketching")
    for name, q in qs.items():
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile {q} outside [0, 1]")
        if name in (*group_cols, col, *reserved):
            raise ValueError(
                f"output name {name!r} collides with a group/input "
                "column or a reserved summary name")
    gfields = [df.schema[c] for c in group_cols]
    gschema_ddl = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                            for f in gfields)
    sum_schema = (f"{gschema_ddl}, pid long, rank long, value double, "
                  f"rows long")
    from pyspark.sql import types as ST
    _pa_of = {ST.StringType: pa.string(), ST.LongType: pa.int64(),
              ST.IntegerType: pa.int32(), ST.ShortType: pa.int16(),
              ST.DoubleType: pa.float64(), ST.FloatType: pa.float32(),
              ST.BinaryType: pa.binary(), ST.BooleanType: pa.bool_(),
              ST.DateType: pa.date32()}
    try:
        g_pa_fields = [pa.field(f.name, _pa_of[type(f.dataType)])
                       for f in gfields]
    except KeyError as e:
        raise ValueError(
            f"unsupported group column type {e} for the sketch "
            "summary stream — cast the group key to a scalar type "
            "first") from None
    sum_pa_schema = pa.schema(
        g_pa_fields + [pa.field("pid", pa.int64()),
                       pa.field("rank", pa.int64()),
                       pa.field("value", pa.float64()),
                       pa.field("rows", pa.int64())])
    src = (df.where(F.col(col).isNotNull())
           .select(*group_cols,
                   F.col(col).cast("double").alias("__v"),
                   F.spark_partition_id().alias("__pid")))

    def summarize(batches):
        tbl_batches = [b for b in batches if b.num_rows]
        if not tbl_batches:
            return
        pdf = pa.Table.from_batches(tbl_batches).to_pandas()
        pid = int(pdf["__pid"].iloc[0])
        out = {c: [] for c in group_cols}
        ranks_out, vals_out, rows_out = [], [], []
        import pandas as pd
        for gkey, sub in pdf.groupby(group_cols, dropna=False,
                                     sort=False):
            gkey = gkey if isinstance(gkey, tuple) else (gkey,)
            v = sub["__v"].to_numpy(dtype=np.float64, copy=True)
            if np.isnan(v).any():
                raise ValueError(
                    f"grouped_sketch_quantiles: NaN in column {col!r}"
                    " — NaN has no rank; filter or impute first")
            v.sort()
            n = len(v)
            ranks = np.array(_spaced_ranks(n, k), dtype=np.int64)
            for c, gv in zip(group_cols, gkey):
                out[c].extend([None if pd.isna(gv) else gv]
                              * len(ranks))
            ranks_out.extend(ranks.tolist())
            vals_out.extend(v[ranks].tolist())
            rows_out.extend([n] * len(ranks))
        arrays = [pa.array(out[f.name], type=f.type)
                  for f in sum_pa_schema if f.name in out]
        arrays += [
            pa.array([pid] * len(ranks_out), type=pa.int64()),
            pa.array(ranks_out, type=pa.int64()),
            pa.array(vals_out, type=pa.float64()),
            pa.array(rows_out, type=pa.int64())]
        yield from pa.table(arrays,
                            schema=sum_pa_schema).to_batches()

    summaries = src.mapInArrow(summarize, sum_schema)

    if merge_groups is not None:
        def merge_cell(key, pdf):
            import pandas as pd
            parts = _summaries_to_arrays(
                zip(pdf["pid"], pdf["rank"], pdf["value"], pdf["rows"]))
            total = sum(p[2] for p in parts)
            targets = np.array(_spaced_ranks(total, k), dtype=np.int64)
            vals, _ = _rank_union_pick(parts, targets)
            gid = int(key[-1])
            data = {c: [kv] * len(targets)
                    for c, kv in zip(group_cols, key[:-1])}
            data.update({"pid": gid, "rank": targets, "value": vals,
                         "rows": total})
            return pd.DataFrame(data)

        summaries = (summaries
                     .withColumn("gid", F.col("pid") % merge_groups)
                     .groupBy(*group_cols, "gid")
                     .applyInPandas(merge_cell, sum_schema))

    qnames = list(qs)
    out_schema = (f"{gschema_ddl}, "
                  + ", ".join(f"`{name}` double" for name in qnames)
                  + ", n long")

    def finalize(key, pdf):
        import pandas as pd
        parts = _summaries_to_arrays(
            zip(pdf["pid"], pdf["rank"], pdf["value"], pdf["rows"]))
        n = sum(p[2] for p in parts)
        targets = [max(1, math.ceil(q * n)) - 1 for q in qs.values()]
        vals, _ = _rank_union_pick(parts, targets)
        data = {c: [kv] for c, kv in zip(group_cols, key)}
        data.update({name: [float(v)]
                     for name, v in zip(qnames, vals)})
        data["n"] = [n]
        return pd.DataFrame(data)

    return summaries.groupBy(*group_cols).applyInPandas(
        finalize, out_schema)


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


def heavy_hitters(df: DataFrame, col: str, k: int,
                  with_share: bool = False) -> DataFrame:
    """EXACTLY the values of ``col`` with frequency > n/k, with exact
    counts — heavy-hitter mining (dominant tokens, hot keys, spam
    boilerplate) when the column's cardinality is far too large for
    ``groupBy(col).count()`` to shuffle (a 100 TB token column has
    billions of distinct values; its heavy hitters number at most k-1).
    Complements :func:`sleeper_spark.functions.frequency.sharded_top_items`
    (exact TOP-K, one full-cardinality hash agg — right when distinct
    values fit a shuffle): this is the THRESHOLD query (all values over
    an n/k share) whose shuffle stays O(k x P) at any cardinality.

    Two passes, both bounded:

    1. CANDIDATES — per-partition Misra-Gries with k-1 counters
       (``mapInArrow``; per Arrow batch a vectorized ``value_counts``
       merges into the summary, then one decrement step caps it). If a
       value's GLOBAL count exceeds n/k it must exceed n_p/k in SOME
       partition (pigeonhole over the partition sums), and Misra-Gries
       never evicts such a value, so the union of survivors is a
       SUPERSET of every true heavy hitter: no false negatives. At most
       (k-1) x P candidate rows total leave the executors.
    2. RECOUNT — the distinct candidates broadcast back onto the scan
       (left-semi), an exact hash-agg counts ONLY matching rows
       (map-side combine reduces each partition to <= k-1 rows), and
       ``count * k > n`` keeps exactly the true heavy hitters: no false
       positives. Integer comparison — no float threshold drift, so a
       SQL oracle (``HAVING count(*) * k > n``) matches bit-for-bit.

    The shuffle carries O(k x P) rows regardless of cardinality; the
    driver holds nothing but n. The candidate broadcast is safe BY
    CONSTRUCTION (unlike an unbounded per-group threshold table): k is
    bounded by pass 1's per-partition counter memory, so k x P strings
    is small wherever pass 1 could run at all. Values compare as strings (the summary
    dict keys the string form; the recount casts both sides), so mixed
    exact numeric types dedupe textually — cast upstream if that
    matters. NULLs are excluded (a NULL is not a value). Deterministic:
    candidate survival may vary with partitioning, but the RECOUNTED
    output set is a pure function of the data."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    src = (df.where(F.col(col).isNotNull())
           .select(F.col(col).cast("string").alias("v")))

    cap = k - 1

    def mg(batches):
        counts: dict[str, int] = {}
        for b in batches:
            if not b.num_rows:
                continue
            vc = pc.value_counts(b.column(0))
            for val, cnt in zip(vc.field("values").to_pylist(),
                                vc.field("counts").to_pylist()):
                counts[val] = counts.get(val, 0) + cnt
            if len(counts) > cap:
                # subtract the (cap+1)-th largest count from all: the
                # Misra-Gries decrement, batched — undercounts by at
                # most n_p/k total, never evicts a local heavy hitter
                cut = sorted(counts.values(), reverse=True)[cap]
                counts = {v: c - cut for v, c in counts.items()
                          if c > cut}
        if counts:
            yield pa.RecordBatch.from_arrays(
                [pa.array(list(counts.keys()), type=pa.string())],
                names=["v"])

    candidates = src.mapInArrow(mg, "v string").distinct()
    n = src.count()
    hits = (src.join(F.broadcast(candidates), "v", "leftsemi")
            .groupBy("v").agg(F.count(F.lit(1)).alias("n_rows"))
            .where(F.col("n_rows") * k > F.lit(n)))
    if with_share:
        hits = hits.withColumn(
            "share", F.col("n_rows") / F.lit(n).cast("double"))
    return hits


def grouped_robust_scale(df: DataFrame, group_cols: list[str], col: str,
                         out_col: str | None = None,
                         pin_broadcast: bool = False) -> DataFrame:
    """Robust per-group feature scaling: ``(x - median_g) / MAD_g`` —
    sklearn's RobustScaler shape, per domain, with EXACT order
    statistics (a z-score's mean/stddev are dragged arbitrarily far by
    one corrupt row; the median/MAD pair is not, and unlike
    float-summed means it is deterministic, so a SQL oracle reproduces
    the scaled doubles bit-for-bit — subtraction and division of
    identical IEEE operands). Two :func:`grouped_quantiles` passes
    joined back adaptively (:func:`_threshold_join`), scaling itself
    codegen'd. NULL x, an all-NULL group, and a zero-MAD group (scale
    undefined: >=half the group sits AT the median) all yield NULL."""
    out = out_col or f"{col}_scaled"
    med = grouped_quantiles(df, group_cols, col, {"__med": 0.5}) \
        .select(*group_cols, "__med")
    j1 = _threshold_join(df, med, group_cols, pin_broadcast)
    dev = j1.select(*group_cols,
                    F.abs(F.col(col) - F.col("__med")).alias("__dev"))
    mad = grouped_quantiles(dev, group_cols, "__dev", {"__mad": 0.5}) \
        .select(*group_cols, "__mad")
    return (_threshold_join(j1, mad, group_cols, pin_broadcast)
            .withColumn(
                out,
                F.when(F.col(col).isNull() | F.col("__med").isNull()
                       | (F.col("__mad") == 0.0), F.lit(None)
                       .cast("double"))
                .otherwise((F.col(col) - F.col("__med"))
                           / F.col("__mad")))
            .drop("__med", "__mad"))


def grouped_cdf(df: DataFrame, group_cols: list[str], col: str,
                out_col: str = "cdf") -> DataFrame:
    """Empirical CDF / percentile-rank transform per group:
    ``P(X <= x)`` within the row's own group — the rank-based feature
    normalisation (a value's standing among its peers) that, unlike
    min-max or z-score, is invariant to the group's scale and outliers
    entirely. The inverse view of :func:`grouped_quantiles`.

    Shape: one hash-agg to the per-(group, value) histogram (cost ∝
    distinct values), a group-partitioned window cumsum over it, and a
    join back on (group, value) — the raw rows never enter a window,
    so a group with billions of rows but bounded distinct values costs
    its histogram, not its row count. cdf = cum/n is a long/long IEEE
    division — any SQL engine's ``cume_dist()`` reproduces it
    bit-for-bit. NULL values (and rows of an all-NULL group) get NULL."""
    keys = [*group_cols, col]
    hist = (df.where(F.col(col).isNotNull())
            .groupBy(*keys).agg(F.count(F.lit(1)).alias("__cnt")))
    w = Window.partitionBy(*group_cols).orderBy(col)
    wg = Window.partitionBy(*group_cols)
    cd = (hist.withColumn("__cum", F.sum("__cnt").over(w))
          .withColumn("__n", F.sum("__cnt").over(wg))
          .select(*keys,
                  (F.col("__cum") / F.col("__n")).alias(out_col)))
    return df.join(cd, keys, "left")
