"""Heavy hitters: exact sharded top-k, mergeable per-file frequent-item
summaries, and a skew advisor that turns them into salting decisions.

Scale design:

- **Sharded top-k** (:func:`sharded_top_items`): two-phase exact top-k
  with a provable completeness bound. Phase 1 is one combine-friendly
  hash aggregation (partial counts map-side). Phase 2 assigns each
  VALUE to one of B shards by a portable hash and keeps the top-m per
  shard with a window rank — Spark plans a partial WindowGroupLimit, so
  the per-shard prune happens before the exchange and at most B×m rows
  reach the final ordering. Because a value lives in exactly ONE shard,
  every surviving count is EXACT, and any value whose true count
  exceeds its shard's cut-off threshold is guaranteed present — the
  summary is lossless for heavy hitters, never "approximately right".
- **Per-file summaries** (:func:`per_file_top_items` /
  :func:`merge_top_summaries`): the sidecar flavor. Each file carries
  its exact top-m (value, count) plus the largest EXCLUDED count (its
  threshold). Merging is pure driver math: a value's true table count
  is bounded by [sum of counts where present, + sum of thresholds
  where absent], and anything with true count > Σ thresholds MUST
  appear — the classic mergeable frequent-items guarantee (Misra-Gries
  family), obtained here with exact per-file counts so small tables
  degrade to exact answers. Files keep their summary forever; steady
  state after ingest/compaction churn scans only NEW files (same lazy
  sidecar design as the HLL registers and quantile sketches).
- **Skew advisor** (:func:`advise_salting`): hot keys whose upper-bound
  count exceeds a multiple of the average per-partition row share get a
  salt factor sized to spread them back to average — the decision
  feeding :func:`sleeper_spark.functions.skew.salted_join`, made from
  sidecar math instead of a data scan.

Reference analog: none (the reference has no frequency sketches); the
sidecar lifecycle mirrors its quantile-sketch design
(java/common/sketches, rust/sleeper_core/src/datafusion/sketch_udf.rs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def shard_id(col: Column | str, shards: int) -> Column:
    """Portable value→shard hash: first 4 hex chars of md5, mod B —
    the same engine-stable construction as the HLL register
    (functions/cardinality.py), reproducible in any SQL engine."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.conv(F.substring(F.md5(c.cast("string")), 1, 4), 16, 10)
            .cast("int") % shards).alias("shard")


def sharded_top_items(
    df: DataFrame,
    col: str,
    k: int = 10,
    shards: int = 16,
    m: int | None = None,
) -> DataFrame:
    """EXACT global top-k values of ``col`` by count, via per-shard
    pruning: (value, n) rows, ordered by (n desc, value) — ties
    deterministic. ``m`` (per-shard keep, default ``k``) must be >= k
    for exactness: the global #k item is at worst #k within its own
    shard. NULLs are not counted. Output rows are bounded at k whatever
    the input size; intermediate rows at shards×m."""
    m = k if m is None else m
    if m < k:
        raise ValueError(f"per-shard keep m={m} < k={k} loses exactness")
    counts = (df.where(F.col(col).isNotNull())
              .groupBy(F.col(col).alias("v"))
              .agg(F.count("*").alias("n")))
    w = (Window.partitionBy(shard_id("v", shards))
         .orderBy(F.col("n").desc(), F.col("v")))
    pruned = (counts.withColumn("__r", F.row_number().over(w))
              .where(F.col("__r") <= m).drop("__r"))
    return pruned.orderBy(F.col("n").desc(), "v").limit(k)


def oracle_sharded_top_sql(table: str, col: str, k: int = 10,
                           shards: int = 16, m: int | None = None) -> str:
    """DuckDB SQL replaying :func:`sharded_top_items` bit-for-bit:
    same md5 shard, same per-shard prune, same (n desc, v) order."""
    m = k if m is None else m
    return (
        "WITH counts AS (SELECT {col} AS v, count(*) AS n FROM {table} "
        "WHERE {col} IS NOT NULL GROUP BY {col}), "
        "sharded AS (SELECT v, n, "
        "CAST(CAST('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 4) AS INTEGER) "
        "% {shards} AS INTEGER) AS shard FROM counts), "
        "ranked AS (SELECT v, n, row_number() OVER "
        "(PARTITION BY shard ORDER BY n DESC, v) AS r FROM sharded) "
        "SELECT v, n FROM ranked WHERE r <= {m} "
        "ORDER BY n DESC, v LIMIT {k}"
    ).format(table=table, col=col, shards=shards, m=m, k=k)


# ---------------------------------------------------------------------------
# per-file mergeable summaries (the sidecar flavor)
# ---------------------------------------------------------------------------

def per_file_top_items(spark, paths: list[str], col: str,
                       m: int = 32) -> dict[str, dict]:
    """Exact top-m (value, count) of ``col`` for EACH file, in ONE
    Spark job (scan once, group by input_file_name()), plus each file's
    exclusion threshold (the largest count that did NOT make its top-m;
    0 when the file has <= m distinct values — the summary is then the
    file's complete histogram) and the file's non-null row total.

    Returns ``{path: {"top": [(value, count), ...],  # (count desc, value)
    "threshold": int, "rows": int}}`` keyed by the input paths."""
    if not paths:
        return {}
    import os
    df = spark.read.parquet(*paths)
    counts = (df.where(F.col(col).isNotNull())
              .select(F.input_file_name().alias("__file"),
                      F.col(col).alias("v"))
              .groupBy("__file", "v")
              .agg(F.count("*").alias("n")))
    w = (Window.partitionBy("__file")
         .orderBy(F.col("n").desc(), F.col("v")))
    rows = (counts.withColumn("__r", F.row_number().over(w))
            # m+1-th row IS the threshold — keep it, mark it
            .where(F.col("__r") <= m + 1)
            .collect())
    totals = {r["__file"]: r["t"] for r in
              counts.groupBy("__file").agg(F.sum("n").alias("t")).collect()}
    by_base: dict[str, dict] = {
        os.path.basename(p): {"top": [], "threshold": 0, "rows": 0}
        for p in paths}
    order: dict[str, list] = {}
    for r in rows:
        order.setdefault(os.path.basename(r["__file"]), []).append(r)
    for base, rs in order.items():
        rs.sort(key=lambda r: r["__r"])
        s = by_base[base]
        s["top"] = [(r["v"], r["n"]) for r in rs[:m]]
        if len(rs) > m:
            s["threshold"] = rs[m]["n"]
    for f, t in totals.items():
        by_base[os.path.basename(f)]["rows"] = t
    return {p: by_base[os.path.basename(p)] for p in paths}


def merge_top_summaries(summaries: list[dict]) -> list[tuple]:
    """Merge per-file summaries into global candidate bounds:
    ``[(value, lower, upper)]`` sorted by (upper desc, value).

    lower = Σ counts over files where the value made the top-m (exact
    contributions); upper = lower + Σ thresholds of the other files (a
    file can hide at most threshold occurrences of any absent value).
    Guarantee: true count ∈ [lower, upper] for every candidate, and
    every value with true count > Σ all thresholds appears as a
    candidate — heavy hitters cannot be missed. Pure driver math, no
    data reads."""
    present: dict = {}
    for i, s in enumerate(summaries):
        for v, n in s["top"]:
            present.setdefault(v, {})[i] = n
    out = []
    for v, by_file in present.items():
        lower = sum(by_file.values())
        upper = lower + sum(
            s["threshold"] for i, s in enumerate(summaries)
            if i not in by_file)
        out.append((v, lower, upper))
    out.sort(key=lambda t: (-t[2], str(t[0])))
    return out


def advise_salting(candidates: list[tuple], total_rows: int,
                   n_partitions: int,
                   hot_multiple: float = 2.0) -> list[tuple]:
    """Salting plan from merged heavy-hitter bounds: keys whose UPPER
    count bound exceeds ``hot_multiple`` × the average per-partition
    share get ``salt = ceil(upper / avg_share)`` — enough splits to
    bring the hottest key back to an average-sized partition. Returns
    ``[(value, upper_bound, salt)]`` (empty = no salting needed; feed
    the max salt to functions/skew.salted_join). Driver math only."""
    import math
    if total_rows <= 0 or n_partitions <= 0:
        return []
    avg = total_rows / n_partitions
    plan = []
    for v, _lo, up in candidates:
        if up > hot_multiple * avg:
            plan.append((v, up, int(math.ceil(up / avg))))
    return plan
