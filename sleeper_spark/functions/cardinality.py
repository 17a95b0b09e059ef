"""Engine-portable HyperLogLog distinct-count sketches.

A 100 TB table cannot answer "how many distinct users / documents /
join keys" with an exact ``COUNT(DISTINCT ...)`` every time someone
needs the number: that is a full shuffle of every key. The HLL sketch
here turns the question into one scan that aggregates to AT MOST
``2^p`` rows (the register table), which is then:

- **estimable** driver-side in O(m) (:func:`hll_estimate`),
- **mergeable** by ``max`` per register (:func:`hll_merge`) — so
  per-file / per-partition / per-day sketches combine without
  rescanning anything, the same sidecar algebra as the quantile
  sketches (``sketches.py``), and
- **engine-portable**: registers derive from ``md5`` + pure string
  ops only (no engine-specific hash), so a DuckDB oracle reproduces
  the register table BIT-FOR-BIT — the correctness gate checks the
  sketch itself, not just a tolerance band around the estimate.

Spark's built-in ``approx_count_distinct`` covers the one-shot case;
this module exists for the *algebraic* uses it cannot serve: sidecars
merged across files, incremental maintenance under LSM compaction,
and cross-engine verification.

Reference analog: per-file DataSketches sidecars
(java/sketches/src/main/java/sleeper/sketches/Sketches.java) — the
reference ships quantile sketches only; distinct-count sidecars are a
beyond-reference addition in the same design.

Layout: 128-bit md5 → first 4 hex chars (16 bits) select the register
(``% 2^p`` is exact for p <= 16, no modulo bias); the next 13 hex
chars (52 bits) give the rank rho = leading zero bits + 1 (all-zero
window → rho = 53). Rho is computed with regexp/CASE string ops so
both engines agree on every row regardless of their integer-parsing
quirks.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hll_register",
    "hll_rho",
    "distinct_count_sketch",
    "hll_merge",
    "hll_estimate",
    "approx_distinct",
    "oracle_sketch_sql",
]

#: hex chars of the rho window (52 bits); an all-zero window scores 53
RHO_HEX = 13
MAX_RHO = 4 * RHO_HEX + 1


def _md5(col: Column) -> Column:
    return F.md5(col.cast("string"))


def hll_register(col: Column, p: int = 12) -> Column:
    """Register index in [0, 2^p) from the first 16 hash bits."""
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    return (F.conv(F.substring(_md5(col), 1, 4), 16, 10)
            .cast("int") % (1 << p)).alias("register")


def hll_rho(col: Column) -> Column:
    """Rank: leading zero bits of the 52-bit window, plus one.

    String-arithmetic on the hex form — 4 bits per leading '0' char,
    then a CASE over the first nonzero digit — so the value is
    identical in any engine with md5/regexp/CASE.
    """
    w = F.substring(_md5(col), 5, RHO_HEX)
    zeros = F.length(F.regexp_extract(w, "^0*", 0))
    d = F.substring(w, zeros + 1, F.lit(1))
    extra = (F.when(d.isin("8", "9", "a", "b", "c", "d", "e", "f"), 0)
             .when(d.isin("4", "5", "6", "7"), 1)
             .when(d.isin("2", "3"), 2)
             .otherwise(3))  # '1' (the '' all-zero case is handled below)
    return (F.when(zeros == RHO_HEX, F.lit(MAX_RHO))
            .otherwise(zeros * 4 + extra + 1)
            .cast("int").alias("rho"))


def distinct_count_sketch(df: DataFrame, col: str, p: int = 12) -> DataFrame:
    """(register, rho_max) HLL sketch of a column: one scan, partial+final
    hash aggregation, output bounded at 2^p rows whatever the input
    size. NULLs are not counted (SQL COUNT DISTINCT semantics)."""
    c = F.col(col)
    return (df.where(c.isNotNull())
            .select(hll_register(c, p), hll_rho(c))
            .groupBy("register")
            .agg(F.max("rho").alias("rho_max")))


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Union of the underlying sets = per-register MAX of the sketches.
    This is the whole point of carrying sketches as sidecars: merging
    is a (<= 2^p x n_sketches)-row aggregate, never a data rescan."""
    it = iter(sketches)
    out = next(it)
    for s in it:
        out = out.unionByName(s)
    return out.groupBy("register").agg(F.max("rho_max").alias("rho_max"))


def hll_estimate(registers: list[tuple[int, int]], p: int = 12) -> float:
    """Cardinality estimate from collected (register, rho_max) rows.

    Classic HLL: alpha_m * m^2 / sum(2^-rho) with linear counting for
    the small range (Flajolet et al. 2007, §4). Driver-side O(m) math
    over an already-bounded table — never a Spark job.
    """
    m = 1 << p
    if m >= 128:
        alpha = 0.7213 / (1 + 1.079 / m)
    elif m == 64:
        alpha = 0.709
    elif m == 32:
        alpha = 0.697
    else:
        alpha = 0.673
    by_reg = {r: rho for r, rho in registers}
    inv_sum = sum(2.0 ** -by_reg.get(i, 0) for i in range(m))
    raw = alpha * m * m / inv_sum
    zeros = m - len(by_reg)
    if raw <= 2.5 * m and zeros > 0:
        return m * math.log(m / zeros)
    return raw


def approx_distinct(df: DataFrame, col: str, p: int = 12) -> float:
    """One-call estimate: sketch + collect (<= 2^p rows) + estimate."""
    rows = distinct_count_sketch(df, col, p).collect()
    return hll_estimate([(r["register"], r["rho_max"]) for r in rows], p)


def per_file_sketches(spark, paths: list[str], col: str,
                      p: int = 12) -> dict[str, list[tuple[int, int]]]:
    """HLL sketch of ``col`` for EACH file in one Spark job: scan all
    paths once, group by ``input_file_name()`` — (n_files x <= 2^p)
    result rows, md5 JVM-side. This is the lazy sidecar builder for
    table-level NDV: files keep their own mergeable sketch, so later
    estimates over any live-file subset are pure driver math.

    Returns {path: [(register, rho_max), ...]} keyed by the input
    paths (matched on basename — file sources return URI forms)."""
    if not paths:
        return {}
    import os
    df = spark.read.parquet(*paths)
    c = F.col(col)
    rows = (df.where(c.isNotNull())
            .select(F.input_file_name().alias("__file"),
                    hll_register(c, p), hll_rho(c))
            .groupBy("__file", "register")
            .agg(F.max("rho").alias("rho_max"))
            .collect())
    by_base: dict[str, list[tuple[int, int]]] = {
        os.path.basename(p_): [] for p_ in paths}
    for r in rows:
        base = os.path.basename(r["__file"])
        by_base.setdefault(base, []).append((r["register"], r["rho_max"]))
    return {p_: by_base[os.path.basename(p_)] for p_ in paths}


def oracle_sketch_sql(table: str, col: str, p: int = 12) -> str:
    """ANSI SQL reproducing :func:`distinct_count_sketch` bit-for-bit
    (DuckDB-compatible), for oracle checks: same md5, same string
    arithmetic, same register/rho values."""
    m = 1 << p
    return (
        "WITH h AS (SELECT md5(CAST({col} AS VARCHAR)) AS hx "
        "FROM {table} WHERE {col} IS NOT NULL), "
        "parts AS (SELECT "
        "CAST(CAST('0x' || substr(hx, 1, 4) AS INTEGER) % {m} AS INTEGER) "
        "AS register, "
        "length(regexp_extract(substr(hx, 5, {w}), '^0*')) AS zeros, "
        "substr(substr(hx, 5, {w}), "
        "length(regexp_extract(substr(hx, 5, {w}), '^0*')) + 1, 1) AS d "
        "FROM h) "
        "SELECT register, CAST(max(CASE WHEN zeros = {w} THEN {maxrho} "
        "ELSE zeros * 4 + (CASE WHEN d IN ('8','9','a','b','c','d','e','f') "
        "THEN 0 WHEN d IN ('4','5','6','7') THEN 1 "
        "WHEN d IN ('2','3') THEN 2 ELSE 3 END) + 1 END) AS INTEGER) "
        "AS rho_max FROM parts GROUP BY register"
    ).format(table=table, col=col, m=m, w=RHO_HEX, maxrho=MAX_RHO)
