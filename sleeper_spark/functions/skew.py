"""Skew-handling operators: the levers for hot keys at 1000-executor
scale.

Spark's own defenses come first — AQE splits skewed SORT-MERGE join
partitions automatically (``spark.sql.adaptive.skewJoin``), hash
aggregation does map-side partial combine, and a small dimension should
simply be ``broadcast()``. These helpers cover the cases those don't:

- :func:`salted_join` — equi-join where ONE side carries a pathological
  hot key and the other is too large to broadcast: the hot side gets a
  random salt, the other side is replicated ``salts`` ways, so the hot
  key's rows spread over ``salts`` reducers instead of one.
- :func:`two_stage_count_distinct` — exact per-key COUNT(DISTINCT x)
  without funnelling every distinct value of a hot key through one
  reducer: stage 1 distincts on (key, x) — spreading by value — and
  stage 2 counts the survivors, which partial-combines map-side.

Both produce results IDENTICAL to the naive plan (the salt never leaks
into the output), so they swap in mechanically when a key histogram
goes hot."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__sleeper_salt__"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    salts: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Skew-safe equi-join: salt the (big, skewed) left side, replicate
    the right side ``salts`` ways, join on keys + salt.

    Each left row joins exactly one replica, so inner/left semantics are
    preserved exactly; right/full outer would duplicate unmatched right
    rows per replica and are rejected. The cost model: right side grows
    ``salts``x through the shuffle — worth it precisely when the
    alternative is one reducer owning a hot key's entire row set.
    """
    if how not in ("inner", "left", "leftouter", "left_outer", "semi",
                   "leftsemi", "left_semi", "anti", "leftanti", "left_anti"):
        raise ValueError(
            f"salted_join preserves semantics only for inner/left-ish "
            f"joins, not {how!r} (right rows would duplicate per salt)")
    l = left.withColumn(_SALT, F.floor(F.rand(seed) * salts).cast("int"))
    # explode must be a top-level generator (not nested under a cast);
    # sequence of int literals already yields array<int>
    r = right.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salts - 1))))
    out = l.join(r, on + [_SALT], how)
    return out.drop(_SALT)


def two_stage_count_distinct(
    df: DataFrame,
    keys: list[str],
    col: str,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Exact per-key COUNT(DISTINCT col) that survives hot keys: the
    first shuffle partitions by (key, value) — a hot key's values spread
    across the cluster — and the second is a plain count per key whose
    partial aggregation combines map-side. Equivalent output to
    ``groupBy(keys).agg(countDistinct(col))``, which ships every
    (key, value) pair of a hot key to a single reducer's hash set.

    ``count(col)`` (not ``count(*)``) over the distinct rows preserves
    countDistinct's null semantics exactly: NULL is not a value, and a
    key whose values are all NULL still appears with count 0."""
    return (
        df.select(*keys, col).distinct()
        .groupBy(*keys)
        .agg(F.count(F.col(col)).alias(out_col))
    )
