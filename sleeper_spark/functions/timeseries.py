"""Time-series joins Spark lacks natively, composed from DataFrame
primitives so Catalyst still owns the physical plan.

``asof_join`` — for each left row, attach the most recent right row at
or before the left timestamp, per key (the kdb/pandas ``merge_asof``
backward join; DuckDB's native ``ASOF JOIN`` is the test oracle).

The classic distributed realisation is union + sort + carry-forward,
NOT a join node: tag both sides, sort each key's timeline once, and
carry the latest right payload down the timeline with a running
``last(ignorenulls)`` window. One shuffle on the key columns, linear
scan per key, O(1) running state — no range-condition join that Spark
would plan as a broadcast-nested-loop, and no per-row Python. Skewed
keys are ordinary window skew (AQE handles them like any hot key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TS = "__asof_ts__"
_SIDE = "__asof_side__"
_PAYLOAD = "__asof_p__"
_LEFTROW = "__asof_l__"


def asof_join(left: DataFrame, right: DataFrame, on: list[str],
              left_ts: str, right_ts: str,
              allow_exact: bool = True) -> DataFrame:
    """Backward as-of join: left columns + the right row with the
    largest ``right_ts`` <= ``left_ts`` (strictly < when ``allow_exact``
    is False) sharing the ``on`` keys; right columns are null when no
    such row exists. Right rows should be unique per (on, right_ts) —
    pre-aggregate otherwise, or which duplicate wins is unspecified.

    Output columns: left's columns, then right's non-key non-ts columns.
    """
    r_payload_cols = [c for c in right.columns
                      if c not in on and c != right_ts]
    l_cols = [c for c in left.columns]

    r = right.select(
        *on,
        F.col(right_ts).alias(_TS),
        # rights sort before lefts at equal ts iff exact matches count
        F.lit(0 if allow_exact else 1).alias(_SIDE),
        F.struct(*[F.col(c) for c in r_payload_cols]).alias(_PAYLOAD),
        F.lit(None).cast(
            left.select(F.struct(*l_cols)).schema[0].dataType
        ).alias(_LEFTROW),
    )
    l = left.select(
        *on,
        F.col(left_ts).alias(_TS),
        F.lit(1 if allow_exact else 0).alias(_SIDE),
        F.lit(None).cast(
            right.select(F.struct(*r_payload_cols)).schema[0].dataType
        ).alias(_PAYLOAD),
        F.struct(*[F.col(c) for c in l_cols]).alias(_LEFTROW),
    )
    w = (Window.partitionBy(*on)
         .orderBy(F.col(_TS).asc(), F.col(_SIDE).asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = F.last(_PAYLOAD, ignorenulls=True).over(w)
    timeline = r.unionByName(l).withColumn(_PAYLOAD, carried)
    out = timeline.where(F.col(_LEFTROW).isNotNull())
    return out.select(
        *[F.col(f"{_LEFTROW}.{c}").alias(c) for c in l_cols],
        *[F.col(f"{_PAYLOAD}.{c}").alias(c) for c in r_payload_cols],
    )
