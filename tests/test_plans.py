"""Physical-plan quality gates: the properties that make the engine hold
at 100 TB must stay visible in `.explain` output.

- Range predicates reach the Parquet scan (PushedFilters) — row-group and
  page skipping (SURVEY §4 'Predicate pushdown to Parquet').
- Requested-value projection prunes the read schema (ReadSchema).
- Driver-side partition pruning hands Spark only overlapping files
  (SURVEY §4 'Partition pruning' — NOT automatic, ours to guarantee).
- Small dims broadcast: no sort-merge join on the fact table.
- Continual aggregation runs as partial+final hash aggregation (map-side
  combine before the shuffle).
- Top-k plans as TakeOrderedAndProject, never a global sort.
"""

import os
import re
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sleeper_spark import Field, Schema, SleeperTable
from sleeper_spark.properties import TableProperties

SF = "/root/testdata/sf0.01"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def entry(spark):
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as em
    return em


def test_range_predicate_pushed_to_parquet(spark, entry):
    plan = plan_of(entry.q_range_query(spark, SF))
    assert "PushedFilters" in plan
    pushed = plan[plan.index("PushedFilters"):].splitlines()[0]
    assert "GreaterThanOrEqual(event_id,1000)" in pushed
    assert "LessThan(event_id,2000)" in pushed


def test_projection_prunes_read_schema(spark, entry):
    plan = plan_of(entry.q_projection(spark, SF))
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"event_id", "event_type", "value"}


def test_small_dims_broadcast_not_sort_merge(spark, entry):
    plan = plan_of(entry.q_join_agg(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan


def test_continual_agg_is_partial_final(spark, entry):
    plan = plan_of(entry.q_aggregation_sum_min_max(spark, SF))
    # map-side partial + final after one shuffle
    assert plan.count("HashAggregate") >= 2 or plan.count("SortAggregate") >= 2
    assert plan.count("Exchange") <= 2  # ts conversion must not add shuffles


def test_topk_avoids_global_sort(spark, entry):
    plan = plan_of(entry.q_topk(spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_sleeper_query_scans_only_overlapping_partitions(spark, tmp_path):
    """Driver-side pruning: a range query touching one leaf partition
    must scan exactly that partition's file (of 4)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{SF}/events.parquet").select("event_id", "user_id")
    schema = Schema((Field("event_id", T.LongType()),), (),
                    (Field("user_id", T.LongType(), True),))
    t = SleeperTable.create(spark, str(tmp_path / "t"), schema,
                            TableProperties(), split_points=[2500, 5000, 7500])
    t.ingest(ev)
    q = t.range_key_query([("event_id", 100, 200)])
    plan = plan_of(q)
    m = re.search(r"InMemoryFileIndex\((\d+) paths?\)", plan)
    assert m, plan
    assert int(m.group(1)) == 1
    # both the query region and the leaf dedup-guard reach the scan
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(event_id,100)" in plan


def test_sleeper_full_scan_uses_all_files(spark, tmp_path):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{SF}/events.parquet").select("event_id", "user_id")
    schema = Schema((Field("event_id", T.LongType()),), (),
                    (Field("user_id", T.LongType(), True),))
    t = SleeperTable.create(spark, str(tmp_path / "t"), schema,
                            TableProperties(), split_points=[5000])
    t.ingest(ev)
    plan = plan_of(t.full_scan())
    m = re.search(r"InMemoryFileIndex\((\d+) paths?\)", plan)
    assert m and int(m.group(1)) == 2


def test_dedup_minhash_no_cartesian(spark, entry):
    """LSH candidate generation must never plan a cartesian product."""
    plan = plan_of(entry.q_minhash_lsh_pairs(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ann_brute_force_broadcasts_queries(spark, entry):
    """The corpus must not shuffle: queries broadcast, scoring map-side."""
    plan = plan_of(entry.q_ann_brute_force(spark, SF))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
