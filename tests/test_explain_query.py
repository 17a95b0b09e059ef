"""Scan-audit observability (table.explain_query / executor
explain_scan): per-tier file-pruning counts a user checks BEFORE paying
for a 100 TB scan. The numbers must agree exactly with what plan_files
would read, stay monotonically non-increasing across tiers, and cost no
Spark job."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sleeper_spark.query import Query
from sleeper_spark.ranges import Range, Region
from sleeper_spark.schema import Field, Schema
from sleeper_spark.table import SleeperTable


def _schema():
    return Schema(
        row_key_fields=(Field("key", T.StringType()),),
        sort_key_fields=(),
        value_fields=(Field("value", T.LongType()),),
    )


def _rows(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.format_string("k-%06d", F.col("id")).alias("key"),
        F.col("id").alias("value"))


@pytest.fixture()
def table(spark, tmp_path):
    # two leaf partitions; three ingests -> files in both leaves
    t = SleeperTable.create(spark, str(tmp_path / "t"), _schema(),
                            split_points=["k-001000"])
    t.ingest(_rows(spark, 0, 1000))       # left leaf only
    t.ingest(_rows(spark, 1000, 2000))    # right leaf only
    t.ingest(_rows(spark, 0, 2000))       # both leaves
    return t


def _range_q(lo, hi, value_ranges=None):
    return Query([Region.of(Range("key", lo, hi))],
                 value_ranges=value_ranges or [])


class TestExplainQuery:
    def test_partition_pruning_tier(self, table):
        audit = table.explain_query(_range_q("k-000000", "k-000500"))
        assert audit["leaf_partitions_hit"] == 1
        assert audit["files_after_partition_pruning"] == 2  # left + both
        assert audit["pruned_by_partition"] == \
            audit["files_total"] - 2
        # tiers never increase
        assert (audit["files_after_partition_pruning"]
                >= audit["files_after_value_skipping"]
                >= audit["files_after_bloom"])

    def test_agrees_with_plan_files(self, table):
        q = _range_q("k-000000", "k-000500")
        audit = table.explain_query(q)
        assert sorted(audit["files_scanned"]) == \
            sorted(table.executor().plan_files(q))

    def test_value_skipping_tier(self, table):
        # value in [0,500): file 2 (values 1000..1999) provably misses
        q = _range_q("k-000000", "k-999999",
                     value_ranges=[Range("value", 0, 500)])
        audit = table.explain_query(q)
        assert audit["pruned_by_value_stats"] >= 1
        assert audit["files_after_value_skipping"] < \
            audit["files_after_partition_pruning"]

    def test_bloom_tier_on_point_query(self, table):
        audit = table.explain_query(
            Query([Region.exact(table.schema, key="k-001500")]))
        # only files that can contain the key survive: the 1000..2000
        # ingest and the 0..2000 ingest — never the left-only file
        assert audit["files_after_bloom"] == 2
        assert audit["pruned_by_bloom"] + audit["pruned_by_partition"] \
            >= 1

    def test_rows_upper_bound_covers_result(self, table):
        q = _range_q("k-000000", "k-000500")
        audit = table.explain_query(q)
        got = table.query(q).count()
        assert got <= audit["rows_upper_bound"]
        assert got == 1000  # 500 keys x 2 overlapping ingests

    def test_full_scan_prunes_nothing(self, table):
        audit = table.explain_query(
            Query([Region((Range("key", None, None),))]))
        assert audit["files_after_bloom"] == audit["files_total"]
        assert audit["pruned_by_partition"] == 0
        assert audit["rows_upper_bound"] == 4000
