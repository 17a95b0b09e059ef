"""CTAS (create_as), the files-metadata manifest, and the metadata-only
row count — the derived-table onboarding + audit surface."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sleeper_spark import Field, Schema, SleeperTable
from sleeper_spark.properties import TableProperties

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id", "user_id", "event_type", "value")


class TestCreateAs:
    def test_roundtrip_balanced_and_typed(self, spark, events, tmp_path):
        agg = events.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"))
        t = SleeperTable.create_as(spark, str(tmp_path / "t"), agg,
                                   row_keys=["user_id"], n_partitions=4)
        got = sorted(tuple(r) for r in t.full_scan().collect())
        want = sorted(tuple(r) for r in agg.collect())
        assert got == want
        # advisor-derived split points -> multiple pre-balanced leaves
        assert len(t.store.tree.leaves()) > 1
        # schema derived from the frame: key long, value long
        assert t.schema.row_key_fields[0].name == "user_id"
        assert [f.name for f in t.schema.value_fields] == ["n_events"]
        # the key-range read path works on the derived table
        lo = t.range_key_query([("user_id", 0, 5)]).collect()
        assert all(0 <= r.user_id < 5 for r in lo)

    def test_sort_keys_and_single_partition(self, spark, events, tmp_path):
        df = events.select("user_id", "event_type", "value")
        t = SleeperTable.create_as(
            spark, str(tmp_path / "s"), df, row_keys=["user_id"],
            sort_keys=["event_type"], n_partitions=1)
        assert [f.name for f in t.schema.sort_key_fields] == ["event_type"]
        assert t.full_scan().count() == df.count()

    def test_guards(self, spark, events, tmp_path):
        with pytest.raises(ValueError, match="absent"):
            SleeperTable.create_as(spark, str(tmp_path / "a"), events,
                                   row_keys=["nope"])
        with pytest.raises(ValueError, match="at least one row key"):
            SleeperTable.create_as(spark, str(tmp_path / "b"), events,
                                   row_keys=[])


def _plain_table(spark, events, path, props=None):
    schema = Schema(
        (Field("event_id", T.LongType()),), (),
        (Field("user_id", T.LongType(), True),
         Field("event_type", T.StringType(), True),
         Field("value", T.DoubleType(), True)))
    t = SleeperTable.create(spark, path, schema,
                            props or TableProperties(),
                            split_points=[3000, 6000])
    t.ingest(events)
    return t


class TestFilesManifest:
    def test_manifest_matches_references(self, spark, events, tmp_path):
        t = _plain_table(spark, events, str(tmp_path / "m"))
        man = t.files_manifest().collect()
        refs = t.store.all_references()
        assert len(man) == len(refs)
        assert sum(r.n_rows for r in man) == events.count()
        # bounds reflect the fixed split points on the leading key
        assert {r.min_key for r in man} <= {None, "3000", "6000"}
        assert not any(r.approx for r in man)
        assert all(r.job_id is None for r in man)

    def test_manifest_tracks_compaction_claims(self, spark, events,
                                               tmp_path):
        t = _plain_table(spark, events, str(tmp_path / "c"))
        t.ingest(events.limit(100))  # second generation -> compactable
        t.compact()
        man = t.files_manifest().collect()
        assert sum(r.n_rows for r in man) == events.count() + 100


class TestCountRows:
    def test_metadata_only_no_scan(self, spark, events, tmp_path):
        t = _plain_table(spark, events, str(tmp_path / "n"))
        n = events.count()
        # prove no scan: break the scan path, metadata must still answer
        t.full_scan = None  # type: ignore[assignment]
        assert t.count_rows(allow_scan=False) == n

    def test_aggregation_table_falls_back_or_refuses(self, spark, events,
                                                     tmp_path):
        schema = Schema(
            (Field("user_id", T.LongType()),
             Field("event_type", T.StringType())), (),
            (Field("value", T.DoubleType(), False),))
        props = TableProperties(aggregations="sum(value)")
        t = SleeperTable.create(spark, str(tmp_path / "agg"), schema,
                                props)
        t.ingest(events.select("user_id", "event_type", "value"))
        t.ingest(events.select("user_id", "event_type", "value"))
        distinct_groups = events.select(
            "user_id", "event_type").distinct().count()
        # metadata sum (2x raw rows) would be wrong; scan fallback is right
        assert t.count_rows() == distinct_groups
        with pytest.raises(ValueError, match="allow_scan"):
            t.count_rows(allow_scan=False)
