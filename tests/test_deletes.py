"""Copy-on-write delete_where (deletes.py): correctness, pruning,
time-travel interplay, GC, and guard rails.

The reference removes rows only via ageOff; delete_where extends the
engine Delta-style. Invariants under test: exact row removal, untouched
files never rewritten, sort order preserved (merge paths still work),
pre-delete states readable via as_of, old files garbage-collected."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sleeper_spark import sketches
from sleeper_spark.query import Query
from sleeper_spark.ranges import Range, Region
from sleeper_spark.schema import Field, Schema
from sleeper_spark.statestore import StateStoreException
from sleeper_spark.table import SleeperTable


def _schema():
    return Schema(
        row_key_fields=(Field("key", T.StringType()),),
        sort_key_fields=(Field("seq", T.LongType()),),
        value_fields=(Field("value", T.LongType()),),
    )


def _rows(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.format_string("k-%06d", F.col("id")).alias("key"),
        F.col("id").alias("seq"),
        F.col("id").alias("value"))


@pytest.fixture
def table(spark, tmp_path):
    t = SleeperTable.create(spark, str(tmp_path / "t"), _schema(),
                            split_points=["k-001000"])
    t.ingest(_rows(spark, 0, 1000))     # left partition only
    t.ingest(_rows(spark, 1000, 2000))  # right partition only
    return t


class TestDeleteWhere:
    def test_key_region_delete(self, table):
        out = table.delete_where(
            regions=[Region.of(Range("key", "k-000100", "k-000200"))])
        assert out["rows_deleted"] == 100
        # only the left-partition file overlaps the range
        assert out["files_rewritten"] == 1
        assert out["files_untouched"] == 1
        assert table.full_scan().count() == 1900
        assert table.exact_key_query(key="k-000150").count() == 0
        assert table.exact_key_query(key="k-000250").count() == 1

    def test_exact_point_delete_bloom_pruned(self, table):
        out = table.delete_where(
            regions=[Region.exact(table.schema, key="k-001234")])
        assert out["rows_deleted"] == 1
        assert out["files_rewritten"] == 1  # bloom spared the other files
        assert table.exact_key_query(key="k-001234").count() == 0
        assert table.full_scan().count() == 1999

    def test_absent_point_delete_touches_nothing(self, table):
        out = table.delete_where(
            regions=[Region.exact(table.schema, key="zzz")])
        assert out == {"rows_deleted": 0, "files_rewritten": 0,
                       "files_removed": 0, "files_untouched": 2,
                       "job_id": None}

    def test_value_range_delete(self, table):
        out = table.delete_where(
            value_ranges=[Range("value", 500, 1500)])
        assert out["rows_deleted"] == 1000
        assert out["files_rewritten"] == 2
        vals = [r.value for r in table.full_scan().collect()]
        assert len(vals) == 1000 and not any(500 <= v < 1500 for v in vals)

    def test_full_reference_delete_removes_file(self, table):
        out = table.delete_where(
            regions=[Region.of(Range("key", "k-001000", None))])
        assert out["rows_deleted"] == 1000
        assert out["files_removed"] == 1 and out["files_rewritten"] == 0
        assert table.full_scan().count() == 1000

    def test_sort_order_preserved_and_sidecars_rebuilt(self, table):
        table.delete_where(
            regions=[Region.of(Range("key", "k-000100", "k-000200"))])
        refs = [r for r in table.store.all_references()]
        for r in refs:
            side = sketches.load_sidecar(r.filename)
            assert side and "bloom" in side and "minmax" in side
        # sorted merge path still serves the table in order
        keys = [row["key"] for row in table.sorted_rows()]
        assert keys == sorted(keys)
        assert len(keys) == 1900

    def test_as_of_serves_pre_delete_state(self, table):
        seq_before = table.store.current_seq
        table.delete_where(
            regions=[Region.exact(table.schema, key="k-000042")])
        assert table.exact_key_query(key="k-000042").count() == 0
        old = table.as_of(seq=seq_before)
        assert old.exact_key_query(key="k-000042").count() == 1

    def test_old_files_garbage_collected(self, table):
        live_before = {r.filename for r in table.store.all_references()}
        table.delete_where(
            regions=[Region.of(Range("key", "k-000000", "k-000500"))])
        removed = table.collect_garbage(now=9e18)
        assert set(removed) & live_before
        for fn in removed:
            assert not os.path.exists(fn)
        assert table.full_scan().count() == 1500

    def test_delete_then_compact_then_query(self, table):
        table.delete_where(value_ranges=[Range("value", 0, 10)])
        table.compact(now_millis=0)
        assert table.full_scan().count() == 1990
        assert table.exact_key_query(key="k-000005").count() == 0

    def test_rejects_empty_predicate(self, table):
        with pytest.raises(ValueError, match="regions and/or value_ranges"):
            table.delete_where()

    def test_rejects_value_ranges_on_aggregation_table(self, spark, tmp_path):
        from sleeper_spark.properties import TableProperties
        t = SleeperTable.create(
            spark, str(tmp_path / "agg"), _schema(),
            props=TableProperties(aggregations="sum(value)"))
        t.ingest(_rows(spark, 0, 100))
        with pytest.raises(ValueError, match="aggregation-configured"):
            t.delete_where(value_ranges=[Range("value", 0, 10)])
        # key-region deletes remain legal on aggregation tables
        out = t.delete_where(
            regions=[Region.exact(t.schema, key="k-000001")])
        assert out["rows_deleted"] == 1

    def test_multi_partition_spanning_file(self, spark, tmp_path):
        # one ingest BEFORE the split: the file's references get split
        # across children; delete must rewrite per-reference, keeping
        # only each reference's own partition rows
        t = SleeperTable.create(spark, str(tmp_path / "t2"), _schema())
        t.ingest(_rows(spark, 0, 2000))
        t.props.partition_split_threshold = 100
        t.split_partitions()
        t.split_file_references()
        n_refs = len(t.store.all_references())
        assert n_refs >= 2
        out = t.delete_where(
            regions=[Region.of(Range("key", "k-000500", "k-001500"))])
        assert out["rows_deleted"] == 1000
        assert t.full_scan().count() == 1000
        keys = sorted(r.key for r in t.full_scan().collect())
        assert keys == sorted(
            [f"k-{i:06d}" for i in list(range(0, 500)) + list(range(1500, 2000))])


class TestDeleteExactRows:
    def test_exact_rows_removed_all_copies(self, spark, table):
        """Full-row match removes every copy; rows differing in ANY
        column survive; untouched partitions are never claimed."""
        # a duplicate copy of one row and a near-miss (same keys,
        # different value)
        extra = spark.createDataFrame(
            [("k-000010", 10, 10),      # exact duplicate of row 10
             ("k-000010", 10, 999)],    # same keys, different value
            "key string, seq long, value long")
        table.ingest(extra)
        victims = spark.createDataFrame(
            [("k-000010", 10, 10), ("k-001500", 1500, 1500)],
            "key string, seq long, value long")
        out = table.delete_exact_rows(victims)
        assert out["rows_deleted"] == 3  # both copies + the k-001500
        got = table.full_scan()
        assert got.where("key = 'k-000010' AND value = 10").count() == 0
        assert got.where("key = 'k-000010' AND value = 999").count() == 1
        assert got.where("key = 'k-001500'").count() == 0
        assert got.count() == 2002 - 3

    def test_noop_reference_releases_claim(self, spark, table):
        """A reference that passes bloom but matches nothing is not
        rewritten and its claim is released (a later delete on it
        must not raise 'claimed')."""
        ghost = spark.createDataFrame(
            [("k-000010", 10, 777777)],  # key exists, row does not
            "key string, seq long, value long")
        out = table.delete_exact_rows(ghost)
        assert out["rows_deleted"] == 0
        assert out["files_rewritten"] == 0 == out["files_removed"]
        assert all(r.job_id is None
                   for r in table.store.all_references())
        # the real delete still works afterwards
        out2 = table.delete_exact_rows(spark.createDataFrame(
            [("k-000010", 10, 10)],
            "key string, seq long, value long"))
        assert out2["rows_deleted"] == 1

    def test_null_safe_match_and_feed(self, spark, tmp_path):
        """NULL value columns match null-safely (SQL equality would
        miss them); the deletion is observable on the tombstone
        feed like any delete_where."""
        sch = Schema(
            row_key_fields=(Field("key", T.StringType()),),
            sort_key_fields=(),
            value_fields=(Field("v", T.StringType(), True),))
        t = SleeperTable.create(spark, str(tmp_path / "n"), sch)
        t.ingest(spark.createDataFrame(
            [("a", None), ("a", "x"), ("b", None)],
            "key string, v string"))
        pre = t.store.current_seq
        out = t.delete_exact_rows(spark.createDataFrame(
            [("a", None)], "key string, v string"))
        assert out["rows_deleted"] == 1
        assert sorted((r.key, r.v) for r in t.full_scan().collect()) \
            == [("a", "x"), ("b", None)]
        dead = t.deleted_rows_between(pre).collect()
        assert [(r.key, r.v) for r in dead] == [("a", None)]

    def test_guards(self, spark, table, tmp_path):
        with pytest.raises(ValueError, match="more than 1 rows"):
            table.delete_exact_rows(_rows(spark, 0, 10), cap=1)
        with pytest.raises(ValueError, match="missing table column"):
            table.delete_exact_rows(
                spark.createDataFrame([("a",)], "key string"))
        agg = SleeperTable.create(
            spark, str(tmp_path / "agg"), _schema(),
            __import__("sleeper_spark.properties",
                       fromlist=["TableProperties"])
            .TableProperties(aggregations="sum(value)"))
        agg.ingest(_rows(spark, 0, 10))
        with pytest.raises(ValueError, match="aggregation-configured"):
            agg.delete_exact_rows(_rows(spark, 0, 1))
        sch = Schema(
            row_key_fields=(Field("key", T.StringType()),),
            sort_key_fields=(),
            value_fields=(Field("f", T.DoubleType(), True),))
        tf = SleeperTable.create(spark, str(tmp_path / "f"), sch)
        tf.ingest(spark.createDataFrame(
            [("a", 1.0), ("b", float("nan")), ("c", 2.0)],
            "key string, f double"))
        nan_row = spark.createDataFrame(
            [("b", float("nan"))], "key string, f double")
        with pytest.raises(ValueError, match="NaN"):
            tf.delete_exact_rows(nan_row)
        # match_nan=True (the CDC tombstone contract): NaN matches NaN,
        # and ONLY the NaN row goes
        res = tf.delete_exact_rows(nan_row, match_nan=True)
        assert res["rows_deleted"] == 1
        assert sorted(r.key for r in tf.full_scan().collect()) \
            == ["a", "c"]


def test_delete_exact_rows_on_schema_evolved_table(spark, tmp_path):
    """Pre-evolution files lack later-added columns physically (they
    read as NULL): exact-row deletion must compare them null-safely
    instead of crashing mid-claim, and only rows whose evolved column
    matches (NULL vs value) are removed."""
    from sleeper_spark.schema import Field as _F
    t = SleeperTable.create(spark, str(tmp_path / "evo"), _schema())
    t.ingest(_rows(spark, 0, 50))              # pre-evolution file
    t.add_value_column(_F("note", T.StringType(), True))
    t.ingest(spark.createDataFrame(
        [("k-000010", 10, 10, "tagged")],
        "key string, seq long, value long, note string"))
    # victim 1: old row (note reads NULL) — null-safe match removes it
    # victim 2: same keys but note='tagged' — removes the new row only
    out = t.delete_exact_rows(spark.createDataFrame(
        [("k-000007", 7, 7, None)],
        "key string, seq long, value long, note string"))
    assert out["rows_deleted"] == 1
    out2 = t.delete_exact_rows(spark.createDataFrame(
        [("k-000010", 10, 10, "tagged")],
        "key string, seq long, value long, note string"))
    assert out2["rows_deleted"] == 1
    got = t.full_scan()
    assert got.where("key = 'k-000007'").count() == 0
    # the ORIGINAL k-000010 row (note NULL) survived
    assert got.where("key = 'k-000010' AND note IS NULL").count() == 1
    assert got.where("note = 'tagged'").count() == 0
