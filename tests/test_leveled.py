"""Leveled compaction strategy (beyond-reference third strategy):
similar-sized runs merge together; giants are never rewritten per tiny
flush."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sleeper_spark.compaction import _leveled_batches
from sleeper_spark.properties import TableProperties
from sleeper_spark.schema import Field, Schema
from sleeper_spark.statestore import FileReference
from sleeper_spark.table import SleeperTable


def ref(name, rows, t=0.0, own=True):
    return FileReference(name, "root", rows, last_update_time=t,
                         only_contains_data_for_this_partition=own)


class TestLeveledBatches:
    def test_same_class_files_batch_together(self):
        refs = [ref(f"f{i}", 100, t=i) for i in range(4)]
        out = _leveled_batches(refs, fanout=10, trigger=4, max_batch=11)
        assert [r.filename for r in out[0]] == ["f0", "f1", "f2", "f3"]

    def test_giant_never_merged_with_tinies(self):
        refs = [ref(f"f{i}", 100, t=i) for i in range(4)] \
            + [ref("giant", 1_000_000, t=9)]
        out = _leveled_batches(refs, fanout=10, trigger=4, max_batch=11)
        assert len(out) == 1
        assert "giant" not in {r.filename for r in out[0]}

    def test_below_trigger_waits(self):
        refs = [ref(f"f{i}", 100) for i in range(3)]
        assert _leveled_batches(refs, 10, trigger=4, max_batch=11) == []

    def test_each_class_compacts_independently(self):
        refs = [ref(f"s{i}", 100, t=i) for i in range(4)] \
            + [ref(f"m{i}", 100_000, t=10 + i) for i in range(4)]
        out = _leveled_batches(refs, 10, trigger=4, max_batch=11)
        assert len(out) == 2
        names = [{r.filename for r in b} for b in out]
        assert {"s0", "s1", "s2", "s3"} in names
        assert {"m0", "m1", "m2", "m3"} in names

    def test_pull_down_always_compacts_with_smallest_class(self):
        refs = [ref("split", 500, own=False), ref("own", 100)]
        out = _leveled_batches(refs, 10, trigger=4, max_batch=11)
        assert len(out) == 1
        assert {r.filename for r in out[0]} == {"split", "own"}

    def test_max_batch_caps_and_floor_two(self):
        refs = [ref(f"f{i}", 100, t=i) for i in range(6)]
        out = _leveled_batches(refs, 10, trigger=2, max_batch=1)
        assert all(len(b) == 2 for b in out) and len(out) == 3


class TestLeveledLifecycle:
    def test_leveled_table_compacts_correctly(self, spark, tmp_path):
        schema = Schema(
            row_key_fields=(Field("key", T.LongType()),),
            value_fields=(Field("value", T.LongType()),),
        )
        t = SleeperTable.create(
            spark, str(tmp_path / "t"), schema,
            props=TableProperties(compaction_strategy="leveled",
                                  level_trigger=3))
        for i in range(3):
            t.ingest(spark.range(i * 100, (i + 1) * 100).select(
                F.col("id").alias("key"), F.col("id").alias("value")))
        assert len(t.store.all_references()) == 3
        t.compact(now_millis=0)
        assert len(t.store.all_references()) == 1
        assert t.full_scan().count() == 300
        keys = [r["key"] for r in t.sorted_rows()]
        assert keys == sorted(keys)
