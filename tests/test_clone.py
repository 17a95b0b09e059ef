"""Zero-copy table clone (hard-linked branch) and sidecar-only
approximate key quantiles."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sleeper_spark.ranges import Range, Region
from sleeper_spark.schema import Field, Schema
from sleeper_spark.table import SleeperTable


def _schema():
    return Schema(
        row_key_fields=(Field("key", T.LongType()),),
        sort_key_fields=(),
        value_fields=(Field("value", T.LongType()),),
    )


def _rows(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("key"), (F.col("id") * 2).alias("value"))


@pytest.fixture
def table(spark, tmp_path):
    t = SleeperTable.create(spark, str(tmp_path / "src"), _schema(),
                            split_points=[1000])
    t.ingest(_rows(spark, 0, 1000))
    t.ingest(_rows(spark, 1000, 2000))
    return t


class TestClone:
    def test_clone_reads_identically_zero_copy(self, table, tmp_path):
        c = table.clone(str(tmp_path / "branch"))
        assert c.full_scan().count() == 2000
        assert c.exact_key_query(key=1500).collect()[0].value == 3000
        # zero-copy: every cloned data file shares its inode
        src = {os.path.basename(f): f for r in table.store.all_references()
               for f in [r.filename]}
        for ref in c.store.all_references():
            twin = src[os.path.basename(ref.filename)]
            assert os.path.samefile(ref.filename, twin)
            assert ref.filename != twin  # different directory entry

    def test_branches_evolve_independently(self, table, tmp_path):
        c = table.clone(str(tmp_path / "branch"))
        c.ingest(_rows(table.spark, 2000, 2500))
        assert c.full_scan().count() == 2500
        assert table.full_scan().count() == 2000
        table.delete_where(regions=[Region.of(Range("key", 0, 100))])
        assert table.full_scan().count() == 1900
        assert c.full_scan().count() == 2500

    def test_source_gc_cannot_break_clone(self, table, tmp_path):
        # second file in the left partition so compaction has real work
        table.ingest(_rows(table.spark, 0, 10))
        c = table.clone(str(tmp_path / "branch"))
        table.compact(now_millis=0)
        removed = table.collect_garbage(now=9e18)
        assert removed  # source dropped its pre-compaction files...
        assert c.full_scan().count() == 2010  # ...the clone still reads
        assert c.exact_key_query(key=1500).count() == 1

    def test_clone_time_travel(self, table, tmp_path):
        seq1 = table.store.current_seq
        table.ingest(_rows(table.spark, 2000, 3000))
        c = table.clone(str(tmp_path / "branch"))
        assert c.as_of(seq=seq1).full_scan().count() == 2000
        assert c.full_scan().count() == 3000

    def test_nonempty_destination_rejected(self, table, tmp_path):
        d = tmp_path / "occupied"
        d.mkdir()
        (d / "junk").write_text("x")
        with pytest.raises(ValueError, match="not empty"):
            table.clone(str(d))


class TestApproxKeyQuantiles:
    def test_uniform_keys_hit_true_quantiles(self, table):
        got = table.approx_key_quantiles(qs=[0.25, 0.5, 0.75])
        # 2000 uniform keys, sketch budget rows/k per file: generous ±5%
        for v, want in zip(got, [500, 1000, 1500]):
            assert abs(v - want) <= 100, (v, want)

    def test_extremes(self, table):
        lo, hi = table.approx_key_quantiles(qs=[0.0, 1.0])
        assert lo == 0 and hi == 1999

    def test_non_key_field_rejected(self, table):
        with pytest.raises(ValueError, match="not a key field"):
            table.approx_key_quantiles(field="value")
