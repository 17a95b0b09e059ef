"""table.diff: row-level branch diff with LSM shared-file pruning."""
import os

import pytest
from pyspark.sql import functions as F, types as T

from sleeper_spark import Field, Schema, SleeperTable
from sleeper_spark.properties import TableProperties
from sleeper_spark.ranges import Range, Region


@pytest.fixture()
def base_and_part(spark, tmp_path):
    part = spark.read.parquet("/root/testdata/sf0.001/part.parquet") \
        .select("p_partkey", "p_name", "p_size", "p_retailprice")
    schema = Schema((Field("p_partkey", T.LongType()),), (),
                    (Field("p_name", T.StringType(), True),
                     Field("p_size", T.IntegerType(), True),
                     Field("p_retailprice", T.DoubleType(), True)))
    base = SleeperTable.create(spark, str(tmp_path / "base"), schema,
                               split_points=[100, 200, 300])
    base.ingest(part)
    return base, part


class TestDiff:
    def test_diff_rows_and_pruning(self, spark, tmp_path, base_and_part):
        base, part = base_and_part
        branch = base.clone(str(tmp_path / "branch"))
        # mutate ONE leaf's key range; the other leaves' files stay
        # hard-link-shared with the source
        branch.delete_where(
            regions=[Region.of(Range("p_partkey", 120, 180))])
        mod = part.where(F.col("p_partkey") <= 50).withColumn(
            "p_retailprice", F.round(F.col("p_retailprice") + 1000.0, 2))
        branch.ingest(mod)

        diff = base.diff(branch)
        got = {(r.change, r.p_partkey, r.p_retailprice)
               for r in diff.collect()}
        want = (
            {("removed", r.p_partkey, r.p_retailprice) for r in
             part.where("p_partkey >= 120 and p_partkey < 180").collect()}
            | {("added", r.p_partkey, r.p_retailprice)
               for r in mod.collect()})
        assert got == want

        # pruning evidence: at least one file is shared between the
        # manifests, and NO shared file is scanned by the diff plan
        shared = {f for f in base.store.files
                  for g in branch.store.files
                  if os.path.exists(f) and os.path.exists(g)
                  and os.path.samefile(f, g)}
        assert shared, "fixture must leave shared hard-linked files"
        scanned = {f.replace("file://", "", 1) if f.startswith("file:") else f
                   for f in diff.inputFiles()}
        scanned = {os.path.realpath(f.split("file:")[-1]) for f in scanned}
        for f in shared:
            assert os.path.realpath(f) not in scanned, \
                f"shared file {f} was scanned"

    def test_diff_identical_tables_empty(self, spark, tmp_path,
                                         base_and_part):
        base, _ = base_and_part
        branch = base.clone(str(tmp_path / "b2"))
        assert base.diff(branch).count() == 0

    def test_diff_counts_duplicates_multiset(self, spark, tmp_path,
                                             base_and_part):
        """Re-ingesting an identical batch on the branch must surface as
        'added' duplicates (exceptAll multiset semantics)."""
        base, part = base_and_part
        branch = base.clone(str(tmp_path / "b3"))
        dup = part.where(F.col("p_partkey") <= 10)
        branch.ingest(dup)
        d = base.diff(branch)
        assert d.where("change = 'added'").count() == dup.count()
        assert d.where("change = 'removed'").count() == 0

    def test_diff_schema_mismatch_raises(self, spark, tmp_path,
                                         base_and_part):
        base, _ = base_and_part
        other_schema = Schema((Field("k", T.LongType()),), (),
                              (Field("v", T.StringType(), True),))
        other = SleeperTable.create(spark, str(tmp_path / "o"),
                                    other_schema)
        with pytest.raises(ValueError):
            base.diff(other)

    def test_diff_aggregation_table_uses_collapsed_view(
            self, spark, tmp_path):
        """Tables with aggregation configured must diff the COLLAPSED
        views (full scans), never partial file sets: un-compacted
        partial sums on one side would otherwise fabricate changes."""
        schema = Schema((Field("k", T.LongType()),), (),
                        (Field("n", T.LongType()),))
        props = TableProperties(aggregations="sum(n)")
        base = SleeperTable.create(spark, str(tmp_path / "agg"), schema,
                                   props)
        base.ingest(spark.createDataFrame([(1, 10), (2, 5)], ["k", "n"]))
        branch = base.clone(str(tmp_path / "aggb"))
        # same TOTAL on the branch, laid out as an extra partial file
        branch.ingest(spark.createDataFrame([(1, 0)], ["k", "n"]))
        assert base.diff(branch).count() == 0
