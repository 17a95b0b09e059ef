"""add_value_column: metadata-only schema evolution — historic files
read as NULL, both engines merge mixed-schema file sets, compaction
materialises the column."""
import os

import pytest
from pyspark.sql import functions as F, types as T

from sleeper_spark import Field, Schema, SleeperTable
from sleeper_spark.properties import TableProperties


@pytest.fixture()
def evolved(spark, tmp_path):
    """Table with PRE-evolution files, evolved schema, and a
    POST-evolution ingest carrying the new column."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet") \
        .select("event_id", "user_id")
    schema = Schema((Field("event_id", T.LongType()),), (),
                    (Field("user_id", T.LongType(), True),))
    t = SleeperTable.create(spark, str(tmp_path / "t"), schema,
                            split_points=[500])
    t.ingest(ev.where("event_id % 2 = 0"))
    t.add_value_column(Field("score", T.DoubleType(), True))
    newer = ev.where("event_id % 2 = 1").withColumn(
        "score", F.col("event_id").cast("double") / 10)
    t.ingest(newer)
    return t, ev


class TestSchemaEvolution:
    def test_scan_pads_nulls_and_new_rows_carry_values(self, evolved):
        t, ev = evolved
        rows = {r.event_id: r.score for r in t.full_scan().collect()}
        assert len(rows) == ev.count()
        assert rows[10] is None           # pre-evolution file
        assert rows[701] == 70.1          # post-evolution file

    def test_exact_key_and_sorted_rows_cover_both_eras(self, evolved):
        t, _ = evolved
        assert t.exact_key_query(event_id=10).collect()[0].score is None
        assert t.exact_key_query(event_id=801).collect()[0].score == 80.1
        # streaming sorted-row iterator pads the same NULLs
        seen = {}
        it = t.sorted_rows(batch_size=256)
        for row in it:
            seen[row["event_id"]] = row["score"]
        assert seen[10] is None and seen[801] == 80.1
        assert list(seen) == sorted(seen)  # still key-sorted

    def test_compaction_materialises_column_both_eras(self, evolved,
                                                      spark):
        t, ev = evolved
        t.compact()
        import time
        t.collect_garbage(now=time.time() + 10**6)
        rows = {r.event_id: r.score for r in t.full_scan().collect()}
        assert len(rows) == ev.count()
        assert rows[10] is None and rows[701] == 70.1
        # physical files now all carry the column
        import pyarrow.parquet as pq
        for fn in t.store.files:
            assert "score" in pq.ParquetFile(fn).schema_arrow.names
        r = t.verify_integrity()
        assert r["ok"], r["errors"]

    def test_reload_sees_new_schema(self, evolved, spark):
        t, _ = evolved
        t2 = SleeperTable.load(spark, t.path)
        assert [f.name for f in t2.schema.value_fields] == \
            ["user_id", "score"]
        assert t2.full_scan().where("score is not null").count() > 0

    def test_pre_evolution_clone_unaffected(self, evolved, spark,
                                            tmp_path):
        t, _ = evolved
        # clone NOW, then evolve the source again: branch keeps its own
        # schema
        branch = t.clone(str(tmp_path / "b"))
        t.add_value_column(Field("extra", T.StringType(), True))
        assert "extra" in [f.name for f in t.schema.value_fields]
        assert "extra" not in [f.name for f in branch.schema.value_fields]
        assert "extra" not in branch.full_scan().columns

    def test_guards(self, spark, tmp_path, evolved):
        t, _ = evolved
        with pytest.raises(ValueError, match="already exists"):
            t.add_value_column(Field("score", T.DoubleType(), True))
        with pytest.raises(ValueError, match="nullable"):
            t.add_value_column(Field("x", T.LongType(), False))
        agg_schema = Schema((Field("k", T.LongType()),), (),
                            (Field("n", T.LongType()),))
        at = SleeperTable.create(
            spark, str(tmp_path / "agg"), agg_schema,
            TableProperties(aggregations="sum(n)"))
        with pytest.raises(ValueError, match="aggregation"):
            at.add_value_column(Field("m", T.LongType(), True))

    def test_ingest_without_new_column_fails_loudly(self, evolved,
                                                    spark):
        t, ev = evolved
        with pytest.raises(Exception):
            t.ingest(ev.where("event_id < 5"))  # lacks 'score'


class TestDropColumn:
    def test_drop_then_scan_compact_readd(self, evolved, spark):
        t, ev = evolved
        t.drop_value_column("user_id")
        assert t.full_scan().columns == ["event_id", "score"]
        assert t.exact_key_query(event_id=10).columns == \
            ["event_id", "score"]
        # compaction physically rewrites without the column
        t.compact()
        import time
        t.collect_garbage(now=time.time() + 10**6)
        import pyarrow.parquet as pq
        for fn in t.store.files:
            assert "user_id" not in pq.ParquetFile(fn).schema_arrow.names
        assert t.full_scan().count() == ev.count()
        r = t.verify_integrity()
        assert r["ok"], r["errors"]
        # re-add after compaction: historic values are gone -> all NULL
        from sleeper_spark import Field
        t.add_value_column(Field("user_id", T.LongType(), True))
        assert t.full_scan().where("user_id is not null").count() == 0

    def test_drop_guards(self, evolved, spark, tmp_path):
        t, _ = evolved
        with pytest.raises(ValueError, match="key field"):
            t.drop_value_column("event_id")
        with pytest.raises(ValueError, match="no value column"):
            t.drop_value_column("nope")
        agg_schema = Schema((Field("k", T.LongType()),), (),
                            (Field("n", T.LongType()),))
        at = SleeperTable.create(
            spark, str(tmp_path / "agg2"), agg_schema,
            TableProperties(aggregations="sum(n)"))
        with pytest.raises(ValueError, match="aggregation"):
            at.drop_value_column("n")
