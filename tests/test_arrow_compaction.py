"""Arrow compaction engine: equivalence with the Spark engine and with
the uncompacted view (query(t) == query(compact(t)) for all configs)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sleeper_spark import Field, Schema, SleeperTable
from sleeper_spark.compaction import arrow_engine_supported
from sleeper_spark.properties import TableProperties

SF = "/root/testdata/sf0.001"


def _events(spark):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id", "user_id", "event_type",
        F.expr("ts div 1000000").alias("ts_ms"),
        F.lit(1).cast("long").alias("n"))


def _make(spark, tmp_path, name, props):
    ev = _events(spark)
    schema = Schema(
        (Field("user_id", T.LongType()),),
        (Field("event_type", T.StringType()),),
        (Field("event_id", T.LongType()), Field("ts_ms", T.LongType()),
         Field("n", T.LongType())),
    )
    t = SleeperTable.create(spark, str(tmp_path / name), schema, props,
                            split_points=[5, 10])
    t.ingest(ev.where(F.col("event_id") % 2 == 0))
    t.ingest(ev.where(F.col("event_id") % 2 == 1))
    return t


def _collect(df):
    return sorted(tuple(r) for r in df.collect())


def test_engine_selection(spark):
    schema = Schema((Field("k", T.LongType()),), (),
                    (Field("v", T.LongType()), Field("s", T.StringType())))
    assert arrow_engine_supported(schema, TableProperties(aggregations="sum(v), min(s)"))
    assert not arrow_engine_supported(schema, TableProperties(aggregations="sum(v), sum(s)"))
    assert not arrow_engine_supported(
        schema, TableProperties(iterators="securityFilter(s, public)"))
    m = Schema((Field("k", T.LongType()),), (),
               (Field("m", T.MapType(T.StringType(), T.LongType())),))
    assert not arrow_engine_supported(m, TableProperties(aggregations="map_sum(m)"))


@pytest.mark.parametrize("aggs", ["", "min(event_id), max(ts_ms), sum(n)"])
def test_arrow_equals_spark_engine(spark, tmp_path, aggs):
    base = dict(aggregations=aggs, filters="ageOff(ts_ms, 1209600000)")
    ta = _make(spark, tmp_path, "a", TableProperties(compaction_engine="arrow", **base))
    ts = _make(spark, tmp_path, "s", TableProperties(compaction_engine="spark", **base))
    now = 1706140800000
    ta.compact(now_millis=now)
    ts.compact(now_millis=now)
    assert _collect(ta.full_scan(now)) == _collect(ts.full_scan(now))
    # outputs are single sorted files per partition on both engines
    assert len(ta.store.all_references()) == len(ts.store.all_references())


def test_arrow_compaction_invariance(spark, tmp_path):
    """query(t) == query(compact(t)) on the arrow engine, incl. aggregation
    and ageOff, and the compacted files are key-sorted."""
    props = TableProperties(compaction_engine="arrow",
                            aggregations="min(event_id), max(ts_ms), sum(n)")
    t = _make(spark, tmp_path, "t", props)
    now = 1706140800000
    before = _collect(t.full_scan(now))
    refs = t.compact(now_millis=now)
    after = _collect(t.full_scan(now))
    assert before == after
    assert len(refs) == 3  # one output file per leaf partition
    for ref in refs:
        df = spark.read.parquet(ref.filename)
        rows = [(r.user_id, r.event_type) for r in df.collect()]
        assert rows == sorted(rows)
        # sum(long) cast back to long, not widened
        assert dict(df.dtypes)["n"] == "bigint"


def test_arrow_sum_int_cast_back(spark, tmp_path):
    df = spark.createDataFrame([(1, 2), (1, 3), (2, 5)], "k long, v int")
    schema = Schema((Field("k", T.LongType()),), (), (Field("v", T.IntegerType()),))
    t = SleeperTable.create(spark, str(tmp_path / "t"), schema,
                            TableProperties(compaction_engine="arrow",
                                            aggregations="sum(v)"))
    t.ingest(df)
    t.ingest(df)
    t.compact()
    out = t.full_scan()
    assert dict(out.dtypes)["v"] == "int"
    assert {(r.k, r.v) for r in out.collect()} == {(1, 10), (2, 10)}
