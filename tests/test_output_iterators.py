"""Results sinks (S5), bulk export (S6), and custom iterators (U1/U2/P5)."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sleeper_spark import Field, Schema, SleeperTable
from sleeper_spark import output
from sleeper_spark.iterators import register_iterator
from sleeper_spark.properties import TableProperties
from sleeper_spark.query import Query
from sleeper_spark.ranges import Range, Region

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def events_table(spark, tmp_path):
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id", "user_id", "event_type", "value")
    schema = Schema(
        (Field("event_id", T.LongType()),),
        (),
        (Field("user_id", T.LongType(), True),
         Field("event_type", T.StringType(), True),
         Field("value", T.DoubleType(), True)),
    )
    t = SleeperTable.create(spark, str(tmp_path / "t"), schema,
                            TableProperties(), split_points=[300, 600])
    t.ingest(ev)
    return t, ev


class TestResultsSinks:
    def test_parquet_sink_roundtrip(self, spark, tmp_path, events_table):
        t, ev = events_table
        res = t.range_key_query([("event_id", 0, 100)])
        dest = str(tmp_path / "out_parquet")
        output.write_results_parquet(res, dest)
        assert spark.read.parquet(dest).count() == res.count()

    def test_json_sink_roundtrip(self, spark, tmp_path, events_table):
        t, ev = events_table
        res = t.range_key_query([("event_id", 0, 100)])
        dest = str(tmp_path / "out_json")
        output.write_results_json(res, dest)
        assert spark.read.json(dest).count() == res.count()

    def test_streaming_json_sink_batches(self, events_table):
        t, ev = events_table
        res = t.range_key_query([("event_id", 0, 250)])
        sent: list[str] = []
        n = output.stream_results_json(res, sent.append, batch_size=100)
        assert n == res.count()
        assert len(sent) >= 2  # actually batched
        assert all(line.startswith("{") for m in sent for line in m.split("\n"))

    def test_transport_interface_with_recording_fake(self, spark, tmp_path,
                                                     events_table):
        """Pluggable ResultsOutput protocol: the same publish() contract
        serves a file transport, a queue-style callback transport, and a
        user-supplied custom impl — errors are reported, not raised."""
        t, ev = events_table
        res = t.range_key_query([("event_id", 0, 100)])
        want = res.count()

        pq = output.results_output_from_config(
            {"type": "parquet", "base_dir": str(tmp_path / "pub")})
        info = pq.publish("q-1", res)
        assert info.error is None and len(info.locations) == 1
        assert spark.read.parquet(info.locations[0]).count() == want

        sent: list[str] = []
        cb = output.results_output_from_config(
            {"type": "callback", "send": sent.append, "batch_size": 50,
             "location": "fake-queue"})
        info2 = cb.publish("q-2", res)
        assert info2.error is None and info2.rows == want
        assert info2.locations == ["fake-queue"]
        assert sum(len(m.split("\n")) for m in sent) == want

        class ExplodingTransport(output.ResultsOutput):
            def publish(self, query_id, results):
                return output.CallbackResultsOutput(
                    self._boom, location="boom").publish(query_id, results)

            @staticmethod
            def _boom(_payload):
                raise OSError("queue unreachable")

        info3 = ExplodingTransport().publish("q-3", res)
        assert info3.error is not None and "queue unreachable" in info3.error

        with pytest.raises(ValueError):
            output.results_output_from_config({"type": "carrier-pigeon"})


class TestBulkExport:
    def test_export_one_sorted_file_per_leaf(self, spark, tmp_path, events_table):
        t, ev = events_table
        dest = str(tmp_path / "export")
        files = output.bulk_export(t, dest)
        assert len(files) == 3  # 3 leaf partitions got data
        total = 0
        for leaf_id, path in files.items():
            df = spark.read.parquet(path)
            rows = df.select("event_id").collect()
            ids = [r.event_id for r in rows]
            assert ids == sorted(ids)  # sorted within the leaf file
            total += len(ids)
        assert total == ev.count()

    def test_export_applies_table_aggregation(self, spark, tmp_path):
        ev = spark.read.parquet(f"{SF}/events.parquet").select(
            "user_id", F.lit(1).cast("long").alias("n"))
        schema = Schema((Field("user_id", T.LongType()),), (),
                        (Field("n", T.LongType()),))
        t = SleeperTable.create(spark, str(tmp_path / "t"), schema,
                                TableProperties(aggregations="sum(n)"))
        t.ingest(ev)
        files = output.bulk_export(t, str(tmp_path / "export"))
        exported = spark.read.parquet(*files.values())
        assert exported.count() == ev.select("user_id").distinct().count()
        assert exported.agg(F.sum("n")).collect()[0][0] == ev.count()


class TestCustomIterators:
    def _security_table(self, spark, tmp_path, table_iterators="", n=6):
        rows = [(i, "secret" if i % 3 == 0 else ("public" if i % 3 == 1 else ""), i * 10)
                for i in range(n)]
        df = spark.createDataFrame(rows, "k long, label string, v long")
        schema = Schema((Field("k", T.LongType()),), (),
                        (Field("label", T.StringType(), True),
                         Field("v", T.LongType(), True)))
        t = SleeperTable.create(spark, str(tmp_path / "t"), schema,
                                TableProperties(iterators=table_iterators))
        t.ingest(df)
        return t

    def test_security_filter_query_time(self, spark, tmp_path):
        """P5: query-level security filter keeps only the caller's auths
        (empty/null labels visible to all)."""
        t = self._security_table(spark, tmp_path)
        q = Query([Region.of(Range("k", None, None))],
                  query_time_iterators="securityFilter(label, public)")
        got = {(r.k, r.label) for r in t.query(q).collect()}
        assert got == {(1, "public"), (4, "public"), (2, ""), (5, "")}

    def test_table_iterator_applies_at_compaction(self, spark, tmp_path):
        """U1 table-level: securityFilter at compaction physically removes
        unauthorized rows from the compacted file."""
        t = self._security_table(spark, tmp_path,
                                 table_iterators="securityFilter(label, public)")
        t.ingest(spark.createDataFrame([(100, "secret", 1)],
                                       "k long, label string, v long"))
        t.compact()
        files = [r.filename for r in t.store.all_references()]
        raw = spark.read.parquet(*files)
        assert raw.where(F.col("label") == "secret").count() == 0

    def test_addition_iterator(self, spark, tmp_path):
        df = spark.createDataFrame([(1, 2, 3), (2, 10, 20)], "k long, a long, b long")
        schema = Schema((Field("k", T.LongType()),), (),
                        (Field("a", T.LongType(), True),
                         Field("b", T.LongType(), True)))
        t = SleeperTable.create(spark, str(tmp_path / "t"), schema, TableProperties())
        t.ingest(df)
        q = Query([Region.of(Range("k", None, None))],
                  query_time_iterators="addition(a, a, b)")
        got = {r.k: r.a for r in t.query(q).collect()}
        assert got == {1: 5, 2: 30}

    def test_registered_python_iterator(self, spark, tmp_path):
        """User-registered transform (the ConfigStringIterator analog)."""
        def cap_values(args, schema):
            cap = int(args[1])
            col = args[0]
            def apply(df):
                return df.withColumn(col, F.least(F.col(col), F.lit(cap)))
            return apply
        register_iterator("capValues", cap_values)
        t = self._security_table(spark, tmp_path)
        q = Query([Region.of(Range("k", None, None))],
                  query_time_iterators="capValues(v, 25)")
        got = {r.k: r.v for r in t.query(q).collect()}
        assert got == {0: 0, 1: 10, 2: 20, 3: 25, 4: 25, 5: 25}

    def test_unknown_iterator_rejected(self, spark, tmp_path):
        with pytest.raises(ValueError, match="unknown custom iterator"):
            self._security_table(spark, tmp_path, table_iterators="nope(x)")

    def test_query_serde_roundtrip_with_iterators(self):
        q = Query([Region.of(Range("k", 1, 10))],
                  query_time_filters="ageOff(ts, 1000)",
                  query_time_iterators="securityFilter(label, public)",
                  sql="SELECT * FROM query_results")
        q2 = Query.from_json(q.to_json())
        assert q2.query_time_iterators == q.query_time_iterators
        assert q2.sql == q.sql
        assert q2.regions[0].ranges[0].min == 1


class TestSpoolQueueTransport:
    def test_publish_consume_roundtrip(self, spark, tmp_path,
                                       events_table):
        t, ev = events_table
        res = t.query(Query([Region.of(Range("event_id", 0, 200))]))
        sink = output.SpoolQueueResultsOutput(str(tmp_path / "q"),
                                              batch_size=37)
        info = sink.publish("q-1", res)
        assert info.error is None
        rows = output.read_spool(str(tmp_path / "q"), "q-1")
        assert info.rows == len(rows) == ev.where("event_id < 200").count()
        assert {r["event_id"] for r in rows} == {
            r.event_id for r in ev.where("event_id < 200").collect()}
        # uneven batching landed multiple messages + a marker
        msgs = [f for f in os.listdir(tmp_path / "q")
                if f.startswith("q-1-")]
        assert len(msgs) == -(-len(rows) // 37)

    def test_crash_replay_is_exactly_once(self, spark, tmp_path,
                                          events_table):
        """A publisher crash mid-stream leaves messages but NO marker:
        the consumer refuses the uncommitted spool, and the retry
        rewrites the SAME names then commits — exactly-once however
        many times publish ran."""
        t, ev = events_table
        res = t.query(Query([Region.of(Range("event_id", 0, 150))]))
        spool = str(tmp_path / "q")
        sink = output.SpoolQueueResultsOutput(spool, batch_size=20)

        crashed = {"n": 0}
        orig = sink._land

        def land_then_crash(name, payload):
            if name.endswith(".done") and crashed["n"] == 0:
                crashed["n"] = 1
                raise OSError("simulated crash before commit marker")
            return orig(name, payload)

        sink._land = land_then_crash
        info1 = sink.publish("q-2", res)
        assert info1.error is not None  # reported, not raised
        with pytest.raises(FileNotFoundError, match="not committed"):
            output.read_spool(spool, "q-2")
        # retry commits; consumer sees the rows exactly once
        info2 = sink.publish("q-2", res)
        assert info2.error is None
        rows = output.read_spool(spool, "q-2")
        assert len(rows) == ev.where("event_id < 150").count()
        assert len({r["event_id"] for r in rows}) == len(rows)
        # a third publish refuses (queues do not deliver twice)
        info3 = sink.publish("q-2", res)
        assert info3.error and "already published" in info3.error

    def test_config_builder(self, tmp_path):
        sink = output.results_output_from_config(
            {"type": "spool", "spool_dir": str(tmp_path / "s"),
             "batch_size": 5})
        assert isinstance(sink, output.SpoolQueueResultsOutput)
        assert sink.batch_size == 5
