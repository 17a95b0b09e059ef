"""Query tracker: status + row counts (QueryState.java, TrackedQuery.java,
DynamoDBQueryTracker.java; parent roll-up per
QueryState.getParentStateIfFinished)."""

import pytest

from sleeper_spark.tracker import (
    PARENT,
    QueryState,
    QueryTracker,
    TrackedQuery,
    parent_state_if_finished,
    run_tracked,
)


class TestLifecycle:
    def test_queued_to_completed(self):
        tr = QueryTracker()
        tr.query_queued("q1")
        assert tr.get("q1").state == QueryState.QUEUED
        tr.query_in_progress("q1")
        assert tr.get("q1").state == QueryState.IN_PROGRESS
        tr.query_completed("q1", 42)
        got = tr.get("q1")
        assert got.state == QueryState.COMPLETED and got.row_count == 42

    def test_failed_records_error(self):
        tr = QueryTracker()
        tr.query_queued("q1")
        tr.query_failed("q1", "boom")
        got = tr.get("q1")
        assert got.state == QueryState.FAILED and got.error_message == "boom"

    def test_queries_in_state(self):
        tr = QueryTracker()
        tr.query_queued("a")
        tr.query_queued("b")
        tr.query_completed("b", 1)
        assert [t.query_id for t in tr.queries_in_state(QueryState.QUEUED)] == ["a"]


class TestParentRollup:
    """QueryState.java:40-70 truth table."""

    def _child(self, state):
        return TrackedQuery("q", "s", state=state)

    def test_all_completed(self):
        assert parent_state_if_finished(
            [self._child(QueryState.COMPLETED)] * 3) == QueryState.COMPLETED

    def test_all_failed(self):
        assert parent_state_if_finished(
            [self._child(QueryState.FAILED)] * 2) == QueryState.FAILED

    def test_mixed_is_partially_failed(self):
        assert parent_state_if_finished(
            [self._child(QueryState.COMPLETED),
             self._child(QueryState.FAILED)]) == QueryState.PARTIALLY_FAILED

    def test_active_child_means_unfinished(self):
        assert parent_state_if_finished(
            [self._child(QueryState.COMPLETED),
             self._child(QueryState.IN_PROGRESS)]) is None

    def test_tracker_rolls_parent_up_with_row_sum(self):
        tr = QueryTracker()
        tr.query_queued("q", "leaf1")
        tr.query_queued("q", "leaf2")
        tr.query_completed("q", 10, sub_query_id="leaf1")
        assert tr.get("q") is None or tr.get("q").state != QueryState.COMPLETED
        tr.query_completed("q", 32, sub_query_id="leaf2")
        parent = tr.get("q", PARENT)
        assert parent.state == QueryState.COMPLETED
        assert parent.row_count == 42


class TestPersistenceAndExpiry:
    def test_round_trip_file(self, tmp_path):
        p = str(tmp_path / "tracker.json")
        tr = QueryTracker(p)
        tr.query_completed("q1", 7)
        tr2 = QueryTracker(p)
        got = tr2.get("q1")
        assert got.state == QueryState.COMPLETED and got.row_count == 7

    def test_expiry(self):
        tr = QueryTracker(expiry_seconds=10)
        tr.query_completed("q1", 1)
        import time
        assert tr.expire(now=time.time() + 11) == 1
        assert tr.get("q1") is None
        assert tr.expire() == 0


class TestRunTracked:
    def test_success_counts_dataframe(self, spark, tmp_path):
        from pyspark.sql import functions as F
        from pyspark.sql import types as T
        from sleeper_spark import Field, Schema, SleeperTable
        from sleeper_spark.query import Query
        from sleeper_spark.ranges import Range, Region
        schema = Schema((Field("key", T.LongType()),), (),
                        (Field("value", T.LongType()),))
        t = SleeperTable.create(spark, str(tmp_path / "t"), schema)
        t.ingest(spark.range(100).select(
            F.col("id").alias("key"), (F.col("id") * 2).alias("value")))
        tr = QueryTracker()
        q = Query([Region.of(Range("key", 10, 30))])
        df = t.query_tracked(q, tr)
        assert df.count() == 20
        got = tr.get(q.query_id)
        assert got.state == QueryState.COMPLETED and got.row_count == 20

    def test_failure_marks_failed_and_raises(self):
        tr = QueryTracker()
        tr.query_queued("q")
        with pytest.raises(RuntimeError):
            run_tracked(tr, "q", lambda: (_ for _ in ()).throw(RuntimeError("x")))
        assert tr.get("q").state == QueryState.FAILED

    def test_cache_released_when_result_dropped(self, spark):
        """run_tracked caches the result for the caller's re-read; the
        cache must be unpersisted once the caller drops the reference —
        not pinned for the session's lifetime."""
        import gc
        tr = QueryTracker()
        tr.query_queued("q-cache")
        sc = spark.sparkContext
        before = {i.id() for i in sc._jsc.sc().getRDDStorageInfo()}
        df = run_tracked(tr, "q-cache",
                         lambda: spark.range(10000).selectExpr("id"))
        during = {i.id() for i in sc._jsc.sc().getRDDStorageInfo()}
        assert during - before  # cached while referenced
        del df
        gc.collect()
        after = {i.id() for i in sc._jsc.sc().getRDDStorageInfo()}
        assert not (after - before)  # finalizer unpersisted it

    def test_connect_style_dataframe_without_jdf(self):
        """Under Spark Connect a DataFrame has no _jdf; run_tracked must
        skip finalizer registration (degrade to no-op) instead of
        raising AttributeError at registration time."""
        from unittest import mock
        from pyspark.sql import DataFrame
        tr = QueryTracker()
        tr.query_queued("q-connect")
        df = mock.Mock(spec=DataFrame)   # spec'd mock has NO _jdf attr
        df.cache.return_value = df
        df.count.return_value = 7
        out = run_tracked(tr, "q-connect", lambda: df)
        assert out is df
        got = tr.get("q-connect")
        assert got.state == QueryState.COMPLETED and got.row_count == 7
