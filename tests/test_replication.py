"""Incremental replication over the change feed (replication.py):
convergence, compaction-neutrality (rewrites ship zero rows), crash
idempotency recovered from the replica's own log, and aggregation-table
convergence through independent collapse schedules."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sleeper_spark import replication
from sleeper_spark.properties import TableProperties
from sleeper_spark.schema import Field, Schema
from sleeper_spark.table import SleeperTable


def _schema():
    return Schema(
        row_key_fields=(Field("k", T.LongType()),),
        sort_key_fields=(),
        value_fields=(Field("v", T.LongType()),),
    )


def _rows(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").alias("k"),
                                      (F.col("id") * 10).alias("v"))


def _sorted_rows(t):
    return sorted((r.k, r.v) for r in t.full_scan().collect())


class TestReplication:
    def test_converges_and_ships_only_appends(self, spark, tmp_path):
        src = SleeperTable.create(spark, str(tmp_path / "src"), _schema())
        dst = SleeperTable.create(spark, str(tmp_path / "dst"), _schema())
        src.ingest(_rows(spark, 0, 100))
        src.ingest(_rows(spark, 100, 200))

        steps = replication.sync_to_head(src, dst)
        assert steps[-1]["caught_up"]
        assert _sorted_rows(dst) == _sorted_rows(src)

        # compaction on the source must ship NOTHING
        src.compact()
        s = replication.sync(src, dst)
        assert s["files_ingested"] == 0
        assert _sorted_rows(dst) == _sorted_rows(src)

        # further appends flow; the replica compacts on its own schedule
        src.ingest(_rows(spark, 200, 250))
        replication.sync_to_head(src, dst)
        dst.compact()
        assert _sorted_rows(dst) == _sorted_rows(src)

    def test_sync_is_idempotent_and_crash_replayable(self, spark,
                                                     tmp_path):
        src = SleeperTable.create(spark, str(tmp_path / "src"), _schema())
        dst = SleeperTable.create(spark, str(tmp_path / "dst"), _schema())
        src.ingest(_rows(spark, 0, 50))
        s1 = replication.sync(src, dst)
        assert s1["files_ingested"] >= 1

        # caught-up re-run: no-op
        s2 = replication.sync(src, dst)
        assert s2["files_ingested"] == 0 and s2["caught_up"]

        # crash-after-ingest replay: re-running the SAME range's ingest
        # (what a restarted syncer would do if it died before observing
        # its own commit) dedupes in the state store — zero new refs
        rows, to_seq = src.poll_changes(0)
        job = f"{replication.JOB_PREFIX}0-{to_seq}"
        assert dst.ingest(rows, job_id=job) == []
        assert _sorted_rows(dst) == _sorted_rows(src)

    def test_watermark_recovered_from_replica_log(self, spark, tmp_path):
        src = SleeperTable.create(spark, str(tmp_path / "src"), _schema())
        dst = SleeperTable.create(spark, str(tmp_path / "dst"), _schema())
        src.ingest(_rows(spark, 0, 30))
        replication.sync_to_head(src, dst)
        applied = replication.applied_seq(dst)
        assert applied == src.store.current_seq

        # a FRESH handle on the replica path (process restart) sees the
        # same watermark — no side state beyond the transaction log
        dst2 = SleeperTable.load(spark, dst.path)
        assert replication.applied_seq(dst2) == applied

    def test_bounded_catchup_batches(self, spark, tmp_path):
        src = SleeperTable.create(spark, str(tmp_path / "src"), _schema())
        dst = SleeperTable.create(spark, str(tmp_path / "dst"), _schema())
        for i in range(4):
            src.ingest(_rows(spark, i * 10, (i + 1) * 10))
        steps = replication.sync_to_head(src, dst, max_seqs=1)
        assert len(steps) >= 4  # one source seq at a time
        assert _sorted_rows(dst) == _sorted_rows(src)

    def test_aggregation_tables_converge(self, spark, tmp_path):
        props = TableProperties(aggregations="sum(v)")
        src = SleeperTable.create(spark, str(tmp_path / "src"), _schema(),
                                  props=props)
        dst = SleeperTable.create(spark, str(tmp_path / "dst"), _schema(),
                                  props=props)
        # same keys appended twice: reads collapse via sum
        src.ingest(_rows(spark, 0, 40))
        src.ingest(_rows(spark, 0, 40))
        src.compact()  # source collapses BEFORE replication catches up
        replication.sync_to_head(src, dst)
        # the feed shipped the RAW appends; the replica's own read-time
        # collapse yields the identical aggregate view
        assert _sorted_rows(dst) == _sorted_rows(src)

    def test_schema_drift_refused_then_syncs_after_evolution(
            self, spark, tmp_path):
        from pyspark.sql import types as T2
        from sleeper_spark.schema import Field as F2
        src = SleeperTable.create(spark, str(tmp_path / "src"), _schema())
        dst = SleeperTable.create(spark, str(tmp_path / "dst"), _schema())
        src.ingest(_rows(spark, 0, 20))
        replication.sync_to_head(src, dst)

        # source evolves; an unsuspecting sync must refuse LOUDLY (a
        # silent sync would drop the new column from shipped rows)
        src.add_value_column(F2("extra", T2.LongType(), True))
        src.ingest(_rows(spark, 20, 30).withColumn(
            "extra", F.col("k") * 100))
        with pytest.raises(ValueError, match="schema"):
            replication.sync(src, dst)

        # evolve the replica the same way -> sync flows, column intact
        dst.add_value_column(F2("extra", T2.LongType(), True))
        replication.sync_to_head(src, dst)
        got = sorted((r.k, r.v, r.extra)
                     for r in dst.full_scan().collect())
        want = sorted((r.k, r.v, r.extra)
                      for r in src.full_scan().collect())
        assert got == want
        assert any(e is not None for _, _, e in got)
