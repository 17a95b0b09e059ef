"""Ingest batcher: size/age-threshold batching of file-ingest requests
into jobs (IngestBatcher.java; mirrors IngestBatcherTest /
IngestBatcherMinBatchSizeTest / IngestBatcherMaxBatchSizeTest)."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from sleeper_spark.batcher import (
    BatcherProperties,
    FileIngestRequest,
    IngestBatcher,
    IngestBatcherStore,
    run_job,
)

MiB = 1024 ** 2


def req(file, size, table="t1", t=100.0):
    return FileIngestRequest(file, size, table, t)


def batcher(store, **kw):
    props = BatcherProperties(**kw)
    return IngestBatcher(store, lambda _tid: props)


class TestMinBatchThresholds:
    """IngestBatcherMinBatchSizeTest: BOTH minimums must hold unless a
    file exceeds the max age."""

    def test_below_min_size_not_batched(self):
        st = IngestBatcherStore()
        st.add_file(req("f1", 10 * MiB))
        b = batcher(st, min_job_size_bytes=100 * MiB)
        assert b.batch_files(now=200.0) == []
        assert len(st.pending_files_oldest_first()) == 1

    def test_meets_min_size_batched(self):
        st = IngestBatcherStore()
        st.add_file(req("f1", 60 * MiB))
        st.add_file(req("f2", 60 * MiB))
        b = batcher(st, min_job_size_bytes=100 * MiB)
        jobs = b.batch_files(now=200.0)
        assert len(jobs) == 1
        assert sorted(jobs[0].files) == ["f1", "f2"]
        assert st.pending_files_oldest_first() == []

    def test_below_min_file_count_not_batched(self):
        st = IngestBatcherStore()
        st.add_file(req("f1", 500 * MiB))
        b = batcher(st, min_job_size_bytes=1, min_job_files=2)
        assert b.batch_files(now=200.0) == []

    def test_max_age_overrides_minimums(self):
        """A single too-small file older than max_file_age still ships
        (IngestBatcher.java:121-127)."""
        st = IngestBatcherStore()
        st.add_file(req("f1", 1 * MiB, t=100.0))
        b = batcher(st, min_job_size_bytes=100 * MiB, min_job_files=5,
                    max_file_age_seconds=300)
        assert b.batch_files(now=300.0) == []          # age 200 < 300
        jobs = b.batch_files(now=401.0)                # age 301 > 300
        assert len(jobs) == 1 and jobs[0].files == ("f1",)


class TestMaxBatchSplitting:
    """IngestBatcherMaxBatchSizeTest: first-fit packing under max file
    count and max byte budget."""

    def test_splits_on_max_files(self):
        st = IngestBatcherStore()
        for i in range(5):
            st.add_file(req(f"f{i}", 1 * MiB, t=float(i)))
        b = batcher(st, min_job_size_bytes=1, max_job_files=2)
        jobs = b.batch_files(now=100.0)
        assert sorted(len(j.files) for j in jobs) == [1, 2, 2]
        # oldest-first: first batch takes the two oldest
        assert sorted(jobs[0].files) == ["f0", "f1"]

    def test_splits_on_max_bytes(self):
        st = IngestBatcherStore()
        for i, size in enumerate([40, 40, 40]):
            st.add_file(req(f"f{i}", size * MiB, t=float(i)))
        b = batcher(st, min_job_size_bytes=1, max_job_size_bytes=100 * MiB)
        jobs = b.batch_files(now=100.0)
        assert sorted(len(j.files) for j in jobs) == [1, 2]

    def test_first_fit_backfills_earlier_batch(self):
        """A small later file fills the remaining space of batch 1 even
        after a bigger file opened batch 2 (first-fit, not next-fit)."""
        st = IngestBatcherStore()
        st.add_file(req("big1", 70 * MiB, t=1.0))
        st.add_file(req("big2", 70 * MiB, t=2.0))
        st.add_file(req("small", 20 * MiB, t=3.0))
        b = batcher(st, min_job_size_bytes=1, max_job_size_bytes=100 * MiB)
        jobs = b.batch_files(now=100.0)
        by_first = {j.files[0]: set(j.files) for j in jobs}
        assert by_first["big1"] == {"big1", "small"}
        assert by_first["big2"] == {"big2"}

    def test_oversized_file_gets_own_batch(self):
        st = IngestBatcherStore()
        st.add_file(req("huge", 500 * MiB))
        b = batcher(st, min_job_size_bytes=1, max_job_size_bytes=100 * MiB)
        jobs = b.batch_files(now=1000.0)
        assert len(jobs) == 1 and jobs[0].files == ("huge",)


class TestStoreSemantics:
    def test_resubmit_replaces_pending(self):
        st = IngestBatcherStore()
        st.add_file(req("f1", 10, t=1.0))
        st.add_file(req("f1", 99, t=2.0))
        pend = st.pending_files_oldest_first()
        assert len(pend) == 1 and pend[0].size_bytes == 99

    def test_tables_batched_independently(self):
        st = IngestBatcherStore()
        st.add_file(req("a", 10 * MiB, table="t1"))
        st.add_file(req("b", 10 * MiB, table="t2"))
        b = batcher(st, min_job_size_bytes=1)
        jobs = b.batch_files(now=200.0)
        assert {j.table_id for j in jobs} == {"t1", "t2"}
        assert all(len(j.files) == 1 for j in jobs)

    def test_assignment_recorded(self):
        st = IngestBatcherStore()
        st.add_file(req("f1", 10 * MiB))
        b = batcher(st, min_job_size_bytes=1)
        [job] = b.batch_files(now=200.0)
        assert [a.job_id for a in st.assigned()] == [job.job_id]


class TestRunJob:
    def test_batched_job_ingests_via_spark(self, spark, tmp_path):
        import os
        from sleeper_spark import Field, Schema, SleeperTable
        schema = Schema((Field("key", T.LongType()),), (),
                        (Field("value", T.LongType()),))
        t = SleeperTable.create(spark, str(tmp_path / "t"), schema)
        # two raw source files submitted to the batcher
        paths = []
        for i in range(2):
            p = str(tmp_path / f"src{i}")
            spark.range(i * 50, (i + 1) * 50).select(
                F.col("id").alias("key"), (F.col("id") * 2).alias("value")
            ).coalesce(1).write.parquet(p)
            f = [os.path.join(p, x) for x in os.listdir(p) if x.endswith(".parquet")][0]
            paths.append(f)
        st = IngestBatcherStore()
        for p in paths:
            st.add_file(FileIngestRequest(p, os.path.getsize(p), "t", 1.0))
        b = IngestBatcher(st, lambda _tid: BatcherProperties(min_job_size_bytes=1))
        jobs = b.batch_files(now=1000.0)
        assert len(jobs) == 1
        refs = run_job(t, jobs[0])
        assert refs
        assert t.full_scan().count() == 100
        assert t.exact_key_query(key=77).collect()[0].value == 154
