"""Ingest batcher: collect file-ingest requests into well-sized jobs.

Reference parity (java/ingest/ingest-batcher-core/src/main/java/sleeper/
ingest/batcher/core/IngestBatcher.java; docs/design.md:261-272):

- Files are *submitted* to the batcher with their size; a periodic
  ``batch_files(now)`` pass groups pending files per table and decides
  whether to create jobs:
  * create iff (total bytes >= min_job_size AND file count >=
    min_job_files), OR any pending file is older than
    max_file_age_seconds (IngestBatcher.java:118-147) — the age check
    overrides the minimums so data never waits forever.
  * batches are built first-fit: each file goes to the first open batch
    with room, where room = remaining byte budget (starting at
    max_job_size) and fewer than max_job_files files
    (IngestBatcher.java:186-236). An oversized file gets a batch of its
    own.
- The reference sends jobs to an SQS ingest queue; here a job is a value
  returned to the caller (and ``run_job`` executes it as one Spark
  ingest), keeping the queue transport out of the core like the
  reference's IngestBatcherQueueClient seam.

Defaults mirror TableDefaultProperty.java:221-257: min 1G/1 file,
max 5G/100 files, max age 300 s.
"""

from __future__ import annotations

import uuid
from dataclasses import dataclass, field, replace

GiB = 1024 ** 3


@dataclass(frozen=True)
class FileIngestRequest:
    """One submitted file (IngestBatcherTrackedFile)."""

    file: str
    size_bytes: int
    table_id: str
    received_time: float  # epoch seconds
    job_id: str | None = None


@dataclass(frozen=True)
class IngestJob:
    """A batch of files to ingest together (IngestJob.java)."""

    job_id: str
    table_id: str
    files: tuple[str, ...]


@dataclass
class BatcherProperties:
    """Thresholds (TableProperty INGEST_BATCHER_*, defaults from
    TableDefaultProperty.java:221-257)."""

    min_job_files: int = 1
    min_job_size_bytes: int = 1 * GiB
    max_job_files: int = 100
    max_job_size_bytes: int = 5 * GiB
    max_file_age_seconds: float = 300.0


class IngestBatcherStore:
    """Pending-request store (InMemoryIngestBatcherStore semantics):
    re-submitting the same path for the same table replaces the pending
    entry; assignment removes files from the pending set."""

    def __init__(self) -> None:
        self._pending: dict[tuple[str, str], FileIngestRequest] = {}
        self._assigned: list[FileIngestRequest] = []

    def add_file(self, req: FileIngestRequest) -> None:
        self._pending[(req.table_id, req.file)] = req

    def pending_files_oldest_first(self) -> list[FileIngestRequest]:
        return sorted(self._pending.values(), key=lambda r: r.received_time)

    def assign_job(self, job_id: str, files: list[FileIngestRequest]) -> list[str]:
        out = []
        for f in files:
            key = (f.table_id, f.file)
            if key in self._pending:
                del self._pending[key]
                self._assigned.append(replace(f, job_id=job_id))
                out.append(f.file)
        return out

    def assigned(self) -> list[FileIngestRequest]:
        return list(self._assigned)


class _Batch:
    """First-fit bin (IngestBatcher.java Batch:212-236)."""

    def __init__(self, max_files: int, max_bytes: int):
        self.files: list[FileIngestRequest] = []
        self.max_files = max_files
        self.space = max_bytes

    def has_space_for(self, req: FileIngestRequest) -> bool:
        return req.size_bytes <= self.space and len(self.files) < self.max_files

    def add(self, req: FileIngestRequest) -> None:
        self.files.append(req)
        self.space -= req.size_bytes


class IngestBatcher:
    def __init__(self, store: IngestBatcherStore,
                 props_for_table=None):
        """``props_for_table(table_id) -> BatcherProperties`` — per-table
        thresholds like TablePropertiesProvider; defaults when None."""
        self.store = store
        self.props_for_table = props_for_table or (lambda _tid: BatcherProperties())

    def batch_files(self, now: float) -> list[IngestJob]:
        """One batcher pass (IngestBatcher.batchFiles): group pending
        files per table oldest-first, create jobs where thresholds are
        met, assign + return them."""
        pending = self.store.pending_files_oldest_first()
        by_table: dict[str, list[FileIngestRequest]] = {}
        for req in pending:
            by_table.setdefault(req.table_id, []).append(req)
        jobs: list[IngestJob] = []
        for table_id, files in by_table.items():
            props = self.props_for_table(table_id)
            if not self._should_create_batches(props, files, now):
                continue
            for batch in self._create_batches(props, files):
                job_id = uuid.uuid4().hex[:12]
                assigned = self.store.assign_job(job_id, batch)
                if assigned:
                    jobs.append(IngestJob(job_id, table_id, tuple(assigned)))
        return jobs

    @staticmethod
    def _should_create_batches(props: BatcherProperties,
                               files: list[FileIngestRequest],
                               now: float) -> bool:
        """IngestBatcher.java:118-147: maxAge overrides; otherwise BOTH
        the min file count and min total size must be met."""
        cutoff = now - props.max_file_age_seconds
        if any(f.received_time < cutoff for f in files):
            return True
        if len(files) < props.min_job_files:
            return False
        if sum(f.size_bytes for f in files) < props.min_job_size_bytes:
            return False
        return True

    @staticmethod
    def _create_batches(props: BatcherProperties,
                        files: list[FileIngestRequest]) -> list[list[FileIngestRequest]]:
        batches: list[_Batch] = []
        for req in files:
            target = next((b for b in batches if b.has_space_for(req)), None)
            if target is None:
                target = _Batch(props.max_job_files, props.max_job_size_bytes)
                batches.append(target)
            target.add(req)
        return [b.files for b in batches]


def run_job(table, job: IngestJob):
    """Execute one batched job as a single Spark ingest: union-read the
    job's files and run the normal sorted-per-leaf ingest path (the
    reference sends the job to an ingest queue whose worker does the
    same, IngestJobRunner)."""
    df = table.spark.read.schema(
        table.schema.to_struct_type()).parquet(*job.files)
    return table.ingest(df)
