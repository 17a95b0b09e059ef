"""Incremental table replication over the change data feed.

Keeps a replica SleeperTable converged with a source table by shipping
ONLY appended rows (``poll_changes``), never re-reading the source:
at 100 TB the per-sync cost is the new data. Compactions on the source
correctly ship nothing (REPLACE rewrites are content-neutral in the
feed) — the replica runs its own compactions on its own schedule, and
the tables still converge because the table algebra is
commutative/associative by construction (the same property that lets
the reference collapse at arbitrary compaction times,
docs/usage/data-processing.md:88-93).

Crash safety without a checkpoint file: each sync ingests under a job
id that ENCODES the replicated seq range (``cdf-sync-<from>-<to>``),
and the applied watermark is recovered from the replica's own durable
``ingest_jobs_seen`` log. A sync that crashes after its ingest commit
simply replays as a no-op (the state store's ingest idempotency
dedupes the job and cleans the orphan files); one that crashes before
it re-runs cleanly. There is no side-file that can disagree with the
log.

Beyond-reference surface (the reference replicates via S3 itself);
this is the disaster-recovery / cross-region story an on-prem
deployment needs.
"""

from __future__ import annotations

from typing import Any

JOB_PREFIX = "cdf-sync-"


def applied_seq(dst: Any, prefix: str = JOB_PREFIX) -> int:
    """The source seq the replica has durably applied: the largest
    ``to`` of any ``cdf-sync-<from>-<to>`` ingest job in the replica's
    own transaction log. Recovered from the log, so it survives any
    crash that the log survives."""
    best = 0
    for j in dst.store.ingest_jobs_seen:
        if j.startswith(prefix):
            try:
                best = max(best, int(j.rsplit("-", 1)[-1]))
            except ValueError:
                continue
    return best


def sync(src: Any, dst: Any, max_seqs: int | None = None,
         prefix: str = JOB_PREFIX) -> dict:
    """One incremental replication step: poll the source's change feed
    past the replica's applied watermark and ingest the appended rows
    under the range-encoded job id. Returns a summary dict; repeated
    calls are idempotent (a replayed range dedupes in the state store,
    a caught-up replica polls empty).

    ``max_seqs`` bounds how much source history one step covers — the
    backpressure knob for a replica catching up from far behind.

    Schema drift is refused loudly: if the source evolved (e.g.
    ``add_value_column``) and the replica did not, silently ingesting
    would DROP the new column from shipped rows (ingest projects to the
    replica's schema) — replicate the evolution first, then the data."""
    src_cols = [(f.name, f.dtype.simpleString())
                for f in src.schema.all_fields()]
    dst_cols = [(f.name, f.dtype.simpleString())
                for f in dst.schema.all_fields()]
    if src_cols != dst_cols:
        raise ValueError(
            "replica schema differs from source "
            f"(source {src_cols} vs replica {dst_cols}): apply the "
            "same schema evolution to the replica before syncing — "
            "ingesting through the narrower schema would silently drop "
            "columns")
    from_seq = applied_seq(dst, prefix)
    rows, to_seq = src.poll_changes(from_seq, max_seqs=max_seqs)
    if to_seq == from_seq:
        return {"from_seq": from_seq, "to_seq": to_seq,
                "files_ingested": 0, "caught_up": True}
    job = f"{prefix}{from_seq}-{to_seq}"
    refs = dst.ingest(rows, job_id=job)
    head = src.store.current_seq
    return {"from_seq": from_seq, "to_seq": to_seq,
            "files_ingested": len(refs),
            "caught_up": to_seq >= head}


def sync_to_head(src: Any, dst: Any, max_seqs: int | None = None,
                 prefix: str = JOB_PREFIX,
                 max_steps: int = 10_000) -> list[dict]:
    """Run :func:`sync` steps until the replica is caught up with the
    source head observed at each step. Bounded by ``max_steps`` as a
    runaway guard (a source ingesting faster than the replica ships
    would otherwise loop forever — surface that loudly instead)."""
    steps = []
    for _ in range(max_steps):
        s = sync(src, dst, max_seqs=max_seqs, prefix=prefix)
        steps.append(s)
        if s["caught_up"]:
            return steps
    raise RuntimeError(
        f"replica still behind after {max_steps} sync steps — the "
        "source is outrunning replication; raise max_seqs or max_steps")
