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
id that ENCODES the source identity and the replicated seq range
(``cdf-sync-<src-ident>-<from>-<to>``, so multiple sources feeding one
replica keep independent watermarks),
and the applied watermark is recovered from the replica's own durable
``ingest_jobs_seen`` log. A sync that crashes after its ingest commit
simply replays as a no-op (the state store's ingest idempotency
dedupes the job and cleans the orphan files); one that crashes before
it re-runs cleanly. There is no side-file that can disagree with the
log.

Beyond-reference surface (the reference replicates via S3 itself);
this is the disaster-recovery / cross-region story an on-prem
deployment needs.

Scope: the feed ships APPENDS only. A source that ran ``delete_where``,
``update_where`` or ``merge_upsert`` diverges from its replica (a
merge's INSERTS flow, but no removal or reassignment does — REPLACE
and MERGE commits are invisible to the append feed's removal side by
design); re-seed the replica
(fresh destination + full sync) after destructive source operations,
or replicate at the application layer by writing versioned rows and
compacting with last-writer-wins aggregation instead of updating in
place.
"""

from __future__ import annotations

from typing import Any

JOB_PREFIX = "cdf-sync-"


def source_prefix(src: Any) -> str:
    """Default job-id prefix for replication from ``src``: derived from
    the source's identity (its table path), so two different sources
    syncing into ONE replica keep independent watermarks. With a shared
    prefix, ``applied_seq`` would take the max ``to`` across BOTH
    sources' job ids even though their seq spaces are unrelated — the
    lagging source's data would be silently skipped."""
    import hashlib
    ident = hashlib.md5(str(src.path).encode()).hexdigest()[:10]
    return f"{JOB_PREFIX}{ident}-"


def applied_seq(dst: Any, prefix: str = JOB_PREFIX) -> int:
    """The source seq the replica has durably applied: the largest
    ``to`` of any ``cdf-sync-...-<from>-<to>`` ingest job in the
    replica's own transaction log. Recovered from the log, so it
    survives any crash that the log survives.

    Only jobs under the SCOPED ``prefix`` count — a replica that holds
    legacy identity-less ``cdf-sync-<from>-<to>`` ids (pre-upgrade
    syncs) reads 0 here until :func:`migrate_legacy_watermark` has
    recorded those ids' watermark under the scoped prefix. The old
    implicit fallback (consult legacy ids whenever the scoped prefix
    is empty) was a data-loss hazard: a source NEWLY added to a
    replica carrying ANOTHER source's legacy ids would inherit that
    other source's watermark instead of its correct 0 and silently
    skip its first seqs. Migration is therefore an explicit, one-time,
    durably-recorded act, never a read-time heuristic."""
    best = 0
    for j in dst.store.ingest_jobs_seen:
        if j.startswith(prefix):
            try:
                best = max(best, int(j.rsplit("-", 1)[-1]))
            except ValueError:
                continue
    return best


def legacy_seq(dst: Any) -> int:
    """The watermark held by legacy identity-less job ids
    (``cdf-sync-<from>-<to>``, pre-source-scoping syncs). 0 when the
    replica has no pre-upgrade history."""
    import re

    legacy = re.compile(re.escape(JOB_PREFIX) + r"(\d+)-(\d+)$")
    best = 0
    for j in dst.store.ingest_jobs_seen:
        m = legacy.fullmatch(j)
        if m:
            best = max(best, int(m.group(2)))
    return best


def migrate_legacy_watermark(dst: Any, prefix: str) -> int:
    """One-time upgrade of a replica synced before job ids became
    source-scoped: rewrite the legacy ids' watermark under ``prefix``
    by committing a zero-file marker transaction whose job id
    (``<prefix>migrated-<to>``) parses to the legacy ``to`` in
    :func:`applied_seq`. The marker lives in the replica's own
    transaction log — as durable and crash-safe as the watermark
    itself — and the commit is idempotent (ingest-job id dedupe), so
    replaying the migration is a no-op.

    Call this exactly once per PRE-UPGRADE source (the source whose
    syncs produced the legacy ids). Never call it for a source newly
    added to the replica: its correct watermark is 0, and inheriting
    another source's legacy ``to`` would silently skip its first seqs.
    Only the operator knows which source the legacy ids belong to —
    that is why this is an explicit call and not a read-time fallback.

    No-op (returns the existing watermark) when the scoped prefix
    already has jobs or there is no legacy history. Returns the
    scoped watermark after migration."""
    scoped = applied_seq(dst, prefix)
    if scoped > 0:
        return scoped
    legacy_to = legacy_seq(dst)
    if legacy_to > 0:
        dst.store.add_files([], job_id=f"{prefix}migrated-{legacy_to}")
    return applied_seq(dst, prefix)


def sync(src: Any, dst: Any, max_seqs: int | None = None,
         prefix: str | None = None, migrate_legacy: bool = False) -> dict:
    """One incremental replication step: poll the source's change feed
    past the replica's applied watermark and ingest the appended rows
    under the range-encoded job id. Returns a summary dict; repeated
    calls are idempotent (a replayed range dedupes in the state store,
    a caught-up replica polls empty).

    ``max_seqs`` bounds how much source history one step covers — the
    backpressure knob for a replica catching up from far behind.

    ``migrate_legacy=True`` performs the one-time
    :func:`migrate_legacy_watermark` upgrade first — pass it on the
    first post-upgrade sync of a replica whose history was written by
    the pre-source-scoping version FROM THIS SOURCE, and never for a
    newly-added source (see the migration docstring for why the
    distinction cannot be inferred).

    Schema drift is refused loudly: if the source evolved (e.g.
    ``add_value_column``) and the replica did not, silently ingesting
    would DROP the new column from shipped rows (ingest projects to the
    replica's schema) — replicate the evolution first, then the data."""
    _check_schema(src, dst)
    if prefix is None:
        prefix = source_prefix(src)
    if migrate_legacy and prefix != JOB_PREFIX:
        migrate_legacy_watermark(dst, prefix)
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


def _check_schema(src: Any, dst: Any) -> None:
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


def sync_via_tail(src: Any, dst: Any, staging_dir: str,
                  max_seqs: int | None = None,
                  prefix: str | None = None) -> dict:
    """One replication step driven by the change-feed tail
    (:class:`sleeper_spark.streaming.ChangeFeedTail`) instead of a
    direct poll: the tail lands each (from, to] range crash-safely as
    ONE deterministically-named parquet file in ``staging_dir``, and
    the replica ingests landed ranges IN ORDER under the same
    range-encoded job ids :func:`sync` uses. One range-landing code
    path, one idempotency story — and the staging dir doubles as a
    file-source stream (``tail.read_stream``), so the same landing
    feeds the replica AND any streaming consumers.

    Crash safety is the composition of the two parts' own guarantees:
    the tail replays a pending range onto the same file name, and a
    landed-but-not-ingested file is re-discovered by the next call
    (ingest job ids dedupe in the replica's state store). A fresh tail
    pointed at an already-partially-synced replica fast-forwards its
    checkpoint to the replica's applied watermark instead of re-landing
    history. Ranges are applied strictly in watermark order; a gap
    (staging dir manually pruned below the watermark chain) raises
    rather than silently skipping source data."""
    import os
    import re

    from sleeper_spark.streaming import ChangeFeedTail

    _check_schema(src, dst)
    if prefix is None:
        prefix = source_prefix(src)
    tail = ChangeFeedTail(src, staging_dir, max_seqs=max_seqs)
    applied = applied_seq(dst, prefix)
    if tail.state["seq"] == 0 and not tail.state.get("pending"):
        # fresh staging dir, possibly pre-synced replica: start the
        # tail at the replica's watermark, not at the dawn of the log
        tail.state["seq"] = applied
        tail._save()
    landed_rows = tail.drain()
    start_applied = applied
    ranges = []
    for fn in os.listdir(staging_dir):
        m = re.fullmatch(r"changes-(\d{12})-(\d{12})\.parquet", fn)
        if m:
            ranges.append((int(m.group(1)) - 1, int(m.group(2)), fn))
    files_ingested = 0
    for from_seq, to_seq, fn in sorted(ranges):
        if to_seq <= applied:
            continue  # already applied (or another consumer's history)
        if from_seq > applied:
            raise RuntimeError(
                f"replication gap: replica applied up to seq {applied} "
                f"but the next staged range starts at {from_seq} — a "
                "staged file below the watermark chain was removed; "
                "re-land it (fresh staging dir) or re-seed the replica")
        if from_seq < applied:
            # staged range straddles the watermark (possible only when
            # sync(max_seqs=...) and tail staging were mixed on one
            # replica): the staged file holds plain table rows with no
            # seq column, so the already-applied prefix cannot be
            # filtered out — ingesting it whole would duplicate those
            # rows. Refuse loudly, like the gap case.
            raise RuntimeError(
                f"replication overlap: replica applied up to seq "
                f"{applied} but staged range ({from_seq}, {to_seq}] "
                "straddles that watermark — direct sync() and "
                "sync_via_tail were mixed on this replica; re-land "
                "from a fresh staging dir (the tail fast-forwards to "
                "the replica's watermark) instead of reusing this one")
        rows = dst.spark.read.parquet(os.path.join(staging_dir, fn))
        dst.ingest(rows, job_id=f"{prefix}{from_seq}-{to_seq}")
        files_ingested += 1
        applied = to_seq
    head = src.store.current_seq
    return {"from_seq": start_applied, "to_seq": applied,
            "landed_rows": landed_rows,
            "files_ingested": files_ingested,
            "caught_up": applied >= head}


def sync_to_head(src: Any, dst: Any, max_seqs: int | None = None,
                 prefix: str | None = None,
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
