"""Incremental materialized views: a destination SleeperTable kept in
sync with a source table through the change data feed.

The LSM-native incremental view maintenance (IVM) shape for
DISTRIBUTIVE aggregates (sum / min / max / count-as-sum — exactly the
reference's aggregation algebra, docs/usage/data-processing.md:33-48):

1. the destination table configures the aggregation (e.g. ``sum(n),
   sum(v)`` over its keys);
2. ``refresh()`` polls the source's change feed from the persisted
   checkpoint — reading ONLY the files appended since (cost ∝ new
   data, never source size);
3. the user transform maps appended rows to DELTA rows of the view's
   schema (e.g. ``(user, type) → n=1, v=value``);
4. the deltas ingest into the destination with a DETERMINISTIC job id
   derived from the seq window, so a crash between commit and
   checkpoint persist replays as a no-op (``ingest_jobs_seen``) —
   exactly-once end to end;
5. the destination's continual aggregation collapses deltas at every
   compaction and query, so reads always see the up-to-date view.

Because step 5 is the engine's own collapse, the view equals the
batch recomputation REGARDLESS of how refreshes were batched — the
same associativity argument the streaming upsert relies on.

Append-only sources only (the reference's model: rows leave via
ageOff, not deletes): ``delete_where`` on the source emits nothing in
the change feed and would silently drift the view — so refresh scans
the window's retained transactions and REFUSES to advance past a
detected delete.

Reference analog: none (no derived tables); built from this engine's
change feed + idempotent ingest + aggregation tables.
"""

from __future__ import annotations

import json
import os
from typing import Callable

from pyspark.sql import DataFrame


class MaterializedView:
    """Binds (source table, destination table, transform). State (the
    change-feed checkpoint) lives in ``<dest>/mview.json`` so any
    process can resume it."""

    def __init__(self, source, dest,
                 transform: Callable[[DataFrame], DataFrame]):
        self.source = source
        self.dest = dest
        self.transform = transform
        self._state_path = os.path.join(dest.path, "mview.json")

    # ------------------------------------------------------------------
    def _load_state(self) -> dict:
        if os.path.exists(self._state_path):
            with open(self._state_path) as f:
                return json.load(f)
        return {"seq": 0}

    def _save_state(self, state: dict) -> None:
        tmp = self._state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self._state_path)

    def _window_has_deletes(self, from_seq: int, to_seq: int) -> bool:
        """Drift tripwire: deletes never appear in the change feed, so
        a delete_where inside the refresh window means the view can no
        longer be maintained incrementally. Detected from the retained
        log: a delete claims its rewrites under a ``delete-*`` job id
        (deletes.py) and is the only writer allowed to commit
        empty-output replacements."""
        for _seq, tx in self.source.store.transactions_between(
                from_seq, to_seq):
            if tx.get("type") == "ASSIGN_JOB_IDS" and any(
                    str(a.get("jobId", "")).startswith("delete-")
                    for a in tx.get("assignments", ())):
                return True
            if tx.get("type") == "REPLACE_FILE_REFERENCES" and any(
                    not j.get("outputFiles") for j in tx.get("jobs", ())):
                return True
        return False

    # ------------------------------------------------------------------
    def refresh(self, max_seqs: int | None = None) -> int:
        """Advance the view through the source's new commits; returns
        the number of source seqs consumed. Idempotent across crashes:
        the delta ingest's job id encodes the seq window, so a replay
        after a crash between commit and checkpoint persist skips."""
        state = self._load_state()
        from_seq = state["seq"]
        batch, to_seq = self.source.poll_changes(from_seq,
                                                 max_seqs=max_seqs)
        if to_seq > from_seq and self._window_has_deletes(from_seq,
                                                          to_seq):
            raise ValueError(
                "source table saw delete_where inside this refresh "
                "window — the change feed carries appends only, so the "
                "view would drift; rebuild it from scratch")
        if to_seq == from_seq:
            return 0
        delta = self.transform(batch)
        self.dest.ingest(
            delta, job_id=f"mv-{from_seq}-{to_seq}")
        state["seq"] = to_seq
        self._save_state(state)
        return to_seq - from_seq
