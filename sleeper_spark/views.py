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
detected delete. The recovery path is :meth:`MaterializedView.rebuild`
(crash-safe snapshot recompute; see its docstring).

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

    @staticmethod
    def _window_has_deletes(txs) -> bool:
        """Drift tripwire: deletes never appear in the change feed, so
        a delete_where inside the refresh window means the view can no
        longer be maintained incrementally. Detected from the retained
        log: a delete claims its rewrites under a ``delete-*`` job id
        (deletes.py) and is the only writer allowed to commit
        empty-output replacements."""
        for _seq, tx in txs:
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
        after a crash between commit and checkpoint persist skips.
        Windows holding no ADD_FILES commits (compaction, splits, GC —
        content-neutral metadata) advance the checkpoint without a
        Spark job."""
        state = self._load_state()
        if "rebuild_to" in state:
            # a crash-interrupted rebuild left its intent: finish it
            # first (idempotent), then continue incrementally
            self.rebuild()
            state = self._load_state()
        from_seq = state["seq"]
        batch, to_seq = self.source.poll_changes(from_seq,
                                                 max_seqs=max_seqs)
        if to_seq == from_seq:
            return 0
        txs = self.source.store.transactions_between(from_seq, to_seq)
        if self._window_has_deletes(txs):
            raise ValueError(
                "source table saw delete_where inside this refresh "
                "window — the change feed carries appends only, so the "
                "view would drift; rebuild it from scratch")
        if any(tx.get("type") == "ADD_FILES" for _s, tx in txs):
            delta = self.transform(batch)
            self.dest.ingest(delta, job_id=f"mv-{from_seq}-{to_seq}")
        state["seq"] = to_seq
        self._save_state(state)
        return to_seq - from_seq

    # ------------------------------------------------------------------
    def rebuild(self) -> int:
        """Full rebuild — the recovery path after the incremental
        contract is invalidated (``delete_where`` on the source trips
        ``refresh`` permanently, because the change feed carries
        appends only). Snapshot-consistent AND crash-safe:

        1. the source head seq is captured and persisted as a
           ``rebuild_to`` INTENT before anything is touched;
        2. the destination's file manifest is cleared (old files become
           ordinary GC candidates; pre-rebuild states stay readable via
           ``as_of``);
        3. the transform of the source's ``as_of(head)`` snapshot is
           ingested — pinned at the head, so appends racing past it are
           NOT double-counted (they replay through later refreshes);
        4. the checkpoint jumps to the head, clearing the intent.

        A crash anywhere in 2-3 leaves the intent in place; the next
        ``rebuild()`` (or ``refresh``, which resumes it automatically)
        re-clears and re-ingests — the clear wipes any partial attempt,
        so the retry ingest needs no job-id dedup to stay exactly-once.
        If GC already deleted snapshot files the ``as_of`` read raises,
        naming them (the GC delay bounds rebuild-ability, same as any
        time travel). Returns the head seq the view now reflects."""
        import uuid

        state = self._load_state()
        head = state.get("rebuild_to")
        if head is None:
            self.source.store.refresh_if_stale(0)
            head = self.source.store.current_seq
            state["rebuild_to"] = head
            self._save_state(state)  # durable intent BEFORE any write
        snap = self.source.as_of(seq=head)
        self.dest.store.clear_files()
        delta = self.transform(snap.full_scan())
        self.dest.ingest(delta,
                         job_id=f"mv-rebuild-{head}-{uuid.uuid4().hex[:8]}")
        self._save_state({"seq": head})
        return head


class SecondaryIndex:
    """Point lookups on a VALUE column without scanning the table: a
    postings SleeperTable keyed ``(value_col, *source row keys)``,
    maintained incrementally as a :class:`MaterializedView`.

    The lookup path composes machinery the engine already has, the way
    a warehouse secondary index does:

    1. the index table's OWN partition pruning + per-file Bloom filters
       answer ``value = v`` by opening only the files that can hold v
       (the postings are row-keyed on the value column, so this IS an
       LSM point lookup);
    2. the returned source keys (bounded by the value's selectivity)
       feed ``batch_exact_key_query`` on the source — driver-side tree
       descent per key, one scan of the pruned files, broadcast hash
       join. Neither step reads a non-matching data file.

    NULL values are never indexed (key fields are non-null; same
    contract as SQL b-tree lookups on IS NOT NULL predicates). The
    index inherits MaterializedView's exactly-once refresh and its
    append-only tripwire. Reference analog: none (value columns are
    unindexed in the reference; fine-grained lookups exist only on row
    keys) — this is the generalisation of the keyword search module's
    persisted postings table (functions/search.py) to arbitrary
    scalar value columns.
    """

    def __init__(self, source, index_table):
        from dataclasses import replace as _replace  # noqa: F401

        self.source = source
        self.index = index_table
        self.value_col = index_table.schema.row_key_fields[0].name
        self._src_keys = [f.name for f in source.schema.row_key_fields]

        def transform(batch: DataFrame) -> DataFrame:
            from pyspark.sql import functions as F
            return (batch
                    .where(F.col(self.value_col).isNotNull())
                    .select(self.value_col, *self._src_keys))

        self._mv = MaterializedView(source, index_table, transform)

    @staticmethod
    def create(source, path: str, value_col: str,
               split_points=None) -> "SecondaryIndex":
        from dataclasses import replace as _replace

        import pyspark.sql.types as T

        from sleeper_spark.schema import Schema
        from sleeper_spark.table import SleeperTable

        fld = next((f for f in source.schema.value_fields
                    if f.name == value_col), None)
        if fld is None:
            raise ValueError(f"{value_col!r} is not a value column of "
                             "the source table")
        if not isinstance(fld.dtype, (T.IntegerType, T.LongType,
                                      T.StringType, T.BinaryType)):
            raise ValueError(
                f"secondary index keys must be int/long/string/binary, "
                f"got {fld.dtype} for {value_col!r}")
        idx_schema = Schema(
            (_replace(fld, nullable=False),)
            + tuple(source.schema.row_key_fields))
        idx = SleeperTable.create(source.spark, path, idx_schema,
                                  split_points=split_points)
        return SecondaryIndex(source, idx)

    @staticmethod
    def load(source, path: str) -> "SecondaryIndex":
        from sleeper_spark.table import SleeperTable

        return SecondaryIndex(source,
                              SleeperTable.load(source.spark, path))

    def refresh(self, max_seqs: int | None = None) -> int:
        return self._mv.refresh(max_seqs=max_seqs)

    def rebuild(self) -> int:
        """Recover the index after a source ``delete_where`` (which
        trips incremental refresh): crash-safe snapshot rebuild of the
        postings — see :meth:`MaterializedView.rebuild`."""
        return self._mv.rebuild()

    #: above this many postings the lookup stops materialising keys on
    #: the driver and semi-joins instead — the selectivity point where a
    #: warehouse would also abandon the index nested-loop for a join
    HOT_VALUE_THRESHOLD = 10_000

    def lookup(self, value, now_millis: int | None = None,
               hot_threshold: int | None = None) -> DataFrame:
        """Source rows where ``value_col = value``: index point query
        (partition-pruned + Bloom-skipped) → bounded key set →
        batch_exact_key_query on the source. Driver holds at most
        ``hot_threshold`` matching keys, never the table.

        Hot values (more postings than the threshold — a skewed status
        flag, a default enum) switch to the distributed path: the
        postings DataFrame LEFT SEMI-joins the source scan on the row
        keys, so the driver materialises nothing and the join shuffles
        only the matching keys. The two paths return identical rows;
        the threshold probe is one ``limit(threshold+1)`` job whose
        rows are reused as the key set on the cold path (no second
        index read)."""
        threshold = (self.HOT_VALUE_THRESHOLD
                     if hot_threshold is None else hot_threshold)
        postings = self.index.exact_key_query(
            now_millis, **{self.value_col: value})
        head = postings.limit(threshold + 1).collect()
        if not head:
            return self.source.spark.createDataFrame(
                [], self.source.schema.to_struct_type())
        if len(head) <= threshold:
            keys = [{k: row[k] for k in self._src_keys} for row in head]
            return self.source.batch_exact_key_query(keys, now_millis)
        # hot value: distributed semi-join, no driver key set. Postings
        # may repeat a key across index files pre-compaction — semi-join
        # semantics dedupe for free.
        return self.source.full_scan(now_millis).join(
            postings.select(*self._src_keys),
            on=self._src_keys, how="leftsemi")
