"""Atomic snapshot rollback (table.rollback): write-path time travel
as ONE set-difference MERGE_FILES commit. Pins the properties the
oracle hash can't see: GC safety of untouched references, history
preservation, idempotence, rollback-of-rollback, and the
GC'd-history refusal."""

import os
import sys

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from sleeper_spark import Field, Range, Region, Schema, SleeperTable
from sleeper_spark.properties import TableProperties
from sleeper_spark.statestore import StateStoreException

SF = "/root/testdata/sf0.001"


def _schema():
    return Schema(
        (Field("event_id", T.LongType()),), (),
        (Field("user_id", T.LongType(), True),
         Field("event_type", T.StringType(), True)))


def _mk(spark, tmp_path, name="t"):
    ev = (spark.read.parquet(f"{SF}/events.parquet")
          .select("event_id", "user_id", "event_type"))
    t = SleeperTable.create(spark, str(tmp_path / name), _schema(),
                            TableProperties(), split_points=[3000])
    t.ingest(ev)
    return t, ev


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_rollback_restores_and_preserves_history(spark, tmp_path):
    t, ev = _mk(spark, tmp_path)
    good = t.store.current_seq
    before = _rows(t.full_scan())
    t.delete_where(regions=[Region.of(Range("event_id", 0, 2000))])
    t.ingest(ev.select((F.col("event_id") + 10**7).alias("event_id"),
                       "user_id", F.lit("x").alias("event_type")))
    damaged = t.store.current_seq
    stats = t.rollback(good)
    assert stats["restored_refs"] > 0 or stats["removed_refs"] > 0
    assert _rows(t.full_scan()) == before
    # history intact both ways: the damaged state is still readable,
    # and rolling forward to it again works (rollback of a rollback)
    assert not t.as_of(seq=damaged).full_scan().where(
        "event_type = 'x'").isEmpty()
    t.rollback(damaged)
    assert not t.full_scan().where("event_type = 'x'").isEmpty()


def test_rollback_noop_is_empty_commit(spark, tmp_path):
    t, _ = _mk(spark, tmp_path)
    seq = t.store.current_seq
    stats = t.rollback(seq)
    assert stats == {"seq": seq, "removed_refs": 0, "restored_refs": 0}
    assert t.store.current_seq == seq  # nothing was committed


def test_rollback_untouched_refs_never_enter_gc_queue(spark, tmp_path):
    """The set-difference contract: a file referenced in BOTH states
    must not be enqueued for garbage collection by the rollback —
    gc_candidates does not re-check references, so remove-and-re-add
    would schedule live data for deletion."""
    t, ev = _mk(spark, tmp_path)
    good = t.store.current_seq
    kept = {r.filename for r in t.store.all_references()}
    t.ingest(ev.select((F.col("event_id") + 10**7).alias("event_id"),
                       "user_id", "event_type"))
    t.rollback(good)
    # aggressive GC (no delay): must only collect the rolled-off files
    collected = set(t.collect_garbage(now=__import__("time").time()
                                      + 10**6))
    assert not (collected & kept), collected & kept
    # and the table still scans completely after the GC pass
    assert t.full_scan().count() == t.as_of(seq=good).full_scan().count()


def test_rollback_refuses_gcd_history(spark, tmp_path):
    t, ev = _mk(spark, tmp_path)
    good = t.store.current_seq
    t.delete_where(regions=[Region.of(Range("event_id", 0, 5000))])
    t.compact()
    # GC with a forced clock far in the future deletes the old files
    t.collect_garbage(now=__import__("time").time() + 10**6)
    with pytest.raises(StateStoreException, match="garbage-collected"):
        t.rollback(good)


def test_rollback_refused_on_readonly_view(spark, tmp_path):
    t, _ = _mk(spark, tmp_path)
    seq = t.store.current_seq
    view = t.as_of(seq=seq)
    with pytest.raises(StateStoreException, match="read-only"):
        view.rollback(seq)
