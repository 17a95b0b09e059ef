"""Unit tests for the pure-Python core: schema, ranges, partitions, state
store, config parsing. Modeled on the reference's BDD unit layer
(SURVEY §5: SchemaTest, RangeCanonicaliserTest, PartitionTree tests,
AggregationOpTest)."""

import pytest
from pyspark.sql import types as T

from sleeper_spark.iterators import (
    AgeOffFilter, Aggregation, parse_aggregations, parse_filters,
    validate_aggregations,
)
from sleeper_spark.partitions import PartitionTree, sorted_leaves_dim0
from sleeper_spark.ranges import Range, Region
from sleeper_spark.schema import Field, Schema
import os

from sleeper_spark.statestore import (FileReference, StateStore,
                                      StateStoreException)


def kv_schema():
    return Schema(
        row_key_fields=(Field("key", T.StringType()),),
        sort_key_fields=(Field("timestamp", T.LongType()),),
        value_fields=(Field("value", T.StringType()),
                      Field("nullable_value", T.StringType(), nullable=True)),
    )


class TestSchema:
    def test_round_trip_json(self):
        s = kv_schema()
        assert Schema.from_json(s.to_json()) == s

    def test_rejects_nullable_key(self):
        with pytest.raises(ValueError, match="non-nullable"):
            Schema(row_key_fields=(Field("k", T.StringType(), nullable=True),))

    def test_rejects_map_key(self):
        with pytest.raises(ValueError, match="primitive"):
            Schema(row_key_fields=(
                Field("k", T.MapType(T.StringType(), T.LongType())),))

    def test_rejects_duplicate_names(self):
        with pytest.raises(ValueError, match="duplicate"):
            Schema(row_key_fields=(Field("k", T.StringType()),),
                   value_fields=(Field("k", T.LongType()),))

    def test_key_order(self):
        assert kv_schema().key_names == ["key", "timestamp"]

    def test_struct_type(self):
        st = kv_schema().to_struct_type()
        assert [f.name for f in st.fields] == ["key", "timestamp", "value", "nullable_value"]
        assert not st.fields[0].nullable and st.fields[3].nullable


class TestRange:
    def test_canonicalise_max_inclusive_int(self):
        assert Range("k", 1, 5, True, True).canonicalise() == Range("k", 1, 6)

    def test_canonicalise_max_inclusive_string(self):
        assert Range("k", "a", "b", True, True).canonicalise() == Range("k", "a", "b\x00")

    def test_canonicalise_bytes(self):
        r = Range("k", b"\x80", b"\xff", True, True).canonicalise()
        assert r.max == b"\xff\x00"

    def test_canonicalise_exclusive_min(self):
        assert Range("k", 1, 5, False, False).canonicalise() == Range("k", 2, 5)

    def test_contains_default_bounds(self):
        r = Range("k", 10, 20)
        assert r.contains(10) and r.contains(19)
        assert not r.contains(20) and not r.contains(9)

    def test_unbounded(self):
        assert Range("k", None, None).contains(123)

    def test_overlaps(self):
        assert Range("k", 0, 10).overlaps(Range("k", 9, 20))
        assert not Range("k", 0, 10).overlaps(Range("k", 10, 20))
        assert Range("k", None, 10).overlaps(Range("k", 5, None))

    def test_bytes_unsigned_order(self):
        # 0x80 > 0x7f unsigned — python bytes compare unsigned, like Spark
        assert Range("k", b"\x7f", None).contains(b"\x80")

    def test_json_round_trip_bytes(self):
        s = Schema(row_key_fields=(Field("k", T.BinaryType()),))
        r = Range("k", b"\x00a", b"\xff")
        assert Range.from_json(r.to_json(), s) == r


class TestRegion:
    def test_overlap_multi_dim(self):
        a = Region.of(Range("a", 0, 10), Range("b", 0, 10))
        b = Region.of(Range("a", 5, 15), Range("b", 5, 15))
        c = Region.of(Range("a", 5, 15), Range("b", 20, 30))
        assert a.overlaps(b)
        assert not a.overlaps(c)

    def test_exact(self):
        s = kv_schema()
        reg = Region.exact(s, key="row-17")
        assert reg.ranges[0].canonicalise() == Range("key", "row-17", "row-17\x00")


class TestPartitionTree:
    def schema(self):
        return Schema(row_key_fields=(Field("key", T.LongType()),),
                      value_fields=(Field("value", T.LongType()),))

    def test_initial_root_only(self):
        t = PartitionTree.initial(self.schema())
        assert len(t.leaves()) == 1
        assert t.leaves()[0].id == "root"

    def test_initial_with_split_points(self):
        t = PartitionTree.initial(self.schema(), [100, 200])
        leaves = sorted_leaves_dim0(t)
        assert len(leaves) == 3
        rngs = [p.region.range_for("key") for p in leaves]
        assert (rngs[0].min, rngs[0].max) == (None, 100)
        assert (rngs[1].min, rngs[1].max) == (100, 200)
        assert (rngs[2].min, rngs[2].max) == (200, None)

    def test_leaf_for_row(self):
        t = PartitionTree.initial(self.schema(), [100])
        assert t.leaf_for_row({"key": 5}).region.range_for("key").max == 100
        assert t.leaf_for_row({"key": 100}).region.range_for("key").min == 100

    def test_split_rejects_out_of_range(self):
        t = PartitionTree.initial(self.schema(), [100])
        left = t.leaf_for_row({"key": 0})
        with pytest.raises(ValueError):
            t.split(left.id, 0, 500)

    def test_ancestors(self):
        t = PartitionTree.initial(self.schema(), [100])
        leaf = t.leaf_for_row({"key": 0})
        assert [p.id for p in t.ancestors(leaf.id)] == ["root"]

    def test_prune_by_region(self):
        t = PartitionTree.initial(self.schema(), [100, 200])
        hits = t.leaves_overlapping([Region.of(Range("key", 150, 160))])
        assert len(hits) == 1
        assert hits[0].region.range_for("key").min == 100

    def test_json_round_trip(self):
        t = PartitionTree.initial(self.schema(), [100])
        t2 = PartitionTree.from_json(t.to_json(), self.schema())
        assert {p.id for p in t2.all_partitions()} == {p.id for p in t.all_partitions()}


class TestConfigParsing:
    def test_filters(self):
        assert parse_filters("ageOff(timestamp, 1209600000)") == [
            AgeOffFilter("timestamp", 1209600000)]

    def test_aggregations(self):
        assert parse_aggregations("sum(count), max(last_seen), map_sum(tags)") == [
            Aggregation("count", "sum"), Aggregation("last_seen", "max"),
            Aggregation("tags", "map_sum")]

    def test_rejects_unknown(self):
        with pytest.raises(ValueError):
            parse_aggregations("median(x)")
        with pytest.raises(ValueError):
            parse_filters("dropAll()")

    def test_validate_rejects_key_agg(self):
        s = Schema(row_key_fields=(Field("id", T.StringType()),),
                   value_fields=(Field("count", T.LongType()),))
        with pytest.raises(ValueError, match="key column"):
            validate_aggregations(s, [Aggregation("id", "sum"),
                                      Aggregation("count", "sum")])

    def test_validate_requires_all_values(self):
        s = Schema(row_key_fields=(Field("id", T.StringType()),),
                   value_fields=(Field("count", T.LongType()),
                                 Field("other", T.LongType())))
        with pytest.raises(ValueError, match="missing"):
            validate_aggregations(s, [Aggregation("count", "sum")])

    def test_validate_rejects_nullable(self):
        s = Schema(row_key_fields=(Field("id", T.StringType()),),
                   value_fields=(Field("count", T.LongType(), nullable=True),))
        with pytest.raises(ValueError, match="nullable"):
            validate_aggregations(s, [Aggregation("count", "sum")])


class TestStateStore:
    def schema(self):
        return Schema(row_key_fields=(Field("key", T.LongType()),),
                      value_fields=(Field("value", T.LongType()),))

    def test_add_and_reload(self, tmp_path):
        s = self.schema()
        st = StateStore(str(tmp_path / "ss"), s)
        st.initialise_partitions(PartitionTree.initial(s, [100]))
        st.add_files([FileReference("/f1.parquet", "rootL", 10)])
        st2 = StateStore(str(tmp_path / "ss"), s)
        assert len(st2.all_references()) == 1
        assert len(st2.tree.leaves()) == 2

    def test_replace_file_references_moves_to_gc(self, tmp_path):
        s = self.schema()
        st = StateStore(str(tmp_path / "ss"), s)
        st.initialise_partitions(PartitionTree.initial(s))
        st.add_files([FileReference("/f1", "root", 10),
                      FileReference("/f2", "root", 5)])
        st.replace_file_references("root", ["/f1", "/f2"],
                                   FileReference("/out", "root", 12))
        assert {r.filename for r in st.all_references()} == {"/out"}
        assert set(st.gc_queue) == {"/f1", "/f2"}

    def test_assign_job_ids_conflict(self, tmp_path):
        s = self.schema()
        st = StateStore(str(tmp_path / "ss"), s)
        st.initialise_partitions(PartitionTree.initial(s))
        ref = FileReference("/f1", "root", 10)
        st.add_files([ref])
        st.assign_job_ids("job1", [st.files["/f1"]["root"]])
        from sleeper_spark.statestore import StateStoreException
        with pytest.raises(StateStoreException):
            st.assign_job_ids("job2", [st.files["/f1"]["root"]])

    def test_extend_partition_tree_atomic_multi_split(self, tmp_path):
        """EXTEND_PARTITION_TREE (ExtendPartitionTreeTransaction.java:60-93):
        many splits committed atomically, replayed on reload + snapshot."""
        from dataclasses import replace as dc_replace
        from sleeper_spark.partitions import Partition
        from sleeper_spark.ranges import Range, Region
        s = self.schema()
        st = StateStore(str(tmp_path / "ss"), s)
        st.initialise_partitions(PartitionTree.initial(s))
        root = st.tree["root"]
        mk = lambda pid, mn, mx: Partition(
            pid, Region((Range("key", mn, mx),)), parent_id="root")
        kids = [mk("c1", None, 100), mk("c2", 100, None)]
        updated = dc_replace(root, child_ids=("c1", "c2"), dimension=0)
        st.extend_partition_tree([updated], kids)
        assert {p.id for p in st.tree.leaves()} == {"c1", "c2"}
        # grandchildren in the same style, then reload replays everything
        g = [mk("g1", None, 50), mk("g2", 50, 100)]
        g = [dc_replace(p, parent_id="c1") for p in g]
        c1_updated = dc_replace(st.tree["c1"], child_ids=("g1", "g2"), dimension=0)
        st.extend_partition_tree([c1_updated], g)
        st2 = StateStore(str(tmp_path / "ss"), s)
        assert {p.id for p in st2.tree.leaves()} == {"g1", "g2", "c2"}

    def test_extend_partition_tree_validation(self, tmp_path):
        from dataclasses import replace as dc_replace
        from sleeper_spark.partitions import Partition
        from sleeper_spark.ranges import Range, Region
        from sleeper_spark.statestore import StateStoreException
        s = self.schema()
        st = StateStore(str(tmp_path / "ss"), s)
        st.initialise_partitions(PartitionTree.initial(s))
        root = st.tree["root"]
        mk = lambda pid, mn, mx, par: Partition(
            pid, Region((Range("key", mn, mx),)), parent_id=par)
        # updating a non-existent partition
        ghost = dc_replace(root, id="nope", child_ids=("a", "b"))
        with pytest.raises(StateStoreException, match="does not exist"):
            st.extend_partition_tree([ghost], [])
        # updating without splitting (still a leaf)
        with pytest.raises(StateStoreException, match="without splitting"):
            st.extend_partition_tree([root], [])
        # new partition with unknown parent
        with pytest.raises(StateStoreException, match="invalid partition tree"):
            st.extend_partition_tree(
                [dc_replace(root, child_ids=("x", "y"), dimension=0)],
                [mk("x", None, 1, "root"), mk("y", 1, None, "missing-parent")])
        # adding an id that already exists
        with pytest.raises(StateStoreException, match="already exists"):
            st.extend_partition_tree(
                [dc_replace(root, child_ids=("root", "z"), dimension=0)],
                [mk("root", None, 1, "root"), mk("z", 1, None, "root")])

    def test_clear_partitions(self, tmp_path):
        from sleeper_spark.statestore import StateStoreException
        s = self.schema()
        st = StateStore(str(tmp_path / "ss"), s)
        st.initialise_partitions(PartitionTree.initial(s, [100]))
        st.add_files([FileReference("/f1", "root", 10)])
        # illegal while file references exist (ClearPartitionsTransaction
        # javadoc: would invalidate file references)
        with pytest.raises(StateStoreException, match="file references"):
            st.clear_partitions()
        st.replace_file_references("root", ["/f1"], FileReference("/o", "root", 10))
        st.clear_files()
        st.clear_partitions()
        assert st.tree is None
        # replay across reload preserves the cleared state
        st2 = StateStore(str(tmp_path / "ss"), s)
        assert st2.tree is None
        # re-initialise brings the table back
        st2.initialise_partitions(PartitionTree.initial(s))
        assert len(st2.tree.leaves()) == 1

    def test_extend_survives_snapshot(self, tmp_path):
        """Snapshot written mid-history restores EXTEND results."""
        from dataclasses import replace as dc_replace
        from sleeper_spark.partitions import Partition
        from sleeper_spark.ranges import Range, Region
        import sleeper_spark.statestore as ss_mod
        s = self.schema()
        st = StateStore(str(tmp_path / "ss"), s)
        st.initialise_partitions(PartitionTree.initial(s))
        root = st.tree["root"]
        kids = [Partition("a", Region((Range("key", None, 7),)), parent_id="root"),
                Partition("b", Region((Range("key", 7, None),)), parent_id="root")]
        st.extend_partition_tree(
            [dc_replace(root, child_ids=("a", "b"), dimension=0)], kids)
        old = ss_mod.SNAPSHOT_EVERY
        try:
            ss_mod.SNAPSHOT_EVERY = 1
            st.add_files([FileReference("/f", "a", 1)])  # forces snapshot
        finally:
            ss_mod.SNAPSHOT_EVERY = old
        st2 = StateStore(str(tmp_path / "ss"), s)
        assert {p.id for p in st2.tree.leaves()} == {"a", "b"}
        assert len(st2.all_references()) == 1

    def test_ancestor_files_included_in_leaf_query(self, tmp_path):
        s = self.schema()
        st = StateStore(str(tmp_path / "ss"), s)
        tree = PartitionTree.initial(s)
        st.initialise_partitions(tree)
        st.add_files([FileReference("/froot", "root", 10)])
        left, right = st.tree.split("root", 0, 100)
        st.split_partition(st.tree["root"], left, right)
        files = st.files_for_leaf_query(left.id)
        assert [f.filename for f in files] == ["/froot"]


class TestStateStoreConcurrency:
    """Optimistic single-writer commit: two writers on the same log, the
    loser sees TransactionConflict, reloads, retries (SURVEY §1.1 state
    store; docs/design.md:169-199 — SQS-FIFO committer replaced by
    exclusive-create + retry)."""

    def test_conflict_then_retry(self, tmp_path):
        from pyspark.sql import types as T
        from sleeper_spark import Field, PartitionTree, Schema
        from sleeper_spark.statestore import (
            FileReference, StateStore, TransactionConflict)
        import pytest as _pytest

        schema = Schema((Field("k", T.LongType()),), (),
                        (Field("v", T.LongType(), True),))
        a = StateStore(str(tmp_path / "ss"), schema)
        a.initialise_partitions(PartitionTree.initial(schema, None))
        b = StateStore(str(tmp_path / "ss"), schema)

        ref_a = FileReference("fa.parquet", a.tree.root_id, 10, True)
        ref_b = FileReference("fb.parquet", b.tree.root_id, 20, True)
        a.add_files([ref_a])
        # b lost the sequence race; the commit loop reloads and retries
        # transparently (the reference's TransactionLogHead update loop)
        b.add_files([ref_b])
        assert any(r.filename == "fa.parquet" for r in b.all_references())
        a.reload()
        names = {r.filename for r in a.all_references()}
        assert names == {"fa.parquet", "fb.parquet"}

    def test_validation_failure_does_not_poison_log(self, tmp_path):
        """A rejected transaction must leave NOTHING in the log: a
        post-write validation failure would crash every future load."""
        from pyspark.sql import types as T
        from sleeper_spark import Field, PartitionTree, Schema
        from sleeper_spark.statestore import (
            FileReference, StateStore, StateStoreException)
        import pytest as _pytest
        schema = Schema((Field("k", T.LongType()),), (),
                        (Field("v", T.LongType(), True),))
        s = StateStore(str(tmp_path / "ss"), schema)
        s.initialise_partitions(PartitionTree.initial(schema, None))
        s.add_files([FileReference("/f1", "root", 10)])
        s.assign_job_ids("job1", [s.files["/f1"]["root"]])
        import os as _os
        n_tx = len(_os.listdir(s.tx_dir))
        with _pytest.raises(StateStoreException):
            s.assign_job_ids("job2", [s.files["/f1"]["root"]])
        assert len(_os.listdir(s.tx_dir)) == n_tx  # nothing written
        # the log stays fully replayable
        s2 = StateStore(str(tmp_path / "ss"), schema)
        assert s2.files["/f1"]["root"].job_id == "job1"

    def test_snapshot_restores_state(self, tmp_path):
        from pyspark.sql import types as T
        from sleeper_spark import Field, PartitionTree, Schema
        from sleeper_spark.statestore import (FileReference, StateStore,
                                      StateStoreException)
        import sleeper_spark.statestore as ss_mod

        schema = Schema((Field("k", T.LongType()),), (),
                        (Field("v", T.LongType(), True),))
        s = StateStore(str(tmp_path / "ss"), schema)
        s.initialise_partitions(PartitionTree.initial(schema, None))
        for i in range(ss_mod.SNAPSHOT_EVERY + 2):
            s.add_files([FileReference(f"f{i}.parquet", s.tree.root_id, 1, True)])
        import os as _os
        assert _os.listdir(s.snap_dir)  # a snapshot was written
        fresh = StateStore(str(tmp_path / "ss"), schema)
        assert len(fresh.all_references()) == ss_mod.SNAPSHOT_EVERY + 2


class TestBatchedReplaceFileReferences:
    """ReplaceFileReferencesTransaction carries a job LIST
    (ReplaceFileReferencesTransaction.java:54-59): one log append for a
    whole compaction batch."""

    def schema(self):
        return Schema(row_key_fields=(Field("key", T.LongType()),),
                      value_fields=(Field("value", T.LongType()),))

    def test_batch_commit_is_one_transaction(self, tmp_path):
        import os
        s = self.schema()
        st = StateStore(str(tmp_path / "ss"), s)
        st.initialise_partitions(PartitionTree.initial(s, [100]))
        pids = [p.id for p in st.tree.leaves()]
        st.add_files([FileReference(f"/in-{p}-{i}", p, 10)
                      for p in pids for i in range(2)])
        before = len(os.listdir(st.tx_dir))
        st.replace_file_references_batch([
            (p, [f"/in-{p}-0", f"/in-{p}-1"], FileReference(f"/out-{p}", p, 20))
            for p in pids
        ])
        assert len(os.listdir(st.tx_dir)) == before + 1
        assert {r.filename for r in st.all_references()} == \
            {f"/out-{p}" for p in pids}
        assert set(st.gc_queue) == {f"/in-{p}-{i}" for p in pids for i in range(2)}
        # replay from disk
        st2 = StateStore(str(tmp_path / "ss"), s)
        assert {r.filename for r in st2.all_references()} == \
            {f"/out-{p}" for p in pids}

    def test_legacy_single_job_txn_replays(self, tmp_path):
        """Old logs with the single-job shape must still replay."""
        import json as _json
        import os
        s = self.schema()
        st = StateStore(str(tmp_path / "ss"), s)
        st.initialise_partitions(PartitionTree.initial(s))
        st.add_files([FileReference("/f1", "root", 10)])
        legacy = {
            "type": "REPLACE_FILE_REFERENCES",
            "partitionId": "root",
            "inputFiles": ["/f1"],
            "outputFile": FileReference("/out", "root", 10).to_json(),
            "time": 1.0,
        }
        path = os.path.join(st.tx_dir, f"{st._seq + 1:012d}.json")
        with open(path, "w") as f:
            _json.dump(legacy, f)
        st2 = StateStore(str(tmp_path / "ss"), s)
        assert {r.filename for r in st2.all_references()} == {"/out"}

    def test_batch_validates_all_before_commit(self, tmp_path):
        from sleeper_spark.statestore import StateStoreException
        s = self.schema()
        st = StateStore(str(tmp_path / "ss"), s)
        st.initialise_partitions(PartitionTree.initial(s))
        st.add_files([FileReference("/f1", "root", 10)])
        with pytest.raises(StateStoreException):
            st.replace_file_references_batch([
                ("root", ["/f1"], FileReference("/o1", "root", 10)),
                ("root", ["/ghost"], FileReference("/o2", "root", 10)),
            ])
        # nothing applied
        assert {r.filename for r in st.all_references()} == {"/f1"}


class TestQueryMetadataCache:
    """TTL-cached planner metadata (QueryPlanner.java:111-149)."""

    @staticmethod
    def _schema():
        return Schema((Field("k", T.LongType()),), (),
                      (Field("v", T.LongType(), nullable=True),))

    def _store(self, tmp_path, schema, sub="ss"):
        return StateStore(str(tmp_path / sub), schema)

    def test_within_ttl_no_reload(self, tmp_path):
        kv_schema = self._schema()
        a = self._store(tmp_path, kv_schema)
        a.initialise_partitions(PartitionTree.initial(kv_schema))
        b = StateStore(str(tmp_path / "ss"), kv_schema)
        b.add_files([FileReference("/x/f1.parquet", b.tree.root_id, 5)])
        # a hasn't seen b's commit and must NOT reload within the TTL
        assert a.refresh_if_stale(3600) is False
        assert not a.all_references()

    def test_past_ttl_reloads_only_on_new_txn(self, tmp_path):
        kv_schema = self._schema()
        a = self._store(tmp_path, kv_schema)
        a.initialise_partitions(PartitionTree.initial(kv_schema))
        a._refreshed_at = 0.0
        # no new transactions: probe is O(1), no reload
        assert a.refresh_if_stale(1.0) is False
        b = StateStore(str(tmp_path / "ss"), kv_schema)
        b.add_files([FileReference("/x/f1.parquet", b.tree.root_id, 5)])
        a._refreshed_at = 0.0
        assert a.refresh_if_stale(1.0) is True
        assert [r.filename for r in a.all_references()] == ["/x/f1.parquet"]

    def test_index_invalidated_by_commit(self, tmp_path):
        kv_schema = self._schema()
        s = self._store(tmp_path, kv_schema)
        s.initialise_partitions(PartitionTree.initial(kv_schema))
        root = s.tree.root_id
        assert s.references_for_partition(root) == []
        s.add_files([FileReference("/x/f1.parquet", root, 5)])
        # same object returns fresh view after the commit bumped the seq
        assert [r.filename for r in s.references_for_partition(root)] == \
            ["/x/f1.parquet"]
        # warm path: repeated lookups reuse the memoised index
        idx1 = s.partition_files_index()
        idx2 = s.partition_files_index()
        assert idx1 is idx2

    def test_warm_planning_is_fast(self, tmp_path):
        kv_schema = self._schema()
        import time as _t

        from sleeper_spark.query import Query, QueryPlanner
        from sleeper_spark.ranges import Range, Region

        s = self._store(tmp_path, kv_schema)
        tree = PartitionTree.initial(
            kv_schema, split_points=[i * 10 for i in range(1, 128)])
        s.initialise_partitions(tree)
        refs = [FileReference(f"/x/f{i}.parquet", leaf.id, 10)
                for i, leaf in enumerate(tree.leaves())]
        s.add_files(refs)
        q = Query([Region.of(Range("k", 55, 56))])
        planner = QueryPlanner(s)
        planner.split_into_leaf_queries(q)  # warm the index
        t0 = _t.perf_counter()
        for _ in range(50):
            out = planner.split_into_leaf_queries(q)
        per_query = (_t.perf_counter() - t0) / 50
        assert len(out) == 1
        assert per_query < 0.010, f"warm planning {per_query*1000:.2f}ms"


class TestStateStoreCrashSafety:
    def schema(self):
        return Schema(row_key_fields=(Field("key", T.LongType()),),
                      value_fields=(Field("value", T.LongType()),))

    def test_load_ignores_truncated_tmp_artifacts(self, tmp_path):
        """A crash mid-write leaves .tmp-* files (transaction or
        snapshot) with partial JSON; load must never read them."""
        s = self.schema()
        st = StateStore(str(tmp_path / "ss"), s)
        st.initialise_partitions(PartitionTree.initial(s))
        st.add_files([FileReference("/f1", "root", 10)])
        # simulate crashed writers
        open(os.path.join(st.tx_dir, ".tmp-000000000099-dead.json"),
             "w").write('{"type": "ADD')
        open(os.path.join(st.snap_dir, ".tmp-000000000100.json"),
             "w").write('{"seq"')
        st2 = StateStore(str(tmp_path / "ss"), s)
        assert len(st2.all_references()) == 1

    def test_commit_conflict_leaves_no_tmp(self, tmp_path):
        s = self.schema()
        st = StateStore(str(tmp_path / "ss"), s)
        st.initialise_partitions(PartitionTree.initial(s))
        # occupy the next sequence slot to force a conflict
        nxt = os.path.join(st.tx_dir, f"{st._seq + 1:012d}.json")
        open(nxt, "w").write('{"type": "ADD_FILES", "files": []}')
        import pytest as _pytest
        from sleeper_spark.statestore import TransactionConflict
        with _pytest.raises(TransactionConflict):
            st._commit({"type": "ADD_FILES", "files": []})
        leftovers = [n for n in os.listdir(st.tx_dir) if n.startswith(".tmp")]
        assert leftovers == []

    def test_split_file_references_stale_retry_skips_vanished_ref(self, tmp_path):
        """Writer A plans a ref move; writer B compacts the ref away; A's
        commit must re-validate and skip — never write a transaction
        whose replay raises (which would poison the log forever)."""
        s = self.schema()
        a = StateStore(str(tmp_path / "ss"), s)
        a.initialise_partitions(PartitionTree.initial(s, [100]))
        root = a.tree.root_id
        ref = FileReference("/f1", root, 10,
                            only_contains_data_for_this_partition=False)
        a.add_files([ref])
        kids = list(a.tree[root].child_ids)
        moves = [{"filename": "/f1", "fromPartition": root,
                  "toPartitions": kids}]
        # writer B replaces the ref (e.g. a compaction pulled it down)
        b = StateStore(str(tmp_path / "ss"), s)
        b.replace_file_references(root, ["/f1"],
                                  FileReference("/out", root, 10))
        # A's commit loses the seq race, reloads, revalidates -> no-op
        a.split_file_references(moves)
        # the log must still replay cleanly in a fresh process
        c = StateStore(str(tmp_path / "ss"), s)
        assert {r.filename for r in c.all_references()} == {"/out"}

    def test_split_partition_conflict_retries_consistently(self, tmp_path):
        s = self.schema()
        a = StateStore(str(tmp_path / "ss"), s)
        a.initialise_partitions(PartitionTree.initial(s))
        # writer B advances the log under A's feet
        b = StateStore(str(tmp_path / "ss"), s)
        b.add_files([FileReference("/f1", "root", 10)])
        # A splits: first commit attempt conflicts, retry must reload,
        # revalidate, and commit; tree state must match a fresh load
        left, right = a.tree.split(a.tree.root_id, 0, 50)
        a.split_partition(a.tree[a.tree.root_id], left, right)
        fresh = StateStore(str(tmp_path / "ss"), s)
        assert len(fresh.tree.leaves()) == 2
        assert {p.id for p in fresh.tree.leaves()} == {left.id, right.id}
        assert len(fresh.all_references()) == 1


class TestThirdReviewFixes:
    def schema(self):
        return Schema(row_key_fields=(Field("key", T.LongType()),),
                      value_fields=(Field("value", T.LongType()),))

    def test_add_files_idempotent_by_job_id(self, tmp_path):
        s = self.schema()
        st = StateStore(str(tmp_path / "ss"), s)
        st.initialise_partitions(PartitionTree.initial(s))
        st.add_files([FileReference("/f1", "root", 10)], job_id="job-a")
        # a replayed commit with the same job id must be a no-op
        st.add_files([FileReference("/f1-replayed", "root", 10)],
                     job_id="job-a")
        assert {r.filename for r in st.all_references()} == {"/f1"}
        # replay across a fresh process too (log records the job id)
        st2 = StateStore(str(tmp_path / "ss"), s)
        st2.add_files([FileReference("/f1-again", "root", 10)],
                      job_id="job-a")
        assert {r.filename for r in st2.all_references()} == {"/f1"}
        # a new job id still commits
        st2.add_files([FileReference("/f2", "root", 5)], job_id="job-b")
        assert len(st2.all_references()) == 2

    def test_add_files_reports_replay_skip(self, tmp_path):
        """add_files returns False for a skipped replay — including one
        only discovered inside the commit retry against a STALE store
        (the race ingest_dataframe uses to delete its orphaned files)."""
        s = self.schema()
        st_a = StateStore(str(tmp_path / "ss"), s)
        st_a.initialise_partitions(PartitionTree.initial(s))
        st_b = StateStore(str(tmp_path / "ss"), s)  # loaded BEFORE job-a
        assert st_a.add_files([FileReference("/f1", "root", 10)],
                              job_id="job-a") is True
        # st_b's pre-check still passes (stale state); the conflict
        # retry reloads, re-validates, and must report the skip
        assert st_b.add_files([FileReference("/f1-dup", "root", 10)],
                              job_id="job-a") is False
        assert {r.filename for r in st_b.all_references()} == {"/f1"}

    def test_duplicate_split_points_rejected(self):
        s = self.schema()
        with pytest.raises(ValueError, match="duplicate split"):
            PartitionTree.initial(s, [5, 5, 10])

    def test_schema_rejects_unsupported_value_type(self):
        with pytest.raises(ValueError, match="value field"):
            Schema(row_key_fields=(Field("k", T.LongType()),),
                   value_fields=(Field("ts", T.TimestampType()),))

    def test_region_exact_rejects_unknown_key(self):
        s = self.schema()
        with pytest.raises(ValueError, match="unknown key"):
            Region.exact(s, typo_key=5)

    def test_parent_rollup_partially_failed_children(self):
        from sleeper_spark.tracker import QueryTracker
        tr = QueryTracker()
        tr.query_queued("q", "s1")
        tr.query_queued("q", "s2")
        tr.query_partially_failed("q", "boom", 5, sub_query_id="s1")
        tr.query_partially_failed("q", "bang", 3, sub_query_id="s2")
        parent = tr.get("q")
        assert parent.state.name == "PARTIALLY_FAILED"
        assert parent.row_count == 8
        assert parent.error_message in ("boom", "bang")


class TestTimeTravel:
    def schema(self):
        return Schema(row_key_fields=(Field("key", T.LongType()),),
                      value_fields=(Field("value", T.LongType()),))

    def test_state_at_replays_to_any_seq(self, tmp_path):
        s = self.schema()
        st = StateStore(str(tmp_path / "ss"), s)
        st.initialise_partitions(PartitionTree.initial(s))   # seq 1
        st.add_files([FileReference("/f1", "root", 10)])      # seq 2
        st.add_files([FileReference("/f2", "root", 5)])       # seq 3
        st.replace_file_references("root", ["/f1", "/f2"],
                                   FileReference("/m", "root", 15))  # seq 4
        assert st.current_seq == 4
        v2 = st.state_at(2)
        assert {r.filename for r in v2.all_references()} == {"/f1"}
        v3 = st.state_at(3)
        assert {r.filename for r in v3.all_references()} == {"/f1", "/f2"}
        v4 = st.state_at(4)
        assert {r.filename for r in v4.all_references()} == {"/m"}
        # the view is pinned and read-only
        with pytest.raises(StateStoreException):
            v3.add_files([FileReference("/nope", "root", 1)])
        with pytest.raises(StateStoreException):
            v3.reload()
        assert v3.refresh_if_stale(0.0) is False
        # live store unaffected
        assert {r.filename for r in st.all_references()} == {"/m"}
        with pytest.raises(ValueError):
            st.state_at(99)

    def test_seq_at_time_maps_mtimes(self, tmp_path):
        import os as _os
        import time as _time
        s = self.schema()
        st = StateStore(str(tmp_path / "ss"), s)
        st.initialise_partitions(PartitionTree.initial(s))
        st.add_files([FileReference("/f1", "root", 10)])
        # backdate seq 1..2, keep 3 in the future
        for n, back in (("000000000001.json", 100), ("000000000002.json", 50)):
            p = _os.path.join(st.tx_dir, n)
            _os.utime(p, (_time.time() - back, _time.time() - back))
        st.add_files([FileReference("/f2", "root", 5)])
        _os.utime(_os.path.join(st.tx_dir, "000000000003.json"),
                  (_time.time() + 50, _time.time() + 50))
        assert st.seq_at_time(_time.time() - 75) == 1
        assert st.seq_at_time(_time.time()) == 2
        assert st.seq_at_time(_time.time() + 100) == 3


class TestLogCompaction:
    def schema(self):
        return Schema(row_key_fields=(Field("key", T.LongType()),),
                      value_fields=(Field("value", T.LongType()),))

    def _store_with_snapshots(self, tmp_path):
        import sleeper_spark.statestore as sm
        s = self.schema()
        st = StateStore(str(tmp_path / "ss"), s)
        st.initialise_partitions(PartitionTree.initial(s))
        for i in range(sm.SNAPSHOT_EVERY * 2):
            st.add_files([FileReference(f"/f{i}", "root", 1)])
        return st, sm.SNAPSHOT_EVERY

    def test_delete_old_transactions_and_reload(self, tmp_path):
        import time as _time
        st, every = self._store_with_snapshots(tmp_path)
        top = st.current_seq          # 2*every + 1
        # young snapshots are protected
        assert st.delete_old_transactions(number_behind=0) == []
        deleted = st.delete_old_transactions(
            number_behind=0, min_snapshot_age_seconds=0.0,
            now=_time.time() + 60)
        assert len(deleted) == 2 * every  # everything <= newest snapshot
        # a fresh process still loads the FULL state from the snapshot
        st2 = StateStore(str(tmp_path / "ss"), self.schema())
        assert st2.current_seq == top
        assert len(st2.all_references()) == 2 * every
        # time travel above the horizon works; below it raises clearly
        assert st2.state_at(2 * every).current_seq == 2 * every
        with pytest.raises(StateStoreException, match="missing"):
            st2.state_at(every - 5)
        # and new commits continue from the head
        st2.add_files([FileReference("/new", "root", 1)])
        assert st2.current_seq == top + 1

    def test_number_behind_keeps_travel_window(self, tmp_path):
        """number_behind=every//2 would put the horizon mid-span (at
        2*every - every//2) — the deleter must clamp DOWN to the
        snapshot boundary below (seq=every) so that EVERY retained seq
        is servable by a contiguous snapshot+tail replay, instead of
        leaving a gap whose shadow is silently unreachable."""
        import os as _os
        import time as _time
        st, every = self._store_with_snapshots(tmp_path)
        deleted = st.delete_old_transactions(
            number_behind=every // 2, min_snapshot_age_seconds=0.0,
            now=_time.time() + 60)
        assert len(deleted) == every  # clamped: only seqs <= every went
        # the WHOLE window above the snapshot boundary stays travelable,
        # with correct state at every point
        for probe in (every + 1, 2 * every - every // 2, st.current_seq):
            v = st.state_at(probe)
            assert v.current_seq == probe
            assert len(v.all_references()) == probe - 1
        with pytest.raises(StateStoreException, match="archived"):
            st.state_at(every - 5)

    def test_state_at_refuses_replay_across_gap(self, tmp_path):
        """Defense in depth: if transactions vanish mid-span (manual
        deletion, partial restore), state_at must refuse rather than
        silently reconstruct wrong state from a non-contiguous tail."""
        import os as _os
        st, every = self._store_with_snapshots(tmp_path)
        # punch a hole: remove seqs (every+1 .. every+50) by hand
        for s in range(every + 1, every + 51):
            _os.remove(_os.path.join(st.tx_dir, f"{s:012d}.json"))
        with pytest.raises(StateStoreException, match="contiguous"):
            st.state_at(every + 60)
        # seqs at/below the snapshot and the snapshot-covered head work
        assert st.state_at(every).current_seq == every

    def test_delete_old_snapshots(self, tmp_path):
        st, every = self._store_with_snapshots(tmp_path)
        deleted = st.delete_old_snapshots(keep=1)
        assert deleted == [f"{every:012d}.json"]
        st2 = StateStore(str(tmp_path / "ss"), self.schema())
        assert st2.current_seq == st.current_seq
        with pytest.raises(ValueError):
            st.delete_old_snapshots(keep=0)

    def test_seq_at_time_raises_on_archived_history(self, tmp_path):
        import time as _time
        st, every = self._store_with_snapshots(tmp_path)
        st.delete_old_transactions(
            number_behind=0, min_snapshot_age_seconds=0.0,
            now=_time.time() + 60)
        # a timestamp inside the archived span must raise, not map to
        # the empty pre-init table
        with pytest.raises(StateStoreException, match="archived"):
            st.seq_at_time(0.0)
        # timestamps covering retained transactions still resolve
        assert st.seq_at_time(_time.time() + 60) == st.current_seq

    def test_seq_at_time_on_fully_archived_log(self, tmp_path):
        """Snapshot-only store (every transaction archived): timestamps
        at/after the newest snapshot's mtime must resolve to its seq —
        NOT raise — or timestamp-based as_of would be unusable even for
        current state. Timestamps genuinely older than the snapshot
        still raise."""
        import time as _time
        import sleeper_spark.statestore as sm
        s = self.schema()
        st = StateStore(str(tmp_path / "ss"), s)
        st.initialise_partitions(PartitionTree.initial(s))
        # land the head EXACTLY on a snapshot boundary so archival can
        # empty the transaction log completely
        for i in range(sm.SNAPSHOT_EVERY - 1):
            st.add_files([FileReference(f"/f{i}", "root", 1)])
        assert st.current_seq == sm.SNAPSHOT_EVERY
        st.delete_old_transactions(
            number_behind=0, min_snapshot_age_seconds=0.0,
            now=_time.time() + 60)
        assert st._completed(st.tx_dir) == []   # log is fully archived
        head = st.current_seq
        assert st.seq_at_time(_time.time() + 60) == head
        # and the resolved seq is actually servable
        assert st.state_at(head).current_seq == head
        with pytest.raises(StateStoreException, match="archived"):
            st.seq_at_time(0.0)

    def test_delete_old_snapshots_protects_travel_base(self, tmp_path):
        """The base snapshot serving the retained time-travel window
        must survive the snapshot sweep, or seqs between it and the
        next snapshot become permanently unreachable."""
        import time as _time
        import sleeper_spark.statestore as sm
        s = self.schema()
        st = StateStore(str(tmp_path / "ss"), s)
        st.initialise_partitions(PartitionTree.initial(s))
        for i in range(sm.SNAPSHOT_EVERY * 3):
            st.add_files([FileReference(f"/f{i}", "root", 1)])
        every = sm.SNAPSHOT_EVERY                 # snapshots at 1x,2x,3x
        st.delete_old_transactions(
            number_behind=every, min_snapshot_age_seconds=0.0,
            now=_time.time() + 60)   # horizon 3x-1x=2x -> txns <= 2x go
        deleted = st.delete_old_snapshots(keep=1)
        # newest (3x) kept by keep=1; the base snapshot (2x = oldest
        # retained tx seq - 1) must also survive; 1x is deletable
        base = 2 * every
        assert f"{base:012d}.json" not in deleted
        assert f"{every:012d}.json" in deleted
        mid = 2 * every + every // 2
        v = st.state_at(mid)
        assert v.current_seq == mid
        assert len(v.all_references()) == mid - 1


class TestTimeTravelProperty:
    """Model check: after a random op sequence, state_at(k) must equal
    the file-reference state recorded right after op k was applied —
    for EVERY k, across snapshot boundaries."""

    def test_random_histories_round_trip(self, tmp_path):
        import random
        import sleeper_spark.statestore as sm
        s = Schema(row_key_fields=(Field("key", T.LongType()),),
                   value_fields=(Field("value", T.LongType()),))
        rng = random.Random(11)
        for trial in range(3):
            st = StateStore(str(tmp_path / f"ss{trial}"), s)
            st.initialise_partitions(PartitionTree.initial(s))
            expected = {st.current_seq: set()}
            live: list[str] = []
            n_ops = sm.SNAPSHOT_EVERY + 20  # cross a snapshot boundary
            for i in range(n_ops):
                op = rng.random()
                if op < 0.6 or len(live) < 2:
                    fn = f"/t{trial}-f{i}"
                    st.add_files([FileReference(fn, "root", 1)])
                    live.append(fn)
                elif op < 0.85:
                    take = rng.sample(live, 2)
                    out = f"/t{trial}-m{i}"
                    st.replace_file_references("root", take,
                                               FileReference(out, "root", 2))
                    live = [f for f in live if f not in take] + [out]
                else:
                    st.delete_files([])  # no-op type variety
                expected[st.current_seq] = set(live)
            for k, want in expected.items():
                got = {r.filename for r in st.state_at(k).all_references()}
                assert got == want, (trial, k)


class TestMultiProcessContention:
    """Round-6 hardening: the single-writer commit protocol
    (_commit_with_retry over atomic os.link) proven ACROSS OS PROCESSES,
    not just threads — N workers race ingest + compaction loops against
    ONE store directory (tests/contention_worker.py). Mirrors the
    reference's committer-process guarantees (docs/design.md:169-199)."""

    def test_two_processes_race_without_loss(self, tmp_path):
        import subprocess
        import sys as _sys

        store_path = str(tmp_path / "store")
        data_dir = str(tmp_path / "data")
        import os as _os
        _os.makedirs(data_dir)
        st = StateStore(store_path, Schema(
            row_key_fields=(Field("k", T.LongType()),),
            value_fields=(Field("v", T.LongType()),)))
        st.initialise_partitions(PartitionTree.initial(st.schema))

        worker = _os.path.join(_os.path.dirname(__file__),
                               "contention_worker.py")
        rounds = 30
        procs = [subprocess.Popen(
            [_sys.executable, worker, store_path, data_dir, str(w),
             str(rounds)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
            for w in (0, 1)]
        outs = [p.communicate(timeout=300) for p in procs]
        for p, (out, err) in zip(procs, outs):
            assert p.returncode == 0, err[-2000:]

        import json as _json
        stats = [_json.loads(out.strip().splitlines()[-1])
                 for out, _ in outs]
        assert all(s["ingests"] == rounds for s in stats)
        # with both workers compacting the same partition, at least one
        # compaction must have happened and races are expected overall
        assert sum(s["compactions"] for s in stats) >= 1

        # a fresh process replays the log: contiguous (load() raises on
        # any gap), and every row from every ingest is accounted for
        # exactly once across the surviving files
        st2 = StateStore(store_path, st.schema)
        seqs = [s for s, _ in st2._completed(st2.tx_dir)]
        snaps = st2._completed(st2.snap_dir)
        base = 0
        if snaps:
            import json as _j
            with open(_os.path.join(st2.snap_dir, snaps[-1][1])) as f:
                base = _j.load(f)["seq"]
        lo = min(seqs) if seqs else base + 1
        assert lo <= base + 1          # no hole between snapshot and tail
        if seqs:
            assert seqs == list(range(lo, lo + len(seqs)))  # contiguous
            assert max(seqs) == st2.current_seq
        refs = st2.all_references()
        # racing DELETE rewrites remove rows; each worker reports its
        # exact count, so accounting stays exact: every ingested row is
        # present once OR was deleted exactly once — never duplicated,
        # never lost
        n_deleted = sum(s["rows_deleted"] for s in stats)
        n_replaced = sum(s["rows_replaced"] for s in stats)
        n_merged_in = sum(s["rows_merged_in"] for s in stats)
        assert sum(s["deletes"] for s in stats) >= 1
        assert sum(s["merges"] for s in stats) >= 1
        expected = 2 * rounds * 100 - n_deleted - n_replaced + n_merged_in
        assert sum(r.number_of_rows for r in refs) == expected
        keys = []
        import pyarrow.parquet as _pq
        for r in refs:
            keys.extend(_pq.read_table(r.filename,
                                       columns=["k"]).column("k").to_pylist())
        assert len(keys) == len(set(keys)) == expected
        # no file assigned to a job that never finished its replace: any
        # leftover assignment means a worker crashed mid-compaction,
        # which this test's workers never do
        assert all(r.job_id is None for r in refs)

        # GC finds no orphans: every file on disk is either referenced or
        # in the gc queue; after collecting, only referenced files remain
        from sleeper_spark.maintenance import collect_garbage
        from sleeper_spark.properties import TableProperties
        import time as _time
        on_disk = {_os.path.join(data_dir, f)
                   for f in _os.listdir(data_dir) if f.endswith(".parquet")}
        live = {r.filename for r in refs}
        assert on_disk == live | set(st2.gc_queue)
        collect_garbage(st2, TableProperties(), now=_time.time() + 1e6)
        left = {_os.path.join(data_dir, f)
                for f in _os.listdir(data_dir) if f.endswith(".parquet")}
        assert left == live
