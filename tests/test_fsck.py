"""verify_integrity (fsck): every check must fire on a real planted
defect and stay silent on a healthy table."""
import json
import os
import shutil

import pytest
from pyspark.sql import functions as F, types as T

from sleeper_spark import Field, Schema, SleeperTable, sketches


@pytest.fixture()
def table(spark, tmp_path):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet") \
        .select("event_id", "user_id")
    schema = Schema((Field("event_id", T.LongType()),), (),
                    (Field("user_id", T.LongType(), True),))
    t = SleeperTable.create(spark, str(tmp_path / "t"), schema,
                            split_points=[500])
    t.ingest(ev)
    return t


def errs(report):
    return "\n".join(report["errors"])


class TestFsck:
    def test_healthy_table_is_ok(self, table):
        r = table.verify_integrity()
        assert r["ok"], errs(r)
        assert r["files_checked"] >= 2
        assert r["orphans"] == []

    def test_healthy_after_compaction_and_gc(self, table):
        import time
        table.compact()
        table.collect_garbage(now=time.time() + 10**6)
        r = table.verify_integrity()
        assert r["ok"], errs(r)

    def test_missing_file_detected(self, table):
        victim = sorted(table.store.files)[0]
        os.remove(victim)
        r = table.verify_integrity()
        assert not r["ok"]
        assert any("missing data file" in e for e in r["errors"])

    def test_row_count_drift_detected(self, spark, table):
        """Overwrite a live file with one holding fewer rows (same
        schema, keys inside the leaf) — footer count must contradict
        the manifest."""
        victim = sorted(table.store.files)[0]
        few = spark.createDataFrame([(1, 1)], ["event_id", "user_id"]) \
            .select(F.col("event_id").cast("long"),
                    F.col("user_id").cast("long"))
        import tempfile
        d = tempfile.mkdtemp()
        few.coalesce(1).write.mode("overwrite").parquet(d)
        import glob
        shutil.copyfile(glob.glob(d + "/part-*.parquet")[0], victim)
        r = table.verify_integrity()
        assert any("row-count drift" in e for e in r["errors"])

    def test_unsorted_file_detected(self, spark, table):
        """Replace a live file with one whose row groups overlap on the
        row key — the merge-reader invariant is broken."""
        # victim in the [500, inf) leaf so keys 600-800 stay in range
        victim = next(
            fn for fn, by_part in table.store.files.items()
            if any(table.store.tree[pid].region.ranges[0].min == 500
                   for pid in by_part))
        n = sum(r.number_of_rows
                for r in table.store.files[victim].values())
        import pyarrow as pa
        import pyarrow.parquet as pq
        # two row groups, interleaved key ranges, total rows preserved
        half = n // 2
        k1 = list(range(700, 700 + half))
        k2 = list(range(600, 600 + (n - half)))
        w = pq.ParquetWriter(
            victim, pa.schema([("event_id", pa.int64()),
                               ("user_id", pa.int64())]))
        w.write_table(pa.table({"event_id": k1, "user_id": k1}))
        w.write_table(pa.table({"event_id": k2, "user_id": k2}))
        w.close()
        r = table.verify_integrity()
        assert any("unsorted file" in e for e in r["errors"]), errs(r)

    def test_out_of_partition_file_detected(self, spark, table):
        """A sorted file whose keys fall OUTSIDE its leaf partition's
        range must be flagged (would duplicate/lose rows under the
        leaf-guard dedup)."""
        # victim in the [500, inf) leaf: write keys < 500 into it
        victim = None
        for fn, by_part in table.store.files.items():
            for pid, ref in by_part.items():
                rng = table.store.tree[pid].region.ranges[0]
                if rng.min == 500:
                    victim = fn
        assert victim
        import pyarrow as pa
        import pyarrow.parquet as pq
        n = sum(r.number_of_rows for r in table.store.files[victim].values())
        ks = list(range(10, 10 + n))
        pq.write_table(pa.table({"event_id": ks, "user_id": ks}), victim)
        r = table.verify_integrity()
        assert any("outside its leaf partition" in e
                   for e in r["errors"]), errs(r)

    def test_orphan_and_corrupt_sidecar_warn_and_error(self, table):
        orphan = os.path.join(table.data_dir, "stray.parquet")
        with open(orphan, "wb") as f:
            f.write(b"not really parquet")
        victim = sorted(table.store.files)[0]
        with open(sketches.sidecar_path(victim), "w") as f:
            f.write("{truncated")
        r = table.verify_integrity()
        assert any("orphan parquet" in w for w in r["warnings"])
        assert orphan in r["orphans"]
        assert any("corrupt sidecar" in e for e in r["errors"])

    def test_broken_partition_tree_detected(self, table):
        """Tamper a child's parent pointer in the in-memory tree."""
        tree = table.store.tree
        leaf = tree.leaves()[0]
        object.__setattr__(leaf, "parent_id", "nonexistent")
        r = table.verify_integrity()
        assert any("parent_id" in e for e in r["errors"]), errs(r)


class TestVacuumOrphans:
    def test_reclaims_old_orphans_keeps_live_young_and_history(
            self, spark, tmp_path):
        """Only unreferenced parquet older than min_age goes: live
        files, GC-queued (time-travel) files, and young orphans all
        survive; sidecars of deleted orphans go with them; fsck's
        orphan warning clears."""
        import os
        import time

        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        from sleeper_spark.maintenance import (
            vacuum_orphans, verify_integrity)
        from sleeper_spark.schema import Field, Schema
        from sleeper_spark.table import SleeperTable

        schema = Schema((Field("k", T.LongType()),), (),
                        (Field("v", T.LongType()),))
        t = SleeperTable.create(spark, str(tmp_path / "t"), schema)
        rows = spark.range(0, 100).select(
            F.col("id").alias("k"), F.col("id").alias("v"))
        t.ingest(rows)
        t.ingest(rows)
        t.compact()  # replaced inputs now sit in the GC queue
        pre_seq = t.store.current_seq
        # plant orphans: an old one (crashed writer) and a young one
        # (in-flight writer)
        old = os.path.join(t.data_dir, "crashed-job", "part-0.parquet")
        os.makedirs(os.path.dirname(old))
        young = os.path.join(t.data_dir, "inflight.parquet")
        import shutil
        src = next(iter(t.store.all_references())).filename
        shutil.copy(src, old)
        shutil.copy(src + ".sketch.json", old + ".sketch.json") \
            if os.path.exists(src + ".sketch.json") else None
        shutil.copy(src, young)
        os.utime(old, (time.time() - 3600, time.time() - 3600))
        res = vacuum_orphans(t.store, t.props, t.data_dir,
                             min_age_seconds=600)
        assert res["deleted"] == [old]
        assert res["kept_young"] == [young]
        assert res["bytes_reclaimed"] > 0
        assert not os.path.exists(old)
        assert os.path.exists(young)
        # live + gc-queued untouched: reads and time travel still work
        assert t.full_scan().count() == 200
        assert t.as_of(seq=pre_seq).full_scan().count() == 200
        fsck = verify_integrity(t.store, schema, t.data_dir)
        assert old not in fsck["orphans"]
        assert young in fsck["orphans"]  # still young, still reported
