"""Atomic MERGE / full-row upsert (merge.py): key-group replacement +
insert in one MERGE_FILES transaction, crash atomicity, feeds, and
incremental view maintenance through a merge."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sleeper_spark.properties import TableProperties
from sleeper_spark.schema import Field, Schema
from sleeper_spark.statestore import StateStoreException
from sleeper_spark.table import SleeperTable


def _schema():
    return Schema(
        row_key_fields=(Field("key", T.StringType()),),
        sort_key_fields=(Field("seq", T.LongType()),),
        value_fields=(Field("value", T.LongType()),
                      Field("status", T.StringType(), True)),
    )


def _rows(spark, lo, hi, status="old"):
    return spark.range(lo, hi).select(
        F.format_string("k-%06d", F.col("id")).alias("key"),
        F.col("id").alias("seq"),
        F.col("id").alias("value"),
        F.lit(status).alias("status"))


@pytest.fixture
def table(spark, tmp_path):
    t = SleeperTable.create(spark, str(tmp_path / "t"), _schema(),
                            split_points=["k-001000"])
    t.ingest(_rows(spark, 0, 1000))
    t.ingest(_rows(spark, 1000, 2000))
    return t


def _src(spark):
    """Replace keys 100-199 (one row each, new sort key) and insert
    5000-5049."""
    return spark.range(100, 200).union(spark.range(5000, 5050)).select(
        F.format_string("k-%06d", F.col("id")).alias("key"),
        F.lit(0).cast("long").alias("seq"),
        (F.col("id") * 10).alias("value"),
        F.lit("merged").alias("status"))


class TestMergeUpsert:
    def test_replace_and_insert_semantics(self, spark, table):
        pre = table.store.current_seq
        res = table.merge_upsert(_src(spark))
        assert res["rows_inserted"] == 150
        assert res["rows_replaced"] == 100
        assert res["files_untouched"] >= 1  # right partition untouched
        got = table.full_scan()
        assert got.count() == 2000 - 100 + 150
        assert got.where("status = 'merged'").count() == 150
        # matched key GROUPS are fully replaced (old sort-key rows gone)
        assert got.where(
            "key >= 'k-000100' AND key < 'k-000200' "
            "AND status <> 'merged'").count() == 0
        assert got.where("key < 'k-000100' AND status <> 'old'") \
            .count() == 0
        # one atomic seq: history before it has no merged rows at all
        old = table.as_of(seq=pre).full_scan()
        assert old.count() == 2000
        assert old.where("status = 'merged'").count() == 0
        # feeds: old groups in the deletion feed, ALL source rows in
        # the append feed
        assert table.deleted_rows_between(pre).count() == 100
        assert table.added_rows_between(pre).count() == 150
        # engine invariants survive: compaction + point lookups
        table.compact()
        assert table.full_scan().count() == 2050
        assert table.exact_key_query(key="k-000150").first().value \
            == 1500
        assert table.exact_key_query(key="k-005001").first().status \
            == "merged"

    def test_single_transaction_atomicity_on_crash(self, spark, table,
                                                   monkeypatch):
        """Kill after every file is written but before the ONE commit:
        the table must serve the old version in full — no half-upserted
        state is even representable, because the replace and add halves
        live in the same transaction."""
        before = sorted(tuple(r) for r in table.full_scan().collect())
        store = table.store
        real = store.merge_files

        def crashing(*a, **kw):
            raise RuntimeError("injected crash before commit")

        monkeypatch.setattr(store, "merge_files", crashing)
        with pytest.raises(RuntimeError, match="injected crash"):
            table.merge_upsert(_src(spark))
        monkeypatch.setattr(store, "merge_files", real)
        after = sorted(tuple(r) for r in table.full_scan().collect())
        assert after == before
        # abandoned claim blocks, unassign recovers, retry lands once
        jid = next(r.job_id for r in store.all_references()
                   if r.job_id is not None)
        assert jid.startswith("merge-")
        with pytest.raises(StateStoreException, match="claimed"):
            table.merge_upsert(_src(spark))
        store.unassign_job_ids(jid)
        res = table.merge_upsert(_src(spark))
        assert res["rows_inserted"] == 150
        assert table.full_scan().count() == 2050

    def test_commit_replay_is_idempotent(self, spark, table):
        res = table.merge_upsert(_src(spark))
        n = table.full_scan().count()
        # a re-delivered MERGE commit with the same job id is skipped
        table.store.merge_files([], [], res["job_id"])
        assert table.full_scan().count() == n

    def test_insert_only_and_empty_source(self, spark, table):
        res = table.merge_upsert(_rows(spark, 9000, 9010, "new"))
        assert res["rows_replaced"] == 0 and res["rows_inserted"] == 10
        assert res["files_rewritten"] == 0  # Blooms pruned every file
        empty = _rows(spark, 0, 0)
        res2 = table.merge_upsert(empty)
        assert res2["job_id"] is None
        # uniform result shape: every exit carries the full key set
        assert set(res2) == set(res) and not res2["replayed"]
        assert res2["files_removed"] == 0 == res2["tombstone_files"]
        assert table.full_scan().count() == 2010

    def test_guards(self, spark, table):
        with pytest.raises(ValueError, match="more than 5 distinct"):
            table.merge_upsert(_rows(spark, 0, 100), cap=5)
        with pytest.raises(ValueError, match="missing table column"):
            table.merge_upsert(_rows(spark, 0, 10).drop("status"))
        bad = spark.createDataFrame(
            [(None, 0, 0, "x")],
            "key string, seq long, value long, status string")
        with pytest.raises(ValueError, match="null row key"):
            table.merge_upsert(bad)

    def test_sum_view_maintains_through_merge(self, spark, tmp_path,
                                              table):
        from sleeper_spark.views import MaterializedView

        vschema = Schema(
            (Field("status", T.StringType()),), (),
            (Field("n", T.LongType()), Field("v", T.LongType())))
        dest = SleeperTable.create(
            spark, str(tmp_path / "view"), vschema,
            TableProperties(aggregations="sum(n), sum(v)"))

        def transform(batch):
            return batch.where(F.col("status").isNotNull()).select(
                "status", F.lit(1).cast("long").alias("n"),
                F.col("value").alias("v"))

        def on_delete(deleted, job_id):
            dest.ingest(transform(deleted)
                        .withColumn("n", -F.col("n"))
                        .withColumn("v", -F.col("v")), job_id=job_id)

        mv = MaterializedView(table, dest, transform,
                              on_delete=on_delete)
        mv.refresh()
        table.merge_upsert(_src(spark))
        table.ingest(_rows(spark, 3000, 3100))  # append after merge
        assert mv.refresh() >= 2
        got = {r.status: (r.n, r.v) for r in
               dest.full_scan().collect() if r.n != 0}
        want = {r.status: (r.n, r.v) for r in
                table.full_scan().groupBy("status")
                .agg(F.count(F.lit(1)).alias("n"),
                     F.sum("value").alias("v")).collect()}
        assert got == want
        assert got["merged"] == (150, sum(
            i * 10 for i in list(range(100, 200))
            + list(range(5000, 5050))))

    def test_view_without_handler_refuses_merge(self, spark, tmp_path,
                                                table):
        from sleeper_spark.views import MaterializedView

        vschema = Schema(
            (Field("status", T.StringType()),), (),
            (Field("n", T.LongType()),))
        dest = SleeperTable.create(
            spark, str(tmp_path / "v2"), vschema,
            TableProperties(aggregations="sum(n)"))
        mv = MaterializedView(
            table, dest,
            lambda b: b.where(F.col("status").isNotNull())
            .select("status", F.lit(1).cast("long").alias("n")))
        mv.refresh()
        table.merge_upsert(_src(spark))
        with pytest.raises(ValueError, match="delete_where/update"):
            mv.refresh()

    def test_secondary_index_maintains_through_merge(self, spark,
                                                     tmp_path, table):
        from sleeper_spark.views import SecondaryIndex

        idx = SecondaryIndex.create(table, str(tmp_path / "idx"),
                                    "status")
        idx.refresh()
        table.merge_upsert(_src(spark))
        idx.refresh()
        assert idx.lookup("merged").count() == 150
        assert idx.lookup("old").count() == 1900
        fresh = SecondaryIndex.create(table, str(tmp_path / "idx2"),
                                      "status")
        fresh.refresh()
        a = sorted(tuple(r) for r in idx.index.full_scan().collect())
        b = sorted(tuple(r) for r in fresh.index.full_scan().collect())
        assert a == b


class TestMergeWhen:
    """Conditional MERGE (merge.merge_when): Delta-style WHEN MATCHED
    UPDATE/DELETE + WHEN NOT MATCHED INSERT, one atomic commit,
    row-level clauses within key groups, untouched groups' files never
    rewritten."""

    def _cond_src(self, spark):
        """Source touching keys 100-159 (unique per key) + 2 new keys:
        value >= 130*10 -> delete clause; others -> update clause."""
        return spark.range(100, 160).union(
            spark.range(9000, 9002)).select(
            F.format_string("k-%06d", F.col("id")).alias("key"),
            F.lit(0).cast("long").alias("seq"),
            (F.col("id") * 10).alias("value"),
            F.lit("src").alias("status"))

    def test_clause_semantics_atomic(self, spark, table):
        pre = table.store.current_seq
        res = table.merge_when(
            self._cond_src(spark),
            update_set={"status": "'bumped'",
                        "value": "t.value + s.value"},
            update_condition="s.value < 1300",
            delete_condition="s.value >= 1300")
        # 30 keys updated, 30 deleted, 2 inserted; one commit
        assert res["groups_deleted"] == 30
        assert res["groups_touched"] == 60
        assert res["rows_inserted"] == 30 + 2  # replacements + inserts
        got = table.full_scan()
        # deleted: keys 130-159 gone entirely
        assert got.where(
            "key >= 'k-000130' AND key < 'k-000160'").count() == 0
        # updated: keys 100-129 carry t.value + s.value = id + id*10
        upd = got.where("status = 'bumped'")
        assert upd.count() == 30
        assert upd.where("value <> seq * 11").count() == 0
        # untouched rows byte-identical, inserts present
        assert got.where("key < 'k-000100' AND status <> 'old'") \
            .count() == 0
        assert got.where("key >= 'k-009000'").count() == 2
        assert got.count() == 2000 - 30 + 2
        # single atomic seq: pre-merge history fully intact
        old = table.as_of(seq=pre).full_scan()
        assert old.count() == 2000
        # feeds carry the old versions of every touched group
        assert table.deleted_rows_between(pre).count() == 60

    def test_untouched_groups_keep_their_files(self, spark, table):
        """A source whose clauses touch NOTHING must not rewrite any
        file — conditional merge prunes to affected key groups."""
        files_before = {r.filename for r in table.store.all_references()}
        res = table.merge_when(
            self._cond_src(spark).where("key < 'k-000160'"),
            update_set={"status": "'x'"},
            update_condition="s.value < 0",   # never true
            delete_condition="s.value < 0",   # never true
            insert=False)
        assert res["groups_touched"] == 0
        assert res["rows_replaced"] == 0 and res["rows_inserted"] == 0
        assert {r.filename for r in table.store.all_references()} \
            == files_before
        assert table.full_scan().count() == 2000

    def test_row_level_within_sort_keyed_group(self, spark, table):
        """Duplicate-keyed group: only the rows meeting the delete
        condition leave; the group's other rows survive (row-level,
        not group-level, clauses)."""
        # make key k-000500 a two-row group with distinct seq values
        extra = spark.createDataFrame(
            [("k-000500", 99, 77, "old2")],
            "key string, seq long, value long, status string")
        table.ingest(extra)
        src = spark.createDataFrame(
            [("k-000500", 0, 1, "s")],
            "key string, seq long, value long, status string")
        res = table.merge_when(
            src, delete_condition="t.seq = 99", insert=False)
        assert res["groups_deleted"] == 0  # group survives partially
        assert res["groups_touched"] == 1
        grp = table.exact_key_query(key="k-000500").collect()
        assert [(r.seq, r.status) for r in grp] == [(500, "old")]

    def test_guards(self, spark, table):
        src = self._cond_src(spark)
        with pytest.raises(ValueError, match="WHEN MATCHED"):
            table.merge_when(src)
        with pytest.raises(ValueError, match="update_condition"):
            table.merge_when(src, update_condition="true")
        with pytest.raises(ValueError, match="key column"):
            table.merge_when(src, update_set={"key": "'x'"})
        with pytest.raises(ValueError, match="unknown column"):
            table.merge_when(src, update_set={"nope": "1"})
        dup = src.union(src)
        with pytest.raises(ValueError, match="multiple rows"):
            table.merge_when(dup, delete_condition="true")
        # a table column named like an alias cannot be a qualifier
        with pytest.raises(ValueError, match="also a table column"):
            table.merge_when(src, delete_condition="true",
                             source_alias="status")
        with pytest.raises(ValueError, match="must differ"):
            table.merge_when(src, delete_condition="true",
                             target_alias="a", source_alias="a")

    def test_crash_atomicity_with_pure_deletions(self, spark, table,
                                                 monkeypatch):
        """Kill before the ONE commit of a merge_when whose clauses
        include whole-group deletions: the old state stays fully
        readable (delete_keys ride the same MERGE_FILES transaction),
        and after claim recovery the retry lands exactly once."""
        before = sorted(tuple(r) for r in table.full_scan().collect())
        store = table.store
        real = store.merge_files

        def crashing(*a, **kw):
            raise RuntimeError("injected crash before commit")

        monkeypatch.setattr(store, "merge_files", crashing)
        with pytest.raises(RuntimeError, match="injected crash"):
            table.merge_when(self._cond_src(spark),
                             delete_condition="s.value >= 1300",
                             update_set={"status": "'b'"},
                             update_condition="s.value < 1300")
        monkeypatch.setattr(store, "merge_files", real)
        assert sorted(tuple(r) for r in table.full_scan().collect()) \
            == before
        jid = next(r.job_id for r in store.all_references()
                   if r.job_id is not None)
        store.unassign_job_ids(jid)
        res = table.merge_when(self._cond_src(spark),
                               delete_condition="s.value >= 1300",
                               update_set={"status": "'b'"},
                               update_condition="s.value < 1300")
        assert res["groups_deleted"] == 30
        assert table.full_scan().where(
            "key >= 'k-000130' AND key < 'k-000160'").count() == 0

    def test_idempotent_replay_by_job_id(self, spark, table):
        src = self._cond_src(spark)
        res = table.merge_when(src, delete_condition="s.value >= 1300",
                               update_set={"status": "'b'"},
                               update_condition="s.value < 1300",
                               job_id="merge-mw-replay-1")
        n = table.full_scan().count()
        res2 = table.merge_when(src, delete_condition="s.value >= 1300",
                                update_set={"status": "'b'"},
                                update_condition="s.value < 1300",
                                job_id="merge-mw-replay-1")
        assert res2["replayed"] and table.full_scan().count() == n


class TestStreamMerge:
    def test_cdc_stream_applies_exactly_once(self, spark, tmp_path,
                                             table):
        """Two CDC micro-batches (pinned by maxFilesPerTrigger): the
        second RE-UPDATES a key the first touched — last batch wins,
        exactly the versioned-row contract. Final state equals
        applying the batches sequentially."""
        from sleeper_spark import streaming

        b1 = _src(spark)                            # 100-199 + 5000-5049
        b2 = spark.range(150, 160).select(          # re-update 150-159
            F.format_string("k-%06d", F.col("id")).alias("key"),
            F.lit(1).cast("long").alias("seq"),
            (F.col("id") * 100).alias("value"),
            F.lit("v2").alias("status"))
        src = tmp_path / "cdc"
        src.mkdir()
        b1.coalesce(1).write.parquet(str(src / "b1"))
        b2.coalesce(1).write.parquet(str(src / "b2"))
        stream = (spark.readStream
                  .schema("key string, seq long, value long, "
                          "status string")
                  .option("maxFilesPerTrigger", "1")
                  .parquet(str(src / "*")))
        q = streaming.stream_merge(table, stream,
                                   str(tmp_path / "ckpt"))
        q.awaitTermination(120)
        got = table.full_scan()
        assert got.count() == 2050
        assert got.where("status = 'v2'").count() == 10
        assert got.where("key = 'k-000155'").first().value == 15500
        assert got.where("status = 'merged'").count() == 140
        # a FRESH stream over the same source + checkpoint replays
        # nothing (job-id idempotence underneath the checkpoint)
        stream2 = (spark.readStream
                   .schema("key string, seq long, value long, "
                           "status string")
                   .parquet(str(src / "*")))
        q2 = streaming.stream_merge(table, stream2,
                                    str(tmp_path / "ckpt"))
        q2.awaitTermination(120)
        assert table.full_scan().count() == 2050

    def test_replayed_job_id_is_noop_and_crash_reclaims(self, spark,
                                                        table):
        res = table.merge_upsert(_src(spark), job_id="merge-fixed-1")
        assert res["rows_inserted"] == 150
        replay = table.merge_upsert(_src(spark), job_id="merge-fixed-1")
        assert replay.get("replayed") and replay["rows_inserted"] == 0
        assert table.full_scan().count() == 2050
        # crash between claim and commit, then retry with the SAME id:
        # the retry re-claims its own candidates and completes
        store = table.store
        real = store.merge_files

        def crashing(*a, **kw):
            raise RuntimeError("boom")

        store.merge_files = crashing
        b2 = _rows(spark, 300, 320, "v2")
        with pytest.raises(RuntimeError):
            table.merge_upsert(b2, job_id="merge-fixed-2")
        store.merge_files = real
        assert any(r.job_id == "merge-fixed-2"
                   for r in store.all_references())
        res2 = table.merge_upsert(b2, job_id="merge-fixed-2")
        assert res2["rows_replaced"] == 20
        assert table.full_scan().where("status = 'v2'").count() == 20
        with pytest.raises(ValueError, match="must start with"):
            table.merge_upsert(b2, job_id="not-prefixed")


from hypothesis import HealthCheck, given, settings, strategies as st


batch_strategy = st.lists(
    st.lists(st.tuples(st.integers(0, 30),        # key
                       st.integers(0, 3),         # sort seq
                       st.integers(-100, 100)),   # value
             min_size=0, max_size=12),
    min_size=1, max_size=4)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(batches=batch_strategy)
def test_merge_sequence_matches_dict_model(spark, tmp_path_factory,
                                           batches):
    """Property: any sequence of merge batches leaves the table equal
    to the obvious model — a dict keyed by row key whose value is the
    LAST batch's full row group for that key (within one batch,
    duplicate (key, seq) rows all survive: merge replaces groups, it
    does not dedupe the source)."""
    tmp = tmp_path_factory.mktemp("mprop")
    schema = Schema(
        row_key_fields=(Field("key", T.LongType()),),
        sort_key_fields=(Field("seq", T.LongType()),),
        value_fields=(Field("value", T.LongType()),))
    t = SleeperTable.create(spark, str(tmp / "t"), schema,
                            split_points=[15])
    model: dict[int, list[tuple]] = {}
    for bi, batch in enumerate(batches):
        df = spark.createDataFrame(
            [(k, s, v) for k, s, v in batch] or
            spark.sparkContext.emptyRDD(),
            "key long, seq long, value long")
        t.merge_upsert(df)
        for k in {k for k, _, _ in batch}:
            model[k] = [(k, s, v) for kk, s, v in batch if kk == k]
    got = sorted(tuple(r) for r in t.full_scan().collect())
    want = sorted(row for rows in model.values() for row in rows)
    assert got == want


mw_batch_strategy = st.lists(
    st.lists(st.tuples(st.integers(0, 30),        # key
                       st.integers(-100, 100)),   # source value
             min_size=0, max_size=12,
             unique_by=lambda t: t[0]),           # unique per row key
    min_size=1, max_size=4)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(batches=mw_batch_strategy)
def test_merge_when_sequence_matches_dict_model(spark,
                                                tmp_path_factory,
                                                batches):
    """Property: any sequence of conditional merges (delete when the
    source value is negative, update otherwise, insert unmatched keys)
    leaves the table equal to the obvious dict model applied batch by
    batch."""
    tmp = tmp_path_factory.mktemp("mwprop")
    schema = Schema(
        row_key_fields=(Field("key", T.LongType()),),
        sort_key_fields=(),
        value_fields=(Field("value", T.LongType()),))
    t = SleeperTable.create(spark, str(tmp / "t"), schema,
                            split_points=[15])
    t.ingest(spark.createDataFrame(
        [(k, k * 10) for k in range(0, 20)], "key long, value long"))
    model = {k: k * 10 for k in range(0, 20)}
    for batch in batches:
        df = spark.createDataFrame(
            [(k, v) for k, v in batch] or
            spark.sparkContext.emptyRDD(),
            "key long, value long")
        t.merge_when(
            df,
            update_set={"value": "t.value + s.value"},
            update_condition="s.value >= 0",
            delete_condition="s.value < 0")
        for k, v in batch:
            if k in model:
                if v < 0:
                    del model[k]
                else:
                    model[k] = model[k] + v
            else:
                model[k] = v  # WHEN NOT MATCHED INSERT (as-is)
    got = sorted((r.key, r.value) for r in t.full_scan().collect())
    assert got == sorted(model.items())


class TestKnownKeys:
    def test_known_keys_equals_collected_path(self, spark, tmp_path):
        """merge_upsert(known_keys=...) produces the identical table
        state, result dict and file plan as the distinct-key-collect
        path it skips (the merge_when caller optimization)."""
        from sleeper_spark.merge import merge_upsert
        tables = []
        for name in ("a", "b"):
            t = SleeperTable.create(spark, str(tmp_path / name),
                                    _schema(),
                                    split_points=["k-001000"])
            t.ingest(_rows(spark, 0, 2000))
            tables.append(t)
        ta, tb = tables
        src = _src(spark)
        ra = merge_upsert(ta, src, job_id="merge-kk-test")
        kk = sorted((f"k-{i:06d}",)
                    for i in list(range(100, 200))
                    + list(range(5000, 5050)))
        rb = merge_upsert(tb, src, job_id="merge-kk-test",
                          known_keys=kk)
        for k in ("rows_inserted", "rows_replaced", "files_rewritten",
                  "files_removed", "files_untouched",
                  "tombstone_files"):
            assert ra[k] == rb[k], k
        assert sorted(map(tuple, ta.full_scan().collect())) == \
            sorted(map(tuple, tb.full_scan().collect()))

    def test_known_keys_checks_null_cap_noop(self, spark, tmp_path):
        """The known-keys path applies the same null / cap / noop
        contract checks as the collected path."""
        from sleeper_spark.merge import merge_upsert
        t = SleeperTable.create(spark, str(tmp_path / "t"), _schema(),
                                split_points=["k-001000"])
        t.ingest(_rows(spark, 0, 10))
        src = _src(spark)
        with pytest.raises(ValueError, match="null row key"):
            merge_upsert(t, src, known_keys=[("k-000100",), (None,)])
        with pytest.raises(ValueError, match="more than 2 distinct"):
            merge_upsert(t, src, cap=2,
                         known_keys=[("a",), ("b",), ("c",)])
        res = merge_upsert(t, src.limit(0), known_keys=[])
        assert res["rows_inserted"] == 0 and res["files_rewritten"] == 0

    def test_merge_when_result_unchanged(self, spark, tmp_path):
        """merge_when (which now derives known_keys driver-side) still
        applies update/delete/insert clauses correctly end to end."""
        from sleeper_spark.merge import merge_when
        t = SleeperTable.create(spark, str(tmp_path / "t"), _schema(),
                                split_points=["k-001000"])
        t.ingest(_rows(spark, 0, 20))
        src = spark.range(5, 30).select(
            F.format_string("k-%06d", F.col("id")).alias("key"),
            F.lit(0).cast("long").alias("seq"),
            (F.col("id") * 100).alias("value"),
            F.lit("src").alias("status"))
        res = merge_when(
            t, src,
            update_set={"status": "concat(t.status, '+', s.status)"},
            update_condition="s.value >= 1000",
            delete_condition="s.value < 700",
            insert=True)
        rows = {r["key"]: (r["value"], r["status"])
                for r in t.full_scan().collect()}
        # keys 5..6 deleted (value<700); 7..9 matched, neither clause
        # (700<=s.value<1000, update cond false) -> untouched; 10..19
        # updated; 20..29 inserted
        assert res["groups_deleted"] == 2
        assert "k-000005" not in rows and "k-000006" not in rows
        assert rows["k-000007"] == (7, "old")
        assert rows["k-000010"] == (10, "old+src")
        assert rows["k-000019"] == (19, "old+src")
        assert rows["k-000025"] == (2500, "src")
        assert len(rows) == 20 - 2 + 10
