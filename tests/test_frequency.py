"""Heavy hitters: sharded exact top-k, per-file mergeable summaries,
sidecar lifecycle on SleeperTable, and the skew advisor."""
import os

import pytest
from pyspark.sql import functions as F, types as T

from sleeper_spark.functions import frequency


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet("/root/testdata/sf0.001/events.parquet")


class TestShardedTop:
    def test_exactness_vs_plain_topk(self, events):
        """The per-shard prune must lose nothing: output equals the
        unpruned groupBy + order + limit result."""
        got = [(r.v, r.n) for r in
               frequency.sharded_top_items(events, "user_id", k=10).collect()]
        want = [(r.v, r.n) for r in
                events.groupBy(F.col("user_id").alias("v"))
                .agg(F.count("*").alias("n"))
                .orderBy(F.col("n").desc(), "v").limit(10).collect()]
        assert got == want

    def test_m_below_k_rejected(self, events):
        with pytest.raises(ValueError):
            frequency.sharded_top_items(events, "user_id", k=10, m=5)

    def test_plan_has_window_group_limit(self, events):
        """The prune must happen BEFORE the final ordering: Spark plans
        a WindowGroupLimit for the rank filter, bounding exchange input
        at shards x m rows."""
        df = frequency.sharded_top_items(events, "user_id", k=10)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "WindowGroupLimit" in plan


class TestFileSummaries:
    def test_bounds_contain_truth_and_heavy_hitter_present(
            self, spark, tmp_path):
        """Write two skewed files; merged bounds must bracket every
        candidate's true count, and the dominant key must be present
        with an exact (lower == upper == truth) count when it tops both
        files."""
        rows_a = [(7, i) for i in range(60)] + [(i + 100, i) for i in range(40)]
        rows_b = [(7, i) for i in range(50)] + [(i + 500, i) for i in range(50)]
        pa_, pb = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
        spark.createDataFrame(rows_a, ["k", "x"]).coalesce(1) \
            .write.mode("overwrite").parquet(pa_ + ".d")
        spark.createDataFrame(rows_b, ["k", "x"]).coalesce(1) \
            .write.mode("overwrite").parquet(pb + ".d")
        import glob
        fa = glob.glob(pa_ + ".d/part-*.parquet")[0]
        fb = glob.glob(pb + ".d/part-*.parquet")[0]
        summ = frequency.per_file_top_items(spark, [fa, fb], "k", m=8)
        assert summ[fa]["rows"] == 100 and summ[fb]["rows"] == 100
        # every per-file count below the kept set is 1 here -> threshold 1
        assert summ[fa]["threshold"] == 1 and summ[fb]["threshold"] == 1
        merged = frequency.merge_top_summaries([summ[fa], summ[fb]])
        by_val = {v: (lo, up) for v, lo, up in merged}
        assert by_val[7] == (110, 110)  # in both top-8s: exact
        # a tail key kept in one file only: bounded by other file's threshold
        for v, (lo, up) in by_val.items():
            if v != 7:
                assert up - lo <= 1
        # merged order: heaviest first
        assert merged[0][0] == 7

    def test_summary_complete_when_file_small(self, spark, tmp_path):
        """<= m distinct values -> threshold 0 and the summary is the
        exact histogram (bounds collapse everywhere)."""
        p = str(tmp_path / "s.d")
        spark.createDataFrame([(1,), (1,), (2,)], ["k"]).coalesce(1) \
            .write.mode("overwrite").parquet(p)
        import glob
        f = glob.glob(p + "/part-*.parquet")[0]
        s = frequency.per_file_top_items(spark, [f], "k", m=8)[f]
        assert s["threshold"] == 0
        assert sorted(s["top"]) == [(1, 2), (2, 1)]
        merged = frequency.merge_top_summaries([s])
        assert merged == [(1, 2, 2), (2, 1, 1)]


class TestTableHotKeys:
    def test_lifecycle_and_sidecar_reuse(self, spark, tmp_path):
        from sleeper_spark import Field, Schema, SleeperTable, sketches
        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet") \
            .select("event_id", "user_id")
        schema = Schema(row_key_fields=(Field("event_id", T.LongType()),),
                        value_fields=(Field("user_id", T.LongType(),
                                            nullable=True),))
        t = SleeperTable.create(spark, str(tmp_path / "t"), schema,
                                split_points=[2000, 6000])
        t.ingest(ev)
        got = t.hot_keys("user_id", k=5, m=64)
        want = [(r.v, r.n) for r in
                ev.groupBy(F.col("user_id").alias("v"))
                .agg(F.count("*").alias("n"))
                .orderBy(F.col("n").desc(), "v").limit(5).collect()]
        # bounds must bracket truth for the true top-5
        by_val = {v: (lo, up) for v, lo, up in got}
        for v, n in want:
            assert v in by_val, f"true heavy hitter {v} missing"
            lo, up = by_val[v]
            assert lo <= n <= up
        # summaries persisted: every live file's sidecar now carries topm
        for fn in t.store.files.keys():
            sc = sketches.load_sidecar(fn)
            assert sc and "user_id@64" in sc.get("topm", {})
        # second call is pure driver math (no missing files) and agrees
        assert t.hot_keys("user_id", k=5, m=64) == got

    def test_advise_salting_flags_hot_key_only(self, spark, tmp_path):
        from sleeper_spark import Field, Schema, SleeperTable
        rows = [(i, 7) for i in range(900)] + [(1000 + i, i) for i in range(100)]
        df = spark.createDataFrame(rows, ["k", "u"])
        schema = Schema(row_key_fields=(Field("k", T.LongType()),),
                        value_fields=(Field("u", T.LongType(),
                                            nullable=True),))
        t = SleeperTable.create(spark, str(tmp_path / "t2"), schema)
        t.ingest(df)
        plan = t.advise_salting("u", n_partitions=10, hot_multiple=2.0)
        assert [v for v, _up, _s in plan] == [7]
        v, up, salt = plan[0]
        import math
        # upper may exceed truth by absent-file thresholds, never undershoot
        assert 900 <= up <= 910
        assert salt == math.ceil(up / (1000 / 10))

    def test_rejects_unsupported_dtype(self, spark, tmp_path):
        from sleeper_spark import Field, Schema, SleeperTable
        schema = Schema(row_key_fields=(Field("k", T.LongType()),),
                        value_fields=(Field("d", T.DoubleType(),
                                            nullable=True),))
        t = SleeperTable.create(spark, str(tmp_path / "t3"), schema)
        with pytest.raises(ValueError):
            t.hot_keys("d")
