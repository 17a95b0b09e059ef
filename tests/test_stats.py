"""Exact order statistics (functions/stats.py): distributed cumulative
histogram, exact quantiles, winsorization — checked against independent
driver-side computations on real testdata."""
import math

import pytest
from pyspark.sql import functions as F

from sleeper_spark.functions import stats

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet") \
        .select("event_id", "value")


def _py_quantile(vals, q):
    """Independent model: smallest value whose rank reaches ceil(q*n)."""
    s = sorted(vals)
    return s[max(1, math.ceil(q * len(s))) - 1]


class TestExactQuantiles:
    def test_matches_pure_python_order_statistics(self, spark, events):
        vals = [r.value for r in events.collect() if r.value is not None]
        qs = [0.0, 0.01, 0.25, 0.5, 0.75, 0.99, 1.0]
        got = stats.exact_quantiles(events, "value", qs)
        want = [_py_quantile(vals, q) for q in qs]
        assert got == want

    def test_cumulative_histogram_is_partition_invariant(self, spark,
                                                         events):
        """cum must be a pure function of the data: identical whether
        the prefix sum runs over 2 or 11 range partitions."""
        a = {(r.value, r.cnt, r.cum) for r in
             stats.cumulative_histogram(events, "value", 2).collect()}
        b = {(r.value, r.cnt, r.cum) for r in
             stats.cumulative_histogram(events, "value", 11).collect()}
        assert a == b
        n = events.where(F.col("value").isNotNull()).count()
        assert max(c for _, _, c in a) == n
        # cum is strictly increasing in value order, by cnt each step
        rows = sorted(a)
        acc = 0
        for v, cnt, cum in rows:
            acc += cnt
            assert cum == acc

    def test_invalid_q_and_empty_input(self, spark, events):
        with pytest.raises(ValueError, match="outside"):
            stats.exact_quantiles(events, "value", [1.5])
        empty = events.where("value IS NULL AND value IS NOT NULL")
        assert stats.exact_quantiles(empty, "value", [0.5]) == [None]


class TestEquidepthBuckets:
    def test_balanced_counts_and_model_agreement(self, spark, events):
        ev = events.where(F.col("value").isNotNull())
        vals = [r.value for r in ev.collect()]
        fences = [_py_quantile(vals, i / 4) for i in range(1, 4)]
        got = {r.event_id: r.bucket for r in
               stats.equidepth_buckets(ev, "value", 4).collect()}
        want = {}
        by_val = {r.event_id: r.value for r in ev.collect()}
        for i, v in by_val.items():
            want[i] = sum(1 for f in fences if v >= f)
        assert got == want
        from collections import Counter
        counts = Counter(got.values())
        n = len(vals)
        # equi-depth: each quartile within ~2% of n/4 on near-unique data
        assert set(counts) == {0, 1, 2, 3}
        assert all(abs(c - n / 4) <= max(2, 0.02 * n)
                   for c in counts.values())

    def test_nulls_and_guards(self, spark):
        df = spark.createDataFrame([(1, 1.0), (2, None), (3, 9.0)],
                                   "id long, x double")
        out = {r.id: r.bucket for r in
               stats.equidepth_buckets(df, "x", 2).collect()}
        assert out[2] is None
        with pytest.raises(ValueError, match="n_buckets"):
            stats.equidepth_buckets(df, "x", 1)


class TestGroupedQuantiles:
    def test_matches_per_group_python_model(self, spark):
        ev = spark.read.parquet(f"{SF}/events.parquet") \
            .select("event_type", "value")
        rows = [(r.event_type, r.value) for r in ev.collect()
                if r.value is not None]
        groups = {}
        for t, v in rows:
            groups.setdefault(t, []).append(v)
        got = {r.event_type: (r.p50, r.p95, r.n) for r in
               stats.grouped_quantiles(
                   ev, ["event_type"], "value",
                   {"p50": 0.5, "p95": 0.95}).collect()}
        want = {t: (_py_quantile(vs, 0.5), _py_quantile(vs, 0.95),
                    len(vs)) for t, vs in groups.items()}
        assert got == want

    def test_invalid_q(self, spark):
        ev = spark.read.parquet(f"{SF}/events.parquet")
        with pytest.raises(ValueError, match="outside"):
            stats.grouped_quantiles(ev, ["event_type"], "value",
                                    {"bad": 2.0})

    def test_reserved_name_collisions_refused(self, spark):
        ev = spark.read.parquet(f"{SF}/events.parquet")
        with pytest.raises(ValueError, match="collides"):
            stats.grouped_quantiles(ev, ["event_type"], "value",
                                    {"n": 0.5})
        with pytest.raises(ValueError, match="collides"):
            stats.exact_quantiles(
                ev.select(F.col("value").alias("cnt")), "cnt", [0.5])


class TestGroupedWinsorize:
    def test_per_group_fences_differ_from_global(self, spark):
        """Two groups with disjoint scales: each clips at ITS OWN
        fences — the long-form group's tail must not clip the short
        group (which a global winsorize would get wrong)."""
        rows = [("a", float(v)) for v in range(1, 21)] + \
               [("b", float(v * 1000)) for v in range(1, 21)]
        df = spark.createDataFrame(
            [(i, g, v) for i, (g, v) in enumerate(rows)],
            "id long, g string, x double")
        out = stats.grouped_winsorize(df, ["g"], "x", 0.1, 0.9,
                                      out_col="w")
        got = {(r.g, r.x): r.w for r in out.collect()}
        # group a: fences at p10=2, p90=18; group b: 2000 / 18000
        assert got[("a", 1.0)] == 2.0 and got[("a", 20.0)] == 18.0
        assert got[("b", 1000.0)] == 2000.0
        assert got[("b", 20000.0)] == 18000.0
        assert got[("a", 10.0)] == 10.0  # mid-range untouched

    def test_null_value_and_all_null_group_pass_through(self, spark):
        df = spark.createDataFrame(
            [(1, "a", 5.0), (2, "a", None), (3, "a", 500.0),
             (4, "a", 6.0), (5, "z", None)],
            "id long, g string, x double")
        out = {r.id: r.w for r in stats.grouped_winsorize(
            df, ["g"], "x", 0.0, 0.5, out_col="w").collect()}
        assert out[2] is None and out[5] is None
        assert out[3] == 6.0  # clipped to group-a p50

    def test_high_cardinality_groups_no_forced_broadcast(self, spark):
        """A per-user/per-document fence table can hold 1e9 rows — the
        default threshold join must NOT carry a compile-time broadcast
        hint (AQE picks the strategy from the ACTUAL built-side size at
        runtime; a forced broadcast of a high-cardinality group table
        OOMs the driver). Run at 1e6 distinct groups to prove the
        shuffle-join path really executes, and pin the absence of the
        hint in the optimized plan."""
        df = spark.range(1_000_000).select(
            F.col("id").alias("g"),
            (F.col("id") % 97).cast("double").alias("x"))
        out = stats.grouped_winsorize(df, ["g"], "x", 0.0, 1.0,
                                      out_col="w")
        logical = out._jdf.queryExecution().optimizedPlan().toString()
        assert "broadcast" not in logical.lower()  # no forced hint
        pinned = stats.grouped_winsorize(df, ["g"], "x", 0.0, 1.0,
                                         out_col="w",
                                         pin_broadcast=True)
        assert "broadcast" in pinned._jdf.queryExecution() \
            .optimizedPlan().toString().lower()
        # single-value groups: clip is the identity; the count proves
        # the 1e6-group shuffle join actually ran
        assert out.where("w = x").count() == 1_000_000

    def test_adaptive_and_pinned_paths_agree(self, spark):
        rows = [(i, "ab"[i % 2], float(i)) for i in range(40)]
        df = spark.createDataFrame(rows, "id long, g string, x double")
        a = {r.id: r.w for r in stats.grouped_winsorize(
            df, ["g"], "x", 0.1, 0.9, out_col="w").collect()}
        b = {r.id: r.w for r in stats.grouped_winsorize(
            df, ["g"], "x", 0.1, 0.9, out_col="w",
            pin_broadcast=True).collect()}
        assert a == b
        ao = {r.id: r.is_outlier for r in stats.grouped_mad_outliers(
            df, ["g"], "x").collect()}
        bo = {r.id: r.is_outlier for r in stats.grouped_mad_outliers(
            df, ["g"], "x", pin_broadcast=True).collect()}
        assert ao == bo


class TestGroupedEquidepth:
    def test_per_group_fences_and_nulls(self, spark):
        """Each group buckets at ITS OWN quartiles: two groups with
        disjoint scales both spread across all 4 buckets (a global cut
        would put all of group b in bucket 3). NULL values and all-NULL
        groups bucket NULL."""
        rows = [(i, "a", float(i % 20 + 1)) for i in range(40)] + \
               [(100 + i, "b", float((i % 20 + 1) * 1000))
                for i in range(40)] + \
               [(900, "a", None), (901, "z", None)]
        df = spark.createDataFrame(rows, "id long, g string, x double")
        out = stats.grouped_equidepth_buckets(df, ["g"], "x", 4)
        got = {r.id: r.bucket for r in out.collect()}
        assert got[900] is None and got[901] is None
        for g, base in (("a", 0), ("b", 100)):
            buckets = [got[base + i] for i in range(40)]
            assert set(buckets) == {0, 1, 2, 3}, g
        # independent model for group a: fences = smallest value with
        # cum >= ceil(q*40) over values 1..20 each twice -> 5, 10, 15
        vals = sorted([r[2] for r in rows if r[1] == "a"
                       and r[2] is not None])
        fences = [vals[max(1, math.ceil(q * len(vals))) - 1]
                  for q in (0.25, 0.5, 0.75)]
        for i in range(40):
            x = float(i % 20 + 1)
            want = sum(1 for f in fences if x >= f)
            assert got[i] == want, (i, x, fences)

    def test_rejects_tiny_bucket_count(self, spark):
        df = spark.createDataFrame([(1.0,)], "x double")
        with pytest.raises(ValueError, match="n_buckets"):
            stats.grouped_equidepth_buckets(df, [], "x", 1)


class TestSketchQuantiles:
    def test_rank_budget_holds_on_near_unique_doubles(self, spark):
        """The tier exists exactly for columns where the exact
        histogram would blow up: ~50k near-unique doubles. Every
        estimate's TRUE rank must sit within the documented budget of
        ceil(q*n), and n must be exact."""
        import numpy as np
        rng = np.random.RandomState(11)
        data = (rng.lognormal(3.0, 1.5, 50_000)).tolist()
        df = spark.createDataFrame([(v,) for v in data], "x double")
        qs = [0.01, 0.25, 0.5, 0.9, 0.99]
        vals, n = stats.sketch_quantiles(df, "x", qs, k=512,
                                         merge_groups=8)
        assert n == len(data)
        budget = stats.sketch_rank_budget(n, k=512, merge_groups=8)
        s = sorted(data)
        for q, v in zip(qs, vals):
            target = max(1, math.ceil(q * n))
            lt = sum(1 for x in s if x < v)
            le = sum(1 for x in s if x <= v)
            assert le >= target - budget and lt < target + budget, \
                (q, v, lt, le, target, budget)
            assert v in data  # always an actual data value

    def test_flat_merge_and_small_inputs(self, spark):
        df = spark.createDataFrame([(float(v),) for v in range(1, 101)],
                                   "x double")
        vals, n = stats.sketch_quantiles(df, "x", [0.0, 0.5, 1.0],
                                         merge_groups=None)
        assert n == 100
        assert vals[0] == 1.0 and vals[2] == 100.0
        assert abs(vals[1] - 50.0) <= 2.0  # tiny n: near-exact
        empty = df.where("x IS NULL")
        assert stats.sketch_quantiles(empty, "x", [0.5]) == ([None], 0)

    def test_nan_refused_and_bad_q(self, spark):
        df = spark.createDataFrame([(1.0,), (float("nan"),)], "x double")
        with pytest.raises(Exception, match="NaN"):
            stats.sketch_quantiles(df, "x", [0.5])
        with pytest.raises(ValueError, match="outside"):
            stats.sketch_quantiles(df, "x", [1.5])


class TestGroupedSketchQuantiles:
    def test_rank_budget_holds_per_group(self, spark):
        """The grouped twin: ~20k near-unique doubles per group across
        3 skewed groups. Every group's estimates must sit within THAT
        group's budget of ceil(q*n_g), n_g exact per group."""
        import numpy as np
        rng = np.random.RandomState(17)
        rows, model = [], {}
        for g, size in (("a", 30_000), ("b", 12_000), ("c", 500)):
            data = (rng.lognormal(2.0 + len(g), 1.2, size)).tolist()
            model[g] = sorted(data)
            rows += [(g, v) for v in data]
        df = spark.createDataFrame(rows, "g string, x double")
        qs = {"p10": 0.10, "p50": 0.5, "p99": 0.99}
        out = {r.g: r for r in stats.grouped_sketch_quantiles(
            df, ["g"], "x", qs, k=512, merge_groups=8).collect()}
        assert set(out) == set(model)
        for g, s in model.items():
            r = out[g]
            n = r.n
            assert n == len(s)
            budget = stats.sketch_rank_budget(n, k=512, merge_groups=8)
            for qname, q in qs.items():
                v = r[qname]
                target = max(1, math.ceil(q * n))
                lt = sum(1 for x in s if x < v)
                le = sum(1 for x in s if x <= v)
                assert le >= target - budget and lt < target + budget, \
                    (g, qname, v, lt, le, target, budget)
                assert v in s  # an actual data value of ITS group

    def test_null_group_and_flat_merge(self, spark):
        df = spark.createDataFrame(
            [(None, float(v)) for v in range(1, 101)]
            + [("g", float(v)) for v in range(1, 11)],
            "g string, x double")
        out = {r.g: r for r in stats.grouped_sketch_quantiles(
            df, ["g"], "x", {"p50": 0.5}, merge_groups=None).collect()}
        assert set(out) == {None, "g"}
        assert out[None].n == 100 and abs(out[None].p50 - 50.0) <= 2.0
        assert out["g"].n == 10 and abs(out["g"].p50 - 5.0) <= 2.0

    def test_guards(self, spark):
        df = spark.createDataFrame([("a", 1.0)], "g string, x double")
        with pytest.raises(ValueError, match="outside"):
            stats.grouped_sketch_quantiles(df, ["g"], "x", {"p": 1.5})
        with pytest.raises(ValueError, match="collides"):
            stats.grouped_sketch_quantiles(df, ["g"], "x", {"rank": 0.5})
        nan = spark.createDataFrame([("a", float("nan"))],
                                    "g string, x double")
        with pytest.raises(Exception, match="NaN"):
            stats.grouped_sketch_quantiles(
                nan, ["g"], "x", {"p50": 0.5}).collect()


class TestMadOutliers:
    def test_matches_pure_python_model(self, spark, events):
        vals = [r.value for r in events.collect() if r.value is not None]
        med = _py_quantile(vals, 0.5)
        mad = _py_quantile([abs(v - med) for v in vals], 0.5)
        want = sum(1 for v in vals if abs(v - med) > 3.0 * mad)
        got = stats.mad_outliers(
            events.where(F.col("value").isNotNull()), "value", k=3.0)
        assert got.where("is_outlier").count() == want

    def test_robust_to_one_corrupt_row(self, spark):
        """The whole point vs stddev fences: one 1e12 row must be THE
        outlier, not widen the fence until nothing is."""
        df = spark.createDataFrame(
            [(i, float(i % 7)) for i in range(100)] + [(100, 1e12)],
            "id long, x double")
        out = {r.id for r in
               stats.mad_outliers(df, "x").where("is_outlier").collect()}
        assert out == {100}


class TestWinsorize:
    def test_equals_driver_side_clip(self, spark, events):
        vals = [r.value for r in events.collect() if r.value is not None]
        lo, hi = _py_quantile(vals, 0.05), _py_quantile(vals, 0.95)
        got = sorted(
            r.w for r in stats.winsorize(
                events.where(F.col("value").isNotNull()),
                "value", 0.05, 0.95, out_col="w").collect())
        want = sorted(min(max(v, lo), hi) for v in vals)
        assert got == want
        assert got[0] == lo and got[-1] == hi

    def test_nulls_pass_through(self, spark):
        df = spark.createDataFrame(
            [(1, 10.0), (2, None), (3, 1000.0), (4, 20.0), (5, 30.0)],
            "id long, x double")
        out = {r.id: r.x for r in
               stats.winsorize(df, "x", 0.0, 0.5).collect()}
        assert out[2] is None  # NULL carries no magnitude to clip
        assert out[3] == 20.0  # p50 of (10,20,30,1000) clips the tail

    def test_plan_has_no_python_and_clip_is_scan_side(self, spark,
                                                      events):
        """The clip itself must be a codegen'd projection — no UDF, no
        extra shuffle beyond the (already-run) threshold jobs."""
        df = stats.winsorize(events, "value", 0.05, 0.95, out_col="w")
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "Exchange" not in plan  # thresholds are literals


class TestGroupedMadOutliers:
    def test_per_group_fences_catch_segment_outliers(self, spark):
        """Group b's scale is 1000x group a's: a global fence would
        never flag a's corrupt row; per-group fences flag exactly one
        row in each group."""
        rows = [("a", float(i % 7)) for i in range(50)] + \
               [("a", 1e6)] + \
               [("b", float((i % 7) * 1000)) for i in range(50)] + \
               [("b", 1e12)]
        df = spark.createDataFrame(
            [(i, g, v) for i, (g, v) in enumerate(rows)],
            "id long, g string, x double")
        out = stats.grouped_mad_outliers(df, ["g"], "x")
        flagged = {(r.g, r.x) for r in out.where("is_outlier").collect()}
        assert flagged == {("a", 1e6), ("b", 1e12)}

    def test_matches_per_group_python_model(self, spark, events):
        ev = spark.read.parquet(f"{SF}/events.parquet") \
            .select("event_type", "value") \
            .where(F.col("value").isNotNull())
        per = {}
        for r in ev.collect():
            per.setdefault(r.event_type, []).append(r.value)
        want = {}
        for g, vs in per.items():
            m = _py_quantile(vs, 0.5)
            mad = _py_quantile([abs(v - m) for v in vs], 0.5)
            want[g] = sum(1 for v in vs if abs(v - m) > 3.0 * mad)
        got = {r.event_type: r.n for r in
               stats.grouped_mad_outliers(ev, ["event_type"], "value")
               .where("is_outlier")
               .groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
               .collect()}
        for g, n in want.items():
            assert got.get(g, 0) == n


class TestHeavyHitters:
    def test_exact_threshold_set_vs_brute_force(self, spark):
        """Output must be EXACTLY {v: freq > n/k} with exact counts —
        superset from Misra-Gries candidates, trimmed by the recount —
        on skewed data spread over many partitions."""
        rows = (["hot"] * 400 + ["warm"] * 120
                + [f"cold{i}" for i in range(480)])
        df = spark.createDataFrame([(v,) for v in rows], ["v"]) \
            .repartition(16)
        n = len(rows)
        for k in (3, 8, 100):
            want = {}
            for v in rows:
                want[v] = want.get(v, 0) + 1
            want = {v: c for v, c in want.items() if c * k > n}
            got = {r.v: r.n_rows for r in
                   stats.heavy_hitters(df, "v", k).collect()}
            assert got == want, k

    def test_nulls_excluded_and_share(self, spark):
        df = spark.createDataFrame(
            [("a",)] * 6 + [(None,)] * 10 + [("b",)] * 2, ["v"])
        out = stats.heavy_hitters(df, "v", 2, with_share=True).collect()
        # n = 8 non-null; only 'a' (6) exceeds 8/2
        assert [(r.v, r.n_rows, r.share) for r in out] == [("a", 6, 0.75)]

    def test_k_validation(self, spark):
        df = spark.createDataFrame([("a",)], ["v"])
        with pytest.raises(ValueError, match="k must be"):
            stats.heavy_hitters(df, "v", 1)

    def test_numeric_column_counts_textually(self, spark):
        df = spark.createDataFrame([(7,)] * 5 + [(8,)], ["v"])
        got = {r.v: r.n_rows
               for r in stats.heavy_hitters(df, "v", 2).collect()}
        assert got == {"7": 5}


class TestGroupedRobustScale:
    def test_matches_pure_python_model(self, spark):
        ev = spark.read.parquet(f"{SF}/events.parquet") \
            .select("event_type", "value")
        per = {}
        for r in ev.collect():
            if r.value is not None:
                per.setdefault(r.event_type, []).append(r.value)
        out = stats.grouped_robust_scale(
            ev, ["event_type"], "value", out_col="sc")
        agg = {r.event_type: (r.n, r.s) for r in out.groupBy("event_type")
               .agg(F.count(F.lit(1)).alias("n"),
                    F.sum(F.floor(F.col("sc") * 1e6).cast("long"))
                    .alias("s")).collect()}
        for g, vs in per.items():
            m = _py_quantile(vs, 0.5)
            mad = _py_quantile([abs(v - m) for v in vs], 0.5)
            if mad == 0.0:
                want_s = None
            else:
                want_s = sum(
                    math.floor((v - m) / mad * 1e6) for v in vs)
            assert agg[g][1] == want_s, g

    def test_zero_mad_and_null_scale_null(self, spark):
        df = spark.createDataFrame(
            [("a", 1.0), ("a", 1.0), ("a", 1.0), ("a", 9.0),
             ("b", 1.0), ("b", 3.0), ("b", None)],
            "g string, x double")
        got = {(r.g, r.x): r.sc for r in stats.grouped_robust_scale(
            df, ["g"], "x", out_col="sc").collect()}
        # group a: median 1, MAD 0 -> all NULL
        assert got[("a", 1.0)] is None and got[("a", 9.0)] is None
        # group b: median 1 (rank ceil(.5*2)=1), MAD = median(|x-1|) of
        # {0, 2} = 0 -> NULL too; swap to a 3-value group for a real one
        df2 = spark.createDataFrame(
            [("c", 1.0), ("c", 2.0), ("c", 5.0)], "g string, x double")
        got2 = {r.x: r.sc for r in stats.grouped_robust_scale(
            df2, ["g"], "x", out_col="sc").collect()}
        # median 2, deviations {1, 0, 3} -> MAD 1
        assert got2 == {1.0: -1.0, 2.0: 0.0, 5.0: 3.0}
        assert got[("b", None)] is None


class TestGroupedCdf:
    def test_matches_model_with_ties_and_nulls(self, spark):
        df = spark.createDataFrame(
            [("a", 1.0), ("a", 2.0), ("a", 2.0), ("a", 5.0),
             ("a", None), ("b", 7.0)], "g string, x double")
        got = {(r.g, r.x): r.cdf for r in
               stats.grouped_cdf(df, ["g"], "x").collect()}
        # group a: n=4; P(X<=1)=0.25, P(X<=2)=0.75 (ties share the
        # max rank), P(X<=5)=1.0; NULL -> NULL; singleton group -> 1.0
        assert got[("a", 1.0)] == 0.25
        assert got[("a", 2.0)] == 0.75
        assert got[("a", 5.0)] == 1.0
        assert got[("a", None)] is None
        assert got[("b", 7.0)] == 1.0

    def test_raw_rows_never_enter_a_window(self, spark):
        """The window runs over the HISTOGRAM (one row per distinct
        value), then joins back — visible as the join in the plan."""
        df = spark.createDataFrame(
            [("a", float(i % 5)) for i in range(100)],
            "g string, x double")
        out = stats.grouped_cdf(df, ["g"], "x")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Join" in plan and "Window" in plan


class TestProfileColumns:
    def test_counts_exact(self, spark):
        from sleeper_spark.functions import profile
        df = spark.createDataFrame(
            [(1, "a", None), (2, "a", 1.5), (3, None, 1.5),
             (3, "b", None)], "id long, s string, v double")
        got = {r.column: (r.n, r.n_null, r.n_distinct) for r in
               profile.profile_columns(df).collect()}
        assert got == {"id": (4, 0, 3), "s": (4, 1, 2),
                       "v": (4, 2, 1)}

    def test_subset_and_validation(self, spark):
        from sleeper_spark.functions import profile
        df = spark.createDataFrame([(1, "a")], "id long, s string")
        assert profile.profile_columns(df, ["s"]).count() == 1
        with pytest.raises(ValueError, match="unknown"):
            profile.profile_columns(df, ["nope"])
        with pytest.raises(ValueError, match="no columns"):
            profile.profile_columns(df, [])
