"""asof_join semantics (functions/timeseries.py): backward pick,
exact-match toggle, missing-key nulls, multi-column payloads — vs
hand-computed expectations and DuckDB's native ASOF JOIN."""

import duckdb
import pytest

from sleeper_spark.functions.timeseries import asof_join


@pytest.fixture()
def frames(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 5, "c"), (2, 15, "d"), (3, 8, "e")],
        "k long, t long, tag string")
    right = spark.createDataFrame(
        [(1, 10, 100.0, "x"), (1, 18, 200.0, "y"), (2, 1, 50.0, "z")],
        "k long, t long, v double, s string")
    return left, right


def test_backward_exact(spark, frames):
    left, right = frames
    out = {(r.k, r.t): (r.v, r.s)
           for r in asof_join(left, right, ["k"], "t", "t").collect()}
    assert out == {
        (1, 10): (100.0, "x"),   # exact ts match allowed
        (1, 20): (200.0, "y"),
        (1, 5): (None, None),    # nothing at-or-before
        (2, 15): (50.0, "z"),
        (3, 8): (None, None),    # key absent from right
    }


def test_backward_strict(spark, frames):
    left, right = frames
    out = {(r.k, r.t): r.v
           for r in asof_join(left, right, ["k"], "t", "t",
                              allow_exact=False).collect()}
    assert out[(1, 10)] is None  # exact match excluded
    assert out[(1, 20)] == 200.0


def test_matches_duckdb_asof(spark, frames):
    left, right = frames
    got = sorted((r.k, r.t, r.v)
                 for r in asof_join(left, right, ["k"], "t", "t").collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE l(k BIGINT, t BIGINT, tag VARCHAR)")
    con.execute("CREATE TABLE r(k BIGINT, t BIGINT, v DOUBLE, s VARCHAR)")
    con.executemany("INSERT INTO l VALUES (?,?,?)",
                    [tuple(r) for r in left.collect()])
    con.executemany("INSERT INTO r VALUES (?,?,?,?)",
                    [tuple(r) for r in right.collect()])
    want = sorted(con.execute(
        "SELECT l.k, l.t, r.v FROM l ASOF LEFT JOIN r "
        "ON l.k = r.k AND r.t <= l.t").fetchall())
    assert got == want


def test_plan_is_window_not_nested_loop(spark, frames):
    left, right = frames
    df = asof_join(left, right, ["k"], "t", "t")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple")
    assert "Window" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_sessionize_semantics(spark):
    from sleeper_spark.functions.timeseries import sessionize
    df = spark.createDataFrame(
        [(1, 0), (1, 100), (1, 500), (1, 550), (2, 10)],
        "k long, t long")
    out = {(r.k, r.t): r.session_id
           for r in sessionize(df, ["k"], "t", 200).collect()}
    assert out == {(1, 0): 0, (1, 100): 0,   # gap 100 <= 200
                   (1, 500): 1, (1, 550): 1,  # gap 400 > 200 -> new
                   (2, 10): 0}


def test_range_join_semantics_and_plan(spark):
    from sleeper_spark.functions.timeseries import range_join
    left = spark.createDataFrame(
        [(1, 5), (1, 15), (1, 25), (2, 5)], "k long, t long")
    right = spark.createDataFrame(
        [(1, 0, 10, "a"), (1, 10, 20, "b"), (1, 14, 30, "c")],
        "k long, lo long, hi long, tag string")
    out = range_join(left, right, ["k"], "t", "lo", "hi", 10)
    got = sorted((r.k, r.t, r.tag) for r in out.collect())
    # t=15 falls in BOTH [10,20) and [14,30); t=25 only [14,30);
    # hi is exclusive; k=2 has no intervals
    assert got == [(1, 5, "a"), (1, 15, "b"), (1, 15, "c"), (1, 25, "c")]
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "simple")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan)


def test_asof_property_vs_duckdb(spark):
    """Randomized frames vs DuckDB's native ASOF LEFT JOIN (rights
    unique per (k, t), as the operator contract requires). One Spark
    round-trip over many generated cases — hypothesis's per-example
    model is too slow with a live SparkSession."""
    import random

    rng = random.Random(20260814)
    for case in range(8):
        nk = rng.randint(1, 4)
        left = [(rng.randint(0, nk), rng.randint(0, 30), i)
                for i in range(rng.randint(1, 25))]
        seen = set()
        right = []
        for _ in range(rng.randint(0, 20)):
            k, t = rng.randint(0, nk), rng.randint(0, 30)
            if (k, t) not in seen:
                seen.add((k, t))
                right.append((k, t, float(rng.randint(0, 99))))
        ldf = spark.createDataFrame(left, "k long, t long, lid long")
        if not right:
            right = [(999, 0, 0.0)]  # disjoint key; DuckDB needs rows
        rdf = spark.createDataFrame(right, "k long, t long, v double")
        got = sorted((r.k, r.t, r.lid, r.v)
                     for r in asof_join(ldf, rdf, ["k"], "t", "t").collect())
        con = duckdb.connect()
        con.execute("CREATE TABLE l(k BIGINT, t BIGINT, lid BIGINT)")
        con.execute("CREATE TABLE r(k BIGINT, t BIGINT, v DOUBLE)")
        con.executemany("INSERT INTO l VALUES (?,?,?)", left)
        con.executemany("INSERT INTO r VALUES (?,?,?)", right)
        want = sorted(con.execute(
            "SELECT l.k, l.t, l.lid, r.v FROM l ASOF LEFT JOIN r "
            "ON l.k = r.k AND r.t <= l.t").fetchall())
        assert got == want, f"case {case}"


class TestFunnel:
    def test_ordering_matters(self, spark):
        """A user who clicks BEFORE their first view must not convert
        past the view stage; counts never increase stage over stage."""
        from sleeper_spark.functions.timeseries import funnel_counts
        rows = [
            # u1: full ordered funnel
            (1, "view", 10), (1, "click", 20), (1, "purchase", 30),
            # u2: clicked before viewing -> stops at view
            (2, "click", 5), (2, "view", 10),
            # u3: view+click ordered, purchase BEFORE click -> 2 stages
            (3, "view", 1), (3, "purchase", 2), (3, "click", 3),
            # u4: never viewed -> never enters
            (4, "click", 1), (4, "purchase", 2),
            # u5: view then a SECOND view then click (min view counts)
            (5, "view", 50), (5, "view", 60), (5, "click", 55),
        ]
        df = spark.createDataFrame(
            rows, "user_id long, event_type string, ts long")
        out = {r.step: (r.step_index, r.n_users) for r in
               funnel_counts(df, ["view", "click", "purchase"],
                             ts_col="ts").collect()}
        assert out == {"view": (0, 4),       # u1 u2 u3 u5
                       "click": (1, 3),      # u1 u3 u5 (after first view)
                       "purchase": (2, 1)}   # u1 only

    def test_max_gap_bounds_each_hop(self, spark):
        """Conversion-window semantics: stage i must land within
        max_gap of the stage-(i-1) reach. A user whose click comes too
        late converts at view only — and the clock restarts at EACH
        reach (u3 purchases within gap of its click even though far
        from its view)."""
        from sleeper_spark.functions.timeseries import funnel_counts
        rows = [
            (1, "view", 0), (1, "click", 5), (1, "purchase", 9),
            (2, "view", 0), (2, "click", 50),       # click too late
            (3, "view", 0), (3, "click", 10), (3, "purchase", 19),
        ]
        df = spark.createDataFrame(
            rows, "user_id long, event_type string, ts long")
        out = {r.step: r.n_users for r in funnel_counts(
            df, ["view", "click", "purchase"], ts_col="ts",
            max_gap=10).collect()}
        assert out == {"view": 3, "click": 2, "purchase": 2}
        # unbounded: everyone converts fully
        out2 = {r.step: r.n_users for r in funnel_counts(
            df, ["view", "click", "purchase"], ts_col="ts").collect()}
        assert out2 == {"view": 3, "click": 3, "purchase": 2}

    def test_strictly_after_excludes_ties(self, spark):
        from sleeper_spark.functions.timeseries import funnel_counts
        df = spark.createDataFrame(
            [(1, "view", 10), (1, "click", 10)],
            "user_id long, event_type string, ts long")
        out = {r.step: r.n_users for r in
               funnel_counts(df, ["view", "click"], ts_col="ts").collect()}
        assert out == {"view": 1, "click": 0}  # tie is not 'after'


class TestRetentionCohorts:
    def test_known_cohorts_with_gap_return(self, spark):
        """u1 starts day 0 and acts on days 0,1,3 (skips 2 - activity,
        not survival); u2 starts day 1; u3 acts twice in one day (the
        distinct collapses it)."""
        from sleeper_spark.functions.timeseries import retention_cohorts
        D = 10  # period
        rows = [
            (1, 0), (1, 12), (1, 35),          # days 0, 1, 3
            (2, 11), (2, 25),                  # days 1, 2
            (3, 5), (3, 7),                    # day 0 twice
        ]
        df = spark.createDataFrame(rows, "user_id long, ts long")
        got = {(r.cohort, r.period_offset): r.n_users for r in
               retention_cohorts(df, ts_col="ts", period=D).collect()}
        assert got == {(0, 0): 2,   # u1, u3
                       (0, 1): 1,   # u1 day 1
                       (0, 3): 1,   # u1 day 3 (day 2 skipped)
                       (1, 0): 1,   # u2
                       (1, 1): 1}   # u2 day 2

    def test_null_ts_excluded_and_guard(self, spark):
        import pytest as _pytest
        from sleeper_spark.functions.timeseries import retention_cohorts
        df = spark.createDataFrame([(1, None), (2, 5)],
                                   "user_id long, ts long")
        out = retention_cohorts(df, ts_col="ts", period=10).collect()
        assert len(out) == 1 and out[0].n_users == 1
        with _pytest.raises(ValueError, match="period"):
            retention_cohorts(df, ts_col="ts", period=0)


class TestRollingFeatures:
    def test_matches_pure_python_model(self, spark):
        """Trailing [t - span, t] counts and micro-sums per entity vs a
        brute-force model, ties-in-ts included as RANGE peers."""
        import math

        from sleeper_spark.functions.timeseries import rolling_features
        rows = [(1, 0, 1.5), (1, 50, 2.25), (1, 50, None), (1, 100, 4.0),
                (1, 161, 8.0), (2, 10, 1.0), (2, 200, 2.0)]
        df = spark.createDataFrame(rows, "u long, t long, v double")
        out = rolling_features(df, ["u"], "t", "v", {"w": 60})
        got = {(r.u, r.t, r.v): (r.n_w, r.sum_w_micros)
               for r in out.collect()}
        assert len(got) == len(rows)  # the None-v tie is a distinct key
        for u, t, v in rows:
            frame = [(uu, tt, vv) for uu, tt, vv in rows
                     if uu == u and t - 60 <= tt <= t]
            n = len(frame)
            micros = [math.floor(vv * 1e6) for _, _, vv in frame
                      if vv is not None]
            s = sum(micros) if micros else None
            assert got[(u, t, v)] == (n, s), (u, t)
        # ties at t=50 are peers: BOTH rows see both (RANGE semantics)
        assert got[(1, 50, 2.25)][0] == 3
        # t=161 excludes t=100? no: 161-60=101 > 100 -> only itself
        assert got[(1, 161, 8.0)] == (1, 8_000_000)

    def test_multiple_spans_share_one_exchange(self, spark):
        from sleeper_spark.functions.timeseries import rolling_features
        df = spark.createDataFrame(
            [(1, 0, 1.0), (1, 5, 2.0)], "u long, t long, v double")
        out = rolling_features(df, ["u"], "t", "v",
                               {"a": 10, "b": 100})
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1, plan


class TestGapFill:
    """timeseries.gap_fill: dense per-entity bucket spine + LOCF /
    zero / none fills; n_rows=0 marks generated gap buckets."""

    def _df(self, spark):
        # user 1: buckets 0, 30 present (10,20 are gaps); user 2: one
        # bucket with a NULL value and a later real value
        return spark.createDataFrame(
            [(1, 2, 5.0), (1, 8, 7.0),       # bucket 0 (max -> 7.0)
             (1, 31, 9.0),                   # bucket 30
             (2, 100, None), (2, 125, 3.0)],  # buckets 100, 120
            "u long, t long, v double")

    def test_locf_spine_and_gap_marking(self, spark):
        from sleeper_spark.functions.timeseries import gap_fill
        out = sorted(tuple(r) for r in gap_fill(
            self._df(spark), ["u"], "t", 10, "v").collect())
        assert out == [
            (1, 0, 7.0, 2), (1, 10, 7.0, 0), (1, 20, 7.0, 0),
            (1, 30, 9.0, 1),
            (2, 100, None, 1), (2, 110, None, 0), (2, 120, 3.0, 1)]

    def test_zero_and_none_fills(self, spark):
        from sleeper_spark.functions.timeseries import gap_fill
        z = {(r.u, r.bucket_ts): r.v for r in gap_fill(
            self._df(spark), ["u"], "t", 10, "v",
            fill="zero").collect()}
        assert z[(1, 10)] == 0.0 and z[(1, 20)] == 0.0
        assert z[(2, 100)] == 0.0  # NULL value also zero-filled
        n = {(r.u, r.bucket_ts): r.v for r in gap_fill(
            self._df(spark), ["u"], "t", 10, "v",
            fill="none").collect()}
        assert n[(1, 10)] is None and n[(1, 30)] == 9.0

    def test_guards(self, spark):
        from sleeper_spark.functions.timeseries import gap_fill
        with pytest.raises(ValueError, match="fill"):
            gap_fill(self._df(spark), ["u"], "t", 10, "v",
                     fill="interp")
        with pytest.raises(ValueError, match="step"):
            gap_fill(self._df(spark), ["u"], "t", 0, "v")

    def test_empty_frame_yields_empty_spine(self, spark):
        from sleeper_spark.functions.timeseries import gap_fill
        out = gap_fill(self._df(spark).limit(0), ["u"], "t", 10, "v")
        assert out.count() == 0
        assert out.columns == ["u", "bucket_ts", "v", "n_rows"]

    def test_matches_duckdb(self, spark):
        from sleeper_spark.functions.timeseries import gap_fill
        import random
        rng = random.Random(7)
        rows = [(u, rng.randrange(0, 500),
                 None if rng.random() < 0.2 else
                 round(rng.uniform(0, 9), 3))
                for u in range(1, 6) for _ in range(12)]
        df = spark.createDataFrame(rows, "u long, t long, v double")
        got = sorted(tuple(r) for r in gap_fill(
            df, ["u"], "t", 50, "v").collect())
        con = duckdb.connect()
        con.execute("CREATE TABLE e(u BIGINT, t BIGINT, v DOUBLE)")
        con.executemany("INSERT INTO e VALUES (?, ?, ?)", rows)
        want = sorted(tuple(r) for r in con.execute("""
            WITH b AS (SELECT u, (t // 50) * 50 AS bt, max(v) AS v,
                       count(*) AS n FROM e GROUP BY 1, 2),
            span AS (SELECT u, min(bt) mn, max(bt) mx FROM b GROUP BY 1),
            spine AS (SELECT u, unnest(generate_series(mn, mx, 50)) bt
                      FROM span),
            j AS (SELECT s.u, s.bt, b.v, b.n FROM spine s
                  LEFT JOIN b USING (u, bt))
            SELECT u, bt, last_value(v IGNORE NULLS) OVER (
              PARTITION BY u ORDER BY bt
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
              CAST(coalesce(n, 0) AS BIGINT) FROM j
        """).fetchall())
        assert got == want and len(got) >= 5
