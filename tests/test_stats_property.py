"""Property tests: the exact order-statistics operators
(functions/stats.py) equal an independent pure-Python model on
hypothesis-generated data — duplicates, negatives, single values,
heavy ties, multiple groups. One Spark session, few examples, deadline
off (Spark jobs are not hypothesis-sized)."""
import math

from hypothesis import HealthCheck, given, settings, strategies as st

from sleeper_spark.functions import stats

# duplicates are the interesting regime for rank arithmetic: sample
# from a tiny integer set, floats derived from them exactly
values_strategy = st.lists(
    st.sampled_from([-3, -1, 0, 1, 2, 5, 7, 11]),
    min_size=1, max_size=40)

qs_strategy = st.lists(
    st.sampled_from([0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]),
    min_size=1, max_size=4, unique=True)


def _py_q(vals, q):
    s = sorted(vals)
    return s[max(1, math.ceil(q * len(s))) - 1]


@settings(max_examples=15, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(vals=values_strategy, qs=qs_strategy)
def test_exact_quantiles_match_model(spark, vals, qs):
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "id long, x double")
    got = stats.exact_quantiles(df, "x", qs)
    assert got == [float(_py_q(vals, q)) for q in qs]


@settings(max_examples=10, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(vals=values_strategy)
def test_winsorize_matches_model(spark, vals):
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "id long, x double")
    lo, hi = _py_q(vals, 0.1), _py_q(vals, 0.9)
    got = sorted(r.w for r in
                 stats.winsorize(df, "x", 0.1, 0.9, out_col="w").collect())
    assert got == sorted(float(min(max(v, lo), hi)) for v in vals)


@settings(max_examples=10, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(groups=st.lists(
    st.tuples(st.sampled_from(["a", "b", "c"]),
              st.sampled_from([-2, 0, 1, 3, 8])),
    min_size=1, max_size=40))
def test_grouped_quantiles_match_model(spark, groups):
    df = spark.createDataFrame(
        [(g, float(v)) for g, v in groups], "g string, x double")
    per = {}
    for g, v in groups:
        per.setdefault(g, []).append(v)
    got = {r.g: (r.p50, r.n) for r in
           stats.grouped_quantiles(df, ["g"], "x", {"p50": 0.5}).collect()}
    want = {g: (float(_py_q(vs, 0.5)), len(vs)) for g, vs in per.items()}
    assert got == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(vals=st.lists(st.sampled_from(list("abcdefgh")),
                     min_size=1, max_size=60),
       k=st.sampled_from([2, 3, 5, 8]),
       parts=st.sampled_from([1, 3, 7]))
def test_heavy_hitters_match_model(spark, vals, k, parts):
    """{v: freq > n/k} exactly, across partitionings (candidate
    survival varies with partitioning; the recount must not)."""
    df = spark.createDataFrame([(v,) for v in vals], ["v"]) \
        .repartition(parts)
    n = len(vals)
    want = {}
    for v in vals:
        want[v] = want.get(v, 0) + 1
    want = {v: c for v, c in want.items() if c * k > n}
    got = {r.v: r.n_rows for r in
           stats.heavy_hitters(df, "v", k).collect()}
    assert got == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(groups=st.lists(
    st.tuples(st.sampled_from(["a", "b"]),
              st.sampled_from([-2, 0, 1, 3, 8])),
    min_size=1, max_size=40))
def test_grouped_cdf_matches_model(spark, groups):
    df = spark.createDataFrame(
        [(g, float(v)) for g, v in groups], "g string, x double")
    per = {}
    for g, v in groups:
        per.setdefault(g, []).append(v)
    rows = stats.grouped_cdf(df, ["g"], "x").collect()
    assert len(rows) == len(groups)
    for r in rows:
        vs = per[r.g]
        assert r.cdf == sum(1 for v in vs if v <= r.x) / len(vs)


@settings(max_examples=10, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(groups=st.lists(
    st.tuples(st.sampled_from(["a", "b"]),
              st.sampled_from([-2, 0, 1, 3, 8, 13])),
    min_size=1, max_size=40))
def test_grouped_robust_scale_matches_model(spark, groups):
    df = spark.createDataFrame(
        [(g, float(v)) for g, v in groups], "g string, x double")
    per = {}
    for g, v in groups:
        per.setdefault(g, []).append(float(v))
    got = {}
    for r in stats.grouped_robust_scale(df, ["g"], "x",
                                        out_col="sc").collect():
        got.setdefault((r.g, r.x), []).append(r.sc)
    for g, vs in per.items():
        m = _py_q(vs, 0.5)
        mad = _py_q([abs(v - m) for v in vs], 0.5)
        for v in set(vs):
            want = None if mad == 0.0 else (v - m) / mad
            assert all(sc == want for sc in got[(g, v)]), (g, v)


@settings(max_examples=10, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(rows=st.lists(
    st.tuples(st.sampled_from([1, 2]),
              st.integers(min_value=0, max_value=50)),
    min_size=1, max_size=30),
    span=st.sampled_from([0, 5, 20]))
def test_rolling_features_match_model(spark, rows, span):
    from sleeper_spark.functions.timeseries import rolling_features
    import math as _math
    df = spark.createDataFrame(
        [(u, t, float(t) * 1.25) for u, t in rows],
        "u long, t long, v double")
    out = rolling_features(df, ["u"], "t", "v", {"w": span})
    got = sorted((r.u, r.t, r.n_w, r.sum_w_micros)
                 for r in out.collect())
    want = []
    for u, t in rows:
        frame = [tt for uu, tt in rows if uu == u and t - span <= tt <= t]
        s = sum(_math.floor(tt * 1.25 * 1e6) for tt in frame)
        want.append((u, t, len(frame), s))
    assert got == sorted(want)
