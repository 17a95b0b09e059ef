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
