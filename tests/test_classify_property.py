"""Property tests: the DSIR weights and the Naive Bayes classifier are
EXACT against independent pure-Python reference models on randomized
word-soup corpora — same micro-unit integer arithmetic, recomputed from
scratch (math.log + round), so any drift in the Spark expressions'
smoothing, hashing, or summation fails loudly. Few examples, deadline
off (Spark jobs are not hypothesis-sized)."""

import hashlib
import math
import re

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from sleeper_spark.functions import classify, dsir
from sleeper_spark.functions.text import TOKEN_PATTERN

VOCAB = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
         "eta", "theta", "iota", "kappa"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=0, max_size=10)
    .map(" ".join),
    min_size=3, max_size=12)


def _toks(text):
    return re.findall(TOKEN_PATTERN, text.lower())


def _grams(text):
    t = _toks(text)
    return t + [f"{a} {b}" for a, b in zip(t, t[1:])]


def _bucket(g, b):
    hx = hashlib.md5(g.encode()).hexdigest()
    h = (int(hx[:8], 16) << 32) | int(hx[8:16], 16)
    if h >= 1 << 63:
        h -= 1 << 64
    return h % b  # python % is already non-negative for b > 0


def _brute_dsir(texts, targets, b, alpha):
    tc, rc = {}, {}
    for i, t in enumerate(texts):
        for g in _grams(t):
            k = _bucket(g, b)
            rc[k] = rc.get(k, 0) + 1
            if i in targets:
                tc[k] = tc.get(k, 0) + 1
    tt, rt = sum(tc.values()), sum(rc.values())
    lw = {k: round((math.log((tc.get(k, 0) + alpha) / (tt + alpha * b))
                    - math.log((rc[k] + alpha) / (rt + alpha * b)))
                   * 1e6)
          for k in rc}
    out = {}
    for i, t in enumerate(texts):
        gs = [_bucket(g, b) for g in _grams(t)]
        out[i] = (len(gs), sum(lw[k] for k in gs))
    return out


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=docs_strategy)
def test_dsir_logweights_exact(spark, docs):
    targets = set(range(0, len(docs), 2))
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string")
    target_df = df.where((df.doc_id % 2) == 0)
    got = {r.doc_id: (r.n_grams, r.logweight_micro)
           for r in dsir.dsir_logweights(df, target_df, n_buckets=64,
                                         alpha=0.5).collect()}
    want = _brute_dsir(docs, targets, 64, 0.5)
    assert got == want


def _brute_nb(texts, labels, alpha=1.0):
    cnt, tot, nd = {}, {}, {}
    for t, lab in zip(texts, labels):
        nd[lab] = nd.get(lab, 0) + 1
        for w in _toks(t):
            cnt[(lab, w)] = cnt.get((lab, w), 0) + 1
            tot[lab] = tot.get(lab, 0) + 1
    n = len(texts)
    v = len({w for (_, w) in cnt})
    pri = {lab: round(math.log(nd[lab] / n) * 1e6) for lab in nd}
    out = {}
    for i, t in enumerate(texts):
        best = None
        for lab in sorted(nd):
            s = pri[lab] + sum(
                round(math.log((cnt.get((lab, w), 0) + alpha)
                               / (tot.get(lab, 0) + alpha * v)) * 1e6)
                for w in _toks(t))
            if best is None or s > best[1]:
                best = (lab, s)
        out[i] = best
    return out


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=docs_strategy,
       labels=st.lists(st.sampled_from(["x", "y", "z"]), min_size=3,
                       max_size=12))
def test_nb_classifier_exact(spark, docs, labels):
    n = min(len(docs), len(labels))
    docs, labels = docs[:n], labels[:n]
    df = spark.createDataFrame(
        [(i, t, lab) for i, (t, lab) in enumerate(zip(docs, labels))],
        "doc_id long, text string, label string")
    got = {r.doc_id: (r.predicted_label, r.score_micro)
           for r in classify.nb_classify(df).collect()}
    want = _brute_nb(docs, labels)
    assert got == want
