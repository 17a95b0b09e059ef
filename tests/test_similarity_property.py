"""Property test: similarity_join is EXACT on randomized corpora.

Hypothesis generates word-soup documents from a small vocabulary (high
collision density — the regime where prefix filtering, the size-ratio
filter, and the positional filter all actually prune), and the
operator's output must equal a brute-force all-pairs Jaccard computed
independently in Python over the same tokenization. One Spark session,
few examples, deadline off (Spark jobs are not hypothesis-sized)."""
import itertools
import re

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from sleeper_spark.functions.text import TOKEN_PATTERN

VOCAB = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
         "eta", "theta", "iota", "kappa"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=0, max_size=12)
    .map(" ".join),
    min_size=2, max_size=14)


def _shingles(text: str, k: int = 3) -> frozenset:
    toks = re.findall(TOKEN_PATTERN, text.lower())
    return frozenset(" ".join(toks[i:i + k])
                     for i in range(len(toks) - k + 1))


def _brute_pairs(texts, threshold):
    out = set()
    sh = {i: _shingles(t) for i, t in enumerate(texts)}
    for a, b in itertools.combinations(range(len(texts)), 2):
        sa, sb = sh[a], sh[b]
        if not sa or not sb:
            continue
        j = round(len(sa & sb) / len(sa | sb), 4)
        if j >= threshold:
            out.add((a, b, j))
    return out


@pytest.mark.parametrize("threshold", [0.3, 0.6])
@settings(max_examples=12, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(texts=docs_strategy)
def test_similarity_join_exact_on_random_corpora(spark, threshold, texts):
    from sleeper_spark.functions.dedup import similarity_join
    df = spark.createDataFrame(
        list(enumerate(texts)), ["doc_id", "text"])
    got = {(r.id_a, r.id_b, r.jaccard) for r in
           similarity_join(df, threshold=threshold).collect()}
    assert got == _brute_pairs(texts, threshold)
