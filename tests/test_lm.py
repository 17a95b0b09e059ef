"""Bigram LM quality scoring: exact micro-unit arithmetic, ranking
behavior on planted gibberish, NULL/short-doc handling."""
import math

import pytest
from pyspark.sql import functions as F

from sleeper_spark.functions import lm


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


class TestBigramLM:
    def test_hand_computed_scores(self, spark):
        df = spark.createDataFrame(
            [(1, "a b a b c"), (2, "a b"), (3, "x")], ["doc_id", "text"])
        out = {r.doc_id: (r.n_bigrams, r.sum_logprob_micro,
                          r.avg_logprob_micro)
               for r in lm.bigram_lm_scores(df, alpha=0.1).collect()}
        # vocab V=4 (a,b,c,x); smoothed lp(c12,c1) = ln((c12+.1)/(c1+.4))
        def lp(c12, c1):
            return round(math.log((c12 + 0.1) / (c1 + 0.4)) * 1e6)
        s1 = 2 * lp(3, 3) + lp(1, 3) + lp(1, 3)
        assert out[1] == (4, s1, int(s1 / 4))
        s2 = lp(3, 3)
        assert out[2] == (1, s2, int(s2 / 1))
        assert out[3] == (0, None, None)  # no transitions to judge

    def test_gibberish_ranks_below_repeated_prose(self, spark):
        """Documents made of corpus-common transitions must outscore a
        document of one-off transitions."""
        common = "the cat sat on the mat"
        rows = [(i, common) for i in range(10)]
        rows.append((99, "zq vx wk jr pl mn bt"))  # unique transitions
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {r.doc_id: r.avg_logprob_micro
               for r in lm.bigram_lm_scores(df).collect()}
        assert out[99] < out[0]  # gibberish is less probable

    def test_every_doc_appears_exactly_once(self, docs):
        scored = lm.bigram_lm_scores(docs)
        assert scored.count() == docs.count()
        assert scored.select("doc_id").distinct().count() == docs.count()
        # real prose: every doc has >= 2 tokens, so all score
        assert scored.where("avg_logprob_micro IS NULL").count() == 0
