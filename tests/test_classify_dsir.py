"""Behavioural tests for DSIR importance resampling, the Naive Bayes
classifier, and the contamination-safe split (oracle parity is covered
by the driver's DuckDB sweep; these pin the SEMANTICS on corpora built
to make the right answer obvious)."""

import pytest
from pyspark.sql import functions as F

from sleeper_spark.functions import classify, dedup, dsir


@pytest.fixture(scope="module")
def corpus(spark):
    # two clearly separated vocabularies: "code" docs and "prose" docs
    rows = []
    for i in range(20):
        rows.append((i, "def return import class lambda yield "
                        "def import return", "code"))
    for i in range(20, 60):
        rows.append((i, "the cat sat on the mat and purred softly "
                        "all day", "prose"))
    rows.append((60, "", "prose"))  # zero-token doc
    return spark.createDataFrame(rows, "doc_id long, text string, "
                                       "domain string")


class TestDsir:
    def test_target_domain_scores_higher(self, corpus):
        target = corpus.where(F.col("domain") == "code")
        scored = dsir.dsir_logweights(corpus, target, n_buckets=256,
                                      alpha=0.5)
        got = {r.doc_id: r.logweight_micro
               for r in scored.collect()}
        assert len(got) == 61  # every raw doc scored, even empty
        code_w = [got[i] for i in range(20)]
        prose_w = [got[i] for i in range(20, 60)]
        # every code doc must out-weigh every prose doc: the corpora
        # share no vocabulary, so the importance ratio separates fully
        assert min(code_w) > max(prose_w)
        assert got[60] == 0  # no grams -> weight-neutral

    def test_greedy_resample_is_topk_by_weight(self, corpus):
        target = corpus.where(F.col("domain") == "code")
        scored = dsir.dsir_logweights(corpus, target, n_buckets=256)
        top = dsir.dsir_resample(scored, k=20)
        ids = {r.doc_id for r in top.collect()}
        assert ids == set(range(20))  # exactly the target-like docs

    def test_gumbel_resample_deterministic(self, corpus):
        target = corpus.where(F.col("domain") == "code")
        scored = dsir.dsir_logweights(corpus, target, n_buckets=256)
        a = sorted(r.doc_id for r in
                   dsir.dsir_resample(scored, 10, temperature=2.0)
                   .collect())
        b = sorted(r.doc_id for r in
                   dsir.dsir_resample(scored, 10, temperature=2.0)
                   .collect())
        assert a == b  # portable Gumbel: same sample every run

    def test_gumbel_tilts_toward_weight(self, corpus):
        # with moderate temperature the sample should still be
        # dominated by high-weight (code) docs
        target = corpus.where(F.col("domain") == "code")
        scored = dsir.dsir_logweights(corpus, target, n_buckets=256)
        picked = [r.doc_id for r in
                  dsir.dsir_resample(scored, 15, temperature=2.0)
                  .collect()]
        n_code = sum(1 for i in picked if i < 20)
        assert n_code >= 12


class TestNaiveBayes:
    def test_separable_corpus_classifies_perfectly(self, corpus):
        out = classify.nb_classify(corpus, label_col="domain")
        rows = out.collect()
        assert len(rows) == 61
        wrong = [r for r in rows
                 if r.doc_id != 60 and r.predicted_label != r.label]
        assert wrong == []

    def test_zero_token_doc_gets_max_prior_label(self, corpus):
        out = classify.nb_classify(corpus, label_col="domain")
        r60 = [r for r in out.collect() if r.doc_id == 60][0]
        # prose has 41 of 61 docs: the larger prior wins on no evidence
        assert r60.predicted_label == "prose"

    def test_predict_unlabeled(self, spark, corpus):
        counts, stats, vocab = classify.nb_train(corpus,
                                                 label_col="domain")
        new = spark.createDataFrame(
            [(100, "import lambda yield def"),
             (101, "the mat and the cat")],
            "doc_id long, text string")
        pred = {r.doc_id: r.predicted_label
                for r in classify.nb_predict(new, counts, stats,
                                             vocab).collect()}
        assert pred == {100: "code", 101: "prose"}


class TestContaminationSafeSplit:
    def test_near_dups_never_straddle(self, spark):
        # planted near-dup trio (same text + tiny edits) among
        # unrelated docs
        base = ("alpha beta gamma delta epsilon zeta eta theta iota "
                "kappa lambda mu")
        rows = [(0, base), (1, base + " nu"), (2, base + " xi")]
        for i in range(3, 40):
            rows.append((i, f"unrelated document number {i} with "
                            f"unique words w{i}a w{i}b w{i}c w{i}d "
                            f"w{i}e w{i}f"))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        pairs = dedup.minhash_candidate_pairs(df, num_hashes=32,
                                              bands=8)
        split = dedup.contamination_safe_split(df, pairs, eval_pct=30)
        got = {r.doc_id: (r.component_id, r.split)
               for r in split.collect()}
        assert len(got) == 40
        # the trio shares one component and therefore one side
        comps = {got[i][0] for i in (0, 1, 2)}
        sides = {got[i][1] for i in (0, 1, 2)}
        assert comps == {0} and len(sides) == 1
        assert set(s for _, s in got.values()) <= {"train", "eval"}
        # the split actually splits (both sides non-empty at 30%)
        assert {s for _, s in got.values()} == {"train", "eval"}

    def test_split_is_deterministic(self, spark):
        rows = [(i, f"doc {i} words a{i} b{i} c{i} d{i}")
                for i in range(30)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        pairs = dedup.minhash_candidate_pairs(df, num_hashes=32,
                                              bands=8)
        a = sorted((r.doc_id, r.split) for r in
                   dedup.contamination_safe_split(df, pairs).collect())
        b = sorted((r.doc_id, r.split) for r in
                   dedup.contamination_safe_split(df, pairs).collect())
        assert a == b


class TestIncrementalDsir:
    def test_persisted_counts_score_new_batch(self, spark, corpus,
                                              tmp_path):
        """The incremental path: fit once, persist the two ≤B-row count
        tables, score a NEW batch against the reloaded statistics —
        byte-identical to scoring through a fresh fit of the same
        corpora (no re-read of either corpus at scoring time)."""
        target = corpus.where(F.col("domain") == "code")
        tc = dsir.fit_bucket_counts(target, n_buckets=128)
        rc = dsir.fit_bucket_counts(corpus, n_buckets=128)
        tc.write.parquet(str(tmp_path / "tc"))
        rc.write.parquet(str(tmp_path / "rc"))

        new = spark.createDataFrame(
            [(100, "def lambda yield import"),
             (101, "the cat and the mat"),
             (102, "")],
            "doc_id long, text string")
        wt = dsir.logweight_table_from_counts(
            spark.read.parquet(str(tmp_path / "tc")),
            spark.read.parquet(str(tmp_path / "rc")), n_buckets=128)
        got = {r.doc_id: (r.n_grams, r.logweight_micro)
               for r in dsir.score_with_weights(new, wt,
                                                n_buckets=128).collect()}
        # fresh-fit reference over the same corpora
        wt2 = dsir.dsir_logweight_table(target, corpus, n_buckets=128)
        want = {r.doc_id: (r.n_grams, r.logweight_micro)
                for r in dsir.score_with_weights(new, wt2,
                                                 n_buckets=128).collect()}
        assert got == want
        assert got[100][1] > got[101][1]  # code-like doc scores higher
        assert got[102] == (0, 0)


class TestKmeansDistributed:
    def test_partitioning_invariant_and_separates(self, spark):
        """Integer-exact Lloyd's must produce the SAME assignment under
        any partitioning, and on a corpus with two obvious blobs the
        blobs may not share a cluster."""
        from sleeper_spark.functions import similarity
        rows = []
        for i in range(30):
            rows.append((i, [10.0 + (i % 3) * 0.01, 10.0, 10.0, 10.0]))
        for i in range(30, 60):
            rows.append((i, [-10.0, -10.0 - (i % 3) * 0.01, -10.0,
                             -10.0]))
        df = spark.createDataFrame(rows,
                                   "vec_id long, embedding array<float>")
        a = {r.vec_id: r.cluster for r in
             similarity.kmeans_distributed(df, k=2, iterations=3)
             .collect()}
        b = {r.vec_id: r.cluster for r in
             similarity.kmeans_distributed(df.repartition(7), k=2,
                                           iterations=3).collect()}
        assert a == b  # deterministic under partitioning
        blob1 = {a[i] for i in range(30)}
        blob2 = {a[i] for i in range(30, 60)}
        assert len(blob1) == 1 and len(blob2) == 1 and blob1 != blob2
