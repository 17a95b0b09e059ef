"""Keyword search (functions/search.py) and SemDeDup semantic dedup
(similarity.semantic_dedup): operator semantics plus the LSM
composition — postings persisted into a term-keyed SleeperTable so a
term lookup rides the engine's own point-query path (partition pruning
+ Bloom file skipping)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sleeper_spark.functions import search, similarity
from sleeper_spark.schema import Field, Schema
from sleeper_spark.table import SleeperTable


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "Spark merges sorted runs; the scan is fast"),
        (1, "vector search with merge and scan paths"),
        (2, "VECTOR, vector, vector!"),
        (3, None),
        (4, ""),
        (5, "scan merge vector scan"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestKeywordSearch:
    def test_all_mode(self, docs):
        got = {r.doc_id: r.n_matched for r in search.keyword_search(
            docs, ["vector", "merge", "scan"], mode="all").collect()}
        assert got == {1: 3, 5: 3}

    def test_any_mode_counts_distinct_terms(self, docs):
        got = {r.doc_id: r.n_matched for r in search.keyword_search(
            docs, ["vector", "merge", "scan"], mode="any").collect()}
        # doc 0: merge? "merges" tokenizes to 'merges' (no match) +
        # 'scan' -> 1; doc 2: 'vector' once despite 3 occurrences
        assert got == {0: 1, 1: 3, 2: 1, 5: 3}

    def test_case_and_duplicate_terms_normalised(self, docs):
        got = search.keyword_search(
            docs, ["Vector", "vector"], mode="all").collect()
        assert sorted(r.doc_id for r in got) == [1, 2, 5]

    def test_null_and_empty_text_never_match(self, docs):
        got = search.keyword_search(docs, ["vector"], mode="any").collect()
        assert {r.doc_id for r in got} & {3, 4} == set()

    def test_bad_args(self, docs):
        with pytest.raises(ValueError, match="mode"):
            search.keyword_search(docs, ["x"], mode="fuzzy")
        with pytest.raises(ValueError, match="non-empty"):
            search.keyword_search(docs, [])

    def test_inverted_index_tf(self, docs):
        idx = {(r.term, r.doc_id): r.tf
               for r in search.inverted_index(docs).collect()}
        assert idx[("vector", 2)] == 3
        assert idx[("scan", 5)] == 2
        assert ("", 4) not in idx and not any(d == 3 for _, d in idx)

    def test_posting_stats(self, docs):
        stats = {r.term: (r.df, r.tf_total) for r in search.posting_stats(
            search.inverted_index(docs)).collect()}
        assert stats["vector"] == (3, 5)
        assert stats["scan"] == (3, 4)

    def test_bm25_ranking_properties(self, docs):
        scores = {r.doc_id: r.score for r in search.bm25_search(
            docs, ["vector", "merge", "scan"]).collect()}
        # null/empty text and no-match docs are excluded
        assert set(scores) == {0, 1, 2, 5}
        # doc 2 is pure repeated 'vector' (3x, dl=3): highest tf weight
        # for that term; doc 0 matches only 'scan' once in a longer doc
        assert scores[2] > scores[0]
        # all-terms doc beats single-term doc
        assert scores[5] > scores[0]
        assert all(s > 0 for s in scores.values())

    def test_bm25_empty_terms_rejected(self, docs):
        with pytest.raises(ValueError, match="non-empty"):
            search.bm25_search(docs, [])

    def test_search_plan_is_scan_only(self, docs):
        df = search.keyword_search(docs, ["vector", "merge"], mode="all")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # zero-shuffle by design


class TestSearchTableComposition:
    def test_term_keyed_posting_table_point_lookup(self, spark, tmp_path):
        """Persist postings into a (term, doc_id)-keyed SleeperTable:
        a term query is an exact_key_query — range-pruned and
        bloom-skipped like any LSM point lookup."""
        rows = [(i, f"alpha beta w{i % 7}") for i in range(200)]
        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        idx = search.inverted_index(docs)
        schema = Schema(
            (Field("term", T.StringType()),),
            (Field("doc_id", T.LongType()),),
            (Field("tf", T.LongType()),),
        )
        t = SleeperTable.create(spark, str(tmp_path / "ix"), schema,
                                split_points=["m"])
        t.ingest(idx.select("term", "doc_id", "tf"))
        hits = t.exact_key_query(term="w3").collect()
        assert sorted(r.doc_id for r in hits) == [
            i for i in range(200) if i % 7 == 3]
        # postings arrive sorted by doc_id within the term
        assert [r.doc_id for r in hits] == sorted(r.doc_id for r in hits)
        assert t.exact_key_query(term="nope").count() == 0


class TestSemanticDedup:
    def test_keeps_min_id_of_each_neighborhood(self, spark):
        import numpy as np
        rng = np.random.default_rng(7)
        base = rng.normal(size=(4, 8))
        rows = []
        vid = 0
        for b in base:
            for _ in range(3):  # 3 near-identical copies per direction
                v = b + rng.normal(scale=1e-3, size=8)
                rows.append((vid, [float(x) for x in v]))
                vid += 1
        df = spark.createDataFrame(rows, ["vec_id", "embedding"])
        # explicit centroids = the base directions: every copy-trio is
        # guaranteed cluster-local (SemDeDup only compares within a
        # cell; a k-means run can legitimately split a trio, which is
        # the documented approximation, not what this test pins)
        cents = [[float(x) for x in b / np.linalg.norm(b)] for b in base]
        kept = similarity.semantic_dedup(df, cents, threshold=0.99)
        ids = sorted(r.vec_id for r in kept.collect())
        # exactly the lowest id of each trio survives
        assert ids == [0, 3, 6, 9]

    def test_threshold_one_keeps_everything(self, spark):
        rows = [(i, [float(i + 1), 0.0]) for i in range(6)]
        df = spark.createDataFrame(rows, ["vec_id", "embedding"])
        cents = [[1.0, 0.0], [0.0, 1.0]]
        # all vectors are parallel -> cosine 1.0 -> everything above
        # any threshold < 1 collapses to vec 0; at 1.0 ties still match
        kept = similarity.semantic_dedup(df, cents, threshold=1.0)
        assert sorted(r.vec_id for r in kept.collect()) == [0]
