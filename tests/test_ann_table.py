"""Persistent IVF index on SleeperTable: build_ann_index clusters each
leaf's files by cell so the sidecar file skipper prunes unprobed cells,
and ann_search probes + exact-reranks through the ordinary value-range
query path. The ANN index IS the layout plus the stats — no external
index structure (composition of Z-order-style rewrite + Iceberg-style
value skipping + IVF math from functions/similarity.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sleeper_spark import Field, Query, Schema, SleeperTable
from sleeper_spark.properties import TableProperties
from sleeper_spark.query import QueryExecutor
from sleeper_spark.ranges import Range, Region

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ann_table(spark, tmp_path_factory):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    schema = Schema(
        (Field("vec_id", T.LongType()),), (),
        (Field("embedding", T.ArrayType(T.FloatType()), True),
         Field("ann_cell", T.IntegerType(), True)))
    t = SleeperTable.create(
        spark, str(tmp_path_factory.mktemp("annidx") / "t"), schema,
        TableProperties(), split_points=[1500])
    t.ingest(emb.withColumn("ann_cell", F.lit(-1)))  # placeholder cells
    t.build_ann_index("embedding", "ann_cell", nlist=8, files_per_leaf=4)
    return t, emb


def _executor(t):
    return QueryExecutor(t.spark, t.store, t.schema)


def test_cell_probe_skips_files(spark, ann_table):
    """One cell's value-range query must read strictly fewer files than
    the full table — the index pays off at the FILE level, before any
    footer or row group is opened."""
    t, _ = ann_table
    full = Region(tuple(Range(f.name, None, None)
                        for f in t.schema.row_key_fields))
    ex = _executor(t)
    all_files = ex.plan_files(Query([full]))
    one_cell = ex.plan_files(Query([full],
                                   value_ranges=[Range("ann_cell", 0, 1)]))
    assert len(all_files) >= 4  # enough granularity for skipping
    assert 0 < len(one_cell) < len(all_files)
    # with 8 cells over >= 4 cell-clustered files, one cell should
    # prune at least half the table's files
    assert len(one_cell) <= len(all_files) // 2


def test_rewrite_recomputes_cells_and_preserves_rows(spark, ann_table):
    """derive_cols overwrote the -1 placeholders with real assignments,
    and the rewrite is a pure re-layout: same rows, same vectors."""
    t, emb = ann_table
    got = t.full_scan().select("vec_id", "ann_cell").collect()
    assert len(got) == emb.count()
    cells = {r.ann_cell for r in got}
    assert -1 not in cells
    assert cells.issubset(set(range(8)))
    # vectors survive the rewrite byte-for-byte
    s = t.full_scan().select("vec_id", F.md5(F.to_json("embedding"))
                             .alias("h"))
    w = emb.select("vec_id", F.md5(F.to_json("embedding")).alias("h"))
    assert s.exceptAll(w).isEmpty() and w.exceptAll(s).isEmpty()


def test_ann_search_matches_numpy_ground_truth(spark, ann_table):
    """ann_search == exact cosine top-k over exactly the probed cells'
    members (numpy, straight from source data): the probe set, the
    pruned scan, and the rerank all agree."""
    t, emb = ann_table
    idx = t.props.extra["ann_index"]
    C = np.asarray(idx["centroids"], dtype=np.float64)
    rows = emb.select("vec_id", "embedding").collect()
    V = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    ids = np.array([r.vec_id for r in rows])
    qv = V[7]

    got = t.ann_search(list(qv), k=5, nprobe=2).collect()

    cells = np.argsort(-(C @ qv), kind="stable")[:2]
    member = np.isin((V @ C.T).argmax(axis=1), cells)
    cos = (V[member] @ qv) / (
        np.linalg.norm(V[member], axis=1) * np.linalg.norm(qv))
    order = sorted(zip(np.round(cos, 6), ids[member]),
                   key=lambda t_: (-t_[0], t_[1]))[:5]
    want = [(int(i), float(c)) for c, i in order]
    assert [(r.vec_id, r.cosine) for r in got] == pytest.approx(want)
    # the query vector itself lives in a probed cell: top hit is itself
    assert got[0].vec_id == int(ids[7]) and got[0].cosine == 1.0


def test_later_ingest_stays_correct_unpruned(spark, ann_table):
    """Rows ingested after the index build (cells pre-assigned with the
    stored centroids) are still found by ann_search — new files just
    aren't cell-clustered until the next rewrite."""
    t, emb = ann_table
    from sleeper_spark.functions import similarity
    idx = t.props.extra["ann_index"]
    base = emb.where("vec_id = 3").select("vec_id", "embedding").collect()[0]
    v = list(base.embedding)
    new = spark.createDataFrame(
        [(999_001, v)], "vec_id long, embedding array<float>")
    t.ingest(similarity.assign_cells(new, idx["centroids"],
                                     out_col="ann_cell"))
    got = t.ann_search(v, k=3, nprobe=1).collect()
    top2 = {r.vec_id for r in got[:2]}
    assert top2 == {3, 999_001}  # both exact matches, cosine 1.0


def test_cell_clustered_later_ingest_prunes_too(spark, tmp_path):
    """Ingesting with layout='zorder' on the cell column keeps NEW
    files cell-clustered: a one-cell probe skips some of them as well
    (1-dim Z-order IS cell clustering)."""
    from sleeper_spark.functions import similarity
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    schema = Schema(
        (Field("vec_id", T.LongType()),), (),
        (Field("embedding", T.ArrayType(T.FloatType()), True),
         Field("ann_cell", T.IntegerType(), True)))
    t = SleeperTable.create(spark, str(tmp_path / "t"), schema,
                            TableProperties())
    t.ingest(emb.where("vec_id < 250").withColumn("ann_cell", F.lit(-1)))
    t.build_ann_index("embedding", "ann_cell", nlist=8, files_per_leaf=4)
    before = set(t.store.files)

    more = (emb.where("vec_id >= 250")
            .withColumn("vec_id", F.col("vec_id") + 1_000_000))
    t.ingest(similarity.assign_cells(more, t.ann_centroids(),
                                     out_col="ann_cell"),
             layout="zorder", layout_cols=["ann_cell"],
             layout_files_per_leaf=4)
    new = set(t.store.files) - before
    assert len(new) >= 2  # clustered into multiple files

    full = Region(tuple(Range(f.name, None, None)
                        for f in t.schema.row_key_fields))
    ex = _executor(t)
    one_cell = set(ex.plan_files(Query(
        [full], value_ranges=[Range("ann_cell", 0, 1)])))
    # pruning reaches into the NEW files: at least one of them is
    # skipped by the one-cell probe (its min/max excludes cell 0)
    assert new - one_cell, "no new file was pruned"


class TestTableFilteredTopk:
    """similarity.table_filtered_topk (r10 VERDICT Next #5): filtered
    vector search through a table whose row keys lead with the
    attribute column — the scan must prune to matching files, and the
    pruned result must equal the full-corpus filtered search row for
    row."""

    @pytest.fixture(scope="class")
    def labeled_table(self, spark, tmp_path_factory):
        from sleeper_spark.functions import similarity
        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        schema = Schema(
            (Field("label", T.IntegerType()),
             Field("vec_id", T.LongType())), (),
            (Field("embedding", T.ArrayType(T.FloatType()), True),))
        t = SleeperTable.create(
            spark, str(tmp_path_factory.mktemp("annflt") / "t"),
            schema, TableProperties(),
            split_points=list(range(1, 10)))
        t.ingest(emb.select("label", "vec_id", "embedding"))
        queries = emb.where(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), "label", "embedding")
        return t, emb, queries, similarity

    def test_scan_prunes_to_matching_files(self, spark, labeled_table):
        t, _emb, queries, _sim = labeled_table
        labels = [r.label for r in
                  queries.select("label").distinct().collect()]
        audit = t.explain_query(Query([
            Region.exact(t.schema, label=lb) for lb in labels]))
        assert audit["files_total"] >= 10  # one file per label leaf
        assert 0 < audit["files_after_bloom"] <= len(labels)
        assert audit["pruned_by_partition"] > 0

    def test_equals_full_corpus_filtered_search(self, spark,
                                                labeled_table):
        t, emb, queries, sim = labeled_table
        got = sorted(tuple(r) for r in sim.table_filtered_topk(
            t, queries, ["label"], k=5).collect())
        want = sorted(tuple(r) for r in sim.attribute_filtered_topk(
            emb, queries, ["label"], k=5).collect())
        assert got == want and want

    def test_contract_guards(self, spark, labeled_table):
        t, _emb, queries, sim = labeled_table
        # match_cols must be a leading row-key prefix
        with pytest.raises(ValueError, match="prefix"):
            sim.table_filtered_topk(t, queries, ["vec_id"])
        with pytest.raises(ValueError, match="prefix"):
            sim.table_filtered_topk(t, queries, [])
        # bounded query-tuple collect
        with pytest.raises(ValueError, match="distinct attribute"):
            sim.table_filtered_topk(t, queries, ["label"],
                                    query_cap=1)

    def test_empty_queries_return_empty_frame(self, spark,
                                              labeled_table):
        t, _emb, queries, sim = labeled_table
        out = sim.table_filtered_topk(t, queries.limit(0), ["label"])
        assert out.count() == 0
        assert out.columns == ["query_id", "vec_id", "cosine", "rank"]


def test_build_rejects_bad_cell_col(spark, tmp_path):
    schema = Schema((Field("k", T.LongType()),), (),
                    (Field("embedding", T.ArrayType(T.FloatType()), True),
                     Field("tag", T.StringType(), True)))
    t = SleeperTable.create(spark, str(tmp_path / "t"), schema,
                            TableProperties())
    with pytest.raises(ValueError, match="int/long value field"):
        t.build_ann_index("embedding", "tag")
    with pytest.raises(ValueError, match="no ANN index"):
        t.ann_search([0.0] * 64)
