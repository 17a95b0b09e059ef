"""HyperLogLog distinct-count sketches: engine parity, merge algebra,
accuracy, and the lazy per-file sidecar path on SleeperTable.

Reference analog: the per-file mergeable sketch sidecar design
(java/sketches/.../Sketches.java) — the reference carries quantile
sketches only; distinct-count sidecars extend the same algebra."""

import json
import os

import duckdb
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sleeper_spark import Field, Schema, SleeperTable, sketches
from sleeper_spark.functions import cardinality as C
from sleeper_spark.properties import TableProperties

SF = "/root/testdata/sf0.01"


def test_register_parity_with_sql_oracle(spark):
    """The sketch must match a pure-SQL reproduction BIT-FOR-BIT —
    the property that makes it verifiable across engines."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    got = sorted(
        (r["register"], r["rho_max"])
        for r in C.distinct_count_sketch(ev, "user_id", p=8).collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS "
                f"SELECT * FROM read_parquet('{SF}/events.parquet')")
    want = sorted(map(tuple, con.execute(
        C.oracle_sketch_sql("events", "user_id", p=8)).fetchall()))
    assert got == want


def test_merge_equals_sketch_of_union(spark):
    """hll(A ∪ B) == merge(hll(A), hll(B)) — the sidecar algebra."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    whole = sorted(
        (r["register"], r["rho_max"])
        for r in C.distinct_count_sketch(ev, "user_id", p=10).collect())
    a = C.distinct_count_sketch(ev.where("event_id % 3 != 0"), "user_id", 10)
    b = C.distinct_count_sketch(ev.where("event_id % 3 = 0"), "user_id", 10)
    merged = sorted(
        (r["register"], r["rho_max"]) for r in C.hll_merge(a, b).collect())
    assert merged == whole


@pytest.mark.parametrize("col,p,tol", [("user_id", 12, 0.05),
                                       ("event_type", 12, 0.34)])
def test_estimate_accuracy(spark, col, p, tol):
    """Estimate lands within tolerance of the exact distinct count.
    user_id has ~150 distinct values (linear-counting range, tight);
    event_type has 3 (tiny-cardinality worst case: the estimate is
    granular at m*ln(m/(m-k)) steps, so the RELATIVE band is wide)."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    exact = ev.where(F.col(col).isNotNull()).select(col).distinct().count()
    est = C.approx_distinct(ev, col, p)
    assert abs(est - exact) <= max(1.0, tol * exact), (est, exact)


def test_nulls_not_counted(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b"), (4, None)], "id int, v string")
    est = C.approx_distinct(df, "v", p=12)
    assert round(est) == 2


def test_table_approx_distinct_lazy_sidecars(spark, tmp_path):
    """First call scans live files ONCE and writes registers back into
    the sidecar JSON; a second call (and calls after compaction churn)
    reuse/extend them. Estimate stays near exact throughout."""
    ev = (spark.read.parquet(f"{SF}/events.parquet")
          .select("event_id", "user_id", "event_type"))
    schema = Schema(
        (Field("event_id", T.LongType()),), (),
        (Field("user_id", T.LongType(), True),
         Field("event_type", T.StringType(), True)))
    t = SleeperTable.create(spark, str(tmp_path / "t"), schema,
                            TableProperties(), split_points=[5000])
    t.ingest(ev)
    t.ingest(ev.limit(500))
    exact = ev.select("user_id").distinct().count()

    est = t.approx_distinct("user_id", p=12)
    assert abs(est - exact) <= max(2.0, 0.05 * exact), (est, exact)

    # registers persisted per live file
    for fn in t.store.files:
        sc = sketches.load_sidecar(fn)
        assert sc and "user_id@12" in sc.get("hll", {}), fn

    # second call: no missing files -> pure driver math, same answer
    assert t.approx_distinct("user_id", p=12) == est

    # churn: compaction replaces files; only the NEW files get scanned,
    # and the estimate is unchanged (same underlying key set)
    t.compact()
    est2 = t.approx_distinct("user_id", p=12)
    assert abs(est2 - exact) <= max(2.0, 0.05 * exact), (est2, exact)
    for fn in t.store.files:
        assert "user_id@12" in (sketches.load_sidecar(fn) or {}).get(
            "hll", {}), fn


def test_table_approx_distinct_rejects_unsupported_types(spark, tmp_path):
    schema = Schema(
        (Field("k", T.LongType()),), (),
        (Field("v", T.DoubleType(), True),))
    t = SleeperTable.create(spark, str(tmp_path / "t2"), schema,
                            TableProperties())
    with pytest.raises(ValueError, match="int/long/string"):
        t.approx_distinct("v")


def test_sidecar_preserves_quantile_sketch(spark, tmp_path):
    """Writing HLL registers back must not clobber the quantile sketch
    the partition splitter depends on."""
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id", "user_id")
    schema = Schema((Field("event_id", T.LongType()),), (),
                    (Field("user_id", T.LongType(), True),))
    t = SleeperTable.create(spark, str(tmp_path / "t3"), schema,
                            TableProperties())
    t.ingest(ev)
    fn = next(iter(t.store.files))
    before = sketches.load_sidecar(fn)
    assert before is not None and "event_id" in json.dumps(before)
    t.approx_distinct("user_id")
    after = sketches.load_sidecar(fn)
    assert after is not None
    for k, v in before.items():
        assert after.get(k) == v, k
    assert "hll" in after
