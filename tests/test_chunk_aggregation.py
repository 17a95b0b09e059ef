"""Property-based pin of the Arrow engine's group-adjacent aggregator
(sorted_scan._aggregate_chunk_sorted) against an independent pandas
reference, over randomized sorted chunks covering the whole algebra:
numeric sum with cast-back, min/max, string/binary concat-sum,
map_sum/map_min/map_max. No Spark session needed — pure Arrow, so the
search space can be large and fast (reference semantics:
AggregationOp.java:25-215, rust/aggregator_udfs/src/map_aggregate.rs)."""

from __future__ import annotations

import pyarrow as pa
from hypothesis import given, settings, strategies as st

from sleeper_spark.sorted_scan import _aggregate_chunk_sorted

KEYS = ["k1", "k2"]
COLS = ["k1", "k2", "ns", "mn", "cs", "cb", "ms", "mm"]


def _make_chunk(rows):
    rows = sorted(rows, key=lambda r: (r[0], r[1]))
    cols = list(zip(*rows))
    return pa.table({
        "k1": pa.array(cols[0], type=pa.string()),
        "k2": pa.array(cols[1], type=pa.int64()),
        "ns": pa.array(cols[2], type=pa.int32()),
        "mn": pa.array(cols[3], type=pa.int64()),
        "cs": pa.array(cols[4], type=pa.string()),
        "cb": pa.array(cols[5], type=pa.binary()),
        "ms": pa.array(cols[6], type=pa.map_(pa.string(), pa.int64())),
        "mm": pa.array(cols[7], type=pa.map_(pa.string(), pa.int64())),
    })


def _reference(rows):
    """Plain-Python group-adjacent reference implementation."""
    rows = sorted(rows, key=lambda r: (r[0], r[1]))
    out = {}
    order = []
    for k1, k2, ns, mn, cs, cb, ms, mm in rows:
        key = (k1, k2)
        if key not in out:
            out[key] = [ns, mn, cs, cb, dict(ms), dict(mm)]
            order.append(key)
            # canonical: maps rebuilt with sorted keys even untouched
            out[key][4] = dict(sorted(out[key][4].items()))
            out[key][5] = dict(sorted(out[key][5].items()))
        else:
            acc = out[key]
            acc[0] += ns
            acc[1] = min(acc[1], mn)
            acc[2] += cs
            acc[3] += cb
            merged = acc[4]
            for mk, mv in ms:
                merged[mk] = merged.get(mk, 0) + mv
            acc[4] = dict(sorted(merged.items()))
            mmin = acc[5]
            for mk, mv in mm:
                mmin[mk] = min(mmin[mk], mv) if mk in mmin else mv
            acc[5] = dict(sorted(mmin.items()))
    return [(k1, k2, *vals) for (k1, k2), vals in
            ((k, out[k]) for k in order)]


map_entries = st.lists(
    st.tuples(st.sampled_from(["a", "b", "c", "d"]),
              st.integers(-1000, 1000)),
    max_size=3, unique_by=lambda e: e[0])

row = st.tuples(
    st.sampled_from(["x", "y", "z", ""]),                # k1
    st.integers(0, 3),                                   # k2
    st.integers(-10**6, 10**6),       # ns: 60-row sums stay inside int32
    st.integers(-2**62, 2**62),                          # mn
    st.text(alphabet="abc", max_size=3),                 # cs
    st.binary(max_size=3),                               # cb
    map_entries,                                         # ms
    map_entries,                                         # mm
)


@settings(max_examples=120, deadline=None)
@given(st.lists(row, min_size=1, max_size=60))
def test_chunk_aggregation_matches_reference(rows):
    desc = {
        "key_names": KEYS,
        "column_order": COLS,
        "aggs": [("ns", "sum"), ("mn", "min"), ("cs", "sum"),
                 ("cb", "sum"), ("ms", "map_sum"), ("mm", "map_min")],
    }
    chunk = _make_chunk(rows)
    out = _aggregate_chunk_sorted(chunk, desc)
    got = []
    for r in out.to_pylist():
        got.append((r["k1"], r["k2"], r["ns"], r["mn"], r["cs"], r["cb"],
                    dict(r["ms"]), dict(r["mm"])))
        # map key order canonical (sorted) in the arrow output
        assert [e[0] for e in r["ms"]] == sorted(e[0] for e in r["ms"])
    want = [(k1, k2, ns, mn, cs, cb, ms, mm)
            for k1, k2, ns, mn, cs, cb, ms, mm in _reference(rows)]
    assert got == want
    # schema preserved exactly (cast-back: sum(int32) stays int32)
    assert out.schema == chunk.schema


def test_map_sum_dense_path_matches_hash_path():
    """The dense bincount map_sum (sorted_scan._map_sum_dense) must be
    value-identical to the Arrow hash-agg path on the same inputs —
    including negative and near-2^62 values exercising the hi/lo split —
    and must decline (return None -> hash path) on nulls."""
    import random

    import numpy as np

    from sleeper_spark import sorted_scan as ss

    rng = random.Random(7)
    rows = []
    for _ in range(500):
        n_entries = rng.randint(0, 4)
        keys = rng.sample(["a", "b", "c", "d", "e"], n_entries)
        rows.append([(k, rng.choice(
            [rng.randint(-1000, 1000), 2**62 - 1, -(2**62), 1])) for k in keys])
    col = pa.chunked_array(
        [pa.array(rows, type=pa.map_(pa.string(), pa.int64()))])
    gid = np.repeat(np.arange(100, dtype=np.int64), 5)

    dense = ss._agg_map_column(col, gid, 100, "sum")
    orig = ss._map_sum_dense
    ss._map_sum_dense = lambda *a, **k: None  # force the hash path
    try:
        hashed = ss._agg_map_column(col, gid, 100, "sum")
    finally:
        ss._map_sum_dense = orig
    assert dense.to_pylist() == hashed.to_pylist()

    # nulls -> the dense path must decline, not mis-sum
    withnull = pa.chunked_array([pa.array(
        [[("a", 1), ("b", None)], [("a", 2)]],
        type=pa.map_(pa.string(), pa.int64()))])
    g2 = np.zeros(2, dtype=np.int64)
    assert ss._map_sum_dense(
        withnull.combine_chunks().keys,
        withnull.combine_chunks().items, np.array([0, 0, 1]), 1,
        pa.int64()) is None
    out = ss._agg_map_column(withnull, g2, 1, "sum")
    # all-null value group sums to null (Arrow/Spark sum semantics)
    assert dict(out.to_pylist()[0]) == {"a": 3, "b": None}
