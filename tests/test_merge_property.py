"""Property-based pin of the vectorized k-way merge (_merge_leaf):
random sorted runs, random batch sizes, optional prune ranges — the
concatenated merge output must equal the sorted union of the inputs
(restricted to the prune range), chunk boundaries must never split an
equal-key group, and every chunk must arrive internally sorted.

Pure Arrow over tmp parquet files — no Spark session, so hypothesis can
explore a large space quickly."""

from __future__ import annotations

import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings, strategies as st

from sleeper_spark.sorted_scan import _merge_leaf

run_strategy = st.lists(
    st.tuples(st.integers(0, 50), st.integers(0, 3)),  # (k1, k2)
    max_size=40)


def _write_runs(tmp, runs):
    paths = []
    for i, rows in enumerate(runs):
        rows = sorted(rows)
        t = pa.table({
            "k1": pa.array([r[0] for r in rows], type=pa.int64()),
            "k2": pa.array([r[1] for r in rows], type=pa.int64()),
            "v": pa.array([i] * len(rows), type=pa.int64()),
        })
        p = os.path.join(tmp, f"run-{i}.parquet")
        pq.write_table(t, p, row_group_size=7)
        paths.append(p)
    return paths


@settings(max_examples=60, deadline=None)
@given(st.lists(run_strategy, min_size=1, max_size=5),
       st.integers(1, 16),
       st.one_of(st.none(),
                 st.tuples(st.integers(0, 50), st.integers(0, 50))),
       st.booleans())
def test_merge_equals_sorted_union(runs, batch_rows, prune, with_groups):
    tmp = tempfile.mkdtemp(prefix="mergeprop_")
    try:
        paths = _write_runs(tmp, runs)
        desc = {
            "files": paths,
            "key_names": ["k1", "k2"],
            "column_order": ["k1", "k2", "v"],
            "batch_rows": batch_rows,
        }
        if with_groups:
            # an aggregating merge guarantees chunk cuts at group
            # boundaries; a plain merge only guarantees global order
            # (equal keys may straddle chunks — carry skipped so a
            # dominant key cannot buffer a whole run)
            desc["aggs"] = [("v", "sum")]
        lo, hi = None, None
        if prune is not None:
            lo, hi = min(prune), max(prune) + 1
            desc["prune_range"] = ("k1", lo, hi)
        chunks = list(_merge_leaf(desc))
        got = []
        prev_last = None
        for c in chunks:
            keys = list(zip(c.column("k1").to_pylist(),
                            c.column("k2").to_pylist()))
            assert keys == sorted(keys)  # chunk internally sorted
            if prev_last is not None and keys:
                if with_groups:
                    # groups never straddle a chunk boundary, and chunk
                    # order is globally ascending
                    assert keys[0] > prev_last
                else:
                    assert keys[0] >= prev_last  # global order only
            if keys:
                prev_last = keys[-1]
            got += list(zip(keys, c.column("v").to_pylist()))
        want = sorted(
            ((r[0], r[1]), i)
            for i, rows in enumerate(runs) for r in rows
            if prune is None or (lo <= r[0] < hi))
        # merge output as a multiset of ((k1, k2), source) — the key
        # sequence must be THE sorted union; source order within equal
        # keys is unspecified (documented concat instability)
        assert sorted(got) == want
    finally:
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)
