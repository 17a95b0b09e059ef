"""Local replica of the driver's correctness gate: run every queries()
entry and its oracle_sql() side-by-side at sf0.01 and compare
(row count, column names, order-insensitive multiset of values).

Usage: python tools/check_oracle.py [sf_dir] [query ...]

Set CHECK_ORACLE_JSON=<path> to also write a machine-format record
(per-query ``{rows_match, schema_match, hash_match, err}``) — the
committed ``CORRECTNESS_full_r{N}.json`` artifact that covers the full
registry, complementing the driver's rotating 50-query subset. When the
run is chunked across processes (the parallel sf1 sweep), each chunk
appends to the same file: existing entries for other queries are kept,
entries for re-run queries are overwritten.

By default the oracle side is fetched via DuckDB's pandas bridge
(``cur.df()``), which reproduces the driver's typing behaviour —
notably HUGEINT (e.g. from ``sum(BIGINT) OVER``) degrading to
float64, the exact hazard that broke pack_token_budget's driver hash
in round 4. Set CHECK_ORACLE_FETCH=tuples to use the older
``fetchall()`` path (Python-native ints, masks that hazard).
"""

from __future__ import annotations

import math
import os
import sys
from collections import Counter

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, ".")
import __spark_entry__ as entry_mod

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # full round-trip precision: only bit-identical doubles compare
        # equal, mimicking the driver's value hash
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return str(v)


def row_key(row, names_sorted, name_to_idx):
    return tuple(norm(row[name_to_idx[n]]) for n in names_sorted)


def _pandas_value(v, duck_type: str):
    """Undo pandas' representational quirks (see fetch site) without
    undoing dtype degradation."""
    import numpy as np
    import pandas as pd

    if isinstance(v, np.ndarray):
        return v.tolist()  # deep: numpy scalars become Python natives
    if isinstance(v, list):
        return v
    if v is None or (not isinstance(v, (str, bytes)) and pd.isna(v)):
        return None
    if duck_type == "Date" and hasattr(v, "date"):  # description says 'Date'
        return v.date()
    if hasattr(v, "to_pydatetime"):
        return v.to_pydatetime()
    if hasattr(v, "item"):
        return v.item()
    return v


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # data-derived oracles (IVF centroids) must read the same sf dir
    os.environ["SPARK_GRAFT_ORACLE_SF"] = sf_dir
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("check_oracle")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = 0
    record: dict[str, dict] = {}

    def rec(name, rows_match=False, schema_match=False, hash_match=False,
            err=None, mode="oracle", n_rows=None):
        record[name] = {"rows_match": rows_match, "schema_match": schema_match,
                        "hash_match": hash_match, "err": err, "mode": mode,
                        "n_rows": n_rows}

    for name, fn in qs.items():
        if only and name not in only:
            continue
        tuples_mode = os.environ.get("CHECK_ORACLE_FETCH") == "tuples"
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            if tuples_mode:
                srows = sdf.collect()
            else:
                # driver-faithful: BOTH sides round-trip through pandas,
                # so a degradation hitting both sides equally (nullable
                # BIGINT -> float64) stays green, while a one-sided one
                # (DuckDB HUGEINT -> float64 vs Spark int64) fails —
                # exactly the driver's observed behavior in round 4
                spdf = sdf.toPandas()
                srows = [tuple(_pandas_value(v, None) for v in row)
                         for row in spdf.itertuples(index=False, name=None)]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            rec(name, err=f"spark error: {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok    {name}: rows-only ({len(srows)} rows)")
            rec(name, rows_match=True, schema_match=True, hash_match=True,
                mode="rows_only", n_rows=len(srows))
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            if tuples_mode:
                orows = cur.fetchall()
            else:
                # driver-faithful: round-trip through pandas so dtype
                # degradation (HUGEINT->float64 etc.) shows up here too.
                # pandas' own representational quirks that the driver
                # normalises away are undone per-column: DATE columns
                # come back as midnight Timestamps (-> date), arrays as
                # np.ndarray (-> list), numpy scalars (-> .item()) —
                # while a degraded dtype (int -> float64) survives,
                # which is the hazard this mode exists to catch.
                pdf = cur.df()
                tmap = [str(d[1]) for d in cur.description]
                orows = [
                    tuple(_pandas_value(v, t) for v, t in zip(row, tmap))
                    for row in pdf.itertuples(index=False, name=None)]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error: {e}")
            rec(name, err=f"oracle error: {e}")
            failures += 1
            continue
        if sorted(scols) != sorted(ocols):
            print(f"FAIL  {name}: columns spark={sorted(scols)} oracle={sorted(ocols)}")
            rec(name, rows_match=len(srows) == len(orows),
                err="schema mismatch", n_rows=len(srows))
            failures += 1
            continue
        if len(srows) != len(orows):
            print(f"FAIL  {name}: rowcount spark={len(srows)} oracle={len(orows)}")
            rec(name, schema_match=True, err="rowcount mismatch",
                n_rows=len(srows))
            failures += 1
            continue
        names_sorted = sorted(scols)
        s_idx = {c: i for i, c in enumerate(scols)}
        o_idx = {c: i for i, c in enumerate(ocols)}
        sc = Counter(row_key(r, names_sorted, s_idx) for r in srows)
        oc = Counter(row_key(r, names_sorted, o_idx) for r in orows)
        if sc != oc:
            diff_s = list((sc - oc).items())[:3]
            diff_o = list((oc - sc).items())[:3]
            print(f"FAIL  {name}: value mismatch ({sum((sc - oc).values())} rows differ)")
            print(f"      cols={names_sorted}")
            for r, _ in diff_s:
                print(f"      spark-only : {r}")
            for r, _ in diff_o:
                print(f"      oracle-only: {r}")
            rec(name, rows_match=True, schema_match=True,
                err="value mismatch", n_rows=len(srows))
            failures += 1
            continue
        print(f"ok    {name}: {len(srows)} rows hash-match")
        rec(name, rows_match=True, schema_match=True, hash_match=True,
            n_rows=len(srows))
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    out_path = os.environ.get("CHECK_ORACLE_JSON")
    if out_path:
        import fcntl
        import json

        # chunked sweeps of the registry run in PARALLEL processes and
        # merge into one file: the read-modify-write below must be
        # atomic per process or two chunks finishing together silently
        # drop each other's query entries. An exclusive flock on a
        # sidecar lock file serialises the whole merge (the lock file,
        # not out_path itself, is locked — os.replace swaps the inode
        # out from under an fd-based lock).
        lock = open(out_path + ".lock", "a")
        fcntl.flock(lock, fcntl.LOCK_EX)
        merged: dict[str, dict] = {}
        if os.path.exists(out_path):  # chunked sweeps append
            try:
                merged = json.load(open(out_path)).get("queries", {})
            except (OSError, ValueError):
                merged = {}
        merged.update(record)
        n_green = sum(1 for v in merged.values()
                      if v["hash_match"] and not v["err"])
        summary = {
            "sf_dir": sf_dir,
            "n_queries": len(merged),
            "n_green": n_green,
            "n_failures": len(merged) - n_green,
            "fetch_mode": "tuples" if os.environ.get(
                "CHECK_ORACLE_FETCH") == "tuples" else "pandas",
            "queries": dict(sorted(merged.items())),
        }
        tmp_path = out_path + ".tmp"
        with open(tmp_path, "w") as f:
            json.dump(summary, f, indent=1)
            f.write("\n")
        os.replace(tmp_path, out_path)
        fcntl.flock(lock, fcntl.LOCK_UN)
        lock.close()
        print(f"wrote {out_path}: {n_green}/{len(merged)} green")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
