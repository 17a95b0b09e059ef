"""Dump ``explain('formatted')`` for queries() entries to plans/<tag>/.

Usage: python tools/dump_plans.py <tag_dir> <suffix> <query> [query ...]
e.g.   python tools/dump_plans.py plans/r11 before nb_classifier

Writes plans/r11/<query>_<suffix>.txt. The entry's fixture (if any) is
built as part of calling the entry — plans reflect exactly what the
bench times.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod  # noqa: E402


def main() -> None:
    tag_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(tag_dir, exist_ok=True)

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("dump_plans")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    qs = entry_mod.queries()
    for name in names:
        df = qs[name](spark, sf)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        out = os.path.join(tag_dir, f"{name}_{suffix}.txt")
        with open(out, "w") as f:
            f.write(txt)
        print(f"wrote {out} ({len(txt)} chars)", flush=True)


if __name__ == "__main__":
    main()
