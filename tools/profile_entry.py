"""Per-entry profiler: run one (or more) queries() entries with the Spark
event log enabled, then print per-job wall time, stage task counts and
shuffle bytes — the guide §1 "where is the time going" measurement at
job granularity, without the UI.

Usage: python tools/profile_entry.py <sf_dir> <query> [query ...]

Each query runs twice (like the bench's min-of-2) with job descriptions
labelling the reps; the report shows every job of the SECOND rep (warm)
with its wall clock, so fixed scheduling overhead vs real compute is
attributable per job. Python-side phase timing (driver code between
jobs) shows up as inter-job gaps.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    evdir = "/tmp/spark-events-profile"
    os.makedirs(evdir, exist_ok=True)
    import shutil
    for f in glob.glob(os.path.join(evdir, "*")):
        shutil.rmtree(f) if os.path.isdir(f) else os.remove(f)

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("profile_entry")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.dir", evdir)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()

    # warm-up (same as bench, incl. the python worker pool)
    entry_mod.q_range_query(spark, sf_dir).write.format("noop") \
        .mode("overwrite").save()
    from pyspark.sql import types as WT

    def _noop_batches(it):
        yield from it

    (spark.range(0, int(cpus), 1, int(cpus))
     .mapInPandas(_noop_batches,
                  WT.StructType([WT.StructField("id", WT.LongType())]))
     .write.format("noop").mode("overwrite").save())

    windows: dict[str, tuple[float, float, float]] = {}
    for name in names:
        fn = qs[name]
        for rep in (1, 2):
            spark.sparkContext.setJobDescription(f"{name}#rep{rep}")
            t0 = time.time()
            df = fn(spark, sf_dir)
            t_build = time.time()
            df.write.format("noop").mode("overwrite").save()
            t1 = time.time()
            print(f"{name} rep{rep}: {t1 - t0:.3f}s "
                  f"(plan-build {t_build - t0:.3f}s)", flush=True)
            windows[f"{name}#rep{rep}"] = (t0 * 1000, t1 * 1000, t1 - t0)
        spark.sparkContext.setJobDescription(None)

    sc_app_id = spark.sparkContext.applicationId
    spark.stop()
    time.sleep(1)

    # parse the event log
    logf = None
    for f in glob.glob(os.path.join(evdir, "*")):
        if sc_app_id in f:
            if os.path.isdir(f):  # Spark 4 eventlog_v2 rolling dir
                cand = [p for p in glob.glob(os.path.join(f, "events*"))]
                logf = sorted(cand)[0] if cand else None
            else:
                logf = f
    jobs = []   # (jobId, desc, submit_ms, end_ms, n_stages)
    stages = {}  # stageId -> dict
    job_meta = {}
    with open(logf) as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            et = ev.get("Event")
            if et == "SparkListenerJobStart":
                jid = ev["Job ID"]
                desc = ev.get("Properties", {}).get(
                    "spark.job.description", "")
                job_meta[jid] = {
                    "desc": desc, "start": ev["Submission Time"],
                    "stages": [s["Stage ID"]
                               for s in ev.get("Stage Infos", [])]}
            elif et == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in job_meta:
                    job_meta[jid]["end"] = ev["Completion Time"]
            elif et == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stages[si["Stage ID"]] = {
                    "name": si["Stage Name"].split("\n")[0][:70],
                    "tasks": si["Number of Tasks"],
                    "ms": (si.get("Completion Time", 0)
                           - si.get("Submission Time", 0)),
                }

    for label, (w0, w1, wall) in windows.items():
        if "#rep2" not in label:
            continue
        print(f"\n=== {label}  wall {wall:.3f}s ===")
        prev_end = w0
        tot_job = 0.0
        for jid in sorted(job_meta):
            jm = job_meta[jid]
            if "end" not in jm:
                continue
            # match by description OR (streaming micro-batch jobs carry
            # their own description) by falling inside the rep window
            if jm.get("desc") != label and not (
                    w0 <= jm["start"] <= w1):
                continue
            gap = (jm["start"] - prev_end) / 1000
            dur = (jm["end"] - jm["start"]) / 1000
            tot_job += dur
            prev_end = jm["end"]
            st = [f"s{sid}:{stages[sid]['tasks']}t/{stages[sid]['ms']}ms"
                  f" [{stages[sid]['name']}]"
                  for sid in jm["stages"] if sid in stages]
            print(f"  [gap {gap:6.3f}s] job {jid}: {dur:6.3f}s  "
                  f"{' '.join(st)}")
        print(f"  [tail gap {(w1 - prev_end) / 1000:6.3f}s]  "
              f"jobs total {tot_job:.3f}s, driver/gaps "
              f"{wall - tot_job:.3f}s")


if __name__ == "__main__":
    main()
