"""Crash-injection hardening: SIGKILL writer processes mid-commit-loop
and prove the transaction log NEVER corrupts — the property the
two-phase commit (tmp write + fsync + atomic os.link,
statestore._commit) exists to guarantee, here validated at arbitrary
interruption points instead of by code reading.

Mirrors the reference's crash-safety posture for its transaction log
(docs/design.md:156-199: state changes are atomic committed
transactions; a dead worker leaves claims that recovery releases).

Invariants checked after killing two racing workers at a random moment:
1. every sequence-numbered transaction file parses as complete JSON
   (a torn write may only ever exist under a ``.tmp-`` name);
2. a fresh StateStore loads the log without error, contiguously;
3. recovery workers can keep committing against the survivor store;
4. claims held by the dead workers are recoverable via abandon_job,
   after which no claims remain;
5. row accounting stays exact: every referenced parquet file exists,
   its physical row count equals the reference's number_of_rows, and
   no key is ever duplicated across the surviving files.
"""

import json
import os
import signal
import subprocess
import sys
import time

import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T

from sleeper_spark.partitions import PartitionTree
from sleeper_spark.schema import Field, Schema
from sleeper_spark.statestore import StateStore

WORKER = os.path.join(os.path.dirname(__file__), "contention_worker.py")


def _schema() -> Schema:
    return Schema(row_key_fields=(Field("k", T.LongType()),),
                  value_fields=(Field("v", T.LongType()),))


@pytest.mark.parametrize("kill_after", [0.7, 1.5])
def test_sigkill_mid_loop_never_corrupts_the_log(tmp_path, kill_after):
    store_path = str(tmp_path / "store")
    data_dir = str(tmp_path / "data")
    os.makedirs(data_dir)
    st = StateStore(store_path, _schema())
    st.initialise_partitions(PartitionTree.initial(st.schema))

    # two workers race an effectively-endless loop; the kill lands at
    # an arbitrary point in ingest/assign/replace/snapshot work
    victims = [subprocess.Popen(
        [sys.executable, WORKER, store_path, data_dir, str(w), "100000",
         str(w * 100_000_000)],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        for w in (0, 1)]
    # wait until the workers are demonstrably MID-WORK (a few commits
    # in the log) before starting the kill timer — a fixed sleep alone
    # could land before the interpreters finish importing on a loaded
    # machine, which would test nothing
    tx_dir = os.path.join(store_path, "transactions")
    deadline = time.time() + 60
    while time.time() < deadline:
        live = [n for n in os.listdir(tx_dir)
                if not n.startswith(".tmp-")]
        if len(live) >= 4:
            break
        time.sleep(0.05)
    time.sleep(kill_after)  # now the kill point is genuinely arbitrary
    for p in victims:
        p.send_signal(signal.SIGKILL)
    for p in victims:
        p.wait(timeout=30)

    # (1) no torn transaction under a committed name
    n_txs = 0
    for name in os.listdir(tx_dir):
        if name.startswith(".tmp-"):
            continue  # torn residue is allowed ONLY here
        with open(os.path.join(tx_dir, name)) as f:
            json.load(f)  # must be complete JSON
        n_txs += 1
    assert n_txs >= 2  # the kill landed mid-work, not before it

    # (2) fresh load succeeds and is contiguous (load raises on gaps)
    st2 = StateStore(store_path, _schema())
    assert st2.current_seq >= n_txs

    # (3) recovery workers commit against the survivor store with
    # disjoint key ranges; they must run clean to completion
    recovery = [subprocess.Popen(
        [sys.executable, WORKER, store_path, data_dir, str(w), "15",
         str(200_000_000 + w * 10_000)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for w in (2, 3)]
    outs = [p.communicate(timeout=300) for p in recovery]
    for p, (out, err) in zip(recovery, outs):
        assert p.returncode == 0, err[-2000:]

    # (4) dead workers' claims are released by the recovery operator
    st3 = StateStore(store_path, _schema())
    dead_jobs = {r.job_id for r in st3.all_references()
                 if r.job_id is not None}
    for job in sorted(dead_jobs):
        st3.unassign_job_ids(job)
    assert all(r.job_id is None for r in st3.all_references())

    # (5) exact row accounting over every surviving reference
    keys = []
    for r in st3.all_references():
        assert os.path.exists(r.filename), r.filename
        t = pq.read_table(r.filename, columns=["k"])
        assert t.num_rows == r.number_of_rows, r.filename
        keys.extend(t.column("k").to_pylist())
    assert len(keys) == len(set(keys))  # never a duplicated row
