#!/bin/bash
# Round-artifact refresh, detachable: official sf0.1 bench record, the
# sf1 (10x) bench, and the full-registry sf1 oracle sweep — run
# STRICTLY sequentially (never time two Spark jobs concurrently).
# Status lines append to /tmp/benches_status; outputs land in /tmp.
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python /root/repo/bench.py \
  > /tmp/bench_r09.json 2>/tmp/bench_r09.log
echo "bench09 exit $?" >> /tmp/benches_status
cp /root/repo/BENCH_DETAIL.json /tmp/bench_detail_r09_sf01.json
SPARK_GRAFT_SF_DIR=/tmp/sf1 python /root/repo/bench.py \
  > /tmp/bench_sf1.json 2>/tmp/bench_sf1.log
echo "benchsf1 exit $?" >> /tmp/benches_status
cp /root/repo/BENCH_DETAIL.json /tmp/bench_detail_sf1.json
CHECK_ORACLE_JSON=/tmp/correctness_sf1_177.json \
  python /root/repo/tools/check_oracle.py /tmp/sf1 \
  > /tmp/sweep_sf1.log 2>&1
echo "sf1sweep exit $?" >> /tmp/benches_status
echo DONE >> /tmp/benches_status
