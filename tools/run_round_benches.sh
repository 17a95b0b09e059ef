#!/bin/bash
# Round-artifact refresh, detachable: full-registry sf0.01 oracle sweep,
# full-registry sf1 sweep, official sf0.1 bench record, and the sf1
# (10x) bench — run STRICTLY sequentially (never time two Spark jobs
# concurrently). Status lines append to /tmp/benches_status; outputs
# land in /tmp. Run ONLY with no other Spark/pytest work on the box.
R=r11
CHECK_ORACLE_JSON=/tmp/correctness_full_${R}.json \
  python /root/repo/tools/check_oracle.py /root/testdata/sf0.01 \
  > /tmp/sweep_sf001.log 2>&1
echo "sf001sweep exit $?" >> /tmp/benches_status
CHECK_ORACLE_JSON=/tmp/correctness_sf1.json \
  python /root/repo/tools/check_oracle.py /tmp/sf1 \
  > /tmp/sweep_sf1.log 2>&1
echo "sf1sweep exit $?" >> /tmp/benches_status
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python /root/repo/bench.py \
  > /tmp/bench_${R}.json 2>/tmp/bench_${R}.log
echo "bench exit $?" >> /tmp/benches_status
cp /root/repo/BENCH_DETAIL.json /tmp/bench_detail_${R}_sf01.json
SPARK_GRAFT_SF_DIR=/tmp/sf1 python /root/repo/bench.py \
  > /tmp/bench_sf1.json 2>/tmp/bench_sf1.log
echo "benchsf1 exit $?" >> /tmp/benches_status
cp /root/repo/BENCH_DETAIL.json /tmp/bench_detail_sf1.json
echo DONE >> /tmp/benches_status
