#!/bin/bash
# Bench series runner: N full-suite runs at sf0.1, each writing
# bench_run_<i>.json; medians assembled by tools/bench_median.py.
set -e
N=${1:-6}
cd /root/repo
for i in $(seq 1 "$N"); do
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_OUT=/tmp/bench_run_$i.json \
    sbt -batch "runMain graft.Bench" > /tmp/bench_run_$i.log 2>&1
  echo "run $i done: $(python3 -c "import json;print(json.load(open('/tmp/bench_run_$i.json'))['value'])")"
done
