#!/bin/bash
# Round-14 scale chain on the r14 optimization HEAD (VERDICT r13 ask #1):
# sf1 then sf10, same protocol as the r11-13 chains (uniform
# make_scaled_sf data, bench.py, checkpoint GC active at sf10, plan
# dirs refreshed, audit_plans against the smaller SF afterwards).
set -e
cd "$(dirname "$0")/.."

echo "=== sf1 ==="
SPARK_GRAFT_SF_DIR=$PWD/.benchdata/sf1 \
SPARK_GRAFT_PLANS_DIR=$PWD/bench_plans_sf1 python bench.py 2>/dev/null | tail -1 | tee BENCH_sf1_r14.json

echo "=== sf10 ==="
SPARK_GRAFT_DRIVER_MEM=64g SPARK_GRAFT_SHUFFLE_PARTITIONS=64 \
SPARK_GRAFT_CHECKPOINT_DIR=$PWD/.benchdata/ckpt_chain \
SPARK_GRAFT_SF_DIR=$PWD/.benchdata/sf10 \
SPARK_GRAFT_PLANS_DIR=$PWD/bench_plans_sf10 python bench.py 2>/dev/null | tail -1 | tee BENCH_sf10_r14.json

echo "=== plan audits ==="
python scripts/audit_plans.py bench_plans bench_plans_sf1 | tee PLAN_AUDIT_sf1.txt || true
python scripts/audit_plans.py bench_plans_sf1 bench_plans_sf10 | tee PLAN_AUDIT_sf10.txt || true
echo CHAIN_DONE
