#!/bin/bash
# Round-13 scale-chain re-anchor on the containment-bound HEAD:
# sf10 then sf30, with the bench's per-query checkpoint GC active and
# a disk sampler recording peak usage (VERDICT r12 ask #2's done
# criteria: a fresh sf30 run completes with NO manual checkpoint
# deletion + peak disk noted).
set -e
cd "$(dirname "$0")/.."

rm -f /tmp/disk_samples_r13.txt
( while true; do df --output=used -k / | tail -1 >> /tmp/disk_samples_r13.txt; sleep 10; done ) &
SAMPLER=$!
trap "kill $SAMPLER 2>/dev/null" EXIT

echo "=== sf10 ==="
SPARK_GRAFT_DRIVER_MEM=64g SPARK_GRAFT_SHUFFLE_PARTITIONS=64 \
SPARK_GRAFT_CHECKPOINT_DIR=$PWD/.benchdata/ckpt_chain \
SPARK_GRAFT_SF_DIR=$PWD/.benchdata/sf10 \
SPARK_GRAFT_PLANS_DIR=$PWD/bench_plans_sf10 python bench.py 2>/dev/null | tail -1 | tee BENCH_sf10_r13.json

echo "=== sf30 ==="
SPARK_GRAFT_DRIVER_MEM=96g SPARK_GRAFT_SHUFFLE_PARTITIONS=128 \
SPARK_GRAFT_CHECKPOINT_DIR=$PWD/.benchdata/ckpt_chain \
SPARK_GRAFT_SF_DIR=$PWD/.benchdata/sf30 \
SPARK_GRAFT_PLANS_DIR=$PWD/bench_plans_sf30 python bench.py 2>/dev/null | tail -1 | tee BENCH_sf30_r13.json

kill $SAMPLER 2>/dev/null || true
PEAK_KB=$(sort -n /tmp/disk_samples_r13.txt | tail -1)
echo "peak disk used during chain: $((PEAK_KB / 1024 / 1024)) GiB" | tee CHAIN_DISK_r13.txt
ls .benchdata/ckpt_chain 2>/dev/null | wc -l | xargs -I{} echo "checkpoint entries left after GC: {}" | tee -a CHAIN_DISK_r13.txt
echo CHAIN_DONE
