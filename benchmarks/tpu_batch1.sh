#!/bin/bash
# First TPU batch after tunnel recovery: measurement labs + bench A/B.
# ONE job at a time (sequential). Logs under /tmp/tpu_batch1/.
set -u
mkdir -p /tmp/tpu_batch1
cd /root/repo

echo "=== 1. foldw_lab (raw rates + postprocess A/B) ==="
timeout 2400 python benchmarks/foldw_lab.py > /tmp/tpu_batch1/foldw.log 2>&1
echo "rc=$?"
tail -20 /tmp/tpu_batch1/foldw.log

echo "=== 2. merge_lab (split vs same vs cross) ==="
timeout 2400 python benchmarks/merge_lab.py > /tmp/tpu_batch1/merge.log 2>&1
echo "rc=$?"
tail -10 /tmp/tpu_batch1/merge.log

echo "=== 3. bench.py PIPE=0 (baseline repro) ==="
PMCTF_BENCH_PIPE=0 timeout 3600 python bench.py > /tmp/tpu_batch1/bench_pipe0.log 2>&1
echo "rc=$?"
tail -2 /tmp/tpu_batch1/bench_pipe0.log

echo "=== 4. bench.py PIPE=1 ==="
PMCTF_BENCH_PIPE=1 timeout 3600 python bench.py > /tmp/tpu_batch1/bench_pipe1.log 2>&1
echo "rc=$?"
tail -2 /tmp/tpu_batch1/bench_pipe1.log

echo "=== DONE tpu_batch1 ==="
