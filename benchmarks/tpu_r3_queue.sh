#!/bin/bash
# Round-3 TPU measurement queue (run AFTER the stage 7-8 smoke finishes;
# one TPU job at a time). Usage: bash benchmarks/tpu_r3_queue.sh
set -x
cd /root/repo

# 1. Pallas PostProcess A/B at production shapes
timeout 2400 python benchmarks/pallas_conv_lab.py 2>&1 | tee /tmp/pallas_lab.log

# 2. Chroma stage-batching A/B
timeout 2400 python benchmarks/chroma_batch_lab.py 2>&1 | tee /tmp/cbatch_lab.log

# 3. Headline bench: baseline, then each lever, then combined
timeout 3600 python bench.py 2>&1 | tee /tmp/bench_base.log
PMCTF_BENCH_CBATCH=1 timeout 3600 python bench.py 2>&1 | tee /tmp/bench_cbatch.log
PMCTF_PALLAS_POST=1 timeout 3600 python bench.py 2>&1 | tee /tmp/bench_pallas.log
PMCTF_BENCH_CBATCH=1 PMCTF_PALLAS_POST=1 timeout 3600 python bench.py 2>&1 | tee /tmp/bench_both.log
