#!/bin/bash
# Round-4 TPU queue, part 2 (after the decode-overlap A/B): profiling
# first (short), then the long sustained-training run, then 4K, levers,
# headline bench.
set -x
cd /root/repo
mkdir -p docs

# 0. Stream-axis phase breakdown + GIL overlap probe (short)
timeout 3600 python benchmarks/stream_profile_lab.py \
  2>&1 | tee docs/stream_profile_r4.log

# 1. Sustained stage 7-8 training, 24-clip dataset => 20 steps/epoch
timeout 10800 python benchmarks/stage78_sustained.py \
  2>&1 | tee docs/curriculum_sustained.log

# 2. 4K write-stream smoke
timeout 7200 python test_pmctf_flex.py --synthetic 4 \
  --synthetic_size 2160x3840 --q_index 10 --write_stream 1 \
  --stream_path /tmp/4k_bin --output_path /tmp/4k_stream_smoke.json \
  2>&1 | tee docs/4k_stream_smoke.log
cp /tmp/4k_stream_smoke_qidx10.json docs/ 2>/dev/null || true

# 3. Perf levers
timeout 2400 python benchmarks/pallas_conv_lab.py 2>&1 | tee docs/pallas_conv_lab_r4.log
timeout 2400 python benchmarks/spynet_batch_lab.py 2>&1 | tee docs/spynet_batch_lab_r4.log

# 4. Headline bench (driver cache warm)
timeout 3600 python bench.py 2>&1 | tee docs/bench_r4.log
