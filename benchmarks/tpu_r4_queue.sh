#!/bin/bash
# Round-4 TPU measurement queue (one job at a time; run from /root/repo).
# Ordered: VERDICT r3 asks first (decode overlap, sustained training,
# 4K write-stream), then perf levers, then headline bench cache warm.
set -x
cd /root/repo
mkdir -p docs

# 1. Write-stream decode overlap A/B (VERDICT item 3; target >= 0.25 fps)
PMCTF_BENCH_DEC_ASYNC=0 timeout 5400 python benchmarks/bench_stream.py \
  2>&1 | tee docs/stream_1080p_r4_sync.log
PMCTF_BENCH_DEC_ASYNC=1 timeout 5400 python benchmarks/bench_stream.py \
  2>&1 | tee docs/stream_1080p_r4_async.log

# 2. Sustained stage 7-8 training (VERDICT item 4)
timeout 7200 python benchmarks/stage78_sustained.py \
  2>&1 | tee docs/curriculum_sustained.log

# 3. 4K write-stream smoke (VERDICT item 7): one 4-frame 3840x2160 GOP,
#    real bitstreams, decode check on (fourstep ll_mode)
timeout 7200 python test_pmctf_flex.py --synthetic 4 \
  --synthetic_size 2160x3840 --q_index 10 --write_stream 1 \
  --stream_path /tmp/4k_bin --output_path /tmp/4k_stream_smoke.json \
  2>&1 | tee docs/4k_stream_smoke.log
cp /tmp/4k_stream_smoke_qidx10.json docs/ 2>/dev/null || true

# 4. Perf levers (VERDICT item 6)
timeout 2400 python benchmarks/pallas_conv_lab.py 2>&1 | tee docs/pallas_conv_lab_r4.log
timeout 2400 python benchmarks/spynet_batch_lab.py 2>&1 | tee docs/spynet_batch_lab_r4.log

# 5. Headline bench (keeps the driver-run cache warm; gate >= 2.0)
timeout 3600 python bench.py 2>&1 | tee docs/bench_r4.log
