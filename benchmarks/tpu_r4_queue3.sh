#!/bin/bash
# Round-4 TPU queue, part 3: sustained training (wedge workaround:
# log_every 5), packed-encode stream re-measure, 4K write-stream,
# perf levers, headline bench.
set -x
cd /root/repo
mkdir -p docs

# 1. Sustained stage 7-8: 20 GOP-8 + 20 GOP-16 steps, fixed q, rd curve
timeout 10800 python benchmarks/stage78_sustained.py \
  2>&1 | tee docs/curriculum_sustained.log

# 2. Write-stream A/B with the packed single-readback encode
PMCTF_BENCH_DEC_ASYNC=1 timeout 5400 python benchmarks/bench_stream.py \
  2>&1 | tee docs/stream_1080p_r4_packed.log
timeout 3600 python benchmarks/stream_profile_lab.py \
  2>&1 | tee docs/stream_profile_r4b.log

# 3. 4K write-stream smoke
timeout 7200 python test_pmctf_flex.py --synthetic 4 \
  --synthetic_size 2160x3840 --q_index 10 --write_stream 1 \
  --stream_path /tmp/4k_bin --output_path /tmp/4k_stream_smoke.json \
  2>&1 | tee docs/4k_stream_smoke.log
cp /tmp/4k_stream_smoke_qidx10.json docs/ 2>/dev/null || true

# 4. Perf levers
timeout 2400 python benchmarks/pallas_conv_lab.py 2>&1 | tee docs/pallas_conv_lab_r4.log
timeout 2400 python benchmarks/spynet_batch_lab.py 2>&1 | tee docs/spynet_batch_lab_r4.log

# 5. Headline bench (driver cache warm)
timeout 3600 python bench.py 2>&1 | tee docs/bench_r4.log
