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

# 4. 4K estimate-path smoke (STATUS.md evidence; ref test_pMCTF_flex.py
#    padding path analogue). 8 frames, 1 rate point, no bitstream.
timeout 5400 python test_pmctf_flex.py --synthetic 1 --synthetic_size 2160x3840 \
  --force_frame_num 8 --q_index 10 --output_path /tmp/4k_smoke.json \
  2>&1 | tee docs/4k_smoke.log

# 5. AR-parity-mode timing at 1080p (VERDICT r2 item 7): measured, not
#    estimated — compress + cold/warm decompress + LL wavefront share.
timeout 5400 python benchmarks/bench_ar.py 2>&1 | tee docs/ar_1080p.log

# 6. Write-stream axis re-measure after the decode program-count cuts
#    (12 -> 5 programs per unit; VERDICT r2 weak item 2 asked for the
#    re-measured GOP-4 1080p write-stream fps).
timeout 5400 python benchmarks/bench_stream.py 2>&1 | tee docs/stream_1080p.log
