#!/bin/bash
# Round-3 TPU measurement queue (run AFTER the stage 7-8 smoke finishes;
# one TPU job at a time). Usage: bash benchmarks/tpu_r3_queue.sh
#
# Ordered by decision value under a tight end-of-round budget: first a
# quick headline-bench confirmation (warms/validates the exact program
# set BENCH_r03 will run), then the VERDICT r2 measurement asks (AR
# timing, write-stream re-measure, 4K smoke), then speculative perf
# levers last — they only change defaults if they win.
set -x
cd /root/repo

# 1. Headline bench as committed (warm cache — fast): BENCH_r03 preview.
timeout 1800 python bench.py 2>&1 | tee /tmp/bench_base.log

# 2. AR-parity-mode timing at 1080p (VERDICT r2 item 7): measured, not
#    estimated — compress + cold/warm decompress + LL wavefront share.
timeout 2700 python benchmarks/bench_ar.py 2>&1 | tee docs/ar_1080p.log

# 3. Write-stream axis re-measure after the decode program-count cuts
#    (12 -> 5 programs per unit; VERDICT r2 weak item 2 asked for the
#    re-measured GOP-4 1080p write-stream fps).
timeout 2700 python benchmarks/bench_stream.py 2>&1 | tee docs/stream_1080p.log

# 4. 4K estimate-path smoke (VERDICT r2 missing item 5; ref
#    test_pMCTF_flex.py padding-path analogue). 8 frames, 1 rate point.
timeout 3600 python test_pmctf_flex.py --synthetic 1 --synthetic_size 2160x3840 \
  --force_frame_num 8 --q_index 10 --output_path /tmp/4k_smoke.json \
  2>&1 | tee docs/4k_smoke.log

# 5. Speculative levers (fresh 1080p compiles — slow; only run if time
#    remains; defaults change only on a win).
PMCTF_PALLAS_POST=1 timeout 2700 python bench.py 2>&1 | tee /tmp/bench_pallas.log
PMCTF_BENCH_CBATCH=1 timeout 2700 python bench.py 2>&1 | tee /tmp/bench_cbatch.log
