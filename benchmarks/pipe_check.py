"""Correctness check for bench.py's software-pipelined forward
(PMCTF_BENCH_PIPE): pipelined and split schedules must produce the SAME
control value (sum over every reconstructed plane) — the pipeline only
re-groups programs, never reorders math within a pair.

Run on CPU (tiny shapes):
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python benchmarks/pipe_check.py
"""

import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def main():
    tiny = dict(decomp_levels=2, num_me_stages=2, channel_mv=8, channel_n=8,
                features=8, ar_features=8, spynet_levels=3,
                warp_mode="fast", act_bf16=False, ll_mode="fourstep")
    bench.BENCH_PIPE = False
    _, c_split = bench.main(gop=4, h=128, w=128, module_kwargs=tiny,
                            runs=1, report=False)
    bench.BENCH_PIPE = True
    _, c_pipe = bench.main(gop=4, h=128, w=128, module_kwargs=tiny,
                           runs=1, report=False)
    rel = abs(c_pipe - c_split) / max(1.0, abs(c_split))
    print(f"control split={c_split:.6f} pipe={c_pipe:.6f} rel={rel:.2e}")
    assert rel < 1e-6, (c_split, c_pipe)
    print("PIPE-CHECK OK")


if __name__ == "__main__":
    main()
