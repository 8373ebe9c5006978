"""learned_pmctf_tpu — TPU-native learned wavelet video coding framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
FAU-LMS/Learned-pMCTF (pWave++ image coder + pMCTF-L MCTF video coder with a
real rANS bitstream path), built TPU-first:

- all models are pure functions over flax.linen parameter pytrees,
- sequential state (LSTM subband context, AR decode state, DPB) is explicit,
- the entropy-coding boundary is a host-side C++ rANS library fed by
  device-computed symbol planes (four-step checkerboard layouts keep the
  number of host round trips at 4 per subband),
- variable rate (21 q-indices) is a traced scalar: one compiled program
  serves the full RD sweep,
- multi-chip scaling uses jax.sharding meshes (data parallel batch +
  spatial sharding with XLA-inserted halo exchanges).

Reference parity citations use `ref:` prefixes and point into the upstream
PyTorch code base (mounted read-only at /root/reference) as file:line.
"""

__version__ = "0.1.0"
