"""Multi-chip scaling: meshes, shardings, parallel train/eval steps.

The reference is single-process single-GPU (SURVEY.md §2.6); this package
is the new TPU-native surface:

- data parallelism over the batch (training) and over sequences/rate
  points (eval) via jax.sharding on a 'data' mesh axis,
- spatial sharding of frame width over a 'spatial' axis for 1080p/4K
  single-frame latency — XLA's SPMD partitioner inserts the halo
  exchanges for the lifting/conv stencils automatically,
- gradient reduction rides ICI through sharding propagation (psum
  inserted by XLA under jit; no hand-written collectives needed).
"""

from .mesh import make_mesh, data_sharding, replicated, frame_sharding  # noqa: F401
