"""Test configuration.

Tries to force an 8-virtual-device CPU platform. NOTE: in the axon TPU
container, sitecustomize registers the axon backend at interpreter
startup (PALLAS_AXON_POOL_IPS set) and pins the platform before conftest
runs; in that case tests execute on the real TPU chip instead — which is
fine for correctness tests. Multi-chip sharding tests always spawn a
subprocess with a sanitized environment (see test_parallel.py).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: the model fixtures compile large graphs;
# caching makes suite re-runs start hot.
from learned_pmctf_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (big compiles / full pipelines)")


SANITIZED_CPU_ENV = {
    **{k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"},
    "JAX_PLATFORMS": "cpu",
    "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
}
