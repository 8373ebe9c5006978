"""Persistent XLA compilation cache helper.

The codec graphs (1080p pWave stacks) take minutes to compile; caching
them on disk makes repeated CLI/bench invocations start hot.

CPU caches are keyed by a host fingerprint: XLA:CPU cache entries embed
AOT machine code tuned to the compiling host's ISA features, and XLA
force-loads mismatched entries with only a warning ("Compile machine
features ... doesn't match"). A cache written on one host and read on
another can then diverge from freshly-compiled programs at the ulp
level — enough to desync the range coder in bitstream roundtrips (and,
in round 2, to trigger a >30 min recompile that timed out the driver's
multichip dryrun). TPU entries are device-code (portable across hosts
talking to the same chip), so the TPU cache path stays stable.
"""

import hashlib
import os


def _host_fingerprint() -> str:
    """Short hash of this host's CPU feature set (ISA portability key)."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha256(
                        " ".join(sorted(line.split(":", 1)[1].split()))
                        .encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform

    return hashlib.sha256(platform.processor().encode()).hexdigest()[:12]


def enable_compilation_cache(path: str | None = None):
    import jax

    path = path or os.environ.get(
        "PMCTF_JAX_CACHE", os.path.expanduser("~/.cache/pmctf_jax"))
    # CPU-platform detection without initializing a backend: in the axon
    # container sitecustomize pins the axon (TPU) platform whenever
    # PALLAS_AXON_POOL_IPS is set, regardless of JAX_PLATFORMS.
    on_cpu = ("cpu" in os.environ.get("JAX_PLATFORMS", "").lower()
              and not os.environ.get("PALLAS_AXON_POOL_IPS"))
    if on_cpu:
        path = os.path.join(path, f"cpu-{_host_fingerprint()}")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    return path
