"""Persistent XLA compilation cache helper.

The codec graphs (1080p pWave stacks) take minutes to compile; caching
them on disk makes repeated CLI/bench invocations start hot.
"""

import os


def enable_compilation_cache(path: str | None = None):
    import jax

    path = path or os.environ.get(
        "PMCTF_JAX_CACHE", os.path.expanduser("~/.cache/pmctf_jax"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    return path
