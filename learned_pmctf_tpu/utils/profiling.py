"""Profiling and timing instrumentation.

The reference's observability is wall-clock spans around encode/decode
(ref: pMCTF_L.py:554-608, test_pMCTF_flex.py:339-343); here the same
span timers plus jax.profiler trace capture for TPU timelines.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict


class SpanTimer:
    """Accumulating named wall-clock spans (encoding_time/decoding_time...)."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {"total_s": self.totals[name],
                   "count": self.counts[name],
                   "mean_ms": self.totals[name] / max(self.counts[name], 1) * 1e3}
            for name in self.totals
        }


@contextlib.contextmanager
def device_trace(logdir: str):
    """jax.profiler trace context (view with tensorboard / xprof)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def block(tree):
    """Block until every array in a pytree is ready (accurate timing)."""
    import jax

    jax.block_until_ready(tree)
    return tree
