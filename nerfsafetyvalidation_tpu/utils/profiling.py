"""Tracing / profiling as a first-class module.

The reference has only vestigial timing (commented CUDA events in
network_ff.py:96-131, wall-clock prints in the estimator,
estimator_helpers.py:272-304). Here: phase timers that force device
completion before reading the clock (on the tunneled TPU platform
block_until_ready does not synchronize, so a 1-element host fetch is used),
plus a jax.profiler trace context for XLA-level investigation.
"""

import contextlib
import time
from collections import defaultdict

import numpy as np
import jax


def force_completion(x):
    """Fetch one element to guarantee the computation actually finished."""
    leaves = jax.tree_util.tree_leaves(x)
    if leaves:
        np.asarray(leaves[0]).ravel()[:1]
    return x


class PhaseTimer:
    """Accumulates wall time per named phase.

    with timer.phase("render"):
        out = force_completion(render(...))
    """

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t = self.totals[name]
            n = self.counts[name]
            lines.append(f"{name:30s} {t:8.3f}s total  {t / n * 1e3:8.1f} ms/call"
                         f"  x{n}")
        return "\n".join(lines)

    def reset(self):
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def xla_trace(log_dir: str = "/tmp/jax-trace"):
    """jax.profiler trace context (view with tensorboard or xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
