"""Profiling / timing utilities.

The reference's only instrumentation is a wall-clock Timer around eval and
loss meters in the train loop (reference ``fcos_core/utils/timer.py``,
``engine/trainer.py:426-463``). TPU-native additions: jax profiler traces
(viewable in TensorBoard/XProf) and a step-time tracker that forces a tiny
host sync, since dispatch is async.
"""

import contextlib
import time

import numpy as np


class Timer:
    """Reference utils/timer.py semantics."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.total_time = 0.0
        self.calls = 0
        self.start_time = 0.0
        self.diff = 0.0

    def tic(self):
        self.start_time = time.perf_counter()

    def toc(self, average: bool = True):
        self.diff = time.perf_counter() - self.start_time
        self.total_time += self.diff
        self.calls += 1
        return self.average_time if average else self.diff

    @property
    def average_time(self):
        return self.total_time / self.calls if self.calls > 0 else 0.0


@contextlib.contextmanager
def jax_trace(log_dir: str):
    """Capture an XLA trace for TensorBoard (jax.profiler)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def synced_time(fn, *args, sync_leaf=None):
    """Time fn(*args) including device execution by fetching one output leaf
    (block_until_ready is unreliable through remote relays)."""
    import jax

    t0 = time.perf_counter()
    out = fn(*args)
    leaf = sync_leaf(out) if sync_leaf else jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf)
    return time.perf_counter() - t0, out
