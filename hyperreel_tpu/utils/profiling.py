"""Profiling/observability utilities (SURVEY.md §5 tracing).

The reference relies on disabled PL profilers + ad-hoc cuda.synchronize
timing (main.py:21-26, nlf/__init__.py:786-852, utils/gui_utils.py:147-210).
TPU equivalents: jax.profiler traces and block_until_ready wall-clock
helpers, plus the rays/sec counter that is the BASELINE metric.
"""

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir):
    """jax.profiler trace context; view with TensorBoard or xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Wall-clock timing with device sync (the TPU analog of the
    reference's torch.cuda.synchronize bracketing)."""

    def __init__(self):
        self.times = {}

    @contextlib.contextmanager
    def time(self, name, sync_arr=None):
        t0 = time.perf_counter()
        yield
        if sync_arr is not None:
            jax.block_until_ready(sync_arr)
        self.times.setdefault(name, []).append(time.perf_counter() - t0)

    def summary(self):
        return {k: {"mean": sum(v) / len(v), "n": len(v),
                    "total": sum(v)}
                for k, v in self.times.items()}


def rays_per_sec(fn, args, n_rays, warmup=2, iters=10):
    """Throughput of a jitted render/train fn in rays/sec."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return n_rays / dt
