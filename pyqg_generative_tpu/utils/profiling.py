"""Tracing / profiling utilities.

The reference's only tracing is a wall-clock decorator
(reference tools/cnn_tools.py:40-49). Kept for parity, plus first-class TPU
tooling: `jax.profiler` trace contexts and a throughput harness that reports
steps/sec of any jitted step function (SURVEY §5.1)."""
from __future__ import annotations

import contextlib
import time
from functools import wraps

import jax

__all__ = ["timer", "trace", "measure_throughput"]


def timer(func):
    """Print the wall-clock time of a call (reference tools/cnn_tools.py:40-49)."""
    @wraps(func)
    def wrap(*args, **kw):
        t1 = time.time()
        result = func(*args, **kw)
        t2 = time.time()
        print(f"Function {func.__name__!r} executed in {(t2 - t1):.4f}s")
        return result
    return wrap


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context: view with TensorBoard/xprof."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def measure_throughput(step_fn, carry, n_steps: int = 100,
                       warmup: int = 3) -> dict:
    """Throughput of a `carry -> carry` jitted step function, excluding
    compile. Returns steps/sec and ms/step."""
    jfn = jax.jit(step_fn)
    for _ in range(warmup):
        carry = jfn(carry)
    jax.block_until_ready(carry)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        carry = jfn(carry)
    jax.block_until_ready(carry)
    dt = time.perf_counter() - t0
    return {"steps_per_s": n_steps / dt, "ms_per_step": 1e3 * dt / n_steps,
            "wall_s": dt}
