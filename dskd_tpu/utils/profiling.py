"""Tracing / profiling utilities (parity: mmdet/utils/profiling.py +
tools/analysis_tools/benchmark.py timing discipline).

The reference pairs time.monotonic with CUDA events per stream; the TPU
equivalents are ``block_until_ready`` walls and ``jax.profiler`` traces.
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def profile_time(name: str, log=print, sync=None):
    """Wall-clock a block; pass sync=array/pytree to block on device work."""
    t0 = time.monotonic()
    yield
    if sync is not None:
        jax.block_until_ready(sync)
    log(f"{name}: {1000 * (time.monotonic() - t0):.2f} ms")


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed_steps(step_fn, *args, iters: int = 10, warmup: int = 3,
                sync_out=lambda out: out):
    """Steady-state step timing (the reference benchmark.py recipe:
    warmup, then synchronized timing)."""
    out = None
    for _ in range(warmup):
        out = step_fn(*args)
    jax.block_until_ready(sync_out(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step_fn(*args)
    jax.block_until_ready(sync_out(out))
    return (time.perf_counter() - t0) / iters
