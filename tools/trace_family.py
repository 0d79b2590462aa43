#!/usr/bin/env python
"""Per-op device trace of ANY family's train step (the zoo counterpart
of tools/trace_step.py, which traces the flagship incremental step).

Reuses bench_family.setup for the (step, state, batch) construction and
trace_step.summarize for the chrome-trace aggregation.

Usage: python tools/trace_family.py [arch] [B] [HxW]
       (defaults: mask_rcnn 2 800x1344)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench_family import setup          # noqa: E402
from trace_step import summarize        # noqa: E402


def main():
    arch = sys.argv[1] if len(sys.argv) > 1 else "mask_rcnn"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    hw = sys.argv[3] if len(sys.argv) > 3 else "800x1344"
    H, W = (int(t) for t in hw.split("x"))

    import jax

    step, state, batch = setup(arch, B, H, W)
    for _ in range(2):
        state, losses = step(state, batch)
    print("warm loss:", float(losses["loss"]))

    trace_dir = f"/tmp/dskd_trace_{arch}"
    jax.profiler.start_trace(trace_dir)
    for _ in range(2):
        state, losses = step(state, batch)
    _ = float(losses["loss"])           # axon-safe sync (host fetch)
    jax.profiler.stop_trace()
    summarize(trace_dir)


if __name__ == "__main__":
    main()
