#!/usr/bin/env python
"""Per-op trace of the flagship incremental step: capture a jax.profiler
trace on real hardware and print the top ops by total device time.

The chrome-trace json.gz that jax writes is aggregated by (sanitized) op
name, giving the gather/matmul/elementwise split that PERF.md reasons
about without a TensorBoard round-trip.

Usage: python tools/trace_step.py [B] [--iters 3]
"""
import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_step(B):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dskd_tpu.distill.losses import DistillConfig
    from dskd_tpu.models.detector import GFLDeformableDETR
    from dskd_tpu.models.gfl_detr_loss import DetLossConfig
    from dskd_tpu.train.optim import make_optimizer
    from dskd_tpu.train.schedule import step_lr_schedule
    from dskd_tpu.train.state import TrainState
    from dskd_tpu.train.step import Batch, make_train_step

    hw = os.environ.get("BENCH_HW", "640x480")
    H, W = (int(t) for t in hw.split("x"))
    MAXG = int(os.environ.get("BENCH_MAXG", "32"))  # match bench default
    remat = os.environ.get("BENCH_REMAT", "0") == "1"
    model = GFLDeformableDETR(remat=remat)
    det_cfg = DetLossConfig()
    distill_cfg = DistillConfig.from_flags(
        cates_distill="hard + teacher-first",
        feats_distill="corr + fg_info + decode_v1", num_prev=40)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32) * 0.5)
    img_hw = jnp.asarray(np.stack([np.full(B, H),
                                   rng.randint(int(W * 0.78125), W + 1, B)], -1)
                         .astype(np.int32))
    xy = rng.rand(B, MAXG, 2).astype(np.float32) * 400
    wh = rng.rand(B, MAXG, 2).astype(np.float32) * 150 + 20
    batch = Batch(images, img_hw,
                  jnp.asarray(np.concatenate([xy, xy + wh], -1)),
                  jnp.asarray(rng.randint(40, 80, (B, MAXG))
                              .astype(np.int32)),
                  jnp.asarray(np.arange(MAXG)[None]
                              < rng.randint(5, 30, (B, 1))))
    variables = model.init(jax.random.PRNGKey(0), images[:1], img_hw[:1])
    teacher_vars = jax.tree.map(jnp.copy, dict(variables))
    tx = make_optimizer(variables["params"],
                        step_lr_schedule(2e-4, iters_per_epoch=1000))
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}), tx,
                              jax.random.PRNGKey(1))
    # donate=True: at no-remat B=4 the donate-less program needs 20.3G HBM
    # and cannot compile — the trace loop carries the state forward
    step = make_train_step(model, det_cfg, distill_cfg, use_dropout=True,
                           donate=True, compute_dtype=jnp.bfloat16)
    return step, state, batch, teacher_vars


def summarize(trace_dir, top=30, detail=20):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True) + glob.glob(
        os.path.join(trace_dir, "**", "trace.json.gz"), recursive=True)
    assert paths, f"no trace json under {trace_dir}"
    with gzip.open(sorted(paths)[-1], "rt") as f:
        events = json.load(f).get("traceEvents", [])
    bucket = defaultdict(float)
    inst = defaultdict(lambda: [0.0, 0, ""])   # per op INSTANCE (uid kept)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        # keep device lanes only (XLA op events carry args with long names)
        name = e.get("name", "")
        if name.startswith(("process_", "Steal", "thread")):
            continue
        key = re.sub(r"[.\d]+$", "", name)        # strip op uid suffixes
        bucket[key] += e["dur"]
        total += e["dur"]
        args = e.get("args") or {}
        long = args.get("long_name") or args.get("hlo_op") or ""
        rec = inst[name]
        rec[0] += e["dur"]
        rec[1] += 1
        if long and not rec[2]:
            rec[2] = long
    rows = sorted(bucket.items(), key=lambda kv: -kv[1])[:top]
    print(f"{'op':60s} {'ms':>10} {'%':>6}")
    for k, v in rows:
        print(f"{k[:60]:60s} {v / 1000:10.1f} {100 * v / total:6.1f}")
    # top individual op instances with their HLO long names (shapes) —
    # the bucket view can't say WHICH copy/reshape/fusion dominates
    print(f"\n-- top {detail} op instances --")
    top_inst = sorted(inst.items(), key=lambda kv: -kv[1][0])[:detail]
    for name, (dur, n, long) in top_inst:
        print(f"{name:40s} {dur / 1000:9.1f} ms  x{n}")
        if long:
            print(f"    {long[:240]}")


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    import jax

    step, state, batch, teacher_vars = build_step(B)
    # compile + warm
    for _ in range(2):
        state, losses = step(state, batch, teacher_vars)
    print("warm loss:", float(losses["loss"]))

    trace_dir = "/tmp/dskd_trace"
    jax.profiler.start_trace(trace_dir)
    for _ in range(2):
        state, losses = step(state, batch, teacher_vars)
    _ = float(losses["loss"])          # axon-safe sync (host fetch)
    jax.profiler.stop_trace()
    summarize(trace_dir)


if __name__ == "__main__":
    main()
