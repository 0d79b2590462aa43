#!/usr/bin/env python
"""Phase breakdown of the flagship incremental step on real hardware.

Axon-safe timing: block_until_ready does not synchronize through the axon
tunnel (see PERF.md), so every measurement closes with a host fetch of a
scalar reduced from the outputs.

Usage: python tools/profile_step.py [B]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from dskd_tpu.distill.losses import DistillConfig, distill_losses
from dskd_tpu.distill.teacher import merge_teacher_gt
from dskd_tpu.models.detector import GFLDeformableDETR
from dskd_tpu.models.gfl_detr_loss import DetLossConfig, detection_loss
from dskd_tpu.train.optim import make_optimizer
from dskd_tpu.train.schedule import step_lr_schedule
from dskd_tpu.train.state import TrainState
from dskd_tpu.train.step import (Batch, compute_losses, make_train_step,
                                 parse_losses, teacher_info)


def fetch(x):
    """Force device completion via host readback."""
    leaves = [l for l in jax.tree.leaves(x)
              if hasattr(l, "dtype") and jnp.issubdtype(l.dtype,
                                                        jnp.floating)]
    return float(sum(jnp.ravel(l)[0].astype(jnp.float32) for l in leaves))


def timeit(name, fn, *args, iters=5):
    fetch(fn(*args))                       # compile + warm
    fetch(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fetch(out)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:44s} {dt:9.1f} ms")
    return dt


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    H, W, MAXG = 640, 640, 100
    dtype = jnp.bfloat16
    remat = os.environ.get("BENCH_REMAT", "0") == "1"
    model = GFLDeformableDETR(remat=remat)
    det_cfg = DetLossConfig()
    distill_cfg = DistillConfig.from_flags(
        cates_distill="hard + teacher-first",
        feats_distill="corr + fg_info + decode_v1", num_prev=40)

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32) * 0.5)
    img_hw = jnp.asarray(
        np.stack([np.full(B, H), rng.randint(500, W + 1, B)], -1)
        .astype(np.int32))
    xy = rng.rand(B, MAXG, 2).astype(np.float32) * 400
    wh = rng.rand(B, MAXG, 2).astype(np.float32) * 150 + 20
    batch = Batch(images, img_hw,
                  jnp.asarray(np.concatenate([xy, xy + wh], -1)),
                  jnp.asarray(rng.randint(40, 80, (B, MAXG))
                              .astype(np.int32)),
                  jnp.asarray(np.arange(MAXG)[None] < rng.randint(
                      5, 30, (B, 1))))

    variables = model.init(jax.random.PRNGKey(0), images[:1], img_hw[:1])
    teacher_vars = jax.tree.map(jnp.copy, dict(variables))
    tx = make_optimizer(variables["params"],
                        step_lr_schedule(2e-4, iters_per_epoch=1000))
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}), tx,
                              jax.random.PRNGKey(1))

    def cast(tree):
        return jax.tree.map(
            lambda x: x.astype(dtype)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x, tree)

    vars_bf16 = cast(dict(variables))
    imgs_bf16 = images.astype(dtype)

    # 1. student forward only (no remat effect outside grad)
    fwd = jax.jit(lambda v, im, hw: model.apply(v, im, hw,
                                                deterministic=True))
    timeit("student forward (bf16)", fwd, vars_bf16, imgs_bf16, img_hw)

    # 2. teacher forward + out_teacher decode
    tinfo_fn = jax.jit(lambda tv, b: teacher_info(
        model, tv, b, det_cfg, 0.3, 100, compute_dtype=dtype))
    timeit("teacher forward + out_teacher", tinfo_fn, teacher_vars, batch)

    # 3. forward + detection loss (no grad)
    def fwd_det(v, b):
        out = model.apply(cast(v), b.images.astype(dtype), b.img_hw,
                          deterministic=True)
        out = jax.tree.map(
            lambda x: x.astype(jnp.float32)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x, out)
        losses, _ = detection_loss(out.head.cls_scores, out.head.bbox_preds,
                                   b.gt_bboxes, b.gt_labels, b.gt_valid,
                                   b.img_hw, det_cfg)
        return parse_losses(losses)
    timeit("student fwd + det loss (no grad)", jax.jit(fwd_det),
           dict(variables), batch)

    # 4. all losses incl. teacher + distills (no grad)
    def all_losses(v, tv, b):
        losses = compute_losses(model, v, b, det_cfg, tv, distill_cfg,
                                compute_dtype=dtype)
        return parse_losses(losses)
    timeit("teacher + student + all losses (no grad)",
           jax.jit(all_losses), dict(variables), teacher_vars, batch)

    # 5. full train step (grad + AdamW). donate=True is REQUIRED here:
    # without remat, B=4 with donate=False needs 20.3G HBM (double-buffered
    # state) and fails to compile — donation is load-bearing, so the timing
    # loop carries the returned state forward like real training does.
    step = make_train_step(model, det_cfg, distill_cfg, use_dropout=False,
                           donate=True, compute_dtype=dtype)
    s = state
    for _ in range(2):                      # compile + warm
        s, losses = step(s, batch, teacher_vars)
    fetch(losses["loss"])
    t0 = time.perf_counter()
    for _ in range(5):
        s, losses = step(s, batch, teacher_vars)
    fetch(losses["loss"])
    dt = (time.perf_counter() - t0) / 5 * 1000
    print(f"{'FULL train step (grad + optimizer, donated)':44s} "
          f"{dt:9.1f} ms")

    # 6. detection-loss-only grad (isolates matcher+loss backward)
    def det_grad(params, b):
        def f(p):
            out = model.apply(cast({"params": p}), b.images.astype(dtype),
                              b.img_hw, deterministic=True)
            out = jax.tree.map(
                lambda x: x.astype(jnp.float32)
                if hasattr(x, "dtype")
                and jnp.issubdtype(x.dtype, jnp.floating) else x, out)
            losses, _ = detection_loss(
                out.head.cls_scores, out.head.bbox_preds, b.gt_bboxes,
                b.gt_labels, b.gt_valid, b.img_hw, det_cfg)
            return parse_losses(losses)
        return jax.grad(f)(params)
    timeit("fwd+bwd detection only (no teacher/distill)",
           jax.jit(det_grad), variables["params"], batch)


if __name__ == "__main__":
    main()
