#!/usr/bin/env python
"""Inference throughput benchmark (parity:
tools/analysis_tools/benchmark.py — warmup + synchronized steady-state
timing; here synchronized by a host scalar fetch, which — unlike
block_until_ready — drains the axon tunnel's dispatch queue).

Any driveable config benches through the same family-dispatched eval
step the evaluator and the StableHLO exporter use, so the timed program
IS the deployed inference program (model forward + decode + NMS).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import argparse
import time


def parse_size(s: str):
    """'640' -> (640, 640); '800x1344' -> (800, 1344) as (H, W)."""
    if "x" in s:
        h, w = s.split("x")
        return int(h), int(w)
    return int(s), int(s)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("config", nargs="?", default=None)
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--iters", type=int, default=200)
    parser.add_argument("--warmup", type=int, default=5)
    parser.add_argument("--size", default="640",
                        help="square int or HxW (e.g. 800x1344)")
    parser.add_argument("--dtype", default="f32",
                        choices=("f32", "bf16", "int8"))
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.config:
        from dskd_tpu.train.incremental import build_model, init_variables
        from dskd_tpu.utils.config import load_config
        cfg = load_config(args.config)
        model = build_model(cfg)
        arch = cfg.model.arch
        reg_max = cfg.model.reg_max
    else:
        from dskd_tpu.models.detector import GFLDeformableDETR
        # inference has no backward: remat wrappers only cost fusion
        model = GFLDeformableDETR(remat=False)
        arch = "gfl_deformable_detr"
        reg_max = 16

    B, (H, W) = args.batch, parse_size(args.size)
    images = jnp.zeros((B, H, W, 3), jnp.float32)
    img_hw = jnp.asarray(np.tile([[H, W]], (B, 1)).astype(np.int32))
    if args.config:
        variables = init_variables(model, cfg, jax.random.PRNGKey(0))
    else:
        variables = model.init(jax.random.PRNGKey(0), images[:1],
                               img_hw[:1])
    if args.dtype in ("bf16", "int8"):
        # int8 rides a bf16 base: big Dense/Conv run s8 x s8 -> s32 on
        # the MXU (2x bf16 peak), everything else stays bf16
        cast = lambda t: jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype,
                                                      jnp.floating)
            else x, t)
        variables = cast(variables)
        images = images.astype(jnp.bfloat16)

    from dskd_tpu.eval.evaluator import make_eval_step
    eval_step = make_eval_step(model, reg_max=reg_max, max_per_img=100,
                               arch=arch)
    sf = jnp.ones((B, 4), jnp.float32)

    if args.dtype == "int8":
        import flax.linen as nn

        from dskd_tpu.ops.int8 import make_int8_interceptor
        interceptor = make_int8_interceptor(variables["params"])

        def infer(images, img_hw):
            # interception happens at trace time (first call compiles the
            # int8 program); keeping every call in-context is free after
            with nn.intercept_methods(interceptor):
                return eval_step(variables, images, img_hw, sf)
    else:
        def infer(images, img_hw):
            return eval_step(variables, images, img_hw, sf)

    def sync(det):
        # block_until_ready does NOT sync through the axon tunnel
        # (PERF.md measurement traps) — fetch a host scalar instead
        return float(jnp.asarray(det.scores).ravel()[0])

    for _ in range(args.warmup):
        det = infer(images, img_hw)
    sync(det)

    t0 = time.perf_counter()
    for _ in range(args.iters):
        det = infer(images, img_hw)
    sync(det)
    dt = time.perf_counter() - t0
    fps = args.iters * B / dt
    print(f"Overall fps: {fps:.1f} img/s, {1000 * dt / args.iters / B:.2f} "
          f"ms/img (bs={B}, {H}x{W}, {arch}, {args.dtype})")


if __name__ == "__main__":
    main()
