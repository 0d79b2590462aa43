#!/usr/bin/env python
"""Inference throughput benchmark (parity:
tools/analysis_tools/benchmark.py — warmup + synchronized steady-state
timing; here with jax.block_until_ready instead of cuda synchronize).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import argparse
import time


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("config", nargs="?", default=None)
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--iters", type=int, default=200)
    parser.add_argument("--warmup", type=int, default=5)
    parser.add_argument("--size", type=int, default=640)
    parser.add_argument("--dtype", default="f32", choices=("f32", "bf16"))
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dskd_tpu.models.gfl_detr_head import get_bboxes

    if args.config:
        from dskd_tpu.train.incremental import build_model
        from dskd_tpu.utils.config import load_config
        cfg = load_config(args.config)
        model = build_model(cfg)
        reg_max = cfg.model.reg_max
    else:
        from dskd_tpu.models.detector import GFLDeformableDETR
        # inference has no backward: remat wrappers only cost fusion
        model = GFLDeformableDETR(remat=False)
        reg_max = 16

    B, S = args.batch, args.size
    images = jnp.zeros((B, S, S, 3), jnp.float32)
    img_hw = jnp.asarray(np.tile([[S, S]], (B, 1)).astype(np.int32))
    variables = model.init(jax.random.PRNGKey(0), images[:1], img_hw[:1])
    if args.dtype == "bf16":
        cast = lambda t: jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype,
                                                      jnp.floating)
            else x, t)
        variables = cast(variables)
        images = images.astype(jnp.bfloat16)

    @jax.jit
    def infer(images, img_hw):
        out = model.apply(variables, images, img_hw, deterministic=True)
        det = get_bboxes(out.head.cls_scores[-1].astype(jnp.float32),
                         out.head.bbox_preds[-1].astype(jnp.float32),
                         img_hw, reg_max=reg_max, max_per_img=100)
        return det

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
          f"ms/img (bs={B}, {S}x{S})")


if __name__ == "__main__":
    main()
