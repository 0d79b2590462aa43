#!/usr/bin/env python
"""Per-op trace of any family's dispatched EVAL step (the deployed
inference program benchmark.py times): capture a jax.profiler trace on
real hardware and print the top ops by total device time, aggregated
like tools/trace_step.py.

Usage: python tools/trace_eval.py CONFIG [--size 800x1344] [--dtype bf16]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
from trace_step import summarize  # noqa: E402  (same aggregation)
from benchmark import parse_size  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("config")
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--size", default="800x1344")
    parser.add_argument("--dtype", default="f32", choices=("f32", "bf16"))
    parser.add_argument("--iters", type=int, default=3)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dskd_tpu.eval.evaluator import make_eval_step
    from dskd_tpu.train.incremental import build_model, init_variables
    from dskd_tpu.utils.config import load_config

    cfg = load_config(args.config)
    model = build_model(cfg)
    B, (H, W) = args.batch, parse_size(args.size)
    images = jnp.zeros((B, H, W, 3), jnp.float32)
    img_hw = jnp.asarray(np.tile([[H, W]], (B, 1)).astype(np.int32))
    variables = init_variables(model, cfg, jax.random.PRNGKey(0))
    if args.dtype == "bf16":
        variables = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x, variables)
        images = images.astype(jnp.bfloat16)
    eval_step = make_eval_step(model, reg_max=cfg.model.reg_max,
                               max_per_img=100, arch=cfg.model.arch)
    sf = jnp.ones((B, 4), jnp.float32)

    det = eval_step(variables, images, img_hw, sf)     # compile + warm
    float(jnp.asarray(det.scores).ravel()[0])          # tunnel sync

    trace_dir = "/tmp/dskd_eval_trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for _ in range(args.iters):
            det = eval_step(variables, images, img_hw, sf)
        float(jnp.asarray(det.scores).ravel()[0])
    summarize(trace_dir)


if __name__ == "__main__":
    main()
