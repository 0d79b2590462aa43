#!/usr/bin/env python
"""Model FLOPs/params report (parity: tools/analysis_tools/get_flops.py).

TPU-native: uses XLA's compiled cost analysis instead of per-module hooks —
the reported FLOPs are what the compiler actually scheduled.
"""
import argparse


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("config", nargs="?", default=None)
    parser.add_argument("--shape", type=int, nargs=2, default=[640, 640])
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.config:
        from dskd_tpu.train.incremental import build_model
        from dskd_tpu.utils.config import load_config
        model = build_model(load_config(args.config))
    else:
        from dskd_tpu.models.detector import GFLDeformableDETR
        model = GFLDeformableDETR()

    H, W = args.shape
    images = jnp.zeros((1, H, W, 3), jnp.float32)
    img_hw = jnp.asarray(np.array([[H, W]], np.int32))
    variables = model.init(jax.random.PRNGKey(0), images, img_hw)
    n_params = sum(x.size for x in jax.tree.leaves(variables["params"]))

    def fwd(images, img_hw):
        out = model.apply(variables, images, img_hw, deterministic=True)
        return out.head.cls_scores, out.head.bbox_preds

    compiled = jax.jit(fwd).lower(images, img_hw).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = cost.get("flops", float("nan"))
    print(f"Input shape: (1, {H}, {W}, 3)")
    print(f"Params: {n_params / 1e6:.2f} M")
    print(f"FLOPs (XLA compiled): {flops / 1e9:.2f} GFLOPs")
    print(f"Bytes accessed: {cost.get('bytes accessed', float('nan')) / 1e9:.2f} GB")


if __name__ == "__main__":
    main()
