#!/usr/bin/env python
"""Model export for serving (the reference's pytorch2onnx analog).

TPU-native: serializes the jitted inference function with jax.export
(StableHLO) — loadable from any JAX process (and XLA-compatible runtimes)
without the python model code.
"""
import argparse


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("config", nargs="?", default=None)
    parser.add_argument("--out", default="model.stablehlo")
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--size", type=int, default=640)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import export as jexport

    if args.config:
        from dskd_tpu.train.incremental import build_model, init_variables
        from dskd_tpu.utils.config import load_config
        cfg = load_config(args.config)
        model = build_model(cfg)
        arch = cfg.model.arch
        reg_max = cfg.model.reg_max
    else:
        from dskd_tpu.models.detector import GFLDeformableDETR
        from dskd_tpu.utils.config import ExperimentConfig
        cfg = ExperimentConfig()
        model = GFLDeformableDETR()
        arch = "gfl_deformable_detr"
        reg_max = 16

    B, S = args.batch, args.size
    images = jnp.zeros((B, S, S, 3), jnp.float32)
    img_hw = jnp.asarray(np.tile([[S, S]], (B, 1)).astype(np.int32))
    if args.config:
        variables = init_variables(model, cfg, jax.random.PRNGKey(0))
    else:
        variables = model.init(jax.random.PRNGKey(0), images[:1],
                               img_hw[:1])

    # the family-dispatched eval step IS the inference program — every
    # driveable arch exports through the same surface
    from dskd_tpu.eval.evaluator import make_eval_step
    eval_step = make_eval_step(model, reg_max=reg_max, max_per_img=100,
                               arch=arch)
    sf = jnp.ones((B, 4), jnp.float32)

    def infer(images, img_hw):
        det = eval_step(variables, images, img_hw, sf)
        return det.bboxes, det.scores, det.labels, det.valid

    exported = jexport.export(jax.jit(infer))(images, img_hw)
    blob = exported.serialize()
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"exported {len(blob) / 1e6:.1f} MB to {args.out}")
    # round-trip check
    reloaded = jexport.deserialize(blob)
    outs = reloaded.call(images, img_hw)
    print("reload OK:", [o.shape for o in outs])


if __name__ == "__main__":
    main()
