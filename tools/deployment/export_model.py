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
        from dskd_tpu.train.incremental import build_model
        from dskd_tpu.utils.config import load_config
        cfg = load_config(args.config)
        model = build_model(cfg)
        reg_max = cfg.model.reg_max
    else:
        from dskd_tpu.models.detector import GFLDeformableDETR
        model = GFLDeformableDETR()
        reg_max = 16

    from dskd_tpu.models.gfl_detr_head import get_bboxes

    B, S = args.batch, args.size
    images = jnp.zeros((B, S, S, 3), jnp.float32)
    img_hw = jnp.asarray(np.tile([[S, S]], (B, 1)).astype(np.int32))
    variables = model.init(jax.random.PRNGKey(0), images[:1], img_hw[:1])

    def infer(images, img_hw):
        out = model.apply(variables, images, img_hw, deterministic=True)
        det = get_bboxes(out.head.cls_scores[-1], out.head.bbox_preds[-1],
                         img_hw, reg_max=reg_max, max_per_img=100)
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
