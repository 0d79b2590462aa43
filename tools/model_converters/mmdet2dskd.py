#!/usr/bin/env python
"""One-command migration from mmdet/DSKD: config + .pth -> dskd_tpu
config + Orbax task checkpoint.

    python tools/model_converters/mmdet2dskd.py MMDET_CFG.py CKPT.pth \
        -o OUT_DIR [--task 0] [--epoch 0]

Steps:
  1. imports MMDET_CFG with full _base_ resolution
     (dskd_tpu/utils/mmdet_config.py) and writes OUT_DIR/config.py;
  2. torch-loads CKPT.pth (checkpoint dict or bare state_dict);
  3. picks the matching weight converter (utils/torch_weights.py —
     flagship GFL-DDETR, RetinaNet, Faster R-CNN, Mask R-CNN; Swin
     backbones load backbone-only with --backbone-only) and
     strict-loads into a freshly initialized model;
  4. saves OUT_DIR/task_{T}_epoch_{E} (Orbax) — directly loadable by
     tools/test.py --work-dir OUT_DIR.

Reference counterpart: none (the reference consumes mmdet checkpoints
natively); this is the bridge its users need when switching.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mmdet_config")
    ap.add_argument("checkpoint")
    ap.add_argument("-o", "--out-dir", required=True)
    ap.add_argument("--task", type=int, default=0)
    ap.add_argument("--epoch", type=int, default=0)
    ap.add_argument("--backbone-only", action="store_true",
                    help="convert only backbone weights (e.g. swin "
                         "checkpoints for families without a full "
                         "converter); the rest keeps fresh init")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")   # conversion is host work
    import torch

    import importlib.util

    from dskd_tpu.utils.mmdet_config import (load_mmdet_config,
                                             mmdet_to_experiment)
    from dskd_tpu.utils.config import load_config
    from dskd_tpu.train.incremental import build_model, init_variables
    from dskd_tpu.train import checkpoint as ckpt_lib
    from dskd_tpu.utils import torch_weights as tw

    spec_mod = importlib.util.spec_from_file_location(
        "import_mmdet_config",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "..", "misc", "import_mmdet_config.py"))
    importer = importlib.util.module_from_spec(spec_mod)
    spec_mod.loader.exec_module(importer)

    os.makedirs(args.out_dir, exist_ok=True)
    cfg_out = os.path.join(args.out_dir, "config.py")
    exp, ignored = mmdet_to_experiment(load_mmdet_config(args.mmdet_config))
    if not exp.model.arch:
        raise SystemExit("no family mapping for this mmdet model type")
    with open(cfg_out, "w") as f:
        f.write(importer.emit_module(exp, args.mmdet_config))
    for k in ignored:
        print(f"[mmdet2dskd] not carried over: {k}")
    cfg = load_config(cfg_out)
    print(f"[mmdet2dskd] imported config -> {cfg_out} "
          f"(arch={cfg.model.arch})")

    blob = torch.load(args.checkpoint, map_location="cpu")
    state = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    state = {k: v for k, v in state.items() if not k.startswith("ema_")}

    model = build_model(cfg)
    variables = init_variables(model, cfg, jax.random.PRNGKey(0))
    variables = dict(variables)

    arch = cfg.model.arch
    if args.backbone_only:
        spec = cfg.model.backbone
        if not spec.startswith("swin"):
            raise SystemExit(f"--backbone-only supports swin specs, "
                             f"got {spec!r}")
        from dskd_tpu.models.swin import SwinTransformer  # noqa: F401
        sub = dict(variables)
        bb = variables["params"]["backbone"]
        loaded = tw.load_mmdet_swin_state_dict(
            {"params": bb}, state,
            arch=spec.split("_", 1)[1] if "_" in spec else "tiny",
            strict=True)
        variables["params"] = dict(variables["params"])
        variables["params"]["backbone"] = loaded["params"]
        converted = "swin backbone"
    elif arch in ("gfl_deformable_detr", "deformable_detr_il"):
        variables = tw.load_mmdet_state_dict(
            variables, state, depth=cfg.model.depth, strict=True)
        converted = "GFL-DDETR (full)"
    elif arch == "retinanet":
        variables = tw.load_mmdet_retinanet_state_dict(
            variables, state, depth=cfg.model.depth, strict=True)
        converted = "RetinaNet (full)"
    elif arch == "faster_rcnn":
        variables = tw.load_mmdet_faster_rcnn_state_dict(
            variables, state, depth=cfg.model.depth, strict=True)
        converted = "Faster R-CNN (full)"
    elif arch == "mask_rcnn":
        variables = tw.load_mmdet_mask_rcnn_state_dict(
            variables, state, depth=cfg.model.depth, strict=True)
        converted = "Mask R-CNN (full)"
    elif arch in ("gfl", "ld"):
        variables = tw.load_mmdet_gfl_state_dict(
            variables, state, depth=cfg.model.depth, strict=True)
        converted = "GFL (full)"
    elif arch == "detr":
        variables = tw.load_mmdet_detr_state_dict(
            variables, state, depth=cfg.model.depth, strict=True)
        converted = "DETR (full)"
    elif arch == "yolof":
        variables = tw.load_mmdet_yolof_state_dict(
            variables, state, depth=cfg.model.depth, strict=True)
        converted = "YOLOF (full)"
    else:
        raise SystemExit(
            f"no weight converter for arch {arch!r} yet — supported: "
            f"gfl_deformable_detr/deformable_detr_il, retinanet, "
            f"faster_rcnn, mask_rcnn, gfl/ld, detr, yolof, or --backbone-only for swin "
            f"backbones. The imported config at {cfg_out} still works "
            f"for from-scratch training.")

    class _State:
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        opt_state = ()
        step = 0

    ckpt_lib.save_checkpoint(args.out_dir, args.task, args.epoch, _State)
    print(f"[mmdet2dskd] converted {converted}; saved "
          f"{args.out_dir}/task_{args.task}_epoch_{args.epoch}")


if __name__ == "__main__":
    main()
