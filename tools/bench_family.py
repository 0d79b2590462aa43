#!/usr/bin/env python
"""Zoo train-step benchmark: time any family's full training step on the
real chip (extends the perf story beyond the flagship's bench.py).

Usage: python tools/bench_family.py [arch] [B] [HxW] [steps]
       (defaults: faster_rcnn 2 800x1344 10; B may be a comma list,
        e.g. "2,4,8" for a batch sweep — one JSON line per B)

Reference datapoint for faster_rcnn: the zoo's metafile records 46.73
ms/im V100 *inference* (configs/faster_rcnn/metafile.yml:53-55); training
has no recorded reference number, so this bench records ours.
Prints one JSON line {"metric", "value", "unit"}.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    arch = sys.argv[1] if len(sys.argv) > 1 else "faster_rcnn"
    b_list = [int(t) for t in
              (sys.argv[2] if len(sys.argv) > 2 else "2").split(",")]
    hw = sys.argv[3] if len(sys.argv) > 3 else "800x1344"
    n_iters = int(sys.argv[4]) if len(sys.argv) > 4 else 10
    H, W = (int(t) for t in hw.split("x"))
    for B in b_list:
        bench_one(arch, B, H, W, n_iters)


def setup(arch, B, H, W):
    """Build (step, state, batch) for a family train-step benchmark —
    shared by bench_one and tools/trace_family.py."""

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     ".jax_compilation_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    import dataclasses

    from dskd_tpu.registry import family_flag
    from dskd_tpu.train.family import make_family_train_step
    from dskd_tpu.train.incremental import build_model
    from dskd_tpu.train.optim import make_optimizer
    from dskd_tpu.train.schedule import step_lr_schedule
    from dskd_tpu.train.state import TrainState
    from dskd_tpu.train.step import Batch
    from dskd_tpu.utils.config import ExperimentConfig

    cfg = ExperimentConfig()
    model_kw = dict(arch=arch, num_classes=80)
    if arch in ("ssd", "pisa_ssd") and H in (300, 320, 512):
        model_kw["ssd_input_size"] = H    # square SSD canvases pick the
        # variant ladder (models/ssd.py SIZE_SPECS)
    cfg.model = dataclasses.replace(cfg.model, **model_kw)
    model = build_model(cfg)

    MAXG = 32
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32) * 0.5)
    img_hw = jnp.asarray(np.stack(
        [np.full(B, H), rng.randint(int(W * 0.9), W + 1, B)], -1)
        .astype(np.int32))
    xy = rng.rand(B, MAXG, 2).astype(np.float32) * 500
    wh = rng.rand(B, MAXG, 2).astype(np.float32) * 200 + 20
    gtb = np.concatenate([xy, xy + wh], -1)
    kw = {}
    masky = family_flag(arch, "with_mask") or arch in (
        "mask_rcnn", "mask_rcnn_seesaw", "ms_rcnn", "cascade_mask_rcnn",
        "htc", "point_rend", "queryinst", "scnet", "maskformer",
        "mask2former", "solo", "yolact", "panoptic_fpn")
    if masky:
        yy, xx = np.mgrid[0:H // 4, 0:W // 4]
        kw["gt_masks"] = jnp.asarray(
            ((yy[None, None] * 4 >= gtb[:, :, 1, None, None])
             & (yy[None, None] * 4 <= gtb[:, :, 3, None, None])
             & (xx[None, None] * 4 >= gtb[:, :, 0, None, None])
             & (xx[None, None] * 4 <= gtb[:, :, 2, None, None]))
            .astype(np.float32))
    if arch in ("panoptic_fpn", "htc", "scnet") \
            or family_flag(arch, "with_semantic"):
        total = 80 + cfg.model.num_stuff_classes
        kw["gt_semantic"] = jnp.asarray(
            rng.randint(0, total, (B, H // 4, W // 4)).astype(np.int32))
    batch = Batch(images, img_hw, jnp.asarray(gtb),
                  jnp.asarray(rng.randint(0, 80, (B, MAXG)).astype(np.int32)),
                  jnp.asarray(np.arange(MAXG)[None] < rng.randint(
                      5, 30, (B, 1))), **kw)

    init_kw = {}
    if hasattr(type(model), "init_all"):
        # two-stage families create the ROI-head params lazily; init_all
        # touches every submodule (models/faster_rcnn.py init_all)
        init_kw["method"] = type(model).init_all
    variables = model.init(jax.random.PRNGKey(0), images[:1], img_hw[:1],
                           **init_kw)
    tx = make_optimizer(variables["params"],
                        step_lr_schedule(2e-2, iters_per_epoch=1000))
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}), tx,
                              jax.random.PRNGKey(1))
    step = make_family_train_step(arch, model, cfg, num_prev=0,
                                  has_teacher=False, use_dropout=False)
    return step, state, batch


def bench_one(arch, B, H, W, n_iters):
    import jax
    import numpy as np
    step, state, batch = setup(arch, B, H, W)

    # MFU denominator: XLA compiled cost analysis of the same program
    # the timing loop runs (VERDICT r4 weak #3 — the flagship-only MFU
    # in bench.py, extended to every zoo family). v5e bf16 peak = 197
    # TFLOP/s; BENCH_PEAK_TFLOPS overrides for other chips.
    step_flops = float("nan")
    try:
        cost = step.lower(state, batch).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        step_flops = float(cost.get("flops", float("nan")))
    except Exception as e:                      # tunnel/backend-dependent
        print(f"bench_family: cost_analysis unavailable ({e!r})",
              file=sys.stderr)

    for _ in range(3):
        state, losses = step(state, batch)
    warm = float(np.asarray(jax.device_get(losses["loss"])))

    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, losses = step(state, batch)
    final = float(np.asarray(jax.device_get(losses["loss"])))
    dt = time.perf_counter() - t0
    assert np.isfinite(final), final
    ms_step = dt / n_iters * 1e3
    print(f"warm loss {warm:.4f} final {final:.4f}", file=sys.stderr)
    out = {
        "metric": f"{arch} train step B={B} {H}x{W}",
        "value": round(ms_step, 1), "unit": "ms/step",
        "img_s": round(B * n_iters / dt, 2)}
    if np.isfinite(step_flops):
        peak = float(os.environ.get("BENCH_PEAK_TFLOPS", "197")) * 1e12
        out["step_tflops"] = round(step_flops / 1e12, 3)
        out["mfu"] = round(step_flops * n_iters / dt / peak, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
