#!/usr/bin/env python
"""A/B: JV (exact) vs auction (approximate) Hungarian matcher in training.

VERDICT weak #9: near-optimality on random costs was tested, but nothing
checked that swapping JV -> auction preserves optimization. This script
trains the same tiny GFL-DeformableDETR from the same init on the same
synthetic stream under both solvers and prints the loss trajectories plus
the auction fallback counter.

Usage: python tools/ab_matcher.py [steps] (CPU-friendly tiny shapes)
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# force CPU BEFORE backend init: the axon sitecustomize force-selects the
# tpu platform via jax.config, which wins over the JAX_PLATFORMS env var
# (see .claude/skills/verify/SKILL.md) — this tool must not contend with
# benchmarks for the real chip
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def run(solver: str, steps: int):
    import jax
    import jax.numpy as jnp

    from dskd_tpu.models.detector import GFLDeformableDETR
    from dskd_tpu.models.gfl_detr_loss import DetLossConfig
    from dskd_tpu.train.optim import make_optimizer
    from dskd_tpu.train.schedule import step_lr_schedule
    from dskd_tpu.train.state import TrainState
    from dskd_tpu.train.step import Batch, make_train_step

    B, H, W, G = 2, 128, 128, 8
    model = GFLDeformableDETR(num_encoder_layers=2, num_decoder_layers=2,
                              num_query=60, depth=18)
    det_cfg = DetLossConfig(matcher=solver)

    rng = np.random.RandomState(0)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, H, W, 3)),
                           jnp.asarray([[H, W]], jnp.int32))
    tx = make_optimizer(variables["params"],
                        step_lr_schedule(1e-4, iters_per_epoch=1000))
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}), tx,
                              jax.random.PRNGKey(1))
    step = make_train_step(model, det_cfg, None, use_dropout=False,
                           donate=False)

    losses_out = []
    fallbacks = 0
    for it in range(steps):
        r = np.random.RandomState(100 + it)
        images = jnp.asarray(r.randn(B, H, W, 3).astype(np.float32) * 0.3)
        xy = r.rand(B, G, 2).astype(np.float32) * 80
        wh = r.rand(B, G, 2).astype(np.float32) * 30 + 10
        batch = Batch(images, jnp.asarray(np.full((B, 2), H, np.int32)),
                      jnp.asarray(np.concatenate([xy, xy + wh], -1)),
                      jnp.asarray(r.randint(0, 4, (B, G)).astype(np.int32)),
                      jnp.asarray(np.ones((B, G), bool)))
        state, losses = step(state, batch, None)
        losses_out.append(float(losses["loss"]))
        fallbacks += int(losses.get("auction_fallback", 0.0))
    return losses_out, fallbacks


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    jv, _ = run("jv", steps)
    auc, n_fb = run("auction", steps)
    k = max(1, steps // 8)
    print(f"{'step':>6} {'jv':>9} {'auction':>9}")
    for i in range(0, steps, k):
        print(f"{i:>6} {jv[i]:>9.4f} {auc[i]:>9.4f}")
    jv_tail = float(np.mean(jv[-5:]))
    auc_tail = float(np.mean(auc[-5:]))
    print(f"final(mean last 5): jv={jv_tail:.4f} auction={auc_tail:.4f} "
          f"ratio={auc_tail / jv_tail:.4f} auction_fallback_rows={n_fb}")


if __name__ == "__main__":
    main()
