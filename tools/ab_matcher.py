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


NUM_CLS = 4
PALETTE = np.array([[1.5, -1.5, -1.5], [-1.5, 1.5, -1.5],
                    [-1.5, -1.5, 1.5], [1.5, 1.5, -1.5]], np.float32)


def _synth_batch(seed, B, H, W, G):
    """LEARNABLE synthetic detection data: each GT box is painted into the
    noise canvas with a class-specific color, so synthetic mAP is a real
    optimization-quality signal (not noise-floor zero)."""
    r = np.random.RandomState(seed)
    images = r.randn(B, H, W, 3).astype(np.float32) * 0.3
    xy = r.rand(B, G, 2).astype(np.float32) * (W - 48)
    wh = r.rand(B, G, 2).astype(np.float32) * 30 + 12
    boxes = np.concatenate([xy, xy + wh], -1)
    labels = r.randint(0, NUM_CLS, (B, G)).astype(np.int32)
    for b in range(B):
        for g in range(G):
            x0, y0, x1, y1 = boxes[b, g].astype(int)
            images[b, y0:y1, x0:x1] = (
                PALETTE[labels[b, g]]
                + r.randn(max(y1 - y0, 0), max(x1 - x0, 0), 3) * 0.2)
    return images, boxes, labels


def _synth_map(model, variables, n_images, H, W, G):
    """VOC mAP@0.5 on a held-out painted-box eval set."""
    import jax
    import jax.numpy as jnp

    from dskd_tpu.eval.mean_ap import eval_map
    from dskd_tpu.models.gfl_detr_head import get_bboxes

    dets, anns = [], []
    for i in range(n_images):
        images, boxes, labels = _synth_batch(10_000 + i, 1, H, W, G)
        out = model.apply(variables, jnp.asarray(images),
                          jnp.asarray([[H, W]], jnp.int32),
                          deterministic=True)
        d = get_bboxes(out.head.cls_scores[-1], out.head.bbox_preds[-1],
                       jnp.asarray([[H, W]], jnp.int32), score_thr=0.0,
                       max_per_img=20)
        bb = np.asarray(d.bboxes[0])
        sc = np.asarray(d.scores[0])
        lb = np.asarray(d.labels[0])
        va = np.asarray(d.valid[0])
        per_cls = [np.concatenate(
            [bb[va & (lb == c)], sc[va & (lb == c), None]], -1)
            for c in range(NUM_CLS)]
        dets.append(per_cls)
        anns.append(dict(bboxes=boxes[0], labels=labels[0]))
    m, _ = eval_map(dets, anns, iou_thr=0.5)
    return float(m)


def run(solver: str, steps: int, eps_inv=None, with_map: bool = False):
    """One training run; eps_inv sets DSKD_AUCTION_EPS (1/eps_frac)."""
    import jax
    import jax.numpy as jnp

    from dskd_tpu.models.detector import GFLDeformableDETR
    from dskd_tpu.models.gfl_detr_loss import DetLossConfig
    from dskd_tpu.train.optim import make_optimizer
    from dskd_tpu.train.schedule import step_lr_schedule
    from dskd_tpu.train.state import TrainState
    from dskd_tpu.train.step import Batch, make_train_step

    if eps_inv is not None:
        os.environ["DSKD_AUCTION_EPS"] = str(eps_inv)
    else:
        os.environ.pop("DSKD_AUCTION_EPS", None)

    B, H, W, G = 2, 128, 128, 8
    model = GFLDeformableDETR(num_encoder_layers=2, num_decoder_layers=2,
                              num_query=60, depth=18)
    det_cfg = DetLossConfig(matcher=solver, num_classes=NUM_CLS)

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
        images, boxes, labels = _synth_batch(100 + it, B, H, W, G)
        batch = Batch(jnp.asarray(images),
                      jnp.asarray(np.full((B, 2), H, np.int32)),
                      jnp.asarray(boxes), jnp.asarray(labels),
                      jnp.asarray(np.ones((B, G), bool)))
        state, losses = step(state, batch, None)
        losses_out.append(float(losses["loss"]))
        fallbacks += int(losses.get("auction_fallback", 0.0))
    m = None
    if with_map:
        m = _synth_map(model, {"params": state.params,
                               "batch_stats": state.batch_stats},
                       16, H, W, G)
    return losses_out, fallbacks, m


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    sweep = "--sweep" in sys.argv
    if sweep:
        # long-horizon A/B with synthetic mAP: JV vs auction eps ladder
        rows = [("jv", None)] + [("auction", e) for e in (400, 200, 100)]
        print(f"{'solver':>8} {'eps':>6} {'final_loss':>11} "
              f"{'mAP@0.5':>8} {'fallback':>9}")
        results = {}
        for solver, eps in rows:
            losses, n_fb, m = run(solver, steps, eps_inv=eps,
                                  with_map=True)
            tail = float(np.mean(losses[-10:]))
            results[(solver, eps)] = (tail, m, n_fb)
            print(f"{solver:>8} {eps if eps else '-':>6} {tail:>11.4f} "
                  f"{m:>8.4f} {n_fb:>9}")
        jv_map = results[("jv", None)][1]
        for (solver, eps), (_, m, n_fb) in results.items():
            if solver == "auction":
                assert abs(m - jv_map) < 0.02 or m > jv_map, \
                    (f"auction eps=1/{eps} mAP {m:.4f} trails JV "
                     f"{jv_map:.4f} by more than 0.02")
        print("sweep OK: every auction eps within 0.02 mAP of JV")
        return
    jv, _, _ = run("jv", steps)
    auc, n_fb, _ = run("auction", steps)
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
