#!/usr/bin/env python
"""GSPMD overhead share of the sharded incremental step (CPU mesh).

Measures the flagship train step (tiny shapes, same program structure as
__graft_entry__.dryrun_multichip) at global batch = N on an N-device
virtual CPU mesh for N in {1, 8}. The N virtual devices SHARE the same
physical cores, so total compute is constant and classic scaling
efficiency is unmeasurable here; what the comparison does expose is the
EXTRA work the 8-way program carries — GSPMD partitioning + grad
all-reduce + loss-sync collectives — as a throughput drop at equal
total compute: ``gspmd_overhead = 1 - (imgs/s at N=8)/(imgs/s at N=1)``.
Recorded in PERF.md as the program-structure datapoint the single-chip
environment can produce (multi-chip hardware unavailable; on real chips
the same collectives ride ICI concurrently with compute, so this is an
upper bound on their cost share).

Usage: python tools/dp_scaling.py [--iters 20]
"""
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def _measure(n_devices: int, iters: int) -> float:
    """Runs in the child: imgs/s at global batch == n_devices."""
    import time

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    sys.path.insert(0, os.path.join(HERE, ".."))
    from dskd_tpu.distill.losses import DistillConfig
    from dskd_tpu.models.detector import GFLDeformableDETR
    from dskd_tpu.models.gfl_detr_loss import DetLossConfig
    from dskd_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from dskd_tpu.train.optim import make_optimizer
    from dskd_tpu.train.schedule import step_lr_schedule
    from dskd_tpu.train.state import TrainState
    from dskd_tpu.train.step import Batch, make_train_step

    devices = jax.devices()[:n_devices]
    mesh = make_mesh(devices)
    B, H, W, G = n_devices, 64, 64, 8
    model = GFLDeformableDETR(num_encoder_layers=1, num_decoder_layers=1,
                              num_query=16, depth=18, num_classes=10)
    det_cfg = DetLossConfig(num_classes=10)
    distill_cfg = DistillConfig.from_flags(
        cates_distill="hard + teacher-first + soft",
        feats_distill="corr + fg_info + decode_v1", num_prev=5)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32) * 0.1)
    img_hw = jnp.asarray(np.tile([[H, W]], (B, 1)).astype(np.int32))
    xy = rng.rand(B, G, 2).astype(np.float32) * 30
    wh = rng.rand(B, G, 2).astype(np.float32) * 20 + 4
    batch = Batch(images, img_hw,
                  jnp.asarray(np.concatenate([xy, xy + wh], -1)),
                  jnp.asarray(rng.randint(0, 10, (B, G)).astype(np.int32)),
                  jnp.asarray(np.tile(np.arange(G) < 4, (B, 1))))
    variables = model.init(jax.random.PRNGKey(0), images[:1], img_hw[:1])
    tx = make_optimizer(variables["params"],
                        step_lr_schedule(2e-4, iters_per_epoch=10))
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}), tx,
                              jax.random.PRNGKey(1))
    state = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), state)
    teacher_vars = replicate(
        {"params": variables["params"],
         "batch_stats": variables.get("batch_stats", {})}, mesh)
    batch = shard_batch(batch, mesh)
    step = make_train_step(model, det_cfg, distill_cfg,
                           teacher_score_thr=-1.0, teacher_max_per_img=8,
                           use_dropout=False, donate=False)
    state, losses = step(state, batch, teacher_vars)
    jax.block_until_ready(losses["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, losses = step(state, batch, teacher_vars)
    jax.block_until_ready(losses["loss"])
    dt = time.perf_counter() - t0
    return B * iters / dt


def main():
    iters = 20
    if "--iters" in sys.argv:
        iters = int(sys.argv[sys.argv.index("--iters") + 1])
    if os.environ.get("_DSKD_DPSCALE_CHILD"):
        n = int(os.environ["_DSKD_DPSCALE_CHILD"])
        print(json.dumps({"n": n, "img_s": _measure(n, iters)}))
        return
    results = {}
    for n in (1, 8):
        env = dict(os.environ)
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                            + f" --xla_force_host_platform_device_count={n}"
                            ).strip()
        env["JAX_PLATFORMS"] = "cpu"
        env["_DSKD_DPSCALE_CHILD"] = str(n)
        out = subprocess.run([sys.executable, os.path.abspath(__file__),
                              "--iters", str(iters)],
                             env=env, capture_output=True, text=True)
        if out.returncode != 0:
            sys.stderr.write(out.stderr)
            raise SystemExit(out.returncode)
        results[n] = json.loads(out.stdout.strip().splitlines()[-1])["img_s"]
    overhead = 1.0 - results[8] / results[1]
    print(json.dumps({"img_s_1dev": round(results[1], 3),
                      "img_s_8dev_sharedcores": round(results[8], 3),
                      "gspmd_overhead_share": round(overhead, 3)}))


if __name__ == "__main__":
    main()
