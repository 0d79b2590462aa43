"""FPG neck: grid wiring, skip staircase, family step."""
import jax
import jax.numpy as jnp
import numpy as np

from dskd_tpu.models.fpg import FPG


def test_fpg_shapes_and_skip_staircase():
    rng = np.random.RandomState(0)
    feats = [jnp.asarray(rng.randn(1, 32 // (2 ** i), 32 // (2 ** i),
                                   8 * (2 ** i)).astype(np.float32))
             for i in range(4)]
    m = FPG(out_channels=16, num_outs=5, stack_times=9)
    v = m.init(jax.random.PRNGKey(0), feats)
    outs = m.apply(v, feats)
    assert len(outs) == 5
    assert outs[0].shape == (1, 32, 32, 16)
    assert outs[4].shape == (1, 2, 2, 16)
    p = v["params"]
    # skip staircase: level 0 is frozen for the first 4 stacks
    assert "s0_l0_lateral" not in p and "s4_l0_lateral" in p
    # level 4 updates every stack
    assert "s0_l4_lateral" in p
    # level 0 has no same_up (bottom of the bu path)
    assert not any(k.endswith("l0_same_up") for k in p)


def test_retinanet_fpg_family_step():
    from dskd_tpu.models.retinanet import RetinaNet
    from dskd_tpu.train.family import make_family_train_step
    from dskd_tpu.train.optim import make_optimizer
    from dskd_tpu.train.state import TrainState
    from dskd_tpu.train.step import Batch
    from dskd_tpu.utils.config import (DistillFlags, ExperimentConfig,
                                       ModelConfig)

    rng = np.random.RandomState(0)
    B, HW, G, NC = 1, 64, 3, 5
    images = jnp.asarray(rng.randn(B, HW, HW, 3).astype(np.float32) * 0.2)
    img_hw = jnp.asarray(np.tile([[HW, HW]], (B, 1)).astype(np.int32))
    xy = rng.rand(B, G, 2).astype(np.float32) * 20
    wh = rng.rand(B, G, 2).astype(np.float32) * 25 + 10
    batch = Batch(images, img_hw,
                  jnp.asarray(np.concatenate([xy, xy + wh], -1)),
                  jnp.asarray(rng.randint(0, NC, (B, G)).astype(np.int32)),
                  jnp.asarray(np.tile(np.arange(G) < 2, (B, 1))))
    model = RetinaNet(num_classes=NC, depth=18, neck="fpg")
    cfg = ExperimentConfig(
        model=ModelConfig(arch="retinanet_fpg", num_classes=NC),
        distill=DistillFlags(cates_distill="", feats_distill=""))
    v = model.init(jax.random.PRNGKey(0), batch.images, batch.img_hw)
    assert any("s8_l4_lateral" in str(k) for k in v["params"]["neck"])
    tx = make_optimizer(v["params"], lambda i: 1e-4)
    state = TrainState.create(v["params"], v.get("batch_stats", {}), tx,
                              jax.random.PRNGKey(1))
    step = make_family_train_step("retinanet_fpg", model, cfg, num_prev=0,
                                  has_teacher=False, use_dropout=False)
    _, losses = step(state, batch)
    assert np.isfinite(float(losses["loss"]))
