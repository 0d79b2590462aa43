"""Tensor parallelism: (data, model) mesh train step == DP-only step."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from dskd_tpu.models.detector import GFLDeformableDETR
from dskd_tpu.models.gfl_detr_loss import DetLossConfig
from dskd_tpu.parallel.mesh import make_mesh, shard_batch
from dskd_tpu.parallel.tp import (DEFAULT_TP_RULES, make_2d_mesh,
                                  shard_state_tp, tp_pspecs)
from dskd_tpu.train.optim import make_optimizer
from dskd_tpu.train.schedule import step_lr_schedule
from dskd_tpu.train.state import TrainState
from dskd_tpu.train.step import Batch, make_train_step


def _setup():
    B, H, W, G = 4, 64, 64, 6
    model = GFLDeformableDETR(num_encoder_layers=1, num_decoder_layers=1,
                              num_query=16, depth=18, num_classes=10)
    det_cfg = DetLossConfig(num_classes=10)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32) * 0.1)
    img_hw = jnp.asarray(np.tile([[H, W]], (B, 1)).astype(np.int32))
    xy = rng.rand(B, G, 2).astype(np.float32) * 30
    wh = rng.rand(B, G, 2).astype(np.float32) * 20 + 4
    batch = Batch(images, img_hw,
                  jnp.asarray(np.concatenate([xy, xy + wh], -1)),
                  jnp.asarray(rng.randint(0, 10, (B, G)).astype(np.int32)),
                  jnp.asarray(np.tile(np.arange(G) < 3, (B, 1))))
    variables = model.init(jax.random.PRNGKey(0), images[:1], img_hw[:1])
    tx = make_optimizer(variables["params"],
                        step_lr_schedule(2e-4, iters_per_epoch=10))

    def fresh_state():
        return TrainState.create(
            jax.tree.map(jnp.copy, variables["params"]),
            jax.tree.map(jnp.copy, variables.get("batch_stats", {})), tx,
            jax.random.PRNGKey(1))

    step = make_train_step(model, det_cfg, None, use_dropout=False,
                           donate=False)
    return fresh_state, batch, step


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 CPU devices")
def test_tp_matches_dp():
    fresh_state, batch, step = _setup()

    # reference run: pure DP over 4 devices
    dp_mesh = make_mesh(jax.devices()[:4])
    state = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(dp_mesh, P())),
        fresh_state())
    s1, losses_dp = step(state, shard_batch(batch, dp_mesh), None)

    # TP run: (data=2, model=4) mesh, Megatron-sharded transformer
    mesh2 = make_2d_mesh(2, 4)
    state2 = shard_state_tp(fresh_state(), mesh2)
    batch2 = shard_batch(batch, mesh2)      # leading axis on 'data'
    s2, losses_tp = step(state2, batch2, None)

    np.testing.assert_allclose(float(losses_dp["loss"]),
                               float(losses_tp["loss"]), rtol=2e-4)
    # params actually sharded as requested, and still so after the update
    specs = tp_pspecs(s2.params)
    flat_p = jax.tree_util.tree_leaves_with_path(s2.params)
    flat_s = jax.tree.leaves(specs, is_leaf=lambda x: isinstance(x, P))
    n_sharded = 0
    def norm(s):
        t = tuple(s)
        while t and t[-1] is None:
            t = t[:-1]
        return t

    for (path, leaf), spec in zip(flat_p, flat_s):
        if spec != P():
            assert norm(leaf.sharding.spec) == norm(spec), (path,
                                                            leaf.sharding)
            n_sharded += 1
    assert n_sharded >= 8     # value/output projs + ffn pairs at least
    # updated params stay numerically aligned with the DP run
    a = jax.tree.leaves(s1.params)[0]
    b = jax.tree.leaves(s2.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-3, atol=2e-5)


def test_tp_pspec_rules_match_transformer():
    model = GFLDeformableDETR(num_encoder_layers=1, num_decoder_layers=1,
                              num_query=8, depth=18, num_classes=4)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)),
                           jnp.asarray([[64, 64]], jnp.int32))
    specs = tp_pspecs(variables["params"])
    flat = jax.tree_util.tree_leaves_with_path(specs,
                                               is_leaf=lambda x:
                                               isinstance(x, P))
    by_path = {"/".join(getattr(k, "key", str(k)) for k in p): s
               for p, s in flat}
    hit = [p for p, s in by_path.items() if s != P()]
    assert any("value_proj/kernel" in p for p in hit)
    assert any("ffn/fc1/kernel" in p for p in hit)
    assert any("output_proj/kernel" in p for p in hit)
    # backbone stays replicated
    assert not any(p.startswith("backbone") for p in hit)
