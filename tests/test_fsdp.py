"""ZeRO/FSDP sharding: sharded-state train step == replicated DP step,
params + AdamW moments actually land sharded, and TP+FSDP compose."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from dskd_tpu.models.detector import GFLDeformableDETR
from dskd_tpu.models.gfl_detr_loss import DetLossConfig
from dskd_tpu.parallel.fsdp import fsdp_pspecs, shard_state_fsdp
from dskd_tpu.parallel.mesh import make_mesh, shard_batch
from dskd_tpu.parallel.tp import make_2d_mesh, shard_state_tp, tp_pspecs
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
def test_fsdp_matches_dp():
    fresh_state, batch, step = _setup()

    mesh = make_mesh(jax.devices()[:4])
    state = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())),
        fresh_state())
    s1, losses_dp = step(state, shard_batch(batch, mesh), None)

    state2 = shard_state_fsdp(fresh_state(), mesh)
    s2, losses_z = step(state2, shard_batch(batch, mesh), None)

    np.testing.assert_allclose(float(losses_dp["loss"]),
                               float(losses_z["loss"]), rtol=2e-4)

    # large params and their AdamW moments really are sharded on 'data'
    specs = fsdp_pspecs(s2.params, 4)
    flat_p = jax.tree_util.tree_leaves_with_path(s2.params)
    flat_s = jax.tree.leaves(specs, is_leaf=lambda x: isinstance(x, P))

    def norm(s):
        t = tuple(s)
        while t and t[-1] is None:
            t = t[:-1]
        return t

    n_sharded = 0
    for (path, leaf), spec in zip(flat_p, flat_s):
        if spec != P():
            assert norm(leaf.sharding.spec) == norm(spec), (path,
                                                            leaf.sharding)
            n_sharded += 1
    assert n_sharded >= 20       # backbone convs + transformer + head
    moment_sharded = sum(
        1 for leaf in jax.tree.leaves(s2.opt_state)
        if hasattr(leaf, "sharding")
        and norm(getattr(leaf.sharding, "spec", P())) != ())
    assert moment_sharded >= 2 * n_sharded - 4  # mu + nu per param

    # updated params stay numerically aligned with the DP run
    for a, b in list(zip(jax.tree.leaves(s1.params),
                         jax.tree.leaves(s2.params)))[:5]:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 CPU devices")
def test_fsdp_composes_with_tp():
    """(data=2, model=4) mesh: Megatron TP rules + FSDP over 'data' for
    the leaves TP leaves replicated — same loss as pure DP."""
    fresh_state, batch, step = _setup()

    mesh = make_mesh(jax.devices()[:4])
    state = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())),
        fresh_state())
    _, losses_dp = step(state, shard_batch(batch, mesh), None)

    mesh2 = make_2d_mesh(2, 4)
    st = fresh_state()
    base = tp_pspecs(st.params)
    state2 = shard_state_tp(st, mesh2)
    state2 = shard_state_fsdp(state2, mesh2, base_specs=base)
    _, losses_mix = step(state2, shard_batch(batch, mesh2), None)

    np.testing.assert_allclose(float(losses_dp["loss"]),
                               float(losses_mix["loss"]), rtol=2e-4)

    # TP-sharded leaves kept their TP spec; some replicated-under-TP
    # leaves (e.g. backbone convs) picked up a 'data' shard
    specs = fsdp_pspecs(state2.params, 2, base_specs=base)
    flat = list(zip(
        jax.tree_util.tree_leaves_with_path(specs,
                                            is_leaf=lambda x:
                                            isinstance(x, P)),
        jax.tree.leaves(base, is_leaf=lambda x: isinstance(x, P))))
    kept_tp = [s for (p, s), b in flat if b != P()]
    added_data = [s for (p, s), b in flat
                  if b == P() and s != P()]
    assert all("model" in tuple(s) for s in kept_tp)
    assert len(added_data) >= 10
    assert all(tuple(x for x in tuple(s) if x) == ("data",)
               for s in added_data)


def test_fsdp_pspec_rules():
    """Unit: largest divisible dim is picked; small leaves replicated;
    TP base specs win."""
    params = {
        "big": jnp.zeros((128, 384)),          # largest dim 384 % 4 == 0
        "odd": jnp.zeros((127, 381)),          # nothing divisible
        "tiny": jnp.zeros((64,)),              # under min_size
        "tall": jnp.zeros((1024, 96)),
    }
    specs = fsdp_pspecs(params, 4, min_size=2 ** 10)
    assert specs["big"] == P(None, "data")
    assert specs["odd"] == P()
    assert specs["tiny"] == P()
    assert specs["tall"] == P("data", None)

    base = {"big": P(None, "model"), "odd": P(), "tiny": P(),
            "tall": P()}
    mixed = fsdp_pspecs(params, 4, min_size=2 ** 10, base_specs=base)
    assert mixed["big"] == P(None, "model")    # TP wins
    assert mixed["tall"] == P("data", None)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 CPU devices")
def test_fsdp_checkpoint_roundtrip(tmp_path):
    """Orbax save of an FSDP-sharded TrainState must round-trip to the
    same values when restored into a replicated template (the driver's
    resume path restores BEFORE re-sharding)."""
    from dskd_tpu.train.checkpoint import restore_checkpoint, save_checkpoint

    fresh_state, batch, step = _setup()
    mesh = make_mesh(jax.devices()[:4])
    state = shard_state_fsdp(fresh_state(), mesh)
    state, _ = step(state, shard_batch(batch, mesh), None)

    save_checkpoint(str(tmp_path), 1, 1, state)
    ref = fresh_state()
    restored = restore_checkpoint(
        str(tmp_path), 1, 1,
        template={"params": jax.tree.map(np.asarray, ref.params),
                  "batch_stats": jax.tree.map(np.asarray,
                                              ref.batch_stats),
                  "opt_state": None, "step": 0})
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
