"""CSPDarknet: Focus stem lossless shuffle, shapes, deepen/widen scaling."""
import numpy as np
import jax
import jax.numpy as jnp

from dskd_tpu.models.csp_darknet import CSPDarknet, Focus


def test_focus_space_to_depth():
    x = jnp.asarray(np.arange(2 * 4 * 4 * 3).reshape(2, 4, 4, 3)
                    .astype(np.float32))
    f = Focus(8)
    vars_ = f.init(jax.random.PRNGKey(0), x)
    out = f.apply(vars_, x)
    assert out.shape == (2, 2, 2, 8)
    # the shuffle is lossless: the conv input carries all 48 pixels
    # (checked structurally: 4x channel growth before the conv)
    kernel = vars_["params"]["conv"]["conv"]["kernel"]
    assert kernel.shape == (3, 3, 12, 8)


def test_cspdarknet_shapes_yolox_s():
    # YOLOX-s factors: deepen 0.33, widen 0.5
    model = CSPDarknet(deepen_factor=0.33, widen_factor=0.5)
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(vars_, x)
    assert [o.shape for o in outs] == [
        (1, 8, 8, 128), (1, 4, 4, 256), (1, 2, 2, 512)]


def test_cspdarknet_train_updates_bn():
    model = CSPDarknet(deepen_factor=0.33, widen_factor=0.25,
                       out_indices=(4,))
    x = jnp.ones((1, 32, 32, 3)) * 0.5
    vars_ = model.init(jax.random.PRNGKey(0), x)
    _, updated = model.apply(vars_, x, True, mutable=["batch_stats"])
    before = jax.tree.leaves(vars_["batch_stats"])[0]
    after = jax.tree.leaves(updated["batch_stats"])[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))
