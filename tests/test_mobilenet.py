"""MobileNetV2 backbone: shapes, param count, residual/freeze semantics."""
import numpy as np
import jax
import jax.numpy as jnp

from dskd_tpu.models.mobilenet_v2 import MobileNetV2, make_divisible


def test_make_divisible():
    assert make_divisible(32) == 32
    assert make_divisible(32 * 0.5) == 16
    assert make_divisible(24 * 1.0, 8) == 24
    # never drops below 90% of the requested value
    assert make_divisible(17) == 16 or make_divisible(17) >= 0.9 * 17


def test_mobilenet_v2_shapes_and_params():
    model = MobileNetV2()
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(vars_, x)
    # default out_indices (1, 2, 4, 6): strides 4/8/16/32,
    # channels 24/32/96/320
    assert [o.shape for o in outs] == [
        (1, 16, 16, 24), (1, 8, 8, 32), (1, 4, 4, 96), (1, 2, 2, 320)]
    n = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(vars_["params"]))
    # torchvision mobilenet_v2 backbone (sans classifier + final 1280 conv)
    # is ~1.81M params
    assert 1.5e6 < n < 2.2e6, n


def test_frozen_stages_stop_gradients():
    model = MobileNetV2(frozen_stages=2, out_indices=(1, 6))
    x = jnp.ones((1, 32, 32, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x)

    def loss(params):
        outs = model.apply({"params": params,
                            "batch_stats": vars_["batch_stats"]}, x)
        return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in outs)

    grads = jax.grad(loss)(vars_["params"])
    g_frozen = grads["stage1_block0"]["depthwise"]["kernel"]
    g_live = grads["stage7_block0"]["project"]["kernel"]
    assert float(jnp.abs(g_frozen).max()) == 0.0
    assert float(jnp.abs(g_live).max()) > 0.0


def test_mobilenet_conv2_1280_tap():
    """Index 7 taps the trailing 1x1 ReLU6 conv to 1280 ch (reference
    mobilenet_v2.py:121-136, the ssdlite (4, 7) recipe)."""
    model = MobileNetV2(out_indices=(4, 7))
    x = jnp.zeros((1, 64, 64, 3))
    v = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(v, x)
    assert outs[0].shape == (1, 4, 4, 96)
    assert outs[1].shape == (1, 2, 2, 1280)
