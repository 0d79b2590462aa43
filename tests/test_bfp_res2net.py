"""BFP neck semantics + Res2Net shapes/params."""
import numpy as np
import jax
import jax.numpy as jnp

from dskd_tpu.models.bfp import BFP
from dskd_tpu.models.res2net import Res2Net


def test_bfp_shapes_and_residual():
    rng = np.random.RandomState(0)
    inputs = [jnp.asarray(rng.randn(1, s, s, 16).astype(np.float32))
              for s in (32, 16, 8, 4, 2)]
    neck = BFP(refine_level=2)
    vars_ = neck.init(jax.random.PRNGKey(0), inputs)
    outs = neck.apply(vars_, inputs)
    assert [o.shape for o in outs] == [i.shape for i in inputs]
    # zero refine-conv weights at init? conv has default init != 0; check
    # the residual structure: out - in is the same map resized per level
    d0 = np.asarray(outs[0] - inputs[0])
    d2 = np.asarray(outs[2] - inputs[2])
    # level-0 residual is the 4x nearest-upsample of level-2's residual
    up = np.repeat(np.repeat(d2, 4, axis=1), 4, axis=2)
    np.testing.assert_allclose(d0, up, atol=1e-5)


def test_res2net50_shapes_and_params():
    model = Res2Net(depth=50, out_indices=(1, 2, 3))
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(vars_, x)
    assert [o.shape for o in outs] == [(1, 8, 8, 512), (1, 4, 4, 1024),
                                      (1, 2, 2, 2048)]
    n = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(vars_["params"]))
    # res2net50_26w_4s backbone ~23.2M (torchvision 25.7M - 2.5M fc)
    assert 22e6 < n < 25e6, n


def test_res2net_gradients_flow():
    model = Res2Net(depth=50, out_indices=(3,), frozen_stages=-1)
    x = jnp.ones((1, 32, 32, 3)) * 0.1
    vars_ = model.init(jax.random.PRNGKey(0), x)

    def f(p):
        o = model.apply({"params": p,
                         "batch_stats": vars_["batch_stats"]}, x)
        return jnp.sum(o[0].astype(jnp.float32) ** 2)

    g = jax.grad(f)(vars_["params"])
    gl = g["layer1_block0"]["conv2_0"]["kernel"]
    assert float(jnp.abs(gl).max()) > 0
