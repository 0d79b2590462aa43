"""FPN extra-level semantics (parity: mmdet/models/necks/fpn.py:183-193).

With add_extra_convs falsy the reference generates P6+ by PARAMETER-FREE
max_pool2d(kernel=1, stride=2) on the last output (Faster/Mask R-CNN
configs) — i.e. exact 2x subsampling, no learnable conv.
"""
import numpy as np
import jax
import jax.numpy as jnp

from dskd_tpu.models.fpn import FPN


def _inputs(rng):
    return [jnp.asarray(rng.randn(1, s, s, c).astype(np.float32))
            for s, c in [(32, 64), (16, 128), (8, 256), (4, 512)]]


def test_fpn_maxpool_extra_level_is_parameter_free():
    rng = np.random.RandomState(0)
    inputs = _inputs(rng)
    neck = FPN(out_channels=32, num_outs=5, start_level=0,
               add_extra_convs="")
    vars_ = neck.init(jax.random.PRNGKey(0), inputs)
    assert not any("extra" in k for k in vars_["params"]), \
        sorted(vars_["params"])
    outs = neck.apply(vars_, inputs)
    assert [o.shape for o in outs] == [
        (1, 32, 32, 32), (1, 16, 16, 32), (1, 8, 8, 32), (1, 4, 4, 32),
        (1, 2, 2, 32)]
    # P6 == k1-s2 maxpool of P5 == exact subsample
    np.testing.assert_array_equal(np.asarray(outs[4]),
                                  np.asarray(outs[3])[:, ::2, ::2, :])


def test_fpn_extra_convs_still_learnable_when_configured():
    rng = np.random.RandomState(1)
    inputs = _inputs(rng)
    neck = FPN(out_channels=32, num_outs=5, start_level=1,
               add_extra_convs="on_input", relu_before_extra_convs=False)
    vars_ = neck.init(jax.random.PRNGKey(0), inputs)
    assert any("extra" in k for k in vars_["params"])
    outs = neck.apply(vars_, inputs)
    # laterals C3..C5 (16/8/4) + P6 (2) + P7 (1)
    assert len(outs) == 5 and outs[-1].shape == (1, 1, 1, 32)
