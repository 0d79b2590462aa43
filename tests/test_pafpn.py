"""PAFPN shapes + bottom-up path wiring."""
import numpy as np
import jax
import jax.numpy as jnp

from dskd_tpu.models.pafpn import PAFPN


def test_pafpn_shapes():
    rng = np.random.RandomState(0)
    inputs = [jnp.asarray(rng.randn(1, s, s, c).astype(np.float32))
              for s, c in [(32, 64), (16, 128), (8, 256), (4, 512)]]
    neck = PAFPN(out_channels=32, num_outs=5)
    vars_ = neck.init(jax.random.PRNGKey(0), inputs)
    outs = neck.apply(vars_, inputs)
    assert [o.shape for o in outs] == [
        (1, 32, 32, 32), (1, 16, 16, 32), (1, 8, 8, 32), (1, 4, 4, 32),
        (1, 2, 2, 32)]


def test_pafpn_bottom_up_path_flows():
    """Unlike plain FPN, perturbing the FINEST input must change the
    COARSEST original-level output (through the downsample path)."""
    rng = np.random.RandomState(1)
    inputs = [jnp.asarray(rng.randn(1, s, s, 16).astype(np.float32))
              for s in (16, 8, 4)]
    neck = PAFPN(out_channels=16, num_outs=3)
    vars_ = neck.init(jax.random.PRNGKey(0), inputs)
    base = neck.apply(vars_, inputs)
    bumped = [inputs[0] + 1.0] + list(inputs[1:])
    out2 = neck.apply(vars_, bumped)
    assert np.abs(np.asarray(out2[2]) - np.asarray(base[2])).max() > 1e-6

    from dskd_tpu.models.fpn import FPN
    fpn = FPN(out_channels=16, num_outs=3, start_level=0)
    fv = fpn.init(jax.random.PRNGKey(0), inputs)
    f_base = fpn.apply(fv, inputs)
    f_out2 = fpn.apply(fv, bumped)
    # plain FPN: finest input never reaches the coarsest output
    np.testing.assert_allclose(np.asarray(f_out2[2]),
                               np.asarray(f_base[2]))
