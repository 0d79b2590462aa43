"""Corner pool vs a naive loop oracle."""
import numpy as np
import jax.numpy as jnp

from dskd_tpu.ops.corner_pool import corner_pool


def test_corner_pool_oracle():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 5, 7, 3).astype(np.float32)

    def naive(x, direction):
        out = np.empty_like(x)
        H, W = x.shape[1:3]
        for i in range(H):
            for j in range(W):
                if direction == "top":
                    out[:, i, j] = x[:, i:, j].max(axis=1)
                elif direction == "bottom":
                    out[:, i, j] = x[:, :i + 1, j].max(axis=1)
                elif direction == "left":
                    out[:, i, j] = x[:, i, j:].max(axis=1)
                else:
                    out[:, i, j] = x[:, i, :j + 1].max(axis=1)
        return out

    for d in ("top", "bottom", "left", "right"):
        got = np.asarray(corner_pool(jnp.asarray(x), d))
        np.testing.assert_allclose(got, naive(x, d), err_msg=d)
