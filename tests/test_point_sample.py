"""point_sample vs torch F.grid_sample (both align_corners modes)."""
import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from dskd_tpu.ops.point_sample import point_sample


def _oracle(feats_nhwc, points, align_corners):
    t = torch.tensor(feats_nhwc).permute(0, 3, 1, 2)        # NCHW
    grid = torch.tensor(points) * 2.0 - 1.0                 # [-1, 1]
    out = F.grid_sample(t, grid.unsqueeze(2), mode="bilinear",
                        padding_mode="zeros",
                        align_corners=align_corners)        # (B, C, P, 1)
    return out[..., 0].permute(0, 2, 1).numpy()             # (B, P, C)


def test_point_sample_matches_grid_sample():
    rng = np.random.RandomState(0)
    feats = rng.randn(2, 7, 9, 4).astype(np.float32)
    points = rng.rand(2, 50, 2).astype(np.float32)
    # include points near/over the border
    points[:, :8] = rng.uniform(-0.1, 1.1, (2, 8, 2)).astype(np.float32)
    for ac in (False, True):
        got = np.asarray(point_sample(jnp.asarray(feats),
                                      jnp.asarray(points),
                                      align_corners=ac))
        want = _oracle(feats, points, ac)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5,
                                   err_msg=f"align_corners={ac}")
