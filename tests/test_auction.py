"""Auction LAP solver: near-optimality vs scipy + degenerate-cost health."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from dskd_tpu.core.matching import lap_auction


@pytest.mark.parametrize("r,c,seed", [(8, 20, 0), (50, 300, 1), (120, 300, 2)])
def test_auction_near_optimal(r, c, seed):
    rng = np.random.RandomState(seed)
    cost = rng.rand(r, c).astype(np.float32) * 10
    row2col = np.asarray(lap_auction(jnp.array(cost)))
    assert (row2col >= 0).all()
    assert len(set(row2col.tolist())) == r
    ours = cost[np.arange(r), row2col].sum()
    ri, ci = linear_sum_assignment(cost)
    opt = cost[ri, ci].sum()
    # near-optimal: within 1% of the span-scaled optimum
    assert ours <= opt + 0.01 * (cost.max() - cost.min()) * r


def test_auction_degenerate_costs():
    """Row-near-constant costs (untrained-network structure)."""
    rng = np.random.RandomState(3)
    base = rng.rand(120, 1).astype(np.float32) * 5
    cost = np.tile(base, (1, 300)) + rng.rand(120, 300).astype(np.float32) * 1e-3
    row2col = np.asarray(lap_auction(jnp.array(cost)))
    assert (row2col >= 0).all()
    assert len(set(row2col.tolist())) == 120


def test_auction_in_assign():
    from dskd_tpu.core.matching import hungarian_assign
    rng = np.random.RandomState(4)
    cost = jnp.array(rng.rand(30, 10).astype(np.float32))
    valid = jnp.array([True] * 7 + [False] * 3)
    labels = jnp.array(rng.randint(0, 5, 10), jnp.int32)
    res = hungarian_assign(cost, valid, labels, solver="auction")
    assert int(res.num_pos) == 7
    m = np.asarray(res.assigned_gt)
    assert sorted(m[m >= 0].tolist()) == list(range(7))


def test_auction_row_mask_padded_rows():
    """Masked (padded) rows never bid: the solve is exact on the live
    submatrix, fallback counts live rows only, and the returned columns
    are still one-to-one across ALL rows (fallback fills the dead ones).

    The padded-teacher-det regime (hungarian_assign merged-GT path): 32
    live rows + 100 constant padding rows over 300 columns.
    """
    rng = np.random.RandomState(7)
    live_n, pad_n, C = 32, 100, 300
    cost = np.concatenate([rng.randn(live_n, C).astype(np.float32) * 2,
                           np.zeros((pad_n, C), np.float32)])
    mask = np.zeros(live_n + pad_n, bool)
    mask[:live_n] = True
    row2col, n_fb = lap_auction(jnp.array(cost), with_stats=True,
                                row_mask=jnp.array(mask))
    row2col = np.asarray(row2col)
    assert int(n_fb) == 0                       # every live row converged
    assert len(set(row2col.tolist())) == live_n + pad_n  # one-to-one
    ours = cost[:live_n][np.arange(live_n), row2col[:live_n]].sum()
    ri, ci = linear_sum_assignment(cost[:live_n])
    opt = cost[:live_n][ri, ci].sum()
    assert ours <= opt + 0.01 * (cost.max() - cost.min()) * live_n


def test_tie_jitter_spreads_row_preferences():
    """Each row's jitter argmin must be decorrelated across rows: tied
    (constant-cost) rows otherwise all contend for one column and the
    auction resolves exactly one per round (the old linear hash put every
    row's minimum at column 0)."""
    from dskd_tpu.core.matching import _tie_jitter
    u = np.asarray(_tie_jitter((128, 300)))
    assert len(set(np.argmin(u, axis=1).tolist())) > 64
