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
