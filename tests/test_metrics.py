"""Metric suite: parity with SciPy/closed forms, solver cross-checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.spatial
import scipy.optimize

from adaptive_mcmc_tpu.metrics import (
    auction_assignment,
    linear_sum_assignment,
    max_sliced_wasserstein,
    minkowski_cost_matrix,
    mmd2_unbiased,
    mmd_heuristic,
    pth_moment_rmse,
    wasserstein_1d,
    wasserstein_dist11_p,
    wasserstein_sinkhorn,
    wasserstein_sinkhorn_unbiased,
)


def _two_clouds(n=200, d=5, shift=0.5, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, d)).astype(np.float32)
    y = (rng.standard_normal((n, d)) + shift).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(y)


def test_pth_moment_rmse():
    x, y = _two_clouds()
    got = float(pth_moment_rmse(x, y, p=1.0))
    want = np.linalg.norm(np.mean(np.asarray(x), 0) - np.mean(np.asarray(y), 0))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_cost_matrix_matches_scipy():
    x, y = _two_clouds(50, 4)
    got = np.asarray(minkowski_cost_matrix(x, y, ord=2.0))
    want = scipy.spatial.distance_matrix(np.asarray(x), np.asarray(y), p=2.0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("solver", ["scipy", "native"])
def test_wasserstein_dist11_matches_scipy_reference(solver):
    x, y = _two_clouds(120, 3)
    cost = scipy.spatial.distance_matrix(np.asarray(x), np.asarray(y))
    r, c = scipy.optimize.linear_sum_assignment(cost)
    want = cost[r, c].mean()
    try:
        got = wasserstein_dist11_p(x, y, solver=solver)
    except RuntimeError:
        pytest.skip("native solver unavailable")
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_native_assignment_exact_random_instances():
    try:
        linear_sum_assignment(np.eye(2), solver="native")
    except RuntimeError:
        pytest.skip("native solver unavailable")
    rng = np.random.default_rng(1)
    for n in [1, 2, 7, 40, 150]:
        cost = rng.random((n, n))
        col = linear_sum_assignment(cost, solver="native")
        r, c = scipy.optimize.linear_sum_assignment(cost)
        assert sorted(col) == list(range(n))
        np.testing.assert_allclose(
            cost[np.arange(n), col].sum(), cost[r, c].sum(), rtol=1e-12
        )


def test_auction_assignment_near_optimal():
    rng = np.random.default_rng(2)
    n = 64
    cost = rng.random((n, n)).astype(np.float32)
    col = np.asarray(auction_assignment(jnp.asarray(cost)))
    assert sorted(col.tolist()) == list(range(n))
    r, c = scipy.optimize.linear_sum_assignment(cost)
    opt = cost[r, c].sum()
    got = cost[np.arange(n), col].sum()
    assert got <= opt + 0.15 * max(opt, 1.0), (got, opt)


def test_wasserstein_1d_closed_form():
    mu = jnp.asarray(np.random.default_rng(3).standard_normal(1000))
    nu = mu + 2.0
    np.testing.assert_allclose(float(wasserstein_1d(mu, nu, p=1.0)), 2.0,
                               rtol=1e-5)
    # scipy cross-check on independent samples
    nu2 = jnp.asarray(np.random.default_rng(4).standard_normal(1000))
    from scipy.stats import wasserstein_distance

    want = wasserstein_distance(np.asarray(mu), np.asarray(nu2))
    np.testing.assert_allclose(float(wasserstein_1d(mu, nu2)), want, rtol=1e-4)


def test_max_sliced_bounds():
    x, y = _two_clouds(400, 4, shift=1.0)
    msw = float(max_sliced_wasserstein(x, y, jax.random.PRNGKey(0),
                                       n_directions=256))
    # max-sliced lower-bounds W and detects a mean shift of norm 2
    shift_norm = float(jnp.linalg.norm(jnp.mean(y, 0) - jnp.mean(x, 0)))
    assert msw > 0.6 * shift_norm
    # identical clouds -> ~0
    same = float(max_sliced_wasserstein(x, x, jax.random.PRNGKey(1),
                                        n_directions=64))
    assert same < 1e-6


def test_mmd_properties():
    x, y = _two_clouds(300, 4, shift=1.0)
    m_same = float(mmd_heuristic(x, x))
    m_diff = float(mmd_heuristic(x, y))
    assert m_same < 0.05
    assert m_diff > 3 * m_same
    # unbiased MMD^2 near zero for same-distribution samples
    x2, _ = _two_clouds(300, 4, shift=0.0, seed=7)
    m0 = float(mmd2_unbiased(x, x2, gamma=0.5))
    assert abs(m0) < 0.02


def test_mmd_heuristic_many_matches_per_seed():
    """The batched/hoisted mmd path must equal per-seed mmd_heuristic."""
    from adaptive_mcmc_tpu.metrics import mmd_heuristic_many

    y = jax.random.normal(jax.random.PRNGKey(0), (200, 5))
    xs = jax.random.normal(jax.random.PRNGKey(1), (7, 180, 5)) * 1.3 + 0.2
    got = np.asarray(mmd_heuristic_many(xs, y))
    want = np.asarray([float(mmd_heuristic(xs[s], y)) for s in range(7)])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_sinkhorn_sane():
    x, y = _two_clouds(150, 3, shift=1.0)
    w = wasserstein_sinkhorn(x, y)
    assert 0.3 < w < 5.0
    # unbiased divergence ~0 for identical clouds, > 0 for shifted
    div_same = wasserstein_sinkhorn_unbiased(x, x)
    div_diff = wasserstein_sinkhorn_unbiased(x, y)
    assert abs(div_same) < 1e-3
    assert div_diff > 0.1


def test_sinkhorn_approximates_exact_w1():
    """With small epsilon, Sinkhorn cost approaches the exact 1-1 coupling
    value (both use Euclidean ground cost)."""
    x, y = _two_clouds(100, 2, shift=1.0)
    exact = wasserstein_dist11_p(x, y)
    sk = wasserstein_sinkhorn(x, y, epsilon=5e-3, max_iters=5000)
    assert abs(sk - exact) < 0.12 * exact, (sk, exact)

def test_auction_warm_start_matches_exact():
    """Warm-started auction (prices carried across sample sets vs one
    fixed reference set — the sweep-eval pattern) must stay within the
    same optimality band as a cold solve."""
    from adaptive_mcmc_tpu.metrics.wasserstein import wasserstein_dist11_p

    rng = np.random.default_rng(7)
    ref = rng.standard_normal((400, 5)).astype(np.float32)
    prices = None
    for seed in range(3):
        u = rng.standard_normal((400, 5)).astype(np.float32)
        w, prices = wasserstein_dist11_p(
            jnp.asarray(u), jnp.asarray(ref), solver="auction",
            prices_init=prices, return_prices=True,
        )
        cost = scipy.spatial.distance_matrix(u, ref)
        r, c = scipy.optimize.linear_sum_assignment(cost)
        w_exact = cost[r, c].mean()
        assert abs(w - w_exact) <= 2e-3 * max(1.0, w_exact), (
            seed, w, w_exact
        )
    assert prices is not None and prices.shape == (400,)

def test_auction_batch_matches_exact():
    from adaptive_mcmc_tpu.metrics.assignment import auction_assignment_batch
    from adaptive_mcmc_tpu.metrics.wasserstein import minkowski_cost_matrix

    rng = np.random.default_rng(3)
    ref = rng.standard_normal((300, 4)).astype(np.float32)
    us = rng.standard_normal((3, 300, 4)).astype(np.float32)
    costs = jnp.stack([
        minkowski_cost_matrix(jnp.asarray(u), jnp.asarray(ref)) for u in us
    ])
    cols = np.asarray(auction_assignment_batch(costs, block=64,
                                               rounds_per_call=512))
    for i in range(3):
        assert sorted(cols[i].tolist()) == list(range(300))
        cost = np.asarray(costs[i], np.float64)
        r, c = scipy.optimize.linear_sum_assignment(cost)
        w_exact = cost[r, c].mean()
        w = cost[np.arange(300), cols[i]].mean()
        assert abs(w - w_exact) <= 2e-3 * max(1.0, w_exact), (i, w, w_exact)


def test_auction_batch_warm_start_matches_exact():
    """Warm-starting batch i+1 from batch i's duals (eval-sweep pattern,
    including a smaller trailing batch) keeps every instance within the
    certified bound of the exact Hungarian solution."""
    from adaptive_mcmc_tpu.metrics.assignment import auction_assignment_batch
    from adaptive_mcmc_tpu.metrics.wasserstein import minkowski_cost_matrix

    rng = np.random.default_rng(11)
    ref = rng.standard_normal((250, 4)).astype(np.float32)
    us = rng.standard_normal((7, 250, 4)).astype(np.float32)  # 3 + 3 + 1
    prices = None
    sols = []
    for s0 in range(0, 7, 3):
        batch = us[s0:s0 + 3]
        costs = jnp.stack([
            minkowski_cost_matrix(jnp.asarray(u), jnp.asarray(ref))
            for u in batch
        ])
        cols, prices = auction_assignment_batch(
            costs, block=64, rounds_per_call=512,
            prices_init=prices, return_prices=True,
        )
        sols += [(np.asarray(costs[i], np.float64), np.asarray(cols[i]))
                 for i in range(len(batch))]
    assert len(sols) == 7
    for i, (cost, col) in enumerate(sols):
        assert sorted(col.tolist()) == list(range(250)), i
        r, c = scipy.optimize.linear_sum_assignment(cost)
        w_exact = cost[r, c].mean()
        w = cost[np.arange(250), col].mean()
        assert abs(w - w_exact) <= 2e-3 * max(1.0, w_exact), (i, w, w_exact)


def test_auction_batch_tie_dense():
    """kidiq-regime regression: low-dim clouds with exactly duplicated
    points produce tie-dense cost matrices whose endgame price wars
    exhausted the old 400k round budget (round 4).  The batched auction
    must still terminate with a complete assignment within its
    certified bound."""
    from adaptive_mcmc_tpu.metrics.assignment import auction_assignment_batch

    rng = np.random.default_rng(7)
    n, d, B = 400, 2, 3
    base = rng.standard_normal((n // 4, d)).astype(np.float32)
    x = np.tile(base, (4, 1))                      # 4x duplicated points
    ys = [rng.standard_normal((n, d)).astype(np.float32) for _ in range(B)]
    costs = np.stack([
        np.linalg.norm(x[:, None, :] - y[None, :, :], axis=-1) for y in ys
    ])
    cols = np.asarray(auction_assignment_batch(jnp.asarray(costs), block=64))
    for i in range(B):
        assert sorted(cols[i].tolist()) == list(range(n))
        got = costs[i][np.arange(n), cols[i]].mean()
        r, c = scipy.optimize.linear_sum_assignment(costs[i])
        opt = costs[i][r, c].mean()
        bound = (costs[i].max() - costs[i].min()) / (2 * n)
        assert got - opt <= bound + 1e-6, (i, got, opt, bound)
