"""Pallas TPU kernels, exercised in interpret mode on CPU (compiled-mode
parity with the scan implementation is checked on real TPU hardware — it
was bit-exact at 4096x10 when measured)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaptive_mcmc_tpu.ops.cholesky import rank1_cholesky_update
from adaptive_mcmc_tpu.ops.pallas.chol_update import chol_update_pallas


def _rand_chols(key, C, d):
    a = jax.random.normal(key, (C, d, d)) * 0.4
    cov = jnp.einsum("cij,ckj->cik", a, a) + jnp.eye(d)
    return jnp.linalg.cholesky(cov)


@pytest.mark.parametrize("C,d", [(4, 3), (130, 10), (300, 26), (128, 1)])
def test_pallas_matches_scan(C, d):
    key = jax.random.PRNGKey(0)
    L = _rand_chols(key, C, d)
    v = jax.random.normal(jax.random.PRNGKey(1), (C, d))
    coef = jnp.linspace(0.01, 0.9, C)
    got = chol_update_pallas(L, v, coef, interpret=True)
    want = jax.vmap(rank1_cholesky_update)(L, v, coef)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # strictly lower triangular with positive diagonal
    np.testing.assert_allclose(got, jnp.tril(got), atol=0.0)
    assert bool((jax.vmap(jnp.diagonal)(got) > 0).all())


def test_pallas_padding_path():
    """C not a multiple of the lane tile exercises the pad/slice path."""
    C, d = 37, 5
    key = jax.random.PRNGKey(2)
    L = _rand_chols(key, C, d)
    v = jax.random.normal(jax.random.PRNGKey(3), (C, d))
    coef = jnp.full((C,), 0.3)
    got = chol_update_pallas(L, v, coef, interpret=True)
    assert got.shape == (C, d, d)
    want = jax.vmap(rank1_cholesky_update)(L, v, coef)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pallas_downdate_nan_matches_reference_guard():
    """A downdate that destroys positive-definiteness must yield NaNs in
    BOTH implementations (the caller's NaN guard relies on it)."""
    d = 4
    L = jnp.broadcast_to(jnp.eye(d), (128, d, d)) + 0.0
    v = jnp.zeros((128, d)).at[:, 0].set(10.0)
    coef = jnp.full((128,), -1.0)  # I - 100 e0 e0^T: indefinite
    got = chol_update_pallas(L, v, coef, interpret=True)
    want = jax.vmap(rank1_cholesky_update)(L, v, coef)
    assert bool(jnp.isnan(got).any())
    assert bool(jnp.isnan(want).any())


# ---------------------------------------------------------------------------
# Fused whole-step ARWMH kernel (ops/pallas/arwmh_fused.py)
# ---------------------------------------------------------------------------

from adaptive_mcmc_tpu import models
from adaptive_mcmc_tpu.kernels.arwmh import ARWMHConfig, arwmh
from adaptive_mcmc_tpu.kernels.base import adaptation_lr, nan_to_inf
from adaptive_mcmc_tpu.ops.cholesky import adaptive_scale_update
from adaptive_mcmc_tpu.ops.pallas.arwmh_fused import build_fused_arwmh


def _reference_steps(target, config, state_tup, noise, unif):
    """Replay the ARWMH recursion in plain jnp with injected noise — the
    same math as kernels/arwmh.py::step (whose recursion is golden-tested
    in test_arwmh.py), parameterized by explicit (z, u) draws."""
    x, pe, map_, loc, L, loglam, i0 = state_tup
    bp = jax.vmap(target.potential_fn)
    eye = jnp.eye(target.dim)
    S = noise.shape[0]
    for s in range(S):
        z, u = noise[s], unif[s]
        step_size = jnp.exp(loglam)
        prop_scale = L * step_size[:, None, None] + config.eps * eye
        x_prop = x + jnp.einsum(
            "cij,cj->ci", prop_scale, z,
            precision=jax.lax.Precision.HIGHEST,
        )
        pe_prop = nan_to_inf(bp(x_prop))
        ap = jnp.minimum(jnp.exp(pe - pe_prop), 1.0)
        acc = u < ap
        x = jnp.where(acc[:, None], x_prop, x)
        pe = jnp.where(acc, pe_prop, pe)
        n, gamma = adaptation_lr(i0 + s, config.num_warmup, config.lr_decay)
        map_ = map_ + (ap - map_) / n.astype(jnp.float32)
        delta = x - loc
        loc = loc + gamma * delta
        L_new = adaptive_scale_update(
            L, delta, jnp.full((x.shape[0],), gamma)
        )
        loglam_new = loglam + gamma * (ap - config.target_accept_prob)
        L, loglam = L_new, loglam_new
    return x, pe, map_, loc, L, loglam


def test_fused_arwmh_matches_reference_recursion():
    """Noise-injection mode: the fused kernel must reproduce the XLA
    recursion (einsum proposal + scan Cholesky update) step for step."""
    t = models.eight_schools_noncentered()
    cfg = ARWMHConfig(num_warmup=4)
    C, d, S = 9, t.dim, 12
    k = arwmh(t, cfg)
    st = k.init(jax.random.PRNGKey(0), n_chains=C)
    tup = (st.position, st.potential_energy, st.mean_accept_prob,
           st.adapt_state.loc, st.adapt_state.scale,
           st.adapt_state.log_step_size, st.i)
    noise = jax.random.normal(jax.random.PRNGKey(1), (S, C, d))
    unif = jax.random.uniform(jax.random.PRNGKey(2), (S, C))

    drive = build_fused_arwmh(t, cfg)
    got, _ = drive(tup, S, 0, 1, noise=noise, unif=unif, interpret=True)
    want = _reference_steps(t, cfg, tup, noise, unif)
    for g, w, name in zip(
        got, want, ("x", "pe", "map", "loc", "L", "loglam")
    ):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=2e-5, atol=2e-6,
            err_msg=name,
        )
    assert int(got[6]) == S


def test_fused_arwmh_collect_frames():
    """Frame recording: thinned positions land in the right slots and the
    final frame equals the final state; state matches the n_frames=0 run
    on the same injected noise."""
    t = models.eight_schools_noncentered()
    cfg = ARWMHConfig(num_warmup=0)
    C, d, S = 5, t.dim, 20
    k = arwmh(t, cfg)
    st = k.init(jax.random.PRNGKey(3), n_chains=C)
    tup = (st.position, st.potential_energy, st.mean_accept_prob,
           st.adapt_state.loc, st.adapt_state.scale,
           st.adapt_state.log_step_size, st.i)
    noise = jax.random.normal(jax.random.PRNGKey(4), (S, C, d))
    unif = jax.random.uniform(jax.random.PRNGKey(5), (S, C))

    drive = build_fused_arwmh(t, cfg)
    st_a, frames = drive(
        tup, S, 4, 5, noise=noise, unif=unif, interpret=True
    )
    st_b, _ = drive(tup, S, 0, 1, noise=noise, unif=unif, interpret=True)
    for a, b in zip(st_a, st_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    assert frames["position"].shape == (C, 4, d)
    assert frames["potential_energy"].shape == (C, 4)
    assert frames["as_change"].shape == (C, 4)
    np.testing.assert_allclose(
        np.asarray(frames["position"][:, -1]), np.asarray(st_a[0]),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(frames["potential_energy"][:, -1]), np.asarray(st_a[1]),
        rtol=1e-6,
    )
    assert np.isfinite(np.asarray(frames["position"])).all()


# ---------------------------------------------------------------------------
# Chains-last entries (ops/cholesky.adaptive_scale_update_cl,
# ops/pallas/chol_update.chol_update_pallas_cl)
# ---------------------------------------------------------------------------

from adaptive_mcmc_tpu.ops.cholesky import adaptive_scale_update_cl
from adaptive_mcmc_tpu.ops.pallas.chol_update import chol_update_pallas_cl


@pytest.mark.parametrize("C,d", [(4, 3), (130, 10), (37, 5)])
def test_chains_last_pallas_entry_matches_chains_first(C, d):
    key = jax.random.PRNGKey(4)
    L = _rand_chols(key, C, d)
    v = jax.random.normal(jax.random.PRNGKey(5), (C, d))
    coef = jnp.linspace(0.02, 0.8, C)
    got = chol_update_pallas_cl(
        jnp.transpose(L, (1, 2, 0)), v.T, coef, interpret=True
    )
    want = chol_update_pallas(L, v, coef, interpret=True)
    np.testing.assert_allclose(
        jnp.transpose(got, (2, 0, 1)), want, rtol=1e-6, atol=1e-6
    )


@pytest.mark.parametrize("C,d", [(6, 4), (200, 26)])
def test_adaptive_scale_update_cl_matches_chains_first(C, d):
    key = jax.random.PRNGKey(6)
    L = _rand_chols(key, C, d)
    delta = jax.random.normal(jax.random.PRNGKey(7), (C, d))
    gamma = jnp.linspace(0.01, 0.5, C)
    got = adaptive_scale_update_cl(
        jnp.transpose(L, (1, 2, 0)), delta.T, gamma, use_pallas=False
    )
    want = adaptive_scale_update(L, delta, gamma)
    np.testing.assert_allclose(
        jnp.transpose(got, (2, 0, 1)), want, rtol=1e-5, atol=1e-5
    )


def test_adaptive_scale_update_cl_nan_guard():
    """An indefinite downdate must return the PRE-update factor (per
    chain), matching the chains-first guard semantics."""
    d, C = 4, 8
    L = jnp.transpose(_rand_chols(jax.random.PRNGKey(8), C, d), (1, 2, 0))
    delta = jnp.zeros((d, C)).at[0, :2].set(100.0)  # chains 0,1 blow up
    gamma = jnp.full((C,), 0.999)
    # scaled factor sqrt(1-gamma) L shrinks; the huge delta still keeps
    # these PSD, so instead force NaN via an impossible gamma > 1
    gamma = gamma.at[:2].set(1.5)  # sqrt(negative) -> NaN path
    out = adaptive_scale_update_cl(L, delta, gamma, use_pallas=False)
    np.testing.assert_allclose(out[..., :2], L[..., :2], atol=0.0)
    assert not bool(jnp.isnan(out).any())
