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


# ---------------------------------------------------------------------------
# Fused whole-sweep ASSS kernel (ops/pallas/asss_fused.py)
# ---------------------------------------------------------------------------

from adaptive_mcmc_tpu.kernels.asss import ASSSConfig
from adaptive_mcmc_tpu.ops.pallas.asss_fused import build_fused_asss


def _asss_replay(target, config, state_tup, unif3, n01, n_steps,
                 thinning=1, n_frames=0, fc=16):
    """Plain-jnp replay of the fused kernel's per-chain state machine
    with injected draws — same math as kernels/asss.py step_n (whose
    statistical correctness is tested in test_asss.py), restructured to
    the kernel's draw-consumption order (iteration s uses row s; the
    fresh-open iteration evaluates but cannot land; in frames mode
    chains synchronise at each fc-frame chunk boundary like the kernel's
    grid does)."""
    d = target.dim
    x, pe, loc, S, i0, as_in = state_tup
    x, loc = x.T, loc.T                              # (d, C)
    S = jnp.transpose(S, (1, 2, 0))                  # (d, d, C)
    pe = pe[None, :]
    C = x.shape[1]
    eye = jnp.eye(d)[:, :, None]
    from adaptive_mcmc_tpu.kernels.base import adaptation_lr
    from adaptive_mcmc_tpu.ops.cholesky import adaptive_scale_update_cl

    def sigma_of(Sc):
        return (Sc + config.eps * eye) * (d ** 0.5)

    def project(xv, lv, sig):
        ys = xv - lv
        rows = []
        for k in range(d):
            xk = ys[k:k+1] / sig[k, k:k+1]
            rows.append(xk)
            if k + 1 < d:
                ys = ys - sig[:, k, :] * xk
        xr = jnp.concatenate(rows, axis=0)
        nsq = jnp.sum(xr * xr, axis=0, keepdims=True)
        return jnp.concatenate(
            [2.0 * xr / (nsq + 1.0), (nsq - 1.0) / (nsq + 1.0)], axis=0
        )

    def inverse(z, lv, sig):
        xb = z[:d] / (1.0 - z[d:d+1])
        out = lv
        for j in range(d):
            out = out + sig[:, j, :] * xb[j:j+1]
        return out

    def begin(n01s, ul, ut, xv, pev, lv, sig):
        z = project(xv, lv, sig)
        pe_t = pev + d * jnp.log(1.0 - z[d:d+1])
        v = n01s - jnp.sum(n01s * z, axis=0, keepdims=True) * z
        v = v / jnp.sqrt(jnp.sum(v * v, axis=0, keepdims=True))
        th = ut * 6.2831853071795864769
        return z, v, pe_t - jnp.log(ul), th, th - 6.2831853071795864769, th

    bp = jax.vmap(target.potential_fn, in_axes=1)
    z = jnp.zeros((d + 1, C)); v = jnp.zeros((d + 1, C))
    t_pe = jnp.zeros((1, C)); theta = jnp.zeros((1, C))
    tmin = jnp.zeros((1, C)); tmax = jnp.zeros((1, C))
    trips = jnp.zeros((1, C), jnp.int32)
    done = jnp.zeros((1, C), jnp.int32)
    fresh = jnp.ones((1, C), bool)
    as_chg = as_in[None, :] + 0.0
    frames = {
        "position": np.zeros((n_frames, d, C), np.float32),
        "potential_energy": np.zeros((n_frames, C), np.float32),
        "as_change": np.zeros((n_frames, C), np.float32),
    }
    if n_frames:
        tgts = [
            min((j + 1) * fc * thinning, n_steps)
            for j in range(-(-n_frames // fc))
        ]
    else:
        tgts = [n_steps]
    s = 0
    for tgt in tgts:
      while bool(jnp.any(done < tgt)):
        u_shrink = unif3[s, 0:1]; u_level = unif3[s, 1:2]
        u_theta = unif3[s, 2:3]; n01s = n01[s]
        active = done < tgt
        sig = sigma_of(S)
        bz, bv, bt, bth, btn, btx = begin(n01s, u_level, u_theta, x, pe,
                                          loc, sig)
        f = fresh
        z = jnp.where(f[0][None], bz, z); v = jnp.where(f[0][None], bv, v)
        t_pe = jnp.where(f, bt, t_pe); theta = jnp.where(f, bth, theta)
        tmin = jnp.where(f, btn, tmin); tmax = jnp.where(f, btx, tmax)
        was_fresh = f
        z_th = z * jnp.cos(theta) + v * jnp.sin(theta)
        x_prop = inverse(z_th, loc, sig)
        u_prop = jnp.nan_to_num(bp(x_prop)[None, :], nan=jnp.inf,
                                posinf=jnp.inf)
        pole = 1.0 - z_th[d:d+1]
        good = (u_prop + d * jnp.log(pole) <= t_pe) & (
            pole >= config.eps)
        bail = trips >= config.max_shrinkage_iters
        land = active & ~was_fresh & (good | bail)
        x_new = jnp.where(land[0][None],
                          jnp.where(bail[0][None], x, x_prop), x)
        pe_new = jnp.where(land, jnp.where(bail, pe, u_prop), pe)
        _, gamma = adaptation_lr(i0 + done[0], config.num_warmup,
                                 config.lr_decay)
        gamma = gamma.astype(jnp.float32)[None, :]
        delta = x_new - loc
        loc_land = loc + gamma * delta
        S_land = adaptive_scale_update_cl(S, delta, gamma[0],
                                          use_pallas=False)
        chg = jnp.sqrt(jnp.sum((loc_land - loc) ** 2, axis=0,
                               keepdims=True)) + jnp.sqrt(
            jnp.sum((S_land - S) ** 2, axis=(0, 1)))[None, :]
        loc = jnp.where(land[0][None], loc_land, loc)
        S = jnp.where(land[0][None, None], S_land, S)
        as_chg = jnp.where(land, chg, as_chg)
        done_new = done + land.astype(jnp.int32)
        sig_new = sigma_of(S)
        nz, nv, nt, nth, ntn, ntx = begin(n01s, u_level, u_theta, x_new,
                                          pe_new, loc, sig_new)
        shrink = active & ~was_fresh & ~land
        s_tmin = jnp.where(shrink & (theta < 0.0), theta, tmin)
        s_tmax = jnp.where(shrink & (theta >= 0.0), theta, tmax)
        s_theta = s_tmin + u_shrink * (s_tmax - s_tmin)
        l1 = land[0][None]
        z = jnp.where(l1, nz, z); v = jnp.where(l1, nv, v)
        t_pe = jnp.where(land, nt, t_pe)
        theta = jnp.where(land, nth, jnp.where(shrink, s_theta, theta))
        tmin = jnp.where(land, ntn, s_tmin)
        tmax = jnp.where(land, ntx, s_tmax)
        trips = jnp.where(land, 0, trips + shrink.astype(jnp.int32))
        if n_frames:
            rec = np.asarray(land & (done_new % thinning == 0))[0]
            frow = np.asarray(done_new[0] // thinning - 1)
            for c in np.nonzero(rec)[0]:
                frames["position"][frow[c], :, c] = np.asarray(
                    x_new[:, c])
                frames["potential_energy"][frow[c], c] = float(
                    pe_new[0, c])
                frames["as_change"][frow[c], c] = float(as_chg[0, c])
        x, pe, done, fresh = x_new, pe_new, done_new, jnp.zeros_like(f)
        s += 1
    return (x.T, pe[0], loc.T, jnp.transpose(S, (2, 0, 1)),
            as_chg[0]), frames, s


def _fused_asss_inputs(C=8, seed=0, n_draw_rows=600):
    t = models.eight_schools_noncentered()
    d = t.dim
    x0 = jax.random.normal(jax.random.PRNGKey(seed), (C, d)) * 0.5
    pe0 = jax.vmap(t.potential_fn)(x0)
    loc0 = jnp.zeros((C, d))
    S0 = jnp.broadcast_to(jnp.eye(d), (C, d, d)) + 0.0
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed + 100))
    unif3 = jax.random.uniform(k1, (n_draw_rows, 3, C), minval=1e-6,
                               maxval=1.0 - 1e-6)
    n01 = jax.random.normal(k2, (n_draw_rows, d + 1, C))
    return t, (x0, pe0, loc0, S0, 0, jnp.zeros((C,))), unif3, n01


def test_fused_asss_matches_replay():
    """Injected-draw determinism: the fused kernel must equal a plain-jnp
    replay of the same state machine, leaf for leaf."""
    t, st, unif3, n01 = _fused_asss_inputs()
    cfg = ASSSConfig(num_warmup=10)
    drive = build_fused_asss(t, cfg)
    got, _ = drive(st, 25, unif3=unif3, n01=n01, interpret=True)
    want, _, iters = _asss_replay(t, cfg, st, unif3, n01, 25)
    assert iters < unif3.shape[0], "draw buffer exhausted"
    for g, w, name in zip(
        (got[0], got[1], got[2], got[3], got[5]), want,
        ("x", "pe", "loc", "scale", "as_change"),
    ):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=2e-4, atol=2e-5,
            err_msg=name,
        )


def test_fused_asss_collect_frames():
    """Thinned frame recording matches the replay's frames, and the
    chunked grid (n_frames > fc forces multiple chunks) stays exact."""
    t, st, unif3, n01 = _fused_asss_inputs(seed=3, n_draw_rows=3000)
    cfg = ASSSConfig(num_warmup=6)
    drive = build_fused_asss(t, cfg)
    F, thin = 20, 3                     # fc=16 -> 2 chunks
    got_state, got_frames = drive(
        st, F * thin, n_frames=F, thinning=thin,
        unif3=unif3, n01=n01, interpret=True,
    )
    want_state, want_frames, iters = _asss_replay(
        t, cfg, st, unif3, n01, F * thin, thinning=thin, n_frames=F,
    )
    assert iters < unif3.shape[0], "draw buffer exhausted"
    # 60 transitions of a chaotic map amplify f32 reassociation between
    # the in-kernel rank-1 recursion and the replay's
    # adaptive_scale_update_cl — drift stays ~1e-4-scale (a flipped
    # shrinkage branch would diverge O(1))
    np.testing.assert_allclose(
        np.asarray(got_state[0]), np.asarray(want_state[0]),
        rtol=2e-3, atol=5e-4,
    )
    np.testing.assert_allclose(
        np.asarray(got_frames["position"]),
        np.transpose(want_frames["position"], (2, 0, 1)),
        rtol=2e-3, atol=5e-4,
    )
    np.testing.assert_allclose(
        np.asarray(got_frames["potential_energy"]),
        want_frames["potential_energy"].T, rtol=2e-3, atol=5e-4,
    )


def test_fused_asss_posterior_moments():
    """Statistical correctness of the fused machine independent of the
    replay: drive a 3-D standard normal with injected iid draws (the
    exact distribution the production core-PRNG path consumes) and check
    pooled posterior moments.  16 chains x 600 transitions after a 200-
    transition burn: pooled mean s.e. ~0.01, so 0.1 tolerances are
    ~10 sigma."""
    t = models.std_normal(3)
    d = t.dim
    C = 16
    cfg = ASSSConfig(num_warmup=200)
    drive = build_fused_asss(t, cfg)
    x0 = jax.random.normal(jax.random.PRNGKey(11), (C, d)) * 2.0
    st = (x0, jax.vmap(t.potential_fn)(x0), jnp.zeros((C, d)),
          jnp.broadcast_to(jnp.eye(d), (C, d, d)) + 0.0, 0,
          jnp.zeros((C,)))
    S = 4000
    k1, k2 = jax.random.split(jax.random.PRNGKey(12))
    unif3 = jax.random.uniform(k1, (S, 3, C), minval=1e-7,
                               maxval=1.0 - 1e-7)
    n01 = jax.random.normal(k2, (S, d + 1, C))
    # burn through warmup, then collect 600 thinned frames (thin=1)
    st1, _ = drive(st, 200, unif3=unif3, n01=n01, interpret=True)
    st1 = (st1[0], st1[1], st1[2], st1[3], st1[4], st1[5])
    _, frames = drive(
        st1, 600, n_frames=600, thinning=1,
        unif3=unif3[1200:], n01=n01[1200:], interpret=True,
    )
    draws = np.asarray(frames["position"]).reshape(-1, d)
    assert np.abs(draws.mean(axis=0)).max() < 0.1, draws.mean(axis=0)
    assert np.abs(draws.std(axis=0) - 1.0).max() < 0.1, draws.std(axis=0)


def test_fused_asss_bailout_stays_put():
    """A target whose potential is +inf off the starting point never
    satisfies the slice condition, so every transition must exhaust
    max_shrinkage_iters and bail out at theta=0 (stay put) — the
    reference's 50-trip guard (asss.py:94).  Exercises the bail branch
    and the trip counter reset in the fused machine."""
    from adaptive_mcmc_tpu.models.base import Target, SiteSpec

    d = 3
    wall = Target(
        name="wall", dim=d,
        potential_fn=lambda x: jnp.where(
            jnp.sum(x * x) < 1e-12, 0.0, jnp.inf
        ),
        sites=(SiteSpec("x", d, (d,)),),
    )
    cfg = ASSSConfig(num_warmup=0, max_shrinkage_iters=3)
    drive = build_fused_asss(wall, cfg)
    C = 4
    x0 = jnp.zeros((C, d))
    st = (x0, jnp.zeros((C,)), jnp.zeros((C, d)),
          jnp.broadcast_to(jnp.eye(d), (C, d, d)) + 0.0, 0,
          jnp.zeros((C,)))
    S = 200
    k1, k2 = jax.random.split(jax.random.PRNGKey(21))
    unif3 = jax.random.uniform(k1, (S, 3, C), minval=1e-6,
                               maxval=1.0 - 1e-6)
    n01 = jax.random.normal(k2, (S, d + 1, C))
    out, _ = drive(st, 5, unif3=unif3, n01=n01, interpret=True)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(x0),
                               atol=0.0)
    assert int(out[4]) == 5
