"""SA — Sample-Adaptive MCMC (Zhu 2019), self-contained.

The reference exposes NumPyro's SA as a baseline with ``dense_mass=True``
(numpyro_kernels.py:16-73).  SA is an ensemble sampler: keep N points
S = {z_1..z_N}; propose w ~ N(mean(S), cov(S)); among the N+1 points
S ∪ {w} delete one index J drawn with probability

    p_j ∝ φ(z_j | λ(S ∪ {w} \\ {z_j})) / π(z_j)

(where φ is the Gaussian family and λ(·) its mean/cov fitted to the set),
so low-posterior-density / high-proposal-density points die.  Deleting
J = N+1 rejects the proposal.  The chain's reported sample each step is a
uniformly random member of the ensemble.

TPU-native details:
  * the N leave-one-out-and-replace covariance factors per step are
    produced by THREE rank-1 Cholesky updates each (derivation below),
    vmapped over candidates — on TPU they dispatch to the Pallas
    chains-on-lanes kernel with (chains x N) fused into one batch;
  * everything is chain-batched like the other kernels (vmap of the
    single-chain transition).

Replace-z_i-by-w covariance identity (m = mean(S), C = cov(S), biased 1/N;
δ = (w − z_i)/N):

    C_i = C + (w−m)(w−m)ᵀ/N − (z_i−m)(z_i−m)ᵀ/N − δδᵀ
    m_i = m + δ
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from adaptive_mcmc_tpu.kernels.base import (
    Kernel,
    batch_positions,
    nan_to_inf,
    split_keys,
)
from adaptive_mcmc_tpu.ops.cholesky import rank1_cholesky_update

Array = jax.Array
_LOG_2PI = 1.8378770664093453


@dataclasses.dataclass(frozen=True)
class SAConfig:
    adapt_state_size: Optional[int] = None  # None -> max(102, 2*dim) as in
                                            # NumPyro's default sizing
    dense_mass: bool = True
    num_warmup: int = 0                     # SA adapts continuously; kept
                                            # for driver uniformity
    init_spread: float = 1.0


class SAAdaptState(NamedTuple):
    zs: Array      # (C, N, d) ensemble
    pes: Array     # (C, N) potential energies
    loc: Array     # (C, d) ensemble mean
    scale: Array   # (C, d, d) chol(cov) dense | (C, d) std diag


class SAState(NamedTuple):
    i: Array
    position: Array
    potential_energy: Array
    accept_prob: Array
    mean_accept_prob: Array
    diverging: Array
    adapt_state: SAAdaptState
    rng_key: Array


def _mvn_logpdf_dense(x, loc, chol):
    d = x.shape[-1]
    y = jax.scipy.linalg.solve_triangular(chol, x - loc, lower=True)
    return (
        -0.5 * jnp.sum(y * y)
        - jnp.sum(jnp.log(jnp.diagonal(chol)))
        - 0.5 * d * _LOG_2PI
    )


def _norm_logpdf_diag(x, loc, std):
    z = (x - loc) / std
    return jnp.sum(-0.5 * z * z - jnp.log(std) - 0.5 * _LOG_2PI)


def sa(target, config: SAConfig = SAConfig()) -> Kernel:
    d = target.dim
    N = config.adapt_state_size or max(102, 2 * d)
    batched_potential = jax.vmap(target.potential_fn)
    inv_n = 1.0 / N

    def _ensemble_stats(zs):
        loc = jnp.mean(zs, axis=0)
        centered = zs - loc
        if config.dense_mass:
            cov = (centered.T @ centered) * inv_n + 1e-6 * jnp.eye(d)
            return loc, jnp.linalg.cholesky(cov)
        return loc, jnp.sqrt(jnp.mean(centered**2, axis=0) + 1e-6)

    def _replace_stats(loc, scale, z_i, w):
        """λ of the ensemble with z_i replaced by w (rank-1 identities)."""
        delta = (w - z_i) * inv_n
        loc_new = loc + delta
        if config.dense_mass:
            s = rank1_cholesky_update(scale, w - loc, inv_n)
            s = rank1_cholesky_update(s, z_i - loc, -inv_n)
            s = rank1_cholesky_update(s, delta, -1.0)
            return loc_new, s
        var = scale**2 + inv_n * ((w - loc) ** 2 - (z_i - loc) ** 2) - delta**2
        return loc_new, jnp.sqrt(jnp.maximum(var, 1e-12))

    def _single_step(key, adapt: SAAdaptState):
        zs, pes, loc, scale = adapt
        key, k_prop, k_del, k_pick = jax.random.split(key, 4)

        eps = jax.random.normal(k_prop, (d,))
        if config.dense_mass:
            w = loc + scale @ eps
        else:
            w = loc + scale * eps
        pe_w = nan_to_inf(target.potential_fn(w))

        locs_r, scales_r = jax.vmap(
            lambda z_i: _replace_stats(loc, scale, z_i, w)
        )(zs)
        if config.dense_mass:
            log_phi = jax.vmap(_mvn_logpdf_dense)(zs, locs_r, scales_r)
            log_phi_w = _mvn_logpdf_dense(w, loc, scale)
        else:
            log_phi = jax.vmap(_norm_logpdf_diag)(zs, locs_r, scales_r)
            log_phi_w = _norm_logpdf_diag(w, loc, scale)
        # numerically-degenerate leave-one-out factors can't win
        log_phi = jnp.where(jnp.isnan(log_phi), -jnp.inf, log_phi)

        # deletion weights: phi / pi = exp(log_phi + pe)
        log_ws = jnp.concatenate(
            [log_phi + pes, (log_phi_w + pe_w)[None]]
        )
        j = jax.random.categorical(k_del, log_ws)
        accept_prob = 1.0 - jax.nn.softmax(log_ws)[N]

        replaced = j < N
        j_safe = jnp.minimum(j, N - 1)
        zs_new = jnp.where(
            replaced, zs.at[j_safe].set(w), zs
        )
        pes_new = jnp.where(replaced, pes.at[j_safe].set(pe_w), pes)
        loc_new = jnp.where(replaced, locs_r[j_safe], loc)
        scale_new = jnp.where(replaced, scales_r[j_safe], scale)
        # NaN guard on the incremental factor (reference-style fallback:
        # refit from scratch is O(N d^2), cheap enough to do via where)
        if config.dense_mass:
            bad = jnp.any(jnp.isnan(scale_new))
            loc_f, scale_f = _ensemble_stats(zs_new)
            loc_new = jnp.where(bad, loc_f, loc_new)
            scale_new = jnp.where(bad, scale_f, scale_new)

        # reported sample: uniformly random ensemble member
        pick = jax.random.randint(k_pick, (), 0, N)
        z_out = zs_new[pick]
        pe_out = pes_new[pick]
        return (
            key, z_out, pe_out, accept_prob,
            SAAdaptState(zs_new, pes_new, loc_new, scale_new),
        )

    def init(
        rng_key: Array,
        n_chains: int = 1,
        position: Optional[Array] = None,
        adapt_state: Optional[SAAdaptState] = None,
    ) -> SAState:
        key_init, key_ens, key_run = jax.random.split(rng_key, 3)
        pos = batch_positions(target, key_init, n_chains, position)
        pe = nan_to_inf(batched_potential(pos))
        if adapt_state is None:
            noise = jax.random.normal(key_ens, (n_chains, N, d))
            zs = pos[:, None, :] + config.init_spread * noise
            pes = jax.vmap(batched_potential)(zs)
            pes = jnp.where(jnp.isnan(pes), jnp.inf, pes)
            loc, scale = jax.vmap(_ensemble_stats)(zs)
            adapt_state = SAAdaptState(zs, pes, loc, scale)
        return SAState(
            i=jnp.zeros((), jnp.int32),
            position=pos,
            potential_energy=pe,
            accept_prob=jnp.zeros((n_chains,)),
            mean_accept_prob=jnp.zeros((n_chains,)),
            diverging=jnp.zeros((n_chains,), bool),
            adapt_state=adapt_state,
            rng_key=jax.random.split(key_run, n_chains),
        )

    def step(state: SAState) -> SAState:
        keys, keys_step = split_keys(state.rng_key, 2)
        _, z_out, pe_out, accept_prob, adapt_new = jax.vmap(_single_step)(
            keys_step, state.adapt_state
        )
        itr = state.i + 1
        n = jnp.where(
            state.i < config.num_warmup, itr, itr - config.num_warmup
        ).astype(jnp.float32)
        mean_ap = state.mean_accept_prob
        mean_ap = mean_ap + (accept_prob - mean_ap) / n
        return SAState(
            i=itr,
            position=z_out,
            potential_energy=pe_out,
            accept_prob=accept_prob,
            mean_accept_prob=mean_ap,
            diverging=jnp.zeros_like(state.diverging),
            adapt_state=adapt_new,
            rng_key=keys,
        )

    return Kernel(
        name="sa",
        target=target,
        config=config,
        init=jax.jit(init, static_argnames=("n_chains",)),
        step=jax.jit(step),
    )
