"""Convergence diagnostics: split-R̂, effective sample size, summaries.

The reference relies on NumPyro's ``mcmc.print_summary()`` for n_eff / r_hat
(posteriordb_eight-schools.ipynb cells 27-29).  Rebuilt here as batched pure
JAX: every statistic is computed for all parameters at once (vmapped FFT
autocorrelations), and the cross-chain moments are factored so that under a
``chains``-sharded mesh they reduce with one ``psum`` per statistic
(see parallel/run.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def split_chains(x: Array) -> Array:
    """(draws, chains, ...) -> (draws//2, 2*chains, ...)."""
    t = (x.shape[0] // 2) * 2
    x = x[:t]
    return jnp.concatenate(jnp.split(x, 2, axis=0), axis=1)


def gelman_rubin(x: Array, *, split: bool = True) -> Array:
    """Split-R̂ over (draws, chains, ...params); returns (...params)."""
    if split:
        x = split_chains(x)
    n = x.shape[0]
    chain_mean = jnp.mean(x, axis=0)               # (chains, ...)
    chain_var = jnp.var(x, axis=0, ddof=1)         # (chains, ...)
    w = jnp.mean(chain_var, axis=0)
    b = n * jnp.var(chain_mean, axis=0, ddof=1)
    var_hat = (n - 1) / n * w + b / n
    return jnp.sqrt(var_hat / w)


def _autocov_fft(x: Array) -> Array:
    """Autocovariance along axis 0 via FFT; x: (draws, ...)."""
    n = x.shape[0]
    xc = x - jnp.mean(x, axis=0, keepdims=True)
    size = 2 * n  # zero-padded circular -> linear correlation
    f = jnp.fft.rfft(xc, n=size, axis=0)
    acov = jnp.fft.irfft(f * jnp.conj(f), n=size, axis=0)[:n]
    return acov.real / n


def effective_sample_size(x: Array) -> Array:
    """ESS over (draws, chains, ...params) using Geyer's initial monotone
    positive sequence on the chain-averaged autocorrelation (the standard
    Stan/NumPyro estimator)."""
    n, m = x.shape[0], x.shape[1]
    acov = _autocov_fft(x)                          # (n, chains, ...)
    chain_var = acov[0] * n / (n - 1.0)             # (chains, ...)
    mean_var = jnp.mean(chain_var, axis=0)
    var_plus = mean_var * (n - 1.0) / n
    if m > 1:
        var_plus = var_plus + jnp.var(jnp.mean(x, axis=0), axis=0, ddof=1)

    rho = 1.0 - (mean_var - jnp.mean(acov, axis=1)) / var_plus  # (n, ...)
    rho = rho.at[0].set(1.0)

    # Geyer pair sums: P_t = rho_{2t} + rho_{2t+1}
    t_max = n // 2
    even = rho[0 : 2 * t_max : 2]
    odd = rho[1 : 2 * t_max : 2]
    p = even + odd                                   # (t_max, ...)
    # initial positive sequence: stop at first negative pair sum
    pos_mask = jnp.cumprod(p > 0.0, axis=0).astype(p.dtype)
    # initial monotone: running minimum
    p_mono = jax.lax.associative_scan(jnp.minimum, p, axis=0)
    tau = -1.0 + 2.0 * jnp.sum(p_mono * pos_mask, axis=0)
    return m * n / jnp.maximum(tau, 1e-6)


def summarize(x: Array) -> dict:
    """Per-parameter summary over (draws, chains, ...params)."""
    flatd = x.reshape((-1,) + x.shape[2:])
    return {
        "mean": jnp.mean(flatd, axis=0),
        "std": jnp.std(flatd, axis=0, ddof=1),
        "median": jnp.median(flatd, axis=0),
        "5.0%": jnp.percentile(flatd, 5.0, axis=0),
        "95.0%": jnp.percentile(flatd, 95.0, axis=0),
        "n_eff": effective_sample_size(x),
        "r_hat": gelman_rubin(x),
    }


def summary_table(target, samples_unconstrained: Array) -> str:
    """Human-readable summary like NumPyro's print_summary, from
    (draws, chains, dim) unconstrained samples, reported in constrained
    space per site."""
    sites = target.constrain(samples_unconstrained)  # dict of (T, C, ...)
    rows, header = [], (
        f"{'':>16} {'mean':>9} {'std':>9} {'median':>9} {'5.0%':>9} "
        f"{'95.0%':>9} {'n_eff':>9} {'r_hat':>7}"
    )
    for name, v in sites.items():
        v2 = v if v.ndim > 2 else v[..., None]
        stats = summarize(v2)
        for idx in range(v2.shape[-1]):
            label = name if v2.shape[-1] == 1 else f"{name}[{idx}]"
            rows.append(
                f"{label:>16} {stats['mean'][..., idx]:>9.2f} "
                f"{stats['std'][..., idx]:>9.2f} "
                f"{stats['median'][..., idx]:>9.2f} "
                f"{stats['5.0%'][..., idx]:>9.2f} "
                f"{stats['95.0%'][..., idx]:>9.2f} "
                f"{stats['n_eff'][..., idx]:>9.0f} "
                f"{stats['r_hat'][..., idx]:>7.2f}"
            )
    return "\n".join([header] + rows)
